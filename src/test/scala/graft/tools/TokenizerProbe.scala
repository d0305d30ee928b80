package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition of the pinned-vs-trained tokenizer residual
  * (r14 verdict #5): the pinned variants trail their trained twins by
  * ~1.1-1.3x, and the hypothesis to pin down is WHERE that residual
  * lives — the encode loop (fixable) or the vocab CONSTRUCTION
  * (structural: the pinned char+bigram vocab is DEFINED over the whole
  * corpus — the closed-form oracle needs every corpus bigram in-vocab,
  * so a sample would break exactness — while the trained twin samples
  * 256 docs by design). Times, per variant at sf0.1 (median of N):
  *   - vocab/merges construction alone (the broadcast row's action)
  *   - the full query
  * so (full - construction) isolates the corpus encode pass for a
  * like-for-like comparison. Writes tokenizer_residual.json. NOT part
  * of the shipped library.
  *
  * Usage: Test/runMain graft.tools.TokenizerProbe [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_ITERS (default 5).
  */
object TokenizerProbe {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt.max(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir).documents
    docs.count() // warm the scan/page cache outside the timings

    def med(f: () => Unit): Double = {
      f() // untimed warm-up
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(ts.length / 2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    import graft.pipeline.Tokenizer
    // construction-only timings: the pinned vocab's two full-corpus
    // distincts vs the trained twin's 256-doc sample training
    val tPinnedVocab = med(() => noop(Tokenizer.pinnedVocabForProbe(docs)))
    val tTrainedVocab = med(() => noop(Tokenizer.trainedVocabForProbe(spark, docs)))
    // full-query timings (the bench's own shapes)
    val tPinnedFull = med(() => noop(Tokenizer.unigramTokenizePinned(spark, docs)))
    val tTrainedFull = med(() => noop(Tokenizer.unigramTokenize(spark, docs)))
    val tPinnedFert = med(() => noop(Tokenizer.tokenFertilityPinned(spark, docs)))
    val tTrainedFert = med(() => noop(Tokenizer.tokenFertility(spark, docs)))

    val body =
      s"""{"what":"pinned-vs-trained tokenizer residual decomposition (r14 verdict #5): construction-only vs full-query medians at the bench SF; encode = full - construction. The pinned vocab is DEFINED over the whole corpus (closed-form oracle needs every corpus bigram in-vocab), the trained twin samples 256 docs - so the construction delta is structural, not a constant-factor bug",
         |"sf":"$sfDir","cpus":"$cpus","iters":$iters,
         |"unigram":{
         |  "pinned_vocab_build_s":${fmt(tPinnedVocab)},
         |  "trained_vocab_build_s":${fmt(tTrainedVocab)},
         |  "pinned_full_s":${fmt(tPinnedFull)},
         |  "trained_full_s":${fmt(tTrainedFull)},
         |  "pinned_encode_s":${fmt(tPinnedFull - tPinnedVocab)},
         |  "trained_encode_s":${fmt(tTrainedFull - tTrainedVocab)}},
         |"fertility":{
         |  "pinned_full_s":${fmt(tPinnedFert)},
         |  "trained_full_s":${fmt(tTrainedFert)},
         |  "pinned_encode_s":${fmt(tPinnedFert - tPinnedVocab)},
         |  "trained_encode_s":${fmt(tTrainedFert - tTrainedVocab)}}}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("tokenizer_residual.json"), body.getBytes("UTF-8"))
    println(s"[tokprobe] pinned vocab=${fmt(tPinnedVocab)} trained vocab=${fmt(tTrainedVocab)} " +
      s"pinned full=${fmt(tPinnedFull)} trained full=${fmt(tTrainedFull)} -> tokenizer_residual.json")
    spark.stop()
  }
}
