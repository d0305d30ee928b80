package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only one-off: demonstrate the corpus-adaptive LSH sizing fix on
  * the sweep's largest scale — dedup_embed_cosine with the fixed 6-bit
  * tables vs bitsPerTable=0 (auto) on the same generated corpus.
  * Usage: Test/runMain graft.tools.ScaleProbe <dir> */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val tau = args.lift(2).map(_.toDouble).getOrElse(0.3)
    def run(label: String, bits: Int): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.pipeline.Similarity.embedDedup(spark, emb, tau, bitsPerTable = bits)
          .count()
        println(f"[probe] $label iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }
    val n = emb.count()
    println(s"[probe] corpus $dir n=$n autoBits=" +
      graft.pipeline.Similarity.autoBitsPerTable(n, 4))
    // optional second arg "auto-only" skips the fixed-bit run (at the
    // largest scales it is pathological BY DESIGN — that's the finding);
    // "bits=N" runs ONLY that explicit sizing
    def runSem(label: String, cells: Int): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n2 = graft.pipeline.Similarity.semanticDedup(spark, emb, tau, cells0 = cells)
          .count()
        println(f"[probe] $label iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n2")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }
    }
    args.lift(1) match {
      case Some(s) if s.startsWith("bits=") =>
        val b = s.stripPrefix("bits=").toInt; run(s"explicit-$b-bit", b)
      case Some("sem") => runSem("sem-fixed-16", 16); runSem("sem-auto", 0)
      case Some("sem-auto") => runSem("sem-auto", 0)
      case Some("auto-only") => run("auto", 0)
      case _ => run("fixed-6-bit", 6); run("auto", 0)
    }
    spark.stop()
  }
}
