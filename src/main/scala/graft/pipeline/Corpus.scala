package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs, as one operator: exact-dedup (keep first),
  * quality gate (length / word-count / stopword ratios), language
  * allowlist, and optionally MinHash near-dup removal. Each stage is
  * scan-bound or bucket-bound; the composition introduces no extra
  * shuffles beyond its stages (predicates fuse into one pass over the
  * deduped relation).
  */
object Corpus {

  case class QualityGate(minChars: Long = 60, minWords: Long = 10,
                         maxStopRatio: Double = 0.5)

  /** Keep-list of documents surviving dedup + quality + language gates.
    * Returns the kept rows of `docs` (all original columns). */
  def clean(docs: DataFrame, gate: QualityGate = QualityGate(),
            langs: Seq[String] = Seq("en", "de", "fr", "es", "zh"),
            nearDup: Boolean = false): DataFrame = {
    val deduped = Dedup.exactKeepFirst(docs)
    val w = Dedup.tokens(col("text"))
    val nWords = size(w).cast("long")
    val nStop = size(filter(w, t => t === "the" || t === "a")).cast("long")
    val lenOk = length(col("text")) >= gate.minChars
    val wordsOk = nWords >= gate.minWords
    val stopOk = nStop.cast("double") / nWords <= gate.maxStopRatio
    val langOk = col("lang").isin(langs: _*)
    val gated = deduped
      // no silent drops: per-gate attrition rides the job as observed
      // metrics (first-failing-gate attribution, so the counts add up)
      .observe("corpus_gates",
        count(lit(1)).as("after_dedup"),
        sum(when(!lenOk, 1L).otherwise(0L)).as("dropped_len"),
        sum(when(lenOk && !wordsOk, 1L).otherwise(0L)).as("dropped_words"),
        sum(when(lenOk && wordsOk && !stopOk, 1L).otherwise(0L)).as("dropped_stop"),
        sum(when(lenOk && wordsOk && stopOk && !langOk, 1L).otherwise(0L)).as("dropped_lang"),
        sum(when(lenOk && wordsOk && stopOk && langOk, 1L).otherwise(0L)).as("kept"))
      .filter(lenOk && wordsOk && stopOk && langOk)
    if (!nearDup) gated
    else {
      // `gated` feeds BOTH the candidate generator and the anti-join
      // probe side; without a persist the dedup window + quality gates
      // execute twice (the minhash cache inside Dedup only covers the
      // shingle projection). Slot-replacing persist, same discipline as
      // Dedup: a long-lived session never pins more than the last call.
      val g = Dedup.cacheReplacing(gated, gatedSlot)
      // drop the higher-id doc of every verified near-dup pair
      val drop = Dedup.minhashCandidates(g, minJaccard = 0.6)
        .select(col("doc_b").as("doc_id")).distinct()
      g.join(drop, Seq("doc_id"), "left_anti")
    }
  }

  private val gatedSlot =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "corpus_clean" -> ((spark, dir) => {
      clean(Tables(spark, dir).documents)
        .select("doc_id", "lang", "source", "n_chars").orderBy("doc_id")
    }),
    "corpus_clean_neardup" -> ((spark, dir) => {
      clean(Tables(spark, dir).documents, nearDup = true)
        .select("doc_id").orderBy("doc_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    // near-dup variant is rows-only (minhash); the deterministic gates
    // are fully mirrorable:
    "corpus_clean" ->
      """WITH deduped AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) WHERE rn = 1),
        |feat AS (
        |  SELECT doc_id, lang, source, n_chars, length(text) AS len,
        |    CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
        |         w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop
        |  FROM deduped)
        |SELECT doc_id, lang, source, n_chars FROM feat
        |WHERE len >= 60 AND n_words >= 10
        |  AND CAST(n_stop AS DOUBLE) / n_words <= 0.5
        |  AND lang IN ('en', 'de', 'fr', 'es', 'zh')
        |ORDER BY doc_id""".stripMargin,
  )
}
