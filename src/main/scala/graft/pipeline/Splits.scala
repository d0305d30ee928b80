package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dataset-splitting operators for training pipelines (SURVEY.md §2
  * P19/P20). A training corpus needs reproducible membership: a doc's
  * split must not change when the corpus is re-partitioned, re-ordered,
  * or incrementally grown — so the assignment is a pure function of the
  * stable key (md5 of doc_id), never of rand()/partition position.
  * That also makes the exact split oracle-checkable in any engine with
  * md5. Stratified sampling keeps per-stratum rates without a global
  * shuffle: Bernoulli per row, rate looked up by stratum.
  */
object Splits {

  /** split_train_test: deterministic 80/20 assignment. The 0..255
    * bucket comes from the first two hex chars of md5(doc_id) — the
    * engine-portable form of hash-mod-256 (Spark's hash() and DuckDB's
    * hash() disagree; md5 is bit-identical everywhere). */
  def trainTest(docs: DataFrame, trainBuckets: Int = 204): DataFrame = {
    val bucket =
      (expr("instr('0123456789abcdef', substring(md5(cast(cast(doc_id AS string) AS binary)), 1, 1))") - 1) * 16 +
        (expr("instr('0123456789abcdef', substring(md5(cast(cast(doc_id AS string) AS binary)), 2, 1))") - 1)
    docs.select(col("doc_id"),
      bucket.cast("long").as("bucket"),
      when(bucket < trainBuckets, "train").otherwise("test").as("split"))
  }

  /** sample_stratified (P20): per-stratum Bernoulli rates via the SAME
    * pure doc_id membership hash as [[mixture]], with the seed folded
    * in mod 2^32 so different seeds draw different (still
    * deterministic) samples. Replaces `sampleBy`, whose per-partition
    * RNG re-draws the sample whenever the corpus repartitions — at
    * 100 TB that makes the "same" sample unreproducible across runs;
    * the hash is repartition-stable, incrementally stable, and exact
    * integer arithmetic any engine replays (oracle-exact since r7). */
  def stratified(docs: DataFrame, fractions: Map[String, Double], seed: Long): DataFrame = {
    val f = typedlit(fractions)
    docs.filter(membershipU(seed) < coalesce(element_at(f, col("lang")), lit(0.0)))
  }

  /** P29 mixture sampling — the data-mixing step of a training run:
    * given target proportions per stratum (lang), downsample each
    * stratum so the OUTPUT matches the target mixture at the largest
    * size the corpus supports (M* = min over strata of n_l / p_l; the
    * binding stratum keeps 100%). Membership is a pure function of
    * doc_id (Knuth multiplicative hash, exact integer arithmetic any
    * engine can replay), so the sample is reproducible under
    * re-partitioning and incrementally stable — and oracle-exact.
    * Scale shape: one aggregate over the stratum column (5 rows out),
    * broadcast back onto the fact scan; the corpus itself is never
    * shuffled. */
  def mixture(docs: DataFrame, weights: Seq[(String, Double)]): DataFrame = {
    val w = docs.sparkSession.createDataFrame(weights).toDF("lang", "p")
    val n = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val mStar = n.join(w, "lang")
      .agg(min(col("n_lang").cast("double") / col("p")).as("m_star"))
    val keep = n.join(w, "lang").crossJoin(broadcast(mStar))
      .select(col("lang"),
        least(lit(1.0), col("p") * col("m_star") / col("n_lang").cast("double")).as("keep_frac"))
    docs.join(broadcast(keep), Seq("lang"))
      .filter(membershipU < col("keep_frac"))
  }

  /** Knuth multiplicative membership hash, u ∈ [0, 1). The product is
    * taken in DECIMAL(38,0): `doc_id * 2654435761` in BIGINT silently
    * wraps negative for doc_id ≳ 3.47e9 (Spark) or raises an overflow
    * error (DuckDB) — at 100 TB corpus sizes those ids exist, and a
    * wrapped-negative u would make every such row unconditionally pass
    * the `u < keep_frac` filter, silently skewing the mixture. The
    * doc_id is first reduced mod 2^32 (the product only matters mod
    * 2^32), keeping the decimal multiply within 2^64 — exact in both
    * engines, and bit-identical to the old formula wherever the old one
    * didn't overflow. */
  private[graft] def membershipU: Column = membershipU(0L)

  /** Seeded variant: the seed shifts the id stream mod 2^32 before the
    * multiply — (x % m + s) stays under 2^33, so the sum is exact in
    * BIGINT and the decimal product stays within 2^64 as before.
    * Seed 0 is bit-identical to the unseeded form. */
  private[graft] def membershipU(seed: Long): Column =
    expr(s"CAST(CAST((doc_id % 4294967296 + ${java.lang.Long.remainderUnsigned(seed, 4294967296L)}) % 4294967296" +
      " AS DECIMAL(38,0)) * 2654435761 % 4294967296 AS DOUBLE)") /
      lit(4294967296.0)

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // P19: oracle-exact — the assignment is pure md5 arithmetic.
    "split_train_test" -> ((spark, dir) => {
      trainTest(Tables(spark, dir).documents).orderBy("doc_id")
    }),
    // P29: oracle-exact — counts, thresholds, and membership are pure
    // arithmetic both engines replay bit-identically.
    "pipe_mixture" -> ((spark, dir) => {
      val target = Seq("en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
      mixture(Tables(spark, dir).documents, target)
        .select("doc_id", "lang").orderBy("doc_id")
    }),
    // P20: oracle-exact since r7 — membership is the seeded Knuth
    // hash, pure integer arithmetic in both engines. Aggregated so
    // the row count is stable for the driver's rows>0 smoke.
    "sample_stratified" -> ((spark, dir) => {
      val t = Tables(spark, dir)
      val langs = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.25)
      stratified(t.documents, langs, seed = 42L)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }),
  )

  val oracles: Map[String, String] = Map(
    "split_train_test" ->
      """SELECT doc_id,
        |  CAST((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS BIGINT) AS bucket,
        |  CASE WHEN (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) < 204
        |       THEN 'train' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "pipe_mixture" ->
      """WITH w AS (
        |  SELECT * FROM (VALUES ('en', 0.5), ('de', 0.2), ('fr', 0.15),
        |                        ('es', 0.1), ('zh', 0.05)) AS t(lang, p)),
        |n AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT min(CAST(n_lang AS DOUBLE) / p) AS m_star FROM n JOIN w USING (lang)),
        |k AS (SELECT lang, least(1.0, p * m_star / CAST(n_lang AS DOUBLE)) AS keep_frac
        |      FROM n JOIN w USING (lang) CROSS JOIN m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN k USING (lang)
        |WHERE CAST(CAST(d.doc_id % 4294967296 AS DECIMAL(38,0)) * 2654435761 % 4294967296 AS DOUBLE)
        |      / 4294967296.0 < keep_frac
        |ORDER BY d.doc_id""".stripMargin,

    // seeded Knuth membership (seed 42 folded in mod 2^32) — the same
    // exact-integer replay as pipe_mixture
    "sample_stratified" ->
      """WITH f AS (
        |  SELECT * FROM (VALUES ('en', 0.5), ('de', 0.25), ('fr', 0.25),
        |                        ('es', 0.25), ('zh', 0.25)) AS t(lang, p))
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled
        |FROM documents d JOIN f USING (lang)
        |WHERE CAST(CAST((d.doc_id % 4294967296 + 42) % 4294967296 AS DECIMAL(38,0))
        |        * 2654435761 % 4294967296 AS DOUBLE) / 4294967296.0 < p
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
  )
}
