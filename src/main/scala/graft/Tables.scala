package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the table surface of the reference engine's test schema
  * (apache-impala-4.1.0/testdata/datasets/tpch) plus the pipeline tables
  * (documents, embeddings, events). One parquet scan per table; column
  * pruning / predicate pushdown is left to Catalyst — callers select.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives as either int64 nanoseconds (TIMESTAMP(NANOS)
    * parquet under spark.sql.legacy.parquet.nanosAsLong — the original
    * testdata encoding) or as a genuine timestamp column (micros, the
    * round-7 regeneration). Every consumer was written against the
    * bigint-nanos contract (`ts div 1000000000` → epoch seconds), so
    * normalize HERE, at the single choke point, rather than teaching
    * each of the ~10 event/as-of/band queries both encodings. The
    * timestamp→nanos conversion is exact (micros * 1000) and the cast
    * to TimestampType is identity-safe because every session in this
    * repo pins spark.sql.session.timeZone=UTC. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            df.col("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = normalizeTs(t("events"))
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
