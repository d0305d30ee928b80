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

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def events: DataFrame = t("events")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
