package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Regional revenue rollup: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈
    * region — the canonical star-join shape. Only fixed-cardinality
    * dims (nation=25, region=5) carry broadcast hints; customer grows
    * with scale factor, so AQE decides its join strategy. */
  def entry(spark: SparkSession): DataFrame = {
    val t = Tables(spark, "/root/testdata/sf0.001")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ TpchQueries2.queries ++ TpcdsQueries.queries ++ TpcdsQueries2.queries ++ TpcdsQueries3.queries ++ TpcdsQueries4.queries ++ TpcdsQueries5.queries ++ TpcdsQueries6.queries ++ TypedQueries.queries ++ Skew.queries ++ RelationalQueries.queries ++
      AggQueries.queries ++ WindowQueries.queries ++
      FunctionQueries.queries ++ FunctionQueries2.queries ++ FunctionQueries3.queries ++ FunctionQueries4.queries ++
      TableOps.queries ++ EventQueries.queries ++
      graft.pipeline.Dedup.queries ++ graft.pipeline.Similarity.queries ++
      graft.pipeline.TextAnalysis.queries ++ graft.pipeline.Corpus.queries ++
      graft.pipeline.Multimodal.queries ++ graft.pipeline.Splits.queries ++ graft.pipeline.Curation.queries ++ graft.pipeline.Tokenizer.queries ++
      graft.pipeline.Cluster.queries ++ AsOfJoin.queries ++ BandJoin.queries ++
      graft.sources.NestedParquet.queries ++ graft.sources.AvroQueries.queries ++ graft.sources.SequenceQueries.queries ++ graft.sources.RcFileQueries.queries ++
      graft.sources.IcebergQueries.queries ++ graft.sources.HiveAcidQueries.queries ++ graft.sources.HudiQueries.queries ++
      graft.sources.MixedFormatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ TpchQueries2.oracles ++ TpcdsQueries.oracles ++ TpcdsQueries2.oracles ++ TpcdsQueries3.oracles ++ TpcdsQueries4.oracles ++ TpcdsQueries5.oracles ++ TpcdsQueries6.oracles ++ TypedQueries.oracles ++ Skew.oracles ++ RelationalQueries.oracles ++
      AggQueries.oracles ++ WindowQueries.oracles ++
      FunctionQueries.oracles ++ FunctionQueries2.oracles ++ FunctionQueries3.oracles ++ FunctionQueries4.oracles ++
      TableOps.oracles ++ EventQueries.oracles ++
      graft.pipeline.Dedup.oracles ++ graft.pipeline.Similarity.oracles ++
      graft.pipeline.TextAnalysis.oracles ++ graft.pipeline.Corpus.oracles ++
      graft.pipeline.Multimodal.oracles ++ graft.pipeline.Splits.oracles ++ graft.pipeline.Curation.oracles ++ graft.pipeline.Tokenizer.oracles ++
      graft.pipeline.Cluster.oracles ++ AsOfJoin.oracles ++ BandJoin.oracles ++
      graft.sources.NestedParquet.oracles ++ graft.sources.AvroQueries.oracles ++ graft.sources.SequenceQueries.oracles ++ graft.sources.RcFileQueries.oracles ++
      graft.sources.IcebergQueries.oracles ++ graft.sources.HiveAcidQueries.oracles ++ graft.sources.HudiQueries.oracles ++
      graft.sources.MixedFormatQueries.oracles
}
