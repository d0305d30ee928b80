package graft

/** Dev tool: dump physical-plan properties for headline queries —
  * verifies pushdown / broadcast / shuffle-count expectations hold
  * (SURVEY.md §5). Run: sbt "Test/runMain graft.PlanAudit [sfDir]" */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.build("plan-audit")
    val interesting = Seq(
      "q01_pricing_summary", "q05_local_supplier", "q18_large_volume",
      "rel_filter_project", "asof_join_events", "sim_brute_topk",
      "dedup_minhash_lsh", "events_sessionize")
    interesting.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // let AQE finalize
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      val simple = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      val nExchange = "Exchange (hash|range|Single)".r.findAllIn(plan).length
      val nBroadcast = plan.split("BroadcastHashJoin|BroadcastNestedLoop").length - 1
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("PushedFilters: -")
      val wsc = "\\*\\(".r.findAllIn(simple).length
      println(f"== $name%-24s exchanges=$nExchange broadcasts=$nBroadcast wscodegenSpans=$wsc")
      println(s"   ${pushed.take(160)}")
    }
    spark.stop()
  }
}
