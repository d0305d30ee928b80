package graft

/** Scratch dev tool: print the executed (post-AQE) plan of the queries
  * named on the command line, after running them once.
  * sbt 'Test/runMain graft.ExplainQ <sfDir> <name> [name...]' */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = GraftSession.build("explain-q")
    args.tail.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val df2 = SparkEntry.queries(name)(spark, dir)
      df2.collect()
      println(f"==== $name  ($secs%.2f s noop)")
      println(df2.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
