package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool for the optimization rounds: write `.explain("formatted")`
  * of named queries to plans/<tag>/<query>_<suffix>.txt (the judge
  * checks plan claims against these files without running Spark).
  *
  * sbt 'Test/runMain graft.tools.PlanDump <sfDir> <tag> <suffix> <name> [name...]'
  * e.g. Test/runMain graft.tools.PlanDump /root/testdata/sf0.1 r16 before ds_q2_wow_pivot
  *
  * The dump is the pre-execution formatted plan (AdaptiveSparkPlan
  * initial plan) PLUS, after one executed noop run, the final AQE plan
  * — both matter: the formatted dump carries PushedFilters/ReadSchema,
  * the executed plan carries the join strategies AQE actually chose.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.build("plan-dump")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try graft.Fixtures.prepare.get(name).foreach(_(spark, dir))
      catch { case e: Throwable =>
        System.err.println(s"[plandump] $name fixture prepare failed: ${e.getMessage}")
      }
      val df = fn(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.write.format("noop").mode("overwrite").save()
      val df2 = fn(spark, dir)
      df2.collect()
      val finalPlan = df2.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      val body =
        s"==== $name ($suffix) — explain(formatted), initial plan ====\n" +
          formatted +
          s"\n==== $name ($suffix) — executed plan (final AQE) ====\n" +
          finalPlan + "\n"
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        body.getBytes("UTF-8"))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      try graft.Fixtures.cleanup.get(name).foreach(_(spark, dir))
      catch { case _: Throwable => () }
      println(s"[plandump] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
