package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Each query is fully evaluated through the
  * `noop` sink — `count()` would let Catalyst prune unreferenced
  * projections, under-measuring select-heavy queries — and run
  * SPARK_GRAFT_ITERS times (default 3) keeping the median, so one
  * co-tenant hiccup doesn't masquerade as a regression. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the session once (codegen compiler, shuffle machinery,
    // file-source listing) so first-query numbers measure the query,
    // not JVM startup.
    SparkEntry.entry(spark).count()
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          }
          None
        }
      }
      val median =
        if (times.isEmpty) -1.0 else times.sorted.apply(times.length / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"iters":$iters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
