package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same rationale as Bench: keep ContextCleaner draining broadcast
      // and shuffle state across ~200 queries (default 30 min never fires)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
    // Spill certification knob (r13 verdict #3, the Impala
    // spilling-operator parity story): a deliberately small unified
    // memory pool (with SPARK_DRIVER_MEM bounding the local-mode heap)
    // forces the heavy tail's hash aggregates / sorts / joins through
    // their spill paths; correctness must be IDENTICAL.
    val spark = sys.env.get("SPARK_GRAFT_MEMORY_FRACTION")
      .fold(builder)(f => builder.config("spark.memory.fraction", f))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query spill evidence for the certification artifact: task
    // metrics summed across the query's jobs — a cert run where
    // nothing spilled would not be exercising the spill paths.
    val memSpilled = new java.util.concurrent.atomic.AtomicLong
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            memSpilled.addAndGet(m.memoryBytesSpilled)
            diskSpilled.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    // ADVICE r14: task-end events are delivered ASYNCHRONOUSLY on the
    // listener bus, so spill deltas sampled right after a query's action
    // could misattribute bytes to the next query. Drain the bus before
    // each sample (listenerBus/waitUntilEmpty are private[spark] —
    // public at the bytecode level, so reflection reaches them;
    // best-effort: if the method moves, attribution degrades to the old
    // approximate sampling rather than failing the run).
    def drainListenerBus(): Unit = try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch { case _: Throwable => () }
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY: regex filter for local iteration (same knob as
    // Bench); the driver runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      drainListenerBus() // flush the PREVIOUS query's stragglers first
      val (m0, d0) = (memSpilled.get(), diskSpilled.get())
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      drainListenerBus() // ...and THIS query's, before sampling
      val (dm, dd) = (memSpilled.get() - m0, diskSpilled.get() - d0)
      if (dm > 0 || dd > 0)
        System.err.println(s"[verify] spill $name mem=$dm disk=$dd")
      // same cache hygiene as Bench: drop each query's persisted
      // subtrees/RDDs so ~200 queries don't accumulate storage blocks
      // (blocking, so reclaim can't overlap the next query — same
      // determinism rationale as Bench's sweep)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
