package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sweep of the S20f upsert key-locator (r13 verdict #1): a
  * FIXED one-key upsert against range-clustered Hudi tables of growing
  * file-group count must cost ~O(1), not O(table) — the footer
  * key-range prune keeps the locator's scan set at the files that can
  * hold the batch key (here: exactly 1 of G), whatever G is. The sweep
  * measures candidates (must stay 1), total files (grows with G) and
  * the whole upsert wall time; alpha is the scaling exponent between
  * the two largest G. Writes hudi_upsert_sweep.json. NOT part of the
  * shipped library.
  *
  * Usage: Test/runMain graft.tools.HudiUpsertSweep
  * Env: SPARK_GRAFT_CPUS (default 16).
  */
object HudiUpsertSweep {
  import graft.sources.{HudiRO, HudiSink}

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rowsPerGroup = 4000L
    val sweeps = Seq(8, 32, 128)
    val results = sweeps.map { g =>
      val dir = s"/tmp/graft_hudi_upsweep_g$g"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      // range-clustered table: G groups with DISJOINT key ranges, each
      // its own insert commit (how range-clustered groups arise in a
      // CDC/time-keyed workload: new key ranges land as new commits)
      val c0 = 20300101000000000L
      (0 until g).foreach { i =>
        val lo = i * rowsPerGroup
        val batch = spark.range(lo, lo + rowsPerGroup)
          .select(format_string("k%09d", col("id")).as("k"),
            (col("id") * 2).as("v"))
        HudiSink.insert(batch, dir, "k", None, f"${c0 + i}%017d")
      }
      val files = HudiRO.snapshotFiles(spark, dir).length
      // fixed work: ONE key updated, in the middle group's range
      val key = f"k${(g / 2) * rowsPerGroup + 7}%09d"
      val t0 = System.nanoTime()
      HudiSink.upsert(Seq((key, -1L)).toDF("k", "v"), dir, "k", None,
        f"${c0 + g + 1}%017d")
      val wall = (System.nanoTime() - t0) / 1e9
      val (cand, tot) = HudiSink.lastRewriteScan.get
      // r14 verdict #1 done-criterion: the locator reads key ranges
      // from the commit bodies — ZERO parquet-footer probes however
      // many commits/files accumulated (all sink-written here)
      val probes = HudiSink.lastRewriteFooterProbes.get
      val n = HudiRO.read(spark, dir).count()
      println(s"[upsweep] g=$g files=$files candidates=$cand " +
        s"footer_probes=$probes wall=${fmt(wall)}s rows=$n")
      require(cand == 1, s"expected 1 candidate at g=$g, got $cand")
      require(probes == 0, s"expected 0 footer probes at g=$g, got $probes")
      require(n == g * rowsPerGroup, s"row count drifted: $n")
      (g, files, cand, wall)
    }
    val (gLo, _, _, wLo) = results(results.length - 2)
    val (gHi, _, _, wHi) = results.last
    val alpha = math.log(wHi / wLo) / math.log(gHi.toDouble / gLo)
    val rows = results.map { case (g, f, c, w) =>
      s"""{"groups":$g,"files":$f,"candidates":$c,"footer_probes":0,"upsert_wall_s":${fmt(w)}}"""
    }.mkString("[", ",", "]")
    val body =
      s"""{"what":"S20f/S20g upsert key-locator sweep: fixed 1-key upsert vs file-group count over range-clustered tables; candidates must stay 1, parquet-footer probes must stay 0 (ranges read from commit metadata — r14 verdict #1), and wall ~O(1) (alpha<<1) as G grows","rows_per_group":$rowsPerGroup,"sweeps":$rows,"alpha_wall_vs_groups":${fmt(alpha)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("hudi_upsert_sweep.json"), body.getBytes("UTF-8"))
    println(s"[upsweep] alpha=${fmt(alpha)} -> hudi_upsert_sweep.json")
    spark.stop()
  }
}
