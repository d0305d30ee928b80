package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive ACID INSERT-ONLY table WRITER (S18e) — the write half of the
  * S18 family, completing the lakehouse WRITE triptych: graft already
  * writes Iceberg (T18/T22/T23) and Hudi (S20d/T31); with this sink all
  * three formats it tails (T25/T27/T29) can also be produced by it.
  *
  * Insert-only (`transactional_properties='insert_only'`, the MM-table
  * scope Impala 3.3 itself reads) keeps the write story purely
  * directory-shaped: one committed write = one `delta_{w}_{w}[_stmt]`
  * directory of PLAIN format files, write ids allocated densely in
  * commit order, visibility decided entirely by the snapshot's
  * ValidWriteIds against the directory names — no per-row metadata, no
  * event wrapper (that is the full-ACID shape, which stays read-only
  * here: producing it without a metastore's txn manager would invent
  * semantics the public layout leaves to HMS).
  *
  * COMMIT ATOMICITY: the delta is written to a dot-prefixed scratch
  * directory and DIR-RENAMED into place, so it appears complete in one
  * name-level operation — a T27 poller can never observe the
  * `_temporary`/`_flush_length` mid-write signatures from this writer
  * (it still gates on them for writers that stream in place).
  *
  * EXACTLY-ONCE for the T33 streaming sink: each committed delta
  * carries a `_graft_batch` sidecar ((query id, batch id) JSON). Files
  * with a `_` prefix are invisible to both Spark's scans and the S18
  * commit-signature sweep, so the sidecar rides inside the public
  * layout without changing what any reader sees — the honest stand-in
  * for the txn→writeId mapping Hive itself keeps in the metastore
  * (which this file-layout re-expression deliberately has none of).
  *
  * Scale: the data write is one distributed job per commit; everything
  * else (id allocation, rename, sidecar) is name-level and O(1) per
  * commit. Write-id allocation reads the directory listing — bounded
  * by commit cadence, the same metadata-scale class as the reader's
  * own sweep. */
object HiveAcidSink {

  private def hfs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Next write id: max id covered by any base/delta dir, plus one
    * (ids are allocated densely in commit order — the T27 contiguity
    * contract: this writer never leaves a gap). */
  def nextWriteId(spark: SparkSession, tableDir: String): Long = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 1L
    val names = fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    val maxId = names.flatMap { n =>
      HiveAcid.parseDelta(n).map(_.maxWriteId)
        .orElse(HiveAcid.parseBase(n).map(_.writeId))
    }
    maxId.maxOption.getOrElse(0L) + 1L
  }

  /** The full-ACID write DESCOPE, pinned the X14 way (r13 verdict #5):
    * this sink writes ONLY insert-only (MM) tables — producing
    * full-ACID event files without a metastore txn manager would
    * invent semantics the public layout leaves to HMS (see object
    * scaladoc; full-ACID READS stay supported via HiveAcidSource, the
    * reference's own scope: Impala writes only insert-only ACID,
    * hdfs-table-sink.cc has no event-writer path). The boundary is
    * BEHAVIORAL, not just documented: an insertOnly into a table
    * showing either full-ACID signature — a `delete_delta_*` dir, or
    * event-wrapped files in an existing base/delta — refuses loudly
    * (a plain-file delta mixed into an event-wrapped table would read
    * back as corrupt). */
  private[graft] def requireInsertOnlyShape(spark: SparkSession,
                                            tableDir: String): Unit = {
    val fs = hfs(spark, tableDir)
    val p = new Path(tableDir)
    if (!fs.exists(p)) return
    val dirs = fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
    require(!dirs.exists(_.startsWith("delete_delta_")),
      s"$tableDir is a FULL-ACID table (delete_delta present) — " +
        "HiveAcidSink writes only insert-only (MM) tables; full-ACID " +
        "stays read-only (descope: no metastore txn manager here)")
    // probe one data file of the OLDEST and the NEWEST base/delta for
    // the acid event wrapper (bounded footer reads, the reader's own
    // detector — ADVICE r14: a table converted to full-ACID mid-life
    // shows event files only in LATER deltas, so the oldest-only probe
    // missed it); the parquet signature is the FULL five-column acid
    // event prefix, not just the first two names — a user schema that
    // happens to start (operation, originalTransaction) must not be
    // falsely refused
    val dataDirs = dirs
      .filter(d => HiveAcid.parseDelta(d).isDefined || HiveAcid.parseBase(d).isDefined)
      .sorted
    def firstFileIn(d: String): Option[String] =
      fs.listStatus(new Path(s"$tableDir/$d")).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.toString).sorted.headOption
    val acidPrefix = Seq("operation", "originalTransaction", "bucket",
      "rowId", "currentTransaction")
    (dataDirs.headOption.toSeq ++ dataDirs.lastOption.toSeq).distinct
      .flatMap(firstFileIn).foreach { f =>
        val eventShaped =
          scala.util.Try(AcidOrc.isEventFile(spark, f)).getOrElse(false) ||
            scala.util.Try(spark.read.parquet(f).schema.fieldNames.take(5).toSeq ==
              acidPrefix).getOrElse(false)
        require(!eventShaped,
          s"$tableDir carries acid EVENT-wrapped files ($f) — a full-ACID " +
            "table; HiveAcidSink writes only insert-only (MM) tables " +
            "(descope: no metastore txn manager here)")
      }
  }

  /** One committed insert-only write: `delta_{w}_{w}[_stmt]` with plain
    * parquet files, atomically dir-renamed into place. */
  def insertOnly(batch: DataFrame, tableDir: String, writeId: Long,
                 stmtId: Option[Int] = None,
                 sidecar: Map[String, String] = Map.empty): Unit = {
    val spark = batch.sparkSession
    requireInsertOnlyShape(spark, tableDir)
    val fs = hfs(spark, tableDir)
    fs.mkdirs(new Path(tableDir))
    val name = f"delta_$writeId%07d_$writeId%07d" +
      stmtId.map(s => f"_$s%04d").getOrElse("")
    val dest = new Path(s"$tableDir/$name")
    require(!fs.exists(dest), s"write id $writeId already committed at $dest")
    val tmp = new Path(s"$tableDir/.graft_tmp_$name")
    batch.write.mode("overwrite").parquet(tmp.toString)
    // Spark leaves a _SUCCESS marker — exactly the empty-committed-write
    // signature the S18 sweep accepts; add the sidecar before the rename
    // so the delta appears fully formed
    if (sidecar.nonEmpty) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.createObjectNode()
      sidecar.foreach { case (k, v) => node.put(k, v) }
      val out = fs.create(new Path(tmp, "_graft_batch"), true)
      try out.write(node.toString.getBytes("UTF-8")) finally out.close()
    }
    require(fs.rename(tmp, dest), s"commit rename failed: $tmp -> $dest")
  }

  /** Test seam: deltas the most recent [[lastCommittedBatchId]] walk
    * examined before stopping — the T33 cadence pin: O(deltas newer
    * than this query's last commit), not O(table lifetime). */
  @volatile private[graft] var lastBatchIdDeltasScanned: Option[Int] = None

  /** NEWEST streaming-batch id recorded in a committed delta's sidecar
    * for `queryId` — the replay watermark for the T33 sink. Scans
    * deltas NEWEST-FIRST (write ids are dense and monotone) and stops
    * at the first sidecar carrying the query id, so the per-micro-batch
    * cost is O(deltas since this query's last commit), not O(table
    * lifetime) — the same quadratic-avoidance as the Hudi twin. */
  private[graft] def lastCommittedBatchId(spark: SparkSession, tableDir: String,
                                          queryId: String): Option[Long] = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    lastBatchIdDeltasScanned = Some(0) // nonexistent table: nothing examined
    if (!fs.exists(p)) return None
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val scanned = new java.util.concurrent.atomic.AtomicInteger
    val res = fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
      .flatMap(d => HiveAcid.parseDelta(d.getName).map(pd => (pd, d)))
      .sortBy { case (pd, _) => (-pd.maxWriteId, -pd.statementId) }
      .iterator
      .flatMap { case (_, d) =>
        scanned.incrementAndGet()
        val sc = new Path(d, "_graft_batch")
        if (!fs.exists(sc)) None
        else {
          val in = fs.open(sc)
          val bytes = try {
            val len = fs.getFileStatus(sc).getLen.toInt
            val b = new Array[Byte](len); in.readFully(b); b
          } finally in.close()
          val node = try mapper.readTree(bytes) catch { case _: Exception => null }
          val qid = if (node == null) null else node.get("streaming-query-id")
          val bid = if (node == null) null else node.get("streaming-batch-id")
          if (bid == null || qid == null || qid.asText() != queryId) None
          else bid.asText().toLongOption
        }
      }
      .nextOption()
    lastBatchIdDeltasScanned = Some(scanned.get)
    res
  }
}
