package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** T29: a Hudi COW table as a STREAMING SOURCE — the `.hoodie`
  * timeline's completed instants tailed as micro-batches, completing
  * the lakehouse-streaming triptych (T25 Iceberg snapshots, T27 Hive
  * ACID write ids, T29 Hudi instants). Offsets ARE instant times (what
  * the table's own timeline already provides, fixed-width digit
  * strings, lexicographic = commit order), so exactly-once needs no
  * side state: a restart replans the same (start, end] file diff over
  * immutable base files.
  *
  * Batch semantics:
  *  - the INITIAL batch (offset "") is the read-optimized snapshot AS
  *    OF the admitted end instant — the [[HudiRO]] selection (latest
  *    completed base file per file group, clustering replacecommits
  *    superseding their replaced groups), so a table with any history
  *    starts from a CONSISTENT point-in-time view;
  *  - every later batch admits whole COMMITS in (start, end]: the
  *    commit's newly stamped base files. This is exact for
  *    append-style commits (new file groups). A commit that REWRITES
  *    an existing file group (COW update/delete) carries the group's
  *    old rows inside its new base file: on a table WITH `_hoodie_*`
  *    record-level meta columns (what real Hudi writers produce) the
  *    drain row-filters every admitted file to
  *    `_hoodie_commit_time == instant` — exactly the rows the commit
  *    wrote — and the rewrite flows as UPSERTS (T29b; deletes do not
  *    emit — upsert-CDC, the T22 sink's contract). Without meta
  *    columns the stream FAILS FAST instead (the T25
  *    replace/overwrite discipline). A clustering replacecommit
  *    arriving mid-stream stays fail-fast either way (its file-group
  *    supersession is snapshot bookkeeping this diff-shaped drain
  *    does not track); clustering BEFORE the initial offset is served
  *    through the snapshot path.
  *  - an INFLIGHT instant (no completion marker) is invisible — its
  *    files are never admitted; when the marker lands, the commit is
  *    picked up whole on a later trigger (the polling discipline).
  *
  * Admission control (`maxCommitsPerTrigger`): at most N instants
  * admitted per micro-batch (T25b shape) — the initial catch-up
  * snapshot lands AS OF the Nth instant (still a consistent view) and
  * the remaining history drains over bounded per-commit batches.
  *
  * Scale shape: `latestOffset` is one timeline-directory listing
  * (bounded by commit cadence — the same metadata-scale sweep the
  * batch reader does); each batch plans one distributed scan over
  * exactly the admitted files, cost ∝ newly committed data. The
  * hive-style partition column rematerializes per file from its dir
  * name (unescaped), shipped as a per-partition constant.
  *
  * Reference semantics (no code shared): the public Hudi timeline /
  * base-file layout (HudiUtil.java:26-38 names the RO contract);
  * streaming tail semantics are this repo's own composition, mirroring
  * its Iceberg and Hive ACID sources. */
class HudiStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graft.sources.HudiStreamSource requires .load(tableDir)")
    HudiStream.tableSchema(path)
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HudiStreamTable(properties.get("path"), schema)
}

class HudiStreamTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-hudi-stream($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HudiStreamScanBuilder(path, tableSchema,
      Option(options.get("maxCommitsPerTrigger")).map(_.toInt))
}

class HudiStreamScanBuilder(path: String, fullSchema: StructType,
                            maxCommits: Option[Int])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft-hudi-stream $path cols=${required.fieldNames.mkString(",")}"
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new HudiMicroBatchStream(path, required, maxCommits,
        // T29b: real Hudi base files carry record-level meta columns;
        // their presence (in the TABLE schema, not the pruned
        // projection) upgrades rewrite commits from fail-fast to CDC
        hasMetaCols = fullSchema.fieldNames.contains("_hoodie_commit_time"))
  }
}

/** Offset = instant time ("" = before all history). */
case class HudiInstantOffset(instant: String) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val n = m.createObjectNode(); n.put("instant", instant)
    m.writeValueAsString(n)
  }
}

/** At most `max` commits admitted per micro-batch (T25b shape). */
case class ReadMaxCommits(max: Int) extends ReadLimit {
  require(max > 0, s"maxCommitsPerTrigger must be positive, got $max")
}

object HudiStream {
  private def spark = org.apache.spark.sql.SparkSession.active

  /** Current RO-view schema: the data columns of one visible base file
    * (a driver-side footer read) + the hive-style partition column as
    * a string (the batch reader's discovery convention, appended
    * last). */
  private[graft] def tableSchema(tableDir: String): StructType = {
    val tl = HudiRO.timeline(spark, tableDir)
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = HudiRO.listPartitionDirs(spark, tableDir)
    val first = dirs.iterator.flatMap { d =>
      val dirPath = if (d.isEmpty) tableDir else s"$tableDir/$d"
      val names = fs.listStatus(new Path(dirPath)).toSeq
        .filter(_.isFile).map(_.getPath.getName)
      HudiRO.selectLatest(names, tl.completed, tl.dead(d))
        .headOption.map(n => (d, s"$dirPath/$n"))
    }.toSeq.headOption
    require(first.nonEmpty, s"no completed Hudi base files under $tableDir")
    val data = spark.read.parquet(first.get._2).schema
    partitionCol(dirs) match {
      case Some(c) => StructType(data.fields :+ StructField(c, StringType))
      case None => data
    }
  }

  private[graft] def partitionCol(dirs: Seq[String]): Option[String] =
    dirs.find(_.contains("=")).map(_.split("=", 2)(0))

  /** Completed instants (commits AND replacecommits) in the timeline —
    * replacecommits are included so the end offset CROSSES them and
    * batch planning fails fast, instead of the stream silently
    * stalling just before one forever. */
  private[graft] def completedInstants(tableDir: String): Seq[String] = {
    val p = new Path(tableDir, ".hoodie")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$tableDir is not a Hudi table (no .hoodie timeline)")
    fs.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case n if n.endsWith(".commit") => n.stripSuffix(".commit")
      case n if n.endsWith(".replacecommit") => n.stripSuffix(".replacecommit")
    }.sorted
  }
}

class HudiMicroBatchStream(path: String, required: StructType,
                           maxCommits: Option[Int] = None,
                           hasMetaCols: Boolean = false)
    extends MicroBatchStream with SupportsAdmissionControl {
  private def spark = org.apache.spark.sql.SparkSession.active
  private def hconf = spark.sparkContext.hadoopConfiguration

  /** Newest completed instant successfully observed — the fallback
    * when a poll races transient filesystem trouble; instants are
    * monotone so answering an older one just defers pickup (the
    * polling discipline shared with T25/T27). */
  @volatile private var lastSeen = ""
  private def noteSeen(i: String): Unit = if (i > lastSeen) lastSeen = i

  /** Consecutive failed timeline polls. A transient IO hiccup defers
    * pickup one trigger (the T25/T27 polling discipline), but a
    * PERMANENTLY missing/deleted table must fail loudly like the batch
    * reader does — after this many consecutive failures the poll
    * rethrows instead of idling forever. */
  private var pollFailures = 0
  private val maxPollFailures = 3

  override def getDefaultReadLimit: ReadLimit =
    maxCommits.map(ReadMaxCommits(_): ReadLimit).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[HudiInstantOffset].instant
    noteSeen(from)
    val all = try {
      val r = HudiStream.completedInstants(path); pollFailures = 0; r
    } catch {
      case scala.util.control.NonFatal(e) =>
        pollFailures += 1
        if (pollFailures >= maxPollFailures) throw new IllegalStateException(
          s"$path: timeline poll failed $pollFailures consecutive times — " +
            "the table is likely missing or deleted, not transiently slow", e)
        Seq.empty
    }
    all.lastOption.foreach(noteSeen)
    val end = limit match {
      case ReadMaxCommits(max) =>
        val pending = all.filter(_ > from)
        if (pending.isEmpty) from else pending.take(max).last
      case _ => lastSeen
    }
    HudiInstantOffset(if (end > from) end else from)
  }

  override def reportLatestOffset(): Offset = HudiInstantOffset(lastSeen)

  override def latestOffset(): Offset = throw new IllegalStateException(
    "latestOffset(Offset, ReadLimit) should be called instead (SupportsAdmissionControl)")

  override def initialOffset(): Offset = HudiInstantOffset("")

  override def deserializeOffset(json: String): Offset = {
    val inst = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json).get("instant").asText()
    noteSeen(inst)
    HudiInstantOffset(inst)
  }

  /** (from, to] → input files. From "" it is the RO snapshot as of
    * `to`; otherwise the per-commit file diff, failing fast on
    * rewrites and mid-stream clustering (scaladoc contract above). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[HudiInstantOffset].instant
    val to = end.asInstanceOf[HudiInstantOffset].instant
    noteSeen(to)
    if (to <= from) return Array.empty
    val fs = new Path(path).getFileSystem(hconf)
    val dirs = HudiRO.listPartitionDirs(spark, path)
    val parts: Seq[HudiStreamInputPartition] =
      if (from.isEmpty) {
        // initial batch: the consistent RO snapshot as of `to` — full
        // rows, no commit-time filter (point-in-time state, not a diff)
        val tl = HudiRO.timeline(spark, path, asOf = Some(to))
        dirs.flatMap { d =>
          val dirPath = if (d.isEmpty) path else s"$path/$d"
          val names = fs.listStatus(new Path(dirPath)).toSeq
            .filter(_.isFile).map(_.getPath.getName)
          HudiRO.selectLatest(names, tl.completed, tl.dead(d))
            .map(n => HudiStreamInputPartition(s"$dirPath/$n", partValue(d), null))
        }
      } else {
        // drain: whole commits in (from, to]
        val tlNames = fs.listStatus(new Path(path, ".hoodie")).toSeq
          .map(_.getPath.getName)
        val replacing = tlNames.filter(_.endsWith(".replacecommit"))
          .map(_.stripSuffix(".replacecommit")).filter(i => i > from && i <= to)
        if (replacing.nonEmpty) throw new IllegalStateException(
          s"$path: clustering replacecommit ${replacing.head} inside the " +
            "admitted range — a replacecommit is a pure rewrite; replaying its " +
            "base files as inserts would duplicate rows. Restart the stream " +
            "from a fresh checkpoint (its initial snapshot supersedes " +
            "clustering) or stop clustering the streamed table.")
        val admitted = tlNames.filter(_.endsWith(".commit"))
          .map(_.stripSuffix(".commit")).filter(i => i > from && i <= to).toSet
        // Only COMPLETED older instants make a commit a rewrite: an
        // orphan base file from an aborted/inflight instant was never
        // visible, so a new commit stamping the same fileId is a plain
        // insert, not a rewrite.
        val completedAll = tlNames.collect {
          case n if n.endsWith(".commit") => n.stripSuffix(".commit")
          case n if n.endsWith(".replacecommit") => n.stripSuffix(".replacecommit")
        }.toSet
        dirs.flatMap { d =>
          val dirPath = if (d.isEmpty) path else s"$path/$d"
          val names = fs.listStatus(new Path(dirPath)).toSeq
            .filter(_.isFile).map(_.getPath.getName)
          val parsed = names.flatMap(HudiRO.parseFile)
          val fresh = parsed.filter(b => admitted(b.instant))
          fresh.foreach { b =>
            val older = parsed.exists(o => o.fileId == b.fileId &&
              o.instant < b.instant && completedAll(o.instant))
            // T29b: with record-level meta columns, a COW rewrite is
            // row-filterable to exactly its changed rows (below) —
            // only a meta-less table must fail fast.
            if (older && !hasMetaCols) throw new IllegalStateException(
              s"$path/$d: commit ${b.instant} REWRITES file group ${b.fileId} " +
                "(COW update/delete) — its new base file carries the group's " +
                "old rows and replaying it as inserts would duplicate. This " +
                "stream is append-only without _hoodie_* meta columns; serve " +
                "rewritten groups through the read-optimized batch reader " +
                "(HudiRO.read) instead, or write meta columns for CDC.")
          }
          // T29b CDC: on a meta-column table EVERY drained file is
          // filtered to the rows its own commit actually wrote
          // (_hoodie_commit_time == instant): a rewrite emits exactly
          // its changed rows as upserts (carried rows keep their
          // original commit time and drop out), a fresh file group
          // passes through whole (all rows stamped by the creating
          // commit). Deletes do not emit — this is the upsert-CDC
          // shape (the T22 sink's contract), not tombstone CDC.
          fresh.sortBy(b => (b.instant, b.name))
            .map(b => HudiStreamInputPartition(s"$dirPath/${b.name}", partValue(d),
              if (hasMetaCols) b.instant else null))
        }
      }
    parts.toArray
  }

  private def partValue(d: String): String =
    if (!d.contains("=")) null
    else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(d.split("=", 2)(1))

  override def createReaderFactory(): PartitionReaderFactory = {
    val pcol = HudiStream.partitionCol(HudiRO.listPartitionDirs(spark, path))
    new HudiStreamReaderFactory(required, pcol,
      HadoopConfBroadcast.get(spark.sparkContext, hconf))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** `commitFilter`: non-null on a T29b CDC drain — only rows whose
  * `_hoodie_commit_time` equals it are emitted (the rows this commit
  * actually wrote); null = emit every row (snapshot / meta-less). */
case class HudiStreamInputPartition(file: String, partValue: String,
                                    commitFilter: String = null)
    extends InputPartition

/** Per-file parquet reader = the shared pruned-projection reader
  * (name resolution — Hudi base files carry no Iceberg field ids),
  * with the hive-style partition column rematerialized as a
  * per-partition constant (the column does not exist inside the
  * file) and, on CDC drains, the `_hoodie_commit_time == instant` row
  * filter applied executor-side (the filter column is added to the
  * file projection when the query itself didn't ask for it, then
  * projected away). */
class HudiStreamReaderFactory(required: StructType, pcol: Option[String],
                              conf: org.apache.spark.broadcast.Broadcast[SerializableHadoopConf])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HudiStreamInputPartition]
    val pIdx = pcol.map(c => required.fieldNames.indexOf(c)).filter(_ >= 0)
    // columns read from the file = required minus the partition col
    val dataRequired = StructType(pIdx match {
      case Some(idx) => required.fields.zipWithIndex.filter(_._2 != idx).map(_._1)
      case None => required.fields
    })
    val filtering = p.commitFilter != null
    val ctInData = dataRequired.fieldNames.indexOf("_hoodie_commit_time")
    val readSchema =
      if (!filtering || ctInData >= 0) dataRequired
      else StructType(dataRequired.fields :+
        StructField("_hoodie_commit_time", StringType))
    val ctIdx = if (!filtering) -1
      else if (ctInData >= 0) ctInData else dataRequired.length
    val inner = new IcebergPartitionReader(p.file, readSchema, Map.empty, conf)
    if (!filtering && pIdx.isEmpty) return inner // plain append drain / snapshot
    // required index -> file-projection index (-1 = the partition col)
    val srcIdx = new Array[Int](required.length)
    var j = 0
    for (i <- required.indices) {
      if (pIdx.contains(i)) srcIdx(i) = -1 else { srcIdx(i) = j; j += 1 }
    }
    val pv = if (p.partValue == null) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(p.partValue)
    val want = if (!filtering) null
      else org.apache.spark.unsafe.types.UTF8String.fromString(p.commitFilter)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (!filtering || {
            val v = r.getUTF8String(ctIdx); v != null && v.equals(want)
          }) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow = {
        val out = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(required.length)
        var i = 0
        while (i < required.length) {
          if (srcIdx(i) < 0) out.update(i, pv)
          else out.update(i, cur.get(srcIdx(i), dataRequired(srcIdx(i)).dataType))
          i += 1
        }
        out
      }
      override def close(): Unit = inner.close()
    }
  }
}
