package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hudi copy-on-write table reads (read-optimized view), built from the
  * PUBLIC Hudi table layout — the third lakehouse format family the
  * reference reads (after Iceberg S16* and Hive ACID S18*).
  *
  * Reference behavior (semantics only, no code shared):
  * apache-impala-4.1.0 `fe/src/main/java/org/apache/impala/util/
  * HudiUtil.java:26-38` — "return a list of file status contains only
  * the latest version parquet files" per file group, delegated to
  * Hudi's own `HoodieROTablePathFilter`; format registration at
  * `catalog/HdfsFileFormat.java:80` (HUDI_PARQUET). This source
  * re-expresses what that filter does from the public layout spec:
  *
  * {{{
  *   table_dir/
  *     .hoodie/
  *       20240101093000000.commit            -- COMPLETED instant
  *       20240102110000000.inflight          -- in-progress (invisible)
  *       20240102110000000.commit.requested
  *       hoodie.properties
  *     status=F/                              -- hive-style partition dir
  *       .hoodie_partition_metadata
  *       <fileId>_<writeToken>_<instantTime>.parquet
  * }}}
  *
  * Read-optimized COW semantics: a data file belongs to a FILE GROUP
  * (the fileId prefix of its name); every commit that updates a group
  * rewrites it WHOLE as a new base file stamped with the commit's
  * instant time. The visible snapshot keeps, per (partition, fileId),
  * only the file whose instant is (a) COMPLETED in the timeline (a
  * `<instant>.commit` marker exists — an inflight writer's file is
  * invisible) and (b) maximal among those. Instants are fixed-width
  * digit strings ordered lexicographically (the public timeline
  * ordering).
  *
  * Scale design: exactly the S19 discipline — the `.hoodie` timeline
  * and per-partition file listings are driver-side NAME-level work,
  * bounded by commit cadence and file-group count (the same
  * metadata-scale sweep `HoodieROTablePathFilter` does); partition
  * PRUNING cuts dirs before any listing; the selected files feed ONE
  * distributed parquet scan with full pushdown. No per-row driver
  * work.
  *
  * Fixture note: real Hudi files carry `_hoodie_*` meta columns as
  * ordinary leading columns; the reference reads them as table columns
  * and so would this parquet scan — the fixtures omit them because the
  * RO selection logic never consults them (it is purely name-level). */
object HudiRO {

  /** `<fileId>_<writeToken>_<instantTime>.parquet` (public Hudi
    * FSUtils base-file naming; fileId may itself contain '_' so the
    * token+instant match anchors at the END). */
  private val FilePat = """(.+)_([0-9]+-[0-9]+-[0-9]+)_([0-9]+)\.parquet""".r

  private[graft] final case class BaseFile(fileId: String, instant: String,
                                           name: String)

  private[graft] def parseFile(name: String): Option[BaseFile] = name match {
    case FilePat(fid, _, instant) => Some(BaseFile(fid, instant, name))
    case _ => None
  }

  /** The visible-timeline facts a read-optimized scan needs: which
    * instants COMPLETED, and which file groups a completed clustering
    * replacecommit killed (keyed by relative partition path; "" for an
    * unpartitioned table). */
  private[graft] final case class Timeline(completed: Set[String],
                                           replaced: Map[String, Set[String]]) {
    def dead(partitionDir: String): Set[String] =
      replaced.getOrElse(partitionDir, Set.empty)
  }

  /** Read the timeline: `<instant>.commit` markers are completed
    * writes (an `.inflight` / `.commit.requested` without its
    * completion marker is a writer mid-flight — its files must stay
    * invisible). A completed `<instant>.replacecommit` (clustering)
    * BOTH completes its own new base files and kills the file groups
    * named in its JSON body's `partitionToReplaceFileIds` (the public
    * Hudi timeline-metadata field — reference parity:
    * HoodieROTablePathFilter handles clustered tables, HudiUtil.java:
    * 26-38). A replacecommit body the parser does not recognize stays
    * a LOUD refusal — reading on would silently duplicate replaced
    * rows (the Iceberg-v2-deletes discipline). */
  /** Parsed replacecommit bodies, cached per immutable file
    * (path+length+mtime — completed commits never change; the S20g
    * discipline applied to the READ side too): a long-lived reader or
    * stream re-plans the timeline every batch, and without this each
    * re-plan re-read every clustering body on disk. Per-entry LRU,
    * never clear-all (a >cap timeline must keep its working set). A
    * REFUSAL (unparsable body) is deliberately NOT cached: the file
    * could be fixed in place, and refusing is already the slow path. */
  private val replaceCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[(String, Long, Long), Map[String, Set[String]]](
        1024, 0.75f, /* accessOrder = */ true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[(String, Long, Long), Map[String, Set[String]]]): Boolean =
          size() > 65536
      })

  private def parseReplaceBody(fs: org.apache.hadoop.fs.FileSystem,
                               tableDir: String, fp: Path,
                               n: String): Map[String, Set[String]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(fp)
    val bytes = try {
      val len = fs.getFileStatus(fp).getLen.toInt
      val b = new Array[Byte](len); in.readFully(b); b
    } finally in.close()
    val node = try mapper.readTree(bytes) catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$tableDir/.hoodie/$n: clustering replacecommit body is not JSON — " +
          "refusing to read (the replaced file groups are only named there); " +
          s"cause: ${e.getMessage}")
    }
    val ptr = if (node == null) null else node.get("partitionToReplaceFileIds")
    require(ptr != null && ptr.isObject,
      s"$tableDir/.hoodie/$n: replacecommit body carries no " +
        "partitionToReplaceFileIds object — unrecognized shape, refusing " +
        "to read (reading on would duplicate replaced rows)")
    val out = scala.collection.mutable.HashMap.empty[String, Set[String]]
    val it = ptr.fields()
    while (it.hasNext) {
      val e = it.next()
      val arr = e.getValue
      require(arr.isArray,
        s"$tableDir/.hoodie/$n: partitionToReplaceFileIds['${e.getKey}'] " +
          "is not an array — unrecognized shape, refusing to read")
      val ids = (0 until arr.size()).map { i =>
        val v = arr.get(i)
        require(v.isTextual,
          s"$tableDir/.hoodie/$n: non-string fileId in " +
            s"partitionToReplaceFileIds['${e.getKey}'] — refusing to read")
        v.asText()
      }.toSet
      out(e.getKey) = out.getOrElse(e.getKey, Set.empty) ++ ids
    }
    out.toMap
  }

  private[graft] def timeline(spark: SparkSession, tableDir: String,
                              asOf: Option[String] = None): Timeline = {
    val p = new Path(tableDir, ".hoodie")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$tableDir is not a Hudi table (no .hoodie timeline)")
    // asOf: the timeline AS OF an instant (inclusive) — instants are
    // fixed-width digit strings, lexicographic = commit order; marker
    // files without a digit prefix (hoodie.properties) pass through
    val statuses = fs.listStatus(p).toSeq.filter { s =>
      val n = s.getPath.getName
      asOf.forall { max =>
        val inst = n.takeWhile(_.isDigit); inst.isEmpty || inst <= max
      }
    }
    val names = statuses.map(_.getPath.getName)
    val commits = names.filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit")).toSet
    val replaced = scala.collection.mutable.HashMap.empty[String, Set[String]]
    val replacecommits = statuses.filter(_.getPath.getName.endsWith(".replacecommit"))
    replacecommits.foreach { s =>
      val key = (s.getPath.toString, s.getLen, s.getModificationTime)
      val hit = replaceCache.get(key)
      val body =
        if (hit != null) hit
        else {
          // parse outside the map lock; duplicate parse of an
          // immutable file is harmless and yields the same value
          val parsed = parseReplaceBody(fs, tableDir, s.getPath, s.getPath.getName)
          replaceCache.put(key, parsed)
          parsed
        }
      body.foreach { case (part, ids) =>
        replaced(part) = replaced.getOrElse(part, Set.empty) ++ ids
      }
    }
    Timeline(commits ++ replacecommits.map(_.getPath.getName.stripSuffix(".replacecommit")),
      replaced.toMap)
  }

  /** Latest completed base file per file group among `names`, minus
    * `dead` file groups (clustering-replaced) — the
    * HoodieROTablePathFilter decision, name-level. */
  private[graft] def selectLatest(names: Seq[String], completed: Set[String],
                                  dead: Set[String] = Set.empty): Seq[String] =
    names.flatMap(parseFile)
      .filter(b => completed(b.instant) && !dead(b.fileId))
      .groupBy(_.fileId)
      .values.map(_.maxBy(_.instant)).toSeq // lexicographic = timeline order
      .map(_.name)
      .sorted

  /** Hive-style partition dirs (`col=value`) carrying the
    * `.hoodie_partition_metadata` marker; an UNPARTITIONED table keeps
    * its files at the root (returned as the single "" partition). */
  private[graft] def listPartitionDirs(spark: SparkSession,
                                       tableDir: String): Seq[String] = {
    val p = new Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
      .filter(d => fs.exists(new Path(s"$tableDir/$d/.hoodie_partition_metadata")))
    if (dirs.nonEmpty) dirs.sorted else Seq("")
  }

  /** Read the read-optimized view. `partitions` non-empty prunes to
    * those partition VALUES on the driver before any file listing (the
    * S19 pruning shape); dir segments Hive-UNESCAPE before the pruning
    * comparison (a value with space/':'/'%' escapes in the path — the
    * user supplies the raw value, the reference unescapes the same
    * way).
    *
    * Scale design: ALL selected files feed ONE parquet relation
    * (`basePath`-anchored), so a 1000-partition table plans a single
    * scan node — not a 1000-relation union (driver plan-size cost
    * nothing bounds for Hudi, unlike S19's spec-bounded list). Spark's
    * own partition discovery rematerializes the partition column from
    * the `col=value` dir names (unescaping them); type inference is
    * pinned OFF for the discovery so the column is deterministically a
    * string (a "01" partition must not round-trip as int 1). */
  def read(spark: SparkSession, tableDir: String,
           partitions: Seq[String] = Nil): DataFrame = {
    val files = snapshotFiles(spark, tableDir, partitions)
    require(files.nonEmpty, s"no completed Hudi base files under $tableDir")
    readFiles(spark, tableDir, files)
  }

  /** The visible snapshot's base-file paths (the same name-level
    * selection [[read]] scans), for callers that prune the list further
    * before scanning — the S20d upsert key-locator reads only files
    * whose footer key range intersects its batch. */
  private[graft] def snapshotFiles(spark: SparkSession, tableDir: String,
                                   partitions: Seq[String] = Nil): Seq[String] = {
    val tl = timeline(spark, tableDir)
    val fs = new Path(tableDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val want = partitions.toSet
    val dirs = listPartitionDirs(spark, tableDir).filter { d =>
      want.isEmpty || d.split("=", 2).lastOption
        .map(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName)
        .exists(want)
    }
    require(dirs.nonEmpty, s"no Hudi partitions selected under $tableDir")
    dirs.flatMap { d =>
      val dirPath = if (d.isEmpty) tableDir else s"$tableDir/$d"
      val names = fs.listStatus(new Path(dirPath)).toSeq
        .filter(_.isFile).map(_.getPath.getName)
      // an all-inflight/replaced partition is a valid empty slice
      selectLatest(names, tl.completed, tl.dead(d)).map(n => s"$dirPath/$n")
    }
  }

  /** ONE parquet relation over an explicit base-file subset (paths from
    * [[snapshotFiles]]); partitioned tables rematerialize the partition
    * column from the `col=value` path segment, pinned to STRING. */
  private[graft] def readFiles(spark: SparkSession, tableDir: String,
                               files: Seq[String]): DataFrame = {
    require(files.nonEmpty, s"no Hudi base files to read under $tableDir")
    val partitioned = files.exists(f =>
      f.stripPrefix(tableDir).stripPrefix("/").contains("="))
    if (!partitioned) spark.read.parquet(files: _*)
    else {
      // Pin the partition column to STRING via an explicit user schema
      // (data fields from the first selected file's footer + the
      // partition column appended, the discovery order) instead of
      // toggling the session-global type-inference conf — a concurrent
      // query on the same SparkSession must never observe a flipped
      // conf, and two overlapping reads could restore a stale value.
      val pcol = files.find(f => f.stripPrefix(tableDir).contains("=")).get
        .stripPrefix(tableDir).stripPrefix("/").split("=", 2)(0)
      val data = spark.read.parquet(files.head).schema
      val full = org.apache.spark.sql.types.StructType(
        data.fields :+ org.apache.spark.sql.types.StructField(
          pcol, org.apache.spark.sql.types.StringType))
      spark.read.schema(full).option("basePath", tableDir).parquet(files: _*)
    }
  }
}

/** Oracle-checked Hudi coverage: a COW layout built from the flat
  * `orders` parquet — two completed commits (the second REWRITES file
  * group fg0, dropping its odd keys: the copy-on-write delete) and one
  * INFLIGHT commit whose file must stay invisible. DuckDB recomputes
  * the visible slice from flat parquet; a hash match certifies latest-
  * version-per-file-group selection, inflight exclusion, and the
  * partition-column rematerialization.
  *
  * Per o_orderstatus partition:
  *   fg0 @ c1 (commit): o_orderkey % 4 IN (0, 1)
  *   fg1 @ c1 (commit): o_orderkey % 4 = 2
  *   fg0 @ c2 (commit): o_orderkey % 4 = 0      -- supersedes fg0@c1
  *   fg2 @ c3 (INFLIGHT): o_orderkey % 4 = 3    -- invisible
  *   → visible: o_orderkey % 4 IN (0, 2)
  */
object HudiQueries {
  import graft.operators.Exact

  def path(dir: String): String =
    s"/tmp/graft_hudi_orders_${new java.io.File(dir).getName}"

  private val C1 = "20240101000000000"
  private val C2 = "20240102000000000"
  private val C3 = "20240103000000000"
  private val C4 = "20240104000000000"

  /** Write `df` as ONE parquet file at `filePath` (Hudi base files are
    * single files named by the fileId/instant contract). Fixture-only
    * single-file rename, same device as the S18c original-file writer. */
  private[graft] def writeSingleFile(df: DataFrame, filePath: String): Unit = {
    val spark = df.sparkSession
    val tmp = filePath + "_tmp"
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(tmp).getFileSystem(conf)
    val part = fs.listStatus(new Path(tmp))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    fs.rename(part, new Path(filePath))
    fs.delete(new Path(tmp), true)
  }

  private def touch(spark: SparkSession, p: String): Unit = {
    val hp = new Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).create(hp, true).close()
  }

  private def writeText(spark: SparkSession, p: String, body: String): Unit = {
    val hp = new Path(p)
    val out = hp.getFileSystem(spark.sparkContext.hadoopConfiguration).create(hp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  def ensureTable(spark: SparkSession, dir: String): String = {
    val root = path(dir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$root/_built"))) {
      val orders = graft.Tables(spark, dir).orders
      val statuses = orders.select("o_orderstatus").distinct()
        .collect().map(_.getString(0)).sorted // bounded domain (3 values)
      fs.mkdirs(new Path(s"$root/.hoodie"))
      touch(spark, s"$root/.hoodie/hoodie.properties")
      statuses.foreach { st =>
        val pdir = s"$root/o_orderstatus=$st"
        fs.mkdirs(new Path(pdir))
        touch(spark, s"$pdir/.hoodie_partition_metadata")
        val slice = orders.filter(col("o_orderstatus") === st).drop("o_orderstatus")
        def m4(r: Long*) = slice.filter(pmod(col("o_orderkey"), lit(4L)).isin(r: _*))
        writeSingleFile(m4(0L, 1L), s"$pdir/fg0_0-0-0_$C1.parquet")
        writeSingleFile(m4(2L), s"$pdir/fg1_0-0-0_$C1.parquet")
        writeSingleFile(m4(0L), s"$pdir/fg0_0-0-0_$C2.parquet") // COW rewrite
        writeSingleFile(m4(3L), s"$pdir/fg2_0-0-0_$C3.parquet") // inflight
      }
      touch(spark, s"$root/.hoodie/$C1.commit")
      touch(spark, s"$root/.hoodie/$C2.commit")
      touch(spark, s"$root/.hoodie/$C3.inflight")
      touch(spark, s"$root/.hoodie/$C3.commit.requested")
      touch(spark, s"$root/_built")
    }
    root
  }

  def clusterPath(dir: String): String =
    s"/tmp/graft_hudi_cluster_${new java.io.File(dir).getName}"

  /** A CLUSTERED table: C1 writes fg0 (keys %4 ∈ {0,1}) + fg1 (%4=2),
    * C2 is a completed `.replacecommit` whose body names fg0+fg1 as
    * replaced per partition and whose new base file fgc carries their
    * union, C3 commits fg4 (%4=3). Visible = ALL orders rows — but
    * ONLY if the reader both admits the replacecommit's own file AND
    * excludes the replaced groups (ignoring the body would double
    * every %4 ∈ {0,1,2} row, which the oracle hash catches). */
  def ensureClusteredTable(spark: SparkSession, dir: String): String = {
    val root = clusterPath(dir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$root/_built"))) {
      val orders = graft.Tables(spark, dir).orders
      val statuses = orders.select("o_orderstatus").distinct()
        .collect().map(_.getString(0)).sorted // bounded domain (3 values)
      fs.mkdirs(new Path(s"$root/.hoodie"))
      touch(spark, s"$root/.hoodie/hoodie.properties")
      statuses.foreach { st =>
        val pdir = s"$root/o_orderstatus=$st"
        fs.mkdirs(new Path(pdir))
        touch(spark, s"$pdir/.hoodie_partition_metadata")
        val slice = orders.filter(col("o_orderstatus") === st).drop("o_orderstatus")
        def m4(r: Long*) = slice.filter(pmod(col("o_orderkey"), lit(4L)).isin(r: _*))
        writeSingleFile(m4(0L, 1L), s"$pdir/fg0_0-0-0_$C1.parquet")
        writeSingleFile(m4(2L), s"$pdir/fg1_0-0-0_$C1.parquet")
        writeSingleFile(m4(0L, 1L, 2L), s"$pdir/fgc_0-0-0_$C2.parquet") // clustered
        writeSingleFile(m4(3L), s"$pdir/fg4_0-0-0_$C3.parquet")
      }
      touch(spark, s"$root/.hoodie/$C1.commit")
      // the public HoodieReplaceCommitMetadata JSON shape: replaced
      // file groups keyed by relative partition path
      val perPart = statuses.map(st =>
        s""""o_orderstatus=$st": ["fg0", "fg1"]""").mkString(", ")
      writeText(spark, s"$root/.hoodie/$C2.replacecommit",
        s"""{"partitionToWriteStats": {}, "compacted": false,
           | "operationType": "CLUSTER",
           | "partitionToReplaceFileIds": {$perPart}}""".stripMargin)
      touch(spark, s"$root/.hoodie/$C3.commit")
      touch(spark, s"$root/_built")
    }
    root
  }

  def sinkPath(dir: String): String =
    s"/tmp/graft_hudi_sink_${new java.io.File(dir).getName}"

  /** S20d oracle fixture: the table is built by [[HudiSink]] ITSELF —
    * no hand-laid files. C1 INSERTs all orders (partitioned by
    * o_orderstatus, key o_orderkey, split into ~4000-row file groups);
    * C2 UPSERTs one batch carrying updates (keys %10==3 get +1000
    * price — their groups rewrite, carried rows keep their C1 meta)
    * and inserts (key shifted past the table max for %1000==1 — new file groups); C3
    * DELETEs every then-current key with key%7==5 (group rewrites,
    * empty groups get empty base files). DuckDB recomputes the final
    * state from flat orders; a hash match certifies the whole
    * write→read loop: group routing, COW rewrite supersession, carried
    * vs stamped meta rows, delete-to-empty visibility. */
  def ensureSinkTable(spark: SparkSession, dir: String): String = {
    val root = sinkPath(dir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$root/_built"))) {
      val orders = graft.Tables(spark, dir).orders
      HudiSink.insert(orders, root, "o_orderkey", Some("o_orderstatus"), C1,
        recordsPerGroup = 4000L)
      val updates = orders.filter(pmod(col("o_orderkey"), lit(10L)) === 3L)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
      // insert-key shift DERIVED from the table's own max key (max+1):
      // a fixed 20M shift collided with real orderkeys once the max key
      // passed 20M (SF>~3.3), silently turning an 'insert' into an
      // update while the oracle's UNION ALL kept both rows — the oracle
      // computes the same (SELECT max(o_orderkey)+1 FROM orders)
      val shift = orders.agg(max("o_orderkey")).head.getLong(0) + 1L
      val inserts = orders.filter(pmod(col("o_orderkey"), lit(1000L)) === 1L)
        .withColumn("o_orderkey", col("o_orderkey") + lit(shift))
      HudiSink.upsert(updates.unionByName(inserts), root, "o_orderkey",
        Some("o_orderstatus"), C2)
      val delKeys = HudiRO.read(spark, root)
        .filter(pmod(col("o_orderkey"), lit(7L)) === 5L).select("o_orderkey")
      HudiSink.delete(delKeys, root, "o_orderkey", C3)
      touch(spark, s"$root/_built")
    }
    root
  }

  /** S20e: the sink table CLUSTERED by the writer's own maintenance
    * commit — the visible slice must be row-identical to
    * `src_hudi_write_rt` (clustering is layout work, not data change),
    * which only holds if the reader BOTH admits the replacecommit's
    * new files AND kills the replaced groups its body names. */
  def ensureClusteredSink(spark: SparkSession, dir: String): String = {
    val root = ensureSinkTable(spark, dir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$root/_clustered"))) {
      HudiSink.cluster(spark, root, C4)
      touch(spark, s"$root/_clustered")
    }
    root
  }

  type Q = (SparkSession, String) => DataFrame

  private def agg(df: DataFrame): DataFrame =
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("nd_cust"),
        Exact.dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")

  val queries: Map[String, Q] = Map(
    "src_hudi_ro" -> ((spark, dir) =>
      agg(HudiRO.read(spark, ensureTable(spark, dir)))),
    // pruned read: only the named partition's dir is ever listed
    "src_hudi_prune" -> ((spark, dir) =>
      agg(HudiRO.read(spark, ensureTable(spark, dir), partitions = Seq("F")))),
    // clustering: the replacecommit's new file is visible, the
    // replaced file groups are dead (body-parsed, not name-level)
    "src_hudi_cluster" -> ((spark, dir) =>
      agg(HudiRO.read(spark, ensureClusteredTable(spark, dir)))),
    // S20d: insert→upsert→delete through the WRITER, read back RO
    "src_hudi_write_rt" -> ((spark, dir) =>
      agg(HudiRO.read(spark, ensureSinkTable(spark, dir)))),
    // S20e: the WRITER's clustering replacecommit — same visible rows
    "src_hudi_write_cluster" -> ((spark, dir) =>
      agg(HudiRO.read(spark, ensureClusteredSink(spark, dir)))),
  )

  val oracles: Map[String, String] = Map(
    "src_hudi_ro" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |  count(DISTINCT o_custkey) AS nd_cust,
         |  ${Exact.sqlSum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM orders WHERE o_orderkey % 4 IN (0, 2)
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "src_hudi_prune" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |  count(DISTINCT o_custkey) AS nd_cust,
         |  ${Exact.sqlSum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM orders WHERE o_orderkey % 4 IN (0, 2) AND o_orderstatus = 'F'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // post-clustering visible slice = every row, exactly once: a
    // reader that ignored partitionToReplaceFileIds would double
    // %4 ∈ {0,1,2} and hash-mismatch
    "src_hudi_cluster" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |  count(DISTINCT o_custkey) AS nd_cust,
         |  ${Exact.sqlSum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM orders
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // writer round trip: insert all, upsert (+1000 on %10==3 keys;
    // new keys shifted past max(o_orderkey) for %1000==1 sources), delete keys %7==5
    "src_hudi_write_rt" ->
      s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
         |    o_custkey, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 1000 = 1)
         |SELECT o_orderstatus, count(*) AS n,
         |  count(DISTINCT o_custkey) AS nd_cust,
         |  ${Exact.sqlSum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM upd WHERE o_orderkey % 7 <> 5
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // clustering preserves the visible slice exactly — same oracle as
    // the pre-clustering round trip; a reader that ignored the
    // writer's replacecommit body would double every row
    "src_hudi_write_cluster" ->
      s"""WITH upd AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |    CASE WHEN o_orderkey % 10 = 3 THEN o_totalprice + 1000.0
         |         ELSE o_totalprice END AS o_totalprice
         |  FROM orders
         |  UNION ALL
         |  SELECT o_orderkey + (SELECT max(o_orderkey) + 1 FROM orders),
         |    o_custkey, o_orderstatus, o_totalprice
         |  FROM orders WHERE o_orderkey % 1000 = 1)
         |SELECT o_orderstatus, count(*) AS n,
         |  count(DISTINCT o_custkey) AS nd_cust,
         |  ${Exact.sqlSum("o_totalprice")} AS sum_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM upd WHERE o_orderkey % 7 <> 5
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
