package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partitioned table with a DIFFERENT file format per partition — the
  * reference reads these routinely (an Impala partitioned table carries
  * a per-partition file-format descriptor and the scan node picks a
  * scanner per partition: `fe/src/main/java/org/apache/impala/catalog/
  * HdfsPartition.java` fileFormatDescriptor; scanner dispatch in
  * `be/src/exec/hdfs-scan-node-base.cc`). Spark tables are
  * single-format, so this is a thin table layer: a `_mixed_spec.json`
  * at the table root declares the schema, the partition column, and
  * each partition's (value, dir, format); the reader dispatches every
  * partition to the matching existing reader (parquet built-in, Avro /
  * RCFile / SequenceFile DSv2 sources in this package), normalizes to
  * the declared schema, and unions.
  *
  * Scale design: partition PRUNING happens on the driver against the
  * spec's bounded partition list — pruned partitions are never listed,
  * never opened (the same metadata-level pruning HMS gives Impala).
  * Each kept partition is one distributed scan with that format's own
  * pushdown; the union is plan-level (no shuffle — UnionExec
  * concatenates partitions). Format-specific row codecs mirror the
  * single-format sources: RCFile stores strings (cast back on read),
  * SequenceFile packs key = first column / value = '\u0001'-joined rest
  * (text-shaped column last, the S14 convention).
  */
object MixedFormat {

  final case class PartitionSpec(value: String, dir: String, format: String)
  final case class TableSpec(partitionCol: String, partitionType: DataType,
                             schema: StructType, partitions: Seq[PartitionSpec])

  private val mapper = new ObjectMapper()
  private val SpecFile = "_mixed_spec.json"

  /** Write `df` as a mixed-format table partitioned by `partitionCol`,
    * cycling partition formats through `formats` in sorted-value order
    * (deterministic assignment). */
  def write(df: DataFrame, path: String, partitionCol: String,
            formats: Seq[String]): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    val dataSchema = StructType(df.schema.filterNot(_.name == partitionCol))
    // bounded driver-side collect: the DISTINCT partition-value domain
    // (the same metadata-scale set HMS hands Impala), never row data
    val values = df.select(partitionCol).distinct().collect()
      .map(_.get(0).toString).sorted.toSeq
    val parts = values.zipWithIndex.map { case (v, i) =>
      PartitionSpec(v, s"$partitionCol=$v", formats(i % formats.length))
    }
    for (p <- parts) {
      val slice = df.filter(col(partitionCol) === p.value).drop(partitionCol)
      val dir = s"$path/${p.dir}"
      p.format match {
        case "parquet"      => slice.write.mode("overwrite").parquet(dir)
        case "orc"          => slice.write.mode("overwrite").orc(dir)
        case "avro"         => AvroIO.write(slice, dir)
        case "rcfile"       =>
          RcIO.write(slice.select(dataSchema.map(f =>
            col(f.name).cast("string").as(f.name)): _*), dir)
        case "sequencefile" =>
          val rest = dataSchema.fields.drop(1).map(f =>
            coalesce(col(f.name).cast("string"), lit("")))
          SequenceIO.write(slice.select(
            col(dataSchema.head.name).cast("string").as("key"),
            concat_ws("\u0001", rest.toIndexedSeq: _*).as("value")), dir)
        case other => throw new IllegalArgumentException(s"unknown format $other")
      }
    }
    val root = mapper.createObjectNode()
    root.put("partitionCol", partitionCol)
    // the partition column TYPE must survive the string-keyed spec, or
    // read() would rematerialize an int/date partition as a string
    // (lexicographic sorts, failed unions, miscast range predicates)
    root.put("partitionType", df.schema(partitionCol).dataType.sql)
    val sch = root.putArray("schema")
    dataSchema.foreach { f =>
      val fn = mapper.createArrayNode()
      fn.add(f.name); fn.add(f.dataType.sql)
      sch.add(fn)
    }
    val ps = root.putArray("partitions")
    parts.foreach { p =>
      val pn = mapper.createObjectNode()
      pn.put("value", p.value); pn.put("dir", p.dir); pn.put("format", p.format)
      ps.add(pn)
    }
    val out = fs.create(new Path(path, SpecFile), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
    finally out.close()
  }

  def readSpec(spark: SparkSession, path: String): TableSpec = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = try {
      val len = fs.getFileStatus(p).getLen.toInt
      val b = new Array[Byte](len); in.readFully(b); b
    } finally in.close()
    val node = mapper.readTree(bytes)
    val schema = StructType(node.get("schema").elements().asScala.map { fn =>
      StructField(fn.get(0).asText(),
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(fn.get(1).asText()))
    }.toSeq)
    val parts = node.get("partitions").elements().asScala.map { pn =>
      PartitionSpec(pn.get("value").asText(), pn.get("dir").asText(),
        pn.get("format").asText())
    }.toSeq
    val ptype = Option(node.get("partitionType")).map(n =>
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(n.asText())).getOrElse(StringType)
    TableSpec(node.get("partitionCol").asText(), ptype, schema, parts)
  }

  /** Read the table; `partitions` non-empty prunes to those partition
    * values on the DRIVER (the spec list), before any file is listed. */
  def read(spark: SparkSession, path: String,
           partitions: Seq[String] = Nil): DataFrame = {
    val spec = readSpec(spark, path)
    val want = partitions.toSet
    val selected = spec.partitions.filter(p => want.isEmpty || want(p.value))
    require(selected.nonEmpty, s"no partitions selected from $path")
    val scans = selected.map { p =>
      readPartition(spark, s"$path/${p.dir}", p.format, spec.schema)
        .withColumn(spec.partitionCol, lit(p.value).cast(spec.partitionType))
    }
    scans.reduce(_ unionByName _)
  }

  private def castTo(schema: StructType): Seq[Column] =
    schema.map(f => col(f.name).cast(f.dataType).as(f.name))

  private def readPartition(spark: SparkSession, dir: String, format: String,
                            schema: StructType): DataFrame = format match {
    case "parquet" => spark.read.parquet(dir).select(castTo(schema): _*)
    case "orc"     => spark.read.orc(dir).select(castTo(schema): _*)
    case "avro" =>
      spark.read.format("graft.sources.AvroSource").load(dir)
        .select(castTo(schema): _*)
    case "rcfile" =>
      spark.read.format("graft.sources.RcFileSource").load(dir)
        .select(castTo(schema): _*)
    case "sequencefile" =>
      val rest = schema.fields.drop(1)
      // split with LIMIT = field count: the LAST packed column (the
      // text-shaped one, by the S14 last-column convention) keeps any
      // embedded separator intact instead of being silently truncated
      // at its first occurrence. NULL strings still round-trip as ""
      // (the codec has no null sentinel) - a documented codec
      // limitation shared with the standalone S14 source.
      spark.read.format("graft.sources.SequenceSource").load(dir)
        .select(col("key").cast(schema.head.dataType).as(schema.head.name) +:
          rest.zipWithIndex.map { case (f, i) =>
            split(col("value"), "\u0001", rest.length).getItem(i)
              .cast(f.dataType).as(f.name)
          }.toIndexedSeq: _*)
    case other => throw new IllegalArgumentException(s"unknown format $other")
  }

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

/** Oracle-checked mixed-format coverage: `documents` partitioned by
  * lang across FIVE distinct formats (parquet / avro / rcfile /
  * sequencefile / orc — one per language partition), read back whole
  * and pruned; DuckDB recomputes both from the flat parquet. A hash
  * match certifies every format's write → dispatch → read → normalize
  * path preserved every row and type. */
object MixedFormatQueries {

  def path(dir: String): String =
    s"/tmp/graft_mixed_documents_${new java.io.File(dir).getName}"

  // five languages → five DISTINCT formats, one per partition
  private val formats = Seq("parquet", "avro", "rcfile", "sequencefile", "orc")

  def ensureTable(spark: SparkSession, dir: String): String = {
    val root = path(dir)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(root, "_mixed_spec.json"))) {
      // text LAST (the sequencefile '\u0001' packing convention)
      val docs = graft.Tables(spark, dir).documents
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"), col("lang"))
      MixedFormat.write(docs, root, "lang", formats)
    }
    root
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "src_mixed_formats" -> ((spark, dir) => {
      val back = MixedFormat.read(spark, ensureTable(spark, dir))
      back.groupBy("lang")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("nd"),
          countDistinct(col("source")).as("nd_source"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text")).cast("bigint")).as("sum_text_len"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),
    // Pruned read: only the named partitions' readers run (driver-side
    // spec pruning — asserted structurally in SourcesSpec); the oracle
    // proves the pruned result equals the flat-parquet WHERE.
    "src_mixed_prune" -> ((spark, dir) => {
      val back = MixedFormat.read(spark, ensureTable(spark, dir),
        partitions = Seq("de", "fr"))
      back.groupBy("lang", "source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang", "source")
    }),
  )

  val oracles: Map[String, String] = Map(
    "src_mixed_formats" ->
      """SELECT lang, count(*) AS n, count(DISTINCT doc_id) AS nd,
        |  count(DISTINCT source) AS nd_source,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "src_mixed_prune" ->
      """SELECT lang, source, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('de', 'fr')
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
  )
}
