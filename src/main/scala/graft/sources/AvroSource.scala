package graft.sources

import java.util

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Avro container-file read/write (SURVEY.md §2 S13) — the reference's
  * Avro scanner surface (apache-impala-4.1.0/be/src/exec/
  * hdfs-avro-scanner.cc: schema resolution, projection, per-block
  * decode) re-expressed over the core `avro` + `avro-mapred` jars that
  * ship with Spark. There is no spark-avro module in this environment;
  * the round-trip below proves the bundled jars suffice (the round-3
  * SURVEY note writing Avro off as unavailable was wrong and is
  * retracted by this source).
  *
  * Read path: DataSource V2 with COLUMN PRUNING pushed into Avro itself
  * — the pruned Spark schema becomes the Avro *reader schema*, so
  * skipped fields are never decoded (Avro schema-resolution projection,
  * the same mechanism the reference's scanner uses). Large containers
  * are SPLIT on Avro's 16-byte sync markers into byte ranges (default
  * 64 MiB, `split_bytes` option): each partition seeks to the first
  * block after its range start and reads until past its range end —
  * exactly the reference scanner's split protocol
  * (hdfs-avro-scanner.cc block/sync handling), so one huge container
  * still fans out across executors at 100 TB.
  *
  * Type mapping (both directions): long/int/double/float/boolean/string/
  * bytes, plus TimestampType <-> long logicalType timestamp-micros
  * (Spark's internal micros pass through unchanged) and DateType <->
  * int logicalType date. Nullable fields are `union(null, T)`. Nested
  * records/arrays/maps are out of scope and fail loudly.
  *
  * Usage:
  *   AvroIO.write(df, "/path/dir")                       // writer
  *   spark.read.format("graft.sources.AvroSource")
  *        .load("/path/dir")                             // reader
  */
class AvroSource extends TableProvider {
  /** PER-FILE schema resolution (the reference resolves each Avro
    * file's writer schema against the table schema —
    * hdfs-avro-scanner.cc resolution path): the table schema is the
    * BY-NAME MERGE of every container header under the path, so a
    * directory whose files span a column ADD reads in one scan (old
    * files NULL-fill the added column via Avro's own default-value
    * resolution — the same migration-era story S16e solves for parquet
    * via field ids). Column RENAMEs resolve through the `aliases`
    * option (`"new:old[|older],..."` — the public Avro spec's reader
    * aliases). One header read per file is driver-side metadata work,
    * the same bound as the listing itself. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = AvroSource.pathOf(options)
    val aliases = AvroSource.parseAliases(options.get("aliases"))
    val files = AvroSource.listFiles(path)
    require(files.nonEmpty, s"no .avro files under $path")
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val perFile = files.map { f =>
      val reader = new DataFileReader[GenericRecord](
        new FsInput(f, conf), new GenericDatumReader[GenericRecord]())
      try AvroConvert.toSparkSchema(reader.getSchema)
      finally reader.close()
    }
    AvroSource.mergeSchemas(perFile, aliases)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val split = Option(properties.get("split_bytes")).map(_.toLong)
      .getOrElse(AvroSource.DefaultSplitBytes)
    new AvroTable(properties.get("path"), schema, split,
      AvroSource.parseAliases(properties.get("aliases")))
  }
}

object AvroSource {
  val DefaultSplitBytes: Long = 64L * 1024 * 1024

  /** `"new:old[|older],new2:old2"` → reader-field aliases (Avro spec
    * rename resolution); empty map when unset. */
  def parseAliases(opt: String): Map[String, Seq[String]] =
    Option(opt).filter(_.nonEmpty).map(_.split(",").map { kv =>
      val Array(n, olds) = kv.split(":", 2)
      n.trim -> olds.split("\\|").map(_.trim).toSeq
    }.toMap).getOrElse(Map.empty)

  /** By-name merge of per-file schemas, aliases applied first (an old
    * writer name folds into its current reader name). A field absent
    * from some files is NULLABLE in the merge — those files' rows
    * NULL-fill it through Avro default-value resolution. Same-name
    * fields of different types fail loudly. */
  private[graft] def mergeSchemas(perFile: Seq[StructType],
                                    aliases: Map[String, Seq[String]]): StructType = {
    val currentName: String => String = old =>
      aliases.collectFirst { case (n, olds) if olds.contains(old) => n }.getOrElse(old)
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    val seen = scala.collection.mutable.HashMap.empty[String, Int]
    perFile.foreach { st =>
      st.fields.foreach { f0 =>
        val f = f0.copy(name = currentName(f0.name))
        order.get(f.name) match {
          case None => order(f.name) = f
          case Some(prev) =>
            require(prev.dataType == f.dataType,
              s"graft avro: field ${f.name} is ${prev.dataType.simpleString} in one " +
                s"file and ${f.dataType.simpleString} in another — irreconcilable")
            if (f.nullable && !prev.nullable) order(f.name) = f
        }
      }
      // presence counted PER FILE (post-alias, distinct): a file
      // carrying both an alias's old and new name must count once, or
      // a field absent from another file could reach perFile.length
      // and stay non-nullable while that file NULL-fills it
      st.fields.map(f => currentName(f.name)).distinct.foreach { n =>
        seen(n) = seen.getOrElse(n, 0) + 1
      }
    }
    StructType(order.values.toSeq.map(f =>
      if (seen(f.name) < perFile.length) f.copy(nullable = true) else f))
  }

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft.sources.AvroSource requires .load(path)")
    p
  }

  /** Deterministic (name-sorted) listing so partition planning is
    * stable across runs. */
  def listFiles(path: String): Seq[org.apache.hadoop.fs.Path] =
    listStatus(path).map(_.getPath)

  def listStatus(path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .sortBy(_.getPath.getName)
  }
}

class AvroTable(path: String, schema: StructType, splitBytes: Long,
                aliases: Map[String, Seq[String]] = Map.empty)
    extends Table with SupportsRead {
  override def name(): String = s"graft_avro($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val split = Option(options.get("split_bytes")).map(_.toLong).getOrElse(splitBytes)
    val al = Option(options.get("aliases")).map(AvroSource.parseAliases)
      .filter(_.nonEmpty).getOrElse(aliases)
    new AvroScanBuilder(path, schema, split, al)
  }
}

class AvroScanBuilder(path: String, full: StructType, splitBytes: Long,
                      aliases: Map[String, Seq[String]] = Map.empty)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var pruned: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = pruned = requiredSchema
  override def build(): Scan = new AvroScan(path, pruned, splitBytes, aliases)
}

/** One byte range of one container; [start, end) in the sync-marker
  * protocol — read blocks whose first sync AFTER `start` begins before
  * `end` (DataFileReader.sync/pastSync). Ranges tile the file, so every
  * block lands in exactly one partition. */
case class AvroInputPartition(file: String, start: Long, end: Long) extends InputPartition

class AvroScan(path: String, pruned: StructType, splitBytes: Long,
               aliases: Map[String, Seq[String]] = Map.empty) extends Scan with Batch {
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_avro $path cols=${pruned.fieldNames.mkString(",")} split=$splitBytes"
  override def planInputPartitions(): Array[InputPartition] = {
    require(splitBytes > 0, s"split_bytes must be positive, got $splitBytes")
    AvroSource.listStatus(path).flatMap { st =>
      val len = st.getLen
      val f = st.getPath.toString
      (0L until math.max(1L, (len + splitBytes - 1) / splitBytes))
        .map(i => AvroInputPartition(f, i * splitBytes, math.min(len, (i + 1) * splitBytes)))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(pruned, aliases)
}

class AvroReaderFactory(pruned: StructType,
                        aliases: Map[String, Seq[String]] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroInputPartition]
    new PartitionReader[InternalRow] {
      // executor-local Configuration: file:// and default-FS reads need
      // no driver-side settings; cluster deployments get core-site.xml
      // from the executor classpath like any Hadoop client
      private val conf = new org.apache.hadoop.conf.Configuration()
      private val datumReader = new GenericDatumReader[GenericRecord]()
      private val reader = new DataFileReader[GenericRecord](
        new FsInput(new org.apache.hadoop.fs.Path(p.file), conf), datumReader)
      // Reader-schema projection AFTER open: the pruned reader schema
      // reuses the WRITER's record name/namespace, so Avro's name-based
      // schema resolution accepts containers from any writer. PER-FILE
      // resolution (the reference scanner's contract): a reader field
      // this file's writer never had fills its NULL default; a renamed
      // field resolves through its declared aliases; the field ORDER
      // is the reader's, regardless of the writer's layout.
      datumReader.setExpected(
        AvroConvert.toAvroSchemaNamed(pruned, reader.getSchema, aliases))
      // seek to the first sync marker after the range start; blocks
      // before it belong to the previous partition
      reader.sync(p.start)
      private var rec: GenericRecord = _
      override def next(): Boolean = {
        val has = reader.hasNext && !reader.pastSync(p.end)
        if (has) rec = reader.next()
        has
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(pruned.fields.toSeq.zipWithIndex.map { case (f, i) =>
          AvroConvert.toCatalyst(rec.get(i), f.dataType)
        })
      override def close(): Unit = reader.close()
    }
  }
}

/** Spark <-> Avro schema and value conversion (flat records). */
object AvroConvert {

  def toAvroSchema(st: StructType): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"graft avro: unsupported Spark type $other for field ${f.name}")
      }
      val sch = if (f.nullable)
        Schema.createUnion(util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord("graft_record", null, "graft", false, fields.toSeq.asJava)
  }

  /** Same conversion, but named after an existing (writer) schema so
    * Avro's name-based resolution accepts the projection regardless of
    * which writer produced the container; `aliases` (reader field →
    * old writer names) ride on the fields for spec-rule rename
    * resolution. */
  def toAvroSchemaNamed(st: StructType, like: Schema,
                        aliases: Map[String, Seq[String]] = Map.empty): Schema = {
    val base = toAvroSchema(st)
    Schema.createRecord(like.getName, null, like.getNamespace, false,
      base.getFields.asScala.map { f =>
        val nf = new Schema.Field(f.name, f.schema, f.doc, f.defaultVal)
        aliases.getOrElse(f.name, Nil).foreach(nf.addAlias)
        nf
      }.asJava)
  }

  def toSparkSchema(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"graft avro: root must be a record, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val (base, nullable) = f.schema().getType match {
        case Schema.Type.UNION =>
          val nonNull = f.schema().getTypes.asScala.filter(_.getType != Schema.Type.NULL)
          require(nonNull.size == 1,
            s"graft avro: only union(null, T) supported for field ${f.name}")
          (nonNull.head, true)
        case _ => (f.schema(), false)
      }
      StructField(f.name, toSparkType(base, f.name), nullable)
    }.toSeq)
  }

  private def toSparkType(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.LONG =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "timestamp-micros")
        TimestampType else LongType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        DateType else IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"graft avro: unsupported Avro type $other for field $field")
  }

  /** Avro generic value -> Catalyst internal value. Timestamp-micros and
    * date-days longs/ints pass through — they ARE Spark's internal
    * representations. */
  def toCatalyst(v: AnyRef, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
    case s: java.lang.CharSequence => UTF8String.fromString(s.toString)
    case b: java.nio.ByteBuffer =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case other => other // Long / Int / Double / Float / Boolean
  }

  /** External Row value -> Avro generic value (writer side). Handles
    * both datetime externals: java.sql.Timestamp/Date (default) AND
    * java.time.Instant/LocalDate (spark.sql.datetime.java8API.enabled),
    * so the writer works under either session config. */
  def toAvro(v: Any): AnyRef = v match {
    case null => null
    case s: String => s
    case ts: java.sql.Timestamp =>
      java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
    case i: java.time.Instant =>
      java.lang.Long.valueOf(
        Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    case d: java.sql.Date => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => java.lang.Integer.valueOf(d.toEpochDay.toInt)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other.asInstanceOf[AnyRef] // boxed primitives
  }
}

/** End-to-end Avro coverage with a REAL oracle: the events table is
  * written to Avro, read back through the DSv2 source, and aggregated;
  * DuckDB computes the same aggregate from the original parquet. A hash
  * match therefore certifies the whole write -> container -> read path
  * preserved every row and type (any loss or mangling would shift the
  * counts/sums). */
object AvroQueries {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions._
  import graft.operators.Exact

  /** SF-suffixed so runs at different scale factors never collide. */
  def path(dir: String): String =
    s"/tmp/graft_avro_events_${new java.io.File(dir).getName}"

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // r16 input spread (Tables.eventsSpread): parallelizes the avro
    // WRITE half of the round trip (32 writer tasks instead of one) —
    // interleaved A/B 1.56× (bench_control_r16c.json).
    "src_avro_roundtrip" -> ((spark, dir) => {
      val ev = graft.Tables(spark, dir).eventsSpread
      AvroIO.write(ev, path(dir))
      val back = spark.read.format("graft.sources.AvroSource").load(path(dir))
      back.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          Exact.dsum(col("value")).as("sum_value"),
          // micro precision: DuckDB truncates the parquet TIMESTAMP(NANOS)
          // to its µs TIMESTAMP, so the ns tail is not oracle-visible
          expr("min(ts) div 1000").as("min_ts_us"),
          max(length(col("props"))).as("max_props_len"))
        .orderBy("event_type")
    }),
  )

  val oracles: Map[String, String] = Map(
    // over the ORIGINAL parquet — equality proves the avro round trip
    "src_avro_roundtrip" ->
      s"""SELECT event_type, count(*) AS n,
         |  min(event_id) AS min_id, max(event_id) AS max_id,
         |  ${Exact.sqlSum("value")} AS sum_value,
         |  min(epoch_us(ts)) AS min_ts_us,
         |  CAST(max(length(props)) AS INT) AS max_props_len
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}

object AvroIO {
  /** Distributed Avro write: one container file per partition, written
    * through the Hadoop FileSystem API (file://, HDFS, or object store
    * alike). The deflate codec keeps containers splittable-by-file and
    * ~3x smaller on text-heavy columns. */
  def write(df: DataFrame, path: String, syncIntervalBytes: Int = 0): Unit = {
    val sparkSchema = df.schema
    val avroJson = AvroConvert.toAvroSchema(sparkSchema).toString
    val sc = df.sparkSession.sparkContext
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val nWritten = df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(avroJson)
      val part = new org.apache.hadoop.fs.Path(path, f"part-$idx%05d.avro")
      val conf = new org.apache.hadoop.conf.Configuration()
      val stream = part.getFileSystem(conf).create(part, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      // smaller sync interval → more blocks → finer read-side splits
      // (0 keeps the library default, ~64 KiB per block)
      if (syncIntervalBytes > 0) writer.setSyncInterval(syncIntervalBytes)
      writer.create(schema, stream)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          rec.put(i, AvroConvert.toAvro(row.get(i)))
          i += 1
        }
        writer.append(rec)
        n += 1
      }
      writer.close() // also closes the stream
      Iterator(n)
    }.sum()
    require(nWritten >= 0) // materialize the job
  }
}
