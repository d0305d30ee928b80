package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read path (SURVEY.md §2 S9) — the Spark twin of the
  * reference's external-data-source API
  * (apache-impala-4.1.0/fe/src/main/java/org/apache/impala/extdatasource/
  * ExternalDataSourceExecutor.java: prepare/open/getNext over a foreign
  * system, with predicates offered for pushdown). This source
  * synthesizes a deterministic sequence table, split into
  * `numPartitions` independent readers, with BOTH V2 pushdowns
  * implemented for real:
  *   - column pruning: readers materialize only the pruned schema;
  *   - filter pushdown on `id`: range predicates narrow each
  *     partition's [start, end) span — partitions whose span empties
  *     are never scheduled (the partition-pruning analogue).
  *
  * Usage: spark.read.format("graft.sources.SeqSource")
  *          .option("rows", 10000).option("numPartitions", 8).load()
  * Schema: id BIGINT, val DOUBLE (splitmix-derived), label STRING.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // This source's schema is fixed; a user-supplied spark.read.schema(...)
    // that disagrees would otherwise be silently served the inferred one
    // (and a renamed field would MatchError inside the readers). Fail loud.
    require(schema == SeqSource.schema,
      s"graft.sources.SeqSource has a fixed schema ${SeqSource.schema.simpleString}; " +
        s"user-specified schema ${schema.simpleString} does not match")
    new SeqTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("numPartitions", "4").toInt)
  }
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("label", StringType, nullable = false)))

  def valOf(id: Long): Double =
    (graft.functions.HashImpl.splitmix64(id) >>> 11) / (1L << 53).toDouble

  def labelOf(id: Long): String = s"L${id % 10}"
}

class SeqTable(rows: Long, numPartitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, numPartitions)
}

class SeqScanBuilder(rows: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var prunedSchema: StructType = SeqSource.schema
  private var lo: Long = 0L       // inclusive id lower bound
  private var hi: Long = rows     // exclusive id upper bound
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  /** Accept range predicates on `id`; everything else stays with Spark.
    * Accepted filters still return in the residual (conservative, like
    * a parquet scan: pushdown narrows, Spark re-verifies). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Accept any integral Number, not just java.lang.Long — an Int-typed
    // literal reaching the scan would otherwise silently skip pruning.
    object IntegralValue {
      def unapply(v: Any): Option[Long] = v match {
        case n: java.lang.Long => Some(n)
        case n: java.lang.Integer => Some(n.toLong)
        case n: java.lang.Short => Some(n.toLong)
        case n: java.lang.Byte => Some(n.toLong)
        case _ => None
      }
    }
    val (accepted, _) = filters.partition {
      case GreaterThan("id", IntegralValue(v)) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", IntegralValue(v)) => lo = math.max(lo, v); true
      case LessThan("id", IntegralValue(v)) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", IntegralValue(v)) => hi = math.min(hi, v + 1); true
      case EqualTo("id", IntegralValue(v)) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SeqScan(prunedSchema, lo, math.max(lo, hi), numPartitions)
}

case class SeqInputPartition(start: Long, end: Long) extends InputPartition

class SeqScan(prunedSchema: StructType, lo: Long, hi: Long, numPartitions: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq range=[$lo,$hi) cols=${prunedSchema.fieldNames.mkString(",")}"

  /** Split [lo, hi) evenly; empty spans produce no partition at all —
    * pushed range predicates prune work before scheduling. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = (hi - lo).max(0L)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + numPartitions - 1) / numPartitions)
    (lo until hi by per).map(s => SeqInputPartition(s, math.min(hi, s + per))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val fields = prunedSchema.fieldNames
    new SeqReaderFactory(fields)
  }
}

class SeqReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeqInputPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => id
          case "val" => SeqSource.valOf(id)
          case "label" => UTF8String.fromString(SeqSource.labelOf(id))
        })
      override def close(): Unit = ()
    }
  }
}
