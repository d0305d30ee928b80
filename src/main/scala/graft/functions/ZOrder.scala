package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key — the data-layout lever for 100 TB
  * scans with 2-D range predicates. Sorting/range-partitioning a fact
  * table by `zorder64(dim1, dim2)` before a parquet write co-locates
  * rows that are close in BOTH dimensions into the same files and row
  * groups, so min/max statistics prune scans filtered on either
  * dimension (a linear sort only serves its leading column). The
  * reference engine leans on HDFS partition directories for the same
  * job (apache-impala-4.1.0/be/src/exec/hdfs-scan-node-base.cc
  * partition pruning); Z-ordering is the finer-grained, multi-column
  * Spark-side counterpart (same layout trick Delta/Iceberg expose as
  * OPTIMIZE ZORDER BY).
  */
object ZOrderImpl {
  /** Spread the low 32 bits of `v` onto the even bit positions of a
    * 64-bit word (classic mask-shift bit dilation). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 32 bits of `a` (odd positions, major) and `b`
    * (even positions): bit i of `a` lands at 2i+1, bit i of `b` at 2i. */
  def interleave(a: Long, b: Long): Long = (spread(a) << 1) | spread(b)
}

/** `zorder64(a, b)`: 64-bit Morton key of two BIGINT columns (low 32
  * bits each — callers normalize wider domains first). */
case class ZOrder64(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder64 expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderImpl.interleave($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder64 =
    copy(left = l, right = r)
  override def prettyName: String = "zorder64"
}
