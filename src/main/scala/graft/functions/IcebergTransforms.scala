package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition transforms — the reference's
  * `iceberg_bucket_transform` / `iceberg_truncate_transform` builtins
  * (apache-impala-4.1.0/common/function-registry/impala_functions.py:1105,
  * be/src/exprs/iceberg-functions.h). Re-derived from the PUBLIC Iceberg
  * table-spec (Appendix B "32-bit Hash Requirements"):
  *
  * - bucket[N](v) = (murmur3_x86_32(bytes(v), seed=0) & Int.MaxValue) % N
  *   where int/long serialize as 8-byte little-endian (ints widen to
  *   long first, so bucket(34:int) == bucket(34:long)) and strings hash
  *   their UTF-8 bytes directly.
  * - truncate[W](v) = v - (((v % W) + W) % W) for integers (floors
  *   toward -inf), and the first W code points for strings.
  *
  * Spec-published vectors pinned in FunctionsSpec:
  * murmur3(le64(34)) = 2017239379, murmur3("iceberg") = 1210000089.
  * Murmur3_x86_32 itself is Austin Appleby's public-domain algorithm.
  */
object IcebergImpl {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  /** Murmur3_x86_32, seed 0 — public-domain reference algorithm. */
  def murmur3_32(bytes: Array[Byte], seed: Int): Int = {
    val len = bytes.length
    val nBlocks = len / 4
    var h = seed
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 3) & 0xff) << 24)
      k *= C1
      k = Integer.rotateLeft(k, 15)
      k *= C2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = nBlocks * 4
    (len & 3) match {
      case 3 =>
        k ^= (bytes(tail + 2) & 0xff) << 16
        k ^= (bytes(tail + 1) & 0xff) << 8
        k ^= bytes(tail) & 0xff
      case 2 =>
        k ^= (bytes(tail + 1) & 0xff) << 8
        k ^= bytes(tail) & 0xff
      case 1 =>
        k ^= bytes(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= C1
      k = Integer.rotateLeft(k, 15)
      k *= C2
      h ^= k
    }
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  private def le64(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  def hashLong(v: Long): Int = murmur3_32(le64(v), 0)
  def hashString(s: UTF8String): Int = murmur3_32(s.getBytes, 0)

  def bucketLong(v: Long, n: Int): Int = ((hashLong(v) & Int.MaxValue) % n)
  def bucketString(s: UTF8String, n: Int): Int = ((hashString(s) & Int.MaxValue) % n)

  /** Integer truncate floors toward negative infinity (Iceberg spec). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)
  def truncateString(s: UTF8String, w: Int): UTF8String =
    if (s.numChars() <= w) s else s.substring(0, w)
}

/** `iceberg_bucket(v, n) -> int` over BIGINT or STRING input. The spec
  * (and the reference's validation) requires n > 0: a foldable
  * non-positive n fails analysis with a clear message; a runtime
  * non-positive n yields NULL rather than a raw ArithmeticException or
  * a negative bucket. */
case class IcebergBucket(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!((left.dataType == LongType || left.dataType == StringType) && right.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket expects (bigint|string, int), got (${left.dataType}, ${right.dataType})")
    else if (right.foldable && {
        val n = right.eval(); n != null && n.asInstanceOf[Int] <= 0 })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket: bucket count must be positive, got ${right.eval()}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  private lazy val isString = left.dataType == StringType
  override def nullSafeEval(v: Any, n: Any): Any = {
    val nn = n.asInstanceOf[Int]
    if (nn <= 0) null
    else if (isString) IcebergImpl.bucketString(v.asInstanceOf[UTF8String], nn)
    else IcebergImpl.bucketLong(v.asInstanceOf[Long], nn)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "bucketString" else "bucketLong"
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"""if ($n <= 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = graft.functions.IcebergImpl.$fn($v, $n); }""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IcebergBucket =
    copy(left = l, right = r)
  override def prettyName: String = "iceberg_bucket"
}

/** `iceberg_truncate(v, w)` over BIGINT (floor-to-width) or STRING
  * (code-point prefix) input; result type follows the input. The spec
  * requires w > 0: a foldable non-positive width fails analysis; a
  * runtime non-positive width yields NULL (no raw division-by-zero). */
case class IcebergTruncate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!((left.dataType == LongType || left.dataType == StringType) && right.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_truncate expects (bigint|string, bigint), got (${left.dataType}, ${right.dataType})")
    else if (right.foldable && {
        val w = right.eval(); w != null && w.asInstanceOf[Long] <= 0L })
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"iceberg_truncate: width must be positive, got ${right.eval()}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = left.dataType
  override def nullable: Boolean = true
  private lazy val isString = left.dataType == StringType
  override def nullSafeEval(v: Any, w: Any): Any = {
    val ww = w.asInstanceOf[Long]
    if (ww <= 0L) null
    else if (isString) IcebergImpl.truncateString(v.asInstanceOf[UTF8String], ww.toInt)
    else IcebergImpl.truncateLong(v.asInstanceOf[Long], ww)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = if (isString)
      (v: String, w: String) => s"graft.functions.IcebergImpl.truncateString($v, (int) $w)"
    else
      (v: String, w: String) => s"graft.functions.IcebergImpl.truncateLong($v, $w)"
    nullSafeCodeGen(ctx, ev, (v, w) =>
      s"""if ($w <= 0L) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${call(v, w)}; }""".stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IcebergTruncate =
    copy(left = l, right = r)
  override def prettyName: String = "iceberg_truncate"
}
