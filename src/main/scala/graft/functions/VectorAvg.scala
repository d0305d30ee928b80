package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}

/** Typed declarative aggregator (SURVEY.md §2 X3): element-wise mean of
  * float vectors — the reference engine's UDA surface
  * (apache-impala-4.1.0/be/src/exprs/agg-fn-evaluator.h) re-expressed as
  * a Spark `Aggregator` with partial aggregation for free (reduce =
  * update, merge = merge, map-side combine included).
  */
case class VecBuf(var sums: Array[Double], var n: Long)

object VectorAvg extends Aggregator[Array[Float], VecBuf, Array[Float]] {

  override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

  private def ensure(buf: VecBuf, len: Int): Unit = {
    if (buf.sums.isEmpty) buf.sums = new Array[Double](len)
    require(buf.sums.length == len,
      s"VectorAvg: mixed vector dimensions in one group (${buf.sums.length} vs $len)")
  }

  override def reduce(buf: VecBuf, a: Array[Float]): VecBuf = {
    // zero-length vectors carry no information: counting them would
    // bias every element-wise mean toward zero (empty buf passes
    // ensure(), so only n would grow) — treat like null
    if (a == null || a.length == 0) buf
    else {
      // widen in the loop — no temporary double array per input row
      ensure(buf, a.length)
      var i = 0
      while (i < a.length) { buf.sums(i) += a(i).toDouble; i += 1 }
      buf.n += 1
      buf
    }
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    if (y.sums.isEmpty) x
    else {
      ensure(x, y.sums.length)
      var i = 0
      while (i < y.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.n += y.n
      x
    }
  }

  override def finish(b: VecBuf): Array[Float] =
    if (b.n == 0) Array.emptyFloatArray else b.sums.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[VecBuf] = ExpressionEncoder[VecBuf]()
  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()

  /** Column form: `VectorAvg.of(col("embedding"))`. */
  def of(c: Column): Column = org.apache.spark.sql.functions.udaf(this).apply(c)
}
