package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** KLL quantile sketches over Apache DataSketches (the library the
  * reference engine wraps for its `ds_kll_sketch`/`ds_kll_quantile`
  * builtins — apache-impala-4.1.0/be/src/exprs/
  * datasketches-functions-ir.cc:240, fe/.../catalog/BuiltinsDb.java).
  * Build side is a typed `Aggregator`: Spark keeps the sketch as a live
  * heap object per partial-aggregation buffer and only serializes at
  * shuffle boundaries, so the per-row cost is one sketch update — the
  * map-side-combine shape a 100 TB scan needs. */
class KllBuf(@transient var sketch: KllDoublesSketch) extends Serializable {
  // serialize via the sketch's own compact byte format, not Java field
  // serialization (the sketch object graph is not Serializable)
  private def writeObject(out: ObjectOutputStream): Unit = {
    val bytes = sketch.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    sketch = KllDoublesSketch.heapify(Memory.wrap(b))
  }
}

/** `kll_sketch(x)` build aggregate: doubles in, serialized sketch out. */
case class KllSketchAgg(k: Int) extends Aggregator[Double, KllBuf, Array[Byte]] {
  override def zero: KllBuf = new KllBuf(KllDoublesSketch.newHeapInstance(k))
  override def reduce(b: KllBuf, x: Double): KllBuf = { b.sketch.update(x); b }
  override def merge(a: KllBuf, b: KllBuf): KllBuf = { a.sketch.merge(b.sketch); a }
  override def finish(b: KllBuf): Array[Byte] = b.sketch.toByteArray
  override def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KllQuantile {
  /** Build a KLL sketch of `c`; k trades size for accuracy (k=200 ≈
    * 1.65% normalized rank error, the DataSketches default). */
  def sketch(c: Column, k: Int = 200): Column =
    org.apache.spark.sql.functions.udaf(KllSketchAgg(k)).apply(c)

  def quantileAt(bytes: Array[Byte], rank: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantile(rank)

  def countOf(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}

/** `kll_quantile(sketch_bytes, rank) -> double` — estimate extraction,
  * the ds_kll_quantile shape. Runs on post-aggregation rows (one per
  * group), so the heapify-per-call is off the hot path. */
case class KllQuantileAt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any, r: Any): Any =
    KllQuantile.quantileAt(b.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) => s"graft.functions.KllQuantile.quantileAt($b, $r)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KllQuantileAt =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kll_quantile"
}
