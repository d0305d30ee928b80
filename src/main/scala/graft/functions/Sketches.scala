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

  // Estimate-extraction backing for the rest of the reference's ds_kll
  // block (impala_functions.py ds_kll_rank / ds_kll_n /
  // ds_kll_cdf_as_string / ds_kll_pmf_as_string /
  // ds_kll_quantiles_as_string). Spark-idiomatic shape: the variadic
  // "..._as_string" forms become array-in/array-out expressions —
  // compose with array_join for the string rendering. All run on
  // post-aggregation rows (one per group), never in the scan.
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Normalized rank of `v` in [0,1] (INCLUSIVE criteria, the library
    * default the reference wraps). */
  def rankOf(bytes: Array[Byte], v: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getRank(v)

  /** CDF at the given split points: n+1 values, last is always 1.0. */
  def cdfAt(bytes: Array[Byte], splits: ArrayData): ArrayData =
    new GenericArrayData(
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getCDF(splits.toDoubleArray()))

  /** PMF mass between consecutive split points: n+1 values, sums to 1. */
  def pmfAt(bytes: Array[Byte], splits: ArrayData): ArrayData =
    new GenericArrayData(
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getPMF(splits.toDoubleArray()))

  /** Quantile estimates at the given normalized ranks. */
  def quantilesAt(bytes: Array[Byte], ranks: ArrayData): ArrayData =
    new GenericArrayData(
      KllDoublesSketch.heapify(Memory.wrap(bytes)).getQuantiles(ranks.toDoubleArray()))
}

// ---- Theta sketches (distinct-count set algebra) ---------------------

/** Theta sketch build + set operations — the reference's `ds_theta_*`
  * builtins (apache-impala-4.1.0/be/src/exprs/
  * datasketches-functions-ir.cc, ds_theta_union/intersect/exclude).
  * Theta keeps the k smallest value hashes, so build and union are
  * input-order independent; while a population stays under k=4096 the
  * sketch is in exact mode and every estimate IS the exact distinct
  * count (which is what makes the registered query oracle-checkable at
  * the verification scale). */
class ThetaBuf(@transient var union: org.apache.datasketches.theta.Union) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    val bytes = union.getResult.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    union = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    union.union(org.apache.datasketches.theta.Sketches.heapifyCompactSketch(Memory.wrap(b)))
  }
}

/** `theta_sketch(x)` build aggregate: longs in, serialized compact
  * theta sketch out. */
case class ThetaSketchAgg() extends Aggregator[Long, ThetaBuf, Array[Byte]] {
  override def zero: ThetaBuf =
    new ThetaBuf(org.apache.datasketches.theta.SetOperation.builder().buildUnion())
  override def reduce(b: ThetaBuf, x: Long): ThetaBuf = { b.union.update(x); b }
  override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf = {
    a.union.union(b.union.getResult)
    a
  }
  override def finish(b: ThetaBuf): Array[Byte] = b.union.getResult.toByteArray
  override def bufferEncoder: Encoder[ThetaBuf] = Encoders.javaSerialization[ThetaBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object ThetaOps {
  import org.apache.datasketches.theta.{SetOperation, Sketch => TSketch, Sketches => TSketches}

  def sketch(c: Column): Column =
    org.apache.spark.sql.functions.udaf(ThetaSketchAgg()).apply(c)

  private def heap(b: Array[Byte]): TSketch =
    TSketches.heapifyCompactSketch(Memory.wrap(b))

  def estimate(b: Array[Byte]): Double = heap(b).getEstimate

  def unionEst(a: Array[Byte], b: Array[Byte]): Double = {
    val u = SetOperation.builder().buildUnion()
    u.union(heap(a)); u.union(heap(b))
    u.getResult.getEstimate
  }

  def intersectEst(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(heap(a)); i.intersect(heap(b))
    i.getResult.getEstimate
  }

  def aNotBEst(a: Array[Byte], b: Array[Byte]): Double = {
    val d = SetOperation.builder().buildANotB()
    d.setA(heap(a)); d.notB(heap(b))
    d.getResult(true).getEstimate
  }

  // Sketch-RETURNING set operations — the reference's ds_theta_union_f /
  // ds_theta_intersect_f / ds_theta_exclude forms (serialized sketch
  // out, so results compose into further set algebra before a final
  // estimate): the wire format a multi-stage rollup ships between jobs.
  def unionF(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(heap(a)); u.union(heap(b))
    u.getResult.toByteArray
  }

  def intersectF(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(heap(a)); i.intersect(heap(b))
    i.getResult.toByteArray
  }

  def excludeF(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = SetOperation.builder().buildANotB()
    d.setA(heap(a)); d.notB(heap(b))
    d.getResult(true).toByteArray
  }
}

/** Shared shape for the sketch-returning theta set operations. */
abstract class ThetaBinaryF extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  protected def call: String
  override def nullSafeEval(a: Any, b: Any): Any = call match {
    case "unionF" => ThetaOps.unionF(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "intersectF" => ThetaOps.intersectF(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "excludeF" => ThetaOps.excludeF(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.$call($a, $b)")
}

case class ThetaUnionF(left: Expression, right: Expression) extends ThetaBinaryF {
  override protected def call = "unionF"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionF = copy(l, r)
  override def prettyName: String = "theta_union_f"
}

case class ThetaIntersectF(left: Expression, right: Expression) extends ThetaBinaryF {
  override protected def call = "intersectF"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectF = copy(l, r)
  override def prettyName: String = "theta_intersect_f"
}

case class ThetaExcludeF(left: Expression, right: Expression) extends ThetaBinaryF {
  override protected def call = "excludeF"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaExcludeF = copy(l, r)
  override def prettyName: String = "theta_exclude_f"
}

/** Scalar estimate extraction over serialized theta sketches — each
  * runs on post-aggregation rows (one per group pair). */
case class ThetaEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any = ThetaOps.estimate(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ThetaOps.estimate($b)")
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate = copy(child = newChild)
  override def prettyName: String = "theta_estimate"
}

abstract class ThetaBinaryEst extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  protected def call: String
  protected def eval2(a: Array[Byte], b: Array[Byte]): Double
  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ThetaOps.$call($a, $b)")
}

case class ThetaUnionEst(left: Expression, right: Expression) extends ThetaBinaryEst {
  override protected def call = "unionEst"
  override protected def eval2(a: Array[Byte], b: Array[Byte]): Double = ThetaOps.unionEst(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaUnionEst = copy(l, r)
  override def prettyName: String = "theta_union_est"
}

case class ThetaIntersectEst(left: Expression, right: Expression) extends ThetaBinaryEst {
  override protected def call = "intersectEst"
  override protected def eval2(a: Array[Byte], b: Array[Byte]): Double = ThetaOps.intersectEst(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaIntersectEst = copy(l, r)
  override def prettyName: String = "theta_intersect_est"
}

case class ThetaANotBEst(left: Expression, right: Expression) extends ThetaBinaryEst {
  override protected def call = "aNotBEst"
  override protected def eval2(a: Array[Byte], b: Array[Byte]): Double = ThetaOps.aNotBEst(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaANotBEst = copy(l, r)
  override def prettyName: String = "theta_anotb_est"
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

/** `kll_rank(sketch, v) -> double` — normalized rank of v (ds_kll_rank). */
case class KllRankOf(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any, v: Any): Any =
    KllQuantile.rankOf(b.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) => s"graft.functions.KllQuantile.rankOf($b, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllRankOf =
    copy(left = l, right = r)
  override def prettyName: String = "kll_rank"
}

/** `kll_n(sketch) -> bigint` — stream length (ds_kll_n). */
case class KllN(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(b: Any): Any = KllQuantile.countOf(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.KllQuantile.countOf($b)")
  override protected def withNewChildInternal(newChild: Expression): KllN = copy(child = newChild)
  override def prettyName: String = "kll_n"
}

/** Shared shape for the array-in/array-out KLL estimate extractors
  * (ds_kll_cdf / ds_kll_pmf / ds_kll_quantiles, array form). */
abstract class KllArrayEst extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType,
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  protected def call: String
  override def nullSafeEval(b: Any, sp: Any): Any = call match {
    case "cdfAt" => KllQuantile.cdfAt(b.asInstanceOf[Array[Byte]],
      sp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    case "pmfAt" => KllQuantile.pmfAt(b.asInstanceOf[Array[Byte]],
      sp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    case "quantilesAt" => KllQuantile.quantilesAt(b.asInstanceOf[Array[Byte]],
      sp.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, sp) => s"graft.functions.KllQuantile.$call($b, $sp)")
}

case class KllCdf(left: Expression, right: Expression) extends KllArrayEst {
  override protected def call = "cdfAt"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllCdf = copy(l, r)
  override def prettyName: String = "kll_cdf"
}

case class KllPmf(left: Expression, right: Expression) extends KllArrayEst {
  override protected def call = "pmfAt"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllPmf = copy(l, r)
  override def prettyName: String = "kll_pmf"
}

case class KllQuantiles(left: Expression, right: Expression) extends KllArrayEst {
  override protected def call = "quantilesAt"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantiles = copy(l, r)
  override def prettyName: String = "kll_quantiles"
}

// ---- sketch-to-string surfaces (ds_*_stringify / bounds-as-string) ---

/** Static backing for the reference's sketch-rendering builtins
  * (impala_functions.py `ds_hll_estimate_bounds_as_string`,
  * `ds_hll/cpc/theta/kll_stringify`; be/src/exprs/
  * datasketches-functions-ir.cc). Bounds render exactly as the
  * reference's C++ stringstream does — default precision 6
  * significant digits with %g trailing-zero stripping (pinned on
  * known values in SketchSpec). Remaining delta, also pinned:
  * stringify returns the datasketches-java summary (same content
  * as the C++ library's, different layout). */
object SketchStr {
  import org.apache.spark.unsafe.types.UTF8String

  /** C++ `ostream << double` parity: 6 significant digits, %g style,
    * trailing zeros (and a bare trailing '.') stripped from the
    * mantissa — "1234.57", "100000", "0.5", "1.23457e+06". */
  private def fmt(v: Double): String = {
    val g = String.format(java.util.Locale.ROOT, "%.6g", Double.box(v))
    val (mant, exp) = g.indexOf('e') match {
      case -1 => (g, "")
      case i => (g.substring(0, i), g.substring(i))
    }
    var m = mant
    if (m.contains('.')) {
      m = m.reverse.dropWhile(_ == '0').reverse
      if (m.endsWith(".")) m = m.dropRight(1)
    }
    m + exp
  }

  /** "estimate,lower,upper" at kappa std deviations (kappa ∈ 1..3;
    * reference default kappa = 2 — datasketches-common.h:50). */
  def hllBounds(bytes: Array[Byte], kappa: Int): UTF8String = {
    require(kappa >= 1 && kappa <= 3, s"Kappa must be 1, 2 or 3, got $kappa")
    val sk = org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(bytes))
    UTF8String.fromString(
      s"${fmt(sk.getEstimate)},${fmt(sk.getLowerBound(kappa))},${fmt(sk.getUpperBound(kappa))}")
  }

  def hllStr(bytes: Array[Byte]): UTF8String = UTF8String.fromString(
    org.apache.datasketches.hll.HllSketch.heapify(Memory.wrap(bytes)).toString)
  def cpcStr(bytes: Array[Byte]): UTF8String = UTF8String.fromString(
    org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(bytes)).toString)
  def thetaStr(bytes: Array[Byte]): UTF8String = UTF8String.fromString(
    org.apache.datasketches.theta.Sketches.heapifySketch(Memory.wrap(bytes)).toString)
  def kllStr(bytes: Array[Byte]): UTF8String = UTF8String.fromString(
    KllDoublesSketch.heapify(Memory.wrap(bytes)).toString)
}

/** `hll_bounds(sketch, kappa) -> 'est,lo,hi'` (ds_hll_estimate_bounds_as_string). */
case class HllBoundsStr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullSafeEval(b: Any, k: Any): Any =
    SketchStr.hllBounds(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.functions.SketchStr.hllBounds($b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HllBoundsStr =
    copy(left = l, right = r)
  override def prettyName: String = "hll_bounds"
}

/** Shared shape for the four `ds_*_stringify` summary renderers. */
abstract class SketchStringify
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  protected def call: String
  override def nullSafeEval(b: Any): Any = call match {
    case "hllStr" => SketchStr.hllStr(b.asInstanceOf[Array[Byte]])
    case "cpcStr" => SketchStr.cpcStr(b.asInstanceOf[Array[Byte]])
    case "thetaStr" => SketchStr.thetaStr(b.asInstanceOf[Array[Byte]])
    case "kllStr" => SketchStr.kllStr(b.asInstanceOf[Array[Byte]])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.SketchStr.$call($b)")
}

case class HllStringify(child: Expression) extends SketchStringify {
  override protected def call = "hllStr"
  override protected def withNewChildInternal(c: Expression): HllStringify = copy(child = c)
  override def prettyName: String = "hll_stringify"
}
case class CpcStringify(child: Expression) extends SketchStringify {
  override protected def call = "cpcStr"
  override protected def withNewChildInternal(c: Expression): CpcStringify = copy(child = c)
  override def prettyName: String = "cpc_stringify"
}
case class ThetaStringify(child: Expression) extends SketchStringify {
  override protected def call = "thetaStr"
  override protected def withNewChildInternal(c: Expression): ThetaStringify = copy(child = c)
  override def prettyName: String = "theta_stringify"
}
case class KllStringify(child: Expression) extends SketchStringify {
  override protected def call = "kllStr"
  override protected def withNewChildInternal(c: Expression): KllStringify = copy(child = c)
  override def prettyName: String = "kll_stringify"
}

// ---- CPC sketches (compressed probabilistic counting) ----------------

/** CPC distinct-count sketches — the reference's `ds_cpc_sketch`/
  * `ds_cpc_union`/`ds_cpc_estimate` builtins
  * (apache-impala-4.1.0/fe/.../catalog/BuiltinsDb.java ds_cpc_sketch,
  * be/src/exprs/datasketches-functions-ir.cc). CPC ("compressed
  * probabilistic counting", Lang 2017) gives ~30% better accuracy per
  * stored byte than HLL at the cost of slower updates — the sketch you
  * ship over the wire. Buffer holds a live heap CpcSketch; merge pairs
  * go through a CpcUnion; bytes only at shuffle boundaries. */
class CpcBuf(@transient var sketch: org.apache.datasketches.cpc.CpcSketch) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    val bytes = sketch.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    sketch = org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(b))
  }
}

/** `cpc_sketch(x)` build aggregate: longs in, serialized CPC sketch out. */
case class CpcSketchAgg(lgK: Int) extends Aggregator[Long, CpcBuf, Array[Byte]] {
  override def zero: CpcBuf = new CpcBuf(new org.apache.datasketches.cpc.CpcSketch(lgK))
  override def reduce(b: CpcBuf, x: Long): CpcBuf = { b.sketch.update(x); b }
  override def merge(a: CpcBuf, b: CpcBuf): CpcBuf = {
    val u = new org.apache.datasketches.cpc.CpcUnion(lgK)
    u.update(a.sketch); u.update(b.sketch)
    a.sketch = u.getResult
    a
  }
  override def finish(b: CpcBuf): Array[Byte] = b.sketch.toByteArray
  override def bufferEncoder: Encoder[CpcBuf] = Encoders.javaSerialization[CpcBuf]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object CpcOps {
  /** Build a CPC sketch of `c`; lgK=11 (2048 coupons) is the library
    * default ≈ 1.2% RSE. */
  def sketch(c: Column, lgK: Int = 11): Column =
    org.apache.spark.sql.functions.udaf(CpcSketchAgg(lgK)).apply(c)

  def estimate(b: Array[Byte]): Double =
    org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(b)).getEstimate

  /** ds_cpc_union_f: merge two serialized sketches, estimate the union. */
  def unionEst(a: Array[Byte], b: Array[Byte]): Double = {
    val sa = org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(a))
    val sb = org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(b))
    val u = new org.apache.datasketches.cpc.CpcUnion(math.min(sa.getLgK, sb.getLgK))
    u.update(sa); u.update(sb)
    u.getResult.getEstimate
  }
}

/** `cpc_estimate(sketch) -> double` — post-aggregation estimate. */
case class CpcEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(b: Any): Any = CpcOps.estimate(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.CpcOps.estimate($b)")
  override protected def withNewChildInternal(newChild: Expression): CpcEstimate = copy(child = newChild)
  override def prettyName: String = "cpc_estimate"
}

/** `cpc_union_est(a, b) -> double` — union-of-two-sketches estimate. */
case class CpcUnionEst(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    CpcOps.unionEst(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CpcOps.unionEst($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CpcUnionEst =
    copy(left = l, right = r)
  override def prettyName: String = "cpc_union_est"
}
