package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector math for the embeddings pipeline (`embeddings.embedding:
  * array<float>`). Accumulation is in double, left-to-right, so results
  * are deterministic and reproducible against any engine that does the
  * same (the DuckDB oracle casts FLOAT[] to DOUBLE[]).
  */
object VectorImpl {
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    // fail fast on ragged/corrupt embeddings: a prefix-only cosine is a
    // plausible-but-wrong score (and the DuckDB oracle rejects mismatch)
    require(n == y.numElements(),
      s"cosine_sim: vector length mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      require(!x.isNullAt(i) && !y.isNullAt(i), "cosine_sim: NULL vector element")
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    require(n == y.numElements(),
      s"dot: vector length mismatch ($n vs ${y.numElements()})")
    var d = 0.0
    var i = 0
    while (i < n) { d += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    d
  }

  /** Sign-bits of 64 fixed pseudo-random hyperplanes — random-hyperplane
    * LSH (Charikar 2002). Hyperplane components are derived from a
    * splitmix64 stream seeded per (plane, dim), so executors need no
    * broadcast state and the bucketing is deterministic. */
  def rhpSignature(x: ArrayData, planes: Int): Long = {
    // 1L << p wraps mod 64 on the JVM: planes > 64 would silently alias
    // onto already-used bits and correlate the LSH tables
    require(planes >= 1 && planes <= 64, s"rhp_bucket: planes must be in [1,64], got $planes")
    val n = x.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * gaussianish(p.toLong * 1000003L + i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Unit-norm copy in float (zero vectors pass via the 1e-12 floor). */
  def l2Normalize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; ss += v * v; i += 1 }
    val inv = 1.0 / math.max(math.sqrt(ss), 1e-12)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = (x.getFloat(i).toDouble * inv).toFloat; i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Deterministic pseudo-gaussian in [-1,1) from splitmix64 (public
    * algorithm, Steele et al. 2014). Quality suffices for LSH signs. */
  private def gaussianish(seed: Long): Double = {
    var z = seed + -7046029254386353131L // 0x9e3779b97f4a7c15
    z = (z ^ (z >>> 30)) * -4658895280553007687L // 0xbf58476d1ce4e5b9
    z = (z ^ (z >>> 27)) * -7723592293110705685L // 0x94d049bb133111eb
    z = z ^ (z >>> 31)
    (z.toDouble / 9.223372036854776e18)
  }
}

/** `cosine_sim(array<float>, array<float>) -> double`, codegen-native. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.VectorImpl.cosine($x, $y)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** `rhp_bucket(array<float>, nplanes) -> bigint` — random-hyperplane LSH
  * bucket id; the scale path for ANN (bucket-join instead of n² pairs). */
case class RhpBucket(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.rhpSignature(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, p) => s"graft.functions.VectorImpl.rhpSignature($x, $p)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RhpBucket =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "rhp_bucket"
}

/** Product-quantization kernels (pipeline/Similarity.pqTopK). These are
  * the corpus-side hot path: Spark's higher-order lambdas are
  * INTERPRETED per element (no whole-stage codegen inside a lambda), so
  * encoding 100 TB of vectors through `aggregate`/`transform` pays
  * ~2000 interpreted calls per row; these compiled loops are the same
  * math at memory-bandwidth speed, inlined into codegen like
  * cosine_sim. The codebook argument is the sorted-dense
  * array<struct<m:int,code:int,cvec:array<float>>> built by pqTopK —
  * entry index m*K + code, which dense-Lloyd guarantees. */
object PqImpl {
  /** L2-normalize into a fresh double array. */
  private def normalized(vec: ArrayData): Array[Double] = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var ss = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; v(i) = x; ss += x * x; i += 1 }
    val inv = 1.0 / math.max(math.sqrt(ss), 1e-12)
    i = 0
    while (i < dim) { v(i) *= inv; i += 1 }
    v
  }

  /** codes[m] = argmin_code L2²(subvec_m, cb[m*K+code].cvec). */
  def encode(vec: ArrayData, cb: ArrayData, k: Int): ArrayData = {
    val v = normalized(vec)
    val m0 = cb.numElements() / k
    val sd = v.length / m0
    val out = new Array[Int](m0)
    var m = 0
    while (m < m0) {
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val e = cb.getStruct(m * k + c, 3)
        val cv = e.getArray(2)
        var d = 0.0
        var j = 0
        while (j < sd) { val t = v(m * sd + j) - cv.getFloat(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = e.getInt(1) }
        c += 1
      }
      out(m) = best
      m += 1
    }
    ArrayData.toArrayData(out)
  }

  /** ADC lookup table: dtab[i] = L2²(query subvec cb[i].m, cb[i].cvec). */
  def dtab(vec: ArrayData, cb: ArrayData, k: Int): ArrayData = {
    val v = normalized(vec)
    val n = cb.numElements()
    val m0 = n / k
    val sd = v.length / m0
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val e = cb.getStruct(i, 3)
      val m = e.getInt(0)
      val cv = e.getArray(2)
      var d = 0.0
      var j = 0
      while (j < sd) { val t = v(m * sd + j) - cv.getFloat(j); d += t * t; j += 1 }
      out(i) = d
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** score = Σ_m dtab[m*K + codes[m]] — M table adds per candidate. */
  def adcScore(codes: ArrayData, dtab: ArrayData, k: Int): Double = {
    var s = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) { s += dtab.getDouble(m * k + codes.getInt(m)); m += 1 }
    s
  }
}

object PqCodebookType {
  /** array<struct<m:int,code:int,cvec:array<float>>> — the sorted-dense
    * shape pqTopK's collect_list builds; ExpectsInputTypes matches it
    * ignoring nullability. */
  val tpe: DataType = ArrayType(StructType(Seq(
    StructField("m", IntegerType), StructField("code", IntegerType),
    StructField("cvec", ArrayType(FloatType)))))
}

/** `pq_encode(vec, codebook, K) -> array<int>` — PQ codes, codegen-native. */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), PqCodebookType.tpe, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqImpl.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb, k) => s"graft.functions.PqImpl.encode($v, $cb, $k)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqEncode =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_encode"
}

/** `pq_dtab(vec, codebook, K) -> array<double>` — per-query ADC table. */
case class PqDtab(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType), PqCodebookType.tpe, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqImpl.dtab(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, cb, k) => s"graft.functions.PqImpl.dtab($v, $cb, $k)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqDtab =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_dtab"
}

/** `pq_adc_score(codes, dtab, K) -> double` — table-lookup distance. */
case class PqAdcScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PqImpl.adcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], c.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (co, dt, k) => s"graft.functions.PqImpl.adcScore($co, $dt, $k)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqAdcScore =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "pq_adc_score"
}

/** `l2_normalize(array<float>) -> array<float>` — unit-norm copy
  * (zero vectors pass through via the 1e-12 floor). Keeps PQ training
  * lambda-free: slice() over this is plain codegen, where a
  * transform(..., x -> x / norm) lambda is interpreted per element. */
case class L2Normalize(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(a: Any): Any = VectorImpl.l2Normalize(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorImpl.l2Normalize($v)")
  override protected def withNewChildInternal(newChild: Expression): L2Normalize = copy(child = newChild)
  override def prettyName: String = "l2_normalize"
}
