package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
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
