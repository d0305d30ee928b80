package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level analysis of opaque media payloads — the codec-free part
  * of a multimodal triage pass that IS computable at 100 TB scan speed:
  * container sniffing from magic numbers, Shannon entropy (compressed/
  * encrypted vs text payloads), and a coarse byte histogram. These are
  * the per-row gates a corpus pipeline runs before ever invoking a
  * decoder (the decode itself stays stubbed in pipeline.Multimodal —
  * no codecs ship in this container). */
object BinImpl {

  private def startsWith(b: Array[Byte], off: Int, sig: Int*): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if ((b(off + i) & 0xff) != sig(i)) return false
      i += 1
    }
    true
  }

  /** Container format from magic numbers (public file signatures). */
  def sniffFormat(b: Array[Byte]): UTF8String = UTF8String.fromString {
    if (startsWith(b, 0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "png"
    else if (startsWith(b, 0, 0xff, 0xd8, 0xff)) "jpeg"
    else if (startsWith(b, 0, 'G', 'I', 'F', '8')) "gif"
    else if (startsWith(b, 0, 'R', 'I', 'F', 'F') && startsWith(b, 8, 'W', 'A', 'V', 'E')) "wav"
    else if (startsWith(b, 0, 'R', 'I', 'F', 'F') && startsWith(b, 8, 'A', 'V', 'I', ' ')) "avi"
    else if (startsWith(b, 0, 'R', 'I', 'F', 'F') && startsWith(b, 8, 'W', 'E', 'B', 'P')) "webp"
    else if (startsWith(b, 4, 'f', 't', 'y', 'p')) "mp4"
    else if (startsWith(b, 0, 'I', 'D', '3') || startsWith(b, 0, 0xff, 0xfb)) "mp3"
    else if (startsWith(b, 0, 0x1a, 0x45, 0xdf, 0xa3)) "mkv"
    else if (startsWith(b, 0, 'O', 'g', 'g', 'S')) "ogg"
    else if (startsWith(b, 0, 'f', 'L', 'a', 'C')) "flac"
    else if (startsWith(b, 0, '%', 'P', 'D', 'F')) "pdf"
    else if (startsWith(b, 0, 'P', 'K', 0x03, 0x04)) "zip"
    else if (startsWith(b, 0, 0x1f, 0x8b)) "gzip"
    else "unknown"
  }

  /** Shannon entropy in bits/byte (0 for empty; 8 = uniform random). */
  def byteEntropy(b: Array[Byte]): Double = {
    if (b.isEmpty) return 0.0
    val counts = new Array[Int](256)
    var i = 0
    while (i < b.length) { counts(b(i) & 0xff) += 1; i += 1 }
    var h = 0.0
    val n = b.length.toDouble
    var c = 0
    while (c < 256) {
      if (counts(c) > 0) {
        val p = counts(c) / n
        h -= p * (math.log(p) / math.log(2.0))
      }
      c += 1
    }
    h
  }

  /** Fraction of bytes per 16-value-wide bin (16 bins over 0..255). */
  def byteHistogram16(b: Array[Byte]): Array[Double] = {
    val out = new Array[Double](16)
    if (b.isEmpty) return out
    var i = 0
    while (i < b.length) { out((b(i) & 0xff) >>> 4) += 1.0; i += 1 }
    var j = 0
    while (j < 16) { out(j) /= b.length; j += 1 }
    out
  }
}

/** `sniff_format(binary) -> string` — container detection from magic
  * numbers, codegen'd for scan-speed triage. */
case class SniffFormat(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = BinImpl.sniffFormat(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BinImpl.sniffFormat($c)")
  override protected def withNewChildInternal(newChild: Expression): SniffFormat = copy(child = newChild)
  override def prettyName: String = "sniff_format"
}

/** `byte_entropy(binary) -> double` — Shannon bits/byte. */
case class ByteEntropy(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any = BinImpl.byteEntropy(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BinImpl.byteEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): ByteEntropy = copy(child = newChild)
  override def prettyName: String = "byte_entropy"
}

/** `byte_histogram16(binary) -> array<double>` — coarse byte histogram. */
case class ByteHistogram16(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      BinImpl.byteHistogram16(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.BinImpl.byteHistogram16($c))")
  override protected def withNewChildInternal(newChild: Expression): ByteHistogram16 = copy(child = newChild)
  override def prettyName: String = "byte_histogram16"
}
