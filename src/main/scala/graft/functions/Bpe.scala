package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding primitives (SURVEY.md §2 P38).
  *
  * The merge-application loop is the tokenizer hot path — it runs once
  * per corpus WORD — so like the PQ family it is a compiled expression,
  * not a higher-order SQL lambda (Spark interprets lambdas per element;
  * the PQ encode was 6.5× slower that way, §5 rule 13).
  *
  * Merge semantics are the classic left-to-right non-overlapping pass
  * per rank (Sennrich et al. 2016) — the SAME pass [[BpeTrain]] applies
  * during training, so encoding a training word under the learned table
  * reproduces its training-time segmentation exactly (asserted by the
  * trainer-vs-encoder cross-check in PipelineSpec).
  */
object BpeImpl {
  /** Greedy BPE encode: split `word` into codepoint symbols, then apply
    * each merge rule in rank order with one left-to-right pass. */
  def encode(word: UTF8String, merges: ArrayData): ArrayData = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    var m = 0
    val nm = merges.numElements()
    while (m < nm) {
      val st = merges.getStruct(m, 2)
      val a = st.getUTF8String(0).toString
      val b = st.getUTF8String(1).toString
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else {
          out.add(syms.get(j)); j += 1
        }
      }
      syms = out
      m += 1
    }
    val arr = new Array[AnyRef](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    ArrayData.toArrayData(arr)
  }
}

/** Classic BPE training (Sennrich et al. 2016) over a bounded
  * (word, freq) sample: `numMerges` rounds of count-adjacent-pairs →
  * argmax (count desc, then (a, b) lexicographic) → one left-to-right
  * merge pass per word. Runs as a single executor task
  * (pipeline/Tokenizer.trainMerges): training is inherently sequential
  * in rank and the sample is bounded, so one task IS the scale-correct
  * plan — parallelizing 16 rounds over 256 docs only buys 32 job
  * launches. Pair counts are sums and the tie-break is total, so the
  * result is independent of input iteration order. */
object BpeTrain {
  def train(wordFreqs: Array[(String, Long)], numMerges: Int): Array[(String, String)] = {
    var words: Array[(Array[String], Long)] = wordFreqs.map { case (w, f) =>
      val syms = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n); i += n
      }
      (syms.toArray, f)
    }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var r = 0
    while (r < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, f) <- words; j <- 0 until syms.length - 1)
        counts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) return out.toArray // every word is one symbol
      val (a, b) = counts.toSeq.minBy { case ((pa, pb), c) => (-c, pa, pb) }._1
      out += ((a, b))
      words = words.map { case (syms, f) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            buf += a + b; j += 2
          } else { buf += syms(j); j += 1 }
        }
        (buf.toArray, f)
      }
      r += 1
    }
    out.toArray
  }
}

object BpeMergesType {
  /** array<struct<a:string,b:string>> in rank order — the shape the
    * trainer's collect_list(sorted by rank) builds. */
  val tpe: DataType = ArrayType(StructType(Seq(
    StructField("a", StringType), StructField("b", StringType))))
}

/** `bpe_encode(word, merges) -> array<string>` — BPE tokens of one word
  * under the rank-ordered merge table. Codegen-native. */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, BpeMergesType.tpe)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    BpeImpl.encode(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, m) => s"graft.functions.BpeImpl.encode($w, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncode =
    copy(left = l, right = r)
  override def prettyName: String = "bpe_encode"
}
