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
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.array.ByteArrayMethods

  /** Thread-local decoded merge table. The merges array is a broadcast
    * CONSTANT per query but arrives as a fresh per-element `ArrayData`
    * view inside the `transform` lambda, so a naive decode re-converts
    * every rule's UTF8String pair once per corpus WORD (the dominant
    * encode cost after the in-place pass landed — 2×nm allocations per
    * word). The cache keys on CONTENT (a byte-compare against the
    * cached copy for unsafe arrays — identity would be unsound: unsafe
    * buffers are reused across rows), so a changed table re-decodes and
    * a repeated one is one memcmp. */
  private final class RuleCache {
    var bytes: Array[Byte] = null // unsafe-format copy; null = no cache
    var a: Array[String] = new Array[String](0)
    var b: Array[String] = new Array[String](0)
  }
  private val ruleCache = new ThreadLocal[RuleCache] {
    override def initialValue(): RuleCache = new RuleCache
  }
  private def decodeInto(c: RuleCache, merges: ArrayData): Unit = {
    val nm = merges.numElements()
    if (c.a.length != nm) { c.a = new Array[String](nm); c.b = new Array[String](nm) }
    var m = 0
    while (m < nm) {
      val st = merges.getStruct(m, 2)
      c.a(m) = st.getUTF8String(0).toString
      c.b(m) = st.getUTF8String(1).toString
      m += 1
    }
  }
  private def rulesOf(merges: ArrayData): RuleCache = {
    val c = ruleCache.get()
    merges match {
      case u: UnsafeArrayData =>
        val sz = u.getSizeInBytes
        if (c.bytes != null && c.bytes.length == sz &&
            ByteArrayMethods.arrayEquals(u.getBaseObject, u.getBaseOffset,
              c.bytes, Platform.BYTE_ARRAY_OFFSET, sz.toLong)) return c
        decodeInto(c, merges)
        val copy = new Array[Byte](sz)
        Platform.copyMemory(u.getBaseObject, u.getBaseOffset,
          copy, Platform.BYTE_ARRAY_OFFSET, sz.toLong)
        c.bytes = copy
        c
      case _ => // non-unsafe shapes are cold paths: decode fresh
        decodeInto(c, merges); c.bytes = null; c
    }
  }

  /** Greedy BPE encode: split `word` into codepoint symbols, then apply
    * each merge rule in rank order with one left-to-right pass.
    *
    * Hot-path shape (r12 verdict #6): most rules match NO pair in a
    * given word, so each rule first runs an allocation-free adjacency
    * scan and only rewrites the symbol array when a match exists; the
    * rewrite itself compacts IN PLACE (write index trails read index —
    * merges only shrink), so a word costs one symbol-array allocation
    * total instead of one list copy per rule. The rule table decodes
    * through [[rulesOf]]'s content-keyed cache. Semantics are
    * unchanged: one left-to-right non-overlapping pass per rule in
    * rank order (the trainer cross-check in PipelineSpec pins this). */
  def encode(word: UTF8String, merges: ArrayData): ArrayData =
    encodeWith(word, rulesOf(merges))

  /** Whole-row batch encode: resolves the rule table ONCE for every
    * word of the row. Inside `transform(ws, w -> bpe_encode(w, m))`
    * the table arrives as a fresh ArrayData view per WORD, so even the
    * content-keyed cache pays one full-table memcmp per word — for a
    * corpus-derived table that compare dominates the encode itself
    * (the r13 pinned-variant constant factor). One call per row makes
    * it one probe per row. */
  def encodeAll(words: ArrayData, merges: ArrayData): ArrayData = {
    val rc = rulesOf(merges)
    val nw = words.numElements()
    val out = new Array[AnyRef](nw)
    var i = 0
    while (i < nw) {
      out(i) =
        if (words.isNullAt(i)) null
        else encodeWith(words.getUTF8String(i), rc)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  private def encodeWith(word: UTF8String, rc: RuleCache): ArrayData = {
    val w = word.toString
    val syms = new Array[String](math.max(w.length, 1))
    var n = 0
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val cc = Character.charCount(cp)
      syms(n) = w.substring(i, i + cc)
      n += 1
      i += cc
    }
    var m = 0
    val nm = rc.a.length
    while (m < nm && n > 1) {
      val a = rc.a(m)
      val b = rc.b(m)
      // allocation-free scan for the first adjacent (a, b) occurrence
      var p = -1
      var j = 0
      while (p < 0 && j + 1 < n) {
        if (syms(j) == a && syms(j + 1) == b) p = j
        j += 1
      }
      if (p >= 0) {
        // one left-to-right pass from the first match, compacted in place
        var r = p
        var k = p
        while (r < n) {
          if (r + 1 < n && syms(r) == a && syms(r + 1) == b) {
            syms(k) = a + b; r += 2
          } else {
            syms(k) = syms(r); r += 1
          }
          k += 1
        }
        n = k
      }
      m += 1
    }
    val arr = new Array[AnyRef](n)
    var k = 0
    while (k < n) { arr(k) = UTF8String.fromString(syms(k)); k += 1 }
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

/** `bpe_encode_all(words, merges) -> array<array<string>>` — every word
  * of the row in one call, resolving the merge table once per ROW
  * instead of once per word (see [[BpeImpl.encodeAll]]). */
case class BpeEncodeAll(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), BpeMergesType.tpe)
  override def dataType: DataType = ArrayType(ArrayType(StringType, containsNull = false))
  override def nullSafeEval(a: Any, b: Any): Any =
    BpeImpl.encodeAll(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ws, m) => s"graft.functions.BpeImpl.encodeAll($ws, $m)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncodeAll =
    copy(left = l, right = r)
  override def prettyName: String = "bpe_encode_all"
}
