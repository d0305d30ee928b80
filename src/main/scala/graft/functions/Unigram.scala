package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM tokenizer primitives (SURVEY.md §2 P50) — the
  * SentencePiece decoding model (Kudo 2018): a vocabulary of scored
  * pieces, each word segmented by VITERBI into the minimum-total-cost
  * piece sequence. Complements BPE (P38): BPE's segmentation is the
  * replayed merge history, unigram's is a global optimum under the
  * piece scores, so rare words segment into meaningful larger pieces
  * instead of merge-order fragments.
  *
  * Like the BPE/PQ families, the per-word decode is a compiled
  * expression, not a higher-order lambda: Viterbi is a sequential DP
  * (O(len · maxPieceLen) with a hash probe per span) that runs once
  * per corpus word — §5 rule 13 territory.
  *
  * Costs are INTEGER micro-nats (round(-ln(p) · 1e6) computed once at
  * training), so the DP compares longs: deterministic under any
  * partitioning, no float-sum drift. Ties break toward the longer
  * trailing piece (smaller split point), then recursively — a total
  * order, spec-asserted stable under repartition. */
object UnigramImpl {
  /** Cost of an out-of-vocabulary single character: worse than any
    * real piece path so it's only used when nothing covers the char. */
  val UnkCost = 100000000L

  /** The vocab rides the expression as a per-row argument but is the
    * SAME broadcast value on every row — rebuilding the piece map per
    * word would dominate the corpus pass (it did: 4.4 s vs BPE's
    * 1.6 s at sf0.1). One parsed map is cached per thread; the
    * cheap-equality probe (same instance, or equal ArrayData — a byte
    * compare for unsafe rows) falls back to a rebuild on any
    * different vocab, so correctness never depends on the cache. */
  private val vocabCache =
    new ThreadLocal[(ArrayData, java.util.HashMap[String, java.lang.Long], Int)]()

  private def vocabMap(vocab: ArrayData): (java.util.HashMap[String, java.lang.Long], Int) = {
    val c = vocabCache.get()
    if (c != null && ((c._1 eq vocab) || c._1 == vocab)) return (c._2, c._3)
    val costs = new java.util.HashMap[String, java.lang.Long]()
    var maxLen = 1
    var vi = 0
    val nv = vocab.numElements()
    while (vi < nv) {
      val st = vocab.getStruct(vi, 2)
      val p = st.getUTF8String(0).toString
      costs.put(p, st.getLong(1))
      if (p.length > maxLen) maxLen = p.length
      vi += 1
    }
    vocabCache.set((vocab.copy(), costs, maxLen))
    (costs, maxLen)
  }

  /** Viterbi min-cost segmentation of `word` under
    * `vocab: array<struct<piece:string,cost:long>>`. Every position is
    * always reachable (unknown single chars cost [[UnkCost]]). */
  def encode(word: UTF8String, vocab: ArrayData): ArrayData = {
    val (costs, maxLen) = vocabMap(vocab)
    encodeWith(word, costs, maxLen)
  }

  /** Whole-row batch encode: resolves the vocab map ONCE for every
    * word of the row. Inside a `transform`/`aggregate` lambda the
    * vocab arrives as a fresh ArrayData view per WORD, so the cache's
    * equality probe is a full-vocab byte-compare per word — for the
    * corpus-derived pinned char+bigram vocab (thousands of pieces,
    * vs the trained 96) that compare dominates the Viterbi itself
    * (the r13 pinned-variant constant factor). */
  def encodeAll(words: ArrayData, vocab: ArrayData): ArrayData = {
    val (costs, maxLen) = vocabMap(vocab)
    val nw = words.numElements()
    val out = new Array[AnyRef](nw)
    var i = 0
    while (i < nw) {
      out(i) =
        if (words.isNullAt(i)) null
        else encodeWith(words.getUTF8String(i), costs, maxLen)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  private def encodeWith(word: UTF8String,
                         costs: java.util.HashMap[String, java.lang.Long],
                         maxLen: Int): ArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return ArrayData.toArrayData(Array.empty[AnyRef])
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MaxValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      // scan split points ascending: on equal cost the SMALLEST j
      // (longest trailing piece) wins via strict <
      while (j < i) {
        if (best(j) != Long.MaxValue) {
          val span = w.substring(j, i)
          val boxed = costs.get(span)
          val c: Long =
            if (boxed != null) boxed.longValue()
            else if (i - j == 1) UnkCost
            else -1L
          if (c >= 0 && best(j) + c < best(i)) {
            best(i) = best(j) + c
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    val out = new java.util.ArrayList[String]()
    var k = n
    while (k > 0) { out.add(0, w.substring(back(k), k)); k = back(k) }
    val arr = new Array[AnyRef](out.size)
    var a = 0
    while (a < out.size) { arr(a) = UTF8String.fromString(out.get(a)); a += 1 }
    ArrayData.toArrayData(arr)
  }
}

/** Frequency-scored unigram vocabulary: the SEED step of Kudo 2018
  * (substring counting) with maximum-likelihood piece scores, skipping
  * the EM prune rounds — deterministic, integer-exact, and bounded to
  * the training sample (the published practice for tokenizer
  * training). Single characters are always in-vocab so every word
  * segments; the remaining slots go to the most frequent substrings of
  * length 2..maxPieceLen, ties lexicographic. */
object UnigramTrain {
  def train(wordFreqs: Array[(String, Long)], vocabSize: Int,
            maxPieceLen: Int): Array[(String, Long)] = {
    val counts = scala.collection.mutable.HashMap[String, Long]()
    for ((w, f) <- wordFreqs; len <- 1 to math.min(maxPieceLen, w.length);
         s <- 0 to w.length - len)
      counts.updateWith(w.substring(s, s + len))(c => Some(c.getOrElse(0L) + f))
    val (chars, multi) = counts.toSeq.partition(_._1.length == 1)
    val kept = chars ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, vocabSize - chars.size))
    val total = kept.map(_._2).sum.toDouble
    kept.sortBy(_._1).map { case (p, c) =>
      (p, math.round((math.log(total) - math.log(c.toDouble)) * 1e6))
    }.toArray
  }
}

object UnigramVocabType {
  /** array<struct<piece:string,cost:long>> — the shape the trainer's
    * collect_list builds. */
  val tpe: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType), StructField("cost", LongType))))
}

/** `unigram_encode(word, vocab) -> array<string>` — Viterbi min-cost
  * segmentation of one word under the scored vocabulary. */
case class UnigramEncode(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, UnigramVocabType.tpe)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    UnigramImpl.encode(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, v) => s"graft.functions.UnigramImpl.encode($w, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnigramEncode =
    copy(left = l, right = r)
  override def prettyName: String = "unigram_encode"
}

/** `unigram_encode_all(words, vocab) -> array<array<string>>` — every
  * word of the row in one call, resolving the vocab map once per ROW
  * instead of once per word (see [[UnigramImpl.encodeAll]]). */
case class UnigramEncodeAll(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType), UnigramVocabType.tpe)
  override def dataType: DataType = ArrayType(ArrayType(StringType, containsNull = false))
  override def nullSafeEval(a: Any, b: Any): Any =
    UnigramImpl.encodeAll(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ws, v) => s"graft.functions.UnigramImpl.encodeAll($ws, $v)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): UnigramEncodeAll =
    copy(left = l, right = r)
  override def prettyName: String = "unigram_encode_all"
}
