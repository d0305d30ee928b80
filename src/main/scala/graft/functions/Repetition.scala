package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-level repetition statistics for the Gopher repetition ruleset
  * (SURVEY.md §2 P53; Rae et al. 2021 §A1.1, Table A1 — the REPETITION
  * half of the filter; the quality half is P42). One row-local pass
  * computes, over the document's token stream:
  *
  *   - `total_chars`: Σ codepoints over all words (whitespace excluded
  *     from numerators AND the denominator, consistently);
  *   - for n = 2, 3, 4: the most frequent n-gram's occurrence count and
  *     the characters contained in ALL of its occurrences
  *     (occurrences × gram word-chars) — the paper's "fraction of
  *     characters within the most frequent n-gram". Ties on count break
  *     to the EARLIEST first occurrence (an integer, portable across
  *     engines — lexicographic string order is collation-dependent);
  *   - for n = 5..10: characters COVERED by any n-gram occurring more
  *     than once — coverage counts each token position once however
  *     many duplicated grams span it (the paper's "fraction of
  *     characters within duplicate n-grams"), which is why this is a
  *     position-marking walk and not occurrences × length.
  *
  * Compiled expression, not SQL lambdas: this runs once per corpus row
  * and walks the token stream 9 times (§5 rule 13 — the PQ lesson).
  * Like all P-family numerics the outputs are integers, so the DuckDB
  * oracle replays every rule verdict exactly.
  */
object RepStatsImpl {

  val tpe: DataType = StructType(
    StructField("total_chars", LongType, nullable = false) +:
      (2 to 4).flatMap(n => Seq(
        StructField(s"top${n}_occ", LongType, nullable = false),
        StructField(s"top${n}_chars", LongType, nullable = false))) :+
      StructField("dup5_chars", LongType, nullable = false) :+
      StructField("dup6_chars", LongType, nullable = false) :+
      StructField("dup7_chars", LongType, nullable = false) :+
      StructField("dup8_chars", LongType, nullable = false) :+
      StructField("dup9_chars", LongType, nullable = false) :+
      StructField("dup10_chars", LongType, nullable = false))

  def stats(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val wlen = new Array[Int](n)
    // Intern words to dense ids, then build each n-gram level from the
    // previous one: gram_n at j ≡ (id of gram_{n-1} at j, word id at
    // j+n-1) — a bijection onto word sequences, so counting packed
    // (int, int) keys is EXACTLY counting string grams, without ever
    // building a gram string (the string form measured 130 µs/row).
    val wordIds = new java.util.HashMap[String, Integer]()
    val ids = new Array[Int](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      wlen(i) = s.numChars()
      total += wlen(i)
      val w = s.toString
      var id = wordIds.get(w)
      if (id == null) { id = Integer.valueOf(wordIds.size()); wordIds.put(w, id) }
      ids(i) = id.intValue()
      i += 1
    }
    val out = new Array[Any](13)
    out(0) = total
    // sliding char-window sum over wlen for the current gram width
    var winSum = 0L
    var prev = ids // gram ids of width g-1 at each start position
    var g = 2
    var oi = 1
    var di = 7
    while (g <= 10) {
      val nGrams = math.max(0, n - g + 1)
      val cur = new Array[Int](nGrams)
      val gramIds = new java.util.HashMap[java.lang.Long, Integer]()
      val counts = new Array[Int](math.max(nGrams, 1))
      val firstPos = new Array[Int](math.max(nGrams, 1))
      var j = 0
      while (j < nGrams) {
        val key = java.lang.Long.valueOf((prev(j).toLong << 32) | (ids(j + g - 1) & 0xffffffffL))
        var gid = gramIds.get(key)
        if (gid == null) {
          gid = Integer.valueOf(gramIds.size()); gramIds.put(key, gid)
          firstPos(gid.intValue()) = j
        }
        cur(j) = gid.intValue()
        counts(cur(j)) += 1
        j += 1
      }
      if (g <= 4) {
        // most frequent gram: count desc, first occurrence asc; chars =
        // occurrences × the gram's word chars (sliding-window sum)
        var bestC = 0; var bestP = Int.MaxValue; var bestChars = 0L
        winSum = 0L
        var k = 0
        while (k < math.min(g, n)) { winSum += wlen(k); k += 1 }
        j = 0
        while (j < nGrams) {
          if (firstPos(cur(j)) == j) {
            val c = counts(cur(j))
            if (c > bestC || (c == bestC && j < bestP)) {
              bestC = c; bestP = j; bestChars = winSum
            }
          }
          if (j + g < n) { winSum += wlen(j + g) - wlen(j) }
          j += 1
        }
        out(oi) = bestC.toLong
        out(oi + 1) = bestC.toLong * bestChars
        oi += 2
      } else {
        // coverage of positions under any ≥2× gram, each counted once
        val covered = new Array[Boolean](n)
        j = 0
        while (j < nGrams) {
          if (counts(cur(j)) >= 2) {
            var k = j
            while (k < j + g) { covered(k) = true; k += 1 }
          }
          j += 1
        }
        var cc = 0L
        j = 0
        while (j < n) { if (covered(j)) cc += wlen(j); j += 1 }
        out(di) = cc
        di += 1
      }
      prev = cur
      g += 1
    }
    new GenericInternalRow(out)
  }
}

/** Duplicate-element statistics of a string array (the line/paragraph
  * grain of P53): element count, duplicate occurrences beyond each
  * first, total codepoints, and codepoints in those repeated
  * occurrences. EMPTY elements are skipped (the reflow's paragraph
  * separators split into empty lines). One compiled pass — the
  * filter + aggregate + array_distinct builtin composition runs
  * interpreted per element (~4 lambda walks × every line of every
  * corpus row). */
object DupStatsImpl {
  val tpe: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false),
    StructField("chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  def stats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[String]()
    var cnt = 0L
    var dup = 0L
    var chars = 0L
    var dupChars = 0L
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val len = s.numChars()
      if (len > 0) {
        cnt += 1; chars += len
        if (!seen.add(s.toString)) { dup += 1; dupChars += len }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](cnt, dup, chars, dupChars))
  }
}

/** `dup_stats(arr) -> struct<n, n_dup, chars, dup_chars>`. */
case class DupStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = DupStatsImpl.tpe
  override def nullSafeEval(a: Any): Any =
    DupStatsImpl.stats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.DupStatsImpl.stats($a)")
  override protected def withNewChildInternal(c: Expression): DupStats =
    copy(child = c)
  override def prettyName: String = "dup_stats"
}

/** The P48/P53 reflow adapter compiled: fixed-width lines joined by
  * `\n`, fixed-height paragraphs joined by `\n\n`, from a single-space
  * word split (trailing empties kept, like Spark's `split`). The
  * builtin nested transform/slice/array_join composition evaluates
  * interpreted AND recomputes the inner line array once per paragraph
  * — ~0.5 ms/row; this is one linear string walk. */
object ReflowImpl {
  def reflow(text: UTF8String, wordsPerLine: Int, linesPerPara: Int): UTF8String = {
    val words = text.toString.split(" ", -1)
    val nw = words.length
    val nLines = math.max((nw + wordsPerLine - 1) / wordsPerLine, 1)
    val sb = new java.lang.StringBuilder(text.numBytes + nLines + 8)
    var i = 0
    while (i < nLines) {
      if (i > 0) {
        if (i % linesPerPara == 0) sb.append("\n\n") else sb.append('\n')
      }
      var k = i * wordsPerLine
      val end = math.min(k + wordsPerLine, nw)
      while (k < end) {
        if (k > i * wordsPerLine) sb.append(' ')
        sb.append(words(k)); k += 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `reflow_paragraphs(text, wordsPerLine, linesPerPara) -> string`. */
case class ReflowParagraphs(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any, w: Any, l: Any): Any =
    ReflowImpl.reflow(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], l.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w, l) =>
      s"graft.functions.ReflowImpl.reflow($t, $w, $l)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ReflowParagraphs =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "reflow_paragraphs"
}

/** In-bucket pair expansion: sorted id list → all (a, b) pairs with
  * a < b (list order). The equivalent nested transform/slice/flatten
  * builtin composition evaluates INTERPRETED per produced element —
  * at ~1 M pairs per corpus that interpretation tax is most of the
  * candidate stage. Buckets are capped upstream (maxBucket / maxDf),
  * so the output array is bounded. */
object PairExpandImpl {
  def expand(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, ids.getLong(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `pair_expand(ids) -> array<struct<a:bigint, b:bigint>>`. */
case class PairExpand(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(a: Any): Any =
    PairExpandImpl.expand(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PairExpandImpl.expand($a)")
  override protected def withNewChildInternal(c: Expression): PairExpand =
    copy(child = c)
  override def prettyName: String = "pair_expand"
}

/** `gopher_rep_stats(words) -> struct<...>` — all Gopher repetition
  * statistics of one document's token array in a single compiled pass
  * family. Codegen-native. */
case class GopherRepStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = RepStatsImpl.tpe
  override def nullSafeEval(w: Any): Any =
    RepStatsImpl.stats(w.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.RepStatsImpl.stats($w)")
  override protected def withNewChildInternal(c: Expression): GopherRepStats =
    copy(child = c)
  override def prettyName: String = "gopher_rep_stats"
}
