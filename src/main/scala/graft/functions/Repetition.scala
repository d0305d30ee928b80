package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

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
    val ws = new Array[String](n)
    val wlen = new Array[Int](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      ws(i) = s.toString
      wlen(i) = s.numChars()
      total += wlen(i)
      i += 1
    }
    val out = new Array[Any](13)
    out(0) = total
    // Most-frequent n-gram (n = 2..4): count, first position, chars.
    var g = 2
    var oi = 1
    while (g <= 4) {
      // value = [count, firstPos, gramChars]
      val m = new java.util.HashMap[String, Array[Long]]()
      var j = 0
      while (j + g <= n) {
        val sb = new java.lang.StringBuilder()
        var c = 0L
        var k = j
        while (k < j + g) {
          if (k > j) sb.append(' ')
          sb.append(ws(k)); c += wlen(k); k += 1
        }
        val v = m.get(sb.toString)
        if (v == null) m.put(sb.toString, Array(1L, j.toLong, c)) else v(0) += 1L
        j += 1
      }
      var bestC = 0L
      var bestP = Long.MaxValue
      var bestChars = 0L
      val it = m.values().iterator()
      while (it.hasNext) {
        val v = it.next()
        if (v(0) > bestC || (v(0) == bestC && v(1) < bestP)) {
          bestC = v(0); bestP = v(1); bestChars = v(2)
        }
      }
      out(oi) = bestC
      out(oi + 1) = bestC * bestChars
      oi += 2
      g += 1
    }
    // Duplicate-n-gram coverage (n = 5..10): token positions spanned by
    // any gram seen ≥2 times, each position's chars counted once.
    g = 5
    var di = 7
    while (g <= 10) {
      val nGrams = math.max(0, n - g + 1)
      val keys = new Array[String](nGrams)
      val counts = new java.util.HashMap[String, Int]()
      var j = 0
      while (j < nGrams) {
        val sb = new java.lang.StringBuilder()
        var k = j
        while (k < j + g) {
          if (k > j) sb.append(' ')
          sb.append(ws(k)); k += 1
        }
        keys(j) = sb.toString
        counts.put(keys(j), counts.getOrDefault(keys(j), 0) + 1)
        j += 1
      }
      val covered = new Array[Boolean](n)
      j = 0
      while (j < nGrams) {
        if (counts.getOrDefault(keys(j), 0) >= 2) {
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
      g += 1
    }
    new GenericInternalRow(out)
  }
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
