package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-distance builtins from the reference engine's registry
  * (apache-impala-4.1.0/common/function-registry/impala_functions.py:602-618:
  * damerau_levenshtein, jaro_distance/similarity,
  * jaro_winkler_distance/similarity; be/src/exprs/string-functions.h:183).
  * Re-derived from the published algorithms (Jaro 1989, Winkler 1990,
  * Damerau 1964/Lowrance-Wagner full-transposition variant), not the
  * reference code. Implementations are static JVM methods so generated
  * whole-stage code calls them directly.
  *
  * Semantics notes (pinned by fuzz against the DuckDB oracle, 5000 pairs):
  * - both-empty inputs → 1.0 similarity, matching the reference's
  *   JaroSimilarity short-cut (s1len==0 && s2len==0 → 1.0); one-empty →
  *   0.0. DuckDB returns 0.0 for both-empty — a documented deviation
  *   from that oracle, which fn_strdist avoids by using non-empty
  *   inputs. Unlike the reference we accept inputs >255 chars instead
  *   of erroring (a deliberate relaxation; Spark strings are unbounded).
  * - Jaro-Winkler boost: prefix ≤ 4, scaling 0.1, applied only when the
  *   base Jaro exceeds 0.7;
  * - damerau_levenshtein is restricted OSA (optimal string alignment,
  *   each substring transposed at most once: dl("CA","ABC") = 3),
  *   matching the reference's DamerauLevenshtein; the FULL
  *   Lowrance-Wagner variant (distant transpositions allowed:
  *   dl("CA","ABC") = 2, DuckDB's convention) is exposed separately as
  *   damerau_levenshtein_full.
  * - distances operate on UTF-16 code units (ASCII-equivalent for the
  *   corpus data; supplementary-plane text would count surrogates).
  */
object StrDistImpl {

  /** Jaro similarity in [0,1]. */
  def jaro(u1: UTF8String, u2: UTF8String): Double = {
    val s1 = u1.toString
    val s2 = u2.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  /** Jaro-Winkler similarity: Jaro plus a common-prefix boost (≤4 chars,
    * scaling 0.1) when the base similarity clears 0.7. */
  def jaroWinkler(u1: UTF8String, u2: UTF8String): Double = {
    val j = jaro(u1, u2)
    if (j <= 0.7) return j
    val s1 = u1.toString
    val s2 = u2.toString
    val max = math.min(4, math.min(s1.length, s2.length))
    var l = 0
    while (l < max && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  /** Restricted Damerau-Levenshtein (OSA — optimal string alignment):
    * insert, delete, substitute, and transposition of ADJACENT chars,
    * each substring edited at most once. This is the reference engine's
    * recurrence (no alphabet table, three-row DP), so same-named SQL
    * returns the same distances. O(|a|·|b|) time, O(|b|) space. */
  def damerauLevenshtein(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    var prev2 = new Array[Int](lb + 1) // d(i-2, *)
    var prev = new Array[Int](lb + 1)  // d(i-1, *)
    var cur = new Array[Int](lb + 1)   // d(i,   *)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      cur(0) = i
      j = 1
      while (j <= lb) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var best = prev(j - 1) + cost
        if (prev(j) + 1 < best) best = prev(j) + 1
        if (cur(j - 1) + 1 < best) best = cur(j - 1) + 1
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1) && prev2(j - 2) + 1 < best)
          best = prev2(j - 2) + 1
        cur(j) = best
        j += 1
      }
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb)
  }

  /** Full Damerau-Levenshtein distance (Lowrance-Wagner): insert, delete,
    * substitute, and transposition of two characters at any distance —
    * DuckDB's damerau_levenshtein convention, exposed as
    * damerau_levenshtein_full. O(|a|·|b|) time and space — per-row
    * strings, not corpora. */
  def damerauLevenshteinFull(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // last row index (1-based) at which each char was seen in `a`
    val da = new java.util.HashMap[Character, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        var best = d(i)(j) + cost
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        if (trans < best) best = trans
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}

/** `jaro_sim(s1, s2) -> double` — native codegen expression. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDistImpl.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDistImpl.jaro($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_sim"
}

/** `jaro_winkler_sim(s1, s2) -> double`. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDistImpl.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDistImpl.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinklerSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "jaro_winkler_sim"
}

/** `damerau_levenshtein(s1, s2) -> int` — restricted OSA, reference parity. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDistImpl.damerauLevenshtein(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDistImpl.damerauLevenshtein($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshtein =
    copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein"
}

/** `damerau_levenshtein_full(s1, s2) -> int` — unrestricted
  * Lowrance-Wagner (DuckDB's convention). */
case class DamerauLevenshteinFull(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    StrDistImpl.damerauLevenshteinFull(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.StrDistImpl.damerauLevenshteinFull($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DamerauLevenshteinFull =
    copy(left = l, right = r)
  override def prettyName: String = "damerau_levenshtein_full"
}
