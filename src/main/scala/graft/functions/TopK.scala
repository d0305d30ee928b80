package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** One (score, key) candidate; ordering is score DESC then key ASC, a
  * strict total order whenever keys are unique within the group. */
case class TopKPair(score: Double, key: Long)

/** Bounded top-k buffer: two parallel arrays kept sorted in rank order.
  * O(k) memory per group no matter how many rows flow through, and
  * mergeable, so Spark runs it with partial (map-side) aggregation: a
  * low-cardinality group key — the exact case where a rank() window
  * collapses to one task per partition value — shuffles only k rows per
  * map partition instead of the whole group. */
case class TopKBuf(var scores: Array[Double], var keys: Array[Long], var n: Int)

/** Top-k-per-group aggregate, the distributed replacement for
  * `rank() OVER (PARTITION BY g ORDER BY s DESC, key) <= k` when `g`
  * has few distinct values. The reference plans the same shape as its
  * TopN node (apache-impala-4.1.0/be/src/exec/topn-node.cc — bounded
  * in-memory heap per partition); here the heap is a Spark typed
  * Aggregator so the partial/final split falls out of the engine. */
case class TopKAgg(k: Int) extends Aggregator[TopKPair, TopKBuf, Seq[TopKPair]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  @inline private def before(sa: Double, ka: Long, sb: Double, kb: Long): Boolean =
    sa > sb || (sa == sb && ka < kb)

  override def zero: TopKBuf = TopKBuf(Array.emptyDoubleArray, Array.emptyLongArray, 0)

  override def reduce(b: TopKBuf, x: TopKPair): TopKBuf = insert(b, x.score, x.key)

  private def insert(b: TopKBuf, s: Double, key: Long): TopKBuf = {
    if (b.n == k && !before(s, key, b.scores(b.n - 1), b.keys(b.n - 1))) return b
    if (b.n == b.scores.length && b.scores.length < k) {
      val cap = math.min(k, math.max(8, b.scores.length * 2))
      b.scores = java.util.Arrays.copyOf(b.scores, cap)
      b.keys = java.util.Arrays.copyOf(b.keys, cap)
    }
    // insertion point: first slot whose element sorts after (s, key)
    var i = b.n
    while (i > 0 && before(s, key, b.scores(i - 1), b.keys(i - 1))) i -= 1
    val last = math.min(b.n, k - 1) // drop the overflow element if full
    var j = last
    while (j > i) { b.scores(j) = b.scores(j - 1); b.keys(j) = b.keys(j - 1); j -= 1 }
    b.scores(i) = s
    b.keys(i) = key
    if (b.n < k) b.n += 1
    b
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { insert(a, b.scores(i), b.keys(i)); i += 1 }
    a
  }

  override def finish(b: TopKBuf): Seq[TopKPair] =
    (0 until b.n).map(i => TopKPair(b.scores(i), b.keys(i)))

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
  override def outputEncoder: Encoder[Seq[TopKPair]] = ExpressionEncoder[Seq[TopKPair]]()
}

object TopK {
  /** Array-of-struct column of the group's top `k` (score, key) pairs in
    * rank order (score DESC, key ASC). */
  def topk(score: Column, key: Column, k: Int): Column =
    udaf(TopKAgg(k)).apply(score, key)
}
