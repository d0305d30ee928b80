package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Sampling-family aggregates mirroring the reference's `sample()`,
  * `histogram()` and `sampled_ndv()` builtins
  * (apache-impala-4.1.0/fe/src/main/java/org/apache/impala/catalog/
  * BuiltinsDb.java:1020,1040,1179; be/src/exprs/
  * aggregate-functions-ir.cc:2456). All three share one bounded
  * reservoir buffer: O(capacity) memory per group regardless of group
  * size, mergeable for partial aggregation. Randomness is derived from
  * splitmix64 over (seed, items-seen, value bits) — no global RNG
  * state, so a task retry replays identically; results still depend on
  * partition order like every distributed reservoir (declared
  * approximate, rows-only checked).
  */
case class ResBuf(var items: Array[Double], var filled: Int, var seen: Long)

abstract class ReservoirAgg[OUT](capacity: Int, seed: Long)
    extends Aggregator[Double, ResBuf, OUT] {
  require(capacity > 0, s"reservoir capacity must be positive, got $capacity")

  // The reservoir array GROWS lazily toward `capacity` instead of being
  // pre-allocated: when this aggregate shares a query with a DISTINCT
  // agg, Spark's expand phase runs partial aggregation keyed by
  // (group, distinct-col) — millions of one-row groups at scale, each
  // with its own buffer. Eager capacity-sized arrays turn that into
  // gigabytes of allocation churn; lazy growth keeps a one-row group's
  // buffer at 8 slots.
  override def zero: ResBuf = ResBuf(Array.emptyDoubleArray, 0, 0L)

  private def rng(a: Long, b: Long): Long =
    HashImpl.splitmix64(HashImpl.splitmix64(seed ^ a) ^ b)

  override def reduce(buf: ResBuf, x: Double): ResBuf = {
    buf.seen += 1
    if (buf.filled < capacity) {
      if (buf.filled == buf.items.length)
        buf.items = java.util.Arrays.copyOf(buf.items,
          math.min(capacity, math.max(8, buf.items.length * 2)))
      buf.items(buf.filled) = x
      buf.filled += 1
    } else {
      // classic reservoir step: keep x with prob capacity/seen
      val j = java.lang.Math.floorMod(rng(buf.seen, java.lang.Double.doubleToLongBits(x)), buf.seen)
      if (j < capacity) buf.items(j.toInt) = x
    }
    buf
  }

  /** A buffer that sampled nothing yet (seen == filled) is an exact
    * multiset of its rows — replay them through the O(1) reservoir
    * step instead of the E-S resort. This is the hot path when a
    * DISTINCT agg in the same query forces partial aggregation over
    * millions of one-row groups: merge cost drops from
    * O(capacity·log capacity) per one-row buffer to O(1). */
  private def mergeExhaustive(into: ResBuf, exact: ResBuf): ResBuf = {
    var i = 0
    while (i < exact.filled) { reduce(into, exact.items(i)); i += 1 }
    into
  }

  override def merge(a: ResBuf, b: ResBuf): ResBuf = {
    if (b.seen == 0) a
    else if (a.seen == 0) b
    else if (b.seen == b.filled) mergeExhaustive(a, b)
    else if (a.seen == a.filled) mergeExhaustive(b, a)
    else {
      // Efraimidis–Spirakis weighted merge: each reservoir item stands
      // for seen/filled source rows; keep the `capacity` largest keys
      // u^(1/w) (equivalently log(u)/w). Without replacement, so the
      // merge can't inflate duplicates and skew the NDV estimator.
      val total = a.seen + b.seen
      val nPool = a.filled + b.filled
      val keys = new Array[Double](nPool)
      val vals = new Array[Double](nPool)
      var i = 0
      while (i < nPool) {
        val fromA = i < a.filled
        val v = if (fromA) a.items(i) else b.items(i - a.filled)
        val w = if (fromA) a.seen.toDouble / a.filled else b.seen.toDouble / b.filled
        val u = ((rng(total ^ i.toLong, java.lang.Double.doubleToLongBits(v)) >>> 11)
          .toDouble + 0.5) / (1L << 53).toDouble
        keys(i) = math.log(u) / w
        vals(i) = v
        i += 1
      }
      val keep = math.min(capacity, nPool) // nPool ≤ 2·capacity: sort is cheap
      val idx = (0 until nPool).sortBy(j => -keys(j))
      val out = new Array[Double](keep)
      var k = 0
      while (k < keep) { out(k) = vals(idx(k)); k += 1 }
      ResBuf(out, keep, total)
    }
  }

  override def bufferEncoder: Encoder[ResBuf] = ExpressionEncoder[ResBuf]()

  protected def sample(buf: ResBuf): Array[Double] =
    java.util.Arrays.copyOfRange(buf.items, 0, buf.filled)
}

/** `sample(x)`: a bounded uniform row sample of the group. */
case class SampleAgg(capacity: Int, seed: Long)
    extends ReservoirAgg[Array[Double]](capacity, seed) {
  override def finish(buf: ResBuf): Array[Double] = {
    val s = sample(buf)
    java.util.Arrays.sort(s) // canonical order for stable output
    s
  }
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** `histogram(x, b)`: equi-height bucket right-edges estimated from the
  * reservoir (the reference's histogram() is likewise sample-based). */
case class HistogramAgg(buckets: Int, capacity: Int, seed: Long)
    extends ReservoirAgg[Array[Double]](capacity, seed) {
  require(buckets > 0, s"histogram needs at least 1 bucket, got $buckets")
  override def finish(buf: ResBuf): Array[Double] = {
    val s = sample(buf)
    if (s.isEmpty) Array.emptyDoubleArray
    else {
      java.util.Arrays.sort(s)
      // Clamp below as well as above: with fewer sampled rows than
      // buckets, i*len/buckets - 1 is -1 for the leading buckets.
      (1 to buckets).map(i => s(math.max(0, math.min(s.length - 1,
        (i.toLong * s.length / buckets).toInt - 1)))).toArray
    }
  }
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** `sampled_ndv(x)`: NDV estimated from the reservoir with the GEE
  * estimator (Charikar et al., PODS 2000): d + (sqrt(n/r) - 1) * f1,
  * where d = distinct in sample, f1 = singletons in sample, r = sample
  * size, n = rows seen. Exact when the whole group fits the reservoir. */
case class SampledNdvAgg(capacity: Int, seed: Long)
    extends ReservoirAgg[Long](capacity, seed) {
  override def finish(buf: ResBuf): Long = {
    val s = sample(buf)
    if (s.isEmpty) 0L
    else {
      java.util.Arrays.sort(s)
      var d = 0L
      var f1 = 0L
      var i = 0
      while (i < s.length) {
        var j = i
        while (j < s.length && s(j) == s(i)) j += 1
        d += 1
        if (j - i == 1) f1 += 1
        i = j
      }
      if (buf.seen <= s.length) d
      else math.round(d + (math.sqrt(buf.seen.toDouble / s.length) - 1.0) * f1)
    }
  }
  override def outputEncoder: Encoder[Long] = ExpressionEncoder[Long]()
}

object Sampling {
  def sample(c: Column, capacity: Int = 100, seed: Long = 42L): Column =
    udaf(SampleAgg(capacity, seed)).apply(c)
  def histogram(c: Column, buckets: Int = 10, capacity: Int = 1000, seed: Long = 42L): Column =
    udaf(HistogramAgg(buckets, capacity, seed)).apply(c)
  def sampledNdv(c: Column, capacity: Int = 1000, seed: Long = 42L): Column =
    udaf(SampledNdvAgg(capacity, seed)).apply(c)
}
