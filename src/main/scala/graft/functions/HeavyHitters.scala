package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy hitters (public algorithm, Misra & Gries 1982;
  * the `approx_top_k` shape). The scale argument over exact
  * `groupBy(word).count`: each partition reduces to a k-counter
  * summary, so the shuffle carries O(k · partitions) rows instead of
  * the whole vocabulary — the right trade at 100 TB where the token
  * vocabulary is itself huge. Guarantee: every item with true
  * frequency > n/(k+1) survives, and each reported count is within
  * n/(k+1) below the true count.
  *
  * The buffer is a LIVE hash map (Spark's typed-imperative aggregation
  * keeps buffer objects on the heap); serialization to entry arrays
  * happens only at shuffle boundaries — per-row cost is one map update,
  * not a rebuild. */
class MgState(@transient var m: mutable.LinkedHashMap[String, Long], var n: Long)
    extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.writeLong(n)
    out.writeInt(m.size)
    m.foreach { case (w, c) => out.writeUTF(w); out.writeLong(c) }
  }
  private def readObject(in: ObjectInputStream): Unit = {
    n = in.readLong()
    val size = in.readInt()
    m = mutable.LinkedHashMap.empty
    var i = 0
    while (i < size) { m.put(in.readUTF(), in.readLong()); i += 1 }
  }
}

case class MisraGriesAgg(k: Int) extends Aggregator[String, MgState, Array[String]] {
  require(k > 0, s"heavy_hitters: k must be positive, got $k")

  override def zero: MgState = new MgState(mutable.LinkedHashMap.empty, 0L)

  /** Classic MG step: known key +1; room → insert; full → all −1. */
  override def reduce(b: MgState, x: String): MgState = {
    if (x == null) return b
    b.n += 1
    b.m.get(x) match {
      case Some(c) => b.m.update(x, c + 1)
      case None if b.m.size < k => b.m.put(x, 1L)
      case None =>
        val dead = b.m.iterator.filter(_._2 == 1L).map(_._1).toList
        b.m.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(b.m.remove)
    }
    b
  }

  /** Merged-MG (Agarwal et al., "Mergeable Summaries"): sum counters,
    * then subtract the (k+1)-th largest count and drop ≤0. */
  override def merge(a: MgState, b: MgState): MgState = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    b.m.foreach { case (w, c) => a.m.update(w, a.m.getOrElse(w, 0L) + c) }
    if (a.m.size > k) {
      val kth = a.m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val kept = a.m.iterator.map { case (w, c) => (w, c - kth) }.filter(_._2 > 0).toSeq
      a.m = mutable.LinkedHashMap.empty
      kept.foreach { case (w, c) => a.m.put(w, c) }
    }
    a.n += b.n
    a
  }

  /** `word:lowerBoundCount`, heaviest first (count desc, then word). */
  override def finish(b: MgState): Array[String] =
    b.m.toArray.sortBy { case (w, c) => (-c, w) }
      .map { case (w, c) => s"$w:$c" }

  override def bufferEncoder: Encoder[MgState] = Encoders.javaSerialization[MgState]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object HeavyHitters {
  def of(c: Column, k: Int = 50): Column = udaf(MisraGriesAgg(k)).apply(c)
}
