package graft

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Slot-replacing persist: operators whose plan genuinely reads a
  * subtree more than once (q49's bounded aggregate, the dedup shingle
  * projection, the corpus gate) persist it — but a long-lived session
  * calling such an operator repeatedly must not pin every historical
  * cache. Each call parks its cache in the operator's slot and releases
  * the previous occupant, so steady state is exactly ONE live cache per
  * operator regardless of call count. Bench/Verify additionally sweep
  * all persisted blocks between queries (blocking), so cross-query
  * state is zero there; this discipline is for every OTHER caller. */
object CacheSlot {
  def replace(df: DataFrame, slot: AtomicReference[DataFrame]): DataFrame = {
    val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
    val old = slot.getAndSet(cached)
    // The sameResult guard is load-bearing: when a caller re-runs the
    // SAME operator on the same input (bench iterations, repeated test
    // queries), the new persist() is a no-op on the already-registered
    // plan — CacheManager keys caches by plan, not by DataFrame — so
    // unpersisting the "old" handle would drop the ONE shared entry and
    // silently run the new call uncached. Only a genuinely different
    // plan releases the previous cache.
    if ((old ne null) && (old ne cached) &&
        !old.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
      old.unpersist(blocking = false)
    cached
  }
}
