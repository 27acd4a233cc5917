package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/**
 * Session-scoped registry for the operator-internal caches whose
 * lifetime must outlive the operator CALL (the returned plan references
 * the cached branch) but not the SESSION.
 *
 * Several operators persist a multi-consumer branch — `jaccardJoin`'s
 * token sets, `collocations`' unigram counts, `pairRules`' distinct
 * basket-items, `rollingActive`'s actor-day pairs, `ivfPqTopK`'s cell
 * assignment — because Catalyst would otherwise re-execute the branch
 * per consumer (each site is plan-audited). The operator itself cannot
 * unpersist: it returns a lazy DataFrame and the cache must be live when
 * the CALLER runs the action. Left unmanaged, a long-lived session
 * accumulates every such cache and leans on block-manager LRU — correct
 * but nondeterministic in footprint.
 *
 * So each of those sites registers here, and the harness running the
 * actions ([[Bench]] after every measured pass, [[Verify]] after the
 * dump pool drains, or any library caller via this API) calls
 * [[releaseAll]] once the consuming action completes. Deliberately
 * durable caches (none currently — the IVF-PQ index cache is scoped
 * per-query; its serve-many production analog is the PARQUET artifact
 * via `AnnIndex`) would simply not register here.
 */
object CacheScope {
  private val registry = new ConcurrentHashMap[Long, Dataset[_]]()
  private val nextId = new AtomicLong(0L)

  /** Persist `ds` and register it for scoped release. Returns `ds`. */
  def scoped[T](ds: Dataset[T],
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    ds.persist(level)
    registry.put(nextId.incrementAndGet(), ds)
    ds
  }

  /** Register an ALREADY-persisted dataset for scoped release — for
    * iterative operators that persist each round internally and hand the
    * final round's cache to the caller (unpersisting a derived
    * projection is a no-op, so without registration the last round's
    * cache would outlive the session's interest in it). */
  def adopt[T](ds: Dataset[T]): Dataset[T] = {
    registry.put(nextId.incrementAndGet(), ds)
    ds
  }

  /** Number of scoped caches awaiting release (for footprint specs). */
  def retainedCount: Int = registry.size

  /** Unpersist every scoped cache and clear the registry. Safe to call
    * when no action has materialized a cache yet (unpersist is a no-op
    * then); `blocking = true` waits for block removal — use in specs
    * that assert on `getPersistentRDDs`. */
  def releaseAll(blocking: Boolean = false): Unit = {
    val it = registry.entrySet().iterator()
    while (it.hasNext) {
      it.next().getValue.unpersist(blocking)
      it.remove()
    }
  }
}
