package graft.operators

import java.util.concurrent.atomic.AtomicLong

/** Partial caching for lookup joins — Flink's
  * `LookupCache`/`DefaultLookupCache` (lookup.partial-cache.max-rows /
  * .expire-after-write, lookup.cache-missing-key): a bounded LRU with
  * write-TTL expiry and NEGATIVE caching (a miss is a cached fact too
  * — without it every absent key hammers the service on every row).
  *
  * The clock is injected so expiry is deterministic under test; the
  * default is wall time, which is the semantics Flink gives it —
  * staleness is bounded by the TTL in PROCESSING time, per executor.
  * Thread-safe via a single lock: lookup joins are I/O-bound, so a
  * cache lock is never the bottleneck (the loader call happens OUTSIDE
  * the lock).
  */
final class LookupCache[K, V](maxRows: Int, ttlMs: Long,
    clock: () => Long = () => System.currentTimeMillis()) extends Serializable {
  require(maxRows >= 1, s"maxRows must be >= 1: $maxRows")
  require(ttlMs > 0, s"ttlMs must be positive: $ttlMs")

  private case class Entry(value: Option[V], writtenAtMs: Long)

  // accessOrder = true → iteration order is LRU; removeEldestEntry
  // bounds the size
  private val map = new java.util.LinkedHashMap[K, Entry](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Entry]): Boolean =
      size() > maxRows
  }

  val hits = new AtomicLong(0)
  val misses = new AtomicLong(0)

  /** Cached value if present and fresh — `Some(None)` is a fresh
    * NEGATIVE entry (key known absent), `None` means load needed. */
  def get(k: K): Option[Option[V]] = map.synchronized {
    val e = map.get(k)
    if (e == null) { misses.incrementAndGet(); None }
    else if (clock() - e.writtenAtMs >= ttlMs) {
      map.remove(k); misses.incrementAndGet(); None
    } else { hits.incrementAndGet(); Some(e.value) }
  }

  def put(k: K, v: Option[V]): Unit = map.synchronized {
    map.put(k, Entry(v, clock()))
  }

  /** Get-or-load: the loader runs OUTSIDE the lock (it is I/O); two
    * racing loads of one key are allowed and last-write-wins, Flink's
    * rule too. */
  def getOrLoad(k: K)(loader: K => Option[V]): Option[V] =
    get(k) match {
      case Some(v) => v
      case None =>
        val v = loader(k)
        put(k, v)
        v
    }

  def size: Int = map.synchronized(map.size())
}
