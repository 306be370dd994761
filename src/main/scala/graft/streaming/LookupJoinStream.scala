package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.LookupCache

/** LOOKUP JOIN — Flink SQL's processing-time temporal join against an
  * external point-lookup store (`JOIN dim FOR SYSTEM_TIME AS OF
  * o.proc_time ON …` over a LookupTableSource, with
  * `lookup.partial-cache.*` caching):
  * each stream row is enriched with the dim row AS OF the moment the
  * lookup runs. The cache lives PER EXECUTOR and SURVIVES across
  * micro-batches (that is what makes it a cache and not a batch-local
  * map), so staleness is bounded by the cache TTL in processing time —
  * a dim update becomes visible within `ttlMs` per executor, exactly
  * Flink's partial-cache contract.
  *
  * The two semantics this operator does NOT have, stated loudly:
  *  - it is NOT deterministic under replay (a restarted or retried
  *    batch looks up the dim AGAIN and may see newer rows) — Flink's
  *    own lookup-join caveat, verbatim; use the EVENT-time temporal
  *    join (TemporalJoinStream) when replay determinism matters;
  *  - it is NOT the right tool for a dim that can be snapshotted —
  *    broadcast/bucket-join the snapshot instead (BroadcastRules for
  *    KB-scale, Bucketing for co-located facts). This exists for dims
  *    that only answer point queries.
  *
  * LEFT-outer shaped: a missing dim key enriches to null (and the
  * miss itself is cached — Flink's `lookup.cache-missing-key=true`;
  * without negative caching every absent key pays a service call per
  * row). Inner semantics = filter dim non-null downstream.
  *
  * Scale: lookups per batch ≤ distinct keys per partition after the
  * cache (hit-rate measurable via [[cacheFor]]'s counters); total
  * service concurrency = partitions × 1 here — compose with
  * [[graft.operators.AsyncEnrich]] when the service needs pipelined
  * in-flight lookups.
  */
object LookupJoinStream {

  case class LookupEvent(key: Long, id: Long, ts: Timestamp)
  case class Enriched(key: Long, id: Long, ts: Timestamp, dim: Option[String])

  /** Executor-local cache registry: one cache instance per name,
    * shared by every task and micro-batch in this JVM. */
  private val registry = new ConcurrentHashMap[String, LookupCache[Long, String]]()

  def cacheFor(name: String, maxRows: Int, ttlMs: Long,
      clock: () => Long = () => System.currentTimeMillis()): LookupCache[Long, String] =
    registry.computeIfAbsent(name, _ => new LookupCache[Long, String](maxRows, ttlMs, clock))

  /** Drop a named cache (tests; an executor restart does the same in
    * production — the cache is an optimization, never a store). */
  def invalidate(name: String): Unit = registry.remove(name)

  def lookupJoin(stream: DataFrame, cacheName: String, maxRows: Int,
      ttlMs: Long, loader: Long => Option[String],
      clock: () => Long = () => System.currentTimeMillis(),
      keyCol: String = "user_id", idCol: String = "event_id",
      tsCol: String = "ts"): Dataset[Enriched] = {
    val s = stream.sparkSession
    import s.implicits._
    stream
      .select(col(keyCol).cast("long").as("key"),
        col(idCol).cast("long").as("id"), col(tsCol).as("ts"))
      .as[LookupEvent]
      .mapPartitions { rows =>
        val cache = cacheFor(cacheName, maxRows, ttlMs, clock)
        rows.map(r => Enriched(r.key, r.id, r.ts, cache.getOrLoad(r.key)(loader)))
      }
  }
}
