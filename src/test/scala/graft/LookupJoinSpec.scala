package graft

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LookupJoinStream

// deterministic fake point-lookup dim store — top-level/static so
// executor-thread closures don't capture the suite: versioned values,
// per-key load counters, an injectable clock the tests advance by hand
private object LookupDim {
  val clock = new AtomicLong(0L)
  val version = new AtomicInteger(1)
  val loads = new ConcurrentHashMap[Long, AtomicInteger]()
  def loader(k: Long): Option[String] = {
    loads.computeIfAbsent(k, _ => new AtomicInteger()).incrementAndGet()
    if (k % 10 == 9) None else Some(s"v${version.get}-$k")
  }
  def loadsOf(k: Long): Int = Option(loads.get(k)).map(_.get).getOrElse(0)
  def reset(): Unit = { clock.set(0L); version.set(1); loads.clear() }
}

/** Lookup join with partial caching (lookup_join — Flink's
  * processing-time temporal join over a LookupTableSource with
  * lookup.partial-cache.max-rows / expire-after-write /
  * cache-missing-key): the cache survives across micro-batches, TTL
  * bounds staleness (a dim update is invisible until expiry, then
  * picked up), misses are cached too, and LRU eviction reloads. */
class LookupJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def sec(n: Long): Timestamp = new Timestamp(n * 1000L)
  private type Ev = (Long, Long, Timestamp)

  private def start(name: String, in: MemoryStream[Ev], maxRows: Int, ttlMs: Long) = {
    LookupJoinStream.invalidate(name)
    LookupJoinStream.lookupJoin(
        in.toDF().toDF("user_id", "event_id", "ts"),
        cacheName = name, maxRows = maxRows, ttlMs = ttlMs,
        loader = (k: Long) => LookupDim.loader(k),
        clock = () => LookupDim.clock.get())
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("lookup_join: cache survives across micro-batches; TTL expiry picks up the new dim version") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    LookupDim.reset()
    val in = MemoryStream[Ev]
    val q = start("lj_ttl", in, maxRows = 100, ttlMs = 1000L)
    try {
      in.addData((1L, 10L, sec(1)), (2L, 11L, sec(2)))
      q.processAllAvailable()
      // dim updates; cache still fresh → batch 2 serves the STALE v1
      // (Flink's partial-cache staleness contract) with zero loads
      LookupDim.version.set(2)
      in.addData((1L, 12L, sec(3)), (2L, 13L, sec(4)))
      q.processAllAvailable()
      assert(LookupDim.loadsOf(1L) === 1 && LookupDim.loadsOf(2L) === 1,
        "second batch must be served from cache")
      // clock past TTL → batch 3 reloads and sees v2
      LookupDim.clock.addAndGet(1000L)
      in.addData((1L, 14L, sec(5)))
      q.processAllAvailable()
      assert(LookupDim.loadsOf(1L) === 2)
      val got = spark.table("lj_ttl").select($"id", $"dim")
        .as[(Long, Option[String])].collect().toMap
      assert(got === Map(
        10L -> Some("v1-1"), 11L -> Some("v1-2"),
        12L -> Some("v1-1"), 13L -> Some("v1-2"), // stale within TTL
        14L -> Some("v2-1"))) // refreshed after expiry
    } finally q.stop()
  }

  test("lookup_join: negative caching — an absent key costs ONE load per TTL window, enriches to null") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    LookupDim.reset()
    val in = MemoryStream[Ev]
    val q = start("lj_neg", in, maxRows = 100, ttlMs = 1000L)
    try {
      in.addData((9L, 20L, sec(1)), (9L, 21L, sec(2)))
      q.processAllAvailable()
      in.addData((9L, 22L, sec(3)))
      q.processAllAvailable()
      assert(LookupDim.loadsOf(9L) === 1,
        "absent key must be cached as a negative entry")
      LookupDim.clock.addAndGet(1000L)
      in.addData((9L, 23L, sec(4)))
      q.processAllAvailable()
      assert(LookupDim.loadsOf(9L) === 2)
      val got = spark.table("lj_neg").select($"id", $"dim")
        .as[(Long, Option[String])].collect().toSeq
      assert(got.forall(_._2.isEmpty), "missing dim key must enrich to null (left-outer)")
      assert(got.map(_._1).toSet === Set(20L, 21L, 22L, 23L))
    } finally q.stop()
  }

  test("lookup_join: LRU eviction at max-rows — the evicted key reloads on its next appearance") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    LookupDim.reset()
    val in = MemoryStream[Ev]
    val q = start("lj_lru", in, maxRows = 2, ttlMs = 1000000L)
    try {
      in.addData((1L, 30L, sec(1)), (2L, 31L, sec(2)), (3L, 32L, sec(3)))
      q.processAllAvailable() // 1 → 2 → 3 inserts; capacity 2 evicts key 1
      in.addData((1L, 33L, sec(4)))
      q.processAllAvailable()
      assert(LookupDim.loadsOf(1L) === 2, "evicted key must reload")
      assert(LookupDim.loadsOf(2L) + LookupDim.loadsOf(3L) >= 2)
      val got = spark.table("lj_lru").select($"id", $"dim")
        .as[(Long, Option[String])].collect().toMap
      assert(got(33L) === Some("v1-1"))
    } finally q.stop()
  }
}
