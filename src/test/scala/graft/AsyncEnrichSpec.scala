package graft

import java.util.concurrent.Executors
import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsyncEnrich

/** Async I/O enrichment (async_enrich — Flink AsyncDataStream
  * orderedWait/unorderedWait): ordered mode preserves input order,
  * unordered emits by completion, both overlap up to `capacity`
  * in-flight lookups (peak concurrency instrumented and asserted on
  * both sides of the bound), per-record timeout resolves to the
  * fallback when given and fails the task when not. */
// instrumented fake point-lookup service: latency per key, peak
// concurrency recorded; top-level (NOT an inner object — a closure
// over it must not drag the non-serializable suite along) and static,
// so executor threads in local mode share the counters
private object AsyncSvc {
  val pool: ExecutionContext = ExecutionContext.fromExecutor(
    Executors.newFixedThreadPool(32, r => {
      val t = new Thread(r, "fake-svc"); t.setDaemon(true); t
    }))
  val concurrent = new AtomicInteger(0)
  val peak = new AtomicInteger(0)
  def reset(): Unit = { concurrent.set(0); peak.set(0) }
  def lookup(latencyMs: Long => Long)(i: Long): Future[String] = Future {
    val c = concurrent.incrementAndGet()
    peak.updateAndGet(p => math.max(p, c))
    Thread.sleep(latencyMs(i))
    concurrent.decrementAndGet()
    s"name-$i"
  }(pool)
}

class AsyncEnrichSpec extends AnyFunSuite {
  import TestSpark._
  private def Svc = AsyncSvc

  test("orderedWait: input order preserved, lookups overlap, peak in-flight <= capacity") {
    import spark.implicits._
    Svc.reset()
    val n = 80L
    // even keys slow, odd keys fast — completions arrive out of order
    val lat: Long => Long = i => if (i % 2 == 0) 100L else 10L
    val serialMs = (0L until n).map(lat).sum
    // warm the plan/codegen path so the wall-clock below measures the
    // operator, not the suite's first Spark action
    AsyncEnrich.orderedWait(
      spark.range(2).as[Long].repartition(1),
      ((i: Long) => AsyncSvc.lookup(_ => 1L)(i)), capacity = 2, timeoutMs = 10000L).collect()
    Svc.reset()
    val t0 = System.nanoTime()
    val out = AsyncEnrich.orderedWait(
      spark.range(n).as[Long].repartition(1),
      ((i: Long) => AsyncSvc.lookup(lat)(i)), capacity = 8, timeoutMs = 10000L).collect().toSeq
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out === (0L until n).map(i => (i, s"name-$i")))
    assert(Svc.peak.get() <= 8, s"capacity bound broken: peak ${Svc.peak.get()}")
    assert(Svc.peak.get() >= 2, "lookups never overlapped — the operator is serial")
    // capacity 8 puts the floor near serial/8 (~550 ms); half-serial
    // leaves ~2 s of headroom for scheduler noise while still being
    // unreachable without real overlap
    assert(elapsedMs < serialMs / 2,
      s"no pipelining win: $elapsedMs ms vs $serialMs ms serial")
  }

  test("unorderedWait: completion order (a slow head does not hold the line), same multiset") {
    import spark.implicits._
    Svc.reset()
    val lat: Long => Long = i => if (i == 0L) 400L else 5L
    val out = AsyncEnrich.unorderedWait(
      spark.range(20).as[Long].repartition(1),
      ((i: Long) => AsyncSvc.lookup(lat)(i)), capacity = 8, timeoutMs = 10000L).collect().toSeq
    assert(out.toSet === (0L until 20L).map(i => (i, s"name-$i")).toSet)
    // the 400ms key 0 must NOT be emitted first (7 fast keys launched
    // alongside it finish ~395ms earlier)
    assert(out.head._1 !== 0L, "unordered mode emitted the slow head first")
    assert(Svc.peak.get() <= 8)
  }

  test("timeout: fallback when onTimeout given; task fails without one (Flink's default)") {
    import spark.implicits._
    Svc.reset()
    val lat: Long => Long = i => if (i == 3L) 5000L else 1L
    val out = AsyncEnrich.orderedWait(
      spark.range(6).as[Long].repartition(1),
      ((i: Long) => AsyncSvc.lookup(lat)(i)), capacity = 4, timeoutMs = 300L,
      onTimeout = Some((i: Long) => s"fallback-$i")).collect().toSeq
    assert(out === Seq((0L, "name-0"), (1L, "name-1"), (2L, "name-2"),
      (3L, "fallback-3"), (4L, "name-4"), (5L, "name-5")))

    Svc.reset()
    val ex = intercept[SparkException] {
      AsyncEnrich.unorderedWait(
        spark.range(6).as[Long].repartition(1),
        ((i: Long) => AsyncSvc.lookup(lat)(i)), capacity = 4, timeoutMs = 300L).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(ex).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"expected a TimeoutException in the cause chain, got: $ex")
  }

  test("capacity 1 degenerates to serial per partition, still correct") {
    import spark.implicits._
    Svc.reset()
    val out = AsyncEnrich.orderedWait(
      spark.range(10).as[Long].repartition(2),
      ((i: Long) => AsyncSvc.lookup(_ => 1L)(i)), capacity = 1, timeoutMs = 10000L).collect().toSeq
    assert(out.toSet === (0L until 10L).map(i => (i, s"name-$i")).toSet)
    // two partitions each at capacity 1 → peak at most 2
    assert(Svc.peak.get() <= 2)
  }
}
