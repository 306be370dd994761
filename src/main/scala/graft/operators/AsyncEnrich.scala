package graft.operators

import java.util.concurrent.{Executors, LinkedBlockingQueue, ScheduledExecutorService, TimeUnit}

import scala.concurrent.{Await, ExecutionContext, Future, Promise, TimeoutException}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, Encoder}

/** Async I/O enrichment — Flink's `AsyncDataStream.orderedWait` /
  * `unorderedWait` (AsyncFunction with capacity + timeout): overlap up
  * to `capacity` in-flight point lookups against an external service
  * per partition, instead of paying one round-trip per row.
  *
  * The Spark-first answer to "enrich from an external store" is a
  * BATCH join (broadcast the dim, or bucket-join the snapshot) — use
  * that whenever the dim is joinable at rest. This operator exists
  * for the residual Flink use-case: a service that only answers point
  * queries (rate-limited REST, a remote KV store with no snapshot),
  * where per-partition pipelining is the only available parallelism
  * beyond partition count. It is `mapPartitions`-shaped, so Catalyst
  * treats it as a barrier — project/filter the needed columns BEFORE
  * calling (the plan cannot prune through it).
  *
  * Semantics, matching Flink's:
  *  - at most `capacity` un-completed futures per partition (admission
  *    blocks the input iterator, Flink's backpressure);
  *  - ordered mode emits results in INPUT order (Flink holds
  *    completed-but-out-of-order results back; so does the head-await
  *    here); unordered mode emits in COMPLETION order — lower latency,
  *    same multiset;
  *  - per-record `timeout` measured from INVOCATION: on expiry the
  *    record resolves to `onTimeout(t)` when given (Flink's
  *    user-overridden `timeout()`), else the task FAILS (Flink's
  *    default);
  *  - a failed future fails the task (Flink's error contract — retries
  *    are the service adapter's job, not the operator's).
  *
  * At 100 TB the capacity bound is per-partition, so total in-flight =
  * partitions × capacity — size `capacity` from the service's rate
  * limit divided by the stage's max concurrent tasks, not from the
  * data volume.
  */
object AsyncEnrich {

  /** One shared daemon scheduler per executor for timeout alarms —
    * never does work, only completes promises. */
  private lazy val alarm: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "async-enrich-timeout")
      t.setDaemon(true)
      t
    })

  private def withTimeout[T, R](t: T, fut: Future[R], timeoutMs: Long,
      onTimeout: Option[T => R])(implicit ec: ExecutionContext): Future[R] = {
    val p = Promise[R]()
    val task = alarm.schedule(new Runnable {
      def run(): Unit = p.tryComplete(onTimeout match {
        case Some(fb) => Try(fb(t))
        case None => Failure(new TimeoutException(
          s"async enrich timed out after ${timeoutMs}ms for input $t"))
      })
    }, timeoutMs, TimeUnit.MILLISECONDS)
    fut.onComplete { r => task.cancel(false); p.tryComplete(r) }
    p.future
  }

  /** Flink `orderedWait`: emit `(t, f(t))` in INPUT order, with up to
    * `capacity` lookups in flight per partition. */
  def orderedWait[T, R](ds: Dataset[T], f: T => Future[R], capacity: Int,
      timeoutMs: Long, onTimeout: Option[T => R] = None)(
      implicit enc: Encoder[(T, R)]): Dataset[(T, R)] = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    require(timeoutMs > 0, s"timeoutMs must be positive: $timeoutMs")
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.parasitic
      val inFlight = new java.util.ArrayDeque[(T, Future[R])]()
      new Iterator[(T, R)] {
        private def fill(): Unit =
          while (inFlight.size < capacity && it.hasNext) {
            val t = it.next()
            inFlight.addLast((t, withTimeout(t, f(t), timeoutMs, onTimeout)))
          }
        def hasNext: Boolean = { fill(); !inFlight.isEmpty }
        def next(): (T, R) = {
          fill()
          val (t, fut) = inFlight.removeFirst()
          // the future self-resolves at timeoutMs; the slack only
          // guards against a wedged alarm thread
          (t, Await.result(fut, Duration(timeoutMs + 60000L, TimeUnit.MILLISECONDS)))
        }
      }
    }
  }

  /** Flink `unorderedWait`: emit in COMPLETION order — same multiset
    * as [[orderedWait]], lower latency (a slow lookup never holds
    * back faster ones behind it). */
  def unorderedWait[T, R](ds: Dataset[T], f: T => Future[R], capacity: Int,
      timeoutMs: Long, onTimeout: Option[T => R] = None)(
      implicit enc: Encoder[(T, R)]): Dataset[(T, R)] = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    require(timeoutMs > 0, s"timeoutMs must be positive: $timeoutMs")
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.parasitic
      val done = new LinkedBlockingQueue[(T, Try[R])]()
      var launched = 0
      var drained = 0
      new Iterator[(T, R)] {
        private def fill(): Unit =
          while (launched - drained - done.size < capacity && it.hasNext) {
            val t = it.next()
            launched += 1
            withTimeout(t, f(t), timeoutMs, onTimeout)
              .onComplete(r => done.put((t, r)))
          }
        def hasNext: Boolean = { fill(); drained < launched }
        def next(): (T, R) = {
          fill()
          val polled = done.poll(timeoutMs + 60000L, TimeUnit.MILLISECONDS)
          if (polled == null) throw new TimeoutException(
            "async enrich: no completion within the timeout window (wedged alarm thread?)")
          drained += 1
          polled match {
            case (t, Success(v)) => (t, v)
            case (_, Failure(e)) => throw e
          }
        }
      }
    }
  }
}
