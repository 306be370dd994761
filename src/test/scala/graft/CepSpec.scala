package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cep
import graft.streaming.AbsenceStream

/** CEP absence pattern ("A not followed by B within T"): batch
  * range-frame kernel semantics on a hand corpus, and the streaming
  * timer twin's exact parity with batch q76 under dealt-out-of-order
  * micro-batches. */
class CepSpec extends AnyFunSuite {
  import TestSpark._

  private val T = 1000000L // 1 s window in µs, for hand corpora

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  test("cep absence kernel: strict left bound, inclusive horizon, per-key isolation") {
    import spark.implicits._
    val rows = Seq(
      // key 1: anchor answered strictly inside the window -> no alert
      (1L, 10L, us(1000000L), "A"), (1L, 11L, us(1500000L), "B"),
      // key 1: anchor answered EXACTLY at +T -> inclusive, no alert
      (1L, 12L, us(5000000L), "A"), (1L, 13L, us(6000000L), "B"),
      // key 2: response at the anchor's exact µs -> strict bound, ALERT
      (2L, 20L, us(1000000L), "A"), (2L, 21L, us(1000000L), "B"),
      // key 2: response just past the horizon -> ALERT
      (2L, 22L, us(5000000L), "A"), (2L, 23L, us(6000001L), "B"),
      // key 3: response BEFORE the anchor only -> ALERT
      (3L, 30L, us(900000L), "B"), (3L, 31L, us(1000000L), "A"),
      // key 4: the answering response belongs to key 5 -> ALERT
      (4L, 40L, us(1000000L), "A"), (5L, 50L, us(1200000L), "B"))
      .toDF("k", "id", "ts", "etype")
    val got = Cep.absence(rows, col("k"), col("ts"),
        isAnchor = col("etype") === "A", isResponse = col("etype") === "B",
        windowUs = T)
      .select($"id").as[Long].collect().toSet
    assert(got === Set(20L, 22L, 31L, 40L))
  }

  test("stream_absence: late response cancels across a batch boundary; tail alert fires from the timer") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, String)]
    val q = AbsenceStream.alerts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "A", responseType = "B",
        window = java.time.Duration.ofSeconds(1), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("abs_hand").start()
    try {
      // batch 1: two anchors; batch 2: the response for the FIRST one
      // arrives a batch later (well within the watermark)
      in.addData(Seq((1L, 100L, us(1000000L), "A"), (1L, 101L, us(3000000L), "A")))
      q.processAllAvailable()
      in.addData(Seq((1L, 102L, us(1500000L), "B")))
      q.processAllAvailable()
      // flush sentinels on an unrelated key: watermark applies from the
      // next batch, timers fire the batch after that
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((9L, 999L, Timestamp.valueOf(d), "B")))
        q.processAllAvailable()
      }
      val got = spark.table("abs_hand").select($"id").as[Long].collect().toSet
      // 100 was answered late-but-in-watermark; 101 never answered and
      // its alert came from the event-time timer (no further key-1 input)
      assert(got === Set(101L))
    } finally q.stop()
  }

  test("stream_absence: responses-only traffic cleans up via its own timer and later anchors still resolve correctly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, String)]
    val q = AbsenceStream.alerts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "A", responseType = "B",
        // a nonzero delay like every production deployment: with "0
        // seconds" an emitted alert's event time can coincide EXACTLY
        // with a prior max-event watermark boundary, which trips
        // transformWithState's output-older-than-watermark validation
        // on the equality edge
        window = java.time.Duration.ofSeconds(1), watermark = "5 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("abs_resp_only").start()
    try {
      // key 3 sees ONLY responses; the cleanup timer (not an anchor
      // timer) must fire its prune fold as the watermark advances —
      // this drives the responses-only branch of the timer re-arm
      in.addData(Seq((3L, 300L, us(1000000L), "B"), (3L, 301L, us(1500000L), "B")))
      q.processAllAvailable()
      in.addData(Seq((9L, 999L, us(60000000L), "B")))
      q.processAllAvailable()
      in.addData(Seq((9L, 998L, us(70000000L), "B")))
      q.processAllAvailable()
      // a fresh anchor for key 3 far past the pruned responses: must
      // ALERT (the old responses could never answer it) — a wrong
      // prune rule keeping/matching stale responses would suppress it
      in.addData(Seq((3L, 310L, us(80000000L), "A")))
      q.processAllAvailable()
      Seq(200000000L, 210000000L).foreach { t =>
        in.addData(Seq((9L, 997L, us(t), "B"))); q.processAllAvailable()
      }
      val got = spark.table("abs_resp_only").select($"id").as[Long].collect().toSet
      assert(got === Set(310L))
    } finally q.stop()
  }

  test("stream_absence: dealt-out-of-order replay of the events table == batch q76") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .filter($"event_type".isin("click", "purchase"))
      .as[(Long, Long, Timestamp, String)].collect().toSeq
    assert(ev.size > 100, s"degenerate corpus: ${ev.size} rows")
    val rnd = new scala.util.Random(23)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[(Long, Long, Timestamp, String)]
    val q = AbsenceStream.alerts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "click", responseType = "purchase",
        window = java.time.Duration.ofHours(24), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("abs_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((999999L, 0L, Timestamp.valueOf(d), "purchase")))
        q.processAllAvailable()
      }
      val streamed = spark.table("abs_parity")
        .select($"key", $"id").as[(Long, Long)].collect().toSet
      val batch = SparkEntry.queries("q76_absence_alert")(spark, sfDir)
        .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
      CachePool.drain()
      assert(streamed === batch)
      assert(batch.size > 50, s"degenerate: ${batch.size} alerts")
    } finally q.stop()
  }
}
