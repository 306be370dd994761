package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CepNextStream

/** Strict-contiguity CEP (anchor.next(response).within(T), q93 /
  * stream_cep_next): any intervening event breaks the pattern — hand
  * semantics for breakers, equal-us immediate successors, late
  * arrivals DISPLACING the held candidate in both directions, early
  * emission, and exact dealt-replay parity with batch q93. */
class CepNextSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, event_type)
  private type Ev = (Long, Long, Timestamp, String)

  private def start(name: String, in: MemoryStream[Ev],
      window: java.time.Duration, watermark: String = "10 minutes") = {
    CepNextStream.nexts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click",
        window = window, watermark = watermark)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("cep_next: a breaker of ANY type kills the match; equal-us larger-id rows are the immediate successor; beyond-T successors reject") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cepnext_hand", in, java.time.Duration.ofSeconds(10))
    try {
      in.addData(Seq[Ev](
        // key 1: view between error and click — contiguity broken
        (1L, 10L, us(1000000L), "error"),
        (1L, 11L, us(2000000L), "view"),
        (1L, 12L, us(3000000L), "click"),
        // key 2: clean next within T
        (2L, 20L, us(1000000L), "error"),
        (2L, 21L, us(2000000L), "click"),
        // key 3: next is the response but BEYOND the 10s window
        (3L, 30L, us(1000000L), "error"),
        (3L, 31L, us(12000000L), "click"),
        // key 4: equal-us larger-id click IS the immediate successor
        (4L, 40L, us(1000000L), "error"),
        (4L, 41L, us(1000000L), "click"),
        // key 5: a second anchor breaks the first and matches itself
        (5L, 50L, us(1000000L), "error"),
        (5L, 51L, us(2000000L), "error"),
        (5L, 52L, us(3000000L), "click")))
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((99L, 990L, Timestamp.valueOf(d), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("cepnext_hand")
        .select($"anchor_id", $"response_id", $"dur_us")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(
        20L -> ((21L, 1000000L)),
        40L -> ((41L, 0L)),
        51L -> ((52L, 1000000L))))
    } finally q.stop()
  }

  test("cep_next: a late in-watermark row displaces the held candidate — breaker kills a would-be match, response rescues a would-be break") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // 1h window, 10 min watermark delay: candidates at +60s stay
    // displaceable until the watermark passes them
    val q = start("cepnext_late", in, java.time.Duration.ofHours(1))
    try {
      val t0 = 1000000000L // 1000s
      in.addData(Seq[Ev](
        // key 1: click at +60s is the current candidate (match-to-be)
        (1L, 10L, us(t0), "error"),
        (1L, 12L, us(t0 + 60000000L), "click"),
        // key 2: view at +60s is the current candidate (break-to-be)
        (2L, 20L, us(t0), "error"),
        (2L, 22L, us(t0 + 60000000L), "view")))
      q.processAllAvailable()
      // nothing decided: wm has not passed the candidates
      assert(spark.table("cepnext_late").count() === 0)
      // late rows at +30s — inside the watermark, BELOW both candidates
      in.addData(Seq[Ev](
        (1L, 11L, us(t0 + 30000000L), "view"),   // breaker displaces the click
        (2L, 21L, us(t0 + 30000000L), "click"))) // response displaces the view
      // advance wm strictly past +30s candidates (and then further)
      Seq(t0 + 700000000L, t0 + 720000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("cepnext_late")
        .select($"anchor_id", $"response_id", $"dur_us")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      // key 1: displaced by the view — no match; key 2: rescued
      assert(got === Map(20L -> ((21L, 30000000L))))
    } finally q.stop()
  }

  test("cep_next: emits when the watermark passes the candidate, long before the window end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cepnext_early", in, java.time.Duration.ofDays(30))
    try {
      val t0 = 1000000000L
      in.addData(Seq[Ev](
        (1L, 10L, us(t0), "error"),
        (1L, 11L, us(t0 + 1000000L), "click")))
      // wm to +20 min: far past the candidate, nowhere near t0 + 30 days
      Seq(t0 + 1800000000L, t0 + 1900000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), "view")))
      }
      q.processAllAvailable()
      assert(spark.table("cepnext_early").count() === 1)
    } finally q.stop()
  }

  test("cep_next: dealt-out-of-order replay of the events table == batch q93") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(93)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = CepNextStream.nexts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click",
        window = java.time.Duration.ofDays(1), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("cepnext_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), "view")))
        q.processAllAvailable()
      }
      val streamed = spark.table("cepnext_parity").filter($"key" =!= 999999L)
        .select($"anchor_id", $"response_id", $"dur_us")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = SparkEntry.queries("q93_cep_next")(spark, sfDir)
        .select($"anchor_id", $"response_id", $"dur_us")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
