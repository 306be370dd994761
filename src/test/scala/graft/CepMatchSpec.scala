package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CepMatchStream

/** Positive CEP match (anchor followedBy response within T, with
  * measures): hand semantics — earliest-response selection, response
  * sharing (SKIP TO NEXT ROW), strict/inclusive bounds, mid counting
  * under the (ts, id) tie rule, early emission at the response's
  * watermark (not the window end), a late response displacing a
  * later-known one — and exact dealt-replay parity with batch q88. */
class CepMatchSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, event_type)
  private type Ev = (Long, Long, Timestamp, String)

  private def start(name: String, in: MemoryStream[Ev],
      window: java.time.Duration) = {
    CepMatchStream.matches(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click", midType = "view",
        window = window, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("cep_match: earliest response, shared responses, strict-left/inclusive-right bounds, tie-ordered mid counting") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cep_hand", in, java.time.Duration.ofSeconds(10))
    try {
      in.addData(Seq[Ev](
        // key 1: two anchors SHARE the one response (skip-to-next-row);
        // two views between a10 and the response, one between a11
        (1L, 10L, us(1000000L), "error"),
        (1L, 15L, us(1500000L), "view"),
        (1L, 11L, us(2000000L), "error"),
        (1L, 16L, us(2500000L), "view"),
        (1L, 12L, us(3000000L), "click"),
        (1L, 13L, us(4000000L), "click"), // later response: ignored, earliest wins
        // key 2: response at the anchor's EXACT us — strict left bound
        // rejects it; the horizon response at exactly +10s matches
        (2L, 20L, us(1000000L), "error"),
        (2L, 21L, us(1000000L), "click"),
        (2L, 22L, us(11000000L), "click"),
        // key 3: no response within window -> silent (absence's half)
        (3L, 30L, us(1000000L), "error"),
        (3L, 31L, us(12000001L), "click"),
        // key 4: equal-us mid/response tie rule — mid id 44 at the
        // response's exact us with SMALLER id counts as between; mid
        // id 46 with larger id does not
        (4L, 40L, us(1000000L), "error"),
        (4L, 44L, us(2000000L), "view"),
        (4L, 45L, us(2000000L), "click"),
        (4L, 46L, us(2000000L), "view")))
      in.addData(Seq[Ev]((99L, 990L, Timestamp.valueOf("2030-01-01 00:00:00"), "view")))
      in.addData(Seq[Ev]((99L, 991L, Timestamp.valueOf("2030-01-02 00:00:00"), "view")))
      q.processAllAvailable()
      val got = spark.table("cep_hand")
        .select($"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === Map(
        10L -> ((12L, 2L, 2000000L)),
        11L -> ((12L, 1L, 1000000L)),
        20L -> ((22L, 0L, 10000000L)), // exact-us rejected, horizon accepted
        40L -> ((45L, 1L, 1000000L)))) // only the smaller-id tie mid counts
    } finally q.stop()
  }

  test("cep_match: emits at the response's watermark, not the window end; a late smaller-ts response displaces the held one") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // 1-hour window: early emission is observable — the match must
    // surface long before wm reaches anchor + 1h
    val q = start("cep_early", in, java.time.Duration.ofHours(1))
    try {
      in.addData(Seq[Ev](
        (1L, 10L, us(1000000L), "error"),
        (1L, 12L, us(60000000L), "click"), // answered after 59s
        // key 2: the held candidate at 80s will be DISPLACED by a
        // late-but-in-watermark click at 30s arriving next batch
        (2L, 20L, us(1000000L), "error"),
        (2L, 22L, us(80000000L), "click")))
      q.processAllAvailable()
      assert(spark.table("cep_early").count() === 0) // wm still at max - 10min
      // advance wm just past the responses (wm = 700s - 600s = 100s)
      in.addData(Seq[Ev](
        (2L, 23L, us(30000000L), "view"), // in-watermark late mid, inside key 2's span
        (2L, 24L, us(29000000L), "click"), // late response BEFORE the held one
        (9L, 90L, us(700000000L), "view")))
      q.processAllAvailable()
      val got = spark.table("cep_early")
        .select($"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // both matches emitted with wm at 100s — 1h window ends at 3601s
      assert(got === Map(
        10L -> ((12L, 0L, 59000000L)),
        20L -> ((24L, 0L, 28000000L)))) // the late 29s click won; the 30s view is NOT between
    } finally q.stop()
  }

  test("cep_match: dealt-out-of-order replay of the events table == batch q88") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(47)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = CepMatchStream.matches(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click", midType = "view",
        window = java.time.Duration.ofDays(1), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), "view")))
        q.processAllAvailable()
      }
      val streamed = spark.table("cep_parity").filter($"key" =!= 999999L)
        .select($"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val batch = SparkEntry.queries("q88_cep_match")(spark, sfDir)
        .select($"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(batch.nonEmpty)
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q.stop()
  }
}
