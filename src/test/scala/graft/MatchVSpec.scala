package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MatchVStream

/** MATCH_RECOGNIZE V-pattern (PATTERN (STRT DOWN+ UP+), q95 /
  * stream_match_v): hand semantics for flat breaks, session breaks,
  * SKIP-TO-LAST-UP chaining, session-death emission on dormant keys,
  * a late row reshaping a held descent, and exact dealt-replay parity
  * with batch q95. */
class MatchVSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, value)
  private type Ev = (Long, Long, Timestamp, Double)

  private def start(name: String, in: MemoryStream[Ev], gap: java.time.Duration,
      watermark: String = "10 minutes") = {
    MatchVStream.vMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        sessionGap = gap, watermark = watermark)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("match_v: V with multi-step legs; flat step breaks; adjacent Vs chain on the shared end row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("matchv_hand", in, java.time.Duration.ofMinutes(10))
    try {
      val s = 1000000L
      in.addData(Seq[Ev](
        // key 1: 10 > 8 > 5 < 7 < 9 — one V with 2-step legs, then a
        // second descent 9 > 6 < 11 chains on the end row
        (1L, 10L, us(1 * s), 10.0),
        (1L, 11L, us(2 * s), 8.0),
        (1L, 12L, us(3 * s), 5.0),
        (1L, 13L, us(4 * s), 7.0),
        (1L, 14L, us(5 * s), 9.0),
        (1L, 15L, us(6 * s), 6.0),
        (1L, 16L, us(7 * s), 11.0),
        (1L, 17L, us(8 * s), 11.0), // flat: proves the last ascent maximal
        // key 2: descent then FLAT then ascent — no V
        (2L, 20L, us(1 * s), 10.0),
        (2L, 21L, us(2 * s), 5.0),
        (2L, 22L, us(3 * s), 5.0),
        (2L, 23L, us(4 * s), 9.0),
        (2L, 24L, us(5 * s), 9.0)))
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((99L, 990L, Timestamp.valueOf(d), 1.0)))
      }
      q.processAllAvailable()
      val got = spark.table("matchv_hand")
        .select($"key", $"start_id", $"bottom_id", $"end_id",
          $"start_val", $"bottom_val", $"end_val", $"n_down", $"n_up")
        .as[(Long, Long, Long, Long, Double, Double, Double, Long, Long)]
        .collect().toSet
      assert(got === Set(
        (1L, 10L, 12L, 14L, 10.0, 5.0, 9.0, 2L, 2L),
        (1L, 14L, 15L, 16L, 9.0, 6.0, 11.0, 1L, 1L)))
    } finally q.stop()
  }

  test("match_v: session death emits the held ascent on a dormant key and clears all state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("matchv_dead", in, java.time.Duration.ofSeconds(30))
    try {
      val t0 = 1000000000L
      in.addData(Seq[Ev](
        (1L, 10L, us(t0), 10.0),
        (1L, 11L, us(t0 + 1000000L), 4.0),
        (1L, 12L, us(t0 + 2000000L), 8.0)))
      q.processAllAvailable()
      assert(spark.table("matchv_dead").count() === 0)
      Seq(t0 + 700000000L, t0 + 720000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), 1.0)))
      }
      q.processAllAvailable()
      val got = spark.table("matchv_dead")
        .select($"key", $"start_id", $"bottom_id", $"end_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 10L, 11L, 12L)))
    } finally q.stop()
  }

  test("match_v: a late in-watermark row deepens a held descent and shifts the bottom") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("matchv_late", in, java.time.Duration.ofHours(2))
    try {
      val t0 = 1000000000L
      val m = 60000000L
      // 10 > 6 < 9 would be a V with bottom 6 — but a late 3.0 lands
      // between them: 10 > 6 > 3 < 9, bottom 3, n_down 2
      in.addData(Seq[Ev](
        (1L, 10L, us(t0), 10.0),
        (1L, 11L, us(t0 + m), 6.0),
        (1L, 13L, us(t0 + 3 * m), 9.0)))
      q.processAllAvailable()
      assert(spark.table("matchv_late").count() === 0)
      in.addData(Seq[Ev]((1L, 12L, us(t0 + 2 * m), 3.0)))
      Seq(t0 + 9000000000L, t0 + 9100000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), 1.0)))
      }
      q.processAllAvailable()
      val got = spark.table("matchv_late")
        .select($"key", $"start_id", $"bottom_id", $"end_id", $"n_down", $"n_up")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 10L, 12L, 13L, 2L, 1L)))
    } finally q.stop()
  }

  test("match_v: dealt-out-of-order replay of the events table == batch q95") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(95)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = MatchVStream.vMatches(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        sessionGap = java.time.Duration.ofDays(1), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("matchv_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), 1.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("matchv_parity").filter($"key" =!= 999999L)
        .select($"key", $"start_id", $"bottom_id", $"end_id",
          $"start_val", $"bottom_val", $"end_val", $"n_down", $"n_up")
        .as[(Long, Long, Long, Long, Double, Double, Double, Long, Long)]
        .collect().toSet
      val batch = SparkEntry.queries("q95_match_v")(spark, sfDir)
        .select($"key", $"start_id", $"bottom_id", $"end_id",
          $"start_val", $"bottom_val", $"end_val", $"n_down", $"n_up")
        .as[(Long, Long, Long, Long, Double, Double, Double, Long, Long)]
        .collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
