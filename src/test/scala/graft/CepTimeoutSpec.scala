package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CepMatchStream

/** CEP timeout side output (q99 / matchesWithTimeouts — Flink's
  * PatternStream.select(timeoutTag, PatternTimeoutFunction, …)):
  * hand verdicts with us-window measure bounds (equal-us mid excluded,
  * right-edge mid included), a late response converting a would-be
  * timeout into a MATCH, and the partition property — every anchor
  * decides exactly once, streamed outcomes == batch q88 ∪ q99. */
class CepTimeoutSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, event_type)
  private type Ev = (Long, Long, Timestamp, String)

  test("cep_timeout: hand verdicts — us-window mid bounds, out-of-window response, late response rescues") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = CepMatchStream.matchesWithTimeouts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click", midType = "view",
        window = java.time.Duration.ofSeconds(60), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_to_hand").start()
    try {
      in.addData(Seq[Ev](
        // key 1: no click ever. Mids: equal-us (excluded), 30s (in),
        // exactly window end 70s (in, inclusive right), 71s (out)
        (1L, 100L, us(10000000L), "error"),
        (1L, 101L, us(10000000L), "view"),
        (1L, 102L, us(30000000L), "view"),
        (1L, 103L, us(70000000L), "view"),
        (1L, 104L, us(71000000L), "view"),
        // key 2: a click exists but OUTSIDE the window — still a timeout
        (2L, 200L, us(10000000L), "error"),
        (2L, 201L, us(100000000L), "click"),
        // key 3: would-be timeout until the next batch's late click
        (3L, 300L, us(10000000L), "error")))
      q.processAllAvailable()
      in.addData(Seq[Ev](
        // late but above-watermark click inside key 3's window
        (3L, 301L, us(50000000L), "click")))
      q.processAllAvailable()
      // push the watermark far past every window
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), "view")))
        q.processAllAvailable()
      }
      val got = spark.table("cep_to_hand").filter($"key" =!= 999999L)
        .select($"key", $"verdict", $"anchor_id", $"response_id", $"n_mid")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
      assert(got === Set(
        (1L, "TIMEOUT", 100L, -1L, 2L), // 30s + 70s mids; 10s and 71s out
        (2L, "TIMEOUT", 200L, -1L, 0L),
        (3L, "MATCH", 300L, 301L, 0L)))
    } finally q.stop()
  }

  test("cep_timeout: dealt replay == batch q88 ∪ q99 — every anchor decides exactly once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(99)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = CepMatchStream.matchesWithTimeouts(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "error", responseType = "click", midType = "view",
        window = java.time.Duration.ofDays(1), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_to_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), "view")))
        q.processAllAvailable()
      }
      val outcomes = spark.table("cep_to_parity").filter($"key" =!= 999999L)
        .select($"key", $"verdict", $"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .collect().toSeq
      // every anchor decides exactly once across the union
      val perAnchor = outcomes.groupBy(r => (r.getLong(0), r.getLong(2)))
      assert(perAnchor.values.forall(_.size == 1), "an anchor decided twice")

      val streamedMatches = outcomes.filter(_.getString(1) == "MATCH")
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      val streamedTimeouts = outcomes.filter(_.getString(1) == "TIMEOUT")
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet

      val batchMatches = SparkEntry.queries("q88_cep_match")(spark, sfDir)
        .select($"key", $"anchor_id", $"response_id", $"n_mid", $"dur_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batchTimeouts = SparkEntry.queries("q99_cep_timeout")(spark, sfDir)
        .select($"key", $"anchor_id", $"n_mid")
        .as[(Long, Long, Long)].collect().toSet
      assert(batchMatches.nonEmpty && batchTimeouts.nonEmpty)
      assert(streamedMatches === batchMatches)
      assert(streamedTimeouts === batchTimeouts)
      // the two batch sides partition the anchors
      assert(batchMatches.map(m => (m._1, m._2))
        .intersect(batchTimeouts.map(t => (t._1, t._2))).isEmpty)
    } finally q.stop()
  }
}
