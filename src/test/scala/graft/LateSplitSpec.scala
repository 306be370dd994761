package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Side output of late data (stream_late_split — Flink's
  * allowedLateness + sideOutputLateData): every row comes out exactly
  * once with a lateness verdict, nothing is silently dropped, and the
  * on-time half is exactly what a chained windowed aggregate with the
  * same watermark delay accepts. */
class LateSplitSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts)
  private type Ev = (Long, Long, Timestamp)

  test("late_split: rows below the batch-start watermark tag late, everything else on-time, no row lost") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Pipelines.streamingLateSplit(
        in.toDF().toDF("user_id", "event_id", "ts"), watermark = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("latesplit_hand").start()
    try {
      val t0 = 1000000000L
      // batch 1: establishes wm = t0+100s - 10s = t0+90s for batch 2
      in.addData(Seq[Ev]((9L, 90L, us(t0 + 100000000L))))
      q.processAllAvailable()
      // batch 2: one row below t0+90s (late), one above (on-time)
      in.addData(Seq[Ev](
        (1L, 10L, us(t0)),               // 1000s < wm 1090s: LATE
        (1L, 11L, us(t0 + 95000000L)))) // 1095s >= wm: on-time
      q.processAllAvailable()
      val got = spark.table("latesplit_hand")
        .select($"id", $"late").as[(Long, Boolean)].collect().toMap
      // batch 1's row saw wm = 0 (no prior batch): on-time
      assert(got === Map(90L -> false, 10L -> true, 11L -> false))
      // nothing dropped: 3 in, 3 out
      assert(spark.table("latesplit_hand").count() === 3)
    } finally q.stop()
  }

  test("late_split window mode: behind-the-watermark rows whose window is still open stay ON-TIME, and the on-time half is exactly what a chained windowed count accepts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val t0 = 1000000000L // 1000 s: inside the epoch-hour window [0, 3600)
    val batches: Seq[Seq[Ev]] = Seq(
      Seq((1L, 10L, us(t0 + 3600000000L))), // pushes wm to 4590 s
      Seq((1L, 11L, us(t0)),                 // window [0,3600) closed: LATE
        (1L, 12L, us(t0 + 3500000000L)),     // 4500 s: behind wm, but window [3600,7200) OPEN
        (1L, 13L, us(t0 + 3700000000L))),    // 4700 s: on-time
      Seq((1L, 14L, us(t0 + 7200000000L))))  // advances wm again

    // run 1: tag with the 1-hour window verdict
    val in1 = MemoryStream[Ev]
    val q1 = Pipelines.streamingLateSplit(
        in1.toDF().toDF("user_id", "event_id", "ts"), watermark = "10 seconds",
        windowUs = Some(3600000000L))
      .writeStream.outputMode("append")
      .format("memory").queryName("latesplit_tag").start()
    val tags = try {
      batches.foreach { b => in1.addData(b.toIndexedSeq); q1.processAllAvailable() }
      spark.table("latesplit_tag").select($"id", $"late", $"us")
        .as[(Long, Boolean, Long)].collect().toSeq
    } finally q1.stop()
    assert(tags.size === 5, "no row may be dropped by the tagger")
    assert(tags.filter(_._2).map(_._1).toSet === Set(11L),
      "only the closed-window row is late; the behind-wm open-window row is not")

    // run 2: the same deal through a windowed count with the same delay
    val in2 = MemoryStream[Ev]
    val q2 = in2.toDF().toDF("user_id", "event_id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"user_id")
      .count()
      .writeStream.outputMode("append")
      .format("memory").queryName("latesplit_agg").start()
    val counted = try {
      batches.foreach { b => in2.addData(b.toIndexedSeq); q2.processAllAvailable() }
      // push the watermark far past everything so all windows close
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in2.addData(Seq[Ev]((9L, 0L, Timestamp.valueOf(d))))
        q2.processAllAvailable()
      }
      spark.table("latesplit_agg").filter($"user_id" === 1L)
        .select($"count").as[Long].collect().sum
    } finally q2.stop()

    // the aggregate counted exactly the rows the tagger called on-time
    val onTime = tags.count(t => !t._2)
    assert(counted === onTime, s"windowed count $counted vs on-time rows $onTime")
  }
}
