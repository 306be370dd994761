package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Window deduplication TVF (q92 / stream_window_dedup): first event
  * per (user, tumbling hour), ties by id — emit-at-window-close
  * semantics, in-watermark displacement, dealt parity with batch q92. */
class WindowDedupSpec extends AnyFunSuite {
  import TestSpark._

  // rows: (user_id, event_id, ts, event_type)
  private type Ev = (Long, Long, Timestamp, String)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream_window_dedup: emits once at window close; a late in-watermark earlier row displaces the held first") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Pipelines.streamingWindowDedup(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        windowLen = "1 hour", watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("wdedup").start()
    try {
      in.addData(Seq[Ev]((1L, 5L, ts("2024-01-01 10:30:00"), "click")))
      q.processAllAvailable()
      // window still open: nothing emitted
      assert(spark.table("wdedup").count() === 0)
      // late row EARLIER in the window, inside the watermark: displaces
      in.addData(Seq[Ev]((1L, 4L, ts("2024-01-01 10:10:00"), "view")))
      // equal-ts tie in a second window: smaller id wins
      in.addData(Seq[Ev](
        (2L, 21L, ts("2024-01-01 10:40:00"), "view"),
        (2L, 20L, ts("2024-01-01 10:40:00"), "click")))
      // advance the watermark past 11:00 + 10 min
      Seq("2024-01-01 11:30:00", "2024-01-01 11:40:00").foreach { d =>
        in.addData(Seq[Ev]((9L, 90L, ts(d), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("wdedup")
        .filter($"user_id".isin(1L, 2L))
        .select($"user_id", $"event_id", $"event_type")
        .as[(Long, Long, String)].collect().toSet
      assert(got === Set((1L, 4L, "view"), (2L, 20L, "click")))
      // exactly one row per closed (user, window)
      assert(spark.table("wdedup").filter($"user_id" === 1L).count() === 1)
    } finally q.stop()
  }

  test("stream_window_dedup: dealt replay of the events table == batch q92") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(92)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 3).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 3 == i => x
    })
    val in = MemoryStream[Ev]
    val q = Pipelines.streamingWindowDedup(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        windowLen = "1 hour", watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("wdedup_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, ts(d), "view")))
        q.processAllAvailable()
      }
      val streamed = spark.table("wdedup_parity").filter($"user_id" =!= 999999L)
        .select($"user_id", $"w_start", $"event_id", $"ts", $"event_type")
        .as[(Long, Timestamp, Long, Timestamp, String)].collect().toSet
      val batch = SparkEntry.queries("q92_window_dedup")(spark, sfDir)
        .as[(Long, Timestamp, Long, Timestamp, String)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
