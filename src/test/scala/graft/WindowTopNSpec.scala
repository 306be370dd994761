package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WindowTopNStream
import graft.streaming.WindowTopNStream.Ranked

/** Streaming Window Top-N: per-window ranking emitted on window
  * close, exact under out-of-order arrival. */
class WindowTopNSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minutes: Int, sec: Int = 0): Timestamp =
    new Timestamp((minutes * 60 + sec) * 1000L)

  test("stream_window_topn: finalized windows rank by count desc with deterministic ties") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = WindowTopNStream.topN(
        in.toDF().toDF("ts", "item"),
        windowDur = "5 minutes", n = 2, watermark = "30 minutes",
        itemCol = "item", tsCol = "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("wtopn").start()
    try {
      // window [0,5): a=3, b=2, c=1 — delivered out of order, across
      // two batches; window [5,10): b=2, a=1 with a tie broken by item
      in.addData(Seq(
        (ts(1), "a"), (ts(4), "c"), (ts(2), "b"),
        (ts(6), "b"), (ts(7), "a")))
      q.processAllAvailable()
      in.addData(Seq((ts(3), "a"), (ts(1, 30), "b"), (ts(0, 10), "a"), (ts(8), "b")))
      q.processAllAvailable()
      assert(spark.table("wtopn").isEmpty, "no window may emit before the watermark closes it")
      // advance the watermark far enough to close both windows, then
      // one more batch for the finalized rows to flow through the rank
      Seq(60, 70).foreach { m =>
        in.addData(Seq((ts(m), "z"))); q.processAllAvailable()
      }
      val got = spark.table("wtopn").as[Ranked].collect()
        .map(r => (r.ws, r.rank, r.item, r.cnt)).toSet
      assert(got === Set(
        (ts(0), 1, "a", 3L), (ts(0), 2, "b", 2L),
        (ts(5), 1, "b", 2L), (ts(5), 2, "a", 1L)))
    } finally q.stop()
  }

  test("stream_window_topn: every window emits at most n rows and ranks are dense") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = WindowTopNStream.topN(
        in.toDF().toDF("ts", "item"),
        windowDur = "10 minutes", n = 3, watermark = "0 seconds",
        itemCol = "item", tsCol = "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("wtopn_dense").start()
    try {
      val rnd = new scala.util.Random(7)
      val rows = (0 until 400).map(i => (ts(rnd.nextInt(50)), s"i${rnd.nextInt(9)}"))
      rows.grouped(100).foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq(500, 510).foreach { m => in.addData(Seq((ts(m), "z"))); q.processAllAvailable() }
      val got = spark.table("wtopn_dense").as[Ranked].collect()
      val byWin = got.groupBy(_.ws)
      assert(byWin.nonEmpty)
      byWin.foreach { case (ws, rs) =>
        assert(rs.length <= 3, s"window $ws emitted ${rs.length} rows")
        assert(rs.map(_.rank).sorted.toSeq === (1 to rs.length), s"ranks not dense in $ws")
        // counts non-increasing with rank
        val sorted = rs.sortBy(_.rank)
        sorted.sliding(2).foreach {
          case Array(x, y) => assert(x.cnt >= y.cnt)
          case _ =>
        }
      }
    } finally q.stop()
  }

  test("stream_window_topn: dealt replay of the events table == batch q103 (the oracle-gated twin)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"ts", $"event_type")
      .as[(Timestamp, String)].collect().toSeq
    val rnd = new scala.util.Random(103)
    val batches = rnd.shuffle(ev.toList).grouped((ev.size + 2) / 3).toSeq
    val in = MemoryStream[(Timestamp, String)]
    val q = WindowTopNStream.topN(
        in.toDF().toDF("ts", "item"),
        windowDur = "1 hour", n = 3, watermark = "400 days",
        itemCol = "item", tsCol = "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("wtopn_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((Timestamp.valueOf(d), "z")))
        q.processAllAvailable()
      }
      val sentinelCut = Timestamp.valueOf("2029-01-01 00:00:00")
      val streamed = spark.table("wtopn_parity").as[Ranked].collect()
        .filter(_.ws.before(sentinelCut))
        .map(r => (r.ws, r.rank.toLong, r.item, r.cnt)).toSet
      val batch = SparkEntry.queries("q103_window_topn")(spark, sfDir)
        .select($"w_start", $"rnk", $"event_type", $"n")
        .as[(Timestamp, Long, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
