package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ordered-funnel and retention-cohort semantics on hand-built
  * corpora where the right answer is knowable by eye. */
class FunnelSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  private def funnel(rows: Seq[(Long, String, Timestamp)]): Map[Int, Long] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    try {
      rows.toDF("user_id", "event_type", "ts")
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q73_funnel_conversion")(spark, dir)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      CachePool.drain()
      got
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("funnel steps require strict order within the 7-day window anchored at first view") {
    val rows = Seq[(Long, String, Timestamp)](
      // u1 full conversion in order
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2 clicked BEFORE viewing -> stops at step 1
      (2L, "click", ts(1)), (2L, "view", ts(2)), (2L, "purchase", ts(3)),
      // u3 click inside window, purchase OUTSIDE the 7-day window -> step 2
      (3L, "view", ts(1)), (3L, "click", ts(2)), (3L, "purchase", ts(9)),
      // u4 view only
      (4L, "view", ts(5)),
      // u5 never viewed -> not in the funnel at all
      (5L, "click", ts(1)), (5L, "purchase", ts(2)),
      // u6 same-timestamp click as the view (not STRICTLY after) -> step 1
      (6L, "view", ts(4)), (6L, "click", ts(4)),
      // u7 conversion exactly at the window edge (ts <= s1 + 7d) counts
      (7L, "view", ts(1)), (7L, "click", ts(1, 1)), (7L, "purchase", ts(8)))
    assert(funnel(rows) === Map(1 -> 6L, 2 -> 3L, 3 -> 2L))
  }

  test("retention cohorts: integer week offsets from each user's first event") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ret").toString
    try {
      val rows = Seq[(Long, Timestamp)](
        // u1 first seen day 1, active again day 9 (offset 1) and day 16 (offset 2)
        (1L, ts(1)), (1L, ts(9)), (1L, ts(16)),
        // u2 first seen day 2 (same cohort week as u1), active day 5 (offset 0)
        (2L, ts(2)), (2L, ts(5)),
        // u3 first seen day 10 -> a later cohort, never returns
        (3L, ts(10)))
      rows.toDF("user_id", "ts")
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("event_type", lit("view"))
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q74_retention_cohorts")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      CachePool.drain()
      // derive expected week indices from the same Timestamp objects the
      // corpus was written from (JVM-zone-proof)
      val c1 = ts(1).getTime * 1000L / 604800000000L
      val c3 = ts(10).getTime * 1000L / 604800000000L
      assert(ts(2).getTime * 1000L / 604800000000L === c1) // u2 shares u1's cohort week
      assert(c3 !== c1)
      // u1: offsets 0,1,2; u2: offset 0 (twice, one distinct user-cell); u3: offset 0
      assert(got === Map(
        (c1, 0L) -> 2L, (c1, 1L) -> 1L, (c1, 2L) -> 1L, (c3, 0L) -> 1L))
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("streaming funnel == batch step memberships with arrival order fully reversed across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    // the SAME corpus as the batch test, so expected memberships are
    // step1 {1,2,3,4,6,7}, step2 {1,3,7}, step3 {1,7}
    val views = Seq[(Long, String, Timestamp)](
      (1L, "view", ts(1)), (2L, "view", ts(2)), (3L, "view", ts(1)),
      (4L, "view", ts(5)), (6L, "view", ts(4)), (7L, "view", ts(1)))
    val clicks = Seq[(Long, String, Timestamp)](
      (1L, "click", ts(2)), (2L, "click", ts(1)), (3L, "click", ts(2)),
      (5L, "click", ts(1)), (6L, "click", ts(4)), (7L, "click", ts(1, 1)))
    val purchases = Seq[(Long, String, Timestamp)](
      (1L, "purchase", ts(3)), (2L, "purchase", ts(3)), (3L, "purchase", ts(9)),
      (5L, "purchase", ts(2)), (7L, "purchase", ts(8)))
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = streaming.FunnelStream.stepAdvances(
        in.toDF().toDF("user_id", "event_type", "ts"),
        Seq("view", "click", "purchase"),
        java.time.Duration.ofDays(7), watermark = "30 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      // REVERSED delivery: purchases first, then clicks, then views —
      // the 30-day watermark holds everything in buffer state until the
      // flush sentinel advances it past all real events
      Seq(purchases, clicks, views).foreach { b =>
        in.addData(b.toIndexedSeq); q.processAllAvailable()
      }
      // watermark = max event time - 30d, applied from the NEXT batch:
      // one sentinel far enough out to push it past every real event,
      // then a second batch during which the hold-timers actually fire
      in.addData(Seq((99L, "flush", Timestamp.valueOf("2024-03-01 00:00:00"))))
      q.processAllAvailable()
      in.addData(Seq((99L, "flush", Timestamp.valueOf("2024-03-02 00:00:00"))))
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .select($"user_id", $"step").as[(Long, Int)].collect().toSet
      val expected = Set(
        (1L, 1), (2L, 1), (3L, 1), (4L, 1), (6L, 1), (7L, 1),
        (1L, 2), (3L, 2), (7L, 2),
        (1L, 3), (7L, 3))
      assert(got === expected, s"streamed advances diverged: got $got")
    } finally q.stop()
  }

  test("funnel step scans read only their event type (predicate pushed to parquet)") {
    val plan = SparkEntry.queries("q73_funnel_conversion")(spark, sfDir)
      .queryExecution.executedPlan.toString
    CachePool.drain()
    Seq("view", "click", "purchase").foreach(t =>
      assert(plan.contains(s"EqualTo(event_type,$t)") || plan.contains(s"event_type = $t"),
        s"$t filter not pushed into the scan:\n${plan.take(2000)}"))
  }
}
