package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Window join (co-occurrence in the same tumbling window): bucket
  * boundary semantics on a hand corpus and the streaming twin's exact
  * parity with batch q82 under dealt out-of-order micro-batches. */
class WindowJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("window join stream: same-bucket pairs only, boundary rows split buckets, cross-key isolation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val q = Pipelines.streamingWindowJoin(
        lIn.toDF().toDF("user_id", "click_id", "ts"),
        rIn.toDF().toDF("user_id", "error_id", "ts").withColumnRenamed("ts", "rts"),
        key = "user_id", windowLen = "1 hour", watermark = "1 minute",
        leftTs = "ts", rightTs = "rts")
      .writeStream.outputMode("append")
      .format("memory").queryName("wj_hand").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      lIn.addData(Seq(
        (1L, 10L, ts("2024-01-01 10:15:00")), // bucket 10:00
        (1L, 11L, ts("2024-01-01 11:00:00")), // bucket 11:00 (boundary row belongs right)
        (2L, 20L, ts("2024-01-01 10:30:00")))) // other key
      rIn.addData(Seq(
        (1L, 100L, ts("2024-01-01 10:59:59")), // bucket 10:00 -> pairs with 10 only
        (1L, 101L, ts("2024-01-01 11:30:00")), // bucket 11:00 -> pairs with 11 only
        (3L, 300L, ts("2024-01-01 10:30:00")))) // key 3: no clicks
      q.processAllAvailable()
      val got = spark.table("wj_hand")
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      assert(got === Set((10L, 100L), (11L, 101L)))
    } finally q.stop()
  }

  test("window join stream: dealt-out-of-order replay of the events table == batch q82") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // sf0.001's event stream is too sparse for same-hour click/error
    // co-occurrence (5 pairs); the sf0.01 table keeps the corpus real
    // and non-degenerate
    val parityDir = "/root/testdata/sf0.01"
    val ev = graft.sources.Tables.events(spark, parityDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[(Long, Long, Timestamp, String)].collect().toSeq
    val clicks = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
    val errors = ev.filter(_._4 == "error").map(e => (e._1, e._2, e._3))
    assert(clicks.size > 20 && errors.size > 20, s"degenerate: ${clicks.size}/${errors.size}")
    val rnd = new scala.util.Random(59)
    val lb = rnd.shuffle(clicks.toList).grouped((clicks.size + 2) / 3).toSeq
    val rb = rnd.shuffle(errors.toList).grouped((errors.size + 2) / 3).toSeq
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val q = Pipelines.streamingWindowJoin(
        lIn.toDF().toDF("user_id", "click_id", "ts"),
        rIn.toDF().toDF("user_id", "error_id", "ts").withColumnRenamed("ts", "rts"),
        key = "user_id", windowLen = "1 hour", watermark = "400 days",
        leftTs = "ts", rightTs = "rts")
      .writeStream.outputMode("append")
      .format("memory").queryName("wj_parity").start()
    try {
      // deal the two sides asymmetrically: a click can arrive batches
      // before or after its matching error
      (0 until 3).foreach { i =>
        if (i < lb.size) lIn.addData(lb(i).toIndexedSeq)
        if (2 - i < rb.size) rIn.addData(rb(2 - i).toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("wj_parity")
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      val batch = SparkEntry.queries("q82_window_join")(spark, parityDir)
        .select($"click_id", $"error_id").as[(Long, Long)].collect().toSet
      CachePool.drain()
      assert(streamed === batch)
      assert(batch.size > 20, s"degenerate: ${batch.size} pairs")
    } finally q.stop()
  }

  test("LEFT-OUTER window join stream: pad emits only when the watermark CLOSES the window; matches never pad") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val q = Pipelines.streamingWindowJoin(
        lIn.toDF().toDF("user_id", "click_id", "ts"),
        rIn.toDF().toDF("user_id", "error_id", "ts").withColumnRenamed("ts", "rts"),
        key = "user_id", windowLen = "1 hour", watermark = "1 minute",
        leftTs = "ts", rightTs = "rts", joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("wj_left_hand").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      lIn.addData(Seq(
        (1L, 10L, ts("2024-01-01 10:15:00")), // will match
        (2L, 20L, ts("2024-01-01 10:30:00")))) // no error ever → pad
      rIn.addData(Seq((1L, 100L, ts("2024-01-01 10:20:00"))))
      q.processAllAvailable()
      val early = spark.table("wj_left_hand")
        .select($"click_id").as[Long].collect().toSet
      assert(early === Set(10L),
        "pad must NOT emit while its window is still open (a match could arrive)")
      // advance BOTH watermark nodes past the 11:00 close
      lIn.addData(Seq((999999L, 0L, ts("2024-01-01 13:00:00"))))
      rIn.addData(Seq((999999L, 0L, ts("2024-01-01 13:00:00"))))
      q.processAllAvailable()
      lIn.addData(Seq((999999L, 1L, ts("2024-01-01 15:00:00"))))
      rIn.addData(Seq((999999L, 1L, ts("2024-01-01 15:00:00"))))
      q.processAllAvailable()
      val got = spark.table("wj_left_hand").filter($"user_id" =!= 999999L)
        .select($"click_id", $"error_id").as[(Long, Option[Long])].collect().toSet
      assert(got === Set((10L, Some(100L)), (20L, None)))
    } finally q.stop()
  }

  test("FULL-OUTER window join stream: both pad kinds emit at window close") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val q = Pipelines.streamingWindowJoin(
        lIn.toDF().toDF("user_id", "click_id", "ts"),
        rIn.toDF().toDF("user_id", "error_id", "ts").withColumnRenamed("ts", "rts"),
        key = "user_id", windowLen = "1 hour", watermark = "1 minute",
        leftTs = "ts", rightTs = "rts", joinType = "full_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("wj_full_hand").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      lIn.addData(Seq(
        (1L, 10L, ts("2024-01-01 10:15:00")), // matches
        (2L, 20L, ts("2024-01-01 10:30:00")))) // left pad
      rIn.addData(Seq(
        (1L, 100L, ts("2024-01-01 10:20:00")),
        (3L, 300L, ts("2024-01-01 10:40:00")))) // right pad
      q.processAllAvailable()
      Seq("2024-01-01 13:00:00", "2024-01-01 15:00:00").foreach { d =>
        lIn.addData(Seq((999999L, 0L, Timestamp.valueOf(d))))
        rIn.addData(Seq((999999L, 0L, Timestamp.valueOf(d))))
        q.processAllAvailable()
      }
      val got = spark.table("wj_full_hand")
        .filter($"click_id" =!= 0L || $"click_id".isNull)
        .select($"click_id", $"error_id")
        .as[(Option[Long], Option[Long])].collect().toSet
      assert(got.filter(r => !r._1.contains(0L)) === Set(
        (Some(10L), Some(100L)),
        (Some(20L), None),      // left pad
        (None, Some(300L))))    // right pad
    } finally q.stop()
  }

  test("LEFT-OUTER window join stream: dealt replay == batch q101 (pads included)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val parityDir = "/root/testdata/sf0.01"
    val ev = graft.sources.Tables.events(spark, parityDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[(Long, Long, Timestamp, String)].collect().toSeq
    val clicks = ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3))
    val errors = ev.filter(_._4 == "error").map(e => (e._1, e._2, e._3))
    val rnd = new scala.util.Random(101)
    val lb = rnd.shuffle(clicks.toList).grouped((clicks.size + 2) / 3).toSeq
    val rb = rnd.shuffle(errors.toList).grouped((errors.size + 2) / 3).toSeq
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val q = Pipelines.streamingWindowJoin(
        lIn.toDF().toDF("user_id", "click_id", "ts"),
        rIn.toDF().toDF("user_id", "error_id", "ts").withColumnRenamed("ts", "rts"),
        key = "user_id", windowLen = "1 hour", watermark = "400 days",
        leftTs = "ts", rightTs = "rts", joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("wj_left_parity").start()
    try {
      (0 until 3).foreach { i =>
        if (i < lb.size) lIn.addData(lb(i).toIndexedSeq)
        if (2 - i < rb.size) rIn.addData(rb(2 - i).toIndexedSeq)
        q.processAllAvailable()
      }
      // sentinels on BOTH sides (the global watermark is the min over
      // both nodes) push past every real window so pads finalize
      Seq("2033-01-01 00:00:00", "2034-01-01 00:00:00").foreach { d =>
        lIn.addData(Seq((999999L, 0L, Timestamp.valueOf(d))))
        rIn.addData(Seq((999999L, 0L, Timestamp.valueOf(d))))
        q.processAllAvailable()
      }
      val streamed = spark.table("wj_left_parity").filter($"user_id" =!= 999999L)
        .select($"click_id", $"error_id").as[(Long, Option[Long])].collect().toSet
      val batch = SparkEntry.queries("q101_window_join_left")(spark, parityDir)
        .select($"click_id", $"error_id").as[(Long, Option[Long])].collect().toSet
      CachePool.drain()
      assert(batch.exists(_._2.isEmpty), "degenerate: no pad rows in the oracle corpus")
      assert(streamed === batch)
    } finally q.stop()
  }
}
