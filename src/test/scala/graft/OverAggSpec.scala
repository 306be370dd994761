package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OverAggStream

/** Event-time OVER aggregation (per-event trailing RANGE frame):
  * hand semantics — inclusive bounds, equal-ts peers, late-arrival
  * fold across a batch boundary, timer-driven tail flush — and the
  * streaming twin's exact parity with batch q81 under dealt
  * out-of-order micro-batches. */
class OverAggSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  test("over_agg stream: inclusive RANGE bounds, equal-ts peers, late fold across batches, timer flush") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overAgg(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        window = java.time.Duration.ofSeconds(1), watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("over_hand").start()
    try {
      in.addData(Seq(
        // key 1: chain — id 12's frame [1s, 2s] must include id 10 at
        // EXACTLY ts − T (inclusive lower bound)
        (1L, 10L, us(1000000L), 1.00),
        (1L, 11L, us(1500000L), 2.00),
        (1L, 12L, us(2000000L), 3.00),
        // key 2: equal-ts peers — RANGE includes both in both frames
        (2L, 20L, us(1000000L), 0.10),
        (2L, 21L, us(1000000L), 0.20),
        // key 3: isolation
        (3L, 30L, us(1500000L), 5.00),
        // key 4: id 41 first; its frame must pick up the LATE id 40
        (4L, 41L, us(3000000L), 7.00)))
      q.processAllAvailable()
      // nothing decided yet (watermark = max − 10 min, far below)
      assert(spark.table("over_hand").count() == 0)
      // late-but-in-watermark arrival for key 4, earlier than id 41
      in.addData(Seq((4L, 40L, us(2500000L), 4.00)))
      q.processAllAvailable()
      // flush: far-future sentinel on its own key advances the shared
      // watermark; keys 1-4 emit via their event-time TIMERS
      in.addData(Seq((99L, 990L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("over_hand").filter($"key" =!= 99L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(
        10L -> ((1L, 100L)),
        11L -> ((2L, 300L)),
        12L -> ((3L, 600L)), // includes id 10 at exactly ts − T
        20L -> ((2L, 30L)), // equal-ts peer included both ways
        21L -> ((2L, 30L)),
        30L -> ((1L, 500L)),
        40L -> ((1L, 400L)), // id 41 is AFTER it, not in its frame
        41L -> ((2L, 1100L)))) // late id 40 folded in
    } finally q.stop()
  }

  test("over_agg stream: dealt-out-of-order replay of the events table == batch q81") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[(Long, Long, Timestamp, Double)].collect().toSeq
    assert(ev.size > 100, s"degenerate corpus: ${ev.size} rows")
    val rnd = new scala.util.Random(41)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overAgg(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        window = java.time.Duration.ofHours(1), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("over_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((999999L, 0L, Timestamp.valueOf(d), 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("over_parity").filter($"key" =!= 999999L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = SparkEntry.queries("q81_over_agg")(spark, sfDir)
        .select($"event_id", $"n_1h", $"cents_1h").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      CachePool.drain()
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("over_rows stream: count-order frames, (ts,id) tie rule, late row inserts into the order, bounded n-1 tail") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overRows(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        n = 3, watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("rows_hand").start()
    try {
      in.addData(Seq(
        // key 1: four rows — id 13's frame is rows {11, 12, 13}, NOT
        // 10 (count frame, not time frame: 10 is 3 rows back)
        (1L, 10L, us(1000000L), 1.00),
        (1L, 11L, us(2000000L), 2.00),
        (1L, 12L, us(9000000L), 3.00), // far outside any 1s RANGE — ROWS doesn't care
        (1L, 13L, us(9500000L), 4.00),
        // key 2: equal-ts rows order by id — 21's frame = {20, 21}
        (2L, 20L, us(1000000L), 0.10),
        (2L, 21L, us(1000000L), 0.20),
        // key 4: id 41 arrives first; the LATE id 40 (smaller ts) must
        // insert BEFORE it in the count order
        (4L, 41L, us(3000000L), 7.00)))
      q.processAllAvailable()
      assert(spark.table("rows_hand").count() == 0)
      in.addData(Seq((4L, 40L, us(2500000L), 4.00)))
      q.processAllAvailable()
      in.addData(Seq((99L, 990L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("rows_hand").filter($"key" =!= 99L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(
        10L -> ((1L, 100L)),
        11L -> ((2L, 300L)),
        12L -> ((3L, 600L)),
        13L -> ((3L, 900L)), // rows 11+12+13 — row 10 aged out of the count frame
        20L -> ((1L, 10L)),
        21L -> ((2L, 30L)), // id tie-break put 20 first
        40L -> ((1L, 400L)),
        41L -> ((2L, 1100L)))) // late 40 inserted before 41
    } finally q.stop()
  }

  test("over_rows stream: dealt-out-of-order replay of the events table == batch q87") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[(Long, Long, Timestamp, Double)].collect().toSeq
    val rnd = new scala.util.Random(43)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overRows(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        n = 3, watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("rows_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((999999L, 0L, Timestamp.valueOf(d), 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("rows_parity").filter($"key" =!= 999999L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = SparkEntry.queries("q87_over_rows")(spark, sfDir)
        .select($"event_id", $"n_3r", $"cents_3r").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      CachePool.drain()
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("over_lag stream: previous-row value in (ts,id) order, None for a key's first; dealt replay == batch q109") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // hand corpus: the late smaller-ts row must BECOME the held row's
    // predecessor
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = graft.streaming.OverAggStream.overLag(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("lag_hand").start()
    try {
      in.addData(Seq(
        (1L, 10L, us(1000000L), 1.00),
        (1L, 11L, us(2000000L), 2.00),
        (4L, 41L, us(3000000L), 7.00)))
      q.processAllAvailable()
      in.addData(Seq((4L, 40L, us(2500000L), 4.00))) // late, smaller ts
      q.processAllAvailable()
      in.addData(Seq((99L, 990L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("lag_hand").filter($"key" =!= 99L)
        .select($"id", $"prev_cents")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(got === Map(10L -> -1L, 11L -> 100L, 40L -> -1L, 41L -> 400L))
    } finally q.stop()

    // dealt replay == batch q109
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[(Long, Long, Timestamp, Double)].collect().toSeq
    val shuffled = new scala.util.Random(59).shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in2 = MemoryStream[(Long, Long, Timestamp, Double)]
    val q2 = graft.streaming.OverAggStream.overLag(
        in2.toDF().toDF("user_id", "event_id", "ts", "value"),
        watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("lag_parity").start()
    try {
      batches.foreach { b => in2.addData(b.toIndexedSeq); q2.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in2.addData(Seq((999999L, 0L, Timestamp.valueOf(d), 0.0)))
        q2.processAllAvailable()
      }
      val streamed = spark.table("lag_parity").filter($"key" =!= 999999L)
        .select($"id", $"prev_cents")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val batch = SparkEntry.queries("q109_over_lag")(spark, sfDir)
        .select($"event_id", $"prev_cents")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      CachePool.drain()
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q2.stop()
  }

  test("over_unbounded stream: running totals in (ts,id) order; a late smaller-ts row inserts below and shifts nothing already decided") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overUnbounded(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("unb_hand").start()
    try {
      in.addData(Seq(
        (1L, 10L, us(1000000L), 1.00),
        (1L, 11L, us(2000000L), 2.00),
        // key 2: equal-ts rows order by id
        (2L, 20L, us(1000000L), 0.10),
        (2L, 21L, us(1000000L), 0.20),
        // key 4: id 41 first; the LATE id 40 (smaller ts) must insert
        // BELOW it — 41's running total counts 40
        (4L, 41L, us(3000000L), 7.00)))
      q.processAllAvailable()
      assert(spark.table("unb_hand").count() == 0)
      in.addData(Seq((4L, 40L, us(2500000L), 4.00)))
      q.processAllAvailable()
      // first flush: decide everything so far
      in.addData(Seq((99L, 990L, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      // key 1 continues AFTER its earlier rows were decided and
      // forgotten — the accumulator alone must carry the history
      in.addData(Seq((1L, 12L, Timestamp.valueOf("2030-01-01 01:00:00"), 3.00)))
      q.processAllAvailable()
      in.addData(Seq((99L, 991L, Timestamp.valueOf("2031-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("unb_hand").filter($"key" =!= 99L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(
        10L -> ((1L, 100L)),
        11L -> ((2L, 300L)),
        12L -> ((3L, 600L)), // accumulator carried rows 10+11 after they were dropped
        20L -> ((1L, 10L)),
        21L -> ((2L, 30L)),
        40L -> ((1L, 400L)),
        41L -> ((2L, 1100L)))) // late 40 inserted below 41
    } finally q.stop()
  }

  test("over_unbounded stream: dealt-out-of-order replay of the events table == batch q106") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"value")
      .as[(Long, Long, Timestamp, Double)].collect().toSeq
    val rnd = new scala.util.Random(47)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = OverAggStream.overUnbounded(
        in.toDF().toDF("user_id", "event_id", "ts", "value"),
        watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("unb_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq((999999L, 0L, Timestamp.valueOf(d), 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("unb_parity").filter($"key" =!= 999999L)
        .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val batch = SparkEntry.queries("q106_over_unbounded")(spark, sfDir)
        .select($"event_id", $"n_run", $"cents_run").as[(Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      CachePool.drain()
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q.stop()
  }

  // Idle-state TTL (Flink's table.exec.state.ttl analog): key 1 sees
  // ids 1-2 (1000 s, 2000 s), goes quiet while sentinels push the
  // watermark far past lastSeen + ttl, then a straggler id 3 arrives
  // at 20000 s. ttl = 1 h (3600 s): the key expired at 5600 s, so the
  // straggler re-opens EMPTY state. ttl = 10 h: the idle timer was
  // armed but never exceeded (2000 s + 36000 s = 38000 s > any wm the
  // straggler sees), so the chain continues unbroken — the knob only
  // bites when the key actually outlives it.
  private val ttlBatches: Seq[Seq[(Long, Long, Timestamp, Double)]] = Seq(
    Seq((1L, 1L, us(1000L * 1000000L), 1.00), (1L, 2L, us(2000L * 1000000L), 2.00)),
    Seq((99L, 990L, us(10000L * 1000000L), 0.0)), // wm → 9400 s: decide ids 1-2, then expire (short ttl)
    Seq((1L, 3L, us(20000L * 1000000L), 5.00)), // straggler re-opens the key
    Seq((99L, 991L, us(50000L * 1000000L), 0.0))) // wm → 49400 s: decide id 3

  private def runTtl[T](name: String,
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp, Double)]
    val q = build(in.toDF().toDF("user_id", "event_id", "ts", "value"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      ttlBatches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).filter($"key" =!= 99L)
  }

  test("over_unbounded idle TTL: expiry restarts running totals; unexpired ttl leaves them unbroken") {
    import spark.implicits._
    val short = runTtl("unb_ttl_short", df => OverAggStream.overUnbounded(
        df, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(1))))
      .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(short === Map(1L -> ((1L, 100L)), 2L -> ((2L, 300L)),
      3L -> ((1L, 500L)))) // restarted: the pre-expiry rows are forgotten
    val long = runTtl("unb_ttl_long", df => OverAggStream.overUnbounded(
        df, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(10))))
      .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(long === Map(1L -> ((1L, 100L)), 2L -> ((2L, 300L)),
      3L -> ((3L, 800L)))) // armed but unexpired: totals continue
  }

  test("over_lag idle TTL: a post-expiry straggler is a fresh first (prev None)") {
    import spark.implicits._
    val short = runTtl("lag_ttl_short", df => OverAggStream.overLag(
        df, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(1))))
      .select($"id", $"prev_cents").as[(Long, Option[Long])]
      .collect().toMap
    assert(short === Map(1L -> None, 2L -> Some(100L), 3L -> None))
    val long = runTtl("lag_ttl_long", df => OverAggStream.overLag(
        df, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(10))))
      .select($"id", $"prev_cents").as[(Long, Option[Long])]
      .collect().toMap
    assert(long === Map(1L -> None, 2L -> Some(100L), 3L -> Some(200L)))
  }

  test("over_rows idle TTL: expiry drops the decided last-n tail; straggler frames restart") {
    import spark.implicits._
    val short = runTtl("rows_ttl_short", df => OverAggStream.overRows(
        df, n = 3, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(1))))
      .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(short === Map(1L -> ((1L, 100L)), 2L -> ((2L, 300L)),
      3L -> ((1L, 500L))))
    val long = runTtl("rows_ttl_long", df => OverAggStream.overRows(
        df, n = 3, watermark = "10 minutes", idleTtl = Some(java.time.Duration.ofHours(10))))
      .select($"id", $"n_win", $"cents_win").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(long === Map(1L -> ((1L, 100L)), 2L -> ((2L, 300L)),
      3L -> ((3L, 800L))))
  }
}
