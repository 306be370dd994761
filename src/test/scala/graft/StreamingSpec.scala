package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines
import graft.streaming.Pipelines.{Change, Event}

/** Structured Streaming mirrors of the reference pipelines
  * (SURVEY §2 stream_*): tumbling window + watermark, count trigger,
  * CDC upsert state, checkpointed file pipeline, rate datagen.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)

  test("stream_tumbling_watermark: windows finalize in append mode after watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Pipelines.tumblingWindowCounts(in.toDF(), "5 minutes", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("tumbling_out").start()
    try {
      in.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(2), 10, "click", 2.0),
        Event(3, ts(6), 11, "view", 3.0))
      q.processAllAvailable()
      // nothing finalized yet (watermark still at 0)
      assert(spark.table("tumbling_out").count() == 0)
      // advance event time far enough to close both windows
      in.addData(Event(4, ts(60), 12, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out").as[(Timestamp, String, Long, Double)].collect().toSet
      assert(rows == Set((ts(0), "click", 2L, 3.0), (ts(5), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("stream_session_window: sessions merge within gap and finalize after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Pipelines.sessionWindowCounts(in.toDF(), gap = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("session_out").start()
    try {
      // two bursts for user 1 separated by > gap, one event for user 2
      in.addData(
        Event(1, ts(1), 1, "click", 1.0), Event(2, ts(5), 1, "click", 2.0),
        Event(3, ts(30), 1, "click", 4.0),
        Event(4, ts(2), 2, "view", 8.0))
      q.processAllAvailable()
      in.addData(Event(9, ts(120), 9, "click", 0.0)) // push watermark far ahead
      q.processAllAvailable()
      val rows = spark.table("session_out")
        .select("user_id", "n", "total_value").as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
    } finally q.stop()
  }

  test("stream_count_trigger: fires exactly every N events per key and purges state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(in.toDS(), maxCount = 3)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("counttrig_out").start()
    try {
      in.addData((1 to 7).map(i => Event(i, ts(i), 1, "click", i.toDouble)): _*)
      in.addData(Event(100, ts(1), 2, "view", 10.0))
      q.processAllAvailable()
      val byUser = spark.table("counttrig_out")
        .as[Pipelines.CountWindowEmit].collect().groupBy(_.user_id)
      // user 1: 7 events → two full windows of 3 (1+2+3=6, 4+5+6=15); 1 remains in state
      assert(byUser(1L).map(e => (e.n, e.total_value)).toSet == Set((3L, 6.0), (3L, 15.0)))
      // user 2: only 1 event → nothing fired
      assert(!byUser.contains(2L))
      // the remainder fires once 2 more arrive
      in.addData(Event(8, ts(8), 1, "click", 1.0), Event(9, ts(9), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("counttrig_out").as[Pipelines.CountWindowEmit]
        .filter(_.user_id == 1L).collect().map(e => (e.n, e.total_value)).toSet ==
        Set((3L, 6.0), (3L, 15.0), (3L, 9.0)))
    } finally q.stop()
  }

  test("stream_count_trigger: partial window fires at window end via event-time timeout (hybrid trigger)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // 5-minute windows; watermark drives the timer.
    val q = Pipelines.countTriggerAgg(
        in.toDS().withWatermark("ts", "0 seconds").as[Event],
        maxCount = 10, windowMs = 5 * 60000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("counttrig_to_out").start()
    try {
      in.addData(Event(1, ts(1), 5, "click", 2.0), Event(2, ts(2), 5, "click", 3.0))
      q.processAllAvailable()
      assert(spark.table("counttrig_to_out").count() == 0) // below maxCount, window still open
      in.addData(Event(99, ts(60), 6, "view", 1.0)) // watermark passes window end (min 6)
      q.processAllAvailable()
      in.addData(Event(100, ts(61), 6, "view", 1.0)) // next batch evaluates expired timers
      q.processAllAvailable()
      val fired = spark.table("counttrig_to_out").as[Pipelines.CountWindowEmit].collect()
        .filter(_.user_id == 5L)
      assert(fired.map(e => (e.n, e.total_value)).toSeq == Seq((2L, 5.0)))
    } finally q.stop()
  }

  test("stream_count_trigger: residual window after a mid-batch purge times out windowMs after ITS first event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(
        in.toDS().withWatermark("ts", "0 seconds").as[Event],
        maxCount = 3, windowMs = 5 * 60000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("counttrig_residual_out").start()
    try {
      // one batch: 3 events fire immediately; the 4th (ts=10min) is a
      // residual window whose end is 15min — NOT 1min+5=6min (the
      // fired window's anchor, the round-2 bug)
      in.addData(
        Event(1, ts(1), 7, "click", 1.0), Event(2, ts(2), 7, "click", 2.0),
        Event(3, ts(3), 7, "click", 3.0), Event(4, ts(10), 7, "click", 40.0))
      q.processAllAvailable()
      assert(spark.table("counttrig_residual_out").as[Pipelines.CountWindowEmit].collect()
        .map(e => (e.n, e.total_value)).toSeq == Seq((3L, 6.0)))
      // watermark to 12min: past the stale 6min anchor, before the
      // correct 15min window end → must NOT fire
      in.addData(Event(99, ts(12), 8, "view", 0.0))
      q.processAllAvailable()
      in.addData(Event(100, ts(12), 8, "view", 0.0)) // evaluate timers at wm=12min
      q.processAllAvailable()
      assert(spark.table("counttrig_residual_out").count() == 1)
      // watermark past 15min → residual fires with its own contents
      in.addData(Event(101, ts(20), 8, "view", 0.0))
      q.processAllAvailable()
      in.addData(Event(102, ts(21), 8, "view", 0.0))
      q.processAllAvailable()
      val fired = spark.table("counttrig_residual_out").as[Pipelines.CountWindowEmit].collect()
        .filter(_.user_id == 7L)
      assert(fired.map(e => (e.n, e.total_value)).toSet == Set((3L, 6.0), (1L, 40.0)))
    } finally q.stop()
  }

  test("stream_count_trigger: partial window spanning several micro-batches keeps its timer armed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(
        in.toDS().withWatermark("ts", "0 seconds").as[Event],
        maxCount = 10, windowMs = 5 * 60000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("counttrig_rearm_out").start()
    try {
      // window opens at ts=1min in batch 1; a second event arrives in
      // batch 2 (Spark clears the timeout on that invocation — the
      // round-2 code never re-armed it, so the window never fired)
      in.addData(Event(1, ts(1), 9, "click", 2.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(2), 9, "click", 3.0))
      q.processAllAvailable()
      in.addData(Event(99, ts(30), 10, "view", 0.0)) // watermark past 6min
      q.processAllAvailable()
      in.addData(Event(100, ts(31), 10, "view", 0.0)) // evaluate timers
      q.processAllAvailable()
      val fired = spark.table("counttrig_rearm_out").as[Pipelines.CountWindowEmit].collect()
        .filter(_.user_id == 9L)
      assert(fired.map(e => (e.n, e.total_value)).toSeq == Seq((2L, 5.0)))
    } finally q.stop()
  }

  test("stream_cdc_upsert: TTL evicts stale/tombstoned keys once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    // ts is epoch millis here; TTL = 5 minutes of event time. This
    // test controls ordering fully, so no lateness budget is needed.
    val q = Pipelines.cdcUpsertStream(in.toDS(), ttlMs = Some(5 * 60000L), lateness = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("upsert_ttl_out").start()
    def stateRows(): Long =
      q.lastProgress.stateOperators.apply(0).numRowsTotal
    try {
      in.addData(Change(1, 60000L, "+I", 1.0), Change(2, 60000L, "+I", 2.0))
      q.processAllAvailable()
      in.addData(Change(1, 120000L, "-D", 0.0)) // tombstone pk 1
      q.processAllAvailable()
      assert(stateRows() == 2) // both keys still resident
      // watermark far past both keys' ts + TTL → timers fire, evicting
      // pk 1 (tombstoned) AND pk 2 (abandoned), with no emission
      val before = spark.table("upsert_ttl_out").count()
      in.addData(Change(99, 60 * 60000L, "+I", 0.0))
      q.processAllAvailable()
      in.addData(Change(99, 61 * 60000L, "+U", 1.0)) // evaluate timers
      q.processAllAvailable()
      assert(stateRows() == 1) // only the fresh pk 99 remains
      val emitted = spark.table("upsert_ttl_out").as[Pipelines.Upsert].collect()
      assert(!emitted.drop(before.toInt).exists(u => u.pk == 1L || u.pk == 2L)) // eviction is silent
      // a late change for an evicted key is treated as new state
      in.addData(Change(1, 62 * 60000L, "+U", 7.0))
      q.processAllAvailable()
      assert(spark.table("upsert_ttl_out").as[Pipelines.Upsert].collect()
        .last == Pipelines.Upsert(1, 62 * 60000L, 7.0, deleted = false))
    } finally q.stop()
  }

  test("stream_cdc_upsert: a retract row arriving one batch after its same-ts after-image does not regress state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = Pipelines.cdcUpsertStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("upsert_crossbatch_out").start()
    try {
      // batch 1: the UPDATE's after-image (+U) at ts=20
      in.addData(Change(5, 20, "+U", 12.5))
      q.processAllAvailable()
      // batch 2: its retract row (-U, same ts) straddled the boundary
      in.addData(Change(5, 20, "-U", 10.5))
      q.processAllAvailable()
      val last = spark.table("upsert_crossbatch_out").as[Pipelines.Upsert].collect().last
      assert(last == Pipelines.Upsert(5, 20, 12.5, deleted = false),
        s"state regressed to the before-image: $last")
    } finally q.stop()
  }

  test("stream_cdc_upsert: per-key state converges to latest image, deletes marked") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = Pipelines.cdcUpsertStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("upsert_out").start()
    try {
      in.addData(Change(1, 10, "+I", 1.0), Change(1, 20, "+U", 2.0), Change(2, 5, "+I", 9.0))
      q.processAllAvailable()
      in.addData(Change(1, 15, "+U", 99.0)) // late: older than current ts=20 → ignored
      in.addData(Change(2, 7, "-D", 0.0))
      q.processAllAvailable()
      val last = spark.table("upsert_out").as[Pipelines.Upsert].collect()
        .groupBy(_.pk).map { case (k, v) => k -> v.maxBy(_.ts) }
      assert(last(1L).value == 2.0 && last(1L).ts == 20 && !last(1L).deleted)
      assert(last(2L).deleted && last(2L).ts == 7)
    } finally q.stop()
  }

  test("stream_canal_upsert: canal-json stream decodes to changelog and converges per-key state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = Pipelines.canalUpsertPipeline(in.toDF().toDF("payload"), "payload", "id", "amount")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("canal_upsert_out").start()
    try {
      in.addData(
        """{"data":[{"id":"1","amount":"10.5"}],"type":"INSERT","table":"t","ts":100}""",
        """{"data":[{"id":"1","amount":"12.5"}],"old":[{"amount":"10.5"}],"type":"UPDATE","table":"t","ts":200}""",
        """{"data":[{"id":"2","amount":"7.0"}],"type":"INSERT","table":"t","ts":150}""",
        """garbage envelope""")
      q.processAllAvailable()
      in.addData("""{"data":[{"id":"2","amount":"7.0"}],"type":"DELETE","table":"t","ts":300}""")
      q.processAllAvailable()
      val last = spark.table("canal_upsert_out").as[Pipelines.Upsert].collect()
        .groupBy(_.pk).map { case (k, v) => k -> v.maxBy(_.ts) }
      assert(last(1L).value == 12.5 && !last(1L).deleted) // +U wins over -U at same ts
      assert(last(2L).deleted && last(2L).ts == 300)
    } finally q.stop()
  }

  test("stream_kafka2kafka: checkpointed pass-through pipeline moves all rows exactly once") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    // file-stream sources need a directory (a Kafka topic's analog)
    Files.copy(java.nio.file.Paths.get(s"$sfDir/orders.parquet"),
      java.nio.file.Paths.get(s"$in/orders.parquet"))
    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    Pipelines.passThroughPipeline(
      spark, in, out, ckpt,
      df => df.filter(df("o_totalprice") > 0))
    val got = spark.read.parquet(out).count()
    val expected = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(got == expected)
    // re-running with the same checkpoint must not duplicate (exactly-once sink)
    Pipelines.passThroughPipeline(
      spark, in, out, ckpt,
      df => df.filter(df("o_totalprice") > 0))
    assert(spark.read.parquet(out).count() == expected)
  }

  test("stream_io: kafka endpoints resolve to the documented format/option contract") {
    import graft.streaming.StreamIO
    val src = StreamIO.Kafka("broker1:9092,broker2:9092", "events_in",
      startingOffsets = "earliest", options = Map("kafka.security.protocol" -> "SASL_SSL"))
    val (rfmt, ropts) = StreamIO.sourceConfig(src)
    assert(rfmt == "kafka")
    assert(ropts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(ropts("subscribe") == "events_in")
    assert(ropts("startingOffsets") == "earliest")
    assert(ropts("kafka.security.protocol") == "SASL_SSL")
    val (wfmt, wopts) = StreamIO.sinkConfig(StreamIO.Kafka("b:9092", "events_out"))
    assert(wfmt == "kafka")
    assert(wopts("kafka.bootstrap.servers") == "b:9092")
    assert(wopts("topic") == "events_out")
    // memory endpoints are sink-only
    intercept[IllegalArgumentException] { StreamIO.sourceConfig(StreamIO.Memory("x")) }
    assert(StreamIO.sinkConfig(StreamIO.Memory("x")) == ("memory", Map("queryName" -> "x")))
  }

  test("stream_custom_source: DataSourceV2 generator resumes from checkpointed offsets across restarts") {
    import org.apache.spark.sql.streaming.Trigger
    val out = Files.createTempDirectory("graft_gen_out").toString
    val ckpt = Files.createTempDirectory("graft_gen_ckpt").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.GraftGenSource")
        .option("rowsPerSecond", "2000").option("numPartitions", "2")
        .option("payloadLen", "16")
        .load()
        .writeStream.trigger(Trigger.Once())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(out).count()
    assert(first > 0)
    Thread.sleep(300) // let the rate limiter admit more rows
    runOnce() // restart from the committed offset
    import spark.implicits._
    val rows = spark.read.parquet(out).select("id", "payload")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.length > first)
    // exactly-once across the restart: contiguous ids 0..N-1, no dupes
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq)
    // parallel: both partitions produced (even and odd ids interleave)
    assert(rows.count(_._1 % 2 == 0) > 0 && rows.count(_._1 % 2 == 1) > 0)
    // deterministic payload contract shared with q23
    assert(rows.forall { case (id, p) => p == graft.sources.GraftGenSource.payload(id, 16) })
  }

  test("stream_dedup: first occurrence kept, later duplicates dropped within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = Pipelines.streamingExactDedup(in.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    try {
      in.addData((ts(1), "doc one"), (ts(2), "doc two"), (ts(3), "doc one"))
      q.processAllAvailable()
      in.addData((ts(4), "doc one"), (ts(5), "doc three"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("text").as[String].collect().sorted
      assert(kept.toSeq == Seq("doc one", "doc three", "doc two"))
    } finally q.stop()
  }

  test("stream_near_dedup: SimHash band state drops near-duplicates, keeps first occurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    // find a one-word suffix whose tf-weighted SimHash lands within
    // hamming 3 of base (appending a word to a short doc usually
    // flips MORE than 3 bits — searching makes the near-dup case
    // deterministic instead of luck-of-the-md5)
    def fp(t: String): Long =
      graft.functions.SimHashKernel.sim60(org.apache.spark.unsafe.types.UTF8String.fromString(t))
    val near = (1 to 2000).iterator.map(i => base + s"w$i")
      .find { t => val h = java.lang.Long.bitCount(fp(base) ^ fp(t)); h >= 1 && h <= 3 }.get
    val q = Pipelines.streamingNearDedup(
        in.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", "ts", "text",
        watermark = "0 seconds", verdictWindow = "1 minute",
        stateRetention = java.time.Duration.ofHours(1))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("near_dedup_out").start()
    try {
      in.addData(
        (1L, ts(1), base),                                  // original
        (2L, ts(2), base),                                  // exact dup (hamming 0)
        (3L, ts(3), "totally different words entirely " * 8)) // unrelated
      q.processAllAvailable()
      in.addData((4L, ts(4), near))                         // near dup (hamming 1-3)
      q.processAllAvailable()
      // push the watermark past every verdict window so survivors emit
      in.addData((99L, ts(120), "closer of windows " * 10))
      q.processAllAvailable()
      in.addData((100L, ts(121), "and once more for the timers " * 6))
      q.processAllAvailable()
      val survivors = spark.table("near_dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(survivors.contains(1L), s"original dropped: $survivors")
      assert(survivors.contains(3L), s"unrelated doc dropped: $survivors")
      assert(!survivors.contains(2L), s"exact dup kept: $survivors")
      assert(!survivors.contains(4L), s"near dup kept: $survivors")
    } finally q.stop()
  }

  test("stream_media_near_dedup: the text band-state machine runs unchanged on image AND audio payload hashes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // IMAGE stream: a cross-resolution re-render is the near dup, a
    // different scene survives, garbage hashes NULL and is excluded
    val imgs = MemoryStream[(Long, Timestamp, Array[Byte])]
    val qi = Pipelines.streamingMediaNearDedup(
        imgs.toDF().toDF("doc_id", "ts", "payload"),
        "doc_id", "ts", "payload",
        watermark = "0 seconds", verdictWindow = "1 minute",
        stateRetention = java.time.Duration.ofHours(1))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("media_dedup_img").start()
    try {
      imgs.addData(
        (1L, ts(1), graft.queries.MediaQ.sceneJpeg(7, 64, 48)),
        (3L, ts(2), graft.queries.MediaQ.sceneJpeg(4242, 64, 48)),
        (9L, ts(2), Array[Byte](1, 2, 3)))
      qi.processAllAvailable()
      imgs.addData((2L, ts(3), graft.queries.MediaQ.sceneJpeg(7, 96, 72))) // re-render of 1
      qi.processAllAvailable()
      imgs.addData((99L, ts(120), graft.queries.MediaQ.sceneJpeg(999, 64, 48)))
      qi.processAllAvailable()
      imgs.addData((100L, ts(121), graft.queries.MediaQ.sceneJpeg(998, 64, 48)))
      qi.processAllAvailable()
      val got = spark.table("media_dedup_img").select("doc_id").as[Long].collect().toSet
      assert(got.contains(1L) && got.contains(3L), s"original/unrelated dropped: $got")
      assert(!got.contains(2L), s"cross-resolution re-render kept: $got")
      assert(!got.contains(9L), s"undecodable payload entered dedup: $got")
    } finally qi.stop()

    // AUDIO stream: same machine, AudioHash60 — a cross-rate
    // re-encode of the same recording is the near dup
    val wavs = MemoryStream[(Long, Timestamp, Array[Byte])]
    val qa = Pipelines.streamingMediaNearDedup(
        wavs.toDF().toDF("doc_id", "ts", "payload"),
        "doc_id", "ts", "payload",
        watermark = "0 seconds", verdictWindow = "1 minute",
        stateRetention = java.time.Duration.ofHours(1),
        hash = graft.functions.AudioHash.audiohash)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("media_dedup_wav").start()
    try {
      wavs.addData(
        (1L, ts(1), graft.queries.MediaQ.envelopeWav(5, 8000)),
        (3L, ts(2), graft.queries.MediaQ.envelopeWav(606, 8000)))
      qa.processAllAvailable()
      wavs.addData((2L, ts(3), graft.queries.MediaQ.envelopeWav(5, 16000))) // re-encode of 1
      qa.processAllAvailable()
      wavs.addData((99L, ts(120), graft.queries.MediaQ.envelopeWav(997, 8000)))
      qa.processAllAvailable()
      wavs.addData((100L, ts(121), graft.queries.MediaQ.envelopeWav(996, 8000)))
      qa.processAllAvailable()
      val got = spark.table("media_dedup_wav").select("doc_id").as[Long].collect().toSet
      assert(got.contains(1L) && got.contains(3L), s"original/unrelated clip dropped: $got")
      assert(!got.contains(2L), s"cross-rate re-encode kept: $got")
    } finally qa.stop()
  }

  test("stream_video_near_dedup: a streamed re-cut corpus yields exactly the batch videoNearDups pairs, across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Multimodal
    import graft.queries.MediaQ.sceneJpeg

    // the q66 corpus shape at toy scale: 3-frame MJPEG clips, every
    // 5th a RE-CUT of clip id-4 (two shared frames reordered + one
    // new), one garbage payload (zero frame hashes, routed out)
    def clip(id: Long): Array[Byte] =
      if (id == 7) Array[Byte](0x42, 0x41, 0x44)
      else if (id % 5 == 4) {
        val b = id - 4
        sceneJpeg(b * 3 + 2, 64, 48) ++ sceneJpeg(b * 3 + 1, 64, 48) ++
          sceneJpeg(1000000L + id, 64, 48)
      } else
        sceneJpeg(id * 3, 64, 48) ++ sceneJpeg(id * 3 + 1, 64, 48) ++
          sceneJpeg(id * 3 + 2, 64, 48)
    val n = 20L
    val batchRows = spark.range(n).as[Long]
      .map(id => Multimodal.MediaRow(id, "mjpeg", 64, 48, clip(id)))
    val want = Multimodal.videoNearDups(batchRows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "batch oracle produced no pairs — corpus broken")

    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = Pipelines.streamingVideoNearDedup(
        in.toDF().toDF("doc_id", "ts", "payload"),
        "doc_id", "ts", "payload",
        watermark = "0 seconds", verdictWindow = "1 hour",
        stateRetention = java.time.Duration.ofHours(2))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("video_dedup_out").start()
    try {
      // bases and re-cuts arrive in DIFFERENT micro-batches: every
      // cross-batch match must come from bucket STATE, not intra-batch
      in.addData((0L until n).filter(_ % 5 != 4).map(id => (id, ts(1), clip(id))): _*)
      q.processAllAvailable()
      in.addData((0L until n).filter(_ % 5 == 4).map(id => (id, ts(2), clip(id))): _*)
      q.processAllAvailable()
      // two far-future rows push the watermark past the verdict window
      in.addData((900L, ts(600), clip(0)))
      q.processAllAvailable()
      in.addData((901L, ts(601), clip(1)))
      q.processAllAvailable()
      val got = spark.table("video_dedup_out")
        .select("id_a", "id_b", "matching_frames")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter { case (a, b, _) => a < 900 && b < 900 } // window-closers excluded
        .toSet
      assert(got == want,
        s"stream/batch video pair mismatch:\n missing=${(want -- got).take(5)}\n extra=${(got -- want).take(5)}")
    } finally q.stop()
  }

  test("stream_static_join: batch-derived sampling rates rebalance a live stream deterministically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rates = Seq(("src0", 100L), ("src1", 0L)).toDF("source", "rate")
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamingSourceRebalance(
        in.toDF().toDF("doc_id", "source"), rates, "doc_id", "source")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("rebalance_out").start()
    try {
      in.addData((1L, "src0"), (2L, "src0"), (3L, "src1"), (4L, "src1"))
      q.processAllAvailable()
      val got = spark.table("rebalance_out").select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L)) // rate 100 keeps all, rate 0 keeps none
      // deterministic md5 selection: identical to the batch-side rule
      val batchKept = Seq(1L, 2L).filter { id =>
        val h = BigInt(java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).take(8).map("%02x".format(_)).mkString.take(15), 16)
        (h % 100).toLong < 100L
      }.toSet
      assert(got == batchKept)
    } finally q.stop()
  }

  test("stream_datagen: rate-source generator produces deterministic payloads") {
    val q = Pipelines.dataGenStream(spark, rowsPerSecond = 500)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("datagen_out").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("datagen_out").isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
      }
      import spark.implicits._
      val rows = spark.table("datagen_out").select("id", "payload").as[(Long, String)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (id, payload) =>
        assert(payload.length == 64)
        assert(payload.forall(c => c >= 32 && c < 127))
        // deterministic: same formula as MiscQ.q23
        val expect = (0 until 64).map(i => (32 + ((id * 31 + i * 17) % 95)).toChar).mkString
        assert(payload == expect)
      }
    } finally q.stop()
  }

  // ---- maintained per-group aggregate over a changelog ----

  import graft.streaming.Pipelines.{AggChange, GroupAgg}

  /** Drain `batches` through cdcAggStream one micro-batch at a time,
    * tracking the LATEST emission per group (each emission is the
    * group's full current state, so latest-wins is the sink
    * contract — exactly how an upsert sink consumes a retract
    * stream). Returns the final live snapshot. */
  private def runCdcAgg(name: String, batches: Seq[Seq[AggChange]]): Map[String, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AggChange]
    // each emission is the group's full current state, so the sink
    // contract is latest-batch-wins per group — track it with explicit
    // batch ids (a memory-sink collect has no reliable cross-batch
    // row order to lean on)
    val latest = scala.collection.mutable.Map.empty[String, (Long, (Long, Long))]
    val q = Pipelines.cdcAggStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupAgg], id: Long) =>
        val rows = df.collect()
        latest.synchronized {
          rows.foreach { g =>
            if (!latest.get(g.grp).exists(_._1 > id))
              latest(g.grp) = (id, (g.live_cnt, g.live_sum))
          }
        }
      }
      .queryName(name).start()
    try {
      batches.foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
      latest.synchronized {
        latest.view.mapValues(_._2).toMap.filter(_._2._1 > 0L)
      }
    } finally q.stop()
  }

  test("stream_cdc_moments: signed three-moment fold — group moves, retract-to-zero, dealt replay == batch q113") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Pipelines.GroupMoments
    def run(name: String, batches: Seq[Seq[AggChange]]): Map[String, (Long, Long, Long)] = {
      val in = MemoryStream[AggChange]
      val latest = scala.collection.mutable.Map.empty[String, (Long, (Long, Long, Long))]
      val q = Pipelines.cdcMomentsStream(in.toDS())
        .writeStream.outputMode(OutputMode.Append)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupMoments], id: Long) =>
          val rows = df.collect()
          latest.synchronized {
            rows.foreach { g =>
              if (!latest.get(g.grp).exists(_._1 > id))
                latest(g.grp) = (id, (g.live_cnt, g.live_sum, g.live_sumsq))
            }
          }
        }
        .queryName(name).start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        latest.synchronized(latest.view.mapValues(_._2).toMap.filter(_._2._1 > 0L))
      } finally q.stop()
    }
    // hand fold: value-changing move A→B, delete; sumsq must track
    val out = run("cdc_moments_hand", Seq(
      Seq(AggChange("+I", "A", 3), AggChange("+I", "A", 4), AggChange("+I", "B", 5)),
      Seq(AggChange("-U", "A", 4), AggChange("+U", "B", 6)),
      Seq(AggChange("-D", "B", 5))))
    assert(out == Map("A" -> ((1L, 3L, 9L)), "B" -> ((1L, 6L, 36L))))

    // dealt replay of the exact q113 changelog == the batch triple
    import org.apache.spark.sql.functions.{expr, concat, lit}
    val o = graft.sources.Tables.orders(spark, sfDir)
    val b0 = expr("cast(round((o_totalprice - 10) * 100) as bigint) div 10000")
    val b1 = expr("cast(round(o_totalprice * 100) as bigint) div 10000")
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    def ev(kind: String, b: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column) =
      Seq(lit(kind).as("op"), grp.as("grp"), b.cast("long").as("value"))
    val changelog =
      o.select(ev("+I", b0, $"o_orderpriority"): _*)
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", b0, $"o_orderpriority"): _*))
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", b1, grp1): _*))
        .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", b1, grp1): _*))
        .as[AggChange].collect().toSeq
    val shuffled = new scala.util.Random(67).shuffle(changelog.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    })
    val expected = SparkEntry.queries("q113_cdc_moments")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    CachePool.drain()
    assert(run("cdc_moments_parity", batches) === expected)
  }

  test("stream_cdc_bivar: six-sum signed fold — dealt replay of the q114 changelog == the batch sextuple") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{expr, concat, lit, col}
    import graft.streaming.Pipelines.{BivarChange, GroupBivar}
    val o = graft.sources.Tables.orders(spark, sfDir)
    val x0 = expr("cast(round((o_totalprice - 10) * 100) as bigint) div 10000")
    val x1 = expr("cast(round(o_totalprice * 100) as bigint) div 10000")
    val y = (col("o_custkey") % 1000).cast("long")
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    def ev(kind: String, x: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column) =
      Seq(lit(kind).as("op"), grp.as("grp"), x.as("x"), y.as("y"))
    val changelog =
      o.select(ev("+I", x0, $"o_orderpriority"): _*)
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", x0, $"o_orderpriority"): _*))
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", x1, grp1): _*))
        .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", x1, grp1): _*))
        .as[BivarChange].collect().toSeq
    val shuffled = new scala.util.Random(71).shuffle(changelog.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    })
    val expected = SparkEntry.queries("q114_cdc_bivar")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    CachePool.drain()
    val in = MemoryStream[BivarChange]
    val latest = scala.collection.mutable.Map.empty[String, (Long, (Long, Long, Long, Long, Long, Long))]
    val q = Pipelines.cdcBivarStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupBivar], id: Long) =>
        val rows = df.collect()
        latest.synchronized {
          rows.foreach { g =>
            if (!latest.get(g.grp).exists(_._1 > id))
              latest(g.grp) = (id, (g.live_cnt, g.sum_x, g.sum_y, g.sum_xy, g.sum_xx, g.sum_yy))
          }
        }
      }
      .queryName("cdc_bivar_parity").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val got = latest.synchronized(
        latest.view.mapValues(_._2).toMap.filter(_._2._1 > 0L))
      assert(got === expected)
    } finally q.stop()
  }

  test("stream_cdc_agg: group-moving updates and retract-to-zero across micro-batch boundaries") {
    // k2 moves A→B inside one batch; k1's move A→C is SPLIT across
    // batches (the -U lands a batch before its +U); k3 is deleted.
    // Group A retracts to zero and must vanish from the snapshot.
    val out = runCdcAgg("cdc_agg_moves", Seq(
      Seq(AggChange("+I", "A", 100), AggChange("+I", "A", 200), AggChange("+I", "B", 50)),
      Seq(AggChange("-U", "A", 200), AggChange("+U", "B", 250), AggChange("-U", "A", 100)),
      Seq(AggChange("+U", "C", 111), AggChange("-D", "B", 50))))
    // B: +I 50, +U 250 (k2's move in), -D 50 (k3 deleted) → (1, 250)
    assert(out == Map("B" -> ((1L, 250L)), "C" -> ((1L, 111L))))
  }

  test("stream_cdc_agg: multi-batch shuffled replay == batch retractAgg (commutativity)") {
    import spark.implicits._
    // deterministic pseudo-random changelog: 60 keys, each +I then a
    // chain of group-moving updates, some ending in -D — then the
    // ROWS are dealt round-robin into 4 micro-batches, so almost
    // every key's history straddles batch boundaries out of order
    val rnd = new scala.util.Random(41)
    val changes = (0 until 60).flatMap { k =>
      val g0 = s"g${rnd.nextInt(5)}"
      var cur = (g0, (k + 1) * 10L)
      val steps = scala.collection.mutable.ArrayBuffer(AggChange("+I", cur._1, cur._2))
      (0 until rnd.nextInt(4)).foreach { _ =>
        val next = (s"g${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)
        steps += AggChange("-U", cur._1, cur._2)
        steps += AggChange("+U", next._1, next._2)
        cur = next
      }
      if (rnd.nextInt(3) == 0) steps += AggChange("-D", cur._1, cur._2)
      steps
    }
    val batches = (0 until 4).map(i => changes.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    }.toSeq)
    val streamed = runCdcAgg("cdc_agg_replay", batches)
    val batch = graft.operators.Cdc.retractAgg(
        changes.toDF("op", "grp", "value"), col("op"), col("grp"), col("value"))
      .as[(String, Long, Long)].collect()
      .map { case (g, c, s) => g -> ((c, s)) }.toMap
    // in-memory ground truth localizes a mismatch to one side
    val truth = changes.groupBy(_.grp).view.mapValues(_.foldLeft((0L, 0L)) { (acc, c) =>
      val s = if (c.op == "+I" || c.op == "+U") 1L else -1L
      (acc._1 + s, acc._2 + s * c.value)
    }).toMap.filter(_._2._1 > 0)
    assert(batch == truth, "batch retractAgg diverged from the hand fold")
    assert(streamed == truth, "streamed fold diverged from the hand fold")
    assert(batch.nonEmpty)
  }

  test("stream_cdc_minmax: retracting the current minimum falls back to the next live value") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Pipelines.GroupMinMax
    val in = MemoryStream[AggChange]
    val latest = scala.collection.mutable.Map.empty[String, (Long, GroupMinMax)]
    val qq = Pipelines.cdcMinMaxStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupMinMax], id: Long) =>
        df.collect().foreach { g =>
          latest.synchronized {
            if (!latest.get(g.grp).exists(_._1 > id)) latest(g.grp) = (id, g)
          }
        }
      }.queryName("cdc_minmax").start()
    try {
      // batch 1: A = {3, 5, 9}; duplicate value 3 via a second key
      in.addData(AggChange("+I", "A", 3), AggChange("+I", "A", 5),
        AggChange("+I", "A", 9), AggChange("+I", "A", 3))
      qq.processAllAvailable()
      assert(latest.synchronized(latest("A")._2) === GroupMinMax("A", 4, 3, 9))
      // batch 2: retract ONE of the 3s → min stays 3; retract the max
      in.addData(AggChange("-D", "A", 3), AggChange("-D", "A", 9))
      qq.processAllAvailable()
      assert(latest.synchronized(latest("A")._2) === GroupMinMax("A", 2, 3, 5))
      // batch 3: retract the last 3 → min falls back to 5
      in.addData(AggChange("-D", "A", 3))
      qq.processAllAvailable()
      assert(latest.synchronized(latest("A")._2) === GroupMinMax("A", 1, 5, 5))
      // batch 4: retract everything → (0,0,0) retraction signal
      in.addData(AggChange("-D", "A", 5))
      qq.processAllAvailable()
      assert(latest.synchronized(latest("A")._2) === GroupMinMax("A", 0, 0, 0))
    } finally qq.stop()
  }

  test("stream_cdc_minmax: shuffled multi-batch replay equals the live-set min/max") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Pipelines.GroupMinMax
    // reuse the q75-shaped random changelog from the cdc_agg replay
    val rnd = new scala.util.Random(53)
    val changes = (0 until 50).flatMap { k =>
      val g0 = s"g${rnd.nextInt(4)}"
      var cur = (g0, (k % 13) * 10L + 7)
      val steps = scala.collection.mutable.ArrayBuffer(AggChange("+I", cur._1, cur._2))
      (0 until rnd.nextInt(3)).foreach { _ =>
        val next = (s"g${rnd.nextInt(4)}", (rnd.nextInt(40) * 3).toLong)
        steps += AggChange("-U", cur._1, cur._2)
        steps += AggChange("+U", next._1, next._2)
        cur = next
      }
      if (rnd.nextInt(4) == 0) steps += AggChange("-D", cur._1, cur._2)
      steps
    }
    val batches = (0 until 3).map(i => changes.zipWithIndex.collect {
      case (c, j) if j % 3 == i => c
    }.toSeq)
    val in = MemoryStream[AggChange]
    val latest = scala.collection.mutable.Map.empty[String, (Long, GroupMinMax)]
    val q = Pipelines.cdcMinMaxStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupMinMax], id: Long) =>
        df.collect().foreach { g =>
          latest.synchronized {
            if (!latest.get(g.grp).exists(_._1 > id)) latest(g.grp) = (id, g)
          }
        }
      }.queryName("cdc_minmax_replay").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val got = latest.synchronized(
        latest.view.mapValues(_._2).toMap.filter(_._2.live_cnt > 0))
      // ground truth: signed multiset fold per group
      val truth = changes.groupBy(_.grp).view.mapValues { cs =>
        val mult = scala.collection.mutable.Map.empty[Long, Long]
        cs.foreach { c =>
          val s = if (c.op == "+I" || c.op == "+U") 1L else -1L
          mult(c.value) = mult.getOrElse(c.value, 0L) + s
        }
        val live = mult.filter(_._2 > 0L)
        (live.values.sum, if (live.isEmpty) 0L else live.keys.min,
          if (live.isEmpty) 0L else live.keys.max)
      }.toMap.filter(_._2._1 > 0)
      assert(got.map { case (g, m) => g -> ((m.live_cnt, m.live_min, m.live_max)) } === truth)
      assert(truth.nonEmpty)
    } finally q.stop()
  }

  test("stream_cdc_agg: an unknown row_kind fails loudly, not as a silent skip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AggChange]
    val q = Pipelines.cdcAggStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cdc_agg_bad").start()
    try {
      in.addData(AggChange("+X", "A", 1))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("unknown row_kind") ||
        String.valueOf(e.getCause).contains("unknown row_kind"))
    } finally q.stop()
  }
}
