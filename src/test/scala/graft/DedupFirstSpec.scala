package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupFirstStream
import graft.streaming.DedupFirstStream.FirstDelta

/** Event-time keep-FIRST dedup as a retract stream (q97 /
  * stream_dedup_first) + Flink-style idle-state TTL: hand grammar
  * (late-OLDER displaces, late-newer silent), per-key strictly-
  * increasing seq stamps, dealt-replay materialization == batch q97,
  * and the TTL lifecycle — silent expiry, -D expiry, resurrection
  * with a fresh +I, non-idle keys untouched. */
class DedupFirstSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }
  private def sec(n: Long): Timestamp = us(n * 1000000L)

  // rows: (user_id, event_id, ts, event_type, value)
  private type Ev = (Long, Long, Timestamp, String, Double)

  test("dedup_first: +I on first, -U/+U on LATE OLDER, silence on newer; seq strictly increasing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = DedupFirstStream.dedupFirstStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
        watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupfirst_hand").start()
    try {
      in.addData(Seq[Ev](
        // key 1: three rows in one batch — only the MINIMUM emits
        (1L, 12L, us(3000000L), "error", 3.0),
        (1L, 11L, us(2000000L), "click", 2.0),
        (1L, 13L, us(5000000L), "purchase", 4.0)))
      q.processAllAvailable()
      in.addData(Seq[Ev](
        // key 1: LATE row OLDER than the view — displaces it;
        // key 2 first appearance
        (1L, 10L, us(1000000L), "view", 1.0),
        (2L, 20L, us(1000000L), "view", 9.0)))
      q.processAllAvailable()
      in.addData(Seq[Ev](
        // key 1: newer than the view — must emit nothing
        (1L, 14L, us(4000000L), "signup", 7.0)))
      q.processAllAvailable()
      val got = spark.table("dedupfirst_hand")
        .select($"op", $"key", $"id", $"cents", $"seq")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got.sortBy(r => (r._2, r._5)) === Seq(
        ("+I", 1L, 11L, 200L, 1L),
        ("-U", 1L, 11L, 200L, 2L),
        ("+U", 1L, 10L, 100L, 3L),
        ("+I", 2L, 20L, 900L, 1L)).sortBy(r => (r._2, r._5)))
    } finally q.stop()
  }

  test("dedup_first: dealt replay materializes to batch q97, retract grammar well-formed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(97)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 5).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 5 == i => x
    })
    val in = MemoryStream[Ev]
    val q = DedupFirstStream.dedupFirstStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
        watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedupfirst_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      val deltas = spark.table("dedupfirst_parity")
        .select($"op", $"key", $"id", $"us", $"tp", $"cents", $"seq")
        .as[FirstDelta].collect().toSeq

      // grammar per key in seq order: one +I opener, -U/+U adjacent
      // pairs, -U image == the view it retracts, view strictly falling
      deltas.groupBy(_.key).foreach { case (k, ds) =>
        val ordered = ds.sortBy(_.seq)
        assert(ordered.map(_.seq) === (1L to ordered.size.toLong),
          s"key $k: seq must be gapless from 1")
        assert(ordered.head.op === "+I", s"key $k must open with +I")
        assert(ordered.count(_.op == "+I") === 1, s"key $k: exactly one +I")
        ordered.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.op == "-U") assert(a.op != "-U" && a.id === b.id && a.cents === b.cents,
              s"key $k: -U image must match the view it retracts")
            if (b.op == "+U") assert(a.op === "-U" &&
              (b.us < a.us || (b.us == a.us && b.id < a.id)),
              s"key $k: every +U follows its -U and strictly lowers the view")
          case _ => ()
        }
      }

      val streamedView = deltas.groupBy(_.key).map { case (k, ds) =>
        val last = ds.maxBy(_.seq)
        assert(last.op != "-U")
        (k, last.id, last.us, last.tp, last.cents)
      }.toSet
      val batch = SparkEntry.queries("q97_dedup_first")(spark, sfDir)
        .select($"user_id", $"event_id",
          org.apache.spark.sql.functions.unix_micros($"ts"), $"event_type", $"cents")
        .as[(Long, Long, Long, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamedView === batch)
    } finally q.stop()
  }

  test("dedup_first TTL: idle key expires (silent or -D), resurrects with a fresh +I; live keys untouched") {
    import spark.implicits._
    for (emitsDelete <- Seq(false, true)) {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[Ev]
      val q = DedupFirstStream.dedupFirstStream(
          in.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
          watermark = "10 seconds",
          idleTtlUs = Some(50L * 1000000L), // 50 s idle horizon
          expireEmitsDelete = emitsDelete)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"dedupfirst_ttl_$emitsDelete").start()
      try {
        // b1: both keys appear; key 1 then goes idle forever
        in.addData(Seq[Ev]((1L, 10L, sec(100), "view", 1.0),
                           (2L, 20L, sec(100), "view", 2.0)))
        q.processAllAvailable() // wm after b1: 90 s; key1 timer at 150 s
        // b2: only key 2 speaks — wm rises to 290 s but the batch ran at 90 s
        in.addData(Seq[Ev]((2L, 21L, sec(300), "view", 3.0)))
        q.processAllAvailable()
        // b3 runs with wm 290 s > 150 s → key 1 expires HERE
        in.addData(Seq[Ev]((2L, 22L, sec(400), "view", 4.0)))
        q.processAllAvailable()
        // b4: key 1 resurrects — state was dropped, so this is a fresh
        // +I (seq restarts) even though id 10 @100 s was already published:
        // the documented TTL approximation, exactly Flink's. Key 2
        // speaks too, refreshing its idle clock past the final
        // watermark (Spark's trailing no-data batch fires timers the
        // last data batch armed — key 2 must stay ahead of it).
        in.addData(Seq[Ev]((1L, 15L, sec(500), "view", 5.0),
                           (2L, 23L, sec(500), "view", 6.0)))
        q.processAllAvailable()
        val got = spark.table(s"dedupfirst_ttl_$emitsDelete")
          .select($"op", $"key", $"id", $"seq")
          .as[(String, Long, Long, Long)].collect().toSeq
        // seq restarts at resurrection, so compare as a multiset
        val key1 = got.filter(_._2 == 1L)
        if (emitsDelete)
          assert(key1.sortBy(r => (r._3, r._1)) === Seq(
            ("+I", 1L, 10L, 1L), ("-D", 1L, 10L, 2L), ("+I", 1L, 15L, 1L))
            .sortBy(r => (r._3, r._1)))
        else
          assert(key1.map(r => (r._1, r._3)).sorted === Seq(("+I", 10L), ("+I", 15L)))
        // key 2 never idles past TTL: exactly its opening +I, no expiry
        assert(got.filter(_._2 == 2L) === Seq(("+I", 2L, 20L, 1L)))
      } finally q.stop()
    }
  }
}
