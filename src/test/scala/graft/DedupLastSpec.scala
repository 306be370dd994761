package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupLastStream
import graft.streaming.DedupLastStream.LastDelta
import graft.streaming.Pipelines
import graft.streaming.Pipelines.AggChange

/** Keep-last-row dedup as a retract stream (q96 / stream_dedup_last —
  * the append → changelog conversion): hand grammar, late-older-row
  * silence, per-batch ≤2-emission bound, dealt-replay materialization
  * == batch q96, and composition into cdcAggStream (the changelog it
  * emits IS valid input for the maintained-aggregate family). */
class DedupLastSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, event_type, value)
  private type Ev = (Long, Long, Timestamp, String, Double)

  private def start(name: String, in: MemoryStream[Ev]) = {
    DedupLastStream.dedupLastStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("dedup_last: +I on first, -U/+U on newer, SILENCE on late-older, one retract pair per touched key per batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("deduplast_hand", in)
    try {
      in.addData(Seq[Ev](
        // key 1: three rows in one batch — only the max emits
        (1L, 10L, us(1000000L), "view", 1.0),
        (1L, 11L, us(2000000L), "click", 2.0),
        (1L, 12L, us(3000000L), "error", 3.0)))
      q.processAllAvailable()
      in.addData(Seq[Ev](
        // key 1: newer row displaces; key 2 first appearance
        (1L, 13L, us(5000000L), "purchase", 4.0),
        (2L, 20L, us(1000000L), "view", 9.0)))
      q.processAllAvailable()
      in.addData(Seq[Ev](
        // key 1: LATE row older than the view — must emit nothing
        (1L, 14L, us(4000000L), "signup", 7.0)))
      q.processAllAvailable()
      val got = spark.table("deduplast_hand")
        .select($"op", $"key", $"id", $"cents")
        .as[(String, Long, Long, Long)].collect().toSeq
      assert(got.sortBy(r => (r._2, r._3, r._1)) === Seq(
        ("+I", 1L, 12L, 300L),
        ("-U", 1L, 12L, 300L),
        ("+U", 1L, 13L, 400L),
        ("+I", 2L, 20L, 900L)).sortBy(r => (r._2, r._3, r._1)))
    } finally q.stop()
  }

  test("dedup_last: dealt replay materializes to batch q96, grammar well-formed, and the changelog FEEDS cdcAggStream to the batch aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(96)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 5).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 5 == i => x
    })
    val in = MemoryStream[Ev]
    val q = DedupLastStream.dedupLastStream(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
        watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduplast_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      val deltas = spark.table("deduplast_parity")
        .select($"op", $"key", $"id", $"us", $"tp", $"cents")
        .as[LastDelta].collect().toSeq

      // retract grammar per key: one +I opener, then -U/+U pairs whose
      // -U image is exactly the view it retracts, view strictly rising
      deltas.groupBy(_.key).foreach { case (k, ds) =>
        // the view only moves forward, so (us, -U-before-+) recovers
        // emission order (a -U carries the retracted image's us)
        val ordered = ds.sortBy(d => (d.us, d.id, d.op match { case "-U" => 1; case _ => 0 }))
        assert(ordered.head.op === "+I", s"key $k must open with +I")
        assert(ordered.count(_.op == "+I") === 1, s"key $k: exactly one +I")
        ordered.sliding(2).foreach {
          case Seq(a, b) =>
            if (b.op == "-U") assert(a.op != "-U" && a.id === b.id && a.cents === b.cents,
              s"key $k: -U image must match the view it retracts")
            if (b.op == "+U") assert(a.op === "-U",
              s"key $k: every +U must follow its -U")
          case _ => ()
        }
      }

      // materialized view == batch q96
      val streamedView = deltas.groupBy(_.key).map { case (k, ds) =>
        val last = ds.filter(_.op != "-U").maxBy(d => (d.us, d.id))
        (k, last.id, last.us, last.tp, last.cents)
      }.toSet
      val batch = SparkEntry.queries("q96_dedup_last")(spark, sfDir)
        .select($"user_id", $"event_id",
          org.apache.spark.sql.functions.unix_micros($"ts"), $"event_type", $"cents")
        .as[(Long, Long, Long, String, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamedView === batch)

      // composition: the delta stream is valid cdcAggStream input —
      // fold (grp = event_type, value = cents) == batch agg over the view
      val in2 = MemoryStream[AggChange]
      val latest = scala.collection.mutable.Map.empty[String, (Long, (Long, Long))]
      val q2 = Pipelines.cdcAggStream(in2.toDS())
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[Pipelines.GroupAgg], id: Long) =>
          df.collect().foreach { g =>
            latest.synchronized {
              if (!latest.get(g.grp).exists(_._1 > id))
                latest(g.grp) = (id, (g.live_sum, g.live_cnt))
            }
          }
        }.queryName("deduplast_agg").start()
      try {
        deltas.grouped(500).foreach { g =>
          in2.addData(g.map(d => AggChange(d.op, d.tp, d.cents)).toIndexedSeq)
          q2.processAllAvailable()
        }
        val perGrp = latest.synchronized(
          latest.view.mapValues(_._2).toMap.filter(_._2 != ((0L, 0L))))
        val expected = batch.groupBy(_._4).map { case (tp, rows) =>
          tp -> ((rows.toSeq.map(_._5).sum, rows.size.toLong))
        }
        assert(perGrp === expected)
      } finally q2.stop()
    } finally q.stop()
  }
}
