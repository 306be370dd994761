package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcDistinctStream
import graft.streaming.CdcDistinctStream.{GroupDistinct, PartialChange}
import graft.streaming.Pipelines.AggChange

/** Retractable DISTINCT aggregation (SURVEY §2 q91_cdc_distinct /
  * stream_cdc_distinct): the maintained count(DISTINCT)/sum(DISTINCT)
  * over a +I/+U/-U/-D changelog, single-stage and via Flink's
  * split-distinct two-stage rewrite. */
class CdcDistinctSpec extends AnyFunSuite {
  import TestSpark._

  /** Signed multiset ground truth: per group, the live distinct view. */
  private def truth(changes: Seq[AggChange]): Map[String, (Long, Long, Long)] =
    changes.groupBy(_.grp).view.mapValues { cs =>
      val mult = scala.collection.mutable.Map.empty[Long, Long]
      cs.foreach { c =>
        val s = if (c.op == "+I" || c.op == "+U") 1L else -1L
        mult(c.value) = mult.getOrElse(c.value, 0L) + s
      }
      val live = mult.filter(_._2 > 0L)
      (live.values.sum, live.size.toLong, live.keys.sum)
    }.toMap.filter(_._2._1 > 0)

  /** Deal `batches` into the given stream function, return the latest
    * emission per group (batch-id ordered, the idempotent-sink view). */
  private def runStream(name: String, batches: Seq[Seq[AggChange]],
      f: org.apache.spark.sql.Dataset[AggChange] => org.apache.spark.sql.Dataset[GroupDistinct])
      : Map[String, GroupDistinct] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AggChange]
    val latest = scala.collection.mutable.Map.empty[String, (Long, GroupDistinct)]
    val q = f(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupDistinct], id: Long) =>
        df.collect().foreach { g =>
          latest.synchronized {
            if (!latest.get(g.grp).exists(_._1 > id)) latest(g.grp) = (id, g)
          }
        }
      }.queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      latest.synchronized(latest.view.mapValues(_._2).toMap)
    } finally q.stop()
  }

  test("stream_cdc_distinct: retracting ONE holder of a shared value keeps it distinct; the LAST holder removes it") {
    val out = runStream("cdc_distinct_hand", Seq(
      // two entities hold value 3, one holds 5
      Seq(AggChange("+I", "A", 3), AggChange("+I", "A", 3), AggChange("+I", "A", 5)),
      // retract one 3-holder: live 2, distinct still {3,5}
      Seq(AggChange("-D", "A", 3)),
      // value move 5 → 3: distinct shrinks to {3}
      Seq(AggChange("-U", "A", 5), AggChange("+U", "A", 3)),
      // retract both: (0,0,0) DELETE signal
      Seq(AggChange("-D", "A", 3), AggChange("-D", "A", 3))),
      CdcDistinctStream.distinctAggStream)
    assert(out("A") === GroupDistinct("A", 0, 0, 0))
    // replay the first three steps alone to pin the intermediate views
    val mid = runStream("cdc_distinct_hand2", Seq(
      Seq(AggChange("+I", "A", 3), AggChange("+I", "A", 3), AggChange("+I", "A", 5)),
      Seq(AggChange("-D", "A", 3))),
      CdcDistinctStream.distinctAggStream)
    assert(mid("A") === GroupDistinct("A", 2, 2, 8))
  }

  test("stream_cdc_distinct: cross-batch disorder (retraction before its insert) settles as debt") {
    val out = runStream("cdc_distinct_debt", Seq(
      Seq(AggChange("-U", "A", 7)),           // debt: -1 holders of 7
      Seq(AggChange("+I", "A", 7), AggChange("+I", "A", 7)),
      Seq(AggChange("+U", "A", 9))),
      CdcDistinctStream.distinctAggStream)
    // settled: one live 7 (two inserts minus the early retraction), one 9
    assert(out("A") === GroupDistinct("A", 2, 2, 16))
  }

  test("stream_cdc_distinct: unknown row_kind fails loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[AggChange]
    val q = CdcDistinctStream.distinctAggStream(in.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("cdc_distinct_bad").start()
    try {
      in.addData(AggChange("+X", "A", 1))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("unknown row_kind") || Option(e.getCause)
        .exists(_.toString.contains("unknown row_kind")))
    } finally q.stop()
  }

  /** The q75-shaped randomized changelog: entities insert, take
    * group/value-moving updates, sometimes die. Values coarse (×10
    * grid) so cross-entity sharing actually occurs. */
  private def randomChangelog(seed: Int, n: Int): Seq[AggChange] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).flatMap { k =>
      var cur = (s"g${rnd.nextInt(4)}", (rnd.nextInt(12) * 10L) + 5)
      val steps = scala.collection.mutable.ArrayBuffer(AggChange("+I", cur._1, cur._2))
      (0 until rnd.nextInt(3)).foreach { _ =>
        val next = (s"g${rnd.nextInt(4)}", (rnd.nextInt(12) * 10L) + 5)
        steps += AggChange("-U", cur._1, cur._2)
        steps += AggChange("+U", next._1, next._2)
        cur = next
      }
      if (rnd.nextInt(3) == 0) steps += AggChange("-D", cur._1, cur._2)
      steps
    }
  }

  test("stream_cdc_distinct: shuffled multi-batch replay equals the live-set distinct view") {
    val changes = randomChangelog(91, 60)
    val batches = (0 until 4).map(i => changes.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    }.toSeq)
    val got = runStream("cdc_distinct_replay", batches,
      CdcDistinctStream.distinctAggStream)
      .filter(_._2.live_cnt > 0)
      .map { case (g, d) => g -> ((d.live_cnt, d.distinct_cnt, d.distinct_sum)) }
    val t = truth(changes)
    assert(got === t)
    // the corpus must actually share values, or distinct degenerates
    assert(t.exists { case (_, (l, c, _)) => c < l })
  }

  test("stream_cdc_distinct_split: partial→merge composition equals single-stage for 1 and 4 buckets") {
    val changes = randomChangelog(92, 60)
    val batches = (0 until 3).map(i => changes.zipWithIndex.collect {
      case (c, j) if j % 3 == i => c
    }.toSeq)
    val t = truth(changes)
    Seq(1, 4).foreach { b =>
      val got = runStream(s"cdc_distinct_split_$b", batches,
        (ds: org.apache.spark.sql.Dataset[AggChange]) =>
          CdcDistinctStream.distinctMergeStream(
            CdcDistinctStream.distinctPartialStream(ds, b)))
        .filter(_._2.live_cnt > 0)
        .map { case (g, d) => g -> ((d.live_cnt, d.distinct_cnt, d.distinct_sum)) }
      assert(got === t, s"split-distinct with $b buckets diverged from the hand fold")
    }
  }

  test("stream_cdc_distinct_split: stage-1 changelog grammar — -U images match the last emission, fan-out bounded by touched shards") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val changes = randomChangelog(93, 40)
    val batches = (0 until 3).map(i => changes.zipWithIndex.collect {
      case (c, j) if j % 3 == i => c
    }.toSeq)
    val in = MemoryStream[AggChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, PartialChange)]
    val q = CdcDistinctStream.distinctPartialStream(in.toDS(), 4)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[PartialChange], id: Long) =>
        val rows = df.collect()
        buf.synchronized(rows.foreach(r => buf += ((id, r))))
      }.queryName("cdc_distinct_grammar").start()
    try {
      val all = scala.collection.mutable.ArrayBuffer.empty[(Int, PartialChange)]
      batches.zipWithIndex.foreach { case (b, step) =>
        in.addData(b: _*); q.processAllAvailable()
        val drained = buf.synchronized { val v = buf.toVector; buf.clear(); v }
        val touched = b.map(c => (c.grp, java.lang.Math.floorMod(c.value, 4L).toInt)).toSet
        assert(drained.size <= 2 * touched.size,
          s"stage-1 fan-out ${drained.size} exceeded 2x the ${touched.size} touched shards in step $step")
        drained.sortBy(_._1).foreach(p => all += ((step, p._2)))
      }
      // per-shard grammar: ops ordered by (step, opRank) — within one
      // batch a shard's -U precedes its +U under the shared rank rule
      all.groupBy(p => (p._2.grp, p._2.bucket)).foreach { case (_, evs) =>
        var last: Option[(Long, Long, Long)] = None
        evs.sortBy(e => (e._1, graft.operators.Cdc.opRank(e._2.op))).map(_._2).foreach { p =>
          p.op match {
            case "+I" =>
              assert(last.isEmpty, s"+I over a live image: $p")
              last = Some((p.live_p, p.cnt_p, p.sum_p))
            case "-U" =>
              assert(last.contains((p.live_p, p.cnt_p, p.sum_p)),
                s"-U image ${(p.live_p, p.cnt_p, p.sum_p)} != last emitted $last")
              last = None
            case "+U" =>
              assert(last.isEmpty, s"+U without its -U: $p")
              last = Some((p.live_p, p.cnt_p, p.sum_p))
            case "-D" =>
              assert(last.contains((p.live_p, p.cnt_p, p.sum_p)),
                s"-D image ${(p.live_p, p.cnt_p, p.sum_p)} != last emitted $last")
              last = None
            case other => fail(s"unexpected op $other")
          }
        }
      }
    } finally q.stop()
  }

  test("q91 batch twin: countDistinct differs from plain count on the shared-bucket corpus") {
    val df = SparkEntry.queries("q91_cdc_distinct")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // distinct over $10k buckets must actually collapse duplicates
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)),
      "distinct_cnt == live_cnt everywhere — the bucket coarsening is not sharing values")
  }
}
