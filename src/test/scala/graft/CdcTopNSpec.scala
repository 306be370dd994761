package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcTopNStream
import graft.streaming.CdcTopNStream.{RankChange, RankDelta}

/** Changelog Top-N (retractable ranking): the leader's retraction
  * must surface the next-best LIVE entity (runner-up buffer, or the
  * underflow scan when the buffer is exhausted), insert-only batches
  * stay incremental, group moves cross shards, -D images carry the
  * entry-time score, and a dealt replay of the q84 changelog
  * materializes to the batch q84 top-3 exactly — at both the default
  * buffer factor and bufFactor=1 (which forces the scan path). */
class CdcTopNSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String, n: Int, batches: Seq[Seq[RankChange]],
      bufFactor: Int = 4, mode: String = "rownum",
      horizon: Option[Long] = None): Seq[(Long, RankDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[RankChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, RankDelta)]
    val ranked = mode match {
      case "rownum" => CdcTopNStream.topN(in.toDS(), n, bufFactor, horizon)
      case "rank"   => CdcTopNStream.topNRank(in.toDS(), n, dense = false, bufFactor, horizon)
      case "dense"  => CdcTopNStream.topNRank(in.toDS(), n, dense = true, bufFactor, horizon)
    }
    val q = ranked
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RankDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  private def materialize(deltas: Seq[(Long, RankDelta)]): Map[String, Set[Long]] =
    deltas.zipWithIndex
      .groupBy { case ((_, d), _) => (d.grp, d.id) }
      .toSeq
      .collect { case ((g, id), ds) if ds.maxBy { case ((b, _), i) => (b, i) }._1._2.op == "+I" => (g, id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }

  /** every (grp,id)'s delta sequence alternates +I/-D starting live. */
  private def wellFormed(deltas: Seq[(Long, RankDelta)]): Unit =
    deltas.map(_._2).groupBy(d => (d.grp, d.id)).foreach { case (id, ds) =>
      var live = false
      ds.foreach { d =>
        d.op match {
          case "+I" => assert(!live, s"$id: +I while live"); live = true
          case "-D" => assert(live, s"$id: -D while dead"); live = false
          case other => fail(s"$id: unexpected op $other")
        }
      }
    }

  test("cdc_topn: leader retraction surfaces the next-best live entity; demotion; group move crosses shards") {
    val out = run("ctn_hand", 2, Seq(
      // batch 0: four entities, top-2 = {1 (90), 2 (80)}
      Seq(RankChange("+I", "a", 1L, 90.0, 1),
        RankChange("+I", "a", 2L, 80.0, 1),
        RankChange("+I", "a", 3L, 70.0, 1),
        RankChange("+I", "a", 4L, 60.0, 1)),
      // batch 1: the LEADER deletes -> next-best (3 at 70) must
      // surface — served from the runner-up buffer, no scan
      Seq(RankChange("-D", "a", 1L, 90.0, 2)),
      // batch 2: member 2 DEMOTES below everyone -> 4 (60) surfaces
      Seq(RankChange("-U", "a", 2L, 80.0, 3),
        RankChange("+U", "a", 2L, 10.0, 3)),
      // batch 3: insert-only batch beats the current 2nd -> known
      // eviction, incremental path
      Seq(RankChange("+I", "a", 5L, 65.0, 4)),
      // batch 4: entity 3 moves group a -> b (before-image routing)
      Seq(RankChange("-U", "a", 3L, 70.0, 5),
        RankChange("+U", "b", 3L, 70.0, 5))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      RankDelta("+I", "a", 1L, 90.0), RankDelta("+I", "a", 2L, 80.0)))
    assert(byBatch(1L) === Set(
      RankDelta("-D", "a", 1L, 90.0), RankDelta("+I", "a", 3L, 70.0)))
    assert(byBatch(2L) === Set(
      RankDelta("-D", "a", 2L, 80.0), RankDelta("+I", "a", 4L, 60.0)))
    assert(byBatch(3L) === Set(
      RankDelta("+I", "a", 5L, 65.0), RankDelta("-D", "a", 4L, 60.0)))
    // batch 4: on shard a, member 3 dies -> 4 (60) returns; on shard
    // b, 3 is born into an empty top
    assert(byBatch(4L) === Set(
      RankDelta("-D", "a", 3L, 70.0), RankDelta("+I", "a", 4L, 60.0),
      RankDelta("+I", "b", 3L, 70.0)))
    assert(materialize(out) === Map("a" -> Set(5L, 4L), "b" -> Set(3L)))
  }

  test("cdc_topn: -D carries the ENTRY-TIME score image even after a silent in-membership raise") {
    val out = run("ctn_entry", 2, Seq(
      Seq(RankChange("+I", "a", 1L, 90.0, 1),
        RankChange("+I", "a", 2L, 50.0, 1),
        RankChange("+I", "a", 3L, 40.0, 1)),
      // member 2's score raised while a member: NO emission (raises
      // inside the membership are silent by the no-ranking contract)
      Seq(RankChange("-U", "a", 2L, 50.0, 2),
        RankChange("+U", "a", 2L, 85.0, 2)),
      // entity 4 evicts 2... no — 4 at 87 evicts member 2 (now 85):
      // the -D must carry 50.0 (the +I image), NOT 85.0 — an
      // image-matching retract consumer pairs it with the insert
      Seq(RankChange("+I", "a", 4L, 87.0, 3))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      RankDelta("+I", "a", 1L, 90.0), RankDelta("+I", "a", 2L, 50.0)))
    assert(byBatch.getOrElse(1L, Set.empty) === Set.empty[RankDelta],
      "a silent raise inside the membership must not emit")
    assert(byBatch(2L) === Set(
      RankDelta("+I", "a", 4L, 87.0), RankDelta("-D", "a", 2L, 50.0)))
    wellFormed(out)
  }

  test("cdc_topn bufFactor=1: buffer underflow pays the scan and still promotes the correct next-best") {
    // M = n = 2: every member kill underflows the buffer immediately,
    // so each of the three kill batches exercises the O(live) scan
    val out = run("ctn_scan", 2, Seq(
      Seq(RankChange("+I", "a", 1L, 90.0, 1),
        RankChange("+I", "a", 2L, 80.0, 1),
        RankChange("+I", "a", 3L, 70.0, 1),
        RankChange("+I", "a", 4L, 60.0, 1),
        RankChange("+I", "a", 5L, 50.0, 1)),
      Seq(RankChange("-D", "a", 1L, 90.0, 2)),
      Seq(RankChange("-D", "a", 2L, 80.0, 3)),
      // kill a member and a runner-up in ONE batch
      Seq(RankChange("-D", "a", 3L, 70.0, 4),
        RankChange("-D", "a", 5L, 50.0, 4))), bufFactor = 1)
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      RankDelta("+I", "a", 1L, 90.0), RankDelta("+I", "a", 2L, 80.0)))
    assert(byBatch(1L) === Set(
      RankDelta("-D", "a", 1L, 90.0), RankDelta("+I", "a", 3L, 70.0)))
    assert(byBatch(2L) === Set(
      RankDelta("-D", "a", 2L, 80.0), RankDelta("+I", "a", 4L, 60.0)))
    assert(byBatch(3L) === Set(RankDelta("-D", "a", 3L, 70.0)))
    assert(materialize(out) === Map("a" -> Set(4L)))
    wellFormed(out)
  }

  test("cdc_topn rank mode: boundary ties are all members; membership narrows when a better entity displaces the tie-run") {
    val out = run("ctn_rank_hand", 2, Seq(
      // batch 0: rank() <= 2 over [90, 80, 80, 80, 70]: top-2 rows
      // plus every tie of the 2nd -> members {1, 2, 3, 4}
      Seq(RankChange("+I", "a", 1L, 90.0, 1),
        RankChange("+I", "a", 2L, 80.0, 1),
        RankChange("+I", "a", 3L, 80.0, 1),
        RankChange("+I", "a", 4L, 80.0, 1),
        RankChange("+I", "a", 5L, 70.0, 1)),
      // batch 1: kill ONE tie member -> the rest of the run stays
      Seq(RankChange("-D", "a", 2L, 80.0, 2)),
      // batch 2: a 95 arrives -> top-2 = {95, 90}, no ties of the
      // 2nd -> the whole 80-run leaves the membership
      Seq(RankChange("+I", "a", 6L, 95.0, 3)),
      // batch 3: the 95 dies -> the 80-run RE-ENTERS
      Seq(RankChange("-D", "a", 6L, 95.0, 4))), mode = "rank")
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      RankDelta("+I", "a", 1L, 90.0), RankDelta("+I", "a", 2L, 80.0),
      RankDelta("+I", "a", 3L, 80.0), RankDelta("+I", "a", 4L, 80.0)))
    assert(byBatch(1L) === Set(RankDelta("-D", "a", 2L, 80.0)))
    assert(byBatch(2L) === Set(
      RankDelta("+I", "a", 6L, 95.0),
      RankDelta("-D", "a", 3L, 80.0), RankDelta("-D", "a", 4L, 80.0)))
    assert(byBatch(3L) === Set(
      RankDelta("-D", "a", 6L, 95.0),
      RankDelta("+I", "a", 3L, 80.0), RankDelta("+I", "a", 4L, 80.0)))
    assert(materialize(out) === Map("a" -> Set(1L, 3L, 4L)))
    wellFormed(out)
  }

  test("cdc_topn dense mode: membership = top n DISTINCT scores; a dead bucket pulls the next bucket in") {
    val out = run("ctn_dense_hand", 2, Seq(
      // dense_rank() <= 2 over buckets {90: [1], 80: [2, 3], 70: [4]}
      // -> members {1, 2, 3}
      Seq(RankChange("+I", "a", 1L, 90.0, 1),
        RankChange("+I", "a", 2L, 80.0, 1),
        RankChange("+I", "a", 3L, 80.0, 1),
        RankChange("+I", "a", 4L, 70.0, 1)),
      // the 90 bucket dies ENTIRELY -> buckets {80, 70} -> 4 enters
      Seq(RankChange("-D", "a", 1L, 90.0, 2)),
      // one 80 dies -> the bucket SURVIVES (3 still holds it) -> 4 stays
      Seq(RankChange("-D", "a", 2L, 80.0, 3))), mode = "dense")
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      RankDelta("+I", "a", 1L, 90.0), RankDelta("+I", "a", 2L, 80.0),
      RankDelta("+I", "a", 3L, 80.0)))
    assert(byBatch(1L) === Set(
      RankDelta("-D", "a", 1L, 90.0), RankDelta("+I", "a", 4L, 70.0)))
    assert(byBatch(2L) === Set(RankDelta("-D", "a", 2L, 80.0)))
    assert(materialize(out) === Map("a" -> Set(3L, 4L)))
    wellFormed(out)
  }

  test("cdc_topn tie modes, bufFactor=1: a boundary tie-run WIDER than the buffer is collected by the tie-extension scan") {
    // maxBuf = n = 2, but FIVE entities tie at 80: the buffer trims to
    // 2, membership proof fails, and the tie-extension pass must
    // stream the slots to find all five
    val out = run("ctn_tie_scan", 2, Seq(
      Seq(RankChange("+I", "a", 1L, 80.0, 1),
        RankChange("+I", "a", 2L, 80.0, 1),
        RankChange("+I", "a", 3L, 80.0, 1),
        RankChange("+I", "a", 4L, 80.0, 1),
        RankChange("+I", "a", 5L, 80.0, 1)),
      // kill one tie -> the other four remain members (pathological
      // rescan shape, documented: the scan re-proves it)
      Seq(RankChange("-D", "a", 3L, 80.0, 2))), bufFactor = 1, mode = "rank")
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === (1L to 5L).map(i => RankDelta("+I", "a", i, 80.0)).toSet,
      "all five boundary ties are rank-1 members")
    assert(byBatch(1L) === Set(RankDelta("-D", "a", 3L, 80.0)))
    assert(materialize(out) === Map("a" -> Set(1L, 2L, 4L, 5L)))
    wellFormed(out)
  }

  test("cdc_topn adaptive cap: wide-tie grow, incremental tie kills, underflow rescan, decay after the boundary narrows") {
    // n=1, bufFactor=1 (base cap 1), rank mode. The 20-wide tie at 80
    // forces the grow event (cap -> 0+20+1); the per-batch tie kills
    // must then each emit exactly ONE -D (they ride the grown buffer
    // — before the adaptive cap every such batch re-paid the scan);
    // killing the LAST tie underflows (scan), surfaces the best
    // filler, and the decay trims the now-oversized cap back — the
    // final displacement batch proves the group still ranks correctly
    // at the decayed cap.
    val batches =
      Seq((1L to 20L).map(i => RankChange("+I", "a", i, 80.0, i)).toSeq) ++ // b0: grow
      Seq((1L to 10L).map(i => RankChange("+I", "a", 50L + i, i.toDouble, 20L + i)).toSeq) ++ // b1: fillers
      Seq(Seq(RankChange("+I", "a", 100L, 99.0, 31L))) ++                 // b2: displaces the whole tie
      Seq(Seq(RankChange("-D", "a", 100L, 99.0, 32L))) ++                 // b3: ties return
      (1L to 19L).map(i => Seq(RankChange("-D", "a", i, 80.0, 32L + i))) ++ // b4..b22: one tie kill each
      Seq(Seq(RankChange("-D", "a", 20L, 80.0, 52L))) ++                  // b23: last tie -> rescan + decay
      Seq(Seq(RankChange("+I", "a", 200L, 50.0, 53L)))                    // b24: post-decay displacement
    val out = run("ctn_adaptive", 1, batches, bufFactor = 1, mode = "rank")
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBatch(0L).toSet === (1L to 20L).map(i => RankDelta("+I", "a", i, 80.0)).toSet)
    assert(!byBatch.contains(1L), "fillers below the boundary must not emit")
    assert(byBatch(2L).size === 21, "+I 100 and the 20 tie -Ds")
    assert(byBatch(3L).size === 21, "retracting 100 re-admits the whole tie-run")
    (4L to 22L).foreach { b =>
      assert(byBatch(b).size === 1 && byBatch(b).head.op === "-D",
        s"tie kill batch $b must be exactly one -D (buffered, no re-proof churn): ${byBatch(b)}")
    }
    assert(byBatch(23L).toSet === Set(RankDelta("-D", "a", 20L, 80.0),
      RankDelta("+I", "a", 60L, 10.0)), "underflow scan surfaces the best filler")
    assert(byBatch(24L).toSet === Set(RankDelta("+I", "a", 200L, 50.0),
      RankDelta("-D", "a", 60L, 10.0)), "post-decay ranking stays correct")
    assert(materialize(out) === Map("a" -> Set(200L)))
    wellFormed(out)
  }

  test("cdc_topn tie modes: dealt replay of the q89/q90 bucketed changelog == batch rank()/dense_rank() membership") {
    import spark.implicits._
    // the q89/q90 synthesis: same changelog, score coarsened to $10k
    // buckets so boundary ties actually occur
    val o = graft.sources.Tables.orders(spark, sfDir)
    def ev(kind: String, cents: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column, ver: Int) =
      Seq(lit(kind).as("op"), grp.as("grp"), $"o_orderkey".as("id"),
        floor(cents / 1000000L).cast("double").as("score"), lit(ver.toLong).as("ver"))
    val cents0 = round(($"o_totalprice" - 10) * 100).cast("long")
    val cents1 = round($"o_totalprice" * 100).cast("long")
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    val changelog =
      o.select(ev("+I", cents0, $"o_orderpriority", 1): _*)
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", cents0, $"o_orderpriority", 2): _*))
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", cents1, grp1, 2): _*))
        .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", cents1, grp1, 3): _*))
        .as[RankChange].collect().toSeq
    val rnd = new scala.util.Random(89)
    val shuffled = rnd.shuffle(changelog.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    })
    def expected(q: String) = SparkEntry.queries(q)(spark, sfDir)
      .select($"grp", $"id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val expRank = expected("q89_cdc_topn_rank")
    val expDense = expected("q90_cdc_topn_dense")
    CachePool.drain()
    assert(expRank.values.map(_.size).sum > expRank.size * 3,
      s"degenerate: no boundary ties in the rank corpus")
    val rankDeltas = run("ctn_rank_parity", 3, batches, mode = "rank")
    assert(materialize(rankDeltas) === expRank)
    wellFormed(rankDeltas)
    val denseDeltas = run("ctn_dense_parity", 3, batches, mode = "dense")
    assert(materialize(denseDeltas) === expDense)
    wellFormed(denseDeltas)
    // bufFactor=1 forces the scan + tie-extension path throughout
    val rankDeltas1 = run("ctn_rank_parity_b1", 3, batches, bufFactor = 1, mode = "rank")
    assert(materialize(rankDeltas1) === expRank)
  }

  test("cdc_topn: dealt replay of the q84 changelog materializes to batch q84's top-3 (default buffer AND bufFactor=1)") {
    import spark.implicits._
    // the exact q84 synthesis, re-read as typed changelog rows
    val o = graft.sources.Tables.orders(spark, sfDir)
    def ev(kind: String, cents: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column, ver: Int) =
      Seq(lit(kind).as("op"), grp.as("grp"), $"o_orderkey".as("id"),
        cents.cast("double").as("score"), lit(ver.toLong).as("ver"))
    val cents0 = round(($"o_totalprice" - 10) * 100).cast("long")
    val cents1 = round($"o_totalprice" * 100).cast("long")
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    val changelog =
      o.select(ev("+I", cents0, $"o_orderpriority", 1): _*)
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", cents0, $"o_orderpriority", 2): _*))
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", cents1, grp1, 2): _*))
        .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", cents1, grp1, 3): _*))
        .as[RankChange].collect().toSeq
    assert(changelog.size > 500, s"degenerate: ${changelog.size} changes")
    val rnd = new scala.util.Random(73)
    val shuffled = rnd.shuffle(changelog.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    })
    val expected = SparkEntry.queries("q84_cdc_topn")(spark, sfDir)
      .select($"grp", $"id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    CachePool.drain()
    val deltas = run("ctn_parity", 3, batches)
    assert(materialize(deltas) === expected)
    wellFormed(deltas)
    // bufFactor=1 collapses the runner-up buffer to the membership:
    // every member retraction/demotion pays the scan — the result
    // must be identical
    val deltas1 = run("ctn_parity_b1", 3, batches, bufFactor = 1)
    assert(materialize(deltas1) === expected)
    assert(expected.values.map(_.size).sum >= 15, s"degenerate: $expected")
  }

  // Tombstone-horizon compaction, riding the rebuild scan: id 1 dies
  // (ver 3), a later leader's death forces the underflow rebuild with
  // maxVer already far past the horizon — the rebuild's streamed pass
  // collects id 1's expired tombstone for free. Replaying id 1's
  // ORIGINAL insert (ver 2, older than the delete that killed it)
  // then lands; without the horizon the fence holds. (The deliberate
  // promise violation is the only way to observe the drop.)
  private val tombBatchesTopN = Seq(
    Seq(RankChange("+I", "t", 1L, 10.0, 1), RankChange("+I", "t", 2L, 5.0, 2)),
    Seq(RankChange("-D", "t", 1L, 10.0, 3)),   // leader dies → rebuild; maxVer 3
    Seq(RankChange("+I", "t", 4L, 20.0, 20)),  // maxVer → 20
    Seq(RankChange("-D", "t", 4L, 20.0, 21)),  // rebuild: id 1 (ver 3 ≤ 21−5) compacts
    Seq(RankChange("+I", "t", 1L, 99.0, 2)))   // the late original insert

  test("cdc_topn: tombstone horizon compacts expired fences on the rebuild scan; default keeps them") {
    val compacted = run("ctn_tomb_h", 1, tombBatchesTopN, bufFactor = 1, horizon = Some(5L))
    // fence gone → the late insert resurrects id 1, which outranks id 2
    assert(materialize(compacted) === Map("t" -> Set(1L)))
    wellFormed(compacted)
    val fenced = run("ctn_tomb_none", 1, tombBatchesTopN, bufFactor = 1)
    // safe default: the ver-3 tombstone still rejects the ver-2 insert
    assert(materialize(fenced) === Map("t" -> Set(2L)))
    wellFormed(fenced)
  }

  test("cdc_topn: tombstone horizon forced pass fires when dead slots outnumber max(64, live)") {
    // 70 entities die with vers pushing maxVer to 170 — no rebuild is
    // ever needed (the survivor keeps the buffer exact-provable), so
    // only the forced dead≫live pass can compact. The late original
    // insert of id 1 (ver 2 < its ver-101 tombstone) lands after it.
    val batches = Seq(
      (1 to 70).map(i => RankChange("+I", "t", i.toLong, i.toDouble, i.toLong)) :+
        RankChange("+I", "t", 999L, 1000.0, 99L),
      (1 to 70).map(i => RankChange("-D", "t", i.toLong, i.toDouble, 100L + i)),
      Seq(RankChange("+I", "t", 1L, 2000.0, 2L)))
    val compacted = run("ctn_tomb_forced", 1, batches, horizon = Some(5L))
    assert(materialize(compacted) === Map("t" -> Set(1L)))
    val fenced = run("ctn_tomb_forced_none", 1, batches)
    assert(materialize(fenced) === Map("t" -> Set(999L)))
  }

  // Event-time idle TTL, the OverAggSpec pattern: group "a" fills its
  // top-2 at ts 1000-1001 s, sentinel group "b" pushes the watermark
  // far past lastSeen + ttl (wm = maxTs − 10 min), an extra sentinel
  // batch lets the expired timer fire, then a LOW straggler row for
  // "a" arrives — against live state it would not enter the top-2,
  // against dropped state it is the group's only entity and must
  // emit +I. ttl = 1 h: a expired at ~4601 s < wm 9400 s → dropped.
  // ttl = 10 h: armed but never exceeded → survives.
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
  private val ttlBatches: Seq[Seq[(String, String, Long, Double, Long, java.sql.Timestamp)]] = Seq(
    Seq(("+I", "a", 1L, 10.0, 1L, ts(1000)), ("+I", "a", 2L, 5.0, 1L, ts(1001))),
    Seq(("+I", "b", 7L, 1.0, 1L, ts(10000))), // wm → 9400 s
    Seq(("+I", "b", 8L, 1.0, 2L, ts(10001))), // a's expired timer fires here
    Seq(("+I", "a", 3L, 0.5, 2L, ts(20000)))) // the straggler

  private def runTtl(name: String, ttl: java.time.Duration): Seq[(Long, RankDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String, Long, Double, Long, java.sql.Timestamp)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, RankDelta)]
    val q = CdcTopNStream.topNIdle(
        in.toDF().toDF("op", "grp", "id", "score", "ver", "ts")
          .withWatermark("ts", "10 minutes"),
        n = 2, idleTtl = ttl)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RankDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      ttlBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  // Unified disorder promise (round 16): ver = event-time MILLIS, so
  // the ONE watermark delay drives BOTH clocks — the event-time idle
  // TTL and (via Tombstones.verHorizonFromWatermark) the tombstone
  // fence lifetime. The fence then lives exactly as long as the
  // watermark promise: a late row the promise allows is still fenced;
  // a row older than the promise (which the source swore never to
  // send) finds the fence compacted.
  private def runUnified(name: String, horizon: Option[Long],
      batches: Seq[Seq[(String, String, Long, Double, Long, java.sql.Timestamp)]]): Seq[(Long, RankDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String, Long, Double, Long, java.sql.Timestamp)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, RankDelta)]
    val q = CdcTopNStream.topNIdle(
        in.toDF().toDF("op", "grp", "id", "score", "ver", "ts")
          .withWatermark("ts", "10 minutes"),
        n = 1, idleTtl = java.time.Duration.ofHours(10), bufFactor = 1,
        tombstoneVerHorizon = horizon)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RankDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  test("cdc_topn unified config: ONE watermark delay drives the idle clock AND the fence bound — compaction provably answer-invisible") {
    val delay = java.time.Duration.ofMinutes(10)
    val unifiedH = graft.streaming.Tombstones.verHorizonFromWatermark(delay)
    assert(unifiedH === Some(600000L))
    def ch(op: String, id: Long, score: Double, sec: Long) =
      (op, "t", id, score, sec * 1000L, ts(sec)) // ver = event-time MILLIS
    // the scenario drives the fence PAST the derived horizon (group
    // activity to 5001 s puts id 1's 1002 s fence beyond the 600 s
    // promise → the rebuild scan compacts it) and then attempts a
    // promise-VIOLATING straggler (3500 s late). The event-time gate
    // the SAME watermark arms drops that row before the processor —
    // which is the unification's safety theorem: any row the gate
    // admits has ver ≥ watermark(ms) ≥ grpMaxVer − D(ms), i.e. newer
    // than every compacted fence, so horizon = D(ms) can NEVER change
    // an admitted row's outcome. Assert it literally: the unified run
    // and the keep-everything control emit identical deltas.
    val batches = Seq(
      Seq(ch("+I", 1L, 10.0, 1000), ch("+I", 2L, 5.0, 1001)),
      Seq(ch("-D", 1L, 10.0, 1002)),
      Seq(ch("+I", 4L, 20.0, 5000)),
      Seq(ch("-D", 4L, 20.0, 5001)),
      Seq(ch("+I", 1L, 99.0, 1500))) // violates the promise → gated out
    val unified = runUnified("ctn_uni", unifiedH, batches)
    val control = runUnified("ctn_uni_ctl", None, batches)
    assert(unified.map(_._2) === control.map(_._2),
      "derived horizon changed an outcome the keep-forever control allows")
    assert(materialize(unified) === Map("t" -> Set(2L)),
      "the gated straggler must not resurrect id 1")
    wellFormed(unified)
    // and a late row the promise ALLOWS is still fenced: group
    // activity only reaches 1401 s (fence within 600 s of grpMaxVer,
    // kept; watermark 801 s admits the 1001 s straggler)
    val held = runUnified("ctn_uni_held", unifiedH, Seq(
      Seq(ch("+I", 1L, 10.0, 1000), ch("+I", 2L, 5.0, 1001)),
      Seq(ch("-D", 1L, 10.0, 1002)),
      Seq(ch("+I", 4L, 20.0, 1400)),
      Seq(ch("-D", 4L, 20.0, 1401)),
      Seq(ch("+I", 1L, 9.0, 1001))))
    assert(materialize(held) === Map("t" -> Set(2L)),
      "a fence within the watermark promise must keep fencing")
    wellFormed(held)
  }

  test("cdc_topn idle TTL (event-time): expiry drops the dormant group, a straggler re-opens it empty; armed-but-unexpired survives") {
    val dropped = runTtl("ctn_ttl_drop", java.time.Duration.ofHours(1))
    val aOps = dropped.collect { case (_, d) if d.grp == "a" => d }
    // the resurrected group knows nothing of ids 1/2: id 3 enters
    assert(aOps.exists(d => d.op == "+I" && d.id == 3L),
      s"dropped state must re-open empty and admit id 3: $aOps")
    // armed but unexpired: id 3 ranks below the live {1, 2}
    val kept = runTtl("ctn_ttl_keep", java.time.Duration.ofHours(10))
    val keptA = kept.collect { case (_, d) if d.grp == "a" => d }
    assert(!keptA.exists(d => d.id == 3L), s"live state must reject id 3: $keptA")
    assert(materialize(kept).getOrElse("a", Set.empty) === Set(1L, 2L))
  }
}
