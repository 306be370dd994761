package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcOrderedStream
import graft.streaming.CdcOrderedStream.{OrdChange, OrdFirstLast, OrdListAgg, OrdListDelta}

/** Maintained FIRST_VALUE/LAST_VALUE and LISTAGG over a changelog:
  * boundary deaths surface the next live boundary (the one O(live)
  * scan), interior churn stays O(1), in-place value rewrites follow
  * the boundary images without a scan, retraction-before-insert
  * disorder is fenced by ver, and a dealt replay of the q104/q105
  * changelog materializes to the batch aggregates exactly. */
class CdcOrderedSpec extends AnyFunSuite {
  import TestSpark._

  private def runFL(name: String, batches: Seq[Seq[OrdChange]],
      horizon: Option[Long] = None): Seq[(Long, OrdFirstLast)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[OrdChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, OrdFirstLast)]
    val q = CdcOrderedStream.cdcFirstLastStream(in.toDS(), horizon)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[OrdFirstLast], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  private def runLA(name: String, batches: Seq[Seq[OrdChange]],
      horizon: Option[Long] = None): Seq[(Long, OrdListAgg)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[OrdChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, OrdListAgg)]
    val q = CdcOrderedStream.cdcListAggStream(in.toDS(), horizon)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[OrdListAgg], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  private def runLD(name: String, batches: Seq[Seq[OrdChange]],
      horizon: Option[Long] = None): Seq[(Long, OrdListDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[OrdChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, OrdListDelta)]
    val q = CdcOrderedStream.cdcListAggDeltaStream(in.toDS(), horizon)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[OrdListDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  /** The delta-fold law: keep each (grp, id)'s LAST delta in emission
    * order; live elements (+I/+U) joined in id order are the view. */
  private def foldDeltas(out: Seq[(Long, OrdListDelta)]): Map[String, OrdListAgg] = {
    val last = scala.collection.mutable.LinkedHashMap.empty[(String, Long), OrdListDelta]
    out.foreach { case (_, d) => last((d.grp, d.id)) = d }
    last.values.toSeq.filter(d => d.op == "+I" || d.op == "+U")
      .groupBy(_.grp).map { case (g, ds) =>
        val sorted = ds.sortBy(_.id)
        g -> OrdListAgg(g, sorted.size.toLong, sorted.map(_.value.toString).mkString(","))
      }
  }

  /** last emission per group across the run */
  private def finalFL(out: Seq[(Long, OrdFirstLast)]): Map[String, OrdFirstLast] =
    out.zipWithIndex.groupBy(_._1._2.grp)
      .map { case (g, xs) => g -> xs.maxBy { case ((b, _), i) => (b, i) }._1._2 }

  private def finalLA(out: Seq[(Long, OrdListAgg)]): Map[String, OrdListAgg] =
    out.zipWithIndex.groupBy(_._1._2.grp)
      .map { case (g, xs) => g -> xs.maxBy { case ((b, _), i) => (b, i) }._1._2 }

  test("cdc_firstlast: boundary death scans to the next live boundary; interior churn and boundary rewrites stay incremental") {
    val out = runFL("ord_hand", Seq(
      // batch 0: ids 2,5,9 live -> first=(2,20) last=(9,90)
      Seq(OrdChange("+I", "a", 5L, 50L, 1), OrdChange("+I", "a", 2L, 20L, 1),
        OrdChange("+I", "a", 9L, 90L, 1)),
      // batch 1: FIRST dies -> scan surfaces 5
      Seq(OrdChange("-D", "a", 2L, 20L, 2)),
      // batch 2: boundary value rewrite in place (id 9), O(1) path
      Seq(OrdChange("-U", "a", 9L, 90L, 3), OrdChange("+U", "a", 9L, 99L, 3)),
      // batch 3: interior insert between the boundaries — no change
      // to images, cnt only
      Seq(OrdChange("+I", "a", 7L, 70L, 4)),
      // batch 4: LAST dies -> scan surfaces 7
      Seq(OrdChange("-D", "a", 9L, 99L, 5)),
      // batch 5: a new smallest id takes first without a scan
      Seq(OrdChange("+I", "a", 1L, 10L, 6)),
      // batch 6: everything dies -> zeros (the DELETE signal)
      Seq(OrdChange("-D", "a", 1L, 10L, 7), OrdChange("-D", "a", 5L, 50L, 7),
        OrdChange("-D", "a", 7L, 70L, 7))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBatch(0L) === Seq(OrdFirstLast("a", 3L, 2L, 20L, 9L, 90L)))
    assert(byBatch(1L) === Seq(OrdFirstLast("a", 2L, 5L, 50L, 9L, 90L)))
    assert(byBatch(2L) === Seq(OrdFirstLast("a", 2L, 5L, 50L, 9L, 99L)))
    assert(byBatch(3L) === Seq(OrdFirstLast("a", 3L, 5L, 50L, 9L, 99L)))
    assert(byBatch(4L) === Seq(OrdFirstLast("a", 2L, 5L, 50L, 7L, 70L)))
    assert(byBatch(5L) === Seq(OrdFirstLast("a", 3L, 1L, 10L, 7L, 70L)))
    assert(byBatch(6L) === Seq(OrdFirstLast("a", 0L, 0L, 0L, 0L, 0L)))
  }

  test("cdc_firstlast: retraction-before-insert is fenced by ver; group move routes by before-image") {
    val out = runFL("ord_fence", Seq(
      // batch 0: the -U (ver 2) lands BEFORE its +I (ver 1) — the
      // tombstone fences the late insert, id 3 must never go live
      Seq(OrdChange("-U", "a", 3L, 30L, 2), OrdChange("+I", "a", 4L, 40L, 1)),
      Seq(OrdChange("+I", "a", 3L, 30L, 1)),
      // batch 2: group move a->b — the before-image -U routes to a,
      // the +U to b (different shards)
      Seq(OrdChange("-U", "a", 4L, 40L, 3), OrdChange("+U", "b", 4L, 41L, 3)),
      // batch 3: the moved id re-enters a later at a higher ver
      Seq(OrdChange("+I", "a", 4L, 44L, 4))))
    val byBatch = out.groupBy(_._1).view
      .mapValues(_.map(d => d._2.grp -> d._2).toMap).toMap
    assert(byBatch(0L)("a") === OrdFirstLast("a", 1L, 4L, 40L, 4L, 40L))
    // the late +I ver 1 loses to the ver-2 tombstone: unchanged
    assert(byBatch(1L)("a") === OrdFirstLast("a", 1L, 4L, 40L, 4L, 40L))
    assert(byBatch(2L)("a") === OrdFirstLast("a", 0L, 0L, 0L, 0L, 0L))
    assert(byBatch(2L)("b") === OrdFirstLast("b", 1L, 4L, 41L, 4L, 41L))
    assert(byBatch(3L)("a") === OrdFirstLast("a", 1L, 4L, 44L, 4L, 44L))
  }

  test("cdc_listagg: every emission republishes the whole id-ordered live list") {
    val out = runLA("la_hand", Seq(
      Seq(OrdChange("+I", "a", 5L, 50L, 1), OrdChange("+I", "a", 2L, 20L, 1)),
      Seq(OrdChange("+I", "a", 9L, 90L, 2)),
      // value update in place
      Seq(OrdChange("-U", "a", 5L, 50L, 3), OrdChange("+U", "a", 5L, 55L, 3)),
      // middle entity dies
      Seq(OrdChange("-D", "a", 5L, 55L, 4)),
      // all die -> empty list
      Seq(OrdChange("-D", "a", 2L, 20L, 5), OrdChange("-D", "a", 9L, 90L, 5))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBatch(0L) === Seq(OrdListAgg("a", 2L, "20,50")))
    assert(byBatch(1L) === Seq(OrdListAgg("a", 3L, "20,50,90")))
    assert(byBatch(2L) === Seq(OrdListAgg("a", 3L, "20,55,90")))
    assert(byBatch(3L) === Seq(OrdListAgg("a", 2L, "20,90")))
    assert(byBatch(4L) === Seq(OrdListAgg("a", 0L, "")))
  }

  test("cdc_ordered composed with cdc_join: maintained first/last enriched fact per dim attribute — boundary kill scans, fk move crosses groups, dim rename sweeps") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.CdcJoinStream
    import graft.streaming.CdcJoinStream.JoinChange
    val in = MemoryStream[JoinChange]
    def pid(lpk: Long, k: Long) = lpk * 1000000L + k
    val view = CdcOrderedStream.cdcFirstLastStream(
      CdcJoinStream.toOrdChanges(
        CdcJoinStream.joinStream(in.toDS(), "inner", strictVer = true),
        grp = _.right, pairId = d => pid(d.lpk, d.k),
        value = _.left.toLong))
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, OrdFirstLast)]
    val q = view.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[OrdFirstLast], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName("cj_ordered").start()
    try {
      Seq(
        // batch 0: ann has orders 10(70) 11(80) 12(90); bob has 13(50)
        Seq(JoinChange("R", "+I", 5L, 5L, "ann", 1),
          JoinChange("R", "+I", 6L, 6L, "bob", 1),
          JoinChange("L", "+I", 5L, 10L, "70", 1),
          JoinChange("L", "+I", 5L, 11L, "80", 1),
          JoinChange("L", "+I", 5L, 12L, "90", 1),
          JoinChange("L", "+I", 6L, 13L, "50", 1)),
        // batch 1: order 10 deleted -> ann's FIRST dies (boundary scan)
        Seq(JoinChange("L", "-D", 5L, 10L, "70", 2)),
        // batch 2: order 12 fk-moves to bob at 95 -> ann's LAST dies,
        // pair (12,6) becomes bob's new FIRST (smaller pair id)
        Seq(JoinChange("L", "-U", 5L, 12L, "90", 3),
          JoinChange("L", "+U", 6L, 12L, "95", 3)),
        // batch 3: ann renames to ANN -> the whole group moves
        Seq(JoinChange("R", "-U", 5L, 5L, "ann", 4),
          JoinChange("R", "+U", 5L, 5L, "ANN", 4))
      ).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val out = buf.synchronized(buf.toVector)
      val byBatch = out.groupBy(_._1).view
        .mapValues(_.map(d => d._2.grp -> d._2).toMap).toMap
      assert(byBatch(0L)("ann") === OrdFirstLast("ann", 3L, pid(10, 5), 70L, pid(12, 5), 90L))
      assert(byBatch(0L)("bob") === OrdFirstLast("bob", 1L, pid(13, 6), 50L, pid(13, 6), 50L))
      assert(byBatch(1L)("ann") === OrdFirstLast("ann", 2L, pid(11, 5), 80L, pid(12, 5), 90L))
      assert(byBatch(2L)("ann") === OrdFirstLast("ann", 1L, pid(11, 5), 80L, pid(11, 5), 80L))
      assert(byBatch(2L)("bob") === OrdFirstLast("bob", 2L, pid(12, 6), 95L, pid(13, 6), 50L))
      assert(byBatch(3L)("ann") === OrdFirstLast("ann", 0L, 0L, 0L, 0L, 0L))
      assert(byBatch(3L)("ANN") === OrdFirstLast("ANN", 1L, pid(11, 5), 80L, pid(11, 5), 80L))
    } finally q.stop()
  }

  test("cdc_ordered: dealt replay of the q104/q105 changelog == the batch aggregates") {
    import spark.implicits._
    val o = graft.sources.Tables.orders(spark, sfDir)
    def ev(kind: String, value: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column, ver: Int) =
      Seq(lit(kind).as("op"), grp.as("grp"), $"o_orderkey".as("id"),
        value.as("value"), lit(ver.toLong).as("ver"))
    val cents0 = round(($"o_totalprice" - 10) * 100).cast("long")
    val cents1 = round($"o_totalprice" * 100).cast("long")
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    def changelog(v0: org.apache.spark.sql.Column, v1: org.apache.spark.sql.Column) =
      o.select(ev("+I", v0, $"o_orderpriority", 1): _*)
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", v0, $"o_orderpriority", 2): _*))
        .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", v1, grp1, 2): _*))
        .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", v1, grp1, 3): _*))
        .as[OrdChange].collect().toSeq
    def deal(cl: Seq[OrdChange], seed: Int): Seq[Seq[OrdChange]] = {
      val shuffled = new scala.util.Random(seed).shuffle(cl.toList)
      (0 until 4).map(i => shuffled.zipWithIndex.collect { case (c, j) if j % 4 == i => c })
    }

    // FIRST/LAST on cents
    val clFL = changelog(cents0, cents1)
    assert(clFL.size > 500, s"degenerate: ${clFL.size} changes")
    val expFL = SparkEntry.queries("q104_cdc_firstlast")(spark, sfDir)
      .select($"grp", $"live_cnt", $"first_id", $"first_cents", $"last_id", $"last_cents")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> OrdFirstLast(r._1, r._2, r._3, r._4, r._5, r._6)).toMap
    CachePool.drain()
    val gotFL = finalFL(runFL("ord_parity", deal(clFL, 41)))
    // groups the stream touched but batch retracted to empty keep a
    // zero row; batch GROUP BY drops them — compare on live groups
    assert(gotFL.filter(_._2.live_cnt > 0L) === expFL)

    // LISTAGG on $10k buckets
    val clLA = changelog(floor(cents0 / 1000000L), floor(cents1 / 1000000L))
    val expLA = SparkEntry.queries("q105_cdc_listagg")(spark, sfDir)
      .select($"grp", $"live_cnt", $"live_list")
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> OrdListAgg(r._1, r._2, r._3)).toMap
    CachePool.drain()
    val gotLA = finalLA(runLA("la_parity", deal(clLA, 42)))
    assert(gotLA.filter(_._2.live_cnt > 0L) === expLA)
  }

  // Tombstone-horizon compaction: the batches kill id 1 (ver 3), push
  // maxVer far past the horizon, then replay id 1's ORIGINAL insert
  // (ver 2 — older than the delete that killed it). With the horizon,
  // the tombstone was compacted away and the late insert lands (the
  // declared source promise "no row arrives with ver ≤ maxVer − H"
  // was violated on purpose — that violation is the only way to
  // OBSERVE the drop from outside). Without it, the fence holds.
  private val tombBatchesFL = Seq(
    Seq(OrdChange("+I", "t", 1L, 10L, 1), OrdChange("+I", "t", 2L, 20L, 2)),
    Seq(OrdChange("-D", "t", 1L, 10L, 3)), // boundary death → scan (compaction rides it)
    Seq(OrdChange("-U", "t", 2L, 20L, 20), OrdChange("+U", "t", 2L, 21L, 20)), // maxVer → 20
    Seq(OrdChange("-D", "t", 2L, 21L, 21)), // scan again: dead id 1 (ver 3 ≤ 21−5) compacts
    Seq(OrdChange("+I", "t", 1L, 99L, 2))) // the late original insert

  test("cdc_listagg delta mode: per-change emission grammar, and the fold reproduces the full view") {
    val batches = Seq(
      // batch 0: two inserts (one group) — exactly two +I
      Seq(OrdChange("+I", "g", 3L, 30L, 1), OrdChange("+I", "g", 1L, 10L, 1)),
      // batch 1: in-place rewrite — exactly -U(old) +U(new), NOT a
      // full republish of the other element
      Seq(OrdChange("-U", "g", 3L, 30L, 2), OrdChange("+U", "g", 3L, 33L, 2)),
      // batch 2: untouched id 1 emits nothing; new element +I only
      Seq(OrdChange("+I", "g", 2L, 20L, 3)),
      // batch 3: death — one -D carrying the before value
      Seq(OrdChange("-D", "g", 1L, 10L, 4)),
      // batch 4: retraction-before-insert disorder — tombstone fences
      // the late insert, NOTHING emits
      Seq(OrdChange("-D", "g", 9L, 90L, 6)),
      Seq(OrdChange("+I", "g", 9L, 90L, 5)))
    val out = runLD("ld_hand", batches)
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBatch(0L).toSet === Set(OrdListDelta("+I", "g", 3L, 30L), OrdListDelta("+I", "g", 1L, 10L)))
    assert(byBatch(1L).toSet === Set(OrdListDelta("-U", "g", 3L, 30L), OrdListDelta("+U", "g", 3L, 33L)))
    assert(byBatch(2L) === Seq(OrdListDelta("+I", "g", 2L, 20L)))
    assert(byBatch(3L) === Seq(OrdListDelta("-D", "g", 1L, 10L)))
    assert(!byBatch.contains(4L) && !byBatch.contains(5L), s"fenced disorder must not emit: $byBatch")
    assert(foldDeltas(out) === Map("g" -> OrdListAgg("g", 2L, "20,33")))
  }

  test("cdc_listagg delta mode: dealt replay folds to cdcListAggStream's full view exactly") {
    import spark.implicits._
    // the q105-shaped changelog: bucketed order totals with group
    // moves and deletes, dealt out of order across 4 batches
    val o = graft.sources.Tables.orders(spark, sfDir)
    def ev(kind: String, value: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column, ver: Int) =
      Seq(lit(kind).as("op"), grp.as("grp"), $"o_orderkey".as("id"),
        value.as("value"), lit(ver.toLong).as("ver"))
    val v0 = floor(round(($"o_totalprice" - 10) * 100).cast("long") / 1000000L)
    val v1 = floor(round($"o_totalprice" * 100).cast("long") / 1000000L)
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    val cl = o.select(ev("+I", v0, $"o_orderpriority", 1): _*)
      .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", v0, $"o_orderpriority", 2): _*))
      .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", v1, grp1, 2): _*))
      .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", v1, grp1, 3): _*))
      .as[OrdChange].collect().toSeq
    CachePool.drain()
    assert(cl.size > 500, s"degenerate: ${cl.size} changes")
    def deal(seed: Int): Seq[Seq[OrdChange]] = {
      val shuffled = new scala.util.Random(seed).shuffle(cl.toList)
      (0 until 4).map(i => shuffled.zipWithIndex.collect { case (c, j) if j % 4 == i => c })
    }
    val full = finalLA(runLA("ld_full", deal(43))).filter(_._2.live_cnt > 0L)
    val folded = foldDeltas(runLD("ld_delta", deal(44))) // different deal: fold is order-independent
    assert(folded === full)
  }

  test("cdc_firstlast: tombstone horizon compacts expired fences; default keeps them") {
    val compacted = finalFL(runFL("fl_tomb_h", tombBatchesFL, horizon = Some(5L)))
    // fence gone → the late insert resurrects id 1
    assert(compacted("t") === OrdFirstLast("t", 1L, 1L, 99L, 1L, 99L))
    val fenced = finalFL(runFL("fl_tomb_none", tombBatchesFL))
    // safe default: the ver-3 tombstone still rejects the ver-2 insert
    assert(fenced("t") === OrdFirstLast("t", 0L, 0L, 0L, 0L, 0L))
  }

  test("cdc_listagg delta SINK composition: deltas -> UpsertSink store -> readListAggView == the republish mode, byte for byte") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the q105-shaped dealt changelog from the replay test above,
    // through the SHIPPED composition instead of a hand-rolled fold
    val o = graft.sources.Tables.orders(spark, sfDir)
    def ev(kind: String, value: org.apache.spark.sql.Column,
        grp: org.apache.spark.sql.Column, ver: Int) =
      Seq(lit(kind).as("op"), grp.as("grp"), $"o_orderkey".as("id"),
        value.as("value"), lit(ver.toLong).as("ver"))
    val v0 = floor(round(($"o_totalprice" - 10) * 100).cast("long") / 1000000L)
    val v1 = floor(round($"o_totalprice" * 100).cast("long") / 1000000L)
    val grp1 = concat(lit("U-"), $"o_orderpriority")
    val cl = o.select(ev("+I", v0, $"o_orderpriority", 1): _*)
      .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("-U", v0, $"o_orderpriority", 2): _*))
      .unionAll(o.filter($"o_orderstatus".isin("F", "P")).select(ev("+U", v1, grp1, 2): _*))
      .unionAll(o.filter($"o_orderstatus" === "P").select(ev("-D", v1, grp1, 3): _*))
      .as[OrdChange].collect().toSeq
    CachePool.drain()
    val batches = {
      val shuffled = new scala.util.Random(45).shuffle(cl.toList)
      (0 until 4).map(i => shuffled.zipWithIndex.collect { case (c, j) if j % 4 == i => c })
    }
    // injective (grp, id) -> Long packer: the groups are known here
    // (the cascade contract — the CALLER knows its key spaces)
    val grpNo = cl.map(_.grp).distinct.sorted.zipWithIndex.toMap
    val root = java.nio.file.Files.createTempDirectory("graft_ld_sink").toString
    val in = MemoryStream[OrdChange]
    val q = CdcOrderedStream.cdcListAggDeltaStream(in.toDS())
      .writeStream.outputMode("append")
      .foreachBatch(CdcOrderedStream.listAggDeltaSink(root,
        d => grpNo(d.grp).toLong * 100000000L + d.id))
      .queryName("ld_sink").start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val folded = CdcOrderedStream.readListAggView(spark, root)
      .collect().map(r => r.grp -> r).toMap
    // a DIFFERENT deal through the republish mode — the store fold
    // must be deal-independent too
    val full = finalLA(runLA("ld_sink_full", {
      val shuffled = new scala.util.Random(46).shuffle(cl.toList)
      (0 until 4).map(i => shuffled.zipWithIndex.collect { case (c, j) if j % 4 == i => c })
    })).filter(_._2.live_cnt > 0L)
    assert(folded === full)
    // and the store composes with the upsert store's own compaction
    graft.sinks.UpsertSink.compact(spark, root)
    val afterCompact = CdcOrderedStream.readListAggView(spark, root)
      .collect().map(r => r.grp -> r).toMap
    assert(afterCompact === full)
  }

  test("cdc_listagg: tombstone horizon compacts on the per-batch scan; default keeps fences") {
    val batches = Seq(
      Seq(OrdChange("+I", "t", 1L, 10L, 1), OrdChange("+I", "t", 2L, 20L, 2)),
      Seq(OrdChange("-D", "t", 1L, 10L, 3)),
      Seq(OrdChange("+I", "t", 5L, 50L, 20)), // any touch scans: dead id 1 compacts here
      Seq(OrdChange("+I", "t", 1L, 99L, 2))) // late original insert
    val compacted = finalLA(runLA("la_tomb_h", batches, horizon = Some(5L)))
    assert(compacted("t") === OrdListAgg("t", 3L, "99,20,50"))
    val fenced = finalLA(runLA("la_tomb_none", batches))
    assert(fenced("t") === OrdListAgg("t", 2L, "20,50"))
  }
}
