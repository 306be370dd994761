package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcJoinStream, Pipelines}
import graft.streaming.CdcJoinStream.{JoinChange, JoinDelta}
import graft.streaming.Pipelines.{AggChange, GroupAgg}

/** Incremental join-view maintenance over two CDC changelogs: hand
  * semantics, randomized multi-batch parity against the final-state
  * join, and the composed join→aggregate pipeline. */
class CdcJoinSpec extends AnyFunSuite {
  import TestSpark._

  /** Drive batches through joinStream; return every delta in batch
    * order (foreachBatch ids make cross-batch order explicit). */
  private def run(name: String, batches: Seq[Seq[JoinChange]],
      leftOuter: Boolean = false): Seq[(Long, JoinDelta)] =
    run2(name, if (leftOuter) "left" else "inner", batches)

  /** Mode-explicit driver (inner|left|right|full). */
  private def run2(name: String, mode: String,
      batches: Seq[Seq[JoinChange]]): Seq[(Long, JoinDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[JoinChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, JoinDelta)]
    val q = CdcJoinStream.joinStream(in.toDS(), mode)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  /** Materialize a delta stream on the documented row identity
    * (lpk, k): last delta in batch order wins; live = +I/+U.
    * lpk is boxed (null = the right/full-outer pad row). */
  private def materialize(deltas: Seq[(Long, JoinDelta)]): Map[(java.lang.Long, Long), (String, String)] =
    deltas.zipWithIndex
      .groupBy { case ((_, d), _) => (d.lpk, d.k) }
      .flatMap { case (id, ds) =>
        val (_, last) = ds.maxBy { case ((bid, _), i) => (bid, i) }._1
        if (last.op == "+I" || last.op == "+U") Some(id -> ((last.left, last.right))) else None
      }

  test("cdc_join: right-side update re-emits every match; right delete kills them; fk move crosses shards") {
    val out = run("cj_hand", Seq(
      // batch 1: two orders under customer 5, one under 6; customers arrive
      Seq(
        JoinChange("L", "+I", 5L, 100L, "o100", 1),
        JoinChange("L", "+I", 5L, 101L, "o101", 1),
        JoinChange("L", "+I", 6L, 102L, "o102", 1),
        JoinChange("R", "+I", 5L, 5L, "alice", 1),
        JoinChange("R", "+I", 6L, 6L, "bob", 1)),
      // batch 2: customer 5 renamed -> both its join rows re-emit as -U/+U
      Seq(
        JoinChange("R", "-U", 5L, 5L, "alice", 2),
        JoinChange("R", "+U", 5L, 5L, "ALICE", 2)),
      // batch 3: order 101 moves fk 5 -> 6 (before-image routing);
      // customer 6 deleted AFTER the move lands in the same batch
      Seq(
        JoinChange("L", "-U", 5L, 101L, "o101", 3),
        JoinChange("L", "+U", 6L, 101L, "o101v2", 3),
        JoinChange("R", "-D", 6L, 6L, "bob", 4))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0) === Set(
      JoinDelta("+I", 100L, 5L, "o100", "alice", 1),
      JoinDelta("+I", 101L, 5L, "o101", "alice", 1),
      JoinDelta("+I", 102L, 6L, "o102", "bob", 1)))
    assert(byBatch(1) === Set(
      JoinDelta("-U", 100L, 5L, "o100", "alice", 2),
      JoinDelta("+U", 100L, 5L, "o100", "ALICE", 2),
      JoinDelta("-U", 101L, 5L, "o101", "alice", 2),
      JoinDelta("+U", 101L, 5L, "o101", "ALICE", 2)))
    // batch 3: (101,5) dies; on shard 6 the customer delete wins over
    // the arriving order, so (101,6) never goes live and (102,6) dies
    assert(byBatch(2) === Set(
      JoinDelta("-D", 101L, 5L, "o101", "ALICE", 3),
      JoinDelta("-D", 102L, 6L, "o102", "bob", 4)))
    assert(materialize(out) === Map((100L, 5L) -> (("o100", "ALICE"))))
  }

  test("cdc_join: randomized multi-batch replay materializes to the final-state join") {
    val rnd = new scala.util.Random(91)
    val custs = (1L to 12L)
    // right histories: insert, maybe rename, maybe delete
    var ver = 0L
    def v(): Long = { ver += 1; ver }
    val right = custs.flatMap { c =>
      val b = scala.collection.mutable.ArrayBuffer(
        JoinChange("R", "+I", c, c, s"name$c", v()))
      var cur = s"name$c"
      if (rnd.nextBoolean()) {
        val nn = s"NAME$c"
        b += JoinChange("R", "-U", c, c, cur, { val x = v(); x })
        b += JoinChange("R", "+U", c, c, nn, ver) // same ver as its -U
        cur = nn
      }
      if (rnd.nextInt(4) == 0) b += JoinChange("R", "-D", c, c, cur, v())
      b
    }
    // left histories: insert with random fk, chain of fk moves, maybe delete
    val left = (100L until 160L).flatMap { o =>
      var fk = 1L + rnd.nextInt(12)
      var pl = s"o$o"
      val b = scala.collection.mutable.ArrayBuffer(JoinChange("L", "+I", fk, o, pl, v()))
      (0 until rnd.nextInt(3)).foreach { i =>
        val nfk = 1L + rnd.nextInt(12)
        val npl = s"o${o}v$i"
        b += JoinChange("L", "-U", fk, o, pl, { val x = v(); x })
        b += JoinChange("L", "+U", nfk, o, npl, ver)
        fk = nfk; pl = npl
      }
      if (rnd.nextInt(5) == 0) b += JoinChange("L", "-D", fk, o, pl, v())
      b
    }
    // deal all rows round-robin into 5 batches: histories straddle
    // batches and shards arbitrarily (ver order preserved per entity
    // only globally, which is all the contract demands)
    val all = rnd.shuffle((right ++ left).toList)
    val batches = (0 until 5).map(i => all.zipWithIndex.collect {
      case (c, j) if j % 5 == i => c
    })
    val deltas = run("cj_parity", batches)
    // ground truth: fold each entity's history by (ver, rank), join live
    def fold(cs: Seq[JoinChange]): Option[JoinChange] = {
      val last = cs.maxBy(c => (c.ver, c.op match {
        case "-U" => 0; case "+I" => 1; case "+U" => 2; case _ => 3
      }))
      if (last.op == "-D" || last.op == "-U") None else Some(last)
    }
    val liveR = right.groupBy(_.pk).flatMap { case (_, cs) => fold(cs.toSeq) }
      .map(c => c.k -> c.payload).toMap
    val liveL = left.groupBy(_.pk).flatMap { case (_, cs) => fold(cs.toSeq) }
    val expected = liveL.flatMap { c =>
      liveR.get(c.k).map(r => (c.pk, c.k) -> ((c.payload, r)))
    }.toMap
    assert(materialize(deltas) === expected)
    assert(expected.size >= 20, s"degenerate corpus: ${expected.size} live join rows")
    // the delta stream is a WELL-FORMED retract stream per (lpk, k):
    // alternating live/dead, no double-insert, -U always paired
    deltas.map(_._2).groupBy(d => (d.lpk, d.k)).foreach { case (id, ds) =>
      var live = false
      ds.foreach { d =>
        d.op match {
          case "+I" => assert(!live, s"$id: +I while live"); live = true
          case "+U" => live = true
          case "-U" => assert(live, s"$id: -U while dead"); live = false
          case "-D" => assert(live, s"$id: -D while dead"); live = false
        }
      }
    }
  }

  test("cdc_join leftOuter: null padding appears while unmatched and RETRACTS when the right row arrives") {
    val out = run("cj_outer", Seq(
      // order arrives before its customer: pads with null
      Seq(JoinChange("L", "+I", 7L, 200L, "o200", 1)),
      // customer arrives: the pad must retract via -U(null)/+U(joined)
      Seq(JoinChange("R", "+I", 7L, 7L, "cara", 2)),
      // customer deleted again: back to the pad, not a -D
      Seq(JoinChange("R", "-D", 7L, 7L, "cara", 3))),
      leftOuter = true)
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0) === Set(JoinDelta("+I", 200L, 7L, "o200", null, 1)))
    assert(byBatch(1) === Set(
      JoinDelta("-U", 200L, 7L, "o200", null, 2),
      JoinDelta("+U", 200L, 7L, "o200", "cara", 2)))
    assert(byBatch(2) === Set(
      JoinDelta("-U", 200L, 7L, "o200", "cara", 3),
      JoinDelta("+U", 200L, 7L, "o200", null, 3)))
    assert(materialize(out) === Map((200L, 7L) -> (("o200", null))))
  }

  test("cdc_join rightOuter: unmatched right pads with (null, k) identity; pad dies on first match, reborn on last leave") {
    val out = run2("cj_router", "right", Seq(
      // customer arrives with no orders: right pad (null lpk)
      Seq(JoinChange("R", "+I", 9L, 9L, "dana", 1)),
      // pad renames while live
      Seq(JoinChange("R", "-U", 9L, 9L, "dana", 2),
        JoinChange("R", "+U", 9L, 9L, "DANA", 2)),
      // first order arrives: pad dies (-D), joined row born (+I)
      Seq(JoinChange("L", "+I", 9L, 300L, "o300", 3)),
      // second order: no pad traffic, just the new joined row
      Seq(JoinChange("L", "+I", 9L, 301L, "o301", 4)),
      // both orders leave: joined rows die, pad reborn at the LAST leave
      Seq(JoinChange("L", "-D", 9L, 300L, "o300", 5)),
      Seq(JoinChange("L", "-D", 9L, 301L, "o301", 6)),
      // customer deleted: pad dies for good
      Seq(JoinChange("R", "-D", 9L, 9L, "DANA", 7))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0) === Set(JoinDelta("+I", null, 9L, null, "dana", 1)))
    assert(byBatch(1) === Set(
      JoinDelta("-U", null, 9L, null, "dana", 2),
      JoinDelta("+U", null, 9L, null, "DANA", 2)))
    assert(byBatch(2) === Set(
      JoinDelta("-D", null, 9L, null, "DANA", 3),
      JoinDelta("+I", 300L, 9L, "o300", "DANA", 3)))
    assert(byBatch(3) === Set(JoinDelta("+I", 301L, 9L, "o301", "DANA", 4)))
    assert(byBatch(4) === Set(JoinDelta("-D", 300L, 9L, "o300", "DANA", 5)))
    assert(byBatch(5) === Set(
      JoinDelta("-D", 301L, 9L, "o301", "DANA", 6),
      JoinDelta("+I", null, 9L, null, "DANA", 6)))
    assert(byBatch(6) === Set(JoinDelta("-D", null, 9L, null, "DANA", 7)))
    assert(materialize(out) === Map.empty)
  }

  test("cdc_join fullOuter: pads on BOTH sides — left pad retracts via -U/+U, right pad dies/reborn via -D/+I") {
    val out = run2("cj_full", "full", Seq(
      // order with no customer: LEFT pad (null right payload, (lpk,k) identity)
      Seq(JoinChange("L", "+I", 4L, 400L, "o400", 1)),
      // lone customer on another key: RIGHT pad ((null,k) identity)
      Seq(JoinChange("R", "+I", 8L, 8L, "finn", 2)),
      // the order's customer arrives: left pad retracts -U/+U
      Seq(JoinChange("R", "+I", 4L, 4L, "elle", 3)),
      // the order moves to finn's key: old join row dies; on key 8 the
      // right pad dies and the joined row is born
      Seq(JoinChange("L", "-U", 4L, 400L, "o400", 4),
        JoinChange("L", "+U", 8L, 400L, "o400v2", 4))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0) === Set(JoinDelta("+I", 400L, 4L, "o400", null, 1)))
    assert(byBatch(1) === Set(JoinDelta("+I", null, 8L, null, "finn", 2)))
    assert(byBatch(2) === Set(
      JoinDelta("-U", 400L, 4L, "o400", null, 3),
      JoinDelta("+U", 400L, 4L, "o400", "elle", 3)))
    // key 4: joined row dies AND elle becomes unmatched -> her pad born
    assert(byBatch(3) === Set(
      JoinDelta("-D", 400L, 4L, "o400", "elle", 4),
      JoinDelta("+I", null, 4L, null, "elle", 4),
      JoinDelta("-D", null, 8L, null, "finn", 4),
      JoinDelta("+I", 400L, 8L, "o400v2", "finn", 4)))
    assert(materialize(out) === Map(
      (null: java.lang.Long, 4L) -> ((null, "elle")),
      (java.lang.Long.valueOf(400L), 8L) -> (("o400v2", "finn"))))
  }

  test("cdc_join ver is per-pair monotone: a hot batch touching another pk must not inflate an unrelated pair's stamp") {
    // batch 1 carries pk A@5 together with pk B@100 (same join key);
    // batch 2 updates only A@50. Under a batch-wide stamp A's first
    // delta would read 100 and its REAL later update (50) would look
    // stale to a last-writer-wins consumer. Per-pair stamps must give
    // A: 5 then 50.
    val out = run("cj_ver", Seq(
      Seq(JoinChange("R", "+I", 1L, 1L, "dim", 1),
        JoinChange("L", "+I", 1L, 10L, "a0", 5),
        JoinChange("L", "+I", 1L, 11L, "b0", 100)),
      Seq(JoinChange("L", "-U", 1L, 10L, "a0", 49),
        JoinChange("L", "+U", 1L, 10L, "a1", 50))))
    val aDeltas = out.collect { case (bid, d) if d.lpk == 10L => (bid, d) }
    assert(aDeltas.map(_._2.ver) === Seq(5L, 50L, 50L),
      s"per-pair stamps wrong: $aDeltas")
    // and every pair's stamp sequence is non-decreasing in batch order
    out.groupBy { case (_, d) => (d.lpk, d.k) }.foreach { case (id, ds) =>
      val vers = ds.sortBy(_._1).map(_._2.ver)
      assert(vers === vers.sorted, s"$id: non-monotone vers $vers")
    }
    assert(materialize(out) === Map(
      (java.lang.Long.valueOf(10L), 1L) -> (("a1", "dim")),
      (java.lang.Long.valueOf(11L), 1L) -> (("b0", "dim"))))
  }

  test("cdc_join fullOuter randomized replay materializes to the final-state full-outer join") {
    val rnd = new scala.util.Random(17)
    var ver = 0L
    def v(): Long = { ver += 1; ver }
    // customers 20/21 never receive an order -> guaranteed right pads
    val right = (Seq(20L, 21L) ++ (1L to 10L)).flatMap { c =>
      val b = scala.collection.mutable.ArrayBuffer(
        JoinChange("R", "+I", c, c, s"name$c", v()))
      if (c <= 10 && rnd.nextInt(3) == 0) b += JoinChange("R", "-D", c, c, s"name$c", v())
      b
    }
    val left = (100L until 140L).flatMap { o =>
      var fk = 1L + rnd.nextInt(14) // fks 11..14 have NO right row
      val b = scala.collection.mutable.ArrayBuffer(JoinChange("L", "+I", fk, o, s"o$o", v()))
      if (rnd.nextInt(4) == 0) {
        val nfk = 1L + rnd.nextInt(14)
        b += JoinChange("L", "-U", fk, o, s"o$o", { val x = v(); x })
        b += JoinChange("L", "+U", nfk, o, s"o$o", ver)
        fk = nfk
      }
      if (rnd.nextInt(5) == 0) b += JoinChange("L", "-D", fk, o, s"o$o", v())
      b
    }
    val all = rnd.shuffle((right ++ left).toList)
    val batches = (0 until 4).map(i => all.zipWithIndex.collect {
      case (c, j) if j % 4 == i => c
    })
    val deltas = run2("cj_full_parity", "full", batches)
    def fold(cs: Seq[JoinChange]): Option[JoinChange] = {
      val last = cs.maxBy(c => (c.ver, c.op match {
        case "-U" => 0; case "+I" => 1; case "+U" => 2; case _ => 3
      }))
      if (last.op == "-D" || last.op == "-U") None else Some(last)
    }
    val liveR = right.groupBy(_.pk).flatMap { case (_, cs) => fold(cs.toSeq) }
      .map(c => c.k -> c.payload).toMap
    val liveL = left.groupBy(_.pk).flatMap { case (_, cs) => fold(cs.toSeq) }
    val matchedKeys = liveL.map(_.k).toSet
    val expected: Map[(java.lang.Long, Long), (String, String)] =
      liveL.map { c =>
        ((java.lang.Long.valueOf(c.pk), c.k),
          (c.payload, liveR.getOrElse(c.k, null: String)))
      }.toMap ++
      liveR.collect { case (k, p) if !matchedKeys.contains(k) =>
        ((null: java.lang.Long, k), (null: String, p))
      }
    assert(materialize(deltas) === expected)
    assert(expected.size >= 30, s"degenerate corpus: ${expected.size} live rows")
    assert(expected.keys.exists(_._1 == null), "corpus produced no right pads")
    assert(expected.values.exists(_._2 == null), "corpus produced no left pads")
  }

  test("cdc_join strictVer: stamps are per-key strictly increasing across batches; a -U/+U pair shares one; die/rebirth at a plateaued source ver folds correctly downstream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[JoinChange]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, JoinDelta)]
    val q = CdcJoinStream.joinStream(in.toDS(), "inner", strictVer = true)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName("cj_strict").start()
    try {
      // the plateau trap: left pk 10 carries a DOMINANT ver (100), so
      // the default stamp would freeze at 100 through the right's
      // die (ver 5) and rebirth (ver 6) — strict mode must not
      Seq(
        Seq(JoinChange("R", "+I", 1L, 1L, "dim", 4),
          JoinChange("L", "+I", 1L, 10L, "a0", 100)),
        Seq(JoinChange("R", "-D", 1L, 1L, "dim", 5)), // pair dies
        Seq(JoinChange("R", "+I", 1L, 1L, "dim2", 6)), // pair reborn
        Seq(JoinChange("L", "-U", 1L, 10L, "a0", 101), // rename via -U/+U
          JoinChange("L", "+U", 1L, 10L, "a1", 101))
      ).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val out = buf.synchronized(buf.toVector)
      val ops = out.sortBy(_._1).map(d => (d._2.op, d._2.ver))
      // strictly increasing across batches; the -U/+U pair shares one
      assert(ops.map(_._1) === Seq("+I", "-D", "+I", "-U", "+U"), s"ops: $ops")
      val seqs = ops.map(_._2)
      assert(seqs(0) < seqs(1) && seqs(1) < seqs(2) && seqs(2) < seqs(3), s"stamps not strict: $seqs")
      assert(seqs(3) === seqs(4), s"-U/+U should share a stamp: $seqs")
      // and the deltas fold correctly as a DOWNSTREAM join's input:
      // last-writer-wins by (ver, op rank) per pair must be LIVE a1
      val byPair = out.map(_._2).maxBy(d => (d.ver, Seq("-U", "+I", "+U", "-D").indexOf(d.op)))
      assert(byPair.op === "+U" && byPair.left === "a1" && byPair.right === "dim2")
    } finally q.stop()
  }

  /** Drive the full cascaded chain — orders⋈customers (strictVer) →
    * cascade adapter → (∪ nation changelog) ⋈ nations — and return
    * every final-output delta stamped with its logical STEP (sliced
    * at each processAllAvailable: a trigger racing the two addData
    * calls can split one step across micro-batch ids, so batch ids
    * are not step ids). Customer payload = "name|nationkey";
    * downstream identity = (lpk·10⁶+custkey, nk). */
  private def runCascade(name: String,
      batches: Seq[Seq[JoinChange]]): Seq[(Long, JoinDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in1 = MemoryStream[JoinChange] // orders + customers (join 1)
    val inN = MemoryStream[JoinChange] // nations (join 2 right side)
    val j1 = CdcJoinStream.joinStream(in1.toDS(), "inner", strictVer = true)
    val casc = CdcJoinStream.cascade(j1,
      key2 = d => d.right.split('|')(1).toLong,
      pairPk = d => d.lpk * 1000000L + d.k,
      payload = d => s"${d.left}|${d.right.split('|')(0)}")
    val j2 = CdcJoinStream.joinStream(casc.union(inN.toDS()), "inner")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, JoinDelta)]
    val q = j2.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, JoinDelta)]
      batches.zipWithIndex.foreach { case (b, step) =>
        val (nat, oc) = b.partition(isNation)
        if (oc.nonEmpty) in1.addData(oc: _*)
        if (nat.nonEmpty) inN.addData(nat: _*)
        q.processAllAvailable()
        val drained = buf.synchronized { val v = buf.toVector; buf.clear(); v }
        drained.sortBy(_._1).foreach { case (_, d) => out += ((step.toLong, d)) }
      }
      out.toVector
    } finally q.stop()
  }

  /** spec convention: nation keys live at ≥ 100, customer keys below. */
  private def isNation(c: JoinChange): Boolean = c.k >= 100L

  test("cdc_join cascade: 3-way chain — customer nation move migrates the enriched pair, order fk move crosses both hops, nation updates sweep, deletes kill") {
    val out = runCascade("cj_cascade", Seq(
      // batch 0: nations de/fr, customer 5 in nation 100, order 10 -> 5
      Seq(JoinChange("R", "+I", 100L, 100L, "de", 1),
        JoinChange("R", "+I", 200L, 200L, "fr", 1),
        JoinChange("R", "+I", 5L, 5L, "ann|100", 1),
        JoinChange("L", "+I", 5L, 10L, "70", 1)),
      // batch 1: customer 5 renames AND MOVES NATION 100 -> 200: the
      // enriched pair must die on nation-shard 100 and be born on 200
      Seq(JoinChange("R", "-U", 5L, 5L, "ann|100", 2),
        JoinChange("R", "+U", 5L, 5L, "ANN|200", 2)),
      // batch 2: order 10 moves custkey 5 -> 6 (customer 6 arrives in
      // the same batch, nation 100): pair (10,5) dies on shard 200,
      // pair (10,6) born on shard 100; order 11 -> 5 stays on 200
      Seq(JoinChange("L", "-U", 5L, 10L, "70", 3),
        JoinChange("L", "+U", 6L, 10L, "71", 3),
        JoinChange("R", "+I", 6L, 6L, "bob|100", 3),
        JoinChange("L", "+I", 5L, 11L, "80", 3)),
      // batch 3: nation 100 renames: every live enriched row under it
      // re-emits -U/+U (the downstream sweep)
      Seq(JoinChange("R", "-U", 100L, 100L, "de", 9),
        JoinChange("R", "+U", 100L, 100L, "DE", 9)),
      // batch 4: nation 100 deleted: its enriched rows die
      Seq(JoinChange("R", "-D", 100L, 100L, "DE", 10))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def vless(d: JoinDelta) = (d.op, d.lpk, d.k, d.left, d.right)
    assert(byBatch(0L).map(vless) === Set(("+I", 10000005L: java.lang.Long, 100L, "70|ann", "de")))
    assert(byBatch(1L).map(vless) === Set(
      ("-D", 10000005L: java.lang.Long, 100L, "70|ann", "de"),
      ("+I", 10000005L: java.lang.Long, 200L, "70|ANN", "fr")))
    assert(byBatch(2L).map(vless) === Set(
      ("-D", 10000005L: java.lang.Long, 200L, "70|ANN", "fr"),
      ("+I", 10000006L: java.lang.Long, 100L, "71|bob", "de"),
      ("+I", 11000005L: java.lang.Long, 200L, "80|ANN", "fr")))
    assert(byBatch(3L).map(vless) === Set(
      ("-U", 10000006L: java.lang.Long, 100L, "71|bob", "de"),
      ("+U", 10000006L: java.lang.Long, 100L, "71|bob", "DE")))
    assert(byBatch(4L).map(vless) === Set(
      ("-D", 10000006L: java.lang.Long, 100L, "71|bob", "DE")))
    assert(materialize(out) === Map(
      (java.lang.Long.valueOf(11000005L), 200L) -> (("80|ANN", "fr"))))
  }

  test("cdc_join cascade: randomized dealt 3-way replay materializes to the final-state triple join") {
    val rnd = new scala.util.Random(41)
    var ver = 0L
    def v(): Long = { ver += 1; ver }
    // nations 100..105: rename some, delete one
    val nations = (100L to 105L).flatMap { nk =>
      val b = scala.collection.mutable.ArrayBuffer(
        JoinChange("R", "+I", nk, nk, s"nat$nk", v()))
      if (nk % 2 == 0) {
        b += JoinChange("R", "-U", nk, nk, s"nat$nk", { val x = v(); x })
        b += JoinChange("R", "+U", nk, nk, s"NAT$nk", ver)
      }
      if (nk == 103L) b += JoinChange("R", "-D", nk, nk, s"nat$nk", v())
      b
    }
    // customers 1..10: rename + nation-move on update, some deleted
    val custState = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val custs = (1L to 10L).flatMap { c =>
      var nk = 100L + rnd.nextInt(6)
      var nm = s"name$c"
      val b = scala.collection.mutable.ArrayBuffer(
        JoinChange("R", "+I", c, c, s"$nm|$nk", v()))
      custState(c) = (nm, nk)
      if (rnd.nextBoolean()) {
        val nnk = 100L + rnd.nextInt(6)
        val nnm = s"NAME$c"
        b += JoinChange("R", "-U", c, c, s"$nm|$nk", { val x = v(); x })
        b += JoinChange("R", "+U", c, c, s"$nnm|$nnk", ver)
        nm = nnm; nk = nnk; custState(c) = (nm, nk)
      }
      if (rnd.nextInt(5) == 0) {
        b += JoinChange("R", "-D", c, c, s"$nm|$nk", v())
        custState.remove(c)
      }
      b
    }
    // orders 100..149 -> fks 1..12 (11/12 have no customer), fk moves, deletes
    val orderState = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val orders = (100L until 150L).flatMap { o =>
      var fk = 1L + rnd.nextInt(12)
      var pl = s"o$o"
      val b = scala.collection.mutable.ArrayBuffer(JoinChange("L", "+I", fk, o, pl, v()))
      orderState(o) = (fk, pl)
      (0 until rnd.nextInt(3)).foreach { i =>
        val nfk = 1L + rnd.nextInt(12)
        val npl = s"o${o}v$i"
        b += JoinChange("L", "-U", fk, o, pl, { val x = v(); x })
        b += JoinChange("L", "+U", nfk, o, npl, ver)
        fk = nfk; pl = npl; orderState(o) = (fk, pl)
      }
      if (rnd.nextInt(6) == 0) {
        b += JoinChange("L", "-D", fk, o, pl, v())
        orderState.remove(o)
      }
      b
    }
    // nation live fold
    val natLive = Map(100L -> "NAT100", 101L -> "nat101", 102L -> "NAT102",
      104L -> "NAT104", 105L -> "nat105")
    val all = rnd.shuffle((nations ++ custs ++ orders).toList)
    val batches = (0 until 5).map(i => all.zipWithIndex.collect {
      case (c, j) if j % 5 == i => c
    })
    val deltas = runCascade("cj_cascade_parity", batches)
    val expected: Map[(java.lang.Long, Long), (String, String)] =
      orderState.toSeq.flatMap { case (o, (fk, pl)) =>
        custState.get(fk).flatMap { case (nm, nk) =>
          natLive.get(nk).map(nn =>
            ((java.lang.Long.valueOf(o * 1000000L + fk), nk), (s"$pl|$nm", nn)))
        }
      }.toMap
    assert(materialize(deltas) === expected)
    assert(expected.size >= 15, s"degenerate corpus: ${expected.size} live rows")
    // well-formed retract grammar per downstream identity
    deltas.map(_._2).groupBy(d => (d.lpk, d.k)).foreach { case (id, ds) =>
      var live = false
      ds.foreach { d =>
        d.op match {
          case "+I" => assert(!live, s"$id: +I while live"); live = true
          case "+U" => live = true
          case "-U" => assert(live, s"$id: -U while dead"); live = false
          case "-D" => assert(live, s"$id: -D while dead"); live = false
        }
      }
    }
  }

  test("cdc_join composed with cdc_topn: maintained top-2 enriched facts per dim attribute — member kill promotes, fk move crosses groups, dim rename sweeps the ranking") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.CdcTopNStream
    import graft.streaming.CdcTopNStream.RankDelta
    val in = MemoryStream[JoinChange]
    // join (strictVer — the ranking consumer folds per entity by
    // stamp) -> rank adapter (grp = customer name, entity = the pair,
    // score = order cents) -> retractable top-2 per name
    val ranked = CdcTopNStream.topN(
      CdcJoinStream.toRankChanges(
        CdcJoinStream.joinStream(in.toDS(), "inner", strictVer = true),
        grp = _.right, pairId = d => d.lpk * 1000000L + d.k,
        score = _.left.toDouble),
      n = 2)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, RankDelta)]
    val q = ranked.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[RankDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName("cj_topn").start()
    try {
      Seq(
        // batch 0: ann has orders 10(70) 11(80) 12(90) -> top2 {12, 11}; bob has 13(50)
        Seq(JoinChange("R", "+I", 5L, 5L, "ann", 1),
          JoinChange("R", "+I", 6L, 6L, "bob", 1),
          JoinChange("L", "+I", 5L, 10L, "70", 1),
          JoinChange("L", "+I", 5L, 11L, "80", 1),
          JoinChange("L", "+I", 5L, 12L, "90", 1),
          JoinChange("L", "+I", 6L, 13L, "50", 1)),
        // batch 1: order 12 deleted -> ann member kill, 10 promotes
        Seq(JoinChange("L", "-D", 5L, 12L, "90", 2)),
        // batch 2: order 11 fk-moves to bob at cents 85 -> pair (11,5)
        // dies out of ann's top-2, pair (11,6) enters bob's
        Seq(JoinChange("L", "-U", 5L, 11L, "80", 3),
          JoinChange("L", "+U", 6L, 11L, "85", 3)),
        // batch 3: ann renames to ANN -> every ann member re-enters
        // under the new group (the dim-rename ranking sweep)
        Seq(JoinChange("R", "-U", 5L, 5L, "ann", 4),
          JoinChange("R", "+U", 5L, 5L, "ANN", 4))
      ).foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val out = buf.synchronized(buf.toVector)
      val byBatch = out.groupBy(_._1).view
        .mapValues(_.map(d => (d._2.op, d._2.grp, d._2.id)).toSet).toMap
      def pid(lpk: Long, k: Long) = lpk * 1000000L + k
      assert(byBatch(0L) === Set(
        ("+I", "ann", pid(12, 5)), ("+I", "ann", pid(11, 5)), ("+I", "bob", pid(13, 6))))
      assert(byBatch(1L) === Set(
        ("-D", "ann", pid(12, 5)), ("+I", "ann", pid(10, 5))))
      assert(byBatch(2L) === Set(
        ("-D", "ann", pid(11, 5)), ("+I", "bob", pid(11, 6))))
      assert(byBatch(3L) === Set(
        ("-D", "ann", pid(10, 5)), ("+I", "ANN", pid(10, 5))))
      // final membership == the final-state batch ranking
      val live = scala.collection.mutable.Set.empty[(String, Long)]
      out.foreach { case (_, d) =>
        d.op match {
          case "+I" => assert(live.add((d.grp, d.id)), s"dupe +I $d")
          case "-D" => assert(live.remove((d.grp, d.id)), s"orphan -D $d")
        }
      }
      assert(live.toSet === Set(
        ("ANN", pid(10, 5)), ("bob", pid(11, 6)), ("bob", pid(13, 6))))
    } finally q.stop()
  }

  test("cdc_join composed with cdc_agg: maintained revenue per customer name equals the final-state aggregate") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // small deterministic corpus: orders carry cents in the payload
    val changes = Seq(
      JoinChange("R", "+I", 1L, 1L, "ann", 1),
      JoinChange("R", "+I", 2L, 2L, "bea", 1),
      JoinChange("L", "+I", 1L, 10L, "100", 2),
      JoinChange("L", "+I", 1L, 11L, "250", 2),
      JoinChange("L", "+I", 2L, 12L, "40", 2),
      // order 11 moves to customer 2 with a new amount
      JoinChange("L", "-U", 1L, 11L, "250", 3),
      JoinChange("L", "+U", 2L, 11L, "300", 3),
      // customer 1 renamed: its group moves in the aggregate
      JoinChange("R", "-U", 1L, 1L, "ann", 4),
      JoinChange("R", "+U", 1L, 1L, "ANN", 4),
      // order 12 deleted
      JoinChange("L", "-D", 2L, 12L, "40", 5))
    val batches = Seq(changes.take(5), changes.slice(5, 8), changes.drop(8))
    val in = MemoryStream[JoinChange]
    val latest = scala.collection.mutable.Map.empty[String, (Long, (Long, Long))]
    // the full Flink-SQL-shaped pipeline: changelog join -> retract agg
    val agged = Pipelines.cdcAggStream(
      CdcJoinStream.joinStream(in.toDS())
        .map(d => AggChange(d.op, d.right, d.left.toLong)))
    val q = agged.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GroupAgg], id: Long) =>
        val rows = df.collect()
        latest.synchronized {
          rows.foreach { g =>
            if (!latest.get(g.grp).exists(_._1 > id)) latest(g.grp) = (id, (g.live_cnt, g.live_sum))
          }
        }
      }
      .queryName("cj_agg").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      val got = latest.synchronized(latest.view.mapValues(_._2).toMap.filter(_._2._1 > 0))
      // final states: ANN <- order 10 (100); bea <- order 11 (300)
      assert(got === Map("ANN" -> ((1L, 100L)), "bea" -> ((1L, 300L))))
    } finally q.stop()
  }

  // Tombstone-horizon compaction: 70 left pks under one key die (vers
  // 101..170, pushing maxLeftVer to 170) → deadCnt 70 > max(64, live 0)
  // forces the compaction pass, which drops every tombstone with
  // ver ≤ 170 − 5. Replaying pk 1's ORIGINAL insert (ver 2 — older
  // than the ver-101 delete that killed it) then lands: the fence was
  // compacted. The deliberate violation of the declared promise ("no
  // left row arrives with ver ≤ maxVer − H") is the only way to
  // OBSERVE the drop from outside. Without the horizon, the fence
  // holds forever — the r14 verdict's unbounded-churn leak, now
  // bounded on opt-in.
  private def tombJoinBatches: Seq[Seq[JoinChange]] = Seq(
    JoinChange("R", "+I", 1L, 1L, "dim", 1L) +:
      (1 to 70).map(pk => JoinChange("L", "+I", 1L, pk.toLong, s"p$pk", pk.toLong)),
    (1 to 70).map(pk => JoinChange("L", "-D", 1L, pk.toLong, s"p$pk", 100L + pk)),
    // pk 1's tombstone (ver 101 ≤ 170−5) is compactable; pk 70's
    // (ver 170, above the cutoff) must keep fencing either way
    Seq(JoinChange("L", "+I", 1L, 1L, "late", 2L),
      JoinChange("L", "+I", 1L, 70L, "late70", 70L)))

  test("cdc_join: tombstone horizon compacts expired left fences under churn; default keeps rejecting the late image") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def drive(name: String, horizon: Option[Long]): Map[(java.lang.Long, Long), (String, String)] = {
      val in = MemoryStream[JoinChange]
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, JoinDelta)]
      val q = CdcJoinStream.joinStream(in.toDS(), "inner", strictVer = false,
          tombstoneVerHorizon = horizon)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinDelta], id: Long) =>
          val rows = df.collect()
          buf.synchronized { rows.foreach(r => buf += ((id, r))) }
        }
        .queryName(name).start()
      try {
        tombJoinBatches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        materialize(buf.synchronized(buf.toVector))
      } finally q.stop()
    }
    // horizon: pk 1's ver-101 tombstone compacted (101 ≤ 170 − 5), the
    // late ver-2 original insert resurrects the pair; pk 70's ver-170
    // tombstone sits ABOVE the cutoff and still fences its late image
    val compacted = drive("cj_tomb_h", Some(5L))
    assert(compacted === Map((java.lang.Long.valueOf(1L), 1L) -> (("late", "dim"))))
    // safe default: every tombstone still rejects its late image
    val fenced = drive("cj_tomb_none", None)
    assert(fenced === Map.empty)
  }
}
