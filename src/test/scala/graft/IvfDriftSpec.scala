package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.IvfIndex
import graft.streaming.IvfChangelog

/** Centroid drift under the frozen-model contract, and the retrain
  * rotation that cures it. [[IvfChangelog]] pins its model forever;
  * sustained cell-moving updates eventually push the live set into
  * regions the training never saw, where it CROWDS into the few
  * nearest cells. The degradation axis is probe COST (a probed cell
  * is scanned whole, so max-cell occupancy is the candidate-volume
  * driver), with recall at risk second-order; both are measured here
  * against a freshly trained model on the same final state. The cure:
  * [[IvfChangelog.occupancySkew]] as the compaction-time trigger and
  * [[IvfChangelog.compactRewrite]] as the swap (rewrite history under
  * the NEW model at the compact point, persist the model, restart).
  */
class IvfDriftSpec extends AnyFunSuite {
  import TestSpark._

  private val n = 20000L
  private val cells = 64
  private val nprobe = 8

  private def vecs(ids: org.apache.spark.sql.DataFrame, seed: Long) = {
    val mixed = VectorFunctions.Sql.mixSpark(s"vec_id * 64 + k + $seed")
    ids.select(col("vec_id"),
      expr(s"transform(sequence(0, 63), k -> cast($mixed as double) / 1000.0)").as("v"))
  }

  /** Exact cosine top-k ground truth (q29's broadcast-query shape). */
  private def bruteTop5(state: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    state.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        nanvl(VectorFunctions.cosine(col("qv"), col("v")), lit(-2.0)).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
  }

  private def recallAt5(idx: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) => (idx.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      .sum / truth.size

  private def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  test("drift: sustained directional re-embedding crowds the frozen model's cells to brute-force cost; compactRewrite under a fresh model restores balance at exact parity") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_drift").toString
    val modelDir = Files.createTempDirectory("graft_drift_model").toString
    val freshDir = Files.createTempDirectory("graft_drift_fresh").toString
    val batchDir = Files.createTempDirectory("graft_drift_batch").toString
    try {
      val ids = spark.range(n).select($"id".as("vec_id"))
      val base = vecs(ids, seed = 31337)
      // the drifted position: a tight cone around the e1 axis (dim 0
      // dominates, per-vector hash noise on the rest) — cell
      // assignment is direction-based (IvfIndex.quantize normalizes),
      // so a NEW dominant direction the training never saw is exactly
      // the drift that crowds the frozen cells (think: a lake
      // re-embedding its corpus with a new encoder whose outputs
      // cluster differently)
      val noise = VectorFunctions.Sql.mixSpark("vec_id * 64 + k + 777001")
      val drifted = ids.select($"vec_id",
        expr(s"transform(sequence(0, 63), k -> case when k = 0 then 100.0" +
          s" else cast($noise as double) / 1000.0 end)").as("v"))

      val frozen = IvfIndex.train(base, cells, iters = 3, memoKey = "drift-frozen",
        sampleMod = IvfIndex.sampleMod(n, cells))
      IvfIndex.save(frozen, modelDir, spark)

      // batch 0: insert all; batches 1-3: 60% of keys drift (re-embed
      // at the collapsed position) in three waves — the before-image
      // is the ORIGINAL vector, the after-image the drifted one
      IvfChangelog.processBatch(
        base.withColumn("row_kind", lit("+I")), 0, root, frozen)
      (1 to 3).foreach { b =>
        val wave = $"vec_id" % 5 < 3 && $"vec_id" % 3 === (b - 1)
        val chg = base.filter(wave).withColumn("row_kind", lit("-U"))
          .unionByName(drifted.filter(wave).withColumn("row_kind", lit("+U")))
        IvfChangelog.processBatch(chg, b.toLong, root, frozen)
      }
      val finalState = base.filter($"vec_id" % 5 >= 3)
        .unionByName(drifted.filter($"vec_id" % 5 < 3))

      // measurements against a FRESH model trained on the final state
      val fresh = IvfIndex.train(finalState, cells, iters = 3, memoKey = "drift-fresh",
        sampleMod = IvfIndex.sampleMod(n, cells))
      val (skewFrozen, liveFrozen) = IvfChangelog.occupancySkew(spark, root)
      val freshOcc = IvfIndex.assignCells(finalState, fresh).groupBy($"cell").count()
        .agg(max($"count"), avg($"count")).head
      val skewFresh = freshOcc.getLong(0) / freshOcc.getDouble(1)
      assert(liveFrozen == n)
      assert(skewFrozen > 3 * skewFresh,
        s"drift did not skew the frozen cells: frozen=$skewFrozen fresh=$skewFresh")

      // recall@5 on queries AT drifted positions, vs exact cosine truth
      val queries = drifted.filter($"vec_id" % 5 < 3 && $"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      val truth = bruteTop5(finalState, queries)
      val frozenTop = topkSets(
        IvfChangelog.topK(spark, root, queries, modelDir, nprobe, k = 5))
      IvfIndex.build(finalState, fresh, freshDir)
      val freshTop = topkSets(
        IvfIndex.topK(spark, freshDir, queries, fresh, nprobe, k = 5))
      // recall direction under drift is data-dependent (crowded cells
      // are still PROBED — the frozen model's reliable degradation is
      // cost, asserted below); both numbers are recorded for the
      // STRESS accounting
      val (rFrozen, rFresh) = (recallAt5(frozenTop, truth), recallAt5(freshTop, truth))
      info(f"skew frozen=$skewFrozen%.1f fresh=$skewFresh%.1f; recall@5 frozen=$rFrozen%.3f fresh=$rFresh%.3f")

      // candidate volume (the real cost): sum of probed-cell sizes
      def candidateVolume(state: org.apache.spark.sql.DataFrame,
          model: IvfIndex.Model): Long =
        IvfIndex.assignCells(state, model).groupBy($"cell").count()
          .join(IvfIndex.probeCells(queries, col("qv"), model, nprobe), Seq("cell"))
          .agg(sum($"count")).head.getLong(0)
      val volFrozen = candidateVolume(finalState, frozen)
      val volFresh = candidateVolume(finalState, fresh)
      info(s"probe candidate volume: frozen=$volFrozen fresh=$volFresh")
      assert(volFrozen > 2 * volFresh,
        s"crowding should inflate frozen candidate volume: $volFrozen vs $volFresh")

      // THE SWAP: compact-rewrite the full history under the fresh
      // model, persist it over the pinned dir, probe — exact parity
      // with a one-shot fresh build, and the skew is cured
      IvfChangelog.compactRewrite(spark, root, batchId = 4, fresh)
      IvfIndex.save(fresh, modelDir, spark)
      val swapped = topkSets(
        IvfChangelog.topK(spark, root, queries, modelDir, nprobe, k = 5))
      assert(swapped == freshTop, "post-swap probe diverges from the fresh-built index")
      val (skewSwapped, liveSwapped) = IvfChangelog.occupancySkew(spark, root)
      assert(liveSwapped == n)
      assert(skewSwapped < skewFrozen / 3,
        s"rewrite did not cure the skew: $skewSwapped vs $skewFrozen")

      // the stream continues under the NEW model: a post-swap delete
      // batch tombstones in new-model cells and the key disappears
      val victim = drifted.filter($"vec_id" === 0)
      IvfChangelog.processBatch(
        victim.withColumn("row_kind", lit("-D")), 5, root, fresh)
      val probeVictim = IvfChangelog.topK(spark, root,
        victim.select($"vec_id".as("query_id"), $"v".as("qv")), modelDir, nprobe, k = 5)
        .filter($"neighbor_id" === 0).count()
      assert(probeVictim == 0, "post-swap delete left the key probeable")
    } finally Seq(root, modelDir, freshDir, batchDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("auto-rotation: a drifting STREAM crosses the skew threshold, the sink rotates at the compact point, probes stay correct, post-swap batches ingest under the new model") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_rot").toString
    val modelDir = Files.createTempDirectory("graft_rot_model").toString
    val refDir = Files.createTempDirectory("graft_rot_ref").toString
    try {
      val nr = 8000L
      val ids = spark.range(nr).select($"id".as("vec_id"))
      val base = vecs(ids, seed = 40127)
      val noise = VectorFunctions.Sql.mixSpark("vec_id * 64 + k + 555001")
      val drifted = ids.select($"vec_id",
        expr(s"transform(sequence(0, 63), k -> case when k = 0 then 100.0" +
          s" else cast($noise as double) / 1000.0 end)").as("v"))
      val frozen = IvfIndex.train(base, cells, iters = 3, memoKey = "rot-frozen",
        sampleMod = IvfIndex.sampleMod(nr, cells))
      IvfIndex.save(frozen, modelDir, spark)

      def rows(df: org.apache.spark.sql.DataFrame, kind: String): Seq[VecChange] =
        df.collect().map(r => VecChange(kind, r.getLong(0),
          r.getSeq[Double](1).toArray)).toSeq
      val baseRows = rows(base, "+I")
      val upsD = rows(drifted, "+U")
      val retrB = rows(base, "-U")

      // the drifting stream: insert all, then three -U/+U drift waves,
      // then a touch batch landing ON the compact point (batchId 4,
      // compactEvery 4) where the sink must measure skew and rotate,
      // then a post-rotation delete that must tombstone in NEW cells
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[VecChange]
      val q = in.toDS().toDF().writeStream
        .foreachBatch(IvfChangelog.sink(spark, root, modelDir,
          compactEvery = 4, rotateSkewAbove = 6.0))
        .queryName("ivf_rotate").start()
      try {
        def wave(b: Int)(c: VecChange) = c.vec_id % 5 < 3 && c.vec_id % 3 == b - 1
        in.addData(baseRows); q.processAllAvailable() // batch 0
        (1 to 3).foreach { b =>
          in.addData(retrB.filter(wave(b)) ++ upsD.filter(wave(b)))
          q.processAllAvailable() // batches 1-3: the drift
        }
        // key 1 drifted in wave 2; re-upsert at its current position —
        // a content no-op that triggers the batch-4 compact point
        in.addData(Seq(upsD.find(_.vec_id == 1L).get))
        q.processAllAvailable() // batch 4: rotation fires here
        val rotated = IvfIndex.load(spark, modelDir)
        assert(!java.util.Arrays.deepEquals(
          rotated.cent.asInstanceOf[Array[AnyRef]], frozen.cent.asInstanceOf[Array[AnyRef]]),
          "rotation did not fire: model dir still holds the frozen centroids")
        val (skewAfter, liveAfter) = IvfChangelog.occupancySkew(spark, root)
        assert(liveAfter == nr)
        assert(skewAfter < 6.0, s"rotation left skew at $skewAfter")

        // probes through the rotated at-rest layout == a one-shot
        // build of the SAME live state under the SAME rotated model
        val finalState = base.filter($"vec_id" % 5 >= 3)
          .unionByName(drifted.filter($"vec_id" % 5 < 3))
        val queries = drifted.filter($"vec_id" % 5 < 3 && $"vec_id" % 40 === 0)
          .select($"vec_id".as("query_id"), $"v".as("qv"))
        val got = topkSets(
          IvfChangelog.topK(spark, root, queries, modelDir, nprobe, k = 5))
        IvfIndex.build(finalState, rotated, refDir)
        val ref = topkSets(
          IvfIndex.topK(spark, refDir, queries, rotated, nprobe, k = 5))
        assert(got == ref, "post-rotation probe diverges from a one-shot build under the rotated model")

        // post-rotation ingest runs under the NEW model: delete key 0
        // (before-image = its current drifted vector) through the
        // STREAM and it must become unprobeable
        in.addData(Seq(upsD.find(_.vec_id == 0L).get.copy(row_kind = "-D")))
        q.processAllAvailable() // batch 5
        val victimHits = IvfChangelog.topK(spark, root,
          drifted.filter($"vec_id" === 0L).select($"vec_id".as("query_id"), $"v".as("qv")),
          modelDir, nprobe, k = 5)
          .filter($"neighbor_id" === 0L).count()
        assert(victimHits == 0, "post-rotation delete left the key probeable")
      } finally q.stop()
    } finally Seq(root, modelDir, refDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
  test("rotation replay fence: a crash AFTER the rotation commits but BEFORE the checkpoint does must not clobber the rotated layout on replay") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rotreplay").toString
    val modelDir = Files.createTempDirectory("graft_rotreplay_model").toString
    val refDir = Files.createTempDirectory("graft_rotreplay_ref").toString
    try {
      val nr = 4000L
      val ids = spark.range(nr).select($"id".as("vec_id"))
      val base = vecs(ids, seed = 50261)
      val noise = VectorFunctions.Sql.mixSpark("vec_id * 64 + k + 333001")
      val drifted = ids.select($"vec_id",
        expr(s"transform(sequence(0, 63), k -> case when k = 0 then 100.0" +
          s" else cast($noise as double) / 1000.0 end)").as("v"))
      val frozen = IvfIndex.train(base, cells, iters = 3, memoKey = "rotreplay-frozen",
        sampleMod = IvfIndex.sampleMod(nr, cells))
      IvfIndex.save(frozen, modelDir, spark)

      // the sink closure IS what foreachBatch calls — drive it
      // directly so the replay window is exact: batch 0 inserts all,
      // batch 1 drifts 60% of keys into a tight cone, batch 2 lands
      // on the compact point (compactEvery = 2) and fires the
      // rotation (model save + compactRewrite) before ingesting
      def mkSink() = IvfChangelog.sink(spark, root, modelDir,
        compactEvery = 2, rotateSkewAbove = 6.0)
      val sink1 = mkSink()
      sink1(base.withColumn("row_kind", lit("+I")), 0L)
      val wave = $"vec_id" % 5 < 3
      sink1(base.filter(wave).withColumn("row_kind", lit("-U"))
        .unionByName(drifted.filter(wave).withColumn("row_kind", lit("+U"))), 1L)
      val touch = drifted.filter($"vec_id" === 1L).withColumn("row_kind", lit("+U"))
      sink1(touch, 2L) // rotation fires here and COMMITS
      val rotated = IvfIndex.load(spark, modelDir)
      assert(!java.util.Arrays.deepEquals(
        rotated.cent.asInstanceOf[Array[AnyRef]], frozen.cent.asInstanceOf[Array[AnyRef]]),
        "precondition: rotation did not fire at batch 2")

      // CRASH between the rotation's commits and the streaming
      // checkpoint's: the restarted query re-runs batch 2 through a
      // FRESH sink closure (new driver = new closure, model re-read).
      // Pre-fence this replay re-measured LOW skew on the rewritten
      // layout and plain-compacted v=2 from the retained OLD-model
      // b= dirs — silently mismatching modelDir forever.
      val sink2 = mkSink()
      sink2(touch, 2L)

      assert(java.util.Arrays.deepEquals(
        IvfIndex.load(spark, modelDir).cent.asInstanceOf[Array[AnyRef]],
        rotated.cent.asInstanceOf[Array[AnyRef]]),
        "replay changed the persisted model")
      val (skewAfter, liveAfter) = IvfChangelog.occupancySkew(spark, root)
      assert(liveAfter == nr)
      assert(skewAfter < 6.0, s"replay clobbered the rotated layout: skew=$skewAfter")

      // probes through the replayed index == one-shot build of the
      // same live state under the rotated model — the exact parity
      // the pre-fence replay broke. The probe is driven through the
      // STREAMING operator (AnnProbeStream, one micro-batch) so the
      // crash window composes with the continuous query side too:
      // the per-batch model re-read must pick up the rotated model.
      val finalState = base.filter(!wave).unionByName(drifted.filter(wave))
      val queries = drifted.filter(wave && $"vec_id" % 40 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      implicit val ctx = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
      val gotBuf = scala.collection.mutable.Set.empty[(Long, Long)]
      val probeQ = graft.streaming.AnnProbeStream.start(
        in.toDF().toDF("query_id", "qv"), root, modelDir, nprobe, k = 5,
        checkpointDir = Files.createTempDirectory("graft_rotreplay_probe").toString,
        queryName = "rotreplay_probe") { (df, _) =>
        val rows = df.select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        gotBuf.synchronized { rows.foreach(gotBuf += _) }
      }
      val got = try {
        in.addData(queries.as[(Long, Seq[Double])].collect().toSeq)
        probeQ.processAllAvailable()
        gotBuf.synchronized(gotBuf.toSet).groupBy(_._1)
          .map { case (q, xs) => q -> xs.map(_._2).toSet }
      } finally probeQ.stop()
      IvfIndex.build(finalState, rotated, refDir)
      val ref = topkSets(
        IvfIndex.topK(spark, refDir, queries, rotated, nprobe, k = 5))
      assert(got == ref, "post-replay probe diverges from a one-shot build under the rotated model")

      // and the stream continues correctly: a post-replay delete
      // tombstones under the (still-)rotated model and the key
      // becomes unprobeable
      sink2(drifted.filter($"vec_id" === 0L).withColumn("row_kind", lit("-D")), 3L)
      val victimHits = IvfChangelog.topK(spark, root,
        drifted.filter($"vec_id" === 0L).select($"vec_id".as("query_id"), $"v".as("qv")),
        modelDir, nprobe, k = 5)
        .filter($"neighbor_id" === 0L).count()
      assert(victimHits == 0, "post-replay delete left the key probeable")
    } finally Seq(root, modelDir, refDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}

/** MemoryStream element for the auto-rotation spec (top-level: Spark
  * product encoders need a stable, outer-free case class). */
case class VecChange(row_kind: String, vec_id: Long, v: Array[Double])
