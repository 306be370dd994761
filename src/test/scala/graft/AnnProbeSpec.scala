package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.{IvfIndex, Layout}
import graft.streaming.{AnnProbeStream, IvfChangelog}

/** Streaming ANN probe over the maintained IVF changelog layout:
  * micro-batch results are row-identical to batch `topK` at the same
  * index state, recall is gated against the q29 brute-force truth
  * (the RecallSpec bar), the candidate scan stays cell-pruned under
  * foreachBatch execution, and a mid-stream index CHANGE is visible
  * to the next probe batch (the rotation-visibility contract;
  * IvfDriftSpec's crash-window test drives its post-replay probe
  * through this operator). */
class AnnProbeSpec extends AnyFunSuite {
  import TestSpark._

  test("stream_ann_probe: batch parity, recall gate, cell-pruned scans, index changes visible between batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_annprobe").toString
    val modelDir = Files.createTempDirectory("graft_annprobe_model").toString
    val ckpt = Files.createTempDirectory("graft_annprobe_ckpt").toString
    try {
      val e = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
      val nVecs = e.count()
      val model = queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val ingest = IvfChangelog.sink(spark, root, modelDir, compactEvery = 0)
      ingest(e.withColumn("row_kind", lit("+I")), 0L)

      // q38's probe width so the recall bar is RecallSpec's
      val cellBits = graft.operators.Adaptive.bits(
        graft.sources.Tables.embeddingCount(spark, sfDir), targetBucket = 32, lo = 4, hi = 8)
      val nprobe = cellBits + 3
      // q29's query set, dealt into two micro-batches
      val qs = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
        .as[(Long, Seq[Double])].collect().toSeq
      assert(qs.size >= 8, s"degenerate query set: ${qs.size}")
      val (qb1, qb2) = qs.partition(_._1 % 100 === 0)

      val in = MemoryStream[(Long, Seq[Double])]
      val got = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
      val scanned = scala.collection.mutable.Map.empty[Long, Long]
      val q = AnnProbeStream.start(
        in.toDF().toDF("query_id", "qv"), root, modelDir,
        nprobe = nprobe, k = 5, checkpointDir = ckpt) { (df, id) =>
        // scan-row evidence first (executes this exact plan)
        val (_, s) = Layout.scanRows(df)
        scanned.synchronized(scanned(id) = s)
        val rows = df.select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        got.synchronized(got(id) = rows)
      }
      try {
        in.addData(qb1); q.processAllAvailable()
        in.addData(qb2); q.processAllAvailable()

        // 1. parity: streamed == one batch topK over the full set
        val batchRef = IvfChangelog.topK(spark, root,
          e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")),
          modelDir, nprobe, k = 5)
          .select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val streamed = got.synchronized(got.values.flatten.toSet)
        assert(streamed === batchRef, "streamed probe diverges from batch topK on the same index")

        // 2. recall gate (RecallSpec's q38 floor) vs q29 brute truth
        val truth = SparkEntry.queries("q29_ann_brute_topk")(spark, sfDir)
          .filter($"rnk" <= 5)
          .select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        CachePool.drain()
        val recall = (truth & streamed).size.toDouble / truth.size
        info(f"stream probe recall@5 = $recall%.2f")
        assert(recall >= 0.8, f"streamed IVF recall below the trained-centroid floor: $recall%.2f")

        // 3. an index CHANGE lands between batches: delete the top
        // neighbor of one query, re-probe it, neighbor gone
        val victimQ = qb1.head._1
        val victim = got.synchronized(got(0L)).collect { case (q0, nb) if q0 == victimQ => nb }.head
        ingest(e.filter($"vec_id" === victim).withColumn("row_kind", lit("-D")), 1L)
        in.addData(Seq(qs.find(_._1 == victimQ).get)); q.processAllAvailable()
        val after = got.synchronized(got(2L))
        assert(!after.contains((victimQ, victim)),
          s"probe batch after the delete still returns the tombstoned neighbor $victim")
        assert(after.count(_._1 == victimQ) === 5, "re-probe should backfill to k")

        // 4. cell pruning held under foreachBatch: the single-query
        // re-probe batch must scan ONLY its probed cells' rows (the
        // static pushdown — a multi-query batch's probed-cell union
        // covers the whole toy corpus, so batch 2 is the evidence)
        val probedCells = IvfIndex.probeCells(
            e.filter($"vec_id" === victimQ).select($"vec_id".as("query_id"), $"v".as("qv")),
            $"qv", model, nprobe)
          .select($"cell").distinct().collect().map(_.getInt(0)).toSet
        val expected = IvfIndex.assignCells(e, model)
          .filter($"cell".isin(probedCells.toSeq.map(Integer.valueOf): _*)).count()
        assert(expected < nVecs,
          s"vacuous pruning check: the probed cells hold the whole corpus ($expected of $nVecs)")
        val s2 = scanned.synchronized(scanned(2L))
        // +1 for the victim's tombstone row, small slack for the
        // local probe-side scan nodes
        assert(s2 <= expected + 8,
          s"single-query probe scanned $s2 rows but its ${probedCells.size} probed cells hold only $expected — pruning lost under streaming")
      } finally q.stop()
    } finally Seq(root, modelDir, ckpt).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("stream_ann_probe coded shortlist (streamed IVF-quantized composition): deep-R parity with the exact path, recall floor, vector column pruned from the candidate scan") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_annsl").toString
    val modelDir = Files.createTempDirectory("graft_annsl_model").toString
    val ckpt = Files.createTempDirectory("graft_annsl_ckpt").toString
    try {
      val e = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
      val model = queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      IvfChangelog.sink(spark, root, modelDir, compactEvery = 0)(
        e.withColumn("row_kind", lit("+I")), 0L)
      val cellBits = graft.operators.Adaptive.bits(
        graft.sources.Tables.embeddingCount(spark, sfDir), targetBucket = 32, lo = 4, hi = 8)
      val nprobe = cellBits + 3
      val queriesDf = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))

      // deep shortlist (R >= any candidate count at this SF): the
      // two-phase coded path must return EXACTLY the exact path's
      // pairs — the approximation is only WHICH candidates re-rank
      val deepR = 1 << 20
      val exact = IvfChangelog.topK(spark, root, queriesDf, modelDir, nprobe, k = 5)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val deep = IvfChangelog.topK(spark, root, queriesDf, modelDir, nprobe, k = 5,
        shortlistR = deepR)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(deep === exact, "deep-R coded shortlist diverges from the exact path")

      // streamed: production shortlist depth (q59's 20) through
      // AnnProbeStream — recall holds the SQ8 floor (RecallSpec: the
      // int8 approximation costs no meaningful recall on top of IVF)
      val qs = queriesDf.as[(Long, Seq[Double])].collect().toSeq
      val in = MemoryStream[(Long, Seq[Double])]
      val got = scala.collection.mutable.Set.empty[(Long, Long)]
      var planStr = ""
      val q = AnnProbeStream.start(
        in.toDF().toDF("query_id", "qv"), root, modelDir,
        nprobe = nprobe, k = 5, checkpointDir = ckpt, shortlistR = 20) { (df, _) =>
        planStr = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val rows = df.select($"query_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= rows; () }
      }
      try { in.addData(qs); q.processAllAvailable() } finally q.stop()
      val truth = SparkEntry.queries("q29_ann_brute_topk")(spark, sfDir)
        .filter($"rnk" <= 5)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      CachePool.drain()
      val streamed = got.synchronized(got.toSet)
      val recall = (truth & streamed).size.toDouble / truth.size
      info(f"streamed coded-shortlist recall@5 = $recall%.2f")
      assert(recall >= 0.8, f"coded shortlist degraded recall below the SQ8 floor: $recall%.2f")

      // phase 1 (the code-only candidate scan) materializes behind the
      // bounded-id checkpoint, so the final plan shows only phase 2:
      // its vector fetch must carry the shortlisted ids as a pushed
      // native In — row groups holding no shortlisted id never pay
      // their vector pages
      assert(planStr.contains("In(vec_id"),
        s"phase-2 vector fetch lost the shortlist-id pushdown:\n${planStr.take(2000)}")
      val schemaLines = planStr.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(schemaLines.exists(_.contains("v:array")),
        s"no vector-fetch scan found:\n${schemaLines.mkString("\n")}")
      // and phase 1's OWN plan (exposed as codedShortlist) provably
      // never reads the 8x-larger vector column: every scan in it is
      // code-only — the I/O property the mode exists for
      val p1 = IvfChangelog.codedShortlist(
        IvfChangelog.visible(spark, root),
        IvfIndex.probeCells(queriesDf, $"qv", model, nprobe), shortlistR = 20)
      val p1Schemas = p1.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(p1Schemas.nonEmpty && p1Schemas.forall(!_.contains("v:array")),
        s"phase-1 candidate scan reads the vector column:\n${p1Schemas.mkString("\n")}")

      // round-16 review regression: an UPDATE pair legally shares
      // (vec_id, ver) between its live row and its tombstone in the
      // same tail dir — the phase-2 (vec_id, ver) rejoin must filter
      // to LIVE rows or it duplicates the neighbor with a NULL cosine
      val movers = e.filter($"vec_id" % 7 === 0)
      IvfChangelog.sink(spark, root, modelDir, compactEvery = 0)(
        movers.withColumn("row_kind", lit("-U"))
          .unionByName(movers
            .withColumn("v", expr("transform(v, x -> x * 0.5 + 0.01)"))
            .withColumn("row_kind", lit("+U")))
          .withColumn("seq", lit(1L)), 1L)
      // seqCol-free path: one live write per key per batch holds (the
      // -U rows only emit tombstones, the +U rows the live images)
      val updated = IvfChangelog.topK(spark, root, queriesDf, modelDir, nprobe,
        k = 5, shortlistR = 20).collect()
      assert(!updated.exists(_.isNullAt(2)),
        "shortlist re-rank produced a NULL cosine — tombstone row joined into phase 2")
      val pairs = updated.map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.length === pairs.distinct.length,
        "shortlist re-rank duplicated a (query, neighbor) pair")
      // and deep-R parity with the exact path still holds post-update
      val exactU = IvfChangelog.topK(spark, root, queriesDf, modelDir, nprobe, k = 5)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val deepU = IvfChangelog.topK(spark, root, queriesDf, modelDir, nprobe, k = 5,
        shortlistR = deepR)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(deepU === exactU, "deep-R diverges from exact after an update batch")
    } finally Seq(root, modelDir, ckpt).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("stream_ann_probe recall telemetry: per-batch estimate on a drifted index, nprobe escalation restores the floor and sticks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_annrec").toString
    val modelDir = Files.createTempDirectory("graft_annrec_model").toString
    val ckpt = Files.createTempDirectory("graft_annrec_ckpt").toString
    try {
      val e = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
      // DRIFTED index: centroids trained on HALF the corpus, ALL
      // vectors ingested — the unseen half lands in ill-fitting
      // cells, which is exactly the silent-degradation shape the
      // telemetry exists to catch
      val half = e.filter($"vec_id" % 2 === 0)
      val cellBits = graft.operators.Adaptive.bits(
        graft.sources.Tables.embeddingCount(spark, sfDir), targetBucket = 32, lo = 4, hi = 8)
      val model = IvfIndex.train(half, cells = 1 << cellBits, iters = 8,
        memoKey = s"$sfDir#annrec-drift")
      IvfIndex.save(model, modelDir, spark)
      IvfChangelog.sink(spark, root, modelDir, compactEvery = 0)(
        e.withColumn("row_kind", lit("+I")), 0L)

      val qs = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
        .as[(Long, Seq[Double])].collect().toSeq
      val (qb1, qb2) = qs.partition(_._1 % 100 === 0)

      val telem = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Int)]
      val in = MemoryStream[(Long, Seq[Double])]
      val q = AnnProbeStream.start(
        in.toDF().toDF("query_id", "qv"), root, modelDir,
        nprobe = 1, k = 5, checkpointDir = ckpt,
        recallSample = 8, recallFloor = 0.9, maxNprobe = 1 << cellBits,
        telemetry = (id, est, np) => telem.synchronized { telem += ((id, est, np)); () }) {
        (df, _) => df.count(); ()
      }
      try {
        in.addData(qb1); q.processAllAvailable()
        in.addData(qb2); q.processAllAvailable()
      } finally q.stop()
      val t = telem.synchronized(telem.toVector).sortBy(_._1)
      assert(t.size === 2, s"one telemetry line per batch: $t")
      // batch 0: nprobe 1 on a drifted index sits under the floor →
      // the probe escalates until the estimate clears it (full-width
      // probing is exhaustive, so headroom always suffices here)
      val (_, est0, np0) = t(0)
      assert(np0 > 1, s"drifted index at nprobe=1 should have escalated: $t")
      assert(est0 >= 0.9, s"sinked results must not ship below the floor with headroom left: $t")
      // batch 1 STARTS at the escalated width — no re-learning
      val (_, est1, np1) = t(1)
      assert(np1 >= np0, s"escalation must stick across batches: $t")
      assert(est1 >= 0.9, s"escalated width must hold the floor: $t")
    } finally Seq(root, modelDir, ckpt).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
