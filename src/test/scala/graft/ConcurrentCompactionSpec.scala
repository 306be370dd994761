package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.IvfStream

/** The compaction/probe RACE the retention-lease contract
  * (IvfStream.topK scaladoc) promises to survive: probes on one
  * thread while ingest + compaction commit version swaps on another.
  * Every probe must resolve exactly one committed assembly — rows
  * planted in an already-committed batch stay visible in EVERY
  * overlapped probe (no torn read drops them mid-swap), no probe
  * throws on a GC'd path, and the final streamed state parity-matches
  * the batch-built index over the same corpus.
  */
class ConcurrentCompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("probes racing ingest+compaction see one committed assembly each: planted recall never flickers, no GC'd-path reads") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfr").toString
    val modelDir = Files.createTempDirectory("graft_ivfr_model").toString
    val batchDir = Files.createTempDirectory("graft_ivfr_batch").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))

      // batch 0 plants EXACT COPIES of every query vector (cos 1.0):
      // once committed, each query's top-k must contain its copy in
      // every subsequent probe — visibility that can never flicker
      // if (and only if) probes read whole committed assemblies
      val planted = queries.select(($"query_id" + 999000).as("vec_id"), $"qv".as("v"))
      IvfStream.processBatch(planted, 0, root, model, compactEvery = 2)

      // ingest thread: 6 more batches, compacting every 2 — three
      // version swaps + GC racing the probe loop below
      val slices = (0 until 6).map(b => emb.filter($"vec_id" % 6 === b))
      val ingestErr = new AtomicReference[Throwable]()
      val ingest = new Thread(() => {
        try slices.zipWithIndex.foreach { case (s, i) =>
          IvfStream.processBatch(s, i + 1L, root, model, compactEvery = 2)
        } catch { case t: Throwable => ingestErr.set(t) }
      }, "ivf-ingest-race")
      ingest.start()

      var probes = 0
      var overlapped = 0
      while (ingest.isAlive) {
        val got = IvfStream.topK(spark, root, queries, modelDir, nprobe = 8, k = 5)
          .select($"query_id", $"neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        probes += 1
        if (ingest.isAlive) overlapped += 1
        // the planted copy is in EVERY query's top-k, every time
        val byQuery = got.groupBy(_._1)
        byQuery.foreach { case (q, ns) =>
          assert(ns.exists(_._2 == q + 999000),
            s"probe $probes lost planted copy for query $q mid-swap")
        }
        assert(byQuery.nonEmpty)
      }
      ingest.join()
      assert(ingestErr.get() == null, s"ingest thread failed: ${ingestErr.get()}")
      assert(overlapped >= 2,
        s"race did not overlap ($overlapped probes during ingest) — slow down the ingest thread")

      // final parity: streamed assembly == one-shot batch build of the
      // identical corpus
      IvfIndex.build(emb.unionByName(planted), model, batchDir)
      def rs(df: org.apache.spark.sql.DataFrame) =
        df.select($"query_id", $"neighbor_id", $"rnk")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(rs(IvfStream.topK(spark, root, queries, modelDir, 8, 5)) ==
        rs(IvfIndex.topK(spark, batchDir, queries, model, 8, 5)))
    } finally Seq(root, modelDir, batchDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
