package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.IvfStream

/** Streaming IVF index ingest: micro-batched appends against the
  * persisted (frozen) centroid model must serve probes identical to
  * the batch-built index over the same corpus. */
class IvfStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("streamed index == batch index for every probe; torn batch dirs invisible until replay commits") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfs").toString
    val batchDir = Files.createTempDirectory("graft_ivfs_batch").toString
    val modelDir = Files.createTempDirectory("graft_ivfs_model").toString

    val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
    IvfIndex.save(model, modelDir, spark)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))

    // batch reference: the one-shot index build
    IvfIndex.build(emb, model, batchDir)
    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = resultSet(IvfIndex.topK(spark, batchDir, queries, model, nprobe = 8, k = 5))

    // the same corpus streamed in 3 arrival batches
    (0 until 3).foreach { b =>
      IvfStream.processBatch(emb.filter($"vec_id" % 3 === b), b, root, modelDir)
    }
    val streamed = resultSet(IvfStream.topK(spark, root, queries, modelDir, nprobe = 8, k = 5))
    assert(streamed == want)
    assert(streamed.nonEmpty)

    // a crashed 4th batch leaves a TORN directory (no _SUCCESS) full of
    // junk — probes must not see it...
    // (the planted vectors are COPIES of query vectors: once committed
    // they cos-1.0 into their queries' top-k, so visibility is
    // unambiguous)
    val extra = emb.filter($"vec_id" % 50 === 0).limit(3)
      .select(($"vec_id" + 999000).as("vec_id"), $"v")
    extra.withColumn("cell", lit(0))
      .write.partitionBy("cell").parquet(s"$root/b=3")
    Files.delete(java.nio.file.Paths.get(s"$root/b=3/_SUCCESS"))
    assert(resultSet(IvfStream.topK(spark, root, queries, modelDir, 8, 5)) == want)
    // ...until the replay commits it (overwriting the torn attempt),
    // after which the new vectors are probe-visible
    IvfStream.processBatch(extra, 3, root, modelDir)
    val after = resultSet(IvfStream.topK(spark, root, queries, modelDir, 8, 5))
    assert(after != want, "replayed batch's vectors must become probe-visible")
    assert(after.exists { case (_, nid, _) => nid >= 999000 })

    Seq(root, batchDir, modelDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("compaction: probes unchanged, one file per cell, history GC'd, pre-compact replays and torn compacts invisible") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfc").toString
    val modelDir = Files.createTempDirectory("graft_ivfc_model").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      def probe() = IvfStream.topK(spark, root, queries, modelDir, nprobe = 8, k = 5)
        .select($"query_id", $"neighbor_id", $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      def dirExists(p: String) = java.nio.file.Files.exists(java.nio.file.Paths.get(p))

      (0 until 6).foreach { b =>
        IvfStream.processBatch(emb.filter($"vec_id" % 6 === b), b, root, modelDir)
      }
      val want = probe()
      assert(want.nonEmpty)

      // compact batches 0..3; probes must not move
      IvfStream.compact(spark, root, 4)
      assert(probe() == want)
      // one data file per cell in the compact version — the batch
      // build's layout, and the whole point (probe opens ~1 file per
      // probed cell from deep history instead of one per batch)
      val cellDirs = java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/compact/v=4"))
        .toArray.map(_.toString).filter(_.contains("cell="))
      assert(cellDirs.nonEmpty)
      cellDirs.foreach { d =>
        val files = java.nio.file.Files.list(java.nio.file.Paths.get(d))
          .toArray.map(_.toString).filter(_.endsWith(".parquet"))
        assert(files.length == 1, s"$d has ${files.length} data files")
      }

      // a replayed PRE-COMPACTION batch recommits identical rows (the
      // frozen-model contract) and stays invisible to probes — its
      // rows already live in the compact version, no double counting
      IvfStream.processBatch(emb.filter($"vec_id" % 6 === 1), 1, root, modelDir)
      assert(probe() == want)

      // a torn compaction attempt (no _SUCCESS) is invisible
      val torn = java.nio.file.Paths.get(s"$root/compact/v=99")
      java.nio.file.Files.createDirectories(torn)
      assert(probe() == want)
      graft.tools.FileUtil.deleteTree(torn)

      // second compaction folds the tail in; older history GC'd:
      // everything below the PREVIOUS version (4) goes, v=4 itself is
      // kept for a replay of batch 6's compaction
      IvfStream.compact(spark, root, 6)
      assert(probe() == want)
      assert(dirExists(s"$root/compact/v=6") && dirExists(s"$root/compact/v=4"))
      (0 until 4).foreach(b => assert(!dirExists(s"$root/b=$b"), s"b=$b should be GC'd"))
      (4 until 6).foreach(b => assert(dirExists(s"$root/b=$b"), s"b=$b must survive (>= prev version)"))

      // sink-style auto-compaction wires the same path
      val root2 = Files.createTempDirectory("graft_ivfc2").toString
      try {
        val sink = IvfStream.sink(spark, root2, modelDir, compactEvery = 2)
        (0 until 5).foreach { b => sink(emb.filter($"vec_id" % 5 === b), b) }
        assert(IvfStream.topK(spark, root2, queries, modelDir, 8, 5)
          .select($"query_id", $"neighbor_id", $"rnk")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet == want)
        assert(dirExists(s"$root2/compact/v=4"))
      } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root2))
    } finally Seq(root, modelDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
