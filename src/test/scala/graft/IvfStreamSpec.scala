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
}
