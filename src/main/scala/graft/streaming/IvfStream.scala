package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Streaming maintenance of the at-rest IVF index — the micro-batch
  * twin of [[IvfIndex.build]], completing the ANN family's
  * batch/stream story the way [[ClusterMaintenance]] (q41) and
  * [[SemDeDupStream]] (q53) did for the dedup family: the index is
  * built once offline, and this keeps it current as embeddings
  * arrive.
  *
  * Per micro-batch: load the persisted centroid model
  * ([[IvfIndex.load]] — driver-side file read, ZERO jobs over the
  * embeddings table), assign the batch's vectors with the codegen
  * kernel (shuffle-free scan), and write them under
  * `root/b=<batchId>/cell=<c>/` — the same `cell` partition layout as
  * the batch index, nested under an arrival-batch dir so a replayed
  * batch overwrites exactly its own output ([[BatchVersioned]]
  * replay contract; `b` and `cell` are BOTH partition columns, so
  * probe-time dynamic partition pruning still reads only the probed
  * cells' directories across every arrival batch).
  *
  * Centroids are FROZEN between retrains, exactly like a production
  * IVF deployment (FAISS's add-after-train): assignment stays
  * consistent for every probe, and a periodic offline retrain +
  * reindex (the batch [[IvfIndex.build]]) swaps in a new root when
  * drift warrants it. [[topK]] is the batch probe run against the
  * streamed layout.
  */
object IvfStream {

  /** One micro-batch of index ingest against an already-loaded
    * model; `batch` carries (vec_id, v). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      model: IvfIndex.Model): Unit = {
    IvfIndex.assignCells(batch.select(col("vec_id"), col("v")), model)
      // same row layout as the batch build: SQ8 codes ride alongside
      // the vectors so the streamed index serves topKSq8 too
      .withColumn("code", graft.functions.VectorExpressions.sq8Encode(col("v")))
      // and the same cell co-location before the partitioned write:
      // without it every batch task writes a sliver into every cell
      // dir, and the file count grows as batches × tasks × cells
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/b=$batchId")
  }

  /** Convenience: load-then-ingest in one call (tests / one-shot
    * use). Long-lived streams should use [[sink]], which PINS the
    * model. */
  def processBatch(batch: DataFrame, batchId: Long, root: String, modelDir: String): Unit =
    processBatch(batch, batchId, root, IvfIndex.load(batch.sparkSession, modelDir))

  /** foreachBatch adapter. The model is loaded ONCE and pinned for
    * the sink's lifetime: per-batch reloads would let a retrain
    * mid-stream assign different batches under different centroid
    * spaces INSIDE ONE ROOT — the probe then prunes wrong cells for
    * every pre-retrain batch. A retrain swaps in a whole new root
    * (see the class doc), never mutates a live one. */
  def sink(spark: SparkSession, root: String, modelDir: String): (DataFrame, Long) => Unit = {
    val model = IvfIndex.load(spark, modelDir)
    (batch, batchId) => processBatch(batch, batchId, root, model)
  }

  /** Probe the streamed index: identical semantics and plan shape to
    * [[IvfIndex.topK]] over a batch-built index — broadcast probe
    * cells, DPP-pruned scan of only the probed `cell=` directories
    * (across all COMMITTED arrival batches: `_SUCCESS`-gated, so a
    * crashed batch's partial directory is invisible until its replay
    * commits), exact cosine top-k. */
  def topK(spark: SparkSession, root: String, queries: DataFrame,
      modelDir: String, nprobe: Int, k: Int): DataFrame = {
    val model = IvfIndex.load(spark, modelDir)
    val committed = BatchVersioned.versions(spark, root, prefix = "b").map(_._2)
    require(committed.nonEmpty, s"no committed index batches under $root")
    val idx = spark.read.option("basePath", root).parquet(committed: _*)
    IvfIndex.topK(idx, queries, model, nprobe, k)
  }
}
