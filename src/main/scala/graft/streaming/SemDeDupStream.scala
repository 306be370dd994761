package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.IvfIndex

/** Streaming SemDeDup — the micro-batch twin of batch q53, closing the
  * same batch/stream asymmetry [[ClusterMaintenance]] closed for the
  * shingle-cluster family: batch jobs SemDeDup a corpus once; this
  * maintains the keep/drop verdict table as embeddings arrive.
  *
  * The cell model is the PERSISTED q53 k-means ([[IvfIndex.load]] from
  * `modelDir` — a pure driver-side file read, ZERO jobs over the
  * embeddings table; training happened once, offline, exactly like the
  * at-rest IVF index). Per micro-batch, against two batch-versioned
  * at-rest tables under `root/` (per-cell corpus deltas
  * `corpus/b=<batch>` and verdict versions `verdicts/v=<batch>`):
  *
  *  1. assign the batch's vectors to (cell, sub) via the loaded
  *     model's codegen kernel (+ the same second-level sign-LSH
  *     sub-bucket q53 uses past the centroid cap) — shuffle-free;
  *  2. candidate pairs = batch × prior corpus on (cell, sub) plus
  *     intra-batch pairs, filtered to cos ≥ tau; each unordered
  *     qualifying pair {u, w} is seen exactly ONCE, in the batch where
  *     its later-arriving member lands;
  *  3. orient pairs to (u = smaller vec_id, w = larger) and take
  *     min(u) per w — a LATE-arriving low id can lower an EXISTING
  *     vector's dup_of, so prior verdicts merge via least(): dup_of is
  *     a minimum over the pair set, min is associative, and therefore
  *     the final table equals batch q53's output for ANY arrival
  *     order (the [[graft.operators.Dedup.foldPairsIntoClusters]]
  *     min-label argument, applied to dup_of);
  *  4. write `verdicts/v=<batch>` (vec_id, cell, keep, dup_of — the
  *     exact q53 schema) and the corpus delta `corpus/b=<batch>`.
  *
  * Replay-safe by the [[BatchVersioned]] contract: strictly-older
  * reads, own-output overwrites, `_SUCCESS`-gated versions.
  */
object SemDeDupStream {
  import BatchVersioned._

  /** Latest committed verdict table: (vec_id, cell, keep, dup_of). */
  def loadVerdicts(spark: SparkSession, root: String): DataFrame =
    versions(spark, s"$root/verdicts").lastOption
      .map { case (_, d) => spark.read.parquet(d)
        .select(col("vec_id"), col("cell"), col("keep"), col("dup_of")) }
      .getOrElse(emptyDf(spark, "vec_id BIGINT, cell INT, keep BOOLEAN, dup_of BIGINT"))

  private def verdictsBefore(spark: SparkSession, root: String, batchId: Long): DataFrame =
    versions(spark, s"$root/verdicts").filter(_._1 < batchId).lastOption
      .map { case (_, d) => spark.read.parquet(d)
        .select(col("vec_id"), col("cell"), col("sub"), col("dup_of")) }
      .getOrElse(emptyDf(spark, "vec_id BIGINT, cell INT, sub INT, dup_of BIGINT"))

  /** One micro-batch; `batch` must carry (vec_id BIGINT,
    * v ARRAY<DOUBLE>). Wire via
    * `emb.writeStream.foreachBatch(sink(spark, root, modelDir)).start()`. */
  def processBatch(batch: DataFrame, batchId: Long, root: String, modelDir: String,
      tau: Double = 0.92, subBits: Int = 0): Unit =
    processBatch(batch, batchId, root,
      IvfIndex.load(batch.sparkSession, modelDir), tau, subBits)

  /** Same, against an already-loaded (pinned) model. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      model: IvfIndex.Model, tau: Double, subBits: Int): Unit = {
    val spark = batch.sparkSession
    val assigned = IvfIndex.assignCells(batch.select(col("vec_id"), col("v")), model)
      .withColumn("sub", graft.queries.SimilarityQ.semdedupSubKey(col("v"), subBits))
      .select(col("vec_id"), col("cell"), col("sub"), col("v"))
      .persist()
    try {
      val prior = readBefore(spark, s"$root/corpus",
        "vec_id BIGINT, cell INT, sub INT, v ARRAY<DOUBLE>, b BIGINT", batchId)
        .select(col("vec_id"), col("cell"), col("sub"), col("v"))
      // cross pairs: both orientations matter (an old lower id drops a
      // new vector; a NEW lower id retro-drops an old one) — orient by
      // least/greatest so min(u) per w is well-defined
      val cross = prior.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
            col("a.vec_id") =!= col("b.vec_id") &&
            VectorFunctions.cosine(col("a.v"), col("b.v")) >= tau)
        .select(least(col("a.vec_id"), col("b.vec_id")).as("u"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("w"))
      val intra = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
            col("a.vec_id") < col("b.vec_id") &&
            VectorFunctions.cosine(col("a.v"), col("b.v")) >= tau)
        .select(col("a.vec_id").as("u"), col("b.vec_id").as("w"))
      val minUp = cross.unionByName(intra)
        .groupBy(col("w")).agg(min(col("u")).as("cand"))
      val prev = verdictsBefore(spark, root, batchId)
      // merge: least() skips NULLs, so an untouched verdict keeps its
      // dup_of, a touched one takes the smaller of old and new
      val updatedOld = prev
        .join(minUp, prev("vec_id") === minUp("w"), "left")
        .select(prev("vec_id"), col("cell"), col("sub"),
          least(col("dup_of"), col("cand")).as("dup_of"))
      val newRows = assigned.select(col("vec_id"), col("cell"), col("sub"))
        .join(minUp, assigned("vec_id") === minUp("w"), "left")
        .select(assigned("vec_id"), col("cell"), col("sub"), col("cand").as("dup_of"))
      updatedOld.unionByName(newRows)
        .select(col("vec_id"), col("cell"), col("sub"),
          col("dup_of").isNull.as("keep"), col("dup_of"))
        .write.mode("overwrite").parquet(s"$root/verdicts/v=$batchId")
      assigned.write.mode("overwrite").parquet(s"$root/corpus/b=$batchId")
    } finally assigned.unpersist(blocking = false)
  }

  /** foreachBatch adapter. The model is loaded ONCE and pinned for
    * the sink's lifetime (the [[IvfStream.sink]] argument: a
    * mid-stream retrain must swap in a new root, never re-cell a
    * live verdict table). */
  def sink(spark: SparkSession, root: String, modelDir: String,
      tau: Double = 0.92, subBits: Int = 0): (DataFrame, Long) => Unit = {
    val model = IvfIndex.load(spark, modelDir)
    (batch, batchId) => processBatch(batch, batchId, root, model, tau, subBits)
  }
}
