package graft.sinks

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.BatchVersioned

/** CONTINUOUS training-shard packing — the streaming end of the
  * chunk→pack path (batch twins: q111 chunking → q47/q77 packing): an
  * unbounded stream of (id, n_tok) chunks is assigned to fixed-token
  * shards as it arrives, with shard ids and offsets CONTINUING across
  * micro-batches and restarts — the landing path that turns an
  * arriving 100 TB corpus into ready training shards without a final
  * global repack.
  *
  * Per micro-batch: the batch's chunks are ordered deterministically
  * (by id), given global positions via the DISTRIBUTED prefix sum
  * (operators.Prefix.cumsum — never a single-partition window) PLUS
  * the stream's carried token high-water, and written to an
  * idempotent `b=<batchId>` directory; the new high-water persists as
  * a tiny `_meta/v=<batchId>` version. A shard can SPAN a batch
  * boundary: the carry is the token total, not a rounded-up shard id,
  * so the boundary shard's tail fills from the next batch — packing
  * is BYTE-IDENTICAL to a one-shot batch pack of the concatenated
  * input (spec'd), which is what makes backfill (batch) and live
  * (stream) shards interchangeable. That law's PRECONDITION — ids
  * monotone across micro-batches, since the one-shot pack sorts the
  * whole corpus by id while the stream sorts per batch — is asserted
  * per batch against the persisted max packed id, never silently
  * assumed (see [[writeBatch]]).
  *
  * Replay safety (the BatchVersioned discipline): a replayed batch
  * reads the high-water from STRICTLY OLDER meta versions only, so it
  * recomputes exactly its original positions and overwrites exactly
  * its own output directory — no dupes, no gaps, no drift. Driver
  * state is two longs read from at-rest meta; executors hold nothing
  * between batches.
  */
object ShardPackSink {

  case class Chunk(id: Long, n_tok: Long)

  private def metaDir(root: String) = s"$root/_meta"

  /** (token high-water, max packed id) BEFORE `batchId`
    * (strictly-older reads). `max_id` tolerates metas written before
    * the guard existed (treated as "no bound"). */
  private def meta(spark: SparkSession, root: String, batchId: Long): (Long, Long) = {
    val versions = BatchVersioned.versions(spark, metaDir(root)).filter(_._1 < batchId)
    versions.lastOption.map { case (_, d) =>
      val m = spark.read.parquet(d)
      val hw = m.select("hw").head().getLong(0)
      val mid = if (m.columns.contains("max_id")) m.select("max_id").head().getLong(0)
        else Long.MinValue
      (hw, mid)
    }.getOrElse((0L, Long.MinValue))
  }

  /** Pack one micro-batch. Call from `foreachBatch`. Cache scope is
    * THREAD-LOCAL (CachePool.scoped): the prefix sum caches its
    * ranged input, and a global drain here would unpersist a
    * concurrent query's blocks — the exact cross-query bug the r6
    * review fixed in ClusterMaintenance.
    *
    * PRECONDITION (asserted, not assumed): chunk ids are MONOTONE
    * across micro-batches — every id in this batch exceeds the max
    * id already packed. Positions are assigned batch-by-batch (carry
    * + per-batch id sort) while the one-shot law sorts the WHOLE
    * corpus by id, so a later batch delivering a smaller id would
    * silently diverge from the "byte-identical to a one-shot pack"
    * contract. The max packed id persists in `_meta` beside the
    * high-water, and a violating batch is rejected LOUDLY (sort or
    * re-sequence upstream — e.g. chunk ids minted as
    * `doc_id * maxChunks + idx` from an id-ordered source). Replay
    * is unaffected: a replayed batch reads strictly-older meta, so
    * its own ids never fence it. */
  def writeBatch(df: Dataset[Chunk], batchId: Long, root: String, seqLen: Long): Unit = {
    require(seqLen > 0, s"ShardPackSink: seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    graft.CachePool.scoped {
      val (base, prevMaxId) = meta(spark, root, batchId)
      val positioned = graft.operators.Prefix.cumsum(
          df.toDF(), ord = Seq(col("id")), value = col("n_tok"), cumCol = "__cum")
        .withColumn("__pos", col("__cum") - col("n_tok") + lit(base))
        .select(col("id"), col("n_tok"),
          expr(s"__pos div $seqLen").as("pack_id"),
          (col("__pos") % seqLen).as("pack_offset"))
      // guard BEFORE the output write: a violating batch must leave
      // neither a divergent b= dir nor a meta version behind (the
      // cumsum's scoped cache makes the extra action cheap)
      val stats = positioned.agg(sum(col("n_tok")), min(col("id")), max(col("id"))).head()
      val empty = stats.isNullAt(0)
      if (!empty) require(stats.getLong(1) > prevMaxId,
        s"ShardPackSink: batch $batchId delivers id ${stats.getLong(1)} <= the max already-packed " +
          s"id $prevMaxId — cross-batch id monotonicity is the one-shot-pack law's precondition")
      positioned.write.mode("overwrite").parquet(s"$root/b=$batchId")
      val newHw = base + (if (empty) 0L else stats.getLong(0))
      val newMaxId = if (empty) prevMaxId else math.max(prevMaxId, stats.getLong(2))
      import spark.implicits._
      Seq((newHw, newMaxId)).toDF("hw", "max_id").coalesce(1)
        .write.mode("overwrite").parquet(s"${metaDir(root)}/v=$batchId")
    }
  }

  /** foreachBatch adapter: `chunks.writeStream.foreachBatch(
    * ShardPackSink.sink(root, seqLen))`. */
  def sink(root: String, seqLen: Long): (Dataset[Chunk], Long) => Unit =
    (df, batchId) => writeBatch(df, batchId, root, seqLen)

  /** All packed chunks across committed batch directories. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val dirs = BatchVersioned.versions(spark, root, prefix = "b")
    dirs.map { case (_, d) => spark.read.parquet(d) }
      .reduceOption(_.unionByName(_))
      .getOrElse(BatchVersioned.emptyDf(spark,
        "id BIGINT, n_tok BIGINT, pack_id BIGINT, pack_offset BIGINT"))
  }
}
