package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Layout

/** Streaming maintenance of a Z-order-clustered lake table — the
  * micro-batch twin of [[Layout.zorderWrite]] (q115), completing the
  * layout family's batch/stream story the way [[IvfStream]] did for
  * the ANN index and [[ClusterMaintenance]] for the dedup clusters:
  * the table is laid out once offline, and this keeps it clustered as
  * rows arrive.
  *
  * The ingest/compaction/visibility mechanics (batch-versioned
  * arrival dirs, `_SUCCESS`-gated shard/chunk/bounds versions with
  * re-derived file counts, replay idempotence, per-shard GC with the
  * one-version lease, the bounded unclustered tail, key-range-sharded
  * folds with bounded per-fold input) live in [[CompactingLake]] —
  * shared verbatim with the index lakes. This file contributes only
  * what is Z-order-specific: shard fold rewrites are
  * [[Layout.zorderWrite]] with quantile boundaries RE-DERIVED from
  * the fold's own input (the cell grid tracks distribution drift
  * per shard, per epoch), the shard ranges are lexicographic on
  * `keys` (range-disjoint shards; the Z layout lives INSIDE each
  * fold), and L1 slices sort by the interleaved Z cell so even the
  * chunk row groups keep multi-key pruning. */
object ZOrderStream {

  private def sharding(keys: Seq[String], bitsPerKey: Int,
      blockBytes: Long, splitBytes: Long,
      foldCap: Int = CompactingLake.DefaultFoldCap): CompactingLake.Sharding =
    CompactingLake.Sharding(
      shardCols = keys,
      splitBytes = splitBytes,
      foldCap = foldCap,
      chunkOptions = Map("parquet.block.size" -> blockBytes.toString),
      sliceSort = Some(df => Seq(Layout.zorderValue(df, keys, bitsPerKey))))

  /** One micro-batch of ingest. `keys`/`bitsPerKey` parameterize the
    * compaction rewrite; they must stay fixed for the root's lifetime
    * (a key change mid-stream would mix grids across versions —
    * rebuild into a fresh root instead, the IvfStream retrain rule). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      keys: Seq[String], bitsPerKey: Int = 8, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20, blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(keys, bitsPerKey, blockBytes),
      sharding(keys, bitsPerKey, blockBytes, splitBytes, foldCap),
      majorFrac = majorFrac, maxL1 = maxL1, minFoldBytes = minFoldBytes)

  /** foreachBatch adapter. */
  def sink(root: String, keys: Seq[String], bitsPerKey: Int = 8,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, keys, bitsPerKey, compactEvery,
        targetBytes, blockBytes, majorFrac, maxL1, splitBytes, foldCap,
        minFoldBytes)

  private def rewrite(keys: Seq[String], bitsPerKey: Int,
      blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => Layout.zorderWrite(df, dst, keys, files, bitsPerKey, blockBytes)

  /** Kept for tests/tools that drive a compaction directly. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      keys: Seq[String], bitsPerKey: Int, targetBytes: Long,
      blockBytes: Long = 128L << 20,
      splitBytes: Long = CompactingLake.DefaultSplitBytes): Unit =
    CompactingLake.compact(spark, root, batchId, targetBytes,
      rewrite(keys, bitsPerKey, blockBytes),
      sharding(keys, bitsPerKey, blockBytes, splitBytes))

  /** Every row a reader may see — [[CompactingLake.visible]]. */
  def visible(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)

  /** The folded (shard) portion alone (layout evidence). */
  private[graft] def compactPart(spark: SparkSession, root: String): Option[DataFrame] =
    CompactingLake.basePart(spark, root)

  /** Filtered read over [[visible]] — named so call sites say what
    * the layout buys: predicates on the cluster keys prune row groups
    * across the whole compacted history. */
  def scan(spark: SparkSession, root: String, predicate: org.apache.spark.sql.Column): DataFrame =
    visible(spark, root).filter(predicate)
}
