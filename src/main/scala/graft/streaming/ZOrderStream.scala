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
  * arrival dirs, `_SUCCESS`-gated compact versions with re-derived
  * file counts, replay idempotence, GC below the previous version,
  * the bounded unclustered tail, the one-version retention lease)
  * live in [[CompactingLake]] — shared verbatim with
  * [[KeywordIndexStream]]. This file contributes only what is
  * Z-order-specific: the compaction rewrite is [[Layout.zorderWrite]]
  * with quantile boundaries RE-DERIVED from the full committed data,
  * so the cell grid tracks distribution drift across ingest epochs.
  */
object ZOrderStream {

  /** One micro-batch of ingest. `keys`/`bitsPerKey` parameterize the
    * compaction rewrite; they must stay fixed for the root's lifetime
    * (a key change mid-stream would mix grids across versions —
    * rebuild into a fresh root instead, the IvfStream retrain rule). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      keys: Seq[String], bitsPerKey: Int = 8, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20, blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(keys, bitsPerKey, blockBytes),
      majorFrac = majorFrac, maxL1 = maxL1)

  /** foreachBatch adapter. */
  def sink(root: String, keys: Seq[String], bitsPerKey: Int = 8,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, keys, bitsPerKey, compactEvery,
        targetBytes, blockBytes, majorFrac, maxL1)

  private def rewrite(keys: Seq[String], bitsPerKey: Int,
      blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => Layout.zorderWrite(df, dst, keys, files, bitsPerKey, blockBytes)

  /** Kept for tests/tools that drive a compaction directly. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      keys: Seq[String], bitsPerKey: Int, targetBytes: Long,
      blockBytes: Long = 128L << 20): Unit =
    CompactingLake.compact(spark, root, batchId, targetBytes,
      rewrite(keys, bitsPerKey, blockBytes))

  /** Every row a reader may see — [[CompactingLake.visible]]. */
  def visible(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)

  /** The compacted portion alone (layout evidence). */
  private[graft] def compactPart(spark: SparkSession, root: String): Option[DataFrame] =
    CompactingLake.compactPart(spark, root)

  /** Filtered read over [[visible]] — named so call sites say what
    * the layout buys: predicates on the cluster keys prune row groups
    * across the whole compacted history. */
  def scan(spark: SparkSession, root: String, predicate: org.apache.spark.sql.Column): DataFrame =
    visible(spark, root).filter(predicate)
}
