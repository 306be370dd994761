package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{InvertedIndex, Layout}

/** Streaming maintenance of the inverted text index — q118's
  * micro-batch twin, closing the keyword index batch/stream the way
  * [[ZOrderStream]] closed the Z-order layout (both ride
  * [[CompactingLake]] for ingest/compaction/visibility mechanics,
  * including the round-17 key-range-sharded folds: postings shards
  * are term ranges, so a fold rewrites one term range's postings,
  * never the index).
  *
  * Ingest converts each arriving doc batch to its AT-REST form —
  * (term, doc_id) distinct postings, the same explode
  * [[InvertedIndex.build]] performs — as map-side per-batch work, so
  * the lake's schema is uniform across compact history and tail and a
  * lookup needs no per-query re-tokenization of raw docs. The explode
  * is deterministic (one tokenizer convention), so a replayed batch
  * commits identical postings. Compaction rewrites committed postings
  * range-clustered on (term, doc_id): lookups prune row groups over
  * all folded history, the unclustered tail is bounded by the
  * compaction interval, and L1 slices are each internally clustered.
  *
  * Contract note: doc_ids must not RE-ARRIVE with CHANGED text across
  * batches — postings are append-only here (the CDC-maintained
  * variant would ride the changelog operators instead). Re-arrival of
  * the SAME batch (replay) is safe by the engine's overwrite rule,
  * and identical-text re-arrival in a LATER batch (at-least-once
  * upstream delivery) is also safe: it duplicates posting rows across
  * committed dirs, which [[InvertedIndex.lookupAll]]'s
  * count-DISTINCT-terms shape is immune to.
  */
object KeywordIndexStream {

  private def sharding(blockBytes: Long, splitBytes: Long,
      foldCap: Int = CompactingLake.DefaultFoldCap): CompactingLake.Sharding =
    CompactingLake.Sharding(
      shardCols = Seq("term", "doc_id"),
      splitBytes = splitBytes,
      foldCap = foldCap,
      chunkOptions = Map("parquet.block.size" -> blockBytes.toString))

  /** One micro-batch of (doc_id, text) ingest. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes,
      (df, dst, files) =>
        Layout.clusteredWrite(df, dst, Seq("term", "doc_id"), files, blockBytes),
      sharding(blockBytes, splitBytes, foldCap),
      // term-sorted arrival files — free in-partition sort after the
      // explode's distinct shuffle; tail lookups row-group-prune
      ingest = InvertedIndex.postings(_)
        .sortWithinPartitions(col("term"), col("doc_id")),
      majorFrac = majorFrac, maxL1 = maxL1, minFoldBytes = minFoldBytes)

  /** foreachBatch adapter. */
  def sink(root: String, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, compactEvery, targetBytes, blockBytes,
        majorFrac, maxL1, splitBytes, foldCap, minFoldBytes)

  /** Conjunctive lookup over everything committed: folded history
    * (term-pruned row groups) + slices + the bounded unclustered
    * tail — THE shared [[InvertedIndex.lookupAll]] definition over
    * the lake's visible assembly (its count-distinct shape is what
    * makes identical-text re-arrival safe here). */
  def lookupAll(spark: SparkSession, root: String, terms: Seq[String]): DataFrame =
    InvertedIndex.lookupAll(CompactingLake.visible(spark, root), terms)
}
