package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Layout}

/** Streaming maintenance of the inverted text index — q118's
  * micro-batch twin, closing the keyword index batch/stream the way
  * [[ZOrderStream]] closed the Z-order layout (both ride
  * [[CompactingLake]] for ingest/compaction/visibility mechanics).
  *
  * Ingest converts each arriving doc batch to its AT-REST form —
  * (term, doc_id) distinct postings, the same explode
  * [[InvertedIndex.build]] performs — as map-side per-batch work, so
  * the lake's schema is uniform across compact history and tail and a
  * lookup needs no per-query re-tokenization of raw docs. The explode
  * is deterministic (one tokenizer convention), so a replayed batch
  * commits identical postings. Compaction rewrites the committed
  * postings range-clustered on (term, doc_id): lookups prune row
  * groups over all but the last `compactEvery` batches, whose
  * unclustered postings are bounded by the compaction interval.
  *
  * Contract note: doc_ids must not RE-ARRIVE with changed text across
  * batches — postings are append-only here (the CDC-maintained
  * variant would ride the changelog operators instead). Re-arrival of
  * the SAME batch (replay) is safe by the engine's overwrite rule.
  */
object KeywordIndexStream {

  /** One micro-batch of (doc_id, text) ingest. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes,
      (df, dst, files) =>
        Layout.clusteredWrite(df, dst, Seq("term", "doc_id"), files, blockBytes),
      ingest = postings)

  /** foreachBatch adapter. */
  def sink(root: String, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, compactEvery, targetBytes, blockBytes)

  /** Docs → distinct (doc_id, term) postings: the one at-rest schema. */
  private def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
        .as("term"))

  /** Conjunctive lookup over everything committed: compact history
    * (term-pruned row groups) + the bounded unclustered tail. Same
    * count-equals-k shape as [[InvertedIndex.lookupAll]] — postings
    * are distinct per (doc, term) within every committed dir and doc
    * ids never re-arrive (contract above), so the count is exact. */
  def lookupAll(spark: SparkSession, root: String, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "KeywordIndexStream.lookupAll: need at least one term")
    CompactingLake.visible(spark, root)
      .filter(col("term").isin(t: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === t.size)
      .select("doc_id")
  }
}
