package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Layout}

/** Streaming maintenance of the RANKED inverted index — q119/q120's
  * micro-batch twin, closing the ranked-retrieval batch/stream the
  * way [[KeywordIndexStream]] closed the boolean one (the FOURTH
  * [[CompactingLake]] instantiation).
  *
  * Ingest converts each doc batch to the ranked at-rest form —
  * (term, doc_id, tf, dl), [[InvertedIndex.rankedPostings]]'s one
  * definition — so the lake's schema is uniform across base, L1
  * chunks and tail. Compaction rewrites clustered on (term, doc_id)
  * WITH the per-row-group doc_id blooms the rarest-first probe
  * pushes against, and commits a per-LEVEL corpus-stats sidecar
  * ((n_docs, sum_dl) of exactly that level's docs, `_SUCCESS`-gated
  * like the manifest): BM25's N/avgdl then come from SUMMING the
  * level sidecars — levels partition the doc space, so the sum is
  * exact — plus an on-the-fly fold over the bounded unclustered tail
  * (and over any level whose sidecar write crashed: the
  * manifest-window rule, cost in time never in rows).
  *
  * Delivery contract (q118's, tightened for stats): doc_ids must not
  * re-arrive with CHANGED text. IDENTICAL re-arrival (at-least-once
  * upstream) keeps tf/df/score-per-doc EXACT — the lookups first
  * deduplicate the probed postings by (term, doc_id) max, and
  * term/doc_id predicates push through that aggregate to the scans —
  * but a duplicate doc spanning two LEVELS double-counts in the
  * summed N/sum_dl, shifting every score's constants proportionally
  * to the duplicate rate (ranking-stable, documented approximation;
  * replay of the SAME batch is exact by the engine's overwrite
  * rule). One more stats nuance: a ZERO-token doc emits no postings
  * and is invisible to the lake's stats, while the batch builder's
  * docs.count() includes it — empty docs can never match any query,
  * so only the constants differ, by the empty-doc rate. */
object RankedIndexStream {

  /** One micro-batch of (doc_id, text) ingest. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(batch.sparkSession, blockBytes),
      ingest = InvertedIndex.rankedPostings,
      majorFrac = majorFrac, maxL1 = maxL1)

  /** foreachBatch adapter. */
  def sink(root: String, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, compactEvery, targetBytes,
        blockBytes, majorFrac, maxL1)

  private def rewrite(spark: SparkSession, blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => {
      val ndv = math.max(1024L, blockBytes / 16)
      Layout.clusteredWrite(df, dst, Seq("term", "doc_id"), files, blockBytes,
        options = Map(
          "parquet.bloom.filter.enabled#doc_id" -> "true",
          "parquet.bloom.filter.expected.ndv#doc_id" -> ndv.toString))
      // the level's OWN corpus stats, from the postings it just wrote
      // (dl rides every posting of a doc identically — max dedupes)
      statsOfPostings(spark.read.parquet(dst))
        .coalesce(1) // one row by construction
        .write.mode("overwrite")
        .parquet(s"$dst/${InvertedIndex.StatsSubDir}")
    }

  /** (n_docs, sum_dl) of a postings relation — one bounded fold. */
  private def statsOfPostings(postings: DataFrame): DataFrame =
    postings.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))

  private def statsCommitted(spark: SparkSession, dir: String): Boolean =
    BatchVersioned.exists(spark,
      s"$dir/${InvertedIndex.StatsSubDir}/_SUCCESS")

  /** Corpus stats over everything committed: summed level sidecars +
    * an on-the-fly fold over the tail and any sidecar-less level. */
  private def stats(spark: SparkSession, root: String): (Long, Long) = {
    val lv = CompactingLake.readerDirs(spark, root)
    val levels = lv.base.toSeq ++ lv.l1s
    val (withS, withoutS) = levels.partition(d => statsCommitted(spark, d._2))
    val sidecars = withS.map { case (_, d) =>
      val r = spark.read.parquet(s"$d/${InvertedIndex.StatsSubDir}").head()
      (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
    }
    val flyDirs = withoutS.map(_._2) ++ lv.tail
    val fly =
      if (flyDirs.isEmpty) Seq.empty
      else {
        val r = statsOfPostings(spark.read.parquet(flyDirs: _*)).head()
        Seq((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl")))
      }
    (sidecars ++ fly).foldLeft((0L, 0L)) { case ((n, s), (n2, s2)) => (n + n2, s + s2) }
  }

  /** The deduplicated postings assembly lookups run over: identical
    * re-arrival across committed dirs collapses to one (term, doc_id)
    * row (max tf/dl — equal by the unchanged-text contract).
    * Term/doc_id filters push below the aggregate (grouping-key
    * predicates), so the at-rest pruning survives the dedup. */
  private def dedupedPostings(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
      .groupBy(col("term"), col("doc_id"))
      .agg(max(col("tf")).as("tf"), max(col("dl")).as("dl"))

  /** Conjunctive BM25 top-k over everything committed — THE shared
    * [[InvertedIndex.searchRanked]] definition over the lake's
    * deduplicated assembly and summed stats. */
  def searchRanked(spark: SparkSession, root: String, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      pushdownCap: Int = 10000): DataFrame = {
    val (nDocs, sumDl) = stats(spark, root)
    InvertedIndex.searchRanked(dedupedPostings(spark, root), nDocs, sumDl,
      terms, topK, k1, b, pushdownCap)
  }

  /** Disjunctive BM25 top-k over everything committed. */
  def searchRankedAny(spark: SparkSession, root: String, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (nDocs, sumDl) = stats(spark, root)
    InvertedIndex.searchRankedAny(dedupedPostings(spark, root), nDocs, sumDl,
      terms, topK, k1, b)
  }
}
