package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{InvertedIndex, Layout}

/** Streaming maintenance of the RANKED inverted index — q119/q120's
  * micro-batch twin, closing the ranked-retrieval batch/stream the
  * way [[KeywordIndexStream]] closed the boolean one (the FOURTH
  * [[CompactingLake]] instantiation, term-range-sharded like it).
  *
  * Ingest converts each doc batch to the ranked at-rest form —
  * (term, doc_id, tf, dl) plus one per-doc SENTINEL row,
  * [[InvertedIndex.rankedPostings]]'s one definition — so the lake's
  * schema is uniform across shards, L1 slices and tail. Shard folds
  * rewrite one term range clustered on (term, doc_id) WITH the
  * per-row-group doc_id blooms the rarest-first probe pushes
  * against; the engine's generic slicer writes chunks under the same
  * bloom options.
  *
  * Corpus stats (BM25's N and Σdl) are a RUNNING ACCUMULATOR
  * `root/stats/v=<batchId>`, advanced by each compaction from the
  * tail it is about to slice (sentinel rows of exactly that window —
  * bounded work over data the minor reads anyway) — NOT per-level
  * sidecars: under range-sharded folds a doc's postings span shards,
  * and after a split the parent dir serves two ranges, so any
  * per-dir count would double-count docs the moment dirs overlap
  * ranges. The accumulator counts every arrival window exactly once,
  * independent of fold/split topology; lookups add an on-the-fly
  * sentinel fold over arrivals at-or-after the accumulator's version
  * (the bounded unsliced tail). Replay-safe like everything else
  * here: version v is recomputed from committed state below v and
  * overwritten; the previous version is the one-lease replay input.
  *
  * Delivery contract (q118's, tightened for stats): doc_ids must not
  * re-arrive with CHANGED text. IDENTICAL re-arrival (at-least-once
  * upstream) keeps tf/df/score-per-doc EXACT — the lookups first
  * deduplicate the probed postings by (term, doc_id) max, and
  * term/doc_id predicates push through that aggregate to the scans —
  * but a duplicate doc ALSO duplicates its sentinel, overcounting
  * the accumulator by the duplicate rate (ranking-stable, documented
  * approximation; replay of the SAME batch is exact by the engine's
  * overwrite rule). Zero-token docs ARE counted — the sentinel rows
  * exist for exactly that (the round-16 empty-doc caveat, closed). */
object RankedIndexStream {

  private val StatsDir = "stats"

  private def bloomOptions(blockBytes: Long): Map[String, String] = {
    val ndv = math.max(1024L, blockBytes / 16)
    Map("parquet.block.size" -> blockBytes.toString,
      "parquet.bloom.filter.enabled#doc_id" -> "true",
      "parquet.bloom.filter.expected.ndv#doc_id" -> ndv.toString)
  }

  private def sharding(blockBytes: Long, splitBytes: Long,
      foldCap: Int = CompactingLake.DefaultFoldCap): CompactingLake.Sharding =
    CompactingLake.Sharding(
      shardCols = Seq("term", "doc_id"),
      splitBytes = splitBytes,
      foldCap = foldCap,
      chunkOptions = bloomOptions(blockBytes))

  /** One micro-batch of (doc_id, text) ingest. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): Unit = {
    val spark = batch.sparkSession
    // stats first: the accumulator must fold the same committed tail
    // window the engine's minor is about to slice (and whose arrival
    // dirs the engine's NEXT compaction GCs)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      accumulateStats(spark, root, batchId)
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(blockBytes),
      sharding(blockBytes, splitBytes, foldCap),
      // term-sorted arrival files: the per-batch postings already
      // crossed the (term, doc_id) agg shuffle, so an in-partition
      // sort is free of exchanges and buys row-group term pruning on
      // the TAIL (lookups and the sentinel stats fly-fold read the
      // probed terms' row groups instead of the whole tail)
      ingest = InvertedIndex.rankedPostings(_)
        .sortWithinPartitions(col("term"), col("doc_id")),
      majorFrac = majorFrac, maxL1 = maxL1, minFoldBytes = minFoldBytes)
  }

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
      processBatch(batch, batchId, root, compactEvery, targetBytes,
        blockBytes, majorFrac, maxL1, splitBytes, foldCap, minFoldBytes)

  private def rewrite(blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) =>
      Layout.clusteredWrite(df, dst, Seq("term", "doc_id"), files, blockBytes,
        options = bloomOptions(blockBytes))

  private def statsVersions(spark: SparkSession, root: String) =
    BatchVersioned.versions(spark, s"$root/$StatsDir")

  private def readStats(spark: SparkSession, dir: String): (Long, Long) = {
    val r = spark.read.parquet(dir).head()
    (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
  }

  /** Advance the accumulator at a compaction boundary: previous
    * committed version (below batchId — the replay lease) + the
    * sentinel fold of the committed tail the minor consumes. Then GC
    * versions below the one just read. Deterministic under replay —
    * every input is committed state below batchId. */
  private[graft] def accumulateStats(spark: SparkSession, root: String,
      batchId: Long): Unit = {
    val lv = CompactingLake.resolve(spark, root, upper = Some(batchId))
    if (lv.tail.isEmpty) return
    val prev = statsVersions(spark, root).filter(_._1 < batchId).lastOption
    val (pn, ps) = prev.map { case (_, d) => readStats(spark, d) }
      .getOrElse((0L, 0L))
    val (dn, ds) = InvertedIndex.sentinelStats(
      spark.read.parquet(lv.tail: _*))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "n_docs bigint, sum_dl bigint")
    val one = new java.util.ArrayList[Row]()
    one.add(Row(pn + dn, ps + ds))
    spark.createDataFrame(one, schema)
      .coalesce(1) // one row by construction
      .write.mode("overwrite").parquet(s"$root/$StatsDir/v=$batchId")
    prev.foreach { case (pv, _) =>
      val f = BatchVersioned.fs(spark, root)
      statsVersions(spark, root).filter(_._1 < pv).foreach { case (_, d) =>
        f.delete(new org.apache.hadoop.fs.Path(d), true)
      }
    }
  }

  /** Corpus stats over everything committed: the accumulator +
    * an on-the-fly sentinel fold over arrivals at-or-after its
    * version (bounded by the compaction interval; everything older
    * is inside the accumulator, whichever dirs hold the rows). */
  private def stats(spark: SparkSession, root: String): (Long, Long) = {
    val acc = statsVersions(spark, root).lastOption
    val (an, as) = acc.map { case (_, d) => readStats(spark, d) }
      .getOrElse((0L, 0L))
    val v0 = acc.map(_._1).getOrElse(Long.MinValue)
    val fresh = BatchVersioned.versions(spark, root, prefix = "b")
      .filter(_._1 >= v0).map(_._2)
    val (fn, fs) =
      if (fresh.isEmpty) (0L, 0L)
      else InvertedIndex.sentinelStats(spark.read.parquet(fresh: _*))
    (an + fn, as + fs)
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
    * deduplicated assembly and accumulated stats. */
  def searchRanked(spark: SparkSession, root: String, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      pushdownCap: Int = 10000, logIdf: Boolean = false): DataFrame = {
    val (nDocs, sumDl) = stats(spark, root)
    InvertedIndex.searchRanked(dedupedPostings(spark, root), nDocs, sumDl,
      terms, topK, k1, b, pushdownCap, logIdf)
  }

  /** Disjunctive BM25 top-k over everything committed. */
  def searchRankedAny(spark: SparkSession, root: String, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      logIdf: Boolean = false): DataFrame = {
    val (nDocs, sumDl) = stats(spark, root)
    InvertedIndex.searchRankedAny(dedupedPostings(spark, root), nDocs, sumDl,
      terms, topK, k1, b, logIdf)
  }

  /** The POSITIONAL dedup assembly — [[dedupedPostings]] plus the
    * positions array, kept SEPARATE so BM25 lookups never pay for the
    * column (their assembly prunes it at every scan; only phrase
    * queries read it, and only for the probed terms' row groups).
    * max(positions) is exact under the unchanged-text contract:
    * re-arrival duplicates carry identical arrays. */
  private def dedupedPositional(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
      .groupBy(col("term"), col("doc_id"))
      .agg(max(col("tf")).as("tf"), max(col("dl")).as("dl"),
        max(col("positions")).as("positions"))

  /** Phrase search over everything committed — THE shared
    * [[InvertedIndex.searchPhrase]] adjacency verify (q121's) over
    * the lake's positional assembly: streamed index, batch phrase
    * semantics, bit-for-bit. */
  def searchPhrase(spark: SparkSession, root: String, phrase: Seq[String],
      pushdownCap: Int = 10000): DataFrame =
    InvertedIndex.searchPhrase(dedupedPositional(spark, root), phrase,
      pushdownCap)

  // ---------------------------------------------------------------
  // VERSIONED mode (round 17): a real corpus pipeline re-crawls and
  // deletes. Ingest is (doc_id, ver, op, text) events; postings are
  // ver-stamped ([[InvertedIndex.rankedPostingsVer]]), lookups
  // resolve the latest version per doc and drop deletes BEFORE
  // scoring ([[InvertedIndex.searchRankedVer]] — the Cdc.materialize
  // rule applied per probed term), and folds PURGE superseded rows:
  // per (term, doc_id) only the highest version survives a rewrite,
  // so the sentinel shard compacts to the latest event per doc
  // (delete tombstones kept — they must keep masking older
  // postings) and term shards drop re-crawled same-term postings.
  // Removed-term postings of LIVE docs stay at rest (a range-local
  // fold cannot see the registry shard) — lookup resolution owns
  // exactness; a registry-join purge is the documented deferred
  // option if at-rest leakage ever matters more than fold locality.
  // No stats accumulator here: versioned stats are not additive
  // (updates retract the old dl, deletes retract the doc) — they
  // resolve from the registry, EXACT, which also retires the
  // unversioned mode's re-arrival overcount: a re-arrived (doc, ver)
  // deduplicates by key instead of double-counting.
  // ---------------------------------------------------------------

  /** One micro-batch of versioned (doc_id, ver, op, text) ingest. */
  def processBatchVer(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewriteVer(blockBytes),
      sharding(blockBytes, splitBytes, foldCap),
      ingest = InvertedIndex.rankedPostingsVer(_)
        .sortWithinPartitions(col("term"), col("doc_id")),
      majorFrac = majorFrac, maxL1 = maxL1, minFoldBytes = minFoldBytes)

  /** foreachBatch adapter for the versioned mode. */
  def sinkVer(root: String, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatchVer(batch, batchId, root, compactEvery, targetBytes,
        blockBytes, majorFrac, maxL1, splitBytes, foldCap, minFoldBytes)

  /** Fold rewrite with the version purge: per (term, doc_id) only
    * the highest version survives (ties broken delete-first —
    * deterministic even if the one-op-per-(doc,ver) contract is
    * violated upstream), which also collapses re-arrived duplicates
    * of the same (doc, ver). Idempotent, so re-folding an already
    * purged shard is a no-op on content. */
  private def rewriteVer(blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term"), col("doc_id"))
        .orderBy(col("ver").desc, col("del").desc)
      val purged = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      Layout.clusteredWrite(purged, dst, Seq("term", "doc_id"), files,
        blockBytes, options = bloomOptions(blockBytes))
    }

  /** The deduplicated VERSIONED assembly: re-arrival of the same
    * (doc, ver) across committed dirs collapses by key (values are
    * equal by the versioned contract — a changed re-crawl must carry
    * a new ver). */
  private def dedupedVer(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
      .groupBy(col("term"), col("doc_id"), col("ver"))
      .agg(max(col("tf")).as("tf"), max(col("dl")).as("dl"),
        max(col("del")).as("del"), max(col("positions")).as("positions"))

  /** Conjunctive BM25 top-k over the versioned lake: latest-version
    * resolution, delete masking, registry-exact stats — THE shared
    * [[InvertedIndex.searchRankedVer]] definition. */
  def searchRankedVer(spark: SparkSession, root: String, terms: Seq[String],
      topK: Int = 20, k1: Double = 1.2, b: Double = 0.75,
      pushdownCap: Int = 10000, logIdf: Boolean = false): DataFrame =
    InvertedIndex.searchRankedVer(dedupedVer(spark, root), terms, topK,
      k1, b, pushdownCap, logIdf)

  /** Phrase search over the versioned lake: latest-version resolution
    * + delete masking, then the shared adjacency verify —
    * [[InvertedIndex.searchPhraseVer]] over the versioned assembly
    * (q123's semantics on the maintained index). */
  def searchPhraseVer(spark: SparkSession, root: String, phrase: Seq[String],
      pushdownCap: Int = 10000): DataFrame =
    InvertedIndex.searchPhraseVer(dedupedVer(spark, root), phrase, pushdownCap)
}
