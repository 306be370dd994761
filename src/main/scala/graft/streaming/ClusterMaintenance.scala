package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming maintenance of the at-rest near-dup cluster artifact —
  * the micro-batch twin of the batch chain (shingle → Jaccard pairs →
  * connected components → [[Dedup.clustersAtRest]]), closing the last
  * batch/streaming asymmetry in the dedup family: batch jobs build the
  * cluster table once; this keeps it current as documents arrive.
  *
  * Per micro-batch, against two batch-versioned at-rest tables under
  * `root/` (postings `(id, sh, n)` partitioned by arrival batch —
  * `n` is the doc's CAPPED shingle count, denormalized onto every
  * posting row so the Jaccard denominator arrives WITH the already-
  * pruned postings rows instead of a second full-history counts scan
  * per batch — and cluster versions `clusters/v=<batchId>`):
  *
  *  1. shingle the batch ([[Dedup.hashedShingleSets]] — same codegen
  *     kernel, same 60-bit keys as the batch chain);
  *  2. freeze boilerplate buckets whose RUNNING document frequency
  *     (prior postings + this batch) exceeds `dfCap` — the streaming
  *     form of [[Dedup.dfCapped]]'s blocking cap (PREFIX semantics:
  *     a bucket that crosses the cap stops producing pairs from that
  *     batch on; df is monotone, so frozen stays frozen. When no
  *     bucket ever crosses the cap this is IDENTICAL to the batch
  *     cap — the regime the parity test pins);
  *  3. intra-batch pairs via [[Dedup.jaccardPairsHashed]] and
  *     cross-batch pairs via one join of the batch's capped shingles
  *     against the postings table (blocked on shingle key, exactly
  *     the batch chain's join currency). Deep history is read through
  *     the periodically [[compact]]ed sh-sorted table with the
  *     batch's key set pushed into the scan, so per-batch input is
  *     flat in history depth — only the bounded un-compacted delta
  *     tail is scanned in full;
  *  4. fold the new pairs into the latest cluster version with
  *     [[Dedup.foldPairsIntoClusters]] (cost scales with TOUCHED
  *     components) and write `clusters/v=<batchId>`.
  *
  * Replay-safe without a transaction log: a replayed micro-batch
  * carries the same batchId (Structured Streaming's contract), reads
  * only state STRICTLY OLDER than itself (`b < batchId`, version
  * `v < batchId`) and overwrites exactly its own outputs — the same
  * idempotence-by-versioning that [[graft.sinks.ExactlyOnce]] gets
  * from its ledger. Doc ids are assumed unique across the stream
  * (an exactly-once ingest upstream; re-posted CONTENT is fine — that
  * is what the clusters detect).
  *
  * ON-DISK FORMAT (v2): postings rows carry `n` since the counts
  * table was folded in. A root written by the v1 format (separate
  * `counts/` dirs, 2-column postings) is NOT auto-migrated, and
  * MUST NOT be resumed against: a pure-v1 root fails loudly (missing
  * `n` column), but a MIXED root can schema-infer the new shape and
  * read v1 rows with NULL `n`, silently dropping their cross-batch
  * pairs. Rebuild the root (or backfill `n` from the old counts
  * table) before resuming across the format change.
  */
object ClusterMaintenance {

  import BatchVersioned.{emptyDf, fs, readBefore}

  // ---- postings compaction -----------------------------------------------
  // Without it, every micro-batch's cross-batch lookup re-scanned the
  // ENTIRE postings history (all prior b= delta dirs) — per-batch input
  // linear in corpus history, the one scale-killer at 100 TB streamed
  // ingest. Every `compactEvery` batches the history is rewritten ONCE
  // as a GLOBALLY SH-SORTED table cut into ~`compactTargetRows`-row
  // files (file == row-group at these sizes, so row-group min/max
  // stats are disjoint contiguous sh ranges). The per-batch lookup
  // then pushes the batch's distinct sh set into the parquet scan
  // (native set-based In-filter — Spark pushes it whenever the set is
  // LARGER than pushdown.inFilterThreshold), so only
  // row-groups whose range CONTAINS a probed key are read: per-batch
  // input from deep history is O(batch keys × file granule), flat in
  // history depth, while the un-compacted tail stays bounded by
  // compactEvery × batch. The compaction rewrite itself is sequential
  // columnar I/O amortized over compactEvery batches (a leveled/LSM
  // scheme that merges deltas into only the affected files is the
  // production extension; one level keeps replay reasoning simple).

  /** COMMITTED compacted-postings versions under root, ascending. */
  private def compactVersions(spark: SparkSession, root: String): Seq[(Long, String)] =
    BatchVersioned.versions(spark, s"$root/postings_compact")

  /** Rewrite postings history older than `batchId` (prior compact +
    * delta dirs) as one sh-sorted compact version, then garbage-
    * collect state that no possible replay can read (versions/deltas
    * below the PREVIOUS compact version: batches before `batchId` are
    * committed by the time `batchId` runs, and a replay of `batchId`
    * itself re-runs this compaction from the previous version, which
    * is kept). Idempotent under replay: same inputs, same overwrite.
    * `bloomNdv` sizes the per-row-group sh bloom (0 = assume one row
    * group per file, i.e. min(rows, targetRows)); pass the expected
    * rows-per-row-group when parquet.block.size is tuned smaller. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      targetRows: Long, bloomNdv: Long = 0L): Unit = {
    val prev = compactVersions(spark, root).filter(_._1 < batchId).lastOption
    val deltaLo = prev.map(_._1).getOrElse(Long.MinValue)
    val deltas = readBefore(spark, s"$root/postings", "id BIGINT, sh BIGINT, n BIGINT, b BIGINT", batchId)
      .filter(col("b") >= deltaLo)
      .select(col("id"), col("sh"), col("n"))
    val all = prev match {
      case Some((_, d)) => spark.read.parquet(d).select(col("id"), col("sh"), col("n")).unionByName(deltas)
      case None => deltas
    }
    val rows = all.count()
    if (rows > 0) {
      val nFiles = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
      // sorted by sh for tight row-group stats, PLUS a bloom filter on
      // sh per row group: with uniformly-hashed keys the sorted ranges
      // TILE the key space, so [min,max] stats alone cannot reject a
      // probed key that is absent from history (it always lands inside
      // some row-group's range) — and absent keys are the common case
      // for a fresh micro-batch. The bloom rejects those row-groups
      // outright; present keys read exactly their granule. ndv is
      // per-row-group cardinality (≤ file rows), so bloom space stays
      // proportional, ~1.2 bytes/row
      all.repartitionByRange(nFiles, col("sh"))
        .sortWithinPartitions(col("sh"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#sh", "true")
        .option("parquet.bloom.filter.expected.ndv#sh",
          (if (bloomNdv > 0) bloomNdv else math.min(rows, targetRows)).toString)
        // fpp must be << 1/batch-keys: a row group passes if ANY of the
        // K probed keys false-positives, so per-key fpp compounds K
        // times — at the default 1% every row group would pass a
        // 2000-key probe and the false-positive floor grows linearly
        // with history again. 1e-6 costs ~2x bloom bits (~3B/row)
        .option("parquet.bloom.filter.fpp#sh", "0.000001")
        .parquet(s"$root/postings_compact/v=$batchId")
      // GC: only after the new version committed
      BatchVersioned.gcBelowPrev(spark, s"$root/postings_compact", s"$root/postings", "b", prev)
    }
  }

  /** Postings visible to batch `batchId`: the newest committed compact
    * version below it plus the delta dirs after that version. When the
    * batch's distinct shingle set is small enough to collect
    * (`pushKeys`), it is pushed into the compact scan as a parquet
    * In-filter — with sh-sorted files this prunes to the row-groups
    * actually containing probed keys. Correctness never depends on the
    * pushdown (the caller still joins/semi-joins on sh); it only cuts
    * input bytes. */
  private[graft] def postingsBefore(spark: SparkSession, root: String, batchId: Long,
      pushKeys: Option[Array[Long]]): DataFrame = {
    // <= batchId: the compacting batch reads its OWN committed version
    // (v=batchId holds exactly the deltas b < batchId, written
    // deterministically from strictly-older state, so a replayed batch
    // reads identical rows either way — this leg just reads them
    // pruned instead of as raw deltas)
    val compactOpt = compactVersions(spark, root).filter(_._1 <= batchId).lastOption
    val deltaLo = compactOpt.map(_._1).getOrElse(Long.MinValue)
    val deltas = readBefore(spark, s"$root/postings", "id BIGINT, sh BIGINT, n BIGINT, b BIGINT", batchId)
      .filter(col("b") >= deltaLo)
      .select(col("id"), col("sh"), col("n"))
    compactOpt match {
      case Some((_, d)) =>
        val base = spark.read.parquet(d).select(col("id"), col("sh"), col("n"))
        val pruned = pushKeys match {
          case Some(keys) => base.filter(col("sh").isInCollection(keys.toSeq))
          case None => base
        }
        pruned.unionByName(deltas)
      case None => deltas
    }
  }

  /** COMMITTED cluster version dirs under `root`, ascending by batch
    * id. A version counts only once its `_SUCCESS` marker exists —
    * a crash mid-write leaves a partial directory that consumers must
    * never mistake for the artifact (missing cluster rows would let
    * near-dup pairs straddle a train/val split silently). */
  private def versions(spark: SparkSession, root: String): Seq[(Long, String)] =
    BatchVersioned.versions(spark, s"$root/clusters")

  /** Latest cluster state (consumers: split/keep-drop/rebalance jobs
    * join against this exactly as against the batch artifact). */
  def loadClusters(spark: SparkSession, root: String): DataFrame =
    versions(spark, root).lastOption
      .map { case (_, d) => Dedup.loadClusters(spark, d) }
      .getOrElse(emptyDf(spark, "doc_id BIGINT, cluster_id BIGINT"))

  /** Latest cluster version STRICTLY BEFORE `batchId` (replay safety). */
  private def clustersBefore(spark: SparkSession, root: String, batchId: Long): DataFrame =
    versions(spark, root).filter(_._1 < batchId).lastOption
      .map { case (_, d) => Dedup.loadClusters(spark, d) }
      .getOrElse(emptyDf(spark, "doc_id BIGINT, cluster_id BIGINT"))

  /** One micro-batch of the maintenance pipeline; wire via
    * `docs.writeStream.foreachBatch(sink(root, ...)).start()`.
    *
    * `compactEvery` > 0 compacts the postings history every that many
    * batches (see [[compact]]); `maxPushdownKeys` bounds the batch
    * key set collected for scan pruning (a backfill batch with more
    * distinct shingles than this reads the compact table un-pruned —
    * at that batch/history ratio most row-groups contain matches
    * anyway, so pruning could not have helped). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      idCol: String, textCol: String,
      shingleN: Int = 5, dfCap: Long = Long.MaxValue, threshold: Double = 0.6,
      compactEvery: Int = 16, compactTargetRows: Long = 4000000L,
      maxPushdownKeys: Int = 100000, keepClusterVersions: Int = 8): Unit = {
    require(keepClusterVersions >= 2,
      "replay needs the previous cluster version: keepClusterVersions must be >= 2")
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(spark, root, batchId, compactTargetRows)
    val batchSh = Dedup.hashedShingleSets(
      batch.select(col(idCol).cast("long").as("id"), col(textCol).as("text")),
      col("id"), col("text"), shingleN).persist()
    try {
      // collect the batch's distinct shingle keys (bounded) for scan
      // pruning: limit(max+1) caps driver memory — an over-limit batch
      // yields None, never a truncated (incorrect-looking) push set
      val keyRows = batchSh.select(col("sh")).distinct()
        .limit(maxPushdownKeys + 1).collect()
      val pushKeys =
        if (keyRows.length > maxPushdownKeys) None
        else Some(keyRows.map(_.getLong(0)))
      val priorPostings = postingsBefore(spark, root, batchId, pushKeys)
      // freeze buckets whose running df crosses the cap as of this batch.
      // Only shingles PRESENT in the batch can join, so the history is
      // SEMI-JOINED to the batch's (small, broadcastable) shingle set
      // before aggregating — the df computation shuffles O(batch)
      // postings rows, not the whole history. The frozen output is tiny
      // (it is the boilerplate set), so it broadcasts.
      // NO broadcast hint: a steady-state batch's key set is tiny (AQE
      // picks a broadcast join itself), but a backfill first batch can
      // carry 10^8+ distinct keys, and a forced broadcast would hit
      // the size ceiling where a shuffled semi-join just runs slower
      val batchShKeys = batchSh.select(col("sh")).distinct()
      val priorDf = priorPostings
        .join(batchShKeys, Seq("sh"), "left_semi")
        .groupBy(col("sh")).agg(count(lit(1)).as("df0"))
      val frozen = batchSh.groupBy(col("sh")).agg(count(lit(1)).as("df1"))
        .join(priorDf, Seq("sh"), "left")
        .filter(coalesce(col("df0"), lit(0L)) + col("df1") > dfCap)
        .select(col("sh"))
      val capped = batchSh.join(broadcast(frozen), Seq("sh"), "left_anti")
        .select(col("id"), col("sh")).persist()
      try {
        val nNew = capped.groupBy(col("id")).agg(count(lit(1)).as("n"))
        val intra = Dedup.jaccardPairsHashed(capped, threshold)
          .select(col("id_a"), col("id_b"))
        // cross-batch candidates: blocked on shared shingle keys; the
        // stored per-doc counts complete the Jaccard denominator
        // (prefix-capped, consistent with what each doc joined on)
        // n_old rides on the posting rows (functionally dependent on
        // id_old, so adding it to the groupBy changes nothing) — no
        // separate counts-table scan
        val inter = capped.select(col("id").as("id_new"), col("sh"))
          .join(priorPostings.select(col("id").as("id_old"), col("sh"), col("n").as("n_old")),
            Seq("sh"))
          .groupBy(col("id_new"), col("id_old"), col("n_old")).agg(count(lit(1)).as("ic"))
        val cross = inter
          .join(nNew.select(col("id").as("id_new"), col("n").as("n_new")), Seq("id_new"))
          .filter(col("ic").cast("double") / (col("n_new") + col("n_old") - col("ic")) >= threshold)
          .select(least(col("id_new"), col("id_old")).as("id_a"),
            greatest(col("id_new"), col("id_old")).as("id_b"))
        val pairs = intra.unionByName(cross)
        // scoped: connectedComponents (inside foldPairsIntoClusters)
        // localCheckpoints its final round and registers the blocks
        // with CachePool — the artifact write consumes them, and the
        // scope releases exactly THIS batch's blocks on exit (a global
        // drain could unpersist a concurrent query's truncated-lineage
        // checkpoints; skipping cleanup would leak one per micro-batch)
        graft.CachePool.scoped {
          val merged = Dedup.foldPairsIntoClusters(clustersBefore(spark, root, batchId), pairs)
          Dedup.clustersAtRest(merged, s"$root/clusters/v=$batchId")
        }
        // cluster versions are FULL snapshots: keep the newest
        // `keepClusterVersions`, GC the rest — the stream itself only
        // ever replays against the PREVIOUS version, but loadClusters
        // consumers (split/keep-drop/rebalance jobs) read a version
        // lazily over minutes, so the retention window is a consumer
        // lease: they must finish within keepClusterVersions
        // micro-batch intervals (or pin a version dir). Without any
        // GC the chain accumulates one corpus-sized table per
        // micro-batch for the life of the stream
        val kept = versions(spark, root)
        if (kept.length > keepClusterVersions) {
          val f = fs(spark, root)
          kept.dropRight(keepClusterVersions).foreach { case (_, d) =>
            f.delete(new org.apache.hadoop.fs.Path(d), true)
          }
        }
        // postings keep the UNCAPPED batch shingles: running df must stay
        // monotone (a frozen bucket's occurrences still count), with the
        // doc's CAPPED size n denormalized onto each row (frozen-only
        // docs get n = 0; their rows carry only frozen sh keys, which no
        // future capped batch joins on, so the 0 never enters a
        // denominator)
        batchSh.select(col("id"), col("sh"))
          .join(nNew.select(col("id"), col("n")), Seq("id"), "left")
          .select(col("id"), col("sh"), coalesce(col("n"), lit(0L)).as("n"))
          .write.mode("overwrite").parquet(s"$root/postings/b=$batchId")
      } finally capped.unpersist(blocking = false)
    } finally batchSh.unpersist(blocking = false)
  }

  /** foreachBatch adapter. */
  def sink(root: String, idCol: String, textCol: String,
      shingleN: Int = 5, dfCap: Long = Long.MaxValue, threshold: Double = 0.6,
      compactEvery: Int = 16, compactTargetRows: Long = 4000000L,
      maxPushdownKeys: Int = 100000, keepClusterVersions: Int = 8)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, idCol, textCol, shingleN, dfCap, threshold,
        compactEvery, compactTargetRows, maxPushdownKeys, keepClusterVersions)
}
