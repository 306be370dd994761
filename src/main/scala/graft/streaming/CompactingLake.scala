package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The batch-versioned-ingest + periodic-recluster engine that every
  * streamed at-rest layout shares — factored out when the SECOND
  * consumer appeared (the tombstone-helper lesson: two hand-rolled
  * copies of the replay/GC/visibility rules is how a fix misses one).
  * [[ZOrderStream]] instantiates it with a Z-order rewrite,
  * [[KeywordIndexStream]] with a term-clustered postings rewrite; the
  * engine owns everything they must agree on:
  *
  *  - arrivals land under `root/b=<batchId>` via mode(overwrite) on
  *    the batch's OWN dir, so a replayed micro-batch (same batchId —
  *    Structured Streaming's contract) overwrites exactly its own
  *    output ([[BatchVersioned]] replay rule); no per-batch
  *    clustering — a micro-batch is smaller than one parquet row
  *    group, the clustering work belongs to compaction where it
  *    amortizes;
  *  - every `compactEvery` batches the committed history (previous
  *    compact version + arrival dirs below the compacting batch) is
  *    rewritten ONCE by the caller's `rewrite` into a
  *    `_SUCCESS`-gated `root/compact/v=<batchId>`, file count derived
  *    from the measured bytes of EXACTLY the dirs the rewrite reads,
  *    then state no possible replay can read is GC'd
  *    ([[BatchVersioned.gcBelowPrev]] — the previous version is kept
  *    because a replay of `batchId` re-runs this compaction from it);
  *  - readers resolve newest committed compact version + committed
  *    arrival tail, both `_SUCCESS`-gated, so torn batches and torn
  *    compactions are invisible until their replay commits; the
  *    unclustered tail is bounded by the compaction interval, and the
  *    one-version retention lease matches [[IvfStream.topK]].
  */
object CompactingLake {

  /** Compaction rewrite contract: (committed history, destination,
    * output file count) — file count is pre-derived from measured
    * input bytes so every instantiation sizes output identically. */
  type Rewrite = (DataFrame, String, Int) => Unit

  /** One micro-batch of ingest: maybe-compact first (a replayed batch
    * re-runs its compaction from the kept previous version), then
    * commit the batch's own dir. `ingest` transforms the arriving
    * rows into the lake's AT-REST schema (identity for a layout
    * stream; docs→postings for an index stream) — it must be
    * deterministic so a replay commits identical rows. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int, targetBytes: Long, rewrite: Rewrite,
      ingest: DataFrame => DataFrame = identity): Unit = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(batch.sparkSession, root, batchId, targetBytes, rewrite)
    ingest(batch).write.mode("overwrite").parquet(s"$root/b=$batchId")
  }

  /** (previous compact version, the dirs a reader below `upper`
    * resolves, their DataFrames) — the one assembly rule compact and
    * visible share (the [[IvfStream]] `parts` shape). The dir list is
    * what compaction sizes its output from: exactly the bytes the
    * rewrite reads, never stale pre-GC dirs below the previous
    * version. */
  private def parts(spark: SparkSession, root: String, upper: Option[Long])
      : (Option[(Long, String)], Seq[String], Seq[DataFrame]) = {
    val (cv, tail) = readerDirs(spark, root, upper)
    val ps = cv.map { case (_, d) => spark.read.parquet(d) }.toSeq ++
      (if (tail.isEmpty) Seq.empty else Seq(spark.read.parquet(tail: _*)))
    (cv, cv.map(_._2).toSeq ++ tail, ps)
  }

  /** The reader-resolution rule ITSELF — (newest committed compact
    * version below `upper`, committed arrival dirs at-or-after it) —
    * exposed so instantiations that read the two parts DIFFERENTLY
    * (e.g. [[ManifestStream.prunedScan]] file-prunes the compact half
    * and reads the tail whole) still resolve through the ONE
    * definition instead of hand-rolling the boundary rules. */
  private[graft] def readerDirs(spark: SparkSession, root: String,
      upper: Option[Long] = None): (Option[(Long, String)], Seq[String]) = {
    val cv = BatchVersioned.versions(spark, s"$root/compact")
      .filter(v => upper.forall(v._1 < _)).lastOption
    val lo = cv.map(_._1).getOrElse(Long.MinValue)
    val tail = BatchVersioned.versions(spark, root, prefix = "b")
      .filter { case (b, _) => b >= lo && upper.forall(b < _) }.map(_._2)
    (cv, tail)
  }

  /** Rewrite committed history below `batchId` as compact version
    * v=`batchId`, then GC below the PREVIOUS version. Idempotent
    * under replay: same committed inputs, same overwrite. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      targetBytes: Long, rewrite: Rewrite): Unit = {
    val (prev, dirs, ps) = parts(spark, root, upper = Some(batchId))
    if (ps.nonEmpty) {
      val bytes = dirs.map(d => BatchVersioned.fs(spark, d)
        .getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength).sum
      val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      rewrite(ps.reduce(_ unionByName _), s"$root/compact/v=$batchId", files)
      BatchVersioned.gcBelowPrev(spark, s"$root/compact", root, "b", prev)
    }
  }

  /** Every row a reader may see: newest committed compact version +
    * committed arrival batches at-or-after it. A replayed
    * pre-compaction batch recommits rows already inside the compact
    * version and stays invisible here — no double counting. */
  def visible(spark: SparkSession, root: String): DataFrame = {
    val (_, _, ps) = parts(spark, root, upper = None)
    require(ps.nonEmpty, s"no committed batches under $root")
    ps.reduce(_ unionByName _)
  }

  /** The compacted portion alone (layout evidence: scan pruning is a
    * property of the CLUSTERED history; the tail is the bounded
    * unclustered delta). */
  private[graft] def compactPart(spark: SparkSession, root: String): Option[DataFrame] =
    BatchVersioned.versions(spark, s"$root/compact").lastOption
      .map { case (_, d) => spark.read.parquet(d) }
}
