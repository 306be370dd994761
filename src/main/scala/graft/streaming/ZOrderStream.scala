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
  * Per micro-batch: append the rows under `root/b=<batchId>/` —
  * `mode(overwrite)` on the batch's OWN directory, so a replayed
  * micro-batch (same batchId, Structured Streaming's contract)
  * overwrites exactly its own output ([[BatchVersioned]] replay
  * rule). No per-batch clustering: a micro-batch is far smaller than
  * one parquet row group, so in-batch cell sorting buys no stat
  * selectivity — the clustering work belongs to compaction, where it
  * amortizes.
  *
  * Every `compactEvery` batches, the committed history (previous
  * compact version + arrival dirs below the compacting batch) is
  * rewritten ONCE via [[Layout.zorderWrite]] into
  * `root/compact/v=<batchId>` — file count from measured bytes,
  * quantile boundaries RE-DERIVED from the full committed data so
  * the cell grid tracks distribution drift across ingest epochs —
  * then state no possible replay can read is GC'd
  * ([[BatchVersioned.gcBelowPrev]]). Readers resolve through
  * [[visible]]: newest committed compact version + the committed
  * arrival tail, both `_SUCCESS`-gated, so a torn batch or torn
  * compaction is invisible until its replay commits. A filtered scan
  * therefore prunes row groups over all but the last `compactEvery`
  * batches of history, and the unclustered tail is bounded by the
  * compaction interval — the [[ClusterMaintenance]] delta-tail shape,
  * in layout form.
  *
  * Same one-version retention lease as [[IvfStream.topK]]: a reader
  * that listed the root must finish within one compaction interval,
  * since the next compaction GC's only below the version that reader
  * resolved.
  */
object ZOrderStream {

  /** One micro-batch of ingest. `keys`/`bitsPerKey` parameterize the
    * compaction rewrite; they must stay fixed for the root's lifetime
    * (a key change mid-stream would mix grids across versions —
    * rebuild into a fresh root instead, the IvfStream retrain rule). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      keys: Seq[String], bitsPerKey: Int = 8, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20, blockBytes: Long = 128L << 20): Unit = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(batch.sparkSession, root, batchId, keys, bitsPerKey,
        targetBytes, blockBytes)
    batch.write.mode("overwrite").parquet(s"$root/b=$batchId")
  }

  /** foreachBatch adapter. */
  def sink(root: String, keys: Seq[String], bitsPerKey: Int = 8,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, keys, bitsPerKey, compactEvery,
        targetBytes, blockBytes)

  /** (previous compact version, the dirs a reader below `upper`
    * resolves, their DataFrames) — the one assembly rule compact and
    * visible share, the [[IvfStream]] `parts` shape. The dir list is
    * what compaction sizes its output from: exactly the bytes the
    * rewrite reads, not stale pre-GC dirs below the previous version. */
  private def parts(spark: SparkSession, root: String, upper: Option[Long])
      : (Option[(Long, String)], Seq[String], Seq[DataFrame]) = {
    val cv = BatchVersioned.versions(spark, s"$root/compact")
      .filter(v => upper.forall(v._1 < _)).lastOption
    val lo = cv.map(_._1).getOrElse(Long.MinValue)
    val tail = BatchVersioned.versions(spark, root, prefix = "b")
      .filter { case (b, _) => b >= lo && upper.forall(b < _) }.map(_._2)
    val ps = cv.map { case (_, d) => spark.read.parquet(d) }.toSeq ++
      (if (tail.isEmpty) Seq.empty else Seq(spark.read.parquet(tail: _*)))
    (cv, cv.map(_._2).toSeq ++ tail, ps)
  }

  /** Rewrite committed history below `batchId` as Z-order compact
    * version v=`batchId`, then GC below the PREVIOUS version (kept,
    * because a replay of `batchId` re-runs this compaction from it).
    * Idempotent under replay: same committed inputs, same overwrite. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      keys: Seq[String], bitsPerKey: Int, targetBytes: Long,
      blockBytes: Long = 128L << 20): Unit = {
    val (prev, dirs, ps) = parts(spark, root, upper = Some(batchId))
    if (ps.nonEmpty) {
      val bytes = dirs.map(d => BatchVersioned.fs(spark, d)
        .getContentSummary(new org.apache.hadoop.fs.Path(d)).getLength).sum
      val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      Layout.zorderWrite(ps.reduce(_ unionByName _),
        s"$root/compact/v=$batchId", keys, files, bitsPerKey, blockBytes)
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

  /** The compacted portion alone (for layout evidence: scan pruning
    * is a property of the CLUSTERED history, the tail is the bounded
    * unclustered delta). */
  private[graft] def compactPart(spark: SparkSession, root: String): Option[DataFrame] =
    BatchVersioned.versions(spark, s"$root/compact").lastOption
      .map { case (_, d) => spark.read.parquet(d) }

  /** Filtered read over [[visible]] — named so call sites say what
    * the layout buys: predicates on the cluster keys prune row groups
    * across the whole compacted history. */
  def scan(spark: SparkSession, root: String, predicate: org.apache.spark.sql.Column): DataFrame =
    visible(spark, root).filter(predicate)
}
