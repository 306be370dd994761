package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Layout, Manifest}

/** Streaming maintenance of a manifest-indexed lake table — q116's
  * micro-batch twin, the third [[CompactingLake]] instantiation
  * ([[ZOrderStream]] = Z-order rewrite, [[KeywordIndexStream]] =
  * postings rewrite, this = clustered rewrite + manifest rebuild in
  * the SAME compaction pass).
  *
  * The manifest names files, so it can only ever describe an
  * immutable, committed directory — which is exactly what a
  * `_SUCCESS`-gated `compact/v=<id>` is. Each compaction rewrites the
  * committed history key-clustered and then builds the per-file zone
  * maps + blooms over the files it just wrote, inside the same
  * version dir. The manifest build runs AFTER the data write's own
  * `_SUCCESS`, so there is necessarily a window (and, after a crash
  * between the two writes, a dwell until the compacting batch
  * replays) where the version is committed but its manifest is
  * absent or torn — [[prunedScan]] therefore trusts a manifest ONLY
  * when the manifest's OWN commit marker is present
  * ([[Manifest.committed]]) and otherwise reads that compact version
  * UNPRUNED: a reader is exact at every instant, and the windowed
  * cost is time, never rows. A torn pre-compaction data write stays
  * invisible through the engine's `_SUCCESS` gate as usual. The
  * arrival tail is unmanifested by design — it is bounded by the
  * compaction interval, and [[prunedScan]] reads it whole while the
  * compact history (all but the last `compactEvery` batches) is
  * file-pruned through [[Manifest.selectedFiles]].
  */
object ManifestStream {

  /** One micro-batch of ingest. `statsKeys` cluster the compaction
    * rewrite and carry zone maps; `bloomKey` gets per-file blooms.
    * Fixed for the root's lifetime (the ZOrderStream key rule). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      statsKeys: Seq[String], bloomKey: Option[String] = None,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(batch.sparkSession, statsKeys, bloomKey, blockBytes))

  /** foreachBatch adapter. */
  def sink(root: String, statsKeys: Seq[String],
      bloomKey: Option[String] = None, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, statsKeys, bloomKey, compactEvery,
        targetBytes, blockBytes)

  private def rewrite(spark: SparkSession, statsKeys: Seq[String],
      bloomKey: Option[String], blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => {
      Layout.clusteredWrite(df, dst, statsKeys, files, blockBytes)
      Manifest.write(spark, dst, statsKeys, bloomKey)
    }

  /** Pruned read over everything committed: the newest compact
    * version file-pruned through its manifest — IF that manifest
    * itself is committed ([[Manifest.committed]]; else the version is
    * read unpruned, the class-doc window rule) — plus the WHOLE
    * unmanifested arrival tail (bounded by the compaction interval).
    * Callers keep their residual filter — same exactness contract as
    * [[Manifest.prunedRead]]. Before the first compaction there is no
    * manifest yet: everything is tail, read whole. Resolution is the
    * engine's ONE rule ([[CompactingLake.readerDirs]]), not a local
    * copy. */
  def prunedScan(spark: SparkSession, root: String,
      ranges: Seq[(String, Double, Double)] = Nil,
      bloomAnyOf: Seq[Any] = Nil): DataFrame = {
    val (compact, tail) = CompactingLake.readerDirs(spark, root)
    val parts =
      compact.map { case (_, d) =>
        if (Manifest.committed(spark, d)) Manifest.prunedRead(spark, d, ranges, bloomAnyOf)
        else spark.read.parquet(d)
      }.toSeq ++
      (if (tail.isEmpty) Seq.empty
       else Seq(spark.read.parquet(tail: _*)))
    require(parts.nonEmpty, s"no committed batches under $root")
    parts.reduce(_ unionByName _)
  }

  /** Unpruned read — [[CompactingLake.visible]], for parity checks. */
  def visible(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
}
