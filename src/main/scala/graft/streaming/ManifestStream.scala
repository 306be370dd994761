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
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(batch.sparkSession, statsKeys, bloomKey, blockBytes),
      majorFrac = majorFrac, maxL1 = maxL1)

  /** foreachBatch adapter. */
  def sink(root: String, statsKeys: Seq[String],
      bloomKey: Option[String] = None, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, statsKeys, bloomKey, compactEvery,
        targetBytes, blockBytes, majorFrac, maxL1)

  private def rewrite(spark: SparkSession, statsKeys: Seq[String],
      bloomKey: Option[String], blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => {
      Layout.clusteredWrite(df, dst, statsKeys, files, blockBytes)
      Manifest.write(spark, dst, statsKeys, bloomKey)
    }

  /** Pruned read over everything committed: the base AND each L1
    * chunk file-pruned through their OWN manifests — each gated on
    * [[Manifest.committed]] (else that dir is read unpruned, the
    * class-doc window rule) — plus the WHOLE unmanifested arrival
    * tail (bounded by the compaction interval). This is what makes
    * manifest maintenance INCREMENTAL on the leveled lake: a minor
    * compaction manifests ONLY its new L1 chunk, the base manifest is
    * immutable until the next major. Callers keep their residual
    * filter — same exactness contract as [[Manifest.prunedRead]].
    * Before the first compaction there is no manifest yet: everything
    * is tail, read whole. Resolution is the engine's ONE rule
    * ([[CompactingLake.readerDirs]]), not a local copy. */
  def prunedScan(spark: SparkSession, root: String,
      ranges: Seq[(String, Double, Double)] = Nil,
      bloomAnyOf: Seq[Any] = Nil): DataFrame = {
    val lv = CompactingLake.readerDirs(spark, root)
    val parts =
      (lv.base.toSeq ++ lv.l1s).map { case (_, d) =>
        if (Manifest.committed(spark, d)) Manifest.prunedRead(spark, d, ranges, bloomAnyOf)
        else spark.read.parquet(d)
      } ++
      (if (lv.tail.isEmpty) Seq.empty
       else Seq(spark.read.parquet(lv.tail: _*)))
    require(parts.nonEmpty, s"no committed batches under $root")
    parts.reduce(_ unionByName _)
  }

  /** Unpruned read — [[CompactingLake.visible]], for parity checks. */
  def visible(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
}
