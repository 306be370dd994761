package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.operators.{Layout, Manifest}

/** Streaming maintenance of a manifest-indexed lake table — q116's
  * micro-batch twin, the third [[CompactingLake]] instantiation
  * ([[ZOrderStream]] = Z-order rewrite, [[KeywordIndexStream]] =
  * postings rewrite, this = clustered rewrite + manifest rebuild in
  * the SAME compaction pass).
  *
  * The manifest names files, so it can only ever describe an
  * immutable, committed directory — which is exactly what a
  * `_SUCCESS`-gated shard fold dir or L1 chunk is. Each shard fold
  * rewrites ONE key range clustered and builds the per-file zone
  * maps + blooms over the files it just wrote, inside the same
  * version dir; each L1 chunk gets its own manifest right after the
  * chunk commits (the engine's `postChunk` hook) — manifest
  * maintenance stays INCREMENTAL: a fold re-manifests one shard,
  * a minor manifests one chunk, nothing re-manifests the lake.
  * Manifest builds run AFTER the data write's own `_SUCCESS`, so
  * there is necessarily a window (and, after a crash between the two
  * writes, a dwell until the compacting batch replays) where a dir
  * is committed but its manifest is absent or torn — [[prunedScan]]
  * therefore trusts a manifest ONLY when the manifest's OWN commit
  * marker is present ([[Manifest.committed]]) and otherwise reads
  * that dir UNPRUNED: a reader is exact at every instant, and the
  * windowed cost is time, never rows.
  *
  * Two sharded-lake subtleties [[prunedScan]] owns:
  *  - a chunk's manifest names files in ALL its slices, but a slice
  *    consumed by a committed fold must not be read (its rows live
  *    in the fold's dir) — the manifest's selected files are
  *    intersected with the chunk's VISIBLE slices, which also makes
  *    the consumed-then-GC'd files unreachable rather than a
  *    missing-file error;
  *  - a range resolving through its split parent's dir applies the
  *    engine's range predicate ON TOP of the manifest pruning
  *    (pruning is a scan reduction; the predicate owns exactness).
  *
  * The arrival tail is unmanifested by design — bounded by the
  * compaction interval and read whole. */
object ManifestStream {

  private def sharding(spark: SparkSession, statsKeys: Seq[String],
      bloomKey: Option[String], blockBytes: Long, splitBytes: Long,
      foldCap: Int = CompactingLake.DefaultFoldCap): CompactingLake.Sharding =
    CompactingLake.Sharding(
      shardCols = statsKeys,
      splitBytes = splitBytes,
      foldCap = foldCap,
      chunkOptions = Map("parquet.block.size" -> blockBytes.toString),
      postChunk = (s, dir) => { Manifest.write(s, dir, statsKeys, bloomKey); () })

  /** One micro-batch of ingest. `statsKeys` cluster the compaction
    * rewrite and carry zone maps; `bloomKey` gets per-file blooms.
    * Fixed for the root's lifetime (the ZOrderStream key rule). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      statsKeys: Seq[String], bloomKey: Option[String] = None,
      compactEvery: Int = 16, targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): Unit =
    CompactingLake.processBatch(batch, batchId, root, compactEvery,
      targetBytes, rewrite(batch.sparkSession, statsKeys, bloomKey, blockBytes),
      sharding(batch.sparkSession, statsKeys, bloomKey, blockBytes,
        splitBytes, foldCap),
      majorFrac = majorFrac, maxL1 = maxL1, minFoldBytes = minFoldBytes)

  /** foreachBatch adapter. */
  def sink(root: String, statsKeys: Seq[String],
      bloomKey: Option[String] = None, compactEvery: Int = 16,
      targetBytes: Long = 128L << 20,
      blockBytes: Long = 128L << 20,
      majorFrac: Double = CompactingLake.DefaultMajorFrac,
      maxL1: Int = CompactingLake.DefaultMaxL1,
      splitBytes: Long = CompactingLake.DefaultSplitBytes,
      foldCap: Int = CompactingLake.DefaultFoldCap,
      minFoldBytes: Long = -1L): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, statsKeys, bloomKey, compactEvery,
        targetBytes, blockBytes, majorFrac, maxL1, splitBytes, foldCap,
        minFoldBytes)

  private def rewrite(spark: SparkSession, statsKeys: Seq[String],
      bloomKey: Option[String], blockBytes: Long): CompactingLake.Rewrite =
    (df, dst, files) => {
      Layout.clusteredWrite(df, dst, statsKeys, files, blockBytes)
      Manifest.write(spark, dst, statsKeys, bloomKey)
    }

  private def pathOf(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Pruned read over everything committed: shard dirs AND each L1
    * chunk file-pruned through their OWN manifests — each gated on
    * [[Manifest.committed]] (else that dir is read unpruned, the
    * class-doc window rule) — plus the WHOLE unmanifested arrival
    * tail (bounded by the compaction interval). Callers keep their
    * residual filter — same exactness contract as
    * [[Manifest.prunedRead]]. Before the first compaction there is
    * no manifest yet: everything is tail, read whole. Resolution is
    * the engine's ONE rule ([[CompactingLake.resolve]]), not a local
    * copy. */
  def prunedScan(spark: SparkSession, root: String,
      ranges: Seq[(String, Double, Double)] = Nil,
      bloomAnyOf: Seq[Any] = Nil): DataFrame = {
    val lv = CompactingLake.resolve(spark, root)
    val shardParts = lv.shardReads.map { case (d, pred) =>
      val base =
        if (Manifest.committed(spark, d)) Manifest.prunedRead(spark, d, ranges, bloomAnyOf)
        else spark.read.parquet(d)
      pred.fold(base)(base.filter)
    }
    val chunkParts = lv.chunks.flatMap { case (c, d) =>
      val vis = lv.visibleSlices(d, c)
      if (vis.isEmpty) None
      else if (Manifest.committed(spark, d)) {
        val (files, _) = Manifest.selectedFiles(spark, d, ranges, bloomAnyOf)
        val visP = vis.map(sd => pathOf(sd) + "/")
        val keep = files.filter(f => visP.exists(pathOf(f).startsWith))
        if (keep.isEmpty) Some(spark.read.parquet(vis: _*).where(lit(false)))
        else Some(spark.read.parquet(keep.toIndexedSeq: _*))
      } else Some(spark.read.parquet(vis: _*))
    }
    val tailPart =
      if (lv.tail.isEmpty) Seq.empty
      else Seq(spark.read.parquet(lv.tail: _*))
    val parts = shardParts ++ chunkParts ++ tailPart
    require(parts.nonEmpty, s"no committed batches under $root")
    parts.reduce(_ unionByName _)
  }

  /** Unpruned read — [[CompactingLake.visible]], for parity checks. */
  def visible(spark: SparkSession, root: String): DataFrame =
    CompactingLake.visible(spark, root)
}
