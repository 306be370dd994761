package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Manifest
import graft.streaming.ManifestStream

/** Streaming manifest maintenance: every compaction rewrites the
  * committed history clustered AND rebuilds the per-file manifest
  * inside the same `_SUCCESS`-gated version dir, so a reader never
  * sees a manifest that disagrees with its files; pruned scans answer
  * exactly what the unpruned assembly answers while file-pruning the
  * compacted history. */
class ManifestStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val n = 160000L
  // k scattered (cluster/zone-map key), id uncorrelated (bloom key)
  private def rows = spark.range(n).select(
    col("id"),
    (col("id") * 48271L % n).as("k"),
    (col("id") % 97).as("payload"))

  test("ingest + compaction: pruned scans == direct answers; compact history file-prunes; replay safe") {
    val root = Files.createTempDirectory("graft_mstream").toString
    try {
      val sink = ManifestStream.sink(root, Seq("k"),
        bloomKey = Some("id"), compactEvery = 4,
        targetBytes = 64 * 1024, blockBytes = 64 * 1024)
      (0 until 9).foreach { b => sink(rows.filter(col("id") % 9 === b), b) }

      // zone-map range through the pruned scan == direct filter
      val slab = ManifestStream.prunedScan(spark, root,
          ranges = Seq(("k", 1000.0, 1999.0)))
        .filter(col("k").between(1000L, 1999L))
      assert(slab.count() === 1000L)

      // bloom point lookup through the pruned scan == direct filter
      val probes = Seq(5L, 77777L, 123456L)
      val got = ManifestStream.prunedScan(spark, root, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      val want = rows.filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      assert(got === want && got.size === probes.size)

      // the folded shard's manifest actually file-prunes: the v=8
      // fold covers batches 0-7 in many 64 KiB-target files
      val compactDir = graft.streaming.BatchVersioned
        .versions(spark, s"$root/shard/s=0").last._2
      val (selSlab, total) = Manifest.selectedFiles(spark, compactDir,
        ranges = Seq(("k", 1000.0, 1999.0)))
      assert(total >= 8, s"compact version built only $total files — pruning untestable")
      assert(selSlab.length < total / 4,
        s"zone maps failed to prune the compacted history: ${selSlab.length} of $total")
      val (selAbs, _) = Manifest.selectedFiles(spark, compactDir,
        bloomAnyOf = Seq(-42L))
      assert(selAbs.length <= 2,
        s"absent-id probe kept ${selAbs.length} of $total compact files")

      // replayed pre-compaction batch: recommits its own dir, nothing
      // a pruned reader sees changes
      ManifestStream.processBatch(rows.filter(col("id") % 9 === 5), 5L, root,
        Seq("k"), bloomKey = Some("id"), compactEvery = 4,
        targetBytes = 64 * 1024, blockBytes = 64 * 1024)
      assert(ManifestStream.prunedScan(spark, root).count() === n)
      assert(ManifestStream.visible(spark, root).count() === n)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("manifest-less committed version (the crash window): pruned scan falls back unpruned, stays exact") {
    val root = Files.createTempDirectory("graft_mstream_window").toString
    try {
      val sink = ManifestStream.sink(root, Seq("k"),
        bloomKey = Some("id"), compactEvery = 4,
        targetBytes = 64 * 1024, blockBytes = 64 * 1024)
      (0 until 5).foreach { b => sink(rows.filter(col("id") % 9 === b), b) }
      // simulate the crash between the data write's _SUCCESS and the
      // manifest build: the committed version loses its manifest
      val compactDir = graft.streaming.BatchVersioned
        .versions(spark, s"$root/shard/s=0").last._2
      graft.tools.FileUtil.deleteTree(
        java.nio.file.Paths.get(s"$compactDir/${Manifest.SubDir}"))
      // a pruned reader in the window answers EXACTLY (unpruned
      // fallback — the cost is time, never rows); no throw
      val probes = Seq(5L, 77777L)
      val got = ManifestStream.prunedScan(spark, root, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*)).count()
      val want = rows.filter(col("id") % 9 <= 4)
        .filter(col("id").isin(probes: _*)).count()
      assert(got === want)
      assert(ManifestStream.prunedScan(spark, root,
        ranges = Seq(("k", 1000.0, 1999.0)))
        .filter(col("k").between(1000L, 1999L)).count() ===
        rows.filter(col("id") % 9 <= 4)
          .filter(col("k").between(1000L, 1999L)).count())
      // the replayed compacting batch rebuilds data + manifest, and
      // pruning resumes
      ManifestStream.processBatch(rows.filter(col("id") % 9 === 4), 4L, root,
        Seq("k"), bloomKey = Some("id"), compactEvery = 4,
        targetBytes = 64 * 1024, blockBytes = 64 * 1024)
      val rebuilt = graft.streaming.BatchVersioned
        .versions(spark, s"$root/shard/s=0").last._2
      assert(Manifest.committed(spark, rebuilt), "replay did not rebuild the manifest")
      val (sel, total) = Manifest.selectedFiles(spark, rebuilt,
        bloomAnyOf = probes)
      assert(sel.length < total, "rebuilt manifest prunes nothing")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("before the first compaction everything is tail: pruned scan reads it whole and exactly") {
    val root = Files.createTempDirectory("graft_mstream_tail").toString
    try {
      (0 until 3).foreach { b =>
        ManifestStream.processBatch(rows.filter(col("id") % 9 === b), b, root,
          Seq("k"), bloomKey = Some("id"), compactEvery = 0)
      }
      val direct = rows.filter(col("id") % 9 <= 2)
      assert(ManifestStream.prunedScan(spark, root,
          ranges = Seq(("k", 0.0, 999.0)))
        .filter(col("k") < 1000L).count() ===
        direct.filter(col("k") < 1000L).count())
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }
}
