package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout
import graft.streaming.ZOrderStream

/** Streaming Z-order layout maintenance: micro-batched ingest +
  * periodic compaction must (a) never lose or duplicate a row across
  * compaction/GC/replay, and (b) actually re-cluster — a filtered
  * scan over the compacted history prunes row groups on the TRAILING
  * key, which no append-order layout can. */
class ZOrderStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val n = 160000L
  // two independent scattered permutations (multipliers coprime to n)
  private def rows = spark.range(n).select(
    col("id"),
    (col("id") * 48271L % n).as("x"),
    (col("id") * 52361L % n).as("y"))

  test("ingest + compaction: row parity, trailing-key pruning over the compacted history, GC, replay safety") {
    val root = Files.createTempDirectory("graft_zstream").toString
    try {
      // 9 arrival batches, compactEvery=4 → compactions at b=4 and
      // b=8 (each covering all committed history); small blocks via
      // targetBytes so the compact version has many row groups
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024)
      (0 until 9).foreach { b =>
        sink(rows.filter(col("id") % 9 === b), b)
      }

      // parity: nothing lost, nothing doubled through two compactions
      val vis = ZOrderStream.visible(spark, root)
      assert(vis.count() === n)
      assert(vis.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq ===
        rows.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq)

      // GC: arrival dirs below the PREVIOUS compact version (v=4) are
      // gone; v=8 and the tail (b=8) remain
      val bDirs = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("b=")).map(_.getName).toSet
      assert(!bDirs.contains("b=0") && !bDirs.contains("b=1"),
        s"pre-v4 arrival dirs survived GC: $bDirs")
      assert(bDirs.contains("b=8"), s"tail dir missing: $bDirs")

      // layout: the compacted history (v=8 covers batches 0-7, 8/9 of
      // the rows) prunes on the TRAILING key
      val compacted = ZOrderStream.compactPart(spark, root).get
      val total = compacted.count()
      val (res, scanned) = Layout.scanRows(
        compacted.filter(col("y") >= 1000L && col("y") < 2000L))
      assert(res === rows.filter(col("id") % 9 =!= 8)
        .filter(col("y") >= 1000L && col("y") < 2000L).count())
      assert(scanned < total / 4,
        s"compacted stream layout failed to prune trailing key: $scanned of $total")

      // replay safety: a replayed pre-compaction batch overwrites its
      // own dir and changes nothing a reader sees (its rows are
      // already inside v=8; b=5 sits below the newest version so the
      // recommitted dir is not in the visible assembly)
      ZOrderStream.processBatch(rows.filter(col("id") % 9 === 5), 5L, root,
        Seq("x", "y"), compactEvery = 4, targetBytes = 256 * 1024,
        blockBytes = 64 * 1024)
      assert(ZOrderStream.visible(spark, root).count() === n)

      // scan() composes the predicate over the full visible assembly
      assert(ZOrderStream.scan(spark, root,
        col("y") >= 1000L && col("y") < 2000L).count() === 1000L)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("torn compaction attempt is invisible until replay commits it") {
    val root = Files.createTempDirectory("graft_zstream_torn").toString
    try {
      val keys = Seq("x", "y")
      (0 until 3).foreach { b =>
        ZOrderStream.processBatch(rows.filter(col("id") % 9 === b), b, root,
          keys, compactEvery = 0)
      }
      val before = ZOrderStream.visible(spark, root).count()

      // a torn fold version: junk rows, no _SUCCESS
      rows.limit(10).write.parquet(s"$root/shard/s=0/v=2")
      Files.delete(java.nio.file.Paths.get(s"$root/shard/s=0/v=2/_SUCCESS"))
      assert(ZOrderStream.visible(spark, root).count() === before,
        "torn shard fold leaked into the visible assembly")

      // the replayed compacting batch re-runs compaction from scratch
      // and commits over the torn attempt
      ZOrderStream.compact(spark, root, 2L, keys, bitsPerKey = 8,
        targetBytes = 256 * 1024)
      val vis = ZOrderStream.visible(spark, root)
      // v=2 covers batches 0-1; batch 2 stays in the tail — parity holds
      assert(vis.count() === before)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }
}
