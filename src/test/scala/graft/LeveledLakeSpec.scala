package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout, Manifest}
import graft.streaming.{BatchVersioned, CompactingLake, KeywordIndexStream, ManifestStream, ZOrderStream}

/** Leveled compaction (round 16 — the r15 verdict's top item): the r15
  * engine rewrote the FULL committed history every `compactEvery`
  * batches, O(N²) cumulative write I/O on a growing lake. Now a MINOR
  * compaction folds only the arrival tail into a bounded L1 chunk
  * (cost flat in history depth) and a rare MAJOR (byte-fraction
  * trigger) folds base + chunks + tail into a new base. These specs
  * pin: row parity through minor/major interleavings, the minor's
  * input being EXACTLY the tail (the flatness property), per-level GC,
  * replay and torn-write safety on both paths, and per-chunk pruning
  * (manifests and clustering hold per level). */
class LeveledLakeSpec extends AnyFunSuite {
  import TestSpark._

  private val n = 160000L
  private def rows = spark.range(n).select(
    col("id"),
    (col("id") * 48271L % n).as("x"),
    (col("id") * 52361L % n).as("y"))

  // 17 batches, compactEvery = 4 → compaction points at 4, 8, 12, 16.
  private val nB = 17
  private def slice(b: Int) = rows.filter(col("id") % nB === b)

  test("minor-only chain: parity, chunks cover exactly their tails, arrivals GC'd, replay safe") {
    val root = Files.createTempDirectory("graft_lvl_minor").toString
    try {
      // majorFrac = ∞ → only the very first compaction (no base yet)
      // is major; every later one is a minor over its own tail
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      (0 until nB).foreach { b => sink(slice(b), b) }

      // parity: nothing lost or doubled across 1 major + 3 minors
      val vis = ZOrderStream.visible(spark, root)
      assert(vis.count() === n)
      assert(vis.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq ===
        rows.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq)

      // structure: base v=4, L1 chunks v=8, v=12, v=16
      assert(BatchVersioned.versions(spark, s"$root/compact").map(_._1) === Seq(4L))
      assert(BatchVersioned.versions(spark, s"$root/l1").map(_._1) === Seq(8L, 12L, 16L))

      // FLATNESS: each minor chunk holds exactly its own 4-batch tail —
      // the minor never re-read the base or earlier chunks
      Seq(8, 12, 16).foreach { v =>
        val chunk = spark.read.parquet(s"$root/l1/v=$v").count()
        val want = (v - 4 until v).map(b =>
          rows.filter(col("id") % nB === b).count()).sum
        assert(chunk === want, s"l1/v=$v holds $chunk rows, its tail is $want")
      }

      // GC: arrivals below the last compaction's floor (12) are gone,
      // the replay window [12, 17) stays
      val bIds = BatchVersioned.versions(spark, root, prefix = "b").map(_._1)
      assert(bIds === Seq(12L, 13L, 14L, 15L, 16L), s"arrival dirs: $bIds")

      // replay of the latest compacting batch: same inputs on disk →
      // same minor decision, overwrites its own chunk, parity holds
      ZOrderStream.processBatch(slice(16), 16L, root, Seq("x", "y"),
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      assert(ZOrderStream.visible(spark, root).count() === n)
      assert(BatchVersioned.versions(spark, s"$root/l1").map(_._1) === Seq(8L, 12L, 16L))

      // per-chunk clustering: a trailing-key slab over one chunk prunes
      val chunk = spark.read.parquet(s"$root/l1/v=16")
      val total = chunk.count()
      val (_, scanned) = Layout.scanRows(
        chunk.filter(col("y") >= 1000L && col("y") < 2000L))
      // the chunk is 1/4 of the corpus, so its row groups are coarse
      // relative to the slab — the evidence is "clustered, not
      // append-order" (append-order scans ~100%), not a deep-prune bound
      assert(scanned < total / 3,
        s"minor chunk not internally clustered: scanned $scanned of $total")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("minor → major → minor interleaving: the major folds base+chunks+tail; stale levels GC'd") {
    val root = Files.createTempDirectory("graft_lvl_mix").toString
    try {
      // equal-sized batches: at frac=1.5 the points land major(4) —
      // no base — minor(8) — tail 4 < 1.5·4 — major(12) — chunk+tail
      // 8 ≥ 1.5·4 — minor(16) — tail 4 < 1.5·12
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = 1.5)
      (0 until nB).foreach { b => sink(slice(b), b) }

      assert(BatchVersioned.versions(spark, s"$root/compact").map(_._1) === Seq(12L),
        "major at 12 should be the only live base (v=4 GC'd at 16)")
      assert(BatchVersioned.versions(spark, s"$root/l1").map(_._1) === Seq(16L),
        "chunk v=8 was folded into base v=12 and GC'd at 16")

      // parity, and the base holds exactly batches 0..11
      assert(ZOrderStream.visible(spark, root).count() === n)
      val base = CompactingLake.compactPart(spark, root).get.count()
      val wantBase = (0 until 12).map(b =>
        rows.filter(col("id") % nB === b).count()).sum
      assert(base === wantBase, s"base v=12 holds $base rows, batches 0-11 are $wantBase")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("torn minor chunk is invisible until its replay commits") {
    val root = Files.createTempDirectory("graft_lvl_torn").toString
    try {
      val keys = Seq("x", "y")
      (0 until 6).foreach { b =>
        ZOrderStream.processBatch(slice(b), b, root, keys, compactEvery = 4,
          targetBytes = 256 * 1024, blockBytes = 64 * 1024,
          majorFrac = Double.PositiveInfinity)
      }
      val before = ZOrderStream.visible(spark, root).count()

      // a torn minor attempt: junk rows under l1/, no _SUCCESS
      rows.limit(10).write.parquet(s"$root/l1/v=5")
      Files.delete(java.nio.file.Paths.get(s"$root/l1/v=5/_SUCCESS"))
      assert(ZOrderStream.visible(spark, root).count() === before,
        "torn L1 chunk leaked into the visible assembly")

      // the replayed compacting batch (hypothetical b=5 compaction
      // point) re-runs and commits over the torn attempt; visibility
      // shifts batch 4's rows from tail into the chunk, parity holds
      graft.streaming.CompactingLake.compact(spark, root, 5L,
        targetBytes = 256 * 1024,
        rewrite = (df, dst, files) =>
          Layout.zorderWrite(df, dst, keys, files, 8, 64 * 1024),
        majorFrac = Double.PositiveInfinity)
      assert(ZOrderStream.visible(spark, root).count() === before)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("incremental manifests: each L1 chunk carries its own; pruned scans stay exact per level") {
    val root = Files.createTempDirectory("graft_lvl_mf").toString
    try {
      val data = spark.range(n).select(
        col("id"), (col("id") * 48271L % n).as("k"), (col("id") % 97).as("payload"))
      def dslice(b: Int) = data.filter(col("id") % nB === b)
      val sink = ManifestStream.sink(root, Seq("k"), bloomKey = Some("id"),
        compactEvery = 4, targetBytes = 64 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      (0 until nB).foreach { b => sink(dslice(b), b) }

      // every level dir carries its own committed manifest
      val lvlDirs = BatchVersioned.versions(spark, s"$root/compact").map(_._2) ++
        BatchVersioned.versions(spark, s"$root/l1").map(_._2)
      assert(lvlDirs.size === 4)
      lvlDirs.foreach { d =>
        assert(Manifest.committed(spark, d), s"level dir without manifest: $d")
      }

      // pruned scans == direct answers over the whole assembly
      val slab = ManifestStream.prunedScan(spark, root,
          ranges = Seq(("k", 1000.0, 1999.0)))
        .filter(col("k").between(1000L, 1999L))
      assert(slab.count() === 1000L)
      val probes = Seq(5L, 77777L, 123456L)
      val got = ManifestStream.prunedScan(spark, root, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      val want = data.filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      assert(got === want && got.size === probes.size)

      // an L1 chunk's manifest actually file-prunes that chunk
      val chunkDir = BatchVersioned.versions(spark, s"$root/l1").last._2
      val (sel, total) = Manifest.selectedFiles(spark, chunkDir,
        bloomAnyOf = Seq(-42L))
      assert(total >= 4, s"chunk built only $total files — pruning untestable")
      assert(sel.length <= 2, s"chunk bloom kept ${sel.length} of $total files")

      // the generalized crash window: ONE chunk loses its manifest —
      // that chunk is read unpruned (exact), the others keep pruning
      graft.tools.FileUtil.deleteTree(
        java.nio.file.Paths.get(s"$chunkDir/${Manifest.SubDir}"))
      val got2 = ManifestStream.prunedScan(spark, root, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*)).count()
      assert(got2 === probes.size.toLong)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("leveled law: visible() equals the flat ingested union at EVERY batch, for every major-trigger regime") {
    // deterministic-random batch sizes (seeded RNG — no wall-clock
    // dependence), three trigger regimes: always-major (the legacy
    // r15 behavior), the default byte-fraction mix, and minor-only.
    // The invariant is the engine's whole contract: at no instant —
    // mid-chain, straight after a minor, straight after a major —
    // may a reader see a row twice or miss one.
    val rnd = new scala.util.Random(20260816L)
    val nRows = 30000L
    val base = spark.range(nRows).select(
      col("id"), (col("id") * 48271L % nRows).as("x"), (col("id") * 52361L % nRows).as("y"))
    for (frac <- Seq(0.0, 1.0, Double.PositiveInfinity)) {
      val root = Files.createTempDirectory(s"graft_lvl_law").toString
      try {
        val cuts = (0 until 11).map(_ => rnd.nextInt(100)).scanLeft(0)(_ + _)
        val total = cuts.last
        var ingested = 0L
        cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), b) =>
          val slice = base.filter(pmod(col("id"), lit(total)) >= lo &&
            pmod(col("id"), lit(total)) < hi)
          ingested += slice.count()
          ZOrderStream.processBatch(slice, b, root, Seq("x", "y"),
            compactEvery = 3, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
            majorFrac = frac)
          val vis = ZOrderStream.visible(spark, root).count()
          assert(vis === ingested,
            s"frac=$frac batch=$b: visible $vis != ingested $ingested")
        }
      } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
    }
  }

  test("keyword index on the leveled lake: streamed == one-shot batch through minors") {
    val root = Files.createTempDirectory("graft_lvl_kidx").toString
    val batchDir = Files.createTempDirectory("graft_lvl_kidx_b").toString
    try {
      val corpus = spark.range(20000L).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          expr("transform(sequence(0, 19), i -> concat('w', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 10000 as string)))"),
          when(col("id") % 500 === 0, lit("needle")).otherwise(lit("w1")),
          when(col("id") % 300 === 0, lit("thread")).otherwise(lit("w2")))
          .as("text"))
      (0 until nB).foreach { b =>
        KeywordIndexStream.processBatch(
          corpus.filter(col("doc_id") % nB === b), b, root,
          compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
          majorFrac = Double.PositiveInfinity)
      }
      assert(BatchVersioned.versions(spark, s"$root/l1").nonEmpty,
        "no minor chunks — the leveled path was not exercised")
      InvertedIndex.build(corpus, batchDir, files = 4, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val got = KeywordIndexStream.lookupAll(spark, root, terms)
        .collect().map(_.getLong(0)).toSet
      val want = InvertedIndex.lookupAll(spark, batchDir, terms)
        .collect().map(_.getLong(0)).toSet
      assert(got === want)
      assert(want.nonEmpty, "planted AND set empty — corpus drifted")
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(batchDir))
    }
  }
}
