package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, Manifest}

/** File-skipping manifest: per-file zone maps + per-file blooms prune
  * the FILE LIST before any parquet footer is read — the layer above
  * [[LayoutSpec]]'s row-group pruning. The invariants: pruning never
  * changes a row (the residual filter owns exactness), point lookups
  * on a key UNCORRELATED with the clustering skip via bloom
  * certainty-of-absence (where zone maps are blind), range predicates
  * on the cluster key skip via zone maps, and a file whose bloom key
  * is all-NULL is never pruned. */
class FileSkipSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val n = 200000L
  private val nFiles = 16
  // k = id * 48271 mod n is a permutation: the table is CLUSTERED on
  // k, so id (the bloom key) is uniformly scattered across all files
  // — every file's id zone map spans ~the whole domain and only the
  // bloom can skip files on an id lookup
  private def data = spark.range(n).select(
    col("id"),
    (col("id") * 48271L % n).as("k"),
    (col("id") % 97).as("payload"))

  private def build(dir: String): Unit = {
    Layout.clusteredWrite(data, dir, Seq("k"), files = nFiles)
    Manifest.write(spark, dir, Seq("k"), Some("id"))
  }

  test("bloom point lookup: identical rows, file list pruned to the hits") {
    val dir = Files.createTempDirectory("graft_mf").toString
    try {
      build(dir)
      val probes = Seq(5L, 77777L, 123456L)
      val (sel, total) = Manifest.selectedFiles(spark, dir, bloomAnyOf = probes)
      assert(total === nFiles.toLong)
      // each probe lives in exactly one file; 0.8% FP per (file, probe)
      // leaves generous room below half the table
      assert(sel.length >= 1 && sel.length < nFiles / 2,
        s"bloom pruned to ${sel.length} of $total files")
      val got = Manifest.prunedRead(spark, dir, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      val want = data.filter(col("id").isin(probes: _*))
        .select("id", "k", "payload").collect().map(_.toSeq).toSet
      assert(got === want && got.size === probes.size)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("absent key: certainty of absence skips ~every file, zero rows") {
    val dir = Files.createTempDirectory("graft_mf_abs").toString
    try {
      build(dir)
      val (sel, total) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(-42L))
      assert(total === nFiles.toLong)
      assert(sel.length <= 2, s"absent probe kept ${sel.length} files (expected ~0 + FP)")
      assert(Manifest.prunedRead(spark, dir, bloomAnyOf = Seq(-42L))
        .filter(col("id") === -42L).count() === 0L)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("zone-map range on the cluster key prunes files; rows identical") {
    val dir = Files.createTempDirectory("graft_mf_rng").toString
    try {
      build(dir)
      val (lo, hi) = (1000.0, 1999.0)
      val (sel, total) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("k", lo, hi)))
      // a 0.5% slab of a 16-file range-clustered layout touches the
      // one or two files whose range covers it
      assert(sel.length < nFiles / 4,
        s"zone maps pruned to ${sel.length} of $total files")
      val q = Manifest.prunedRead(spark, dir, ranges = Seq(("k", lo, hi)))
        .filter(col("k").between(lo, hi))
      assert(q.count() === 1000L)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("all-NULL bloom-key file is never pruned; present keys still found") {
    val dir = Files.createTempDirectory("graft_mf_null").toString
    try {
      // ids NULLed where k < n/4: after clustering on k the low-range
      // files carry a NULL bloom. A quarter of the domain (≈4 of 16
      // files), NOT one file's worth — the range partitioner's
      // boundaries are SAMPLED, so a region sized to exactly one file
      // sometimes covers none entirely (observed flake)
      val d2 = data.select(
        when(col("k") < n / 4, lit(null).cast("long")).otherwise(col("id")).as("id"),
        col("k"), col("payload"))
      Layout.clusteredWrite(d2, dir, Seq("k"), files = nFiles)
      Manifest.write(spark, dir, Seq("k"), Some("id"))
      val (sel, _) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(-42L))
      // the contract is per-FILE: every file whose bloom key was
      // all-NULL (NULL bloom — absence unprovable) must survive any
      // probe. A range-boundary file MIXING null and non-null ids
      // carries a real bloom and is correctly prunable — which is why
      // bloom pruning can never be used to FIND nulls (documented).
      val mf = spark.read.parquet(s"$dir/${Manifest.SubDir}")
      val nullFiles = mf.filter(col("bloom").isNull)
        .select("file").collect().map(_.getString(0)).toSet
      assert(nullFiles.nonEmpty, "corpus built no all-NULL file — test setup drifted")
      assert(nullFiles.subsetOf(sel.toSet),
        s"null-bloom files pruned: ${nullFiles -- sel.toSet}")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("all-NULL stats-key file is never range-pruned (NULL zone map = might match)") {
    val dir = Files.createTempDirectory("graft_mf_nullzm").toString
    try {
      // a second stats key that is NULL everywhere k < n/4 (a quarter
      // of the domain — sampled range boundaries make a one-file-sized
      // region flaky): after clustering on k the low-range files carry
      // NULL min/max for it — range predicates must keep those files
      val d2 = data.select(col("id"), col("k"),
        when(col("k") < n / 4, lit(null).cast("long"))
          .otherwise(col("id") % 1000).as("v"))
      Layout.clusteredWrite(d2, dir, Seq("k"), files = nFiles)
      Manifest.write(spark, dir, Seq("k", "v"), bloomKey = None)
      val mf = spark.read.parquet(s"$dir/${Manifest.SubDir}")
      val nullFiles = mf.filter(col("min_v").isNull)
        .select("file").collect().map(_.getString(0)).toSet
      assert(nullFiles.nonEmpty, "corpus built no all-NULL stats file — setup drifted")
      val (sel, _) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("v", 0.0, 10.0)))
      assert(nullFiles.subsetOf(sel.toSet),
        s"NULL zone-map files pruned: ${nullFiles -- sel.toSet}")
      // and the answer through the pruned read matches the direct one
      val got = Manifest.prunedRead(spark, dir, ranges = Seq(("v", 0.0, 10.0)))
        .filter(col("v").between(0L, 10L)).count()
      assert(got === d2.filter(col("v").between(0L, 10L)).count())
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("manifest over a Z-ORDERED table: file-level pruning on BOTH keys (composition)") {
    val dir = Files.createTempDirectory("graft_mf_z").toString
    try {
      // two independent scattered dims (LayoutSpec's corpus): under
      // lexicographic clustering only the leading key's file stats
      // are narrow; under Z-order EVERY key's per-file min/max covers
      // ~a square region, so the manifest can skip files on either
      // key — file-level pruning stacked on top of q115's row-group
      // pruning, from the same one manifest
      val xy = spark.range(n).select(
        (col("id") * 48271L % n).as("x"),
        (col("id") * 52361L % n).as("y"),
        (col("id") % 97).as("payload"))
      Layout.zorderWrite(xy, dir, Seq("x", "y"), files = 16)
      Manifest.write(spark, dir, Seq("x", "y"), bloomKey = None)
      // a 3% slab on EACH key separately must both file-prune
      val w = n / 32
      val (selX, total) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("x", 0.0, (w - 1).toDouble)))
      val (selY, _) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("y", 0.0, (w - 1).toDouble)))
      assert(total === 16L)
      assert(selX.length < 16 && selY.length < 16,
        s"z-ordered manifest pruned nothing: x=${selX.length}, y=${selY.length} of $total")
      // and a 2-key box localizes to an ABSOLUTE corner of the file
      // set (subset-of-each-slab is true by construction — conjunctive
      // filters — so the meaningful bound is the box's own size: a
      // (1/32)² corner of a z-layout touches the few files whose cell
      // range covers it)
      val (selBox, _) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("x", 0.0, (w - 1).toDouble), ("y", 0.0, (w - 1).toDouble)))
      assert(selBox.length <= total.toInt / 4,
        s"box failed to localize: ${selBox.length} of $total files (slabs ${selX.length}/${selY.length})")
      // answers stay exact through the pruned read
      val got = Manifest.prunedRead(spark, dir,
          ranges = Seq(("x", 0.0, (w - 1).toDouble), ("y", 0.0, (w - 1).toDouble)))
        .filter(col("x") < w && col("y") < w).count()
      assert(got === xy.filter(col("x") < w && col("y") < w).count())
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("probe literal type is cast to the build key's type (no silent false-negatives)") {
    val dir = Files.createTempDirectory("graft_mf_typ").toString
    try {
      build(dir) // bloom key `id` is BIGINT
      // an Int probe literal hashes differently from a Long under
      // xxhash64; the manifest's recorded bloom_type casts it before
      // probing, so the Int spelling selects the same files — and
      // finds the row — as the properly-typed probe
      val (selInt, _) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(5))
      val (selLong, _) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(5L))
      assert(selInt.toSet === selLong.toSet,
        s"Int probe selected ${selInt.length} files, Long probe ${selLong.length}")
      val got = Manifest.prunedRead(spark, dir, bloomAnyOf = Seq(5))
        .filter(col("id") === 5L).count()
      assert(got === 1L, "typed-cast probe lost the true match")
      // a String probe likewise casts ("5" -> 5L) rather than hashing
      // as a string and pruning the true file
      val gotStr = Manifest.prunedRead(spark, dir, bloomAnyOf = Seq("5"))
        .filter(col("id") === 5L).count()
      assert(gotStr === 1L)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("legacy manifest (no bloom_type column) still probes under the old untyped contract") {
    val dir = Files.createTempDirectory("graft_mf_legacy").toString
    try {
      build(dir)
      // simulate a pre-round-16 manifest: rewrite it without the typed
      // columns (a leveled lake's base manifest is immutable until its
      // next major compaction, so old manifests persist indefinitely)
      val legacy = spark.read.parquet(s"$dir/${Manifest.SubDir}")
        .drop("bloom_key", "bloom_type").collect()
      val schema = spark.read.parquet(s"$dir/${Manifest.SubDir}")
        .drop("bloom_key", "bloom_type").schema
      spark.createDataFrame(java.util.Arrays.asList(legacy: _*), schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/${Manifest.SubDir}")
      // correctly-typed probes (the old caller contract) still select
      // and read exactly
      val got = Manifest.prunedRead(spark, dir, bloomAnyOf = Seq(5L))
        .filter(col("id") === 5L).count()
      assert(got === 1L)
      val (sel, total) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(-42L))
      assert(total === nFiles.toLong && sel.length <= 2)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("empty data dir: zero-row manifest selects nothing instead of throwing") {
    val dir = Files.createTempDirectory("graft_mf_empty").toString
    try {
      Layout.clusteredWrite(data.where(lit(false)), dir, Seq("k"), files = 1)
      Manifest.write(spark, dir, Seq("k"), Some("id"))
      val (sel, total) = Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(5L))
      assert(sel.isEmpty && total === 0L)
      assert(Manifest.prunedRead(spark, dir, bloomAnyOf = Seq(5L)).count() === 0L)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("prunedRead refuses ignoreMissingFiles=true (stale manifests must fail loudly)") {
    val dir = Files.createTempDirectory("graft_mf_imf").toString
    try {
      build(dir)
      spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
      try assertThrows[IllegalArgumentException] {
        Manifest.prunedRead(spark, dir, bloomAnyOf = Seq(5L))
      } finally spark.conf.set("spark.sql.files.ignoreMissingFiles", "false")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("multi-file manifest (distributed build): selection and reads identical to single-file") {
    val dir = Files.createTempDirectory("graft_mf_multi").toString
    try {
      // a tiny target granule forces the sized repartition to emit
      // many manifest part files — the 800k-file geometry's shape,
      // where coalesce(1) would funnel ~1 TB through one task. The
      // read side prunes the manifest AS A TABLE, so selection must
      // not care how many files carry it.
      Layout.clusteredWrite(data, dir, Seq("k"), files = nFiles)
      Manifest.write(spark, dir, Seq("k"), Some("id"), targetBytes = 4 * 1024)
      val parts = new java.io.File(s"$dir/${Manifest.SubDir}").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts > 1, s"tiny targetBytes still produced $parts manifest file(s)")
      val probes = Seq(5L, 77777L, 123456L)
      val (sel, total) = Manifest.selectedFiles(spark, dir, bloomAnyOf = probes)
      assert(total === nFiles.toLong)
      assert(sel.length >= 1 && sel.length < nFiles / 2)
      val got = Manifest.prunedRead(spark, dir, bloomAnyOf = probes)
        .filter(col("id").isin(probes: _*)).count()
      assert(got === probes.size.toLong)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("zone-map-only manifest: ranges serve, bloom probes loud-reject") {
    val dir = Files.createTempDirectory("graft_mf_zm").toString
    try {
      Layout.clusteredWrite(data, dir, Seq("k"), files = nFiles)
      Manifest.write(spark, dir, Seq("k"), bloomKey = None)
      val (sel, total) = Manifest.selectedFiles(spark, dir,
        ranges = Seq(("k", 0.0, 999.0)))
      assert(sel.length < nFiles / 4 && total === nFiles.toLong)
      assertThrows[IllegalArgumentException] {
        Manifest.selectedFiles(spark, dir, bloomAnyOf = Seq(1L))
      }
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
