package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** Clustered-layout scan pruning: identical data, identical query —
  * the CLUSTERED write prunes parquet row groups down to the matching
  * key range while the random write scans everything. This is the
  * at-rest property every 100 TB filtered scan depends on, measured
  * from the scan node's own metrics (rows emitted after row-group /
  * page pruning, before the residual filter). */
class LayoutSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val n = 200000L
  // scattered write order: k = id * 48271 mod n is a permutation
  // (gcd(48271, 200000) = 1), so unsorted files span ~the full range
  private def data = spark.range(n).select(
    (col("id") * 48271L % n).as("k"),
    (col("id") % 97).as("payload"))

  private def narrow(path: String) =
    spark.read.parquet(path).filter(col("k") >= 1000L && col("k") < 2000L)

  test("clustered layout prunes row groups; random layout scans the table") {
    val dir = Files.createTempDirectory("graft_layout").toString
    try {
      data.repartition(8).write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024).parquet(s"$dir/random")
      Layout.clusteredWrite(data, s"$dir/clustered", Seq("k"),
        files = 8, blockBytes = 64 * 1024)

      val (resR, scanR) = Layout.scanRows(narrow(s"$dir/random"))
      val (resC, scanC) = Layout.scanRows(narrow(s"$dir/clustered"))
      assert(resR === 1000L && resC === 1000L) // same answer both layouts
      // the filter reaches the parquet reader (prerequisite for pruning)
      assert(narrow(s"$dir/clustered").queryExecution.executedPlan.toString
        .contains("PushedFilters"))
      // random layout: every row group spans ~the full key range -> nothing prunes
      assert(scanR > n / 2, s"random layout unexpectedly pruned: scan=$scanR of $n")
      // clustered: only the row groups covering [1000, 2000) survive
      assert(scanC < n / 20, s"clustered layout failed to prune: scan=$scanC of $n")
      assert(scanC < scanR / 10, s"pruning ratio too weak: $scanC vs $scanR")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("z-order layout prunes on the trailing key where lexicographic clustering cannot") {
    val dir = Files.createTempDirectory("graft_layout_z").toString
    try {
      // two independent scattered dims (both multipliers coprime to n,
      // so each is a permutation and (x, y) fills the grid uniformly)
      val xy = spark.range(n).select(
        (col("id") * 48271L % n).as("x"),
        (col("id") * 52361L % n).as("y"),
        (col("id") % 97).as("payload"))
      Layout.clusteredWrite(xy, s"$dir/lex", Seq("x", "y"),
        files = 8, blockBytes = 64 * 1024)
      Layout.zorderWrite(xy, s"$dir/z", Seq("x", "y"),
        files = 8, bitsPerKey = 8, blockBytes = 64 * 1024)

      // trailing-key slab: every lexicographic x-run spans the full y
      // domain, so min/max stats on y prune NOTHING; the interleaved
      // layout keeps each row group to a narrow y extent
      def slab(path: String) =
        spark.read.parquet(path).filter(col("y") >= 1000L && col("y") < 2000L)
      val (resLex, scanLex) = Layout.scanRows(slab(s"$dir/lex"))
      val (resZ, scanZ) = Layout.scanRows(slab(s"$dir/z"))
      assert(resLex === 1000L && resZ === 1000L) // same answer both layouts
      assert(slab(s"$dir/z").queryExecution.executedPlan.toString
        .contains("PushedFilters"))
      assert(scanLex > n / 2, s"lex layout unexpectedly pruned on trailing key: $scanLex of $n")
      assert(scanZ < n / 4, s"z-order failed to prune on trailing key: $scanZ of $n")
      assert(scanZ < scanLex / 3, s"pruning ratio too weak: $scanZ vs $scanLex")

      // box on BOTH keys: the z layout localizes to the few cells the
      // box overlaps — deeper than either single-key slab
      val box = spark.read.parquet(s"$dir/z")
        .filter(col("x") >= 1000L && col("x") < 2000L &&
                col("y") >= 1000L && col("y") < 2000L)
      val (resBox, scanBox) = Layout.scanRows(box)
      assert(resBox === xy.filter(col("x") >= 1000L && col("x") < 2000L &&
        col("y") >= 1000L && col("y") < 2000L).count())
      assert(scanBox < n / 10, s"z-order failed to prune the box: $scanBox of $n")

      // maintenance half: bin-packing the z layout must KEEP the
      // interleaved clustering (a key-ordered or coalesce compaction
      // would forfeit trailing-key pruning)
      Layout.zorderWrite(xy, s"$dir/zsmall", Seq("x", "y"),
        files = 64, bitsPerKey = 8, blockBytes = 64 * 1024)
      val pz = new org.apache.hadoop.fs.Path(s"$dir/zsmall")
      val fsz = pz.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val zbytes = fsz.getContentSummary(pz).getLength
      Layout.compactFilesZ(spark, s"$dir/zsmall", s"$dir/zcompact",
        Seq("x", "y"), targetBytes = zbytes / 4, blockBytes = 64 * 1024)
      assert(spark.read.parquet(s"$dir/zcompact").count() === n)
      val (resC, scanC) = Layout.scanRows(slab(s"$dir/zcompact"))
      assert(resC === 1000L)
      assert(scanC < n / 4, s"compacted z layout lost trailing-key pruning: $scanC of $n")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("compactFiles bin-packs small files to measured target size and keeps the clustering") {
    val dir = Files.createTempDirectory("graft_layout_c").toString
    try {
      // streaming-ingest shape: 64 tiny clustered files
      Layout.clusteredWrite(data, s"$dir/small", Seq("k"),
        files = 64, blockBytes = 64 * 1024)
      val smallCount = new java.io.File(s"$dir/small").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(smallCount === 64)

      val p = new org.apache.hadoop.fs.Path(s"$dir/small")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(p).getLength
      val target = bytes / 4 // expect ~4-5 bins
      val planned = Layout.compactFiles(spark, s"$dir/small", s"$dir/compacted",
        Seq("k"), targetBytes = target, blockBytes = 64 * 1024)
      val outCount = new java.io.File(s"$dir/compacted").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(planned === math.ceil(bytes.toDouble / target).toInt)
      assert(outCount === planned, s"file count $outCount != planned $planned")
      assert(outCount < smallCount / 8, "compaction did not reduce file sprawl")

      // not a row lost, and the layout property survived compaction
      assert(spark.read.parquet(s"$dir/compacted").count() === n)
      val (res, scan) = Layout.scanRows(narrow(s"$dir/compacted"))
      assert(res === 1000L)
      assert(scan < n / 20, s"compacted layout failed to prune: scan=$scan of $n")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
