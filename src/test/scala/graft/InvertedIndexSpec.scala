package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout}

/** Inverted text index at rest: a conjunctive keyword lookup through
  * the postings table answers identically to the corpus scan while
  * reading ~the probed terms' posting lists (scan ∝ Σ df, not corpus
  * size) — measured from the scan node's own metrics, the LayoutSpec
  * method. Compaction on (term, doc_id) keeps the pruning. */
class InvertedIndexSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val nDocs = 50000L
  // ~20 words per doc over a 10k vocab, deterministically mixed; two
  // planted rare terms: 'needle' in every 1000th doc, 'thread' in
  // every 700th — their AND matches every 7000th-ish doc
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      expr("transform(sequence(0, 19), i -> concat('w', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 10000 as string)))"),
      when(col("id") % 1000 === 0, lit("needle")).otherwise(lit("w1")),
      when(col("id") % 700 === 0, lit("thread")).otherwise(lit("w2")))
      .as("text"))

  test("AND lookup == corpus scan; postings scan ~ posting lists, not corpus") {
    val dir = Files.createTempDirectory("graft_invidx").toString
    try {
      InvertedIndex.build(corpus, dir, files = 8, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val got = InvertedIndex.lookupAll(spark, dir, terms)
        .collect().map(_.getLong(0)).toSet
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val want = corpus
        .filter(terms.map(t => array_contains(toks, t)).reduce(_ && _))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want)
      assert(want.nonEmpty, "planted AND set is empty — corpus drifted")

      // pruning: the postings table holds ~nDocs*21 rows; the lookup
      // must materialize only the row groups covering the two probed
      // terms (sorted runs at 256 KiB granularity), far below the
      // total — and absolutely below any corpus-scan equivalent
      val totalPostings = spark.read.parquet(dir).count()
      val (_, scanned) = Layout.scanRows(
        spark.read.parquet(dir).filter(col("term").isin(terms: _*)))
      assert(scanned < totalPostings / 20,
        s"index failed to prune: scanned $scanned of $totalPostings postings")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("ANY lookup == corpus scan") {
    val dir = Files.createTempDirectory("graft_invidx_any").toString
    try {
      InvertedIndex.build(corpus, dir, files = 8, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val got = InvertedIndex.lookupAny(spark, dir, terms)
        .collect().map(_.getLong(0)).toSet
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val want = corpus
        .filter(terms.map(t => array_contains(toks, t)).reduce(_ || _))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want)
      // |ANY| > |AND| strictly here (both planted periods coprime-ish)
      assert(want.size > nDocs.toInt / 1000)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("compaction on (term, doc_id) keeps the pruning") {
    val dir = Files.createTempDirectory("graft_invidx_cmp").toString
    try {
      InvertedIndex.build(corpus, s"$dir/idx", files = 8, blockBytes = 256 * 1024)
      Layout.compactFiles(spark, s"$dir/idx", s"$dir/compact",
        Seq("term", "doc_id"), targetBytes = 4L << 20, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val before = InvertedIndex.lookupAll(spark, s"$dir/idx", terms)
        .collect().map(_.getLong(0)).toSet
      val after = InvertedIndex.lookupAll(spark, s"$dir/compact", terms)
        .collect().map(_.getLong(0)).toSet
      assert(after === before)
      val totalPostings = spark.read.parquet(s"$dir/compact").count()
      val (_, scanned) = Layout.scanRows(
        spark.read.parquet(s"$dir/compact").filter(col("term").isin(terms: _*)))
      assert(scanned < totalPostings / 20,
        s"compaction lost the clustering: scanned $scanned of $totalPostings")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
