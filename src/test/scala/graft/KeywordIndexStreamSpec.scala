package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout}
import graft.streaming.KeywordIndexStream

/** Streaming inverted-index maintenance: micro-batched doc ingest +
  * periodic term-clustered compaction must (a) answer exactly what a
  * one-shot batch index over the same corpus answers, at any point in
  * the ingest/compaction/replay history, and (b) actually re-cluster —
  * a term lookup over the compacted history prunes posting row
  * groups. */
class KeywordIndexStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val nDocs = 40000L
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      expr("transform(sequence(0, 19), i -> concat('w', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 10000 as string)))"),
      when(col("id") % 1000 === 0, lit("needle")).otherwise(lit("w1")),
      when(col("id") % 700 === 0, lit("thread")).otherwise(lit("w2")))
      .as("text"))

  private val terms = Seq("needle", "thread")

  private def batchAnswer(): Set[Long] = {
    val dir = Files.createTempDirectory("graft_kidx_batch").toString
    try {
      InvertedIndex.build(corpus, dir, files = 4, blockBytes = 256 * 1024)
      InvertedIndex.lookupAll(spark, dir, terms)
        .collect().map(_.getLong(0)).toSet
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("streamed index == one-shot batch index through compactions, GC, replay") {
    val root = Files.createTempDirectory("graft_kidx").toString
    try {
      (0 until 9).foreach { b =>
        KeywordIndexStream.processBatch(
          corpus.filter(col("doc_id") % 9 === b), b, root,
          compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024)
      }

      // identity with the one-shot batch index over the same corpus
      val got = KeywordIndexStream.lookupAll(spark, root, terms)
        .collect().map(_.getLong(0)).toSet
      val want = batchAnswer()
      assert(got === want)
      assert(want.nonEmpty, "planted AND set empty — corpus drifted")

      // GC happened (arrival dirs below the previous compact version
      // are gone), and the compacted postings prune on term
      val bDirs = new java.io.File(root).listFiles()
        .filter(_.getName.startsWith("b=")).map(_.getName).toSet
      assert(!bDirs.contains("b=0"), s"pre-v4 arrival dirs survived GC: $bDirs")
      val compacted = graft.streaming.CompactingLake.basePart(spark, root).get
      val total = compacted.count()
      val (_, scanned) = Layout.scanRows(
        compacted.filter(col("term").isin(terms: _*)))
      assert(scanned < total / 20,
        s"compacted postings failed to prune: $scanned of $total")

      // replay safety: a replayed pre-compaction batch recommits
      // identical postings into its own dir; lookups are unchanged
      KeywordIndexStream.processBatch(
        corpus.filter(col("doc_id") % 9 === 5), 5L, root,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024)
      val afterReplay = KeywordIndexStream.lookupAll(spark, root, terms)
        .collect().map(_.getLong(0)).toSet
      assert(afterReplay === want)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  test("mid-ingest lookups answer the committed prefix exactly") {
    val root = Files.createTempDirectory("graft_kidx_mid").toString
    try {
      (0 until 5).foreach { b =>
        KeywordIndexStream.processBatch(
          corpus.filter(col("doc_id") % 9 === b), b, root,
          compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024)
      }
      // committed: batches 0-4 (compaction at b=4 covered 0-3)
      val got = KeywordIndexStream.lookupAll(spark, root, terms)
        .collect().map(_.getLong(0)).toSet
      val wantDir = Files.createTempDirectory("graft_kidx_mid_b").toString
      try {
        InvertedIndex.build(corpus.filter(col("doc_id") % 9 <= 4), wantDir,
          files = 4, blockBytes = 256 * 1024)
        val want = InvertedIndex.lookupAll(spark, wantDir, terms)
          .collect().map(_.getLong(0)).toSet
        assert(got === want)
      } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(wantDir))
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }
}
