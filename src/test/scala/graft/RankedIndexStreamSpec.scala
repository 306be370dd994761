package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex
import graft.streaming.{BatchVersioned, RankedIndexStream}

/** Streaming ranked-index maintenance: BM25 lookups over the
  * maintained lake must equal the one-shot batch index bit-for-bit
  * (scores included — same shared weight kernel, same summed-exact
  * stats) through minor compactions, replay, and identical-text
  * re-arrival (which may shift score CONSTANTS but never membership —
  * the documented at-least-once approximation). */
class RankedIndexStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val nDocs = 30000L
  private val nB = 17
  // every doc non-empty (a zero-token doc has no postings and is
  // invisible to the lake's stats, while the batch builder counts it —
  // the documented divergence this corpus avoids)
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      expr("transform(sequence(0, cast(id % 13 as int) + 6), i -> concat('w', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 8000 as string)))"),
      when(col("id") % 700 === 0, lit("sparse")).otherwise(lit("w2")),
      lit("common"))
      .as("text"))

  private val terms = Seq("sparse", "common")

  test("streamed BM25 == one-shot batch index bit-for-bit through minors; re-arrival keeps membership; replay exact") {
    val root = Files.createTempDirectory("graft_rankstream").toString
    val batchDir = Files.createTempDirectory("graft_rankstream_b").toString
    try {
      (0 until nB).foreach { b =>
        RankedIndexStream.processBatch(
          corpus.filter(col("doc_id") % nB === b), b, root,
          compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
          majorFrac = Double.PositiveInfinity)
      }
      assert(BatchVersioned.versions(spark, s"$root/l1").nonEmpty,
        "no minor chunks — the leveled path was not exercised")

      InvertedIndex.buildRanked(corpus, batchDir, files = 4,
        blockBytes = 256 * 1024)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

      // AND: bit-exact parity, scores included (summed level sidecars
      // == the batch stats because levels partition the doc space)
      val gotAnd = rows(RankedIndexStream.searchRanked(spark, root, terms, topK = 15))
      val wantAnd = rows(InvertedIndex.searchRanked(spark, batchDir, terms, topK = 15))
      assert(gotAnd === wantAnd)
      assert(wantAnd.nonEmpty, "planted AND set empty — corpus drifted")

      // OR: same
      val gotAny = rows(RankedIndexStream.searchRankedAny(spark, root, terms, topK = 15))
      val wantAny = rows(InvertedIndex.searchRankedAny(spark, batchDir, terms, topK = 15))
      assert(gotAny === wantAny)

      // PHRASE: the planted "sparse common" bigram is consecutive by
      // construction — streamed positional assembly == batch index,
      // occurrence counts included
      def hits(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val gotPh = hits(RankedIndexStream.searchPhrase(spark, root, Seq("sparse", "common")))
      val wantPh = hits(InvertedIndex.searchPhrase(spark, batchDir, Seq("sparse", "common"), 10000))
      assert(wantPh.nonEmpty, "planted phrase set empty — corpus drifted")
      assert(gotPh === wantPh)

      // replay of a pre-compaction batch: identical commit, nothing
      // changes — scores included
      RankedIndexStream.processBatch(
        corpus.filter(col("doc_id") % nB === 13), 13L, root,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      assert(rows(RankedIndexStream.searchRanked(spark, root, terms, topK = 15)) === gotAnd)

      // identical-text re-arrival in a LATER batch (at-least-once
      // upstream): tf/df stay exact through the dedup, so conjunctive
      // MEMBERSHIP is unchanged; the duplicate doc double-counts in
      // the summed stats, so score constants may shift — the
      // documented approximation, bounded by the duplicate rate
      val before = RankedIndexStream.searchRanked(spark, root, terms, topK = 1000)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      RankedIndexStream.processBatch(
        corpus.filter(col("doc_id") % nB === 3), nB.toLong, root,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      val after = RankedIndexStream.searchRanked(spark, root, terms, topK = 1000)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(after === before,
        "identical re-arrival changed conjunctive membership")
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(batchDir))
    }
  }

  test("versioned lake: updates re-score, deletes disappear, streamed == batch bit-for-bit through purging folds; replay exact") {
    val root = Files.createTempDirectory("graft_rankstream_ver").toString
    val batchDir = Files.createTempDirectory("graft_rankstream_ver_b").toString
    try {
      val nV = 10
      val ev1 = corpus.select(col("doc_id"), lit(1L).as("ver"),
        lit("U").as("op"), col("text"))
      val ev2 = corpus.filter(col("doc_id") % 11 === 0)
        .select(col("doc_id"), lit(2L).as("ver"), lit("U").as("op"),
          reverse(col("text")).as("text"))
      val ev3 = corpus.filter(col("doc_id") % 13 === 0)
        .select(col("doc_id"), lit(3L).as("ver"), lit("D").as("op"),
          lit(null).cast("string").as("text"))
      def drive(df: org.apache.spark.sql.DataFrame, b: Long): Unit =
        RankedIndexStream.processBatchVer(df, b, root, compactEvery = 4,
          targetBytes = 256 * 1024, blockBytes = 64 * 1024,
          majorFrac = 0.0, minFoldBytes = 0L)
      (0 until nV).foreach { b => drive(ev1.filter(col("doc_id") % nV === b), b) }
      drive(ev2, nV.toLong)      // the re-crawl wave
      drive(ev3, nV + 1L)        // the delete wave
      drive(ev1.filter(lit(false)), nV + 2L) // idle batch: the b=12 compaction folds + purges
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq

      // batch twin over the SAME event log — scores bit-for-bit
      InvertedIndex.buildRankedVer(ev1.unionByName(ev2).unionByName(ev3),
        batchDir, files = 4, blockBytes = 256 * 1024)
      val got = rows(RankedIndexStream.searchRankedVer(spark, root, terms, topK = 1000))
      val want = rows(InvertedIndex.searchRankedVer(spark, batchDir, terms,
        topK = 1000, k1 = 1.2, b = 0.75, pushdownCap = 10000))
      assert(want.nonEmpty, "versioned AND set empty — corpus drifted")
      assert(got === want)

      // deletes are gone, updates dropped their original terms: no
      // %13 doc and no %11 doc can match ('common' reverses away)
      got.foreach { case (id, _, _) =>
        assert(id % 13 != 0, s"deleted doc $id still matches")
        assert(id % 11 != 0, s"re-crawled doc $id matches on its OLD text")
      }

      // fold purge: the registry (sentinel rows) compacted to ONE
      // event per doc at rest inside the folded shard
      val shardDir = BatchVersioned.versions(spark, s"$root/shard/s=0").last._2
      val dupReg = spark.read.parquet(shardDir)
        .filter(col("term") === lit(InvertedIndex.SentinelTerm))
        .groupBy("doc_id").count().filter(col("count") > 1).count()
      assert(dupReg === 0L, s"$dupReg docs keep superseded registry rows after the purging fold")
      // and the delete tombstones themselves survive (they must keep
      // masking older postings)
      val tombs = spark.read.parquet(shardDir)
        .filter(col("term") === lit(InvertedIndex.SentinelTerm) && col("del"))
        .count()
      assert(tombs === corpus.filter(col("doc_id") % 13 === 0).count())

      // versioned PHRASE: resolution must retire reversed/deleted
      // docs' hits before the adjacency verify — streamed == batch
      def hits(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val gotPh = hits(RankedIndexStream.searchPhraseVer(spark, root, Seq("sparse", "common")))
      val wantPh = hits(InvertedIndex.searchPhraseVer(spark, batchDir, Seq("sparse", "common"), 10000))
      assert(wantPh.nonEmpty, "versioned phrase set empty — corpus drifted")
      assert(gotPh === wantPh)
      gotPh.foreach { case (id, _) =>
        assert(id % 13 != 0, s"deleted doc $id still phrase-matches")
        assert(id % 11 != 0, s"re-crawled doc $id phrase-matches on its OLD positions")
      }

      // replay of the latest compacting batch: same committed inputs,
      // same purge decisions, same scores
      drive(ev1.filter(lit(false)), nV + 2L)
      assert(rows(RankedIndexStream.searchRankedVer(spark, root, terms, topK = 1000)) === got)
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(batchDir))
    }
  }

  test("crash windows around the stats accumulator: torn attempt invisible; stats-committed-chunk-absent stays exact; replay exact") {
    val root = Files.createTempDirectory("graft_rankstream_win").toString
    val batchDir = Files.createTempDirectory("graft_rankstream_win_b").toString
    try {
      (0 until 8).foreach { b =>
        RankedIndexStream.processBatch(
          corpus.filter(col("doc_id") % nB === b), b, root,
          compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
          majorFrac = Double.PositiveInfinity)
      }
      InvertedIndex.buildRanked(corpus.filter(col("doc_id") % nB <= 7), batchDir,
        files = 4, blockBytes = 256 * 1024)
      def search() = RankedIndexStream.searchRanked(spark, root, terms, topK = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      val want = InvertedIndex.searchRanked(spark, batchDir, terms, topK = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      assert(want.nonEmpty)

      // torn accumulator attempt (junk rows, no _SUCCESS): ignored
      spark.sql("select cast(1 as bigint) n_docs, cast(1 as bigint) sum_dl")
        .write.parquet(s"$root/stats/v=99")
      Files.delete(java.nio.file.Paths.get(s"$root/stats/v=99/_SUCCESS"))
      assert(search() === want, "torn stats attempt leaked into the accumulator")
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(s"$root/stats/v=99"))

      // the real crash window: batch 8's stats version commits FIRST,
      // then the crash hits before the chunk/fold — arrivals [4,8)
      // are counted by the accumulator but still served as tail rows;
      // readers stay exact because stats count ROWS, not dirs
      RankedIndexStream.accumulateStats(spark, root, 8L)
      assert(search() === want,
        "stats-committed/chunk-absent window drifted the scores")

      // the batch replays (Structured Streaming re-runs batch 8):
      // the accumulator recomputes from the same committed inputs and
      // the compaction completes — still exact, same scores
      RankedIndexStream.processBatch(
        corpus.filter(col("doc_id") % nB === 8), 8L, root,
        compactEvery = 4, targetBytes = 256 * 1024, blockBytes = 64 * 1024,
        majorFrac = Double.PositiveInfinity)
      InvertedIndex.buildRanked(corpus.filter(col("doc_id") % nB <= 8),
        s"$batchDir-2", files = 4, blockBytes = 256 * 1024)
      val want2 = InvertedIndex.searchRanked(spark, s"$batchDir-2", terms, topK = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      assert(search() === want2)
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(batchDir))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(s"$batchDir-2"))
    }
  }
}
