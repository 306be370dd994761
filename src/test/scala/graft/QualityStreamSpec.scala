package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LmArtifact
import graft.streaming.QualityStream

/** Streaming quality scoring against the at-rest LM artifact: N
  * micro-batches over the corpus must reproduce batch q55's scores
  * exactly (frozen model == self-scored model when the stream IS the
  * training corpus), and out-of-vocabulary arrivals — impossible in
  * batch self-scoring — take the documented 1-bit floor. */
class QualityStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double, String)] =
    df.select("doc_id", "n_tokens", "sum_bits", "mean_bits", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toSet

  test("N micro-batches over the corpus reproduce batch q55 exactly; OOV takes the 1-bit floor") {
    import spark.implicits._
    val lmDir = Files.createTempDirectory("graft_lm").toString
    val root = Files.createTempDirectory("graft_qs").toString
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir).select($"doc_id", $"text")
      LmArtifact.build(docs, lmDir)

      // the published totals replay q55's corpus mean bit-for-bit
      val lm = LmArtifact.load(spark, lmDir)
      assert(lm.nTokens > 0 && lm.sumBits > lm.nTokens)

      // 3 arrival batches scattered by doc_id % 3
      val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      (0 until 3).foreach { b =>
        val batch = all.filter(_._1 % 3 == b).toDF("doc_id", "text")
        QualityStream.processBatch(batch, b, root, lmDir)
      }

      val streamed = rows(QualityStream.loadScores(spark, root))
      val want = rows(SparkEntry.queries("q55_logfreq_quality")(spark, sfDir))
      CachePool.drain()
      assert(streamed == want)
      assert(streamed.nonEmpty)

      // the score→mixture closure holds on the stream side too: the
      // resampled VIEW of streamed scores equals batch q62 (stateless
      // per-doc sampling decisions, no extra streaming state)
      val resampled = QualityStream.resampledScores(spark, root)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      val wantResampled = SparkEntry.queries("q62_quality_resample")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      CachePool.drain()
      assert(resampled == wantResampled)
      assert(resampled.nonEmpty && resampled.size < streamed.size,
        "tail band must actually drop docs")

      // a replayed batch overwrites its own output, changing nothing
      QualityStream.processBatch(all.filter(_._1 % 3 == 1).toDF("doc_id", "text"), 1, root, lmDir)
      assert(rows(QualityStream.loadScores(spark, root)) == want)

      // OOV arrivals: every token unseen -> 1 bit each, banded tail
      // (the frozen corpus mean is > 1 by the assert above); the
      // zero-token doc surfaces explicitly per the q55 contract
      QualityStream.processBatch(
        Seq((900001L, "zzqx wvut zzqx"), (900002L, "")).toDF("doc_id", "text"),
        3, root, lmDir)
      val late = rows(QualityStream.loadScores(spark, root)) -- streamed
      assert(late == Set(
        (900001L, 3L, 3L, 1.0, "tail"),
        (900002L, 0L, 0L, 0.0, "tail")))
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(lmDir))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
    }
  }

  test("bigram twin: N micro-batches reproduce batch q58 exactly; unseen bigrams back off, unseen words floor at 1 bit") {
    import spark.implicits._
    val lmDir = Files.createTempDirectory("graft_lm2").toString
    val root = Files.createTempDirectory("graft_qs2").toString
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir).select($"doc_id", $"text")
      graft.operators.BigramLm.build(docs, lmDir)
      CachePool.drain()
      val lm = graft.operators.BigramLm.load(spark, lmDir)
      // sumBits > nPairs pins corpusMean > 1, which the OOV "tail"
      // expectation below depends on (mean 1.0 must fall under the
      // frozen threshold) — same guard as the unigram twin
      assert(lm.nPairs > 0 && lm.sumBits > lm.nPairs)

      val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val sink = graft.streaming.QualityStream.bigramSink(spark, root, lmDir)
      (0 until 3).foreach { b => sink(all.filter(_._1 % 3 == b).toDF("doc_id", "text"), b) }

      val streamed = rows(graft.streaming.QualityStream.loadBigramScores(spark, root)
        .withColumnRenamed("n_pairs", "n_tokens"))
      val want = rows(SparkEntry.queries("q58_bigram_lm")(spark, sfDir)
        .withColumnRenamed("n_pairs", "n_tokens"))
      CachePool.drain()
      assert(streamed == want)
      assert(streamed.nonEmpty)

      // OOV: an entirely unseen bigram of SEEN words backs off to the
      // trailing unigram's bits - 4 (floored); fully unseen words
      // floor at 1 bit per pair
      sink(Seq((900001L, "zzqx wvut")).toDF("doc_id", "text"), 3)
      val late = rows(graft.streaming.QualityStream.loadBigramScores(spark, root)
        .withColumnRenamed("n_pairs", "n_tokens")) -- streamed
      assert(late == Set((900001L, 1L, 1L, 1.0, "tail")))
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(lmDir))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
    }
  }

  test("LM rebuild publishes atomically: epoched freq dirs, previous epoch kept for in-flight readers, older GC'd") {
    import spark.implicits._
    val lmDir = Files.createTempDirectory("graft_lm_epoch").toString
    try {
      def dirs() = new java.io.File(lmDir).listFiles()
        .map(_.getName).filter(_.startsWith("freq-")).toSet
      LmArtifact.build(Seq((1L, "a b a")).toDF("doc_id", "text"), lmDir)
      assert(dirs() == Set("freq-0"))
      val v0 = LmArtifact.load(spark, lmDir)
      LmArtifact.build(Seq((1L, "c c c c")).toDF("doc_id", "text"), lmDir)
      // both epochs on disk: a reader that loaded v0 just before the
      // publish still resolves its freq files
      assert(dirs() == Set("freq-0", "freq-1"))
      assert(v0.freq.count() == 2) // old epoch still readable
      val v1 = LmArtifact.load(spark, lmDir)
      assert(v1.nTokens == 4 && v1.sumBits == 4 * 3) // c: f=4 -> 3 bits
      LmArtifact.build(Seq((1L, "d d")).toDF("doc_id", "text"), lmDir)
      // epoch 0 is now unreachable by any correct reader -> GC'd
      assert(dirs() == Set("freq-1", "freq-2"))
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(lmDir))
  }
}
