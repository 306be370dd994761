package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.LmArtifact

/** Streaming quality scoring — the micro-batch twin of batch q55,
  * closing the same batch/stream asymmetry [[SemDeDupStream]] (q53)
  * and [[IvfStream]] (the ANN index) closed for their families: the
  * LM is built once offline ([[LmArtifact.build]]) and every arriving
  * document is scored against the FROZEN model + banding threshold —
  * CCNet's deployment shape, where one reference-corpus LM filters
  * every subsequent crawl snapshot.
  *
  * Per micro-batch: load the published LM (driver-side metadata reads,
  * zero jobs over any corpus; the vocabulary-sized freq table
  * broadcast-joins to the batch scan), score with q55's exact
  * arithmetic (+ the 1-bit OOV floor for unseen tokens), and write
  * `root/scores/b=<batchId>`. Scores are IMMUTABLE once written —
  * frozen model, frozen threshold — so batches are append-only deltas
  * and a replayed batch overwrites exactly its own directory
  * ([[BatchVersioned]] contract, `_SUCCESS`-gated reads).
  */
object QualityStream {

  /** One micro-batch against an already-loaded LM; `batch` must
    * carry (doc_id, text). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      lm: LmArtifact.Lm): Unit =
    LmArtifact.score(batch, lm)
      .write.mode("overwrite").parquet(s"$root/scores/b=$batchId")

  /** Convenience: load-then-score in one call (tests / one-shot use).
    * Long-lived streams should use [[sink]], which PINS the model. */
  def processBatch(batch: DataFrame, batchId: Long, root: String, lmDir: String): Unit =
    processBatch(batch, batchId, root, LmArtifact.load(batch.sparkSession, lmDir))

  /** foreachBatch adapter. The LM is loaded ONCE here and pinned for
    * the sink's lifetime: reloading per batch would let a model
    * republish mid-stream score different batches against different
    * epochs/thresholds — and a crash-replayed batch against a
    * DIFFERENT model than its original commit, breaking the
    * immutable-scores contract. A new reference LM means re-scoring
    * into a fresh `root`. */
  def sink(spark: SparkSession, root: String, lmDir: String): (DataFrame, Long) => Unit = {
    val lm = LmArtifact.load(spark, lmDir)
    (batch, batchId) => processBatch(batch, batchId, root, lm)
  }

  /** All committed scores (`_SUCCESS`-gated — a torn batch directory
    * is invisible until its replay commits). */
  def loadScores(spark: SparkSession, root: String): DataFrame = {
    val committed = BatchVersioned.versions(spark, s"$root/scores", prefix = "b").map(_._2)
    require(committed.nonEmpty, s"no committed score batches under $root/scores")
    spark.read.option("basePath", s"$root/scores").parquet(committed: _*)
      .select("doc_id", "n_tokens", "sum_bits", "mean_bits", "band")
  }

  /** q62's streaming view — the score→mixture closure over committed
    * streamed scores: [[LmArtifact.bandResample]] is stateless per
    * row (md5 of doc_id against the band's keep rate), so composing
    * it over [[loadScores]] equals batch q62 exactly whenever the
    * frozen LM was built on the streamed corpus, for ANY arrival
    * order or replay history. No extra state to maintain: the
    * resample IS a view of the scores. */
  def resampledScores(spark: SparkSession, root: String): DataFrame =
    LmArtifact.bandResample(loadScores(spark, root))

  // ---- bigram twin (q58's model, graft.operators.BigramLm) ----

  /** One micro-batch against an already-loaded bigram LM. */
  def processBigramBatch(batch: DataFrame, batchId: Long, root: String,
      lm: graft.operators.BigramLm.Lm2): Unit =
    graft.operators.BigramLm.score(batch, lm)
      .write.mode("overwrite").parquet(s"$root/scores2/b=$batchId")

  /** foreachBatch adapter for BIGRAM scoring — q58's micro-batch twin,
    * same pinned-model contract as [[sink]]. */
  def bigramSink(spark: SparkSession, root: String, lmDir: String): (DataFrame, Long) => Unit = {
    val lm = graft.operators.BigramLm.load(spark, lmDir)
    (batch, batchId) => processBigramBatch(batch, batchId, root, lm)
  }

  /** All committed bigram scores. */
  def loadBigramScores(spark: SparkSession, root: String): DataFrame = {
    val committed = BatchVersioned.versions(spark, s"$root/scores2", prefix = "b").map(_._2)
    require(committed.nonEmpty, s"no committed score batches under $root/scores2")
    spark.read.option("basePath", s"$root/scores2").parquet(committed: _*)
      .select("doc_id", "n_pairs", "sum_bits", "mean_bits", "band")
  }
}
