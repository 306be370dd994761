package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** At-rest unigram LM artifact — q55's frequency table persisted the
  * way the IVF centroid model is ([[IvfIndex.save]]): built ONCE from
  * a corpus snapshot, loaded by any later session or micro-batch with
  * zero jobs over the corpus, and scored against a FROZEN banding
  * threshold so verdicts stay stable as new documents stream in
  * (CCNet's actual deployment shape: the LM is trained on a reference
  * corpus, then filters every crawl snapshot after it).
  *
  * Layout under `dir`:
  *  - `freq-<epoch>/` — (word STRING, f BIGINT) parquet, the model
  *    itself (vocabulary-sized: MBs at any corpus size by Heaps'
  *    law); the LIVE epoch is named by the meta file, rebuilds
  *    publish a fresh epoch dir (see [[build]]);
  *  - `_graft_lm_meta.json` — the live epoch plus the EXACT INTEGER
  *    corpus totals (sum_bits, n_tokens) the head/tail threshold
  *    derives from. Stored as integers, not a precomputed double
  *    mean, so the one floating division happens identically
  *    everywhere (the q55 engine-exactness discipline).
  *
  * Scoring semantics match q55 bit-for-bit on in-vocabulary tokens
  * (bit-length of the corpus frequency); OUT-OF-VOCABULARY tokens —
  * impossible in q55's self-scoring, routine when scoring new
  * arrivals — take the 1-bit rare-token floor (the score a
  * frequency-1 token gets), so unseen junk scores minimally rather
  * than vanishing from n_tokens.
  */
object LmArtifact {

  /** Loaded model: the frequency table plus the frozen totals. */
  final case class Lm(freq: DataFrame, sumBits: Long, nTokens: Long) {
    /** The banding threshold — one exact-integer division. */
    def corpusMean: Double = sumBits.toDouble / math.max(1L, nTokens)
  }

  private val MetaFile = "_graft_lm_meta.json"

  /** Build + publish the artifact from a corpus snapshot; `docs` must
    * carry (doc_id, text). Two jobs: the freq write and the totals
    * aggregate (which re-reads the WRITTEN freq table — the published
    * model is the single source of truth for its own totals).
    *
    * REBUILD atomicity: the freq table is written to a fresh
    * `freq-<epoch>` directory and the meta file — staged + renamed
    * with OVERWRITE, [[IvfIndex.save]]'s publish contract — names it,
    * so a reader mid-rebuild sees either (old freq, old totals) or
    * (new freq, new totals), never a cross-pairing (overwriting one
    * `freq/` dir in place would pair new frequencies with old totals
    * for the whole duration of the totals job). Epochs older than the
    * one being replaced are GC'd; the immediately-previous epoch is
    * kept for readers that loaded just before the publish. */
  def build(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val epoch = EpochedArtifact.nextEpoch(spark, dir, MetaFile)
    val freqDir = s"freq-$epoch"
    val tf = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("word"))
    tf.groupBy(col("word")).agg(count(lit(1)).as("f"))
      .write.mode("overwrite").parquet(s"$dir/$freqDir")
    val freq = spark.read.parquet(s"$dir/$freqDir")
    val t = tf.join(freq, "word")
      .agg(count(lit(1)).as("n_tokens"), sum(length(bin(col("f")))).as("sum_bits"))
      .head()
    // sum over zero token rows is NULL — reachable on an empty/wordless
    // corpus, so fail loudly before getLong NPEs and no model
    // half-publishes (BigramLm.build's guard, mirrored)
    require(t.getLong(0) > 0,
      s"LM build over $dir: corpus has no tokens — nothing to model")
    EpochedArtifact.commit(spark, dir, MetaFile, "freq", version = 2, epoch,
      Map("sum_bits" -> t.getLong(1), "n_tokens" -> t.getLong(0)))
  }

  /** Load a published LM. Pure metadata reads — zero jobs over any
    * corpus. The freq relation gets a broadcast hint only while its
    * on-disk size stays under 1 GiB (the q55 Heaps'-law guard:
    * normal vocabularies are MBs; a degenerate one must degrade to a
    * shuffle join, not a driver OOM). */
  def load(spark: SparkSession, dir: String): Lm = {
    val root = EpochedArtifact.readMeta(spark, dir, MetaFile)
      .getOrElse(throw new IllegalArgumentException(
        s"no published LM at $dir (missing $MetaFile)"))
    require(root.get("version").asInt() == 2,
      s"unsupported lm artifact version ${root.get("version").asInt()} in $dir " +
        "(version 2 = epoched freq dirs; rebuild the artifact)")
    Lm(
      EpochedArtifact.loadGated(spark, dir, s"freq-${root.get("epoch").asLong()}"),
      root.get("sum_bits").asLong(), root.get("n_tokens").asLong())
  }

  /** Score `docs` (doc_id, text) against a loaded LM: q55's exact
    * output schema — (doc_id, n_tokens, sum_bits, mean_bits, band) —
    * with the frozen threshold and the 1-bit OOV floor. One scan +
    * one (doc_id) partial-agg shuffle; zero-token docs surface
    * explicitly, per the q55 contract. */
  def score(docs: DataFrame, lm: Lm): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("word"))
    val scored = tf.join(lm.freq, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(length(bin(col("f"))), lit(1))).as("sum_bits"))
      .withColumn("mean_bits", col("sum_bits").cast("double") / col("n_tokens"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("mean_bits"), lit(0.0)).as("mean_bits"),
        when(coalesce(col("mean_bits"), lit(0.0)) >= lit(lm.corpusMean), lit("head"))
          .otherwise(lit("tail")).as("band"))
  }

  /** q62's kernel, shared by the batch query and the streaming view:
    * band-dependent deterministic resampling over any scored frame
    * carrying (doc_id, band, mean_bits) — head keeps `headRate`%,
    * tail keeps `tailRate`%, membership decided by a per-doc md5
    * hash. Stateless per row: the SAME docs survive whether scored
    * in one batch pass or across arbitrary micro-batch replays, so
    * the quality→mixture closure holds batch/stream identically. */
  def bandResample(scored: DataFrame, headRate: Long = 100L,
      tailRate: Long = 30L): DataFrame =
    scored
      .withColumn("rate",
        when(col("band") === "head", lit(headRate)).otherwise(lit(tailRate)))
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100 < col("rate"))
      .select(col("doc_id"), col("band"), col("mean_bits"), col("rate"))
}
