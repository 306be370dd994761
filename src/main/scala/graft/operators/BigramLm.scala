package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** At-rest BIGRAM LM artifact — q58's model persisted the way
  * [[LmArtifact]] persists q55's: the bigram and unigram frequency
  * tables plus the exact integer corpus totals, published once
  * ([[EpochedArtifact]] contract) and scored against forever with a
  * frozen banding threshold.
  *
  * Layout under `dir`: `lm2-<epoch>/big` (prev, cur, c2), `lm2-
  * <epoch>/uni` (word, c1), and `_graft_lm2_meta.json` (epoch +
  * sum_bits + n_pairs). Both tables are Heaps'-law bounded (the
  * bigram vocabulary stores two tokens per row, hence the halved
  * broadcast headroom q58 documents).
  *
  * Scoring matches q58 bit-for-bit on attested pairs: bit length of
  * c2 when c2 ≥ 2, else the unigram backoff max(bits(c1) − 4, 1).
  * Arrivals extend the domain: an UNSEEN bigram backs off exactly
  * like a once-seen one (c2 NULL ⇒ the c2 ≥ 2 test fails), and an
  * unseen trailing unigram takes the same 1-bit floor the backoff
  * penalty bottoms out at — so out-of-corpus text degrades smoothly
  * to the minimum score instead of vanishing from the pair count. */
object BigramLm {

  /** Loaded model: both tables + the frozen totals. */
  final case class Lm2(big: DataFrame, uni: DataFrame, sumBits: Long, nPairs: Long) {
    def corpusMean: Double = sumBits.toDouble / math.max(1L, nPairs)
  }

  private val MetaFile = "_graft_lm2_meta.json"

  /** Adjacent-pair stream of `docs` (doc_id, prev, cur) — derived
    * ARRAY-SIDE before the explode (q58's no-lag-shuffle shape). */
  private def pairsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TF.tokens(col("text")).as("words"))
      .where(size(col("words")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("words")) - 1),
        i => struct(
          element_at(col("words"), i).as("prev"),
          element_at(col("words"), i + 1).as("cur")))).as("p"))
      .select(col("doc_id"), col("p.prev").as("prev"), col("p.cur").as("cur"))

  /** Build + publish from a corpus snapshot; `docs` carries
    * (doc_id, text). The totals aggregate re-reads the WRITTEN
    * tables, so the published model is the source of truth for its
    * own threshold. */
  def build(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val epoch = EpochedArtifact.nextEpoch(spark, dir, MetaFile)
    val base = s"lm2-$epoch"
    val pairs = graft.CachePool.cache(pairsOf(docs))
    pairs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
      .write.mode("overwrite").parquet(s"$dir/$base/big")
    docs.select(explode(TF.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c1"))
      .write.mode("overwrite").parquet(s"$dir/$base/uni")
    val big = spark.read.parquet(s"$dir/$base/big")
    val uni = spark.read.parquet(s"$dir/$base/uni")
    val t = scoredPairs(pairs, big, uni)
      .agg(count(lit(1)).as("n_pairs"), sum(col("pb")).cast("long").as("sum_bits"))
      .head()
    // sum over zero pair rows is NULL — reachable whenever no doc has
    // >= 2 tokens, so fail loudly before getLong NPEs and no model
    // half-publishes
    require(t.getLong(0) > 0,
      s"bigram LM build over $dir: corpus has no document with >= 2 tokens — no pairs to model")
    EpochedArtifact.commit(spark, dir, MetaFile, "lm2", version = 1, epoch,
      Map("sum_bits" -> t.getLong(1), "n_pairs" -> t.getLong(0)))
  }

  /** Load a published model: metadata reads only, zero corpus jobs;
    * both tables broadcast under the size gate. */
  def load(spark: SparkSession, dir: String): Lm2 = {
    val root = EpochedArtifact.readMeta(spark, dir, MetaFile)
      .getOrElse(throw new IllegalArgumentException(
        s"no published bigram LM at $dir (missing $MetaFile)"))
    require(root.get("version").asInt() == 1, s"unknown bigram-lm version in $dir")
    val base = s"lm2-${root.get("epoch").asLong()}"
    Lm2(
      EpochedArtifact.loadGated(spark, dir, s"$base/big"),
      EpochedArtifact.loadGated(spark, dir, s"$base/uni"),
      root.get("sum_bits").asLong(), root.get("n_pairs").asLong())
  }

  /** Per-pair bits: (doc_id, pb) — q58's kernel with the OOV
    * extensions (NULL c2 → backoff; NULL c1 → 1-bit floor). */
  private def scoredPairs(pairs: DataFrame, big: DataFrame, uni: DataFrame): DataFrame =
    pairs
      .join(big, Seq("prev", "cur"), "left")
      .join(uni, pairs("cur") === uni("word"), "left")
      .select(col("doc_id"),
        when(col("c2") >= 2, length(bin(col("c2"))))
          .otherwise(greatest(length(bin(coalesce(col("c1"), lit(1L)))) - 4, lit(1)))
          .as("pb"))

  /** Score docs against a loaded model: q58's exact output schema —
    * (doc_id, n_pairs, sum_bits, mean_bits, band) — with the frozen
    * threshold; docs with < 2 tokens surface as (0, 0, 0.0, tail). */
  def score(docs: DataFrame, lm: Lm2): DataFrame = {
    val scored = scoredPairs(pairsOf(docs), lm.big, lm.uni)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("pb")).cast("long").as("sum_bits"))
      .withColumn("mean_bits", col("sum_bits").cast("double") / col("n_pairs"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("mean_bits"), lit(0.0)).as("mean_bits"),
        when(coalesce(col("mean_bits"), lit(0.0)) >= lit(lm.corpusMean), lit("head"))
          .otherwise(lit("tail")).as("band"))
  }
}
