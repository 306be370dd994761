package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted text index at rest — the KEYWORD member of the at-rest
  * index family (IVF cells for vectors, Z-order cells for numeric
  * predicates, the bloom manifest for point ids, this for term
  * lookups over a text lake).
  *
  * A keyword query over raw documents is a full corpus scan with an
  * `array_contains` residual — at 100 TB, 100 TB of IO for any term
  * however rare. The index inverts once: one (term, doc_id) posting
  * row per DISTINCT term per document, range-clustered on term
  * ([[Layout.clusteredWrite]] — parquet string min/max stats prune
  * row groups exactly like numeric keys), so a k-term query reads
  * only those terms' row groups: scan cost ∝ Σ df(term), the
  * posting-list cost an inverted index is FOR, not corpus size. The
  * candidate doc ids then semi-join back to the corpus for payloads —
  * a join whose left side is query-selectivity-sized, not
  * corpus-sized.
  *
  * Build cost is one explode + one range Exchange over the postings —
  * the standard index bargain, amortized over every later lookup.
  * Maintenance under ingest = [[Layout.compactFiles]] on (term,
  * doc_id) (the accretion story is [[graft.streaming.ZOrderStream]]'s;
  * a term-ordered compaction keeps the clustering by construction).
  * Tokenization is the ONE engine-wide convention
  * ([[graft.functions.TextFunctions.tokens]] — whitespace, empties
  * dropped) so the index, the batch queries, and the oracles can
  * never disagree about what a term is.
  */
object InvertedIndex {

  /** Docs → distinct (doc_id, term) postings: THE at-rest schema —
    * one definition shared by the batch build and
    * [[graft.streaming.KeywordIndexStream]]'s per-batch ingest, so a
    * tokenization change can never diverge the streamed index from
    * the batch index. */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
        .as("term"))

  /** Write the postings table for `docs` (needs doc_id, text):
    * (term, doc_id), one row per distinct term per doc, clustered on
    * term then doc_id — the secondary key keeps each term's posting
    * list internally sorted, so the read side's groupBy on candidate
    * ids sits on pre-sorted runs. */
  def build(docs: DataFrame, dst: String, files: Int,
      blockBytes: Long = 128L << 20): Unit =
    Layout.clusteredWrite(postings(docs), dst, Seq("term", "doc_id"),
      files, blockBytes)

  /** Doc ids whose postings contain ALL of `terms` (conjunctive
    * keyword query) — the one lookup definition, over ANY postings
    * relation (an at-rest dir via the overload below, or a streamed
    * compact+tail assembly). count(DISTINCT term), not count(1):
    * a one-shot build emits distinct postings by construction, but a
    * streamed lake may legally hold the same posting in two committed
    * dirs (identical-text re-arrival across batches), and a plain
    * count would then fabricate conjunctive matches. The distinct
    * runs over the Σ df candidate rows, never the corpus. */
  def lookupAll(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "InvertedIndex.lookupAll: need at least one term")
    postings
      .filter(col("term").isin(t: _*))
      .groupBy("doc_id").agg(countDistinct(col("term")).as("__hits"))
      .filter(col("__hits") === t.size)
      .select("doc_id")
  }

  /** [[lookupAll]] over the at-rest postings dir. */
  def lookupAll(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    lookupAll(spark.read.parquet(dir), terms)

  /** Doc ids whose postings contain ANY of `terms` (disjunctive). */
  def lookupAny(postings: DataFrame, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "InvertedIndex.lookupAny: need at least one term")
    postings
      .filter(col("term").isin(t: _*))
      .select("doc_id").distinct()
  }

  /** [[lookupAny]] over the at-rest postings dir. */
  def lookupAny(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    lookupAny(spark.read.parquet(dir), terms)
}
