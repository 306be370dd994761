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

  /** Write the postings table for `docs` (needs doc_id, text):
    * (term, doc_id), one row per distinct term per doc, clustered on
    * term then doc_id — the secondary key keeps each term's posting
    * list internally sorted, so the read side's groupBy on candidate
    * ids sits on pre-sorted runs. */
  def build(docs: DataFrame, dst: String, files: Int,
      blockBytes: Long = 128L << 20): Unit =
    Layout.clusteredWrite(
      docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
          .as("term")),
      dst, Seq("term", "doc_id"), files, blockBytes)

  /** Doc ids whose text contains ALL of `terms` (conjunctive keyword
    * query). Postings are distinct per (doc, term), so matching all k
    * terms is exactly k posting rows per doc — a count, no
    * count-distinct shuffle-heavy shape. */
  def lookupAll(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "InvertedIndex.lookupAll: need at least one term")
    spark.read.parquet(dir)
      .filter(col("term").isin(t: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === t.size)
      .select("doc_id")
  }

  /** Doc ids whose text contains ANY of `terms` (disjunctive). */
  def lookupAny(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    require(t.nonEmpty, "InvertedIndex.lookupAny: need at least one term")
    spark.read.parquet(dir)
      .filter(col("term").isin(t: _*))
      .select("doc_id").distinct()
  }
}
