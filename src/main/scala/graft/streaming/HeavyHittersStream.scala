package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.MisraGries

/** Streaming heavy-hitters candidates — q72's micro-batch twin.
  *
  * Like COUNT(DISTINCT) (see [[KmvStream]]), exact frequent-item
  * detection over a stream would need unbounded state (the full
  * vocabulary); the mergeable Misra–Gries summary is the bounded
  * answer: per group the state store holds ≤ k counters forever, and
  * mergeability makes the streamed fold's GUARANTEE identical to the
  * batch fold's — every token above support 1/k of the stream-so-far
  * is in the candidate set after any number of micro-batches, for any
  * arrival order.
  *
  * The CONTRACT differs from the other streaming twins deliberately:
  * MG summaries are order-dependent in their counts, so the streamed
  * summary is not bit-equal to a batch summary — what is preserved
  * (and what the spec pins) is the candidate-superset guarantee plus
  * the exactness of the composed pipeline: streamed candidates
  * re-counted in one batch pass over the at-rest corpus EQUAL batch
  * q72 exactly, because any candidate superset yields the same
  * exact-count filter output.
  */
object HeavyHittersStream {

  /** Running candidate summary over a (possibly streaming) token
    * relation: one row per group with the ≤ k candidate tokens and
    * the exact stream-so-far token count N (needed for the support
    * threshold at recount time). */
  def candidates(toks: DataFrame, tokenCol: Column, k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k), Encoders.STRING)
    toks.select(tokenCol.as("token"))
      .agg(count(lit(1)).as("n"), mg(col("token")).as("cands"))
  }

  /** The exactness closure: re-count `cands` over the at-rest corpus
    * tokens and apply the support filter — equals batch q72 for ANY
    * candidate superset (extra candidates fall to the exact filter). */
  def recount(corpusToks: DataFrame, tokenCol: Column,
      cands: Seq[String], n: Long, den: Int): DataFrame =
    corpusToks.select(tokenCol.as("token"))
      .filter(col("token").isin(cands: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") * lit(den) >= lit(n))
}
