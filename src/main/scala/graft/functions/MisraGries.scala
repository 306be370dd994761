package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a typed
  * mergeable [[Aggregator]] (merge rule per Agarwal et al. 2012,
  * "Mergeable summaries": sum counters, then subtract the (k+1)-th
  * largest count and drop non-positives — the union summary keeps the
  * MG guarantee).
  *
  * Guarantee: after folding N items with k counters, every item with
  * true frequency > N/k is present in the summary, regardless of
  * partitioning or arrival order. The summary's COUNTS are
  * order-dependent (undercounts), so graft never emits them — the
  * summary is a CANDIDATE SET ONLY, and q72 re-counts candidates
  * exactly in a second pass. That makes the operator's OUTPUT exact
  * and deterministic (the DuckDB oracle is the plain HAVING query)
  * while the shuffle carries k counters per partition instead of the
  * full token vocabulary — the 100 TB shape for "which tokens exceed
  * 0.5% of the corpus".
  *
  * Amortized O(1)/item: a decrement event costs O(k) but can happen
  * at most N/k times (each removes k+1 count units).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"MG needs k >= 1 counters, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None => // decrement-all; entries hitting zero vacate counters
        m.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything; ties make
      // the survivor set value-determined (count - v > 0), never
      // iteration-order-determined
      val v = sum.values.toArray.sortBy(-_).apply(k)
      sum.flatMap { case (t, c) => if (c - v > 0) Some(t -> (c - v)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}
