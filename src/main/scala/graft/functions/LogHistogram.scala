package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Log-bucketed histogram quantiles (HdrHistogram shape) — the
  * BOUNDED-STATE quantile sketch the streaming path needs.
  *
  * [[graft.operators.Quantiles]] (q69) is exact but iterative: it
  * re-scans the corpus per narrowing pass, which a stream cannot do.
  * This sketch trades a GUARANTEED relative error for one-pass,
  * order-independent folding: a value's bucket is the top
  * `1 + 11 + m` bits of its [[SortableDouble]] image (sign, exponent,
  * top-m mantissa bits — `sortable >> (52 - m)`), so every value in a
  * bucket agrees with the bucket's lower bound within relative error
  * 2^-m (m=7 → 0.8%; the HdrHistogram "significant digits" idea on
  * the sortable-bits image graft already standardizes on). The
  * reported quantile is the LOWER BOUND of the bucket holding rank
  * ceil(p·n/100) — a deterministic function of the VALUE SET's bucket
  * counts, independent of arrival order and partitioning, so the
  * streamed result after N batches EXACTLY equals the batch fold over
  * the union (the batch≡stream contract every graft twin pins), and
  * rank-adjacent noise cannot flip it.
  *
  * State per group: one (bucket → count) map over OCCUPIED buckets
  * only — ≤ 2^m entries per binary octave the data actually spans
  * (~40 octaves × 128 = 5k entries for data spanning 12 decades at
  * m=7), independent of row count. The absolute ceiling over all
  * representable doubles is 2^(m+13), but real columns span a few
  * octaves; `buckets_used` is emitted so callers can SEE the state
  * size (the monitoring-not-guessing rule).
  *
  * NULLs are excluded (SQL rank semantics, same as q69); NaN is
  * rejected loudly (its sortable image is not ordered).
  */
object LogHist {

  /** Bucket of `v` keeping `m` mantissa bits: arithmetic shift of the
    * order-preserving sortable image — monotone, so bucket order IS
    * value order. */
  def bucketOf(v: Double, m: Int): Long = {
    require(!v.isNaN, "LogHist: NaN has no ordered bucket — filter NaNs first")
    SortableDouble.toSortable(v) >> (52 - m)
  }

  /** Smallest double in `bucket` — the reported quantile value. */
  def lowerBound(bucket: Long, m: Int): Double =
    SortableDouble.fromSortable(bucket << (52 - m))

  /** Walk sorted (bucket, count) pairs to the bucket holding each
    * rank ceil(p·n/100); returns the per-pct lower bounds. */
  def quantiles(sorted: IndexedSeq[(Long, Long)], n: Long, pcts: Seq[Int], m: Int): Seq[Double] =
    pcts.map { p =>
      val rank = (p.toLong * n + 99L) / 100L // ceil, q69's integer math
      var cum = 0L
      var i = 0
      while (cum + sorted(i)._2 < rank) { cum += sorted(i)._2; i += 1 }
      lowerBound(sorted(i)._1, m)
    }
}

case class LogHistOut(n: Long, buckets_used: Int, qs: Seq[Double])

/** One-pass mergeable quantile fold: buffer is the occupied-bucket
  * count map; merge sums counts (set-of-multiset semantics — order
  * and partitioning invisible by construction). */
class LogHistQuantiles(pcts: Seq[Int], m: Int = 7)
    extends Aggregator[Double, Map[Long, Long], LogHistOut] {
  require(m >= 1 && m <= 20, s"mantissa bits out of range: $m")
  require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), s"bad pcts $pcts")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(b: Map[Long, Long], v: Double): Map[Long, Long] = {
    val k = LogHist.bucketOf(v, m)
    b.updated(k, b.getOrElse(k, 0L) + 1L)
  }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    b.foldLeft(a) { case (acc, (k, c)) => acc.updated(k, acc.getOrElse(k, 0L) + c) }

  override def finish(b: Map[Long, Long]): LogHistOut = {
    if (b.isEmpty) LogHistOut(0L, 0, pcts.map(_ => Double.NaN))
    else {
      val sorted = b.toIndexedSeq.sortBy(_._1)
      val n = sorted.iterator.map(_._2).sum
      LogHistOut(n, sorted.length, LogHist.quantiles(sorted, n, pcts, m))
    }
  }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[LogHistOut] = ExpressionEncoder()
}
