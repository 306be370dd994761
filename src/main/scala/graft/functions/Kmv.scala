package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al.
  * 2002; the "bottom-k" estimator) as a typed [[Aggregator]].
  *
  * The reference ships exact COUNT(DISTINCT ...) jobs only (Flink SQL
  * INSERT..SELECT aggregates); at 100 TB an exact distinct over
  * shingle keys shuffles the full key set. KMV replaces that with a
  * fixed-size sketch: each partition keeps the k smallest DISTINCT
  * hash values it sees, merge is a k-way sorted union — so the only
  * bytes that cross the wire are k longs per (partition, group), and
  * Catalyst plans it with map-side partial aggregation exactly like
  * any built-in agg. The estimator is deterministic (no RNG; the
  * "randomness" is the md5-derived 60-bit key the dedup family
  * already standardizes on), so DuckDB can replay it bit-for-bit:
  * `ORDER BY key LIMIT k` is the same sketch.
  *
  * Estimate: with hashes uniform on [0, 2^60), if the k-th smallest
  * distinct value is h_k then  D ≈ (k-1) * (2^60 / h_k); when the
  * sketch never fills, it holds every distinct value and the count is
  * exact. The multiply/divide order matches the oracle SQL verbatim —
  * both engines do IEEE double `(k_used-1) * (2^60 / h_k)`.
  *
  * Buffer: a sorted array, capped at k. reduce() is a binary search +
  * (only while the value beats the current k-th) an insertion shift;
  * once the sketch saturates, values >= the k-th are rejected in
  * O(1)/O(log k), which is the common case on a big corpus.
  */
case class KmvBuf(var arr: Array[Long], var n: Int)

case class KmvOut(k_used: Long, kth_min: Long, est_distinct: Double)

class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, KmvOut] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: KmvBuf = KmvBuf(new Array[Long](k), 0)

  override def reduce(b: KmvBuf, v: Long): KmvBuf = {
    if (b.n == k && v >= b.arr(k - 1)) return b
    val pos = java.util.Arrays.binarySearch(b.arr, 0, b.n, v)
    if (pos >= 0) return b // already present: set semantics
    val ins = -pos - 1
    val last = if (b.n == k) k - 1 else b.n
    // shift [ins, last) right by one; the old k-th (if full) falls off
    System.arraycopy(b.arr, ins, b.arr, ins + 1, last - ins)
    b.arr(ins) = v
    if (b.n < k) b.n += 1
    b
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    if (b.n == 0) return a
    if (a.n == 0) return b
    val out = new Array[Long](k)
    var i = 0; var j = 0; var m = 0
    while (m < k && (i < a.n || j < b.n)) {
      val fromA =
        if (i >= a.n) false
        else if (j >= b.n) true
        else a.arr(i) <= b.arr(j)
      val v = if (fromA) { val x = a.arr(i); i += 1; x }
              else       { val x = b.arr(j); j += 1; x }
      if (m == 0 || out(m - 1) != v) { out(m) = v; m += 1 }
    }
    a.arr = out; a.n = m
    a
  }

  override def finish(b: KmvBuf): KmvOut = {
    val M = 1152921504606846976.0 // 2^60, exact in double
    if (b.n == 0) KmvOut(0L, 0L, 0.0)
    else if (b.n < k) KmvOut(b.n.toLong, b.arr(b.n - 1), b.n.toDouble)
    else KmvOut(k.toLong, b.arr(k - 1), (k - 1).toDouble * (M / b.arr(k - 1).toDouble))
  }

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
}

/** The sketch's full bottom-k array (sorted ascending), for KMV SET
  * OPERATIONS (Beyer et al. 2007 "On synopses for distinct-value
  * estimation under multiset operations"): the bottom-k of A ∪ B is
  * computable from K(A) and K(B) alone, and the members of K(A∪B)
  * present in BOTH K(A) and K(B) estimate the Jaccard — so two
  * corpora can be compared for distinct-key overlap from two 8 KB
  * sketches, with the corpora themselves never joined. Same buffer
  * and fold as [[KmvSketch]]; only `finish` differs. */
case class KmvArr(k_used: Long, arr: Array[Long])

class KmvArraySketch(k: Int) extends Aggregator[Long, KmvBuf, KmvArr] {
  private val inner = new KmvSketch(k)
  override def zero: KmvBuf = inner.zero
  override def reduce(b: KmvBuf, v: Long): KmvBuf = inner.reduce(b, v)
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
  override def finish(b: KmvBuf): KmvArr =
    KmvArr(b.n.toLong, java.util.Arrays.copyOfRange(b.arr, 0, b.n))
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvArr] = Encoders.product[KmvArr]
}
