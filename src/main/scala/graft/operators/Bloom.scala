package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Broadcast Bloom filter as a map-side semi-join reduction.
  *
  * The reference's decontamination-shaped jobs are plain joins (Flink
  * SQL INSERT..SELECT with a JOIN against a small reference table); at
  * 100 TB the expensive part is not the join itself but the SHUFFLE of
  * the corpus-side key stream feeding it. A Bloom filter over the
  * small side, evaluated inside the corpus scan's codegen'd Filter,
  * drops the overwhelmingly-clean key stream before it ever reaches an
  * Exchange — only suspects (true hits + the ~1% false-positive tail)
  * pay the exact verification join, which then removes the false
  * positives, so results are EXACT and the oracle is the plain SQL
  * join. This is the hand-rolled, contract-visible twin of Spark's own
  * `InjectRuntimeFilter` bloom (which only triggers on shuffle-join
  * shapes the optimizer picks); here the filter is part of the
  * operator's semantics and testable in isolation.
  *
  * Hashing: `nh` probes, probe i = `xxhash64(i, key) mod m` — the
  * codegen'd built-in, no overflow under ANSI mode, identical on the
  * build and probe sides by construction. The bitset travels as ONE
  * JVM object referenced `nh` times in the expression tree (Java
  * serialization dedupes repeated references, so the task binary
  * carries one copy; a 10M-key eval suite at 10 bits/key is ~12 MB —
  * broadcast-class, like the dims this engine already broadcasts).
  */
object Bloom {

  /** OR-merge bitset aggregator: input = bit index, buffer = packed
    * words. Catalyst plans it with map-side partial aggregation, so
    * each input partition contributes one `m`-bit word array to the
    * final merge — the build never shuffles the key stream. */
  case class BitsBuf(var words: Array[Long])
  class BitsetAgg(m: Int) extends Aggregator[Long, BitsBuf, Array[Long]] {
    private val nw = (m + 63) / 64
    override def zero: BitsBuf = BitsBuf(new Array[Long](nw))
    override def reduce(b: BitsBuf, idx: Long): BitsBuf = {
      b.words((idx >>> 6).toInt) |= (1L << (idx & 63)); b
    }
    override def merge(a: BitsBuf, b: BitsBuf): BitsBuf = {
      var i = 0
      while (i < nw) { a.words(i) |= b.words(i); i += 1 }
      a
    }
    override def finish(b: BitsBuf): Array[Long] = b.words
    override def bufferEncoder: Encoder[BitsBuf] = Encoders.product[BitsBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Built filter: the packed bitset plus the (m, nh) geometry the
    * probe side must reuse verbatim. */
  final case class Filter(bits: Array[Long], m: Int, nh: Int)

  /** Bits-per-key 10 / 7 probes ≈ 0.8% false-positive rate — the
    * classic (m/n = 10, k = ln 2 · m/n) point. */
  val BitsPerKey = 10
  val NumHashes = 7

  /** Probe-index column for hash function `i` of geometry `m`. Both
    * sides feed `i` as an INT column so xxhash64 sees identical input
    * bytes on build and probe. Public because [[Manifest]] reuses the
    * exact build/probe pair for its per-FILE blooms — one hashing
    * contract, not two copies that could drift. */
  def probeCol(i: Column, key: Column, m: Int): Column =
    pmod(xxhash64(i, key), lit(m.toLong))
  private def probe(i: Int, key: Column, m: Int): Column =
    probeCol(lit(i), key, m)

  /** Build a Bloom filter over `keyCol` of `keys` (distinct or not —
    * the bitset doesn't care). The single-row collect at the end is
    * bounded by the FILTER size (m bits), never by the key count:
    * the per-partition partial aggregates already reduced the stream.
    * `nKeys` sizes the filter and is the small side's count — by the
    * operator's contract that side is broadcast-class (an eval suite,
    * a blocklist), so counting it is a cheap scan. */
  def build(keys: DataFrame, keyCol: Column, nKeys: Long): Filter = {
    val m = math.max(1024L, nKeys * BitsPerKey).min(Int.MaxValue.toLong - 63).toInt
    val agg = udaf(new BitsetAgg(m), Encoders.scalaLong)
    val idx = keys.select(
      explode(sequence(lit(0), lit(NumHashes - 1))).as("i"), keyCol.as("k"))
      .select(probeCol(col("i"), col("k"), m).as("idx"))
      .agg(agg(col("idx")).as("bits"))
    val bits = idx.head().getAs[scala.collection.Seq[Long]]("bits").toArray
    Filter(bits, m, NumHashes)
  }

  /** Codegen-friendly membership test: `nh` unrolled probes, each a
    * built-in xxhash64 + pmod + word/bit extract over the bitset
    * literal. No higher-order-function lambda (those fall back to
    * interpreted eval), no UDF — the whole predicate stays inside
    * WholeStageCodegen in the scan's Filter. */
  def mightContain(key: Column, f: Filter): Column = {
    val bitsLit = typedLit(f.bits)
    (0 until f.nh).map { i =>
      val idx = probe(i, key, f.m)
      val word = element_at(bitsLit, (idx / 64).cast("int") + lit(1))
      call_function("shiftright", word, (idx % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
