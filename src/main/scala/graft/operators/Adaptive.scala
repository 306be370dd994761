package graft.operators

/** Corpus-size-derived LSH/blocking parameters.
  *
  * STRESS.md's core finding: fixed band widths are a quadratic cliff —
  * k-bit buckets hold n/2^k vectors, so candidate pairs grow with
  * bucket², and a width tuned for 10^4 rows collapses at 10^6. Every
  * derivation here is pure INTEGER arithmetic (bit length of an
  * integer quotient) so the DuckDB oracle replays it exactly from the
  * same table count: `length(bin(x))` ≡ `64 - numberOfLeadingZeros(x)`.
  *
  * The corpus-size signal is always the BASE table count (documents /
  * embeddings), not the query-local augmented count — both engines can
  * read it cheaply (parquet metadata) and identically.
  */
object Adaptive {

  private def bitLen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** Bits per LSH band targeting ~`targetBucket` vectors per bucket:
    * bitlen(max(1, n / targetBucket)), clamped to [lo, hi]. Bucket
    * occupancy stays ~targetBucket as n grows, so the candidate join
    * is O(n · bands · targetBucket) — linear in n. */
  def bits(n: Long, targetBucket: Long, lo: Int, hi: Int): Int =
    math.min(hi, math.max(lo, bitLen(math.max(1L, n / targetBucket))))

  /** DuckDB twin of [[bits]]; `nSql` is a bigint SQL expression. */
  def bitsSql(nSql: String, targetBucket: Long, lo: Int, hi: Int): String =
    s"least($hi, greatest($lo, length(bin(greatest(1, ($nSql) // $targetBucket)))))"

  /** MinHash rows-per-band r = clamp(4, 8, bitlen(n) / 3): the
    * per-band false-positive rate for background similarity s₀ is
    * s₀^r, so r must grow with log n to keep FP candidates per doc
    * bounded as the corpus grows. */
  def minhashRows(n: Long): Int =
    math.min(8, math.max(4, bitLen(math.max(1L, n)) / 3))

  def minhashRowsSql(nSql: String): String =
    s"least(8, greatest(4, length(bin(greatest(1, $nSql))) // 3))"

  /** Bands for a given r, keeping the LSH S-curve threshold
    * (1/b)^(1/r) ≈ 0.6 as r sharpens: b = round(0.6^-r), tabulated
    * (not computed via floating pow) so both engines agree exactly. */
  val minhashBands: Map[Int, Int] = Map(4 -> 8, 5 -> 13, 6 -> 21, 7 -> 36, 8 -> 60)

  def minhashBandsSql(rSql: String): String =
    s"(CASE ($rSql) WHEN 4 THEN 8 WHEN 5 THEN 13 WHEN 6 THEN 21 WHEN 7 THEN 36 ELSE 60 END)"

  /** Document-frequency cap for shingle blocking: a shingle shared by
    * k docs yields k² join rows, so web-corpus boilerplate (headers,
    * license text) turns one hot key into an effective cartesian
    * bucket. Shingles with df > max(20, n/20) carry ~zero Jaccard
    * signal and are dropped from the shingle SETS (counts AND joins,
    * both engines) — "similarity over non-boilerplate shingles". */
  def dfCap(n: Long): Long = math.max(20L, n / 20L)

  def dfCapSql(nSql: String): String = s"greatest(20, ($nSql) // 20)"
}
