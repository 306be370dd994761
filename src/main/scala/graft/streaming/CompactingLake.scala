package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The batch-versioned-ingest + periodic-recluster engine that every
  * streamed at-rest layout shares — factored out when the SECOND
  * consumer appeared (the tombstone-helper lesson: two hand-rolled
  * copies of the replay/GC/visibility rules is how a fix misses one).
  * [[ZOrderStream]] instantiates it with a Z-order rewrite,
  * [[KeywordIndexStream]] with a term-clustered postings rewrite,
  * [[ManifestStream]] with a clustered rewrite + per-dir manifest; the
  * engine owns everything they must agree on:
  *
  *  - arrivals land under `root/b=<batchId>` via mode(overwrite) on
  *    the batch's OWN dir, so a replayed micro-batch (same batchId —
  *    Structured Streaming's contract) overwrites exactly its own
  *    output ([[BatchVersioned]] replay rule); no per-batch
  *    clustering — a micro-batch is smaller than one parquet row
  *    group, the clustering work belongs to compaction where it
  *    amortizes;
  *  - every `compactEvery` batches the arrival tail is compacted —
  *    LEVELED (round 16; the r15 full-history rewrite was O(N) I/O
  *    per compaction on a growing lake, O(N²/compactEvery) cumulative
  *    write amplification — the scale-killer at 100 TB ingest):
  *      - MINOR compaction rewrites ONLY the committed arrival tail
  *        into a bounded L1 chunk `root/l1/v=<batchId>` — cost ∝ one
  *        compaction interval of arrivals, FLAT in history depth;
  *      - MAJOR compaction (when accumulated L1+tail bytes reach
  *        `majorFrac` of the base, or the chunk count reaches
  *        `maxL1`, or no base exists yet) folds base + L1 chunks +
  *        tail into a new base `root/compact/v=<batchId>`. With the
  *        byte-fraction trigger each row is major-rewritten a
  *        geometric number of times over the lake's lifetime
  *        (≈ (1+majorFrac)/majorFrac total passes), so cumulative
  *        write I/O is O(N), not O(N²);
  *    both land `_SUCCESS`-gated, file count derived from the
  *    measured bytes of EXACTLY the dirs the rewrite reads, then
  *    state no possible replay can read is GC'd (the previous base is
  *    kept as the one-version replay lease — a replay of `batchId`
  *    re-runs its compaction from the same committed inputs, and the
  *    inputs of a just-committed major stay on disk until the NEXT
  *    compaction proves the replay window closed);
  *  - readers resolve newest committed base + committed L1 chunks
  *    above it + committed arrival tail at-or-after the last
  *    compaction, all `_SUCCESS`-gated, through the ONE
  *    [[readerDirs]] rule — so torn batches, torn chunks and torn
  *    majors are invisible until their replay commits; the
  *    unclustered tail is bounded by the compaction interval, the L1
  *    chunk list by the major trigger, and the one-version retention
  *    lease matches [[IvfStream.topK]].
  */
object CompactingLake {

  /** Compaction rewrite contract: (committed input, destination,
    * output file count) — file count is pre-derived from measured
    * input bytes so every instantiation sizes output identically.
    * Called for BOTH minor (input = arrival tail, dst under `l1/`)
    * and major (input = base ∪ L1 ∪ tail, dst under `compact/`)
    * compactions — an instantiation's rewrite must therefore be
    * self-contained per call (re-derive boundaries/manifests from the
    * input it is given), which all three are. */
  type Rewrite = (DataFrame, String, Int) => Unit

  /** Default major trigger: fold L1+tail into the base once they
    * reach 30% of its bytes. Lower = fewer chunks for readers to
    * union but more major I/O; cumulative major write cost over a
    * lake grown to N bytes is ≈ N·(1+f)/f. */
  val DefaultMajorFrac = 0.3

  /** Guard on the L1 chunk count (reader/listing fan-out bound) —
    * generous: the byte rule fires far earlier at any realistic
    * minor-chunk size; this only catches degenerate tiny-chunk
    * streams. */
  val DefaultMaxL1 = 64

  /** The reader-resolution result: newest committed base version,
    * committed L1 chunks above it (ascending), committed arrival
    * dirs at-or-after the last compaction. */
  final case class Levels(base: Option[(Long, String)],
      l1s: Seq[(Long, String)], tail: Seq[String]) {
    /** Every dir a reader unions, base-to-tail order. */
    def dirs: Seq[String] = base.map(_._2).toSeq ++ l1s.map(_._2) ++ tail
    /** The arrival floor: dirs `b >= lo` are tail. */
    def lo: Long = (base.map(_._1) ++ l1s.lastOption.map(_._1))
      .foldLeft(Long.MinValue)(math.max)
    /** The reader's DataFrames, grouped per level (base alone, all L1
      * chunks as ONE multi-path relation, the tail as another) — a
      * per-dir relation would cost a listing/scan node per dir, up to
      * maxL1 + compactEvery of them on a busy lake. Schemas are
      * uniform within a level by the engine's contract. */
    def frames(spark: SparkSession): Seq[DataFrame] =
      base.map { case (_, d) => spark.read.parquet(d) }.toSeq ++
        (if (l1s.isEmpty) Seq.empty
         else Seq(spark.read.parquet(l1s.map(_._2): _*))) ++
        (if (tail.isEmpty) Seq.empty else Seq(spark.read.parquet(tail: _*)))
  }

  /** One micro-batch of ingest: maybe-compact first (a replayed batch
    * re-runs its compaction from the kept previous inputs), then
    * commit the batch's own dir. `ingest` transforms the arriving
    * rows into the lake's AT-REST schema (identity for a layout
    * stream; docs→postings for an index stream) — it must be
    * deterministic so a replay commits identical rows. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      compactEvery: Int, targetBytes: Long, rewrite: Rewrite,
      ingest: DataFrame => DataFrame = identity,
      majorFrac: Double = DefaultMajorFrac, maxL1: Int = DefaultMaxL1): Unit = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      compact(batch.sparkSession, root, batchId, targetBytes, rewrite,
        majorFrac, maxL1)
    ingest(batch).write.mode("overwrite").parquet(s"$root/b=$batchId")
  }

  /** The reader-resolution rule ITSELF — exposed so instantiations
    * that read the parts DIFFERENTLY (e.g.
    * [[ManifestStream.prunedScan]] file-prunes base and each L1 chunk
    * through their own manifests and reads the tail whole) still
    * resolve through the ONE definition instead of hand-rolling the
    * boundary rules. L1 chunks at-or-below the base version are
    * already folded into it (kept on disk only as the replay lease of
    * the major that consumed them) and are NOT visible; arrival dirs
    * below the newest compaction are likewise invisible. */
  private[graft] def readerDirs(spark: SparkSession, root: String,
      upper: Option[Long] = None): Levels = {
    val base = BatchVersioned.versions(spark, s"$root/compact")
      .filter(v => upper.forall(v._1 < _)).lastOption
    val baseV = base.map(_._1).getOrElse(Long.MinValue)
    val l1s = BatchVersioned.versions(spark, s"$root/l1")
      .filter { case (v, _) => v > baseV && upper.forall(v < _) }
    // the tail floor is Levels.lo's ONE definition — no local copy
    val lo = Levels(base, l1s, Nil).lo
    val tail = BatchVersioned.versions(spark, root, prefix = "b")
      .filter { case (b, _) => b >= lo && upper.forall(b < _) }.map(_._2)
    Levels(base, l1s, tail)
  }

  private def bytesOf(spark: SparkSession, dir: String): Long =
    BatchVersioned.fs(spark, dir)
      .getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength

  /** Compact committed history below `batchId`: MINOR (tail → L1
    * chunk `l1/v=batchId`) unless the major trigger fires, in which
    * case base + L1 chunks + tail fold into `compact/v=batchId`.
    * Idempotent under replay: the decision depends only on the
    * committed inputs below `batchId`, ALL of which survive this
    * call's own GC — same inputs, same bytes, same decision, same
    * overwrite. */
  private[graft] def compact(spark: SparkSession, root: String, batchId: Long,
      targetBytes: Long, rewrite: Rewrite,
      majorFrac: Double = DefaultMajorFrac, maxL1: Int = DefaultMaxL1): Unit = {
    val lv = readerDirs(spark, root, upper = Some(batchId))
    val baseBytes = lv.base.map(d => bytesOf(spark, d._2)).getOrElse(0L)
    val l1Bytes = lv.l1s.map(d => bytesOf(spark, d._2)).sum
    val tailBytes = lv.tail.map(bytesOf(spark, _)).sum
    val major = lv.base.isEmpty || lv.l1s.size >= maxL1 ||
      l1Bytes + tailBytes >= majorFrac * baseBytes
    // grouped per-level relations (Levels.frames), never one scan
    // node per dir
    val in = if (major) lv.frames(spark)
      else Levels(None, Nil, lv.tail).frames(spark)
    if (in.nonEmpty) {
      val bytes = if (major) baseBytes + l1Bytes + tailBytes else tailBytes
      val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      val dst = if (major) s"$root/compact/v=$batchId" else s"$root/l1/v=$batchId"
      rewrite(in.reduce(_ unionByName _), dst, files)
      gc(spark, root, lv)
    }
  }

  /** GC after a compaction committed. Deletable = needed by NO reader
    * of the new state and NO replay of the compacting batch itself
    * (earlier batches are checkpoint-committed — micro-batches run
    * serially — so their replays are impossible). `lv` is the input
    * resolution the compaction used (upper = batchId), so `lv.base`
    * is the PREVIOUS base after a major and the current base after a
    * minor — under both readings the same three rules apply:
    *  - bases below `lv.base` (after a major that's the replay lease:
    *    the just-committed major's replay re-reads lv.base; after a
    *    minor anything below the current base is provably dead);
    *  - L1 chunks at-or-below `lv.base` (after a major the chunks in
    *    (lv.base, batchId) are its own inputs — kept for its replay;
    *    they fall below the new base in [[readerDirs]] so no reader
    *    unions them, and the NEXT compaction's GC removes them; after
    *    a minor, chunks at-or-below the current base are dead — their
    *    content is inside it and the major that read them committed
    *    before this batch started);
    *  - arrivals below the input floor `lv.lo` (consumed by the
    *    previous compaction; this batch's replay re-reads exactly
    *    [lo, batchId), which stays). */
  private def gc(spark: SparkSession, root: String, lv: Levels): Unit = {
    val f = BatchVersioned.fs(spark, root)
    def rm(d: String): Unit = f.delete(new org.apache.hadoop.fs.Path(d), true)
    lv.base.foreach { case (pv, _) =>
      BatchVersioned.versions(spark, s"$root/compact")
        .filter(_._1 < pv).foreach { case (_, d) => rm(d) }
      BatchVersioned.versions(spark, s"$root/l1")
        .filter(_._1 <= pv).foreach { case (_, d) => rm(d) }
    }
    if (lv.lo > Long.MinValue)
      BatchVersioned.versions(spark, root, prefix = "b")
        .filter(_._1 < lv.lo).foreach { case (_, d) => rm(d) }
  }

  /** Every row a reader may see: newest committed base + committed L1
    * chunks above it + committed arrival batches at-or-after the last
    * compaction. A replayed pre-compaction batch recommits rows
    * already inside the base or an L1 chunk and stays invisible here —
    * no double counting. */
  def visible(spark: SparkSession, root: String): DataFrame = {
    val ps = readerDirs(spark, root).frames(spark)
    require(ps.nonEmpty, s"no committed batches under $root")
    ps.reduce(_ unionByName _)
  }

  /** The compacted BASE alone (layout evidence: scan pruning is a
    * property of the CLUSTERED history; L1 chunks are each internally
    * clustered, the tail is the bounded unclustered delta). */
  private[graft] def compactPart(spark: SparkSession, root: String): Option[DataFrame] =
    BatchVersioned.versions(spark, s"$root/compact").lastOption
      .map { case (_, d) => spark.read.parquet(d) }
}
