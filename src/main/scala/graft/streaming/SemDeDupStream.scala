package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.IvfIndex

/** Streaming SemDeDup — the micro-batch twin of batch q53, closing the
  * same batch/stream asymmetry [[ClusterMaintenance]] closed for the
  * shingle-cluster family: batch jobs SemDeDup a corpus once; this
  * maintains the keep/drop verdict table as embeddings arrive.
  *
  * The cell model is the PERSISTED q53 k-means ([[IvfIndex.load]] from
  * `modelDir` — a pure driver-side file read, ZERO jobs over the
  * embeddings table; training happened once, offline, exactly like the
  * at-rest IVF index). Per micro-batch, against two batch-versioned
  * at-rest tables under `root/` (per-cell corpus deltas
  * `corpus/b=<batch>` and verdict DELTAS `verdicts/v=<batch>`):
  *
  *  1. assign the batch's vectors to (cell, sub) via the loaded
  *     model's codegen kernel (+ the same second-level sign-LSH
  *     sub-bucket q53 uses past the centroid cap) — shuffle-free;
  *  2. candidate pairs = batch × prior corpus on (cell, sub) plus
  *     intra-batch pairs, filtered to cos ≥ tau; each unordered
  *     qualifying pair {u, w} is seen exactly ONCE, in the batch where
  *     its later-arriving member lands;
  *  3. orient pairs to (u = smaller vec_id, w = larger) and take
  *     min(u) per w — a LATE-arriving low id can lower an EXISTING
  *     vector's dup_of, so prior verdicts merge via least(): dup_of is
  *     a minimum over the pair set, min is associative, and therefore
  *     the final table equals batch q53's output for ANY arrival
  *     order (the [[graft.operators.Dedup.foldPairsIntoClusters]]
  *     min-label argument, applied to dup_of);
  *  4. write the verdict DELTA `verdicts/v=<batch>` — the batch's own
  *     rows plus only the RETRO-TOUCHED old rows (w ∈ the batch's
  *     pair set), never the whole table — and the corpus delta
  *     `corpus/b=<batch>`. [[loadVerdicts]] resolves
  *     latest-version-per-vector.
  *
  * Replay-safe by the [[BatchVersioned]] contract: strictly-older
  * reads, own-output overwrites, `_SUCCESS`-gated versions.
  *
  * ==Compaction — per-batch cost flat in stream history==
  *
  * Without it, step 2 re-read the ENTIRE corpus history and the
  * verdict merge re-read (and REWROTE) the entire verdict table every
  * micro-batch — both linear in corpus history, the scale-killer the
  * round-6 verdict flagged on ClusterMaintenance's postings (cured
  * there by [[ClusterMaintenance.compact]]; same cure here, on both
  * tables). Every `compactEvery` batches:
  *
  *  - the corpus history rewrites ONCE as a compact version sorted by
  *    the packed bucket key `ck = cell·2²⁰ + sub` with a per-row-group
  *    bloom on ck. The per-batch pair join then pushes the batch's
  *    distinct ck set into the scan as a parquet In-filter: only
  *    row-groups holding a bucket the batch actually touches are
  *    read — per-batch input from deep history is O(batch buckets ×
  *    row-group granule), flat in history depth, while the
  *    uncompacted tail stays bounded by compactEvery batches.
  *  - the verdict history (previous compact + deltas) resolves
  *    latest-per-vector ONCE into a compact version sorted by vec_id
  *    with a bloom on vec_id; the per-batch retro-touch lookup pushes
  *    the touched vec_id set the same way. Reads of both tables see
  *    newest-compact + delta tail; GC removes what no replay can
  *    read (below the PREVIOUS version, which is kept because a
  *    replayed compacting batch re-runs its compaction from it).
  */
object SemDeDupStream {
  import BatchVersioned._

  /** Packed bucket key (cell·2²⁰ + sub) — one sortable/bloomable
    * column for row-group pruning; subBits ≤ 20 by far (q53 uses
    * ≤ 12), so the pack is collision-free. */
  private[graft] def ck(cell: org.apache.spark.sql.Column, sub: org.apache.spark.sql.Column) =
    cell.cast("long") * lit(1L << 20) + sub

  // ---- corpus side ---------------------------------------------------------

  private def corpusCompactVersions(spark: SparkSession, root: String): Seq[(Long, String)] =
    versions(spark, s"$root/corpus_compact")

  /** Corpus rows visible to batch `batchId`: newest compact version at
    * or below it (ck-pruned when the batch's bucket set is pushed)
    * plus the delta tail. `<=` for the same replay reason as
    * [[ClusterMaintenance.postingsBefore]]: v=batchId holds exactly
    * the deltas b < batchId, written deterministically from
    * strictly-older state. */
  private[graft] def corpusBefore(spark: SparkSession, root: String, batchId: Long,
      pushCk: Option[Array[Long]]): DataFrame = {
    val compactOpt = corpusCompactVersions(spark, root).filter(_._1 <= batchId).lastOption
    val deltaLo = compactOpt.map(_._1).getOrElse(Long.MinValue)
    val deltas = readBefore(spark, s"$root/corpus",
      "vec_id BIGINT, cell INT, sub INT, v ARRAY<DOUBLE>, b BIGINT", batchId)
      .filter(col("b") >= deltaLo)
      .select(col("vec_id"), col("cell"), col("sub"), col("v"))
    compactOpt match {
      case Some((_, d)) =>
        val base = spark.read.parquet(d)
        val pruned = pushCk match {
          case Some(keys) => base.filter(col("ck").isInCollection(keys.toSeq))
          case None => base
        }
        pruned.select(col("vec_id"), col("cell"), col("sub"), col("v")).unionByName(deltas)
      case None => deltas
    }
  }

  /** Rewrite corpus history older than `batchId` as one ck-sorted
    * compact version, then GC versions/deltas below the PREVIOUS
    * compact version (kept: a replayed compacting batch re-runs this
    * from it — idempotent overwrite, identical rows). */
  /** `bloomNdv` = expected distinct ck per row group when
    * parquet.block.size is tuned small (0 = one row group per file,
    * i.e. min(rows, targetRows)) — the [[ClusterMaintenance.compact]]
    * convention. */
  private[graft] def compactCorpus(spark: SparkSession, root: String, batchId: Long,
      targetRows: Long = 4000000L, bloomNdv: Long = 0L): Unit = {
    val prev = corpusCompactVersions(spark, root).filter(_._1 < batchId).lastOption
    val deltaLo = prev.map(_._1).getOrElse(Long.MinValue)
    val deltas = readBefore(spark, s"$root/corpus",
      "vec_id BIGINT, cell INT, sub INT, v ARRAY<DOUBLE>, b BIGINT", batchId)
      .filter(col("b") >= deltaLo)
      .select(col("vec_id"), col("cell"), col("sub"), col("v"))
    val all = (prev match {
      case Some((_, d)) =>
        spark.read.parquet(d).select(col("vec_id"), col("cell"), col("sub"), col("v"))
          .unionByName(deltas)
      case None => deltas
    }).withColumn("ck", ck(col("cell"), col("sub")))
    val rows = all.count()
    if (rows > 0) {
      val nFiles = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
      all.repartitionByRange(nFiles, col("ck"))
        .sortWithinPartitions(col("ck"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#ck", "true")
        .option("parquet.bloom.filter.expected.ndv#ck",
          (if (bloomNdv > 0) bloomNdv else math.min(rows, targetRows)).toString)
        // fpp must be << 1/batch-buckets (compounds across probed keys;
        // see ClusterMaintenance.compact)
        .option("parquet.bloom.filter.fpp#ck", "0.000001")
        .parquet(s"$root/corpus_compact/v=$batchId")
      gcBelowPrev(spark, s"$root/corpus_compact", s"$root/corpus", "b", prev)
    }
  }

  // ---- verdict side --------------------------------------------------------

  private def verdictCompactVersions(spark: SparkSession, root: String): Seq[(Long, String)] =
    versions(spark, s"$root/verdicts_compact")

  private val VerdictCols = Seq("vec_id", "cell", "sub", "dup_of")

  /** Latest verdict per vector among `parts`, where later versions
    * override earlier (`ver` column; the compact part rides at
    * Long.MinValue — it is the OLDEST state by construction). */
  private def latestPerKey(parts: Seq[DataFrame]): DataFrame = {
    val all = parts.reduce(_ unionByName _)
    all.withColumn("rn",
        row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("ver").desc)))
      .filter(col("rn") === 1)
      .select(VerdictCols.map(col): _*)
  }

  /** Verdict parts visible strictly according to `verUpper` (None =
    * everything committed): newest compact ≤ bound + delta tail, each
    * carrying `ver`. */
  private def verdictParts(spark: SparkSession, root: String,
      verUpper: Option[Long], pushIds: Option[Array[Long]]): Seq[DataFrame] = {
    val compactOpt = verdictCompactVersions(spark, root)
      .filter(v => verUpper.forall(v._1 <= _)).lastOption
    val lo = compactOpt.map(_._1).getOrElse(Long.MinValue)
    val deltaDirs = versions(spark, s"$root/verdicts")
      .filter { case (v, _) => v >= lo && verUpper.forall(v < _) }.map(_._2)
    val compactPart = compactOpt.map { case (_, d) =>
      val base = spark.read.parquet(d)
      val pruned = pushIds match {
        case Some(keys) => base.filter(col("vec_id").isInCollection(keys.toSeq))
        case None => base
      }
      pruned.select(VerdictCols.map(col): _*).withColumn("ver", lit(Long.MinValue))
    }.toSeq
    val deltaPart =
      if (deltaDirs.isEmpty) Seq.empty
      else Seq(spark.read.option("basePath", s"$root/verdicts").parquet(deltaDirs: _*)
        .withColumnRenamed("v", "ver")
        .select((VerdictCols.map(col) :+ col("ver")): _*))
    compactPart ++ deltaPart
  }

  /** Latest committed verdict table: (vec_id, cell, keep, dup_of) —
    * the exact q53 schema, resolved latest-version-per-vector over
    * newest-compact + deltas. */
  def loadVerdicts(spark: SparkSession, root: String): DataFrame = {
    val parts = verdictParts(spark, root, verUpper = None, pushIds = None)
    if (parts.isEmpty)
      emptyDf(spark, "vec_id BIGINT, cell INT, keep BOOLEAN, dup_of BIGINT")
    else latestPerKey(parts)
      .select(col("vec_id"), col("cell"), col("dup_of").isNull.as("keep"), col("dup_of"))
  }

  /** Latest verdict rows BEFORE `batchId` for the touched vec_ids
    * (pushed into the compact scan's vec_id bloom when bounded). */
  private def verdictsBefore(spark: SparkSession, root: String, batchId: Long,
      pushIds: Option[Array[Long]]): DataFrame = {
    val parts = verdictParts(spark, root, verUpper = Some(batchId), pushIds)
    if (parts.isEmpty) emptyDf(spark, "vec_id BIGINT, cell INT, sub INT, dup_of BIGINT")
    else latestPerKey(parts)
  }

  /** Resolve verdict history older than `batchId` into one
    * vec_id-sorted compact version + GC (mirror of [[compactCorpus]]). */
  private[graft] def compactVerdicts(spark: SparkSession, root: String, batchId: Long,
      targetRows: Long = 4000000L): Unit = {
    val prev = verdictCompactVersions(spark, root).filter(_._1 < batchId).lastOption
    val parts = verdictParts(spark, root, verUpper = Some(batchId), pushIds = None)
    if (parts.nonEmpty) {
      // persisted: the count (for file sizing) and the write would
      // otherwise each re-run the full compact+delta union AND its
      // latest-per-key window shuffle over the whole history
      val resolved = latestPerKey(parts).persist()
      try {
        val rows = resolved.count()
        if (rows > 0) {
          val nFiles = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
          resolved.repartitionByRange(nFiles, col("vec_id"))
            .sortWithinPartitions(col("vec_id"))
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#vec_id", "true")
            .option("parquet.bloom.filter.expected.ndv#vec_id", math.min(rows, targetRows).toString)
            .option("parquet.bloom.filter.fpp#vec_id", "0.000001")
            .parquet(s"$root/verdicts_compact/v=$batchId")
          gcBelowPrev(spark, s"$root/verdicts_compact", s"$root/verdicts", "v", prev)
        }
      } finally resolved.unpersist(blocking = false)
    }
  }

  // ---- per-batch pipeline --------------------------------------------------

  /** One micro-batch; `batch` must carry (vec_id BIGINT,
    * v ARRAY<DOUBLE>). Wire via
    * `emb.writeStream.foreachBatch(sink(spark, root, modelDir)).start()`. */
  def processBatch(batch: DataFrame, batchId: Long, root: String, modelDir: String,
      tau: Double = 0.92, subBits: Int = 0, compactEvery: Int = 0): Unit =
    processBatch(batch, batchId, root,
      IvfIndex.load(batch.sparkSession, modelDir), tau, subBits, compactEvery,
      compactTargetRows = 4000000L, maxPushdownKeys = 100000)

  /** Same, against an already-loaded (pinned) model (no default args —
    * Scala allows them on one overload only; the modelDir overload
    * carries them). `compactEvery` > 0 compacts both at-rest tables
    * every that many batches; `maxPushdownKeys` bounds the
    * driver-collected key sets for scan pruning (an over-limit batch
    * reads un-pruned — correctness never depends on the pushdown). */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      model: IvfIndex.Model, tau: Double, subBits: Int,
      compactEvery: Int, compactTargetRows: Long,
      maxPushdownKeys: Int): Unit = {
    val spark = batch.sparkSession
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      compactCorpus(spark, root, batchId, compactTargetRows)
      compactVerdicts(spark, root, batchId, compactTargetRows)
    }
    val assigned = IvfIndex.assignCells(batch.select(col("vec_id"), col("v")), model)
      .withColumn("sub", graft.queries.SimilarityQ.semdedupSubKey(col("v"), subBits))
      .select(col("vec_id"), col("cell"), col("sub"), col("v"))
      .persist()
    try {
      // the batch's distinct bucket keys, bounded, for corpus-scan
      // pruning (limit(max+1): over-limit yields None, never a
      // truncated push set)
      val ckRows = assigned.select(ck(col("cell"), col("sub")).as("ck")).distinct()
        .limit(maxPushdownKeys + 1).collect()
      val pushCk = if (ckRows.length > maxPushdownKeys) None
        else Some(ckRows.map(_.getLong(0)))
      val prior = corpusBefore(spark, root, batchId, pushCk)
      // cross pairs: both orientations matter (an old lower id drops a
      // new vector; a NEW lower id retro-drops an old one) — orient by
      // least/greatest so min(u) per w is well-defined
      val cross = prior.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
            col("a.vec_id") =!= col("b.vec_id") &&
            VectorFunctions.cosine(col("a.v"), col("b.v")) >= tau)
        .select(least(col("a.vec_id"), col("b.vec_id")).as("u"),
          greatest(col("a.vec_id"), col("b.vec_id")).as("w"))
      val intra = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
            col("a.vec_id") < col("b.vec_id") &&
            VectorFunctions.cosine(col("a.v"), col("b.v")) >= tau)
        .select(col("a.vec_id").as("u"), col("b.vec_id").as("w"))
      val minUp = cross.unionByName(intra)
        .groupBy(col("w")).agg(min(col("u")).as("cand"))
        .persist()
      try {
        // touched OLD vectors (retro-drops): bounded by the batch's
        // pair set, pushed into the verdict compact's vec_id bloom
        val wRows = minUp.select(col("w")).limit(maxPushdownKeys + 1).collect()
        val pushW = if (wRows.length > maxPushdownKeys) None
          else Some(wRows.map(_.getLong(0)))
        val prev = verdictsBefore(spark, root, batchId, pushW)
        // merge: least() skips NULLs, so a touched verdict takes the
        // smaller of old and new. Untouched old verdicts are NOT
        // rewritten — the delta carries only batch rows + retro-touches
        val updatedOld = prev
          .join(minUp, prev("vec_id") === minUp("w"))
          .select(prev("vec_id"), col("cell"), col("sub"),
            least(col("dup_of"), col("cand")).as("dup_of"))
        val newRows = assigned.select(col("vec_id"), col("cell"), col("sub"))
          .join(minUp, assigned("vec_id") === minUp("w"), "left")
          .select(assigned("vec_id"), col("cell"), col("sub"), col("cand").as("dup_of"))
        updatedOld.unionByName(newRows)
          .select(col("vec_id"), col("cell"), col("sub"),
            col("dup_of").isNull.as("keep"), col("dup_of"))
          .write.mode("overwrite").parquet(s"$root/verdicts/v=$batchId")
        assigned.write.mode("overwrite").parquet(s"$root/corpus/b=$batchId")
      } finally minUp.unpersist(blocking = false)
    } finally assigned.unpersist(blocking = false)
  }

  /** foreachBatch adapter. The model is loaded ONCE and pinned for
    * the sink's lifetime (the [[IvfStream.sink]] argument: a
    * mid-stream retrain must swap in a new root, never re-cell a
    * live verdict table). */
  def sink(spark: SparkSession, root: String, modelDir: String,
      tau: Double = 0.92, subBits: Int = 0,
      compactEvery: Int = 16): (DataFrame, Long) => Unit = {
    val model = IvfIndex.load(spark, modelDir)
    (batch, batchId) =>
      processBatch(batch, batchId, root, model, tau, subBits, compactEvery,
        compactTargetRows = 4000000L, maxPushdownKeys = 100000)
  }
}
