package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming maintenance of the at-rest near-dup cluster artifact —
  * the micro-batch twin of the batch chain (shingle → Jaccard pairs →
  * connected components → [[Dedup.clustersAtRest]]), closing the last
  * batch/streaming asymmetry in the dedup family: batch jobs build the
  * cluster table once; this keeps it current as documents arrive.
  *
  * Per micro-batch, against three batch-versioned at-rest tables under
  * `root/` (postings `(id, sh)` partitioned by arrival batch, per-doc
  * capped shingle counts `(id, n)`, and cluster versions
  * `clusters/v=<batchId>`):
  *
  *  1. shingle the batch ([[Dedup.hashedShingleSets]] — same codegen
  *     kernel, same 60-bit keys as the batch chain);
  *  2. freeze boilerplate buckets whose RUNNING document frequency
  *     (prior postings + this batch) exceeds `dfCap` — the streaming
  *     form of [[Dedup.dfCapped]]'s blocking cap (PREFIX semantics:
  *     a bucket that crosses the cap stops producing pairs from that
  *     batch on; df is monotone, so frozen stays frozen. When no
  *     bucket ever crosses the cap this is IDENTICAL to the batch
  *     cap — the regime the parity test pins);
  *  3. intra-batch pairs via [[Dedup.jaccardPairsHashed]] and
  *     cross-batch pairs via one join of the batch's capped shingles
  *     against the postings table (blocked on shingle key, exactly the
  *     batch chain's join currency — at corpus scale the postings
  *     table is bucketed by `sh` so this join co-locates);
  *  4. fold the new pairs into the latest cluster version with
  *     [[Dedup.foldPairsIntoClusters]] (cost scales with TOUCHED
  *     components) and write `clusters/v=<batchId>`.
  *
  * Replay-safe without a transaction log: a replayed micro-batch
  * carries the same batchId (Structured Streaming's contract), reads
  * only state STRICTLY OLDER than itself (`b < batchId`, version
  * `v < batchId`) and overwrites exactly its own outputs — the same
  * idempotence-by-versioning that [[graft.sinks.ExactlyOnce]] gets
  * from its ledger. Doc ids are assumed unique across the stream
  * (an exactly-once ingest upstream; re-posted CONTENT is fine — that
  * is what the clusters detect).
  */
object ClusterMaintenance {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  private def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** All rows of a batch-versioned table written by batches BEFORE
    * `upTo` — a replayed batch must never read its own crashed
    * attempt's output. Partition pruning makes the `b < upTo` filter
    * a directory-listing decision, not a scan. */
  private def readBefore(spark: SparkSession, dir: String, ddl: String, upTo: Long): DataFrame =
    if (exists(spark, dir)) spark.read.parquet(dir).filter(col("b") < upTo)
    else emptyDf(spark, ddl)

  /** COMMITTED cluster version dirs under `root`, ascending by batch
    * id. A version counts only once its `_SUCCESS` marker exists —
    * a crash mid-write leaves a partial directory that consumers must
    * never mistake for the artifact (missing cluster rows would let
    * near-dup pairs straddle a train/val split silently). */
  private def versions(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/clusters")
    val f = fs(spark, s"$root/clusters")
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter(q => f.exists(new org.apache.hadoop.fs.Path(q, "_SUCCESS")))
      .map(q => (q.getName.stripPrefix("v=").toLong, q.toString))
      .sortBy(_._1)
  }

  /** Latest cluster state (consumers: split/keep-drop/rebalance jobs
    * join against this exactly as against the batch artifact). */
  def loadClusters(spark: SparkSession, root: String): DataFrame =
    versions(spark, root).lastOption
      .map { case (_, d) => Dedup.loadClusters(spark, d) }
      .getOrElse(emptyDf(spark, "doc_id BIGINT, cluster_id BIGINT"))

  /** Latest cluster version STRICTLY BEFORE `batchId` (replay safety). */
  private def clustersBefore(spark: SparkSession, root: String, batchId: Long): DataFrame =
    versions(spark, root).filter(_._1 < batchId).lastOption
      .map { case (_, d) => Dedup.loadClusters(spark, d) }
      .getOrElse(emptyDf(spark, "doc_id BIGINT, cluster_id BIGINT"))

  /** One micro-batch of the maintenance pipeline; wire via
    * `docs.writeStream.foreachBatch(sink(root, ...)).start()`. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      idCol: String, textCol: String,
      shingleN: Int = 5, dfCap: Long = Long.MaxValue, threshold: Double = 0.6): Unit = {
    val spark = batch.sparkSession
    val batchSh = Dedup.hashedShingleSets(
      batch.select(col(idCol).cast("long").as("id"), col(textCol).as("text")),
      col("id"), col("text"), shingleN).persist()
    try {
      val priorPostings = readBefore(spark, s"$root/postings", "id BIGINT, sh BIGINT, b BIGINT", batchId)
        .select(col("id"), col("sh"))
      val priorCounts = readBefore(spark, s"$root/counts", "id BIGINT, n BIGINT, b BIGINT", batchId)
        .select(col("id"), col("n"))
      // freeze buckets whose running df crosses the cap as of this batch.
      // Only shingles PRESENT in the batch can join, so the history is
      // SEMI-JOINED to the batch's (small, broadcastable) shingle set
      // before aggregating — the df computation shuffles O(batch)
      // postings rows, not the whole history. The frozen output is tiny
      // (it is the boilerplate set), so it broadcasts.
      // NO broadcast hint: a steady-state batch's key set is tiny (AQE
      // picks a broadcast join itself), but a backfill first batch can
      // carry 10^8+ distinct keys, and a forced broadcast would hit
      // the size ceiling where a shuffled semi-join just runs slower
      val batchShKeys = batchSh.select(col("sh")).distinct()
      val priorDf = priorPostings
        .join(batchShKeys, Seq("sh"), "left_semi")
        .groupBy(col("sh")).agg(count(lit(1)).as("df0"))
      val frozen = batchSh.groupBy(col("sh")).agg(count(lit(1)).as("df1"))
        .join(priorDf, Seq("sh"), "left")
        .filter(coalesce(col("df0"), lit(0L)) + col("df1") > dfCap)
        .select(col("sh"))
      val capped = batchSh.join(broadcast(frozen), Seq("sh"), "left_anti")
        .select(col("id"), col("sh")).persist()
      try {
        val nNew = capped.groupBy(col("id")).agg(count(lit(1)).as("n"))
        val intra = Dedup.jaccardPairsHashed(capped, threshold)
          .select(col("id_a"), col("id_b"))
        // cross-batch candidates: blocked on shared shingle keys; the
        // stored per-doc counts complete the Jaccard denominator
        // (prefix-capped, consistent with what each doc joined on)
        val inter = capped.select(col("id").as("id_new"), col("sh"))
          .join(priorPostings.select(col("id").as("id_old"), col("sh")), Seq("sh"))
          .groupBy(col("id_new"), col("id_old")).agg(count(lit(1)).as("ic"))
        val cross = inter
          .join(nNew.select(col("id").as("id_new"), col("n").as("n_new")), Seq("id_new"))
          .join(priorCounts.select(col("id").as("id_old"), col("n").as("n_old")), Seq("id_old"))
          .filter(col("ic").cast("double") / (col("n_new") + col("n_old") - col("ic")) >= threshold)
          .select(least(col("id_new"), col("id_old")).as("id_a"),
            greatest(col("id_new"), col("id_old")).as("id_b"))
        val pairs = intra.unionByName(cross)
        // scoped: connectedComponents (inside foldPairsIntoClusters)
        // localCheckpoints its final round and registers the blocks
        // with CachePool — the artifact write consumes them, and the
        // scope releases exactly THIS batch's blocks on exit (a global
        // drain could unpersist a concurrent query's truncated-lineage
        // checkpoints; skipping cleanup would leak one per micro-batch)
        graft.CachePool.scoped {
          val merged = Dedup.foldPairsIntoClusters(clustersBefore(spark, root, batchId), pairs)
          Dedup.clustersAtRest(merged, s"$root/clusters/v=$batchId")
        }
        // postings keep the UNCAPPED batch shingles: running df must stay
        // monotone (a frozen bucket's occurrences still count), while
        // counts store the capped per-doc sizes the Jaccard math uses
        batchSh.select(col("id"), col("sh"))
          .write.mode("overwrite").parquet(s"$root/postings/b=$batchId")
        nNew.write.mode("overwrite").parquet(s"$root/counts/b=$batchId")
      } finally capped.unpersist(blocking = false)
    } finally batchSh.unpersist(blocking = false)
  }

  /** foreachBatch adapter. */
  def sink(root: String, idCol: String, textCol: String,
      shingleN: Int = 5, dfCap: Long = Long.MaxValue, threshold: Double = 0.6)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      processBatch(batch, batchId, root, idCol, textCol, shingleN, dfCap, threshold)
}
