package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Dynamic rule matching — Flink's BROADCAST STATE pattern
  * (`mainStream.connect(ruleStream.broadcast(descriptor))
  * .process(BroadcastProcessFunction)`: a low-throughput RULES
  * changelog applied, always-current, to a high-throughput MAIN
  * stream — fraud patterns, dynamic filters, routing tables).
  *
  * Spark-first re-expression: Structured Streaming has no broadcast
  * stream connect, and it does not need one — the idiomatic shape is
  * a BATCH-VERSIONED at-rest rules snapshot (the [[BatchVersioned]]
  * pattern the stream maintainers share) bridged into the main
  * stream's per-micro-batch planning:
  *
  *  - the rules changelog (+I/+U/-U/-D by rule_id) folds into a full
  *    snapshot per rules micro-batch (`v=<batchId>`, _SUCCESS-gated,
  *    replay reads strictly-older versions — a replayed rules batch
  *    rebuilds exactly its own version). The snapshot KEEPS
  *    tombstones: a deleted rule's -D row rides every later version
  *    so a stale lower-ver image arriving in a later batch cannot
  *    resurrect it (the same fence CdcJoinStream/cdcUpsertStream
  *    keep; tombstone space is the rule-id space — KB-scale by the
  *    pattern's definition);
  *  - the main stream's foreachBatch COLLECTS the newest committed
  *    snapshot's live rows to the driver (KB-scale — that is what
  *    makes it broadcast state) and broadcasts them into the batch's
  *    alert join, so matching is map-side, the events never shuffle,
  *    and no task ever holds a file handle into the snapshot dir
  *    (the rules stream GC's old versions concurrently; the
  *    driver-side read retries once on a version deleted underfoot).
  *
  * Consistency contract (same as Flink's): the two streams are NOT
  * synchronized — a rule update takes effect on the next main-stream
  * micro-batch that plans after its snapshot commits. Flink makes the
  * identical non-guarantee for broadcast elements racing data
  * elements; pipelines needing versioned-as-of rule application
  * should use the temporal join (q50/stream_temporal_join) instead.
  */
object BroadcastRules {

  private val Ddl = "rule_id BIGINT, event_type STRING, min_cents BIGINT, ver BIGINT, op STRING"

  /** Full newest committed snapshot (live rows AND tombstones)
    * strictly below `below` (replay rule), or unbounded. */
  private def snapshot(spark: SparkSession, root: String,
      below: Option[Long]): DataFrame =
    BatchVersioned.versions(spark, root)
      .filter(v => below.forall(v._1 < _)).lastOption
      .map { case (_, d) => spark.read.parquet(d) }
      .getOrElse(BatchVersioned.emptyDf(spark, Ddl))

  /** Newest committed LIVE rules (tombstones dropped). */
  def currentRules(spark: SparkSession, root: String,
      below: Option[Long] = None): DataFrame =
    snapshot(spark, root, below)
      .filter(col("op").isin("+I", "+U"))
      .select(col("rule_id"), col("event_type"), col("min_cents"), col("ver"))

  /** foreachBatch sink for the RULES changelog: fold the batch's
    * +I/+U/-U/-D rows (last-writer-wins by `ver` with the shared
    * changelog op ranking at equal ver) over the previous snapshot
    * and commit `v=<batchId>` — keeping each rule's latest image
    * WHATEVER its kind, so tombstones fence late lower-ver images.
    * Empty batches re-commit the previous snapshot so the version
    * chain never gaps. Keeps the newest 2 versions (a replayed batch
    * N reads N's predecessor; the matcher reads driver-side with a
    * retry, so no task outlives a version). */
  def rulesSink(spark: SparkSession, root: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val prev = snapshot(spark, root, below = Some(batchId))
      val w = Window.partitionBy(col("rule_id"))
        .orderBy(col("ver").desc, Cdc.opRankCol(col("op")).desc)
      prev.unionByName(batch.select(
          col("rule_id"), col("event_type"), col("min_cents"), col("ver"), col("op")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
        .coalesce(1) // KB-scale by the pattern's definition
        .write.mode("overwrite").parquet(s"$root/v=$batchId")
      val vs = BatchVersioned.versions(spark, root)
      val f = BatchVersioned.fs(spark, root)
      vs.dropRight(2).foreach { case (_, d) =>
        f.delete(new org.apache.hadoop.fs.Path(d), true)
      }
    }

  /** Apply a rules relation to events carrying (`event_type`,
    * `cents`): an event alerts once per rule with matching type and
    * `cents >= min_cents`. The rules side is explicitly broadcast —
    * events never shuffle. */
  def matchEvents(events: DataFrame, rules: DataFrame): DataFrame =
    events.join(
      broadcast(rules.select(col("rule_id"), col("event_type").as("__rt"), col("min_cents"))),
      col("event_type") === col("__rt") && col("cents") >= col("min_cents"))
      .drop("__rt")

  /** A GC race, specifically: the rules stream deleted the version
    * dir between our listing and our read. ONLY these retry —
    * anything else (schema corruption, permission/auth failures)
    * must surface, not be laundered into a transient. */
  private def isVersionGcRace(e: Throwable): Boolean = e match {
    case _: java.io.FileNotFoundException => true
    case a: org.apache.spark.sql.AnalysisException =>
      Option(a.getCondition).contains("PATH_NOT_FOUND") ||
        a.getMessage.contains("Path does not exist")
    case _ => e.getCause != null && isVersionGcRace(e.getCause)
  }

  /** foreachBatch sink for the MAIN stream: collects the newest
    * committed live rules to the driver (retrying, bounded, when the
    * rules stream GC'd the listed version underfoot — each retry
    * re-lists and lands on a newer committed version, so two rules
    * commits during the window just mean two quick retries) and
    * broadcasts them into the batch's alert join before handing the
    * rows to `out`. */
  def matcherSink(spark: SparkSession, root: String,
      out: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (events, batchId) => {
      import spark.implicits._
      def readLive(): Seq[(Long, String, Long)] =
        currentRules(spark, root)
          .select(col("rule_id"), col("event_type"), col("min_cents"))
          .as[(Long, String, Long)].collect().toSeq
      def attempt(left: Int): Seq[(Long, String, Long)] =
        try readLive() catch {
          case e: Exception if left > 0 && isVersionGcRace(e) => attempt(left - 1)
        }
      val rules = attempt(5).toDF("rule_id", "event_type", "min_cents")
      out(matchEvents(events, rules), batchId)
    }
}
