package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *    rebuilds exactly its own version);
  *  - the main stream's foreachBatch reads the newest COMMITTED
  *    snapshot and BROADCASTS it into the batch's join — rules are
  *    KB-scale by definition of the pattern, so every executor
  *    evaluates them map-side and the events never shuffle, exactly
  *    the property Flink's broadcast state buys.
  *
  * Consistency contract (same as Flink's): the two streams are NOT
  * synchronized — a rule update takes effect on the next main-stream
  * micro-batch that plans after its snapshot commits. Flink makes the
  * identical non-guarantee for broadcast elements racing data
  * elements; pipelines needing versioned-as-of rule application
  * should use the temporal join (q50/stream_temporal_join) instead.
  */
object BroadcastRules {

  private val Ddl = "rule_id BIGINT, event_type STRING, min_cents BIGINT, ver BIGINT"

  private def opRank(op: org.apache.spark.sql.Column) =
    when(op === "-U", 0).when(op === "+I", 1).when(op === "+U", 2)
      .when(op === "-D", 3)
      .otherwise(raise_error(concat(lit("broadcastRules: unknown row_kind "), op)))

  /** Newest committed snapshot strictly below `below` (replay rule),
    * or all committed when unbounded. Empty relation when none. */
  def currentRules(spark: SparkSession, root: String,
      below: Option[Long] = None): DataFrame =
    BatchVersioned.versions(spark, root)
      .filter(v => below.forall(v._1 < _)).lastOption
      .map { case (_, d) => spark.read.parquet(d) }
      .getOrElse(BatchVersioned.emptyDf(spark, Ddl))

  /** foreachBatch sink for the RULES changelog: fold the batch's
    * +I/+U/-U/-D rows (last-writer-wins by `ver`, changelog op
    * ranking at equal ver — the shared CDC rule) over the previous
    * snapshot and commit `v=<batchId>`. Empty batches re-commit the
    * previous snapshot so the version chain never gaps. Keeps the
    * newest 2 versions (a replayed batch N reads N's predecessor,
    * nothing older is reachable). */
  def rulesSink(spark: SparkSession, root: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val prev = currentRules(spark, root, below = Some(batchId))
        .withColumn("op", lit("+U")) // a snapshot row is a live image
      val w = Window.partitionBy(col("rule_id"))
        .orderBy(col("ver").desc, opRank(col("op")).desc)
      prev.unionByName(batch.select(
          col("op"), col("rule_id"), col("event_type"), col("min_cents"), col("ver")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("op").isin("+I", "+U"))
        .select(col("rule_id"), col("event_type"), col("min_cents"), col("ver"))
        .coalesce(1) // KB-scale by the pattern's definition
        .write.mode("overwrite").parquet(s"$root/v=$batchId")
      // retention: newest 2 committed versions suffice for any replay
      val vs = BatchVersioned.versions(spark, root)
      val f = BatchVersioned.fs(spark, root)
      vs.dropRight(2).foreach { case (_, d) =>
        f.delete(new org.apache.hadoop.fs.Path(d), true)
      }
    }

  /** Apply the current rules to one micro-batch (or any DataFrame) of
    * events carrying (`event_type`, `cents`): an event alerts once
    * per rule with matching type and `cents >= min_cents`. The rules
    * side is explicitly broadcast — events never shuffle. */
  def matchEvents(events: DataFrame, rules: DataFrame): DataFrame =
    events.join(
      broadcast(rules.select(col("rule_id"), col("event_type").as("__rt"), col("min_cents"))),
      col("event_type") === col("__rt") && col("cents") >= col("min_cents"))
      .drop("__rt")

  /** foreachBatch sink for the MAIN stream: plans each micro-batch
    * against the newest committed rules snapshot (the broadcast-state
    * bridge) and hands the alert rows to `out`. */
  def matcherSink(spark: SparkSession, root: String,
      out: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (events, batchId) => out(matchEvents(events, currentRules(spark, root)), batchId)
}
