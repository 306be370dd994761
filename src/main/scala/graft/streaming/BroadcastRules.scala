package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** Predicate-rule snapshots: the rule VALUE is an arbitrary SQL
    * predicate string over the event columns (see [[compilePredicate]]
    * for the guard) — Flink's broadcast-state pattern carries exactly
    * this shape (per-rule logic, not just a threshold pair). */
  private val PredDdl = "rule_id BIGINT, pred STRING, ver BIGINT, op STRING"

  /** Full newest committed snapshot (live rows AND tombstones)
    * strictly below `below` (replay rule), or unbounded. */
  private def snapshot(spark: SparkSession, root: String,
      below: Option[Long], ddl: String = Ddl): DataFrame =
    BatchVersioned.versions(spark, root)
      .filter(v => below.forall(v._1 < _)).lastOption
      .map { case (_, d) => spark.read.parquet(d) }
      .getOrElse(BatchVersioned.emptyDf(spark, ddl))

  /** Newest committed LIVE rules (tombstones dropped). */
  def currentRules(spark: SparkSession, root: String,
      below: Option[Long] = None): DataFrame =
    snapshot(spark, root, below)
      .filter(col("op").isin("+I", "+U"))
      .select(col("rule_id"), col("event_type"), col("min_cents"), col("ver"))

  /** Newest committed LIVE predicate rules (tombstones dropped). */
  def currentPredRules(spark: SparkSession, root: String,
      below: Option[Long] = None): DataFrame =
    snapshot(spark, root, below, PredDdl)
      .filter(col("op").isin("+I", "+U"))
      .select(col("rule_id"), col("pred"), col("ver"))

  /** The shared snapshot fold over any rule schema (`ddl` must carry
    * `rule_id`, `ver`, `op` plus the rule's value columns): fold the
    * batch's +I/+U/-U/-D rows (last-writer-wins by `ver` with the
    * shared changelog op ranking at equal ver) over the previous
    * snapshot and commit `v=<batchId>` — keeping each rule's latest
    * image WHATEVER its kind, so tombstones fence late lower-ver
    * images. Empty batches re-commit the previous snapshot so the
    * version chain never gaps. Keeps the newest 2 versions (a
    * replayed batch N reads N's predecessor; the matcher reads
    * driver-side with a retry, so no task outlives a version). */
  private def foldSink(spark: SparkSession, root: String,
      ddl: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val cols = org.apache.spark.sql.types.StructType.fromDDL(ddl).fieldNames.toSeq
      val prev = snapshot(spark, root, below = Some(batchId), ddl)
      val w = Window.partitionBy(col("rule_id"))
        .orderBy(col("ver").desc, Cdc.opRankCol(col("op")).desc)
      prev.unionByName(batch.select(cols.map(col): _*))
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

  /** foreachBatch sink for the (event_type, min_cents) RULES
    * changelog — see [[foldSink]] for the fold/retention contract. */
  def rulesSink(spark: SparkSession, root: String): (DataFrame, Long) => Unit =
    foldSink(spark, root, Ddl)

  /** foreachBatch sink for the PREDICATE-rules changelog (`rule_id`,
    * `pred` SQL string, `ver`, `op`) — same fold/retention contract,
    * plus ADMISSION VALIDATION: every live predicate in the batch is
    * compiled against `eventsDdl` (the main stream's schema) BEFORE
    * the fold, so a malformed/injecting rule fails the low-throughput
    * RULES stream at its source (poison-pill semantics — the
    * checkpoint does not advance, the fix is upstream) and can never
    * reach a committed snapshot to kill the high-throughput matcher.
    * The matcher still compiles defensively ([[compilePredicate]]
    * names the offending rule_id). */
  def predRulesSink(spark: SparkSession, root: String,
      eventsDdl: String): (DataFrame, Long) => Unit = {
    val fold = foldSink(spark, root, PredDdl)
    (batch, batchId) => {
      val probe = BatchVersioned.emptyDf(spark, eventsDdl)
      batch.filter(col("op").isin("+I", "+U"))
        .select(col("rule_id"), col("pred"))
        .collect() // KB-scale by the pattern's definition
        .foreach { r =>
          try compilePredicate(probe, r.getString(1))
          catch {
            case e: IllegalArgumentException => throw new IllegalArgumentException(
              s"predRulesSink: rule ${r.getLong(0)} rejected at admission: ${e.getMessage}", e)
          }
        }
      fold(batch, batchId)
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

  /** Compile one rule's SQL predicate into a boolean Column over
    * `events`, with the INJECTION GUARD a string-carried predicate
    * needs (the rules stream is external input — Flink's broadcast
    * state carries arbitrary per-rule logic, so the Spark-first
    * translation is `expr()` compilation at PLAN time, which keeps
    * matching map-side, codegen'd, and KB-scale; the guard keeps it
    * from becoming a SQL injection surface). Loud-rejects when the
    * predicate:
    *  - fails to parse;
    *  - contains ANY subquery/plan expression (`EXISTS (SELECT ...)`,
    *    `IN (SELECT ...)`, scalar subqueries — a rule must never read
    *    other tables);
    *  - references a column outside the event schema (catches both
    *    typos and exfiltration-by-resolution attempts);
    *  - does not resolve to BOOLEAN;
    *  - is non-deterministic (rand()/uuid() etc. — replay of a
    *    micro-batch must re-match identically). */
  def compilePredicate(events: DataFrame, pred: String): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.PlanExpression
    val parsed =
      try events.sparkSession.sessionState.sqlParser.parseExpression(pred)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"rule predicate does not parse: `$pred` (${e.getMessage})")
      }
    parsed.foreach {
      case _: PlanExpression[_] => throw new IllegalArgumentException(
        s"rule predicate contains a subquery — rules must not read other tables: `$pred`")
      case u: UnresolvedAttribute =>
        val have = events.columns.map(_.toLowerCase).toSet
        if (!have.contains(u.name.toLowerCase)) throw new IllegalArgumentException(
          s"rule predicate references `${u.name}`, not an event column " +
            s"(${events.columns.mkString(", ")}): `$pred`")
      case _ => ()
    }
    val c = org.apache.spark.sql.graftbridge.ColumnBridge.column(parsed)
    // resolve against the event schema to type- and determinism-check
    val resolved =
      try events.select(c.as("__p")).queryExecution.analyzed
      catch {
        case e: org.apache.spark.sql.AnalysisException => throw new IllegalArgumentException(
          s"rule predicate does not resolve against the event schema: `$pred` (${e.getMessage})")
      }
    val p = resolved.expressions.head
    if (p.dataType != org.apache.spark.sql.types.BooleanType)
      throw new IllegalArgumentException(
        s"rule predicate must be BOOLEAN, got ${p.dataType.simpleString}: `$pred`")
    if (!p.deterministic)
      throw new IllegalArgumentException(
        s"rule predicate must be deterministic (micro-batch replay re-matches): `$pred`")
    c
  }

  /** Apply PREDICATE rules to events: ONE codegen'd projection —
    * `explode(array_compact(array(when(p1, id1), when(p2, id2), …)))`
    * — so an event alerts once per rule whose compiled predicate
    * holds. No join at all, nothing shuffles, nothing even
    * broadcasts: the rules are compiled INTO the plan, which is the
    * logical conclusion of the broadcast-state pattern (Flink ships
    * the rule objects to every task; compiling them into whole-stage
    * codegen ships them inside the generated code). Rule count is
    * plan-size-bounded (`require` ≤ 1024 — KB-scale is the pattern's
    * definition; beyond that, model rules as DATA and use the q83
    * broadcast join instead). */
  def matchEventsPred(events: DataFrame, rules: Seq[(Long, String)]): DataFrame = {
    require(rules.size <= 1024,
      s"matchEventsPred: ${rules.size} rules — predicate rules compile into the plan, " +
        "so the set must stay KB-scale; model larger rule sets as data (q83 broadcast join)")
    rules.groupBy(_._1).collect { case (id, rs) if rs.size > 1 => id } match {
      case dups if dups.nonEmpty => throw new IllegalArgumentException(
        s"matchEventsPred: duplicate rule_ids ${dups.toSeq.sorted.mkString(", ")}")
      case _ => ()
    }
    val arms = rules.map { case (id, p) =>
      val c = try compilePredicate(events, p) catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(s"rule $id: ${e.getMessage}", e)
      }
      when(c, lit(id))
    }
    val matched = if (arms.isEmpty) lit(Array.empty[Long]) else array_compact(array(arms: _*))
    events.withColumn("rule_id", explode(matched))
  }

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

  /** foreachBatch sink for the MAIN stream under PREDICATE rules:
    * collects the newest committed live (rule_id, pred) pairs
    * (same bounded GC-race retry as [[matcherSink]]) and compiles
    * them into the batch's match projection. */
  def predMatcherSink(spark: SparkSession, root: String,
      out: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (events, batchId) => {
      import spark.implicits._
      def readLive(): Seq[(Long, String)] =
        currentPredRules(spark, root)
          .select(col("rule_id"), col("pred"))
          .as[(Long, String)].collect().toSeq
      def attempt(left: Int): Seq[(Long, String)] =
        try readLive() catch {
          case e: Exception if left > 0 && isVersionGcRace(e) => attempt(left - 1)
        }
      out(matchEventsPred(events, attempt(5).sortBy(_._1)), batchId)
    }
}
