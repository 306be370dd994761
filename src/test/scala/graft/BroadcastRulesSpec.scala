package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BroadcastRules

/** Broadcast-state pattern (dynamic rules over a main stream): the
  * rules changelog folds into versioned snapshots, rule updates and
  * deletes take effect on the NEXT main-stream micro-batch, version
  * retention stays bounded, and the alert join never shuffles the
  * events side. */
case class RuleChange(op: String, rule_id: Long, event_type: String,
    min_cents: Long, ver: Long)
case class RuleEv(event_id: Long, event_type: String, cents: Long)

class BroadcastRulesSpec extends AnyFunSuite {
  import TestSpark._
  private type Ev = RuleEv
  private def Ev(id: Long, t: String, c: Long) = RuleEv(id, t, c)

  test("broadcast rules: changelog folds to snapshots; updates/deletes apply on the next main batch; retention bounded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_brules").toString
    try {
      val rulesIn = MemoryStream[RuleChange]
      val mainIn = MemoryStream[Ev]
      val alerts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val rq = rulesIn.toDF().writeStream.outputMode("append")
        .foreachBatch(BroadcastRules.rulesSink(spark, root))
        .queryName("brules_rules").start()
      val mq = mainIn.toDS().toDF().writeStream.outputMode("append")
        .foreachBatch(BroadcastRules.matcherSink(spark, root,
          (df, id) => {
            val rows = df.select(col("event_id"), col("rule_id")).collect()
            alerts.synchronized { rows.foreach(r => alerts += ((id, r.getLong(0), r.getLong(1)))) }
            ()
          }))
        .queryName("brules_main").start()
      try {
        // rules v0: click >= 500 (rule 1), error >= 0 (rule 2)
        rulesIn.addData(Seq(
          RuleChange("+I", 1L, "click", 500L, 1L),
          RuleChange("+I", 2L, "error", 0L, 1L)))
        rq.processAllAvailable()
        val events = Seq(
          Ev(10L, "click", 499L), // below rule-1 threshold
          Ev(11L, "click", 500L), // at threshold: alerts
          Ev(12L, "error", 1L), // rule 2 alerts
          Ev(13L, "view", 9999L)) // no rule
        mainIn.addData(events)
        mq.processAllAvailable()
        // rules v1: rule 1 tightens to 2000 (an -U/+U pair sharing a
        // ver, the CDC shape); rule 2 deleted
        rulesIn.addData(Seq(
          RuleChange("-U", 1L, "click", 500L, 2L),
          RuleChange("+U", 1L, "click", 2000L, 2L),
          RuleChange("-D", 2L, "error", 0L, 3L)))
        rq.processAllAvailable()
        mainIn.addData(events.map(e => e.copy(event_id = e.event_id + 100L)))
        mq.processAllAvailable()
        val byBatch = alerts.synchronized(alerts.toVector).groupBy(_._1)
          .view.mapValues(_.map(a => (a._2, a._3)).toSet).toMap
        assert(byBatch(0L) === Set((11L, 1L), (12L, 2L)))
        // next batch: tightened rule 1 rejects 500-cent clicks, rule 2 gone
        assert(byBatch.getOrElse(1L, Set.empty) === Set.empty[(Long, Long)])
        // a third batch with a qualifying click under the new threshold
        mainIn.addData(Seq(Ev(220L, "click", 2500L), Ev(221L, "error", 50L)))
        mq.processAllAvailable()
        assert(byBatch.keySet === Set(0L)) // snapshot of the old map
        val all = alerts.synchronized(alerts.toVector)
        assert(all.filter(_._1 == 2L).map(a => (a._2, a._3)).toSet === Set((220L, 1L)))
        // live snapshot = just the tightened rule 1
        val live = BroadcastRules.currentRules(spark, root)
          .select(col("rule_id"), col("min_cents")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(live === Set((1L, 2000L)))
        // bounded retention: at most 2 committed versions on disk
        assert(new java.io.File(root).listFiles().count(_.getName.startsWith("v=")) <= 2)
        // TOMBSTONE FENCE: a stale lower-ver image of the DELETED rule
        // 2 arrives in a later batch (cross-partition reordering in
        // the rules feed) — the retained -D@3 must outrank +U@2 and
        // keep the rule dead
        rulesIn.addData(Seq(RuleChange("+U", 2L, "error", 1L, 2L)))
        rq.processAllAvailable()
        val live2 = BroadcastRules.currentRules(spark, root)
          .select(col("rule_id")).collect().map(_.getLong(0)).toSet
        assert(live2 === Set(1L), s"stale image resurrected the deleted rule: $live2")
        mainIn.addData(Seq(Ev(330L, "error", 50L)))
        mq.processAllAvailable()
        val all2 = alerts.synchronized(alerts.toVector)
        assert(!all2.exists(_._2 == 330L), "deleted rule fired an alert after the stale image")
      } finally { rq.stop(); mq.stop() }
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }

  // ---- predicate rules (round 13) ----

  private def evFrame = {
    import spark.implicits._
    Seq(Ev(1L, "click", 600L), Ev(2L, "error", 50L), Ev(3L, "view", 150L)).toDF()
  }

  test("compilePredicate guard: every injection/typo/nondeterminism case loud-rejects; good predicates compile") {
    val ev = evFrame
    def rejects(pred: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](BroadcastRules.compilePredicate(ev, pred))
      assert(e.getMessage.toLowerCase.contains(needle),
        s"`$pred` rejected with the wrong message: ${e.getMessage}")
    }
    rejects("cents >=", "parse") // malformed
    rejects("EXISTS (SELECT 1)", "subquery") // plan expression
    rejects("cents IN (SELECT cents FROM other)", "subquery")
    rejects("(SELECT max(cents) FROM t) > 5", "subquery") // scalar subquery
    rejects("secret_col = 1", "not an event column") // outside schema
    rejects("cents + 1", "boolean") // wrong type
    rejects("rand() < 0.5", "deterministic") // replay-unsafe
    // good ones compile and select correctly
    val ok = BroadcastRules.matchEventsPred(ev, Seq(
      7L -> "event_type = 'click' AND cents >= 500",
      8L -> "CENTS between 100 and 200")) // case-insensitive resolution
    val got = ok.select(col("event_id"), col("rule_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 7L), (3L, 8L)))
  }

  test("matchEventsPred: duplicate rule_ids and oversized rule sets loud-reject; empty rules match nothing") {
    val ev = evFrame
    val dup = intercept[IllegalArgumentException](BroadcastRules.matchEventsPred(ev,
      Seq(1L -> "cents > 0", 1L -> "cents > 1")))
    assert(dup.getMessage.contains("duplicate"))
    val big = intercept[IllegalArgumentException](BroadcastRules.matchEventsPred(ev,
      (1L to 1025L).map(i => i -> "cents > 0")))
    assert(big.getMessage.contains("KB-scale"))
    assert(BroadcastRules.matchEventsPred(ev, Seq.empty).count() === 0L)
  }

  test("matchEventsPred plan: one projection, no join, no exchange — the rules live inside the plan") {
    val ev = evFrame
    val plan = BroadcastRules.matchEventsPred(ev, Seq(
      1L -> "cents >= 500", 2L -> "event_type = 'view'"))
      .queryExecution.executedPlan
    val txt = plan.toString
    assert(!txt.contains("Join"), s"predicate match must not join:\n$txt")
    assert(!txt.contains("Exchange"), s"predicate match must not shuffle:\n$txt")
  }

  test("predicate rules stream: mid-stream predicate swap applies next batch; admission rejects a poisoned rule before it can reach a snapshot") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_prules").toString
    val evDdl = "event_id BIGINT, event_type STRING, cents BIGINT"
    try {
      val rulesIn = MemoryStream[(String, Long, String, Long)] // op, rule_id, pred, ver
      val mainIn = MemoryStream[Ev]
      val alerts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val rq = rulesIn.toDF().toDF("op", "rule_id", "pred", "ver")
        .writeStream.outputMode("append")
        .foreachBatch(BroadcastRules.predRulesSink(spark, root, evDdl))
        .queryName("prules_rules").start()
      val mq = mainIn.toDS().toDF().writeStream.outputMode("append")
        .foreachBatch(BroadcastRules.predMatcherSink(spark, root,
          (df, id) => {
            val rows = df.select(col("event_id"), col("rule_id")).collect()
            alerts.synchronized { rows.foreach(r => alerts += ((id, r.getLong(0), r.getLong(1)))) }
            ()
          }))
        .queryName("prules_main").start()
      try {
        rulesIn.addData(Seq(("+I", 1L, "event_type = 'click' AND cents >= 500", 1L)))
        rq.processAllAvailable()
        val events = Seq(Ev(10L, "click", 600L), Ev(11L, "click", 100L), Ev(12L, "error", 600L))
        mainIn.addData(events)
        mq.processAllAvailable()
        // swap the predicate ENTIRELY (not a threshold tweak): rule 1
        // now matches errors by parity — applies from the next batch
        rulesIn.addData(Seq(
          ("-U", 1L, "event_type = 'click' AND cents >= 500", 2L),
          ("+U", 1L, "event_type = 'error' AND cents % 2 = 0", 2L)))
        rq.processAllAvailable()
        mainIn.addData(events.map(e => e.copy(event_id = e.event_id + 100L)))
        mq.processAllAvailable()
        val byBatch = alerts.synchronized(alerts.toVector).groupBy(_._1)
          .view.mapValues(_.map(a => (a._2, a._3)).toSet).toMap
        assert(byBatch(0L) === Set((10L, 1L)))
        assert(byBatch.getOrElse(1L, Set.empty) === Set((112L, 1L)))
        // ADMISSION: a rule referencing a non-event column fails the
        // RULES stream loudly (poison pill) — and the snapshot chain
        // still serves the last good version to the matcher
        rulesIn.addData(Seq(("+I", 2L, "secret_col = 1", 3L)))
        val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          rq.processAllAvailable()
        }
        assert(Iterator.iterate(boom: Throwable)(_.getCause).takeWhile(_ != null).take(8)
            .exists(t => Option(t.getMessage).exists(m =>
              m.contains("rejected at admission") && m.contains("rule 2"))),
          s"wrong failure: ${boom.getMessage}")
        val live = BroadcastRules.currentPredRules(spark, root)
          .select(col("rule_id")).collect().map(_.getLong(0)).toSet
        assert(live === Set(1L), s"poisoned rule reached a snapshot: $live")
        mainIn.addData(Seq(Ev(220L, "error", 40L)))
        mq.processAllAvailable()
        val all = alerts.synchronized(alerts.toVector)
        assert(all.filter(_._1 == 2L).map(a => (a._2, a._3)).toSet === Set((220L, 1L)))
      } finally { rq.stop(); mq.stop() }
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
  }
}
