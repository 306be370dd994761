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
}
