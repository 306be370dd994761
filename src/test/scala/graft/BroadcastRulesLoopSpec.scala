package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.BroadcastRules

/** The broadcast-state pattern composed END TO END the Kafka2Kafka
  * way (ref: Kafka2Kafka/src/main/java/Kafka2Kafka.java:27 — source →
  * format decode → transform → sink as ONE checkpointed pipeline, the
  * shape CdcLoopSpec drives for the index): Debezium envelope rule
  * FILES → `graft-debezium-json` DSv2 stream → [[BroadcastRules
  * .rulesSink]] snapshot chain, with an events file stream →
  * [[BroadcastRules.matcherSink]] → an idempotent per-batch alert
  * sink — across a checkpointed stop / produce-while-down / restart
  * of BOTH streams. Proves the two loop invariants the unit specs
  * can't see:
  *
  *   - NO LOST RULE UPDATES: rule changes produced while the pipeline
  *     was down land in the snapshot chain on restart, and the live
  *     set equals the net changelog state;
  *   - NO STALE-MATCH DUPES: no event alerts twice (the checkpoint
  *     does not replay committed main batches; a replayed in-flight
  *     batch overwrites its own batchId in the idempotent sink), and
  *     post-restart events match ONLY post-restart rules.
  */
class BroadcastRulesLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def ruleEnv(op: String, before: Option[(Long, String, Long)],
      after: Option[(Long, String, Long)], ts: Long): String = {
    def img(o: Option[(Long, String, Long)]) = o.map { case (id, t, c) =>
      s"""{"rule_id":$id,"event_type":"$t","min_cents":$c}"""
    }.getOrElse("null")
    s"""{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":$ts,"source":{"db":"ops","table":"rules"}}"""
  }

  private def writeLines(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  test("rules loop: envelope files -> debezium stream -> snapshots -> matcher, across a checkpointed restart with rule churn while down") {
    import spark.implicits._
    val rulesSrc = Files.createTempDirectory("graft_brloop_rules")
    val evSrc = Files.createTempDirectory("graft_brloop_ev")
    val root = Files.createTempDirectory("graft_brloop_snap").toString
    val ckptR = Files.createTempDirectory("graft_brloop_ckr").toString
    val ckptM = Files.createTempDirectory("graft_brloop_ckm").toString
    try {
      // alert sink: idempotent per batchId — a replayed batch
      // OVERWRITES its slot, so dupes can only come from the source
      // re-serving data under a new batchId (the bug this loop hunts)
      val alerts = scala.collection.mutable.Map.empty[Long, Set[(Long, Long)]]
      def startRules() = spark.readStream
        .format("graft-debezium-json")
        .option("path", rulesSrc.toString)
        .option("rowSchema", "rule_id BIGINT, event_type STRING, min_cents BIGINT")
        .load()
        .select($"row_kind".as("op"), $"row.rule_id".as("rule_id"),
          $"row.event_type".as("event_type"), $"row.min_cents".as("min_cents"),
          $"ts_ms".as("ver"))
        .writeStream.option("checkpointLocation", ckptR)
        .foreachBatch(BroadcastRules.rulesSink(spark, root))
        .queryName("brloop_rules").start()
      def startMain() = spark.readStream
        .schema("event_id BIGINT, event_type STRING, cents BIGINT")
        .json(evSrc.toString)
        .writeStream.option("checkpointLocation", ckptM)
        .foreachBatch(BroadcastRules.matcherSink(spark, root,
          (df, id) => {
            val rows = df.select(col("event_id"), col("rule_id")).collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
            alerts.synchronized { alerts(id) = rows }
            ()
          }))
        .queryName("brloop_main").start()

      // epoch 1: rules v1 (click>=500 rule 1, error>=0 rule 2), then
      // events — matched under v1
      writeLines(rulesSrc, "00000.json", Seq(
        ruleEnv("c", None, Some((1L, "click", 500L)), ts = 1),
        ruleEnv("c", None, Some((2L, "error", 0L)), ts = 1)))
      val rq1 = startRules(); rq1.processAllAvailable()
      writeLines(evSrc, "00000.json", Seq(
        """{"event_id":10,"event_type":"click","cents":600}""",
        """{"event_id":11,"event_type":"click","cents":100}""",
        """{"event_id":12,"event_type":"error","cents":5}"""))
      val mq1 = startMain(); mq1.processAllAvailable()
      // mid-stream shutdown of the WHOLE pipeline
      mq1.stop(); rq1.stop()

      // while DOWN, the upstream keeps producing: rule 1 tightens to
      // 2000 (-U/+U, one ver), rule 2 is deleted; new events arrive
      writeLines(rulesSrc, "00001.json", Seq(
        ruleEnv("u", Some((1L, "click", 500L)), Some((1L, "click", 2000L)), ts = 2),
        ruleEnv("d", Some((2L, "error", 0L)), None, ts = 3)))
      writeLines(evSrc, "00001.json", Seq(
        """{"event_id":110,"event_type":"click","cents":600}""",
        """{"event_id":111,"event_type":"click","cents":2500}""",
        """{"event_id":112,"event_type":"error","cents":5}"""))

      // restart from the checkpoints; rules catch up FIRST (the
      // documented consistency contract: updates apply from the next
      // main batch that plans after the snapshot commits)
      val rq2 = startRules(); rq2.processAllAvailable()
      val mq2 = startMain(); mq2.processAllAvailable()

      // NO LOST RULE UPDATES: live state = net changelog
      val live = BroadcastRules.currentRules(spark, root)
        .select(col("rule_id"), col("min_cents")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(live === Set((1L, 2000L)),
        s"rule churn produced while down was lost or misfolded: $live")

      // epoch-1 matches used v1 rules; epoch-2 matches used v2 —
      // and the epoch-1 events did NOT re-match after the restart
      val all = alerts.synchronized(alerts.toMap)
      val flat = all.values.flatten.toVector
      assert(flat.toSet === Set((10L, 1L), (12L, 2L), (111L, 1L)),
        s"alert set wrong across restart: $all")
      // NO STALE-MATCH DUPES: one alert per (event, rule) overall
      assert(flat.size === flat.toSet.size, s"duplicate alerts across restart: $all")

      // idle restart: nothing replays, nothing re-alerts
      mq2.stop(); rq2.stop()
      val before = alerts.synchronized(alerts.toMap)
      val rq3 = startRules(); rq3.processAllAvailable()
      val mq3 = startMain(); mq3.processAllAvailable()
      mq3.stop(); rq3.stop()
      val after = alerts.synchronized(alerts.toMap)
      assert(after.values.flatten.toVector.sorted ===
        before.values.flatten.toVector.sorted,
        "an idle restart re-emitted alerts (stale-match dupes)")
    } finally Seq(rulesSrc.toString, evSrc.toString, root, ckptR, ckptM)
      .foreach(d => graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
