package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcTopNStream
import graft.streaming.CdcTopNStream.{RankChange, RankDelta}

/** The retractable Top-N composed END TO END the Kafka2Kafka way
  * (ref: Kafka2Kafka/src/main/java/Kafka2Kafka.java:27; the
  * CdcLoopSpec shape on the ranking operator): Debezium envelope
  * FILES carrying q84's EXACT entity-changelog synthesis →
  * `graft-debezium-json` DSv2 stream → [[CdcTopNStream.topN]] →
  * idempotent per-batch membership-delta sink, across a checkpointed
  * stop / produce-while-down / restart. Done = the materialized
  * membership equals batch q84 exactly, the per-identity retract
  * grammar is well-formed across the restart (no dupes/gaps), and an
  * idle restart replays nothing. */
class CdcTopNLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def env(op: String, before: Option[(Long, Long, String)],
      after: Option[(Long, Long, String)], ts: Long): String = {
    def img(o: Option[(Long, Long, String)]) = o.map { case (id, c, g) =>
      s"""{"id":$id,"cents":$c,"grp":"$g"}"""
    }.getOrElse("null")
    s"""{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":$ts,"source":{"db":"lake","table":"entities"}}"""
  }

  private def writeLines(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  test("topn loop: q84's changelog as envelope files -> debezium stream -> CdcTopNStream -> idempotent sink, membership == batch q84 across a restart") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_topnloop_src")
    val ckpt = Files.createTempDirectory("graft_topnloop_ckpt").toString
    try {
      // q84's synthesis, driven as envelopes: every order +I at ver 1
      // (cents0, grp = priority); F/P orders update at ver 2 — cents
      // raise AND GROUP MOVE (before-image -U routes to the old grp's
      // shard); P orders delete at ver 3 (before image = the ver-2
      // state). ts_ms carries the ver.
      val o = graft.sources.Tables.orders(spark, sfDir).select(
        $"o_orderkey".as("id"),
        round(($"o_totalprice" - 10) * 100).cast("long").as("c0"),
        round($"o_totalprice" * 100).cast("long").as("c1"),
        $"o_orderpriority".as("g0"),
        concat(lit("U-"), $"o_orderpriority").as("g1"),
        $"o_orderstatus".as("st"))
        .as[(Long, Long, Long, String, String, String)].collect()
      writeLines(srcDir, "00000.json",
        o.map { case (id, c0, _, g0, _, _) => env("c", None, Some((id, c0, g0)), ts = 1) }.toSeq)
      // file written AFTER the first run starts: the update+delete tail
      def tailLines = o.filter(r => r._6 == "F" || r._6 == "P")
        .map { case (id, c0, c1, g0, g1, _) =>
          env("u", Some((id, c0, g0)), Some((id, c1, g1)), ts = 2) }.toSeq ++
        o.filter(_._6 == "P").map { case (id, _, c1, _, g1, _) =>
          env("d", Some((id, c1, g1)), None, ts = 3) }.toSeq

      // idempotent per-batch delta sink: replayed batchIds overwrite
      val deltas = scala.collection.mutable.Map.empty[Long, Vector[RankDelta]]
      def startPipeline() = {
        val changes = spark.readStream
          .format("graft-debezium-json")
          .option("path", srcDir.toString)
          .option("rowSchema", "id BIGINT, cents BIGINT, grp STRING")
          .load()
          .select($"row_kind".as("op"), $"row.grp".as("grp"), $"row.id".as("id"),
            $"row.cents".cast("double").as("score"), $"ts_ms".as("ver"))
          .as[RankChange]
        CdcTopNStream.topN(changes, n = 3)
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[RankDelta], id: Long) =>
            val rows = df.collect().toVector
            deltas.synchronized { deltas(id) = rows }
            ()
          }
          .queryName("topn_loop").start()
      }

      val q1 = startPipeline()
      q1.processAllAvailable()
      q1.stop() // mid-stream shutdown: the +I backlog is committed

      writeLines(srcDir, "00001.json", tailLines) // produced while down

      val q2 = startPipeline() // restart from the checkpoint
      q2.processAllAvailable()
      q2.stop()

      // materialize the membership changelog in batch order
      val ordered = deltas.synchronized(deltas.toVector).sortBy(_._1).flatMap(_._2)
      val live = scala.collection.mutable.Set.empty[(String, Long)]
      ordered.foreach { d =>
        d.op match {
          case "+I" => assert(live.add((d.grp, d.id)), s"dupe +I for (${d.grp}, ${d.id})")
          case "-D" => assert(live.remove((d.grp, d.id)), s"-D without +I for (${d.grp}, ${d.id})")
        }
      }
      val want = SparkEntry.queries("q84_cdc_topn")(spark, sfDir)
        .select($"grp", $"id").as[(String, Long)].collect().toSet
      assert(live.toSet === want,
        s"streamed membership diverges from batch q84: extra=${live.toSet -- want}, missing=${want -- live.toSet}")
      assert(want.nonEmpty)

      // idle restart: nothing replays into NEW batchIds (a replay of a
      // committed batch under its own id is invisible by idempotence)
      val seen = deltas.synchronized(deltas.keySet.toSet)
      val q3 = startPipeline()
      q3.processAllAvailable()
      q3.stop()
      val grown = deltas.synchronized(deltas.toMap).filter {
        case (id, v) => !seen.contains(id) && v.nonEmpty
      }
      assert(grown.isEmpty, s"idle restart emitted new deltas: ${grown.keys}")
    } finally Seq(srcDir.toString, ckpt).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
