package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcJoinStream
import graft.streaming.CdcJoinStream.{JoinChange, JoinDelta}

/** The reference's CDC loop composed end to end on the JOIN VIEW
  * (ref: Kafka2Kafka.java:27 — source → format decode → transform →
  * sink as one checkpointed pipeline): TWO debezium envelope file
  * feeds (orders with an fk, customers) → `graft-debezium-json` DSv2
  * streaming sources → union → [[CdcJoinStream.joinStream]] →
  * idempotent per-batch parquet delta sink, with a checkpointed
  * stop/produce-while-down/restart cycle. Asserts the materialized
  * join view equals the final-state join, with no dupes or gaps
  * across the restart. */
class CdcJoinLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def lEnv(op: String, before: Option[(Long, Long, String)],
      after: Option[(Long, Long, String)], ts: Long): String = {
    def img(o: Option[(Long, Long, String)]) = o.map { case (lpk, fk, p) =>
      s"""{"lpk":$lpk,"fk":$fk,"payload":"$p"}"""
    }.getOrElse("null")
    s"""{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":$ts,"source":{"db":"lake","table":"orders"}}"""
  }

  private def rEnv(op: String, before: Option[(Long, String)],
      after: Option[(Long, String)], ts: Long): String = {
    def img(o: Option[(Long, String)]) = o.map { case (rpk, n) =>
      s"""{"rpk":$rpk,"name":"$n"}"""
    }.getOrElse("null")
    s"""{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":$ts,"source":{"db":"lake","table":"customer"}}"""
  }

  private def writeLines(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  test("CDC join loop: two envelope feeds -> DSv2 streams -> maintained join view, checkpointed restart mid-stream") {
    import spark.implicits._
    val lDir = Files.createTempDirectory("graft_cjl_left")
    val rDir = Files.createTempDirectory("graft_cjl_right")
    val outDir = Files.createTempDirectory("graft_cjl_out").toString
    val ckpt = Files.createTempDirectory("graft_cjl_ckpt").toString
    try {
      val custs = 1L to 20L
      val orders = 100L until 160L
      def fk0(o: Long) = 1L + o % 20
      // file 0 both feeds: all inserts
      writeLines(lDir, "00000.json", orders.map(o =>
        lEnv("c", None, Some((o, fk0(o), s"o$o")), ts = o)))
      writeLines(rDir, "00000.json", custs.map(c =>
        rEnv("c", None, Some((c, s"n$c")), ts = c)))

      def startPipeline() = {
        def side(dir: Path, schema: String) = spark.readStream
          .format("graft-debezium-json")
          .option("path", dir.toString)
          .option("rowSchema", schema)
          .load()
        val l = side(lDir, "lpk BIGINT, fk BIGINT, payload STRING")
          .select(lit("L").as("side"), $"row_kind".as("op"), $"row.fk".as("k"),
            $"row.lpk".as("pk"), $"row.payload".as("payload"), $"ts_ms".as("ver"))
        val r = side(rDir, "rpk BIGINT, name STRING")
          .select(lit("R").as("side"), $"row_kind".as("op"), $"row.rpk".as("k"),
            $"row.rpk".as("pk"), $"row.name".as("payload"), $"ts_ms".as("ver"))
        CdcJoinStream.joinStream(l.unionByName(r).as[JoinChange])
          .writeStream
          .option("checkpointLocation", ckpt)
          // idempotent delta sink: one overwritten dir per batch id, so
          // a replayed batch after restart rewrites instead of duping
          .foreachBatch { (df: org.apache.spark.sql.Dataset[JoinDelta], id: Long) =>
            df.write.mode("overwrite").parquet(s"$outDir/batch=$id")
            ()
          }
          .start()
      }

      val q1 = startPipeline()
      q1.processAllAvailable()
      q1.stop() // file 0 committed; pipeline down

      // upstream keeps producing while the pipeline is down:
      // - orders 100..119 move to fk+1 with new payloads (u: before
      //   carries the OLD fk — the before-image routing)
      // - orders divisible by 10 are deleted
      // - customers 1..5 renamed, customers 6..7 deleted
      writeLines(lDir, "00001.json",
        (100L until 120L).map(o =>
          lEnv("u", Some((o, fk0(o), s"o$o")), Some((o, fk0(o) + 1, s"o${o}v2")), ts = 1000 + o)) ++
        orders.filter(_ % 10 == 0).map { o =>
          val (fk, p) = if (o < 120) (fk0(o) + 1, s"o${o}v2") else (fk0(o), s"o$o")
          lEnv("d", Some((o, fk, p)), None, ts = 2000 + o)
        })
      writeLines(rDir, "00001.json",
        (1L to 5L).map(c => rEnv("u", Some((c, s"n$c")), Some((c, s"N$c")), ts = 1000 + c)) ++
        (6L to 7L).map(c => rEnv("d", Some((c, s"n$c")), None, ts = 2000 + c)))

      val q2 = startPipeline() // restart from the checkpoint
      q2.processAllAvailable()
      q2.stop()

      // materialize the delta stream: batch dirs carry the batch id;
      // within a batch a row identity (lpk, k) nets to live iff a
      // +I/+U delta is present (the -U of a change pairs with its +U
      // in the same batch; a lone -D/-U means dead)
      val deltas = spark.read.option("basePath", outDir).parquet(outDir)
        .withColumn("bid", regexp_extract(input_file_name(), "batch=(\\d+)", 1).cast("long"))
        .select($"bid", $"op", $"lpk", $"k", $"left", $"right")
        .collect()
      val live = deltas.groupBy(r => (r.getLong(2), r.getLong(3)))
        .flatMap { case (id, ds) =>
          val lastBatch = ds.map(_.getLong(0)).max
          val inLast = ds.filter(_.getLong(0) == lastBatch)
          inLast.find(r => r.getString(1) == "+I" || r.getString(1) == "+U")
            .map(r => id -> ((r.getString(4), r.getString(5))))
        }.toMap

      // ground truth from the synthesis: final left = not deleted,
      // moved if < 120; final right = 1..5 renamed, 6..7 dead
      val lFinal = orders.filterNot(_ % 10 == 0).map { o =>
        if (o < 120) (o, fk0(o) + 1, s"o${o}v2") else (o, fk0(o), s"o$o")
      }
      val rFinal = custs.filterNot(c => c == 6 || c == 7)
        .map(c => c -> (if (c <= 5) s"N$c" else s"n$c")).toMap
      val expected = lFinal.flatMap { case (o, fk, p) =>
        rFinal.get(fk).map(n => (o, fk) -> ((p, n)))
      }.toMap
      assert(live === expected, "maintained join view diverges after the restart")
      assert(expected.size >= 40, s"degenerate corpus: ${expected.size} live rows")
    } finally Seq(lDir.toString, rDir.toString, outDir, ckpt).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
