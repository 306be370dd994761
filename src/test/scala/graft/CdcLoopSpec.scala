package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.IvfChangelog

/** The reference's CDC loop composed END TO END on the ANN index
  * (ref: Kafka2Kafka/src/main/java/Kafka2Kafka.java:27 — source →
  * format decode → transform → sink, as ONE checkpointed pipeline):
  * Debezium envelope FILES → `graft-debezium-json` DSv2 streaming
  * source (format + changelog expansion in the scan) →
  * [[IvfChangelog.sink]] maintaining the at-rest IVF index — with a
  * checkpointed stop/restart mid-stream. The round-10 pieces existed
  * separately; this spec drives them as the full pipeline UX:
  *
  *   - final index parity vs a ONE-SHOT batch build of the net state
  *   - no dupes / no gaps across the restart (the file-prefix offset
  *     contract of [[graft.sources.ChangelogFileSource]] + the
  *     overwrite-idempotent batch dirs of [[IvfChangelog]])
  */
class CdcLoopSpec extends AnyFunSuite {
  import TestSpark._

  private def vecJson(v: Array[Double]): String =
    v.mkString("[", ",", "]")

  private def env(op: String, id: Long, before: Option[Array[Double]],
      after: Option[Array[Double]], ts: Long): String = {
    def img(o: Option[Array[Double]]) =
      o.map(v => s"""{"vec_id":$id,"v":${vecJson(v)}}""").getOrElse("null")
    s"""{"before":${img(before)},"after":${img(after)},"op":"$op","ts_ms":$ts,"source":{"db":"lake","table":"embeddings"}}"""
  }

  private def writeLines(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  test("end-to-end CDC loop: envelope files -> graft-debezium-json stream -> maintained IVF index, with a checkpointed restart mid-stream") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft_cdcloop_src")
    val root = Files.createTempDirectory("graft_cdcloop_idx").toString
    val modelDir = Files.createTempDirectory("graft_cdcloop_model").toString
    val ckpt = Files.createTempDirectory("graft_cdcloop_ckpt").toString
    val batchDir = Files.createTempDirectory("graft_cdcloop_batch").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
      val vecs: Map[Long, Array[Double]] = emb.as[(Long, Array[Double])]
        .collect().toMap
      def moved(v: Array[Double]): Array[Double] = v.map(-_)

      // the changelog: file 0 inserts everything; file 1 moves
      // vec_id % 7 == 1 (op u, before original / after negated) and
      // deletes vec_id % 7 == 2 (op d, before image); file 2 (written
      // AFTER the restart) re-inserts half the deleted keys
      val ids = vecs.keys.toSeq.sorted
      writeLines(srcDir, "00000.json",
        ids.map(id => env("c", id, None, Some(vecs(id)), ts = id)))
      writeLines(srcDir, "00001.json",
        ids.filter(_ % 7 == 1).map(id =>
          env("u", id, Some(vecs(id)), Some(moved(vecs(id))), ts = 100000 + id)) ++
        ids.filter(_ % 7 == 2).map(id =>
          env("d", id, Some(vecs(id)), None, ts = 100000 + id)))

      // ts_ms is the changelog's sequence: the file-prefix source can
      // deliver a key's insert AND its later update/delete in ONE
      // micro-batch (the whole backlog is one batch on a cold start),
      // so the sink must netize per key by seq — seqCol = ts_ms.
      def startPipeline() = spark.readStream
        .format("graft-debezium-json")
        .option("path", srcDir.toString)
        .option("rowSchema", "vec_id BIGINT, v ARRAY<DOUBLE>")
        .load()
        .select($"row_kind", $"row.vec_id".as("vec_id"), $"row.v".as("v"), $"ts_ms")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(IvfChangelog.sink(spark, root, modelDir, compactEvery = 2,
          seqCol = Some("ts_ms")))
        .start()

      val q1 = startPipeline()
      q1.processAllAvailable()
      q1.stop() // mid-stream shutdown: files 0-1 committed to the checkpoint

      // while the pipeline is DOWN, the upstream keeps producing
      writeLines(srcDir, "00002.json",
        ids.filter(_ % 14 == 2).map(id =>
          env("c", id, None, Some(vecs(id)), ts = 200000 + id)))

      val q2 = startPipeline() // restart from the checkpoint
      q2.processAllAvailable()
      q2.stop()

      // one-shot build of the NET state the changelog describes
      val finalState = emb.filter($"vec_id" % 7 =!= 1).filter($"vec_id" % 7 =!= 2)
        .unionByName(emb.filter($"vec_id" % 7 === 1)
          .select($"vec_id", expr("transform(v, x -> -x)").as("v")))
        .unionByName(emb.filter($"vec_id" % 14 === 2))
      IvfIndex.build(finalState, model, batchDir)

      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select($"query_id", $"neighbor_id", $"rnk")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = res(IvfChangelog.topK(spark, root, queries, modelDir, nprobe = 8, k = 5))
      val want = res(IvfIndex.topK(spark, batchDir, queries, model, nprobe = 8, k = 5))
      assert(got == want, "maintained index diverges from one-shot build after restart")
      assert(got.nonEmpty)

      // no dupes across the restart: global resolution holds exactly
      // one live row per surviving key, and the live count is the net
      // count (a replayed file would inflate neither, but a SKIPPED
      // file would show up as a gap in the live set)
      val bDirs = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("b=")).map(_.toString).toSeq
      val visible = bDirs.map(d => spark.read
          .schema("vec_id BIGINT, v ARRAY<DOUBLE>, code BINARY, ver BIGINT, del BOOLEAN, cell INT")
          .option("basePath", d).parquet(d))
        .reduce(_ unionByName _)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"vec_id").orderBy($"ver".desc, $"del".asc)
      val live = visible.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && !$"del")
      val expectedLive = ids.count(id => id % 7 != 1 && id % 7 != 2) +
        ids.count(_ % 7 == 1) + ids.count(_ % 14 == 2)
      assert(live.count() == expectedLive,
        s"live key count ${live.count()} != expected $expectedLive (dupe or gap across restart)")
    } finally Seq(srcDir.toString, root, modelDir, ckpt, batchDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
