package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BenchmarkShingles
import graft.streaming.ContaminationStream

/** Streaming contamination screening against the at-rest benchmark
  * guard: micro-batches over the corpus must reproduce batch q40's
  * overlap counts exactly, with clean docs surfacing as explicit
  * zero-verdict rows. */
class ContaminationStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("N micro-batches reproduce batch q40 overlaps; clean docs surface; replay changes nothing") {
    import spark.implicits._
    val guardDir = Files.createTempDirectory("graft_bench_guard").toString
    val root = Files.createTempDirectory("graft_cs").toString
    try {
      val docs = graft.sources.Tables.documents(spark, sfDir).select($"doc_id", $"text")
      // q40's benchmark subset, published once
      BenchmarkShingles.build(docs.filter($"doc_id" % 97 === 0), guardDir)

      val all = docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      (0 until 3).foreach { b =>
        val batch = all.filter(_._1 % 3 == b).toDF("doc_id", "text")
        ContaminationStream.processBatch(batch, b, root, guardDir)
      }

      val streamed = ContaminationStream.loadVerdicts(spark, root).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // every doc has an explicit verdict
      assert(streamed.size == all.size)

      // contaminated rows match batch q40 exactly
      val want = SparkEntry.queries("q40_contamination")(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      CachePool.drain()
      assert(streamed.collect { case (id, (n, _)) if n > 0 => id -> n } == want)
      assert(want.nonEmpty)
      // clean docs carry explicit zero verdicts, never missing rows
      val clean = streamed.collect { case (id, (0L, c)) => (id, c) }
      assert(clean.nonEmpty && clean.forall(!_._2))

      // replayed batch overwrites its own output, changing nothing
      ContaminationStream.processBatch(
        all.filter(_._1 % 3 == 1).toDF("doc_id", "text"), 1, root, guardDir)
      val again = ContaminationStream.loadVerdicts(spark, root).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(again == streamed)

      // guard rebuild is epoched: a second publish leaves the previous
      // epoch for in-flight readers
      BenchmarkShingles.build(docs.filter($"doc_id" % 97 === 0), guardDir)
      val dirs = new java.io.File(guardDir).listFiles().map(_.getName).filter(_.startsWith("sh-")).toSet
      assert(dirs == Set("sh-0", "sh-1"))
    } finally {
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(guardDir))
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(root))
    }
  }
}
