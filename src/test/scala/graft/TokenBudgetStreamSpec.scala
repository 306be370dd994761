package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TokenBudgetStream

/** Streaming token-budget admission: a dealt hash-order replay of the
  * documents table reproduces batch q117 row-for-row (including the
  * per-source cumulative), re-batching the same deal changes nothing,
  * and the budget boundary admits exactly the straddling document. */
class TokenBudgetStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def docsAndBudget() = {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source",
        graft.functions.TextFunctions.tokenCount($"text").cast("long").as("n_tokens"),
        md5($"doc_id".cast("string")).as("h"))
      .as[(Long, String, Long, String)].collect().toSeq
    val budget = docs.groupBy(_._2).map(_._2.map(_._3).sum).min
    (docs, budget)
  }

  private def run(batches: Seq[Seq[(Long, String, Long)]], budget: Long)
      : Vector[TokenBudgetStream.Admit] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[TokenBudgetStream.Admit]
    val q = TokenBudgetStream.admit(
        in.toDF().toDF("doc_id", "source", "n_tokens"), budget)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TokenBudgetStream.Admit], _: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(buf += _) }
        ()
      }
      .queryName("token_budget_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    buf.synchronized(buf.toVector)
  }

  test("dealt hash-order replay == batch q117, including src_cum") {
    import spark.implicits._
    val (docs, budget) = docsAndBudget()
    // global (h, doc_id) order: each source's subsequence is then in
    // its own hash order, which consecutive-slice batching preserves
    val dealt = docs.sortBy(d => (d._4, d._1)).map(d => (d._1, d._2, d._3))
    val batches = dealt.grouped((dealt.size + 3) / 4).toSeq
    val got = run(batches, budget)
      .map(a => (a.doc_id, a.source, a.n_tokens, a.src_cum)).toSet
    val want = SparkEntry.queries("q117_token_budget")(spark, sfDir)
      .select($"doc_id", $"source", $"n_tokens", $"src_cum")
      .as[(Long, String, Long, Long)].collect().toSet
    CachePool.drain()
    assert(got === want)
    assert(want.nonEmpty, "degenerate: q117 admitted nothing")
  }

  test("re-batching the same deal folds identically (defined intra-batch order)") {
    val (docs, budget) = docsAndBudget()
    val dealt = docs.sortBy(d => (d._4, d._1)).map(d => (d._1, d._2, d._3))
    val a = run(dealt.grouped((dealt.size + 1) / 2).toSeq, budget)
    val b = run(dealt.grouped(97).toSeq, budget)
    assert(a.toSet === b.toSet)
  }

  test("checkpoint restart: the per-source counter survives — exhausted budgets stay exhausted") {
    import java.nio.file.{Files => JFiles, Paths}
    import spark.implicits._
    val root = JFiles.createTempDirectory("graft_tb_ckpt")
    val srcDir = root.resolve("src"); JFiles.createDirectories(srcDir)
    val ckpt = root.resolve("ckpt").toString
    try {
      val budget = 100L
      // Token amounts chosen so every assertion below is independent
      // of HOW files coalesce into micro-batches (a restarted file
      // source may batch several files together, and the processor's
      // intra-batch (md5, id) order then reorders across files —
      // observed): phase 1 admits all four docs in ANY order (A:
      // 60+60 — the second is the straddler whichever it is; B:
      // 30+30 stays under); phase 2's A doc can only be admitted if
      // A's counter (120) was LOST, and exactly ONE of B's two
      // 50-token docs is admitted if B's counter (60) survived —
      // BOTH would be admitted from a reset counter.
      val files: Seq[Seq[(Long, String, Long)]] = Seq(
        Seq((1L, "A", 60L), (2L, "B", 30L)),
        Seq((3L, "A", 60L), (4L, "B", 30L)),
        Seq((5L, "A", 60L), (6L, "B", 50L)),
        Seq((7L, "A", 60L), (8L, "B", 50L)))
      def writeFile(i: Int): Unit = JFiles.write(srcDir.resolve(f"$i%05d.json"),
        files(i).map { case (d, s, t) =>
          s"""{"doc_id":$d,"source":"$s","n_tokens":$t}""" }
          .mkString("\n").getBytes("UTF-8"))

      val buf = scala.collection.mutable.ArrayBuffer.empty[TokenBudgetStream.Admit]
      def runPhase(): Unit = {
        val in = spark.readStream
          .schema("doc_id BIGINT, source STRING, n_tokens BIGINT")
          .option("maxFilesPerTrigger", 1)
          .json(srcDir.toString)
        val q = TokenBudgetStream.admit(in, budget)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.Dataset[TokenBudgetStream.Admit], _: Long) =>
            val rows = df.collect()
            buf.synchronized { rows.foreach(buf += _) }
            ()
          }
          .queryName("token_budget_restart").start()
        try q.processAllAvailable() finally q.stop()
      }

      (0 to 1).foreach(writeFile); runPhase()      // phase 1: files 0-1
      val phase1 = buf.synchronized(buf.toVector)
      (2 to 3).foreach(writeFile); runPhase()      // restart: files 2-3
      val got = buf.synchronized(buf.toVector)
      val phase2 = got.drop(phase1.size)

      // phase 1: all four docs admitted in any order (A's second doc
      // straddles from 60 < 100; B never crosses)
      assert(phase1.map(_.doc_id).toSet === Set(1L, 2L, 3L, 4L))
      // A exhausted at 120: a phase-2 A admission means the counter
      // was lost on restart
      assert(!phase2.exists(_.source == "A"),
        s"source A admitted after exhausting its budget — counter lost on restart: $phase2")
      // B survived at 60: exactly ONE of the two 50-token docs starts
      // below 100 whichever is processed first; a reset counter (0)
      // would admit BOTH
      val bDocs = phase2.filter(_.source == "B").map(_.doc_id).toSet
      assert(bDocs.size === 1 && bDocs.subsetOf(Set(6L, 8L)),
        s"B's restart counter drifted: admitted $bDocs (one of 6/8 expected)")
      // admitted cum values respect the boundary law across the
      // whole run: every admission STARTED below the budget
      assert(got.forall(a => a.src_cum - a.n_tokens < budget))
    } finally graft.tools.FileUtil.deleteTree(root)
  }

  test("budget boundary: the straddler is admitted, nothing after it") {
    val (docs, budget) = docsAndBudget()
    val dealt = docs.sortBy(d => (d._4, d._1)).map(d => (d._1, d._2, d._3))
    val got = run(Seq(dealt), budget)
    // exactness: no admitted doc STARTED at/past the budget
    assert(got.forall(a => a.src_cum - a.n_tokens < budget))
    // the boundary rule admits the straddling doc: at least one
    // admitted row ENDS past the budget (sources whose totals exceed
    // the min-source budget mid-document exist in this corpus)
    assert(got.exists(a => a.src_cum > budget),
      "no straddling admission — boundary rule untested by this corpus")
  }
}
