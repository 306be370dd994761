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
