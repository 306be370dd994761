package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic bottom-k sampling (the order-free streaming
  * reservoir): a dealt replay of the documents table in any order
  * materializes to exactly the batch q110 sample, with a well-formed
  * membership changelog. */
class BottomKSampleSpec extends AnyFunSuite {
  import TestSpark._

  test("bottom-k sample stream: dealt replay membership == batch q110; displacements well-formed") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"source")
      .as[(Long, String)].collect().toSeq
    val shuffled = new scala.util.Random(61).shuffle(docs.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[(Long, String)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, graft.streaming.TopNRetractStream.TopNDelta)]
    val q = graft.streaming.Pipelines.streamingBottomKSample(
        in.toDF().toDF("doc_id", "source"), k = 25)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.TopNRetractStream.TopNDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
        ()
      }
      .queryName("bottomk_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()
    val deltas = buf.synchronized(buf.toVector)
    // membership grammar: per (grp, id) alternating +I/-D starting live
    deltas.map(_._2).groupBy(d => (d.grp, d.id)).foreach { case (key, ds) =>
      var live = false
      ds.foreach { d =>
        d.op match {
          case "+I" => assert(!live, s"$key: +I while live"); live = true
          case "-D" => assert(live, s"$key: -D while dead"); live = false
          case other => fail(s"$key: unexpected op $other")
        }
      }
    }
    // final membership == batch q110 sample
    val live = deltas.zipWithIndex
      .groupBy { case ((_, d), _) => (d.grp, d.id) }.toSeq
      .collect { case ((g, id), ds)
        if ds.maxBy { case ((b, _), i) => (b, i) }._1._2.op == "+I" => (g, id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val expected = SparkEntry.queries("q110_bottomk_sample")(spark, sfDir)
      .select($"source", $"doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    CachePool.drain()
    assert(live === expected)
    assert(expected.values.map(_.size).sum >= 50, s"degenerate sample: $expected")
  }
}
