package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming windowed aggregation with GROUPING SETS (the q108
  * union-of-aggregates composition): both sets finalize on the same
  * watermark, the grouped-out dimension is NULL exactly as in batch,
  * and a dealt replay of the events table equals the batch grouping
  * sets bit-for-bit on both sets. */
class WindowGsetsSpec extends AnyFunSuite {
  import TestSpark._

  test("window grouping sets stream: dealt replay == batch sets {(w, type), (w)}") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"ts", $"event_type", $"value")
      .as[(Timestamp, String, Double)].collect().toSeq
    val rnd = new scala.util.Random(53)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 3).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 3 == i => x
    })
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = graft.streaming.Pipelines.streamingWindowGsets(
        in.toDF().toDF("ts", "event_type", "value"), watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("gsets_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      // two sentinel advances flush both chained aggregates
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00", "2031-01-03 00:00:00").foreach { d =>
        in.addData(Seq((Timestamp.valueOf(d), "zz", 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("gsets_parity")
        .filter($"w_start" < Timestamp.valueOf("2030-01-01 00:00:00"))
        .select($"w_start", $"event_type", $"n", $"cents")
        .collect().map(r => (r.getTimestamp(0), if (r.isNullAt(1)) "∅" else r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val batch = graft.sources.Tables.events(spark, sfDir)
        .withColumn("w_start", date_trunc("hour", $"ts"))
        .groupingSets(Seq(Seq($"w_start", $"event_type"), Seq($"w_start")),
          $"w_start", $"event_type")
        .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("cents"))
        .collect().map(r => (r.getTimestamp(0), if (r.isNullAt(1)) "∅" else r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      CachePool.drain()
      assert(streamed.nonEmpty)
      assert(streamed === batch)
      // both sets actually present
      assert(streamed.exists(_._2 == "∅") && streamed.exists(_._2 != "∅"))
    } finally q.stop()
  }
}
