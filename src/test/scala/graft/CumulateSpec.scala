package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** CUMULATE window TVF (q100 / stream_cumulate — Flink's fourth
  * window TVF): hand prefix semantics (an early row appears in every
  * later window of its day; later buckets extend the running total),
  * copy-loss-free watermarking, and dealt-replay parity with batch
  * q100 over the events table. */
class CumulateSpec extends AnyFunSuite {
  import TestSpark._

  private val HourUs = 3600000000L
  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (ts, value)
  private type Ev = (Timestamp, Double)

  test("cumulate: hand prefix semantics — growing windows carry the running total") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    // step 1h, size 4h → windows end at +1h, +2h, +3h, +4h per 4h-day
    val q = Pipelines.cumulateWindowCounts(
        in.toDF().toDF("ts", "value"),
        stepUs = HourUs, sizeUs = 4L * HourUs, lateUs = 0L)
      .writeStream.outputMode("append")
      .format("memory").queryName("cumulate_hand").start()
    try {
      in.addData(Seq[Ev](
        (us(10L * 60L * 1000000L), 1.0), // 00:10 → windows 1,2,3,4
        (us(70L * 60L * 1000000L), 2.0), // 01:10 → windows 2,3,4
        (us(200L * 60L * 1000000L), 4.0))) // 03:20 → window 4 only
      q.processAllAvailable()
      // close everything
      in.addData(Seq[Ev]((Timestamp.valueOf("2030-01-01 00:00:00"), 0.0)))
      q.processAllAvailable()
      in.addData(Seq[Ev]((Timestamp.valueOf("2030-01-02 00:00:00"), 0.0)))
      q.processAllAvailable()
      val got = spark.table("cumulate_hand")
        .filter($"w_start" < Timestamp.valueOf("2029-01-01 00:00:00"))
        .select(org.apache.spark.sql.functions.unix_micros($"w_end"), $"n", $"cents")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === Set(
        (1L * HourUs, 1L, 100L),  // [0,1h): first row only
        (2L * HourUs, 2L, 300L),  // [0,2h): + second
        (3L * HourUs, 2L, 300L),  // [0,3h): bucket 3 empty, prefix carries
        (4L * HourUs, 3L, 700L))) // [0,4h): the full day
    } finally q.stop()
  }

  test("cumulate: dealt replay of the events table == batch q100") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"ts", $"value").as[Ev].collect().toSeq
    val rnd = new scala.util.Random(100)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = Pipelines.cumulateWindowCounts(
        in.toDF().toDF("ts", "value"),
        stepUs = 6L * HourUs, sizeUs = 24L * HourUs,
        lateUs = 400L * 24L * HourUs) // out-of-orderness budget covers the deal
      .writeStream.outputMode("append")
      .format("memory").queryName("cumulate_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      // sentinels push the te-watermark past every real window
      Seq("2033-01-01 00:00:00", "2034-01-01 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((Timestamp.valueOf(d), 0.0)))
        q.processAllAvailable()
      }
      val streamed = spark.table("cumulate_parity")
        .filter($"w_start" < Timestamp.valueOf("2032-01-01 00:00:00"))
        .select($"w_start", $"w_end", $"n", $"cents")
        .as[(Timestamp, Timestamp, Long, Long)].collect().toSet
      val batch = SparkEntry.queries("q100_cumulate_window")(spark, sfDir)
        .select($"w_start", $"w_end", $"n", $"cents")
        .as[(Timestamp, Timestamp, Long, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
