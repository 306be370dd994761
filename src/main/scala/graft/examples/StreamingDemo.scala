package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.GraftSession
import graft.streaming.Pipelines
import graft.streaming.Pipelines.{Change, Event}

/** Runnable sample of the streaming surface (the library-user view of
  * the reference's MyCountTrigger and CDC-upsert jobs). `run-main
  * graft.examples.StreamingDemo` prints the emitted aggregates. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-streaming-demo", 4)
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // Count-trigger keyed window: 7 events, fire every 3 per key.
    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(in.toDS(), maxCount = 3).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_ct").start()
    in.addData((1 to 7).map(i => Event(i, new Timestamp(i * 60000L), 1, "click", i.toDouble)): _*)
    q.processAllAvailable(); q.stop()
    println("COUNT_TRIGGER_EMITS=" + spark.table("demo_ct").collect().mkString(";"))

    // Streaming session windows (gap 10 min, watermark 5 min).
    val sin = MemoryStream[Event]
    val sq = Pipelines.sessionWindowCounts(sin.toDF(), "10 minutes", "5 minutes").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_sw").start()
    sin.addData(
      Event(1, new Timestamp(60000L), 1, "click", 1.0),
      Event(2, new Timestamp(300000L), 1, "click", 2.0),
      Event(3, new Timestamp(1800000L), 1, "click", 4.0),
      Event(9, new Timestamp(7200000L), 9, "click", 0.0))
    sq.processAllAvailable(); sq.stop()
    println("SESSION_WINDOWS=" + spark.table("demo_sw").orderBy("s_start").collect().mkString(";"))

    // Streaming CDC upsert state.
    val cin = MemoryStream[Change]
    val cq = Pipelines.cdcUpsertStream(cin.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_up").start()
    cin.addData(Change(7, 10, "+I", 1.5), Change(7, 20, "+U", 2.5))
    cq.processAllAvailable(); cq.stop()
    println("UPSERT_STATE=" + spark.table("demo_up").orderBy("ts").collect().mkString(";"))

    spark.stop()
  }
}
