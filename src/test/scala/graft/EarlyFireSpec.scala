package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Window emit strategies — Flink's `table.exec.emit.early-fire` /
  * `late-fire` mapped onto Spark's output modes over ONE windowed
  * aggregate (Pipelines.tumblingWindowCounts):
  *
  *  - UPDATE mode IS early-fire with delay = micro-batch cadence: an
  *    open window re-emits its current partial every batch that
  *    touches it — partials are monotone per (window, type) and the
  *    last emission equals the batch aggregate;
  *  - a late-but-in-watermark row triggers Flink's late-fire: one
  *    more UPDATE of an already-emitted pane;
  *  - APPEND mode is the no-early-fire default: exactly ONE emission
  *    per pane, at watermark close, equal to the batch aggregate.
  *
  * Same query, same state, same watermark — the strategy is the
  * sink's output mode, which is exactly Flink's emit-config claim
  * (emit strategy changes latency, never the aggregate).
  */
class EarlyFireSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(min: Long) = new Timestamp(86400000L + min * 60000L)

  private def run(mode: String, batches: Seq[Seq[(Timestamp, String, Double)]]): Seq[(Long, (Timestamp, String, Long))] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, (Timestamp, String, Long))]
    val q = graft.streaming.Pipelines.tumblingWindowCounts(
        in.toDF().toDF("ts", "event_type", "value"), "10 minutes", "5 minutes")
      .writeStream.outputMode(mode)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.select(col("w_start"), col("event_type"), col("n"))
          .collect().map(r => (id, (r.getTimestamp(0), r.getString(1), r.getLong(2))))
        buf.synchronized { buf ++= rows }
        ()
      }
      .queryName(s"early_fire_$mode").start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  private val batches = Seq(
    // window [0,10) opens: 2 clicks
    Seq((ts(1), "click", 1.0), (ts(2), "click", 1.0)),
    // more traffic in the SAME open window + a second window opens
    Seq((ts(3), "click", 1.0), (ts(12), "view", 1.0)),
    // late-but-in-watermark row for the first window (wm = 12−5 = 7)
    Seq((ts(6), "click", 1.0)),
    // sentinel far ahead: closes everything
    Seq((ts(500), "zz", 0.0)))

  test("update mode = early-fire: open windows re-emit monotone partials every touched batch; last emission == batch") {
    val out = run("update", batches)
    val w0 = out.filter(_._2._1 == ts(0)).filter(_._2._2 == "click")
    // the open window emitted a partial in EVERY batch that touched it
    assert(w0.map(_._1).distinct.size >= 3, s"expected >=3 early fires, got $w0")
    // partials are monotone and end at the true count
    val ns = w0.sortBy(_._1).map(_._2._3)
    assert(ns == ns.sorted, s"partials not monotone: $ns")
    assert(ns.last == 4L, s"final partial != batch count: $ns")
    // the late row's fire carries the corrected count (Flink late-fire)
    assert(ns.contains(3L) && ns.contains(4L), s"late-fire update missing: $ns")
  }

  test("append mode = no early fire: exactly one emission per pane, at close, equal to the update run's final") {
    val out = run("append", batches)
    val w0 = out.filter(_._2._1 == ts(0)).filter(_._2._2 == "click")
    assert(w0.size == 1, s"append must emit once per pane: $w0")
    assert(w0.head._2._3 == 4L)
    // and it fired only once the watermark closed the window (the
    // late row at batch 2 was still absorbable — emission is at or
    // after that batch)
    assert(w0.head._1 >= 2L, s"pane emitted before close: $w0")
  }
}
