package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Pipelines

/** Multi-source watermark alignment (stream_union_watermark — Flink's
  * min-over-inputs rule and its idle-source hazard): under the default
  * `min` policy a lagging source holds EVERY window open (nothing
  * lost, nothing timely); under `max` the fastest source drives
  * finalization and the laggard's rows are dropped late — the exact
  * row lost is accounted for. */
class UnionWatermarkSpec extends AnyFunSuite {
  import TestSpark._

  private def sec(n: Long): Timestamp = new Timestamp(n * 1000L)
  private val Policy = "spark.sql.streaming.multipleWatermarkPolicy"

  private def run(policy: String, name: String): Map[Timestamp, Long] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val before = spark.conf.getOption(Policy)
    spark.conf.set(Policy, policy)
    try {
      val a = MemoryStream[Timestamp]
      val b = MemoryStream[Timestamp]
      val q = Pipelines.unionWindowCounts(
          Seq(a.toDF().toDF("ts"), b.toDF().toDF("ts")),
          windowLen = "10 seconds", watermark = "1 second")
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // b1: A races ahead to 100 s; B sits at 9 s
        a.addData(sec(9), sec(100)); b.addData(sec(9))
        q.processAllAvailable()
        val afterB1 = spark.table(name).count()
        // min: wm = min(99, 8) = 8 → NOTHING finalized (A's lead is
        // hostage to B — the idle-source stall, asserted)
        // max: wm = 99 → [0,10) closes NOW
        if (policy == "min") assert(afterB1 === 0L, "min policy must hold every window open")
        else assert(afterB1 === 1L, "max policy must finalize against the fastest source")

        // b2: B's row at 50 s — on-time under min (wm 8), LATE under
        // max (wm 99 → silently dropped by the aggregate)
        b.addData(sec(50))
        q.processAllAvailable()
        // b3: B catches up far ahead → everything still open finalizes
        b.addData(sec(200)); a.addData(sec(200))
        q.processAllAvailable()
        spark.table(name)
          .select($"w_start", $"n").as[(Timestamp, Long)]
          .collect().toMap
      } finally q.stop()
    } finally {
      before match {
        case Some(v) => spark.conf.set(Policy, v)
        case None => spark.conf.unset(Policy)
      }
    }
  }

  test("min policy (Flink's rule): lagging source stalls output; nothing is ever lost") {
    val got = run("min", "uwm_min")
    assert(got === Map(
      sec(0) -> 2L,   // A@9 + B@9
      sec(50) -> 1L,  // B@50 — arrived while its window was still open
      sec(100) -> 1L))
  }

  test("max policy: bounded latency, and the laggard's row is DROPPED — the documented trade") {
    val got = run("max", "uwm_max")
    assert(got === Map(
      sec(0) -> 2L,
      // NO sec(50) row: B@50 arrived behind the max watermark and was
      // dropped late — the window finalizes empty and emits nothing
      sec(100) -> 1L))
  }
}
