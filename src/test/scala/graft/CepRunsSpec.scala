package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CepRunsStream

/** Looping CEP pattern (anchor.oneOrMore().greedy() with a per-step
  * gap bound, q94 / stream_cep_runs): hand semantics for breakers,
  * gap splits, minLen, close-by-gap on dormant keys, a late row
  * SPLITTING a held run, and exact dealt-replay parity with batch
  * q94. */
class CepRunsSpec extends AnyFunSuite {
  import TestSpark._

  private def us(u: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(u, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(u, 1000000L) * 1000L).toInt)
    t
  }

  // rows: (user_id, event_id, ts, event_type)
  private type Ev = (Long, Long, Timestamp, String)

  private def start(name: String, in: MemoryStream[Ev], gap: java.time.Duration,
      minLen: Int, watermark: String = "10 minutes") = {
    CepRunsStream.runs(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "click", gap = gap, minLen = minLen, watermark = watermark)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
  }

  test("cep_runs: breakers end runs, gaps split them, minLen filters, equal-us anchors chain") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cepruns_hand", in, java.time.Duration.ofSeconds(10), minLen = 2)
    try {
      in.addData(Seq[Ev](
        // key 1: run of 3, broken by a view, then a lone click
        (1L, 10L, us(1000000L), "click"),
        (1L, 11L, us(2000000L), "click"),
        (1L, 12L, us(3000000L), "click"),
        (1L, 13L, us(4000000L), "view"),
        (1L, 14L, us(5000000L), "click"),
        // key 2: gap > 10s splits two runs of 2
        (2L, 20L, us(1000000L), "click"),
        (2L, 21L, us(2000000L), "click"),
        (2L, 22L, us(20000000L), "click"),
        (2L, 23L, us(21000000L), "click"),
        // key 3: equal-us clicks chain (gap 0), id order
        (3L, 30L, us(1000000L), "click"),
        (3L, 31L, us(1000000L), "click"),
        (3L, 32L, us(2000000L), "view")))
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((99L, 990L, Timestamp.valueOf(d), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("cepruns_hand")
        .select($"start_id", $"end_id", $"n", $"dur_us")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        (10L, 12L, 3L, 2000000L),
        (20L, 21L, 2L, 1000000L),
        (22L, 23L, 2L, 1000000L),
        (30L, 31L, 2L, 0L)))
    } finally q.stop()
  }

  test("cep_runs: close-by-gap — a dormant key's open run emits once the watermark passes last+gap, with no breaker ever arriving") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cepruns_gapclose", in, java.time.Duration.ofSeconds(10), minLen = 2)
    try {
      val t0 = 1000000000L
      in.addData(Seq[Ev](
        (1L, 10L, us(t0), "click"),
        (1L, 11L, us(t0 + 1000000L), "click")))
      q.processAllAvailable()
      assert(spark.table("cepruns_gapclose").count() === 0)
      // advance the watermark on an unrelated key past last+gap
      Seq(t0 + 700000000L, t0 + 720000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("cepruns_gapclose")
        .select($"key", $"start_id", $"end_id", $"n")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got === Set((1L, 10L, 11L, 2L)))
    } finally q.stop()
  }

  test("cep_runs: a late in-watermark breaker SPLITS a held run; a late anchor EXTENDS one") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = start("cepruns_late", in, java.time.Duration.ofHours(1), minLen = 2)
    try {
      val t0 = 1000000000L
      val m = 60000000L
      in.addData(Seq[Ev](
        // key 1: 3 clicks a minute apart — one run, still above wm
        (1L, 10L, us(t0), "click"),
        (1L, 11L, us(t0 + m), "click"),
        (1L, 12L, us(t0 + 2 * m), "click"),
        // key 2: two clicks 2 min apart
        (2L, 20L, us(t0), "click"),
        (2L, 21L, us(t0 + 2 * m), "click")))
      q.processAllAvailable()
      assert(spark.table("cepruns_late").count() === 0)
      in.addData(Seq[Ev](
        // key 1: late view between 11 and 12 splits the run
        (1L, 13L, us(t0 + m + 1000000L), "view"),
        // key 2: late click between 20 and 21 extends to a run of 3
        (2L, 22L, us(t0 + m), "click")))
      // advance wm past everything (gap 1h: need wm > last+gap)
      Seq(t0 + 7200000000L, t0 + 7300000000L).foreach { w =>
        in.addData(Seq[Ev]((99L, 990L, us(w), "view")))
      }
      q.processAllAvailable()
      val got = spark.table("cepruns_late")
        .select($"key", $"start_id", $"end_id", $"n")
        .as[(Long, Long, Long, Long)].collect().toSet
      // key 1: run 10-11 (the split's left half; 12 alone fails minLen)
      // key 2: run 20-22-21 = 3
      assert(got === Set((1L, 10L, 11L, 2L), (2L, 20L, 21L, 3L)))
    } finally q.stop()
  }

  test("cep_runs: dealt-out-of-order replay of the events table == batch q94") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
      .as[Ev].collect().toSeq
    val rnd = new scala.util.Random(94)
    val shuffled = rnd.shuffle(ev.toList)
    val batches = (0 until 4).map(i => shuffled.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    })
    val in = MemoryStream[Ev]
    val q = CepRunsStream.runs(
        in.toDF().toDF("user_id", "event_id", "ts", "event_type"),
        anchorType = "click", gap = java.time.Duration.ofDays(1),
        minLen = 2, watermark = "400 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("cepruns_parity").start()
    try {
      batches.foreach { b => in.addData(b.toIndexedSeq); q.processAllAvailable() }
      Seq("2030-01-01 00:00:00", "2030-01-02 00:00:00").foreach { d =>
        in.addData(Seq[Ev]((999999L, 0L, Timestamp.valueOf(d), "view")))
        q.processAllAvailable()
      }
      val streamed = spark.table("cepruns_parity").filter($"key" =!= 999999L)
        .select($"key", $"start_id", $"end_id", $"n", $"dur_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = SparkEntry.queries("q94_cep_times")(spark, sfDir)
        .select($"key", $"start_id", $"end_id", $"n", $"dur_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(batch.nonEmpty)
      assert(streamed === batch)
    } finally q.stop()
  }
}
