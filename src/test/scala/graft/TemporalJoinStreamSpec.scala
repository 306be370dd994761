package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins
import graft.streaming.TemporalJoinStream
import graft.streaming.TemporalJoinStream.Enriched

/** Streaming event-time temporal table join (Flink FOR SYSTEM_TIME AS
  * OF): hand-checkable semantics plus exact parity with the batch
  * asOf under adversarial interleaving across micro-batches. */
class TemporalJoinStreamSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(day: Int, hour: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-02-$day%02d $hour%02d:00:00")

  /** Drive facts/dims through temporalJoin in the given per-stream
    * batches, flush with two sentinel batches (watermark applies from
    * the NEXT batch; hold-timers fire the batch after that), and
    * return the enriched rows. Sentinels: a fact on dim-less key 999
    * (dropped by the inner join, emitted-as-None under leftOuter and
    * filtered here) and a dim on fact-less key 998 (never emitted). */
  private def run(name: String, factBatches: Seq[Seq[(Long, Timestamp, String)]],
      dimBatches: Seq[Seq[(Long, Timestamp, String)]],
      leftOuter: Boolean = false): Seq[Enriched] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val facts = MemoryStream[(Long, Timestamp, String)]
    val dims = MemoryStream[(Long, Timestamp, String)]
    val q = TemporalJoinStream.temporalJoin(
        facts.toDF().toDF("key", "ts", "payload"),
        dims.toDF().toDF("key", "ts", "value"),
        watermark = "60 days", leftOuter = leftOuter)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      factBatches.zipAll(dimBatches, Seq.empty, Seq.empty).foreach { case (fb, db) =>
        if (fb.nonEmpty) facts.addData(fb.toIndexedSeq)
        if (db.nonEmpty) dims.addData(db.toIndexedSeq)
        q.processAllAvailable()
      }
      Seq("2024-06-01", "2024-06-02").foreach { d =>
        facts.addData(Seq((999L, Timestamp.valueOf(s"$d 00:00:00"), "flush")))
        dims.addData(Seq((998L, Timestamp.valueOf(s"$d 00:00:00"), "flush")))
        q.processAllAvailable()
      }
      spark.table(name).as[Enriched].collect().toSeq.filterNot(_.key == 999L)
    } finally q.stop()
  }

  test("stream_temporal_join: latest version <= fact ts, inclusive bound, out-of-order delivery") {
    // key 1 versions: v1@d2, v2@d5, v3@d9 — delivered NEWEST FIRST and
    // a batch behind the facts that need them
    val out = run("tj_basic",
      factBatches = Seq(
        Seq((1L, ts(6), "f_d6"), (1L, ts(2), "f_d2")), // f_d2 joins at the v1 boundary (inclusive)
        Seq((1L, ts(1), "f_d1"), (1L, ts(12), "f_d12")),
        Seq.empty),
      dimBatches = Seq(
        Seq((1L, ts(9), "v3")),
        Seq((1L, ts(5), "v2")),
        Seq((1L, ts(2), "v1"))))
    val byPayload = out.map(e => e.payload -> e.dim_value).toMap
    assert(byPayload === Map(
      "f_d2" -> Some("v1"), // exactly at v1's effective time
      "f_d6" -> Some("v2"),
      "f_d12" -> Some("v3")))
    // f_d1 precedes every version: dropped by the inner join
    assert(!out.exists(_.payload == "f_d1"))
    assert(out.find(_.payload == "f_d6").get.dim_us === Some(ts(5).getTime * 1000L))
  }

  test("stream_temporal_join: leftOuter emits pre-first-version facts with a None dimension") {
    val out = run("tj_outer",
      factBatches = Seq(Seq((7L, ts(1), "early"), (7L, ts(4), "late"))),
      dimBatches = Seq(Seq((7L, ts(3), "v1"))),
      leftOuter = true)
    assert(out.map(e => e.payload -> e.dim_value).toMap ===
      Map("early" -> None, "late" -> Some("v1")))
  }

  test("stream_temporal_join: multi-batch shuffled replay == batch asOf (8 keys, interleaved histories)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // version timestamps unique per key (the asOf contract)
    val dims = (1L to 8L).flatMap { k =>
      rnd.shuffle((1 to 25).toList).take(3 + rnd.nextInt(3)).map(d => (k, ts(d), s"k${k}v$d"))
    }
    val facts = (1L to 8L).flatMap { k =>
      (0 until 6).map(i => (k, ts(1 + rnd.nextInt(27), hour = rnd.nextInt(24)), s"k${k}f$i"))
    }
    // deal both streams round-robin into 4 batches — nearly every
    // fact's matching version arrives in a DIFFERENT micro-batch
    def deal[T](xs: Seq[T]) = (0 until 4).map(i => xs.zipWithIndex.collect {
      case (x, j) if j % 4 == i => x
    }.toSeq)
    val streamed = run("tj_parity", deal(rnd.shuffle(facts.toList)), deal(rnd.shuffle(dims.toList)))
      .map(e => (e.key, e.us, e.payload, e.dim_value, e.dim_us)).toSet
    val batch = TemporalJoins.asOf(
        facts.toDF("key", "fts", "payload"),
        dims.toDF("key", "vts", "value"),
        key = "key", probeTs = "fts", versionTs = "vts", payload = Seq("value"))
      .filter($"value".isNotNull) // inner shape, like the stream default
      .as[(Long, Timestamp, String, String)].collect()
      .map { case (k, t, p, v) => (k, t.getTime * 1000L, p, Option(v), None) }
      .toSet
    // dim_us is extra information the batch asOf doesn't return — drop
    // it from the streamed side for the comparison
    val streamedCmp = streamed.map { case (k, us, p, v, _) => (k, us, p, v, None) }
    assert(streamedCmp === batch)
    // 48 facts, some legitimately pre-first-version: demand most join
    assert(batch.size >= 30, s"degenerate corpus: ${batch.size} joined rows")
  }
}
