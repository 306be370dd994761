package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopNRetractStream
import graft.streaming.TopNRetractStream.{ScoredRow, TopNDelta}

/** Continuous Top-N with retractions: hand membership-changelog
  * semantics (entry, eviction, ties, duplicate-id idempotence) and
  * randomized multi-batch parity — the materialized membership equals
  * the batch row_number top-N under any deal. */
class TopNRetractSpec extends AnyFunSuite {
  import TestSpark._

  private def run(name: String, n: Int, batches: Seq[Seq[ScoredRow]]): Seq[(Long, TopNDelta)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[ScoredRow]
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, TopNDelta)]
    val q = TopNRetractStream.topN(in.toDS(), n)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TopNDelta], id: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(r => buf += ((id, r))) }
      }
      .queryName(name).start()
    try {
      batches.foreach { b => if (b.nonEmpty) in.addData(b: _*); q.processAllAvailable() }
      buf.synchronized(buf.toVector)
    } finally q.stop()
  }

  private def materialize(deltas: Seq[(Long, TopNDelta)]): Map[String, Set[Long]] =
    deltas.zipWithIndex
      .groupBy { case ((_, d), _) => (d.grp, d.id) }
      .toSeq
      .collect { case ((g, id), ds) if ds.maxBy { case ((b, _), i) => (b, i) }._1._2.op == "+I" => (g, id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }

  test("topn retract: entries and evictions across batches; ties break by id; duplicate ids keep best score") {
    val out = run("tnr_hand", 2, Seq(
      // batch 0: two rows fill the top-2
      Seq(ScoredRow("a", 1L, 10.0), ScoredRow("a", 2L, 5.0)),
      // batch 1: a better row evicts the weakest
      Seq(ScoredRow("a", 3L, 7.0)),
      // batch 2: below the current 2nd -> no traffic at all
      Seq(ScoredRow("a", 4L, 6.0)),
      // batch 3: tie with id 3 at 7.0 -> id asc wins, no change
      Seq(ScoredRow("a", 5L, 7.0)),
      // batch 4: duplicate id 1 with a WORSE score -> ignored
      Seq(ScoredRow("a", 1L, 1.0)),
      // batch 5: other group is isolated
      Seq(ScoredRow("b", 9L, 1.0))))
    val byBatch = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byBatch(0L) === Set(
      TopNDelta("+I", "a", 1L, 10.0), TopNDelta("+I", "a", 2L, 5.0)))
    assert(byBatch(1L) === Set(
      TopNDelta("+I", "a", 3L, 7.0), TopNDelta("-D", "a", 2L, 5.0)))
    assert(byBatch.getOrElse(2L, Set.empty) === Set.empty[TopNDelta])
    assert(byBatch.getOrElse(3L, Set.empty) === Set.empty[TopNDelta])
    assert(byBatch.getOrElse(4L, Set.empty) === Set.empty[TopNDelta])
    assert(byBatch(5L) === Set(TopNDelta("+I", "b", 9L, 1.0)))
    assert(materialize(out) === Map("a" -> Set(1L, 3L), "b" -> Set(9L)))
  }

  test("topn retract: randomized dealt replay materializes to the batch row_number top-N") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val rows = (0 until 500).map { i =>
      ScoredRow(s"g${i % 7}", i.toLong, (rnd.nextInt(10000) / 10.0))
    }
    val batches = {
      val shuffled = rnd.shuffle(rows.toList)
      (0 until 5).map(i => shuffled.zipWithIndex.collect {
        case (x, j) if j % 5 == i => x
      })
    }
    val deltas = run("tnr_parity", 3, batches)
    val expected = rows.toDS()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"grp")
          .orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 3)
      .select($"grp", $"id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    assert(materialize(deltas) === expected)
    // well-formed membership changelog per (grp, id): alternating +I/-D
    deltas.map(_._2).groupBy(d => (d.grp, d.id)).foreach { case (k, ds) =>
      var in = false
      ds.foreach { d =>
        d.op match {
          case "+I" => assert(!in, s"$k: double insert"); in = true
          case "-D" => assert(in, s"$k: delete while absent"); in = false
          case other => fail(s"$k: unexpected op $other")
        }
      }
    }
  }

  test("topn retract idle TTL (event-time): expiry drops the dormant group, a straggler re-opens it empty; armed-but-unexpired survives") {
    import spark.implicits._
    import java.time.Duration
    implicit val ctx = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // the OverAggSpec TTL pattern: "a" fills its top-2 at ts
    // 1000-1001 s, sentinel "b" rows push the watermark (maxTs − 10
    // min) past lastSeen + ttl and let the timer fire, then a LOW
    // straggler for "a" arrives — live state rejects it, dropped
    // state re-opens empty and admits it
    val batches: Seq[Seq[(String, Long, Double, java.sql.Timestamp)]] = Seq(
      Seq(("a", 1L, 10.0, ts(1000)), ("a", 2L, 5.0, ts(1001))),
      Seq(("b", 7L, 1.0, ts(10000))), // wm → 9400 s
      Seq(("b", 8L, 1.0, ts(10001))), // a's expired timer fires here
      Seq(("a", 3L, 0.5, ts(20000))))
    def drive(name: String, ttl: Duration): Seq[(Long, TopNDelta)] = {
      val in = MemoryStream[(String, Long, Double, java.sql.Timestamp)]
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, TopNDelta)]
      val q = TopNRetractStream.topNIdle(
          in.toDF().toDF("grp", "id", "score", "ts").withWatermark("ts", "10 minutes"),
          n = 2, idleTtl = ttl)
        .writeStream.outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[TopNDelta], id: Long) =>
          val rows = df.collect()
          buf.synchronized { rows.foreach(r => buf += ((id, r))) }
        }
        .queryName(name).start()
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
        buf.synchronized(buf.toVector)
      } finally q.stop()
    }
    val dropped = drive("tnr_ttl_drop", Duration.ofHours(1))
    assert(dropped.exists { case (_, d) => d.grp == "a" && d.op == "+I" && d.id == 3L },
      s"dropped state must re-open empty and admit id 3: $dropped")
    val kept = drive("tnr_ttl_keep", Duration.ofHours(10))
    assert(!kept.exists { case (_, d) => d.id == 3L },
      s"live state must reject id 3: $kept")
    assert(materialize(kept).getOrElse("a", Set.empty) === Set(1L, 2L))
  }
}
