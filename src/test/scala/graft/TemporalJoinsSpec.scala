package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalJoins

/** AS-OF and interval joins: semantics vs the naive (inequality-join)
  * definitions, plan shape (no nested-loop join), and edge cases. */
class TemporalJoinsSpec extends AnyFunSuite {
  import TestSpark._

  test("asOf matches the naive latest-version-at-or-before definition, including pre-history NULLs and exact-ts ties") {
    import spark.implicits._
    val versions = Seq(
      (1L, 100L, Some(10L)), (1L, 200L, Some(20L)), (1L, 300L, Some(30L)),
      (1L, 400L, None), // a CDC update setting the column to NULL
      (2L, 150L, Some(99L))).toDF("k", "vt", "payload")
      .select($"k", expr("timestamp_micros(vt)").as("eff"), $"payload")
    val probes = Seq(
      (1L, 50L), (1L, 100L), (1L, 250L), (1L, 300L), (1L, 399L), (1L, 999L),
      (2L, 149L), (2L, 150L), (3L, 500L)).toDF("k", "pt")
      .select($"k", expr("timestamp_micros(pt)").as("at"), $"pt")
    val out = TemporalJoins.asOf(probes, versions, "k", "at", "eff", Seq("payload"))
      .select($"k", $"pt", $"payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out == Set(
      (1L, 50L, -1L),   // before first version
      (1L, 100L, 10L),  // tie: version at probe ts applies
      (1L, 250L, 20L),
      (1L, 300L, 30L),
      (1L, 399L, 30L),
      (1L, 999L, -1L),  // the NULL-payload version WINS (not skipped back to 30)
      (2L, 149L, -1L),
      (2L, 150L, 99L),
      (3L, 500L, -1L))) // key with no history at all
  }

  test("interval join equals the naive inequality join on events and plans no nested-loop join") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id", $"ts".as("e_ts"))
    // 2h band at the tiny SF so the pair set is non-trivial
    val band = 7200000000L
    val out = TemporalJoins.interval(clicks, errors, "user_id", "c_ts", "e_ts", 0L, band)
    val got = out.select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = clicks.join(errors, Seq("user_id"))
      .filter(unix_micros($"e_ts") >= unix_micros($"c_ts") &&
        unix_micros($"e_ts") <= unix_micros($"c_ts") + band)
      .select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.nonEmpty)
    // each qualifying pair appears exactly once (right rows live in one bucket)
    assert(out.count() == got.size)
    // the whole point: an equi-join plan, not BroadcastNestedLoopJoin
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("interval join LEFT mode: every left row emits, unmatched pads exactly once, matched pairs identical to inner") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id", $"ts".as("e_ts"))
    val band = 7200000000L
    val out = TemporalJoins.interval(clicks, errors, "user_id", "c_ts", "e_ts",
      0L, band, joinType = "left")
    val rows = out.select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val inner = TemporalJoins.interval(clicks, errors, "user_id", "c_ts", "e_ts", 0L, band)
      .select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // matched pairs = exactly the inner set, each exactly once
    val matched = rows.filter(_._2 >= 0L)
    assert(matched.toSet == inner && matched.length == inner.size)
    // unmatched clicks pad exactly once (never twice across the
    // bucket pair — the left side lives in ONE bucket)
    val pads = rows.filter(_._2 == -1L).map(_._1)
    assert(pads.toSet.size == pads.length, "a pad row emitted twice")
    val matchedIds = matched.map(_._1).toSet
    assert(pads.toSet.intersect(matchedIds).isEmpty, "a matched click also padded")
    // every click emits at least once
    assert(pads.toSet ++ matchedIds == clicks.select($"click_id").as[Long].collect().toSet)
    assert(pads.nonEmpty && matched.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("streaming interval join leftOuter: the pad holds while the band could still match and emits once the watermark closes it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    val cIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val eIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = graft.streaming.Pipelines.streamingIntervalJoin(
      cIn.toDF().toDF("click_id", "user_id", "c_ts"),
      eIn.toDF().toDF("error_id", "user_id", "e_ts"),
      key = "user_id", leftTs = "c_ts", rightTs = "e_ts",
      band = "10 minutes", watermark = "0 seconds", joinType = "leftOuter")
    val q = joined.select($"click_id", $"error_id")
      .writeStream.format("memory").queryName("t_sij_left").start()
    try {
      // u1's click matches; u2's click has no error in band
      cIn.addData((100L, 1L, ts(0)), (102L, 2L, ts(0)))
      eIn.addData((200L, 1L, ts(3)))
      q.processAllAvailable()
      val early = spark.table("t_sij_left").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // the match may emit immediately; the PAD must NOT — u2's band
      // is still open (watermark is at ts(3), band closes at ts(10))
      assert(!early.contains((102L, -1L)), s"pad emitted while band open: $early")
      // advance the watermark far past the band on both inputs
      cIn.addData((999L, 9L, ts(1000)))
      eIn.addData((998L, 9L, ts(1000)))
      q.processAllAvailable()
      cIn.addData((997L, 9L, ts(2000)))
      eIn.addData((996L, 9L, ts(2000)))
      q.processAllAvailable()
      val got = spark.table("t_sij_left")
        .filter($"click_id" < 900L)
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == Set((100L, 200L), (102L, -1L)))
      // parity with the batch left operator on the same corpus
      val batch = TemporalJoins.interval(
          Seq((100L, 1L, ts(0)), (102L, 2L, ts(0))).toDF("click_id", "user_id", "c_ts"),
          Seq((200L, 1L, ts(3))).toDF("error_id", "user_id", "e_ts"),
          "user_id", "c_ts", "e_ts", 0L, 600000000L, joinType = "left")
        .select($"click_id", $"error_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("interval join FULL mode: matched pairs == inner, both pad kinds exactly once, every row on both sides accounted") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id", $"ts".as("e_ts"))
    val band = 7200000000L
    val out = TemporalJoins.intervalFull(clicks, errors, "user_id",
      "click_id", "error_id", "c_ts", "e_ts", 0L, band)
    val rows = out.select($"click_id", $"error_id").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1)))
    val inner = TemporalJoins.interval(clicks, errors, "user_id", "c_ts", "e_ts", 0L, band)
      .select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val matched = rows.filter(p => p._1 >= 0L && p._2 >= 0L)
    assert(matched.toSet == inner && matched.length == inner.size)
    val lPads = rows.filter(p => p._2 == -1L).map(_._1)
    val rPads = rows.filter(p => p._1 == -1L).map(_._2)
    assert(lPads.toSet.size == lPads.length && rPads.toSet.size == rPads.length,
      "a pad emitted twice")
    assert(lPads.toSet.intersect(matched.map(_._1).toSet).isEmpty)
    assert(rPads.toSet.intersect(matched.map(_._2).toSet).isEmpty)
    assert(lPads.toSet ++ matched.map(_._1) ==
      clicks.select($"click_id").as[Long].collect().toSet)
    assert(rPads.toSet ++ matched.map(_._2) ==
      errors.select($"error_id").as[Long].collect().toSet)
    assert(lPads.nonEmpty && rPads.nonEmpty && matched.nonEmpty)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"non-equi join in plan:\n$plan")
  }

  test("streaming interval join fullOuter: both pad kinds emit at watermark close and match the batch full operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    val cIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val eIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = graft.streaming.Pipelines.streamingIntervalJoin(
      cIn.toDF().toDF("click_id", "user_id", "c_ts"),
      eIn.toDF().toDF("error_id", "user_id", "e_ts"),
      key = "user_id", leftTs = "c_ts", rightTs = "e_ts",
      band = "10 minutes", watermark = "0 seconds", joinType = "fullOuter")
    val q = joined.select($"click_id", $"error_id")
      .writeStream.format("memory").queryName("t_sij_full").start()
    try {
      // u1 matches; u2's click matchless; u3's error matchless
      cIn.addData((100L, 1L, ts(0)), (102L, 2L, ts(0)))
      eIn.addData((200L, 1L, ts(3)), (203L, 3L, ts(4)))
      q.processAllAvailable()
      Seq(1500L, 3000L).foreach { m =>
        cIn.addData((990L, 9L, ts(m))); eIn.addData((991L, 9L, ts(m)))
        q.processAllAvailable()
      }
      val got = spark.table("t_sij_full")
        .filter(coalesce($"click_id", lit(0L)) < 900L && coalesce($"error_id", lit(0L)) < 900L)
        .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == Set((100L, 200L), (102L, -1L), (-1L, 203L)))
      val batch = TemporalJoins.intervalFull(
          Seq((100L, 1L, ts(0)), (102L, 2L, ts(0))).toDF("click_id", "user_id", "c_ts"),
          Seq((200L, 1L, ts(3)), (203L, 3L, ts(4))).toDF("error_id", "user_id", "e_ts"),
          "user_id", "click_id", "error_id", "c_ts", "e_ts", 0L, 600000000L)
        .select($"click_id", $"error_id")
        .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("asOf equals the naive inequality-join definition on the orders/history corpus") {
    import spark.implicits._
    val versions = graft.sources.Tables.customer(spark, sfDir)
      .select($"c_custkey", explode(sequence(lit(0), lit(2))).as("v"))
      .select($"c_custkey".as("custkey"),
        expr("timestampadd(DAY, cast(c_custkey % 500 + v * 800 as int), timestamp '1995-01-01')").as("eff"),
        (($"c_custkey" * 31 + $"v" * 17) % 1000).cast("long").as("credit_limit"))
    val probes = graft.sources.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey".as("custkey"), $"o_orderdate")
    val got = TemporalJoins.asOf(probes, versions, "custkey", "o_orderdate", "eff", Seq("credit_limit"))
      .select($"o_orderkey", $"credit_limit")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // naive: per probe, the max-eff qualifying version; probes with no
    // qualifying version (pre-history) must survive with NULL
    val best = probes.join(versions, Seq("custkey"))
      .filter($"eff" <= $"o_orderdate")
      .groupBy($"o_orderkey").agg(max(struct($"eff", $"credit_limit")).as("b"))
      .select($"o_orderkey", $"b.credit_limit".as("credit_limit"))
    val naive = probes.select($"o_orderkey").join(best, Seq("o_orderkey"), "left")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(got.nonEmpty && got == naive)
    // both NULL (pre-history) and non-NULL probes present
    assert(got.exists(_._2 == -1L) && got.exists(_._2 >= 0L))
  }

  test("streaming interval join (native stream-stream join) matches the batch operator") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // offset from the epoch: the initial watermark is 0, and Spark's
    // late-row filter drops input with event time <= watermark — a
    // row stamped exactly 1970-01-01T00:00:00 is "late" at birth
    def ts(min: Long) = new java.sql.Timestamp(86400000L + min * 60000L)
    val clickRows = Seq((100L, 1L, ts(0)), (101L, 1L, ts(5)), (102L, 2L, ts(0)))
    val errorRows = Seq((200L, 1L, ts(3)), (201L, 1L, ts(12)), (202L, 1L, ts(50)), (203L, 2L, ts(11)))

    val cIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val eIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = graft.streaming.Pipelines.streamingIntervalJoin(
      cIn.toDF().toDF("click_id", "user_id", "c_ts"),
      eIn.toDF().toDF("error_id", "user_id", "e_ts"),
      key = "user_id", leftTs = "c_ts", rightTs = "e_ts",
      band = "10 minutes", watermark = "0 seconds")
    val q = joined.select($"click_id", $"error_id")
      .writeStream.format("memory").queryName("t_sij").start()
    try {
      cIn.addData(clickRows: _*)
      eIn.addData(errorRows: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_sij").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val batch = graft.operators.TemporalJoins.interval(
        clickRows.toDF("click_id", "user_id", "c_ts"),
        errorRows.toDF("error_id", "user_id", "e_ts"),
        "user_id", "c_ts", "e_ts", 0L, 600000000L)
      .select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    // click@0/u1 ↔ error@3 (3min); click@5/u1 ↔ error@12 (7min);
    // error@12 is outside click@0's band, error@11/u2 outside click@0/u2's
    assert(streamed == Set((100L, 200L), (101L, 201L)))
  }

  test("asOf runs as one shuffle on the key: no join operator at all in the plan") {
    import spark.implicits._
    val versions = spark.range(1000).select(
      ($"id" % 100).as("k"), expr("timestamp_micros(id * 1000)").as("eff"), $"id".as("payload"))
    val probes = spark.range(500).select(
      ($"id" % 100).as("k"), expr("timestamp_micros(id * 1700)").as("at"))
    val out = TemporalJoins.asOf(probes, versions, "k", "at", "eff", Seq("payload"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asOf must be union+window, found a join:\n$plan")
    assert(out.count() == 500)
  }

  test("pure-SQL asOf over registered views: q50 semantics via spark.sql only, same rows, same join-free plan") {
    import spark.implicits._
    // the q50 shape end-to-end through the catalog: orders probe the
    // synthesized credit-limit history (the reference declares this as
    // Flink DDL + FOR SYSTEM_TIME AS OF; here it is two temp views +
    // the generated Spark SQL)
    graft.sources.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey".as("custkey"), $"o_orderdate")
      .createOrReplaceTempView("t_asof_probe")
    graft.sources.Tables.customer(spark, sfDir)
      .select($"c_custkey", explode(sequence(lit(0), lit(2))).as("v"))
      .select($"c_custkey".as("custkey"),
        expr("timestampadd(DAY, cast(c_custkey % 500 + v * 800 as int), timestamp '1995-01-01')").as("eff"),
        (($"c_custkey" * 31 + $"v" * 17) % 1000).cast("long").as("credit_limit"))
      .createOrReplaceTempView("t_asof_versions")
    val sqlText = TemporalJoins.Sql.asOf(spark, "t_asof_probe", "t_asof_versions",
      key = "custkey", probeTs = "o_orderdate", versionTs = "eff", payload = Seq("credit_limit"))
    val viaSql = spark.sql(sqlText)
    // same join-free plan as the Column API operator
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"SQL asOf must be union+window, found a join:\n$plan")
    // row-for-row parity with the Column-API q50
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.get(2).toString, if (r.isNullAt(3)) -1L else r.getLong(3))
    val got = viaSql.select($"o_orderkey", $"custkey", $"o_orderdate", $"credit_limit")
      .collect().map(key).toSet
    val want = SparkEntry.queries("q50_asof_join")(spark, sfDir)
      .select($"o_orderkey", $"custkey", $"o_orderdate", $"credit_limit")
      .collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("pure-SQL interval join over registered views: same pairs, bucketized equi-join plan") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sfDir)
    ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("c_ts"))
      .createOrReplaceTempView("t_iv_clicks")
    ev.filter($"event_type" === "error")
      .select($"event_id".as("error_id"), $"user_id", $"ts".as("e_ts"))
      .createOrReplaceTempView("t_iv_errors")
    val sqlText = TemporalJoins.Sql.interval(spark, "t_iv_clicks", "t_iv_errors",
      key = "user_id", leftTs = "c_ts", rightTs = "e_ts", lowerUs = 0L, upperUs = 7200000000L)
    val viaSql = spark.sql(sqlText)
    val plan = viaSql.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"SQL interval join degenerated to a nested loop:\n$plan")
    val got = viaSql.select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = TemporalJoins.interval(
        spark.table("t_iv_clicks"), spark.table("t_iv_errors"),
        "user_id", "c_ts", "e_ts", 0L, 7200000000L)
      .select($"click_id", $"error_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }
}
