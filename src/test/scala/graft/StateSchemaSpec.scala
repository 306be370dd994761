package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcOrderedStream, OverAggStream}
import graft.streaming.CdcOrderedStream.{OrdChange, OrdFirstLast, OrdSlot}

/** State-schema upgrade mechanism (round-15): a production restart
  * from an older checkpoint must MIGRATE or LOUD-REJECT, never
  * silently misread. Two layers, both pinned here:
  *
  *  1. SHAPE changes (round 14 grew OrdSummary 5→7 fields and RunAcc
  *     2→3): Spark's own state-schema compatibility check rejects
  *     under the default UnsafeRow encoding — proven by writing a
  *     checkpoint with the PRE-upgrade state layout (replica
  *     processors carrying the r13 case-class shapes under the same
  *     state names) and restarting the REAL operator on it.
  *  2. SEMANTIC changes under an unchanged shape: the per-key
  *     `_schemaVer` tag (graft.streaming.StateSchemaVer) loud-rejects
  *     on the first old-key touch — proven with two same-shape
  *     processors declaring different versions.
  *
  * Plus the non-regression direction: a same-version restart restores
  * state intact (the tag is transparent when versions match).
  */
/** Serializable fixtures — top-level so the processors capture no
  * suite instance (StatefulProcessors ship to executors). */
object StateSchemaFixtures {

  // ----------------------------------------------------------------
  // replica PRE-round-14 state shapes (the r13 layouts), under the
  // REAL state-variable names
  // ----------------------------------------------------------------

  /** r13 OrdSummary: 5 fields (no maxVer/deadCnt). */
  case class OrdSummaryV13(cnt: Long, firstId: Long, firstValue: Long,
      lastId: Long, lastValue: Long)
  /** r13 RunAcc: 2 fields (no lastUs). */
  case class RunAccV13(cnt: Long, cents: Long)

  /** Writes FirstLastProc's r13 state layout: "slots" + 5-field
    * "summary" (and no `_schemaVer` — pre-tag builds had none). */
  class FirstLastV13 extends StatefulProcessor[String, OrdChange, OrdFirstLast] {
    @transient private var slots: MapState[Long, OrdSlot] = _
    @transient private var summary: ValueState[OrdSummaryV13] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[Long, OrdSlot]("slots",
        Encoders.scalaLong, Encoders.product[OrdSlot], TTLConfig.NONE)
      summary = getHandle.getValueState[OrdSummaryV13]("summary",
        Encoders.product[OrdSummaryV13], TTLConfig.NONE)
    }
    override def handleInputRows(grp: String, rows: Iterator[OrdChange],
        timers: TimerValues): Iterator[OrdFirstLast] = {
      rows.foreach(c => slots.updateValue(c.id, OrdSlot(c.ver, 1, c.value, live = true)))
      summary.update(OrdSummaryV13(1L, 1L, 1L, 1L, 1L))
      Iterator.single(OrdFirstLast(grp, 1L, 1L, 1L, 1L, 1L))
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OrdFirstLast] =
      Iterator.empty
  }

  /** Same shape across versions but tagged: two versions of ONE
    * same-shape processor, for the semantic-change tests. */
  class TaggedProc(version: Int) extends StatefulProcessor[String, OrdChange, OrdFirstLast] {
    @transient private var acc: ValueState[Long] = _
    @transient private var tag: ValueState[Int] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      acc = getHandle.getValueState[Long]("acc", Encoders.scalaLong, TTLConfig.NONE)
      // mirror StateSchemaVer (private to graft.streaming): same state
      // name, same check-or-stamp contract
      tag = getHandle.getValueState[Int]("_schemaVer", Encoders.scalaInt, TTLConfig.NONE)
    }
    override def handleInputRows(grp: String, rows: Iterator[OrdChange],
        timers: TimerValues): Iterator[OrdFirstLast] = {
      if (tag.exists()) {
        val v = tag.get()
        if (v != version) throw new IllegalStateException(
          s"taggedProc: checkpointed state carries schema v$v but this build writes v$version")
      } else tag.update(version)
      val a = (if (acc.exists()) acc.get() else 0L) + rows.size
      acc.update(a)
      Iterator.single(OrdFirstLast(grp, a, 0L, 0L, 0L, 0L))
    }
    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OrdFirstLast] =
      Iterator.empty
  }

  /** Pre-upgrade UnboundedProcessor replica: same plan shape, 2-field
    * "acc" + "pending", no tag. */
  class UnboundedV13 extends StatefulProcessor[Long, OverAggStream.OverEvent, Long] {
    @transient private var pending: org.apache.spark.sql.streaming.ListState[OverAggStream.Held] = _
    @transient private var acc: ValueState[RunAccV13] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      pending = getHandle.getListState[OverAggStream.Held]("pending",
        Encoders.product[OverAggStream.Held], TTLConfig.NONE)
      acc = getHandle.getValueState[RunAccV13]("acc",
        Encoders.product[RunAccV13], TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[OverAggStream.OverEvent],
        timers: TimerValues): Iterator[Long] = {
      acc.update(RunAccV13(rows.size.toLong, 0L))
      Iterator.single(key)
    }
    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Long] =
      Iterator.empty
  }
}

class StateSchemaSpec extends AnyFunSuite {
  import TestSpark._
  import StateSchemaFixtures._

  // ------------------------------------------------------------------
  // drivers
  // ------------------------------------------------------------------

  private def writeLines(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

  private def ordSource(dir: Path): Dataset[OrdChange] = {
    import spark.implicits._
    spark.readStream
      .schema("op STRING, grp STRING, id BIGINT, value BIGINT, ver BIGINT")
      .json(dir.toString).as[OrdChange]
  }

  /** Run `mk(source)` to completion against the files currently in
    * `dir`, collecting rows; surfaces the query's failure if any. */
  private def drive[T](name: String, dir: Path, ckpt: String,
      mk: Dataset[OrdChange] => Dataset[T]): Seq[T] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    val q = mk(ordSource(dir))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: Dataset[T], _: Long) =>
        val rows = df.collect()
        buf.synchronized { rows.foreach(buf += _); () }
      }
      .queryName(name).start()
    try { q.processAllAvailable(); buf.synchronized(buf.toVector) }
    finally q.stop()
  }

  private def rootMessages(e: Throwable): String = {
    val sb = new StringBuilder
    var cur: Throwable = e
    while (cur != null) { sb.append(String.valueOf(cur.getMessage)).append('\n'); cur = cur.getCause }
    sb.toString
  }

  // ------------------------------------------------------------------

  test("state schema: a same-shape SEMANTIC change loud-rejects via the version tag on the first old-key touch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssv_sem")
    val ckpt = Files.createTempDirectory("graft_ssv_sem_ck").toString
    writeLines(dir, "00000.json", Seq("""{"op":"+I","grp":"g","id":1,"value":10,"ver":1}"""))
    val r1 = drive("ssv_sem_v1", dir, ckpt,
      (ds: Dataset[OrdChange]) => ds.groupByKey(_.grp)
        .transformWithState(new TaggedProc(1), TimeMode.None(), OutputMode.Append()))
    assert(r1.map(_.live_cnt) === Seq(1L))
    // the "upgraded" build (v2) touches the SAME group — must reject
    writeLines(dir, "00001.json", Seq("""{"op":"+I","grp":"g","id":2,"value":20,"ver":2}"""))
    val ex = intercept[Exception] {
      drive("ssv_sem_v2", dir, ckpt,
        (ds: Dataset[OrdChange]) => ds.groupByKey(_.grp)
          .transformWithState(new TaggedProc(2), TimeMode.None(), OutputMode.Append()))
    }
    val msg = rootMessages(ex)
    assert(msg.contains("carries schema v1"), s"expected the tag's loud reject, got: $msg")
  }

  test("state schema: a same-version restart restores state intact (the tag is transparent)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssv_ok")
    val ckpt = Files.createTempDirectory("graft_ssv_ok_ck").toString
    def mk(ds: Dataset[OrdChange]) = ds.groupByKey(_.grp)
      .transformWithState(new TaggedProc(1), TimeMode.None(), OutputMode.Append())
    writeLines(dir, "00000.json", Seq(
      """{"op":"+I","grp":"g","id":1,"value":10,"ver":1}""",
      """{"op":"+I","grp":"g","id":2,"value":20,"ver":2}"""))
    assert(drive("ssv_ok_a", dir, ckpt, mk).map(_.live_cnt) === Seq(2L))
    writeLines(dir, "00001.json", Seq("""{"op":"+I","grp":"g","id":3,"value":30,"ver":3}"""))
    // restart: the accumulator continues from 2, proving state restored
    assert(drive("ssv_ok_b", dir, ckpt, mk).map(_.live_cnt) === Seq(3L))
  }

  test("state schema: restarting cdcFirstLastStream on a pre-round-14 OrdSummary layout loud-rejects (Spark value-schema check)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssv_fl")
    val ckpt = Files.createTempDirectory("graft_ssv_fl_ck").toString
    writeLines(dir, "00000.json", Seq("""{"op":"+I","grp":"g","id":1,"value":10,"ver":1}"""))
    // pre-upgrade build writes the 5-field summary under "summary"
    drive("ssv_fl_old", dir, ckpt,
      (ds: Dataset[OrdChange]) => ds.groupByKey(_.grp)
        .transformWithState(new FirstLastV13, TimeMode.None(), OutputMode.Append()))
    writeLines(dir, "00001.json", Seq("""{"op":"+I","grp":"g","id":2,"value":20,"ver":2}"""))
    // this build's 7-field OrdSummary must NOT silently misread it
    val ex = intercept[Exception] {
      drive("ssv_fl_new", dir, ckpt,
        (ds: Dataset[OrdChange]) => CdcOrderedStream.cdcFirstLastStream(ds))
    }
    val msg = rootMessages(ex)
    assert(msg.toLowerCase.contains("schema") || msg.toLowerCase.contains("compat"),
      s"expected a loud state-schema reject, got: $msg")
  }

  test("state schema: restarting overUnbounded on a pre-round-14 RunAcc layout loud-rejects (Spark value-schema check)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ssv_ra")
    val ckpt = Files.createTempDirectory("graft_ssv_ra_ck").toString
    writeLines(dir, "00000.json", Seq(
      """{"user_id":1,"event_id":1,"value":5.0,"ts":"2026-01-01T00:00:01.000Z"}"""))
    def src() = spark.readStream
      .schema("user_id BIGINT, event_id BIGINT, value DOUBLE, ts TIMESTAMP")
      .json(dir.toString)
    // pre-upgrade build: same plan shape (watermark → select → TWS in
    // event-time mode), 2-field "acc"
    val writerQ = {
      import org.apache.spark.sql.functions._
      val ds = src().withWatermark("ts", "1 second")
        .select(col("user_id").as("key"), col("event_id").as("id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * lit(100)).cast("long").as("cents"), col("ts"))
        .as[OverAggStream.OverEvent]
        .groupByKey(_.key)
        .transformWithState(new UnboundedV13, TimeMode.EventTime(), OutputMode.Append())
      ds.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[Long], _: Long) => df.count(); () }
        .queryName("ssv_ra_old").start()
    }
    try writerQ.processAllAvailable() finally writerQ.stop()
    writeLines(dir, "00001.json", Seq(
      """{"user_id":1,"event_id":2,"value":7.0,"ts":"2026-01-01T00:00:02.000Z"}"""))
    val ex = intercept[Exception] {
      val q = OverAggStream.overUnbounded(src(), watermark = "1 second")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: Dataset[OverAggStream.OverAgg], _: Long) => df.count(); () }
        .queryName("ssv_ra_new").start()
      try q.processAllAvailable() finally q.stop()
    }
    val msg = rootMessages(ex)
    assert(msg.toLowerCase.contains("schema") || msg.toLowerCase.contains("compat"),
      s"expected a loud state-schema reject, got: $msg")
  }
}
