package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Maintained ORDERED aggregates over a changelog — Flink SQL's
  * FIRST_VALUE / LAST_VALUE / LISTAGG with retraction
  * (FirstValueWithRetractAggFunction, LastValueWithRetractAggFunction,
  * ListAggWithRetractAggFunction): the group's aggregate is a function
  * of WHICH live entity sits at an order boundary (or of the whole
  * ordered live list), so — like min/max (cdcMinMaxStream) and Top-N
  * (CdcTopNStream) — it cannot ride the O(groups) signed fold:
  * retracting the current first must surface the next-smallest LIVE
  * order key, which only the full live set knows.
  *
  * Order key = entity id (unique per live entity), making the result
  * deterministic where Flink's arrival-order variant is not; batch
  * twins q104_cdc_firstlast / q105_cdc_listagg compute the same
  * thing with arg_min/arg_max and an ordered string_agg.
  *
  * Entity state: one tombstone-fenced last-writer-wins slot per id
  * (the shared CDC rule, `Cdc.changelogWins`), held in MapState so a
  * batch touches only its own ids — cross-batch disorder resolves by
  * `ver`, never by arrival order.
  *
  * Tombstone retention: a dead slot's job is to fence a LATE row
  * about the same id (an insert whose ver is older than the delete
  * that killed it), so by default dead slots stay forever — under
  * entity churn that is unbounded state growth. The optional
  * `tombstoneVerHorizon = H` is the bound, mirroring
  * [[graft.sinks.UpsertSink]]'s `tombstoneRetainSegs` but in the ver
  * domain: it declares the SOURCE's disorder promise "no row arrives
  * with ver ≤ maxSeenVer − H", under which a dead slot with
  * ver ≤ maxVer − H can never fence anything again (a late row it
  * would have rejected carries ver ≤ its ver ≤ maxVer − H, which the
  * promise forbids) and is dropped. Compaction cost: LISTAGG rides
  * its per-batch O(live+dead) scan for free; FIRST/LAST compacts on
  * the boundary-death scan it already pays, plus a forced scan only
  * when dead slots outnumber max(64, live) — amortized O(1) per
  * change. A horizon the source does not actually honor makes
  * results approximate exactly the way Flink's state TTL does.
  *
  * Cost contracts (each the honest Flink price):
  *  - FIRST/LAST: a maintained (cnt, first, last) summary updated
  *    O(1) per touched id; only the death of a BOUNDARY entity (the
  *    current first or last) pays an O(live) streamed scan for the
  *    next boundary — exactly Flink's retract-the-first MapView scan.
  *    O(1) heap: the scan folds `slots.iterator()` into two
  *    accumulators, never a materialized copy. A workload that kills
  *    the boundary EVERY batch wants the runner-up-buffer
  *    amortization; that machinery exists as [[CdcTopNStream]] with
  *    n = 1 ordered by id, so this operator deliberately stays scan-
  *    simple.
  *  - LISTAGG: every emission republishes the group's WHOLE ordered
  *    list (Flink emits the same), so the output row is O(live) by
  *    SEMANTICS and the per-batch O(live log live) collect-and-sort
  *    is within that floor. For domain-bounded groups only — a
  *    million-entity group's listagg is a megabyte row no engine
  *    makes cheap. Domain-UNBOUNDED groups should opt into
  *    [[cdcListAggDeltaStream]], the element-level changelog whose
  *    emission is O(changes) and whose fold reproduces the full
  *    string exactly.
  *
  * Emission per touched group: the updated aggregate row; live_cnt 0
  * (zeroed boundaries / empty list) is the sink-side DELETE signal.
  * Per-key micro-batch input (`rows.toSeq`) is heap-bounded by the
  * source's per-trigger admission control (`maxOffsetsPerTrigger` /
  * `maxFilesPerTrigger`) — the CdcJoinStream contract.
  */
object CdcOrderedStream {

  /** Changelog row about entity `id` in group `grp`; `-U`/`-D` carry
    * the before-image value (standard CDC before-image routing). */
  case class OrdChange(op: String, grp: String, id: Long, value: Long, ver: Long)
  /** Per-entity slot (public for encoder codegen). */
  case class OrdSlot(ver: Long, rank: Int, value: Long, live: Boolean)
  /** Maintained FIRST_VALUE/LAST_VALUE view of one group. */
  case class OrdFirstLast(grp: String, live_cnt: Long,
      first_id: Long, first_value: Long, last_id: Long, last_value: Long)
  /** Maintained LISTAGG view of one group (`live_list` in id order). */
  case class OrdListAgg(grp: String, live_cnt: Long, live_list: String)
  /** Element-level delta of the LISTAGG view (the opt-in incremental
    * contract, [[cdcListAggDeltaStream]]): the view's ordered string
    * is recovered by materializing live elements per (grp, id) and
    * joining values in id order. */
  case class OrdListDelta(op: String, grp: String, id: Long, value: Long)
  /** Delta-mode per-group bookkeeping (public for encoder codegen). */
  case class ListMeta(liveCnt: Long, maxVer: Long, deadCnt: Long)
  /** FIRST/LAST summary state (public for encoder codegen);
    * `maxVer`/`deadCnt` drive tombstone-horizon compaction.
    * UPGRADE NOTE: these two fields were added in round 14 — a
    * checkpoint written by the 5-field schema does not restore on
    * this build under the default UnsafeRow state encoding (Spark's
    * value-schema compatibility check rejects it); restart such a
    * query from a fresh checkpoint, or run with the avro state
    * encoding that supports schema evolution. */
  case class OrdSummary(cnt: Long, firstId: Long, firstValue: Long,
      lastId: Long, lastValue: Long, maxVer: Long = 0L, deadCnt: Long = 0L)

  private def opRank(op: String): Int = graft.operators.Cdc.opRank(op)

  /** State-schema version ([[StateSchemaVer]]): v2 = the round-14
    * shapes (7-field OrdSummary with maxVer/deadCnt; delta-mode
    * ListMeta). Bump on any semantic change to OrdSlot/OrdSummary/
    * ListMeta encodings. */
  private val SchemaV = 2

  /** Drop dead slots whose ver sits at or below `maxVer − h`; returns
    * how many were removed. Delegates to the ONE shared fence-expiry
    * rule ([[Tombstones.compact]]) so the ≤-cutoff boundary and what
    * counts as dead cannot drift between the tombstone-fenced
    * processors (ordered aggregates here, [[CdcJoinStream]]'s join
    * view, [[CdcTopNStream]]'s rank slots). */
  private def compactTombstones(slots: MapState[Long, OrdSlot],
      maxVer: Long, h: Long): Long =
    Tombstones.compact(slots, maxVer, h)(_.live, _.ver)

  /** Fold one micro-batch's rows into the slot map under the shared
    * last-writer-wins rule; returns (id → (old slot or null, new
    * slot)) for every id whose slot actually changed. */
  private def foldSlots(slots: MapState[Long, OrdSlot],
      rows: Iterator[OrdChange]): Seq[(Long, OrdSlot, OrdSlot)] = {
    val touched = scala.collection.mutable.LinkedHashMap.empty[Long, (OrdSlot, OrdSlot)]
    rows.toSeq.sortBy(c => (c.ver, opRank(c.op))).foreach { c =>
      val rank = opRank(c.op)
      val old = touched.get(c.id).map(_._2).getOrElse(slots.getValue(c.id))
      if (old == null || graft.operators.Cdc.changelogWins(old.ver, old.rank, c.ver, rank)) {
        val orig = touched.get(c.id).map(_._1).getOrElse(old)
        touched(c.id) = (orig, OrdSlot(c.ver, rank, c.value, live = rank == 1 || rank == 2))
      }
    }
    touched.foreach { case (id, (_, s)) => slots.updateValue(id, s) }
    touched.iterator.map { case (id, (o, s)) => (id, o, s) }.toSeq
  }

  private class FirstLastProc(tombstoneVerHorizon: Option[Long])
      extends StatefulProcessor[String, OrdChange, OrdFirstLast] {
    @transient private var slots: MapState[Long, OrdSlot] = _
    @transient private var summary: ValueState[OrdSummary] = _
    @transient private var schemaTag: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[Long, OrdSlot]("slots",
        Encoders.scalaLong, Encoders.product[OrdSlot], TTLConfig.NONE)
      summary = getHandle.getValueState[OrdSummary]("summary",
        Encoders.product[OrdSummary], TTLConfig.NONE)
      schemaTag = StateSchemaVer.state(getHandle)
    }

    override def handleInputRows(grp: String, rows: Iterator[OrdChange],
        timers: TimerValues): Iterator[OrdFirstLast] = {
      StateSchemaVer.check(schemaTag, SchemaV, "cdcFirstLastStream")
      var s = if (summary.exists()) summary.get() else OrdSummary(0L, 0L, 0L, 0L, 0L)
      var scan = false // a boundary entity died — recompute by streaming the slots
      foldSlots(slots, rows).foreach { case (id, old, nw) =>
        val wasLive = old != null && old.live
        // tombstone bookkeeping: every slot transition moves deadCnt
        // at most one step (nothing→dead and live→dead grow it,
        // dead→live shrinks it); maxVer is monotone over accepted
        // slot versions — a row the fence rejected carries a ver no
        // larger than the slot that rejected it, so it cannot exceed
        // this maximum
        if (nw.ver > s.maxVer) s = s.copy(maxVer = nw.ver)
        if (!nw.live && (old == null || wasLive)) s = s.copy(deadCnt = s.deadCnt + 1)
        else if (nw.live && old != null && !wasLive) s = s.copy(deadCnt = s.deadCnt - 1)
        if (!wasLive && nw.live) {
          s = s.copy(cnt = s.cnt + 1)
          if (s.cnt == 1L)
            s = s.copy(firstId = id, firstValue = nw.value, lastId = id, lastValue = nw.value)
          else {
            if (id < s.firstId) s = s.copy(firstId = id, firstValue = nw.value)
            if (id > s.lastId) s = s.copy(lastId = id, lastValue = nw.value)
          }
        } else if (wasLive && !nw.live) {
          s = s.copy(cnt = s.cnt - 1)
          if (id == s.firstId || id == s.lastId) scan = true
        } else if (wasLive && nw.live && nw.value != old.value) {
          // in-place value rewrite: boundary images follow O(1)
          if (id == s.firstId) s = s.copy(firstValue = nw.value)
          if (id == s.lastId) s = s.copy(lastValue = nw.value)
        }
      }
      if (s.cnt <= 0L) s = s.copy(firstId = 0L, firstValue = 0L, lastId = 0L, lastValue = 0L)
      else if (scan) {
        // the one O(live) branch: stream the slots through two
        // accumulators (O(1) heap — never a materialized copy)
        var fi = Long.MaxValue; var fv = 0L; var li = Long.MinValue; var lv = 0L
        slots.iterator().foreach { case (id, sl) =>
          if (sl.live) {
            if (id < fi) { fi = id; fv = sl.value }
            if (id > li) { li = id; lv = sl.value }
          }
        }
        s = s.copy(firstId = fi, firstValue = fv, lastId = li, lastValue = lv)
      }
      // cnt is exactly |live slots| — the slot model resolves
      // disorder by ver (a retraction arriving before its insert
      // leaves a dead slot that fences the late insert), so unlike
      // the signed folds it can never sit negative. Without a
      // horizon, tombstone slots must STAY to keep that fence.
      tombstoneVerHorizon.foreach { h =>
        // compact when a full scan happened anyway, or dead slots
        // outnumber max(64, live) — each forced O(live+dead) pass is
        // paid once per O(dead) deletions, amortized O(1) per change
        if (scan || s.deadCnt > math.max(64L, s.cnt))
          s = s.copy(deadCnt = s.deadCnt - compactTombstones(slots, s.maxVer, h))
      }
      summary.update(s)
      Iterator.single(OrdFirstLast(grp, s.cnt, s.firstId, s.firstValue, s.lastId, s.lastValue))
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OrdFirstLast] =
      Iterator.empty
  }

  private class ListAggProc(tombstoneVerHorizon: Option[Long])
      extends StatefulProcessor[String, OrdChange, OrdListAgg] {
    @transient private var slots: MapState[Long, OrdSlot] = _
    @transient private var schemaTag: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[Long, OrdSlot]("slots",
        Encoders.scalaLong, Encoders.product[OrdSlot], TTLConfig.NONE)
      schemaTag = StateSchemaVer.state(getHandle)
    }

    override def handleInputRows(grp: String, rows: Iterator[OrdChange],
        timers: TimerValues): Iterator[OrdListAgg] = {
      StateSchemaVer.check(schemaTag, SchemaV, "cdcListAggStream")
      foldSlots(slots, rows)
      // emission is the whole ordered list BY SEMANTICS — the collect
      // and sort live inside that O(live) floor. The default
      // (horizon-less) path tracks NOTHING extra: maxVer, the dead
      // bookkeeping, and the compaction pass exist only when the
      // horizon is set (same O(live+dead) class as the scan they
      // accompany).
      val live = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val track = tombstoneVerHorizon.isDefined
      var maxVer = Long.MinValue
      var minDeadVer = Long.MaxValue
      slots.iterator().foreach { case (id, sl) =>
        if (track) {
          if (sl.ver > maxVer) maxVer = sl.ver
          if (!sl.live && sl.ver < minDeadVer) minDeadVer = sl.ver
        }
        if (sl.live) live += ((id, sl.value))
      }
      // removal pass only when the emission scan saw a dead slot at or
      // below the cutoff — a churn-free group never re-iterates the
      // map a second time just to find nothing to remove
      tombstoneVerHorizon.foreach { h =>
        if (minDeadVer <= maxVer - h) compactTombstones(slots, maxVer, h); ()
      }
      val sorted = live.sortBy(_._1)
      Iterator.single(OrdListAgg(grp, sorted.size.toLong,
        sorted.iterator.map(_._2.toString).mkString(",")))
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OrdListAgg] =
      Iterator.empty
  }

  /** Element-delta twin of [[ListAggProc]]: instead of republishing
    * the whole ordered string per touched batch (O(live) by the full
    * view's semantics), emit one element-level delta per CHANGED slot
    * — +I enters, -D leaves (before-image value), -U/+U rewrites in
    * place. Emission and compute are O(touched ids) per batch, so a
    * domain-UNBOUNDED group (15M live entities at the 100x stress
    * scale) pays per-change cost instead of a megabyte republish.
    * The trade: the sink owns materialization (fold live elements
    * per (grp, id), join in id order) — the law the delta-fold spec
    * pins against [[cdcListAggStream]]'s full view. */
  private class ListAggDeltaProc(tombstoneVerHorizon: Option[Long])
      extends StatefulProcessor[String, OrdChange, OrdListDelta] {
    @transient private var slots: MapState[Long, OrdSlot] = _
    @transient private var meta: ValueState[ListMeta] = _
    @transient private var schemaTag: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[Long, OrdSlot]("slots",
        Encoders.scalaLong, Encoders.product[OrdSlot], TTLConfig.NONE)
      meta = getHandle.getValueState[ListMeta]("meta",
        Encoders.product[ListMeta], TTLConfig.NONE)
      schemaTag = StateSchemaVer.state(getHandle)
    }

    override def handleInputRows(grp: String, rows: Iterator[OrdChange],
        timers: TimerValues): Iterator[OrdListDelta] = {
      StateSchemaVer.check(schemaTag, SchemaV, "cdcListAggDeltaStream")
      var m = if (meta.exists()) meta.get() else ListMeta(0L, 0L, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[OrdListDelta]
      foldSlots(slots, rows).foreach { case (id, old, nw) =>
        val wasLive = old != null && old.live
        if (nw.ver > m.maxVer) m = m.copy(maxVer = nw.ver)
        if (!nw.live && (old == null || wasLive)) m = m.copy(deadCnt = m.deadCnt + 1)
        else if (nw.live && old != null && !wasLive) m = m.copy(deadCnt = m.deadCnt - 1)
        if (!wasLive && nw.live) {
          m = m.copy(liveCnt = m.liveCnt + 1)
          out += OrdListDelta("+I", grp, id, nw.value)
        } else if (wasLive && !nw.live) {
          m = m.copy(liveCnt = m.liveCnt - 1)
          out += OrdListDelta("-D", grp, id, old.value)
        } else if (wasLive && nw.live && nw.value != old.value) {
          out += OrdListDelta("-U", grp, id, old.value)
          out += OrdListDelta("+U", grp, id, nw.value)
        }
      }
      // no per-batch full scan exists in delta mode, so compaction is
      // the FirstLast amortization only: forced when dead slots
      // outnumber max(64, live)
      tombstoneVerHorizon.foreach { h =>
        if (m.deadCnt > math.max(64L, m.liveCnt))
          m = m.copy(deadCnt = m.deadCnt - compactTombstones(slots, m.maxVer, h))
      }
      meta.update(m)
      out.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[OrdListDelta] =
      Iterator.empty
  }

  /** Maintain each group's FIRST_VALUE/LAST_VALUE (by id order) over
    * a changelog stream — see the object doc for the cost contract
    * and the `tombstoneVerHorizon` retention promise (None = dead
    * slots kept forever, the safe default). */
  def cdcFirstLastStream(changes: Dataset[OrdChange],
      tombstoneVerHorizon: Option[Long] = None): Dataset[OrdFirstLast] = {
    tombstoneVerHorizon.foreach(h => require(h > 0, s"tombstoneVerHorizon must be positive: $h"))
    import changes.sparkSession.implicits._
    changes.groupByKey(_.grp)
      .transformWithState(new FirstLastProc(tombstoneVerHorizon),
        TimeMode.None(), OutputMode.Append())
  }

  /** Maintain each group's LISTAGG (id-ordered, comma-joined) over a
    * changelog stream — see the object doc for the cost contract and
    * the `tombstoneVerHorizon` retention promise. */
  def cdcListAggStream(changes: Dataset[OrdChange],
      tombstoneVerHorizon: Option[Long] = None): Dataset[OrdListAgg] = {
    tombstoneVerHorizon.foreach(h => require(h > 0, s"tombstoneVerHorizon must be positive: $h"))
    import changes.sparkSession.implicits._
    changes.groupByKey(_.grp)
      .transformWithState(new ListAggProc(tombstoneVerHorizon),
        TimeMode.None(), OutputMode.Append())
  }

  /** Incremental-emission LISTAGG (the opt-in for domain-UNBOUNDED
    * groups): an element-level changelog instead of the full-string
    * republish — see [[ListAggDeltaProc]]. The full view folds back
    * out of the deltas: keep the last op per (grp, id), live elements
    * joined in id order equal [[cdcListAggStream]]'s `live_list`
    * exactly (pinned by the delta-fold spec). */
  def cdcListAggDeltaStream(changes: Dataset[OrdChange],
      tombstoneVerHorizon: Option[Long] = None): Dataset[OrdListDelta] = {
    tombstoneVerHorizon.foreach(h => require(h > 0, s"tombstoneVerHorizon must be positive: $h"))
    import changes.sparkSession.implicits._
    changes.groupByKey(_.grp)
      .transformWithState(new ListAggDeltaProc(tombstoneVerHorizon),
        TimeMode.None(), OutputMode.Append())
  }

  // --------------------------------------------------------------
  // Delta-mode SINK composition: element changelog → upsert store →
  // materialized full view. The fold law ("keep the last op per
  // (grp, id); live elements joined in id order reproduce the full
  // string") is easy to state and easy to hand-roll WRONG — this is
  // the shipped composition, with the byte-parity spec pinning it
  // against cdcListAggStream's republish mode.
  // --------------------------------------------------------------

  private val ElemSep = '\u0001'

  /** foreachBatch sink: land each micro-batch of element deltas in
    * [[graft.sinks.UpsertSink]] segments.
    *
    *  - `pk` must pack (grp, id) injectively into a Long — the
    *    [[CdcJoinStream.cascade]] contract (the caller knows both key
    *    spaces; e.g. `d.id` alone when ids are globally unique and
    *    groups never move, `grpNo(d.grp) * K + d.id` otherwise). An
    *    id-only pk under group moves folds the old group's -D against
    *    the new group's +I and the element flickers dead.
    *  - `ver` = the batch id: [[ListAggDeltaProc]] nets each element
    *    to at most ONE transition per batch, and an in-place rewrite's
    *    -U/+U pair shares the stamp resolved by op rank (the shared
    *    CDC rule — and UpsertSink drops -U rows anyway, the
    *    upsert-topic contract).
    *  - the record value carries (grp, id, value) so the view fold
    *    can recover them; grp must not contain the \\u0001 separator
    *    (loud-rejected).
    *
    * Usage: `cdcListAggDeltaStream(changes).writeStream.foreachBatch(
    * CdcOrderedStream.listAggDeltaSink(root, pk)).start()`, then
    * [[readListAggView]] for the current full view (or
    * `UpsertSink.compact(root)` on the store like any other upsert
    * topic). */
  def listAggDeltaSink(root: String, pk: OrdListDelta => Long)
      : (Dataset[OrdListDelta], Long) => Unit = { (df, batchId) =>
    import df.sparkSession.implicits._
    val changes = df.map { d =>
      if (d.grp.indexOf(ElemSep) >= 0) throw new IllegalArgumentException(
        s"listAggDeltaSink: grp '${d.grp}' contains the \\u0001 record separator")
      graft.sinks.UpsertSink.UpsertChange(d.op, pk(d),
        s"${d.grp}$ElemSep${d.id}$ElemSep${d.value}", batchId)
    }
    graft.sinks.UpsertSink.writeBatch(changes, batchId, root)
  }

  /** Materialize the CURRENT full LISTAGG view from a
    * [[listAggDeltaSink]] store: live elements per group, id-ordered,
    * comma-joined — row-for-row equal to what [[cdcListAggStream]]'s
    * republish mode would have emitted last for every group that
    * still has live elements (byte parity pinned in CdcOrderedSpec;
    * the republish mode's live_cnt=0 delete signals correspond to
    * groups absent here, exactly like any upsert-topic consumer).
    * One pk-shuffle read (UpsertSink.read) + one group fold. */
  def readListAggView(spark: org.apache.spark.sql.SparkSession, root: String): Dataset[OrdListAgg] = {
    import spark.implicits._
    graft.sinks.UpsertSink.read(spark, root)
      .select(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.col("value"),
        java.util.regex.Pattern.quote(ElemSep.toString)).as("parts"))
      .select($"parts".getItem(0).as("grp"),
        $"parts".getItem(1).cast("long").as("id"),
        $"parts".getItem(2).cast("long").as("value"))
      .groupBy($"grp")
      .agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("live_cnt"),
        org.apache.spark.sql.functions.concat_ws(",",
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.array_sort(
              org.apache.spark.sql.functions.collect_list(
                org.apache.spark.sql.functions.struct($"id", $"value"))),
            e => e.getField("value").cast("string"))).as("live_list"))
      .as[OrdListAgg]
  }
}
