package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental JOIN-VIEW maintenance over two CDC changelogs —
  * Flink's dynamic-table binary join (the operator behind
  * `SELECT … FROM left JOIN right` when BOTH inputs carry
  * +I/+U/-U/-D traffic). Structured Streaming's native stream-stream
  * join consumes APPEND inputs only; a changelog join needs keyed
  * state that re-emits when either side's current row changes, which
  * is exactly what this processor keeps.
  *
  * Shape: left rows (pk `lpk`, payload, foreign key `k`) upsert
  * against right rows (pk = `k`, payload) — the fact⋈dim enrichment
  * the reference's CDC pipelines maintain. Both changelogs union into
  * ONE stream keyed by the JOIN key, so a key's left matches and its
  * right row share a state shard and every re-emission is local
  * (1000 executors hold 1000 shards; no broadcast, no rescans).
  *
  * A left row's fk CHANGE arrives as `-U` carrying the OLD fk and
  * `+U` carrying the new one (the before-image routing every CDC
  * format provides) — the two land on different shards and the join
  * rows (lpk, k_old) / (lpk, k_new) die and get born independently.
  * Output-row identity is therefore the PAIR (lpk, k): downstream
  * must materialize on that identity IN STREAM ORDER (batch id, then
  * offset within the batch — the order every delta sink preserves).
  * Each delta's `ver` is the pair's own MONOTONE stamp —
  * max(left slot ver, right slot ver) at emission time; both slot
  * versions only ever advance under the last-writer-wins rule, so
  * per (lpk, k) the stamp never goes backwards. (A batch-wide stamp
  * would: a hot batch touching pk B@ver100 would inflate an
  * unrelated pk A's delta to 100, making A's later genuine ver-50
  * update look stale.) Monotone is NOT strictly increasing: the two
  * sources' version spaces are unrelated, so a dominant left ver
  * (say 100) plateaus the max through several right updates (5, 6,
  * …) — successive DISTINCT images can share one stamp. `ver` is a
  * progress hint for ≥-keyed conflict resolution across restarts,
  * not a per-image unique key; image identity at equal stamp is
  * stream order.
  *
  * The output is a TRUE retract stream: new join rows emit `+I`,
  * changed rows emit `-U`(old images) then `+U`(new), dead rows emit
  * `-D` — so it composes directly with [[Pipelines.cdcAggStream]]
  * (changelog in → maintained join → maintained aggregate, the full
  * Flink SQL pipeline). State per join key: the current row per left
  * pk (live or tombstoned, last-writer-wins by `ver` with changelog
  * op ranking) and one right slot — O(matching rows), the same state
  * Flink's join operator keeps; bound the pk space upstream (TTL,
  * partition retention) exactly as with cdcUpsertStream.
  *
  * SKEW SAFETY — the per-batch cost contract on a hot key (a
  * celebrity dim key with 10⁶ facts):
  *   - a batch touching only LEFT pks costs O(touched pks): each is
  *     a point `getValue`/`updateValue` against the MapState plus an
  *     in-memory diff of that one slot. The key's other matches are
  *     never read, never copied, never rewritten.
  *   - a batch changing the RIGHT slot must re-emit every live match
  *     (that IS the join semantics), but does so by streaming
  *     `lrows.iterator()` straight into the output iterator — the
  *     state map is never materialized on the heap, so memory stays
  *     O(touched pks + one row in flight) regardless of matches.
  *
  * Tombstone retention: a dead left slot's job is to fence a LATE
  * row about the same pk (an insert whose ver is older than the
  * delete that killed it), so by default dead slots stay forever —
  * under left-pk churn that is unbounded state growth. The optional
  * `tombstoneVerHorizon = H` bounds it under the shared fence-expiry
  * rule ([[Tombstones]]): it declares the LEFT source's disorder
  * promise "no left row arrives with ver ≤ maxSeenLeftVer − H",
  * under which a dead slot with ver ≤ maxLeftVer − H can never fence
  * again and compacts away. The horizon lives in the LEFT version
  * domain only (the two sources' version spaces are unrelated; the
  * right side is ONE slot per key — no growth to bound). Compaction
  * cost: the join has no eager per-batch full scan to ride, so the
  * pass is forced only when dead slots outnumber max(64, live) —
  * each O(live+dead) pass is paid once per O(dead) deletions,
  * amortized O(1) per change (the [[CdcOrderedStream]] delta-mode
  * amortization). A horizon the source does not honor makes the view
  * approximate exactly the way Flink's state TTL does.
  *
  * Modes (Flink's four dynamic-table join types), via `joinStream`'s
  * `mode` overload:
  *   - inner: pairs exist only while both sides are live.
  *   - left:  a live left row with a dead/absent right pads with
  *     null; the pad RETRACTS via -U/+U when the right row arrives
  *     (same (lpk, k) identity — Flink's left outer join).
  *   - right: a live right row with ZERO live left matches emits ONE
  *     null-padded row with `lpk = null` (identity (null, k)); the
  *     pad dies via -D when the first match arrives and is reborn
  *     via +I when the last match leaves. Maintained by an O(1)
  *     live-match counter, never a state scan. Pad deltas carry the
  *     key's high-water ver (the pad is a whole-key aggregate, so
  *     that is its natural monotone version).
  *   - full: left + right behaviors combined.
  */
object CdcJoinStream {

  /** `side` = "L"|"R"; for right rows `pk == k`. */
  case class JoinChange(side: String, op: String, k: Long, pk: Long,
      payload: String, ver: Long)
  /** Retract-stream delta of the join view; row identity = (lpk, k).
    * `lpk` is null ONLY for right/full-outer pad rows (identity
    * (null, k)). `ver` is monotone per identity (see object doc). */
  case class JoinDelta(op: String, lpk: java.lang.Long, k: Long,
      left: String, right: String, ver: Long)

  /** Internal per-pk state image (public only because Spark's encoder
    * codegen must construct it). */
  case class Slot(ver: Long, rank: Int, payload: String, live: Boolean)

  /** Right-outer bookkeeping: count of LIVE left pks under the key
    * (pad exists iff right live && liveCnt == 0) and the key's
    * high-water ver (the pad's monotone stamp). Public for encoder
    * codegen. */
  case class PadMeta(liveCnt: Long, hiVer: Long)

  /** Tombstone-horizon bookkeeping (exists only when
    * `tombstoneVerHorizon` is set): live/dead slot counts under the
    * key and the high-water ACCEPTED left slot ver — the compaction
    * cutoff's reference point. Public for encoder codegen. */
  case class TombMeta(liveCnt: Long, maxVer: Long, deadCnt: Long)

  // the shared changelog ordering rule — ONE definition
  private def opRank(op: String): Int = graft.operators.Cdc.opRank(op)

  /** State-schema version ([[StateSchemaVer]]): v2 = round 15
    * (optional TombMeta added). Bump on any semantic change to the
    * Slot/PadMeta/TombMeta encodings or the seq contract. */
  private val SchemaV = 2

  private class JoinProcessor(leftOuter: Boolean, rightOuter: Boolean, strictVer: Boolean,
      tombstoneVerHorizon: Option[Long])
      extends StatefulProcessor[Long, JoinChange, JoinDelta] {
    @transient private var lrows: MapState[Long, Slot] = _
    @transient private var rrow: ValueState[Slot] = _
    @transient private var padMeta: ValueState[PadMeta] = _
    @transient private var seqSt: ValueState[Long] = _
    @transient private var tombMeta: ValueState[TombMeta] = _
    @transient private var schemaTag: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lrows = getHandle.getMapState[Long, Slot]("lrows",
        Encoders.scalaLong, Encoders.product[Slot], TTLConfig.NONE)
      rrow = getHandle.getValueState[Slot]("rrow", Encoders.product[Slot], TTLConfig.NONE)
      if (rightOuter)
        padMeta = getHandle.getValueState[PadMeta]("padMeta", Encoders.product[PadMeta], TTLConfig.NONE)
      if (strictVer)
        seqSt = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
      if (tombstoneVerHorizon.isDefined)
        tombMeta = getHandle.getValueState[TombMeta]("tombMeta", Encoders.product[TombMeta], TTLConfig.NONE)
      schemaTag = StateSchemaVer.state(getHandle)
    }

    /** last-writer-wins under the shared changelog tie rule. */
    private def wins(cur: Slot, ver: Long, rank: Int): Boolean =
      cur == null || graft.operators.Cdc.changelogWins(cur.ver, cur.rank, ver, rank)

    /** The right side's current contribution to join pairs: None =
      * live left rows form no pair at all; Some(p) = they pair with
      * payload p (null = the left-outer pad). */
    private def rightImage(r: Slot): Option[String] =
      if (r != null && r.live) Some(r.payload)
      else if (leftOuter) Some(null)
      else None

    private def pairVer(l: Slot, r: Slot): Long =
      math.max(l.ver, if (r == null) Long.MinValue else r.ver)

    /** Deltas for one left pk whose slot changed this batch (orig may
      * be null = first appearance). Handles every pre/post pair
      * existence combination under the (possibly also changed) right
      * images. `stamp` maps the pair's natural version to the emitted
      * one (identity, or the strict per-key sequence). */
    private def diffTouched(k: Long, pk: Long, orig: Slot, now: Slot,
        preImg: Option[String], postImg: Option[String], right: Slot,
        stamp: Long => Long): Iterator[JoinDelta] = {
      val pre = if (orig != null && orig.live) preImg.map(p => (orig.payload, p)) else None
      val post = if (now.live) postImg.map(p => (now.payload, p)) else None
      val ver = stamp(pairVer(now, right))
      (pre, post) match {
        case (None, Some((l, r))) => Iterator.single(JoinDelta("+I", pk, k, l, r, ver))
        case (Some((pl, pr)), Some((l, r))) if pl != l || pr != r =>
          Iterator(JoinDelta("-U", pk, k, pl, pr, ver), JoinDelta("+U", pk, k, l, r, ver))
        case (Some((pl, pr)), None) => Iterator.single(JoinDelta("-D", pk, k, pl, pr, ver))
        case _ => Iterator.empty
      }
    }

    override def handleInputRows(k: Long, rows: Iterator[JoinChange],
        timers: TimerValues): Iterator[JoinDelta] = {
      StateSchemaVer.check(schemaTag, SchemaV, "cdcJoinStream")
      val rightIn = rrow.get()
      var right: Slot = rightIn
      // pk -> (slot at batch start | null, winning slot now); insertion
      // order preserved so emission order follows first-touch order
      val touched = scala.collection.mutable.LinkedHashMap.empty[Long, (Slot, Slot)]
      var batchMaxVer = Long.MinValue
      // fold in (ver, rank) order so intra-batch sequences net
      // correctly. toSeq materializes ONE KEY'S SHARE OF ONE
      // MICRO-BATCH'S INPUT on the heap (state is never materialized
      // — see the skew contract above); that per-key heap is bounded
      // by the source's per-trigger admission control — size
      // maxOffsetsPerTrigger / maxFilesPerTrigger so a backlog replay
      // (a cold start reading the whole topic as one batch) cannot
      // land an unbounded seed on a hot key
      rows.toSeq.sortBy(c => (c.ver, opRank(c.op))).foreach { c =>
        val rank = opRank(c.op)
        batchMaxVer = math.max(batchMaxVer, c.ver)
        val slot = Slot(c.ver, rank, c.payload, live = rank == 1 || rank == 2)
        if (c.side == "L") {
          val prev = touched.get(c.pk)
          val cur = prev match {
            case Some((_, now)) => now
            case None => lrows.getValue(c.pk) // point lookup, null if absent
          }
          if (wins(cur, c.ver, rank)) {
            val orig = prev match { case Some((o, _)) => o; case None => cur }
            touched(c.pk) = (orig, slot)
          }
        } else if (c.side == "R") {
          if (wins(right, c.ver, rank)) right = slot
        } else throw new IllegalArgumentException(s"cdcJoinStream: unknown side '${c.side}'")
      }
      val preImg = rightImage(rightIn)
      val postImg = rightImage(right)

      // strict-version mode: stamp every delta this key emits this
      // batch with a per-key strictly-increasing sequence (see
      // joinStream's doc) — captured as a local so the lazy output
      // iterators stay correct across keys
      val stamp: Long => Long =
        if (!strictVer) identity
        else {
          val seq = (if (seqSt.exists()) seqSt.get() else 0L) + 1
          seqSt.update(seq)
          _ => seq
        }

      // persist only what this batch changed (a hot key's untouched
      // left rows must not be rewritten to the state store every time
      // its right side blinks); tombstones kept — they fence late
      // lower-ver images — until the optional horizon below proves a
      // fence expired. Persisting BEFORE the sweep below is safe:
      // the sweep skips touched pks.
      touched.foreach { case (pk, (_, now)) => lrows.updateValue(pk, now) }
      if (right != null && (right ne rightIn)) rrow.update(right)

      // tombstone-horizon compaction (see object doc): maintain the
      // key's live/dead counts and high-water accepted LEFT ver from
      // the transitions this batch already computed, and force the
      // O(live+dead) removal pass only when dead slots outnumber
      // max(64, live) — amortized O(1) per change. Eager removal is
      // output-neutral: the sweep below skips dead slots, touchedOut
      // reads the in-memory map. A pre-horizon checkpoint restores
      // with empty TombMeta — counts rebuild from subsequent traffic
      // and compaction stays off until maxVer re-establishes (safe:
      // fences are only ever kept too long, never dropped early).
      tombstoneVerHorizon.foreach { h =>
        var m = Option(tombMeta.get()).getOrElse(TombMeta(0L, 0L, 0L))
        touched.foreach { case (_, (orig, now)) =>
          val wasLive = orig != null && orig.live
          if (now.ver > m.maxVer) m = m.copy(maxVer = now.ver)
          if (!now.live && (orig == null || wasLive)) m = m.copy(deadCnt = m.deadCnt + 1)
          else if (now.live && orig != null && !wasLive) m = m.copy(deadCnt = m.deadCnt - 1)
          if (now.live && !wasLive) m = m.copy(liveCnt = m.liveCnt + 1)
          else if (!now.live && wasLive) m = m.copy(liveCnt = m.liveCnt - 1)
        }
        if (m.deadCnt > math.max(64L, m.liveCnt))
          m = m.copy(deadCnt = m.deadCnt - Tombstones.compact(lrows, m.maxVer, h)(_.live, _.ver))
        tombMeta.update(m)
      }

      val touchedOut = touched.iterator.flatMap { case (pk, (orig, now)) =>
        diffTouched(k, pk, orig, now, preImg, postImg, right, stamp)
      }
      // right image changed -> every UNTOUCHED live match re-emits.
      // Streams the state iterator straight out; never materialized.
      val sweepOut: Iterator[JoinDelta] =
        if (preImg == postImg) Iterator.empty
        else lrows.iterator().flatMap { case (pk, s) =>
          if (touched.contains(pk) || !s.live) Iterator.empty
          else {
            val ver = stamp(pairVer(s, right))
            (preImg, postImg) match {
              case (Some(a), Some(b)) =>
                Iterator(JoinDelta("-U", pk, k, s.payload, a, ver),
                  JoinDelta("+U", pk, k, s.payload, b, ver))
              case (None, Some(b)) => Iterator.single(JoinDelta("+I", pk, k, s.payload, b, ver))
              case (Some(a), None) => Iterator.single(JoinDelta("-D", pk, k, s.payload, a, ver))
              case (None, None) => Iterator.empty
            }
          }
        }

      val padOut: Iterator[JoinDelta] = if (!rightOuter) Iterator.empty else {
        val m0 = Option(padMeta.get()).getOrElse(PadMeta(0L, Long.MinValue))
        var cntDelta = 0L
        touched.foreach { case (_, (orig, now)) =>
          cntDelta += (if (now.live) 1L else 0L) - (if (orig != null && orig.live) 1L else 0L)
        }
        val postCnt = m0.liveCnt + cntDelta
        val hiVer = math.max(m0.hiVer, batchMaxVer)
        padMeta.update(PadMeta(postCnt, hiVer))
        val prePad = rightIn != null && rightIn.live && m0.liveCnt == 0
        val postPad = right != null && right.live && postCnt == 0
        val padVer = stamp(hiVer)
        if (!prePad && postPad) Iterator.single(JoinDelta("+I", null, k, null, right.payload, padVer))
        else if (prePad && !postPad) Iterator.single(JoinDelta("-D", null, k, null, rightIn.payload, padVer))
        else if (prePad && postPad && rightIn.payload != right.payload)
          Iterator(JoinDelta("-U", null, k, null, rightIn.payload, padVer),
            JoinDelta("+U", null, k, null, right.payload, padVer))
        else Iterator.empty
      }

      touchedOut ++ sweepOut ++ padOut
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[JoinDelta] =
      Iterator.empty
  }

  /** Maintain the INNER equi-join view of two changelog streams (see
    * object doc for the contract). */
  def joinStream(changes: Dataset[JoinChange]): Dataset[JoinDelta] =
    joinStream(changes, "inner")

  /** `leftOuter` null-pads unmatched left rows and retracts the pad
    * when the right row arrives (Flink's outer dynamic-table join). */
  def joinStream(changes: Dataset[JoinChange], leftOuter: Boolean): Dataset[JoinDelta] =
    joinStream(changes, if (leftOuter) "left" else "inner")

  /** Mode-explicit variant: `mode` ∈ inner | left | right | full
    * (Flink's four dynamic-table join types — see object doc for
    * the right/full pad-row contract).
    *
    * `strictVer` — CASCADE mode (default off): emitted deltas carry a
    * per-join-key STRICTLY-INCREASING batch sequence as `ver` instead
    * of the pair's max-slot-ver stamp. The default stamp is monotone
    * but can PLATEAU (a dominant left ver rides through several right
    * updates), and a plateau is fatal one join downstream: the second
    * join folds its input per pk by (ver, op-rank), so a pair that
    * dies at stamp v in one batch and is reborn at the same v in a
    * later batch would fold to DEAD (the retained -D outranks +I at
    * equal ver). The strict sequence removes equal stamps across
    * batches entirely; within one batch a pair emits at most one
    * transition (-U/+U sharing the sequence value, disambiguated by
    * op rank — the standard Debezium shape). The sequence lives in
    * one extra per-key long of state, checkpointed with the batch, so
    * a replayed batch re-stamps identically. In strict mode `ver` is
    * an opaque per-key ordering token, not a source-version hint;
    * Flink's cascaded joins make the same trade (StreamRecord order
    * replaces any user-space version).
    *
    * `tombstoneVerHorizon` — the LEFT source's declared disorder
    * bound (None = dead slots kept forever, the safe default); see
    * the object doc's tombstone-retention paragraph. NOTE: in strict
    * mode the emitted `ver` is the per-key sequence but the horizon
    * still lives in the SOURCE left-ver domain (the fence compares
    * source vers). */
  def joinStream(changes: Dataset[JoinChange], mode: String,
      strictVer: Boolean = false,
      tombstoneVerHorizon: Option[Long] = None): Dataset[JoinDelta] = {
    tombstoneVerHorizon.foreach(h => require(h > 0, s"tombstoneVerHorizon must be positive: $h"))
    import changes.sparkSession.implicits._
    val (lo, ro) = mode match {
      case "inner" => (false, false)
      case "left" => (true, false)
      case "right" => (false, true)
      case "full" => (true, true)
      case other => throw new IllegalArgumentException(
        s"cdcJoinStream: unknown join mode '$other' (inner|left|right|full)")
    }
    changes
      .groupByKey(_.k)
      .transformWithState(new JoinProcessor(lo, ro, strictVer, tombstoneVerHorizon),
        TimeMode.None(), OutputMode.Append())
  }

  /** CASCADE adapter — Flink SQL's `A ⋈ B ⋈ C` over changelogs is a
    * chain of binary joins, each consuming the previous one's retract
    * stream; this turns [[joinStream]] output into the NEXT join's
    * LEFT-side changelog:
    *
    *  - entity identity downstream = the upstream PAIR (lpk, k) —
    *    `pairPk` must encode it injectively into a Long (the caller
    *    knows both key spaces; e.g. `d.lpk * K + d.k` for k < K). An
    *    fk move upstream then lives as two independent downstream
    *    entities dying/being born on their own shards, exactly like a
    *    direct fk move;
    *  - the next join key (`key2`) is read from the DELTA'S IMAGES —
    *    a -U/-D carries the pre-image payloads, so a retraction
    *    routes to the shard its old enriched row lives on (standard
    *    before-image routing, one level up);
    *  - ops pass through unchanged (+I/-U/+U/-D is already a
    *    well-formed retract grammar per pair);
    *  - `ver` passes through and MUST be the strict per-key sequence:
    *    run the upstream join with `strictVer = true` (loudly
    *    documented on [[joinStream]]; the default plateau-prone stamp
    *    can fold a cross-batch die/rebirth at equal stamps to dead).
    *
    * Right/full-outer pad rows (lpk = null) have no pair identity and
    * are rejected loudly — cascade from an inner or left join (Flink
    * cascades outer joins the same way: the null-padded row is a
    * regular retractable row THERE, but its identity is the pad key,
    * which this Long-keyed shape cannot carry). */
  def cascade(deltas: Dataset[JoinDelta], key2: JoinDelta => Long,
      pairPk: JoinDelta => Long, payload: JoinDelta => String): Dataset[JoinChange] = {
    import deltas.sparkSession.implicits._
    deltas.map { d =>
      if (d.lpk == null) throw new IllegalArgumentException(
        s"cascade: pad row (lpk = null, k = ${d.k}) cannot feed a cascaded join — " +
          "run the upstream join in inner or left mode")
      JoinChange("L", d.op, key2(d), pairPk(d), payload(d), d.ver)
    }
  }

  /** RANK adapter — feed the maintained join view into the
    * retractable Top-N ([[CdcTopNStream.topN]]): "top N enriched
    * facts per <dim attribute>, maintained" is Flink SQL's
    * `JOIN … ROW_NUMBER() OVER (PARTITION BY dim.attr)` pipeline.
    * Same contract as [[cascade]], restated for a RANKING consumer:
    *
    *  - downstream ENTITY identity = the upstream pair — `pairId`
    *    must pack (lpk, k) injectively. Do NOT use bare `lpk`: the
    *    Top-N fold compares stamps per entity, and the strict
    *    sequence is per JOIN KEY — an fk move would land the dying
    *    (lpk, k_old) and the newborn (lpk, k_new) on ONE entity with
    *    INCOMPARABLE stamps (two independent per-key sequences), so
    *    the kill could outrank the birth. Pair identity keeps every
    *    entity fed by exactly one key's sequence;
    *  - `grp`/`score` read the delta's IMAGES — a -U/-D carries
    *    pre-images, so retractions rank-route to the group the old
    *    enriched row occupies (before-image routing, the same rule
    *    the Top-N's own changelog input follows);
    *  - run the upstream join with `strictVer = true` (the default
    *    plateau-prone stamp can fold a cross-batch die/rebirth of a
    *    pair to dead — [[joinStream]]'s strictVer doc);
    *  - pad rows (lpk = null) loud-reject: a pad is a whole-key
    *    aggregate with no pair identity to rank. */
  def toRankChanges(deltas: Dataset[JoinDelta], grp: JoinDelta => String,
      pairId: JoinDelta => Long, score: JoinDelta => Double)
      : Dataset[CdcTopNStream.RankChange] = {
    import deltas.sparkSession.implicits._
    deltas.map { d =>
      if (d.lpk == null) throw new IllegalArgumentException(
        s"toRankChanges: pad row (lpk = null, k = ${d.k}) has no pair identity to rank — " +
          "run the upstream join in inner or left mode")
      CdcTopNStream.RankChange(d.op, grp(d), pairId(d), score(d), d.ver)
    }
  }

  /** ORDERED-AGGREGATE adapter — feed the maintained join view into
    * the retractable FIRST/LAST/LISTAGG
    * ([[CdcOrderedStream.cdcFirstLastStream]] /
    * [[CdcOrderedStream.cdcListAggStream]]): "the first/last/list of
    * enriched facts per <dim attribute>, maintained". Identical
    * contract to [[toRankChanges]] — pair identity (`pairId`
    * injective over (lpk, k)), images read from the delta
    * (before-image routing for retractions), upstream join run with
    * `strictVer = true`, pad rows loud-rejected. */
  def toOrdChanges(deltas: Dataset[JoinDelta], grp: JoinDelta => String,
      pairId: JoinDelta => Long, value: JoinDelta => Long)
      : Dataset[CdcOrderedStream.OrdChange] = {
    import deltas.sparkSession.implicits._
    deltas.map { d =>
      if (d.lpk == null) throw new IllegalArgumentException(
        s"toOrdChanges: pad row (lpk = null, k = ${d.k}) has no pair identity — " +
          "run the upstream join in inner or left mode")
      CdcOrderedStream.OrdChange(d.op, grp(d), pairId(d), value(d), d.ver)
    }
  }
}
