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
  * must materialize on that identity, and `ver` must be strictly
  * increasing per source entity (CDC offset order) so cross-shard
  * emissions order correctly.
  *
  * The output is a TRUE retract stream: new join rows emit `+I`,
  * changed rows emit `-U`(old images) then `+U`(new), dead rows emit
  * `-D` — so it composes directly with [[Pipelines.cdcAggStream]]
  * (changelog in → maintained join → maintained aggregate, the full
  * Flink SQL pipeline). State per join key: the current row per left
  * pk (live or tombstoned, last-writer-wins by `ver` with changelog
  * op ranking) and one right slot — O(matching rows), the same state
  * Flink's join operator keeps; bound the pk space upstream (TTL,
  * partition retention) exactly as with cdcUpsertStream. */
object CdcJoinStream {

  /** `side` = "L"|"R"; for right rows `pk == k`. */
  case class JoinChange(side: String, op: String, k: Long, pk: Long,
      payload: String, ver: Long)
  /** Retract-stream delta of the join view; row identity = (lpk, k). */
  case class JoinDelta(op: String, lpk: Long, k: Long,
      left: String, right: String, ver: Long)

  /** Internal per-pk state image (public only because Spark's encoder
    * codegen must construct it). */
  case class Slot(ver: Long, rank: Int, payload: String, live: Boolean)

  private def opRank(op: String): Int = op match {
    case "-U" => 0
    case "+I" => 1
    case "+U" => 2
    case "-D" => 3
    case other => throw new IllegalArgumentException(s"cdcJoinStream: unknown row_kind '$other'")
  }

  private class JoinProcessor(leftOuter: Boolean) extends StatefulProcessor[Long, JoinChange, JoinDelta] {
    @transient private var lrows: MapState[Long, Slot] = _
    @transient private var rrow: ValueState[Slot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lrows = getHandle.getMapState[Long, Slot]("lrows",
        Encoders.scalaLong, Encoders.product[Slot], TTLConfig.NONE)
      rrow = getHandle.getValueState[Slot]("rrow", Encoders.product[Slot], TTLConfig.NONE)
    }

    /** last-writer-wins with changelog ordering at equal ver
      * (-U before +I/+U before -D) — cdcUpsertStream's rule. */
    private def wins(cur: Slot, ver: Long, rank: Int): Boolean =
      cur == null || ver > cur.ver || (ver == cur.ver && rank >= cur.rank)

    /** Current join rows; under leftOuter a dead/absent right pads
      * with null (Flink's null-padding — the pad RETRACTS via -U/+U
      * the moment the right row appears, because the diff sees the
      * pair change from (l, null) to (l, r)). */
    private def joinRows(left: Map[Long, Slot], right: Slot): Map[Long, (String, String)] =
      if (right == null || !right.live) {
        if (leftOuter) left.collect { case (lpk, s) if s.live => lpk -> ((s.payload, null: String)) }
        else Map.empty
      } else left.collect { case (lpk, s) if s.live => lpk -> ((s.payload, right.payload)) }

    override def handleInputRows(k: Long, rows: Iterator[JoinChange],
        timers: TimerValues): Iterator[JoinDelta] = {
      var left: Map[Long, Slot] = lrows.iterator().map(p => p._1 -> p._2).toMap
      var right: Slot = rrow.get()
      val rightIn = right
      val pre = joinRows(left, right)
      var maxVer = Long.MinValue
      val touched = scala.collection.mutable.Set.empty[Long]
      // fold in (ver, rank) order so intra-batch sequences net correctly
      rows.toSeq.sortBy(c => (c.ver, opRank(c.op))).foreach { c =>
        val rank = opRank(c.op)
        maxVer = math.max(maxVer, c.ver)
        val slot = Slot(c.ver, rank, c.payload, live = rank != 0 && rank != 3)
        if (c.side == "L") {
          if (wins(left.getOrElse(c.pk, null), c.ver, rank)) {
            left += c.pk -> slot
            touched += c.pk
          }
        } else {
          if (wins(right, c.ver, rank)) right = slot
        }
      }
      val post = joinRows(left, right)
      // persist only what this batch changed (a hot key's untouched
      // left rows must not be rewritten to the state store every time
      // its right side blinks); tombstones kept — they fence late
      // lower-ver images
      touched.foreach(lpk => lrows.updateValue(lpk, left(lpk)))
      if (right != null && (right ne rightIn)) rrow.update(right)
      // diff → retract deltas
      val out = Vector.newBuilder[JoinDelta]
      post.foreach { case (lpk, (l, r)) =>
        pre.get(lpk) match {
          case None => out += JoinDelta("+I", lpk, k, l, r, maxVer)
          case Some((pl, pr)) if pl != l || pr != r =>
            out += JoinDelta("-U", lpk, k, pl, pr, maxVer)
            out += JoinDelta("+U", lpk, k, l, r, maxVer)
          case _ => ()
        }
      }
      pre.foreach { case (lpk, (pl, pr)) =>
        if (!post.contains(lpk)) out += JoinDelta("-D", lpk, k, pl, pr, maxVer)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[JoinDelta] =
      Iterator.empty
  }

  /** Maintain the equi-join view of two changelog streams (see
    * object doc for the contract). Inner by default; `leftOuter`
    * null-pads unmatched left rows and retracts the pad when the
    * right row arrives (Flink's outer dynamic-table join). */
  def joinStream(changes: Dataset[JoinChange], leftOuter: Boolean = false): Dataset[JoinDelta] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.k)
      .transformWithState(new JoinProcessor(leftOuter), TimeMode.None(), OutputMode.Append())
  }
}
