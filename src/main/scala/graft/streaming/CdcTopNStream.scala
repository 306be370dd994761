package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Continuous Top-N over a CHANGELOG — Flink SQL's retractable Top-N
  * (RetractableTopNFunction): the ranking input is itself a
  * dynamic table (+I/+U/-U/-D per entity), so a retraction of the
  * current #1 must surface the next-best LIVE entity. This is the
  * changelog half of the Top-N split: [[TopNRetractStream]] serves
  * append streams with exactly-N state; here the honest price is
  * per-group state O(live entities) — the same retractable /
  * non-retractable cost split as cdcAggStream (O(groups)) vs
  * cdcMinMaxStream (O(distinct values)), because "the next-best
  * after a retraction" is unknowable from bounded state.
  *
  * Entity state: one slot per id (tombstone-fenced last-writer-wins
  * by `ver` with changelog op ranking — the shared CDC rule), held
  * in MapState so a batch touches only its own ids. The current
  * top-N rides a separate N-entry list. Per-batch cost is
  * INCREMENTAL whenever the batch only inserts/raises entities: a
  * candidate either beats the stored N-th (evicting a KNOWN member)
  * or it doesn't — O(touched), no scan. Only a batch that kills or
  * demotes a CURRENT MEMBER pays a rebuild, and the rebuild streams
  * `slots.iterator()` through an N-entry accumulator — O(live) compute
  * with O(N) heap, never a materialized copy (the CdcJoinStream
  * skew rule). Flink pays the equivalent log-structured cost in its
  * TreeMap-backed state; a RocksDB MapState has no sorted index to
  * exploit, so the demote-rebuild is the honest translation.
  *
  * Output: membership changelog of the top-N (+I entered / -D left)
  * — the same "no ranking field" contract as [[TopNRetractStream]];
  * a downstream materializer on (grp, id) holds the current top N.
  * Ordering (score desc, id asc), ties and re-deliveries
  * deterministic.
  */
object CdcTopNStream {

  /** Changelog row about entity `id` in group `grp`; `-U`/`-D` carry
    * the before-image score (standard CDC before-image routing). */
  case class RankChange(op: String, grp: String, id: Long, score: Double, ver: Long)
  /** Membership delta of the maintained top-N view. */
  case class RankDelta(op: String, grp: String, id: Long, score: Double)
  /** Per-entity slot (public for encoder codegen). */
  case class RankSlot(ver: Long, rank: Int, score: Double, live: Boolean)
  /** Stored top-N entry (public for encoder codegen). */
  case class RankEntry(id: Long, score: Double)

  // the shared changelog ordering rule — ONE definition
  private def opRank(op: String): Int = graft.operators.Cdc.opRank(op)

  private class Proc(n: Int) extends StatefulProcessor[String, RankChange, RankDelta] {
    @transient private var slots: MapState[Long, RankSlot] = _
    @transient private var top: ListState[RankEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      slots = getHandle.getMapState[Long, RankSlot]("slots",
        Encoders.scalaLong, Encoders.product[RankSlot], TTLConfig.NONE)
      top = getHandle.getListState[RankEntry]("top",
        Encoders.product[RankEntry], TTLConfig.NONE)
    }

    private def wins(cur: RankSlot, ver: Long, rank: Int): Boolean =
      cur == null || graft.operators.Cdc.changelogWins(cur.ver, cur.rank, ver, rank)

    /** best-first ordering */
    private def beats(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean =
      aScore > bScore || (aScore == bScore && aId < bId)

    override def handleInputRows(grp: String, rows: Iterator[RankChange],
        timers: TimerValues): Iterator[RankDelta] = {
      val cur = top.get().toSeq // best-first invariant
      val curIds = cur.map(_.id).toSet
      // fold the batch per id (point lookups only)
      val touched = scala.collection.mutable.LinkedHashMap.empty[Long, RankSlot]
      rows.toSeq.sortBy(c => (c.ver, opRank(c.op))).foreach { c =>
        val rank = opRank(c.op)
        val curSlot = touched.getOrElse(c.id, slots.getValue(c.id))
        if (wins(curSlot, c.ver, rank))
          touched(c.id) = RankSlot(c.ver, rank, c.score, live = rank == 1 || rank == 2)
      }
      touched.foreach { case (id, s) => slots.updateValue(id, s) }
      // a batch that kills or DEMOTES a current member needs the
      // next-best live entity — only the full slot scan knows it
      val curScore = cur.map(e => e.id -> e.score).toMap
      val rebuild = touched.exists { case (id, s) =>
        curIds.contains(id) && (!s.live || s.score < curScore(id))
      }
      val next: Seq[RankEntry] =
        if (rebuild) {
          // streamed O(live) scan, O(N) heap: bounded insertion buffer
          val buf = scala.collection.mutable.ArrayBuffer.empty[RankEntry]
          slots.iterator().foreach { case (id, s) =>
            if (s.live) {
              val e = RankEntry(id, s.score)
              if (buf.size < n || beats(e.score, e.id, buf.last.score, buf.last.id)) {
                val at = buf.indexWhere(b => beats(e.score, e.id, b.score, b.id))
                if (at < 0) buf.append(e) else buf.insert(at, e)
                if (buf.size > n) buf.remove(n)
              }
            }
          }
          buf.toSeq
        } else {
          // incremental: merge live touched candidates into the stored
          // top — untouched non-members were below the old bar and the
          // bar only rises on an insert-only batch
          val merged = scala.collection.mutable.Map.empty[Long, Double]
          cur.foreach(e => merged(e.id) = e.score)
          touched.foreach { case (id, s) =>
            if (s.live && (!merged.contains(id) || s.score > merged(id))) merged(id) = s.score
          }
          merged.toSeq.map { case (id, sc) => RankEntry(id, sc) }
            .sortWith((a, b) => beats(a.score, a.id, b.score, b.id)).take(n)
        }
      top.clear()
      if (next.nonEmpty) top.appendList(next.toArray)
      val nextIds = next.map(_.id).toSet
      (next.filter(e => !curIds.contains(e.id)).map(e => RankDelta("+I", grp, e.id, e.score)) ++
        cur.filter(e => !nextIds.contains(e.id)).map(e => RankDelta("-D", grp, e.id, e.score))).iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[RankDelta] =
      Iterator.empty
  }

  /** Maintain each group's top `n` LIVE entities by score over a
    * changelog stream (see object doc for the contract). */
  def topN(changes: Dataset[RankChange], n: Int): Dataset[RankDelta] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.grp)
      .transformWithState(new Proc(n), TimeMode.None(), OutputMode.Append())
  }
}
