package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Continuous Top-N with retractions — Flink SQL's Top-N over an
  * append stream (`SELECT ... FROM (SELECT *, ROW_NUMBER() OVER
  * (PARTITION BY grp ORDER BY score DESC) rn ...) WHERE rn <= N` on
  * unbounded input): maintain each group's current top N as rows
  * arrive, emitting a retract stream of MEMBERSHIP changes — `+I`
  * when a row enters the top N, `-D` when it is evicted. A
  * downstream materializer (or upsert sink keyed on (grp, id)) holds
  * exactly the current top N at every micro-batch boundary.
  *
  * This is Flink's "no ranking output" optimized mode deliberately:
  * emitting rank NUMBERS would turn one insertion at rank 1 into N
  * re-emissions (every rank shifts); emitting membership keeps
  * output O(changes) and the consumer orders the N rows itself —
  * the optimization Flink applies when the outer query doesn't
  * project `rn`.
  *
  * State per group: exactly N (id, score) entries — bounded and tiny
  * regardless of stream depth, because on an APPEND stream a row
  * that falls below the N-th can never re-enter (scores are facts,
  * not updates; for changelog input — scores that change or retract
  * — the per-key multiset state of [[Pipelines.cdcMinMaxStream]] is
  * the right shape instead, and N-best generalizes the same way).
  * Row identity is `id`; a duplicate id keeps its best score
  * (idempotent re-delivery safe — and a better late score for an id
  * already IN the top N updates its stored rank position without a
  * membership emission, since membership did not change; deltas
  * carry the score at entry time). Ordering is deterministic:
  * (score desc, id asc) — same tie rule as batch q04.
  */
object TopNRetractStream {

  case class ScoredRow(grp: String, id: Long, score: Double)
  /** `op` = "+I" (entered top N) | "-D" (evicted). */
  case class TopNDelta(op: String, grp: String, id: Long, score: Double)
  /** State entry (public for encoder codegen). */
  case class TopEntry(id: Long, score: Double)

  private class TopNProcessor(n: Int)
      extends StatefulProcessor[String, ScoredRow, TopNDelta] {
    @transient private var top: ListState[TopEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      top = getHandle.getListState[TopEntry]("top",
        Encoders.product[TopEntry], TTLConfig.NONE)

    override def handleInputRows(grp: String, rows: Iterator[ScoredRow],
        timers: TimerValues): Iterator[TopNDelta] = {
      val cur = top.get().toSeq
      // candidates = current members + batch rows, best score per id
      val best = scala.collection.mutable.Map.empty[Long, Double]
      cur.foreach(e => best(e.id) = e.score)
      rows.foreach { r =>
        if (!best.get(r.id).exists(_ >= r.score)) best(r.id) = r.score
      }
      val next = best.toSeq.map { case (id, s) => TopEntry(id, s) }
        .sortBy(e => (-e.score, e.id)).take(n)
      top.clear()
      if (next.nonEmpty) top.appendList(next.toArray)
      val curIds = cur.map(_.id).toSet
      val nextIds = next.map(_.id).toSet
      val out =
        next.filter(e => !curIds.contains(e.id))
          .map(e => TopNDelta("+I", grp, e.id, e.score)) ++
        cur.filter(e => !nextIds.contains(e.id))
          .map(e => TopNDelta("-D", grp, e.id, e.score))
      out.iterator
    }

    override def handleExpiredTimer(key: String, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[TopNDelta] =
      Iterator.empty
  }

  /** Maintain each group's top `n` rows by score over an append
    * stream (see object doc for the membership-changelog contract). */
  def topN(rows: Dataset[ScoredRow], n: Int): Dataset[TopNDelta] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.grp)
      .transformWithState(new TopNProcessor(n), TimeMode.None(), OutputMode.Append())
  }
}
