package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming Window Top-N — Flink SQL's `WindowTopN` (rank the items
  * of each tumbling window, emit the top N once the window closes;
  * trending-topics / hot-keys dashboards over the reference's
  * DataGen-shaped event streams).
  *
  * Two chained stateful operators, both distributive:
  *  1. Spark's NATIVE windowed count in append mode — partial
  *     aggregation map-side, finalized (window, item, count) rows
  *     emit exactly once, when the watermark passes window end;
  *  2. a per-window ranking processor (transformWithState — the
  *     chaining of stateful operators that flatMapGroupsWithState
  *     forbids and StatefulProcessor supports). Append-mode window
  *     finalization delivers ALL of a window's rows in the same
  *     micro-batch, so the processor ranks and emits immediately.
  *     It is fully STATELESS — it relies on that one-batch delivery
  *     guarantee, and batch replays after a failure are handled by
  *     sink-side batch-id idempotence (re-ranking the same finalized
  *     rows is deterministic), not by any stored replay guard.
  *
  * The ranking step keys by window start — inherently one task per
  * window, like Flink's WindowTopN — but it sees |distinct items|
  * rows per window, not |events|: the heavy lifting happened in the
  * distributed count. Ties resolve by item asc (deterministic). */
object WindowTopNStream {

  case class WinCount(ws: Timestamp, item: String, cnt: Long)
  case class Ranked(ws: Timestamp, rank: Int, item: String, cnt: Long)

  private class RankProcessor(n: Int)
      extends StatefulProcessor[Timestamp, WinCount, Ranked] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = ()

    override def handleInputRows(ws: Timestamp, rows: Iterator[WinCount],
        timers: TimerValues): Iterator[Ranked] = {
      rows.toSeq
        .sortBy(r => (-r.cnt, r.item))
        .take(n)
        .zipWithIndex
        .map { case (r, i) => Ranked(ws, i + 1, r.item, r.cnt) }
        .iterator
    }

    override def handleExpiredTimer(key: Timestamp, timers: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Ranked] =
      Iterator.empty
  }

  /** Top-`n` items per tumbling `windowDur` window of a streaming
    * events relation, emitted once per window after the watermark
    * closes it. */
  def topN(events: DataFrame, windowDur: String, n: Int, watermark: String,
      itemCol: String = "event_type", tsCol: String = "ts"): Dataset[Ranked] = {
    val s = events.sparkSession
    import s.implicits._
    require(n > 0)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(itemCol).cast("string").as("item"))
      .count()
      // no re-watermark needed: append-mode agg output is already
      // finalized, and the rank step runs in TimeMode.None
      .select(col("window.start").as("ws"), col("item"), col("count").as("cnt"))
      .as[WinCount]
      .groupByKey(_.ws)
      .transformWithState(
        new RankProcessor(n), TimeMode.None(), OutputMode.Append())
  }
}
