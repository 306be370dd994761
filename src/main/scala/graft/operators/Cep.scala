package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Complex-event patterns the reference's Flink deployments express
  * with CEP / MATCH_RECOGNIZE. The funnel (q73) covers the
  * sequence-PRESENCE shape; this operator covers the other CEP
  * flagship: ABSENCE — "A not followed by B within T" (cart
  * abandonment, missed heartbeat, SLA breach), the pattern plain
  * windowed SQL cannot express without a correlated anti-join.
  *
  * Batch form: one shuffle on `key`, one per-partition sort, then a
  * RANGE-frame running scan — for each row, the earliest response in
  * `(ts, ts + window]` (strictly after the anchor, inclusive at the
  * horizon, exact in integer microseconds). No self-join: the frame
  * scan is a sliding two-pointer pass per key, O(n + matches) per
  * partition, and the single exchange is on the same key every
  * downstream per-user op reuses. Streaming twin:
  * graft.streaming.AbsenceStream (keyed timers — the part of CEP
  * that NEEDS event-time timers: an alert fires because nothing
  * arrived).
  */
object Cep {

  /** Rows satisfying `isAnchor` with NO row of the same `key`
    * satisfying `isResponse` in `(ts, ts + windowUs]` (µs, strict
    * left bound: a response at exactly the anchor's timestamp does
    * not answer it; inclusive right bound). Returns the anchor rows
    * with their original columns. */
  def absence(events: DataFrame, key: Column, ts: Column,
      isAnchor: Column, isResponse: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"absence window must be positive: $windowUs")
    val us = unix_micros(ts)
    val w = Window.partitionBy(key).orderBy(us.asc).rangeBetween(1L, windowUs)
    events
      // rows that are neither anchor nor response cannot change the
      // result — dropping them BEFORE the window pushes the predicate
      // into the scan and shrinks the per-key sort to the pattern's
      // own rows (on a typical event mix that is most of the table)
      .filter(isAnchor || isResponse)
      .withColumn("__resp_us", min(when(isResponse, us)).over(w))
      .filter(isAnchor && col("__resp_us").isNull)
      .drop("__resp_us")
  }
}
