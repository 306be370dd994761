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

  /** POSITIVE CEP match with measures — Flink CEP
    * `begin(anchor).followedBy(response).within(T)` under AFTER MATCH
    * SKIP TO NEXT ROW (every anchor may match; responses are shared):
    * for every anchor row, the EARLIEST response of the same key in
    * `(ts, ts + windowUs]` (same strict-left/inclusive-right bounds
    * as [[absence]] — the two are complements on the anchor set),
    * ties broken by `id`. Measures: `n_mid` = count of `isMid` rows
    * STRICTLY between the anchor and its matched response in
    * (ts, id) order, and `dur_us` = response ts − anchor ts.
    *
    * Scale shape: NO inequality join — one shuffle on `key`, one
    * per-partition sort, then (a) a running `isMid` counter and (b) a
    * RANGE-frame `min` over a (us, id, counter) STRUCT, which carries
    * the earliest response's identity AND its counter image through
    * the frame in one pass. `n_mid` is the counter difference — the
    * same prefix-sum trick q81 uses, lifted into the frame min. The
    * three predicates must be mutually exclusive (an anchor that is
    * also a response would self-count) — loud-checked per row.
    * Output: (key, anchor_id, response_id, n_mid, dur_us). */
  def followedBy(events: DataFrame, key: Column, ts: Column, id: Column,
      isAnchor: Column, isResponse: Column, isMid: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"followedBy window must be positive: $windowUs")
    val us = unix_micros(ts)
    val wNext = Window.partitionBy(col("__key")).orderBy(col("__us").asc)
      .rangeBetween(1L, windowUs)
    // the exclusivity check rides the consumed columns (a dangling
    // check column would be pruned away with its raise_error)
    val boom = raise_error(lit(
      "followedBy: anchor/response/mid predicates must be mutually exclusive"))
    events
      .filter(isAnchor || isResponse || isMid)
      .select(key.as("__key"), id.as("__id"), us.as("__us"),
        when(isAnchor && (isResponse || isMid), boom).otherwise(isAnchor).as("__a"),
        when(isResponse && isMid, boom).otherwise(isResponse).as("__r"),
        isMid.as("__m"))
      .withColumn("__mids", count(when(col("__m"), lit(1))).over(
        Window.partitionBy(col("__key")).orderBy(col("__us").asc, col("__id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__resp", min(when(col("__r"),
        struct(col("__us"), col("__id"), col("__mids")))).over(wNext))
      .filter(col("__a") && col("__resp").isNotNull)
      .select(
        col("__key").as("key"),
        col("__id").as("anchor_id"),
        col("__resp.__id").as("response_id"),
        (col("__resp.__mids") - col("__mids")).as("n_mid"),
        (col("__resp.__us") - col("__us")).as("dur_us"))
  }

  /** STRICT-CONTIGUITY CEP match — Flink CEP
    * `begin(anchor).next(response).within(T)`: an anchor matches iff
    * its IMMEDIATELY following same-key event in (ts, id) order —
    * over ALL events, any intervening row of any type breaks the
    * pattern (that is what `next` means vs [[followedBy]]'s relaxed
    * contiguity) — satisfies `isResponse` and lands within
    * `windowUs`. Because contiguity is defined over the whole event
    * stream, no pre-filter is possible: every row is a potential
    * pattern-breaker and must reach the sort. One shuffle on `key` +
    * a `lead` window; no join, no frame scan. A row may be both
    * anchor and response (it can answer its predecessor and anchor
    * its own match) — no exclusivity constraint, same as Flink.
    * Output: (key, anchor_id, response_id, dur_us). Streaming twin:
    * graft.streaming.CepNextStream. */
  def next(events: DataFrame, key: Column, ts: Column, id: Column,
      isAnchor: Column, isResponse: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"next window must be positive: $windowUs")
    val us = unix_micros(ts)
    val w = Window.partitionBy(col("__key")).orderBy(col("__us").asc, col("__id").asc)
    events
      .select(key.as("__key"), id.as("__id"), us.as("__us"),
        isAnchor.as("__a"), isResponse.as("__r"))
      .withColumn("__nx", lead(struct(col("__us"), col("__id"), col("__r")), 1).over(w))
      .filter(col("__a") && col("__nx").isNotNull && col("__nx.__r") &&
        col("__nx.__us") - col("__us") <= windowUs)
      .select(col("__key").as("key"), col("__id").as("anchor_id"),
        col("__nx.__id").as("response_id"),
        (col("__nx.__us") - col("__us")).as("dur_us"))
  }
}
