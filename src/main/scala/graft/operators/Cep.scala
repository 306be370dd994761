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
      isAnchor: Column, isResponse: Column, isMid: Column, windowUs: Long): DataFrame =
    followedByMatches(events, key, ts, id, isAnchor, isResponse, isMid, windowUs)
      .select(col("key"), col("anchor_id"), col("response_id"),
        col("n_mid"), col("dur_us"))

  /** [[followedBy]]'s match set WITH the ordering evidence
    * (anchor/response (us, id)) that sequential AFTER-MATCH
    * strategies need — shared by [[followedBy]] and
    * [[skipPastLastRow]]. */
  private def followedByMatches(events: DataFrame, key: Column, ts: Column,
      id: Column, isAnchor: Column, isResponse: Column, isMid: Column,
      windowUs: Long): DataFrame = {
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
        col("__us").as("a_us"),
        col("__resp.__id").as("response_id"),
        col("__resp.__us").as("r_us"),
        (col("__resp.__mids") - col("__mids")).as("n_mid"),
        (col("__resp.__us") - col("__us")).as("dur_us"))
  }

  // not `private`: the Dataset encoder's generated projection must
  // reach the class from codegen'd code
  case class SeqMatch(key: Long, anchor_id: Long, a_us: Long,
      response_id: Long, r_us: Long, n_mid: Long, dur_us: Long)

  /** [[followedBy]] under AFTER MATCH SKIP PAST LAST ROW — Flink CEP's
    * non-overlapping strategy (`AfterMatchSkipStrategy.skipPastLastEvent`
    * / MATCH_RECOGNIZE's default): once a match completes at response
    * r, every event at or before r is CONSUMED — an anchor inside the
    * consumed span `(a, r]` never starts a match, and matching resumes
    * strictly after r. Because each kept match's response is still
    * "earliest response after MY anchor" (consumption only removes
    * candidate ANCHORS, never changes a later anchor's response), the
    * kept set is the GREEDY chain over [[followedBy]]'s matches in
    * (a_us, anchor_id) order: keep m iff its anchor is lexicographically
    * after the last kept match's (r_us, response_id).
    *
    * The chain is a sequential per-key fold — no window function can
    * express it — so the scale shape is the secondary-sort idiom: one
    * shuffle on `key`, a per-partition SORT (spill-safe, never an
    * in-heap group), and an O(1)-state linear scan with a per-key
    * barrier. Same output columns as [[followedBy]]; always a subset
    * of it. Streaming twin:
    * [[graft.streaming.CepMatchStream]] `skipPast = true`. */
  def skipPastLastRow(events: DataFrame, key: Column, ts: Column, id: Column,
      isAnchor: Column, isResponse: Column, isMid: Column, windowUs: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    followedByMatches(events, key, ts, id, isAnchor, isResponse, isMid, windowUs)
      .as[SeqMatch]
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("a_us"), col("anchor_id"))
      .mapPartitions { it =>
        var curKey = Long.MinValue
        var first = true
        var barUs = Long.MinValue
        var barId = Long.MinValue
        it.filter { m =>
          if (first || m.key != curKey) {
            curKey = m.key; first = false
            barUs = Long.MinValue; barId = Long.MinValue
          }
          val keep = m.a_us > barUs || (m.a_us == barUs && m.anchor_id > barId)
          if (keep) { barUs = m.r_us; barId = m.response_id }
          keep
        }
      }
      .select($"key", $"anchor_id", $"response_id", $"n_mid", $"dur_us")
  }

  /** TIMED-OUT PARTIAL MATCH with measures — Flink CEP's timeout side
    * output (`PatternStream.select(timeoutTag, PatternTimeoutFunction,
    * …)` / TimedOutPartialMatchHandler): for every `isAnchor` row with
    * NO `isResponse` row in the us-window `(ts, ts + windowUs]`, emit
    * the partial match's measures — here the count of `isMid` rows the
    * pattern observed inside the full window before timing out. The
    * complement of [[followedBy]] on the same corpus: each anchor is
    * EITHER a match there or a timeout here, never both or neither.
    *
    * Window bounds are us-only, matching [[absence]]'s rule (a
    * response or mid at the anchor's exact µs is outside the window —
    * strict left, inclusive right); [[followedBy]]'s BETWEEN-measure
    * counts in (us, id) order instead, because there the span's right
    * end is a specific row, not a time.
    *
    * One key shuffle, ONE shared RANGE frame serving both the
    * response-existence test and the mid count — no join, no second
    * pass. Output: (key, anchor_id, n_mid). Streaming twin:
    * [[graft.streaming.CepMatchStream.matchesWithTimeouts]]. */
  def timeout(events: DataFrame, key: Column, ts: Column, id: Column,
      isAnchor: Column, isResponse: Column, isMid: Column, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"timeout window must be positive: $windowUs")
    val us = unix_micros(ts)
    val wNext = Window.partitionBy(col("__key")).orderBy(col("__us").asc)
      .rangeBetween(1L, windowUs)
    val boom = raise_error(lit(
      "timeout: anchor/response/mid predicates must be mutually exclusive"))
    events
      .filter(isAnchor || isResponse || isMid)
      .select(key.as("__key"), id.as("__id"), us.as("__us"),
        when(isAnchor && (isResponse || isMid), boom).otherwise(isAnchor).as("__a"),
        when(isResponse && isMid, boom).otherwise(isResponse).as("__r"),
        isMid.as("__m"))
      .withColumn("__nresp", count(when(col("__r"), lit(1))).over(wNext))
      .withColumn("__nmid", count(when(col("__m"), lit(1))).over(wNext))
      .filter(col("__a") && col("__nresp") === 0L)
      .select(
        col("__key").as("key"),
        col("__id").as("anchor_id"),
        col("__nmid").as("n_mid"))
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
  /** LOOPING-pattern CEP match — Flink CEP
    * `begin(anchor).oneOrMore().greedy().within(gap)` / MATCH_RECOGNIZE
    * `PATTERN (A+)` with measures over the loop: MAXIMAL runs of
    * consecutive same-key `isAnchor` events — strict contiguity in
    * (ts, id) order over ALL events (any intervening row of any type
    * breaks the run, the [[next]] rule lifted to a loop) — where each
    * consecutive pair lands within `gapUs` (the decidable per-step
    * reading of `within`: a stream can close a run at watermark
    * `last + gap` without waiting for a terminator row). Runs shorter
    * than `minLen` are dropped (Flink's `times(minLen, ∞)`).
    *
    * Scale shape: one shuffle on `key`, then three window passes over
    * the SAME (us, id) sort and a groupBy on (key, run) that the key
    * partitioning already satisfies — ONE exchange total, no join.
    * No pre-filter (every row is a potential breaker, as [[next]]).
    * Output: (key, start_id, end_id, n, dur_us) — first/last event of
    * the run, its length, its time span. Streaming twin:
    * graft.streaming.CepRunsStream. */
  def runs(events: DataFrame, key: Column, ts: Column, id: Column,
      isAnchor: Column, gapUs: Long, minLen: Int): DataFrame = {
    require(gapUs > 0, s"runs gap must be positive: $gapUs")
    require(minLen >= 1, s"runs minLen must be >= 1: $minLen")
    val us = unix_micros(ts)
    val wAll = Window.partitionBy(col("__key")).orderBy(col("__us").asc, col("__id").asc)
    events
      .select(key.as("__key"), id.as("__id"), us.as("__us"), isAnchor.as("__a"))
      // the run-break decision needs the previous row over ALL events
      .withColumn("__prev", lag(struct(col("__us"), col("__a")), 1).over(wAll))
      .filter(col("__a"))
      .withColumn("__new", (col("__prev").isNull || !col("__prev.__a") ||
        col("__us") - col("__prev.__us") > gapUs).cast("int"))
      // run id = prefix count of run starts among this key's anchors;
      // same sort, same partitioning — no new exchange
      .withColumn("__run", sum(col("__new")).over(
        wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__key"), col("__run"))
      .agg(
        min(struct(col("__us"), col("__id"))).as("__first"),
        max(struct(col("__us"), col("__id"))).as("__last"),
        count(lit(1)).as("n"))
      .filter(col("n") >= minLen)
      .select(col("__key").as("key"),
        col("__first.__id").as("start_id"), col("__last.__id").as("end_id"),
        col("n"), (col("__last.__us") - col("__first.__us")).as("dur_us"))
  }

  /** MATCH_RECOGNIZE multi-variable pattern with measures — the
    * canonical Flink SQL example, `PATTERN (STRT PRICE_DOWN+
    * PRICE_UP+)` over a per-key value series: a maximal STRICTLY
    * decreasing run immediately followed by a maximal strictly
    * increasing run, in (ts, id) order. A flat step (equal values)
    * matches neither variable and breaks the pattern, as does a
    * session break (consecutive rows further apart than
    * `sessionGapUs` — the bound that makes greedy `UP+` decidable on
    * a stream: without it, the last ascent of a dormant key never
    * proves maximal; Flink's `within` plays the same role).
    *
    * Scale shape: one shuffle on `key`; lag for the step direction,
    * prefix-sum block ids (runs of equal direction), a groupBy on
    * (key, block) and a lead over blocks — the key partitioning
    * satisfies every stage, so ONE exchange, no join, and measures
    * are running aggregates (a block is never materialized as rows).
    *
    * Output: (key, start_id, bottom_id, end_id, start_val,
    * bottom_val, end_val, n_down, n_up) — the peak row (the row
    * BEFORE the first down step), the bottom, the last up row, their
    * values, and the two run lengths (in steps). Adjacent matches may
    * share the peak/end row (Flink's AFTER MATCH SKIP TO LAST UP
    * chaining). Streaming twin: graft.streaming.MatchVStream. */
  def vPattern(events: DataFrame, key: Column, ts: Column, id: Column,
      value: Column, sessionGapUs: Long): DataFrame = {
    require(sessionGapUs > 0, s"vPattern session gap must be positive: $sessionGapUs")
    val us = unix_micros(ts)
    val wAll = Window.partitionBy(col("__key")).orderBy(col("__us").asc, col("__id").asc)
    val wCum = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBlk = Window.partitionBy(col("__key")).orderBy(col("__blk").asc)
    events
      .select(key.as("__key"), id.as("__id"), us.as("__us"), value.as("__v"))
      .withColumn("__prev", lag(struct(col("__us"), col("__id"), col("__v")), 1).over(wAll))
      // step direction vs the predecessor; null = session start
      .withColumn("__dir",
        when(col("__prev").isNull ||
          col("__us") - col("__prev.__us") > sessionGapUs, lit(null).cast("int"))
          .when(col("__v") < col("__prev.__v"), lit(-1))
          .when(col("__v") > col("__prev.__v"), lit(1))
          .otherwise(lit(0)))
      // consecutive equal-direction rows form one block
      .withColumn("__nb", (!(col("__dir") <=> lag(col("__dir"), 1).over(wAll))).cast("int"))
      .withColumn("__blk", sum(col("__nb")).over(wCum))
      .groupBy(col("__key"), col("__blk"))
      .agg(
        min(col("__dir")).as("__dir"), // uniform within a block
        count(lit(1)).as("__n"),
        // first row's predecessor IS the descent's peak
        min(struct(col("__us"), col("__id"),
          col("__prev.__id").as("__pid"), col("__prev.__v").as("__pv"))).as("__f"),
        max(struct(col("__us"), col("__id"), col("__v"))).as("__l"))
      .withColumn("__nxt", lead(struct(col("__dir"), col("__n"), col("__l")), 1).over(wBlk))
      .filter(col("__dir") === -1 && col("__nxt.__dir") === 1)
      .select(col("__key").as("key"),
        col("__f.__pid").as("start_id"), col("__l.__id").as("bottom_id"),
        col("__nxt.__l.__id").as("end_id"),
        col("__f.__pv").as("start_val"), col("__l.__v").as("bottom_val"),
        col("__nxt.__l.__v").as("end_val"),
        col("__n").as("n_down"), col("__nxt.__n").as("n_up"))
  }

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
