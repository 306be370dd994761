package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Cep
import graft.sources.Tables

/** Behavioral event analytics over the `events` stream table: funnel
  * conversion and retention cohorts — the two queries every
  * product-analytics deployment of the reference's event pipelines
  * (DataGen2Doris/DataGen2ES-shaped click/view/purchase streams) ends
  * up running downstream.
  *
  * Both are pure multi-stage aggregations keyed on `user_id`:
  * per-step event-type predicates push into the parquet scan (only
  * the step's rows are ever read), every stage aggregates or joins on
  * the SAME key so the planner reuses the hash partitioning across
  * stages instead of re-shuffling, and no stage ever materializes a
  * per-user event list — state per user is O(steps) timestamps, so
  * the shape survives a 100 TB events table. Semantics are integer-
  * exact (µs timestamp comparisons, integer week arithmetic), so the
  * DuckDB oracles replay them bit-for-bit.
  */
object FunnelQ extends QueryPack {

  private val WeekUs = 604800000000L // 7 * 24 * 3600 * 1_000_000
  private val DayUs = 86400000000L // 24 * 3600 * 1_000_000

  def defs: Map[String, Q] = Map(
    // view -> click -> purchase conversion within 7 days of the FIRST
    // view: step k's timestamp is the earliest qualifying event
    // STRICTLY AFTER step k-1, inside the window anchored at step 1
    // (the standard ordered-funnel semantics). Output: users reaching
    // each step. Each step = one filtered agg + one user-key join;
    // the per-user state is two timestamps, never an event list.
    "q73_funnel_conversion" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
      val wnd = expr("INTERVAL 7 DAYS")
      val s1 = graft.CachePool.cache(
        ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts").as("s1")))
      val s2 = graft.CachePool.cache(
        ev.filter($"event_type" === "click").join(s1, "user_id")
          .filter($"ts" > $"s1" && $"ts" <= $"s1" + wnd)
          .groupBy($"user_id").agg(min($"ts").as("s2"), min($"s1").as("s1")))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ts" > $"s2" && $"ts" <= $"s1" + wnd)
        .groupBy($"user_id").agg(min($"ts").as("s3"))
      s1.agg(count(lit(1)).as("users")).withColumn("step", lit(1))
        .unionByName(s2.agg(count(lit(1)).as("users")).withColumn("step", lit(2)))
        .unionByName(s3.agg(count(lit(1)).as("users")).withColumn("step", lit(3)))
        .select($"step", $"users")
    }),

    // CEP absence pattern (Flink CEP notFollowedBy / MATCH_RECOGNIZE
    // timeout): clicks with NO purchase by the same user within 24
    // hours — cart abandonment over the events stream. Strict left
    // bound (a purchase at the click's exact µs does not answer it),
    // inclusive 24 h horizon, exact integer-µs arithmetic both
    // engines. Streaming twin: stream_absence (AbsenceStream).
    "q76_absence_alert" -> ((s, d) => {
      import s.implicits._
      Cep.absence(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts",
        isAnchor = $"event_type" === "click",
        isResponse = $"event_type" === "purchase",
        windowUs = DayUs)
        .select($"user_id", $"event_id", $"ts")
    }),

    // POSITIVE CEP match with measures (round 13; Flink CEP
    // begin(error).followedBy(click).within(24h) under AFTER MATCH
    // SKIP TO NEXT ROW — the complement of q76's absence on the same
    // bounds): every error matched to the EARLIEST same-user click in
    // the next 24 h, measuring the views in between and the match
    // duration. No inequality join — one user shuffle, running mid
    // counter + RANGE-frame struct-min carrying the response identity
    // AND counter image; n_mid is a counter difference (q81's
    // prefix-sum trick lifted into the frame min).
    "q88_cep_match" -> ((s, d) => {
      import s.implicits._
      Cep.followedBy(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        isAnchor = $"event_type" === "error",
        isResponse = $"event_type" === "click",
        isMid = $"event_type" === "view",
        windowUs = DayUs)
    }),

    // AFTER MATCH SKIP PAST LAST ROW (round 13; Flink CEP's
    // non-overlapping skip strategy / MATCH_RECOGNIZE's default —
    // q88 is the same pattern under SKIP TO NEXT ROW, so the two
    // queries pin the strategy axis on one corpus): once an error
    // matches a click, every event at or before that click is
    // CONSUMED — an error inside the consumed span never starts a
    // match. The kept set is the greedy chain over q88's matches; no
    // window function expresses the sequential dependency, so the
    // batch shape is the secondary-sort idiom (shuffle on user, sort,
    // O(1)-state scan). Always a subset of q88.
    "q102_cep_skip_past" -> ((s, d) => {
      import s.implicits._
      Cep.skipPastLastRow(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        isAnchor = $"event_type" === "error",
        isResponse = $"event_type" === "click",
        isMid = $"event_type" === "view",
        windowUs = DayUs)
    }),

    // TIMED-OUT PARTIAL MATCH side output (round 13; Flink CEP's
    // timeout tag — PatternStream.select(timeoutTag,
    // PatternTimeoutFunction, selectFn) / TimedOutPartialMatchHandler):
    // q88's complement on the same corpus and bounds — every error
    // with NO same-user click in the next 24 h, measuring the views
    // the partial match observed inside the full window before it
    // timed out. q76's absence tells you WHICH anchors died; the
    // timeout side output also carries the partial match's MEASURES
    // (what the pattern saw), which is what Flink's handler exists
    // for. Every error anchor lands in exactly one of q88 ∪ q99.
    "q99_cep_timeout" -> ((s, d) => {
      import s.implicits._
      Cep.timeout(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        isAnchor = $"event_type" === "error",
        isResponse = $"event_type" === "click",
        isMid = $"event_type" === "view",
        windowUs = DayUs)
    }),

    // STRICT-CONTIGUITY CEP match (round 13; Flink CEP
    // begin(error).next(click).within(24h) — `next` vs q88's relaxed
    // `followedBy`: ANY intervening event of any type breaks the
    // pattern, so no pre-filter is possible and every row reaches the
    // per-user sort as a potential breaker). One user shuffle + a
    // lead() window — no join, no frame scan. Same 24 h bound as
    // q76/q88, closing the contiguity-mode trio on one corpus.
    "q93_cep_next" -> ((s, d) => {
      import s.implicits._
      Cep.next(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        isAnchor = $"event_type" === "error",
        isResponse = $"event_type" === "click",
        windowUs = DayUs)
    }),

    // LOOPING CEP pattern (round 13; Flink CEP oneOrMore/times —
    // `begin(click).oneOrMore().greedy()` with a 24 h per-step gap
    // bound): MAXIMAL runs of consecutive clicks per user — strict
    // contiguity in (ts, id) order over ALL events (any intervening
    // event breaks the run; q93's rule lifted to a loop), consecutive
    // pairs within 24 h, runs of length >= 2 kept. One user shuffle,
    // three window passes + a groupBy the same partitioning already
    // satisfies — no join, one exchange.
    "q94_cep_times" -> ((s, d) => {
      import s.implicits._
      Cep.runs(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"event_type"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        isAnchor = $"event_type" === "click",
        gapUs = DayUs, minLen = 2)
    }),

    // MATCH_RECOGNIZE V-pattern (round 13; the canonical Flink SQL
    // example — PATTERN (STRT PRICE_DOWN+ PRICE_UP+) with measures):
    // per user over the event `value` series in (ts, id) order, every
    // maximal strictly-decreasing run immediately followed by a
    // maximal strictly-increasing run; flat steps and session breaks
    // (> 24 h between consecutive rows) break the pattern. One user
    // shuffle; blocks, their collapse, and the block-adjacency lead
    // all ride the same key partitioning.
    "q95_match_v" -> ((s, d) => {
      import s.implicits._
      Cep.vPattern(
        Tables.events(s, d).select($"user_id", $"event_id", $"ts", $"value"),
        key = $"user_id", ts = $"ts", id = $"event_id",
        value = $"value", sessionGapUs = DayUs)
    }),

    // Weekly retention cohorts: cohort = the user's first-seen week,
    // cell (cohort_week, week_offset) counts distinct users active
    // that many weeks later. Week indices are integer µs division —
    // no calendar/timezone arithmetic to drift between engines. The
    // exact distinct is two-phase (partial per partition); at extreme
    // user cardinality the q67 KMV sketch is the drop-in bounded-state
    // alternative.
    "q74_retention_cohorts" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"user_id", unix_micros($"ts").as("us"))
      val first = ev.groupBy($"user_id").agg(min($"us").as("first_us"))
      ev.join(first, "user_id")
        .select($"user_id",
          expr(s"first_us div $WeekUs").as("cohort_week"),
          expr(s"(us - first_us) div $WeekUs").as("week_offset"))
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("users"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q73_funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t, min(s1.t) AS t0
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click'
        |    AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 7 DAY
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND e.ts > s2.t AND e.ts <= s2.t0 + INTERVAL 7 DAY
        |  GROUP BY 1)
        |SELECT 1 AS step, count(*) AS users FROM s1
        |UNION ALL SELECT 2, count(*) FROM s2
        |UNION ALL SELECT 3, count(*) FROM s3""".stripMargin,

    // anti-join replay of the absence pattern: a correct range-frame
    // scan must agree with the naive NOT EXISTS
    "q76_absence_alert" ->
      s"""SELECT e.user_id, e.event_id, e.ts FROM events e
         |WHERE e.event_type = 'click' AND NOT EXISTS (
         |  SELECT 1 FROM events p
         |  WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
         |    AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) + 1
         |                           AND epoch_us(e.ts) + $DayUs)""".stripMargin,

    "q88_cep_match" ->
      s"""WITH pe AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events WHERE event_type IN ('error', 'click', 'view')),
         |runs AS (
         |  SELECT *, count(*) FILTER (WHERE event_type = 'view') OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS mids
         |  FROM pe)
         |SELECT a.user_id AS key, a.event_id AS anchor_id,
         |  c.event_id AS response_id,
         |  c.mids - a.mids AS n_mid, c.us - a.us AS dur_us
         |FROM runs a JOIN runs c
         |  ON c.user_id = a.user_id
         | AND a.event_type = 'error' AND c.event_type = 'click'
         | AND c.us BETWEEN a.us + 1 AND a.us + $DayUs
         |QUALIFY row_number() OVER (
         |  PARTITION BY a.user_id, a.event_id ORDER BY c.us, c.event_id) = 1""".stripMargin,

    // greedy-chain replay: q88's match set, a precomputed next-kept
    // pointer (first match whose anchor clears a given match's
    // response), and a recursive CTE walking the pointers from each
    // key's first match — the sequential dependency no window can
    // express, spelled as pointer-chasing so the recursion carries
    // no aggregates
    "q102_cep_skip_past" ->
      s"""WITH RECURSIVE pe AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events WHERE event_type IN ('error', 'click', 'view')),
         |runs AS (
         |  SELECT *, count(*) FILTER (WHERE event_type = 'view') OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS mids
         |  FROM pe),
         |m AS (
         |  SELECT a.user_id AS key, a.event_id AS anchor_id, a.us AS a_us,
         |    c.event_id AS response_id, c.us AS r_us,
         |    c.mids - a.mids AS n_mid, c.us - a.us AS dur_us
         |  FROM runs a JOIN runs c
         |    ON c.user_id = a.user_id
         |   AND a.event_type = 'error' AND c.event_type = 'click'
         |   AND c.us BETWEEN a.us + 1 AND a.us + $DayUs
         |  QUALIFY row_number() OVER (
         |    PARTITION BY a.user_id, a.event_id ORDER BY c.us, c.event_id) = 1),
         |nxt AS (
         |  SELECT a.key, a.anchor_id, b.anchor_id AS next_id
         |  FROM m a JOIN m b
         |    ON a.key = b.key
         |   AND (b.a_us > a.r_us OR (b.a_us = a.r_us AND b.anchor_id > a.response_id))
         |  QUALIFY row_number() OVER (
         |    PARTITION BY a.key, a.anchor_id ORDER BY b.a_us, b.anchor_id) = 1),
         |kept AS (
         |  SELECT key, anchor_id FROM (
         |    SELECT key, anchor_id, row_number() OVER (
         |      PARTITION BY key ORDER BY a_us, anchor_id) AS rn FROM m)
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT n.key, n.next_id FROM kept k
         |  JOIN nxt n ON n.key = k.key AND n.anchor_id = k.anchor_id)
         |SELECT m.key, m.anchor_id, m.response_id, m.n_mid, m.dur_us
         |FROM m JOIN kept USING (key, anchor_id)""".stripMargin,

    // frame replay of the timeout side: both the response-existence
    // test and the mid measure from one RANGE frame, as in Spark
    "q99_cep_timeout" ->
      s"""WITH pe AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type
         |  FROM events WHERE event_type IN ('error', 'click', 'view')),
         |f AS (
         |  SELECT *,
         |    count(*) FILTER (WHERE event_type = 'click') OVER w AS nresp,
         |    count(*) FILTER (WHERE event_type = 'view') OVER w AS nmid
         |  FROM pe
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us
         |               RANGE BETWEEN 1 FOLLOWING AND $DayUs FOLLOWING))
         |SELECT user_id AS key, event_id AS anchor_id, nmid::BIGINT AS n_mid
         |FROM f WHERE event_type = 'error' AND nresp = 0""".stripMargin,

    // lead() replay of strict contiguity: the immediate successor in
    // (ts, id) order must be a click within the bound
    "q93_cep_next" ->
      s"""WITH r AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
         |    lead(struct_pack(us := epoch_us(ts), id := event_id,
         |                     tp := event_type)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS nx
         |  FROM events)
         |SELECT user_id AS key, event_id AS anchor_id,
         |  nx.id AS response_id, nx.us - us AS dur_us
         |FROM r
         |WHERE event_type = 'error' AND nx IS NOT NULL
         |  AND nx.tp = 'click' AND nx.us - us <= $DayUs""".stripMargin,

    // islands replay of gap-bounded maximal anchor runs
    "q94_cep_times" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    event_type = 'click' AS a,
         |    lag(struct_pack(us := epoch_us(ts),
         |                    a := event_type = 'click')) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM events),
         |anch AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN prev IS NULL OR NOT prev.a
         |              OR us - prev.us > $DayUs THEN 1 ELSE 0 END AS nr
         |  FROM o WHERE a),
         |runs AS (
         |  SELECT user_id, event_id, us, sum(nr) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id
         |    ROWS UNBOUNDED PRECEDING) AS rid
         |  FROM anch)
         |SELECT user_id AS key,
         |  min(struct_pack(us := us, id := event_id)).id AS start_id,
         |  max(struct_pack(us := us, id := event_id)).id AS end_id,
         |  count(*)::BIGINT AS n,
         |  max(us) - min(us) AS dur_us
         |FROM runs GROUP BY user_id, rid HAVING count(*) >= 2""".stripMargin,

    // direction-block islands replay of the V pattern
    "q95_match_v" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us, value,
         |    lag(struct_pack(us := epoch_us(ts), id := event_id,
         |                    v := value)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM events),
         |d AS (
         |  SELECT user_id, event_id, us, value, prev.id AS pid, prev.v AS pv,
         |    CASE WHEN prev IS NULL OR us - prev.us > $DayUs THEN NULL
         |         WHEN value < prev.v THEN -1
         |         WHEN value > prev.v THEN 1 ELSE 0 END AS dir
         |  FROM o),
         |m AS (
         |  SELECT *, CASE WHEN dir IS DISTINCT FROM lag(dir) OVER (
         |    PARTITION BY user_id ORDER BY us, event_id) THEN 1 ELSE 0 END AS nb
         |  FROM d),
         |b AS (
         |  SELECT *, sum(nb) OVER (PARTITION BY user_id ORDER BY us, event_id
         |                          ROWS UNBOUNDED PRECEDING) AS bid
         |  FROM m),
         |blk AS (
         |  SELECT user_id, bid, min(dir) AS dir, count(*)::BIGINT AS n,
         |    min(struct_pack(us := us, id := event_id, pid := pid, pv := pv)) AS f,
         |    max(struct_pack(us := us, id := event_id, v := value)) AS l
         |  FROM b GROUP BY 1, 2),
         |sq AS (
         |  SELECT user_id, dir, n, f, l,
         |    lead(struct_pack(dir := dir, n := n, l := l)) OVER (
         |      PARTITION BY user_id ORDER BY bid) AS nxt
         |  FROM blk)
         |SELECT user_id AS key, f.pid AS start_id, l.id AS bottom_id,
         |  nxt.l.id AS end_id, f.pv AS start_val, l.v AS bottom_val,
         |  nxt.l.v AS end_val, n AS n_down, nxt.n AS n_up
         |FROM sq WHERE dir = -1 AND nxt.dir = 1""".stripMargin,

    "q74_retention_cohorts" ->
      s"""WITH f AS (
         |  SELECT user_id, min(epoch_us(ts)) AS first_us FROM events GROUP BY 1)
         |SELECT f.first_us // $WeekUs AS cohort_week,
         |  (epoch_us(e.ts) - f.first_us) // $WeekUs AS week_offset,
         |  count(DISTINCT e.user_id) AS users
         |FROM events e JOIN f ON e.user_id = f.user_id
         |GROUP BY 1, 2""".stripMargin
  )
}
