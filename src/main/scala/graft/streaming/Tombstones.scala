package graft.streaming

import org.apache.spark.sql.streaming.MapState

/** THE fence-expiry rule for tombstone-fenced slot maps, defined
  * once — shared by every changelog processor that keeps dead slots
  * as late-row fences ([[CdcOrderedStream]], [[CdcJoinStream]],
  * [[CdcTopNStream]]).
  *
  * A dead slot's only job is to fence a LATE row about the same id
  * (an insert whose ver is older than the delete that killed it), so
  * by default dead slots stay forever — under entity churn that is
  * unbounded state growth. The optional `tombstoneVerHorizon = H`
  * those processors take is the bound: it declares the SOURCE's
  * disorder promise "no row arrives with ver ≤ maxSeenVer − H",
  * under which a dead slot with ver ≤ maxVer − H can never fence
  * anything again (a late row it would have rejected carries
  * ver ≤ its ver ≤ maxVer − H, which the promise forbids) and is
  * dropped. A horizon the source does not actually honor makes
  * results approximate exactly the way Flink's state TTL does.
  * Flink analog: state TTL on retractable join/rank/agg state.
  *
  * The ≤-cutoff boundary and what counts as dead must not drift
  * between processors — hence ONE definition. Each caller supplies
  * its slot type's `live`/`ver` accessors; the scan streams the
  * MapState iterator (O(live+dead) compute, O(doomed) heap) and
  * removes after the scan, never during it.
  */
private[graft] object Tombstones {

  /** ONE disorder promise for both clocks (round 16 — the horizon/TTL
    * unification): where the SOURCE stamps `ver` = event-time
    * MILLISECONDS (the common CDC convention — Debezium's ts_ms,
    * Canal's es), the watermark delay `D` already declares "no row
    * arrives more than D behind the max seen event time", which in
    * the ver domain is exactly the tombstone-horizon promise: a late
    * row has ts ≥ watermark = maxTs − D, so ver = ts(ms) ≥
    * globalMaxVer − D(ms) ≥ grpMaxVer − D(ms) — the per-group cutoff
    * [[compact]] applies is strictly safer than the global one the
    * watermark bounds. Passing this as `tombstoneVerHorizon`
    * therefore derives the ver fence bound from the SAME declared
    * promise that drives event-time TTL and window semantics — one
    * config, two clocks, no second number to get wrong. Where ver is
    * a synthetic sequence (not time), the domains are
    * incommensurable and an explicit horizon remains the only honest
    * config. */
  def verHorizonFromWatermark(delay: java.time.Duration): Option[Long] = {
    require(!delay.isNegative && !delay.isZero,
      s"verHorizonFromWatermark: watermark delay must be positive: $delay")
    Some(delay.toMillis)
  }

  /** Drop dead slots whose ver sits at or below `maxVer − h`;
    * returns how many were removed. */
  def compact[S](slots: MapState[Long, S], maxVer: Long, h: Long)(
      live: S => Boolean, ver: S => Long): Long = {
    val cutoff = maxVer - h
    val doomed = scala.collection.mutable.ArrayBuffer.empty[Long]
    slots.iterator().foreach { case (id, sl) =>
      if (!live(sl) && ver(sl) <= cutoff) doomed += id
    }
    doomed.foreach(slots.removeKey)
    doomed.size.toLong
  }
}
