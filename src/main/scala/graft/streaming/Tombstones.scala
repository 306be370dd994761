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
private[streaming] object Tombstones {

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
