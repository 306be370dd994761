package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.Pipelines.AggChange

/** Retractable DISTINCT aggregation over a changelog — the maintained
  * `SELECT grp, count(*), count(DISTINCT v), sum(DISTINCT v) GROUP BY
  * grp` a Flink SQL retract stream keeps live under +I/+U/-U/-D
  * traffic (ref semantics: the format/ CDC jobs feed exactly such
  * changelogs; Flink implements this as DistinctAggCodeGen over a
  * MapView value→refcount per group, plus the split-distinct rewrite
  * `table.optimizer.distinct-agg.split.enabled` for skewed groups).
  *
  * DISTINCT cannot ride cdcAggStream's O(groups) signed fold: whether
  * a retraction changes the distinct set depends on how many OTHER
  * live entities still hold the same value, so per-group state must
  * be the value→multiplicity map (the same shape as
  * cdcMinMaxStream — Flink draws the identical line: distinct and
  * min/max are its MapState-backed retract functions, count/sum its
  * accumulator ones).
  *
  * Two paths, same results:
  *  - [[distinctAggStream]]: single operator, state = one multiset
  *    per group. Right when distinct-value cardinality per group is
  *    modest (status codes, bucketed amounts).
  *  - [[distinctPartialStream]] → [[distinctMergeStream]]: Flink's
  *    split-distinct two-stage rewrite. Stage 1 shards the multiset
  *    by (grp, hash(value) % buckets) — each distinct value lives in
  *    EXACTLY one shard, so per-shard distinct counts/sums ADD —
  *    and emits a retract changelog of partial aggregates; stage 2
  *    folds the partials per group with cdcAggStream's signed rule,
  *    state O(groups). A hot group's million-value multiset becomes
  *    `buckets` independent keys on independent shuffle partitions:
  *    the skew cure, at the price of a second (tiny) shuffle whose
  *    row volume is O(touched shards), not O(changes).
  *
  * Disorder contract (shared with cdcAggStream/cdcMinMaxStream):
  * retractions carry their BEFORE-image value and group, transient
  * negative multiplicities are cross-batch debt and settle when the
  * matching inserts land; state drops only when every multiplicity
  * has settled to zero. Emits one row per touched group per batch;
  * live_cnt 0 is the sink-side DELETE signal.
  */
object CdcDistinctStream {

  /** Maintained distinct view of one group: total live holders,
    * distinct live values, and their sum. */
  case class GroupDistinct(grp: String, live_cnt: Long, distinct_cnt: Long, distinct_sum: Long)

  /** Single-stage path: per-group value→multiplicity MapView. */
  def distinctAggStream(changes: Dataset[AggChange]): Dataset[GroupDistinct] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.grp)
      .flatMapGroupsWithState[Map[Long, Long], GroupDistinct](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[AggChange], state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          rows.foreach { c =>
            val s = c.op match {
              case "+I" | "+U" => 1L
              case "-U" | "-D" => -1L
              // a silently-dropped kind would desync count vs distinct set
              case other => throw new IllegalArgumentException(
                s"distinctAggStream: unknown row_kind '$other' for group $grp")
            }
            val nv = m.getOrElse(c.value, 0L) + s
            m = if (nv == 0L) m - c.value else m.updated(c.value, nv)
          }
          if (m.isEmpty) state.remove() else state.update(m)
          val live = m.filter(_._2 > 0L)
          Iterator.single(GroupDistinct(grp, live.values.sum, live.size.toLong, live.keys.sum))
      }
  }

  /** Stage-1 output: a retract changelog of one shard's partial
    * aggregate. `op` follows the shared grammar: +I first image,
    * -U/+U replacement pair, -D shard emptied. The -U image is
    * EXACTLY the last partial this shard emitted (checkpointed with
    * the multiset), so the merge stage's signed fold cancels it
    * precisely even across replays. */
  case class PartialChange(op: String, grp: String, bucket: Int,
      live_p: Long, cnt_p: Long, sum_p: Long)

  // The previous emission's image is flattened to primitives (hasPrev
  // discriminant). Public, not private: the state encoder's generated
  // bytecode must call these accessors from outside the enclosing
  // object.
  case class ShardState(mult: Map[Long, Long],
      hasPrev: Boolean, prevLive: Long, prevCnt: Long, prevSum: Long)

  /** Flink's split-distinct stage 1: the multiset sharded by
    * (grp, floorMod(value, buckets)). Each incoming change routes to
    * exactly one shard (retractions by before-image value — same
    * routing on both ends of an update, so a value move is two
    * shard-local events); each touched shard emits the retract pair
    * replacing its previous partial. `buckets` bounds the fan-out:
    * per-batch emission is ≤ 2 × touched shards regardless of change
    * volume. */
  def distinctPartialStream(changes: Dataset[AggChange], buckets: Int): Dataset[PartialChange] = {
    require(buckets > 0, s"distinctPartialStream: buckets must be positive, got $buckets")
    import changes.sparkSession.implicits._
    changes
      .groupByKey(c => (c.grp, java.lang.Math.floorMod(c.value, buckets.toLong).toInt))
      .flatMapGroupsWithState[ShardState, PartialChange](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, Int), rows: Iterator[AggChange], state: GroupState[ShardState]) =>
          val (grp, bucket) = key
          val st = state.getOption.getOrElse(ShardState(Map.empty, hasPrev = false, 0L, 0L, 0L))
          var m = st.mult
          rows.foreach { c =>
            val s = c.op match {
              case "+I" | "+U" => 1L
              case "-U" | "-D" => -1L
              case other => throw new IllegalArgumentException(
                s"distinctPartialStream: unknown row_kind '$other' for group $grp")
            }
            val nv = m.getOrElse(c.value, 0L) + s
            m = if (nv == 0L) m - c.value else m.updated(c.value, nv)
          }
          val live = m.filter(_._2 > 0L)
          val hasNext = live.nonEmpty
          val (l, c, s) =
            if (hasNext) (live.values.sum, live.size.toLong, live.keys.sum)
            else (0L, 0L, 0L)
          val out = (st.hasPrev, hasNext) match {
            case (false, false) => Iterator.empty // settled-to-empty debt churn
            case (false, true) =>
              Iterator.single(PartialChange("+I", grp, bucket, l, c, s))
            case (true, false) =>
              Iterator.single(PartialChange("-D", grp, bucket, st.prevLive, st.prevCnt, st.prevSum))
            case (true, true) if st.prevLive == l && st.prevCnt == c && st.prevSum == s =>
              Iterator.empty // untouched image
            case (true, true) => Iterator(
              PartialChange("-U", grp, bucket, st.prevLive, st.prevCnt, st.prevSum),
              PartialChange("+U", grp, bucket, l, c, s))
          }
          if (m.isEmpty && !hasNext) state.remove()
          else state.update(ShardState(m, hasNext, l, c, s))
          out
      }
  }

  /** Split-distinct stage 2: cdcAggStream's signed fold lifted to the
    * three partial fields — state per group is three longs, never a
    * map. Because every distinct value lives in exactly one stage-1
    * shard, summing shard partials IS the group's distinct aggregate. */
  def distinctMergeStream(partials: Dataset[PartialChange]): Dataset[GroupDistinct] = {
    import partials.sparkSession.implicits._
    partials
      .groupByKey(_.grp)
      .flatMapGroupsWithState[(Long, Long, Long), GroupDistinct](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[PartialChange], state: GroupState[(Long, Long, Long)]) =>
          var (l, c, s) = state.getOption.getOrElse((0L, 0L, 0L))
          rows.foreach { p =>
            val sg = p.op match {
              case "+I" | "+U" => 1L
              case "-U" | "-D" => -1L
              case other => throw new IllegalArgumentException(
                s"distinctMergeStream: unknown row_kind '$other' for group $grp")
            }
            l += sg * p.live_p; c += sg * p.cnt_p; s += sg * p.sum_p
          }
          if (l == 0L && c == 0L && s == 0L) state.remove() else state.update((l, c, s))
          Iterator.single(GroupDistinct(grp, l, c, s))
      }
  }
}
