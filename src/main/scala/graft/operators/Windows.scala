package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch window operators mirroring the reference's window zoo
  * (MyWindowTrigger/: tumbling/sliding time windows, count windows;
  * csv DDL watermarks). Streaming twins live in graft.streaming.
  *
  * Everything partitions by (key[, window]) — there is never a global
  * sort, so each operator scales with the number of keys, not rows.
  * The only total order used is per-key (Flink's keyed-stream model).
  */
object Windows {

  /** Session windows by inactivity gap (gaps-and-islands). `tieBreak`
    * must make the per-key order total for deterministic session ids. */
  def sessionize(df: DataFrame, key: Column, ts: Column, tieBreak: Column, gap: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    df.withColumn("__prev_ts", lag(ts, 1).over(w))
      .withColumn(
        "__new_s",
        // >= : an event exactly `gap` after its predecessor OPENS a new
        // session — Flink's EventTimeSessionWindows builds [t, t+gap)
        // windows and merges only on overlap, so the boundary instant
        // belongs to the next session
        when(col("__prev_ts").isNull || ts >= col("__prev_ts") + expr(s"INTERVAL $gap"), 1).otherwise(0))
      .withColumn("session_id", sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__prev_ts", "__new_s")
  }

  /** Count windows of `n` rows per key, in (ts, tieBreak) order — the
    * CountWindowDemo.java / MyCountTrigger fire-every-N semantics.
    * Only the window index is assigned here; callers aggregate and
    * (to match Flink count windows, which fire only when full) filter
    * on count == n. */
  def countWindowIndex(df: DataFrame, key: Column, ts: Column, tieBreak: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tieBreak)
    df.withColumn("win_id", floor((row_number().over(w) - lit(1)) / lit(n)).cast("long"))
  }
}
