package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → current-state materialization (the upsert view a
  * Flink changelog pipeline maintains; the reference's canal/debezium
  * jobs feed exactly such changelogs into upsert sinks).
  *
  * Batch form: one shuffle on the primary key, per-key top-1 by
  * version (no global sort). The shuffle key equals the key any
  * downstream upsert sink needs, so the exchange is reusable. The
  * streaming twin (per-key state via flatMapGroupsWithState) is
  * graft.streaming.Pipelines.cdcUpsert.
  */
object Cdc {

  /** THE shared changelog ordering rule, defined once: row kinds rank
    * -U < +I < +U < -D, and at an EQUAL version the higher rank wins
    * — an update's after-image outranks its own retraction (Debezium
    * expands an update into -U/+U sharing one offset), and a delete
    * outranks everything at its version. Unknown kinds fail loudly
    * (a silently mis-ranked kind corrupts every fold downstream).
    * Used by CdcJoinStream, CdcTopNStream, BroadcastRules, and the
    * q78/q79/q80/q84 batch twins. */
  def opRank(op: String): Int = op match {
    case "-U" => 0
    case "+I" => 1
    case "+U" => 2
    case "-D" => 3
    case other => throw new IllegalArgumentException(s"changelog: unknown row_kind '$other'")
  }

  /** Column form of [[opRank]] (same ranks, same loud reject). */
  def opRankCol(op: Column): Column =
    when(op === "-U", 0).when(op === "+I", 1).when(op === "+U", 2)
      .when(op === "-D", 3)
      .otherwise(raise_error(concat(lit("changelog: unknown row_kind "), op)))

  /** Last-writer-wins under the [[opRank]] tie rule: a candidate
    * (ver, rank) replaces the current (curVer, curRank) image. */
  def changelogWins(curVer: Long, curRank: Int, ver: Long, rank: Int): Boolean =
    ver > curVer || (ver == curVer && rank >= curRank)

  /** Flink-style RETRACTABLE aggregation over a changelog — the
    * maintained `SELECT grp, count(*), sum(v) … GROUP BY grp` a Flink
    * retract stream keeps live under +I/+U/-U/-D traffic (ref:
    * format/debezium_json + canal_json jobs feed exactly such
    * changelogs) — WITHOUT materializing per-key state first.
    *
    * Every changelog row contributes a SIGNED delta (+value for
    * +I/+U, −value for -U/-D) keyed by the group carried in that
    * row's image: a retraction uses its BEFORE-image group, which is
    * what routes a group-moving update's subtraction to the OLD group
    * and its addition to the new one. One map-side-combined
    * aggregation; shuffle and state are O(groups), not O(keys) — a
    * 10-group SUM over a billion-key changelog moves ~10 partial rows
    * per task instead of re-keying a billion rows by pk (compare
    * [[materialize]] + groupBy: two shuffles, the first on pk).
    * Only commutative-invertible aggregates (count/sum/avg) can ride
    * this path; min/max need per-key state — the same split Flink
    * draws between retractable and non-retractable agg functions.
    * Groups whose live count reaches 0 disappear from the result,
    * exactly like a Flink retract sink.
    *
    * `value` should be an integer-exact column (e.g. cents as long):
    * signed cancellation of doubles is order-dependent in the last
    * ulp, and the whole point of the fold is exact +a −a = 0.
    * Streaming twin: graft.streaming.Pipelines.cdcAggStream. */
  def retractAgg(changelog: DataFrame, rowKind: Column, group: Column, value: Column): DataFrame = {
    val sign = when(rowKind.isin("+I", "+U"), 1L)
      .when(rowKind.isin("-U", "-D"), -1L)
      // a silently-dropped unknown kind would desync count vs sum
      .otherwise(raise_error(concat(lit("retractAgg: unknown row_kind "), rowKind)))
    // a NULL value would desync the pair the other way: sum(sign)
    // counts the row while sum(sign·value) skips it — live_sum stays
    // permanently inflated after a null-image retraction (exactly
    // what Debezium emits under REPLICA IDENTITY DEFAULT). Loud
    // reject, same contract as IvfChangelog's null-image guard.
    val v = when(value.isNull,
      raise_error(concat(lit("retractAgg: NULL value for row_kind "), rowKind,
        lit(" — retraction images must carry the value")))).otherwise(value)
    changelog
      .groupBy(group.as("grp"))
      .agg(sum(sign).as("live_cnt"), sum(sign * v).as("live_sum"))
      .filter(col("live_cnt") > 0)
  }

  /** Latest surviving row per `pk`, ordered by `version` columns
    * (latest wins; ties broken by the caller-supplied total order).
    * Rows whose final image is a delete (`isDelete`) are dropped. */
  def materialize(changelog: DataFrame, pk: Seq[Column], version: Seq[Column], isDelete: Column): DataFrame = {
    val w = Window.partitionBy(pk: _*).orderBy(version.map(_.desc): _*)
    changelog
      .withColumn("__rn", row_number().over(w))
      // coalesce: a NULL isDelete (e.g. snapshot rows with no op) is
      // "not a delete" — bare !NULL is NULL and filter would silently
      // drop the key's latest image
      .filter(col("__rn") === 1 && !coalesce(isDelete, lit(false)))
      .drop("__rn")
  }
}
