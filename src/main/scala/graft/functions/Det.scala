package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-aggregation helpers.
  *
  * Double summation is order-dependent, and the DuckDB oracle sums in
  * a different order than Spark's parallel partial aggregates. Any
  * money-like sum therefore goes through fixed-point: round each term
  * to cents as int64 (per-row double ops are IEEE-identical across
  * engines), sum exactly in int64, divide once at the end. Results are
  * bit-identical regardless of partitioning — which also means the
  * same query gives the same hash on a 1000-executor cluster as on
  * local[32].
  */
object Det {
  /** Exact fixed-point sum of a money-like double column (2 decimals). */
  def moneySum(c: Column): Column =
    sum(round(c * lit(100)).cast("long")) / lit(100.0)

  /** Exact fixed-point average (sum exact, one division at the end). */
  def moneyAvg(c: Column): Column =
    moneySum(c) / count(lit(1))

  /** DuckDB SQL fragment equivalent to [[moneySum]]. */
  def moneySumSql(expr: String): String =
    s"sum(cast(round(($expr) * 100) as bigint)) / 100.0"

  def moneyAvgSql(expr: String): String =
    s"(${moneySumSql(expr)}) / count(*)"
}
