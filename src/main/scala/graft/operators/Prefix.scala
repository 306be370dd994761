package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the primitive behind "running
  * total over the WHOLE table in one defined order" (shard packing,
  * global position assignment, budget cut-offs).
  *
  * The naive Spark spelling, `sum(v).over(Window.orderBy(ord))` with
  * no partitionBy, silently collapses the entire table into ONE
  * partition on one executor — the classic global-window scale trap
  * (Spark even logs a WindowExec warning). This operator computes the
  * identical result with the textbook two-phase scan:
  *
  *  1. range-partition by `ord` (P ≈ shuffle parallelism), cache;
  *  2. per-partition totals → driver (P rows), exclusive prefix →
  *     a P-row offsets table;
  *  3. per-partition running sum (window PARTITIONED by the range
  *     id — parallel) + broadcast-joined partition offset.
  *
  * Two shuffles and a P-row collect at any scale; every stage is
  * parallel in P. The result is partitioning-independent: a prefix
  * sum over a total order is unique, so the DuckDB oracle replays it
  * with a plain `sum() OVER (ORDER BY …)` window.
  *
  * `ord` must be a TOTAL order (break ties into the column — e.g.
  * `struct(hash, id)`); `value` should be integer-exact (token
  * counts, bytes) so partial-sum regrouping cannot drift. */
object Prefix {

  /** Adds `cumCol` = inclusive prefix sum of `value` in `ord` order.
    * Returns the input columns + `cumCol`. Note the OUTPUT layout is
    * the running-sum window's hash-partitioning on the internal range
    * id, NOT a range layout (hash can co-locate non-adjacent ranges):
    * callers writing range-clustered shards should re-layout with
    * [[Layout.clusteredWrite]] / repartitionByRange on the way out —
    * the VALUES are layout-independent either way. */
  def cumsum(df: DataFrame, ord: Seq[Column], value: Column,
      cumCol: String = "cum", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = df.columns.toSeq
    // loud NULL reject (the repo convention — retractAgg, Quantiles):
    // a silent NULL would contribute 0 to the offsets while still
    // receiving a cum value, and an all-NULL range partition would
    // make sum(__v) NULL and NPE the driver-side offset fold.
    val checked = when(value.isNull,
      raise_error(lit("Prefix.cumsum: NULL in value column — filter or coalesce upstream")))
      .otherwise(value.cast("long"))
    val ranged = graft.CachePool.cache(
      df.withColumn("__v", checked)
        .repartitionByRange(p, ord: _*)
        .withColumn("__pid", spark_partition_id()))
    // P rows: safe to collect at any data scale (P = parallelism).
    // Range partition ids are already in range order (partition 0
    // holds the lowest ord range), so the exclusive prefix over
    // pid-ascending totals IS the global offset table; empty
    // partitions simply have no rows to offset.
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val off = acc
      acc += t
      (pid, off)
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    ranged
      .join(broadcast(offDf), "__pid")
      .withColumn(cumCol, sum(col("__v")).over(w) + col("__off"))
      .select((cols.map(col) :+ col(cumCol)): _*)
  }
}
