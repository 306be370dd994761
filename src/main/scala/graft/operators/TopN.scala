package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group Top-N — the Flink SQL Top-N pattern (ROW_NUMBER over a
  * partition, filter rn <= N).
  *
  * Scale notes: row_number shuffles once on the group keys and keeps
  * only per-partition heaps of sorted runs; no global sort, no
  * collect. Callers MUST pass a total order (tie-broken) for
  * deterministic results on any cluster size.
  */
object TopN {
  def perGroup(df: DataFrame, groupCols: Seq[Column], order: Seq[Column], n: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(groupCols: _*).orderBy(order: _*)))
      .filter(col("rn") <= n)
}
