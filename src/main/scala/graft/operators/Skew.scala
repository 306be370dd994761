package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage (salted) aggregation for skewed keys.
  *
  * Mirrors the reference's skew mitigation
  * (DataSkew/SocketAppV2.java:24-70): suffix the key with a random
  * salt, pre-aggregate per salted key, strip the salt, re-aggregate.
  * Spark-first differences: the salt is a deterministic function of a
  * high-cardinality column (reproducible results, unlike the
  * reference's Random), and stage one is a partial aggregate that
  * Catalyst already map-side combines — so the win at 100 TB is that
  * no single reducer ever owns a hot key's full traffic.
  */
object Skew {
  /** groupBy(keys).agg(sum cents, count) computed via `salts`-way salted
    * pre-aggregation. `saltSource` must be high-cardinality (e.g. a row id).
    * Result is identical to the unsalted aggregate. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      centsCol: Column,
      saltSource: Column,
      salts: Int): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .groupBy(keyCols :+ pmod(saltSource, lit(salts)).as("__salt"): _*)
      .agg(sum(centsCol).as("__cents"), count(lit(1)).as("__cnt"))
    partial
      .groupBy(keyCols: _*)
      .agg(
        (sum(col("__cents")) / 100.0).as("total_value"),
        sum(col("__cnt")).as("n"))
  }
}
