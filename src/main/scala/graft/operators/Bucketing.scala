package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) tables for exchange-free co-located
  * joins — SURVEY §5's "co-locate joins via bucketing".
  *
  * Writing both sides bucketed (and sorted) on the join key lets the
  * sort-merge join run with ZERO Exchange: at 100 TB the dominant
  * cost of a fact-fact join is the shuffle, and bucketing moves that
  * cost to write time, amortized across every subsequent join on the
  * same key. (The Flink-world analog the reference leans on is keyed
  * streams staying partitioned between operators; bucketed storage is
  * how the same idea persists across batch jobs.)
  */
object Bucketing {

  /** Persist `df` bucketed+sorted by `key` as a session-catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int, path: String): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With matching
    * bucket counts the plan contains no Exchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
