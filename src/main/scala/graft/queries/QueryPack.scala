package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A coherent group of SparkEntry queries plus their DuckDB oracles. */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracles: Map[String, String]
}

/** The ONE embedding-augmentation schedule, shared by q28 and q53
  * (Spark and SQL twins side by side so the two engines — and the two
  * queries — can never drift): exact vector copies for
  * vec_id % 10 == 0 at ids + [[Aug.EmbCopyOffset]].
  */
object Aug {
  /** 10^12: planted ids can never collide with organic vec_ids until
    * the base table itself holds a trillion rows (the old +100_000
    * offset broke the keep-rule and the oracle's USING(vec_id) join
    * at just 100k vectors — far below the operators' design scale). */
  val EmbCopyOffset: Long = 1000000000000L

  /** Append the copy rows; `e` must carry `vec_id` plus any payload
    * columns (all payload columns are duplicated as-is). */
  def embCopies(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + EmbCopyOffset))
  }

  /** DuckDB twin: a CTE body selecting vec_id + `payloadCols` from
    * embeddings, unioned with the same copy schedule. */
  def embCopiesSql(payloadCols: String): String =
    s"""SELECT vec_id, $payloadCols FROM embeddings
       |  UNION ALL SELECT vec_id + $EmbCopyOffset, $payloadCols
       |    FROM embeddings WHERE vec_id % 10 = 0""".stripMargin
}
