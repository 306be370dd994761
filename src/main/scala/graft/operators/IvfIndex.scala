package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Persistent IVF index: the at-rest layout for ANN at 100 TB.
  *
  * q38 computes IVF in one job; a production corpus is INDEXED ONCE —
  * written `partitionBy(cell)` so every later query triggers Spark's
  * dynamic partition pruning (DPP): the broadcast probe side's cell
  * ids prune the scan to nprobe/2^b of the files, no manual pruning
  * and no driver-side collect. Centroids are the same deterministic
  * mix2001 stream as q38, so an index built by this class and the
  * inline q38 computation agree cell-for-cell.
  */
object IvfIndex {

  /** Deterministic centroid table (cell, c: array<double>); tiny —
    * always broadcast. */
  def centroids(spark: SparkSession, cells: Int): DataFrame = {
    import spark.implicits._
    val mixed = VectorFunctions.Sql.mixSpark("1000000 + id * 64 + k")
    spark.range(cells).select($"id".cast("int").as("cell"),
      expr(s"transform(sequence(0, 63), k -> cast($mixed as double) / 1000.0)").as("c"))
  }

  /** Best-cell assignment (argmax dot, lowest-cell tie-break):
    * (vec_id, v, cell). */
  def assign(emb: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("score").desc, col("cell").asc)
    emb.join(broadcast(cent))
      .select(col("vec_id"), col("v"), col("cell"),
        VectorFunctions.dot(col("v"), col("c")).as("score"))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
  }

  /** Top-`nprobe` probe cells per query: (query_id, qv, cell). */
  def probes(queries: DataFrame, cent: DataFrame, nprobe: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("cell").asc)
    queries.join(broadcast(cent))
      .select(col("query_id"), col("qv"), col("cell"),
        VectorFunctions.dot(col("qv"), col("c")).as("score"))
      .withColumn("crnk", row_number().over(w))
      .filter(col("crnk") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
  }

  /** Build the index: corpus partitioned by cell on disk. `emb` must
    * have (vec_id, v: array<double>). */
  def build(emb: DataFrame, cent: DataFrame, dir: String): Unit =
    assign(emb, cent).write.mode("overwrite").partitionBy("cell").parquet(dir)

  /** Query the on-disk index: probe cells → DPP-pruned scan → exact
    * cosine top-k. `queries` must have (query_id, qv). */
  def topK(spark: SparkSession, indexDir: String, queries: DataFrame,
      cent: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val idx = spark.read.parquet(indexDir)
    val p = probes(queries, cent, nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    // join on the PARTITION column with a broadcast-able probe side:
    // Spark inserts a DynamicPruningExpression on the scan, so only
    // the probed cell directories are read
    idx.join(broadcast(p), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // zero-norm vectors (padding / failed embeddings) make cosine
      // 0/0 = NaN, and Spark sorts NaN ABOVE every double — nanvl
      // ranks such junk last instead of at the top of every probe
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        nanvl(VectorFunctions.cosine(col("qv"), col("v")), lit(-2.0)).as("cos_sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
