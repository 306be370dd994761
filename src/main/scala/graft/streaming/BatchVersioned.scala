package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared helpers for the batch-versioned at-rest state pattern both
  * streaming maintainers use ([[ClusterMaintenance]],
  * [[SemDeDupStream]]): delta tables partitioned by arrival batch
  * (`b=<id>`), full-state versions (`v=<id>`) gated on `_SUCCESS`,
  * and strictly-older reads for replay safety — a replayed micro
  * batch carries the same batchId (Structured Streaming's contract),
  * reads only state written by earlier batches, and overwrites
  * exactly its own outputs. */
private[graft] object BatchVersioned {

  def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(ddl))

  /** GC after a compaction committed: delete compact versions and
    * delta dirs below the PREVIOUS compact version `prev` — state no
    * possible replay can read (batches below prev were committed
    * before prev's compaction ran, and a replayed compacting batch
    * re-runs its compaction FROM prev, which is kept). Shared by all
    * three compactors ([[ClusterMaintenance]], [[SemDeDupStream]],
    * [[IvfStream]]) so the replay-safety rule lives in one place. */
  def gcBelowPrev(spark: SparkSession, compactDir: String, deltaDir: String,
      deltaPrefix: String, prev: Option[(Long, String)]): Unit = {
    val f = fs(spark, compactDir)
    prev.foreach { case (pv, _) =>
      versions(spark, compactDir).filter(_._1 < pv).foreach { case (_, d) =>
        f.delete(new org.apache.hadoop.fs.Path(d), true)
      }
      val deltaRoot = new org.apache.hadoop.fs.Path(deltaDir)
      if (f.exists(deltaRoot))
        f.listStatus(deltaRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith(s"$deltaPrefix="))
          .filter(_.getName.stripPrefix(s"$deltaPrefix=").toLong < pv)
          .foreach(f.delete(_, true))
    }
  }

  /** All rows of a `b=`-partitioned delta table written by batches
    * BEFORE `upTo`. Partition pruning makes the filter a directory-
    * listing decision, not a scan. */
  def readBefore(spark: SparkSession, dir: String, ddl: String, upTo: Long): DataFrame =
    if (exists(spark, dir)) spark.read.parquet(dir).filter(col("b") < upTo)
    else emptyDf(spark, ddl)

  /** COMMITTED version dirs (`<prefix>=<id>`, `_SUCCESS` present)
    * under `dir`, ascending by id. */
  def versions(spark: SparkSession, dir: String, prefix: String = "v"): Seq[(Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(s"$prefix="))
      .filter(q => f.exists(new org.apache.hadoop.fs.Path(q, "_SUCCESS")))
      .map(q => (q.getName.stripPrefix(s"$prefix=").toLong, q.toString))
      .sortBy(_._1)
  }
}
