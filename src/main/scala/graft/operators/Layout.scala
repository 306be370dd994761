package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Clustered storage layout + small-file compaction — the write-side
  * half of scan pruning at 100 TB.
  *
  * Parquet keeps min/max statistics per row group; Spark's pushed
  * filters (`PushedFilters` in the scan node) prune row groups whose
  * stat range cannot satisfy the predicate BEFORE any page is read.
  * Those statistics are only selective if the data is CLUSTERED on
  * the predicate column: a randomly-laid-out table has every row
  * group spanning ~the full value range, so nothing prunes and a
  * 0.1%-selective filter still scans 100 TB. Range-partitioning +
  * within-partition sorting at write time concentrates each row
  * group on a narrow key range, so the same filter reads only the
  * few row groups that can match — the scan cost tracks SELECTIVITY,
  * not table size. The write pays one range Exchange, amortized over
  * every subsequent filtered scan (the storage analog of
  * [[Bucketing]]'s amortized join shuffle; the Flink-world reference
  * has no at-rest layout story at all — this is what replaces keyed
  * state locality when the "state" is a lake).
  *
  * [[compactFiles]] is the maintenance half: streaming ingest (every
  * `foreachBatch` writer in graft.streaming) accretes small files,
  * and small files destroy BOTH scan parallelism bookkeeping (driver
  * file listing, footer reads) and stat selectivity (a tiny file's
  * single row group still costs a footer + seek). Bin-packing by
  * measured input size into ~target-sized, re-clustered files
  * restores the layout without changing a row.
  */
object Layout {

  /** Write `df` clustered on `keys`: range-partitioned into `files`
    * output files, each internally sorted, so parquet row-group
    * min/max stats on `keys` are maximally selective. `blockBytes`
    * caps the parquet row-group size — the pruning granule (smaller
    * granule = finer pruning, more footer overhead; 128 MiB default
    * is right for real clusters, tests shrink it to get many groups
    * per file). */
  def clusteredWrite(df: DataFrame, dst: String, keys: Seq[String],
      files: Int, blockBytes: Long = 128L << 20): Unit =
    df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(dst)

  /** Bin-pack the parquet files under `src` into ~`targetBytes`
    * outputs at `dst`, re-clustered on `keys` (compaction must not
    * forfeit the layout — a plain `coalesce` would interleave key
    * ranges and de-select every row-group stat). Output file count
    * derives from MEASURED input bytes, so the operator is safe to
    * run on any accretion state: one file per target-size bin,
    * minimum one. */
  def compactFiles(spark: SparkSession, src: String, dst: String,
      keys: Seq[String], targetBytes: Long,
      blockBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    clusteredWrite(spark.read.parquet(src), dst, keys, files, blockBytes)
    files
  }

  /** Rows EMITTED by the scan nodes of `df`'s executed plan — rows
    * surviving parquet row-group/page pruning, counted before Spark's
    * residual filter. Runs the plan (count action) first so AQE has
    * finalized and metrics are populated. The pruning evidence:
    * clustered layout → scanRows ≈ matching rows; random layout →
    * scanRows ≈ table rows, for the SAME query. */
  def scanRows(df: DataFrame): (Long, Long) = {
    // execute THIS queryExecution (a .count() would build a separate
    // plan and leave df's own metrics empty)
    val result = df.queryExecution.toRdd.count()
    (result, scanOutputRows(df.queryExecution.executedPlan))
  }

  /** Sum of the scan nodes' numOutputRows over an EXECUTED plan,
    * recursing through AQE stage boundaries (TreeNode.collect stops
    * at them — their subtrees are not `children`). Shared by the
    * layout evidence above and the stress harness. */
  def scanOutputRows(plan: org.apache.spark.sql.execution.SparkPlan): Long = {
    var s = 0L
    def go(x: org.apache.spark.sql.execution.SparkPlan): Unit = {
      x match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => go(q.plan)
        case n => if (n.nodeName.toLowerCase.contains("scan"))
          s += n.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }
      x.children.foreach(go)
    }
    go(plan)
    s
  }
}
