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
      files: Int, blockBytes: Long = 128L << 20,
      options: Map[String, String] = Map.empty): Unit = {
    val w = df.repartitionByRange(files, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
    options.foreach { case (k, v) => w.option(k, v) }
    w.parquet(dst)
  }

  /** Z-order (Morton) cluster value over `keys` — MULTI-column
    * data skipping where lexicographic clustering only serves the
    * leading key.
    *
    * [[clusteredWrite]] on `(a, b)` sorts lexicographically: each row
    * group covers a narrow `a` range but, within any `a` run, the
    * FULL `b` domain — a predicate on `b` alone prunes nothing, so a
    * 100 TB table clustered for one query pattern pays full scans for
    * the other. Interleaving the keys' bits (bit `i` of the cell id
    * alternates between the keys' bucket bits) makes any contiguous
    * run of cell ids cover a ~square region of key space: every row
    * group's min/max stats are narrow on EVERY key, and a filter on
    * any subset of the keys prunes to ~selectivity^(1/k) of the
    * groups instead of all of them. The price is that single-key
    * pruning is shallower than a dedicated single-key layout — Z-order
    * is the right call when more than one column is a common
    * predicate, which is exactly the multi-tenant 100 TB lake case.
    *
    * Buckets are EQUI-DEPTH (per-key `approxQuantile` boundaries, a
    * driver-side array of `2^bitsPerKey - 1` doubles per key), not
    * equi-width: real key distributions are skewed (this corpus's
    * `value` has median 35 of max 490) and equi-width grids would
    * pack most rows into a few cells, voiding the locality the
    * interleave exists to buy. The per-key quantizer is a native
    * codegen'd binary-search expression
    * ([[graft.functions.EquiDepthBucket]], O(log buckets) per row, no
    * UDF); the interleave is plain shifts — the whole cell computation
    * stays inside whole-stage codegen.
    *
    * Keys must be numeric-castable (timestamps: cast to long first).
    */
  def zorderValue(df: DataFrame, keys: Seq[String],
      bitsPerKey: Int = 8): Column = {
    val buckets = bucketExprs(df, keys, bitsPerKey)
    interleave(buckets, bitsPerKey, keys.size)
  }

  /** Per-key equi-depth bucket-id expressions — ONE native
    * [[graft.functions.EquiDepthBucket]] node per key (binary search
    * over the driver-side boundary array, codegen'd). The obvious
    * when-chain spelling (sum of 2^bits comparisons per key) was
    * measured at ~60 µs/row: the giant tree both bloats Catalyst's
    * rule-driven analysis (depth- AND node-linear) and falls out of
    * whole-stage codegen into interpreted eval — the exact failure
    * mode the SURVEY §4 native-kernel tier exists for. */
  private def bucketExprs(df: DataFrame, keys: Seq[String],
      bitsPerKey: Int): Seq[Column] = {
    require(keys.nonEmpty, "zorder: need at least one key")
    require(bitsPerKey >= 1 && bitsPerKey <= 16, "zorder: bitsPerKey in [1,16]")
    require(keys.size * bitsPerKey <= 62, "zorder: cell id must fit a long")
    val q = 1 << bitsPerKey
    val numeric = df.select(keys.map(k => col(k).cast("double").as(k)): _*)
    // one pass over the table computes ALL keys' boundary arrays
    // (Greenwald-Khanna sketch per column); eps = 1/(4q) keeps the
    // bucket-population error well under one bucket width
    val bounds: Array[Array[Double]] = numeric.stat.approxQuantile(
      keys.toArray, (1 until q).map(_.toDouble / q).toArray, 0.25 / q)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    keys.zip(bounds).map { case (k, bs) =>
      // duplicate boundaries (low-cardinality or heavily skewed keys)
      // collapse: fewer distinct buckets, still monotone in the key
      ColumnBridge.column(graft.functions.EquiDepthBucket(
        ColumnBridge.expression(col(k).cast("double")), bs.distinct))
    }
  }

  /** Interleave: bit b of key i lands at position b*k + i, so a
    * contiguous cell-id interval spans ~equal extent in every key. */
  private def interleave(buckets: Seq[Column], bitsPerKey: Int,
      nKeys: Int): Column = {
    val terms = for {
      b <- 0 until bitsPerKey
      (bucket, i) <- buckets.zipWithIndex
    } yield shiftleft(
      shiftright(bucket.cast("long"), b).bitwiseAND(lit(1L)), b * nKeys + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-order-clustered on `keys`: rows are range-
    * partitioned and sorted by the interleaved cell id, then the
    * helper columns are dropped — the at-rest schema is unchanged,
    * the pruning comes entirely from the original columns' now-narrow
    * row-group min/max stats. Same write cost as [[clusteredWrite]]
    * (one range Exchange + local sort) plus the one quantile pass.
    *
    * The bucket ids are STAGED as their own projection columns rather
    * than inlined into the cell expression: the interleave reads each
    * bucket `bitsPerKey` times, and staging guarantees one binary
    * search per key per row regardless of whether the executing plan
    * gets subexpression elimination (CollapseProject keeps
    * multiply-referenced non-trivial aliases staged). */
  def zorderWrite(df: DataFrame, dst: String, keys: Seq[String],
      files: Int, bitsPerKey: Int = 8,
      blockBytes: Long = 128L << 20): Unit = {
    val buckets = bucketExprs(df, keys, bitsPerKey)
    val bNames = keys.indices.map(i => s"__graft_zb$i")
    val staged = df.select(
      (df.columns.map(col).toSeq ++ bNames.zip(buckets).map { case (n, c) => c.as(n) }): _*)
    staged
      .withColumn("__graft_z",
        interleave(bNames.map(col), bitsPerKey, keys.size))
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop(bNames :+ "__graft_z": _*)
      .write.mode("overwrite")
      .option("parquet.block.size", blockBytes)
      .parquet(dst)
  }

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

  /** [[compactFiles]] for a Z-ordered table: bin-pack the accreted
    * small files into ~`targetBytes` outputs re-clustered on the
    * interleaved cell id (a key-ordered compaction would silently
    * downgrade the layout to lexicographic and lose trailing-key
    * pruning; plain coalesce would lose everything). Quantile
    * boundaries are re-derived from the compacted data, so the grid
    * tracks distribution drift across ingest epochs. */
  def compactFilesZ(spark: SparkSession, src: String, dst: String,
      keys: Seq[String], targetBytes: Long, bitsPerKey: Int = 8,
      blockBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    zorderWrite(spark.read.parquet(src), dst, keys, files, bitsPerKey, blockBytes)
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
