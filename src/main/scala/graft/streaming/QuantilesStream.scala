package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.LogHistQuantiles

/** Streaming per-group quantiles — q69's micro-batch twin.
  *
  * Exact streaming quantiles are impossible with bounded state (the
  * narrowing passes of [[graft.operators.Quantiles]] re-scan the
  * corpus), so the streaming answer is the [[LogHistQuantiles]]
  * sketch: per group the state store holds one occupied-bucket count
  * map (KB-scale for real value distributions) at any stream depth,
  * with a GUARANTEED 2^-m relative error and deterministic,
  * order-independent results — the streamed quantiles after N batches
  * equal the batch sketch over the union of those batches exactly,
  * and sit within relative error of the exact q69 answer (both pinned
  * in QuantilesSpec).
  *
  * Monitoring shape (the DataKit latency-percentile job the reference
  * family runs on Flink): running p50/p95/p99 of a metric column per
  * key, `outputMode("update")`/`"complete"`, unwindowed.
  */
object QuantilesStream {

  /** (g, n, buckets_used, qs[...]) running sketch quantiles of
    * `value` per `group`. NULLs excluded (SQL rank semantics). */
  def groupQuantiles(df: DataFrame, group: Column, value: Column,
      pcts: Seq[Int], m: Int = 7): DataFrame = {
    val lh = udaf(new LogHistQuantiles(pcts, m), Encoders.scalaDouble)
    df.select(group.as("g"), value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("g"))
      .agg(lh(col("v")).as("lh"))
      .select(col("g"), col("lh.n").as("n"),
        col("lh.buckets_used").as("buckets_used"), col("lh.qs").as("qs"))
  }
}
