package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.operators.Dedup

/** Streaming distinct-count estimation — q67's micro-batch twin.
  *
  * Structured Streaming cannot run COUNT(DISTINCT) at all (state
  * would be the full key set); the KMV sketch IS the streaming
  * answer: per group the state store holds one k-long bottom-k buffer
  * (8 KB at k=1024) no matter how many shingles have streamed
  * through, and the sketch's merge is exactly the update-mode
  * aggregation step. Because KMV is deterministic and order-
  * insensitive (a set fold), the streamed estimate after N batches
  * equals the batch q67 over the union of those batches — the same
  * batch≡stream contract the other streaming twins pin.
  *
  * Use `outputMode("update")`/`"complete"`; the aggregation is
  * unwindowed (a running corpus-lifetime estimate, the DataKit-style
  * monitoring shape: "how much NEW material is this feed actually
  * bringing?").
  */
object KmvStream {

  /** (lang, k_used, kth_min, est_distinct) running estimate over a
    * (possibly streaming) documents relation with `lang`/`text`. */
  def distinctShingles(docs: DataFrame, n: Int = 13, k: Int = 1024): DataFrame = {
    val sh = Dedup.hashedShingleSets(docs, col("lang"), col("text"), n)
    sketch(sh, col("id").as("lang"), col("sh"), k)
  }

  /** Generic form: KMV over any long-key column, grouped. */
  def sketch(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    val kmv = udaf(new KmvSketch(k), Encoders.scalaLong)
    df.select(group.as("g"), key.as("sh"))
      .groupBy(col("g"))
      .agg(kmv(col("sh")).as("sk"))
      .select(col("g").as("lang"),
        col("sk.k_used").as("k_used"),
        col("sk.kth_min").as("kth_min"),
        col("sk.est_distinct").as("est_distinct"))
  }
}
