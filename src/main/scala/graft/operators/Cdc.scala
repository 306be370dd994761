package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → current-state materialization (the upsert view a
  * Flink changelog pipeline maintains; the reference's canal/debezium
  * jobs feed exactly such changelogs into upsert sinks).
  *
  * Batch form: one shuffle on the primary key, per-key top-1 by
  * version (no global sort). The shuffle key equals the key any
  * downstream upsert sink needs, so the exchange is reusable. The
  * streaming twin (per-key state via flatMapGroupsWithState) is
  * graft.streaming.Pipelines.cdcUpsert.
  */
object Cdc {

  /** Latest surviving row per `pk`, ordered by `version` columns
    * (latest wins; ties broken by the caller-supplied total order).
    * Rows whose final image is a delete (`isDelete`) are dropped. */
  def materialize(changelog: DataFrame, pk: Seq[Column], version: Seq[Column], isDelete: Column): DataFrame = {
    val w = Window.partitionBy(pk: _*).orderBy(version.map(_.desc): _*)
    changelog
      .withColumn("__rn", row_number().over(w))
      // coalesce: a NULL isDelete (e.g. snapshot rows with no op) is
      // "not a delete" — bare !NULL is NULL and filter would silently
      // drop the key's latest image
      .filter(col("__rn") === 1 && !coalesce(isDelete, lit(false)))
      .drop("__rn")
  }
}
