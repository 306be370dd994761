package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A coherent group of SparkEntry queries plus their DuckDB oracles. */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def defs: Map[String, Q]
  def oracles: Map[String, String]
}
