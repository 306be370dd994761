package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FanOut

/** The r17 scale-adaptive scan fan-out: fires only below the session's
  * default parallelism, never changes row values. */
class FanOutSpec extends AnyFunSuite {
  import TestSpark._

  test("a narrow relation widens to default parallelism; rows unchanged") {
    import spark.implicits._
    val df = spark.range(1000).select($"id", md5($"id".cast("string")).as("h"))
      .coalesce(1)
    assert(df.rdd.getNumPartitions == 1)
    val wide = FanOut.widen(df)
    assert(wide.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // identical multiset of rows — only placement may change
    assert(wide.orderBy($"id").collect().toSeq === df.orderBy($"id").collect().toSeq)
  }

  test("a relation at or above default parallelism is returned untouched") {
    val p = spark.sparkContext.defaultParallelism
    val df = spark.range(1000).repartition(p + 3).toDF()
    val out = FanOut.widen(df)
    assert(out.rdd.getNumPartitions == p + 3)
    // identity — no exchange added on top
    assert(out.queryExecution.logical eq df.queryExecution.logical)
  }
}
