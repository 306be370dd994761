package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed co-located join: same results as a plain join, with zero
  * Exchange in the physical plan (the 100 TB fact-fact join path).
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans with no Exchange and matches plain join") {
    val base = Files.createTempDirectory("graft_bucketed").toString
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8, s"$base/orders")
    Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8, s"$base/lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
      val plain = orders.join(lineitem, "o_orderkey")
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
