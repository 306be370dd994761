package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** Distributed global prefix sum: exact equality with the
  * single-partition window under any partitioning, and the plan must
  * NOT contain the single-partition collapse it exists to avoid. */
class PrefixSpec extends AnyFunSuite {
  import TestSpark._

  private def corpus(n: Int, parts: Int) = {
    import spark.implicits._
    // deterministic scattered values and a non-sorted input layout
    (0 until n).map(i => (i.toLong, ((i * 2654435761L) % 97 + 1), s"k${(i * 31) % n}"))
      .toDF("id", "v", "ord").repartition(parts)
  }

  test("cumsum equals the one-partition window result under 1/4/32-way input partitioning") {
    import spark.implicits._
    val expected = corpus(5000, 4)
      .coalesce(1)
      .withColumn("cum", sum($"v").over(
        org.apache.spark.sql.expressions.Window.orderBy($"ord", $"id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select($"id", $"cum").as[(Long, Long)].collect().toMap
    Seq(1, 4, 32).foreach { parts =>
      val got = Prefix.cumsum(corpus(5000, parts), Seq(col("ord"), col("id")), col("v"))
      val gotMap = got.select($"id", $"cum").as[(Long, Long)].collect().toMap
      CachePool.drain()
      assert(gotMap === expected, s"diverged at input parts=$parts")
    }
  }

  test("cumsum rejects NULL values loudly (repo convention) instead of silently contributing 0") {
    import spark.implicits._
    val df = Seq((1L, java.lang.Long.valueOf(3L)), (2L, null: java.lang.Long))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      Prefix.cumsum(df, Seq(col("id")), col("v")).collect()
    }
    CachePool.drain()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("NULL in value column")), s"unexpected error: $ex")
  }

  test("cumsum plan is parallel: no single-partition exchange, window is partitioned") {
    val plan = Prefix.cumsum(corpus(2000, 8), Seq(col("ord"), col("id")), col("v"))
      .queryExecution.executedPlan.toString
    CachePool.drain()
    assert(!plan.contains("SinglePartition"),
      s"global cumsum collapsed to one partition:\n${plan.take(1500)}")
    assert(plan.contains("windowspecdefinition(__pid"),
      "running-sum window must be partitioned by the range id")
  }

  test("q77 shard packing: shards contiguous in hash order, spans bounded by budget + one doc") {
    import spark.implicits._
    val rows = SparkEntry.queries("q77_shard_pack")(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"cum", $"shard")
      .as[(Long, Long, Long, Long)].collect()
    CachePool.drain()
    assert(rows.nonEmpty)
    // cum is a valid inclusive prefix sum: total matches, all positive
    val total = rows.map(_._2).sum
    assert(rows.map(_._3).max === total)
    // shard ids: every doc's first token picks its shard
    rows.foreach { case (id, nt, cum, shard) =>
      assert(shard === (cum - nt) / 65536L, s"doc $id shard mismatch")
    }
    // shards are contiguous: sorted by cum, shard ids never decrease
    // and never skip
    val byCum = rows.sortBy(_._3)
    byCum.sliding(2).foreach {
      case Array((_, _, _, s1), (_, _, _, s2)) =>
        assert(s2 >= s1 && s2 <= s1 + 1, s"shard sequence broke: $s1 -> $s2")
      case _ =>
    }
    // each shard's token mass stays within budget + the straddling doc
    val maxDoc = rows.map(_._2).max
    byCum.groupBy(_._4).foreach { case (shard, docs) =>
      val mass = docs.map(_._2).sum
      assert(mass <= 65536L + maxDoc, s"shard $shard over budget: $mass")
    }
  }
}
