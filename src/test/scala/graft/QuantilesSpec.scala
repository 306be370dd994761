package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortableDouble
import graft.operators.Quantiles

/** Sort-free exact quantiles (operators.Quantiles + q69). */
class QuantilesSpec extends AnyFunSuite {
  import TestSpark._

  private def truth(vals: Seq[Double], p: Int): Double = {
    val s = vals.sorted
    s(((p.toLong * s.size + 99) / 100).toInt - 1)
  }

  test("sortable-bits map is order-preserving and invertible across sign/zero/subnormal") {
    val xs = Seq(Double.NegativeInfinity, -1e300, -2.5, -1e-320, -0.0, 0.0,
      1e-320, 0.25, 7.0, 1e300, Double.PositiveInfinity)
    val ss = xs.map(SortableDouble.toSortable)
    assert(ss == ss.sorted, "sortable image must preserve order")
    assert(ss.distinct.size == ss.size, "sortable image must be injective")
    xs.zip(ss).foreach { case (x, s) =>
      val back = SortableDouble.fromSortable(s)
      assert(java.lang.Double.doubleToLongBits(back) == java.lang.Double.doubleToLongBits(x))
    }
    // expression path == scala path on real data
    import spark.implicits._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select($"value", SortableDouble.sortable($"value").as("sb"))
      .as[(Double, Long)].collect()
      .foreach { case (v, sb) => assert(sb == SortableDouble.toSortable(v)) }
  }

  test("narrowing finds exact rank statistics; tiny buckets force multiple passes") {
    import spark.implicits._
    val rnd = new Random(7)
    // group a: continuous; group b: heavy ties (forces point-interval
    // resolution); group c: single row; group d: negatives + zeros
    val rows =
      (1 to 5000).map(_ => ("a", rnd.nextDouble() * 1000)) ++
      (1 to 3000).map(_ => ("b", (rnd.nextInt(5) * 2.5))) ++
      Seq(("c", 42.0)) ++
      (1 to 2000).map(_ => ("d", rnd.nextDouble() * 40 - 20))
    val df = rows.toDF("g", "v").repartition(7)
    val pcts = Seq(1, 50, 90, 99, 100)
    // buckets=4/leafLimit=8: the 5000-row group needs ~6 narrowing
    // passes before any leaf fits — the loop is genuinely exercised
    val got = Quantiles.groupQuantiles(df, "g", "v", pcts, buckets = 4, leafLimit = 8)
    CachePool.drain()
    val byG = rows.groupBy(_._1)
    assert(got.size == byG.size)
    got.foreach { r =>
      val vals = byG(r.group).map(_._2)
      assert(r.n == vals.size)
      pcts.foreach { p =>
        assert(r.byPct(p) == truth(vals, p),
          s"group ${r.group} p$p: got ${r.byPct(p)} want ${truth(vals, p)}")
      }
    }
  }

  test("null values are excluded from ranks (SQL COUNT/ORDER BY semantics)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("g", 5.0), Row("g", null), Row("g", 1.0), Row("g", 9.0)),
      schema)
    val r = Quantiles.groupQuantiles(df, "g", "v", Seq(50, 100)).head
    CachePool.drain()
    assert(r.n == 3 && r.byPct(50) == 5.0 && r.byPct(100) == 9.0)
  }

  test("null GROUPS are rejected loudly, not silently dropped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", DoubleType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("g", 5.0), Row(null, 1.0)),
      schema)
    val e = intercept[Exception] {
      Quantiles.groupQuantiles(df, "g", "v", Seq(50))
    }
    CachePool.drain()
    assert(String.valueOf(e.getMessage).contains("NULL in group column") ||
      String.valueOf(e.getCause).contains("NULL in group column"))
  }

  test("q69 equals the window-rank percentiles in-engine at sf0.01") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val got = queries.SketchQ.defs("q69_exact_quantiles")(spark, d)
    val ev = spark.read.parquet(s"$d/events.parquet")
      .select($"event_type", $"value").filter($"value".isNotNull)
    val n = ev.groupBy($"event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"event_type").orderBy($"value")
    val expected = ev.withColumn("rn", row_number().over(w))
      .join(n, "event_type")
      .groupBy($"event_type")
      .agg(max($"n").as("n"),
        max(when($"rn" === (lit(50) * $"n" + 99).divide(100).cast("long"), $"value")).as("p50"),
        max(when($"rn" === (lit(90) * $"n" + 99).divide(100).cast("long"), $"value")).as("p90"),
        max(when($"rn" === (lit(99) * $"n" + 99).divide(100).cast("long"), $"value")).as("p99"))
    val g = got.collect().map(r => r.getString(0) -> r).toMap
    CachePool.drain()
    expected.collect().foreach { e =>
      val r = g(e.getString(0))
      assert(r.getLong(1) == e.getLong(1))
      Seq(2, 3, 4).foreach(i => assert(r.getDouble(i) == e.getDouble(i),
        s"${e.getString(0)} col $i: ${r.getDouble(i)} vs ${e.getDouble(i)}"))
    }
    assert(g.size == 5)
  }

  test("LogHist kernel: bucket order follows value order; lower bound within 2^-m relative error") {
    val m = 7
    val xs = Seq(Double.NegativeInfinity, -1e300, -2.5, -1e-320, -0.0, 0.0,
      1e-320, 0.25, 7.0, 1e300, Double.PositiveInfinity)
    val bs = xs.map(functions.LogHist.bucketOf(_, m))
    assert(bs == bs.sorted, "bucket image must preserve value order")
    // lower bound never exceeds the value, and is within relative 2^-m
    // for finite values (absolute ~0 at the subnormal floor)
    xs.filter(v => !v.isInfinite).foreach { v =>
      val lb = functions.LogHist.lowerBound(functions.LogHist.bucketOf(v, m), m)
      assert(lb <= v, s"lower bound $lb above value $v")
      assert(v - lb <= math.abs(v) * math.pow(2, -m) + 1e-300, s"bucket too wide at $v: $lb")
    }
    intercept[IllegalArgumentException](functions.LogHist.bucketOf(Double.NaN, m))
  }

  test("LogHist sketch quantiles within guaranteed relative error of exact; bounded occupied buckets") {
    import spark.implicits._
    val m = 7
    val rnd = new Random(11)
    // latency-shaped: log-normal around 100, ~12 binary octaves
    val rows = (1 to 20000).map(i => (s"g${i % 3}", math.exp(rnd.nextGaussian()) * 100.0))
    val pcts = Seq(50, 90, 99)
    val got = streaming.QuantilesStream.groupQuantiles(
        rows.toDF("g", "v").repartition(7), col("g"), col("v"), pcts, m)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getSeq[Double](3))).toSeq
    assert(got.size == 3)
    got.foreach { case (g, n, used, qs) =>
      val vals = rows.filter(_._1 == g).map(_._2)
      assert(n == vals.size)
      // state bound: occupied buckets track the octave span, not n
      assert(used <= 13 * (1 << m) && used < n / 2, s"$g buckets_used=$used")
      pcts.zip(qs).foreach { case (p, q) =>
        val exact = truth(vals, p)
        assert(q <= exact && exact - q <= exact * math.pow(2, -m),
          s"$g p$p: sketch $q vs exact $exact out of the 2^-$m bound")
      }
    }
  }

  test("streaming LogHist quantiles == batch sketch over the union of batches (bounded state)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rnd = new Random(13)
    val rows = (1 to 9000).map(i => (s"k${i % 4}", math.exp(rnd.nextGaussian()) * 5.0))
    val in = MemoryStream[(String, Double)]
    val q = streaming.QuantilesStream.groupQuantiles(
        in.toDF().toDF("g", "v"), col("g"), col("v"), Seq(50, 95), m = 7)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("lh_out").start()
    try {
      rows.grouped(3001).foreach { g => in.addData(g.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("lh_out")
      val batch = streaming.QuantilesStream.groupQuantiles(
        rows.toDF("g", "v"), col("g"), col("v"), Seq(50, 95), m = 7)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed sketch quantiles diverged from the batch fold over the same rows")
    } finally q.stop()
  }
}
