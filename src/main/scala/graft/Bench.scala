package graft

import org.apache.spark.sql.SparkSession

import graft.tools.MiniJson

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen paths once so the first measured query isn't
    // charged for classloading (driver compares per-query numbers).
    // q18 warms the json/Jackson/codegen stack AT THE BENCH SCALE:
    // the parse loop is JIT-bound (cold 7.3 s → 1.6 s by iteration 6 in
    // one JVM, ProfileQ evidence in STRESS.md), and a toy-scale warmup
    // left C2 half-done — the measured line swung 2.2–3.9 s across
    // rounds with no code change. One unmeasured full-scale pass pins
    // the measured iteration at steady state.
    SparkEntry.entry(spark).count()
    SparkEntry.queries("q18_canal_parse")(spark, sfDir).queryExecution.toRdd.count()
    // warm the k-means / shingle / CC kernel classes at toy scale so the
    // sf0.1 setup lines below measure the work, not JIT + classloading
    queries.SimilarityQ.ivfModel(spark, "/root/testdata/sf0.001")
    queries.SimilarityQ.semdedupModel(spark, "/root/testdata/sf0.001")
    queries.DedupQ.ensureClusters(spark, "/root/testdata/sf0.001")
    CachePool.drain()

    // One-time indexing costs, timed under their OWN lines (the
    // train-once / probe-forever split): q38's k-means and the q41
    // cluster-artifact build are paid once per session, so charging
    // them to whichever query runs first made round-over-round
    // per-query numbers incomparable. Total still includes them.
    val setups: Seq[(String, (SparkSession, String) => Unit)] = Seq(
      "q38_train" -> ((s, d) => { queries.SimilarityQ.ivfModel(s, d); () }),
      "q53_train" -> ((s, d) => { queries.SimilarityQ.semdedupModel(s, d); () }),
      "q41_clusters_build" -> ((s, d) => { queries.DedupQ.ensureClusters(s, d); () })
    )
    val setupResults = setups.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      CachePool.drain()
      (name, elapsed, err)
    }

    val results = setupResults ++ SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() forces every output column to materialize —
      // df.count() would collapse to count(1) and let Catalyst prune
      // the projections being benchmarked. A crashed query must surface
      // as an error and a nonzero exit, never as a fast time.
      val err =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
        }
      // stop the clock BEFORE cache cleanup: drain() unpersists blocks
      // across 32 executor threads and its (variable) latency was being
      // charged to whichever query ran it — bookkeeping, not query work
      val elapsed = (System.nanoTime() - t0) / 1e9
      CachePool.drain()
      (name, elapsed, err)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) => s"${MiniJson.quote(k)}:${MiniJson.quote(m)}" }
    val errJson = errs.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
