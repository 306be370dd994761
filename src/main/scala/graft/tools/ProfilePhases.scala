package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CachePool, GraftSession, SparkEntry}

/** Dev profiler: split one query's wall time into plan CONSTRUCTION
  * (builder fn + analysis), PLANNING (optimizer + physical planning,
  * forced via executedPlan), and EXECUTION (the action) — guide §7.3:
  * when a tiny-data query is slow, the driver is often the bottleneck
  * (huge literal trees, many-join plans), and no executor-side
  * optimization can help.
  *
  * Usage: graft.tools.ProfilePhases <q1,q2,...> [iters]
  */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val iters = if (args.length > 1) args(1).toInt else 4
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.heavyBatch(GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile-phases"),
      shufflePartitions = cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names; i <- 1 to iters) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      CachePool.drain()
      println(f"PHASES $name iter $i: construct=${(t1 - t0) / 1e9}%.3f " +
        f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
