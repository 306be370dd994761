package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CachePool, GraftSession, SparkEntry}

/** Dev profiler: run one named SparkEntry query N times in a single
  * JVM and print per-iteration wall times — separates JIT/codegen
  * warmup from steady-state cost when a bench line swings between
  * rounds (each Bench run measures iteration ONE of most queries).
  *
  * Usage: graft.tools.ProfileQ <query> [iters]   (env: SPARK_GRAFT_SF_DIR)
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, d).queryExecution.toRdd.count()
      val el = (System.nanoTime() - t0) / 1e9
      CachePool.drain()
      println(f"PROFILE $name iter $i: $el%.3f s")
    }
    spark.stop()
  }
}
