package graft.tools

import graft.{CachePool, GraftSession, SparkEntry}

/** Dev tool: run ONE SparkEntry query against any table dir and print
  * wall time + row count — the targeted complement to ScaleUpRun's
  * full sweep (e.g. re-measuring a single line against an already
  * generated scale-up corpus, or timing a query added after a sweep's
  * binary was launched).
  *
  * Usage: RunOne <query_name> [sfDir] [reps]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunOne <query_name> [sfDir] [reps]")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local("graft-runone")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      CachePool.drain()
      println(f"RUNONE $name rep=$r sec=${(System.nanoTime() - t0) / 1e9}%.1f rows=$rows dir=$dir")
    }
    spark.stop()
  }
}
