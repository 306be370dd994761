package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.{CachePool, GraftSession, SparkEntry}

/** Dev tool: dump `.explain("formatted")` for every (or selected)
  * SparkEntry query to `<outDir>/<name>_<suffix>.txt` — the plan
  * evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: graft.tools.DumpPlans <outDir> <suffix> [q1,q2,...]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS.
  *
  * Uses the same tuned session as Bench so the dumped plans are the
  * planner's bench-shape output (AQE wrappers included — the files
  * show the static plan; AQE re-planning is noted where it matters).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.heavyBatch(GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-plans"),
      shufflePartitions = cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val s = df.queryExecution.explainString(FormattedMode)
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), s)
          println(s"[plans] $name ok")
        } catch { case e: Throwable =>
          System.err.println(s"[plans] $name FAILED: ${e.getMessage}")
        }
        finally CachePool.drain()
      }
    spark.stop()
  }
}
