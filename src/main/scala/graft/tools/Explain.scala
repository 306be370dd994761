package graft.tools

import graft._

/** Dev tool: print the executed plan of one SparkEntry query.
  * Usage: graft.tools.Explain <query_name> [sfDir] */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local("explain", 8)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
