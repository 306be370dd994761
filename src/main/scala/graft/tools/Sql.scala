package graft.tools

import graft.{GraftExtensions, GraftSession}

/** Dev tool: run one SQL statement with graft functions registered.
  * Usage: graft.tools.Sql "SELECT graft_fingerprint('x')" */
object Sql {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-sql", 4)
    GraftExtensions.register(spark)
    spark.sql(args(0)).show(20, truncate = false)
    spark.stop()
  }
}
