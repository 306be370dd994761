package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  lazy val spark: SparkSession = GraftSession.local("graft-test", cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}
