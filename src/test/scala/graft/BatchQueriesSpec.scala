package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SURVEY §2 query runs and returns rows at smoke scale. The
  * value-level gate is the driver's DuckDB oracle (tools/verify.sh);
  * this spec guards execution health (analysis, codegen, encoders).
  */
class BatchQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or a documented exemption") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is non-empty") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
