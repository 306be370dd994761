package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft functions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_fingerprint('hello world') AS fp,
        |       graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       graft_hyperplane_bits(array(1.0d, -1.0d), 4) AS bits""".stripMargin).head
    assert(row.getLong(0) == Fingerprint.hash("hello world"))
    assert(row.getDouble(1) == 11.0)
    assert(row.getSeq[Int](2).length == 4)
  }

  test("graft_shingle_keys and graft_simhash60 callable from SQL, matching the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_shingle_keys('one two three four five six', 5) AS sk,
        |       graft_simhash60('alpha beta alpha') AS sh""".stripMargin).head
    val viaCol = Seq(("one two three four five six", "alpha beta alpha")).toDF("a", "b")
      .select(graft.functions.ShingleKeys.shingleKeys($"a", 5).as("sk"),
        graft.functions.SimHash60.simhash60($"b").as("sh")).head
    assert(row.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getLong(1) == viaCol.getLong(1))
    val grams = spark.sql("SELECT graft_ngrams('a b a b', 2) AS g").head.getSeq[String](0)
    assert(grams == Seq("a b", "b a", "a b")) // occurrence-preserving
  }

  test("graft_hyperplane_bits accepts BIGINT literals and rejects non-integral args at analysis") {
    GraftExtensions.register(spark)
    // BIGINT literal (SQL `4L`) must coerce, not ClassCastException
    val bits = spark.sql("SELECT graft_hyperplane_bits(array(1.0d, -1.0d), 4L) AS b").head.getSeq[Int](0)
    assert(bits.length == 4)
    // non-integral literal → AnalysisException at plan time
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(1.0d), 'x')").head
    }
    assert(e1.getMessage.contains("graft_hyperplane_bits"))
    // out-of-range plane count → AnalysisException, not runtime AIOOBE
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(1.0d), 100000)").head
    }
    assert(e2.getMessage.contains("graft_hyperplane_bits"))
  }
}
