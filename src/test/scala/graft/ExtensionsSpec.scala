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
}
