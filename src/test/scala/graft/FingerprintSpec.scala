package graft

import scala.util.Random

import org.apache.spark.sql.functions.countDistinct
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint

/** Native Fingerprint expression: interpreted vs codegen vs reference
  * implementation agreement, and basic hash quality.
  */
class FingerprintSpec extends AnyFunSuite {
  import TestSpark._

  test("expression equals the Scala reference on corpus text (codegen path)") {
    import spark.implicits._
    val got = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"text", Fingerprint.fingerprint($"text").as("fp"))
      .as[(String, Long)].collect()
    got.foreach { case (text, fp) => assert(fp == Fingerprint.hash(text)) }
    assert(got.nonEmpty)
  }

  test("distinct corpus texts map to distinct fingerprints") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    val texts = df.select(countDistinct($"text")).head.getLong(0)
    val fps = df.select(countDistinct(Fingerprint.fingerprint($"text"))).head.getLong(0)
    assert(fps == texts)
  }

  test("seeded random strings: stability and single-char sensitivity") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString
      assert(Fingerprint.hash(s) == Fingerprint.hash(new String(s.toCharArray)))
      val mutated = ((s.head + 1).toChar +: s.tail.toSeq).mkString
      assert(Fingerprint.hash(mutated) != Fingerprint.hash(s))
    }
  }
}
