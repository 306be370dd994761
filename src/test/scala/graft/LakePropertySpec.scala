package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout, Manifest}

/** Property-based checks for the at-rest index family: the artifact
  * is built ONCE (a per-case parquet write would drown the suite),
  * then random PREDICATES probe it — pruning must be invisible in the
  * answer for every range, every probe set, every term subset. The
  * reference is the driver-side collected corpus (one collect,
  * in-memory filters per case), so a disagreement can only come from
  * the operator, never from a second Spark plan. */
class LakePropertySpec extends AnyFunSuite {
  import TestSpark._

  private def checkProp(prop: Prop, cases: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(cases)
      .withInitialSeed(Seed(20260816L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val n = 20000L

  test("manifest pruning is answer-invisible for random ranges and probe sets") {
    val dir = Files.createTempDirectory("graft_prop_mf").toString
    try {
      val data = spark.range(n).select(
        col("id"),
        (col("id") * 48271L % n).as("k"))
      Layout.clusteredWrite(data, dir, Seq("k"), files = 8)
      Manifest.write(spark, dir, Seq("k"), Some("id"))
      // driver-side reference: (id, k) pairs
      val ref = data.collect().map(r => (r.getLong(0), r.getLong(1)))

      val genRange = for {
        lo <- Gen.choose(-100L, n + 100L)
        w <- Gen.choose(0L, n / 4)
      } yield (lo, lo + w)
      checkProp(Prop.forAllNoShrink(genRange) { case (lo, hi) =>
        val got = Manifest.prunedRead(spark, dir,
            ranges = Seq(("k", lo.toDouble, hi.toDouble)))
          .filter(col("k").between(lo, hi))
          .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("k"))).toSet
        val want = ref.filter(p => p._2 >= lo && p._2 <= hi).toSet
        got == want
      }, cases = 12)

      val genProbes = Gen.nonEmptyListOf(Gen.choose(-50L, n + 50L))
        .map(_.distinct.take(8))
      checkProp(Prop.forAllNoShrink(genProbes) { probes =>
        val got = Manifest.prunedRead(spark, dir, bloomAnyOf = probes)
          .filter(col("id").isin(probes: _*))
          .collect().map(_.getAs[Long]("id")).toSet
        val want = ref.map(_._1).filter(probes.contains).toSet
        got == want
      }, cases = 12)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("inverted-index lookups equal the corpus scan for random term subsets") {
    val dir = Files.createTempDirectory("graft_prop_idx").toString
    try {
      // ~8 tokens per doc over a 40-term vocab: dense enough that
      // random conjunctions hit, sparse enough that they also miss
      val docs = spark.range(2000).select(
        col("id").as("doc_id"),
        expr("concat_ws(' ', transform(sequence(0, 7), i -> concat('t', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 40 as string))))")
          .as("text"))
      InvertedIndex.build(docs, dir, files = 4, blockBytes = 256 * 1024)
      // driver-side reference: doc_id -> distinct term set
      val ref = docs.select(col("doc_id"),
          array_distinct(graft.functions.TextFunctions.tokens(col("text"))).as("ts"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toSet))

      val genTerms = Gen.nonEmptyListOf(Gen.oneOf(
          (0 until 40).map(i => s"t$i") ++ Seq("absent1", "absent2")))
        .map(_.distinct.take(4))
      checkProp(Prop.forAllNoShrink(genTerms) { terms =>
        val gotAll = InvertedIndex.lookupAll(spark, dir, terms)
          .collect().map(_.getLong(0)).toSet
        val wantAll = ref.filter(d => terms.forall(d._2.contains)).map(_._1).toSet
        val gotAny = InvertedIndex.lookupAny(spark, dir, terms)
          .collect().map(_.getLong(0)).toSet
        val wantAny = ref.filter(d => terms.exists(d._2.contains)).map(_._1).toSet
        gotAll == wantAll && gotAny == wantAny
      }, cases = 15)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
