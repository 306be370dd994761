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

  test("BPE memo lifecycle: q61 reuses q60's vocabulary; an in-place corpus rewrite needs q60 or clearBpeMemo") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_memo").toString
    def write(texts: Seq[String]): Unit =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      write(Seq.fill(20)("alpha beta alpha beta"))
      val m1 = queries.TextQ.bpeMerges(spark, dir)
      assert(m1.nonEmpty)
      // rewrite the corpus in place: the memo (deliberately, same
      // contract as IvfIndex's) still serves the OLD vocabulary
      write(Seq.fill(20)("gamma delta gamma delta"))
      assert(queries.TextQ.bpeMerges(spark, dir).toSeq == m1.toSeq)
      // eviction (or re-running q60) picks up the new corpus
      queries.TextQ.clearBpeMemo(dir)
      val m2 = queries.TextQ.bpeMerges(spark, dir)
      assert(m2.toSeq != m1.toSeq && m2.nonEmpty)
      CachePool.drain()
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
