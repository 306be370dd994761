package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{CachePool, GraftSession}
import graft.operators.{Adaptive, Dedup}
import graft.sources.Tables

/** Dev profiler: phase decomposition of q26 (MinHash-LSH) — the r17
  * verdict's item 4. Times shingles / exact-group collapse /
  * signatures / banding+candidates / verify+expand separately.
  *
  * Usage: graft.tools.ProfileLsh [iters]  (env: SPARK_GRAFT_SF_DIR)
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 3
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.heavyBatch(GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile-lsh"),
      shufflePartitions = cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    (1 to iters).foreach { i =>
      val nDocs = Tables.documentCount(spark, d)
      val r = Adaptive.minhashRows(nDocs)
      val t0 = System.nanoTime()
      val hs = graft.queries.DedupQ.cappedShingles(spark, d, nDocs)
      hs.queryExecution.toRdd.count()
      val t1 = System.nanoTime()
      val groups = CachePool.cache(Dedup.exactShingleGroups(hs))
      groups.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      val repHs = hs.join(groups.filter(col("id") === col("rep")).select("id"), "id")
      val sig = Dedup.minhashSignatures(repHs, numHashes = r * Adaptive.minhashBands(r))
      sig.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      val cand = Dedup.lshCandidates(sig, rowsPerBand = r)
      cand.queryExecution.toRdd.count()
      val t4 = System.nanoTime()
      val out = Dedup.expandExactPairs(Dedup.verifyJaccard(cand, repHs, 0.6), groups)
      out.queryExecution.toRdd.count()
      val t5 = System.nanoTime()
      CachePool.drain()
      println(f"LSH iter $i: shingles=${(t1 - t0) / 1e9}%.3f groups=${(t2 - t1) / 1e9}%.3f " +
        f"sig=${(t3 - t2) / 1e9}%.3f cand=${(t4 - t3) / 1e9}%.3f verify=${(t5 - t4) / 1e9}%.3f " +
        f"total=${(t5 - t0) / 1e9}%.3f (NOTE: phase timing re-executes shared stages; " +
        "the query's one-pass total is ProfileQ q26)")
    }
    spark.stop()
  }
}
