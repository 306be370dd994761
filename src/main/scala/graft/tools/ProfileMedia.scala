package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{CachePool, GraftSession}
import graft.operators.{Dedup, Multimodal}

/** Dev profiler: phase decomposition of the q64 media-dedup tail —
  * the r17 verdict's item 3 (the ~2 s steady floor after the codec
  * fix is "banded pairs + CC + keep-join over 2 000 fingerprints —
  * job-count-bound"). Times each phase separately so the fix targets
  * the measured cost, not the narrative.
  *
  * Usage: graft.tools.ProfileMedia [iters]  (env: SPARK_GRAFT_SF_DIR)
  */
object ProfileMedia {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 3
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.heavyBatch(GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-profile-media"),
      shufflePartitions = cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = math.max(300L, math.min(2000L, graft.sources.Tables.documentCount(spark, d)))
    val dir = java.nio.file.Files.createTempDirectory("q64prof").toString + "/fp.parquet"
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      Multimodal.hashImages(graft.queries.MediaQ.synthCorpus(spark, n))
        .filter($"decoded").select($"id", $"simhash")
        .repartition(1).write.mode("overwrite").parquet(dir)
      val t1 = System.nanoTime()
      val fpR = spark.read.parquet(dir)
      val pairs = Dedup.simhashPairs(fpR, maxDist = 3).select($"id_a", $"id_b")
      val cc = Dedup.connectedComponents(pairs)
      val t2 = System.nanoTime()
      val out = fpR.select($"id")
        .join(cc.withColumnRenamed("doc_id", "id").withColumnRenamed("cluster_id", "cc"),
          Seq("id"), "left")
        .select($"id", coalesce($"cc", $"id").as("cluster_id"))
        .withColumn("keep", $"id" === $"cluster_id")
      out.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      CachePool.drain()
      println(f"MEDIA iter $i: write=${(t1 - t0) / 1e9}%.3f pairs+cc=${(t2 - t1) / 1e9}%.3f " +
        f"final=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
