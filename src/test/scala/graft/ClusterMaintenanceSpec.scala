package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Adaptive, Dedup}
import graft.streaming.ClusterMaintenance

/** Incremental cluster maintenance: streaming N batches of documents
  * must leave the at-rest cluster artifact equal to the batch q41
  * chain run once over the same corpus. */
class ClusterMaintenanceSpec extends AnyFunSuite {
  import TestSpark._

  private def clusterSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("foldPairsIntoClusters: folding edges in batches equals batch connected components") {
    import spark.implicits._
    // chain 1-2-3-4, triangle 10-11-12, late bridge 4-10 merging both,
    // pair 20-21, and a redundant intra-cluster edge in the last batch
    val batches = Seq(
      Seq((2L, 1L), (10L, 11L)),
      Seq((3L, 2L), (11L, 12L), (20L, 21L)),
      Seq((4L, 3L), (10L, 12L)),
      Seq((4L, 10L), (1L, 2L)))
    var clusters = spark.emptyDataset[(Long, Long)].toDF("doc_id", "cluster_id")
    batches.foreach { es =>
      clusters = Dedup.foldPairsIntoClusters(clusters, es.toDF("id_a", "id_b"))
      // materialize each fold as the streaming consumer would (the
      // artifact write); localCheckpoint keeps the test in-memory
      clusters = clusters.localCheckpoint()
    }
    val batchCc = Dedup.connectedComponents(
      batches.flatten.toDF("id_a", "id_b"))
    assert(clusterSet(clusters) == clusterSet(batchCc))
    // the bridge merged everything reachable to min id 1
    assert(clusterSet(clusters).filter(_._1 <= 12).forall(_._2 == 1L))
    CachePool.drain()
  }

  test("crashed-batch replay: uncommitted versions are invisible, replay reads only older state, result identical to a clean run") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cm_crash").toString
    val rootClean = Files.createTempDirectory("graft_cm_clean").toString
    // 3 arrival batches; docs 1/3 and 2/4 are cross-batch near-copies
    val mk = (id: Long, text: String) => (id, text)
    val batches = Seq(
      Seq(mk(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        mk(10, "totally unrelated content lives in this document here now")),
      Seq(mk(2, "one two three four five six seven eight nine ten eleven"),
        mk(3, "beta gamma delta epsilon zeta eta theta iota kappa")),
      Seq(mk(4, "two three four five six seven eight nine ten eleven"),
        mk(11, "another unrelated document with its own words only")))
    def run(root: String, b: Int): Unit =
      graft.streaming.ClusterMaintenance.processBatch(
        batches(b).toDF("doc_id", "text"), b, root, "doc_id", "text")

    // clean reference run
    (0 until 3).foreach(b => run(rootClean, b))
    val expected = clusterSet(graft.streaming.ClusterMaintenance.loadClusters(spark, rootClean))
    assert(expected == Set((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L)))

    // crash scenario: batches 0,1 commit; batch 2 crashes mid-write,
    // leaving an UNCOMMITTED clusters/v=2 (no _SUCCESS) with wrong
    // content and a half-written postings/b=2
    run(root, 0); run(root, 1)
    val afterB1 = clusterSet(graft.streaming.ClusterMaintenance.loadClusters(spark, root))
    Seq((99L, 99L)).toDF("doc_id", "cluster_id")
      .write.parquet(s"$root/clusters/v=2")
    Files.delete(java.nio.file.Paths.get(s"$root/clusters/v=2/_SUCCESS"))
    batches(2).take(1).toDF("doc_id", "text")
      .selectExpr("doc_id AS id", "cast(doc_id as bigint) AS sh", "5L AS n")
      .write.parquet(s"$root/postings/b=2")
    // consumers never see the torn version
    assert(clusterSet(graft.streaming.ClusterMaintenance.loadClusters(spark, root)) == afterB1)
    // replay of batch 2 (same batchId, Structured Streaming's contract)
    // reads only state strictly older than itself and overwrites its own
    // outputs — the torn leftovers must not poison the result
    run(root, 2)
    assert(clusterSet(graft.streaming.ClusterMaintenance.loadClusters(spark, root)) == expected)
    CachePool.drain()
  }

  test("postings compaction: compacted + pruned lookups preserve the artifact exactly; GC drops consumed deltas; compacting batch replays safely") {
    import spark.implicits._
    // 9 arrival batches x 30 docs; ~1 in 6 docs near-dups a doc from an
    // EARLIER batch (id % 6 == 0 drops the first word of doc id/6's
    // text), so cross-batch lookups stay load-bearing across the
    // compaction boundary
    def text(seed: Long) =
      (0 until 24).map(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$i".getBytes).map("%02x".format(_)).mkString.take(6)).mkString(" ")
    def batchDocs(b: Long): Seq[(Long, String)] =
      (b * 30 until (b + 1) * 30).map { id =>
        if (id % 6 == 0 && id / 6 < id) (id, text(id / 6).split(" ", 2)(1))
        else (id, text(id))
      }
    val rootC = Files.createTempDirectory("graft_cm_compact").toString
    val rootR = Files.createTempDirectory("graft_cm_ref").toString
    (0L until 9L).foreach { b =>
      // compaction every 3 batches, multiple small files, pruning on
      ClusterMaintenance.processBatch(batchDocs(b).toDF("doc_id", "text"), b, rootC,
        "doc_id", "text", compactEvery = 3, compactTargetRows = 500, maxPushdownKeys = 100000)
      // reference: compaction disabled entirely
      ClusterMaintenance.processBatch(batchDocs(b).toDF("doc_id", "text"), b, rootR,
        "doc_id", "text", compactEvery = 0)
    }
    val got = clusterSet(ClusterMaintenance.loadClusters(spark, rootC))
    val want = clusterSet(ClusterMaintenance.loadClusters(spark, rootR))
    assert(got == want)
    assert(got.nonEmpty)
    // compact versions committed at batches 3 and 6; v=3 is KEPT (a
    // replay of batch 6 re-compacts from it), only state below the
    // previous version is GC'd
    val cDirs = new java.io.File(s"$rootC/postings_compact").listFiles().map(_.getName).toSet
    assert(cDirs == Set("v=3", "v=6"), s"got $cDirs")
    val deltas = new java.io.File(s"$rootC/postings").listFiles().map(_.getName)
      .filter(_.startsWith("b=")).map(_.stripPrefix("b=").toLong).toSet
    assert(deltas == (3L until 9L).toSet, s"got $deltas")
    // multiple sh-range files (file == pruning granule)
    val nFiles = new java.io.File(s"$rootC/postings_compact/v=6").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles > 1, s"expected several range files, got $nFiles")
    // replay the COMPACTING batch (6): rewrites v=6 + its own outputs
    // from strictly-older state — artifact unchanged
    ClusterMaintenance.processBatch(batchDocs(6).toDF("doc_id", "text"), 6, rootC,
      "doc_id", "text", compactEvery = 3, compactTargetRows = 500)
    assert(clusterSet(ClusterMaintenance.loadClusters(spark, rootC)) == want)
    CachePool.drain()
  }

  test("streaming N batches of docs converges the artifact to the batch q41 clusters") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_cm").toString
    val ckpt = Files.createTempDirectory("graft_cm_ckpt").toString

    // q41's corpus: the documents table with deterministic exact and
    // near copies (same augmentation as DedupQ)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val aug = docs
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    // batch-side reference: the exact q41 chain at the same cap. The
    // streaming cap has PREFIX semantics, identical to the batch cap
    // only when no bucket crosses it mid-stream — pin that regime
    // (this corpus's max df stays under it; assert so the test fails
    // loudly if the testdata ever changes).
    val nDocs = docs.count()
    val hs = Dedup.hashedShingleSets(aug.toDF("doc_id", "text"), $"doc_id", $"text", 5)
    val cap = math.max(Adaptive.dfCap(nDocs),
      hs.groupBy($"sh").count().agg(max($"count")).head.getLong(0))
    val expected = clusterSet(Dedup.connectedComponents(
      Dedup.jaccardPairsHashed(Dedup.dfCapped(hs, cap), 0.6)))

    // stream the same corpus in 4 arrival batches (near-copies land in
    // different batches than their originals: doc_id % 4 scatters the
    // +1M / +2M augmented ids relative to the originals)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(ClusterMaintenance.sink(root, "doc_id", "text", 5, cap, 0.6,
        keepClusterVersions = 2))
      .start()
    try {
      (0 until 4).foreach { b =>
        in.addData(aug.filter(_._1 % 4 == b))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = clusterSet(ClusterMaintenance.loadClusters(spark, root))
    assert(streamed == expected)
    assert(streamed.nonEmpty)
    // full-snapshot versions beyond the retention window are GC'd
    // (keepClusterVersions = 2 here: current + the replay fallback;
    // the default 8 gives loadClusters consumers a wider lease)
    val vDirs = new java.io.File(s"$root/clusters").listFiles().map(_.getName).sorted
    assert(vDirs.toSeq == Seq("v=2", "v=3"))
    CachePool.drain()
  }
}
