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
    // the CLUSTER store compacts on the same cadence: two-key compact
    // versions at 3 and 6, cluster deltas below the previous compact
    // version GC'd
    val ccDirs = new java.io.File(s"$rootC/clusters_compact").listFiles().map(_.getName).toSet
    assert(ccDirs == Set("v=3", "v=6"), s"got $ccDirs")
    val cDeltas = new java.io.File(s"$rootC/clusters").listFiles().map(_.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).toSet
    assert(cDeltas == (3L until 9L).toSet, s"got $cDeltas")
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
      .foreachBatch(ClusterMaintenance.sink(root, "doc_id", "text", 5, cap, 0.6))
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
    // the store is DELTAS: one version dir per batch, and the summed
    // delta rows stay close to the table size (each row written once
    // plus the occasional retro-relabel when a late bridge merges
    // clusters) — a full-snapshot-per-batch store would sum to ~4x
    val vDirs = new java.io.File(s"$root/clusters").listFiles().map(_.getName).sorted
    assert(vDirs.toSeq == Seq("v=0", "v=1", "v=2", "v=3"))
    val deltaRows = (0 until 4).map(b =>
      spark.read.parquet(s"$root/clusters/v=$b").count()).sum
    assert(deltaRows < 2L * streamed.size,
      s"delta rows $deltaRows vs table ${streamed.size}: writes are not delta-sized")
    CachePool.drain()
  }

  test("cluster deltas are minimal: untouched clusters are never rewritten; a late bridge relabels exactly the touched members") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cm_delta").toString
    val mk = (id: Long, text: String) => (id, text)
    // b0: two disjoint clusters {1,3} and {20,21} (in-batch
    // near-copies); b1: an unrelated doc (no pairs at all); b2: a doc
    // near-copying 3's text joins cluster 1. The deltas must carry
    // exactly each batch's changes — cluster {20,21} is written once
    // in b0 and never again.
    val b0 = Seq(
      mk(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(3, "beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(20, "red orange yellow green blue indigo violet ultra deep final"),
      mk(21, "orange yellow green blue indigo violet ultra deep final"))
    val b1 = Seq(mk(10, "totally unrelated content lives in this document here now"))
    val b2 = Seq(mk(5, "gamma delta epsilon zeta eta theta iota kappa"))
    def run(b: Int, docs: Seq[(Long, String)]): Unit =
      ClusterMaintenance.processBatch(docs.toDF("doc_id", "text"), b, root, "doc_id", "text")
    run(0, b0); run(1, b1); run(2, b2)
    def delta(b: Int): Set[(Long, Long)] =
      spark.read.parquet(s"$root/clusters/v=$b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // b0 delta: both clusters' rows (all new)
    assert(delta(0) == Set((1L, 1L), (3L, 1L), (20L, 20L), (21L, 20L)))
    // b1 delta: no pairs -> EMPTY (not a snapshot rewrite)
    assert(delta(1).isEmpty)
    // b2 delta: exactly the new doc joining cluster 1 — {20,21} and
    // the already-correct {1,3} rows are NOT rewritten
    assert(delta(2) == Set((5L, 1L)))
    assert(clusterSet(ClusterMaintenance.loadClusters(spark, root)) ==
      Set((1L, 1L), (3L, 1L), (5L, 1L), (20L, 20L), (21L, 20L)))
    CachePool.drain()
  }

  test("retro-merge: a pair bridging two existing clusters relabels only the higher-labeled component's members, via the cluster_id member lookup") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cm_retro").toString
    val mk = (id: Long, text: String) => (id, text)
    // two disjoint clusters from b0; b1 posts doc 0 (id below the
    // component minimum) as an exact copy of 1's text, so cluster
    // {1,3}'s label must drop to 0 — relabeling BOTH old members via
    // the cluster_id member lookup — while cluster {20,21} stays
    // untouched and unwritten.
    val b0 = Seq(
      mk(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(3, "beta gamma delta epsilon zeta eta theta iota kappa"),
      mk(20, "red orange yellow green blue indigo violet ultra deep final"),
      mk(21, "orange yellow green blue indigo violet ultra deep final"))
    val b1 = Seq(mk(0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    ClusterMaintenance.processBatch(b0.toDF("doc_id", "text"), 0, root, "doc_id", "text")
    ClusterMaintenance.processBatch(b1.toDF("doc_id", "text"), 1, root, "doc_id", "text")
    val d1 = spark.read.parquet(s"$root/clusters/v=1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // delta: the new doc + BOTH relabeled members of the touched
    // component — and nothing from untouched cluster 20
    assert(d1 == Set((0L, 0L), (1L, 0L), (3L, 0L)))
    assert(clusterSet(ClusterMaintenance.loadClusters(spark, root)) ==
      Set((0L, 0L), (1L, 0L), (3L, 0L), (20L, 20L), (21L, 20L)))
    CachePool.drain()
  }

  test("v1-format postings roots abort loudly instead of silently dropping cross-batch pairs") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cm_v1").toString
    // a pure-v1 root: 2-column postings (no n)
    Seq((1L, 100L)).toDF("id", "sh").write.parquet(s"$root/postings/b=0")
    val exPure = intercept[IllegalArgumentException] {
      ClusterMaintenance.processBatch(
        Seq((5L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
        1, root, "doc_id", "text")
    }
    assert(exPure.getMessage.contains("v1-format root"))
    // a MIXED root: schema inference surfaces the v2 shape and v1 rows
    // get NULL n — the per-row guard must fire, not silently lose pairs
    val root2 = Files.createTempDirectory("graft_cm_v1mix").toString
    Seq((1L, 100L)).toDF("id", "sh").write.parquet(s"$root2/postings/b=0")
    Seq((2L, 200L, 6L)).toDF("id", "sh", "n").write.parquet(s"$root2/postings/b=1")
    val exMixed = intercept[Exception] {
      ClusterMaintenance.processBatch(
        Seq((5L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text"),
        2, root2, "doc_id", "text")
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(exMixed.getMessage.contains("mixed v1/v2") ||
      rootCause(exMixed).getMessage.contains("mixed v1/v2") ||
      exMixed.getMessage.contains("v1-format root"),
      s"unexpected failure: ${exMixed.getMessage}")
    CachePool.drain()
  }
}
