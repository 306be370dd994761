package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.MediaQ

/** q64's media dedup pipeline: planted cross-resolution re-encodes
  * cluster with their base scene, corrupt payloads are routed out
  * (absent, not crashing), and the keep rule holds. Value-level
  * equality with the DuckDB oracle is the driver gate; this spec
  * pins the RECALL and routing semantics the oracle (which replays
  * from the fingerprint table) cannot see.
  */
class MediaQSpec extends AnyFunSuite {
  import TestSpark._

  test("q64: planted cross-resolution dups cluster with their base; garbage routed; keep = min id per cluster") {
    val out = SparkEntry.queries("q64_media_dedup_keep")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap

    // corrupt payloads (id % 97 == 96) never reach the output
    assert(!out.keySet.exists(_ % 97 == 96), "garbage payloads leaked into fingerprints")

    // planted dups (id % 5 == 4, excluding garbage ids) land in the
    // same cluster as their base — allow a small slack for scenes
    // whose bilinear resize drifts past the hamming tolerance
    val planted = out.keySet.filter(id => id % 5 == 4 && (id - 4) % 97 != 96)
    val matched = planted.count(id => out(id)._1 == out(id - 4)._1)
    assert(matched.toDouble / planted.size >= 0.95,
      s"planted recovery too low: $matched of ${planted.size}")

    // keep rule: keep == (id == cluster_id); exactly one keeper per cluster
    assert(out.forall { case (id, (cid, keep)) => keep == (id == cid) })
    val keepersPerCluster = out.groupBy(_._2._1).view.mapValues(_.count(_._2._2))
    assert(keepersPerCluster.values.forall(_ == 1), "a cluster without exactly one keeper")
  }

  test("q65: cross-rate audio re-encodes cluster with their base recording; garbage routed") {
    val out = SparkEntry.queries("q65_audio_dedup_keep")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.keySet.exists(_ % 97 == 96), "garbage payloads leaked into audio fingerprints")
    val planted = out.keySet.filter(id => id % 5 == 4 && (id - 4) % 97 != 96)
    val matched = planted.count(id => out(id) == out(id - 4))
    assert(matched.toDouble / planted.size >= 0.95,
      s"audio planted recovery too low: $matched of ${planted.size}")
  }

  test("q66: re-cut videos pair with exactly their base on 2 distinct shared frames; nothing else pairs") {
    val rows = SparkEntry.queries("q66_video_dedup_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted re-cut (id ≡ 4 mod 5) pairs with its base on the
    // two shared frames — the ≥ 2-distinct-frames rule at work
    val plantedPairs = rows.filter { case (a, b, _) => b == a + 4 && a % 5 == 0 }
    assert(plantedPairs.nonEmpty && plantedPairs.forall(_._3 == 2),
      s"re-cut pairs wrong: ${plantedPairs.take(5).toSeq}")
    // and nothing else crosses the 2-frame bar (one shared scene is
    // not enough — the static-clip defense)
    assert(rows.length == plantedPairs.length,
      s"unexpected extra video pairs: ${rows.filterNot(plantedPairs.contains).take(5).toSeq}")
  }

  test("concurrent sessions get isolated handoff paths: two q64 runs under different tokens don't clobber each other") {
    // Two SparkSessions sharing one context, distinct session-scoped
    // handoff tokens (the cross-JVM case is keyed by applicationId;
    // this pins the same mechanism observable in one JVM). Both runs
    // execute CONCURRENTLY; each must produce the same result as a
    // solo run, and each must leave ITS OWN fingerprint table behind.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val expected = SparkEntry.queries("q64_media_dedup_keep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    val s1 = spark.newSession(); val s2 = spark.newSession()
    s1.conf.set("spark.graft.media.handoffToken", "sessA")
    s2.conf.set("spark.graft.media.handoffToken", "sessB")
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def run(s: org.apache.spark.sql.SparkSession) = pool.submit(
      new java.util.concurrent.Callable[Set[(Long, Long, Boolean)]] {
        def call() = {
          start.await(10, TimeUnit.SECONDS)
          SparkEntry.queries("q64_media_dedup_keep")(s, sfDir)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        }
      })
    val (f1, f2) = (run(s1), run(s2))
    start.countDown()
    val (r1, r2) = (f1.get(300, TimeUnit.SECONDS), f2.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    assert(r1 == expected, "session A result corrupted by concurrent run")
    assert(r2 == expected, "session B result corrupted by concurrent run")
    // distinct tables on disk, one per token
    val dirs = Seq("sessA", "sessB").map(t => new java.io.File(s"/tmp/graft_media_fp_$t.parquet"))
    assert(dirs.forall(_.exists), s"missing per-session handoff dirs: $dirs")
  }
}
