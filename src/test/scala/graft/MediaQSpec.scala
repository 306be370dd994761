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
}
