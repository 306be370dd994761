package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Cross-validation of the dedup family: the LSH fast path must find
  * the same verified pairs as the exact shingle-blocked baseline at
  * these thresholds, and SimHash must place identical docs at
  * distance 0.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark._

  test("minhash-LSH (q26) finds exactly the exact-jaccard (q25) pairs on the augmented corpus") {
    val a = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = SparkEntry.queries("q26_dedup_minhash_lsh")(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("at-rest cluster artifact is row-identical to the inline connected-components chain") {
    import spark.implicits._
    // inline chain — the pre-artifact q41 definition, built from scratch
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val aug = docs
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val n = docs.count()
    val hs = Dedup.dfCapped(
      Dedup.hashedShingleSets(aug, $"doc_id", $"text", 5),
      graft.operators.Adaptive.dfCap(n)).persist()
    val inline = Dedup.connectedComponents(Dedup.jaccardPairsHashed(hs, 0.6))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    hs.unpersist(blocking = false)
    // artifact — what q41/q48 read
    val atRest = Dedup.loadClusters(spark, graft.queries.DedupQ.ensureClusters(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atRest == inline)
    assert(atRest.nonEmpty)
    CachePool.drain()
  }

  test("simhash of identical docs is identical; near-copies are close") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val dup = docs.unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val sh = Dedup.simhash(dup, $"doc_id", $"text")
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.id") + 1000000 === col("b.id"))
      .select(bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("d"))
      .agg(max("d")).head.getInt(0)
    assert(pairs == 0)
  }

  test("dfCapped drops hot shingles, keeps (id, sh) column order, and bounds the pair join") {
    import spark.implicits._
    // 40 docs all sharing one boilerplate shingle key (sh=999), each
    // with 3 unique shingles: uncapped, the hot key alone forms
    // 40*39/2 = 780 candidate pairs; capped at df<=20 it forms none.
    val hs = spark.range(40).select($"id", explode(array(
      lit(999L), $"id" * 10 + 1, $"id" * 10 + 2, $"id" * 10 + 3)).as("sh"))
    val capped = graft.operators.Dedup.dfCapped(hs, cap = 20)
    assert(capped.columns.toSeq == Seq("id", "sh"))
    assert(capped.filter($"sh" === 999L).count() == 0)
    assert(capped.count() == 40 * 3)
    val pairs = capped.toDF("id_a", "sh")
      .join(capped.toDF("id_b", "sh"), "sh").filter($"id_a" < $"id_b").count()
    assert(pairs == 0)
    val uncappedPairs = hs.toDF("id_a", "sh")
      .join(hs.toDF("id_b", "sh"), "sh").filter($"id_a" < $"id_b").count()
    assert(uncappedPairs == 780)
  }

  test("lshCandidates: signatures shorter than one band yield zero candidates, not bogus bands") {
    import spark.implicits._
    val sig = spark.range(4).select($"id", array(lit(7L), lit(8L)).as("sig"))
    // rowsPerBand=4 > signature length 2: the unguarded sequence(0,-1)
    // would emit band -1 slicing from the array end and pair everything
    assert(graft.operators.Dedup.lshCandidates(sig, rowsPerBand = 4).count() == 0)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.lshCandidates(sig, rowsPerBand = 0)
    }
  }

  test("native shingle kernel matches the relational md5 path key-for-key") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
      // exercise the edges too: empty text, multi-space, short doc
      .unionByName(Seq((900001L, ""), (900002L, "a  b   c"), (900003L, "one two three four five"))
        .toDF("doc_id", "text"))
    val relational = Dedup.hashedShingles(Dedup.shingles(docs, $"doc_id", $"text", 5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Dedup.hashedShingleSets(docs, $"doc_id", $"text", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == relational)
    assert(native.nonEmpty)
  }

  test("native per-doc simhash matches the sketch-aggregate path value-for-value") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq((900001L, ""), (900002L, "a  b   a b a")).toDF("doc_id", "text"))
    val agg = Dedup.simhash(docs, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val native = Dedup.simhashDocs(docs, $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(native == agg) // including the wordless-doc domain
    assert(agg.nonEmpty)
  }

  test("adaptive parameters derive deterministically from corpus size") {
    import graft.operators.Adaptive
    // test-SF sizes must reproduce the round-1 fixed widths exactly
    assert(Adaptive.bits(500, 32, 4, 16) == 4)    // q30 @ sf0.01
    assert(Adaptive.bits(500, 2, 8, 16) == 8)     // q28 @ sf0.01
    assert(Adaptive.minhashRows(500) == 4)        // q26 @ sf0.01
    assert(Adaptive.minhashBands(4) == 8)         // 32 hashes, as before
    // scale path: widths grow with log(n), bucket occupancy stays flat
    assert(Adaptive.bits(1000000, 32, 4, 16) == 15)
    assert(Adaptive.bits(1000000, 2, 8, 16) == 16)
    assert(Adaptive.minhashRows(1000000) == 6)
    assert(Adaptive.dfCap(500) == 25)
    assert(Adaptive.dfCap(100000000) == 5000000)
    // bit-length formula agrees with DuckDB's length(bin(x)) on the
    // power-of-two boundaries where floating log2 would disagree
    assert(Adaptive.bits(32 * 16, 32, 1, 64) == 5)  // n/target=16 -> bitlen 5
    assert(Adaptive.bits(32 * 15, 32, 1, 64) == 4)  // n/target=15 -> bitlen 4
  }

  test("connected components: a 40-deep chain collapses within maxIter (pointer doubling), components stay separate") {
    import spark.implicits._
    // a chain of 40 docs (diameter 39 — plain one-hop propagation
    // would need 39 rounds and trip maxIter=20; doubling needs ~7)
    val chain = (100L until 139L).map(i => (i, i + 1))
    // driverMaxEdges = 0 forces the DISTRIBUTED rounds (the property
    // under test); small graphs otherwise take the driver union-find
    val cc40 = graft.operators.Dedup.connectedComponents(
        chain.toDF("id_a", "id_b"), driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.CachePool.drain()
    assert(cc40.keySet == (100L to 139L).toSet)
    assert(cc40.values.forall(_ == 100L))
    // two components: a 5-chain 1-2-3-4-5 and a triangle 10-11-12
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    graft.CachePool.drain()
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // an empty pair graph terminates with an empty labeling
    val empty = graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(empty.count() == 0)
    graft.CachePool.drain()
  }

  test("size-adaptive CC: driver union-find and distributed rounds assign identical min-labels on a random multi-component graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: ~60 components of varying
    // shape (chains, stars, cross-links), plus isolated pairs
    val rnd = new scala.util.Random(20260813)
    val edges = (0 until 60).flatMap { c =>
      val base = c * 1000L
      val n = 2 + rnd.nextInt(30)
      val chain = (0 until n - 1).map(i => (base + i, base + i + 1))
      val extra = (0 until rnd.nextInt(10)).map(_ =>
        (base + rnd.nextInt(n), base + rnd.nextInt(n)))
      (chain ++ extra).filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    }
    val df = edges.toDF("id_a", "id_b")
    val viaDriver = graft.operators.Dedup.connectedComponents(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CachePool.drain()
    val viaDistributed = graft.operators.Dedup.connectedComponents(df, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CachePool.drain()
    assert(viaDriver == viaDistributed)
    assert(viaDriver.nonEmpty)
    // every component labeled by its minimum member
    viaDriver.groupBy(_._2).foreach { case (label, members) =>
      assert(members.map(_._1).min == label)
    }
  }

  test("exact dedup keeps the minimum id per content group") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val dup = docs.unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val out = Dedup.exact(dup, $"doc_id", $"text")
    assert(out.count() == docs.count())
    assert(out.filter($"dup_count" =!= 2).count() == 0)
    assert(out.filter($"keep_id" >= 1000000).count() == 0)
  }

  test("q48: no near-duplicate pair ever straddles the train/val split (the leakage property)") {
    import spark.implicits._
    val split = SparkEntry.queries("q48_leakage_safe_split")(spark, sfDir)
      .select($"doc_id", $"split").persist()
    // q25 = the same jaccard-0.6 pair set over the same augmented corpus
    val pairs = SparkEntry.queries("q25_dedup_ngram_jaccard")(spark, sfDir)
      .select($"id_a", $"id_b")
    val straddlers = pairs
      .join(split.toDF("id_a", "split_a"), "id_a")
      .join(split.toDF("id_b", "split_b"), "id_b")
      .filter($"split_a" =!= $"split_b")
      .count()
    val sides = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    split.unpersist(blocking = false)
    graft.CachePool.drain()
    assert(straddlers == 0, s"$straddlers near-dup pairs leak across the split")
    // and the split is an actual split, not a constant
    assert(sides.getOrElse("train", 0L) > 0 && sides.getOrElse("val", 0L) > 0, sides.toString)
  }
}
