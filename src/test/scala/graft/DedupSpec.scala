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

  test("exact dedup keeps the minimum id per content group") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select($"doc_id", $"text")
    val dup = docs.unionByName(docs.select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val out = Dedup.exact(dup, $"doc_id", $"text")
    assert(out.count() == docs.count())
    assert(out.filter($"dup_count" =!= 2).count() == 0)
    assert(out.filter($"keep_id" >= 1000000).count() == 0)
  }
}
