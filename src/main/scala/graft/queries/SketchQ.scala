package graft.queries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.operators.{Bloom, Dedup}
import graft.sources.Tables

/** Sketch-backed corpus statistics: fixed-size summaries that replace
  * full-key-set shuffles at 100 TB while staying DETERMINISTIC, so the
  * DuckDB oracle replays them value-for-value.
  *
  * The reference computes these shapes exactly (Flink SQL
  * count-distinct and join jobs); the sketches here are the
  * scale-path: per-partition state is O(k) or O(m bits) regardless of
  * corpus size, partial-aggregated map-side like any built-in agg.
  */
object SketchQ extends QueryPack {

  /** KMV size: big enough for <10% relative error (1/sqrt(k) ≈ 3%),
    * small enough that a sketch is 8 KB. */
  val KmvK = 1024

  /** The same deterministic "eval suite" sample q40 screens against —
    * one definition of benchmark membership across the contamination
    * family. */
  private val BenchMod = 97

  def defs: Map[String, Q] = Map(
    // Distinct 13-gram count per language WITHOUT a distinct shuffle:
    // each task folds its shingle stream into a k=1024 bottom-k
    // sketch; only sketches (8 KB/group/partition) reach the exchange.
    // Exact when a group has < k distinct shingles (the sketch holds
    // them all), (k-1)·2^60/h_k otherwise — both branches replayed by
    // the oracle's ORDER BY/LIMIT twin.
    "q67_kmv_distinct" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"lang", $"text")
      val sh = Dedup.hashedShingleSets(docs, $"lang", $"text", 13)
      val kmv = udaf(new KmvSketch(KmvK), Encoders.scalaLong)
      sh.groupBy($"id")
        .agg(kmv($"sh").as("sk"))
        .select($"id".as("lang"),
          $"sk.k_used".as("k_used"),
          $"sk.kth_min".as("kth_min"),
          $"sk.est_distinct".as("est_distinct"))
    }),

    // Benchmark DEcontamination with a Bloom prefilter: the corpus
    // shingle stream is filtered inside its scan by a broadcast bitset
    // over the benchmark's shingles, so only suspects (true overlaps +
    // the ~1% false-positive tail) ever shuffle into the exact
    // verification join; the join then removes the false positives,
    // making the result EXACT — the oracle is the plain anti-join SQL.
    // Output: the clean docs a training run may keep.
    "q68_decontaminate_bloom" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val corpus = Dedup.hashedShingleSets(
        docs.select($"doc_id", $"text"), $"doc_id", $"text", 13)
      val benchKeys = Dedup.hashedShingleSets(
        docs.filter($"doc_id" % BenchMod === 0), $"doc_id", $"text", 13)
        .select($"sh").distinct()
      val filter = Bloom.build(benchKeys, $"sh", benchKeys.count())
      val suspects = corpus.filter(Bloom.mightContain($"sh", filter))
      val contam = suspects.join(broadcast(benchKeys), "sh")
        .select($"id".as("doc_id")).distinct()
      docs.join(contam, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"lang")
    })
  )

  private val shhSql =
    """toks AS (SELECT doc_id, lang, list_filter(string_split(text, ' '), w -> w <> '') AS words
      |         FROM documents),
      |shj AS (SELECT DISTINCT doc_id, lang, array_to_string(list_slice(words, i + 1, i + 13), ' ') AS shingle
      |        FROM (SELECT doc_id, lang, words, unnest(generate_series(0, len(words) - 13)) AS i
      |              FROM toks WHERE len(words) >= 13)),
      |shh AS (SELECT DISTINCT doc_id, lang, cast(('0x' || substr(md5(shingle), 1, 15)) AS bigint) AS sh
      |        FROM shj)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q67_kmv_distinct" ->
      s"""WITH $shhSql,
         |ranked AS (SELECT lang, sh, row_number() OVER (PARTITION BY lang ORDER BY sh) AS rn
         |           FROM (SELECT DISTINCT lang, sh FROM shh)),
         |top AS (SELECT lang, sh FROM ranked WHERE rn <= $KmvK)
         |SELECT lang, count(*)::BIGINT AS k_used, max(sh) AS kth_min,
         |  CASE WHEN count(*) < $KmvK THEN count(*)::DOUBLE
         |       ELSE (count(*) - 1) * (1152921504606846976.0 / max(sh)) END AS est_distinct
         |FROM top GROUP BY lang""".stripMargin,

    "q68_decontaminate_bloom" ->
      s"""WITH $shhSql,
         |bench AS (SELECT DISTINCT sh FROM shh WHERE doc_id % $BenchMod = 0),
         |contam AS (SELECT DISTINCT doc_id FROM shh JOIN bench USING (sh))
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin
  )
}
