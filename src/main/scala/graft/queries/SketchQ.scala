package graft.queries

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.{KmvArraySketch, KmvSketch, MisraGries}
import graft.operators.{Bloom, Dedup, Quantiles}
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

  /** q72 support threshold: tokens with freq ≥ N/HhDen (0.5%). */
  val HhDen = 200

  def defs: Map[String, Q] = Map(
    // Distinct 13-gram count per language WITHOUT a distinct shuffle:
    // each task folds its shingle stream into a k=1024 bottom-k
    // sketch; only sketches (8 KB/group/partition) reach the exchange.
    // Exact when a group has < k distinct shingles (the sketch holds
    // them all), (k-1)·2^60/h_k otherwise — both branches replayed by
    // the oracle's ORDER BY/LIMIT twin.
    "q67_kmv_distinct" -> ((s, d) => {
      import s.implicits._
      // NOT fanned out (r18 REVERT): A/B measured 1.08× — under the
      // ≥10% keep bar, and its twin q71 measured 0.83× (the KMV fold
      // is a 5-group partial agg; the widen exchange ships full text)
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
      // fan out the corpus-side shingle hashing — KEPT on r18 A/B
      // evidence (1.23×: 0.61 s with vs 0.75 s without; the Bloom
      // prefilter makes the post-widen pipeline long and per-row
      // heavy, so the one exchange pays here where q67/q71's plain
      // KMV folds did not); the final doc_id anti-join probe stays
      // on the raw scan
      val corpus = Dedup.hashedShingleSets(
        graft.operators.FanOut.widen(docs.select($"doc_id", $"text")),
        $"doc_id", $"text", 13)
      // cached: read three times (count for sizing, the Bloom build
      // scan, the broadcast verification join) — without it each use
      // re-pays the benchmark-side tokenize+hash+distinct
      val benchKeys = graft.CachePool.cache(Dedup.hashedShingleSets(
        docs.filter($"doc_id" % BenchMod === 0), $"doc_id", $"text", 13)
        .select($"sh").distinct())
      val filter = Bloom.build(benchKeys, $"sh", benchKeys.count())
      val suspects = corpus.filter(Bloom.mightContain($"sh", filter))
      val contam = suspects.join(broadcast(benchKeys), "sh")
        .select($"id".as("doc_id")).distinct()
      docs.join(contam, Seq("doc_id"), "left_anti")
        .select($"doc_id", $"lang")
    }),

    // EXACT per-event-type value percentiles with NO sort (iterative
    // histogram narrowing over the sortable-bits image — see
    // operators.Quantiles for the 100 TB argument vs q49's per-group
    // window sort). ~4 scans of a 2-column projection at any scale;
    // the answer is the actual stored double at rank ceil(p·n/100),
    // so the oracle's row_number() twin replays it bit-for-bit.
    "q69_exact_quantiles" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_type", $"value")
      val res = Quantiles.groupQuantiles(ev, "event_type", "value", Seq(50, 90, 99))
        .sortBy(_.group)
      res.map(r => (r.group, r.n, r.byPct(50), r.byPct(90), r.byPct(99)))
        .toDF("event_type", "n", "p50", "p90", "p99")
    }),

    // Cross-source distinct-shingle OVERLAP MATRIX from sketches
    // alone (Beyer et al. 2007 KMV set operations): the corpus is
    // scanned ONCE into per-source bottom-k sketches; every pairwise
    // estimate after that is array math over 8 KB arrays — the
    // corpora are never joined, so comparing S sources costs one scan
    // + S² sketch pairs regardless of corpus size. Exact (and
    // oracle-verified exact) whenever the union sketch is
    // unsaturated; the saturated branch replays the q67 estimator
    // with identical IEEE arithmetic. The pair join is a bounded
    // S-row broadcast nested loop — S is a source catalog, not data.
    "q71_kmv_source_overlap" -> ((s, d) => {
      import s.implicits._
      // NOT fanned out (r18 REVERT): A/B measured 0.83× with the
      // fan-out (0.54 s off vs 0.65 s on) — q67's rationale
      val docs = Tables.documents(s, d).select($"source", $"text")
      val sh = Dedup.hashedShingleSets(docs, $"source", $"text", 13)
      val kmvA = udaf(new KmvArraySketch(KmvK), Encoders.scalaLong)
      val sk = sh.groupBy($"id").agg(kmvA($"sh").as("sk"))
        .select($"id".as("source"), $"sk.arr".as("arr"))
      val uk = slice(array_sort(array_union($"a.arr", $"b.arr")), 1, KmvK)
      sk.as("a").join(broadcast(sk.as("b")), $"a.source" < $"b.source")
        .select($"a.source".as("source_a"), $"b.source".as("source_b"),
          uk.as("uk"), $"a.arr".as("aa"), $"b.arr".as("ba"))
        .select($"source_a", $"source_b",
          size($"uk").cast("long").as("k_used"),
          element_at($"uk", size($"uk")).as("kth_min"),
          size(array_intersect(array_intersect($"uk", $"aa"), $"ba")).cast("long").as("overlap_k"))
        .withColumn("est_union",
          when($"k_used" < KmvK, $"k_used".cast("double"))
            .otherwise(($"k_used" - 1).cast("double") *
              (lit(1152921504606846976.0) / $"kth_min".cast("double"))))
        .withColumn("est_overlap",
          ($"overlap_k".cast("double") / $"k_used".cast("double")) * $"est_union")
    }),

    // Support-threshold heavy hitters, EXACT, without shuffling the
    // vocabulary: pass 1 folds the token stream into a mergeable
    // Misra–Gries summary (k = 2·HhDen counters — every token with
    // freq > N/k survives, and N/k = half the support threshold, so
    // the candidate set provably contains every answer) + the exact
    // total N in the same aggregation; pass 2 re-counts ONLY the
    // ≤ k candidates exactly (broadcast InSet filter inside the scan,
    // partial agg → shuffle rows = partitions × candidates). The MG
    // counts themselves are order-dependent and never emitted — the
    // output is the exact-count filter, so the plain HAVING oracle
    // replays it. The 100 TB shape for "which tokens exceed 0.5%".
    "q72_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val k = 2 * HhDen
      val toks = Tables.documents(s, d)
        .select(explode(split($"text", " ")).as("token"))
        .filter($"token" =!= "")
      val mg = udaf(new MisraGries(k), Encoders.STRING)
      val row = toks.agg(count(lit(1)).as("n"), mg($"token").as("cands")).head()
      val n = row.getLong(0)
      val cands = row.getSeq[String](1)
      toks.filter($"token".isin(cands: _*))
        .groupBy($"token").agg(count(lit(1)).as("freq"))
        .filter($"freq" * lit(HhDen) >= lit(n))
    })
  )

  private val shhSql =
    """toks AS (SELECT doc_id, lang, source, list_filter(string_split(text, ' '), w -> w <> '') AS words
      |         FROM documents),
      |shj AS (SELECT DISTINCT doc_id, lang, source, array_to_string(list_slice(words, i + 1, i + 13), ' ') AS shingle
      |        FROM (SELECT doc_id, lang, source, words, unnest(generate_series(0, len(words) - 13)) AS i
      |              FROM toks WHERE len(words) >= 13)),
      |shh AS (SELECT DISTINCT doc_id, lang, source, cast(('0x' || substr(md5(shingle), 1, 15)) AS bigint) AS sh
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
         |WHERE doc_id NOT IN (SELECT doc_id FROM contam)""".stripMargin,

    "q69_exact_quantiles" ->
      """WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, count(*) AS n FROM v GROUP BY 1),
        |r AS (SELECT event_type, value,
        |        row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        |      FROM v)
        |SELECT r.event_type, max(n.n) AS n,
        |  max(CASE WHEN rn = (50 * n.n + 99) // 100 THEN value END) AS p50,
        |  max(CASE WHEN rn = (90 * n.n + 99) // 100 THEN value END) AS p90,
        |  max(CASE WHEN rn = (99 * n.n + 99) // 100 THEN value END) AS p99
        |FROM r JOIN n USING (event_type) GROUP BY 1""".stripMargin,

    "q71_kmv_source_overlap" ->
      s"""WITH $shhSql,
         |sk AS (SELECT source, sh
         |       FROM (SELECT source, sh, row_number() OVER (PARTITION BY source ORDER BY sh) AS rn
         |             FROM (SELECT DISTINCT source, sh FROM shh))
         |       WHERE rn <= $KmvK),
         |pr AS (SELECT a.source AS source_a, b.source AS source_b
         |       FROM (SELECT DISTINCT source FROM sk) a
         |       JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source),
         |ud AS (SELECT DISTINCT pr.source_a, pr.source_b, s.sh
         |       FROM pr JOIN sk s ON s.source = pr.source_a OR s.source = pr.source_b),
         |uk AS (SELECT source_a, source_b, sh
         |       FROM (SELECT source_a, source_b, sh,
         |               row_number() OVER (PARTITION BY source_a, source_b ORDER BY sh) AS rn
         |             FROM ud)
         |       WHERE rn <= $KmvK),
         |st AS (SELECT source_a, source_b, count(*)::BIGINT AS k_used, max(sh) AS kth_min
         |       FROM uk GROUP BY 1, 2),
         |ov AS (SELECT u.source_a, u.source_b, count(*)::BIGINT AS overlap_k
         |       FROM uk u
         |       JOIN sk x ON x.source = u.source_a AND x.sh = u.sh
         |       JOIN sk y ON y.source = u.source_b AND y.sh = u.sh
         |       GROUP BY 1, 2)
         |SELECT source_a, source_b, k_used, kth_min, overlap_k, est_union,
         |  (overlap_k::DOUBLE / k_used) * est_union AS est_overlap
         |FROM (SELECT st.source_a, st.source_b, st.k_used, st.kth_min,
         |        coalesce(ov.overlap_k, 0)::BIGINT AS overlap_k,
         |        CASE WHEN st.k_used < $KmvK THEN st.k_used::DOUBLE
         |             ELSE (st.k_used - 1) * (1152921504606846976.0 / st.kth_min) END AS est_union
         |      FROM st LEFT JOIN ov USING (source_a, source_b))""".stripMargin,

    "q72_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token
         |              FROM documents),
         |n AS (SELECT count(*) AS n FROM toks)
         |SELECT token, count(*)::BIGINT AS freq
         |FROM toks GROUP BY 1
         |HAVING count(*) * $HhDen >= (SELECT n FROM n)""".stripMargin
  )
}
