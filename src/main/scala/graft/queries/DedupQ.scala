package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CachePool
import graft.functions.VectorFunctions
import graft.operators.{Adaptive, Dedup}
import graft.sources.Tables

/** Deduplication (SURVEY §2 q24–q28).
  *
  * The synthetic corpus has no organic duplicates, so each query
  * AUGMENTS it deterministically inside the plan: exact copies for
  * doc_id % 7 == 0 (ids + 1_000_000) and near copies (first word
  * dropped) for doc_id % 5 == 0 (ids + 2_000_000); embeddings get
  * exact vector copies for vec_id % 10 == 0 (ids + Aug.EmbCopyOffset). The
  * DuckDB oracle performs the identical augmentation, then replays
  * the identical signature arithmetic — so the hash compare exercises
  * the full MinHash/SimHash/Jaccard pipelines end to end.
  *
  * Scale knobs are NOT fixed: band widths, minhash rows-per-band, and
  * the shingle df-cap all derive from the base-table count via
  * [[graft.operators.Adaptive]] (pure integer arithmetic), and every
  * oracle replays the same derivation in SQL from the same count — so
  * the parameters that keep buckets bounded at 10^6+ docs are the
  * exact parameters the correctness gate verifies at 10^2.
  */
object DedupQ extends QueryPack {

  private def augmentedDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select($"doc_id", $"text")
    // NOT fanned out (r18 REVERT of the r17 FanOut.widen here): the
    // paired same-JVM A/B measured every consumer slower or flat with
    // the fan-out — q24 0.44×, q25 0.67×, q26 0.66×, q44 0.71×,
    // q48 0.83×, q52 0.84×, q54 1.03×, q56 0.94×, q27 1.03×
    // (plans/r18, FanOutAB 5 pairs each). The widen exchange ships
    // the full (doc_id, text) payload round-robin and pays the
    // keyless-repartition local sort (guide §2.3/§2.5) while every
    // downstream aggregate already parallelizes at its own semantic
    // exchange with map-side partial aggregation — the fan-out adds
    // bytes and a stage without removing any work.
    docs
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .unionByName(docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 2000000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** Shared df-capped hashed shingle set (feeds counts, signatures,
    * and the pair/verify joins). BOTH the raw and capped sets are
    * persisted: the df-cap's hot-key aggregate and the anti-join's
    * probe side each scan the raw set (uncached, that recomputes the
    * whole tokenize→shingle→hash pipeline twice), and the capped set
    * is then read by 3+ downstream stages. Drained by CachePool after
    * the query's action. */
  private[graft] def cappedShingles(s: SparkSession, d: String, nDocs: Long): DataFrame = {
    import s.implicits._
    val hsRaw = CachePool.cache(
      Dedup.hashedShingleSets(augmentedDocs(s, d), $"doc_id", $"text", 5))
    CachePool.cache(Dedup.dfCapped(hsRaw, Adaptive.dfCap(nDocs)))
  }

  /** Window width (tokens) for the exact-substring family (q54/q56). */
  private val SubK = 8

  /** Shared tokenized-docs + exploded-gram intermediates of the
    * exact-substring family: `base` (doc_id, n_tokens, words) and
    * `grams` (doc_id, s, h) — h the 60-bit md5-prefix hash of the
    * 8-token window starting at 1-based position s. Both cached: base
    * feeds the gram stream AND the per-doc output joins; grams feed
    * the dup decision AND the coverage/trim passes. */
  private def substringGrams(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val base = CachePool.cache(augmentedDocs(s, d)
      .select($"doc_id", graft.functions.TextFunctions.tokens($"text").as("words"))
      .select($"doc_id", size($"words").cast("long").as("n_tokens"), $"words"))
    val grams = CachePool.cache(
      base.filter($"n_tokens" >= SubK)
        .select($"doc_id", $"words",
          explode(sequence(lit(1L), $"n_tokens" - (SubK - 1))).as("s"))
        .select($"doc_id", $"s",
          conv(substring(md5(array_join(slice($"words", $"s", lit(SubK)), " ")), 1, 15), 16, 10)
            .cast("long").as("h")))
    (base, grams)
  }

  /** One artifact dir per (application, sf dir): rebuilt on first
    * touch in a session, reused by every later consumer. */
  private val ccMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** Build the near-dup cluster artifact for `d` if this session has
    * not yet: the full shingle → Jaccard-pair → connected-components
    * chain runs once, and [[Dedup.clustersAtRest]] writes
    * (doc_id, cluster_id) at rest. Returns the artifact dir. Bench
    * times this under its own `q41_clusters_build` line (the IvfIndex
    * train/probe split): the chain is a one-time indexing cost, not a
    * per-query cost. */
  /** Bench-only: forget the memoized cluster artifact for (session, d)
    * and delete it at rest, so `q41_clusters_build` can be measured
    * median-of-3 — each rep rebuilds the full chain instead of
    * returning the memo. */
  def invalidateClusters(s: SparkSession, d: String): Unit = {
    val dir = ccMemo.remove((s.sparkContext.applicationId, d))
    if (dir != null) graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  def ensureClusters(s: SparkSession, d: String): String =
    ccMemo.computeIfAbsent((s.sparkContext.applicationId, d), _ => {
      val dir = graft.tools.SessionArtifacts.dirFor(s, "clusters", d)
      val pairs = Dedup.jaccardPairsHashed(
        cappedShingles(s, d, Tables.documentCount(s, d)), 0.6)
      Dedup.clustersAtRest(Dedup.connectedComponents(pairs), dir)
      dir
    })

  private val augSql =
    """aug AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL SELECT doc_id + 2000000, substr(text, strpos(text, ' ') + 1)
      |    FROM documents WHERE doc_id % 5 = 0)""".stripMargin

  /** Shingle sets + df-cap; `shf` is the capped set all stages use. */
  private val shinglesSql =
    s"""toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words FROM aug),
      |sh AS (SELECT DISTINCT id, array_to_string(list_slice(words, i + 1, i + 5), ' ') AS shingle
      |       FROM (SELECT doc_id AS id, words, unnest(generate_series(0, len(words) - 5)) AS i
      |             FROM toks WHERE len(words) >= 5)),
      |shh AS (SELECT DISTINCT id, cast(('0x' || substr(md5(shingle), 1, 15)) AS bigint) AS sh FROM sh),
      |pc AS (SELECT ${Adaptive.dfCapSql("count(*)")} AS cap FROM documents),
      |shf AS (SELECT * FROM shh
      |        WHERE sh IN (SELECT sh FROM shh GROUP BY sh
      |                     HAVING count(*) <= (SELECT cap FROM pc)))""".stripMargin

  /** Jaccard-0.6 pairs → undirected closure → clusters, over the
    * df-capped shingle sets — the ONE definition of the near-dup
    * cluster graph, shared verbatim by the q41 and q48 oracles (and
    * matching q25's cnt/inter shape) so a threshold or blocking change
    * can never drift between them. Requires `shf` (shinglesSql) and a
    * RECURSIVE WITH; ends with `cc(doc_id, cluster_id)`. */
  private val ccSql =
    """cnt AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
      |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
      |          FROM shf a JOIN shf b USING (sh) WHERE a.id < b.id
      |          GROUP BY a.id, b.id),
      |pairs AS (SELECT id_a, id_b
      |          FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
      |          WHERE c::DOUBLE / (ca.n + cb.n - c) >= 0.6),
      |und AS (SELECT id_a AS a, id_b AS b FROM pairs
      |        UNION SELECT id_b, id_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM und
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
      |cc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
      |       FROM reach GROUP BY a)""".stripMargin

  def defs: Map[String, Q] = Map(
    "q24_dedup_exact" -> ((s, d) => {
      import s.implicits._
      Dedup.exact(augmentedDocs(s, d), $"doc_id", $"text")
    }),

    "q25_dedup_ngram_jaccard" -> ((s, d) => {
      Dedup.jaccardPairsHashed(cappedShingles(s, d, Tables.documentCount(s, d)), 0.6)
    }),

    "q26_dedup_minhash_lsh" -> ((s, d) => {
      val n = Tables.documentCount(s, d)
      val r = Adaptive.minhashRows(n)
      val hs = cappedShingles(s, d, n)
      // exact-dup collapse → LSH + verify on the DISTINCT shingle
      // sets only → output-bound expansion (Dedup.exactShingleGroups:
      // identical sets share every band/candidate/Jaccard, so the
      // collapsed pipeline's expansion equals the uncollapsed output
      // exactly, while dup cliques stop squaring the verify shuffle —
      // the STRESS row-56 disk ceiling). Signature params still
      // derive from the FULL corpus count, matching the oracle.
      // cached: groups feeds the rep filter, the intra expansion, and
      // the inter expansion — three consumers of one aggregation
      val groups = CachePool.cache(Dedup.exactShingleGroups(hs))
      val repHs = hs.join(groups.filter(col("id") === col("rep")).select("id"), "id")
      val sig = Dedup.minhashSignatures(repHs, numHashes = r * Adaptive.minhashBands(r))
      val cand = Dedup.lshCandidates(sig, rowsPerBand = r)
      Dedup.expandExactPairs(Dedup.verifyJaccard(cand, repHs, 0.6), groups)
    }),

    // Asymmetric near-superset detection: doc A with >= 90% of its
    // shingles inside doc B (quotes / aggregator pages / boilerplate-
    // wrapped copies that the symmetric Jaccard union denominator
    // dilutes below threshold). The first-word-dropped augmented
    // copies are contained in their originals by construction.
    "q44_containment" -> ((s, d) => {
      Dedup.containmentPairs(cappedShingles(s, d, Tables.documentCount(s, d)), 0.9)
    }),

    // Pairs → clusters: connected components over the exact-Jaccard
    // near-dup graph (min-label propagation; cluster_id = minimum doc
    // id reachable). This is the step that turns pair detection into
    // keep/drop decisions — keep each cluster's minimum id, drop the
    // rest. The chain is materialized ONCE per session as an at-rest
    // artifact (ensureClusters / Dedup.clustersAtRest); this query and
    // every composition over clusters (q48, keep/drop, rebalance) read
    // the artifact instead of re-running the similarity pipeline.
    "q41_dedup_clusters" -> ((s, d) => {
      Dedup.loadClusters(s, ensureClusters(s, d))
    }),

    // Leakage-safe train/val split: a hash split on doc_id would put a
    // document in train and its near-duplicate in val — the eval set
    // then "measures" memorization. Assign each near-dup CLUSTER
    // (q41's connected components; singletons = own id) wholly to one
    // side via the q43-style deterministic md5 bucket of the cluster
    // id. Reads the at-rest cluster artifact — the query's own cost is
    // one broadcast-able join and a scan-side hash, not a re-run of
    // the q41 chain.
    "q48_leakage_safe_split" -> ((s, d) => {
      import s.implicits._
      val clusters = Dedup.loadClusters(s, ensureClusters(s, d))
      augmentedDocs(s, d).select($"doc_id")
        .join(clusters.withColumnRenamed("cluster_id", "cc"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"cc", $"doc_id").as("cluster_id"))
        .select($"doc_id", $"cluster_id",
          when(conv(substring(md5($"cluster_id".cast("string")), 1, 15), 16, 10).cast("long") % 100 < 90,
            "train").otherwise("val").as("split"))
    }),

    // The keep/drop decision — the terminal step of the dedup
    // pipeline (q41's clusters exist to produce exactly this): keep
    // each cluster's minimum doc_id and every singleton, drop the
    // rest. Reads the at-rest cluster artifact; the query's own cost
    // is one broadcast-able join (clusters hold only paired docs).
    "q52_dedup_keep" -> ((s, d) => {
      import s.implicits._
      val clusters = Dedup.loadClusters(s, ensureClusters(s, d))
      augmentedDocs(s, d).select($"doc_id")
        .join(clusters.withColumnRenamed("cluster_id", "cc"), Seq("doc_id"), "left")
        .select($"doc_id", coalesce($"cc", $"doc_id").as("cluster_id"))
        .withColumn("keep", $"doc_id" === $"cluster_id")
    }),

    // Exact SUBSTRING deduplication (Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better"): instead of
    // whole-document verdicts, measure the duplicated SPANS — every
    // 8-token window whose text occurs verbatim in some other
    // document marks its positions as duplicated, overlapping windows
    // merge, and the per-doc output is (n_tokens, dup_tokens,
    // dup_ratio) — the signal used to trim or drop boilerplate-heavy
    // docs. Shapes: positions explode LINEARLY in corpus tokens; the
    // dup-gram decision is one (hash)-keyed partial-agg shuffle;
    // coverage is a per-doc window over only the HIT positions
    // (equal-width intervals sorted by start ⇒ merged coverage is
    // sum(min(k, gap)) via lag — no interval tree). The md5-prefix
    // gram hash is the same 60-bit convention as the shingle
    // pipeline, replayed exactly by the oracle.
    "q54_substring_dedup" -> ((s, d) => {
      import s.implicits._
      val k = SubK
      val (base, grams) = substringGrams(s, d)
      // "appears in >= 2 distinct docs" == min(doc_id) != max(doc_id):
      // a plain partial-aggregable min/max instead of count-distinct's
      // expand + second exchange
      val dupG = grams.groupBy($"h")
        .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
        .filter($"lo" =!= $"hi").select($"h")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"s")
      val cov = grams.join(dupG, "h")
        .withColumn("contrib",
          least(lit(k.toLong), $"s" - coalesce(lag($"s", 1).over(w), $"s" - k)))
        .groupBy($"doc_id").agg(sum($"contrib").as("dup_tokens"))
      base.select($"doc_id", $"n_tokens")
        .join(cov, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          coalesce($"dup_tokens", lit(0L)).as("dup_tokens"),
          when($"n_tokens" === 0, lit(0.0))
            .otherwise(coalesce($"dup_tokens", lit(0L)).cast("double") / $"n_tokens")
            .as("dup_ratio"))
    }),

    // The Lee et al. pipeline's TERMINAL step — q54 reports where the
    // duplicated spans are; this emits the training corpus with them
    // REMOVED, keeping one canonical occurrence: for each cross-doc
    // duplicated 8-gram the smallest doc_id holding it is canonical,
    // and every covered token position OUTSIDE the canonical doc is
    // dropped (an exact copy is trimmed to nothing; its original is
    // untouched). Composition over the SAME cached base/grams
    // intermediates as q54 (the q42/q52 pattern): one extra
    // (doc_id, p) anti-join — positions explode linearly in corpus
    // tokens, removable positions linearly in duplicated tokens, and
    // reconstruction is a per-doc sort of kept tokens, never a global
    // sort.
    "q56_substring_trim" -> ((s, d) => {
      import s.implicits._
      val k = SubK
      val (base, grams) = substringGrams(s, d)
      val dupG = grams.groupBy($"h")
        .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
        .filter($"lo" =!= $"hi").select($"h", $"lo")
      // removable positions: the k tokens under every occurrence of a
      // dup gram in a NON-canonical doc (distinct: overlapping windows
      // cover a position once)
      val rem = grams.join(dupG, "h").filter($"doc_id" =!= $"lo")
        .select($"doc_id", explode(sequence($"s", $"s" + (k - 1))).as("p"))
        .distinct()
      val kept = base
        .select($"doc_id", posexplode($"words").as(Seq("i", "w")))
        .select($"doc_id", ($"i" + 1).cast("long").as("p"), $"w")
        .join(rem, Seq("doc_id", "p"), "left_anti")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("kept_tokens"),
          array_join(transform(array_sort(collect_list(struct($"p", $"w"))), x => x("w")), " ")
            .as("text_trimmed"))
      base.select($"doc_id", $"n_tokens")
        .join(kept, Seq("doc_id"), "left")
        .select($"doc_id", $"n_tokens",
          coalesce($"kept_tokens", lit(0L)).as("kept_tokens"),
          coalesce($"text_trimmed", lit("")).as("text_trimmed"))
    }),

    // Benchmark-contamination screening (training-data decontam): a
    // corpus doc is contaminated if it shares ANY 13-gram with the
    // benchmark set (here a deterministic doc_id % 97 sample standing
    // in for an eval suite). The benchmark key set is SMALL (eval
    // suites are MBs; the corpus is TBs) → broadcast semi-ish join:
    // the corpus scans once, nothing shuffles but the per-doc overlap
    // counts.
    "q40_contamination" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"text")
      // fan out only the corpus-side shingle hashing (per-row CPU on
      // a one-row-group scan, guide §2.5); the benchmark side is tiny.
      // KEPT on r18 A/B evidence: 1.37× (0.26 s with vs 0.35 s
      // without, 5 interleaved pairs) — the downstream is a broadcast
      // join + per-doc count, so the 13-gram hashing IS the query's
      // only heavy stage and the widen exchange is the only way it
      // parallelizes
      val corpus = Dedup.hashedShingleSets(
        graft.operators.FanOut.widen(docs), $"doc_id", $"text", 13)
      val bench = broadcast(
        Dedup.hashedShingleSets(docs.filter($"doc_id" % 97 === 0), $"doc_id", $"text", 13)
          .select($"sh").distinct())
      corpus.join(bench, "sh")
        .groupBy($"id")
        .agg(count(lit(1)).as("n_shared"))
        .select($"id".as("doc_id"), $"n_shared")
    }),

    "q27_dedup_simhash" -> ((s, d) => {
      import s.implicits._
      Dedup.simhashPairs(Dedup.simhashDocs(augmentedDocs(s, d), $"doc_id", $"text"), maxDist = 3)
    }),

    // Embedding near-dup via sign-LSH band blocking + exact cosine
    // verification of candidates — the pair space is O(Σ bucket²),
    // never O(n²). Band width AND band count derive from the corpus
    // count (bits = bands = Adaptive.bits(n, 2, 8, 16)): buckets hold
    // ~2 vectors regardless of n, and the band count grows with the
    // width so P[miss | cos >= 0.99] stays ~1e-4 (p_bit ≈ 0.955:
    // width 8 × 8 bands ⇒ 8.5e-5; width 16 × 16 bands ⇒ ~1e-4).
    "q28_dedup_embedding" -> ((s, d) => {
      import s.implicits._
      val bits = Adaptive.bits(Tables.embeddingCount(s, d), targetBucket = 2, lo = 8, hi = 16)
      val bands = bits
      val emb = Tables.embeddings(s, d)
        .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
      // NOT fanned out (r18 REVERT): A/B measured q28 at 0.68× with
      // the fan-out (0.48 s off vs 0.70 s on) — 2.2k 64-dim vectors
      // have too little per-row work to buy back the exchange
      val aug = Aug.embCopies(emb)
      // sign bit per hyperplane (native codegen kernel), then banded
      // keys. The candidate join ships only (band, bkey, id) — the 64-d
      // vectors are attached AFTER pair dedup, so the wide arrays never
      // ride the O(candidates) shuffle.
      val banded = aug
        .withColumn("bits", graft.functions.VectorExpressions.hyperplaneBits($"v", bands * bits))
        .select($"vec_id",
          posexplode(expr(
            s"""transform(sequence(0, ${bands - 1}), b ->
              |  aggregate(sequence(0, ${bits - 1}), 0, (acc, r) -> acc * 2 + element_at(bits, b * $bits + r + 1)))""".stripMargin))
            .as(Seq("band", "bkey")))
      val cand = banded.select($"vec_id".as("id_a"), $"band", $"bkey")
        .join(banded.select($"vec_id".as("id_b"), $"band", $"bkey"), Seq("band", "bkey"))
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b")
        .distinct()
      cand
        .join(aug.toDF("id_a", "va"), "id_a")
        .join(aug.toDF("id_b", "vb"), "id_b")
        .select($"id_a", $"id_b",
          VectorFunctions.cosine($"va", $"vb").as("cos_sim"))
        .filter($"cos_sim" >= 0.99)
    })
  )

  def oracles: Map[String, String] = Map(
    "q54_substring_dedup" ->
      s"""WITH $augSql,
         |toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words FROM aug),
         |base AS (SELECT doc_id, len(words)::BIGINT AS n_tokens, words FROM toks),
         |grams AS (SELECT doc_id, i AS s,
         |            cast(('0x' || substr(md5(array_to_string(list_slice(words, i, i + 7), ' ')), 1, 15)) AS bigint) AS h
         |          FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 7)) AS i
         |                FROM base WHERE len(words) >= 8)),
         |dupg AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM grams GROUP BY h)
         |         WHERE nd >= 2),
         |cov AS (SELECT doc_id, sum(contrib)::BIGINT AS dup_tokens FROM (
         |          SELECT doc_id,
         |            least(8, s - coalesce(lag(s) OVER (PARTITION BY doc_id ORDER BY s), s - 8)) AS contrib
         |          FROM grams JOIN dupg USING (h)) GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |  coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
         |  CASE WHEN b.n_tokens = 0 THEN 0.0
         |       ELSE coalesce(c.dup_tokens, 0)::DOUBLE / b.n_tokens END AS dup_ratio
         |FROM base b LEFT JOIN cov c USING (doc_id)""".stripMargin,

    "q56_substring_trim" ->
      s"""WITH $augSql,
         |toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words FROM aug),
         |base AS (SELECT doc_id, len(words)::BIGINT AS n_tokens, words FROM toks),
         |grams AS (SELECT doc_id, i AS s,
         |            cast(('0x' || substr(md5(array_to_string(list_slice(words, i, i + 7), ' ')), 1, 15)) AS bigint) AS h
         |          FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 7)) AS i
         |                FROM base WHERE len(words) >= 8)),
         |dupg AS (SELECT h, min(doc_id) AS lo FROM grams GROUP BY h
         |         HAVING min(doc_id) <> max(doc_id)),
         |rem AS (SELECT DISTINCT g.doc_id, g.s + t.u AS p
         |        FROM grams g JOIN dupg USING (h), range(0, 8) t(u)
         |        WHERE g.doc_id <> dupg.lo),
         |pos AS (SELECT doc_id, i AS p, words[i] AS w
         |        FROM (SELECT doc_id, words, unnest(generate_series(1, len(words))) AS i FROM base)),
         |kept AS (SELECT pos.doc_id, count(*)::BIGINT AS kept_tokens,
         |           string_agg(w, ' ' ORDER BY p) AS text_trimmed
         |         FROM pos ANTI JOIN rem ON pos.doc_id = rem.doc_id AND pos.p = rem.p
         |         GROUP BY pos.doc_id)
         |SELECT b.doc_id, b.n_tokens,
         |  coalesce(k.kept_tokens, 0)::BIGINT AS kept_tokens,
         |  coalesce(k.text_trimmed, '') AS text_trimmed
         |FROM base b LEFT JOIN kept k USING (doc_id)""".stripMargin,

    "q24_dedup_exact" ->
      s"""WITH $augSql
         |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count
         |FROM aug GROUP BY md5(text)""".stripMargin,

    "q25_dedup_ngram_jaccard" ->
      s"""WITH $augSql,
         |$shinglesSql,
         |cnt AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
         |          FROM shf a JOIN shf b USING (sh) WHERE a.id < b.id
         |          GROUP BY a.id, b.id)
         |SELECT id_a, id_b, c::DOUBLE / (ca.n + cb.n - c) AS jaccard
         |FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
         |WHERE c::DOUBLE / (ca.n + cb.n - c) >= 0.6""".stripMargin,

    "q26_dedup_minhash_lsh" ->
      s"""WITH $augSql,
         |$shinglesSql,
         |pm AS (SELECT r, r * ${Adaptive.minhashBandsSql("r")} AS nh
         |       FROM (SELECT ${Adaptive.minhashRowsSql("count(*)")} AS r FROM documents)),
         |base AS (SELECT id, sh % 2147483647 AS h0 FROM shf),
         |hi AS (SELECT id, h0, r, unnest(range(0, nh)) AS i FROM base, pm),
         |hv AS (SELECT id, i, r,
         |         min((((i*2654435761 + 1) % 2147483647) * h0 + ((i*40503 + 7) % 2147483647)) % 2147483647) AS mh
         |       FROM hi GROUP BY id, i, r),
         |bands AS (SELECT id, i // r AS band, string_agg(mh::VARCHAR, ',' ORDER BY i) AS bkey
         |          FROM hv GROUP BY id, i // r),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |         FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
         |cnt AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
         |inter AS (SELECT c.id_a, c.id_b, count(*) AS ic
         |          FROM cand c
         |          JOIN shf a ON a.id = c.id_a
         |          JOIN shf b ON b.id = c.id_b AND b.sh = a.sh
         |          GROUP BY c.id_a, c.id_b)
         |SELECT id_a, id_b, ic::DOUBLE / (ca.n + cb.n - ic) AS jaccard
         |FROM inter JOIN cnt ca ON ca.id = id_a JOIN cnt cb ON cb.id = id_b
         |WHERE ic::DOUBLE / (ca.n + cb.n - ic) >= 0.6""".stripMargin,

    "q44_containment" ->
      s"""WITH $augSql,
         |$shinglesSql,
         |cnt AS (SELECT id, count(*) AS n FROM shf GROUP BY id),
         |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
         |          FROM shf a JOIN shf b USING (sh) WHERE a.id <> b.id
         |          GROUP BY a.id, b.id)
         |SELECT id_a AS contained_id, id_b AS container_id,
         |  c::DOUBLE / ca.n AS containment
         |FROM inter JOIN cnt ca ON ca.id = id_a
         |WHERE c::DOUBLE / ca.n >= 0.9""".stripMargin,

    "q41_dedup_clusters" ->
      s"""WITH RECURSIVE $augSql,
         |$shinglesSql,
         |$ccSql
         |SELECT doc_id, cluster_id FROM cc""".stripMargin,

    "q48_leakage_safe_split" ->
      s"""WITH RECURSIVE $augSql,
         |$shinglesSql,
         |$ccSql,
         |assigned AS (SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         |             FROM (SELECT doc_id FROM aug) d LEFT JOIN cc USING (doc_id))
         |SELECT doc_id, cluster_id,
         |  CASE WHEN cast(('0x' || substr(md5(cluster_id::VARCHAR), 1, 15)) AS bigint) % 100 < 90
         |       THEN 'train' ELSE 'val' END AS split
         |FROM assigned""".stripMargin,

    "q52_dedup_keep" ->
      s"""WITH RECURSIVE $augSql,
         |$shinglesSql,
         |$ccSql,
         |assigned AS (SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
         |             FROM (SELECT doc_id FROM aug) d LEFT JOIN cc USING (doc_id))
         |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep FROM assigned""".stripMargin,

    "q40_contamination" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words
        |              FROM documents),
        |sh AS (SELECT DISTINCT doc_id AS id, array_to_string(list_slice(words, i + 1, i + 13), ' ') AS shingle
        |       FROM (SELECT doc_id, words, unnest(generate_series(0, len(words) - 13)) AS i
        |             FROM toks WHERE len(words) >= 13)),
        |shh AS (SELECT DISTINCT id, cast(('0x' || substr(md5(shingle), 1, 15)) AS bigint) AS sh FROM sh),
        |bench AS (SELECT DISTINCT sh FROM shh WHERE id % 97 = 0)
        |SELECT id AS doc_id, count(*) AS n_shared
        |FROM shh JOIN bench USING (sh)
        |GROUP BY id""".stripMargin,

    "q27_dedup_simhash" ->
      s"""WITH $augSql,
         |wordtf AS (SELECT doc_id AS id, w AS word, count(*) AS tf
         |           FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
         |                 FROM aug)
         |           GROUP BY doc_id, w),
         |wh AS (SELECT id, tf, cast(('0x' || substr(md5(word), 1, 15)) AS bigint) AS h FROM wordtf),
         |bits AS (SELECT id, j, sum(CASE WHEN (h >> j) % 2 = 1 THEN tf ELSE -tf END) AS c
         |         FROM wh, generate_series(0, 59) t(j) GROUP BY id, j),
         |fp AS (SELECT id, cast(sum(CASE WHEN c >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS bigint) AS simhash
         |       FROM bits GROUP BY id),
         |banded AS (SELECT id, simhash, b AS band, (simhash >> (b * 15)) % 32768 AS bkey
         |           FROM fp, generate_series(0, 3) t(b))
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM banded a
         |JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,

    "q28_dedup_embedding" -> {
      import VectorFunctions.Sql
      s"""WITH aug AS (
         |  ${Aug.embCopiesSql("embedding::DOUBLE[] AS v")}),
         |pq AS (SELECT ${Adaptive.bitsSql("count(*)", 2, 8, 16)} AS nb FROM embeddings),
         |bitsv AS (
         |  SELECT vec_id, v, nb,
         |    list_transform(range(0, nb * nb), j ->
         |      CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, 64), k ->
         |             v[k + 1] * ((${VectorFunctions.Sql.mix("j * 64 + k")})::DOUBLE / 1000.0))),
         |             (a, x) -> a + x) >= 0 THEN 1 ELSE 0 END) AS bits
         |  FROM aug, pq),
         |bx AS (SELECT vec_id, v, nb, bits, unnest(range(0, nb)) AS band FROM bitsv),
         |banded AS (
         |  SELECT vec_id, v, band,
         |    list_reduce(list_prepend(0, list_transform(range(0, nb),
         |                  r -> bits[band * nb + r + 1])),
         |                (acc, x) -> acc * 2 + x) AS bkey
         |  FROM bx),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
         |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos_sim FROM (
         |  SELECT id_a, id_b, ${Sql.cosine("cand.va", "cand.vb")} AS cos_sim FROM cand)
         |WHERE cos_sim >= 0.99""".stripMargin
    }
  )
}
