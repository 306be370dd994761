package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Fingerprint, TextFunctions => TF}
import graft.sources.Tables

/** Text analysis over the documents corpus (SURVEY §2 q32–q35):
  * language-ID, quality scoring, token counting, fingerprinting.
  * Single-scan, shuffle-free per-document scoring (q34 aggregates per
  * source afterwards) — the shape that holds at 100 TB.
  */
object TextQ extends QueryPack {

  /** Marker-word lists for the scorer. Real corpora would use
    * per-language stopword lists; the synthetic corpus shares one
    * vocabulary, so these exercise the machinery deterministically. */
  private val markers: Map[String, Seq[String]] = Map(
    "de" -> Seq("hash", "key"),
    "en" -> Seq("the", "a"),
    "es" -> Seq("data", "query"),
    "fr" -> Seq("window", "group"),
    "zh" -> Seq("spark", "table"))

  /** Fixed BPE merge count — unrolled verbatim in the oracle's CTE
    * chain (the kmeansCtes convention), so both engines run the same
    * number of steps. */
  private val BpeSteps = 8
  /** q77 shard token budget: ~15 shards at sf0.01, scale-free rule. */
  private val ShardBudget = 65536L

  /** Build the inverted-index postings artifact for `d` once per
    * session ([[graft.operators.InvertedIndex.build]] via
    * [[graft.tools.SessionArtifacts.ensure]]): (term, doc_id) distinct
    * pairs, range-clustered on term, file count from measured corpus
    * bytes (postings ≈ corpus-token-scale; ~128 MiB targets). Bench
    * times the build under its own `q118_index_build` line; q118
    * measures the recurring lookup, which at 100 TB reads the probed
    * terms' row groups instead of the corpus. */
  def ensureIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.tools.SessionArtifacts.ensure(s, "invidx", d, s"$d/documents.parquet") {
      (dir, files) =>
        // NOT fanned out (r18 REVERT): A/B measured 0.87× with the
        // fan-out (0.51 s off vs 0.59 s on) — the range exchange
        // feeding the clustered write dominates and already
        // parallelizes the explode's output
        graft.operators.InvertedIndex.build(Tables.documents(s, d), dir, files)
    }

  /** Bench-only: forget + delete so `q118_index_build` reps pay the
    * full explode + range-write chain. */
  def invalidateIndex(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    graft.tools.SessionArtifacts.invalidate(s, "invidx", d)

  /** Build the RANKED postings artifact for `d` once per session:
    * (term, doc_id, tf, dl) clustered on (term, doc_id) plus the
    * corpus-stats sidecar ([[graft.operators.InvertedIndex.buildRanked]]).
    * Bench times it under `q119_index_build`; q119 measures the
    * recurring BM25 lookup. */
  def ensureRankedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.tools.SessionArtifacts.ensure(s, "rankidx", d, s"$d/documents.parquet") {
      (dir, files) =>
        // NOT fanned out (r18 REVERT): A/B 0.98× — a wash; the
        // q118-build rationale
        graft.operators.InvertedIndex.buildRanked(Tables.documents(s, d), dir, files)
    }

  /** Bench-only twin of [[invalidateIndex]] for the ranked index. */
  def invalidateRankedIndex(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    graft.tools.SessionArtifacts.invalidate(s, "rankidx", d)

  /** The deterministic VERSIONED event log q122 runs on — derived
    * from the documents table so DuckDB can replay it exactly:
    * every doc arrives at ver 1; every 7th is RE-CRAWLED at ver 2
    * with changed text (reversed — drops its original terms); every
    * 13th is DELETED at ver 3. Spark and the oracle construct the
    * same relation from the same parquet. */
  def versionedEvents(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    docs.select($"doc_id", lit(1L).as("ver"), lit("U").as("op"), $"text")
      .unionByName(docs.filter($"doc_id" % 7 === 0)
        .select($"doc_id", lit(2L).as("ver"), lit("U").as("op"),
          reverse($"text").as("text")))
      .unionByName(docs.filter($"doc_id" % 13 === 0)
        .select($"doc_id", lit(3L).as("ver"), lit("D").as("op"),
          lit(null).cast("string").as("text")))
  }

  /** Build the VERSIONED ranked postings artifact once per session
    * ([[graft.operators.InvertedIndex.buildRankedVer]] over
    * [[versionedEvents]]). */
  def ensureVersionedIndex(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.tools.SessionArtifacts.ensure(s, "rankvidx", d, s"$d/documents.parquet") {
      (dir, files) =>
        // NOT fanned out (r18 REVERT): A/B 1.00× — a wash; the
        // q118-build rationale
        graft.operators.InvertedIndex.buildRankedVer(versionedEvents(s, d), dir, files)
    }

  /** Bench-only twin of [[invalidateIndex]] for the versioned ranked
    * index, so `q122_index_build` reps pay the full build. */
  def invalidateVersionedIndex(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    graft.tools.SessionArtifacts.invalidate(s, "rankvidx", d)

  /** BM25 parameters for q119/q120 — interpolated into the oracle
    * from the SAME Scala doubles the Spark side uses
    * (shortest-roundtrip printing, so DuckDB parses back the
    * identical bits). */
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** One per-term BM25 weight in DuckDB SQL — shared by the q119 and
    * q120 oracles so the arithmetic (and its evaluation order, which
    * fixes the double bits) cannot drift between the AND and OR
    * members. Expects CTEs `st(n_docs, sum_dl)` and `dfq(term, df)`
    * in scope. */
  private def bm25WSql(tfSql: String, dlSql: String, term: String) =
    s"""(SELECT (n_docs::DOUBLE - (SELECT df FROM dfq WHERE term = '$term')::DOUBLE + 0.5)
       |      / ((SELECT df FROM dfq WHERE term = '$term')::DOUBLE + 0.5) FROM st)
       |  * (($tfSql::DOUBLE * (${Bm25K1 + 1.0})::DOUBLE)
       |     / ($tfSql::DOUBLE + ($Bm25K1)::DOUBLE
       |        * ((${1.0 - Bm25B})::DOUBLE + ($Bm25B)::DOUBLE * ($dlSql::DOUBLE / (SELECT sum_dl::DOUBLE / n_docs::DOUBLE FROM st)))))""".stripMargin

  /** DuckDB replay of q60's merge loop: emits `m1..mN` (the learned
    * merges) and `s1..sN` (the symbol table after each step). Every
    * s$t is referenced by THREE consumers (py/pp of step t+1, s of
    * step t+1, q61's apply) — left un-materialized DuckDB inlines the
    * whole prefix chain into each reference and the replay blows up
    * ~3^steps, so each step is AS MATERIALIZED (the oracle-side twin
    * of the Spark side's CachePool). */
  private lazy val bpeCtes: String = {
    val b = new StringBuilder
    b ++= """w0 AS MATERIALIZED (SELECT word, count(*)::BIGINT AS wc
      |  FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
      |        FROM documents) GROUP BY word),
      |s0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', ' \1 ', 'g') AS sym, wc FROM w0)""".stripMargin
    (1 to BpeSteps).foreach { t =>
      b ++= s""",
        |py$t AS (SELECT wc, list_filter(string_split(sym, ' '), x -> x <> '') AS syms FROM s${t - 1}),
        |pp$t AS (SELECT syms[i + 1] AS a, syms[i + 2] AS b, wc
        |         FROM (SELECT wc, syms, unnest(generate_series(0, len(syms) - 2)) AS i
        |               FROM py$t WHERE len(syms) >= 2)),
        |m$t AS MATERIALIZED (SELECT $t AS step, a, b, sum(wc)::BIGINT AS c FROM pp$t GROUP BY a, b
        |        ORDER BY c DESC, a, b LIMIT 1),
        |s$t AS MATERIALIZED (SELECT replace(sym,
        |                         coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM m$t), '   '),
        |                         coalesce((SELECT ' ' || a || b || ' ' FROM m$t), '')) AS sym, wc
        |                       FROM s${t - 1})""".stripMargin
    }
    b.toString
  }

  /** The q60 merge loop: one corpus scan for the word histogram, then
    * BpeSteps iterations over the VOCABULARY-sized symbol table with a
    * 1-row argmax collect per step (bounded by construction). */
  private def learnBpeMerges(s: org.apache.spark.sql.SparkSession,
      d: String): Array[(Int, String, String, Long)] = {
    import s.implicits._
    // NOT fanned out (r18 REVERT): A/B measured q60 at 0.84× with the
    // fan-out (1.59 s off vs 1.89 s on) — the histogram's own
    // partial-agg exchange already parallelizes the merge loop's input
    val words0 = Tables.documents(s, d)
      .select(explode(TF.tokens($"text")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("wc"))
      .select(regexp_replace($"word", "(.)", " $1 ").as("sym"), $"wc")
    var cur = graft.CachePool.cache(words0)
    val merges = Array.newBuilder[(Int, String, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= BpeSteps && !exhausted) {
      val top = cur
        .select($"wc", filter(split($"sym", " "), x => x =!= "").as("syms"))
        .where(size($"syms") >= 2)
        .select($"wc", explode(transform(
          sequence(lit(1), size($"syms") - 1),
          i => struct(
            element_at($"syms", i).as("a"),
            element_at($"syms", i + 1).as("b")))).as("p"))
        .groupBy($"p.a".as("a"), $"p.b".as("b"))
        .agg(sum($"wc").as("c"))
        .orderBy($"c".desc, $"a".asc, $"b".asc)
        .limit(1).collect() // at most ONE row — bounded by construction
      if (top.isEmpty) {
        // vocabulary fully merged (or all single-char words) before
        // step budget ran out: stop, exactly like the oracle's
        // empty m$t CTEs — fewer merge rows, never a crash
        exhausted = true
      } else {
        val r = top.head
        val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((t, a, b, c))
        cur = graft.CachePool.cache(cur.select(
          call_function("replace",
            $"sym", lit(" " + a + "  " + b + " "), lit(" " + a + b + " ")).as("sym"),
          $"wc"))
      }
      t += 1
    }
    merges.result()
  }

  /** Learned merges memoized per (application, corpus dir) — the
    * train-once/apply-forever split q38's IVF model uses: learning is
    * charged to q60 (which always learns fresh and refreshes this
    * memo), while q61 and any other APPLY consumer reads the
    * vocabulary here. Determinism makes the split safe: whichever
    * call populates the memo, the merges are identical. The memo has
    * NO data-version component (same contract as IvfIndex's): if the
    * corpus under `d` is rewritten in-place within one application,
    * either re-run q60 (it re-learns and overwrites the entry) or
    * call [[clearBpeMemo]] — otherwise q61 tokenizes under the old
    * vocabulary. */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Array[(String, String)]]()

  /** (left, right) merge list in step order, learning on first use. */
  def bpeMerges(s: org.apache.spark.sql.SparkSession, d: String): Array[(String, String)] =
    bpeMemo.computeIfAbsent((s.sparkContext.applicationId, d),
      _ => learnBpeMerges(s, d).map(m => (m._2, m._3)))

  /** Evict memoized merges whose corpus-dir key contains `substr`
    * (bench/test hygiene — mirrors IvfIndex.clearMemo). */
  def clearBpeMemo(substr: String): Unit =
    bpeMemo.keySet.removeIf(_._2.contains(substr))

  /** The q63 anomaly-augmentation twins (Spark literal / SQL chr()
    * chain side by side, the [[Aug]] convention): accented letters
    * (non-ASCII), two U+FFFD replacement chars (decoder damage), and
    * a BEL control char — the three mojibake signals the query
    * screens for. Appended to doc_id % 11 == 0 copies at +3_000_000
    * so the corpus (pure ASCII by construction) gets a deterministic
    * dirty stratum both engines replay. */
  private val encAnomalySuffix = " caf\u00e9 na\u00efve \uFFFD\uFFFD \u0007end"
  private val encAnomalySuffixSql =
    "' caf' || chr(233) || ' na' || chr(239) || 've ' || chr(65533) || chr(65533) || ' ' || chr(7) || 'end'"

  /** q55's oracle, shared verbatim with q62 (which wraps it as a CTE
    * and applies band-dependent sampling on top). */
  private val q55OracleSql =
    """WITH tf AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
      |            FROM documents),
      |freq AS (SELECT word, count(*) AS f FROM tf GROUP BY word),
      |scored AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
      |                  sum(length(bin(f)))::BIGINT AS sum_bits
      |           FROM tf JOIN freq USING (word) GROUP BY doc_id),
      |c AS (SELECT sum(sum_bits)::DOUBLE / sum(n_tokens) AS corpus_mean FROM scored)
      |SELECT d.doc_id,
      |  coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
      |  coalesce(s.sum_bits, 0)::BIGINT AS sum_bits,
      |  coalesce(s.sum_bits::DOUBLE / s.n_tokens, 0.0) AS mean_bits,
      |  CASE WHEN coalesce(s.sum_bits::DOUBLE / s.n_tokens, 0.0) >= corpus_mean
      |       THEN 'head' ELSE 'tail' END AS band
      |FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id, c""".stripMargin

  def defs: Map[String, Q] = Map(
    "q32_langid" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", $"lang", TF.langId($"text", markers).as("pred_lang"))
    }),

    "q33_quality_score" -> ((s, d) => {
      import s.implicits._
      val nt = TF.tokenCount($"text")
      // Σ token lengths == count of non-space chars (every char is a
      // space or part of exactly one token) — one codegen'd builtin
      // instead of the interpreted aggregate(transform(tokens)) fold
      // (r18; same INT type and value, oracle unchanged)
      val sumLen = length(translate($"text", " ", ""))
      Tables.documents(s, d)
        .select(
          $"doc_id",
          nt.as("n_tokens"),
          sumLen.as("sum_token_len"),
          (sumLen.cast("double") / nt).as("mean_token_len"),
          (TF.tokensIn($"text", Seq("the", "a")).cast("double") / nt).as("stopword_ratio"))
        .withColumn(
          "quality_score",
          lit(0.4) * $"stopword_ratio" + lit(0.3) * ($"mean_token_len" / 10.0) +
            lit(0.3) * least($"n_tokens" / 100.0, lit(1.0)))
    }),

    "q34_token_count" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"source", TF.tokenCount($"text").as("nt"), TF.bpeishCount($"text").as("nb"))
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"nt").as("ws_tokens"),
          sum($"nb").as("bpeish_tokens"))
    }),

    "q35_fingerprint" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", Fingerprint.fingerprint($"text").as("fp"))
    }),

    // Corpus n-gram frequency table: top-10 word bigrams per source
    // (vocab construction / contamination screening staple). Shape:
    // one scan → partial-agg'd groupBy on (source, ngram) → per-group
    // top-k window — never a global sort, so the plan holds when
    // "source" is thousands of crawl snapshots at 100 TB.
    // End-to-end corpus cleaning — the composition a training-data
    // pipeline actually runs: language-consistency filter (predicted
    // lang must match the label) → quality threshold → exact-dedup
    // keepers (min doc_id per content hash) → training-ready rows.
    // Single scan for all scoring, one dedup shuffle; every stage is
    // one of the already-verified operators.
    "q42_clean_corpus" -> ((s, d) => {
      import s.implicits._
      val nt = TF.tokenCount($"text")
      // Σ token lengths == count of non-space chars (every char is a
      // space or part of exactly one token) — one codegen'd builtin
      // instead of the interpreted aggregate(transform(tokens)) fold
      // (r18; same INT type and value, oracle unchanged)
      val sumLen = length(translate($"text", " ", ""))
      // fan out the single-row-group corpus scan: langid + quality
      // scoring is per-row tokenize work (guide §2.5; no-op at
      // production partition counts). KEPT on r18 A/B evidence:
      // 1.24× (0.75 s with vs 0.94 s without, 5 interleaved pairs)
      val scored = graft.operators.FanOut.widen(Tables.documents(s, d))
        .select($"doc_id", $"lang", $"source", $"n_chars", $"text",
          TF.langId($"text", markers).as("pred_lang"),
          (lit(0.4) * (TF.tokensIn($"text", Seq("the", "a")).cast("double") / nt) +
            lit(0.3) * ((sumLen.cast("double") / nt) / 10.0) +
            lit(0.3) * least(nt / 100.0, lit(1.0))).as("quality_score"))
      val kept = scored.filter($"pred_lang" === $"lang" && $"quality_score" >= 0.3)
      val keepers = kept.groupBy(md5($"text").as("h")).agg(min($"doc_id").as("doc_id"))
      kept.join(keepers.select($"doc_id"), "doc_id")
        .select($"doc_id", $"source", $"n_chars", $"quality_score")
    }),

    // Training-mixture rebalancing: deterministically downsample
    // over-represented sources so every source contributes ~equal
    // tokens (rate_s = 100·min_tokens/tokens_s percent, md5-hash
    // selection — reproducible across runs/engines, no RNG). Two
    // passes: a per-source token aggregate (tiny, broadcast back) and
    // a scan-side filter — the mixture step of an LLM data pipeline.
    // Token-window document CHUNKING (round 13; the context-length
    // packer's upstream — split every document into fixed-size token
    // windows with overlap, the standard pretraining chunking shape:
    // size 64, stride 48 ⇒ 16-token overlap carrying context across
    // chunk boundaries): whitespace tokens, chunk i covers tokens
    // [i·stride, i·stride + size) for i·stride < n_tokens, so every
    // token lands in ≥ 1 chunk and no chunk is empty. Stateless
    // per-document explode — shuffle-free, streams as the identical
    // projection (no watermark, no state), and at 100 TB it is pure
    // map-side work whose ~size/stride amplification is the
    // semantics, not a plan defect.
    "q111_doc_chunk" -> ((s, d) => {
      import s.implicits._
      val toks = filter(split($"text", " "), x => x =!= lit(""))
      Tables.documents(s, d)
        .select($"doc_id", toks.as("toks"))
        .withColumn("n", size($"toks"))
        .filter($"n" > 0)
        .withColumn("chunk_id", explode(sequence(lit(0L), expr("(n - 1) div 48"))))
        .select($"doc_id", $"chunk_id",
          least(lit(64L), ($"n" - $"chunk_id" * 48).cast("long")).as("n_tok"),
          array_join(slice($"toks", ($"chunk_id" * 48 + 1).cast("int"), lit(64)), " ")
            .as("chunk_text"))
    }),

    // Deterministic BOTTOM-K sampling per source (round 13; the
    // streaming-maintainable reservoir an LLM ingest needs — a fixed
    // uniform sample per source over an unbounded arrival stream,
    // replayable with NO RNG): keep the k docs with the smallest
    // 52-bit md5 prefix of doc_id. Equivalent to a k-reservoir in
    // distribution (the hash is uniform) but ORDER-FREE: any subset,
    // any arrival order, any replay folds to the same sample — which
    // is what makes it streamable as exactly a bottom-k rank
    // (TopNRetractStream with score = −hash) with k-entry state per
    // source. 52 bits so the score is double-exact in the streaming
    // composition. Batch: one source shuffle + row_number.
    "q110_bottomk_sample" -> ((s, d) => {
      import s.implicits._
      val h = conv(substring(md5($"doc_id".cast("string")), 1, 13), 16, 10).cast("long")
      val w = Window.partitionBy($"source").orderBy($"h", $"doc_id")
      Tables.documents(s, d)
        .select($"source", $"doc_id", h.as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 25)
    }),

    // Conjunctive keyword search through the at-rest inverted index
    // (round 15): the SAME doc set as a corpus scan with an
    // array-contains residual — the oracle pins result identity — but
    // served from the postings table, where `term IN (…)` prunes to
    // the probed terms' row groups (scan ∝ Σ df(term), not corpus
    // size) and only the candidate ids semi-join back for payload
    // columns. 'dup' is this corpus's one selective term (df 25/500);
    // 'merge' is dense — the AND exercises both posting-list shapes.
    "q118_keyword_search" -> ((s, d) => {
      import s.implicits._
      val hits = graft.operators.InvertedIndex
        .lookupAll(s, ensureIndex(s, d), Seq("dup", "merge"))
      Tables.documents(s, d).join(hits, "doc_id")
        .select($"doc_id", $"source")
    }),

    // Ranked keyword retrieval through the at-rest index (round 16):
    // conjunctive BM25 top-k — q118's boolean AND upgraded to the
    // scored pull a corpus-curation user actually runs. Served from
    // the RANKED postings (term, doc_id, tf, dl): df per term is a
    // term-pruned scan + 2-row collect; the rarest term's df-25
    // posting list is the candidate set, and the dense term is probed
    // with doc_id IN (candidates) pushed into the scan — row-group
    // pruning on the SECONDARY cluster key, so the dense posting list
    // is never read whole (PlanSpec pins the pushdown). Scoring is
    // rational-idf BM25 — IEEE basic ops only, so the oracle replays
    // the double bit-for-bit (ln disagrees between engines in the
    // last ulp; see InvertedIndex.searchRanked).
    "q119_keyword_rank" -> ((s, d) =>
      graft.operators.InvertedIndex.searchRanked(
        s, ensureRankedIndex(s, d), Seq("dup", "merge"), topK = 20,
        k1 = Bm25K1, b = Bm25B)),

    // Disjunctive BM25 top-k (round 16): q119's OR twin — the default
    // retrieval shape (docs matching ANY term, absent terms score 0).
    // No rarest-first pruning exists for OR (every posting list is
    // part of the answer), so the scan is q118's Σ df bound; per-term
    // frames chain through df-bounded FULL OUTER joins, never a
    // corpus scan.
    "q120_keyword_rank_any" -> ((s, d) =>
      graft.operators.InvertedIndex.searchRankedAny(
        s, ensureRankedIndex(s, d), Seq("dup", "merge"), topK = 20,
        k1 = Bm25K1, b = Bm25B)),

    // Phrase search through the POSITIONAL postings (round 17): docs
    // containing "fast merge" as CONSECUTIVE tokens, with the exact
    // occurrence count. Same at-rest index as q119 (the ranked
    // schema carries a sorted positions array; BM25 queries prune the
    // column out of their scans — PlanSpec pins that), same
    // rarest-first candidate intersection with the doc_id-IN bloom
    // pushdown; adjacency then verifies with one array-filter lambda
    // over the CANDIDATES' positions only — cost ∝ candidate
    // occurrences, never the corpus.
    "q121_phrase_search" -> ((s, d) =>
      graft.operators.InvertedIndex.searchPhrase(
        s, ensureRankedIndex(s, d), Seq("fast", "merge"),
        pushdownCap = 10000)),

    // VERSIONED ranked retrieval (round 17): the corpus re-crawls
    // (ver 2 rewrites every 7th doc) and deletes (ver 3 tombstones
    // every 13th); BM25 runs over the LATEST live version of every
    // doc — old-version postings (including terms the re-crawl
    // removed) and deleted docs can never match or shift a score.
    // Resolution = one registry fold over the sentinel rows + a
    // candidate join; stats are registry-exact (not additive
    // sidecars — updates retract the old dl, deletes the doc). The
    // oracle replays latest-version materialization + the same
    // rational-idf arithmetic bit-for-bit.
    "q122_rank_versioned" -> ((s, d) =>
      graft.operators.InvertedIndex.searchRankedVer(
        s, ensureVersionedIndex(s, d), Seq("dup", "merge"), topK = 20,
        k1 = Bm25K1, b = Bm25B, pushdownCap = 10000)),

    // Phrase search over the VERSIONED corpus (round 17): q121's
    // adjacency verify composed with q122's latest-version resolution
    // — a re-crawl (ver 2 reverses the text char-wise, destroying the
    // original adjacency) or a delete (ver 3) must retire a doc's old
    // phrase hits, and only the LIVE version's positions may produce
    // new ones. Same rarest-first candidate intersection; the
    // resolution join sits between the scans and the verify, with the
    // term predicates pushed below it.
    "q123_phrase_versioned" -> ((s, d) =>
      graft.operators.InvertedIndex.searchPhraseVer(
        s, ensureVersionedIndex(s, d), Seq("fast", "merge"),
        pushdownCap = 10000)),

    // Token-budget mixture sampling (round 15): uniform-TOKEN source
    // mixing — every source contributes the same token MASS (the
    // min-source total), selected as the md5-ordered prefix of each
    // source's docs up to the budget, a doc admitted iff its FIRST
    // token lands below the cut (q77's boundary rule — exact integer
    // semantics both engines). q43 rebalances by doc-hash RATE
    // (correct in expectation); this is the exact-quota variant a
    // training-mixture spec pins ("40 B tokens of source X"), still
    // deterministic and RNG-free so replays and engines agree.
    //
    // Scale: the naive spelling is sum() OVER (PARTITION BY source
    // ORDER BY h) — one window partition PER SOURCE, i.e. a multi-TB
    // single-task sort at 100 TB with mixture-sized source counts.
    // Instead ONE global Prefix.cumsum in (source, h, doc_id) order
    // (distributed two-phase scan, parallel in P), then each row
    // subtracts its source's START offset: because source is the
    // LEADING ord key, per-source cumulative == global cumulative −
    // (sum of all tokens of sources sorting before it) — an S-row
    // (source-cardinality) driver-side exclusive prefix broadcast
    // back, the same shape as Prefix's own P-row offset fold.
    "q117_token_budget" -> ((s, d) => {
      import s.implicits._
      // not fanned out (r17): tokenCount + one md5 per DOC — too
      // light to pay for the exchange (measured flat)
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", TF.tokenCount($"text").cast("long").as("n_tokens"))
        .withColumn("h", md5($"doc_id".cast("string")))
      val cum = graft.operators.Prefix.cumsum(docs,
        ord = Seq($"source", $"h", $"doc_id"), value = $"n_tokens")
      val perSrc = docs.groupBy($"source").agg(sum($"n_tokens").as("tok"))
      val budget = Tables.memoizedLong(s, s"$d#q117-budget")(
        perSrc.agg(min($"tok")).as[Long].head())
      // sort with Spark's OWN string collation (UTF8String = unsigned
      // UTF-8 byte order), not Scala's UTF-16 code-unit sortBy: the
      // two disagree for supplementary-plane source names, and the
      // offsets must follow exactly the order Prefix.cumsum's range
      // exchange used
      val totals = perSrc.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (src, _) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(src)
        }
      var acc = 0L
      val offs = totals.map { case (src, t) => val o = acc; acc += t; (src, o) }
      val offDf = broadcast(offs.toSeq.toDF("source", "__off"))
      cum.join(offDf, "source")
        .withColumn("src_cum", $"cum" - $"__off")
        .filter($"src_cum" - $"n_tokens" < budget)
        .select($"doc_id", $"source", $"n_tokens", $"src_cum")
    }),

    "q43_source_rebalance" -> ((s, d) => {
      import s.implicits._
      // not fanned out (r17): tokenCount-only pass, too light to pay
      // for the exchange (measured flat-to-worse)
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", TF.tokenCount($"text").as("n_tokens"))
      val perSource = docs.groupBy($"source").agg(sum($"n_tokens").as("tok"))
      val minTok = Tables.memoizedLong(s, s"$d#q43-minTok")(
        perSource.agg(min($"tok")).as[Long].head())
      // integer division, matching the oracle's `//` (Column./ on
      // longs would promote to double and round differently)
      val rates = broadcast(perSource.select($"source",
        least(lit(100L), expr(s"(cast($minTok as bigint) * 100) div tok")).as("rate")))
      docs.join(rates, "source")
        .filter(conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10).cast("long") % 100 < $"rate")
        .select($"doc_id", $"source", $"n_tokens", $"rate")
    }),

    // Training-shard export packing: a deterministic global shuffle
    // (md5 order — reproducible, no RNG) and token-budget shard
    // assignment via DISTRIBUTED prefix sum (operators.Prefix). The
    // naive spelling — sum() OVER (ORDER BY hash) with no
    // partitionBy — collapses the whole corpus into one partition on
    // one executor; Prefix.cumsum computes the identical total with
    // two parallel shuffles + a P-row driver prefix, so the export
    // step that tends to be written as a scale trap isn't one. A doc
    // straddling a budget boundary belongs to the shard its FIRST
    // token falls in ((cum − n_tokens) div budget) — exact integer
    // semantics both engines.
    "q77_shard_pack" -> ((s, d) => {
      import s.implicits._
      // not fanned out (r17): tokenCount + one md5 per DOC (not per
      // token) — too light to pay for the exchange
      val docs = Tables.documents(s, d)
        .select($"doc_id", TF.tokenCount($"text").cast("long").as("n_tokens"))
        .withColumn("h", md5($"doc_id".cast("string")))
      graft.operators.Prefix.cumsum(docs, ord = Seq($"h", $"doc_id"), value = $"n_tokens")
        .select($"doc_id", $"n_tokens", $"cum",
          expr(s"(cum - n_tokens) div $ShardBudget").as("shard"))
    }),

    // Repetition filter (the Gopher-style quality rule): drop docs
    // dominated by one repeated term — max term frequency / n_tokens
    // above threshold marks degenerate/spammy text. Per-doc explode →
    // tf → max ratio; one scan + one (doc, word) partial-agg shuffle.
    "q45_repetition_filter" -> ((s, d) => {
      import s.implicits._
      // NOT fanned out (r18 REVERT): A/B measured q45 at 0.81× with
      // the fan-out (0.53 s off vs 0.65 s on) — the (doc, word)
      // partial agg parallelizes at its own exchange; the widen
      // shuffle ships full text to save tokenize work it can't beat
      val tf = Tables.documents(s, d)
        .select($"doc_id", explode(TF.tokens($"text")).as("word"))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
        .groupBy($"doc_id").agg(max($"tf").as("max_tf"), sum($"tf").as("n_tokens"))
        .withColumn("rep_ratio", $"max_tf".cast("double") / $"n_tokens")
      tf.filter($"rep_ratio" <= 0.1)
        .select($"doc_id", $"max_tf", $"n_tokens", $"rep_ratio")
    }),

    "q39_ngram_freq" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.documents(s, d).select(
        $"source",
        explode(graft.functions.Ngrams.ngrams($"text", 2)).as("ngram"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"n".desc, $"ngram".asc)
      grams.groupBy($"source", $"ngram")
        .agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
    }),

    // PII scrubbing — the redaction pass every training-data pipeline
    // runs before text reaches a model. The synthetic corpus carries
    // no PII, so the query PLANTS deterministic emails/IPs/phones on a
    // doc_id schedule (the oracle replays the same planting), then
    // counts and redacts with patterns in the Java∩RE2 regex subset so
    // both engines match identically. Redaction order is fixed
    // (email → ip → phone): an email's digit run must not be re-marked
    // as a phone. Single scan, shuffle-free — scan speed at 100 TB.
    "q46_pii_redact" -> ((s, d) => {
      import s.implicits._
      val planted = Tables.documents(s, d).select($"doc_id",
        concat(
          $"text",
          when($"doc_id" % 3 === 0, concat(lit(" contact user"), $"doc_id", lit("@example.com"))).otherwise(lit("")),
          when($"doc_id" % 5 === 0, concat(lit(" host 10.0."), $"doc_id" % 256, lit(".17"))).otherwise(lit("")),
          when($"doc_id" % 7 === 0, concat(lit(" tel 02"), $"doc_id" % 10, lit("55512340"))).otherwise(lit("")))
          .as("text"))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\d{10,}"
      // each count runs on the text AFTER the earlier passes redacted
      // it, so counts agree with what clean_text actually marks (an
      // IPv4 inside an email address is <EMAIL>, never also an n_ips)
      planted.select(
        $"doc_id",
        regexp_count($"text", lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(regexp_replace($"text", emailRe, "<EMAIL>"), lit(ipRe))
          .cast("long").as("n_ips"),
        regexp_count(regexp_replace(regexp_replace($"text", emailRe, "<EMAIL>"), ipRe, "<IP>"),
          lit(phoneRe)).cast("long").as("n_phones"),
        regexp_replace(
          regexp_replace(regexp_replace($"text", emailRe, "<EMAIL>"), ipRe, "<IP>"),
          phoneRe, "<PHONE>").as("clean_text"))
    }),

    // Corpus length-distribution profiling: per-source token-count
    // percentiles — the first chart anyone draws before setting
    // truncation/packing lengths. Percentiles are defined by INTEGER
    // ranks (value at row ceil(p·n/100) under (n_tokens, doc_id)
    // order), not float interpolation, so both engines agree bitwise.
    // One scan + one per-source window; the rank pick is a
    // conditional agg, no second pass.
    "q49_corpus_stats" -> ((s, d) => {
      import s.implicits._
      val wOrd = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"n_tokens", $"doc_id")
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy($"source")
      def atP(p: Int) = max(when(
        $"rn" === expr(s"(cnt * $p + 99) div 100"), $"n_tokens")).as(s"p$p")
      tokenizedDocs(s, d)
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("cnt", count(lit(1)).over(wAll))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), min($"n_tokens").as("min_tokens"),
          atP(50), atP(90), atP(99), max($"n_tokens").as("max_tokens"))
    }),

    // Context-window packing — the pretraining data-prep step that
    // concatenates a shard's documents into fixed-length training
    // sequences (GPT-style: documents are split across sequence
    // boundaries rather than padded). Deterministic contract: within
    // each source shard, docs pack in doc_id order; a doc starts at
    // cumulative token offset `cum_before`, lands in pack
    // floor(cum_before/2048), and spans `packs_spanned` sequences.
    // One window cumsum per shard — the per-key total order is the
    // same keyed-order requirement as count windows (q16); at 100 TB
    // the shard key is the unit of parallelism, exactly how packing
    // jobs shard in practice.
    "q47_sequence_pack" -> ((s, d) => {
      import s.implicits._
      val seqLen = 2048L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      tokenizedDocs(s, d)
        .withColumn("cum_before", coalesce(sum($"n_tokens").over(w), lit(0L)))
        .select(
          $"doc_id", $"source", $"n_tokens", $"cum_before",
          // integer div, matching the oracle's `//` (Column./ on longs
          // promotes to double — the q43 lesson)
          expr(s"cum_before div $seqLen").as("pack_id"),
          ($"cum_before" % seqLen).as("pack_offset"),
          expr(s"(cum_before + greatest(n_tokens, 1) - 1) div $seqLen - cum_before div $seqLen + 1")
            .as("packs_spanned"))
    }),

    // Unigram log-frequency quality scoring — the CCNet-style LM
    // filter with ENGINE-EXACT arithmetic: a doc's score is the mean
    // log2-magnitude of its tokens' corpus frequencies, where
    // log2-magnitude is the BIT LENGTH of the integer count
    // (length(bin(f)) = floor(log2 f) + 1 — no floating log, so Spark
    // and DuckDB agree bitwise). Rare-token-heavy (garbled) docs
    // score low; docs of common well-attested tokens score high —
    // the head/tail split CCNet uses LM perplexity for. Shapes: the
    // frequency table IS the language model — vocabulary-sized, built
    // by one partial-agg shuffle and BROADCAST back to the scan (at
    // 100 TB a vocab of millions of types is still MBs); per-doc
    // scoring is one (doc_id) partial-agg shuffle; the corpus mean is
    // a scalar broadcast. Never a self-join, never a sort.
    "q55_logfreq_quality" -> ((s, d) => {
      import s.implicits._
      // NOT fanned out (r18 REVERT): A/B measured q55 at 0.72× with
      // the fan-out (1.09 s off vs 1.51 s on) — q45's rationale, paid
      // twice here because the cached per-doc table reads the widened
      // stream in two consumers
      val tf = Tables.documents(s, d)
        .select($"doc_id", explode(TF.tokens($"text")).as("word"))
      val freq0 = tf.groupBy($"word").agg(count(lit(1)).as("f"))
      // GUARDED broadcast: the vocab is normally MBs at any corpus
      // size (Heaps' law), but a degenerate near-unique-token corpus
      // makes it corpus-sized, and an unconditional hint would
      // override size-based planning into a driver OOM. Vocab bytes
      // are bounded by corpus text bytes (every type occurs in the
      // text), so hint only when the corpus itself is under 1 GiB —
      // beyond that, AQE's runtime shuffle-size stats pick broadcast
      // iff the vocab actually is small.
      val freq =
        if (Tables.documentBytes(s, d) <= (1L << 30)) broadcast(freq0) else freq0
      // cached: the per-doc table feeds both the output rows and the
      // corpus-mean scalar — uncached, the explode+join+agg chain
      // would run twice
      val scored = graft.CachePool.cache(
        tf.join(freq, "word")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum(length(bin($"f"))).as("sum_bits"))
          .withColumn("mean_bits", $"sum_bits".cast("double") / $"n_tokens"))
      val corpus = scored.agg(
        (sum($"sum_bits").cast("double") / sum($"n_tokens")).as("corpus_mean"))
      // left join back to the corpus: a zero-token doc produces no
      // exploded rows, and silently omitting it would let it bypass
      // the quality filter entirely — it must surface as an explicit
      // (0, 0, 0.0, tail) row
      Tables.documents(s, d).select($"doc_id")
        .join(scored, Seq("doc_id"), "left")
        .crossJoin(broadcast(corpus))
        .select($"doc_id",
          coalesce($"n_tokens", lit(0L)).as("n_tokens"),
          coalesce($"sum_bits", lit(0L)).as("sum_bits"),
          coalesce($"mean_bits", lit(0.0)).as("mean_bits"),
          when(coalesce($"mean_bits", lit(0.0)) >= $"corpus_mean", lit("head"))
            .otherwise(lit("tail")).as("band"))
    }),

    // Quality-based resampling — the step that CONSUMES q55's bands
    // (every LLM-data paper's move after scoring: keep the head
    // whole, thin the tail): head rate 100, tail rate 30, selection
    // by the q43 md5-hash idiom — reproducible, engine-exact, no RNG.
    // Plan shape: q55's scoring plan + one scan-side filter; nothing
    // new shuffles.
    "q62_quality_resample" -> ((s, d) =>
      graft.operators.LmArtifact.bandResample(defs("q55_logfreq_quality")(s, d))),

    // Encoding-anomaly screening — the C4/CCNet cleanup step the text
    // family lacked: per doc, counts of non-ASCII codepoints, C0
    // control chars (tab/newline/CR excluded — those are formatting,
    // not damage), and U+FFFD replacement chars (the tombstone a
    // lossy decode leaves behind), plus a keep/flag verdict
    // (replacement or control chars flag outright; non-ASCII flags
    // above 30%, integer-compared as 10*n > 3*chars so neither
    // engine divides). One shuffle-free corpus scan. The base corpus
    // is pure ASCII by construction, so a deterministic dirty
    // stratum (encAnomalySuffix twins above) is appended, the Aug
    // convention.
    "q63_encoding_anomaly" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"text")
      docs.unionByName(docs.filter($"doc_id" % 11 === 0)
          .select(($"doc_id" + 3000000L).as("doc_id"),
            concat($"text", lit(encAnomalySuffix)).as("text")))
        .select(
          $"doc_id",
          length($"text").cast("long").as("n_chars"),
          length(regexp_replace($"text", "[\\x00-\\x7F]", "")).cast("long").as("n_non_ascii"),
          (length($"text") -
            length(regexp_replace($"text", "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")))
            .cast("long").as("n_control"),
          (length($"text") - length(translate($"text", "\uFFFD", "")))
            .cast("long").as("n_replacement"))
        .withColumn("verdict",
          when($"n_replacement" === 0 && $"n_control" === 0 &&
            $"n_non_ascii" * 10 <= $"n_chars" * 3, "keep").otherwise("flag"))
    }),

    // BPE tokenizer learning — the tokenizer-training stage of an LLM
    // data pipeline (Sennrich et al. 2016), distributed the only way
    // that holds at 100 TB: the corpus is scanned ONCE for the word
    // histogram, then every merge iteration runs over the
    // VOCABULARY-sized symbol table (Heaps' law: MBs at any corpus
    // size), with a 1-row argmax collect per step. Symbols ride
    // SPACE-WRAPPED (" h  e  l  l  o " — every symbol carries its own
    // leading and trailing space), so a merge is one LITERAL
    // left-to-right replace(" a  b " -> " ab ") with identical greedy
    // semantics in Spark and DuckDB. Space is the one character
    // provably absent from a whitespace-split token, and wrapping
    // BOTH sides is load-bearing: a prefix-only delimiter forges a
    // merge when the right element is a proper PREFIX of the next
    // symbol (" a b" matches inside " a bc"), a suffix-only one has
    // the mirrored flaw, and single-shared-delimiter forms drop
    // adjacent repeats of the same pair ("a b a b" must become
    // "ab ab"; the wrapped form provably does — see the spec).
    // The oracle unrolls the merge steps as CTEs, kmeansCtes-style.
    // Ties break (count DESC, left, right) — deterministic.
    "q60_bpe_learn" -> ((s, d) => {
      import s.implicits._
      val merges = learnBpeMerges(s, d)
      // the learn line always learns fresh AND refreshes the memo —
      // like the bench setup lines, its last run leaves a valid
      // vocabulary for the apply line (q61) to consume
      bpeMemo.put((s.sparkContext.applicationId, d), merges.map(m => (m._2, m._3)))
      merges.toSeq.toDF("step", "left_sym", "right_sym", "pair_count")
    }),

    // Tokenize under the LEARNED vocabulary — q60's apply stage, the
    // real version of q34's regex approximation: the merges come from
    // the memoized learn ([[bpeMerges]] — the q38 train-once/
    // probe-forever split, so this line measures TOKENIZATION, not
    // re-learning), then ONE shuffle-free corpus scan applies them
    // via the native [[graft.functions.BpeTokenCount]] kernel: one
    // codegen'd call per document, cost per token
    // O(len + merges-present) INDEPENDENT of vocabulary size (the
    // sequential-replace fold this replaces paid one full string pass
    // per merge — linear in vocab, ruinous at a production 32k-merge
    // vocabulary; the kernel's heap order provably replays the fold's
    // exact semantics, BpeKernelSpec + the oracle pin it). Zero-token
    // docs surface as (0, 0).
    "q61_bpe_tokenize" -> ((s, d) => {
      import s.implicits._
      val learned = bpeMerges(s, d)
      Tables.documents(s, d).select(
        $"doc_id",
        TF.tokenCount($"text").cast("long").as("ws_tokens"),
        graft.functions.BpeTokenCount.bpeTokenCount($"text", learned.toSeq)
          .cast("long").as("bpe_tokens"))
    }),

    // Keyword retrieval: quantized-BM25 top-k over the corpus — the
    // query side of a training-data pipeline (targeted corpus pulls,
    // benchmark-neighborhood inspection; the reference ships an
    // Elasticsearch sink for exactly this consumer, Kafka2ES.java).
    // BM25's two ingredients appear in ENGINE-EXACT integer form so
    // Spark and DuckDB agree bitwise: term-frequency saturation is
    // least(tf, 4) (BM25's k1 plateau, quantized) and idf is the BIT
    // LENGTH of N/df (floor-log2 of the inverse document frequency —
    // no floating log). Shapes for 100 TB: the term filter lands
    // inside the token explode (one scan, only query-term rows
    // survive), df is |terms| rows (broadcast unconditionally — it is
    // bounded by the QUERY, not the corpus), and top-k is
    // TakeOrdered — never a global sort of the corpus; the rank
    // window runs over the already-reduced k rows.
    "q57_keyword_topk" -> ((s, d) => {
      import s.implicits._
      val terms = Seq("spark", "window", "hash")
      val k = 20
      val docs = Tables.documents(s, d)
      // not fanned out (r17): the explode filters to 3 terms
      // immediately — too light to pay for the exchange (0.53 -> 0.75
      // measured, reverted)
      val tf = docs
        .select($"doc_id", explode(TF.tokens($"text")).as("word"))
        .where($"word".isInCollection(terms))
        .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val dfreq = tf.groupBy($"word").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfreq), "word")
        .crossJoin(broadcast(n))
        .withColumn("idf_bits", length(bin(expr("n_docs div df"))))
        .groupBy($"doc_id")
        .agg(sum(least($"tf", lit(4)) * $"idf_bits").cast("long").as("score"))
      val topk = scored.orderBy($"score".desc, $"doc_id".asc).limit(k)
      // global (unpartitioned) window — input is the k-row TakeOrdered
      // result, so the "moving all data to a single partition" warning
      // it logs is about k = 20 rows, not the corpus
      topk.withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"score".desc, $"doc_id".asc)))
    }),

    // Bigram LM quality scoring with unigram backoff — q55's unigram
    // model upgraded one order toward what CCNet actually runs (a
    // KenLM n-gram LM): each adjacent token pair scores by the bit
    // length of its corpus bigram count when the pair is attested
    // elsewhere (c2 >= 2), else BACKS OFF to the trailing unigram's
    // bit length minus a 4-bit penalty (floored at 1) — all integer,
    // so both engines agree bitwise; the only division is the final
    // exact-integer mean. Shapes: bigrams derive ARRAY-SIDE
    // (slice+zip before the explode — no per-token window, no lag
    // shuffle); the pair stream is cached once and feeds both the
    // bigram table and the scoring join; bigram + unigram vocab joins
    // broadcast under the same Heaps'-law guard as q55; per-doc
    // scoring is one (doc_id) partial-agg shuffle. Docs with <2
    // tokens surface explicitly as (0, 0, 0.0, tail).
    "q58_bigram_lm" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      // NOT fanned out (r18 REVERT): A/B measured q58 at 0.89× with
      // the fan-out (1.55 s off vs 1.74 s on) — both token streams
      // parallelize at their own partial-agg exchanges
      val pairs = graft.CachePool.cache(
        docs.select($"doc_id", TF.tokens($"text").as("words"))
          .where(size($"words") >= 2)
          .select($"doc_id", explode(transform(
            sequence(lit(1), size($"words") - 1),
            i => struct(
              element_at($"words", i).as("prev"),
              element_at($"words", i + 1).as("cur")))).as("p"))
          .select($"doc_id", $"p.prev".as("prev"), $"p.cur".as("cur")))
      val big0 = pairs.groupBy($"prev", $"cur").agg(count(lit(1)).as("c2"))
      val uni0 = graft.operators.FanOut.widen(docs)
        .select(explode(TF.tokens($"text")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("c1"))
      // the unigram guard bounds vocab bytes by corpus bytes (every
      // type occurs in the text) — but a DISTINCT BIGRAM stores both
      // of its tokens, so the bigram table can reach ~2x corpus
      // bytes on a near-unique-token corpus: its hint gets half the
      // headroom
      val big =
        if (Tables.documentBytes(s, d) <= (1L << 29)) broadcast(big0) else big0
      val uni =
        if (Tables.documentBytes(s, d) <= (1L << 30)) broadcast(uni0) else uni0
      val bits = pairs
        .join(big, Seq("prev", "cur"))
        .join(uni, $"cur" === $"word")
        .withColumn("pb",
          when($"c2" >= 2, length(bin($"c2")))
            .otherwise(greatest(length(bin($"c1")) - 4, lit(1))))
      val scored = graft.CachePool.cache(
        bits.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_pairs"), sum($"pb").cast("long").as("sum_bits"))
          .withColumn("mean_bits", $"sum_bits".cast("double") / $"n_pairs"))
      val corpus = scored.agg(
        (sum($"sum_bits").cast("double") / sum($"n_pairs")).as("corpus_mean"))
      docs.select($"doc_id")
        .join(scored, Seq("doc_id"), "left")
        .crossJoin(broadcast(corpus))
        .select($"doc_id",
          coalesce($"n_pairs", lit(0L)).as("n_pairs"),
          coalesce($"sum_bits", lit(0L)).as("sum_bits"),
          coalesce($"mean_bits", lit(0.0)).as("mean_bits"),
          when(coalesce($"mean_bits", lit(0.0)) >= $"corpus_mean", lit("head"))
            .otherwise(lit("tail")).as("band"))
    })
  )

  /** (doc_id, source, n_tokens BIGINT) — the ONE tokenized-docs shape
    * q47 and q49 share (Spark + oracle twins below); tokenization
    * drift between packing offsets and length percentiles would
    * otherwise be silent. */
  private def tokenizedDocs(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"source", TF.tokenCount($"text").cast("long").as("n_tokens"))
  }

  private val tokenizedSql =
    """t AS (SELECT doc_id, source,
      |        len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_tokens
      |      FROM documents)""".stripMargin

  private def scoreSql(lang: String): String = {
    val words = markers(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(list_filter(string_split(text, ' '), w -> w <> ''), w -> w in ($words)))"
  }

  def oracles: Map[String, String] = Map(
    "q32_langid" -> {
      val g = markers.keys.toSeq.sorted.map(scoreSql).mkString(", ")
      val cases = markers.keys.toSeq.sorted
        .map(l => s"WHEN ${scoreSql(l)} >= greatest($g) THEN '$l'")
        .mkString("\n    ")
      s"""SELECT doc_id, lang,
         |  CASE
         |    $cases
         |  END AS pred_lang
         |FROM documents""".stripMargin
    },

    "q33_quality_score" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
        |    list_sum(list_transform(list_filter(string_split(text, ' '), w -> w <> ''), w -> length(w)))::BIGINT AS sum_token_len,
        |    len(list_filter(list_filter(string_split(text, ' '), w -> w <> ''), w -> w in ('the', 'a'))) AS n_stop
        |  FROM documents)
        |SELECT doc_id, n_tokens, sum_token_len,
        |  sum_token_len::DOUBLE / n_tokens AS mean_token_len,
        |  n_stop::DOUBLE / n_tokens AS stopword_ratio,
        |  0.4 * (n_stop::DOUBLE / n_tokens) + 0.3 * ((sum_token_len::DOUBLE / n_tokens) / 10.0)
        |    + 0.3 * least(n_tokens / 100.0, 1.0) AS quality_score
        |FROM base""".stripMargin,

    "q34_token_count" ->
      """SELECT source, count(*) AS n_docs,
        |  cast(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS bigint) AS ws_tokens,
        |  cast(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS bigint) AS bpeish_tokens
        |FROM documents GROUP BY source""".stripMargin,

    "q35_fingerprint" ->
      s"SELECT doc_id, ${Fingerprint.duckdbSql("text")} AS fp FROM documents",

    "q42_clean_corpus" -> {
      val g = markers.keys.toSeq.sorted.map(scoreSql).mkString(", ")
      val cases = markers.keys.toSeq.sorted
        .map(l => s"WHEN ${scoreSql(l)} >= greatest($g) THEN '$l'")
        .mkString("\n    ")
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source, n_chars, text,
         |    CASE
         |    $cases
         |    END AS pred_lang,
         |    0.4 * (len(list_filter(list_filter(string_split(text, ' '), w -> w <> ''), w -> w in ('the', 'a')))::DOUBLE
         |           / len(list_filter(string_split(text, ' '), w -> w <> '')))
         |    + 0.3 * ((list_sum(list_transform(list_filter(string_split(text, ' '), w -> w <> ''), w -> length(w)))::DOUBLE
         |              / len(list_filter(string_split(text, ' '), w -> w <> ''))) / 10.0)
         |    + 0.3 * least(len(list_filter(string_split(text, ' '), w -> w <> '')) / 100.0, 1.0) AS quality_score
         |  FROM documents),
         |kept AS (SELECT * FROM scored WHERE pred_lang = lang AND quality_score >= 0.3),
         |keepers AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text))
         |SELECT k.doc_id, k.source, k.n_chars, k.quality_score
         |FROM kept k JOIN keepers USING (doc_id)""".stripMargin
    },

    "q111_doc_chunk" ->
      """WITH t AS (SELECT doc_id,
        |             list_filter(string_split(text, ' '), w -> w <> '') AS toks
        |           FROM documents),
        |     s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0)
        |SELECT doc_id, i AS chunk_id,
        |  least(64, n - i * 48)::BIGINT AS n_tok,
        |  array_to_string(toks[i * 48 + 1 : i * 48 + 64], ' ') AS chunk_text
        |FROM s, unnest(generate_series(0, (n - 1) // 48)) AS g(i)""".stripMargin,

    "q110_bottomk_sample" ->
      """SELECT source, doc_id, h, rn FROM (
        |  SELECT source, doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rn
        |  FROM (SELECT source, doc_id,
        |          cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 13)) AS bigint) AS h
        |        FROM documents)
        |) WHERE rn <= 25""".stripMargin,

    // index-path identity: the inverted lookup must return exactly
    // the corpus-scan answer (same tokenizer — whitespace split,
    // empties dropped — on both sides)
    "q118_keyword_search" ->
      """WITH t AS (SELECT doc_id, source,
        |             list_distinct(list_filter(string_split(text, ' '), w -> w <> '')) AS terms
        |           FROM documents)
        |SELECT doc_id, source FROM t
        |WHERE list_contains(terms, 'dup') AND list_contains(terms, 'merge')""".stripMargin,

    // rational-idf BM25 replay: every factor is IEEE basic arithmetic
    // in the SAME evaluation order as the Spark side (constants
    // interpolated from the same Scala doubles, shortest-roundtrip),
    // so the score doubles match bit-for-bit — the one transcendental
    // (ln) is deliberately absent from both sides
    "q119_keyword_rank" -> {
      val (t0, t1) = ("dup", "merge")
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |              FROM documents),
         |d AS (SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM toks),
         |st AS (SELECT count(*)::BIGINT AS n_docs, coalesce(sum(dl), 0)::BIGINT AS sum_dl FROM d),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM (SELECT doc_id, unnest(ws) AS term FROM d)
         |       WHERE term IN ('$t0', '$t1') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |sc AS (SELECT a0.doc_id,
         |         ${bm25WSql("a0.tf", "d.dl", t0)}
         |       + ${bm25WSql("a1.tf", "d.dl", t1)} AS score
         |       FROM (SELECT doc_id, tf FROM tf WHERE term = '$t0') a0
         |       JOIN (SELECT doc_id, tf FROM tf WHERE term = '$t1') a1 USING (doc_id)
         |       JOIN d USING (doc_id)),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
         |SELECT doc_id, score, rnk FROM r WHERE rnk <= 20""".stripMargin
    },

    // OR-mode replay: per-term frames FULL OUTER JOIN on doc_id, the
    // using-column coalesced (both engines), absent terms contribute
    // an exact 0.0 — same shared weight arithmetic as q119
    "q120_keyword_rank_any" -> {
      val (t0, t1) = ("dup", "merge")
      val dl = "COALESCE(a0.dl, a1.dl)"
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |              FROM documents),
         |d AS (SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM toks),
         |st AS (SELECT count(*)::BIGINT AS n_docs, coalesce(sum(dl), 0)::BIGINT AS sum_dl FROM d),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM (SELECT doc_id, unnest(ws) AS term FROM d)
         |       WHERE term IN ('$t0', '$t1') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |sc AS (SELECT doc_id,
         |         (CASE WHEN a0.tf IS NULL THEN (0.0)::DOUBLE ELSE
         |           ${bm25WSql("a0.tf", dl, t0)} END)
         |       + (CASE WHEN a1.tf IS NULL THEN (0.0)::DOUBLE ELSE
         |           ${bm25WSql("a1.tf", dl, t1)} END) AS score
         |       FROM (SELECT t.doc_id, t.tf, d.dl FROM tf t JOIN d USING (doc_id)
         |             WHERE term = '$t0') a0
         |       FULL OUTER JOIN (SELECT t.doc_id, t.tf, d.dl FROM tf t JOIN d USING (doc_id)
         |             WHERE term = '$t1') a1 USING (doc_id)),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
         |SELECT doc_id, score, rnk FROM r WHERE rnk <= 20""".stripMargin
    },

    // phrase replay: start positions counted straight off the token
    // list (1-based in DuckDB, 0-based in the index — the COUNT is
    // base-independent); the Spark side must answer identically from
    // the positional postings' adjacency verify
    "q121_phrase_search" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |              FROM documents),
        |h AS (SELECT doc_id,
        |        len(list_filter(generate_series(1, len(ws) - 1),
        |            i -> ws[i] = 'fast' AND ws[i + 1] = 'merge'))::BIGINT AS n_hits
        |      FROM toks)
        |SELECT doc_id, n_hits FROM h WHERE n_hits > 0""".stripMargin,

    // versioned replay: latest-version materialization (max_by over
    // the event log — ver 2 re-crawls reverse the text, ver 3
    // deletes), then the IDENTICAL rational-idf BM25 arithmetic as
    // q119 over the LIVE corpus — scores must match bit-for-bit
    "q122_rank_versioned" -> {
      val (t0, t1) = ("dup", "merge")
      s"""WITH ev AS (
         |  SELECT doc_id, 1 AS ver, 'U' AS op, text FROM documents
         |  UNION ALL
         |  SELECT doc_id, 2, 'U', reverse(text) FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id, 3, 'D', NULL FROM documents WHERE doc_id % 13 = 0),
         |live AS (SELECT doc_id, max_by(op, ver) AS op, max_by(text, ver) AS text
         |         FROM ev GROUP BY doc_id),
         |toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
         |         FROM live WHERE op = 'U'),
         |d AS (SELECT doc_id, len(ws)::BIGINT AS dl, ws FROM toks),
         |st AS (SELECT count(*)::BIGINT AS n_docs, coalesce(sum(dl), 0)::BIGINT AS sum_dl FROM d),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         |       FROM (SELECT doc_id, unnest(ws) AS term FROM d)
         |       WHERE term IN ('$t0', '$t1') GROUP BY doc_id, term),
         |dfq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
         |sc AS (SELECT a0.doc_id,
         |         ${bm25WSql("a0.tf", "d.dl", t0)}
         |       + ${bm25WSql("a1.tf", "d.dl", t1)} AS score
         |       FROM (SELECT doc_id, tf FROM tf WHERE term = '$t0') a0
         |       JOIN (SELECT doc_id, tf FROM tf WHERE term = '$t1') a1 USING (doc_id)
         |       JOIN d USING (doc_id)),
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM sc)
         |SELECT doc_id, score, rnk FROM r WHERE rnk <= 20""".stripMargin
    },

    // versioned phrase replay: latest-version materialization (q122's
    // CTE), then start positions counted off the LIVE token lists
    // (q121's adjacency) — reversed re-crawls and deletes must drop
    // their old hits in both engines
    "q123_phrase_versioned" ->
      """WITH ev AS (
        |  SELECT doc_id, 1 AS ver, 'U' AS op, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, 'U', reverse(text) FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'D', NULL FROM documents WHERE doc_id % 13 = 0),
        |live AS (SELECT doc_id, max_by(op, ver) AS op, max_by(text, ver) AS text
        |         FROM ev GROUP BY doc_id),
        |toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
        |         FROM live WHERE op = 'U'),
        |h AS (SELECT doc_id,
        |        len(list_filter(generate_series(1, len(ws) - 1),
        |            i -> ws[i] = 'fast' AND ws[i + 1] = 'merge'))::BIGINT AS n_hits
        |      FROM toks)
        |SELECT doc_id, n_hits FROM h WHERE n_hits > 0""".stripMargin,

    // per-source window replay: DuckDB's PARTITION BY source window
    // must equal the global-cumsum-minus-source-offset decomposition
    // exactly (source is the leading ord key, so the two spellings
    // are algebraically identical over a total order)
    "q117_token_budget" ->
      """WITH d AS (SELECT doc_id, source,
        |             len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_tokens,
        |             md5(doc_id::VARCHAR) AS h
        |           FROM documents),
        |t AS (SELECT source, sum(n_tokens)::BIGINT AS tok FROM d GROUP BY source),
        |b AS (SELECT min(tok) AS budget FROM t),
        |c AS (SELECT doc_id, source, n_tokens,
        |        sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id)::BIGINT AS src_cum
        |      FROM d)
        |SELECT doc_id, source, n_tokens, src_cum FROM c, b
        |WHERE src_cum - n_tokens < budget""".stripMargin,

    "q43_source_rebalance" ->
      """WITH docs AS (SELECT doc_id, source,
        |                len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
        |              FROM documents),
        |per_source AS (SELECT source, cast(sum(n_tokens) AS bigint) AS tok FROM docs GROUP BY source),
        |rates AS (SELECT source,
        |            least(100, 100 * (SELECT min(tok) FROM per_source) // tok) AS rate
        |          FROM per_source)
        |SELECT doc_id, d.source, n_tokens, rate
        |FROM docs d JOIN rates r ON d.source = r.source
        |WHERE cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS bigint) % 100 < rate""".stripMargin,

    // single-node window replay: the prefix sum over a total order is
    // partitioning-independent, so DuckDB's one-partition OVER(ORDER
    // BY) must equal the distributed two-phase scan exactly
    "q77_shard_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |             len(list_filter(string_split(text, ' '), w -> w <> ''))::BIGINT AS n_tokens,
         |             md5(doc_id::VARCHAR) AS h
         |           FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |        sum(n_tokens) OVER (ORDER BY h, doc_id)::BIGINT AS cum
         |      FROM t)
         |SELECT doc_id, n_tokens, cum, (cum - n_tokens) // $ShardBudget AS shard FROM c""".stripMargin,

    "q45_repetition_filter" ->
      """WITH tf AS (SELECT doc_id, w, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |                  FROM documents)
        |            GROUP BY doc_id, w),
        |agg AS (SELECT doc_id, cast(max(tf) AS bigint) AS max_tf, cast(sum(tf) AS bigint) AS n_tokens
        |        FROM tf GROUP BY doc_id)
        |SELECT doc_id, max_tf, n_tokens, max_tf::DOUBLE / n_tokens AS rep_ratio
        |FROM agg WHERE max_tf::DOUBLE / n_tokens <= 0.1""".stripMargin,

    "q39_ngram_freq" ->
      """WITH toks AS (SELECT source, list_filter(string_split(text, ' '), w -> w <> '') AS words
        |              FROM documents),
        |grams AS (SELECT source, array_to_string(list_slice(words, i + 1, i + 2), ' ') AS ngram
        |          FROM (SELECT source, words, unnest(generate_series(0, len(words) - 2)) AS i
        |                FROM toks WHERE len(words) >= 2)),
        |cnt AS (SELECT source, ngram, count(*) AS n FROM grams GROUP BY source, ngram)
        |SELECT source, ngram, n, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, ngram) AS rnk FROM cnt)
        |WHERE rnk <= 10""".stripMargin,

    "q46_pii_redact" -> {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val phoneRe = "\\d{10,}"
      s"""WITH planted AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         |    || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || (doc_id % 256) || '.17' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0 THEN ' tel 02' || (doc_id % 10) || '55512340' ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(text, '$emailRe')) AS n_emails,
         |  len(regexp_extract_all(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'), '$ipRe')) AS n_ips,
         |  len(regexp_extract_all(
         |    regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'),
         |    '$phoneRe')) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |    '$ipRe', '<IP>', 'g'), '$phoneRe', '<PHONE>', 'g') AS clean_text
         |FROM planted""".stripMargin
    },

    "q49_corpus_stats" ->
      s"""WITH $tokenizedSql,
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn,
        |        count(*) OVER (PARTITION BY source) AS cnt
        |      FROM t)
        |SELECT source, count(*) AS n_docs,
        |  cast(min(n_tokens) AS bigint) AS min_tokens,
        |  cast(max(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN n_tokens END) AS bigint) AS p50,
        |  cast(max(CASE WHEN rn = (cnt * 90 + 99) // 100 THEN n_tokens END) AS bigint) AS p90,
        |  cast(max(CASE WHEN rn = (cnt * 99 + 99) // 100 THEN n_tokens END) AS bigint) AS p99,
        |  cast(max(n_tokens) AS bigint) AS max_tokens
        |FROM r GROUP BY source""".stripMargin,

    "q47_sequence_pack" ->
      s"""WITH $tokenizedSql,
        |c AS (SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_before FROM t)
        |SELECT doc_id, source, n_tokens, cum_before,
        |  cum_before // 2048 AS pack_id,
        |  cum_before % 2048 AS pack_offset,
        |  (cum_before + greatest(n_tokens, 1) - 1) // 2048 - cum_before // 2048 + 1 AS packs_spanned
        |FROM c""".stripMargin,

    "q55_logfreq_quality" -> q55OracleSql,

    // q55's scoring as a CTE + band-dependent deterministic sampling:
    // head kept whole, tail md5-thinned to 30% (the q43 selection
    // idiom -- reproducible, engine-exact, no RNG)
    "q62_quality_resample" -> {
      val idx = q55OracleSql.lastIndexOf("SELECT d.doc_id")
      val (ctes, fin) = q55OracleSql.splitAt(idx)
      s"""${ctes.trim},
         |q55 AS ($fin)
         |SELECT doc_id, band, mean_bits,
         |  CASE WHEN band = 'head' THEN 100 ELSE 30 END AS rate
         |FROM q55
         |WHERE cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 15)) AS bigint) % 100
         |      < CASE WHEN band = 'head' THEN 100 ELSE 30 END""".stripMargin
    },

    "q63_encoding_anomaly" ->
      s"""WITH aug AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000, text || $encAnomalySuffixSql
         |  FROM documents WHERE doc_id % 11 = 0),
         |m AS (SELECT doc_id,
         |  length(text)::BIGINT AS n_chars,
         |  length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g'))::BIGINT AS n_non_ascii,
         |  (length(text) - length(regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')))::BIGINT AS n_control,
         |  (length(text) - length(replace(text, chr(65533), '')))::BIGINT AS n_replacement
         |  FROM aug)
         |SELECT doc_id, n_chars, n_non_ascii, n_control, n_replacement,
         |  CASE WHEN n_replacement = 0 AND n_control = 0
         |            AND n_non_ascii * 10 <= n_chars * 3
         |       THEN 'keep' ELSE 'flag' END AS verdict
         |FROM m""".stripMargin,

    "q60_bpe_learn" ->
      s"""WITH $bpeCtes
         |SELECT step, a AS left_sym, b AS right_sym, c AS pair_count FROM (
         |${(1 to BpeSteps).map(t => s"SELECT * FROM m$t").mkString(" UNION ALL ")})""".stripMargin,

    "q61_bpe_tokenize" -> {
      // apply the learned merges (nested literal replaces with scalar
      // subqueries from the m$t CTEs) to the token stream; surviving
      // symbols = delimiter count
      // coalesce guards: on a corpus that exhausts its merges early,
      // m$t is EMPTY and a bare scalar subquery would make replace()
      // return NULL, poisoning every symbol string — '  ' (two
      // spaces) never occurs in an encoding, so the fallback is a
      // provable no-op
      // the '   ' (triple-space) fallback is a provable no-op: wrapped
      // encodings hold at most two consecutive spaces
      val applied = (1 to BpeSteps).foldLeft("regexp_replace(word, '(.)', ' \\1 ', 'g')") {
        (e, t) =>
          s"replace($e, coalesce((SELECT ' ' || a || '  ' || b || ' ' FROM m$t), '   '), " +
            s"coalesce((SELECT ' ' || a || b || ' ' FROM m$t), ''))"
      }
      s"""WITH $bpeCtes,
         |tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
         |        FROM documents),
         |cnt AS (SELECT doc_id,
         |          sum((length(sym) - length(replace(sym, ' ', ''))) // 2)::BIGINT AS bpe
         |        FROM (SELECT doc_id, $applied AS sym FROM tok) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  len(list_filter(string_split(d.text, ' '), w -> w <> ''))::BIGINT AS ws_tokens,
         |  coalesce(c.bpe, 0)::BIGINT AS bpe_tokens
         |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id""".stripMargin
    },

    "q57_keyword_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
        |             FROM documents),
        |tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM tok
        |       WHERE word IN ('spark', 'window', 'hash') GROUP BY doc_id, word),
        |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
        |df AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY word),
        |scored AS (SELECT doc_id, sum(least(tf, 4) * length(bin(n_docs // df)))::BIGINT AS score
        |           FROM tf JOIN df USING (word), n GROUP BY doc_id)
        |SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "q58_bigram_lm" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words
        |              FROM documents),
        |pairs AS (SELECT doc_id, words[i + 1] AS prev, words[i + 2] AS cur
        |          FROM (SELECT doc_id, words, unnest(generate_series(0, len(words) - 2)) AS i
        |                FROM toks WHERE len(words) >= 2)),
        |b AS (SELECT prev, cur, count(*)::BIGINT AS c2 FROM pairs GROUP BY prev, cur),
        |u AS (SELECT word, count(*)::BIGINT AS c1
        |      FROM (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS word
        |            FROM documents) GROUP BY word),
        |bits AS (SELECT doc_id,
        |           CASE WHEN c2 >= 2 THEN length(bin(c2))
        |                ELSE greatest(length(bin(c1)) - 4, 1) END AS pb
        |         FROM pairs JOIN b USING (prev, cur) JOIN u ON u.word = pairs.cur),
        |scored AS (SELECT doc_id, count(*)::BIGINT AS n_pairs, sum(pb)::BIGINT AS sum_bits
        |           FROM bits GROUP BY doc_id),
        |c AS (SELECT sum(sum_bits)::DOUBLE / sum(n_pairs) AS corpus_mean FROM scored)
        |SELECT d.doc_id,
        |  coalesce(s.n_pairs, 0)::BIGINT AS n_pairs,
        |  coalesce(s.sum_bits, 0)::BIGINT AS sum_bits,
        |  coalesce(s.sum_bits::DOUBLE / s.n_pairs, 0.0) AS mean_bits,
        |  CASE WHEN coalesce(s.sum_bits::DOUBLE / s.n_pairs, 0.0) >= corpus_mean
        |       THEN 'head' ELSE 'tail' END AS band
        |FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id, c""".stripMargin
  )
}
