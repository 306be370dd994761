package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InvertedIndex, Layout}

/** Inverted text index at rest: a conjunctive keyword lookup through
  * the postings table answers identically to the corpus scan while
  * reading ~the probed terms' posting lists (scan ∝ Σ df, not corpus
  * size) — measured from the scan node's own metrics, the LayoutSpec
  * method. Compaction on (term, doc_id) keeps the pruning. */
class InvertedIndexSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val nDocs = 50000L
  // ~20 words per doc over a 10k vocab, deterministically mixed; two
  // planted rare terms: 'needle' in every 1000th doc, 'thread' in
  // every 700th — their AND matches every 7000th-ish doc
  private def corpus = spark.range(nDocs).select(
    col("id").as("doc_id"),
    concat_ws(" ",
      expr("transform(sequence(0, 19), i -> concat('w', cast((id * 2654435761 + cast(i as bigint) * i * 19349663) % 10000 as string)))"),
      when(col("id") % 1000 === 0, lit("needle")).otherwise(lit("w1")),
      when(col("id") % 700 === 0, lit("thread")).otherwise(lit("w2")),
      when(col("id") % 2500 === 0, lit("sparse")).otherwise(lit("w3")))
      .as("text"))

  test("AND lookup == corpus scan; postings scan ~ posting lists, not corpus") {
    val dir = Files.createTempDirectory("graft_invidx").toString
    try {
      InvertedIndex.build(corpus, dir, files = 8, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val got = InvertedIndex.lookupAll(spark, dir, terms)
        .collect().map(_.getLong(0)).toSet
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val want = corpus
        .filter(terms.map(t => array_contains(toks, t)).reduce(_ && _))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want)
      assert(want.nonEmpty, "planted AND set is empty — corpus drifted")

      // pruning: the postings table holds ~nDocs*21 rows; the lookup
      // must materialize only the row groups covering the two probed
      // terms (sorted runs at 256 KiB granularity), far below the
      // total — and absolutely below any corpus-scan equivalent
      val totalPostings = spark.read.parquet(dir).count()
      val (_, scanned) = Layout.scanRows(
        spark.read.parquet(dir).filter(col("term").isin(terms: _*)))
      assert(scanned < totalPostings / 20,
        s"index failed to prune: scanned $scanned of $totalPostings postings")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("ANY lookup == corpus scan") {
    val dir = Files.createTempDirectory("graft_invidx_any").toString
    try {
      InvertedIndex.build(corpus, dir, files = 8, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val got = InvertedIndex.lookupAny(spark, dir, terms)
        .collect().map(_.getLong(0)).toSet
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val want = corpus
        .filter(terms.map(t => array_contains(toks, t)).reduce(_ || _))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want)
      // |ANY| > |AND| strictly here (both planted periods coprime-ish)
      assert(want.size > nDocs.toInt / 1000)
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("ranked search == driver-side BM25 reference; dense scan pruned by candidate pushdown") {
    val dir = Files.createTempDirectory("graft_invidx_rank").toString
    try {
      // fine row groups: the pruning granule must be small relative to
      // the dense term's posting run for candidate pushdown to bite
      InvertedIndex.buildRanked(corpus, dir, files = 8, blockBytes = 16 * 1024)
      // 'sparse' is rare (df 20), 'w2' is DENSE (every non-thread doc,
      // df ≈ 49.9k) — the asymmetry the rarest-first probe exists for;
      // their AND is the ~17 sparse docs that are not thread docs
      val terms = Seq("sparse", "w2")
      val got = InvertedIndex.searchRanked(spark, dir, terms, topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

      // driver-side reference: textbook BM25 with rational idf, same
      // constants, same summation order, over the collected corpus
      val docs = corpus.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("ts"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
      val n = docs.length.toDouble
      val avgdl = docs.map(_._2.length.toDouble).sum / docs.length
      val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
      val (k1, b) = (1.2, 0.75)
      val scored = docs.flatMap { case (id, ts) =>
        if (terms.forall(ts.contains)) {
          val dl = ts.length.toDouble
          val s = terms.map { t =>
            val tf = ts.count(_ == t).toDouble
            val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
            idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
          }.reduce(_ + _)
          Some((id, s))
        } else None
      }
      val want = scored.sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
      assert(got.toSeq === want.toSeq)
      assert(want.nonEmpty, "planted ranked set empty — corpus drifted")

      // the dense term's posting list is NOT read whole: the pushed
      // search materializes only the candidates' row groups; the
      // CONTROL below (pushdownCap = 0, the semi-join fallback) reads
      // the dense posting run end to end — same answer, more scan
      val search = InvertedIndex.searchRanked(spark, dir, terms, topK = 10)
      search.queryExecution.toRdd.count()
      val scanned = Layout.scanOutputRows(search.queryExecution.executedPlan)
      val control = InvertedIndex.searchRanked(spark, dir, terms, topK = 10,
        pushdownCap = 0)
      assert(control.collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
        .toSeq === got.toSeq, "fallback path disagrees with the pushed path")
      val controlScanned = Layout.scanOutputRows(control.queryExecution.executedPlan)
      assert(scanned.toDouble < controlScanned / 1.5,
        s"candidate pushdown did not reduce the dense scan: $scanned vs control $controlScanned")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("ranked search: absent term empties the result; ties break by doc_id") {
    val dir = Files.createTempDirectory("graft_invidx_rank2").toString
    try {
      InvertedIndex.buildRanked(corpus, dir, files = 4, blockBytes = 256 * 1024)
      assert(InvertedIndex.searchRanked(spark, dir, Seq("needle", "absentterm"))
        .count() === 0L)
      // single-term search over a planted constant-tf term: scores tie,
      // rnk follows doc_id
      val r = InvertedIndex.searchRanked(spark, dir, Seq("needle"), topK = 5)
        .collect().map(r => (r.getLong(0), r.getInt(2)))
      assert(r.map(_._1).toSeq === r.map(_._1).sorted.toSeq,
        s"tie-break not by doc_id: ${r.mkString(", ")}")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("phrase search == sliding-window corpus reference, occurrence counts exact; duplicate-term phrases verify") {
    val dir = Files.createTempDirectory("graft_invidx_phrase").toString
    try {
      InvertedIndex.buildRanked(corpus, dir, files = 8, blockBytes = 16 * 1024)
      // 'needle thread' is CONSECUTIVE exactly in docs planted with
      // both (id % 7000 == 0 — positions 20 and 21); the dense hash
      // region can never fabricate the planted words
      val phrase = Seq("needle", "thread")
      val got = InvertedIndex.searchPhrase(spark, dir, phrase, pushdownCap = 10000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val docs = corpus.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("ts"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
      val want = docs.flatMap { case (id, ts) =>
        val n = ts.sliding(phrase.size).count(_ == phrase.toList).toLong
        if (n > 0) Some(id -> n) else None
      }.toMap
      assert(got === want)
      assert(want.nonEmpty, "planted phrase set empty — corpus drifted")
      // co-occurrence WITHOUT adjacency must not match: 'needle' and
      // 'sparse' co-occur in every 5000th doc but sit two positions
      // apart — boolean AND finds them, the phrase must not
      val coNotAdj = Seq("needle", "sparse")
      assert(InvertedIndex.lookupAll(spark, dir, coNotAdj).count() > 0L)
      assert(InvertedIndex.searchPhrase(spark, dir, coNotAdj, 10000).count() === 0L,
        "phrase match degenerated to boolean AND")

      // duplicate-term phrase ('a b a'): the verify must test the SAME
      // positions array at two offsets
      val s2 = spark
      import s2.implicits._
      val mini = Seq((1L, "a b a b a"), (2L, "a b b a"), (3L, "b a b"))
        .toDF("doc_id", "text")
      val gotMini = InvertedIndex
        .searchPhrase(InvertedIndex.rankedPostings(mini), Seq("a", "b", "a"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gotMini === Map(1L -> 2L), s"duplicate-term phrase: $gotMini")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("log-idf mode: Lucene-style blending matches a driver ln-reference; deviation from rational mode is real") {
    val dir = Files.createTempDirectory("graft_invidx_logidf").toString
    try {
      InvertedIndex.buildRanked(corpus, dir, files = 4, blockBytes = 256 * 1024)
      val terms = Seq("sparse", "w2")
      val got = InvertedIndex.searchRanked(spark, dir, terms, topK = 10,
          logIdf = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      // driver reference: same arithmetic with idf = ln(1 + rational)
      // — the ln runs in the SAME JVM (driver), so equality is exact
      val docs = corpus.select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("ts"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList))
      val n = docs.length.toDouble
      val avgdl = docs.map(_._2.length.toDouble).sum / docs.length
      val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
      val (k1, b) = (1.2, 0.75)
      val scored = docs.flatMap { case (id, ts) =>
        if (terms.forall(ts.contains)) {
          val dl = ts.length.toDouble
          val s = terms.map { t =>
            val tf = ts.count(_ == t).toDouble
            val idf = math.log1p((n - dfm(t) + 0.5) / (dfm(t) + 0.5))
            idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
          }.reduce(_ + _)
          Some((id, s))
        } else None
      }
      val want = scored.sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }
      assert(got.toSeq === want.toSeq)
      assert(want.nonEmpty)
      // and the mode is not a no-op: rational scores differ
      val rational = InvertedIndex.searchRanked(spark, dir, terms, topK = 10)
        .collect().map(_.getDouble(1))
      assert(rational.toSeq !== got.map(_._2).toSeq,
        "logIdf = true produced rational-mode scores")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("compaction on (term, doc_id) keeps the pruning") {
    val dir = Files.createTempDirectory("graft_invidx_cmp").toString
    try {
      InvertedIndex.build(corpus, s"$dir/idx", files = 8, blockBytes = 256 * 1024)
      Layout.compactFiles(spark, s"$dir/idx", s"$dir/compact",
        Seq("term", "doc_id"), targetBytes = 4L << 20, blockBytes = 256 * 1024)
      val terms = Seq("needle", "thread")
      val before = InvertedIndex.lookupAll(spark, s"$dir/idx", terms)
        .collect().map(_.getLong(0)).toSet
      val after = InvertedIndex.lookupAll(spark, s"$dir/compact", terms)
        .collect().map(_.getLong(0)).toSet
      assert(after === before)
      val totalPostings = spark.read.parquet(s"$dir/compact").count()
      val (_, scanned) = Layout.scanRows(
        spark.read.parquet(s"$dir/compact").filter(col("term").isin(terms: _*)))
      assert(scanned < totalPostings / 20,
        s"compaction lost the clustering: scanned $scanned of $totalPostings")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("versioned lookups register their registry cache with CachePool: drain leaves no persisted blocks") {
    val dir = Files.createTempDirectory("graft_invidx_ver").toString
    try {
      val ev = corpus.limit(500)
        .select(col("doc_id"), lit(1L).as("ver"), lit("U").as("op"), col("text"))
      InvertedIndex.buildRankedVer(ev, dir, files = 4, blockBytes = 256 * 1024)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      // bare library calls, the leak scenario the r17 verdict flagged:
      // each lookup persists its resolved sentinel registry for the
      // lookup's own jobs and registers it in CachePool's global bag
      InvertedIndex.searchRankedVer(spark, dir, Seq("needle"), topK = 5,
        k1 = 1.2, b = 0.75, pushdownCap = 10000).collect()
      InvertedIndex.searchPhraseVer(spark, dir, Seq("w1", "w2"), pushdownCap = 10000).collect()
      graft.CachePool.drain()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty,
        s"versioned lookups leaked ${leaked.size} persisted RDD(s) past drain()")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
