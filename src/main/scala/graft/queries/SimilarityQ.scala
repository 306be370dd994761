package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Similarity search over embeddings (SURVEY §2 q29–q31, q38).
  *
  * q29: exact brute-force cosine top-k — correct baseline; the query
  * set is small and broadcast, so the corpus is scanned once with no
  * shuffle of the corpus side. At 100 TB this stays viable only for
  * broadcast-able query sets, which is why
  * q30 exists: random-hyperplane LSH buckets co-partition corpus and
  * queries (shuffle on bucket id), turning the cross product into a
  * per-bucket join. q31 composes top-k into a kNN classifier.
  * q38 is the second ANN scale path: IVF coarse quantization — every
  * corpus vector is assigned to its best of 2^b TRAINED centroids
  * (deterministic spherical k-means, [[graft.operators.IvfIndex]]; b
  * from the corpus count), queries probe their top-(b+3) cells, and
  * only the probed cells are re-ranked exactly. The corpus shuffles
  * ONCE on cell id (and in a real deployment is WRITTEN partitioned
  * by cell, making every later query a partition-pruned scan), versus
  * LSH's bands× duplication. Measured recall@5 = 0.82 at test SF
  * (was 0.56 with round-3's untrained random centroids).
  */
object SimilarityQ extends QueryPack {

  private def emb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // NOT fanned out (r17 measured): the embeddings table is rows ×
    // small-vector kernels — single-thread cost is tens of ms at any
    // test SF, so FanOut.widen only added exchange + per-stage task
    // overhead across 9 bench lines (+1.7 s net, reverted). At
    // production scale the scan plans many splits by itself.
    Tables.embeddings(s, d)
      .select($"vec_id", $"label", VectorFunctions.vec($"embedding").as("v"))
  }

  /** Multi-table random-hyperplane LSH: 16 tables × `bits` sign bits
    * from the native kernel ([[graft.functions.VecKernels.signBits]]).
    * OR-amplification across tables is what buys recall for
    * moderately-similar neighbors (at test SF: cos ≈ 0.33 ⇒
    * p_table ≈ 0.14 with 4 bits, but P[any of 16] ≈ 0.9); AND-bits
    * within a table bound bucket size. The bit width derives from the
    * corpus count (Adaptive.bits: ~32 vectors/bucket regardless of n,
    * so per-query candidates stay ~16·32 and total candidate growth is
    * LINEAR in n — STRESS.md proved fixed widths collapse at 200k+). */
  private def annBits(n: Long): Int =
    graft.operators.Adaptive.bits(n, targetBucket = 32, lo = 4, hi = 16)

  /** Fixed Lloyd rounds for the trained IVF (q38) — unrolled verbatim
    * in the oracle's CTE chain, so both engines run the same count. */
  private val ivfIters = 3

  /** q70's ADC shortlist depth: 4-bit product codes rank coarsely
    * (recall@5 0.46 at depth 20), so the exact re-rank reads a deeper
    * shortlist than SQ8's 20 — still just `pqShortlist` rows per
    * query, nothing at corpus scale. */
  private val pqShortlist = 64

  /** Train (or fetch the memoized) IVF model for `d` — the one-time
    * indexing cost of q38, exposed so Bench can time it under its own
    * `q38_train` line instead of charging it to whichever query
    * happens to train first. */
  def ivfModel(s: SparkSession, d: String): graft.operators.IvfIndex.Model = {
    val cellBits = graft.operators.Adaptive.bits(
      Tables.embeddingCount(s, d), targetBucket = 32, lo = 4, hi = 8)
    val cells = 1 << cellBits
    graft.operators.IvfIndex.train(
      emb(s, d), cells, iters = ivfIters, memoKey = s"$d#ivf",
      sampleMod = graft.operators.IvfIndex.sampleMod(Tables.embeddingCount(s, d), cells))
  }

  /** Train (or fetch the memoized) PQ sub-codebooks for `d` — rides
    * the SAME training sample as [[ivfModel]] (one thinned Lloyd scan
    * feeds both quantizers; the oracle shares the `vqs` CTE). */
  def pqModel(s: org.apache.spark.sql.SparkSession, d: String): graft.operators.PqIndex.PqModel = {
    val cellBits = graft.operators.Adaptive.bits(
      Tables.embeddingCount(s, d), targetBucket = 32, lo = 4, hi = 8)
    graft.operators.PqIndex.train(
      emb(s, d), iters = ivfIters, memoKey = s"$d#ivf",
      sampleMod = graft.operators.IvfIndex.sampleMod(Tables.embeddingCount(s, d), 1 << cellBits))
  }

  /** SemDeDup's corpus: the embeddings table plus the shared planted
    * exact-copy schedule ([[Aug.embCopies]] — the same deterministic
    * augmentation q28 uses, ONE definition), so the corpus being
    * deduplicated provably CONTAINS semantic duplicates (the
    * synthetic table has none). */
  private def augEmb(s: SparkSession, d: String): DataFrame =
    Aug.embCopies(emb(s, d))

  /** q53's cell-count exponent cap: 16 (65536 cells), NOT q38's 8.
    * q38 probes (b+3)/2^b of the cells per query, so more cells trade
    * against probe fan-out; SemDeDup has no probe step — each cell
    * pays its occupancy SQUARED in the pair join, so cells must keep
    * growing with n (~32/cell) or the quadratic term returns. 2^16
    * centroids × 64 dims is a 32 MB matrix — still broadcastable —
    * and holds ~32/cell occupancy to n ≈ 2^16·32 ≈ 2M vectors.
    * BEYOND the cap (a 100 TB corpus is 10^9+ embeddings; the k-means
    * argmin is O(cells)/row, so the matrix cannot keep tracking n)
    * the pair join key gains a second level: [[semdedupSubBits]]
    * sign-LSH bits split each over-full cell into 2^b2 sub-buckets,
    * restoring ~32 expected occupancy. Exact copies always share a
    * sub-bucket (identical vectors ⇒ identical sign bits); tau-near
    * pairs cross sub-boundaries with the standard per-bit LSH miss
    * rate (p_bit ≈ 0.87 at tau = 0.92) — the documented recall trade
    * that keeps total pair work LINEAR in n at every scale. */
  private val semdedupHiBits = 16

  /** Second-level sub-bucket width for q53: how many cell-exponent
    * bits the ideal ~32/cell derivation needs BEYOND the centroid
    * cap. 0 (no split, exact SemDeDup semantics) until n exceeds
    * 2^semdedupHiBits·32; each +1 beyond doubles the sub-buckets.
    * Pure integer arithmetic — the oracle replays it in SQL. */
  def semdedupSubBits(n: Long): Int = {
    val ideal = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 32L))
    math.max(0, ideal - semdedupHiBits)
  }

  /** The sub-bucket key: the first `b2` hyperplane sign bits of `v`
    * folded to an int (the q28 band-key fold, one table). b2 = 0 →
    * constant 0 (every cell is one bucket). Exposed for tests. */
  def semdedupSubKey(v: org.apache.spark.sql.Column, b2: Int): org.apache.spark.sql.Column =
    if (b2 == 0) lit(0)
    else aggregate(
      graft.functions.VectorExpressions.hyperplaneBits(v, b2),
      lit(0), (acc, x) => acc * 2 + x)

  /** Train (or fetch the memoized) SemDeDup cell model — k-means over
    * the augmented corpus itself (SemDeDup clusters the corpus it
    * deduplicates). Cell count / sample stride derive from the BASE
    * table count per the Adaptive convention (both engines read it
    * from parquet metadata identically); memoized apart from q38's
    * model, and timed under Bench's `q53_train` setup line. */
  def semdedupModel(s: SparkSession, d: String): graft.operators.IvfIndex.Model = {
    val n = Tables.embeddingCount(s, d)
    val cells = 1 << graft.operators.Adaptive.bits(n, targetBucket = 32, lo = 4, hi = semdedupHiBits)
    graft.operators.IvfIndex.train(
      augEmb(s, d), cells, iters = ivfIters, memoKey = s"$d#semdedup",
      sampleMod = graft.operators.IvfIndex.sampleMod(n, cells))
  }

  /** Cosine threshold above which two same-cell vectors are semantic
    * duplicates (exact copies score 1.0; the synthetic corpus's
    * organic neighbors sit far below). */
  private val semdedupTau = 0.92

  private def withTables(df: DataFrame, bits: Int): DataFrame =
    df.withColumn("bits", graft.functions.VectorExpressions.hyperplaneBits(col("v"), 16 * bits))
      .select(df.columns.map(col) :+
        posexplode(expr(
          s"""transform(sequence(0, 15), t ->
            |  aggregate(sequence(0, ${bits - 1}), 0, (acc, r) -> acc * 2 + element_at(bits, t * $bits + r + 1)))""".stripMargin))
          .as(Seq("tbl", "bkey")): _*)

  def defs: Map[String, Q] = Map(
    "q29_ann_brute_topk" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d)
      val q = broadcast(e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")))
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      q.join(e.select($"vec_id".as("neighbor_id"), $"v"), $"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
    }),

    "q30_ann_lsh_topk" -> ((s, d) => {
      import s.implicits._
      val banded = withTables(emb(s, d), annBits(Tables.embeddingCount(s, d)))
      val q = banded.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"tbl", $"bkey")
      // candidate ids via any-table bucket match; vectors attached after
      // the distinct, so arrays never ride the candidate shuffle
      val cand = q
        .join(banded.select($"vec_id".as("neighbor_id"), $"tbl", $"bkey"), Seq("tbl", "bkey"))
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id")
        .distinct()
      val e = emb(s, d)
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      cand
        .join(e.select($"vec_id".as("query_id"), $"v".as("qv")), "query_id")
        .join(e.select($"vec_id".as("neighbor_id"), $"v"), "neighbor_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }),

    // IVF coarse-quantized ANN with TRAINED centroids: deterministic
    // spherical k-means over normalized/quantized vectors (IvfIndex.
    // train — seeded by residue class, fixed Lloyd rounds, exact
    // integer means the DuckDB oracle replays CTE-for-CTE). Assignment
    // and probing are codegen'd kernels against the driver-held
    // centroid matrix — the corpus never joins or windows for its
    // cell; its ONE shuffle is the candidate join on cell id.
    "q38_ann_ivf_topk" -> ((s, d) => {
      import s.implicits._
      // nprobe = cell-count exponent + 3: 7-of-16 cells at test SF,
      // 11-of-256 at 1M vectors — the probed fraction FALLS as n grows
      // ((b+3)/2^b) while recall holds via more, finer cells.
      val cellBits = graft.operators.Adaptive.bits(
        Tables.embeddingCount(s, d), targetBucket = 32, lo = 4, hi = 8)
      val e = emb(s, d)
      val model = ivfModel(s, d)
      val assign = graft.operators.IvfIndex.assignCells(e, model)
        .select($"vec_id".as("neighbor_id"), $"cell")
      val probes = graft.operators.IvfIndex.probeCells(
        e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")),
        $"qv", model, nprobe = cellBits + 3)
        .select($"query_id", $"cell")
      val cand = probes.join(assign, "cell")
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id")
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      cand
        .join(e.select($"vec_id".as("query_id"), $"v".as("qv")), "query_id")
        .join(e.select($"vec_id".as("neighbor_id"), $"v"), "neighbor_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }),

    // IVF + SQ8 (the FAISS "IVF,SQ8" layout): the candidate phase
    // runs on int8 scalar-quantized codes — ONE BYTE per dimension,
    // 8× less I/O than the float64 vectors — and only the
    // per-query shortlist (4k rows) pays an exact-cosine re-rank
    // against the full vectors. At 100 TB this is the difference
    // between scanning 5 TB of probed vectors and 0.6 TB of codes;
    // the approx arithmetic is exact-integer (floor-quantized codes,
    // integer dot) + IEEE sqrt/divide, so the DuckDB oracle replays
    // the shortlist bit-for-bit. Same IVF pruning as q38 (shared
    // trained model, memoized — no second training cost).
    "q59_ann_sq8_topk" -> ((s, d) => {
      import s.implicits._
      val cellBits = graft.operators.Adaptive.bits(
        Tables.embeddingCount(s, d), targetBucket = 32, lo = 4, hi = 8)
      val e = emb(s, d)
      val model = ivfModel(s, d)
      val VE = graft.functions.VectorExpressions
      // corpus side: cell + code from ONE assignment scan — the full
      // vector never rides the candidate join
      val assign = graft.operators.IvfIndex.assignCells(e, model)
        .select($"vec_id".as("neighbor_id"), $"cell", VE.sq8Encode($"v").as("code"))
      val probes = graft.operators.IvfIndex.probeCells(
        e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")),
        $"qv", model, nprobe = cellBits + 3)
        .select($"query_id", $"cell", VE.sq8Encode($"qv").as("qcode"))
      val wa = Window.partitionBy($"query_id").orderBy($"approx_cos".desc, $"neighbor_id".asc)
      val shortlist = probes.join(assign, "cell")
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id",
          // nanvl: an all-zero embedding's code is all-zero, so the
          // norm product is 0 and 0/0 = NaN — which a descending sort
          // ranks ABOVE every real value, crowding out the shortlist.
          // -2.0 sinks it below any true cosine (IvfIndex.topKSq8's
          // guard; the oracle mirrors with isnan())
          nanvl(VE.sq8Dot($"qcode", $"code").cast("double") /
            (sqrt(VE.sq8Dot($"qcode", $"qcode").cast("double")) *
              sqrt(VE.sq8Dot($"code", $"code").cast("double"))),
            lit(-2.0)).as("approx_cos"))
        .withColumn("arnk", row_number().over(wa))
        .filter($"arnk" <= 20)
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      shortlist.select($"query_id", $"neighbor_id")
        .join(e.select($"vec_id".as("query_id"), $"v".as("qv")), "query_id")
        .join(e.select($"vec_id".as("neighbor_id"), $"v"), "neighbor_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }),

    // IVF + PQ (Jégou et al. 2011): the candidate phase scores
    // 4-bit-per-subspace product codes via ADC — 4 BYTES per vector
    // against SQ8's 64, a further 16× candidate-I/O cut at 100 TB —
    // then the same exact-cosine re-rank of the per-query shortlist.
    // Sub-codebooks train with the shared IVF Lloyd kernel on the
    // shared training sample; the score fold is m-ordered so the
    // oracle replays the shortlist bit-for-bit.
    "q70_ann_pq_topk" -> ((s, d) => {
      import s.implicits._
      val cellBits = graft.operators.Adaptive.bits(
        Tables.embeddingCount(s, d), targetBucket = 32, lo = 4, hi = 8)
      val e = emb(s, d)
      val model = ivfModel(s, d)
      val pq = pqModel(s, d)
      val PQ = graft.operators.PqIndex
      val IVF = graft.operators.IvfIndex
      val assign = IVF.assignCells(e, model)
        .select(Seq($"vec_id".as("neighbor_id"), $"cell") ++
          PQ.encode(IVF.quantize($"v"), pq): _*)
      val probes = IVF.probeCells(
        e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")),
        $"qv", model, nprobe = cellBits + 3)
        .select($"query_id", $"cell", IVF.quantize($"qv").as("qvq"))
        // FAISS-style per-query distance table built on the probe
        // rows (queries × nprobe) — candidates then pay M array
        // lookups instead of M broadcast joins + dot products
        .withColumn("lut", PQ.adcLut($"qvq", pq))
      val cand = probes.join(assign, "cell")
        .filter($"neighbor_id" =!= $"query_id")
      val wa = Window.partitionBy($"query_id").orderBy($"approx_dist".asc, $"neighbor_id".asc)
      val shortlist = cand
        .withColumn("approx_dist", PQ.adcApply($"lut"))
        .withColumn("arnk", row_number().over(wa))
        .filter($"arnk" <= pqShortlist)
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      shortlist.select($"query_id", $"neighbor_id")
        .join(e.select($"vec_id".as("query_id"), $"v".as("qv")), "query_id")
        .join(e.select($"vec_id".as("neighbor_id"), $"v"), "neighbor_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // deduplication = k-means-cluster the corpus embeddings, then
    // within each cluster drop every vector that has a sufficiently
    // cosine-similar neighbor, keeping one representative. The greedy
    // deterministic keep rule: v is dropped iff some u < v (by vec_id)
    // in the SAME cell has cos(u,v) >= tau; dup_of = the smallest such
    // u. Scale shape: the (cell, sub) key bounds the quadratic pair
    // step — the corpus shuffles ONCE on it (Adaptive keeps ~32
    // vectors/cell to n ≈ 2M; past the 2^16 centroid cap the sign-LSH
    // sub-key splits over-full cells back to ~32 expected occupancy,
    // see semdedupHiBits — so total pair work is LINEAR in n at every
    // scale), exactly the SemDeDup paper's design;
    // training is the one-time q53_train cost (trained-k-means reuse
    // of IvfIndex, oracle-replayed CTE-for-CTE).
    "q53_semdedup" -> ((s, d) => {
      import s.implicits._
      val model = semdedupModel(s, d)
      val b2 = semdedupSubBits(Tables.embeddingCount(s, d))
      val assign = graft.CachePool.cache(
        graft.operators.IvfIndex.assignCells(augEmb(s, d), model)
          .select($"vec_id", $"cell", semdedupSubKey($"v", b2).as("sub"), $"v"))
      val dups = assign.as("a")
        .join(assign.as("b"),
          $"a.cell" === $"b.cell" && $"a.sub" === $"b.sub" && $"a.vec_id" < $"b.vec_id" &&
            VectorFunctions.cosine($"a.v", $"b.v") >= semdedupTau)
        .groupBy($"b.vec_id".as("vec_id"))
        .agg(min($"a.vec_id").as("dup_of"))
      assign.select($"vec_id", $"cell")
        .join(dups, Seq("vec_id"), "left")
        .select($"vec_id", $"cell", $"dup_of".isNull.as("keep"), $"dup_of")
    }),

    "q31_knn_classify" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d)
      val q = broadcast(e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"label".as("true_label"), $"v".as("qv")))
      val wTop = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      val top5 = q
        .join(e.select($"vec_id".as("neighbor_id"), $"label", $"v"), $"neighbor_id" =!= $"query_id")
        .select($"query_id", $"true_label", $"neighbor_id", $"label",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(wTop))
        .filter($"rnk" <= 5)
      val wMaj = Window.partitionBy($"query_id").orderBy($"votes".desc, $"label".asc)
      top5.groupBy($"query_id", $"true_label", $"label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("r", row_number().over(wMaj))
        .filter($"r" === 1)
        .select($"query_id", $"true_label", $"label".as("pred_label"))
    })
  )

  private val embSql =
    "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)"

  private def cosSql = VectorFunctions.Sql.cosine("q.qv", "n.v")

  /** Cell-count + training-stride derivation shared by the q38 and
    * q53 oracles — the ONE replay of Adaptive.bits + IvfIndex.
    * sampleMod, so the Spark/oracle parameter derivations can't
    * drift between the two queries. `hi` is the cell-exponent cap
    * (q38: 8, bounded by probe fan-out; q53: semdedupHiBits, the
    * pair join needs cells to keep growing with n). */
  private def pcSql(hi: Int) =
    s"""pc AS (SELECT nb, cells,
       |         -- IvfIndex.sampleMod replay: ~n/(cells*256), forced ODD
       |         -- (coprime with the power-of-two cell count)
       |         greatest(1, nemb // (cells * 256)) + (1 - greatest(1, nemb // (cells * 256)) % 2) AS m
       |       FROM (SELECT nb, (1 << nb) AS cells, (SELECT count(*) FROM embeddings) AS nemb
       |             FROM (SELECT ${graft.operators.Adaptive.bitsSql("count(*)", 32, 4, hi)} AS nb FROM embeddings)))""".stripMargin

  /** q53's augmented corpus — the shared [[Aug]] copy schedule. */
  private val augEmbSql =
    s"""e AS (${Aug.embCopiesSql("label, embedding::DOUBLE[] AS v")})""".stripMargin

  /** Sign bits of the first `planesSql` hyperplane projections —
    * identical mix/fold as VecKernels.signBits. */
  private def bitsSql(planesSql: String) =
    s"""list_transform(range(0, $planesSql), j ->
      |  CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, 64), k ->
      |         v[k + 1] * ((${VectorFunctions.Sql.mix("j * 64 + k")})::DOUBLE / 1000.0))),
      |         (a, x) -> a + x) >= 0 THEN 1 ELSE 0 END)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q29_ann_brute_topk" ->
      s"""WITH $embSql,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.query_id, n.vec_id AS neighbor_id, $cosSql AS cos_sim
         |      FROM q JOIN e n ON n.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 10""".stripMargin,

    "q30_ann_lsh_topk" ->
      s"""WITH $embSql,
         |pe AS (SELECT ${graft.operators.Adaptive.bitsSql("count(*)", 32, 4, 16)} AS nb FROM embeddings),
         |bv AS (SELECT vec_id, v, nb, ${bitsSql("16 * nb")} AS bits FROM e, pe),
         |banded AS (
         |  SELECT vec_id, t AS tbl,
         |    list_reduce(list_prepend(0, list_transform(range(0, nb),
         |                  r -> bits[t * nb + r + 1])),
         |                (acc, x) -> acc * 2 + x) AS bkey
         |  FROM bv, generate_series(0, 15) g(t)),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
         |  FROM banded a JOIN banded b ON a.tbl = b.tbl AND a.bkey = b.bkey
         |  WHERE a.vec_id % 50 = 0 AND b.vec_id <> a.vec_id),
         |s AS (SELECT c.query_id, c.neighbor_id, ${VectorFunctions.Sql.cosine("q.v", "n.v")} AS cos_sim
         |      FROM cand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "q38_ann_ivf_topk" ->
      s"""WITH $embSql,
         |${pcSql(8)},
         |${graft.operators.IvfIndex.Sql.kmeansCtes(ivfIters, "pc.m")},
         |assign AS (SELECT vec_id AS neighbor_id, cell FROM rf WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, cell FROM rf
         |           WHERE vec_id % 50 = 0 AND crnk <= (SELECT nb + 3 FROM pc)),
         |cand AS (SELECT p.query_id, a.neighbor_id FROM probes p JOIN assign a USING (cell)
         |         WHERE a.neighbor_id <> p.query_id),
         |s AS (SELECT c.query_id, c.neighbor_id, ${VectorFunctions.Sql.cosine("q.v", "n.v")} AS cos_sim
         |      FROM cand c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "q59_ann_sq8_topk" ->
      s"""WITH $embSql,
         |${pcSql(8)},
         |${graft.operators.IvfIndex.Sql.kmeansCtes(ivfIters, "pc.m")},
         |-- Sq8Kernels.encode replay: nv's safe norm, floor-quantize
         |-- to [-127, 127]; codes are exact small integers as doubles
         |codes AS (SELECT vec_id,
         |            list_transform(v, x -> floor(x / nrm * 127.0 + 0.5)) AS code
         |          FROM nv),
         |assign AS (SELECT vec_id AS neighbor_id, cell FROM rf WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, cell FROM rf
         |           WHERE vec_id % 50 = 0 AND crnk <= (SELECT nb + 3 FROM pc)),
         |-- nanvl twin of the Spark side: 0/0 from an all-zero code
         |-- must sink below every real cosine, not float to the top
         |ap0 AS (SELECT p.query_id, a.neighbor_id,
         |         ${VectorFunctions.Sql.dot("qc.code", "nc.code")} /
         |           (sqrt(${VectorFunctions.Sql.dot("qc.code", "qc.code")}) *
         |            sqrt(${VectorFunctions.Sql.dot("nc.code", "nc.code")})) AS ac0
         |       FROM probes p JOIN assign a USING (cell)
         |       JOIN codes qc ON qc.vec_id = p.query_id
         |       JOIN codes nc ON nc.vec_id = a.neighbor_id
         |       WHERE a.neighbor_id <> p.query_id),
         |ap AS (SELECT query_id, neighbor_id,
         |         CASE WHEN isnan(ac0) THEN -2.0 ELSE ac0 END AS approx_cos FROM ap0),
         |short AS (SELECT query_id, neighbor_id FROM (
         |            SELECT *, row_number() OVER (PARTITION BY query_id
         |              ORDER BY approx_cos DESC, neighbor_id) AS arnk FROM ap)
         |          WHERE arnk <= 20),
         |s AS (SELECT c.query_id, c.neighbor_id, ${VectorFunctions.Sql.cosine("q.v", "n.v")} AS cos_sim
         |      FROM short c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "q70_ann_pq_topk" ->
      s"""WITH $embSql,
         |${pcSql(8)},
         |${graft.operators.IvfIndex.Sql.kmeansCtes(ivfIters, "pc.m")}
         |${graft.operators.PqIndex.Sql.pqCtes(ivfIters)},
         |assign AS (SELECT vec_id AS neighbor_id, cell FROM rf WHERE crnk = 1),
         |probes AS (SELECT vec_id AS query_id, cell FROM rf
         |           WHERE vec_id % 50 = 0 AND crnk <= (SELECT nb + 3 FROM pc)),
         |cand AS (SELECT p.query_id, a.neighbor_id FROM probes p JOIN assign a USING (cell)
         |         WHERE a.neighbor_id <> p.query_id),
         |ad AS (SELECT c.query_id, c.neighbor_id,
         |         ${graft.operators.PqIndex.Sql.adcExpr("qq.vq")} AS approx_dist
         |       FROM cand c
         |       JOIN vq qq ON qq.vec_id = c.query_id
         |       JOIN codes cd ON cd.vec_id = c.neighbor_id
         |       ${(0 until graft.operators.PqIndex.M).map(m => s"JOIN pqc$m ON pqc$m.cell = cd.code$m").mkString(" ")}),
         |short AS (SELECT query_id, neighbor_id FROM (
         |            SELECT *, row_number() OVER (PARTITION BY query_id
         |              ORDER BY approx_dist, neighbor_id) AS arnk FROM ad)
         |          WHERE arnk <= $pqShortlist),
         |s AS (SELECT c.query_id, c.neighbor_id, ${VectorFunctions.Sql.cosine("q.v", "n.v")} AS cos_sim
         |      FROM short c JOIN e q ON q.vec_id = c.query_id JOIN e n ON n.vec_id = c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "q53_semdedup" ->
      s"""WITH $augEmbSql,
         |${pcSql(semdedupHiBits)},
         |${graft.operators.IvfIndex.Sql.kmeansCtes(ivfIters, "pc.m")},
         |-- semdedupSubBits replay: sub-bucket width = ideal ~32/cell
         |-- exponent beyond the 2^$semdedupHiBits centroid cap (0 at
         |-- any n below 2^$semdedupHiBits*32; list_reduce over the
         |-- empty bit list then folds to the constant 0)
         |sb AS (SELECT greatest(0, length(bin(greatest(1,
         |         (SELECT count(*) FROM embeddings) // 32))) - $semdedupHiBits) AS b2),
         |assign AS (SELECT vec_id, cell FROM rf WHERE crnk = 1),
         |av AS (SELECT a.vec_id, a.cell,
         |         list_reduce(list_prepend(0, ${bitsSql("b2")}), (acc, x) -> acc * 2 + x) AS sub,
         |         e.v
         |       FROM assign a JOIN e USING (vec_id), sb),
         |dups AS (SELECT b.vec_id AS vec_id, min(a.vec_id) AS dup_of
         |         FROM av a JOIN av b ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
         |         WHERE ${VectorFunctions.Sql.cosine("a.v", "b.v")} >= $semdedupTau
         |         GROUP BY b.vec_id)
         |SELECT av.vec_id, av.cell, dup_of IS NULL AS keep, dup_of
         |FROM av LEFT JOIN dups USING (vec_id)""".stripMargin,

    "q31_knn_classify" ->
      s"""WITH $embSql,
         |q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.query_id, q.true_label, n.vec_id AS neighbor_id, n.label, $cosSql AS cos_sim
         |      FROM q JOIN e n ON n.vec_id <> q.query_id),
         |top5 AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |    FROM s) WHERE rnk <= 5),
         |votes AS (SELECT query_id, true_label, label, count(*) AS nv
         |          FROM top5 GROUP BY query_id, true_label, label)
         |SELECT query_id, true_label, label AS pred_label FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY nv DESC, label) AS r FROM votes)
         |WHERE r = 1""".stripMargin
  )
}
