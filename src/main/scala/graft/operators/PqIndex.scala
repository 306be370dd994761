package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{VectorExpressions, VectorFunctions}

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the third member of the FAISS-style
  * compression ladder this engine ships (IVF cells → SQ8 codes → PQ
  * codes).
  *
  * The 64-dim quantized vector is split into `M` = 8 contiguous
  * 8-dim subspaces; each subspace gets its own `K` = 16-centroid
  * codebook, trained with the SAME deterministic Lloyd kernel as the
  * IVF coarse quantizer ([[IvfIndex.train]] with `prep = identity` —
  * the slices are taken from the ALREADY normalized-and-quantized
  * vector, so sub-codebooks see exact-integer components and every
  * training sum is order-independent). A vector's code is its 8
  * nearest-sub-centroid ids — 4 bits each, 32 bits total, a 16×
  * further cut over SQ8's 64 bytes: at 100 TB the candidate phase
  * reads 4-byte codes instead of 512-byte vectors.
  *
  * Query scoring is ADC (asymmetric distance computation): the query
  * keeps its exact sub-vectors; a candidate contributes
  * Σ_m (‖c_{m,code_m}‖² − 2·q_m·c_{m,code_m}) — the squared-distance
  * key, monotone in true distance for fixed q (the per-query ‖q‖²
  * term is constant and omitted). The sum is ordered m = 0..M−1 and
  * every dot uses the engine's sequential fold, so the DuckDB oracle
  * replays the shortlist bit-for-bit.
  *
  * Training samples ride the IVF sample (`sampleMod`): one thinned
  * Lloyd scan feeds both quantizers, and the oracle's `vqs` CTE is
  * shared.
  */
object PqIndex {

  val M = 8  // subspaces
  val K = 16 // centroids per subspace → 4-bit codes

  final case class PqModel(sub: Array[IvfIndex.Model], subDim: Int)

  /** Train the M sub-codebooks. Each is a [[IvfIndex.train]] run over
    * the m-th slice of the quantized vector (prep = identity: slices
    * must NOT be re-normalized — PQ decomposes the one global
    * normalization). Memoized per (dir-scoped memoKey, m). */
  def train(emb: DataFrame, iters: Int, memoKey: String, sampleMod: Long): PqModel = {
    val vq = IvfIndex.quantize(col("v"))
    val dim = 64
    val subDim = dim / M
    val sub = Array.tabulate(M) { m =>
      val sliced = emb.select(col("vec_id"), slice(vq, m * subDim + 1, subDim).as("v"))
      IvfIndex.train(sliced, K, iters, s"$memoKey#pq$m", sampleMod,
        prepped = "id" -> identity[Column] _)
    }
    PqModel(sub, subDim)
  }

  /** Per-subspace code columns for a row carrying quantized vector
    * `vqCol` — M codegen'd nearest-cell projections, no join. */
  def encode(vqCol: Column, pq: PqModel): Seq[Column] =
    (0 until M).map { m =>
      VectorExpressions.nearestCell(
        slice(vqCol, m * pq.subDim + 1, pq.subDim), pq.sub(m).cent, pq.sub(m).csq)
        .as(s"code$m")
    }

  /** Per-QUERY ADC lookup table — FAISS's precomputed LUT: an
    * array(M·K) column whose entry m·K + j is
    * ‖c_{m,j}‖² − 2·q_m·c_{m,j}. Evaluate this on the PROBES side
    * (one row per (query, probed cell)), never on candidates: the
    * table depends only on the query, and candidates outnumber
    * probes by orders of magnitude. Every term is the SAME
    * expression (same dot fold, same subtraction) the join-based
    * scoring computed per candidate, so the DuckDB oracle replay is
    * unchanged bit-for-bit. Codebook slots no training point ever
    * claimed (null centroid) get +∞ — no stored code references
    * them. */
  def adcLut(qvqCol: Column, pq: PqModel): Column =
    array((0 until M).flatMap { m =>
      (0 until K).map { j =>
        Option(pq.sub(m).cent(j)) match {
          case Some(c) =>
            lit(pq.sub(m).csq(j)) - lit(2.0) * VectorFunctions.dot(
              slice(qvqCol, m * pq.subDim + 1, pq.subDim), typedLit(c.toSeq))
          case None => lit(Double.PositiveInfinity)
        }
      }
    }: _*)

  /** ADC score for a candidate row carrying the query's `lut` column
    * (from [[adcLut]]) and code columns `code0..code{M-1}`: M array
    * lookups folded in fixed m-order (FP addition order is part of
    * the oracle contract) — no joins, no per-candidate dot products.
    * Lower = closer. */
  def adcApply(lutCol: Column): Column =
    (0 until M).map(m => element_at(lutCol, col(s"code$m") + lit(m * K + 1)))
      .reduceLeft(_ + _)

  /** DuckDB replay: per-subspace k-means CTE chains + code assignment.
    * Requires `vq(vec_id, vq)` and `vqs` (the training sample) from
    * [[IvfIndex.Sql.kmeansCtes]]; emits `pqc{m}(cell, c, csq)` (the
    * trained codebooks) and `codes(vec_id, code0..code{M-1})`. */
  object Sql {
    private def csq(c: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform($c, x -> x * x)), (a, b) -> a + b)"
    private def dot(a: String, b: String): String = VectorFunctions.Sql.dot(a, b)

    def pqCtes(iters: Int): String = {
      val subDim = 64 / M
      val b = new StringBuilder
      (0 until M).foreach { m =>
        val lo = m * subDim + 1
        val hi = m * subDim + subDim
        b ++= s""",
          |sv$m AS (SELECT vec_id, list_slice(vq, $lo, $hi) AS sv FROM vqs),
          |seeds$m AS (SELECT vec_id % $K AS cell, min(vec_id) AS sid FROM sv$m GROUP BY vec_id % $K),
          |p${m}cent0 AS (SELECT cell, q.sv AS c FROM seeds$m s JOIN sv$m q ON q.vec_id = s.sid)""".stripMargin
        (1 to iters).foreach { t =>
          val prev = s"p${m}cent${t - 1}"
          b ++= s""",
            |p${m}kc$t AS (SELECT cell, c, ${csq("c")} AS csq FROM $prev),
            |p${m}sc$t AS (SELECT vec_id, sv, cell, csq - 2 * ${dot("sv", "c")} AS key FROM sv$m, p${m}kc$t),
            |p${m}a$t AS (SELECT vec_id, sv, cell FROM (
            |         SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY key, cell) AS rn FROM p${m}sc$t)
            |        WHERE rn = 1),
            |p${m}sx$t AS (SELECT cell, unnest(range(0, $subDim)) AS k, sv FROM p${m}a$t),
            |p${m}sm$t AS (SELECT cell, k, sum(sv[k + 1]) AS s, count(*) AS n FROM p${m}sx$t GROUP BY cell, k),
            |p${m}cent$t AS (SELECT p.cell, coalesce(u.c, p.c) AS c FROM $prev p LEFT JOIN
            |           (SELECT cell, list(s / n ORDER BY k) AS c FROM p${m}sm$t GROUP BY cell) u USING (cell))""".stripMargin
        }
        b ++= s""",
          |pqc$m AS (SELECT cell, c AS c$m, ${csq("c")} AS csq$m FROM p${m}cent$iters),
          |codes$m AS (SELECT vec_id, cell AS code$m FROM (
          |         SELECT q.vec_id, k.cell,
          |           row_number() OVER (PARTITION BY q.vec_id
          |             ORDER BY k.csq$m - 2 * ${dot(s"list_slice(q.vq, $lo, $hi)", s"k.c$m")}, k.cell) AS rn
          |         FROM vq q, pqc$m k)
          |        WHERE rn = 1)""".stripMargin
      }
      val joined = (1 until M).foldLeft("codes0")((acc, m) => s"$acc JOIN codes$m USING (vec_id)")
      b ++= s""",
        |codes AS (SELECT vec_id, ${(0 until M).map(m => s"code$m").mkString(", ")}
        |          FROM $joined)""".stripMargin
      b.toString
    }

    /** ADC term sum for a row with `qvq` (query quantized vector) in
      * scope and joined `pqc{m}` columns `c{m}`, `csq{m}`. */
    def adcExpr(qvq: String): String = {
      val subDim = 64 / M
      (0 until M).map { m =>
        val lo = m * subDim + 1
        val hi = m * subDim + subDim
        s"(csq$m - 2 * ${dot(s"list_slice($qvq, $lo, $hi)", s"c$m")})"
      }.mkString("(", " + ", ")")
    }
  }
}
