package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables

/** End-to-end MEDIA dedup on the oracle surface (q64) — the image
  * member of the near-dup family promoted from ScalaTest-only to the
  * driver's DuckDB correctness gate.
  *
  * The pipeline is the real one: synthesize a deterministic JPEG
  * corpus with planted cross-resolution re-encodes (REAL ImageIO
  * encode, REAL bilinear resize — the kernels the multimodal specs
  * pixel-assert), aHash every payload (Multimodal.AHash60, shuffle-
  * free scan), then run banding → hamming pairs → connected
  * components → keep-one — all pure relational from the fingerprint
  * onward. DuckDB cannot decode JPEGs, so the HANDOFF is the
  * fingerprint table: Spark writes it to a fixed path, BOTH engines
  * read it, and the oracle replays banding/CC/keep in SQL (all-pairs
  * hamming is affordable at oracle scale; Spark's banded blocking is
  * provably identical for hamming ≤ 3 — 4×15-bit bands + exact
  * verify). Everything downstream of the handoff is hash-checked.
  *
  * Scale story (100 TB): the corpus here is synthesized because the
  * test lake carries no real image table, but every stage is the
  * production shape — payload scan is 1:1 partition-wise, banding
  * bounds candidates by bucket occupancy (never all-pairs), CC is
  * size-adaptive (driver union-find under 1M edges, distributed
  * doubling above), keep is one broadcast-able join. Swap the synth
  * source for `spark.read.parquet(imageTable)` and nothing else
  * changes. (Ref: the reference's dedup jobs stop at text —
  * felixzh-flink has no media path; this family is the training-
  * data-lake extension the survey §2 mandates.)
  */
object MediaQ extends QueryPack {

  /** The Spark↔DuckDB handoff table — a FIXED absolute path because
    * oracle SQL is a static string (no sf-dir parameter). Rewritten
    * (overwrite) on every q64 invocation before the path is read. */
  private[queries] val FpDir = "/tmp/graft_media_fp.parquet"

  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic smooth luminance scene for `seed`, rendered at
    * (w, h) and JPEG-encoded. The field is a sum of two low-frequency
    * sinusoid products over NORMALIZED coordinates, so the same scene
    * at any resolution has the same 8×8 cell statistics — the aHash
    * invariance a real re-encode pipeline relies on; low frequency
    * (≤ 4 cycles) keeps bilinear resize and JPEG quantization inside
    * the hamming tolerance. */
  private[queries] def sceneJpeg(seed: Long, w: Int, h: Int): Array[Byte] = {
    val m1 = mix(seed); val m2 = mix(m1); val m3 = mix(m2); val m4 = mix(m3)
    val m5 = mix(m4); val m6 = mix(m5); val m7 = mix(m6); val m8 = mix(m7)
    val f1 = 1 + (m1 & 3L); val f2 = 1 + (m2 & 3L)
    val f3 = 1 + (m3 & 3L); val f4 = 1 + (m4 & 3L)
    val p1 = (m5 & 1023L) / 1024.0; val p2 = (m6 & 1023L) / 1024.0
    val p3 = (m7 & 1023L) / 1024.0; val p4 = (m8 & 1023L) / 1024.0
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val tau = 2 * math.Pi
    var y = 0
    while (y < h) {
      val v = (y + 0.5) / h
      var x = 0
      while (x < w) {
        val u = (x + 0.5) / w
        val s = 0.55 * math.sin(tau * (f1 * u + p1)) * math.cos(tau * (f2 * v + p2)) +
          0.35 * math.cos(tau * (f3 * u + p3)) * math.sin(tau * (f4 * v + p4))
        val g = math.max(0, math.min(255, (127.5 * (1 + s)).toInt))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Deterministic image corpus: every 5th id (id % 5 == 4) is a
    * cross-resolution RE-ENCODE of scene id-4 (REAL bilinear resize
    * 64×48 → 96×72 through ImageIoResize, PNG re-encode — a true
    * derived asset, not a pixel copy); every 97th payload is garbage
    * bytes (the corrupt-media row every lake has — surfaces as
    * decoded = false and is routed out, never crashes the scan). */
  private[queries] def synthCorpus(s: org.apache.spark.sql.SparkSession, n: Long)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    s.range(n).mapPartitions { it =>
      it.map { id =>
        if (id % 97 == 96)
          Multimodal.MediaRow(id, "bin", 0, 0, Array[Byte](0x42, 0x41, 0x44))
        else if (id % 5 == 4) {
          val base = sceneJpeg(id - 4, 64, 48)
          Multimodal.MediaRow(id, "png", 96, 72,
            Multimodal.ImageIoResize.resize(base, 64, 48, 96, 72))
        } else
          Multimodal.MediaRow(id, "jpeg", 64, 48, sceneJpeg(id, 64, 48))
      }
    }
  }

  def defs: Map[String, Q] = Map(
    // hash → banded pairs → clusters → keep: the q52 terminal shape on
    // the image modality. Output (id, cluster_id, keep).
    "q64_media_dedup_keep" -> ((s, d) => {
      import s.implicits._
      // corpus sized with the sf (bounded: encode cost is per-row real
      // work; production reads payloads instead of synthesizing them)
      val n = math.max(300L, math.min(2000L, Tables.documentCount(s, d)))
      val fp = Multimodal.hashImages(synthCorpus(s, n))
        .filter($"decoded").select($"id", $"simhash")
      fp.coalesce(1).write.mode("overwrite").parquet(FpDir)
      // BOTH engines read the written table — the oracle replays the
      // relational tail from this exact handoff, so JPEG codec
      // differences can never drift the comparison
      val fpR = s.read.parquet(FpDir)
      val pairs = Dedup.simhashPairs(fpR, maxDist = 3).select($"id_a", $"id_b")
      val cc = Dedup.connectedComponents(pairs)
        .withColumnRenamed("doc_id", "id").withColumnRenamed("cluster_id", "cc")
      fpR.select($"id")
        .join(cc, Seq("id"), "left")
        .select($"id", coalesce($"cc", $"id").as("cluster_id"))
        .withColumn("keep", $"id" === $"cluster_id")
    })
  )

  def oracles: Map[String, String] = Map(
    // All-pairs hamming at oracle scale == Spark's banded blocking
    // (4×15-bit bands are complete for hamming ≤ 3, and simhashPairs
    // exact-verifies candidates) — so both engines derive identical
    // pair sets from the shared fingerprint table.
    "q64_media_dedup_keep" ->
      s"""WITH RECURSIVE fp AS (
         |  SELECT id, simhash FROM read_parquet('$FpDir/*.parquet')),
         |pairs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM fp a JOIN fp b ON a.id < b.id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |und AS (SELECT id_a AS a, id_b AS b FROM pairs
         |        UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |cc AS (SELECT a AS id, least(a, min(b)) AS cluster_id
         |       FROM reach GROUP BY a)
         |SELECT fp.id, coalesce(cc.cluster_id, fp.id) AS cluster_id,
         |  fp.id = coalesce(cc.cluster_id, fp.id) AS keep
         |FROM fp LEFT JOIN cc ON fp.id = cc.id""".stripMargin
  )
}
