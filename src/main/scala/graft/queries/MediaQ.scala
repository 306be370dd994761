package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.sources.Tables

/** END-TO-END media dedup on the oracle surface (q64–q66) — the
  * image, audio, and video members of the near-dup family promoted
  * from ScalaTest-only to the driver's DuckDB correctness gate.
  *
  * Each pipeline is the real one: synthesize a deterministic payload
  * corpus with planted derived assets (REAL ImageIO JPEG encode, REAL
  * bilinear resize, REAL javax.sound WAV encode at two sample rates,
  * REAL MJPEG concatenation — the kernels the multimodal specs
  * pixel/RMS-assert), fingerprint with the production kernels
  * (AHash60 / AudioHash60 / per-frame aHash), then run the relational
  * tail — banding → hamming pairs → components → keep (or frame-match
  * counting for video). DuckDB cannot decode media, so the HANDOFF is
  * the fingerprint table: Spark writes it to a fixed path, BOTH
  * engines read it, and the oracle replays the tail in SQL (all-pairs
  * hamming is affordable at oracle scale; Spark's banded blocking is
  * provably identical for hamming ≤ 3 — 4×15-bit bands + exact
  * verify). Everything downstream of the handoff is hash-checked.
  *
  * Scale story (100 TB): the corpora are synthesized because the test
  * lake carries no real media tables, but every stage is the
  * production shape — payload scan and fingerprinting are 1:1
  * partition-wise, banding bounds candidates by bucket occupancy
  * (never all-pairs), CC is size-adaptive, keep is one broadcast-able
  * join; the video tail counts DISTINCT matched frames on the weaker
  * side, so a static clip cannot inflate its match count. Swap the
  * synth source for `spark.read.parquet(mediaTable)` and nothing else
  * changes. (Ref: felixzh-flink's dedup jobs stop at text; this
  * family is the training-data-lake extension SURVEY §2 mandates.)
  */
object MediaQ extends QueryPack {

  // memory-cached ImageIO streams (see Multimodal's initializer; set
  // here too so the synth side never races the operator object's load
  // on a fresh executor classloader)
  javax.imageio.ImageIO.setUseCache(false)

  /** Spark↔DuckDB handoff tables — keyed PER SESSION so concurrent
    * drivers on one host (bench + verify, parallel CI) can't clobber
    * each other's fingerprint tables mid-oracle-read. The key is the
    * applicationId (unique per JVM/SparkContext); two SparkSessions
    * SHARING one context can further isolate via the session-scoped
    * conf `spark.graft.media.handoffToken` (newSession() confs are
    * independent). The oracle SQL is a static string with no session
    * parameter, so [[oracles]] renders the SAME path from the
    * active/default session at dump time — Verify dumps oracle SQL in
    * the process that ran the queries, so the two always agree. */
  private[queries] def handoffDir(s: SparkSession, kind: String): String = {
    val tok = s.conf.get("spark.graft.media.handoffToken", s.sparkContext.applicationId)
    s"/tmp/graft_media_${kind}_${tok.replaceAll("[^A-Za-z0-9_.-]", "_")}.parquet"
  }
  private def activeDir(kind: String): String =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(handoffDir(_, kind))
      .getOrElse(s"/tmp/graft_media_$kind.parquet")

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
  private[graft] def sceneJpeg(seed: Long, w: Int, h: Int): Array[Byte] = {
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

  /** 1-second 16-bit mono WAV whose amplitude envelope (120 segments
    * = 2 per AudioHash60 slice) is deterministic in `seed` over a
    * constant 440 Hz carrier — the same envelope at ANY sample rate
    * yields the same audio hash (slices are proportional spans), so a
    * cross-rate re-encode of the same recording is a planted near-dup
    * exactly like a cross-resolution image re-render. */
  private[graft] def envelopeWav(seed: Long, rate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = rate
    val bytes = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val seg = i.toLong * 120 / n
      val amp = 0.15 + 0.85 * ((mix(seed * 131 + seg) & 1023L) / 1023.0)
      val s = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 30000).toInt.toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic image corpus: every 5th id (id % 5 == 4) is a
    * cross-resolution RE-ENCODE of scene id-4 (REAL bilinear resize
    * 64×48 → 96×72 through ImageIoResize, PNG re-encode — a true
    * derived asset, not a pixel copy); every 97th payload is garbage
    * bytes (the corrupt-media row every lake has — surfaces as
    * decoded = false and is routed out, never crashes the scan). */
  private[graft] def synthCorpus(s: SparkSession, n: Long)
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

  /** Audio corpus on the same schedule: every 5th clip is the SAME
    * recording (envelope seed id-4) re-encoded at 16 kHz instead of
    * 8 kHz; every 97th is garbage (undecodable, routed out). */
  private[queries] def synthAudioCorpus(s: SparkSession, n: Long)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    s.range(n).mapPartitions { it =>
      it.map { id =>
        if (id % 97 == 96)
          Multimodal.MediaRow(id, "bin", 0, 0, Array[Byte](0x42, 0x41, 0x44))
        else if (id % 5 == 4)
          Multimodal.MediaRow(id, "wav", 0, 0, envelopeWav(id - 4, 16000))
        else
          Multimodal.MediaRow(id, "wav", 0, 0, envelopeWav(id, 8000))
      }
    }
  }

  /** Video corpus: 3-frame MJPEG clips; every 5th is a RE-CUT of clip
    * id-4 — two frames shared (reordered) plus one new scene, the
    * shape [[Multimodal.videoNearDups]]' ≥ 2-distinct-frames rule
    * exists to catch; every 97th is garbage (zero frame hashes). */
  private[queries] def synthVideoCorpus(s: SparkSession, n: Long)
      : org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import s.implicits._
    s.range(n).mapPartitions { it =>
      it.map { id =>
        if (id % 97 == 96)
          Multimodal.MediaRow(id, "bin", 0, 0, Array[Byte](0x42, 0x41, 0x44))
        else if (id % 5 == 4) {
          val b = id - 4
          Multimodal.MediaRow(id, "mjpeg", 64, 48,
            sceneJpeg(b * 3 + 2, 64, 48) ++ sceneJpeg(b * 3 + 1, 64, 48) ++
              sceneJpeg(1000000L + id, 64, 48))
        } else
          Multimodal.MediaRow(id, "mjpeg", 64, 48,
            sceneJpeg(id * 3, 64, 48) ++ sceneJpeg(id * 3 + 1, 64, 48) ++
              sceneJpeg(id * 3 + 2, 64, 48))
      }
    }
  }

  /** The shared keep tail: banded pairs → size-adaptive components →
    * keep each cluster's min id — read from a just-written
    * fingerprint handoff table. */
  private def keepFromFp(s: SparkSession, fpDir: String): DataFrame = {
    import s.implicits._
    val fpR = s.read.parquet(fpDir)
    val pairs = Dedup.simhashPairs(fpR, maxDist = 3).select($"id_a", $"id_b")
    val cc = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", "id").withColumnRenamed("cluster_id", "cc")
    fpR.select($"id")
      .join(cc, Seq("id"), "left")
      .select($"id", coalesce($"cc", $"id").as("cluster_id"))
      .withColumn("keep", $"id" === $"cluster_id")
  }

  /** DuckDB twin of [[keepFromFp]] — all-pairs hamming at oracle
    * scale is provably the banded blocking's pair set (4×15-bit
    * bands complete for hamming ≤ 3; candidates exact-verified). */
  private def keepOracle(fpDir: String): String =
    s"""WITH RECURSIVE fp AS (
       |  SELECT id, simhash FROM read_parquet('$fpDir/*.parquet')),
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

  private def corpusSize(s: SparkSession, d: String): Long =
    math.max(300L, math.min(2000L, Tables.documentCount(s, d)))

  def defs: Map[String, Q] = Map(
    // hash → banded pairs → clusters → keep: the q52 terminal shape on
    // the image modality. Output (id, cluster_id, keep).
    "q64_media_dedup_keep" -> ((s, d) => {
      import s.implicits._
      // corpus sized with the sf (bounded: encode cost is per-row real
      // work; production reads payloads instead of synthesizing them)
      val n = corpusSize(s, d)
      // repartition(1), NEVER coalesce(1): coalesce collapses the
      // WHOLE upstream (synthesize + JPEG encode + decode + hash —
      // the per-row codec work that IS this query's cost) into one
      // task; repartition keeps the encode/hash stage at full
      // parallelism and only the KB-scale (id, simhash) rows cross
      // the one-partition exchange for the single-file handoff write
      // (guide §2.4 — measured 2.9 s → parallel encode at 32 cores).
      Multimodal.hashImages(synthCorpus(s, n))
        .filter($"decoded").select($"id", $"simhash")
        .repartition(1).write.mode("overwrite").parquet(handoffDir(s, "fp"))
      keepFromFp(s, handoffDir(s, "fp"))
    }),

    // the same terminal shape on the audio modality: envelope hashes,
    // cross-rate re-encodes as the planted near-dups.
    "q65_audio_dedup_keep" -> ((s, d) => {
      import s.implicits._
      val n = corpusSize(s, d)
      // repartition(1), not coalesce(1) — same reason as q64: keep
      // the WAV synth + decode + envelope-hash stage parallel.
      Multimodal.hashAudio(synthAudioCorpus(s, n))
        .filter($"decoded").select($"id", $"simhash")
        .repartition(1).write.mode("overwrite").parquet(handoffDir(s, "afp"))
      keepFromFp(s, handoffDir(s, "afp"))
    }),

    // video near-dup PAIRS (the videoNearDups semantics, frame-match
    // counting): per-frame aHashes packed as id·1024+idx, banded
    // pairs over ALL frame fingerprints, then per-video-pair DISTINCT
    // matched frames on the weaker side, ≥ 2. Output
    // (id_a, id_b, matching_frames).
    "q66_video_dedup_pairs" -> ((s, d) => {
      import s.implicits._
      val n = math.max(200L, math.min(600L, Tables.documentCount(s, d) / 2))
      synthVideoCorpus(s, n).mapPartitions { it =>
        it.flatMap { r =>
          Multimodal.frameHashes(r.payload, 8).iterator.zipWithIndex
            .map { case (h, i) => ((r.doc_id << 10) | i, h) }
        }
      }.toDF("id", "simhash")
        // repartition(1), not coalesce(1) — keep the MJPEG synth +
        // per-frame decode/hash stage parallel (q64's rationale).
        .repartition(1).write.mode("overwrite").parquet(handoffDir(s, "vfp"))
      val fpR = s.read.parquet(handoffDir(s, "vfp"))
      val raw = Dedup.simhashPairs(fpR, maxDist = 3)
        .select(shiftright($"id_a", 10).as("va"), $"id_a".bitwiseAND(lit(1023L)).as("fa"),
          shiftright($"id_b", 10).as("vb"), $"id_b".bitwiseAND(lit(1023L)).as("fb"))
        .filter($"va" =!= $"vb")
      val swap = $"va" > $"vb"
      raw.select(
          when(swap, $"vb").otherwise($"va").as("id_a"),
          when(swap, $"fb").otherwise($"fa").as("frame_a"),
          when(swap, $"va").otherwise($"vb").as("id_b"),
          when(swap, $"fa").otherwise($"fb").as("frame_b"))
        .groupBy($"id_a", $"id_b")
        .agg(countDistinct($"frame_a").as("ma"), countDistinct($"frame_b").as("mb"))
        .select($"id_a", $"id_b", least($"ma", $"mb").as("matching_frames"))
        .filter($"matching_frames" >= 2)
    })
  )

  def oracles: Map[String, String] = Map(
    "q64_media_dedup_keep" -> keepOracle(activeDir("fp")),
    "q65_audio_dedup_keep" -> keepOracle(activeDir("afp")),

    "q66_video_dedup_pairs" ->
      s"""WITH fp AS (
         |  SELECT id, simhash FROM read_parquet('${activeDir("vfp")}/*.parquet')),
         |p AS (
         |  SELECT a.id AS ia, b.id AS ib
         |  FROM fp a JOIN fp b ON a.id < b.id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |u AS (
         |  SELECT ia // 1024 AS va, ia % 1024 AS fa,
         |         ib // 1024 AS vb, ib % 1024 AS fb
         |  FROM p WHERE ia // 1024 <> ib // 1024),
         |norm AS (
         |  SELECT CASE WHEN va > vb THEN vb ELSE va END AS id_a,
         |         CASE WHEN va > vb THEN fb ELSE fa END AS frame_a,
         |         CASE WHEN va > vb THEN va ELSE vb END AS id_b,
         |         CASE WHEN va > vb THEN fa ELSE fb END AS frame_b
         |  FROM u)
         |SELECT id_a, id_b,
         |  least(count(DISTINCT frame_a), count(DISTINCT frame_b)) AS matching_frames
         |FROM norm GROUP BY id_a, id_b
         |HAVING least(count(DISTINCT frame_a), count(DISTINCT frame_b)) >= 2""".stripMargin
  )
}
