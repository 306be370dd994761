package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal payload operators (decode / resize / frame-sample):
  * raster image decode/resize run a REAL codec (JDK javax.imageio,
  * asserted on pixels of generated PNGs below); frame-sampling and
  * the byte-stats kernel remain env-forced stubs. Schema,
  * cardinality, metadata rewrite, determinism, and the shuffle-free
  * partition-wise execution are asserted throughout. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  /** A real PNG: solid-color w×h image encoded through ImageIO. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def media(n: Int) = {
    import spark.implicits._
    spark.range(n).map { i =>
      MediaRow(i, "img", 64, 48, Array.tabulate(256)(j => ((i * 31 + j * 7) % 251).toByte))
    }
  }

  test("resize: 1:1, metadata rewritten, payload scaled by pixel ratio, deterministic, no shuffle") {
    val rows = media(20)
    val out = Multimodal.resize(rows, dstW = 32, dstH = 24)
    val got = out.collect()
    assert(got.length == 20)
    assert(got.forall(r => r.width == 32 && r.height == 24))
    // pixel count fell 4x -> payload length 256/4 = 64
    assert(got.forall(_.payload.length == 64))
    // deterministic: same input, same bytes
    val again = Multimodal.resize(rows, 32, 24).collect()
    assert(got.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => java.util.Arrays.equals(a.payload, b.payload) })
    // partition-wise: no Exchange in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frameSample: 1:N fan-out inside the partition, frame indices dense, no shuffle") {
    val rows = media(10)
    val out = Multimodal.frameSample(rows, n = 4)
    val got = out.collect()
    assert(got.length == 40)
    val byDoc = got.groupBy(_.doc_id)
    assert(byDoc.values.forall(_.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3)))
    // frames partition the payload bytes: total length preserved
    assert(byDoc.values.forall(_.map(_.payload.length).sum == 256))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("frameSample: payloads shorter than n yield one frame per byte, never empty frames") {
    import spark.implicits._
    val tiny = spark.createDataset(Seq(MediaRow(1, "img", 1, 1, Array[Byte](5, 6))))
    val got = Multimodal.frameSample(tiny, n = 8).collect()
    assert(got.length == 2)
    assert(got.forall(_.payload.nonEmpty))
  }

  test("ImageIO decode: real PNGs yield pixel-derived dims/channels/luma; corrupt bytes surface, never kill the job") {
    import spark.implicits._
    // known colors: BT.601 luma of pure red = .299*255 = 76.245,
    // green = 149.685, blue = 29.07, white = 255, black = 0
    val rows = spark.createDataset(Seq(
      MediaRow(1, "png", 8, 6, png(8, 6, 0xff0000)),
      MediaRow(2, "png", 5, 5, png(5, 5, 0x00ff00)),
      MediaRow(3, "png", 4, 7, png(4, 7, 0x0000ff)),
      MediaRow(4, "png", 3, 3, png(3, 3, 0xffffff)),
      // metadata LIES (says 9x9, pixels are 2x2): decode must report
      // pixel truth and flag the mismatch
      MediaRow(5, "png", 9, 9, png(2, 2, 0x000000)),
      // not an image at all
      MediaRow(6, "png", 8, 8, Array[Byte](1, 2, 3, 4, 5))))
    val out = Multimodal.decodeImages(rows)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = out.collect().map(f => f.doc_id -> f).toMap
    assert(got.size == 6, "every row must survive decode")
    val red = got(1L)
    assert(red.decoded && red.px_width == 8 && red.px_height == 6 && red.meta_matches)
    assert(math.abs(red.mean_luma - 0.299 * 255) < 1e-9)
    assert(math.abs(got(2L).mean_luma - 0.587 * 255) < 1e-9)
    assert(math.abs(got(3L).mean_luma - 0.114 * 255) < 1e-9)
    assert(got(4L).mean_luma == 255.0 && got(4L).channels == 3)
    val liar = got(5L)
    assert(liar.decoded && liar.px_width == 2 && liar.px_height == 2 && !liar.meta_matches)
    assert(liar.mean_luma == 0.0)
    val corrupt = got(6L)
    assert(!corrupt.decoded && !corrupt.meta_matches)
  }

  test("ImageIO resize: output re-decodes at target dims; solid color survives bilinear scaling; composes with frameSample") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(10, "png", 8, 6, png(8, 6, 0xff0000)),
      MediaRow(11, "png", 16, 16, png(16, 16, 0xffffff))))
    val resized = Multimodal.resize(rows, dstW = 4, dstH = 3, Multimodal.ImageIoResize)
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
    val feats = Multimodal.decodeImages(resized).collect().map(f => f.doc_id -> f).toMap
    // the resized payload is a REAL image at exactly the target dims
    assert(feats(10L).decoded && feats(10L).px_width == 4 && feats(10L).px_height == 3)
    assert(feats(10L).meta_matches, "resize must rewrite metadata to match the new pixels")
    // bilinear interpolation of a constant field is the same constant
    assert(math.abs(feats(10L).mean_luma - 0.299 * 255) < 1e-9)
    assert(feats(11L).mean_luma == 255.0)
    // deterministic bytes (PNG encode of identical pixels)
    val a = Multimodal.resize(rows, 4, 3, Multimodal.ImageIoResize).collect().sortBy(_.doc_id)
    val b = Multimodal.resize(rows, 4, 3, Multimodal.ImageIoResize).collect().sortBy(_.doc_id)
    assert(a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x.payload, y.payload) })
    // decode -> resize -> frame-sample chain stays shuffle-free end to end
    val frames = Multimodal.frameSample(resized, n = 2)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(frames.collect().length == 4)
    // an undecodable payload passes through resize unchanged (detection
    // is decodeImages' job, not a silent fabrication here)
    val junk = spark.createDataset(Seq(MediaRow(20, "png", 4, 4, Array[Byte](9, 9, 9))))
    val passed = Multimodal.resize(junk, 2, 2, Multimodal.ImageIoResize).collect().head
    assert(java.util.Arrays.equals(passed.payload, Array[Byte](9, 9, 9)))
  }

  /** A real PNG with an x-gradient (left dark → right bright),
    * optionally value-shifted by `shift` per pixel — renders the same
    * VISUAL content at any resolution. */
  private def gradientPng(w: Int, h: Int, shift: Int = 0, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v0 = (x * 255) / math.max(1, w - 1)
        val v = math.min(255, math.max(0, (if (invert) 255 - v0 else v0) + shift))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** A real PNG rendering one fixed high-frequency texture: a 32×24
    * grid of deterministic pseudo-random gray blocks (splitmix-style
    * hash of the block coords), rasterized at any resolution — the
    * SAME visual content at 64×48 or 512×384. Each aHash cell spans
    * 4×3 texture blocks, so a point-sampling downscale reads
    * different blocks at different resolutions (the bug this pins
    * against), while area averaging recovers identical cell means. */
  private def texturePng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var z = (x.toLong * 32 / w) * 24 + (y.toLong * 24 / h) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        val v = ((z ^ (z >>> 31)) & 0xff).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("aHash image near-dups: scale- and brightness-invariant matches, distinct content stays apart, junk excluded") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(1, "png", 64, 48, gradientPng(64, 48)),
      // the SAME visual content at a different resolution
      MediaRow(2, "png", 32, 24, gradientPng(32, 24)),
      // slightly brightened copy: aHash thresholds at the grid MEAN,
      // so a uniform shift leaves every bit unchanged
      MediaRow(3, "png", 64, 48, gradientPng(64, 48, shift = 10)),
      // visually DIFFERENT content (inverted gradient)
      MediaRow(4, "png", 64, 48, gradientPng(64, 48, invert = true)),
      // not an image
      MediaRow(5, "png", 8, 8, Array[Byte](1, 2, 3)),
      // one textured image at an 8x resolution gap: cells average
      // 4×3 vs 64×48 pixels of the same blocks — smooth gradients
      // can't tell area averaging from point sampling; this can
      MediaRow(6, "png", 64, 48, texturePng(64, 48)),
      MediaRow(7, "png", 512, 384, texturePng(512, 384))))

    val hashes = Multimodal.hashImages(rows)
    assert(!hashes.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = hashes.collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(byId(5L)._1 == false, "junk must surface as undecoded")
    // scale invariance: both resolutions land on the same 8x8 grid
    assert(byId(1L)._2 == byId(2L)._2, f"scale variance: ${byId(1L)._2}%x vs ${byId(2L)._2}%x")
    // brightness invariance: mean-relative threshold
    assert(byId(1L)._2 == byId(3L)._2)
    // the inverted gradient is (near-)complementary, far in hamming
    assert(java.lang.Long.bitCount(byId(1L)._2 ^ byId(4L)._2) > 30)
    // textured content across an 8x resolution gap: area averaging
    // recovers the same cell means (block/cell boundaries align at
    // these dims, so exactly equal)
    assert(byId(6L)._2 == byId(7L)._2, f"texture scale variance: ${byId(6L)._2}%x vs ${byId(7L)._2}%x")

    val pairs = Multimodal.imageNearDups(rows, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (6L, 7L)),
      s"expected exactly the four same-content pairs, got $pairs")
  }

  /** A real WAV: `seconds` of a sine at `hz`, peak `amp`, 16-bit
    * signed PCM at `rate`, `channels`-channel, written through
    * javax.sound.sampled — the audio twin of [[png]]. */
  private def wav(rate: Int, channels: Int, seconds: Double, hz: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val nFrames = (rate * seconds).toInt
    val bytes = new Array[Byte](nFrames * 2 * channels)
    var i = 0
    while (i < nFrames) {
      val s = (amp * math.sin(2 * math.Pi * hz * i / rate) * 32767).toInt
      var c = 0
      while (c < channels) {
        val off = (i * channels + c) * 2
        bytes(off) = (s & 0xff).toByte
        bytes(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat, 16,
      channels, 2 * channels, rate.toFloat, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("JavaSound decode: real WAVs yield waveform-derived rate/channels/duration/RMS; corrupt bytes surface") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      // 1s of a full-scale 440 Hz sine at 8 kHz mono: RMS = 1/sqrt(2)
      MediaRow(1, "wav", 0, 0, wav(8000, 1, 1.0, 440, 1.0)),
      // half-amplitude stereo at 44.1 kHz: RMS = 0.5/sqrt(2)
      MediaRow(2, "wav", 0, 0, wav(44100, 2, 0.25, 1000, 0.5)),
      // digital silence
      MediaRow(3, "wav", 0, 0, wav(16000, 1, 0.5, 440, 0.0)),
      // not audio at all
      MediaRow(4, "wav", 0, 0, Array[Byte](1, 2, 3, 4, 5))))
    val out = Multimodal.decodeAudio(rows)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = out.collect().map(f => f.doc_id -> f).toMap
    assert(got.size == 4, "every row must survive decode")
    val sine = got(1L)
    assert(sine.decoded && sine.sample_rate == 8000 && sine.channels == 1 && sine.bits == 16)
    assert(sine.n_frames == 8000 && math.abs(sine.duration_s - 1.0) < 1e-9)
    // sine RMS = amp/sqrt(2); quantization to 16 bits costs < 1e-3
    assert(math.abs(sine.rms - 1.0 / math.sqrt(2)) < 1e-3, s"rms=${sine.rms}")
    assert(sine.peak > 0.99 && sine.peak <= 1.0)
    val st = got(2L)
    assert(st.decoded && st.sample_rate == 44100 && st.channels == 2)
    assert(st.n_frames == (44100 * 0.25).toInt)
    assert(math.abs(st.rms - 0.5 / math.sqrt(2)) < 1e-3)
    val silent = got(3L)
    assert(silent.decoded && silent.rms == 0.0 && silent.peak == 0.0)
    assert(!got(4L).decoded)
  }

  test("JavaSound resample: output re-decodes at target rate/channels; sine energy survives; junk passes through") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(10, "wav", 0, 0, wav(44100, 2, 0.5, 440, 0.8)),
      MediaRow(11, "wav", 0, 0, Array[Byte](7, 7, 7))))
    val res = Multimodal.resampleAudio(rows, dstRate = 8000, dstChannels = 1)
    assert(!res.queryExecution.executedPlan.toString.contains("Exchange"))
    val feats = Multimodal.decodeAudio(res).collect().map(f => f.doc_id -> f).toMap
    val r = feats(10L)
    // the resampled payload is a REAL WAV at exactly the target shape
    assert(r.decoded && r.sample_rate == 8000 && r.channels == 1)
    // duration preserved through the rate change (one hop of slack)
    assert(math.abs(r.duration_s - 0.5) < 0.01, s"duration=${r.duration_s}")
    // a 440 Hz tone is far below the 4 kHz Nyquist of the target rate:
    // its RMS survives resampling (JDK converter is zero-order-hold,
    // not band-limited — allow a generous tolerance)
    assert(math.abs(r.rms - 0.8 / math.sqrt(2)) < 0.05, s"rms=${r.rms}")
    // deterministic bytes
    val a = Multimodal.resampleAudio(rows, 8000, 1).collect().sortBy(_.doc_id)
    val b = Multimodal.resampleAudio(rows, 8000, 1).collect().sortBy(_.doc_id)
    assert(a.zip(b).forall { case (x, y) => java.util.Arrays.equals(x.payload, y.payload) })
    // undecodable payload passes through unchanged (and downstream
    // decode flags it, exactly like the image path)
    assert(java.util.Arrays.equals(a.find(_.doc_id == 11).get.payload, Array[Byte](7, 7, 7)))
    assert(!feats(11L).decoded)
  }

  /** A real Y4M video: `nFrames` gray frames (chroma planes at the
    * 128 neutral), per-pixel luma from `lum(frame, x, y)` — gray
    * means the full-range YCbCr→RGB inverse recovers R=G=B=Y
    * exactly. */
  private def y4m(w: Int, h: Int, nFrames: Int, fps: String = "25:1")(
      lum: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    (0 until nFrames).foreach { f =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      val buf = new Array[Byte](w * h + 2 * cw * ch)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { buf(i) = lum(f, x, y).toByte; i += 1; x += 1 }
        y += 1
      }
      java.util.Arrays.fill(buf, w * h, buf.length, 128.toByte)
      out.write(buf)
    }
    out.toByteArray
  }

  /** Resolution-independent gray texture on a 32×24 block grid:
    * splitmix hash of (block, seed) — the same visual content at any
    * raster size, per-seed distinct. */
  private def tex(seed: Int, w: Int, h: Int)(f: Int, x: Int, y: Int): Int = {
    var z = ((x.toLong * 32 / w) * 24 + (y.toLong * 24 / h)) * 4096 + seed * 64 + f + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & 0xff).toInt
  }

  /** A real JPEG of the seeded texture (64×48). */
  private def texJpeg(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 48) {
      var x = 0
      while (x < 64) {
        val v = tex(seed, 64, 48)(0, x, y)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A real WAV whose AMPLITUDE varies per 1/120th-of-clip segment
    * (deterministic splitmix of (seed, segment)) over a constant
    * 440 Hz sine — the audio analog of [[texturePng]]: the same
    * envelope at any sample rate. 120 segments = 2 per AudioHash60
    * slice, so slice boundaries align exactly across rates. */
  private def envelopeWav(rate: Int, seconds: Double, seed: Int, gain: Double = 1.0): Array[Byte] = {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    val nFrames = (rate * seconds).toInt
    val bytes = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      var z = (i.toLong * 120 / nFrames) * 64 + seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val amp = gain * (0.1 + 0.8 * (((z ^ (z >>> 31)) & 0xff) / 255.0))
      val s = (amp * math.sin(2 * math.Pi * 440.0 * i / rate) * 30000).toInt
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio envelope near-dups: rate- and gain-invariant matches, distinct envelopes stay apart, junk excluded") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(1, "wav", 0, 0, envelopeWav(44100, 2.0, seed = 5)),
      // the SAME recording resampled (another rate, same envelope)
      MediaRow(2, "wav", 0, 0, envelopeWav(8000, 2.0, seed = 5)),
      // a quieter copy: the clip-mean threshold cancels uniform gain
      MediaRow(3, "wav", 0, 0, envelopeWav(44100, 2.0, seed = 5, gain = 0.4)),
      // a DIFFERENT recording entirely
      MediaRow(4, "wav", 0, 0, envelopeWav(44100, 2.0, seed = 77)),
      // not audio
      MediaRow(5, "wav", 0, 0, Array[Byte](1, 2, 3)),
      // TRUNCATED: header claims the full clip, data cut mid-stream —
      // two such files would otherwise hash near-all-ones and falsely
      // pair; they must surface as undecoded instead
      MediaRow(6, "wav", 0, 0, {
        val w = envelopeWav(8000, 2.0, seed = 5)
        java.util.Arrays.copyOf(w, w.length - 8000)
      })))
    val hashes = Multimodal.hashAudio(rows)
    assert(!hashes.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = hashes.collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap
    assert(!byId(5L)._1, "junk must surface as undecoded")
    assert(!byId(6L)._1, "truncated audio must surface as undecoded, never hash")
    assert(java.lang.Long.bitCount(byId(1L)._2 ^ byId(2L)._2) <= 3,
      f"rate variance: ${byId(1L)._2}%x vs ${byId(2L)._2}%x")
    assert(byId(1L)._2 == byId(3L)._2, "uniform gain must cancel exactly")
    assert(java.lang.Long.bitCount(byId(1L)._2 ^ byId(4L)._2) > 10,
      "different envelopes must stay apart")
    val pairs = Multimodal.audioNearDups(rows, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("JDK video decode: Y4M header math and MJPEG SOI/EOI scan yield real dims/fps/frame counts; corrupt bytes surface") {
    import spark.implicits._
    val mjpeg = texJpeg(1) ++ texJpeg(2) ++ texJpeg(3)
    val goodY4m = y4m(32, 24, 10)((f, _, _) => 20 * f)
    val rows = spark.createDataset(Seq(
      MediaRow(1, "y4m", 32, 24, goodY4m),
      MediaRow(2, "mjpeg", 64, 48, mjpeg),
      MediaRow(3, "y4m", 32, 24, Array[Byte](1, 2, 3)),
      // truncated mid-frame: must refuse, not misread planes
      MediaRow(4, "y4m", 32, 24, java.util.Arrays.copyOf(goodY4m, goodY4m.length - 7))))
    val feats = Multimodal.decodeVideo(rows)
    assert(!feats.queryExecution.executedPlan.toString.contains("Exchange"))
    val byId = feats.collect().map(f => f.doc_id -> f).toMap
    val y = byId(1L)
    assert(y.decoded && y.width == 32 && y.height == 24 && y.fps == 25.0 && y.n_frames == 10)
    assert(math.abs(y.duration_s - 0.4) < 1e-9)
    val m = byId(2L)
    // MJPEG: dims from ImageIO on frame 0; the container has no timing
    assert(m.decoded && m.width == 64 && m.height == 48 && m.fps == 0.0 && m.n_frames == 3)
    assert(!byId(3L).decoded && !byId(4L).decoded)
  }

  test("JDK frame sampling: real evenly-spaced frames that the image family decodes directly") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      MediaRow(1, "y4m", 16, 8, y4m(16, 8, 10)((f, _, _) => 20 * f + 5)),
      MediaRow(2, "mjpeg", 64, 48, texJpeg(7) ++ texJpeg(8)),
      MediaRow(3, "y4m", 0, 0, Array[Byte](9, 9))))
    val frames = Multimodal.frameSample(rows, n = 5, Multimodal.JdkVideoFrames)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    // every sampled frame is a REAL image: run them through decodeImages
    val feats = Multimodal.decodeImages(
        frames.map(f => MediaRow(f.doc_id * 100 + f.frame_idx, "frame", 0, 0, f.payload)))
      .collect().map(f => f.doc_id -> f).toMap
    // 5 evenly spaced of 10 -> source frames 0,2,4,6,8; gray luma
    // recovers the source Y exactly (integer-exact inverse at U=V=128)
    val y4mFrames = feats.filterKeys(_ < 200)
    assert(y4mFrames.size == 5)
    (0 until 5).foreach { i =>
      val f = feats(100L + i)
      assert(f.decoded && f.px_width == 16 && f.px_height == 8)
      assert(math.abs(f.mean_luma - (20 * (2 * i) + 5)) <= 1.0,
        s"frame $i luma ${f.mean_luma}, want ${20 * (2 * i) + 5}")
    }
    // MJPEG: both frames come back as decodable JPEGs at true dims
    assert(feats(200L).decoded && feats(200L).px_width == 64 && feats(201L).decoded)
    // junk yields no frames (decodeVideo is where corruption routes)
    assert(!feats.keys.exists(_ >= 300))
  }

  test("videoNearDups: re-cut MJPEG shares frames, cross-resolution Y4M texture matches, unrelated content stays apart") {
    import spark.implicits._
    val rows = spark.createDataset(Seq(
      // the same textured 4-frame video at an 8x resolution gap
      MediaRow(1, "y4m", 64, 48, y4m(64, 48, 4)(tex(50, 64, 48))),
      MediaRow(2, "y4m", 512, 384, y4m(512, 384, 4)(tex(50, 512, 384))),
      // different content entirely
      MediaRow(3, "y4m", 64, 48, y4m(64, 48, 4)(tex(99, 64, 48))),
      // an MJPEG "re-cut": videos 4 and 5 share two exact frames
      MediaRow(4, "mjpeg", 64, 48, texJpeg(10) ++ texJpeg(11) ++ texJpeg(12)),
      MediaRow(5, "mjpeg", 64, 48, texJpeg(12) ++ texJpeg(11) ++ texJpeg(13)),
      MediaRow(6, "mjpeg", 64, 48, Array[Byte](1, 2, 3)),
      // a STATIC clip (4 identical frames) vs a video sharing that
      // one scene: frame-PAIR counting would report 4 matches; the
      // distinct-frames-per-side contract reports 1 -> no pair
      MediaRow(8, "y4m", 64, 48, y4m(64, 48, 4)((_, x, y) => tex(77, 64, 48)(0, x, y))),
      MediaRow(9, "y4m", 64, 48, y4m(64, 48, 4)((f, x, y) =>
        if (f == 0) tex(77, 64, 48)(0, x, y) else tex(88, 64, 48)(f, x, y)))))
    val dups = Multimodal.videoNearDups(rows, framesPerVideo = 4, minMatchingFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dups.keySet == Set((1L, 2L), (4L, 5L)), s"got $dups")
    // all four texture frames survive the resolution gap
    assert(dups((1L, 2L)) == 4, s"cross-resolution matches: ${dups((1L, 2L))}")
    assert(dups((4L, 5L)) == 2, s"re-cut matches: ${dups((4L, 5L))}")
    // 64-bit hash-derived ids would silently lose their top bits in
    // the frame packing: refused loudly instead
    intercept[org.apache.spark.SparkException] {
      spark.createDataset(Seq(MediaRow(Long.MaxValue, "y4m", 64, 48,
        y4m(64, 48, 2)((_, x, y) => tex(1, 64, 48)(0, x, y)))))
        .transform(ds => Multimodal.videoNearDups(ds)).collect()
    }
  }

  test("MJPEG segment walk: EXIF APP1 with an embedded thumbnail EOI does not split the frame; Y4M dim overflow refused") {
    import spark.implicits._
    // inject an APP1 segment (marker FF E1, self-inclusive length)
    // whose payload contains a fake embedded thumbnail SOI/EOI — a
    // raw FF D9 scan would end the frame inside the metadata
    val base = texJpeg(42)
    val thumb = Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3, 0xff.toByte, 0xd9.toByte)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((thumb.length + 8) >> 8) & 0xff).toByte, ((thumb.length + 8) & 0xff).toByte,
      'E', 'x', 'i', 'f', 0, 0) ++ thumb
    val exifJpeg = base.take(2) ++ app1 ++ base.drop(2)
    val rows = spark.createDataset(Seq(
      MediaRow(1, "mjpeg", 64, 48, exifJpeg ++ exifJpeg),
      // header dims whose 32-bit pixel product wraps negative: the
      // Long-math guard must refuse, not misread plane offsets
      MediaRow(2, "y4m", 0, 0,
        "YUV4MPEG2 W46341 H46341 F25:1 Ip A1:1 C420\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3))))
    val byId = Multimodal.decodeVideo(rows).collect().map(f => f.doc_id -> f).toMap
    assert(byId(1L).decoded && byId(1L).n_frames == 2,
      s"EXIF frame miscounted: ${byId(1L)}")
    assert(!byId(2L).decoded)
    // both sampled frames re-decode as real images despite the APP1
    val frames = Multimodal.frameSample(rows.filter(_.doc_id == 1), n = 2, Multimodal.JdkVideoFrames)
    val feats = Multimodal.decodeImages(
      frames.map(f => MediaRow(f.frame_idx.toLong, "frame", 0, 0, f.payload))).collect()
    assert(feats.length == 2 && feats.forall(f => f.decoded && f.px_width == 64))
  }

  /** A progressive (multi-scan, SOF2) re-encode of [[texJpeg]] via the
    * JDK writer's progressive mode — the multi-scan stream the segment
    * walk must REFUSE (frame boundary undecidable) rather than risk an
    * early split on a literal FF D9 inside an inter-scan table. */
  private def progressiveJpeg(seed: Int): Array[Byte] = {
    val baseline = texJpeg(seed)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(baseline))
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val param = w.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), param)
    w.dispose(); ios.close()
    out.toByteArray
  }

  test("progressive MJPEG refused: multi-scan frames surface decoded=false, never a wrong frame count") {
    import spark.implicits._
    val prog = progressiveJpeg(21)
    // sanity: the re-encode really is progressive (has an SOF2 marker)
    assert(prog.sliding(2).exists(s => (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2),
      "test payload is not progressive — JDK writer produced no SOF2")
    val rows = spark.createDataset(Seq(
      MediaRow(1, "mjpeg", 64, 48, prog ++ prog),            // all-progressive stream
      MediaRow(2, "mjpeg", 64, 48, texJpeg(5) ++ prog),      // baseline then progressive
      MediaRow(3, "mjpeg", 64, 48, texJpeg(5) ++ texJpeg(6)) // control: baseline decodes
    ))
    val byId = Multimodal.decodeVideo(rows).collect().map(f => f.doc_id -> f).toMap
    assert(!byId(1L).decoded, s"progressive stream not refused: ${byId(1L)}")
    assert(!byId(2L).decoded, s"mixed stream not refused: ${byId(2L)}")
    assert(byId(3L).decoded && byId(3L).n_frames == 2, s"baseline control broke: ${byId(3L)}")
  }
}
