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
}
