package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal payload operators (decode / resize / frame-sample):
  * the kernels are env-forced stubs, but schema, cardinality,
  * metadata rewrite, determinism, and the shuffle-free partition-wise
  * execution are real and asserted here. */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

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
}
