package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.connector.read.streaming.ReadLimit

/** Admission-control arithmetic of the generator source (no Spark
  * session needed — latestOffset is pure driver logic). */
class GenSourceSpec extends AnyFunSuite {

  test("rate limiter admits from a fixed anchor, not cumulatively per batch") {
    val stream = new GraftGenSource.GenMicroBatchStream(
      rowsPerSecond = 100000L, numPartitions = 2, payloadLen = 8)
    val limit = ReadLimit.allAvailable()
    val end1 = stream.latestOffset(GraftGenSource.GenOffset(0L), limit)
      .asInstanceOf[GraftGenSource.GenOffset].rows
    Thread.sleep(120)
    val end2 = stream.latestOffset(GraftGenSource.GenOffset(end1), limit)
      .asInstanceOf[GraftGenSource.GenOffset].rows
    // immediately asking again from end2 must NOT re-add the full
    // elapsed time on top of end2 (the compounding bug): the admitted
    // count is anchor + elapsed*rps, so back-to-back calls differ by
    // only the few ms between them — far less than re-adding ~120ms
    val end3 = stream.latestOffset(GraftGenSource.GenOffset(end2), limit)
      .asInstanceOf[GraftGenSource.GenOffset].rows
    assert(end2 > end1) // time moved, more rows admitted
    assert(end3 - end2 < end2 - end1,
      s"compounding admission: $end1 -> $end2 -> $end3")
    // and the offset never regresses below the committed start
    val endHigh = stream.latestOffset(GraftGenSource.GenOffset(end3 + 1000000L), limit)
      .asInstanceOf[GraftGenSource.GenOffset].rows
    assert(endHigh >= end3 + 1000000L)
  }
}
