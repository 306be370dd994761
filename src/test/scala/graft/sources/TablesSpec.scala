package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Tables.events must normalize `ts` to a microsecond TimestampType
  * column from EVERY annotation the driver's generator has shipped:
  * int64 nanoseconds (TIMESTAMP(NANOS) decoded under nanosAsLong),
  * TIMESTAMP_NTZ (micros, no timezone), and plain TimestampType.
  * Round 9 lost all 11 events queries to exactly this drift — the
  * loader assumed nanos while the regenerated files carried micros.
  */
class TablesSpec extends AnyFunSuite {
  import TestSpark._

  private val wantMicros = Seq(
    1735689600000000L, // 2025-01-01 00:00:00 UTC
    1735689600123456L, // …plus 123456 us: sub-second precision survives
    1735693200000000L) // 2025-01-01 01:00:00 UTC

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    wantMicros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      .select($"event_id", tsCol.as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def readBack(dir: String): (String, Seq[Long]) = {
    val df = Tables.events(spark, dir)
    val tpe = df.schema("ts").dataType.typeName
    val got = df.select(unix_micros(col("ts")))
      .collect().map(_.getLong(0)).sorted.toSeq
    (tpe, got)
  }

  test("events.ts: int64-nanos, TIMESTAMP_NTZ, and TimestampType files all decode to the same us TimestampType") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_events_ts").toString
    try {
      // branch 1: raw BIGINT nanos — what TIMESTAMP(NANOS) decodes to
      // under spark.sql.legacy.parquet.nanosAsLong
      writeEvents(dir, ($"us" * 1000L).cast("long"))
      assert(readBack(dir) == (("timestamp", wantMicros)))

      // branch 2: TIMESTAMP_NTZ (micros, no timezone) — the r9 drop
      writeEvents(dir, timestamp_micros($"us").cast("timestamp_ntz"))
      assert(readBack(dir) == (("timestamp", wantMicros)))

      // branch 3: already TimestampType — pass-through
      writeEvents(dir, timestamp_micros($"us"))
      assert(readBack(dir) == (("timestamp", wantMicros)))
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
