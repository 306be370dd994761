package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.PartitionCommit

/** Event-time partition commit (sink_partition_commit — Flink's
  * sink.partition-commit with the success-file policy): a day gets its
  * _SUCCESS only once the persisted event-time high-water proves it
  * drained (day_end + commitDelay ≤ max − lateness); the marker never
  * regresses across a checkpointed restart; a beyond-lateness row
  * lands in data but cannot un-commit (the documented Flink hole);
  * replayed batches overwrite their own b= directory — no dupes. */
class PartitionCommitSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)
  private type Ev = (Long, Timestamp)

  test("partition_commit: _SUCCESS fires exactly when the high-water clears day_end + delay; late lands without un-commit") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_pc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pc_ckpt").toString
    val in = MemoryStream[Ev]
    val q = PartitionCommit.sink(
        in.toDF().toDF("event_id", "ts"), root, ckpt,
        latenessUs = 3600000000L, commitDelayUs = 3600000000L) // 1 h + 1 h
      .start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 23:00:00")))
      q.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set.empty,
        "nothing may commit while the high-water sits inside day 1")
      // high-water 2024-01-02 10:00 → wm 09:00 → day1 end + 1 h = 01:00 ≤ 09:00 → day 1 commits
      in.addData((3L, ts("2024-01-02 10:00:00")))
      q.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set("2024-01-01"))
      // a BEYOND-lateness straggler for the committed day: data lands,
      // marker unchanged — the documented hole; lateSplit is the cure
      in.addData((4L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set("2024-01-01"))
      val day1 = PartitionCommit.readData(spark, root)
        .where($"day" === "2024-01-01").count()
      assert(day1 === 3L, "the straggler must land in the partition data")
      // day 2 commits once day 3 noon clears its horizon
      in.addData((5L, ts("2024-01-03 12:00:00")))
      q.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set("2024-01-01", "2024-01-02"))
    } finally q.stop()
  }

  test("partition_commit: checkpointed restart — high-water survives, no duplicate rows, commits keep advancing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_pc2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pc2_ckpt").toString
    val in = MemoryStream[Ev]
    def start() = PartitionCommit.sink(
      in.toDF().toDF("event_id", "ts"), root, ckpt,
      latenessUs = 0L, commitDelayUs = 0L).start()
    val q1 = start()
    try {
      in.addData((1L, ts("2024-01-01 08:00:00")), (2L, ts("2024-01-02 01:00:00")))
      q1.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set("2024-01-01"))
    } finally q1.stop()
    // produce while down; restart from the same checkpoint — batch ids
    // continue, so no b= collision, and the meta high-water is reused
    in.addData((3L, ts("2024-01-03 02:00:00")))
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(PartitionCommit.committedDays(root) === Set("2024-01-01", "2024-01-02"))
      val data = PartitionCommit.readData(spark, root)
        .select($"event_id").as[Long].collect().toSeq
      assert(data.sorted === Seq(1L, 2L, 3L), s"dupes or losses across restart: $data")
    } finally q2.stop()
  }
}
