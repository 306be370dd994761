package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.ShardPackSink
import graft.sinks.ShardPackSink.Chunk

/** Continuous shard packing: pack ids/offsets continue across
  * micro-batches (a shard SPANS the batch boundary), the streamed
  * result is byte-identical to a one-shot batch pack of the
  * concatenated input, a replayed batch recomputes its exact
  * positions, and a checkpointed restart with traffic while down
  * loses nothing. */
class ShardPackSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("shard_pack").toString

  private def readMap(root: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    ShardPackSink.read(spark, root)
      .select($"id", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
  }

  /** the one-shot law: position = exclusive prefix sum in id order */
  private def oneShot(chunks: Seq[Chunk], seqLen: Long): Map[Long, (Long, Long)] = {
    var cum = 0L
    chunks.sortBy(_.id).map { c =>
      val pos = cum; cum += c.n_tok
      c.id -> ((pos / seqLen, pos % seqLen))
    }.toMap
  }

  test("shard pack: ids/offsets continue across batches (a shard spans the boundary); streamed == one-shot batch pack") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp()
    val in = MemoryStream[Chunk]
    val q = in.toDS().writeStream
      .foreachBatch(ShardPackSink.sink(root, seqLen = 100L))
      .queryName("shard_pack").start()
    val b0 = Seq(Chunk(1L, 60L), Chunk(2L, 30L))          // ends at 90 — shard 0 has 10 left
    val b1 = Seq(Chunk(3L, 30L), Chunk(4L, 90L))          // 3 spans shards 0→1
    val b2 = Seq(Chunk(5L, 10L))
    try {
      Seq(b0, b1, b2).foreach { b => in.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val got = readMap(root)
    assert(got === oneShot(b0 ++ b1 ++ b2, 100L))
    // the boundary chunk landed at offset 90 of shard 0 — the carry
    // is tokens, not a rounded-up shard id
    assert(got(3L) === ((0L, 90L)))
    assert(got(4L) === ((1L, 20L)))
  }

  test("shard pack: a replayed batch recomputes its exact positions from strictly-older meta; restart with traffic while down loses nothing") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val root = tmp()
    // direct replay: same batchId twice — identical output, high-water unmoved
    ShardPackSink.writeBatch(Seq(Chunk(1L, 70L)).toDS(), 0L, root, 100L)
    ShardPackSink.writeBatch(Seq(Chunk(2L, 50L)).toDS(), 1L, root, 100L)
    val before = readMap(root)
    ShardPackSink.writeBatch(Seq(Chunk(2L, 50L)).toDS(), 1L, root, 100L) // replay
    assert(readMap(root) === before)
    assert(before(2L) === ((0L, 70L))) // continued from batch 0's 70 tokens
    // checkpointed restart
    val root2 = tmp()
    val ckpt = tmp()
    val in = MemoryStream[Chunk]
    def start() = in.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(ShardPackSink.sink(root2, seqLen = 100L))
      .queryName("shard_pack_restart").start()
    val q1 = start()
    try { in.addData(Chunk(1L, 60L)); q1.processAllAvailable() } finally q1.stop()
    in.addData(Chunk(2L, 70L), Chunk(3L, 40L)) // lands while down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readMap(root2) === oneShot(
      Seq(Chunk(1L, 60L), Chunk(2L, 70L), Chunk(3L, 40L)), 100L))
  }

  test("chunk -> pack e2e: a live documents stream chunks (q111 projection) into continuously packed shards, restart included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (half1, half2) = docs.splitAt(docs.size / 2)
    val root = tmp()
    val ckpt = tmp()
    val in = MemoryStream[(Long, String)]
    def chunked(df: org.apache.spark.sql.DataFrame) = {
      val toks = filter(split(col("text"), " "), x => x =!= lit(""))
      df.select(col("doc_id"), toks.as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") > 0)
        .withColumn("chunk_id", explode(sequence(lit(0L), expr("(n - 1) div 48"))))
        .select((col("doc_id") * 1000L + col("chunk_id")).as("id"),
          least(lit(64L), (col("n") - col("chunk_id") * 48).cast("long")).as("n_tok"))
        .as[Chunk]
    }
    def start() = chunked(in.toDF().toDF("doc_id", "text")).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(ShardPackSink.sink(root, seqLen = 256L))
      .queryName("chunk_pack_e2e").start()
    val q1 = start()
    try { in.addData(half1: _*); q1.processAllAvailable() } finally q1.stop()
    in.addData(half2: _*) // lands while down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    // the one-shot law over the batch q111 chunks in id order
    val expected = oneShot(
      SparkEntry.queries("q111_doc_chunk")(spark, sfDir)
        .select(($"doc_id" * 1000L + $"chunk_id").as("id"), $"n_tok")
        .as[Chunk].collect().toSeq, 256L)
    CachePool.drain()
    val got = readMap(root)
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("shard pack: a batch violating cross-batch id monotonicity is rejected loudly and leaves nothing behind") {
    import spark.implicits._
    val root = tmp()
    ShardPackSink.writeBatch(Seq(Chunk(10L, 50L), Chunk(20L, 50L)).toDS(), 0L, root, seqLen = 100L)
    // id 15 <= max packed id 20: the one-shot law's precondition fails
    val e = intercept[IllegalArgumentException] {
      ShardPackSink.writeBatch(Seq(Chunk(15L, 10L)).toDS(), 1L, root, seqLen = 100L)
    }
    assert(e.getMessage.contains("monotonicity"), e.getMessage)
    // the rejected batch wrote neither output nor meta: the stream's
    // state is exactly as before, and a corrected batch proceeds
    assert(readMap(root) === oneShot(Seq(Chunk(10L, 50L), Chunk(20L, 50L)), 100L))
    ShardPackSink.writeBatch(Seq(Chunk(21L, 10L)).toDS(), 2L, root, seqLen = 100L)
    assert(readMap(root)(21L) === ((1L, 0L)))
  }
}
