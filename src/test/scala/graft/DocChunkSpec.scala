package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Token-window chunking: coverage/overlap invariants on the real
  * corpus, and the STATELESS streaming run equals batch exactly (the
  * projection is the same code path — no watermark, no state). */
class DocChunkSpec extends AnyFunSuite {
  import TestSpark._

  test("doc chunking: every token covered, overlap = size − stride, streamed == batch") {
    import spark.implicits._
    val batch = SparkEntry.queries("q111_doc_chunk")(spark, sfDir)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(batch.nonEmpty)
    // chunk invariants per doc: ids dense from 0; all but the last
    // chunk full-size; consecutive chunks overlap by size − stride
    batch.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2) == (0L until sorted.size.toLong), s"doc $doc: chunk ids not dense")
      // interior chunks carry MORE than one stride (else they'd be
      // last); every chunk obeys n_tok = min(size, n − i·stride)
      sorted.init.foreach { c => assert(c._3 > 48L && c._3 <= 64L,
        s"doc $doc chunk ${c._2}: interior width ${c._3} outside (48, 64]") }
      assert(sorted.last._3 >= 1L && sorted.last._3 <= 64L)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          val aToks = a._4.split(" ")
          val bToks = b._4.split(" ")
          // the 16-token overlap: b's prefix == a's tokens from stride
          val overlap = aToks.drop(48)
          assert(bToks.take(overlap.length).sameElements(overlap),
            s"doc $doc: chunks ${a._2}/${b._2} do not overlap correctly")
        case _ =>
      }
    }
    // token coverage: sum of per-chunk NEW tokens (stride for interior,
    // tail for last) == the doc's token count
    val docToks = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.filter(
          org.apache.spark.sql.functions.split($"text", " "),
          x => x =!= org.apache.spark.sql.functions.lit(""))).cast("long"))
      .as[(Long, Long)].collect().toMap
    batch.groupBy(_._1).foreach { case (doc, cs) =>
      val n = docToks(doc)
      val last = cs.maxBy(_._2)
      assert(last._2 * 48 + last._3 == n, s"doc $doc: tail chunk does not reach token $n")
    }

    // streamed == batch (stateless projection, one micro-batch)
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val chunk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      import org.apache.spark.sql.functions._
      val toks = filter(split(col("text"), " "), x => x =!= lit(""))
      df.select(col("doc_id"), toks.as("toks"))
        .withColumn("n", size(col("toks")))
        .filter(col("n") > 0)
        .withColumn("chunk_id", explode(sequence(lit(0L), expr("(n - 1) div 48"))))
        .select(col("doc_id"), col("chunk_id"),
          least(lit(64L), (col("n") - col("chunk_id") * 48).cast("long")).as("n_tok"),
          array_join(slice(col("toks"), (col("chunk_id") * 48 + 1).cast("int"), lit(64)), " ")
            .as("chunk_text"))
    }
    val q = chunk(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunk_stream").start()
    try { in.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("chunk_stream")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed === batch.toSet)
  }

  test("chunks compose into q47-style sequence packing: every chunk assigned, pack budgets hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // chunk the corpus, then pack chunks (identity = (doc, chunk))
    // into 256-token shards with the q47 prefix-sum discipline —
    // the chunk→pack end of the training-data pipeline
    val seqLen = 256L
    val chunks = SparkEntry.queries("q111_doc_chunk")(spark, sfDir)
      .select(($"doc_id" * 1000L + $"chunk_id").as("cid"), $"n_tok")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"cid")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val packed = chunks
      .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .select($"cid", $"n_tok", expr(s"cum_before div $seqLen").as("pack_id"),
        ($"cum_before" % seqLen).as("pack_offset"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    CachePool.drain()
    // every chunk assigned exactly once
    assert(packed.map(_._1).distinct.size == packed.size && packed.nonEmpty)
    // offsets never exceed the budget, pack ids are the prefix-sum law
    packed.foreach { case (cid, n, pid, off) =>
      assert(off >= 0L && off < seqLen, s"chunk $cid offset $off outside [0, $seqLen)")
      assert(n > 0L)
    }
    // the prefix-sum law: each chunk's (pack_id, pack_offset) is
    // exactly its cumulative predecessor total split by the budget
    var cum = 0L
    packed.sortBy(_._1).foreach { case (cid, n, pid, off) =>
      assert(pid == cum / seqLen && off == cum % seqLen,
        s"chunk $cid: (pack $pid, off $off) != prefix-sum law at cum=$cum")
      cum += n
    }
  }
}
