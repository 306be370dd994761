package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.OutputMode

import graft.GraftSession
import graft.streaming.Pipelines
import graft.streaming.Pipelines.{Change, Event}

/** Runnable sample of the streaming surface (the library-user view of
  * the reference's MyCountTrigger and CDC-upsert jobs). `run-main
  * graft.examples.StreamingDemo` prints the emitted aggregates. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-streaming-demo", 4)
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // Count-trigger keyed window: 7 events, fire every 3 per key.
    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(in.toDS(), maxCount = 3).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_ct").start()
    in.addData((1 to 7).map(i => Event(i, new Timestamp(i * 60000L), 1, "click", i.toDouble)): _*)
    q.processAllAvailable(); q.stop()
    println("COUNT_TRIGGER_EMITS=" + spark.table("demo_ct").collect().mkString(";"))

    // Streaming session windows (gap 10 min, watermark 5 min).
    val sin = MemoryStream[Event]
    val sq = Pipelines.sessionWindowCounts(sin.toDF(), "10 minutes", "5 minutes").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_sw").start()
    sin.addData(
      Event(1, new Timestamp(60000L), 1, "click", 1.0),
      Event(2, new Timestamp(300000L), 1, "click", 2.0),
      Event(3, new Timestamp(1800000L), 1, "click", 4.0),
      Event(9, new Timestamp(7200000L), 9, "click", 0.0))
    sq.processAllAvailable(); sq.stop()
    println("SESSION_WINDOWS=" + spark.table("demo_sw").orderBy("s_start").collect().mkString(";"))

    // Streaming CDC upsert state.
    val cin = MemoryStream[Change]
    val cq = Pipelines.cdcUpsertStream(cin.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("demo_up").start()
    cin.addData(Change(7, 10, "+I", 1.5), Change(7, 20, "+U", 2.5))
    cq.processAllAvailable(); cq.stop()
    println("UPSERT_STATE=" + spark.table("demo_up").orderBy("ts").collect().mkString(";"))

    // Streaming near-dup suppression (SimHash band state, Spark 4
    // transformWithState) — drop the exact copy, keep the rest.
    val din = MemoryStream[(Long, Timestamp, String)]
    val dq = Pipelines.streamingNearDedup(
        din.toDF().toDF("doc_id", "ts", "text"), "doc_id", "ts", "text",
        watermark = "0 seconds", verdictWindow = "1 minute",
        stateRetention = java.time.Duration.ofHours(1))
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName("demo_nd").start()
    din.addData(
      (1L, new Timestamp(60000L), "the quick brown fox jumps over the lazy dog again"),
      (2L, new Timestamp(120000L), "the quick brown fox jumps over the lazy dog again"),
      (3L, new Timestamp(180000L), "completely different content goes here instead today"))
    dq.processAllAvailable()
    din.addData((99L, new Timestamp(7200000L), "watermark pusher closes the verdict windows"))
    dq.processAllAvailable(); dq.stop()
    println("NEAR_DEDUP_SURVIVORS=" + spark.table("demo_nd").orderBy("doc_id").collect().mkString(";"))

    // Checkpointed DataSourceV2 generator source (rate-limited).
    val out = java.nio.file.Files.createTempDirectory("demo_gen_out").toString
    val gq = spark.readStream.format("graft.sources.GraftGenSource")
      .option("rowsPerSecond", "500").option("numPartitions", "2").load()
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("demo_gen_ckpt").toString)
      .format("parquet").option("path", out).start()
    gq.awaitTermination()
    println("GEN_SOURCE_ROWS=" + spark.read.parquet(out).count())

    // Exactly-once delivery to an external sink (ref: Kafka2Kafka
    // EXACTLY_ONCE): checkpointed stream → 2PC staged/atomic-commit.
    val eoIn = java.nio.file.Files.createTempDirectory("demo_eo_in").toString
    spark.range(0, 25).selectExpr("cast(id as string) AS json")
      .write.mode("overwrite").parquet(eoIn)
    val eoSink = graft.sinks.ExactlyOnce.MemoryTxnTransport("demo-eo")
    val eq = Pipelines.startExactlyOnceSink(
      spark, graft.streaming.StreamIO.FileDir(eoIn), Some(spark.read.parquet(eoIn).schema),
      java.nio.file.Files.createTempDirectory("demo_eo_ckpt").toString,
      "demo", eoSink, r => (r.getString(0) + "\n").getBytes("UTF-8"))
    eq.processAllAvailable(); eq.stop()
    println("EXACTLY_ONCE_PUBLISHED=" + eoSink.visibleRequests.length)

    // DataSourceV2 changelog format — driven through PURE SQL DDL, the
    // reference's configuration surface (format/csv/Csv2Csv.java DDL).
    val envDir = java.nio.file.Files.createTempDirectory("demo_canal")
    java.nio.file.Files.write(envDir.resolve("00000.json"),
      """{"data":[{"id":"1","price":"9.5"}],"type":"INSERT","table":"orders","ts":1}
        |{"data":[{"id":"1","price":"11.0"}],"old":[{"price":"9.5"}],"type":"UPDATE","table":"orders","ts":2}"""
        .stripMargin.getBytes("UTF-8"))
    spark.sql(s"CREATE TABLE demo_chg USING `graft-canal-json` OPTIONS (path '${envDir.toString}')")
    val chg = spark.sql("SELECT row_kind, ts, fields['price'] AS price FROM demo_chg")
    println("CANAL_FORMAT_CHANGELOG=" + chg.orderBy("ts", "row_kind").collect().mkString(";"))
    spark.sql("DROP TABLE demo_chg")

    // Streaming incremental cluster maintenance: micro-batches of docs
    // fold new near-dup pairs into the at-rest cluster artifact.
    val cmRoot = java.nio.file.Files.createTempDirectory("demo_cm").toString
    val cmIn = MemoryStream[(Long, String)]
    val cmQ = cmIn.toDF().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("demo_cm_ckpt").toString)
      .foreachBatch(graft.streaming.ClusterMaintenance.sink(cmRoot, "doc_id", "text"))
      .start()
    cmIn.addData(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "unrelated words entirely here now friend nothing shared at all"))
    cmQ.processAllAvailable()
    cmIn.addData((3L, "beta gamma delta epsilon zeta eta theta iota kappa")) // near-copy of doc 1, next batch
    cmQ.processAllAvailable(); cmQ.stop()
    println("INCREMENTAL_CLUSTERS=" +
      graft.streaming.ClusterMaintenance.loadClusters(spark, cmRoot)
        .orderBy("doc_id").collect().mkString(";"))

    // Temporal joins: AS-OF (one shuffle, no inequality join) and the
    // native stream-stream interval join.
    val hist = Seq((1L, 1000L, 10L), (1L, 2000L, 20L)).toDF("k", "t", "limit_v")
      .selectExpr("k", "timestamp_micros(t) AS eff", "limit_v")
    val prb = Seq((1L, 1500L), (1L, 2500L), (1L, 500L)).toDF("k", "t")
      .selectExpr("k", "timestamp_micros(t) AS at")
    println("ASOF=" + graft.operators.TemporalJoins
      .asOf(prb, hist, "k", "at", "eff", Seq("limit_v"))
      .orderBy("at").collect().mkString(";"))

    // At-rest LM + streaming quality scoring (the q55 deployment
    // shape): build the LM once from a reference corpus, then score
    // every arriving micro-batch against the FROZEN model +
    // threshold; unseen tokens take the 1-bit OOV floor.
    val lmDir = java.nio.file.Files.createTempDirectory("demo_lm").toString
    val qsRoot = java.nio.file.Files.createTempDirectory("demo_qs").toString
    graft.operators.LmArtifact.build(
      Seq((1L, "the quick brown fox"), (2L, "the lazy dog"), (3L, "the the the")).toDF("doc_id", "text"),
      lmDir)
    val qsIn = MemoryStream[(Long, String)]
    val qsQ = qsIn.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("demo_qs_ckpt").toString)
      .foreachBatch(graft.streaming.QualityStream.sink(spark, qsRoot, lmDir))
      .start()
    qsIn.addData((10L, "the quick dog"), (11L, "zzqx wvut unseen garble"))
    qsQ.processAllAvailable(); qsQ.stop()
    println("STREAM_QUALITY=" + graft.streaming.QualityStream.loadScores(spark, qsRoot)
      .orderBy("doc_id").collect().mkString(";"))

    // IVF+SQ8 at rest: build a code-carrying index (one byte per
    // dimension rides next to each vector), probe through the int8
    // codes with an exact re-rank of the shortlist only.
    val emb = spark.range(200).select($"id".as("vec_id"),
      expr("transform(sequence(0, 7), k -> cast(pmod(id * 7 + k * 13, 19) as double))").as("v"))
    val model = graft.operators.IvfIndex.train(emb, cells = 4, iters = 2, memoKey = "demo-sq8")
    val idxDir = java.nio.file.Files.createTempDirectory("demo_idx").toString
    graft.operators.IvfIndex.build(emb, model, idxDir)
    val probes = emb.filter($"vec_id" % 100 === 0).select($"vec_id".as("query_id"), $"v".as("qv"))
    println("SQ8_TOPK=" + graft.operators.IvfIndex
      .topKSq8(spark, idxDir, probes, model, nprobe = 2, k = 3)
      .orderBy("query_id", "rnk").collect().mkString(";"))

    // Multimodal: decode a real (generated) image and video through
    // the JDK kernels, then near-dup match the video against its own
    // re-encode at half resolution — all pure-JDK codecs (ImageIO +
    // the Y4M/MJPEG container parsers).
    def gray(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach { x =>
        val v = (((x * 32 / w) * 24 + (y * 24 / h)) * 31 + seed * 97) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      img
    }
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def mjpeg(seeds: Seq[Int], w: Int, h: Int): Array[Byte] =
      seeds.toArray.flatMap { s =>
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(gray(w, h, s), "jpg", out)
        out.toByteArray
      }
    import graft.operators.Multimodal
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1, "png", 64, 48, png(gray(64, 48, 1))),
      Multimodal.MediaRow(2, "mjpeg", 64, 48, mjpeg(Seq(5, 6, 7), 64, 48)),
      Multimodal.MediaRow(3, "mjpeg", 32, 24, mjpeg(Seq(5, 6, 7), 32, 24))))
    println("IMAGE_FEATURES=" + Multimodal.decodeImages(media.filter(_.doc_id == 1))
      .collect().mkString(";"))
    println("VIDEO_FEATURES=" + Multimodal.decodeVideo(media.filter(_.doc_id >= 2))
      .collect().mkString(";"))
    println("VIDEO_NEARDUPS=" + Multimodal.videoNearDups(
      media.filter(_.doc_id >= 2), framesPerVideo = 3, minMatchingFrames = 2)
      .collect().mkString(";"))

    // audio near-dup: the same recording's envelope at two sample
    // rates pairs; a different envelope does not
    def wavClip(seed: Int, rate: Int): Array[Byte] = {
      import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
      val bytes = new Array[Byte](rate * 2)
      (0 until rate).foreach { i =>
        val amp = 0.2 + 0.6 * (((i * 120 / rate) * 31 + seed * 97) % 100) / 100.0
        val s = (amp * math.sin(2 * math.Pi * 440.0 * i / rate) * 30000).toInt
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate.toFloat, 16, 1, 2, rate.toFloat, false)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, rate.toLong), AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val audio = spark.createDataset(Seq(
      Multimodal.MediaRow(10, "wav", 0, 0, wavClip(1, 8000)),
      Multimodal.MediaRow(11, "wav", 0, 0, wavClip(1, 16000)),
      Multimodal.MediaRow(12, "wav", 0, 0, wavClip(9, 8000))))
    println("AUDIO_NEARDUPS=" + Multimodal.audioNearDups(audio).collect().mkString(";"))

    spark.stop()
  }
}
