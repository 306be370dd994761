package graft.tools

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft._
import graft.operators.Bucketing
import graft.streaming.Pipelines
import graft.streaming.Pipelines.Event

/** Dev drive: hybrid count-trigger timer path + bucketed join plan. */
object DriveBatch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("drive-batch", 4)
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val in = MemoryStream[Event]
    val q = Pipelines.countTriggerAgg(
        in.toDS().withWatermark("ts", "0 seconds").as[Event], maxCount = 10, windowMs = 300000L)
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName("d_ct").start()
    in.addData(Event(1, new Timestamp(60000), 5, "click", 2.0), Event(2, new Timestamp(120000), 5, "click", 3.0))
    q.processAllAvailable()
    in.addData(Event(9, new Timestamp(3600000), 6, "view", 1.0))
    q.processAllAvailable()
    in.addData(Event(10, new Timestamp(3660000), 6, "view", 1.0))
    q.processAllAvailable(); q.stop()
    println("HYBRID_TIMER_FIRED=" + spark.table("d_ct").collect().mkString(";"))

    // streaming exact dedup with watermark-bounded state
    val din = MemoryStream[(Timestamp, String)]
    val dq = Pipelines.streamingExactDedup(din.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName("d_dedup").start()
    din.addData((new Timestamp(1000), "a doc"), (new Timestamp(2000), "a doc"), (new Timestamp(3000), "other"))
    dq.processAllAvailable(); dq.stop()
    println("STREAM_DEDUP_KEPT=" + spark.table("d_dedup").select("text").collect().map(_.getString(0)).sorted.mkString(","))

    // canal-json stream → changelog → upsert state, end to end
    val cin = MemoryStream[String]
    val cq = Pipelines.canalUpsertPipeline(cin.toDF().toDF("payload"), "payload", "id", "amount")
      .writeStream.outputMode(OutputMode.Append).format("memory").queryName("d_canal").start()
    cin.addData(
      """{"data":[{"id":"1","amount":"10.5"}],"type":"INSERT","table":"t","ts":100}""",
      """{"data":[{"id":"1","amount":"12.5"}],"old":[{"amount":"10.5"}],"type":"UPDATE","table":"t","ts":200}""")
    cq.processAllAvailable(); cq.stop()
    println("CANAL_UPSERT=" + spark.table("d_canal").orderBy("ts").collect().mkString(";"))

    val base = Files.createTempDirectory("drive_bucketed").toString
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(spark.read.parquet(s"$sf/orders.parquet"), "d_orders", "o_orderkey", 8, s"$base/o")
    Bucketing.writeBucketed(spark.read.parquet(s"$sf/lineitem.parquet").withColumnRenamed("l_orderkey", "o_orderkey"),
      "d_lineitem", "o_orderkey", 8, s"$base/l")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val j = Bucketing.bucketedJoin(spark, "d_orders", "d_lineitem", "o_orderkey")
    println("BUCKETED_JOIN_ROWS=" + j.count())
    println("EXCHANGE_IN_PLAN=" + j.queryExecution.executedPlan.toString.contains("Exchange"))
    spark.stop()
  }
}
