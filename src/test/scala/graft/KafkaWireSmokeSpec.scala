package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Pipelines, StreamIO}

/** Wire smoke for the Kafka endpoints (ref semantics:
  * Kafka2Kafka.java:27-45 — KafkaSource/KafkaSink from bootstrap +
  * topic + offsets). The sandbox has neither a broker nor the
  * `spark-sql-kafka-0-10` connector jar (it does not resolve offline —
  * SURVEY §2a records the attempt), so [[StreamIO]]'s kafka branch is
  * unit-pinned at the (format, options) level and THIS spec closes the
  * remaining gap conditionally: on a real cluster it drives the exact
  * same factory-built option set end-to-end against a live broker.
  *
  * Cluster verification is one command:
  * {{{
  * SPARK_GRAFT_KAFKA_SMOKE=<bootstrap-servers> sbt "testOnly graft.KafkaWireSmokeSpec"
  * }}}
  * Unset (or with the connector jar absent) the test CANCELS cleanly —
  * it never fails an environment that cannot run it.
  */
class KafkaWireSmokeSpec extends AnyFunSuite {
  import TestSpark._

  private val smoke = sys.env.get("SPARK_GRAFT_KAFKA_SMOKE")

  /** The connector registers this provider; its absence means the
    * format("kafka") branch cannot load in this JVM. */
  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  test("stream_kafka2kafka wire smoke: factory option set end-to-end against a live broker") {
    assume(smoke.isDefined,
      "SPARK_GRAFT_KAFKA_SMOKE unset — no broker in this environment. On a cluster: " +
        "SPARK_GRAFT_KAFKA_SMOKE=<bootstrap> sbt \"testOnly graft.KafkaWireSmokeSpec\"")
    assume(connectorPresent,
      "spark-sql-kafka-0-10 connector jar is not on the classpath")
    val bootstrap = smoke.get
    val run = java.util.UUID.randomUUID().toString.take(8)
    val inTopic = s"graft_smoke_in_$run"
    val outTopic = s"graft_smoke_out_$run"
    import spark.implicits._
    // seed topic A through the connector's batch writer (the same
    // option names sinkConfig builds)
    (1 to 100).map(i => (s"k$i", s"v$i")).toDF("key", "value")
      .selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", inTopic)
      .save()
    // the pipeline under test: the SAME factory endpoints the unit
    // contract pins, driven for real — kafka in, kafka out
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kafka_smoke_ckpt").toString
    Pipelines.passThroughPipeline(spark,
      StreamIO.Kafka(bootstrap, inTopic, startingOffsets = "earliest"),
      StreamIO.Kafka(bootstrap, outTopic),
      ckpt, df => df.selectExpr("key", "value"), srcSchema = None)
    val got = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", outTopic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) AS v").as[String].collect().toSet
    assert(got === (1 to 100).map(i => s"v$i").toSet)
  }
}
