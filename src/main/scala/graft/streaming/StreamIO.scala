package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Stream endpoint factory — the configuration seam between pipeline
  * SHAPE and transport.
  *
  * The reference front-ends every job with Kafka
  * (Kafka2Kafka.java:31–57 builds KafkaSource/KafkaSink from
  * bootstrap + topic + offsets; format/canal_json/Kafka2Print.java
  * likewise). Spark's equivalent is `format("kafka")` with the
  * documented option set — which this factory constructs. The test
  * environment has no Kafka broker or connector jar, so the kafka
  * BRANCH is verified at the (format, options) level by unit test,
  * while file/memory endpoints run end-to-end; swapping a pipeline to
  * Kafka is a constructor argument, not a code change — and that
  * claim is now tested at the interface, not asserted in a comment.
  */
object StreamIO {

  sealed trait Endpoint

  /** Kafka topic endpoint (source: subscribe; sink: topic). Extra
    * `kafka.`-prefixed options (security, batching) pass through. */
  case class Kafka(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "latest",
      options: Map[String, String] = Map.empty) extends Endpoint

  /** Directory-of-files endpoint — the environment's Kafka stand-in
    * (a topic's analog: append-only, replayable, checkpointable). */
  case class FileDir(path: String, format: String = "parquet") extends Endpoint

  /** In-memory sink for tests (`spark.table(queryName)`). Source side
    * is unsupported — use MemoryStream in tests. */
  case class Memory(queryName: String) extends Endpoint

  /** Resolved (format, options) a source endpoint will configure on
    * `readStream` — exposed so tests can assert the kafka branch
    * without a broker. Option names follow the Structured Streaming
    * Kafka integration contract. */
  def sourceConfig(ep: Endpoint): (String, Map[String, String]) = ep match {
    case Kafka(bs, topic, so, extra) =>
      ("kafka", Map(
        "kafka.bootstrap.servers" -> bs,
        "subscribe" -> topic,
        "startingOffsets" -> so) ++ extra)
    case FileDir(path, fmt) => (fmt, Map("path" -> path))
    case Memory(name) =>
      throw new IllegalArgumentException(s"Memory($name) is a sink-only endpoint")
  }

  /** Resolved (format, options) a sink endpoint will configure on
    * `writeStream`. */
  def sinkConfig(ep: Endpoint): (String, Map[String, String]) = ep match {
    case Kafka(bs, topic, _, extra) =>
      ("kafka", Map(
        "kafka.bootstrap.servers" -> bs,
        "topic" -> topic) ++ extra)
    case FileDir(path, fmt) => (fmt, Map("path" -> path))
    case Memory(name) => ("memory", Map("queryName" -> name))
  }

  /** Open a streaming reader on `ep`. `schema` is required for file
    * sources (Kafka sources carry their own wire schema:
    * key/value/topic/partition/offset/timestamp). */
  def reader(spark: SparkSession, ep: Endpoint, schema: Option[StructType] = None): DataFrame = {
    val (fmt, opts) = sourceConfig(ep)
    val r = spark.readStream.format(fmt).options(opts)
    schema.foreach(r.schema)
    r.load()
  }

  /** Configure a checkpointed streaming writer to `ep` (caller sets
    * trigger/outputMode overrides and calls `.start()`). */
  def writer(df: DataFrame, ep: Endpoint, checkpointDir: String,
      outputMode: OutputMode = OutputMode.Append): DataStreamWriter[Row] = {
    val (fmt, opts) = sinkConfig(ep)
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .format(fmt)
      .options(opts)
  }
}
