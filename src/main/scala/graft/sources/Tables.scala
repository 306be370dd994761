package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver test data.
  *
  * Declarative `spark.read.parquet` so Catalyst prunes columns and
  * pushes predicates into the scan — the 100 TB path depends on never
  * reading bytes a query doesn't need. (The reference declares its
  * tables via Flink SQL DDL over Kafka topics, e.g.
  * format/csv/Csv2Csv.java:27-41; here the storage is columnar files
  * so the scan itself is the optimization surface.)
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts normalizes to a microsecond TimestampType column
    * regardless of how the file stored it. Driver-generated corpora
    * have shipped both parquet TIMESTAMP(NANOS) (decoded as an int64
    * nanosecond epoch under legacy.parquet.nanosAsLong, set by
    * GraftSession.tuned) and TIMESTAMP(MICROS) without timezone
    * (decoded as TIMESTAMP_NTZ). Branch on the DECODED type — a
    * session flag alone cannot tell which annotation the file carries.
    * Session timezone is pinned to UTC (GraftSession.tuned), so the
    * NTZ→Timestamp cast is an identity on the stored micros. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // A TIMESTAMP(NANOS) file read WITHOUT nanosAsLong dies inside
    // parquet schema conversion with an unactionable message — rethrow
    // with the cure (GraftSession.tuned sets the flag).
    val raw = try table(s, d, "events") catch {
      case e: Exception if Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .take(8).exists(t => Option(t.getMessage).exists(_.contains("NANOS"))) =>
        throw new IllegalStateException(
          s"$d/events.parquet stores parquet TIMESTAMP(NANOS); set " +
          "spark.sql.legacy.parquet.nanosAsLong=true (GraftSession.tuned does) " +
          "so it decodes as an int64 nanosecond epoch", e)
    }
    val ts = raw.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)") // nanos-as-long
      case TimestampNTZType => col("ts").cast(TimestampType)
      case TimestampType    => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts decoded as unexpected type $other — expected LongType " +
        "(TIMESTAMP(NANOS) under spark.sql.legacy.parquet.nanosAsLong), " +
        s"TIMESTAMP_NTZ, or TIMESTAMP; check the annotation of $d/events.parquet")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // ---- memoized base-table scalars -------------------------------------
  // Adaptive (operators/Adaptive.scala) derives LSH widths / df-caps from
  // BASE TABLE counts. Eight query builders each ran their own count()
  // job inside the timed region — a repeated fixed cost (the count is a
  // parquet-footer metadata read, but still a scheduled job). The inputs
  // are immutable driver-generated files, so a (applicationId, key) memo
  // is safe: a new SparkContext (new test JVM/session) recomputes.
  private val scalarMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()

  /** Memoize an expensive deterministic Long-valued driver action under
    * `key` (callers include the data dir in the key). */
  def memoizedLong(s: SparkSession, key: String)(compute: => Long): Long =
    scalarMemo.computeIfAbsent((s.sparkContext.applicationId, key), _ => compute)

  def documentCount(s: SparkSession, d: String): Long =
    memoizedLong(s, s"$d/documents#count")(documents(s, d).count())
  /** On-disk bytes of the documents table (Hadoop FS metadata, no
    * Spark job). Upper-bounds any derived vocabulary's size: every
    * distinct token appears in the text, so vocab bytes ≤ corpus
    * bytes even on a degenerate all-unique-token corpus. */
  def documentBytes(s: SparkSession, d: String): Long =
    memoizedLong(s, s"$d/documents#bytes") {
      val p = new org.apache.hadoop.fs.Path(s"$d/documents.parquet")
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    }
  def embeddingCount(s: SparkSession, d: String): Long =
    memoizedLong(s, s"$d/embeddings#count")(embeddings(s, d).count())
}
