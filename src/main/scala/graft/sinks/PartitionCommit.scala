package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Event-time PARTITION COMMIT for a streaming file sink — Flink's
  * `sink.partition-commit.trigger = partition-time` +
  * `success-file` policy (FileSystem/Hive sink): a day partition is
  * declared COMPLETE — its `_SUCCESS` marker written — only once the
  * stream's event-time high-water proves no on-time row can still
  * land in it. Downstream batch jobs poll for `_SUCCESS`, never for
  * "probably done".
  *
  * Layout: `root/data/b=<batchId>/day=<yyyy-MM-dd>/…parquet` — each
  * micro-batch owns its `b=` directory and OVERWRITES it on replay,
  * so a crash between data write and checkpoint commit replays
  * idempotently (the ExactlyOnce sink's rule, inherited);
  * `root/day=<d>/_SUCCESS` markers live beside the data root, and
  * `root/_meta/max_us` persists the monotone event-time high-water
  * across restarts.
  *
  * Commit rule, Flink's exactly: partition `day` commits when
  * `day_end + commitDelayUs ≤ maxSeen − latenessUs` — the same
  * max−delay arithmetic the engine's watermark uses, computed from
  * the sink's OWN persisted high-water so a restart cannot regress
  * it. Re-committing is a no-op marker rewrite (idempotent).
  *
  * The documented hole is Flink's too: a row LATER than `latenessUs`
  * can land in an already-committed partition (the data is appended,
  * the marker already fired). The upstream answer is
  * `streamingLateSplit` — route beyond-lateness rows to a dead-letter
  * sink instead of a committed partition.
  */
object PartitionCommit {

  private val DayUs = 86400000000L

  /** Readable view of everything committed so far. */
  def committedDays(root: String): Set[String] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Set.empty
    else {
      val it = Files.list(dir).iterator()
      val out = Set.newBuilder[String]
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.startsWith("day=") &&
          Files.exists(p.resolve("_SUCCESS")))
          out += p.getFileName.toString.stripPrefix("day=")
      }
      out.result()
    }
  }

  /** All data rows landed so far (committed or not) — readers that
    * respect the markers filter by [[committedDays]]. */
  def readData(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    // basePath pins partition discovery above the b= level, so b and
    // day both come back as partition columns
    spark.read.option("basePath", s"$root/data").parquet(s"$root/data/b=*")

  private def metaPath(root: String) = Paths.get(root, "_meta", "max_us")

  private def readMaxUs(root: String): Long = {
    val p = metaPath(root)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else Long.MinValue
  }

  private def writeMaxUs(root: String, v: Long): Unit = {
    val p = metaPath(root)
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve("max_us.tmp")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Wire the sink onto a stream with a `ts` event-time column.
    * `latenessUs` is the out-of-orderness budget (the watermark
    * delay's role); `commitDelayUs` is Flink's
    * `sink.partition-commit.delay` — extra settle time past the
    * partition end. */
  def sink(events: DataFrame, root: String, checkpoint: String,
      latenessUs: Long, commitDelayUs: Long,
      tsCol: String = "ts"): DataStreamWriter[org.apache.spark.sql.Row] = {
    require(latenessUs >= 0 && commitDelayUs >= 0,
      s"negative delays: $latenessUs / $commitDelayUs")
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rows = df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
        // idempotent data write: this batch's directory, overwritten on replay
        rows.write.mode("overwrite")
          .partitionBy("day")
          .parquet(s"$root/data/b=$batchId")
        // monotone high-water: max event time ever seen, restart-proof
        val batchMax = df.select(max(unix_micros(col(tsCol)))).head()
        if (!batchMax.isNullAt(0)) {
          val hw = math.max(readMaxUs(root), batchMax.getLong(0))
          writeMaxUs(root, hw)
          // commit every landed day whose window provably drained:
          // day_end + commitDelay <= hw - lateness
          val wm = hw - latenessUs
          // partition inference types day= as DATE — commit wants the
          // literal directory spelling
          val days = readData(df.sparkSession, root)
            .select(col("day").cast("string")).distinct().collect().map(_.getString(0))
          days.foreach { d =>
            val dayStartUs = java.time.LocalDate.parse(d)
              .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
            if (dayStartUs + DayUs + commitDelayUs <= wm) {
              val dir = Paths.get(root, s"day=$d")
              Files.createDirectories(dir)
              Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
            }
          }
        }
        ()
      }
  }
}
