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
  * `root/day=<d>/_SUCCESS` markers live beside the data root;
  * `root/_meta/max_us` persists the monotone event-time high-water
  * and `root/_meta/pending_days` the landed-but-uncommitted partition
  * registry (bounded by OPEN days — the sink never lists the data
  * root, which would be O(batches) driver work) across restarts.
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
  private def pendingPath(root: String) = Paths.get(root, "_meta", "pending_days")

  private def readMaxUs(root: String): Long = {
    val p = metaPath(root)
    if (Files.exists(p)) new String(Files.readAllBytes(p), "UTF-8").trim.toLong
    else Long.MinValue
  }

  private def atomicWrite(p: java.nio.file.Path, body: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.getParent.resolve(p.getFileName.toString + ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def writeMaxUs(root: String, v: Long): Unit =
    atomicWrite(metaPath(root), v.toString)

  /** Days landed but not yet committed — the sink's OWN registry (a
    * per-batch listing of every b= directory would be O(batches) on
    * the driver; Flink's sink tracks pending partitions in state the
    * same way). Bounded by the number of OPEN days: committed days
    * leave the file. */
  private def readPending(root: String): Set[String] = {
    val p = pendingPath(root)
    if (Files.exists(p))
      new String(Files.readAllBytes(p), "UTF-8").linesIterator
        .map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty
  }

  private def writePending(root: String, days: Set[String]): Unit =
    atomicWrite(pendingPath(root), days.toSeq.sorted.mkString("\n"))

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
        // batch-local persist (not the shared CachePool — a sink must
        // never drain caches other operators hold)
        val rows = df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd")).persist()
        // idempotent data write: this batch's directory, overwritten on replay
        rows.write.mode("overwrite")
          .partitionBy("day")
          .parquet(s"$root/data/b=$batchId")
        // one pass over the CACHED batch yields both the high-water
        // and this batch's landed days — never a listing of the data
        // root (that would be O(batches) driver work; the pending-days
        // registry is the sink's partition state, as Flink's)
        val stats = rows.agg(max(unix_micros(col(tsCol))),
          collect_set(col("day"))).head()
        rows.unpersist()
        if (!stats.isNullAt(0)) {
          val hw = math.max(readMaxUs(root), stats.getLong(0))
          writeMaxUs(root, hw)
          val landed = stats.getSeq[String](1).toSet
          val pending = readPending(root) ++ landed
          // commit every pending day whose window provably drained:
          // day_end + commitDelay <= hw - lateness
          val wm = hw - latenessUs
          val committed = pending.filter { d =>
            val dayStartUs = java.time.LocalDate.parse(d)
              .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
            dayStartUs + DayUs + commitDelayUs <= wm
          }
          committed.foreach { d =>
            val dir = Paths.get(root, s"day=$d")
            Files.createDirectories(dir)
            Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
          }
          writePending(root, pending -- committed)
        }
        ()
      }
  }
}
