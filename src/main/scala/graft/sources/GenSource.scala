package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Checkpointed, rate-limited, parallel generator source — the
  * DataSourceV2 twin of the reference's CustomSourceV2.java
  * (DataGeneratorSource + RateLimiterStrategy.perSecond(100),
  * parallelism 2, printable-ASCII payload): the Spark extension point
  * a user of the reference's custom-source pattern would reach for.
  *
  * {{{
  * spark.readStream.format("graft.sources.GraftGenSource")
  *   .option("rowsPerSecond", 100).option("numPartitions", 2).load()
  * }}}
  *
  * Offsets are a single monotonically-increasing row count, committed
  * to the checkpoint WAL by the engine; partition `p` of `n` owns the
  * ids ≡ p (mod n) of each [start, end) range, so a restart resumes
  * every partition exactly where it left off (no dupes, no gaps) —
  * the per-split checkpointing Flink's DataGeneratorSource gets from
  * its enumerator state. The payload is the DETERMINISTIC printable
  * generator shared with q23/dataGenStream (the reference uses
  * SecureRandom; determinism is what makes exactly-once observable in
  * a test — same trade as its commented-out `"Number: " + index`).
  */
class GraftGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftGenSource.GenTable(new CaseInsensitiveStringMap(properties))
}

object GraftGenSource {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Deterministic printable-ASCII payload for row `id` (same formula
    * as streaming.Pipelines.dataGenStream / MiscQ q23). */
  def payload(id: Long, len: Int): String = {
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) {
      sb.append((32 + java.lang.Math.floorMod(id * 31 + i * 17, 95)).toChar)
      i += 1
    }
    sb.toString
  }

  private[sources] class GenTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
    override def name(): String = "graft_gen"
    override def schema(): StructType = GraftGenSource.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

    override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder = {
      // table properties carry the .option(...)s in this provider path
      val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
      merged.putAll(caseInsensitiveOptions.asCaseSensitiveMap())
      val opts = new CaseInsensitiveStringMap(merged)
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = GraftGenSource.schema
          override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
            new GenMicroBatchStream(
              rowsPerSecond = opts.getLong("rowsPerSecond", 100L),
              numPartitions = opts.getInt("numPartitions", 2),
              payloadLen = opts.getInt("payloadLen", 64))
        }
      }
    }
  }

  private[sources] case class GenOffset(rows: Long) extends Offset {
    override def json(): String = rows.toString
  }

  private[sources] class GenMicroBatchStream(rowsPerSecond: Long, numPartitions: Int, payloadLen: Int)
      extends MicroBatchStream with SupportsAdmissionControl {
    require(rowsPerSecond > 0 && numPartitions > 0 && payloadLen > 0)

    // Rate limiting via admission control: this run admits rows from
    // a fixed ANCHOR — the offset committed when the stream (re)
    // started — at anchor + floor(elapsed * rps) (the
    // RateLimiterStrategy.perSecond contract). The anchor latches on
    // the FIRST latestOffset call: adding elapsed time to every
    // batch's own start offset would compound (quadratic admission),
    // and a plain creation-time latestOffset() would fall below the
    // committed offset after a restart and stall the stream.
    private val startMs = System.currentTimeMillis()
    private var anchorRows = -1L

    override def initialOffset(): Offset = GenOffset(0L)

    override def latestOffset(): Offset =
      throw new UnsupportedOperationException(
        "latestOffset(Offset, ReadLimit) should be called instead of this method")

    override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val s = start.asInstanceOf[GenOffset].rows
      if (anchorRows < 0) anchorRows = s
      val admitted = anchorRows + (System.currentTimeMillis() - startMs) * rowsPerSecond / 1000L
      GenOffset(math.max(s, admitted))
    }

    override def deserializeOffset(json: String): Offset = GenOffset(json.toLong)

    override def commit(end: Offset): Unit = ()

    override def stop(): Unit = ()

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
      val s = start.asInstanceOf[GenOffset].rows
      val e = end.asInstanceOf[GenOffset].rows
      Array.tabulate[InputPartition](numPartitions)(p =>
        GenInputPartition(p, numPartitions, s, e, payloadLen))
    }

    override def createReaderFactory(): PartitionReaderFactory = GenReaderFactory
  }

  private case class GenInputPartition(
      partitionId: Int, numPartitions: Int, start: Long, end: Long, payloadLen: Int)
    extends InputPartition

  private object GenReaderFactory extends PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[GenInputPartition]
      new PartitionReader[InternalRow] {
        // first id >= start owned by this partition (id % n == pid)
        private var id = p.start + java.lang.Math.floorMod(p.partitionId - p.start, p.numPartitions.toLong)
        private var current: Long = -1L

        override def next(): Boolean =
          if (id < p.end) { current = id; id += p.numPartitions; true } else false

        override def get(): InternalRow =
          InternalRow(current, UTF8String.fromString(payload(current, p.payloadLen)))

        override def close(): Unit = ()
      }
    }
  }
}
