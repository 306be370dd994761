package graft.sinks

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Micro-batched at-least-once sink machinery.
  *
  * Re-expresses the reference's sink stack Spark-first: Flink's
  * ElasticsearchSink bulk-flush knobs (Kafka2ES.java:50-73 —
  * maxActions / maxSize / constant-backoff retries), the HBase
  * put-model sink (Kafka2HBase/HBaseSinkFunction.java, HBaseData
  * rowkey/cf/qualifier/value), and the Doris stream-load batch sink
  * (DataGen2Doris.java buffer size/count/flush props).
  *
  * Spark-first shape: request building is a pure per-row function and
  * buffering/flush/retry live in a small driver-free [[BulkBuffer]]
  * used inside `foreachPartition` / `writeStream.foreachBatch` — so
  * delivery is at-least-once per micro-batch exactly like the
  * reference's AT_LEAST_ONCE sinks, and parallelism is the data's
  * partitioning, never a driver loop.
  *
  * The wire protocols (HTTP bulk endpoint, HBase RPC, Doris stream
  * load) are STUBBED behind [[Transport]] — no clients exist in this
  * environment — but request encoding, batching thresholds, and
  * backoff-retry are real and tested.
  */
object GraftSink {

  /** Pluggable transport: ships one flushed bulk. Implementations in
    * prod wrap the real client; tests use [[MemoryTransport]]. */
  trait Transport extends Serializable {
    /** Deliver one bulk payload; throw to trigger backoff-retry. */
    def send(bulk: Array[Array[Byte]]): Unit
  }

  /** Collects bulks in memory (test transport). Thread-safe enough for
    * local[n] foreachPartition use. */
  class MemoryTransport extends Transport {
    val bulks = new ArrayBuffer[Array[Array[Byte]]]() // guarded by this
    override def send(bulk: Array[Array[Byte]]): Unit = synchronized { bulks += bulk }
    def totalActions: Int = synchronized(bulks.map(_.length).sum)
  }

  /** Transport that fails the first `failures` sends — for retry tests. */
  class FlakyTransport(inner: Transport, failures: Int) extends Transport {
    private var remaining = failures
    override def send(bulk: Array[Array[Byte]]): Unit = synchronized {
      if (remaining > 0) { remaining -= 1; throw new RuntimeException("transient sink error") }
      inner.send(bulk)
    }
  }

  /** Bulk buffer with the reference's flush thresholds: flush when
    * `maxActions` requests, `maxBytes` accumulated, or the oldest
    * buffered request is older than `maxAgeMs` (the periodic flush of
    * HBaseSinkFunctionV2/V3's BufferedMutator
    * `writeBufferPeriodicFlushTimeoutMs`, evaluated on add — micro-
    * batch boundaries provide the checkpoint-time flush); constant-
    * backoff retry (`retries` × `backoffMs`) on transport failure —
    * mirrors Elasticsearch7SinkBuilder.setBulkFlushMaxActions/
    * MaxSizeMb/BackoffStrategy(CONSTANT, 3, 500). */
  final class BulkBuffer(transport: Transport, maxActions: Int, maxBytes: Long,
      retries: Int = 3, backoffMs: Long = 500, maxAgeMs: Long = Long.MaxValue,
      clock: () => Long = () => System.currentTimeMillis()) {
    private val buf = new ArrayBuffer[Array[Byte]]()
    private var bytes = 0L
    private var oldestAt = 0L

    def add(request: Array[Byte]): Unit = {
      if (buf.isEmpty) oldestAt = clock()
      buf += request
      bytes += request.length
      if (buf.length >= maxActions || bytes >= maxBytes || clock() - oldestAt >= maxAgeMs) flush()
    }

    def flush(): Unit = if (buf.nonEmpty) {
      val bulk = buf.toArray
      var attempt = 0
      var done = false
      while (!done) {
        try { transport.send(bulk); done = true }
        catch {
          case e: Exception =>
            attempt += 1
            if (attempt > retries) throw e
            Thread.sleep(backoffMs)
        }
      }
      buf.clear()
      bytes = 0L
    }
  }

  // ---- request encoders (the per-system wire formats) ----

  /** ES bulk-API action+source line pair (Kafka2ES createIndexRequest:
    * documents are indexed as-is into a fixed index). */
  def esIndexRequest(index: String, docJson: String): Array[Byte] =
    (s"""{"index":{"_index":"$index"}}""" + "\n" + docJson + "\n").getBytes(StandardCharsets.UTF_8)

  /** HBase put image (HBaseData: rowkey/cf/qualifier/value), length-
    * prefixed fields so the batch is self-describing. */
  def hbasePut(rowKey: Array[Byte], cf: Array[Byte], qualifier: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + rowKey.length + cf.length + qualifier.length + value.length)
    Seq(rowKey, cf, qualifier, value).foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Doris stream-load json-by-line record (DataGen2Doris
    * read_json_by_line=true, format=json). */
  def dorisJsonLine(json: String): Array[Byte] =
    (json + "\n").getBytes(StandardCharsets.UTF_8)

  /** foreachPartition-shaped writer: builds requests row-wise into a
    * per-partition BulkBuffer and flushes the tail — use from
    * `df.foreachPartition` (batch) or `foreachBatch` (streaming). */
  def writePartition[T](rows: Iterator[T], transport: Transport,
      encode: T => Array[Byte], maxActions: Int, maxBytes: Long = Long.MaxValue,
      retries: Int = 3, backoffMs: Long = 500): Unit = {
    val buf = new BulkBuffer(transport, maxActions, maxBytes, retries, backoffMs)
    rows.foreach(r => buf.add(encode(r)))
    buf.flush()
  }
}
