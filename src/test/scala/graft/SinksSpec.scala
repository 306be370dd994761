package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.GraftSink
import graft.sinks.GraftSink._

/** Bulk-sink machinery (SURVEY §2 sink_kafka_like): flush thresholds,
  * constant-backoff retry, request encodings, foreachPartition
  * integration — the semantics of the reference's ES/HBase/Doris
  * sinks with the transports stubbed.
  */
object SinksSpec {
  /** Statically resolved so executor-side task closures hit the same
    * instance in local mode (closures are serialized even locally). */
  val shared = new GraftSink.MemoryTransport
}

class SinksSpec extends AnyFunSuite {
  import TestSpark._

  private def bytes(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("flushes every maxActions requests plus the tail") {
    val t = new MemoryTransport
    val buf = new BulkBuffer(t, maxActions = 3, maxBytes = Long.MaxValue, retries = 0, backoffMs = 0)
    (1 to 7).foreach(i => buf.add(bytes(s"r$i")))
    buf.flush()
    assert(t.bulks.map(_.length).toSeq == Seq(3, 3, 1))
  }

  test("flushes on maxBytes threshold") {
    val t = new MemoryTransport
    val buf = new BulkBuffer(t, maxActions = 1000, maxBytes = 10, retries = 0, backoffMs = 0)
    (1 to 4).foreach(_ => buf.add(bytes("123456"))) // 6 bytes each → flush every 2
    buf.flush()
    assert(t.bulks.map(_.length).toSeq == Seq(2, 2))
  }

  test("flushes on buffer age (periodic flush, HBaseSinkFunctionV2 semantics)") {
    var now = 0L
    val t = new MemoryTransport
    val buf = new BulkBuffer(t, maxActions = 1000, maxBytes = Long.MaxValue,
      retries = 0, backoffMs = 0, maxAgeMs = 100, clock = () => now)
    buf.add(bytes("a")); now = 50
    buf.add(bytes("b")) // age 50 < 100: no flush
    assert(t.bulks.isEmpty)
    now = 120
    buf.add(bytes("c")) // oldest is 120ms old → flush all three
    assert(t.bulks.map(_.length).toSeq == Seq(3))
    buf.flush()
    assert(t.totalActions == 3)
  }

  test("constant-backoff retry recovers from transient transport failures") {
    val mem = new MemoryTransport
    val flaky = new FlakyTransport(mem, failures = 2)
    val buf = new BulkBuffer(flaky, maxActions = 10, maxBytes = Long.MaxValue, retries = 3, backoffMs = 1)
    buf.add(bytes("x"))
    buf.flush()
    assert(mem.totalActions == 1)
  }

  test("retry gives up after the configured attempts") {
    val mem = new MemoryTransport
    val flaky = new FlakyTransport(mem, failures = 5)
    val buf = new BulkBuffer(flaky, maxActions = 10, maxBytes = Long.MaxValue, retries = 2, backoffMs = 1)
    buf.add(bytes("x"))
    intercept[RuntimeException](buf.flush())
  }

  test("es bulk request encodes action+source lines") {
    val r = new String(esIndexRequest("idx1", """{"a":1}"""), StandardCharsets.UTF_8)
    assert(r == "{\"index\":{\"_index\":\"idx1\"}}\n{\"a\":1}\n")
  }

  test("hbase put image roundtrips length-prefixed fields") {
    val put = hbasePut(bytes("rk"), bytes("cf1"), bytes("q"), bytes("value"))
    val bb = java.nio.ByteBuffer.wrap(put)
    val fields = (1 to 4).map { _ =>
      val a = new Array[Byte](bb.getInt); bb.get(a); new String(a, StandardCharsets.UTF_8)
    }
    assert(fields == Seq("rk", "cf1", "q", "value"))
  }

  test("foreachPartition integration: all rows delivered at least once") {
    import spark.implicits._
    SinksSpec.shared.synchronized(SinksSpec.shared.bulks.clear())
    val df = spark.range(0, 100).map(i => s"""{"id":$i}""").toDF("json")
    // Task closures serialize even in local mode — route through the
    // statically-resolved object transport, as a prod sink would route
    // through a per-executor client.
    val write: Iterator[org.apache.spark.sql.Row] => Unit = it =>
      GraftSink.writePartition(it, SinksSpec.shared,
        (r: org.apache.spark.sql.Row) => GraftSink.dorisJsonLine(r.getString(0)), maxActions = 8)
    df.repartition(4).foreachPartition(write)
    assert(SinksSpec.shared.totalActions == 100)
  }
}
