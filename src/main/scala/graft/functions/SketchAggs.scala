package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native aggregate wrappers over the sketch kernels ([[KmvSketch]],
  * [[MisraGries]]), putting the sketch family on the SQL surface next
  * to `graft_minhash_sig`: `SELECT graft_kmv(h, 1024) FROM ...` works
  * from `spark.sql` alone, through [[graft.GraftExtensions]]. The
  * fold/merge arithmetic is THE SAME OBJECT as the typed path
  * (SketchQ's udaf route), so SQL-surface results are bit-identical
  * to the Column-API results by construction — the rule the media
  * surface (graft_ahash et al.) established in round 10.
  *
  * [[TypedImperativeAggregate]] rather than a registered udaf because
  * extension injection happens before any session exists (udaf
  * registration needs a live SparkSession), and because the native
  * buffer skips the ScalaAggregator encoder round-trip per partial
  * row — the same reasoning as [[MinHashSig]].
  */

/** `graft_kmv(h, k)` — KMV bottom-k distinct sketch over 60-bit keys;
  * returns STRUCT<k_used BIGINT, kth_min BIGINT, est_distinct DOUBLE>
  * (exact when the group has < k distinct keys). */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression] {

  private lazy val kernel = new KmvSketch(k)

  override def createAggregationBuffer(): KmvBuf = kernel.zero

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v == null) buf else kernel.reduce(buf, v.asInstanceOf[Long])
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = kernel.merge(a, b)

  override def eval(buf: KmvBuf): Any = {
    val o = kernel.finish(buf)
    InternalRow(o.k_used, o.kth_min, o.est_distinct)
  }

  override def serialize(buf: KmvBuf): Array[Byte] = KmvAgg.ser(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf = KmvAgg.deser(bytes, k)

  override def dataType: DataType = StructType(Seq(
    StructField("k_used", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = false),
    StructField("est_distinct", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(offset: Int): KmvAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  private[functions] def ser(buf: KmvBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }
  private[functions] def deser(bytes: Array[Byte], k: Int): KmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Long](k)
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    KmvBuf(arr, n)
  }

  /** Aggregate Column twin: groupBy(g).agg(kmv($"h", 1024)). */
  def kmv(h: Column, k: Int): Column =
    ColumnBridge.column(KmvAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}

/** `graft_kmv_arr(h, k)` — the sketch's full sorted bottom-k array,
  * for KMV set operations (union/Jaccard across sketches without
  * joining the corpora — q71's shape) from SQL. */
case class KmvArrAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression] {

  private lazy val kernel = new KmvSketch(k)

  override def createAggregationBuffer(): KmvBuf = kernel.zero

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v == null) buf else kernel.reduce(buf, v.asInstanceOf[Long])
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = kernel.merge(a, b)

  override def eval(buf: KmvBuf): Any =
    new GenericArrayData(java.util.Arrays.copyOfRange(buf.arr, 0, buf.n))

  override def serialize(buf: KmvBuf): Array[Byte] = KmvAgg.ser(buf)
  override def deserialize(bytes: Array[Byte]): KmvBuf = KmvAgg.deser(bytes, k)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_arr"

  override def withNewMutableAggBufferOffset(offset: Int): KmvArrAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvArrAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KmvArrAgg =
    copy(child = newChild)
}

object KmvArrAgg {
  def kmvArr(h: Column, k: Int): Column =
    ColumnBridge.column(KmvArrAgg(ColumnBridge.expression(h), k).toAggregateExpression())
}

/** `graft_mg_candidates(token, k)` — Misra–Gries heavy-hitter
  * CANDIDATE set (sorted array of strings): every token with true
  * frequency > N/k is guaranteed present under any partitioning; the
  * caller re-counts candidates exactly (q72's two-pass contract —
  * MG's order-dependent counts are never emitted). */
case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Map[String, Long]] with UnaryLike[Expression] {

  private lazy val kernel = new MisraGries(k)

  override def createAggregationBuffer(): Map[String, Long] = kernel.zero

  override def update(m: Map[String, Long], input: InternalRow): Map[String, Long] = {
    val v = child.eval(input)
    if (v == null) m else kernel.reduce(m, v.asInstanceOf[UTF8String].toString)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    kernel.merge(a, b)

  override def eval(m: Map[String, Long]): Any =
    new GenericArrayData(kernel.finish(m).map(UTF8String.fromString).toArray[Any])

  override def serialize(m: Map[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Map[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    (0 until n).map { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8) -> in.readLong()
    }.toMap
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_candidates"

  override def withNewMutableAggBufferOffset(offset: Int): MgCandidates =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MgCandidates =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MgCandidates =
    copy(child = newChild)
}

object MgCandidates {
  def mgCandidates(token: Column, k: Int): Column =
    ColumnBridge.column(MgCandidates(ColumnBridge.expression(token), k).toAggregateExpression())
}
