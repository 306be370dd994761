package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash as a native sketch aggregate.
  *
  * Per group: for each (termFrequency tf, wordHash h) row, add tf to
  * bit-counter j when bit j of h is set, else subtract; the final
  * fingerprint sets bit j when counter j >= 0 — identical arithmetic
  * to the relational form (explode 60 bit rows → groupBy sum) and the
  * DuckDB oracle, but the shuffle carries one 60-long counter buffer
  * per group with map-side combine instead of 60× the word rows.
  * Companion sketch to [[MinHashSig]].
  */
case class SimHashAgg(
    left: Expression,  // tf: long
    right: Expression, // word hash: long (60 significant bits)
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val Bits = 60

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val tfv = left.eval(input)
    val hv = right.eval(input)
    if (tfv != null && hv != null) {
      val tf = tfv.asInstanceOf[Long]
      val h = hv.asInstanceOf[Long]
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) buf(j) += tf else buf(j) -= tf
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Bits) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var fp = 0L
    var j = 0
    while (j < Bits) { if (buf(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * Bits)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashAgg =
    copy(left = l, right = r)
}

object SimHashAgg {
  /** Aggregate Column: groupBy(id).agg(simhashAgg($"tf", $"h")). */
  def simhashAgg(tf: Column, wordHash: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(tf), ColumnBridge.expression(wordHash)).toAggregateExpression())
}
