package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a native sketch aggregate.
  *
  * Computes, per group, sig[i] = min over rows of
  * h_i(x) = (a_i·x + b_i) mod P  (P = 2^31−1,
  * a_i = (i·2654435761+1) mod P, b_i = (i·40503+7) mod P) —
  * EXACTLY the arithmetic the relational form
  * (posexplode(numHashes) → groupBy min) and the DuckDB oracle use,
  * but as a [[TypedImperativeAggregate]] with a mutable Array[Long]
  * buffer: the shuffle carries one `numHashes`-long sketch per group
  * instead of numHashes × shingles rows, and map-side partial
  * aggregation (merge = element-wise min) does the heavy lifting —
  * the same distributive-sketch shape as HLL/datasketches, and the
  * aggregate analog of the reference's merge()-capable
  * AggregateFunction (DataSkew/MyCountAggregate.java,
  * TableAPI/MyAggregateFunctionsForWeightedAvg.java).
  */
case class MinHashSig(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h0 = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val hv = (((i * 2654435761L + 1) % P) * h0 + (i * 40503L + 7) % P) % P
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSig =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSig =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Aggregate Column: groupBy(id).agg(minhashSig($"h0", 32)). */
  def minhashSig(h0: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(h0), numHashes).toAggregateExpression())
}
