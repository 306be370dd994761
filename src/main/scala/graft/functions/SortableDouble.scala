package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving double→int64 bit map (the Lucene sortable-bits
  * trick): `s = bits ^ ((bits >> 63) & 0x7fffffffffffffffL)`.
  *
  * Positive doubles keep their IEEE-754 bit pattern (already
  * order-correct as a signed long); negative doubles get their
  * magnitude bits flipped so the map is a strictly increasing
  * BIJECTION from doubles (NaN excluded) onto a subset of int64 —
  * `-inf → Long.MinValue`, `-0.0 → -1`, `+0.0 → 0`, `+inf` near
  * `Long.MaxValue`.
  *
  * Why it exists: [[graft.operators.Quantiles]] narrows rank targets
  * by equi-width histogram over this integer image, where bucket
  * boundaries and bucket membership are EXACT int64 arithmetic — a
  * float-space histogram can misclassify values within an ulp of a
  * computed boundary and silently corrupt the rank bookkeeping.
  * Injectivity also gives free termination: a one-point integer
  * interval pins a unique double, recovered driver-side by
  * [[SortableDouble.fromSortable]] with no extra scan.
  *
  * Native codegen expression (no UDF) per the SURVEY §4 extension
  * path; stays inside whole-stage codegen.
  */
case class SortableDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sortable_double"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sortable_double needs DOUBLE, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SortableDouble.toSortable(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortableDouble.toSortable($c)")

  override protected def withNewChildInternal(newChild: Expression): SortableDouble =
    copy(child = newChild)
}

/** `divideUnsigned(sb - lo, step)` as ONE codegen expression: the
  * sortable image of all doubles spans nearly the full 64-bit space,
  * so `sb - lo` for an interval straddling zero can exceed
  * Long.MaxValue — the wrapped two's-complement difference is exactly
  * the true UNSIGNED difference (< 2^64), and unsigned division by
  * the (≤ 2^51) step recovers the exact bucket. Doing the subtraction
  * inside the expression also keeps ANSI overflow checks out of the
  * hot path. */
case class SortableBucket(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sortable_bucket"

  override protected def nullSafeEval(sb: Any, lo: Any, step: Any): Any =
    java.lang.Long.divideUnsigned(
      sb.asInstanceOf[Long] - lo.asInstanceOf[Long], step.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"java.lang.Long.divideUnsigned($a - $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SortableBucket =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Equi-depth bucket id of a double against a sorted DISTINCT
  * boundary array: the count of boundaries strictly below the value,
  * by binary search — O(log buckets) per row, codegen'd (the
  * [[NearestCell]]/[[SortableBucket]] native-kernel tier). The
  * when-chain spelling of the same count is O(buckets) per row and at
  * 2^8 boundaries per key its generated code falls out of codegen
  * entirely — measured ~60 µs/row interpreted on the first cut of
  * [[graft.operators.Layout.zorderValue]], vs sub-µs here. */
case class EquiDepthBucket(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_equidepth_bucket"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_equidepth_bucket needs DOUBLE, got ${child.dataType}")
  }

  override protected def nullSafeEval(v: Any): Any =
    SortableDouble.equiDepthBucket(bounds, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("graftEdBounds", bounds, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.SortableDouble.equiDepthBucket($bRef, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): EquiDepthBucket =
    copy(child = newChild)
}

object SortableDouble {

  /** Count of `bs` entries strictly below `v` (`bs` sorted distinct):
    * binarySearch hit index IS that count; a miss's insertion point is
    * too. NaN sorts above every boundary (last bucket), matching the
    * double ordering the boundaries were drawn under. */
  def equiDepthBucket(bs: Array[Double], v: Double): Int = {
    val r = java.util.Arrays.binarySearch(bs, v)
    if (r >= 0) r else -r - 1
  }

  def toSortable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    b ^ ((b >> 63) & 0x7fffffffffffffffL)
  }

  /** Inverse of [[toSortable]] (same involution shape). */
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & 0x7fffffffffffffffL))

  def sortable(c: Column): Column =
    ColumnBridge.column(SortableDouble(ColumnBridge.expression(c)))

  /** Exact histogram bucket of `sb` within [lo, lo + buckets·step) —
    * unsigned interval arithmetic, see [[SortableBucket]]. */
  def bucket(sb: Column, lo: Column, step: Column): Column =
    ColumnBridge.column(SortableBucket(
      ColumnBridge.expression(sb), ColumnBridge.expression(lo),
      ColumnBridge.expression(step)))
}
