package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Sorted cut points of an ARBITRARY orderable Spark type (string,
  * long, timestamp, struct — anything `repartitionByRange` accepts),
  * held as CATALYST values, with a binary-search position lookup
  * under Spark's own interpreted ordering for the type.
  *
  * [[EquiDepthBucket]] is this idea specialized to doubles (a
  * primitive `Arrays.binarySearch`, the Z-order quantizer's hot
  * path); this generic form exists for
  * [[graft.streaming.CompactingLake]]'s shard assignment, where the
  * cluster key is whatever the lake instantiation clusters on —
  * `(term, doc_id)` structs for the index lakes, numeric key tuples
  * for the layout lakes — and the cut values come back from parquet
  * as external rows. Using Spark's `TypeUtils.getInterpretedOrdering`
  * (not a hand-rolled comparator) guarantees the driver-side search
  * and the executor-side range predicates (`sv >= lo && sv < hi`,
  * plain Catalyst comparisons) order identically — a divergence
  * would route rows to one shard and filter them under another. */
final class RangeCuts(val cuts: Array[Any], val dt: DataType)
    extends Serializable {
  @transient private lazy val ord =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
      .asInstanceOf[Ordering[Any]]

  /** Count of cuts ≤ v (cuts ascending, catalyst values): the range
    * position of v among K = cuts.length+1 buckets. A NULL key sorts
    * below every cut (Spark's nulls-first default) → position 0. */
  def pos(v: Any): Int = {
    if (v == null) return 0
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(cuts(mid), v) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }
}

/** Range-bucket position of `child` against [[RangeCuts]] — the
  * generic-type sibling of [[EquiDepthBucket]] (same O(log K) binary
  * search, same native-expression tier: at 100 TB a lake can carry
  * tens of thousands of shards, and the when-chain spelling of the
  * same count is O(K) per row and falls out of whole-stage codegen).
  * Codegen emits one virtual call into the shared searcher — the
  * boxing on primitive children is the price of type genericity,
  * paid only on the compaction slicing path, never in a query. */
case class RangeBucket(child: Expression, cuts: RangeCuts)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_range_bucket"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == cuts.dt)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_range_bucket: child type ${child.dataType.sql} != cut type ${cuts.dt.sql}")
  }

  // NULL-tolerant by design (null → bucket 0), so eval is custom
  // rather than the nullSafeEval template
  override def eval(input: InternalRow): Any = cuts.pos(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("graftRangeCuts", cuts,
      classOf[RangeCuts].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = $cRef.pos(${c.isNull} ? null : (Object)(${c.value}));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RangeBucket =
    copy(child = newChild)
}

object RangeBucket {
  def bucket(c: Column, cuts: RangeCuts): Column =
    ColumnBridge.column(RangeBucket(ColumnBridge.expression(c), cuts))
}
