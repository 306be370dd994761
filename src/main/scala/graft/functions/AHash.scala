package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, NullType}

/** 60-bit perceptual average-hash of an image payload as a Catalyst
  * expression over BinaryType — the SQL surface of
  * [[graft.operators.Multimodal.AHash60]] (the SAME kernel object;
  * one definition of the bit layout). NULL for undecodable payloads
  * — the SQL twin of the typed path's `decoded = false` flag — so
  * `WHERE graft_ahash(payload) IS NOT NULL` is the routing
  * predicate, and the hash column drops straight into the simhash
  * band-blocking SQL the text family already exposes.
  *
  * [[CodegenFallback]] by design: ImageIO decode dominates the cost
  * by orders of magnitude, so fencing whole-stage codegen here costs
  * nothing (unlike the text kernels, which earn their `doGenCode`).
  */
case class AHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ahash"

  // ExpectsInputTypes' AbstractDataType is private[sql]; enforce the
  // binary argument at analysis by hand (failure, not runtime CCE).
  // An untyped NULL literal is accepted like every builtin does —
  // eval never reaches nullSafeEval for it, so NULL in → NULL out
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ahash expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.Multimodal.AHash60.hash(input.asInstanceOf[Array[Byte]]) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): AHash =
    copy(child = newChild)
}
