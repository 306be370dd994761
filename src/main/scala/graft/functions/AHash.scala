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

object AHash {
  /** Column-API form (the simhash60 convention): 60-bit perceptual
    * image hash, NULL for undecodable payloads. */
  def ahash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      AHash(org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))
}

/** 60-bit audio envelope hash as a Catalyst expression over
  * BinaryType — the SQL surface of
  * [[graft.operators.Multimodal.AudioHash60]] (the SAME kernel
  * object). NULL for undecodable or sub-60-frame payloads, so the
  * SQL near-dup pipeline routes with `IS NOT NULL` exactly like
  * [[AHash]]. [[CodegenFallback]]: javax.sound decode dominates. */
case class AudioHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audiohash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_audiohash expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.Multimodal.AudioHash60.hash(input.asInstanceOf[Array[Byte]]) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  override protected def withNewChildInternal(newChild: Expression): AudioHash =
    copy(child = newChild)
}

object AudioHash {
  /** Column-API form: 60-bit audio envelope hash, NULL for
    * undecodable or sub-60-frame payloads. */
  def audiohash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      AudioHash(org.apache.spark.sql.graftbridge.ColumnBridge.expression(payload)))
}

/** Per-frame 60-bit aHashes of a video payload (Y4M or MJPEG) as an
  * ARRAY<BIGINT> — the SQL generator for video near-dup: sample up
  * to `n` evenly-spaced REAL frames, aHash each
  * ([[graft.operators.Multimodal.frameHashes]], the videoNearDups
  * kernel), and let the user `posexplode` into (frame_idx, hash)
  * rows that drop into the simhash band-blocking SQL. Empty array
  * for undecodable payloads (a generator's NULL-analog: explodes to
  * zero rows, never kills the scan); NULL in → NULL out like every
  * builtin. */
case class FrameHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && n <= 1024, s"graft_framehashes: n must be in [1, 1024], got $n")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_framehashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_framehashes expects BINARY, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      graft.operators.Multimodal.frameHashes(input.asInstanceOf[Array[Byte]], n).toArray)

  override protected def withNewChildInternal(newChild: Expression): FrameHashes =
    copy(child = newChild)
}
