package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit document fingerprint as a NATIVE Catalyst expression.
  *
  * Two independent 31-bit polynomial rolling hashes (mod 2^31-1, the
  * classic Rabin–Karp shape) over the string's chars, packed into one
  * long — collision-resistant enough for corpus-level duplicate
  * candidate keys, and every step is long arithmetic that an oracle
  * SQL engine can replay exactly.
  *
  * This is the extension-path demonstration from SURVEY §4: a scalar
  * kernel too loopy for builtin functions, written as an
  * [[UnaryExpression]] WITH `doGenCode` so it stays inside
  * whole-stage codegen (no UDF serialization, no codegen fence) —
  * the preferred shape for hot-path scalar ops at 100 TB.
  *
  * (The reference's analog surface is the Table-API ScalarFunction,
  * UserDefinedFunctions/TableAPI/MyScalarFunction.java — Flink
  * compiles those into its codegen too; a Spark Scala UDF would not
  * be the equivalent, this is.)
  */
case class Fingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  /** Iterates UTF-16 code units; for ASCII corpora these equal
    * codepoints and UTF-8 bytes, which is what oracle SQL replays. */
  def hash(s: String): Long = {
    val P = 2147483647L // 2^31 - 1
    var h1 = 7L
    var h2 = 13L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      h1 = (h1 * 31 + c) % P
      h2 = (h2 * 37 + c) % P
      i += 1
    }
    (h1 << 31) | h2
  }

  /** Column API: graft.functions.Fingerprint.fingerprint($"text"). */
  def fingerprint(c: Column): Column =
    ColumnBridge.column(Fingerprint(ColumnBridge.expression(c)))

  /** SQL fragment computing the same value in DuckDB (chars =
    * codepoints; exact for ASCII input). */
  def duckdbSql(textExpr: String): String =
    s"""((list_reduce(list_prepend(7::BIGINT,
       |    list_transform(regexp_split_to_array($textExpr, ''), c -> unicode(c)::BIGINT)),
       |    (acc, c) -> ((acc::HUGEINT * 31 + c) % 2147483647)::BIGINT) << 31)
       | | list_reduce(list_prepend(13::BIGINT,
       |    list_transform(regexp_split_to_array($textExpr, ''), c -> unicode(c)::BIGINT)),
       |    (acc, c) -> ((acc::HUGEINT * 37 + c) % 2147483647)::BIGINT))""".stripMargin
}
