package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited-text (CSV-style) line decoder over a string column.
  *
  * Mirrors the knobs of Flink's csv format as used by the reference
  * (format/src/main/java/com/felixzh/flink/format/csv/Csv2Csv.java):
  * custom field delimiter (`csv.field-delimiter` = '|'), comment
  * lines (`csv.allow-comments`), and parse-error policy
  * (`csv.ignore-parse-errors`). Decoding is split + per-field cast —
  * all codegen'd builtins, no per-row closure.
  */
object DelimitedText {

  /** Parse delimited lines into `schema`'s fields (in order).
    * Comment lines (starting with `commentChar`) are dropped when
    * `allowComments`; rows with wrong arity or a failed non-string
    * cast are dropped when `ignoreParseErrors`, else kept with null
    * fields. */
  def parse(df: DataFrame, lineCol: Column, schema: StructType, delimiter: String = "|",
      allowComments: Boolean = true, commentChar: String = "#",
      ignoreParseErrors: Boolean = true): DataFrame = {
    val base = if (allowComments) df.filter(!trim(lineCol).startsWith(commentChar)) else df
    // try_cast/try_element_at: ANSI-safe — malformed fields become null
    // (then dropped under ignoreParseErrors) instead of failing the job.
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      expr(s"try_cast(try_element_at(__f, ${i + 1}) AS ${f.dataType.sql})").as(f.name)
    }
    val withCols = base
      .select(split(lineCol, java.util.regex.Pattern.quote(delimiter)).as("__f"))
      .select(fields.toIndexedSeq :+ size(col("__f")).as("__arity"): _*)
    val out =
      if (ignoreParseErrors) {
        val castsOk = schema.fields
          .filter(_.dataType.typeName != "string")
          .map(f => col(f.name).isNotNull)
          .foldLeft(col("__arity") === schema.fields.length)(_ && _)
        withCols.filter(castsOk)
      } else withCols
    out.drop("__arity")
  }
}
