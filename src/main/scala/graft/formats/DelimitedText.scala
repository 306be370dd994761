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
    // An empty NON-STRING field means SQL NULL (not a parse error), so
    // a null cast result is only MALFORMED when the raw token was
    // non-empty — '1||x' keeps a null middle column, '1|abc|x' with an
    // INT column is dropped. String fields keep '' verbatim.
    val fields = schema.fields.zipWithIndex.map { case (f, i) =>
      if (f.dataType.typeName == "string")
        expr(s"try_element_at(__f, ${i + 1})").as(f.name)
      else
        expr(s"try_cast(nullif(try_element_at(__f, ${i + 1}), '') AS ${f.dataType.sql})").as(f.name)
    }
    val raws = schema.fields.indices.map(i =>
      expr(s"try_element_at(__f, ${i + 1})").as(s"__r$i"))
    val withCols = base
      .select(split(lineCol, java.util.regex.Pattern.quote(delimiter)).as("__f"))
      .select(fields.toIndexedSeq ++ raws :+ size(col("__f")).as("__arity"): _*)
    val out =
      if (ignoreParseErrors) {
        val castsOk = schema.fields.zipWithIndex
          .filter(_._1.dataType.typeName != "string")
          .map { case (f, i) => col(f.name).isNotNull || col(s"__r$i") === "" }
          .foldLeft(col("__arity") === schema.fields.length)(_ && _)
        withCols.filter(castsOk)
      } else withCols
    out.drop("__arity" +: schema.fields.indices.map(i => s"__r$i"): _*)
  }
}
