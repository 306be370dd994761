package graft.formats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-JSON changelog decoder.
  *
  * Re-expresses Flink's `debezium-json` format (reference:
  * format/src/main/java/com/felixzh/flink/format/debezium_json/
  * Kafka2Print.java, MySqlCDC2Print.java): envelope
  * `{before, after, op: c|u|d|r, ts_ms, source{db,table}}` decoded to
  * the row-kind changelog (+I for c/r snapshot reads, -U/+U for u,
  * -D for d).
  *
  * `rowSchema` is the user-declared table schema (the reference
  * declares it in DDL: id BIGINT, name STRING, ...); before/after are
  * typed structs, not stringified maps — the one wire-format
  * difference from canal-json.
  */
object DebeziumJson {

  def envelopeSchema(rowSchema: StructType): StructType = StructType(Seq(
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType))))
  ))

  /** Decode debezium-json strings → (row_kind, table, ts_ms, row
    * struct). Unparseable envelopes and unknown ops emit zero rows
    * (`debezium-json.ignore-parse-errors`); the drop is folded into
    * the generator (unmatched CASE → null → explode drops the row) so
    * the envelope parses exactly once — see CanalJson.parseChangelog's
    * plan-shape note. */
  def parseChangelog(df: DataFrame, jsonCol: Column, rowSchema: StructType,
      ignoreParseErrors: Boolean = true): DataFrame = {
    // ignoreParseErrors=false → Flink's fail-on-malformed (FAILFAST)
    val mode = if (ignoreParseErrors) "PERMISSIVE" else "FAILFAST"
    val parsed = df.select(from_json(jsonCol, envelopeSchema(rowSchema), Map("mode" -> mode)).as("e"))
    parsed
      .select(
        col("e.source.table").as("table"),
        col("e.ts_ms").as("ts_ms"),
        explode(
          when(col("e.op").isin("c", "r"), array(struct(lit("+I").as("row_kind"), col("e.after").as("row"))))
            .when(col("e.op") === "d", array(struct(lit("-D").as("row_kind"), col("e.before").as("row"))))
            .when(col("e.op") === "u", array(
              struct(lit("-U").as("row_kind"), col("e.before").as("row")),
              struct(lit("+U").as("row_kind"), col("e.after").as("row"))))
        ).as("chg"))
      .select(col("chg.row_kind").as("row_kind"), col("table"), col("ts_ms"), col("chg.row").as("row"))
  }
}
