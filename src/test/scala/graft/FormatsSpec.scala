package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.formats.{AvroBinary, CanalJson, DebeziumJson, DelimitedText}

/** Edge cases of the CDC/format decoders: malformed envelopes, DDL
  * events, missing old-images, strict vs lenient csv, avro nulls.
  */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private def lines(xs: String*) = {
    import spark.implicits._
    xs.toDF("payload")
  }

  test("canal: malformed json and DDL envelopes emit zero rows; update without old keeps after-image") {
    import spark.implicits._
    val out = CanalJson.parseChangelog(lines(
      """{"data":[{"id":"1","w":"5.0"}],"type":"INSERT","table":"t","ts":1}""",
      """not json at all""",
      """{"data":[{"id":"2","w":"6.0"}],"type":"UPDATE","table":"t","ts":2}""",
      """{"data":[{"id":"3","w":"7.0"}],"type":"ALTER","isDdl":true,"table":"t","ts":3}"""
    ), col("payload"))
    val rows = out.select($"row_kind", element_at($"fields", "id").as("id")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // UPDATE without `old`: before-image == after-image (both rows emitted)
    assert(rows == Set(("+I", "1"), ("-U", "2"), ("+U", "2")))
  }

  test("canal: multi-row data array expands positionally with old overlay") {
    import spark.implicits._
    val out = CanalJson.parseChangelog(lines(
      """{"data":[{"id":"1","w":"10"},{"id":"2","w":"20"}],
         "old":[{"w":"9"},{"w":"19"}],"type":"UPDATE","table":"t","ts":5}""".replaceAll("\n\\s*", "")
    ), col("payload"))
    val got = out.select($"row_kind", element_at($"fields", "id").as("id"), element_at($"fields", "w").as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("-U", "1", "9"), ("+U", "1", "10"), ("-U", "2", "19"), ("+U", "2", "20")))
  }

  test("debezium: snapshot reads (op=r) become +I; unknown op dropped") {
    import spark.implicits._
    val rowSchema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val out = DebeziumJson.parseChangelog(lines(
      """{"before":null,"after":{"id":1,"v":1.5},"op":"r","ts_ms":9,"source":{"db":"d","table":"t"}}""",
      """{"before":{"id":2,"v":0.5},"after":null,"op":"x","ts_ms":10,"source":{"db":"d","table":"t"}}"""
    ), col("payload"), rowSchema)
    val got = out.select($"row_kind", $"row.id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("+I", 1L)))
  }

  test("csv strict mode keeps malformed rows as nulls; lenient drops them") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val in = lines("1|x", "oops|y", "# comment", "2|z")
    val lenient = DelimitedText.parse(in, col("payload"), schema)
    assert(lenient.count() == 2)
    val strict = DelimitedText.parse(in, col("payload"), schema, ignoreParseErrors = false)
    assert(strict.count() == 3) // comment still dropped; bad row kept with null a
    assert(strict.filter($"a".isNull).count() == 1)
  }

  test("csv: empty non-string fields are NULL, not parse errors; empty string fields stay ''") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", LongType), StructField("c", StringType)))
    val in = lines("1||x", "2|7|", "3|bad|y")
    val out = DelimitedText.parse(in, col("payload"), schema).orderBy("a")
      .collect().map(r => (r.get(0), r.get(1), r.get(2)))
    // row 1: empty numeric b -> NULL, kept; row 2: empty string c -> ''
    // kept; row 3: malformed numeric -> dropped
    assert(out.toSeq == Seq((1L, null, "x"), (2L, 7L, "")))
  }

  test("canal/debezium: ignoreParseErrors=false fails loudly on malformed envelopes") {
    import spark.implicits._
    val bad = lines("""{"not json""")
    intercept[Exception] {
      CanalJson.parseChangelog(bad, col("payload"), ignoreParseErrors = false).collect()
    }
    val rowSchema = StructType(Seq(StructField("id", LongType)))
    intercept[Exception] {
      DebeziumJson.parseChangelog(bad, col("payload"), rowSchema, ignoreParseErrors = false).collect()
    }
    // default stays lenient: zero rows, no failure
    assert(CanalJson.parseChangelog(bad, col("payload")).count() == 0)
  }

  test("avro roundtrip preserves binary fields (BYTES needs ByteBuffer wrapping)") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("blob", BinaryType)))
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, Array.empty[Byte]))
      .toDF("id", "blob")
    val back = AvroBinary.decode(AvroBinary.encode(df, schema), "payload", schema)
    val got = back.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(got == Set((1L, Seq[Byte](1, 2, 3)), (2L, Seq.empty[Byte])))
  }

  test("avro roundtrip preserves values including nulls") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Seq((1L, "alpha", 1.5), (2L, null.asInstanceOf[String], -2.25))
      .toDF("id", "name", "score")
    val back = AvroBinary.decode(AvroBinary.encode(df, schema), "payload", schema)
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "alpha", 1.5), (2L, null, -2.25)))
  }
}
