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

  // ---- DataSourceV2 format providers (reference: format/ SQL-DDL UX) ----

  private val canalEnvelopes = Seq(
    """{"data":[{"id":"1","w":"5.0"}],"type":"INSERT","table":"t","ts":1}""",
    """not json at all""",
    """{"data":[{"id":"2","w":"6.0"}],"old":[{"w":"5.5"}],"type":"UPDATE","table":"t","ts":2}""",
    """{"data":[{"id":"3","w":"7.0"}],"type":"UPDATE","table":"t","ts":3}""",
    """{"data":[{"id":"4","w":"8.0"},{"id":"5","w":"9.0"}],"old":[{"w":"7.5"},{"w":"8.5"}],"type":"UPDATE","table":"t","ts":4}""",
    """{"data":[{"id":"6","w":"1.0"}],"type":"DELETE","table":"t","ts":5}""",
    """{"data":[{"id":"7","w":"2.0"}],"type":"ALTER","isDdl":true,"table":"t","ts":6}""",
    // null data ELEMENTS: posexplode emits them as rows (null fields)
    """{"data":[null,{"id":"10","w":"1.5"}],"old":[{"w":"0.5"},{"w":"1.0"}],"type":"UPDATE","table":"t","ts":7}""",
    """{"data":[null],"type":"INSERT","table":"t","ts":8}""")

  private def writeLines(dir: java.nio.file.Path, name: String, xs: Seq[String]): Unit =
    java.nio.file.Files.write(dir.resolve(name),
      xs.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def canalKey(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
      Option(r.getAs[Map[String, String]](3)).map(_.toSeq.sorted).orNull)

  test("dsv2 graft-canal-json batch read matches the column decoder row for row") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canal-src")
    writeLines(dir, "00000.json", canalEnvelopes)
    val viaFormat = spark.read.format("graft-canal-json").option("path", dir.toString).load()
    assert(viaFormat.schema == graft.sources.ChangelogFileSource.canalOutputSchema)
    val viaColumns = CanalJson.parseChangelog(canalEnvelopes.toDF("payload"), col("payload"))
    val a = viaFormat.collect().map(canalKey).sortBy(_.toString).toSeq
    val b = viaColumns.collect().map(canalKey).sortBy(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("dsv2 graft-debezium-json batch read matches the column decoder (typed row via rowSchema DDL)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dbz-src")
    val envs = Seq(
      """{"before":null,"after":{"id":1,"v":1.5},"op":"c","ts_ms":9,"source":{"db":"d","table":"t"}}""",
      """{"before":null,"after":{"id":2,"v":2.5},"op":"r","ts_ms":10,"source":{"db":"d","table":"t"}}""",
      """{"before":{"id":2,"v":2.5},"after":{"id":2,"v":3.5},"op":"u","ts_ms":11,"source":{"db":"d","table":"t"}}""",
      """{"before":{"id":1,"v":1.5},"after":null,"op":"d","ts_ms":12,"source":{"db":"d","table":"t"}}""",
      """broken{""",
      """{"before":{"id":9,"v":0.5},"after":null,"op":"x","ts_ms":13,"source":{"db":"d","table":"t"}}""")
    writeLines(dir, "00000.json", envs)
    val rowSchema = StructType(Seq(StructField("id", LongType), StructField("v", DoubleType)))
    val viaFormat = spark.read.format("graft-debezium-json")
      .option("path", dir.toString).option("rowSchema", "id BIGINT, v DOUBLE").load()
    val viaColumns = DebeziumJson.parseChangelog(envs.toDF("payload"), col("payload"), rowSchema)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.getStruct(3)).map(s => s.toSeq.toList).orNull)
    val a = viaFormat.collect().map(key).sortBy(_.toString).toSeq
    val b = viaColumns.collect().map(key).sortBy(_.toString).toSeq
    assert(a.length == 5 && a == b) // +I(c), +I(r), -U/+U(u), -D(d) → 5 changelog rows
  }

  test("dsv2 q18 parity: the format provider decodes the q18 envelope corpus identically") {
    import spark.implicits._
    // the same envelope synthesis q18 runs (CdcQ.scala), dumped to files
    val mapT = ArrayType(MapType(StringType, StringType))
    val envelopes = graft.sources.Tables.orders(spark, sfDir).select(
      to_json(struct(
        array(map(
          lit("id"), $"o_orderkey".cast("string"),
          lit("price"), $"o_totalprice".cast("string"),
          lit("priority"), $"o_orderpriority")).as("data"),
        when($"o_orderstatus" === "F",
          array(map(lit("price"), ($"o_totalprice" - 10).cast("string"))))
          .otherwise(lit(null).cast(mapT)).as("old"),
        when($"o_orderstatus" === "O", "INSERT")
          .when($"o_orderstatus" === "F", "UPDATE")
          .otherwise("DELETE").as("type"),
        lit("orders").as("table"),
        lit("inventory").as("database"),
        ($"o_orderkey" * 1000).as("ts"),
        lit(false).as("isDdl"),
        array(lit("id")).as("pkNames"))).as("payload"))
      .as[String].collect()
    val dir = java.nio.file.Files.createTempDirectory("canal-q18")
    writeLines(dir, "00000.json", envelopes.toSeq)
    def project(df: org.apache.spark.sql.DataFrame) = df.select(
      $"row_kind",
      element_at($"fields", "id").cast("long").as("id"),
      element_at($"fields", "price").cast("double").as("price"),
      element_at($"fields", "priority").as("priority"))
    val viaFormat = project(
      spark.read.format("graft-canal-json").option("path", dir.toString).load())
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val q18 = SparkEntry.queries("q18_canal_parse")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(viaFormat.nonEmpty && viaFormat == q18)
  }

  test("sql ddl: CREATE TABLE ... USING graft-canal-json drives changelog decode through pure SQL") {
    // the reference's UX is SQL-first (ref: format/csv/Csv2Csv.java:27-41
    // CREATE TABLE ... WITH ('format'='canal-json')): the provider's
    // DataSourceRegister short name must work from DDL, not just the
    // DataFrame reader
    val dir = java.nio.file.Files.createTempDirectory("canal-ddl")
    writeLines(dir, "00000.json", canalEnvelopes)
    spark.sql("DROP TABLE IF EXISTS canal_src")
    spark.sql(
      s"""CREATE TABLE canal_src USING `graft-canal-json`
         |OPTIONS (path '${dir.toString}')""".stripMargin)
    try {
      val viaSql = spark.sql(
        """SELECT row_kind, `table`, ts, fields['id'] AS id
          |FROM canal_src WHERE row_kind <> '-D'""".stripMargin)
      assert(viaSql.schema.fieldNames.toSeq == Seq("row_kind", "table", "ts", "id"))
      val a = viaSql.collect().map(_.toSeq).sortBy(_.toString).toSeq
      val b = spark.read.format("graft-canal-json").option("path", dir.toString).load()
        .where(col("row_kind") =!= "-D")
        .select(col("row_kind"), col("table"), col("ts"), col("fields")("id").as("id"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(a.nonEmpty && a == b)
    } finally spark.sql("DROP TABLE IF EXISTS canal_src")
  }

  test("sql ddl: CREATE TABLE ... USING graft-debezium-json with rowSchema option, typed access from SQL") {
    val dir = java.nio.file.Files.createTempDirectory("dbz-ddl")
    writeLines(dir, "00000.json", Seq(
      """{"before":null,"after":{"id":1,"v":1.5},"op":"c","ts_ms":9,"source":{"db":"d","table":"t"}}""",
      """{"before":{"id":1,"v":1.5},"after":{"id":1,"v":2.5},"op":"u","ts_ms":11,"source":{"db":"d","table":"t"}}"""))
    spark.sql("DROP TABLE IF EXISTS dbz_src")
    spark.sql(
      s"""CREATE TABLE dbz_src USING `graft-debezium-json`
         |OPTIONS (path '${dir.toString}', rowSchema 'id BIGINT, v DOUBLE')""".stripMargin)
    try {
      val rows = spark.sql(
        """SELECT row_kind, row.id AS id, row.v AS v FROM dbz_src ORDER BY ts_ms, row_kind DESC""")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(rows == Seq(("+I", 1L, 1.5), ("-U", 1L, 1.5), ("+U", 1L, 2.5)))
    } finally spark.sql("DROP TABLE IF EXISTS dbz_src")
  }

  test("dsv2 streaming: file-prefix offsets process only new files and resume from checkpoint") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("canal-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("canal-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("canal-out").toString
    writeLines(dir, "00000.json", canalEnvelopes)
    def startQ() = spark.readStream.format("graft-canal-json")
      .option("path", dir.toString).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    def ids() = spark.read.parquet(out)
      .select(element_at($"fields", "id")).as[String].collect().toSeq
    val q1 = startQ()
    q1.processAllAvailable()
    val n1 = ids().length
    assert(n1 == 15) // +I ×2, -U/+U ×6 (w/ old, without, two positional, null-elem + its sibling), -D
    writeLines(dir, "00001.json",
      Seq("""{"data":[{"id":"8","w":"3.0"}],"type":"INSERT","table":"t","ts":7}"""))
    q1.processAllAvailable()
    assert(ids().length == n1 + 1, "only the NEW file is read")
    q1.stop()
    // restart from the same checkpoint: a third file arrives while down
    writeLines(dir, "00002.json",
      Seq("""{"data":[{"id":"9","w":"4.0"}],"type":"INSERT","table":"t","ts":8}"""))
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()
    val finalIds = ids()
    assert(finalIds.length == n1 + 2 && finalIds.count(_ == "9") == 1 && finalIds.count(_ == "8") == 1,
      "restart resumes at the committed file prefix — no reprocessing, no gaps")
  }
}
