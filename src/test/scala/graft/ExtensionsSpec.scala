package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Fingerprint

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft functions callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_fingerprint('hello world') AS fp,
        |       graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |       graft_hyperplane_bits(array(1.0d, -1.0d), 4) AS bits""".stripMargin).head
    assert(row.getLong(0) == Fingerprint.hash("hello world"))
    assert(row.getDouble(1) == 11.0)
    assert(row.getSeq[Int](2).length == 4)
  }

  test("graft_shingle_keys and graft_simhash60 callable from SQL, matching the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_shingle_keys('one two three four five six', 5) AS sk,
        |       graft_simhash60('alpha beta alpha') AS sh""".stripMargin).head
    val viaCol = Seq(("one two three four five six", "alpha beta alpha")).toDF("a", "b")
      .select(graft.functions.ShingleKeys.shingleKeys($"a", 5).as("sk"),
        graft.functions.SimHash60.simhash60($"b").as("sh")).head
    assert(row.getSeq[Long](0) == viaCol.getSeq[Long](0))
    assert(row.getSeq[Long](0).length == 2)
    assert(row.getLong(1) == viaCol.getLong(1))
    val grams = spark.sql("SELECT graft_ngrams('a b a b', 2) AS g").head.getSeq[String](0)
    assert(grams == Seq("a b", "b a", "a b")) // occurrence-preserving
  }

  test("graft_sq8_encode / graft_sq8_dot callable from SQL, matching the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // a 3-4-5 triangle normalizes to (0.6, 0.8): codes floor to
    // (76, 102); self-dot = 76^2 + 102^2
    val row = spark.sql(
      """SELECT graft_sq8_encode(array(3.0d, 4.0d)) AS code,
        |       graft_sq8_dot(graft_sq8_encode(array(3.0d, 4.0d)),
        |                     graft_sq8_encode(array(3.0d, 4.0d))) AS dp""".stripMargin).head
    assert(row.getAs[Array[Byte]](0).toSeq == Seq[Byte](76, 102))
    assert(row.getLong(1) == 76L * 76 + 102L * 102)
    val viaCol = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
      .select(graft.functions.VectorExpressions.sq8Encode($"v").as("code")).head
    assert(viaCol.getAs[Array[Byte]](0).toSeq == Seq[Byte](76, 102))
  }

  test("graft_minhash_sig and graft_simhash aggregates callable from SQL, matching the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rows = Seq((1L, 17L, 3L), (1L, 99L, 2L), (2L, 42L, 1L), (2L, 7L, 5L))
      .toDF("id", "h", "tf")
    rows.createOrReplaceTempView("mh_rows")
    val viaSql = spark.sql(
      """SELECT id, graft_minhash_sig(h, 8) AS sig, graft_simhash(tf, h) AS sh
        |FROM mh_rows GROUP BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).sortBy(_._1).toSeq
    val viaCol = rows.groupBy($"id")
      .agg(graft.functions.MinHashSig.minhashSig($"h", 8).as("sig"),
        graft.functions.SimHashAgg.simhashAgg($"tf", $"h").as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).sortBy(_._1).toSeq
    assert(viaSql == viaCol)
    assert(viaSql.map(_._2.length).forall(_ == 8))
    // partial aggregation must kick in (map-side combine is the point
    // of the sketch shape): the plan has two HashAggregate levels
    val plan = spark.sql(
      "SELECT id, graft_minhash_sig(h, 8) FROM mh_rows GROUP BY id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_minhash_sig"), s"no partial aggregate in:\n$plan")
  }

  test("graft_hyperplane_bits accepts BIGINT literals and rejects non-integral args at analysis") {
    GraftExtensions.register(spark)
    // BIGINT literal (SQL `4L`) must coerce, not ClassCastException
    val bits = spark.sql("SELECT graft_hyperplane_bits(array(1.0d, -1.0d), 4L) AS b").head.getSeq[Int](0)
    assert(bits.length == 4)
    // non-integral literal → AnalysisException at plan time
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(1.0d), 'x')").head
    }
    assert(e1.getMessage.contains("graft_hyperplane_bits"))
    // out-of-range plane count → AnalysisException, not runtime AIOOBE
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hyperplane_bits(array(1.0d), 100000)").head
    }
    assert(e2.getMessage.contains("graft_hyperplane_bits"))
  }

  test("graft_ahash callable from SQL, matching the kernel; NULL for undecodable payloads") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // a real 16x16 PNG: perceptual hash must match the kernel object
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach { x =>
      val v = x * 17
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    })
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val png = out.toByteArray
    Seq((1L, png), (2L, Array[Byte](1, 2, 3))).toDF("id", "payload")
      .createOrReplaceTempView("ah_rows")
    val got = spark.sql("SELECT id, graft_ahash(payload) AS h FROM ah_rows ORDER BY id").collect()
    assert(got(0).getLong(1) == graft.operators.Multimodal.AHash60.hash(png).get)
    // undecodable bytes -> NULL (the SQL twin of decoded = false)
    assert(got(1).isNullAt(1))
    // binary-typed argument is enforced at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_ahash(42)").queryExecution.analyzed
    }
    // but an untyped NULL literal behaves like every builtin: NULL out
    assert(spark.sql("SELECT graft_ahash(NULL) AS h").head.isNullAt(0))
  }
}
