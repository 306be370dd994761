package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch
import graft.operators.{Bloom, Dedup}
import graft.sources.Tables

/** KMV distinct sketch + Bloom semi-join reduction (SketchQ). */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  private val sf001 = "/root/testdata/sf0.01"

  private def shingles(d: String) = {
    import spark.implicits._
    Dedup.hashedShingleSets(
      Tables.documents(spark, d).select($"lang", $"text"), $"lang", $"text", 13)
  }

  test("KMV sketch equals the ORDER BY/LIMIT bottom-k replayed in-engine (saturated and exact branches)") {
    import spark.implicits._
    val k = SketchQk
    val sh = shingles(sf001) // en group saturates k=1024; replay must agree on all groups
    val w = Window.partitionBy($"id").orderBy($"sh")
    val top = sh.distinct().withColumn("rn", row_number().over(w)).filter($"rn" <= k)
    val expected = top.groupBy($"id".as("lang"))
      .agg(count(lit(1)).as("k_used"), max($"sh").as("kth_min"))
      .select($"lang", $"k_used", $"kth_min",
        when($"k_used" < k, $"k_used".cast("double"))
          .otherwise(($"k_used" - 1).cast("double") * (lit(1152921504606846976.0) / $"kth_min".cast("double")))
          .as("est_distinct"))
    val got = queries.SketchQ.defs("q67_kmv_distinct")(spark, sf001)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // exact branch: a stream with < k distinct values never saturates
    // the sketch, so the estimate IS the exact distinct count
    val kmv = udaf(new KmvSketch(k), Encoders.scalaLong)
    val tiny = spark.range(0, 600).select(lit("g").as("id"), (pmod(col("id"), lit(200)) * 7919 + 3).as("sh"))
    val out = tiny.groupBy($"id").agg(kmv($"sh").as("s"))
      .select($"s.k_used", $"s.est_distinct").head()
    assert(out.getLong(0) == 200L && out.getDouble(1) == 200.0,
      s"unsaturated sketch must be exact: $out")
  }

  private def SketchQk = queries.SketchQ.KmvK

  test("KMV is partitioning-invariant: 1 vs 13 input partitions produce identical sketches") {
    import spark.implicits._
    val sh = shingles(sf001)
    val kmv = udaf(new KmvSketch(64), Encoders.scalaLong)
    def run(parts: Int) =
      sh.repartition(parts).groupBy($"id").agg(kmv($"sh").as("s"))
        .select($"id", $"s.k_used", $"s.kth_min", $"s.est_distinct")
    val a = run(1); val b = run(13)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("KMV estimate within 10% of the exact distinct count once saturated") {
    import spark.implicits._
    val got = queries.SketchQ.defs("q67_kmv_distinct")(spark, sf001)
    val exact = shingles(sf001).distinct().groupBy($"id".as("lang"))
      .agg(count(lit(1)).as("n"))
    got.filter($"k_used" === SketchQk).join(exact, "lang").collect().foreach { r =>
      val est = r.getAs[Double]("est_distinct"); val n = r.getAs[Long]("n").toDouble
      assert(math.abs(est - n) / n < 0.10, s"KMV error too high: est=$est exact=$n (${r.getAs[String]("lang")})")
    }
  }

  test("KMV kernel: duplicate inserts are no-ops, saturation keeps the k smallest") {
    val agg = new KmvSketch(4)
    var b = agg.zero
    Seq(50L, 10L, 50L, 30L, 20L, 40L, 10L, 5L).foreach(v => b = agg.reduce(b, v))
    assert(b.n == 4 && b.arr.take(4).toSeq == Seq(5L, 10L, 20L, 30L))
    // merge: sorted union capped at k, duplicates collapsed
    var c = agg.zero
    Seq(7L, 10L, 60L).foreach(v => c = agg.reduce(c, v))
    val m = agg.merge(b, c)
    assert(m.n == 4 && m.arr.take(4).toSeq == Seq(5L, 7L, 10L, 20L))
    val out = agg.finish(m)
    assert(out.k_used == 4 && out.kth_min == 20L)
  }

  test("streaming KMV == batch q67 over the union of batches (bounded state per group)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val in = MemoryStream[(Long, String, String)]
    val q = streaming.KmvStream.distinctShingles(
        in.toDF().toDF("doc_id", "lang", "text"), k = 256)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("kmv_out").start()
    try {
      // three micro-batches; sketch state must carry across them
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      val streamed = spark.table("kmv_out")
      val kmv = udaf(new KmvSketch(256), Encoders.scalaLong)
      val batch = shingles(sfDir).groupBy($"id".as("lang")).agg(kmv($"sh").as("s"))
        .select($"lang", $"s.k_used".as("k_used"), $"s.kth_min".as("kth_min"),
          $"s.est_distinct".as("est_distinct"))
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        "streamed KMV diverged from the batch sketch over the same corpus")
    } finally q.stop()
  }

  test("KMV array sketch: sorted trimmed bottom-k; q71 overlap exact when unsaturated") {
    import spark.implicits._
    import graft.functions.KmvArraySketch
    val agg = new KmvArraySketch(4)
    var b = agg.zero
    Seq(50L, 10L, 30L, 20L, 40L, 5L).foreach(v => b = agg.reduce(b, v))
    val out = agg.finish(b)
    assert(out.k_used == 4 && out.arr.toSeq == Seq(5L, 10L, 20L, 30L))
    // q71 on the sf0.001 corpus: k=1024 never saturates there, so the
    // union sketch holds EVERY distinct shingle of each pair and the
    // "estimates" must equal the exact set arithmetic
    val d = sfDir
    val got = queries.SketchQ.defs("q71_kmv_source_overlap")(spark, d)
    val sh = Dedup.hashedShingleSets(
      Tables.documents(spark, d).select($"source", $"text"), $"source", $"text", 13)
      .select($"id".as("source"), $"sh").distinct()
    val exact = sh.as("a").join(sh.as("b"),
        $"a.source" < $"b.source" && $"a.sh" === $"b.sh")
      .groupBy($"a.source".as("source_a"), $"b.source".as("source_b"))
      .agg(count(lit(1)).as("ov"))
    val perSrc = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    val exactOv = exact.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nBy = perSrc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (sa, sb) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      val ku = r.getAs[Long]("k_used")
      if (ku < queries.SketchQ.KmvK) { // unsaturated pair: everything exact
        val ov = exactOv.getOrElse((sa, sb), 0L)
        val union = nBy(sa) + nBy(sb) - ov
        assert(ku == union, s"$sa/$sb union: $ku vs $union")
        assert(r.getAs[Long]("overlap_k") == ov)
        assert(r.getAs[Double]("est_union") == union.toDouble)
        assert(r.getAs[Double]("est_overlap") == (ov.toDouble / union) * union.toDouble)
      }
    }
    // every source pair appears exactly once, a < b
    val srcs = nBy.keySet
    assert(rows.length == srcs.size * (srcs.size - 1) / 2)
  }

  test("q71 saturated branch: estimates track true Jaccard on synthetic overlapping sets") {
    import graft.functions.KmvArraySketch
    // two sets of 20k hashed keys with 50% overlap; k=256 saturates.
    // Keys are md5-derived 60-bit values (the corpus convention) —
    // the estimator assumes uniformity, which a short-string
    // polynomial hash does not provide.
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0x0fL) << 56) | (1 to 7).map(i => (d(i) & 0xffL) << (8 * (7 - i))).reduce(_ | _)
    }
    def keys(off: Long, n: Int): Seq[Long] =
      (0 until n).map(i => h60(s"key-${off + i}"))
    val a = keys(0, 20000)
    val b = keys(10000, 20000) // overlap = 10000, union = 30000
    val agg = new KmvArraySketch(256)
    def sk(vs: Seq[Long]) = {
      var buf = agg.zero; vs.foreach(v => buf = agg.reduce(buf, v)); agg.finish(buf)
    }
    val (ka, kb) = (sk(a), sk(b))
    val union = (ka.arr ++ kb.arr).distinct.sorted.take(256)
    val kth = union.last
    val estUnion = (union.length - 1).toDouble * (1152921504606846976.0 / kth.toDouble)
    val inBoth = union.count(v => ka.arr.contains(v) && kb.arr.contains(v))
    val estOv = (inBoth.toDouble / union.length) * estUnion
    assert(math.abs(estUnion - 30000) / 30000 < 0.15, s"union est $estUnion")
    assert(math.abs(estOv - 10000) / 10000 < 0.30, s"overlap est $estOv")
  }

  test("Misra-Gries: the freq > N/k guarantee holds under any partitioning and merge order") {
    import graft.functions.MisraGries
    // 5000-token vocabulary, zipf-ish skew: token t appears ~1/(t+1) often
    val rnd = new scala.util.Random(13)
    val stream = rnd.shuffle(
      (0 until 5000).flatMap(t => Seq.fill(math.max(1, 3000 / (t + 1)))(s"tok$t")))
    val n = stream.size
    val k = 50
    val agg = new MisraGries(k)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustSurvive = exact.filter(_._2 > n.toLong / k).keySet
    // fold under three different partitionings + merge shapes
    Seq(1, 7, 64).foreach { parts =>
      val bufs = stream.grouped(math.max(1, n / parts + 1)).map { chunk =>
        chunk.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
      }.toSeq
      val merged = bufs.reduce(agg.merge)
      val keys = agg.finish(merged).toSet
      assert(keys.size <= k)
      val missed = mustSurvive -- keys
      assert(missed.isEmpty, s"parts=$parts lost guaranteed heavy hitters: $missed")
    }
  }

  test("Misra-Gries merge rule: sum then subtract the (k+1)-th largest") {
    import graft.functions.MisraGries
    val agg = new MisraGries(2)
    val a = Map("x" -> 5L, "y" -> 3L)
    val b = Map("x" -> 1L, "z" -> 4L)
    // summed: x=6 y=3 z=4; 3rd largest = 3; subtract -> x=3 z=1
    val m = agg.merge(a, b)
    assert(m == Map("x" -> 3L, "z" -> 1L), s"got $m")
  }

  test("q72 heavy hitters equals the naive full-vocabulary HAVING query") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val got = queries.SketchQ.defs("q72_heavy_hitters")(spark, d)
    val toks = Tables.documents(spark, d)
      .select(explode(split($"text", " ")).as("token")).filter($"token" =!= "")
    val n = toks.count()
    val expected = toks.groupBy($"token").agg(count(lit(1)).as("freq"))
      .filter($"freq" * queries.SketchQ.HhDen >= n)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(got.count() > 0, "support threshold yields no rows — test corpus drifted?")
  }

  test("streaming MG candidates + one batch recount == batch q72 (bounded state per group)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val d = "/root/testdata/sf0.01"
    val texts = Tables.documents(spark, d).select($"text").as[String].collect()
    val in = MemoryStream[String]
    val k = 2 * queries.SketchQ.HhDen
    val q = streaming.HeavyHittersStream.candidates(
        in.toDF().select(explode(split($"value", " ")).as("token")).filter($"token" =!= ""),
        $"token", k)
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("hh_out").start()
    try {
      texts.grouped(math.max(1, texts.length / 3 + 1)).foreach { g =>
        in.addData(g.toIndexedSeq); q.processAllAvailable()
      }
      val row = spark.table("hh_out").head()
      val (n, cands) = (row.getLong(0), row.getSeq[String](1))
      assert(cands.size <= k, s"state exceeded the k=$k bound: ${cands.size}")
      val corpusToks = Tables.documents(spark, d)
        .select(explode(split($"text", " ")).as("token")).filter($"token" =!= "")
      assert(n == corpusToks.count(), "streamed token total diverged from the corpus")
      val got = streaming.HeavyHittersStream.recount(
        corpusToks, $"token", cands, n, queries.SketchQ.HhDen)
      val batch = queries.SketchQ.defs("q72_heavy_hitters")(spark, d)
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
        "streamed-candidates recount diverged from batch q72")
    } finally q.stop()
  }

  test("Bloom: zero false negatives, bounded false-positive rate, geometry honored") {
    import spark.implicits._
    val keys = spark.range(0, 5000).select((col("id") * 7919 + 13).as("k"))
    val f = Bloom.build(keys, col("k"), 5000)
    assert(f.m >= 5000 * Bloom.BitsPerKey && f.nh == Bloom.NumHashes)
    val members = keys.filter(!Bloom.mightContain(col("k"), f))
    assert(members.count() == 0, "false negative: a built key failed mightContain")
    // non-members: ids outside the (id*7919+13) residue pattern
    val probes = spark.range(1, 50001).select((col("id") * 7919 + 14).as("k"))
    val fp = probes.filter(Bloom.mightContain(col("k"), f)).count()
    assert(fp.toDouble / 50000 < 0.03, s"false-positive rate too high: $fp/50000")
  }

  test("Bloom prefilter is map-side (no Exchange below it) and q68 equals the bloom-less anti-join") {
    import spark.implicits._
    val d = sfDir
    val docs = Tables.documents(spark, d)
    val corpus = Dedup.hashedShingleSets(docs.select($"doc_id", $"text"), $"doc_id", $"text", 13)
    val benchKeys = Dedup.hashedShingleSets(
      docs.filter($"doc_id" % 97 === 0), $"doc_id", $"text", 13).select($"sh").distinct()
    val f = Bloom.build(benchKeys, $"sh", benchKeys.count())
    val suspects = corpus.filter(Bloom.mightContain($"sh", f))
    val plan = suspects.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"prefilter shuffled:\n$plan")
    assert(plan.contains("xxhash64"), "bloom probes not visible in the filter plan")
    // the prefilter admits no more than bench-true-hits + fp tail
    val nSuspect = suspects.count(); val nCorpus = corpus.count()
    val nTrue = corpus.join(benchKeys, "sh").count()
    assert(nSuspect >= nTrue, "bloom dropped a true overlap")
    assert(nSuspect <= nTrue + (0.03 * nCorpus).toLong + 10,
      s"bloom admits too much: $nSuspect suspects, $nTrue true, corpus $nCorpus")
    // end-to-end equality vs the naive (bloom-less) decontaminate
    val contamNaive = corpus.join(benchKeys, "sh").select($"id".as("doc_id")).distinct()
    val expected = docs.join(contamNaive, Seq("doc_id"), "left_anti").select($"doc_id", $"lang")
    val got = queries.SketchQ.defs("q68_decontaminate_bloom")(spark, d)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
