package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.IvfIndex

/** The persistent IVF index: built partitionBy(cell), queried with
  * dynamic partition pruning — the at-rest ANN layout for 100 TB. */
class IvfIndexSpec extends AnyFunSuite {
  import TestSpark._

  test("ivf index: partitioned layout, DPP-pruned probe scan, results match the inline computation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_idx").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
    val model = IvfIndex.train(emb, cells = 16, iters = 2, memoKey = s"$sfDir#ivfspec")

    IvfIndex.build(emb, model, dir)
    // at-rest layout: one directory per non-empty cell (trained k-means
    // may leave sparse cells unassigned at the tiny test SF)
    val cellDirs = new java.io.File(dir).listFiles().count(_.getName.startsWith("cell="))
    assert(cellDirs > 8 && cellDirs <= 16)

    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val out = IvfIndex.topK(spark, dir, queries, model, nprobe = 6, k = 5)

    // the probe join must dynamically prune the partitioned scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no dynamic partition pruning in plan:\n$plan")

    // and return exactly what the same computation gives without the
    // on-disk index (assignment is deterministic, so the index adds
    // layout, not semantics)
    val inline = {
      val assign = IvfIndex.assignCells(emb, model)
      val p = IvfIndex.probeCells(queries, $"qv", model, 6).select($"query_id", $"qv", $"cell")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      assign.join(p, Seq("cell"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }
    val a = out.select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = inline.select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("sq8 probe: codes-only candidate scan (vectors column-pruned), exact re-rank, high recall vs exact probe") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_sq8").toString
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
      val model = IvfIndex.train(emb, cells = 16, iters = 2, memoKey = s"$sfDir#ivfspec")
      IvfIndex.build(emb, model, dir)
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))

      val sq8 = IvfIndex.topKSq8(spark, dir, queries, model, nprobe = 6, k = 5)
      // the candidate phase reads codes, never vectors; the re-rank
      // phase reads vectors, never codes — ONE layout, two
      // column-pruned scans (this is the 8x-I/O claim, asserted on
      // the actual scan schemas)
      val fmt = sq8.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val reads = fmt.linesIterator.filter(_.contains("ReadSchema")).toSeq
        .filter(l => l.contains("code") || l.contains("v:"))
      assert(reads.exists(l => l.contains("code") && !l.contains("v:")),
        s"no codes-only scan:\n$fmt")
      assert(reads.exists(l => l.contains("v:") && !l.contains("code")),
        s"no vectors-only scan:\n$fmt")
      // BOTH phases prune: the codes-only candidate scan AND the
      // vectors-only re-rank scan (the re-rank join keeps `cell` in
      // its keys precisely so DPP applies — losing it would scan
      // every cell's vector column). Count PRUNED SCANS, not raw
      // "dynamicpruning" occurrences: one pruned scan already prints
      // the marker twice (PartitionFilters line + the Subqueries
      // hosting-expression line), so a raw count of 2 could pass
      // with the re-rank scan unpruned
      val prunedScans = fmt.linesIterator
        .count(l => l.contains("PartitionFilters") && l.contains("dynamicpruning"))
      assert(prunedScans >= 2, s"both sq8 scans must dynamically prune ($prunedScans did):\n$fmt")

      // int8 quantization of 64-dim normalized vectors keeps ~0.5%
      // cosine error — with a 4x re-rank the exact probe's top-5 is
      // recovered (near-)perfectly
      val exact = IvfIndex.topK(spark, dir, queries, model, nprobe = 6, k = 5)
      val e = exact.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val g = sq8.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(e.nonEmpty)
      val recall = (e & g).size.toDouble / e.size
      assert(recall >= 0.9, s"sq8 recall vs exact probe = $recall")
    } finally graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }

  test("persisted model: cold session probes an existing index with zero jobs over the embeddings table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_persist").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
    val model = IvfIndex.train(emb, cells = 16, iters = 2, memoKey = s"$sfDir#persist")
    IvfIndex.build(emb, model, dir)

    // queries captured as plain rows BEFORE the "cold" phase, so the
    // probe below touches only the index directory
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("qv",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))))
    val qRows = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv")).collect()
    val warm = IvfIndex.topK(spark, dir,
        spark.createDataFrame(java.util.Arrays.asList(qRows: _*), qSchema),
        model, nprobe = 6, k = 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // cold session: fresh session state, model loaded from disk.
    // load() must be a pure driver-side read — assert zero Spark jobs.
    // A null-job-group snapshot would miss jobs submitted under any
    // group; instead run load() inside a DEDICATED job group (inherited
    // by any job it would submit from this thread), then run a canary
    // job in the same group: listener events are ordered, so once the
    // canary is visible, a load()-submitted job would be visible too —
    // the group must contain exactly the canary.
    val s2 = spark.newSession()
    s2.sparkContext.setJobGroup("ivf-load-probe", "assert load() is driver-only", false)
    val loaded =
      try {
        val m = IvfIndex.load(s2, dir)
        // canary: a shuffle-free RDD count is exactly ONE job (an SQL
        // count under AQE splits into a map-stage job + a result job)
        s2.sparkContext.parallelize(Seq(1), 1).count()
        m
      } finally s2.sparkContext.clearJobGroup()
    val deadline = System.currentTimeMillis + 30000
    var probeJobs = spark.sparkContext.statusTracker.getJobIdsForGroup("ivf-load-probe")
    while (probeJobs.isEmpty && System.currentTimeMillis < deadline) {
      Thread.sleep(50)
      probeJobs = spark.sparkContext.statusTracker.getJobIdsForGroup("ivf-load-probe")
    }
    assert(probeJobs.length == 1,
      s"IvfIndex.load ran Spark jobs ${probeJobs.sorted.dropRight(1).mkString(",")}; must be driver-only")

    // bit-identical centroids and csq
    assert(loaded.cells == model.cells)
    model.cent.zip(loaded.cent).foreach {
      case (null, c2) => assert(c2 == null)
      case (c1, c2) =>
        assert(c1.length == c2.length)
        c1.zip(c2).foreach { case (x, y) =>
          assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
        }
    }
    model.csq.zip(loaded.csq).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
    }

    // probing with the loaded model from the cold session reads ONLY
    // the index dir and returns the warm-session result exactly
    val qDf = s2.createDataFrame(java.util.Arrays.asList(qRows: _*), qSchema)
    val cold = IvfIndex.topK(s2, dir, qDf, loaded, nprobe = 6, k = 5)
      .select("query_id", "neighbor_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cold == warm)
    assert(cold.nonEmpty)
  }

  test("save() atomically OVERWRITES an existing model: load returns the newest centroids") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_over").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
    val m1 = IvfIndex.train(emb, cells = 16, iters = 1, memoKey = s"$sfDir#over1")
    val m2 = IvfIndex.train(emb, cells = 16, iters = 2, memoKey = s"$sfDir#over2")
    IvfIndex.save(m1, dir, spark)
    IvfIndex.save(m2, dir, spark) // rename-with-OVERWRITE path
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.cells == m2.cells)
    m2.cent.zip(loaded.cent).foreach {
      case (null, c2) => assert(c2 == null)
      case (c1, c2) => assert(c1.sameElements(c2))
    }
    // and it is genuinely the SECOND model (2-iter centroids differ)
    assert(m1.cent.zip(m2.cent).exists {
      case (a, b) => a != null && b != null && !a.sameElements(b)
    })
  }

  test("load() fails loudly on a truncated model file (never silently drops cells)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ivf_trunc").toString
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
    val model = IvfIndex.train(emb, cells = 16, iters = 1, memoKey = s"$sfDir#trunc")
    IvfIndex.save(model, dir, spark)
    // corrupt: drop half the cent rows but leave cells=16
    val p = java.nio.file.Paths.get(dir, "_graft_ivf_model.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(java.nio.file.Files.readAllBytes(p))
    val cent = root.get("cent").asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode]
    while (cent.size() > 8) cent.remove(cent.size() - 1)
    java.nio.file.Files.write(p, om.writeValueAsBytes(root))
    // drop the Hadoop local-FS checksum sidecar, stale after the rewrite
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._graft_ivf_model.json.crc"))
    val e = intercept[IllegalArgumentException](IvfIndex.load(spark, dir))
    assert(e.getMessage.contains("corrupt ivf model"))
  }

  test("ivf training is deterministic: two fresh trains produce identical centroids") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", VectorFunctions.vec($"embedding").as("v"))
    // distinct memo keys → both actually train
    val m1 = IvfIndex.train(emb.repartition(7), cells = 16, iters = 2, memoKey = s"$sfDir#det-a")
    val m2 = IvfIndex.train(emb.repartition(3), cells = 16, iters = 2, memoKey = s"$sfDir#det-b")
    assert(m1.cent.length == m2.cent.length)
    m1.cent.zip(m2.cent).foreach {
      case (null, c2) => assert(c2 == null)
      case (c1, c2) => assert(c1.sameElements(c2)) // bit-identical under any partitioning
    }
  }
}
