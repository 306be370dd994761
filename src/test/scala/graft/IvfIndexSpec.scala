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
    // load() must be a pure driver-side read — assert zero Spark jobs
    // (job submission is synchronous on the calling thread, so a
    // before/after snapshot of the status tracker catches any).
    val s2 = spark.newSession()
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    val loaded = IvfIndex.load(s2, dir)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).toSet
    assert(after == before, s"IvfIndex.load ran Spark jobs ${after -- before}; must be driver-only")

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
