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
    val cent = IvfIndex.centroids(spark, cells = 16)

    IvfIndex.build(emb, cent, dir)
    // at-rest layout: one directory per cell
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell=")).length
    assert(cellDirs == 16)

    val queries = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val out = IvfIndex.topK(spark, dir, queries, cent, nprobe = 6, k = 5)

    // the probe join must dynamically prune the partitioned scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no dynamic partition pruning in plan:\n$plan")

    // and return exactly what the same computation gives without the
    // on-disk index (assignment is deterministic, so the index adds
    // layout, not semantics)
    val inline = {
      val assign = IvfIndex.assign(emb, cent)
      val p = IvfIndex.probes(queries, cent, 6)
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
}
