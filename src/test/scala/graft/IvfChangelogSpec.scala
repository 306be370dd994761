package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.IvfChangelog

/** CDC-driven IVF maintenance: a changelog of inserts, cell-moving
  * updates, deletes, and re-inserts applied in micro-batches must
  * serve probes identical to a one-shot batch build of the final
  * materialized state — through compaction version swaps and with a
  * replayed (torn-then-recommitted) batch.
  */
class IvfChangelogSpec extends AnyFunSuite {
  import TestSpark._

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("query_id"), col("neighbor_id"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("changelog ingest == batch build of the final state: updates move cells, deletes disappear, re-inserts return") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfcdc").toString
    val modelDir = Files.createTempDirectory("graft_ivfcdc_model").toString
    val batchDir = Files.createTempDirectory("graft_ivfcdc_batch").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
      val queries = emb.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"))

      // a second, far-away position for any vector: its own vector
      // NEGATED lands in a different cell (cosine -1 from the
      // original), guaranteeing every update below MOVES cells
      val moved = emb.select($"vec_id", expr("transform(v, x -> -x)").as("v"))

      // batch 1: insert everything
      IvfChangelog.processBatch(
        emb.withColumn("row_kind", lit("+I")), 1, root, model, compactEvery = 2)
      // batch 2 (triggers compaction of batch 1 first): vec_id % 7 == 1
      // moves to its negated position (-U before-image + +U after-image);
      // vec_id % 7 == 2 is DELETED (-D with before-image)
      val upd = emb.filter($"vec_id" % 7 === 1)
      val chg2 =
        upd.withColumn("row_kind", lit("-U"))
          .unionByName(moved.filter($"vec_id" % 7 === 1).withColumn("row_kind", lit("+U")))
          .unionByName(emb.filter($"vec_id" % 7 === 2).withColumn("row_kind", lit("-D")))
      IvfChangelog.processBatch(chg2, 2, root, model, compactEvery = 2)
      // batch 3: half the deleted vectors come back at their original
      // position (re-insert after delete — the contamination-cleared
      // re-ingest case)
      IvfChangelog.processBatch(
        emb.filter($"vec_id" % 14 === 2).withColumn("row_kind", lit("+I")),
        3, root, model, compactEvery = 2)

      // the final state, materialized directly
      val finalState = emb.filter($"vec_id" % 7 =!= 1).filter($"vec_id" % 7 =!= 2)
        .unionByName(moved.filter($"vec_id" % 7 === 1))
        .unionByName(emb.filter($"vec_id" % 14 === 2))
      IvfIndex.build(finalState, model, batchDir)

      val probe = IvfChangelog.topK(spark, root, queries, modelDir, nprobe = 8, k = 5)
      // the candidate-set resolution window must not cost the probe
      // its dynamic partition pruning — the join still drives DPP
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"no dynamic partition pruning in plan:\n$plan")
      val got = resultSet(probe)
      val want = resultSet(IvfIndex.topK(spark, batchDir, queries, model, nprobe = 8, k = 5))
      assert(got == want)
      assert(got.nonEmpty)

      // deleted-and-not-reinserted vectors never appear
      val deletedGone = got.collect { case (_, n, _) if n % 7 == 2 && n % 14 != 2 => n }
      assert(deletedGone.isEmpty, s"deleted vectors still probe-visible: $deletedGone")

      // batch 4 triggers compaction of batches 1-3 (the post-delete
      // fold): parity must survive the version swap + GC, and the
      // compact version must carry no tombstones
      IvfChangelog.processBatch(
        emb.limit(0).withColumn("row_kind", lit("+I")), 4, root, model, compactEvery = 2)
      val afterCompact = resultSet(IvfChangelog.topK(spark, root, queries, modelDir, 8, 5))
      assert(afterCompact == want, "parity lost across compaction")
      val compacted = spark.read.parquet(s"$root/compact/v=4")
      assert(compacted.filter(col("del")).count() == 0, "tombstones survived compaction")
      // resolved: exactly one row per live vec_id
      assert(compacted.groupBy("vec_id").count().filter(col("count") > 1).count() == 0)
    } finally Seq(root, modelDir, batchDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("intra-batch netization via seqCol: only the latest after-image per key materializes; same-ver tombstones never beat it") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfcdc_net").toString
    val modelDir = Files.createTempDirectory("graft_ivfcdc_net_model").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
        .limit(50)
      // one batch: +I at the original position (seq 1), then -U/+U
      // moving to the negated position (seqs 2, 3) — the net state is
      // the MOVED position only
      val movedV = expr("transform(v, x -> -x)")
      val chg =
        emb.select($"vec_id", lit("+I").as("row_kind"), $"v", lit(1L).as("seq"))
          .unionByName(emb.select($"vec_id", lit("-U").as("row_kind"), $"v", lit(2L).as("seq")))
          .unionByName(emb.select($"vec_id", lit("+U").as("row_kind"), movedV.as("v"), lit(3L).as("seq")))
      IvfChangelog.processBatch(chg, 1, root, model, seqCol = Some("seq"))

      val queries = emb.limit(5).select($"vec_id".as("query_id"), movedV.as("qv"))
      val got = IvfChangelog.topK(spark, root, queries, modelDir, nprobe = 8, k = 1)
        .select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // each query (probing AT the moved position) finds some moved
      // vector at cosine 1 — and crucially, the original positions
      // are gone: probing the ORIGINAL position finds nothing at
      // cosine ~1 except via the moved vectors' negation
      assert(got.nonEmpty)
      val origQueries = emb.limit(5).select($"vec_id".as("query_id"), $"v".as("qv"))
      val orig = IvfChangelog.topK(spark, root, origQueries, modelDir, nprobe = 8, k = 50)
        .select($"query_id", $"neighbor_id", $"cos_sim").collect()
      // no neighbor sits at the original position (cos ≈ 1 against the
      // original query would require the un-moved vector to survive)
      val ghosts = orig.filter(r => r.getDouble(2) > 0.999)
      assert(ghosts.isEmpty, s"pre-netization positions leaked: ${ghosts.take(3).toSeq}")
    } finally Seq(root, modelDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("seqCol delete-last netization: insert-then-delete and update-then-delete in ONE batch net to deleted") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfcdc_dellast").toString
    val modelDir = Files.createTempDirectory("graft_ivfcdc_dellast_model").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
        .filter($"vec_id" < 60)
      val movedV = expr("transform(v, x -> -x)")
      // keys 0-19: survive (+I only). keys 20-39: +I then -D — the
      // batch's last change is a delete, so NO live row may survive
      // even though the +I is the latest +I/+U. keys 40-59: +I, then
      // -U/+U moving cells, then -D — update-then-delete, same rule.
      val base = emb.withColumn("grp", ($"vec_id" / 20).cast("int"))
      val chg =
        base.select($"vec_id", lit("+I").as("row_kind"), $"v", lit(1L).as("seq"), $"grp")
          .unionByName(base.filter($"grp" === 2)
            .select($"vec_id", lit("-U").as("row_kind"), $"v", lit(2L).as("seq"), $"grp"))
          .unionByName(base.filter($"grp" === 2)
            .select($"vec_id", lit("+U").as("row_kind"), movedV.as("v"), lit(3L).as("seq"), $"grp"))
          .unionByName(base.filter($"grp" >= 1)
            .select($"vec_id", lit("-D").as("row_kind"),
              when($"grp" === 2, movedV).otherwise($"v").as("v"), lit(4L).as("seq"), $"grp"))
          .drop("grp")
      IvfChangelog.processBatch(chg, 1, root, model, seqCol = Some("seq"))

      // probe AT every inserted position (original and moved): only
      // grp-0 keys may be visible anywhere
      val queries = base.select($"vec_id".as("query_id"), $"v".as("qv"))
        .unionByName(base.filter($"grp" === 2)
          .select(($"vec_id" + 1000).as("query_id"), movedV.as("qv")))
      val neighbors = IvfChangelog.topK(spark, root, queries, modelDir, nprobe = 8, k = 60)
        .select($"neighbor_id").distinct().as[Long].collect().toSet
      val resurrected = neighbors.filter(n => n / 20 >= 1)
      assert(resurrected.isEmpty,
        s"keys whose last in-batch change was a delete are still probe-visible: ${resurrected.take(5)}")
      assert(neighbors.nonEmpty && neighbors.forall(n => n / 20 == 0))
    } finally Seq(root, modelDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }

  test("NULL image vectors are rejected loudly, not swallowed into a null cell") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivfcdc_null").toString
    val modelDir = Files.createTempDirectory("graft_ivfcdc_null_model").toString
    try {
      val model = graft.queries.SimilarityQ.ivfModel(spark, sfDir)
      IvfIndex.save(model, modelDir, spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select($"vec_id", graft.functions.VectorFunctions.vec($"embedding").as("v"))
        .limit(10)
      val nullV = lit(null).cast("array<double>")
      // -D with NULL before-image (Debezium REPLICA IDENTITY DEFAULT)
      val delNull = emb.select($"vec_id", lit("-D").as("row_kind"), nullV.as("v"))
      def chainMsg(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
      val e1 = intercept[Exception] {
        IvfChangelog.processBatch(delNull, 1, root, model)
      }
      assert(chainMsg(e1).contains("NULL before-image"), s"unactionable error: ${chainMsg(e1)}")
      // +U with NULL after-image — same loud contract on the live side
      val updNull = emb.select($"vec_id", lit("+U").as("row_kind"), nullV.as("v"))
      val e2 = intercept[Exception] {
        IvfChangelog.processBatch(updNull, 2, root, model)
      }
      assert(chainMsg(e2).contains("NULL after-image"), s"unactionable error: ${chainMsg(e2)}")
    } finally Seq(root, modelDir).foreach(d =>
      graft.tools.FileUtil.deleteTree(java.nio.file.Paths.get(d)))
  }
}
