package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Tables

/** Similarity search over embeddings (SURVEY §2 q29–q31).
  *
  * q29: exact brute-force cosine top-k — correct baseline; the query
  * set is small and broadcast, so the corpus is scanned once with no
  * shuffle of the corpus side. At 100 TB this stays viable only for
  * broadcast-able query sets, which is why
  * q30 exists: random-hyperplane LSH buckets co-partition corpus and
  * queries (shuffle on bucket id), turning the cross product into a
  * per-bucket join. q31 composes top-k into a kNN classifier.
  */
object SimilarityQ extends QueryPack {

  private def emb(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, d)
      .select($"vec_id", $"label", VectorFunctions.vec($"embedding").as("v"))
  }

  /** 6-bit random-hyperplane LSH bucket from the native sign-bit
    * kernel ([[graft.functions.VecKernels.signBits]]) — same
    * integer-arithmetic planes the oracle SQL replays. */
  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bits", graft.functions.VectorExpressions.hyperplaneBits(col("v"), 6))
      .withColumn("bucket", expr(
        "aggregate(sequence(0, 5), cast(0 as bigint), (acc, j) -> acc + cast(element_at(bits, j + 1) as bigint) * shiftleft(cast(1 as bigint), j))"))
      .drop("bits")

  def defs: Map[String, Q] = Map(
    "q29_ann_brute_topk" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d)
      val q = broadcast(e.filter($"vec_id" % 50 === 0).select($"vec_id".as("query_id"), $"v".as("qv")))
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      q.join(e.select($"vec_id".as("neighbor_id"), $"v"), $"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 10)
    }),

    "q30_ann_lsh_topk" -> ((s, d) => {
      import s.implicits._
      val e = withBucket(emb(s, d))
      val q = e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"bucket")
      val w = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      q.join(e.select($"vec_id".as("neighbor_id"), $"v", $"bucket"), "bucket")
        .filter($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 5)
    }),

    "q31_knn_classify" -> ((s, d) => {
      import s.implicits._
      val e = emb(s, d)
      val q = broadcast(e.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("query_id"), $"label".as("true_label"), $"v".as("qv")))
      val wTop = Window.partitionBy($"query_id").orderBy($"cos_sim".desc, $"neighbor_id".asc)
      val top5 = q
        .join(e.select($"vec_id".as("neighbor_id"), $"label", $"v"), $"neighbor_id" =!= $"query_id")
        .select($"query_id", $"true_label", $"neighbor_id", $"label",
          VectorFunctions.cosine($"qv", $"v").as("cos_sim"))
        .withColumn("rnk", row_number().over(wTop))
        .filter($"rnk" <= 5)
      val wMaj = Window.partitionBy($"query_id").orderBy($"votes".desc, $"label".asc)
      top5.groupBy($"query_id", $"true_label", $"label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("r", row_number().over(wMaj))
        .filter($"r" === 1)
        .select($"query_id", $"true_label", $"label".as("pred_label"))
    })
  )

  private val embSql =
    "e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)"

  private def cosSql = VectorFunctions.Sql.cosine("q.qv", "n.v")

  private val bucketSql =
    s"""list_reduce(list_prepend(0::BIGINT, list_transform(range(0, 6), j ->
      |  CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0, 64), k ->
      |         v[k + 1] * ((${VectorFunctions.Sql.mix("j * 64 + k")})::DOUBLE / 1000.0))),
      |         (a, x) -> a + x) >= 0
      |  THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (acc, x) -> acc + x)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q29_ann_brute_topk" ->
      s"""WITH $embSql,
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.query_id, n.vec_id AS neighbor_id, $cosSql AS cos_sim
         |      FROM q JOIN e n ON n.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 10""".stripMargin,

    "q30_ann_lsh_topk" ->
      s"""WITH $embSql,
         |b AS (SELECT vec_id, label, v, $bucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % 50 = 0),
         |s AS (SELECT q.query_id, n.vec_id AS neighbor_id, $cosSql AS cos_sim
         |      FROM q JOIN b n ON n.bucket = q.bucket AND n.vec_id <> q.query_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |      FROM s)
         |SELECT query_id, neighbor_id, cos_sim, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "q31_knn_classify" ->
      s"""WITH $embSql,
         |q AS (SELECT vec_id AS query_id, label AS true_label, v AS qv FROM e WHERE vec_id % 50 = 0),
         |s AS (SELECT q.query_id, q.true_label, n.vec_id AS neighbor_id, n.label, $cosSql AS cos_sim
         |      FROM q JOIN e n ON n.vec_id <> q.query_id),
         |top5 AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rnk
         |    FROM s) WHERE rnk <= 5),
         |votes AS (SELECT query_id, true_label, label, count(*) AS nv
         |          FROM top5 GROUP BY query_id, true_label, label)
         |SELECT query_id, true_label, label AS pred_label FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY nv DESC, label) AS r FROM votes)
         |WHERE r = 1""".stripMargin
  )
}
