package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-travel joins from the Flink SQL/DataStream surface the
  * reference is built on: the temporal (AS-OF / point-in-time) join
  * (`FOR SYSTEM_TIME AS OF` — Flink's CDC-backed temporal table join,
  * the query-side complement of the changelog materialization in
  * [[Cdc]]) and the DataStream `intervalJoin` (events of one stream
  * matched to the other within a time band).
  *
  * Scale design: both avoid the O(n·m) inequality join Spark would
  * otherwise plan (BroadcastNestedLoopJoin — a scan of the whole
  * version history per probe row).
  *
  *  - [[asOf]] UNIONS probes and versions, then takes one per-key
  *    running `last(payload)` window: a single shuffle on the key,
  *    merge-sorted within partitions — the shape that survives a
  *    billion-row version history (no broadcast requirement, no
  *    replication).
  *  - [[interval]] BUCKETIZES time by the band width: the build side
  *    lands in exactly one (key, bucket), the probe side expands to
  *    the only two buckets its band can reach, and the band predicate
  *    runs AFTER an equi-join — shuffle volume is bounded by bucket
  *    occupancy, each qualifying pair joins exactly once.
  */
object TemporalJoins {

  /** Point-in-time join: for each probe row, attach `payload` from the
    * LATEST version row of the same `key` with `versionTs <=
    * probeTs` (inclusive, matching DuckDB/pandas ASOF and Flink
    * temporal-join semantics); probes before their key's first version
    * keep NULL payload (left-asof).
    *
    * Version timestamps must be unique per key (the version table is a
    * changelog's current-state history — [[Cdc.materialize]] output —
    * where (key, ts) IS the primary key). Probe columns and `payload`
    * names must not collide. */
  def asOf(probe: DataFrame, versions: DataFrame, key: String,
      probeTs: String, versionTs: String, payload: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(probeCols.intersect(payload).isEmpty,
      s"asOf: probe columns ${probeCols.intersect(payload).mkString(",")} collide with payload")
    // the payload rides in ONE struct: the struct itself is the
    // version marker (non-null on every version row, null on probes),
    // so a version whose payload COLUMNS are NULL — a perfectly normal
    // CDC update setting a field to NULL — still wins the running
    // last(); per-column last() would skip it (resolving the probe to
    // an older version) and could even tear columns across different
    // versions. Version rows sort BEFORE probe rows at equal
    // timestamps, making the bound inclusive: a version effective
    // exactly at probe time is the version in effect.
    val payloadStruct = struct(payload.map(col): _*)
    val vTagged = versions.select(
      Seq(col(key).as("__k"), col(versionTs).as("__t"), lit(0).as("__p"),
        payloadStruct.as("__pl")) ++
        probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c => versions.schema(c))))
    val pTagged = probe.select(
      Seq(col(key).as("__k"), col(probeTs).as("__t"), lit(1).as("__p"),
        nullStruct.as("__pl")) ++
        probeCols.map(col): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vTagged.unionByName(pTagged)
      .withColumn("__eff", last(col("__pl"), ignoreNulls = true).over(w))
      .filter(col("__p") === 1)
      .select(probeCols.map(col) ++ payload.map(c => col("__eff")(c).as(c)): _*)
  }

  /** Interval join: pairs (l, r) with the same `key` and
    * `rightTs ∈ [leftTs + lowerUs, leftTs + upperUs]` (both bounds
    * inclusive, microseconds — Flink `intervalJoin.between()`
    * semantics). Left and right column sets must be disjoint except
    * `key`; `0 <= lowerUs <= upperUs` (look-ahead bands; mirror the
    * inputs for look-back).
    *
    * `joinType` "inner" (default) or "left" (Flink SQL's LEFT OUTER
    * interval join: every left row emits at least once, null-padded
    * when its band holds no match). RIGHT outer is the left mode with
    * the inputs swapped and both timestamp columns negated (µs) — the
    * band mirror — or [[intervalFull]] filtered to its right rows;
    * FULL outer is [[intervalFull]]. The two modes bucketize on
    * OPPOSITE sides — inner explodes the LEFT into its two reachable
    * buckets (each right row in exactly one bucket ⇒ no pair matches
    * twice); left outer explodes the RIGHT into the two buckets it
    * can serve and keeps each LEFT row in exactly ONE bucket, so the
    * plain left join pads each unmatched left row exactly once and
    * no pair can match twice (a right copy pair sits in two DIFFERENT
    * buckets; a left row joins only its own). Same single equi-join
    * shuffle either way — outer-ness costs nothing extra. */
  def interval(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lowerUs: Long, upperUs: Long,
      joinType: String = "inner"): DataFrame = {
    require(lowerUs >= 0 && upperUs >= lowerUs && upperUs > 0,
      s"interval: need 0 <= lower <= upper with upper > 0, got [$lowerUs, $upperUs]")
    val W = upperUs // bucket width = band reach ⇒ a band spans at most 2 buckets
    joinType match {
      case "inner" =>
        val l = left
          .withColumn("__lt", unix_micros(col(leftTs)))
          .withColumn("__b", explode(array(expr(s"__lt div $W"), expr(s"__lt div $W + 1"))))
        val r = right
          .withColumn("__rt", unix_micros(col(rightTs)))
          .withColumn("__b", expr(s"__rt div $W"))
        // right rows live in exactly ONE bucket, so no pair can match twice
        l.join(r, Seq(key, "__b"))
          .filter(col("__rt") >= col("__lt") + lowerUs && col("__rt") <= col("__lt") + upperUs)
          .drop("__b", "__lt", "__rt")
      case "left" =>
        val l = left
          .withColumn("__lt", unix_micros(col(leftTs)))
          .withColumn("__b", expr(s"__lt div $W"))
        val r = right
          .withColumn("__rt", unix_micros(col(rightTs)))
          // a right row at rt serves left rows in [rt − upper, rt −
          // lower] ⊆ buckets {rt div W − 1, rt div W}
          .withColumn("__rb", explode(array(expr(s"__rt div $W - 1"), expr(s"__rt div $W"))))
          .withColumnRenamed(key, "__rkey")
        // the band predicate must live IN the join condition (a
        // post-filter would turn pad rows into dropped rows)
        l.join(r,
            col(key) === col("__rkey") && col("__b") === col("__rb") &&
              col("__rt") >= col("__lt") + lowerUs && col("__rt") <= col("__lt") + upperUs,
            "left")
          .drop("__b", "__rb", "__rkey", "__lt", "__rt")
      case "full" =>
        // FULL OUTER: the bucket tricks cannot pad both sides in one
        // join (whichever side explodes would pad twice), so the
        // outer rows come from anti-joins against the matched ids —
        // `leftId`/`rightId` name unique row ids on each side. Three
        // bucketized equi-joins total (match + two anti) — still
        // never a nested loop, and the anti sides join against the
        // DISTINCT matched-id sets (bounded by the smaller of matches
        // and rows).
        throw new IllegalArgumentException(
          "interval: use intervalFull(...) for the full-outer mode (it needs row ids)")
      case other => throw new IllegalArgumentException(
        s"interval: joinType must be inner or left, got '$other'")
    }
  }

  /** FULL OUTER interval join (Flink SQL's full outer interval join):
    * all qualifying pairs, plus every unmatched left row once
    * (right columns null) and every unmatched right row once (left
    * columns null). `leftId`/`rightId` name UNIQUE id columns on each
    * side — the anti-join pads need row identity. Plan: the inner
    * bucketized equi-join + one anti-join per side against the
    * distinct matched ids; all three are equi-joins (never a nested
    * loop), and the matched-id sets are usually broadcast-sized. */
  def intervalFull(left: DataFrame, right: DataFrame, key: String,
      leftId: String, rightId: String, leftTs: String, rightTs: String,
      lowerUs: Long, upperUs: Long): DataFrame = {
    // the matched set feeds THREE consumers (the union + both anti
    // sides) — cache it or the bucketized join recomputes per branch
    // (measured: 58 s → uncached vs one join's work at 100×)
    val matched = graft.CachePool.cache(
      interval(left, right, key, leftTs, rightTs, lowerUs, upperUs))
    // pads on each side carry their OWN key in the shared key column
    val lPads = left
      .join(matched.select(col(leftId)).distinct(), Seq(leftId), "left_anti")
    val rPads = right
      .join(matched.select(col(rightId)).distinct(), Seq(rightId), "left_anti")
    val cols = matched.columns
    def aligned(df: DataFrame): DataFrame =
      df.select(cols.map(c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(matched.schema(c).dataType).as(c)): _*)
    aligned(matched).unionByName(aligned(lPads)).unionByName(aligned(rPads))
  }

  /** Pure-SQL formulations of the same two plans — the reference UX is
    * SQL-first (Flink declares the temporal join as `FOR SYSTEM_TIME
    * AS OF` over DDL-registered tables, e.g. format/csv/Csv2Csv.java's
    * DDL pattern), so the join shapes are also exposed as SQL
    * generators over catalog-registered views. Column types for the
    * NULL padding are read from the session catalog, so the generated
    * text plans EXACTLY like the Column-API operator (the
    * TemporalJoinsSpec pins both result parity and plan shape).
    *
    * {{{
    * orders.createOrReplaceTempView("orders_probe")
    * creditHistory.createOrReplaceTempView("credit_versions")
    * spark.sql(TemporalJoins.Sql.asOf(spark, "orders_probe", "credit_versions",
    *   key = "custkey", probeTs = "o_orderdate", versionTs = "eff",
    *   payload = Seq("credit_limit")))
    * // ≙ Flink: SELECT ... FROM orders o JOIN credit FOR SYSTEM_TIME
    * //          AS OF o.o_orderdate AS c ON o.custkey = c.custkey
    * }}}
    */
  object Sql {

    private def q(c: String) = s"`$c`"

    /** SQL twin of [[TemporalJoins.asOf]] over two registered views:
      * union + per-key running `last(..., true)` window — one shuffle
      * on the key, join-free. */
    def asOf(spark: org.apache.spark.sql.SparkSession, probeView: String,
        versionView: String, key: String, probeTs: String, versionTs: String,
        payload: Seq[String]): String = {
      val pSchema = spark.table(probeView).schema
      val vSchema = spark.table(versionView).schema
      val probeCols = pSchema.fieldNames.toSeq
      require(probeCols.intersect(payload).isEmpty,
        s"asOf SQL: probe columns ${probeCols.intersect(payload).mkString(",")} collide with payload")
      val payloadStruct = payload.map(c => s"'$c', ${q(c)}").mkString("named_struct(", ", ", ")")
      val structSql = org.apache.spark.sql.types.StructType(payload.map(c => vSchema(c))).sql
      val nullProbe = probeCols.map(c => s"CAST(NULL AS ${pSchema(c).dataType.sql}) AS ${q(c)}").mkString(", ")
      s"""SELECT ${probeCols.map(q).mkString(", ")},
         |       ${payload.map(c => s"__eff.${q(c)} AS ${q(c)}").mkString(", ")}
         |FROM (
         |  SELECT *, last(__pl, true) OVER (PARTITION BY __k ORDER BY __t, __p
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __eff
         |  FROM (
         |    SELECT ${q(key)} AS __k, ${q(versionTs)} AS __t, 0 AS __p,
         |           $payloadStruct AS __pl, $nullProbe
         |    FROM $versionView
         |    UNION ALL
         |    SELECT ${q(key)} AS __k, ${q(probeTs)} AS __t, 1 AS __p,
         |           CAST(NULL AS $structSql) AS __pl, ${probeCols.map(q).mkString(", ")}
         |    FROM $probeView
         |  )
         |)
         |WHERE __p = 1""".stripMargin
    }

    /** SQL twin of [[TemporalJoins.interval]]: bucketized equi-join
      * with the band predicate applied after — never a nested loop. */
    def interval(spark: org.apache.spark.sql.SparkSession, leftView: String,
        rightView: String, key: String, leftTs: String, rightTs: String,
        lowerUs: Long, upperUs: Long): String = {
      require(lowerUs >= 0 && upperUs >= lowerUs && upperUs > 0,
        s"interval SQL: need 0 <= lower <= upper with upper > 0, got [$lowerUs, $upperUs]")
      val lCols = spark.table(leftView).schema.fieldNames.toSeq.filterNot(_ == key)
      val rCols = spark.table(rightView).schema.fieldNames.toSeq.filterNot(_ == key)
      val overlap = lCols.intersect(rCols)
      require(overlap.isEmpty, s"interval SQL: column collision ${overlap.mkString(",")}")
      val W = upperUs
      s"""SELECT ${q(key)}, ${(lCols ++ rCols).map(q).mkString(", ")}
         |FROM (
         |  SELECT ${q(key)}, ${lCols.map(q).mkString(", ")}, __lt,
         |         explode(array(__lt div $W, __lt div $W + 1)) AS __b
         |  FROM (SELECT *, unix_micros(${q(leftTs)}) AS __lt FROM $leftView)
         |) JOIN (
         |  SELECT ${q(key)}, ${rCols.map(q).mkString(", ")}, __rt, __rt div $W AS __b
         |  FROM (SELECT *, unix_micros(${q(rightTs)}) AS __rt FROM $rightView)
         |) USING (${q(key)}, __b)
         |WHERE __rt >= __lt + $lowerUs AND __rt <= __lt + $upperUs""".stripMargin
    }
  }
}
