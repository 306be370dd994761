package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.SortableDouble

/** EXACT per-group rank statistics (percentiles) with NO sort — the
  * 100 TB path q49's window-rank percentiles can't take.
  *
  * q49 sorts each group under a window: correct, but a per-group sort
  * of a 100 TB column is the most expensive shape Spark has. The
  * classic alternative (Munro–Paterson / BigQuery-style iterative
  * histogram narrowing) finds the exact rank-r value in O(passes)
  * scans with O(buckets × targets) driver state and NO shuffle of the
  * value column at all:
  *
  *   1. one scan: per-group count/min/max → initial [lo, hi] interval
  *      and integer rank r = ceil(p·n/100) per (group, percentile);
  *   2. per pass, one scan: equi-width histogram of each target's
  *      interval (buckets=8192 → 13 bits of the value's bit-space per
  *      pass); the driver walks the counts to find the bucket holding
  *      rank r, which becomes the next interval. Arithmetic runs on
  *      [[SortableDouble]]'s order-preserving int64 image, so bucket
  *      membership is exact integer math — no float-boundary
  *      misclassification can corrupt the rank bookkeeping;
  *   3. when an interval's population ≤ leafLimit (65536), one final
  *      scan resolves ALL leaf targets together: collect_list the
  *      surviving values per target (bounded by leafLimit — executor
  *      memory safe) and pick element r of the sorted array. A
  *      one-point interval needs no scan at all: sortable bits are a
  *      bijection, the driver inverts them.
  *
  * A 64-bit range divided by 13 bits/pass terminates in ≤ 5 passes for
  * ANY distribution — ties collapse intervals to a point, continuous
  * data hits leafLimit after 1–2 passes. Total: ~4 scans of (group,
  * value) regardless of scale, vs one full per-group sort.
  *
  * Driver state is bounded and guarded: ≤ maxGroups groups (rank
  * coordination is per-group driver state; for high-cardinality
  * groups use the q49 window shape instead) and buckets × targets
  * histogram rows per pass.
  *
  * Deterministic end to end — the answer is the actual stored double
  * at rank r — so a DuckDB row_number() oracle replays it bit-for-bit
  * (ref analog: Flink SQL percentile aggregates over bounded inputs).
  */
object Quantiles {

  case class GroupQuantiles(group: String, n: Long, byPct: Map[Int, Double])

  private case class Tgt(id: Int, group: String, pct: Int) {
    var lo: Long = 0L // interval over sortable-bits image, INCLUSIVE
    var hi: Long = 0L
    var rank: Long = 0L // 1-indexed rank within [lo, hi]'s population
    var count: Long = 0L // population of [lo, hi]
    var answer: Option[Double] = None
    var isLeaf: Boolean = false
  }

  /** Exact values at rank ceil(p·n/100), 1-indexed per group, for each
    * p in `pcts`. `df` needs a string group column and a double value
    * column; NULL values are excluded from ranks (as SQL ORDER BY +
    * COUNT(col) semantics do). */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int],
      buckets: Int = 8192,
      leafLimit: Long = 65536,
      maxGroups: Int = 1000): Seq[GroupQuantiles] = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), s"bad pcts $pcts")
    val spark = df.sparkSession
    import spark.implicits._

    // One narrow projection feeds every pass; cached because the
    // narrowing re-scans it (passes + final), released by the caller's
    // CachePool.drain like every other multi-read intermediate.
    // a NULL group would pass the stats scan but never match the
    // histogram join's `$"g" === $"tg"` (null-safe it is not), so
    // byTid would miss its target id mid-pass. Loud executor-side
    // reject (the codebase convention — same as retractAgg's NULL
    // guards) rather than a silent drop that diverges from SQL's
    // GROUP BY keeping a null group.
    val g = when(col(groupCol).isNull,
      raise_error(lit(s"groupQuantiles: NULL in group column '$groupCol' — " +
        "quantile groups must be non-null (coalesce a sentinel upstream)")))
      .otherwise(col(groupCol).cast("string"))
    val base = graft.CachePool.cache(
      df.select(g.as("g"), col(valueCol).cast("double").as("v"))
        .filter(col(valueCol).isNotNull)
        .withColumn("sb", SortableDouble.sortable(col("v"))))

    val stats = base.groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"sb").as("mn"), max($"sb").as("mx"))
      .collect()
    require(stats.length <= maxGroups,
      s"${stats.length} groups exceed the $maxGroups driver-coordination bound — " +
        "use the q49 window-rank shape for high-cardinality groups")

    val nByGroup = stats.map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets: Seq[Tgt] = stats.toSeq.flatMap { r =>
      val (g, n, mn, mx) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      pcts.zipWithIndex.map { case (p, i) =>
        val t = Tgt(stats.indexWhere(_.getString(0) == g) * pcts.size + i, g, p)
        t.lo = mn; t.hi = mx
        t.rank = (p.toLong * n + 99L) / 100L // ceil(p*n/100), matches the oracle's integer math
        t.count = n
        if (mn == mx) { t.answer = Some(SortableDouble.fromSortable(mn)); t.isLeaf = false }
        else if (n <= leafLimit) t.isLeaf = true
        t
      }
    }

    var pass = 0
    // each pass divides the surviving bit-range by `buckets`, so a
    // 64-bit range pins to a point in ceil(64/log2(buckets)) passes
    // for ANY distribution; +2 slack for the ceil of the step rounding
    val maxPasses = math.ceil(64.0 / (math.log(buckets) / math.log(2))).toInt + 2
    def active = targets.filter(t => t.answer.isEmpty && !t.isLeaf)
    while (active.nonEmpty) {
      pass += 1
      require(pass <= maxPasses,
        s"quantile narrowing failed to converge in $maxPasses passes — impossible by construction")
      val acts = active
      // Interval arithmetic is UNSIGNED: the sortable image spans
      // nearly all 64 bits, so (hi - lo) for a straddling-zero group
      // exceeds Long.MaxValue. Driver math runs in BigInt; the
      // per-row bucket is SortableBucket's wrapped-difference
      // unsigned division. step ≤ range/buckets + 1 < 2^51, so every
      // derived bound is a valid long value inside [lo, hi].
      def rangeOf(t: Tgt): BigInt = BigInt(t.hi) - BigInt(t.lo)
      def stepOf(t: Tgt): Long = (rangeOf(t) / buckets + 1).toLong
      val tdf = broadcast(acts.map(t => (t.id, t.group, t.lo, t.hi, stepOf(t)))
        .toDF("tid", "tg", "tlo", "thi", "tstep"))
      val hist = base.join(tdf, $"g" === $"tg" && $"sb" >= $"tlo" && $"sb" <= $"thi")
        .groupBy($"tid", SortableDouble.bucket($"sb", $"tlo", $"tstep").as("b"))
        .count()
        .collect() // bounded: ≤ buckets × |targets| rows
      val byTid: Map[Int, Array[Row]] =
        hist.groupBy(_.getInt(0)).map { case (k, v) => k -> v.sortBy(_.getLong(1)) }
      acts.foreach { t =>
        val rows = byTid(t.id)
        val step = stepOf(t)
        var cum = 0L
        var i = 0
        while (cum + rows(i).getLong(2) < t.rank) { cum += rows(i).getLong(2); i += 1 }
        val b = rows(i).getLong(1)
        t.rank -= cum
        t.count = rows(i).getLong(2)
        val newLo = BigInt(t.lo) + BigInt(b) * BigInt(step)
        val newHi = (newLo + step - 1).min(BigInt(t.hi))
        t.lo = newLo.toLong
        t.hi = newHi.toLong
        if (t.lo == t.hi) t.answer = Some(SortableDouble.fromSortable(t.lo))
        else if (t.count <= leafLimit) t.isLeaf = true
      }
    }

    // One job resolves every leaf target: per-target bounded value
    // list (≤ leafLimit each), sorted in the engine, element rank
    // picked in the engine — the driver only sees final scalars.
    val leaves = targets.filter(t => t.answer.isEmpty)
    if (leaves.nonEmpty) {
      val ldf = broadcast(leaves.map(t => (t.id, t.group, t.lo, t.hi, t.rank))
        .toDF("tid", "tg", "tlo", "thi", "trk"))
      val got = base.join(ldf, $"g" === $"tg" && $"sb" >= $"tlo" && $"sb" <= $"thi")
        .groupBy($"tid", $"trk")
        .agg(sort_array(collect_list($"v")).as("sv"))
        .select($"tid", element_at($"sv", $"trk".cast("int")).as("ans"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      leaves.foreach(t => t.answer = Some(got(t.id)))
    }

    targets.groupBy(_.group).toSeq.map { case (g, ts) =>
      GroupQuantiles(g, nByGroup(g), ts.map(t => t.pct -> t.answer.get).toMap)
    }
  }
}
