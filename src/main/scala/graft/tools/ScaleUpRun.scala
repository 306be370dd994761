package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CachePool, GraftSession, SparkEntry}
import graft.sources.Tables

/** Drives EVERY SparkEntry query once over a replicated ~10×-sf0.1
  * corpus — the scale-up closure the per-round bench (median timing at
  * sf0.1) cannot give: do the adaptive derivations, broadcast guards,
  * and AQE plan choices hold when every table decade-steps?
  *
  * Corpus: each table unioned `copies` times with every key column
  * shifted by i·10⁷ per copy — foreign keys stay consistent WITHIN a
  * copy (a copy is a self-contained tenant; region/nation dims are
  * shared), well below the 10¹²/10⁶ planted-copy offsets the dedup/
  * embedding augmentations use, so no id-space collisions. Exact
  * text/vector payload copies RAISE the dup and near-dup density 10×
  * — deliberately: the dedup family's candidate bounds must hold on a
  * denser corpus, not just a bigger one.
  *
  * Also pins the BROADCAST GUARDS to their declared side with plan
  * assertions, and exercises the far side of each guard by
  * pre-seeding the documentBytes memo (a path alias keeps the
  * poisoned key from leaking into the real runs) — the flip that no
  * generatable corpus reaches (the q55/q58 thresholds are ½–1 GiB of
  * documents; 10× sf0.1 is ~6 MB).
  *
  * Run: SCALEUP_COPIES=10 java … graft.tools.ScaleUpRun
  */
object ScaleUpRun {

  private val Off = 10000000L // > every base-table key space

  private def shifted(df: DataFrame, i: Int, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * Off)))

  private[graft] def gen(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    val keyCols: Seq[(String, Seq[String])] = Seq(
      "region" -> Seq.empty, "nation" -> Seq.empty, // shared dims: FK targets for every copy
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map(i => shifted(base, i, keys)).reduce(_ unionByName _)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"SCALEUP gen $t x${if (keys.isEmpty) 1 else copies}")
    }
  }

  /** Assert the q55/q58 vocabulary joins run on the side their
    * documentBytes guard declares, on BOTH sides: the real corpus
    * (under threshold → hinted broadcast) and a memo-poisoned alias
    * of the same directory (over threshold → no hint; AQE owns the
    * choice at runtime). Returns human-readable evidence lines. */
  private def guardEvidence(spark: SparkSession, dir: String): Seq[String] = {
    // both queries ALSO carry unconditional broadcasts (1-row corpus
    // scalars, query-bounded df tables), so the assertion is on the
    // hint-count DELTA between the real plan and the poisoned plan:
    // exactly the guarded hints must disappear, nothing else changes
    // the ANALYZED plan: hints are resolved there but cache
    // substitution has not yet collapsed the guarded join into an
    // InMemoryRelation (q55/q58 CachePool their scored subtree, which
    // hides the hint from the optimized plan's string)
    def hintCount(name: String, d: String): Int = {
      val plan = SparkEntry.queries(name)(spark, d).queryExecution.analyzed.toString
      CachePool.drain()
      "strategy=broadcast".r.findAllIn(plan).size
    }
    val bytes = Tables.documentBytes(spark, dir)
    require(bytes <= (1L << 29), s"corpus unexpectedly above the q58 threshold: $bytes")
    // alias spelling of the SAME directory → distinct memo key, so the
    // poisoned size never contaminates the real runs below
    val alias = s"$dir/."
    Tables.memoizedLong(spark, s"$alias/documents#bytes")(4L << 30) // pretend 4 GiB
    // the guarded subtrees are multiply-referenced pre-cache (scored
    // feeds both the output join and the corpus-mean scalar), so the
    // exact count is plan-shape-dependent; the CONTRACT is directional:
    // hints present under the threshold, only the unconditional
    // scalar/df broadcasts left above it
    Seq("q55_logfreq_quality", "q58_bigram_lm").map { q =>
      val under = hintCount(q, dir)
      val over = hintCount(q, alias)
      require(under > over,
        s"$q: no guarded hint dropped past the threshold ($under real vs $over poisoned 4GiB) — guard dead")
      s"GUARD $q bytes=$bytes hints_under_threshold=$under hints_over_threshold=$over"
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-scaleup", relaxedTimeouts = true)
    val src = sys.env.getOrElse("SCALEUP_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SCALEUP_DIR", "/tmp/graft_sf1")
    val copies = sys.env.getOrElse("SCALEUP_COPIES", "10").toInt
    val fs = new org.apache.hadoop.fs.Path(dst)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dst/lineitem.parquet")))
      gen(spark, src, dst, copies)

    // SCALEUP_ONLY=q89_x,q93_y runs a late-addition solo subset on the
    // same corpus (the sweep's solo-re-measure protocol for queries
    // added after a full sweep row); unset = the full set. The
    // broadcast-guard evidence belongs to full sweeps only.
    val only = sys.env.get("SCALEUP_ONLY").map(_.split(',').map(_.trim).toSet)
    if (only.isEmpty) guardEvidence(spark, dst).foreach(println)
    var failed = 0
    val times = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val outcome =
        try {
          val rows = fn(spark, dst).queryExecution.toRdd.count()
          s"rows=$rows"
        } catch {
          case e: Throwable =>
            failed += 1
            s"ERROR ${e.toString.replaceAll("\\s+", " ").take(180)}"
        } finally CachePool.drain()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALEUP $name sec=$sec%.1f $outcome")
      name -> sec
    }
    val total = times.map(_._2).sum
    println(f"SCALEUP TOTAL queries=${times.size} failed=$failed sec=$total%.1f copies=$copies dir=$dst")

    // STRESS row 32's solo-re-measure protocol, AUTOMATED: a long
    // one-JVM sweep's tail lines carry accumulated GC/fragmentation
    // pressure, so any line that reads slow must be re-measured before
    // it is believed. Every line above RETRY_FACTOR × the sweep's
    // per-line median (and an absolute floor — sub-second lines can't
    // carry signal) re-runs once after a drain+GC: a retry that
    // collapses below half the sweep number is attributed to JVM
    // lifecycle noise; one that reproduces is confirmed real work
    // (e.g. the output-bound dedup lines) — either way the residue is
    // decomposed with no manual follow-up.
    val factor = sys.env.getOrElse("SCALEUP_RETRY_FACTOR", "2.0").toDouble
    val floor = sys.env.getOrElse("SCALEUP_RETRY_FLOOR_SEC", "5.0").toDouble
    val med = times.map(_._2).sorted.apply(times.size / 2)
    val suspects = times.filter { case (_, s) => s > factor * med && s > floor }
    suspects.foreach { case (name, sweepSec) =>
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, dst).queryExecution.toRdd.count(); true }
        catch { case _: Throwable => false }
        finally CachePool.drain()
      val retrySec = (System.nanoTime() - t0) / 1e9
      val verdict =
        if (!ok) "retry-error"
        else if (retrySec <= sweepSec * 0.5) "jvm-noise"
        else "confirmed-real-work"
      println(f"SCALEUP RETRY $name sweep=$sweepSec%.1f retry=$retrySec%.1f median=$med%.1f verdict=$verdict")
    }
    if (suspects.isEmpty)
      println(f"SCALEUP RETRY none (no line above ${factor}x median=$med%.1f and ${floor}s)")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
