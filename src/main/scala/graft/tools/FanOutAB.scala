package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{CachePool, GraftSession, SparkEntry}

/** Dev profiler: paired same-JVM A/B of [[graft.operators.FanOut]] —
  * for each named query, alternate iterations with the fan-out ON and
  * OFF (the `graft.fanout` system property is read at
  * plan-construction time) and report both medians. Interleaving the
  * two variants is the honest comparison on this machine: its
  * documented multi-second bursts poison any sequential
  * before/after pair, but hit both variants of an interleaved run
  * equally.
  *
  * Usage: graft.tools.FanOutAB <q1,q2,...> [pairs]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS.
  */
object FanOutAB {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val pairs = if (args.length > 1) args(1).toInt else 5
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val spark = GraftSession.heavyBatch(GraftSession.tuned(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-fanout-ab"),
      shufflePartitions = cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // setup lines measurable like queries: rebuild per iteration
    val setups: Map[String, (() => Unit, () => Unit)] = Map(
      "q41_clusters_build" -> (
        (() => { graft.queries.DedupQ.ensureClusters(spark, d); () },
          () => graft.queries.DedupQ.invalidateClusters(spark, d))),
      "q118_index_build" -> (
        (() => { graft.queries.TextQ.ensureIndex(spark, d); () },
          () => graft.queries.TextQ.invalidateIndex(spark, d))),
      "q119_index_build" -> (
        (() => { graft.queries.TextQ.ensureRankedIndex(spark, d); () },
          () => graft.queries.TextQ.invalidateRankedIndex(spark, d))),
      "q122_index_build" -> (
        (() => { graft.queries.TextQ.ensureVersionedIndex(spark, d); () },
          () => graft.queries.TextQ.invalidateVersionedIndex(spark, d))))

    def runOnce(name: String): Unit = setups.get(name) match {
      case Some((fn, inval)) => inval(); fn()
      case None => SparkEntry.queries(name)(spark, d).queryExecution.toRdd.count(); ()
    }

    for (name <- names) {
      // warm BOTH variants (2 unmeasured executions each) so the
      // measured pairs compare steady-state codegen, not JIT position
      for (_ <- 1 to 2; v <- Seq("on", "off")) {
        sys.props("graft.fanout") = v
        try runOnce(name) catch { case e: Throwable =>
          System.err.println(s"AB $name warmup($v) FAILED: ${e.getMessage}") }
        CachePool.drain()
      }
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (i <- 1 to pairs; v <- Seq("on", "off")) {
        sys.props("graft.fanout") = v
        val t0 = System.nanoTime()
        runOnce(name)
        val el = (System.nanoTime() - t0) / 1e9
        CachePool.drain()
        (if (v == "on") on else off) += el
        println(f"AB $name pair $i $v: $el%.3f s")
      }
      def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
      def mn(xs: Seq[Double]): Double = xs.min
      println(f"ABRESULT $name on_med=${med(on.toSeq)}%.3f on_min=${mn(on.toSeq)}%.3f " +
        f"off_med=${med(off.toSeq)}%.3f off_min=${mn(off.toSeq)}%.3f " +
        f"speedup_med=${med(off.toSeq) / med(on.toSeq)}%.2f")
    }
    spark.stop()
  }
}
