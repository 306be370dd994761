package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping manifest — per-FILE zone maps + per-FILE Bloom
  * filters, consulted BEFORE any parquet footer is opened.
  *
  * [[Layout]] buys row-group pruning from parquet min/max stats, but
  * those stats live in each file's FOOTER: at 100 TB / 128 MiB files
  * the table is ~800k files, and every query — however selective —
  * first pays a driver-side listing plus ~800k footer reads just to
  * discover which row groups to skip. That fixed cost is the hidden
  * scan bottleneck the lake formats (Iceberg manifests, Delta
  * checkpoints, parquet's own optional bloom pages) all exist to
  * remove. This operator is that layer for the [[Layout]] family:
  * one small parquet table under `dir/_graft_manifest` (a `_`-prefixed
  * path, so Spark's file index never mistakes it for data) holding,
  * per data file: row count, min/max of the cluster keys (the zone
  * map), and optionally a Bloom filter over a point-lookup key.
  *
  * Scale contract — the part that makes this work at 800k files:
  *  - the manifest is PRUNED AS A TABLE, never collected: zone-map
  *    and bloom predicates run as a distributed scan over the
  *    manifest (itself ~0.1–1% of table bytes, blooms included), and
  *    only the MATCHING file names come back to the driver — bounded
  *    by the query's selectivity, with an all-files fallback that
  *    reads the directory instead of shipping 800k explicit paths;
  *  - per-file blooms are sized from measured per-file rows (10
  *    bits/key ≈ 0.8% FP at 7 probes, the [[Bloom]] point) and are
  *    OPT-IN: a zone-map-only manifest costs ~100 bytes/file and
  *    serves range predicates on the cluster keys; the bloom column
  *    serves point lookups on a key the layout does NOT cluster —
  *    exactly where zone maps are blind (every file's id range spans
  *    the domain when ids are uncorrelated with the cluster order);
  *  - results are EXACT: pruning only drops files that provably (zone
  *    map) or with bloom-certainty-of-absence cannot match; callers
  *    keep their residual filter, which also removes bloom false
  *    positives' rows.
  *
  * The build is two column-pruned passes over the data dir (stats,
  * then blooms at a geometry fixed by the measured max file rows) —
  * maintenance-time work amortized over every subsequent query, the
  * same bargain as [[Layout.clusteredWrite]]'s range Exchange. A
  * rewrite of the data dir (compaction, re-cluster) must be followed
  * by a fresh [[write]]: the manifest names files, and
  * mode("overwrite") on the data dir replaces them atomically enough
  * that a stale manifest would name missing files and fail LOUDLY at
  * read, not return wrong rows.
  */
object Manifest {

  /** Manifest location under the data dir. The leading underscore is
    * load-bearing: Spark/parquet file listing skips `_`/`.`-prefixed
    * paths, so the manifest can live inside the table directory
    * without polluting `spark.read.parquet(dir)`. */
  val SubDir = "_graft_manifest"

  private def mfPath(dir: String) = s"$dir/$SubDir"

  /** Whether `dir` carries a COMMITTED manifest (the manifest's own
    * parquet `_SUCCESS`, distinct from the data write's). The build
    * is two passes AFTER the data write, so there is always a window
    * — and, after a crash inside it, a dwell — where the data is
    * committed and the manifest absent or torn. Readers that must be
    * correct at every instant (e.g.
    * [[graft.streaming.ManifestStream.prunedScan]]) gate on this and
    * fall back to the UNPRUNED read: pruning is a scan reduction, so
    * its absence can cost time but never rows. */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"${mfPath(dir)}/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build the manifest for the parquet table at `dir`: zone maps
    * (min/max, cast to double — same numeric-castable key contract as
    * [[Layout.zorderValue]]; long keys below 2^53 stay exact) for
    * `statsKeys`, plus an optional per-file Bloom over `bloomKey`.
    * Returns the number of data files covered.
    *
    * NULL handling: NULL bloom keys are excluded from the build, and
    * a file with no non-NULL keys carries a NULL bloom — treated as
    * "might contain" at read, never pruned. Bloom pruning therefore
    * cannot be used to FIND nulls (a point lookup is by value); zone
    * maps likewise ignore nulls (min/max of the non-null domain). */
  def write(spark: SparkSession, dir: String, statsKeys: Seq[String],
      bloomKey: Option[String] = None, bitsPerKey: Int = Bloom.BitsPerKey,
      targetBytes: Long = 128L << 20): Long =
    // scoped: the cached stats/manifest frames are fully consumed
    // inside this call — without the scope each write would leak one
    // persisted DF into the global pool, which a long-lived streaming
    // session never drains (the ClusterMaintenance per-micro-batch rule)
    graft.CachePool.scoped { writeImpl(spark, dir, statsKeys, bloomKey, bitsPerKey, targetBytes) }

  private def writeImpl(spark: SparkSession, dir: String, statsKeys: Seq[String],
      bloomKey: Option[String], bitsPerKey: Int, targetBytes: Long): Long = {
    require(statsKeys.nonEmpty || bloomKey.nonEmpty,
      "Manifest.write: need at least one stats key or a bloom key")
    val aggCols = count(lit(1)).as("rows") +: statsKeys.flatMap(k => Seq(
      min(col(k).cast("double")).as(s"min_$k"),
      max(col(k).cast("double")).as(s"max_$k")))
    // pass 1: per-file zone maps — column-pruned to the stats keys.
    // Cached: the max-rows head() below and the final join both read
    // it, and it is one row per file (manifest-scale, not data-scale).
    val stats = graft.CachePool.cache(
      spark.read.parquet(dir)
        .select((input_file_name().as("file") +: statsKeys.map(col)): _*)
        .groupBy("file").agg(aggCols.head, aggCols.tail: _*))
    val (mf, bloomBytes) = bloomKey match {
      case None => (stats.withColumn("bloom", lit(null).cast("array<bigint>"))
        .withColumn("bloom_m", lit(0))
        .withColumn("bloom_key", lit(null).cast("string"))
        .withColumn("bloom_type", lit(null).cast("string")), 0L)
      case Some(bk) =>
        // geometry from the MEASURED max per-file rows (single-row
        // collect), so every file shares one (m, nh) and the probe
        // expression is a literal-geometry scan predicate
        val mr = stats.agg(max("rows")).head()
        // a zero-row data dir has no files: max(rows) is NULL, and the
        // floor geometry below covers the (empty) manifest it commits
        val maxRows = if (mr.isNullAt(0)) 0L else mr.getLong(0)
        val m = math.max(1024L, maxRows * bitsPerKey)
          .min(Int.MaxValue.toLong - 63).toInt
        // the build-side key TYPE is part of the hashing contract:
        // xxhash64 hashes INT/BIGINT/STRING inputs differently, so a
        // probe literal of the wrong type would produce silent bloom
        // false-NEGATIVES — files pruned that contain true matches.
        // Persist the key name + Spark dataType and cast every probe
        // literal to it in [[selectedFiles]].
        val bkType = spark.read.parquet(dir).schema(bk).dataType
        val agg = udaf(new Bloom.BitsetAgg(m), Encoders.scalaLong)
        // pass 2: per-file bloom — column-pruned to the bloom key
        val blooms = spark.read.parquet(dir)
          .select(input_file_name().as("file"), col(bk).as("__k"))
          .filter(col("__k").isNotNull)
          .select(col("file"),
            explode(sequence(lit(0), lit(Bloom.NumHashes - 1))).as("__i"), col("__k"))
          .select(col("file"), Bloom.probeCol(col("__i"), col("__k"), m).as("__idx"))
          .groupBy("file").agg(agg(col("__idx")).as("bloom"))
        (stats.join(blooms, Seq("file"), "left").withColumn("bloom_m", lit(m))
          .withColumn("bloom_key", lit(bk))
          .withColumn("bloom_type", lit(bkType.sql)), m / 8L)
    }
    // output file count from MEASURED manifest geometry (rows × bloom
    // bytes + zone-map/path overhead), never coalesce(1): at the
    // operator's own claimed 100 TB scale the manifest is ~800k files ×
    // ~1.25 MB of bloom ≈ 1 TB, and a single-task funnel there would
    // also collapse the post-shuffle bloom aggregation to one core.
    // The read side already prunes the manifest AS A TABLE, so a
    // multi-file manifest costs readers nothing.
    val nFiles = stats.count()
    val rowBytes = bloomBytes + 48L * statsKeys.size + 160L
    val outFiles = math.max(1L, math.ceil(
      nFiles.toDouble * rowBytes / targetBytes).toLong).toInt
    mf.repartition(outFiles).write.mode("overwrite").parquet(mfPath(dir))
    nFiles
  }

  /** Membership test against a per-ROW bits column (the manifest's
    * `bloom` array) — [[Bloom.mightContain]]'s twin where the bitset
    * is data, not a literal. Same probe contract ([[Bloom.probeCol]]),
    * so build and probe can never drift. */
  private def mightContainRow(key: Column, bits: Column, m: Int): Column =
    (0 until Bloom.NumHashes).map { i =>
      val idx = Bloom.probeCol(lit(i), key, m)
      val word = element_at(bits, (idx / 64).cast("int") + lit(1))
      call_function("shiftright", word, (idx % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Data files at `dir` that can possibly satisfy the predicates:
    * every `ranges` entry `(key, lo, hi)` keeps files whose zone map
    * overlaps `[lo, hi]`; `bloomAnyOf` keeps files whose bloom admits
    * ANY of the probe values (a NULL bloom — no manifest bloom built,
    * or an all-NULL-key file — always survives). Returns (selected
    * file paths, total file count). The collect is the SELECTED list
    * only. */
  def selectedFiles(spark: SparkSession, dir: String,
      ranges: Seq[(String, Double, Double)] = Nil,
      bloomAnyOf: Seq[Any] = Nil): (Array[String], Long) =
    // scoped for the same streaming-session leak reason as [[write]]:
    // the cached manifest frame is fully consumed inside this call
    graft.CachePool.scoped { selectedFilesImpl(spark, dir, ranges, bloomAnyOf) }

  private def selectedFilesImpl(spark: SparkSession, dir: String,
      ranges: Seq[(String, Double, Double)],
      bloomAnyOf: Seq[Any]): (Array[String], Long) = {
    val mf = graft.CachePool.cache(spark.read.parquet(mfPath(dir)))
    val total = mf.count()
    // a zero-row data dir commits a zero-row manifest: nothing to
    // select, and no geometry row to read — return the empty selection
    // instead of a bare head() NoSuchElementException
    if (total == 0) return (Array.empty[String], 0L)
    var sel = mf
    for ((k, lo, hi) <- ranges)
      // NULL zone map (a file whose key is all-NULL, or a key that
      // does not cast numerically) = "might match", never pruned —
      // the same unprovable-absence rule as the NULL bloom. min/max
      // are null together (both are aggregates of the same non-null
      // domain), so one null check covers the pair.
      sel = sel.filter(col(s"min_$k").isNull ||
        (col(s"max_$k") >= lo && col(s"min_$k") <= hi))
    if (bloomAnyOf.nonEmpty) {
      // legacy manifests (written before the typed-probe change) carry
      // no bloom_type column — fall back to the untyped probe they
      // were built under (caller-typed literals, the old contract)
      // instead of an unresolved-column error: a leveled lake's base
      // manifest is immutable until its next major compaction, so the
      // breakage would otherwise persist indefinitely
      val typed = mf.columns.contains("bloom_type")
      val hd = if (typed) mf.select("bloom_m", "bloom_type").head()
               else mf.select("bloom_m").head()
      val m = hd.getInt(0)
      require(m > 0, s"Manifest at $dir was written without a bloom key")
      // cast each probe literal to the BUILD side's key type — the
      // manifest records it precisely because xxhash64 hashes
      // INT/BIGINT/STRING differently, and an untyped lit(3) probed
      // against a BIGINT key would silently bloom-false-negative
      // (pruning files that contain true matches). TRY-mode cast: a
      // plain cast of an uncastable value yields NULL only in
      // non-ANSI sessions and THROWS under spark.sql.ansi.enabled —
      // EvalMode.TRY yields NULL in both.
      // parse the stored type ONCE, not per probe value
      val bkType = if (typed)
        Some(org.apache.spark.sql.types.DataType.fromDDL(hd.getString(1))) else None
      def probeLit(v: Any): Column = bkType.fold(lit(v)) { dt =>
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(lit(v)),
            dt, None, org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))
      }
      // a NULL probe (uncastable value) must select NOTHING — it is
      // equality on an impossible value. The guard is load-bearing:
      // xxhash64 SKIPS null children rather than hashing them, so an
      // unguarded null probe would test FIXED bit positions and could
      // spuriously SELECT files instead of pruning them.
      val any = bloomAnyOf.map { v =>
        val p = probeLit(v)
        p.isNotNull && mightContainRow(p, col("bloom"), m)
      }.reduce(_ || _)
      sel = sel.filter(col("bloom").isNull || any)
    }
    (sel.select("file").collect().map(_.getString(0)), total)
  }

  /** Read `dir` through the manifest: scan only the files
    * [[selectedFiles]] keeps. Falls back to the plain directory read
    * when nothing pruned (no point shipping every path explicitly),
    * and to a schema-preserving empty relation when everything did.
    * Callers apply their residual filter on top — pruning is a scan
    * reduction, the predicate still owns exactness. */
  def prunedRead(spark: SparkSession, dir: String,
      ranges: Seq[(String, Double, Double)] = Nil,
      bloomAnyOf: Seq[Any] = Nil): DataFrame = {
    // the stale-manifest contract (class doc) relies on a read of a
    // manifest-named-but-vanished file failing LOUDLY; with
    // ignoreMissingFiles=true Spark would skip it silently and a
    // manifest left over from a data-dir rewrite would return wrong
    // rows with no error — refuse to run in that configuration.
    require(!spark.conf.get("spark.sql.files.ignoreMissingFiles", "false").toBoolean,
      "Manifest.prunedRead requires spark.sql.files.ignoreMissingFiles=false: " +
        "a stale manifest must fail loudly, not silently drop vanished files")
    val (files, total) = selectedFiles(spark, dir, ranges, bloomAnyOf)
    if (files.length.toLong == total) spark.read.parquet(dir)
    else if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
