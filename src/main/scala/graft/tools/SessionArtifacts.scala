package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-session at-rest artifact locations — the ONE definition of the
  * "build once per (application, data dir), reuse, delete at JVM
  * exit" root that the memoized query artifacts (DedupQ clusters,
  * MiscQ z-order layout) share. Two hand-rolled copies of this idiom
  * had already appeared; a third would start drifting (the tombstone-
  * helper lesson — three copies of one rule is how a fix misses one).
  */
object SessionArtifacts {

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** `tmpdir/graft-artifacts/<appId>/<prefix>-<md5(dataDir)>`, with
    * the per-application root registered for deletion at JVM exit
    * (once per root) so bench / verify / test runs stop leaving
    * orphaned artifact tables in java.io.tmpdir. md5 of the full data
    * dir, not String.hashCode: a 32-bit collision between two dirs in
    * one application would silently overwrite the first artifact. */
  def dirFor(s: SparkSession, prefix: String, dataDir: String): String = {
    val dirKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val appRoot = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft-artifacts",
      s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9._-]", "_"))
    if (cleanupRegistered.add(appRoot.toString))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        FileUtil.deleteTree(appRoot)))
    appRoot.resolve(s"$prefix-$dirKey").toString
  }

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), String]()

  /** Build-once-per-(application, dataDir) at-rest artifact, the OTHER
    * half of the idiom (round-15 review: after [[dirFor]] factored the
    * naming, the memo + measured-bytes file sizing + invalidate had
    * grown a third hand-rolled copy — zorder, manifest, inverted
    * index): memoize the artifact dir, derive the output file count
    * from the MEASURED bytes of `sourcePath` (~`targetBytes` per file,
    * floored at `minFiles` — the floor keeps a pruning granule alive
    * at toy scale, measured bytes dominates at real scale), run
    * `build(dir, files)` exactly once. */
  def ensure(s: SparkSession, prefix: String, dataDir: String,
      sourcePath: String, minFiles: Int = 1, targetBytes: Long = 128L << 20)
      (build: (String, Int) => Unit): String =
    memo.computeIfAbsent((s.sparkContext.applicationId, prefix, dataDir), _ => {
      val dir = dirFor(s, prefix, dataDir)
      val p = new org.apache.hadoop.fs.Path(sourcePath)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val files = math.max(minFiles, math.ceil(
        fs.getContentSummary(p).getLength.toDouble / targetBytes).toInt)
      build(dir, files)
      dir
    })

  /** Bench-only: forget + delete so a setup line's reps each pay the
    * full build. */
  def invalidate(s: SparkSession, prefix: String, dataDir: String): Unit = {
    val dir = memo.remove((s.sparkContext.applicationId, prefix, dataDir))
    if (dir != null) FileUtil.deleteTree(java.nio.file.Paths.get(dir))
  }
}
