package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared publish/load machinery for EPOCHED at-rest artifacts
  * ([[LmArtifact]], [[BenchmarkShingles]]): each rebuild writes its
  * data under a fresh `<prefix>-<epoch>/` directory, then commits an
  * atomically-renamed meta JSON naming the live epoch — so a reader
  * mid-rebuild sees either the old artifact whole or the new one
  * whole, never a cross-pairing or a half-written data dir. The
  * immediately-previous epoch is kept for readers that loaded just
  * before the publish; older epochs are GC'd at commit.
  */
object EpochedArtifact {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def readMeta(spark: SparkSession, dir: String, metaFile: String)
      : Option[com.fasterxml.jackson.databind.JsonNode] = {
    val p = new org.apache.hadoop.fs.Path(dir, metaFile)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new com.fasterxml.jackson.databind.ObjectMapper().readTree(in))
      finally in.close()
    }
  }

  /** The epoch a rebuild should write into: current live epoch + 1
    * (0 for a fresh dir, and for pre-epoch metas without the field). */
  def nextEpoch(spark: SparkSession, dir: String, metaFile: String): Long =
    readMeta(spark, dir, metaFile)
      .flatMap(m => Option(m.get("epoch")).map(_.asLong() + 1L))
      .getOrElse(0L)

  /** Commit `epoch` as live: write the meta (version + epoch +
    * `fields`) via stage + OVERWRITE-rename ([[IvfIndex.save]]'s
    * publish contract), then GC `<prefix>-*` dirs older than the
    * replaced epoch. */
  def commit(spark: SparkSession, dir: String, metaFile: String, prefix: String,
      version: Int, epoch: Long, fields: Map[String, Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, metaFile)
    val f = fs(spark, dir)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", version)
    root.put("epoch", epoch)
    fields.toSeq.sortBy(_._1).foreach { case (k, v) => root.put(k, v) }
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$metaFile.tmp")
    val out = f.create(tmp, true)
    try out.write(om.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(p.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith(s"$prefix-"))
      .filter(_.getPath.getName.stripPrefix(s"$prefix-").toLong < epoch - 1)
      .foreach(s => f.delete(s.getPath, true))
  }

  /** On-disk byte size of an epoch data dir (for guarded broadcast
    * hints). */
  def dirBytes(spark: SparkSession, dir: String, name: String): Long =
    fs(spark, dir).getContentSummary(new org.apache.hadoop.fs.Path(dir, name)).getLength

  /** Read an epoch data dir with a SIZE-GATED broadcast hint: the
    * artifact tables are normally MBs (Heaps'-law vocabularies,
    * benchmark shingle sets) and belong on the build side of every
    * scan join — but a degenerate giant one must degrade to a shuffle
    * join, not a driver OOM. One policy, shared by every artifact. */
  def loadGated(spark: SparkSession, dir: String, name: String,
      maxBroadcastBytes: Long = 1L << 30): org.apache.spark.sql.DataFrame = {
    val df = spark.read.parquet(s"$dir/$name")
    if (dirBytes(spark, dir, name) <= maxBroadcastBytes)
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}
