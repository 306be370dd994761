package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row}

/** Exactly-once delivery to external sinks — the reference's headline
  * guarantee (Kafka2Kafka.java:27 `enableCheckpointing(...,
  * EXACTLY_ONCE)` + :45 `DeliveryGuarantee.EXACTLY_ONCE`, a
  * transactional Kafka producer committed at checkpoint time).
  *
  * Spark-first shape: Structured Streaming's checkpoint already makes
  * the SOURCE side exactly-once (a failed micro-batch replays with the
  * same batchId over the same offsets). What Flink's transactional
  * producer adds — and [[GraftSink]]'s at-least-once path lacks — is
  * that a replayed batch must not re-deliver rows already shipped. The
  * standard Spark pattern is `foreachBatch` + a TWO-PHASE transport:
  *
  *  1. STAGE: each partition streams its payload under a transaction
  *     id `sinkId-batchId` AND a per-invocation ATTEMPT epoch,
  *     replacing any earlier staging for that (attempt, partition).
  *     The attempt epoch is the WRITER FENCE: a zombie task from a
  *     crashed earlier attempt keeps writing into ITS OWN attempt's
  *     staging area, which no commit will ever publish — so a
  *     straggler can never slip a stale partition into the committed
  *     view (Flink analog: the transactional producer's epoch/
  *     producer-id fencing).
  *  2. COMMIT: one atomic, idempotent publish of exactly partitions
  *     [0, nParts) of the committing attempt. The commit marker is
  *     itself the persisted (sinkId, batchId) LEDGER: a replay of a
  *     fully-committed batch short-circuits before reading any data.
  *
  * A crash after stage but before commit therefore re-stages under a
  * fresh attempt and commits once; a crash after commit skips;
  * duplicates are impossible in the published view. This is exactly
  * the window the at-least-once path gets wrong (it re-sends the
  * whole batch).
  *
  * Wire transports don't exist in this environment, so the two
  * implementations are a file sink (staged-then-atomic-rename — the
  * real protocol for any file-like/object-store target) and a memory
  * sink (models a transactional endpoint; used by the failure-
  * injection tests). An ES/HBase/Doris deployment plugs the same
  * [[TxnTransport]] seam with the system's native idempotence
  * (ES `_id` upserts, HBase row versions, Doris txn labels).
  */
object ExactlyOnce {

  /** Two-phase transport: the fenced staging + atomic commit contract.
    * `txnId` is `sinkId-batchId` — stable across replays; `attempt` is
    * unique per batch invocation — the zombie-writer fence. */
  trait TxnTransport extends Serializable {
    /** Stream partition `part`'s payload for (txnId, attempt),
      * replacing any previous staging for that triple. Called from
      * executors; must be idempotent under task retry. The iterator is
      * consumed once — implementations must not buffer the whole
      * partition unless their medium requires it. */
    def stage(txnId: String, attempt: String, part: Int, payload: Iterator[Array[Byte]]): Unit
    /** Atomically publish exactly partitions [0, nParts) of `attempt`.
      * Idempotent on `txnId`: committing an already-committed txn is a
      * no-op. Driver-side. Must fail loudly if a staged partition in
      * [0, nParts) is missing, and must never publish partitions
      * staged by OTHER attempts. */
    def commit(txnId: String, attempt: String, nParts: Int): Unit
    /** Has `txnId` been published? Driver-side ledger probe. */
    def committed(txnId: String): Boolean
  }

  /** Staged-then-atomic-rename file transport: stage at
    * `root/.staging/txnId/attempt/part-N`, commit = single directory
    * rename of the attempt dir to `root/txnId` (atomic on POSIX and
    * HDFS-like stores; object stores substitute a manifest write).
    * Committed-directory existence is the ledger; zombie attempts'
    * staging stays under `.staging` and is swept on commit. */
  final class FileTxnTransport(root: String) extends TxnTransport {
    private def txnStaging(txnId: String): Path = Paths.get(root, ".staging", txnId)
    private def attemptDir(txnId: String, attempt: String): Path = txnStaging(txnId).resolve(attempt)
    private def commitDir(txnId: String): Path = Paths.get(root, txnId)

    override def stage(txnId: String, attempt: String, part: Int,
        payload: Iterator[Array[Byte]]): Unit = {
      val dir = attemptDir(txnId, attempt)
      Files.createDirectories(dir)
      // stream-then-rename, with the tmp file OUTSIDE the attempt dir:
      // rows go to disk as they arrive (no whole-partition buffering),
      // a killed task never leaves a torn file anywhere a commit could
      // publish, and a same-attempt straggler racing commit's
      // cleanup→rename window can only land a COMPLETE part file whose
      // content equals the committed attempt's (same attempt ⇒ same
      // partitioning ⇒ same rows) — never torn bytes
      val tmp = txnStaging(txnId).resolve(s".tmp-part-$part-${java.util.UUID.randomUUID()}")
      val out = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
      try payload.foreach(out.write) finally out.close()
      Files.move(tmp, dir.resolve(s"part-$part"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }

    override def commit(txnId: String, attempt: String, nParts: Int): Unit = {
      if (committed(txnId)) return
      val dir = attemptDir(txnId, attempt)
      // an EMPTY micro-batch (foreachBatch fires with no data) stages
      // nothing — publish an empty txn dir so the ledger still records
      // the batch instead of crashing the stream
      Files.createDirectories(dir)
      // publish exactly parts [0, nParts) of THIS attempt: drop tmp
      // litter, and fail loudly on a missing part
      val keep = (0 until nParts).map(p => s"part-$p").toSet
      val listing = Files.list(dir)
      try listing.forEach { f =>
        if (!keep.contains(f.getFileName.toString)) Files.delete(f)
      } finally listing.close()
      (0 until nParts).foreach { p =>
        require(Files.exists(dir.resolve(s"part-$p")),
          s"commit($txnId, $attempt): staged part-$p missing (expected $nParts parts)")
      }
      Files.createDirectories(Paths.get(root))
      Files.move(dir, commitDir(txnId), StandardCopyOption.ATOMIC_MOVE)
      // best-effort sweep of other (zombie) attempts' staging — they
      // were never publishable, this just reclaims space. The txn IS
      // committed at this point: nothing below may throw (a concurrent
      // zombie renaming files makes the walk itself racy, not just the
      // deletes), or a published batch would crash the stream.
      try {
        val leftovers = txnStaging(txnId)
        if (Files.isDirectory(leftovers)) {
          val l = Files.walk(leftovers)
          try l.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => try Files.deleteIfExists(p) catch { case _: java.io.IOException => () })
          finally l.close()
        }
      } catch { case _: Exception => () }
    }

    override def committed(txnId: String): Boolean = Files.isDirectory(commitDir(txnId))
  }

  /** In-memory transactional endpoint for tests. Executor closures get
    * COPIES of this object even in local mode, so state lives in a
    * JVM-wide registry keyed by name (the standard local-mode test-sink
    * pattern) — the driver-side assertions and executor-side stages see
    * the same maps. */
  final case class MemoryTxnTransport(name: String) extends TxnTransport {
    import MemoryTxnTransport._
    override def stage(txnId: String, attempt: String, part: Int,
        payload: Iterator[Array[Byte]]): Unit = {
      val data = payload.toArray // memory medium: materialize
      val s = state(name)
      s.synchronized {
        // a zombie staging AFTER its txn committed would sit in the
        // map forever (no future commit of this txn runs the sweep) —
        // drop it at the door
        if (s.visible.contains(txnId)) return
        s.staged.getOrElseUpdate((txnId, attempt), collection.mutable.Map()).update(part, data)
      }
    }
    override def commit(txnId: String, attempt: String, nParts: Int): Unit = {
      val s = state(name)
      s.synchronized {
        if (s.visible.contains(txnId)) return
        // empty micro-batch: nothing staged, commit records an empty txn
        val parts = s.staged.getOrElse((txnId, attempt),
          collection.mutable.Map.empty[Int, Array[Array[Byte]]])
        // same contract as the file transport: a missing staged part is
        // a protocol bug and must fail loudly, never publish a hole
        (0 until nParts).foreach { p =>
          if (!parts.contains(p)) throw new IllegalStateException(
            s"commit($txnId, $attempt): staged part-$p missing (expected $nParts parts)")
        }
        s.visible(txnId) = (0 until nParts).toArray.flatMap(parts(_))
        s.staged.filterInPlace { case ((t, _), _) => t != txnId } // sweep all attempts
      }
    }
    override def committed(txnId: String): Boolean = {
      val s = state(name)
      s.synchronized(s.visible.contains(txnId))
    }
    /** All PUBLISHED requests across committed txns (test observable —
      * staged-but-uncommitted data is invisible, as at a real endpoint). */
    def visibleRequests: Seq[Array[Byte]] = {
      val s = state(name)
      s.synchronized(s.visible.toSeq.sortBy(_._1).flatMap(_._2))
    }
    def reset(): Unit = { val s = state(name); s.synchronized { s.staged.clear(); s.visible.clear() } }
  }
  object MemoryTxnTransport {
    private final class State {
      val staged = collection.mutable.Map[(String, String), collection.mutable.Map[Int, Array[Array[Byte]]]]()
      val visible = collection.mutable.Map[String, Array[Array[Byte]]]()
    }
    private val registry = new java.util.concurrent.ConcurrentHashMap[String, State]()
    private def state(name: String): State =
      registry.computeIfAbsent(name, _ => new State)
  }

  /** Deliver one micro-batch exactly once: skip if the ledger says
    * committed, else stage every partition under a fresh attempt epoch
    * (executor-parallel, payload streamed row-wise through the
    * [[GraftSink]] encoders) and commit that attempt. Use from
    * `writeStream.foreachBatch((df, id) => batch(df, id, ...))` —
    * Structured Streaming guarantees a replayed micro-batch carries
    * the SAME batchId over the SAME source offsets, which is what makes
    * `sinkId-batchId` a stable transaction id. */
  def batch(df: DataFrame, batchId: Long, sinkId: String, transport: TxnTransport,
      encode: Row => Array[Byte]): Unit = {
    val txnId = s"$sinkId-$batchId"
    if (transport.committed(txnId)) return // replayed, already-published batch
    val attempt = java.util.UUID.randomUUID().toString // writer fence for THIS invocation
    // the partition count comes from the STAGING JOB itself (every task
    // reports its partitionId through an accumulator), not a second
    // walk of the plan (`df.rdd.getNumPartitions` would re-plan, and
    // nothing guarantees the two walks agree once AQE re-plans between
    // them). Action accumulators count once per successful task, and
    // max is idempotent under retries anyway.
    val partIds = df.sparkSession.sparkContext.collectionAccumulator[Int]("graft.exactlyOnce.parts")
    df.foreachPartition { (rows: Iterator[Row]) =>
      val part = org.apache.spark.TaskContext.get().partitionId()
      transport.stage(txnId, attempt, part, rows.map(encode))
      partIds.add(part)
    }
    val staged = { import scala.jdk.CollectionConverters._; partIds.value.asScala.toSet }
    val nParts = if (staged.isEmpty) 0 else staged.max + 1
    // RDD partition ids are dense [0, n): a gap means a task staged
    // without reporting (or vice versa) — a protocol bug, fail loudly
    // before commit can publish a hole
    require(staged.size == nParts,
      s"stage($txnId, $attempt): staged partitions ${staged.toSeq.sorted.mkString(",")} are not dense [0, $nParts)")
    transport.commit(txnId, attempt, nParts)
  }
}
