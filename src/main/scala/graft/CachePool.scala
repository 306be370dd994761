package graft

import org.apache.spark.sql.DataFrame

/** Scoped persist tracking for query builders.
  *
  * Query builders (DedupQ) persist intermediate shingle sets shared by
  * several plan subtrees, but return a DataFrame — they can't
  * unpersist before the caller's action runs. Builders register
  * persists here; the drivers (Bench / Verify / tests) call [[drain]]
  * after each query's action, so cached RDDs don't accumulate across
  * 37 queries and re-built plans don't hit "Asked to cache already
  * cached data" on an executor-memory-resident twin. */
object CachePool {
  private val bag = scala.collection.mutable.ArrayBuffer[DataFrame]()
  private val rddBag = scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()

  /** Per-thread scope: entries registered inside [[scoped]] land here
    * instead of the global bags, so a long-lived owner (a streaming
    * micro-batch) can release exactly ITS caches without unpersisting
    * localCheckpoint'd blocks a concurrent query still reads —
    * truncated lineage makes those unrecoverable, not just slow. */
  private final class Scope {
    val dfs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val rdds = scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()
  }
  private val currentScope = new ThreadLocal[Scope]()

  /** Run `f` with a private cache scope on this thread: everything
    * registered during `f` (by `f` or operators it calls) is
    * unpersisted when the scope exits — AFTER `f`'s own actions have
    * consumed the blocks. Nests; restores the outer scope. */
  def scoped[A](f: => A): A = {
    val outer = currentScope.get()
    val s = new Scope
    currentScope.set(s)
    try f
    finally {
      currentScope.set(outer)
      s.dfs.foreach(_.unpersist(blocking = false))
      s.rdds.foreach(_.unpersist(blocking = false))
    }
  }

  def cache(df: DataFrame): DataFrame = synchronized {
    df.persist()
    val s = currentScope.get()
    if (s != null) s.dfs += df else bag += df
    df
  }

  /** Track an ALREADY-persisted DataFrame for the next [[drain]]
    * (e.g. an iterative operator's final materialized state). */
  def track(df: DataFrame): DataFrame = synchronized {
    val s = currentScope.get()
    if (s != null) s.dfs += df else bag += df
    df
  }

  /** Track an already-persisted RDD (e.g. a localCheckpoint'd
    * iteration result a returned DataFrame still reads from — its
    * blocks must outlive the caller's action, then be dropped). */
  def trackRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    synchronized {
      val s = currentScope.get()
      if (s != null) s.rdds += rdd else rddBag += rdd
      rdd
    }

  /** Drain the GLOBAL bags (driver loops: Bench/Verify/tests, one
    * query at a time). Scoped entries are owned by their scope. */
  def drain(): Unit = synchronized {
    bag.foreach(_.unpersist(blocking = false))
    bag.clear()
    rddBag.foreach(_.unpersist(blocking = false))
    rddBag.clear()
  }
}
