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

  def cache(df: DataFrame): DataFrame = synchronized {
    df.persist()
    bag += df
    df
  }

  /** Track an ALREADY-persisted DataFrame for the next [[drain]]
    * (e.g. an iterative operator's final materialized state). */
  def track(df: DataFrame): DataFrame = synchronized {
    bag += df
    df
  }

  /** Track an already-persisted RDD (e.g. a localCheckpoint'd
    * iteration result a returned DataFrame still reads from — its
    * blocks must outlive the caller's action, then be dropped). */
  def trackRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    synchronized { rddBag += rdd; rdd }

  def drain(): Unit = synchronized {
    bag.foreach(_.unpersist(blocking = false))
    bag.clear()
    rddBag.foreach(_.unpersist(blocking = false))
    rddBag.clear()
  }
}
