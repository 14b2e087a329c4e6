package graft

import org.apache.spark.sql.SparkSession

/** Weak-keyed per-session state holders. Library-side maps keyed by
  * SparkSession must not pin sessions in memory: in a long-lived
  * multi-session process a stopped, dereferenced session (and the
  * function catalogs / option state hanging off it) has to be
  * garbage-collectable. WeakHashMap drops the entry once the session is
  * otherwise unreachable; synchronization wraps it for the concurrent
  * access patterns the engine uses (computeIfAbsent is synchronized on
  * the map, which is all these per-session registries need).
  */
object PerSession {

  def map[V](): java.util.Map[SparkSession, V] =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, V]())

  def set(): java.util.Set[SparkSession] =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
}
