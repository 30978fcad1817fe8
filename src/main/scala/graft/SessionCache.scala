package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-keyed memo with LIFECYCLE-BOUND eviction — the shared home
  * for every `TrieMap[(SparkSession, String), _]` cache in the engine
  * (Dedup's shingle/inter tables, Graph's edge table, the LSH signature
  * read, the BPE merge table, Formats' bucketed tables, the MV-ready
  * flag). The entries these caches hold (localCheckpoint'ed DataFrames,
  * registered table names) are only meaningful while their session
  * lives; without eviction a long-lived JVM that starts and stops many
  * sessions (test suites, multi-tenant drivers) pins every stopped
  * session object, its plan graphs, and its checkpoint blocks for the
  * JVM lifetime. Each distinct session installs one
  * SparkListenerApplicationEnd hook, which fires exactly once at
  * `session.stop()` and drops that session's entries from EVERY
  * registered cache.
  *
  * `get` is the drop-in replacement for `map.getOrElseUpdate((s, d),
  * build)`; the per-cache `lock` option serializes builds the way
  * callers that wrapped their TrieMap in `synchronized` did. */
class SessionCache[V](serializedBuilds: Boolean = false) {
  private val map = TrieMap.empty[(SparkSession, String), V]
  SessionCache.register(this)

  def get(s: SparkSession, key: String)(build: => V): V = {
    SessionCache.hook(s)
    if (serializedBuilds)
      map.synchronized(map.getOrElseUpdate((s, key), build))
    else map.getOrElseUpdate((s, key), build)
  }

  /** Drop every entry (test isolation — the ConcurrencySuite contract).
    * `onDrop` runs per dropped value for callers that must release
    * session-live resources (e.g. unpersisting a localCheckpoint). */
  def clear(onDrop: V => Unit = (_: V) => ()): Unit =
    map.keys.foreach(k => map.remove(k).foreach(onDrop))

  private[graft] def evict(s: SparkSession): Unit =
    map.keys.filter(_._1 eq s).foreach(map.remove)
}

object SessionCache {
  private val caches = TrieMap.empty[SessionCache[_], Unit]
  private val hooked = TrieMap.empty[SparkSession, Unit]

  private def register(c: SessionCache[_]): Unit = caches.put(c, ())

  private def hook(s: SparkSession): Unit =
    hooked.getOrElseUpdate(s, {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          caches.keys.foreach(_.evict(s))
          hooked.remove(s)
        }
      })
    })
}
