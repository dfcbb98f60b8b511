package graft.queries

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-lifetime registry for staged backbone tiers (text token/bigram
  * frames, the dedup shingle→component chain, the graph trade-pair root).
  *
  * Fixes two hazards of the bare `TrieMap.getOrElseUpdate` pattern the
  * round-8 backbones used:
  *
  *  - '''Eviction''': entries are keyed by (session, tier); when a caching
  *    session's underlying SparkContext ends, a listener registered on
  *    first use clears that session's entries (best-effort unpersisting
  *    each frame) instead of pinning checkpointed data — and dead session
  *    references — for the JVM lifetime.
  *  - '''Single-flight builds''': the build closure runs at most once per
  *    key. `TrieMap.getOrElseUpdate` may evaluate the thunk twice under a
  *    concurrent first call, and here the thunk runs an EAGER
  *    persist/localCheckpoint job — a double evaluation would leak a whole
  *    extra materialization. Builds run under the registry lock; that
  *    serializes concurrent first-builders of different tiers, which is
  *    acceptable because suite runs (Verify/Bench) drive queries
  *    sequentially and the tiers of one family chain on each other anyway.
  *
  * Staleness caveat (deliberate, documented): entries are NOT invalidated
  * if the parquet files under the keyed `dir` are rewritten within one
  * JVM. The suite contract is that data dirs are immutable for a session's
  * lifetime; a caller that does rewrite inputs in place must call
  * [[invalidate]] for the affected (session, prefix) first.
  */
object BackboneRegistry {

  private val entries = mutable.LinkedHashMap.empty[(SparkSession, String), DataFrame]
  private val hooked = mutable.HashSet.empty[SparkSession]

  /** The cached frame for (s, key), building (and caching) it exactly once.
    * `build` must return an already-pinned frame (persisted or eagerly
    * checkpointed) — the registry stores what it is given.
    */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      entries.getOrElseUpdate((s, key), { hook(s); build })
    }

  /** Register the context-end eviction hook for `s`, once per session. */
  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          clearSession(s)
      })
    }

  /** Drop every entry cached by `s`, best-effort unpersisting each frame
    * (unpersist on an already-stopped context throws; swallowed — the
    * stopped context released the storage anyway).
    */
  def clearSession(s: SparkSession): Unit = synchronized {
    val dead = entries.keys.filter(_._1 eq s).toVector
    dead.foreach { k =>
      scala.util.Try(entries(k).unpersist(blocking = false))
      entries.remove(k)
    }
    hooked.remove(s)
  }

  /** Drop (and best-effort unpersist) the entries of `s` whose key starts
    * with `prefix` — the hook for callers that rewrite a staged dir in
    * place within one JVM.
    */
  def invalidate(s: SparkSession, prefix: String): Unit = synchronized {
    val hit = entries.keys.filter(k => (k._1 eq s) && k._2.startsWith(prefix)).toVector
    hit.foreach { k =>
      scala.util.Try(entries(k).unpersist(blocking = false))
      entries.remove(k)
    }
  }

  /** Number of live entries for `s` (test observability). */
  def size(s: SparkSession): Int = synchronized {
    entries.keys.count(_._1 eq s)
  }
}
