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
  // staged-TABLE-NAME resolutions (the catalog owns the data; this caches
  // only which names a (session, dir) staged) — same lifecycle as `entries`
  private val names = mutable.LinkedHashMap.empty[(SparkSession, String), Seq[String]]
  // small derived scalars (corpus counts, resolved code widths) — cheap
  // values, but a bare session-keyed map would still pin the stopped
  // session's whole object graph for the JVM lifetime
  private val scalars = mutable.LinkedHashMap.empty[(SparkSession, String), Any]
  private val hooked = mutable.HashSet.empty[SparkSession]

  /** The cached frame for (s, key), building (and caching) it exactly once.
    * `build` must return an already-pinned frame (persisted or eagerly
    * checkpointed) — the registry stores what it is given.
    */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    synchronized {
      entries.getOrElseUpdate((s, key), { hook(s); build })
    }

  /** The cached staged-table-name resolution for (s, key): reused while
    * `live` holds for the cached names (callers pass a catalog-existence
    * probe, so a fresh in-memory catalog re-stages rather than trusting a
    * stale entry), rebuilt otherwise, evicted with the session like the
    * frame entries. This retires the per-file `TrieMap[(SparkSession,
    * String), names]` pattern (r9 "what's wrong" #1), whose entries
    * strongly referenced stopped sessions for the JVM lifetime.
    */
  def namesOrBuild(s: SparkSession, key: String)(live: Seq[String] => Boolean)(
      build: => Seq[String]): Seq[String] =
    synchronized {
      names.get((s, key)).filter(live).getOrElse {
        hook(s)
        val v = build
        names((s, key)) = v
        v
      }
    }

  /** The cached derived scalar for (s, key) — counts, resolved widths —
    * computed once per key, evicted with the session.
    */
  def scalarOrBuild[T](s: SparkSession, key: String)(build: => T): T =
    synchronized {
      scalars.getOrElseUpdate((s, key), { hook(s); build }).asInstanceOf[T]
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
    names.keys.filter(_._1 eq s).toVector.foreach(names.remove)
    scalars.keys.filter(_._1 eq s).toVector.foreach(scalars.remove)
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
    names.keys.filter(k => (k._1 eq s) && k._2.startsWith(prefix)).toVector
      .foreach(names.remove)
  }

  /** Number of live frame entries for `s` (test observability). */
  def size(s: SparkSession): Int = synchronized {
    entries.keys.count(_._1 eq s)
  }

  /** Number of live staged-name entries for `s` (test observability). */
  def namesSize(s: SparkSession): Int = synchronized {
    names.keys.count(_._1 eq s)
  }
}
