package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.{Bucketing, Staging}

/** Bucketed, in-bucket-SORTED staged copies of the events table — the
  * in-storage backbone for the session/funnel/window family (r8 verdict
  * lever 1).
  *
  * ~10 declared queries open with the identical physical prologue: shuffle
  * events by `user_id` (sessionize q51, transitions q66, funnel q81, paths
  * q84, bounce q89, WAU q73, attribution q80) or by `event_type` (rolling
  * anomaly q64, rolling median q88), then sort each partition by time.
  * Every one of them used to pay that exchange + sort privately, per run.
  * Staging events ONCE as two bucketed tables — bucketed by the partition
  * key, in-bucket sorted by (key, ts, event_id), ONE file per bucket —
  * moves the shuffle and the sort into storage: the bucketed scan reports
  * `HashPartitioning(key)` and its sort order, so `WindowExec` (and the
  * per-key aggregates) plan with NO exchange and NO sort. This is the
  * durable twin of the r8 in-memory backbones (text/dedup/graph): same
  * amortization, but across JVMs too ([[Staging.ensure]] re-registers a
  * prior run's files metadata-only).
  *
  * At 100 TB this is exactly how an event log should land: ingest writes
  * bucket-pruned, time-sorted files per user shard (thousands of buckets,
  * not [[buckets]]=8 — the constant here is sized to test hardware), and
  * every downstream sessionization/funnel/attribution job reads them
  * exchange-free forever. The ts normalization in [[Tables.events]] is
  * applied once at stage time, so consumers read proper TIMESTAMP micros.
  *
  * Probe-only: the sorted single-file-per-bucket contract would be voided
  * by appends ([[Bucketing.writeBucketedSorted]]); streaming maintenance
  * belongs to the append-tolerant index paths, not here.
  *
  * `SPARK_GRAFT_EVENTS_BACKBONE=false` routes every consumer back to the
  * raw parquet scan for A/B adjudication — results are bit-identical, only
  * the plan changes (the differential spec pins both).
  */
object EventsBackbone {

  val buckets = 8

  private def enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_EVENTS_BACKBONE", "true").toBoolean

  /** Session-validated staged-table names, held by [[BackboneRegistry]]
    * (session-evicted, r10) and re-validated against the catalog — a second
    * session in one JVM has a fresh in-memory catalog, so a dir-only hit
    * would hand it names only a dead catalog created.
    */
  private def stagedTables(s: SparkSession, dir: String): (String, String) = {
    val ts = BackboneRegistry.namesOrBuild(s, s"events_sorted:$dir")(
      _.forall(s.catalog.tableExists)) {
      val tag = dir.split('/').last.replace('.', '_') +
        "_" + java.lang.Integer.toUnsignedString(dir.hashCode, 36)
      val byU = s"graft_ev_user_b${buckets}_$tag"
      val byT = s"graft_ev_type_b${buckets}_$tag"
      Staging.ensure(s,
        Staging.fingerprint(s, dir, s"events_sorted_user_type:b$buckets:v1"),
        Seq(byU, byT)) {
        val ev = Tables.events(s, dir)
        Bucketing.writeBucketedSorted(ev, byU, "user_id",
          Seq("user_id", "ts", "event_id"), buckets)
        Bucketing.writeBucketedSorted(ev, byT, "event_type",
          Seq("event_type", "ts", "event_id"), buckets)
      }
      Seq(byU, byT)
    }
    (ts(0), ts(1))
  }

  /** Events clustered on `user_id`, sorted (user_id, ts, event_id): the
    * scan itself satisfies every per-user window and aggregation.
    */
  def byUser(s: SparkSession, dir: String): DataFrame =
    if (!enabled) Tables.events(s, dir)
    else Bucketing.read(s, stagedTables(s, dir)._1)

  /** Events clustered on `event_type`, sorted (event_type, ts, event_id):
    * the scan satisfies the rolling-anomaly/median windows.
    */
  def byType(s: SparkSession, dir: String): DataFrame =
    if (!enabled) Tables.events(s, dir)
    else Bucketing.read(s, stagedTables(s, dir)._2)
}
