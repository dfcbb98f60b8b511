package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.StreamOps

/** Driver-gate coverage for the streaming twins (r11 verdict item 6).
  *
  * The ten StreamOps operators were spec-only by nature — no DuckDB oracle
  * can run a micro-batch replay. These queries close that gap with the shape
  * the verdict prescribed: each one REPLAYS the events table through the
  * streaming operator in multiple genuine micro-batches, diffs the streamed
  * result against the batch operator IN-ENGINE, and declares a one-row
  * summary whose `diffs` column must be 0 and whose surface counts DuckDB
  * recomputes independently — so the driver's hash gate now certifies both
  * "stream ≡ batch" and "the compared surface is the real one".
  *
  * Replay harness: the events projection is staged once per (session, dir)
  * as [[replayBatches]] ts-RANGE-partitioned parquet files whose modified
  * times are forced into ascending range order, then read back with
  * `readStream.option("maxFilesPerTrigger", 1)` — one file per micro-batch,
  * arrival in event-time order (the ordering contract every stateful twin
  * documents), state carried ACROSS batches, and — unlike a MemoryStream
  * feeder — no driver-side collect of the corpus: the stage write is a
  * distributed job, and the driver only touches [[replayBatches]] file
  * mtimes. Session boundaries, rolling windows, and TWAP cursors must
  * therefore survive real batch cuts, which a single-batch replay never
  * exercises.
  */
object StreamGateQueries {

  val replayBatches = 3

  /** Stage (once per session+dir) the replay file set: the events projection
    * range-partitioned by ts into [[replayBatches]] files. Equal timestamps
    * land in one file (range partitioner), so ascending-file arrival
    * preserves every twin's (ts, event_id) ordering contract across batch
    * cuts.
    */
  private def replayPath(s: SparkSession, dir: String): String =
    BackboneRegistry.namesOrBuild(s, s"streamgate:$dir")(
      _.forall(p => new java.io.File(p, "_SUCCESS").exists)) {
      val tag = dir.split('/').last.replace('.', '_') +
        "_" + java.lang.Integer.toUnsignedString(dir.hashCode, 36)
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft_replay_$tag").getAbsolutePath
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
        .repartitionByRange(replayBatches, col("ts"))
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite").parquet(out)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      files.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1600000000000L + i * 60000L)
      }
      Seq(out)
    }.head

  /** Run `op` over the staged replay as a [[replayBatches]]-micro-batch
    * stream into a memory sink; returns the sink table as a DataFrame.
    */
  private def replay(s: SparkSession, dir: String)(
      op: DataFrame => DataFrame): DataFrame = {
    val path = replayPath(s, dir)
    val schema = s.read.parquet(path).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(path)
    val name = s"sg_${java.lang.Long.toUnsignedString(System.nanoTime, 36)}"
    val q = op(src).writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sg_ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** Same, for complete-mode aggregations. */
  private def replayComplete(s: SparkSession, dir: String)(
      op: DataFrame => DataFrame): DataFrame = {
    val path = replayPath(s, dir)
    val schema = s.read.parquet(path).schema
    val src = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(path)
    val name = s"sg_${java.lang.Long.toUnsignedString(System.nanoTime, 36)}"
    val q = op(src).writeStream.format("memory").queryName(name)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sg_ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }

  /** Symmetric multiset difference — 0 iff the streamed result equals the
    * batch twin exactly (values included).
    */
  private def diffCount(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  /** `stream_sessions` — C129 under the driver gate: the sessionization
    * twin replays in [[replayBatches]] batches (sessions must close across
    * batch cuts), diffs against batch q51's CLOSED sessions (every session
    * except each user's final, still-open one — the append-stream contract),
    * and declares (users, closed_sessions, diffs); DuckDB recomputes the
    * first two from the same gap construction as the q51 oracle.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streamed = replay(s, dir)(df => StreamOps.sessionsStream(df).toDF())
      .select("user_id", "session", "events", "start_ts", "end_ts")
    val batch = CoreQueries.sessionize(s, dir)
    val closed = batch.join(
        batch.groupBy("user_id").agg(max("session").as("session")),
        Seq("user_id", "session"), "left_anti")
      .select("user_id", "session", "events", "start_ts", "end_ts")
    val users = Tables.events(s, dir).select("user_id").distinct().count()
    Seq((users, closed.count(), diffCount(streamed, closed)))
      .toDF("users", "closed_sessions", "diffs")
  }

  /** `stream_twap` — C138 under the driver gate: the TWAP cursor's final
    * emission per type (the max-(n, total_us) row of the append stream)
    * must equal batch q92 after a replay whose batch cuts slice every
    * type's event sequence.
    */
  def twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streamed = replay(s, dir)(df => StreamOps.twapStream(df).toDF())
      .groupBy("event_type")
      .agg(max(struct(col("n"), col("total_us"), col("twap"))).as("f"))
      .select(col("event_type"), col("f.n"), col("f.total_us"), col("f.twap"))
    val batch = CoreQueries.q92(s, dir)
      .select("event_type", "n", "total_us", "twap")
    Seq((batch.count(), diffCount(streamed, batch)))
      .toDF("types", "diffs")
  }

  /** `stream_wau` — C118 under the driver gate: each (user, day) emits at
    * most once from the keyed dedup state, so WAU is a plain count over the
    * append stream; must equal batch q73 exactly.
    */
  def wau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streamed = replay(s, dir)(df =>
        StreamOps.wauCoverageStream(df.select(col("user_id"), col("ts"))).toDF())
      .groupBy("day").agg(count(lit(1)).as("wau"))
      .select("day", "wau")
    val batch = CoreQueries.q73(s, dir)
    Seq((batch.count(), diffCount(streamed, batch)))
      .toDF("days", "diffs")
  }

  /** `stream_anomaly` — the C81 twin under the driver gate: rolling
    * mean/stddev state must survive batch cuts mid-window; compared under
    * q64's declared cap (first 500 of the total (type, id) order) so the
    * diff surface equals the driver-hashed q64 frame.
    */
  def anomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streamed = replay(s, dir)(df => StreamOps.anomalyStream(df).toDF())
      .select("event_type", "event_id", "value", "roll_avg", "roll_sd")
      .orderBy("event_type", "event_id").limit(500)
    val batch = CoreQueries.q64(s, dir)
    Seq((batch.count(), diffCount(streamed, batch)))
      .toDF("anomalies", "diffs")
  }

  /** `stream_heavy` — C127 under the driver gate: the windowed heavy-hitter
    * sketch in its exact regime (5 types ≤ 64 counters) must reproduce the
    * batch per-window counts; surface = (6h-window × type) groups and total
    * events, both DuckDB-recomputable.
    */
  def heavy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val streamed = replayComplete(s, dir)(df =>
        StreamOps.heavyHittersStream(df.select(col("ts"), col("event_type"))))
      .select("w", "event_type", "c")
    val batch = Tables.events(s, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .count()
      .select(col("window.start").as("w"), col("event_type"), col("count").as("c"))
    val events = Tables.events(s, dir).count()
    Seq((batch.count(), events, diffCount(streamed, batch)))
      .toDF("groups", "events", "diffs")
  }

  /** Expectation rules for the streaming monitor gate — one wide-open, one
    * deliberately tight so violations actually flow through the replay.
    */
  val gateRules = Seq((1, "click", 0.0, 1.0e9), (2, "view", 0.0, 5.0))

  /** `stream_expectations` — C166 under the driver gate: the live
    * rules-as-data monitor over 6h event-time windows must equal the batch
    * rule evaluation; surface = (window × rule) rows and total violations,
    * both DuckDB-recomputable from the same VALUES rules.
    */
  def expectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rules = gateRules.toDF("rule_id", "event_type", "lo", "hi")
    val streamed = replayComplete(s, dir)(df =>
        StreamOps.expectationsStream(
          df.select(col("ts"), col("event_type"), col("value")), rules))
    val batch = Tables.events(s, dir)
      .join(broadcast(rules), Seq("event_type"))
      .groupBy(window(col("ts"), "6 hours"), col("rule_id"), col("event_type"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, 1)).as("nulls"),
        count(when(col("value") < col("lo") || col("value") > col("hi"), 1))
          .as("violations"))
      .select(col("window.start").as("w"), col("rule_id"), col("event_type"),
        col("n_rows"), col("nulls"), col("violations"))
    val viol = batch.agg(sum("violations")).first().getLong(0)
    Seq((batch.count(), viol, diffCount(streamed, batch)))
      .toDF("rule_windows", "violations", "diffs")
  }

  /** DuckDB oracles: `diffs` is the in-engine certificate (always 0 when
    * stream ≡ batch); the surface columns are recomputed independently —
    * the q51-oracle gap construction for sessions, HAVING-≥2 types for the
    * TWAP cursor, the q73/q64 oracles wrapped in counts, epoch-bucket
    * groups for the windowed pair.
    */
  val oracle: Map[String, String] = Map(
    "stream_sessions" ->
      s"""WITH b AS (SELECT user_id,
         |    CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > ${CoreQueries.sessionGapSec}
         |         THEN 1 ELSE 0 END AS brk FROM
         |  (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
         |   FROM events) t)
         |SELECT count(DISTINCT user_id) AS users,
         |  CAST(sum(brk) - count(DISTINCT user_id) AS BIGINT) AS closed_sessions,
         |  CAST(0 AS BIGINT) AS diffs
         |FROM b""".stripMargin,
    "stream_twap" ->
      """SELECT count(*) AS types, CAST(0 AS BIGINT) AS diffs
        |FROM (SELECT event_type FROM events GROUP BY 1 HAVING count(*) >= 2) t""".stripMargin,
    "stream_wau" ->
      s"""SELECT count(*) AS days, CAST(0 AS BIGINT) AS diffs
         |FROM (${Oracles.core("q73_rolling_wau")}) t""".stripMargin,
    "stream_anomaly" ->
      s"""SELECT count(*) AS anomalies, CAST(0 AS BIGINT) AS diffs
         |FROM (${Oracles.core("q64_rolling_anomaly")}) t""".stripMargin,
    "stream_heavy" ->
      """SELECT count(*) AS groups, CAST(sum(c) AS BIGINT) AS events,
        |  CAST(0 AS BIGINT) AS diffs
        |FROM (SELECT epoch_us(ts)//21600000000 AS w, event_type, count(*) AS c
        |      FROM events GROUP BY 1, 2) t""".stripMargin,
    "stream_expectations" -> {
      val vals = gateRules
        .map { case (id, t, lo, hi) => s"($id, '$t', ${lo}::DOUBLE, ${hi}::DOUBLE)" }
        .mkString(", ")
      s"""WITH rules(rule_id, event_type, lo, hi) AS (VALUES $vals),
         |g AS (SELECT epoch_us(ts)//21600000000 AS w, r.rule_id,
         |    count(*) AS n_rows,
         |    count(CASE WHEN value < lo OR value > hi THEN 1 END) AS violations
         |  FROM events e JOIN rules r ON r.event_type = e.event_type
         |  GROUP BY 1, 2)
         |SELECT count(*) AS rule_windows,
         |  CAST(sum(violations) AS BIGINT) AS violations,
         |  CAST(0 AS BIGINT) AS diffs
         |FROM g""".stripMargin
    })
}
