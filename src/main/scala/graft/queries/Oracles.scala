package graft.queries

/** DuckDB oracle SQL for the declared query set. Keys match
  * `SparkEntry.queries`; the driver executes these against views named after
  * the parquet tables in the same sf dir and hash-compares with the Spark
  * results (columns sorted by name, so aliases must match exactly).
  *
  * Dialect notes (Spark -> DuckDB):
  *  - double->long cast: Spark truncates toward zero, DuckDB rounds, so the
  *    oracle wraps with `trunc()`.
  *  - `timestamp_seconds(x)` -> `make_timestamp(x*1000000)` (DuckDB's
  *    `to_timestamp` yields TIMESTAMPTZ, not TIMESTAMP).
  *  - `a div b` -> `a // b`; `explode(split(...))` -> `unnest(string_split(...))`.
  *  - integer SUM: DuckDB widens to HUGEINT, so the oracle casts back to BIGINT.
  */
object Oracles {

  /** q71's truncated-kernel EWMA, generated with the same [[CoreQueries
    * .ewmaK]] lag terms and exact 0.5^k decimal weights as the Spark side:
    * numerator and denominator are exact decimals in both engines, the one
    * double division is shared IEEE.
    */
  private def ewmaOracle: String = {
    val ks = 0 until CoreQueries.ewmaK
    val lags = ks.drop(1).map(k =>
      s"lag(x, $k) OVER (PARTITION BY event_type ORDER BY day) AS x$k").mkString(",\n  ")
    def w(k: Int) = java.math.BigDecimal.valueOf(0.5).pow(k).toPlainString
    val num = (s"x * ${w(0)}" +: ks.drop(1).map(k => s"coalesce(x$k * ${w(k)}, 0)").toSeq)
      .mkString(" + ")
    val den = (w(0) +: ks.drop(1).map(k => s"CASE WHEN x$k IS NULL THEN 0 ELSE ${w(k)} END").toSeq)
      .mkString(" + ")
    s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
       |    CAST(round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
       |      / count(*), 6) AS DECIMAL(18,6)) AS x
       |  FROM events GROUP BY 1, 2),
       |l AS (SELECT event_type, day, x,
       |  $lags
       |  FROM daily)
       |SELECT event_type, day, round(CAST(x AS DOUBLE), 6) AS daily_avg,
       |  round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
       |FROM l ORDER BY event_type, day""".stripMargin
  }

  val core: Map[String, String] = Map(
    "q01_project" ->
      "SELECT event_id, event_type AS kind, coalesce(props,'') AS props FROM events ORDER BY event_id LIMIT 50",
    "q02_trunc_cast" ->
      "SELECT event_id, CAST(trunc(value) AS BIGINT) AS v FROM events ORDER BY event_id LIMIT 100",
    "q03_intdiv_ts" ->
      "SELECT event_id, make_timestamp((epoch_ms(ts)//1000)*1000000) AS sec FROM events ORDER BY event_id LIMIT 100",
    "q04_filter" ->
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R' ORDER BY l_orderkey, l_quantity",
    "q05_agg" ->
      "SELECT l_returnflag, l_linestatus, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),6) AS sq, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*),6) AS ap, count(*) AS c FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q06_distinct" ->
      "SELECT count(DISTINCT user_id) AS u, count(DISTINCT event_type) AS t FROM events",
    "q07_join_broadcast" ->
      "SELECT n_name, count(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q08_join_topk" ->
      "SELECT c_name, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),6) AS s FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY c_name ORDER BY s DESC, c_name LIMIT 10",
    "q09_left_join" ->
      "SELECT c_custkey, count(o_orderkey) AS n FROM customer LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey",
    "q10_anti_join" ->
      "SELECT count(*) AS no_orders FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
    "q11_rollup" ->
      "SELECT l_returnflag, l_linestatus, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),6) AS s FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST",
    "q12_window_rank" ->
      "SELECT event_id, user_id, rank() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS r, lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv FROM events ORDER BY event_id",
    "q13_window_frame" ->
      "SELECT event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),6) AS mv FROM events ORDER BY event_id",
    "q14_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k",
    "q15_time_bucket" ->
      "SELECT date_trunc('hour', ts) AS w, event_type, count(*) AS c, round(sum(value),6) AS sv FROM events GROUP BY 1, 2 ORDER BY 1, 2",
    "q16_dedup_distinct" ->
      "SELECT count(*) AS c FROM (SELECT DISTINCT user_id, event_type FROM events) t",
    "q23_approx_distinct" ->
      "SELECT count(DISTINCT user_id) AS exact_users, true AS approx_ok FROM events",
    "q17_text_stats" ->
      "SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars, count(DISTINCT source) AS srcs FROM documents GROUP BY lang ORDER BY lang",
    "q18_wordcount" ->
      "SELECT w, count(*) AS c FROM (SELECT unnest(string_split(lower(text),' ')) AS w FROM documents) t WHERE w <> '' GROUP BY w ORDER BY c DESC, w LIMIT 20",
    "q24_json_extract" ->
      "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k FROM events ORDER BY event_id LIMIT 100",
    "q21_cube" ->
      "SELECT o_orderstatus, o_orderpriority, count(*) AS c, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),6) AS s FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY o_orderstatus NULLS LAST, o_orderpriority NULLS LAST",
    "q22_union_except" ->
      "SELECT user_id FROM events WHERE event_type='click' AND value > 90 UNION SELECT user_id FROM events WHERE event_type='view' AND value > 90 EXCEPT SELECT user_id FROM events WHERE event_type='purchase' AND value > 90 ORDER BY user_id",
    "q25_asof_join" ->
      """SELECT c.event_id, c.user_id,
        | round((SELECT p.value FROM events p
        |        WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |          AND (p.ts < c.ts OR (p.ts = c.ts AND p.event_id < c.event_id))
        |        ORDER BY p.ts DESC, p.event_id DESC LIMIT 1), 6) AS last_purchase
        | FROM events c WHERE c.event_type = 'click' ORDER BY c.event_id""".stripMargin.replaceAll("\n", ""),
    "q26_range_join" ->
      """SELECT b.band, count(*) AS c,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sv
        | FROM events e JOIN
        | (SELECT range AS band, range*10.0 AS lo, (range+1)*10.0 AS hi FROM range(10)) b
        | ON e.value >= b.lo AND e.value < b.hi
        | GROUP BY b.band ORDER BY b.band""".stripMargin.replaceAll("\n", ""),
    "q27_percentiles" ->
      """SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS p50,
        | round(quantile_cont(n_chars, 0.9), 6) AS p90,
        | CAST(max(n_chars) AS BIGINT) AS mx
        | FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replaceAll("\n", ""),
    "q28_group_topk" ->
      """SELECT lang, doc_id, n_chars, CAST(rn AS INTEGER) AS rn FROM
        | (SELECT lang, doc_id, n_chars,
        |   row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) t
        | WHERE rn <= 3 ORDER BY lang, rn""".stripMargin.replaceAll("\n", ""),
    "q29_sliding_bucket" ->
      """SELECT ws, ws + INTERVAL 2 MINUTE AS we, event_type, count(*) AS c,
        | round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sv
        | FROM (SELECT date_trunc('minute', ts) - to_minutes(CAST(j AS INTEGER)) AS ws,
        |              event_type, value
        |       FROM events, (SELECT range AS j FROM range(2)) t) w
        | GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin.replaceAll("\n", ""),
    "q30_skew_join" ->
      """SELECT c_custkey, count(*) AS n,
        | round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS s
        | FROM (SELECT CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE o_custkey END AS k,
        |              o_totalprice FROM orders) o
        | JOIN customer ON o.k = c_custkey
        | GROUP BY c_custkey ORDER BY n DESC, c_custkey LIMIT 10""".stripMargin.replaceAll("\n", ""),
    "q32_session_window" ->
      """WITH s AS (SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (SELECT user_id, ts,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM s)
        |SELECT min(ts) AS ws, max(ts) + INTERVAL 5 MINUTE AS we, user_id, count(*) AS c
        | FROM g GROUP BY user_id, sid ORDER BY user_id, ws""".stripMargin.replaceAll("\n", ""),
    "q33_approx_pct" ->
      "SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS p50, true AS approx_ok FROM documents GROUP BY lang ORDER BY lang",
    "q34_sketch_union" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, true AS approx_ok
        | FROM events GROUP BY event_type
        | UNION ALL
        | SELECT 'ALL', count(DISTINCT user_id), true FROM events
        | ORDER BY event_type""".stripMargin.replaceAll("\n", ""),
    "q52_sketch_intersect" ->
      """SELECT
        | (SELECT count(DISTINCT user_id) FROM events WHERE event_type='view') AS exact_view,
        | (SELECT count(DISTINCT user_id) FROM events WHERE event_type='purchase') AS exact_purchase,
        | (SELECT count(*) FROM
        |   (SELECT DISTINCT user_id FROM events WHERE event_type='view'
        |    INTERSECT
        |    SELECT DISTINCT user_id FROM events WHERE event_type='purchase') t) AS exact_both,
        | true AS approx_ok""".stripMargin.replaceAll("\n", ""),
    "q35_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type='click') AS click,
        | count(*) FILTER (WHERE event_type='error') AS error,
        | count(*) FILTER (WHERE event_type='purchase') AS purchase,
        | count(*) FILTER (WHERE event_type='signup') AS signup,
        | count(*) FILTER (WHERE event_type='view') AS view
        | FROM events GROUP BY user_id ORDER BY user_id""".stripMargin.replaceAll("\n", ""),
    "q36_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        | ORDER BY l_orderkey, l_linenumber, metric, v""".stripMargin.replaceAll("\n", ""),
    "q37_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS c,
        | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS s,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        | FROM lineitem
        | GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        | ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin.replaceAll("\n", ""),
    "q38_resample" ->
      """WITH bounds AS (SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events),
        |grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
        |counts AS (SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1)
        |SELECT g.h, coalesce(c.n, 0) AS n FROM grid g LEFT JOIN counts c ON c.h = g.h
        |ORDER BY g.h""".stripMargin,
    "q39_full_outer" ->
      """SELECT coalesce(c.k, s.k) AS nationkey,
        | coalesce(c.customers, 0) AS customers, coalesce(s.suppliers, 0) AS suppliers
        | FROM (SELECT c_nationkey AS k, count(*) AS customers FROM customer
        |       WHERE c_acctbal > 9900 GROUP BY 1) c
        | FULL JOIN (SELECT s_nationkey AS k, count(*) AS suppliers FROM supplier
        |            WHERE s_acctbal > 9000 GROUP BY 1) s ON c.k = s.k
        | ORDER BY nationkey""".stripMargin.replaceAll("\n", ""),
    "q41_window_analytics" ->
      """SELECT o_orderkey, o_orderstatus,
        | ntile(4) OVER w AS quartile,
        | round(cume_dist() OVER w, 6) AS cd,
        | round(percent_rank() OVER w, 6) AS pr
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        | ORDER BY o_orderkey""".stripMargin.replaceAll("\n", ""),
    "q42_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON v.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
        |      JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
        |FROM v LEFT JOIN c ON c.user_id = v.user_id LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q43_range_window" ->
      """SELECT event_id,
        | count(*) OVER w AS cnt_1h,
        | round(sum(value) OVER w, 6) AS sv_1h
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        | ORDER BY cnt_1h DESC, event_id LIMIT 500""".stripMargin.replaceAll("\n", ""),
    "q44_stats" ->
      """WITH a AS (SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS nd, count(*) AS n,
        |  sum(CAST(l_quantity AS DECIMAL(28,6))) AS sx,
        |  sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS sy,
        |  sum(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6))) AS sxy,
        |  sum(CAST(l_quantity*l_quantity AS DECIMAL(38,6))) AS sxx,
        |  sum(CAST(l_extendedprice*l_extendedprice AS DECIMAL(38,6))) AS syy
        | FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, nd,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(sxy AS DECIMAL(28,6))
        |    - CAST(CAST(sx AS DECIMAL(19,6))*CAST(sy AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mxy,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(sxx AS DECIMAL(28,6))
        |    - CAST(CAST(sx AS DECIMAL(19,6))*CAST(sx AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mxx,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(syy AS DECIMAL(28,6))
        |    - CAST(CAST(sy AS DECIMAL(19,6))*CAST(sy AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS myy
        | FROM a)
        |SELECT l_returnflag, n,
        | round(mxy/(nd*(nd - 1)), 6) AS cov,
        | round(mxy/sqrt(mxx*myy), 6) AS corr,
        | round(sqrt(mxx/(nd*(nd - 1))), 6) AS sd_qty
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // q44's proven cross-engine decimal-moment rendering, re-targeted at the
    // regression closed forms (x = integer second-of-day).
    "q62_regression" ->
      """WITH e AS (SELECT event_type, value,
        |  (epoch_us(ts) % 86400000000) // 1000000 AS x FROM events),
        |a AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS nd, count(*) AS n,
        |  sum(CAST(x AS DECIMAL(28,6))) AS sx,
        |  sum(CAST(value AS DECIMAL(28,6))) AS sy,
        |  sum(CAST(x*value AS DECIMAL(38,6))) AS sxy,
        |  sum(CAST(x*x AS DECIMAL(38,6))) AS sxx,
        |  sum(CAST(value*value AS DECIMAL(38,6))) AS syy
        | FROM e GROUP BY event_type),
        |m AS (SELECT event_type, n, nd, sx, sy,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(sxy AS DECIMAL(28,6))
        |    - CAST(CAST(sx AS DECIMAL(19,6))*CAST(sy AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mxy,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(sxx AS DECIMAL(28,6))
        |    - CAST(CAST(sx AS DECIMAL(19,6))*CAST(sx AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS mxx,
        |  CAST(CAST(n AS DECIMAL(10,0))*CAST(syy AS DECIMAL(28,6))
        |    - CAST(CAST(sy AS DECIMAL(19,6))*CAST(sy AS DECIMAL(19,6)) AS DECIMAL(38,6)) AS DOUBLE) AS myy
        | FROM a)
        |SELECT event_type, n,
        | round(mxy/mxx, 6) AS slope,
        | round((CAST(sy AS DOUBLE) - (mxy/mxx)*CAST(sx AS DOUBLE))/nd, 6) AS intercept,
        | round((mxy*mxy)/(mxx*myy), 6) AS r2
        |FROM m ORDER BY event_type""".stripMargin,
    "q45_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - lo)/((hi - lo)/20.0)), 19.0) AS BIGINT) AS bin,
        | round(min(lo + least(floor((l_extendedprice - lo)/((hi - lo)/20.0)), 19.0)*((hi - lo)/20.0)), 6) AS lo_edge,
        | count(*) AS c
        |FROM lineitem, mm GROUP BY bin ORDER BY bin""".stripMargin,
    "q46_outliers" ->
      """WITH f AS (SELECT event_type,
        |  quantile_cont(value, 0.75) + (quantile_cont(value, 0.75) - quantile_cont(value, 0.25))*1.5 AS fence
        | FROM events GROUP BY event_type)
        |SELECT e.event_type, count(*) AS outliers,
        | round(min(f.fence), 6) AS fence6, round(max(e.value), 6) AS worst
        |FROM events e JOIN f ON f.event_type = e.event_type
        |WHERE e.value > f.fence
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q47_zorder" ->
      s"""SELECT (z >> 8) AS cell, count(*) AS c, min(z) AS zlo, max(z) AS zhi
         |FROM (SELECT ${graft.operators.Layout.zvalueSql("l_suppkey", "l_partkey")} AS z
         |      FROM lineitem) t
         |GROUP BY cell ORDER BY cell""".stripMargin,
    "q48_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS b_st, o_totalprice AS b_tp
        |              FROM orders),
        |upd AS (SELECT o_orderkey AS k, 'U' AS u_st, o_totalprice * CAST(1.1 AS DOUBLE) AS u_tp
        |        FROM orders WHERE o_orderkey % 10 = 0
        |        UNION ALL
        |        SELECT o_orderkey + 100000000 AS k, 'N' AS u_st, o_totalprice AS u_tp
        |        FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT COALESCE(u_st, b_st) AS status, count(*) AS n,
        |  round(CAST(sum(CAST(COALESCE(u_tp, b_tp) AS DECIMAL(28,6))) AS DOUBLE), 2) AS total
        |FROM base FULL OUTER JOIN upd USING (k)
        |GROUP BY status ORDER BY status""".stripMargin,
    "q49_profile" ->
      (CoreQueries.profileCols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n,
           | count(CASE WHEN $c IS NULL THEN 1 END) AS nulls,
           | count(DISTINCT $c) AS nd,
           | round(min($c), 6) AS mn, round(max($c), 6) AS mx
           | FROM lineitem""".stripMargin.replaceAll("\n", "")
      }.mkString(" UNION ALL ") + " ORDER BY col_name"),
    "q50_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY user_id)
        |SELECT cohort, CAST(date_diff('day', cohort, d) // 7 AS INTEGER) AS week_offset,
        |       count(DISTINCT user_id) AS users
        |FROM e JOIN f USING (user_id)
        |GROUP BY cohort, week_offset ORDER BY cohort, week_offset""".stripMargin,
    "q51_sessionize" ->
      s"""SELECT user_id, CAST(session AS BIGINT) AS session, count(*) AS events,
         |       min(ts) AS start_ts, max(ts) AS end_ts FROM
         | (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM
         |  (SELECT user_id, ts,
         |     CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > ${CoreQueries.sessionGapSec}
         |          THEN 1 ELSE 0 END AS brk FROM
         |   (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
         |    FROM events) t0) t1) t2
         |GROUP BY user_id, session ORDER BY user_id, session LIMIT 500""".stripMargin,
    "q89_bounce" ->
      s"""WITH se AS (SELECT user_id, session, count(*) AS events, min(ts) AS start_ts FROM
         | (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session FROM
         |  (SELECT user_id, ts,
         |     CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > ${CoreQueries.sessionGapSec}
         |          THEN 1 ELSE 0 END AS brk FROM
         |   (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
         |    FROM events) t0) t1) t2
         | GROUP BY user_id, session)
         |SELECT CAST(start_ts AS DATE) AS day, count(*) AS sessions,
         |  CAST(sum(CASE WHEN events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces,
         |  round(CAST(sum(CASE WHEN events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    / count(*), 6) AS bounce_rate
         |FROM se GROUP BY 1 ORDER BY day""".stripMargin,
    // quintile cut points via quantile_cont (the engine-shared interpolation
    // the q69/q82 family pins); scores count cuts STRICTLY below the value
    "q90_rfm" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders),
        |per AS (SELECT o_custkey, max(o_orderdate) AS last_d, count(*) AS f,
        |    sum(tp) AS m FROM o GROUP BY 1),
        |a AS (SELECT max(o_orderdate) AS corpus_last FROM o),
        |rfm AS (SELECT o_custkey,
        |    CAST(date_diff('day', last_d, corpus_last) AS BIGINT) AS r,
        |    f, CAST(m AS DOUBLE) AS md, m FROM per, a),
        |cuts AS (SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rc,
        |    quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fc,
        |    quantile_cont(md, [0.2, 0.4, 0.6, 0.8]) AS mc FROM rfm),
        |sc AS (SELECT
        |    CAST(6 - (1 + len(list_filter(rc, x -> x < r))) AS INTEGER) AS r_score,
        |    CAST(1 + len(list_filter(fc, x -> x < f)) AS INTEGER) AS f_score,
        |    CAST(1 + len(list_filter(mc, x -> x < md)) AS INTEGER) AS m_score,
        |    m FROM rfm, cuts)
        |SELECT r_score, f_score, m_score, count(*) AS customers,
        |  round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS avg_monetary
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // single aggregate row (no ORDER BY needed); packed-min first touches
    "q91_conversion_lag" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |per AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN us END) AS v,
        |    min(CASE WHEN event_type = 'purchase' THEN us END) AS p
        |  FROM e GROUP BY 1),
        |l AS (SELECT CASE WHEN v IS NOT NULL AND p IS NOT NULL AND p > v
        |    THEN (p - v) / 1000000 END AS lag_sec
        |  FROM per WHERE v IS NOT NULL)
        |SELECT count(*) AS viewers, count(lag_sec) AS converted,
        |  round(CAST(count(lag_sec) AS DOUBLE) / count(*), 6) AS cvr,
        |  round(quantile_cont(lag_sec, 0.5), 6) AS p50_sec,
        |  round(quantile_cont(lag_sec, 0.9), 6) AS p90_sec
        |FROM l""".stripMargin,
    // DECIMAL(19,6) operand forces int128 decimal multiply (the DuckDB
    // int64-product overflow class FIXTURES records); both division
    // operands cast to double so the quotient is one deterministic op
    "q92_twap" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, event_id, value
        |    FROM events),
        |x AS (SELECT event_type, value, us, lead(us) OVER
        |    (PARTITION BY event_type ORDER BY us, event_id) AS next_us FROM e),
        |d AS (SELECT event_type, next_us - us AS dur_us, value FROM x
        |  WHERE next_us IS NOT NULL)
        |SELECT event_type, count(*) AS n,
        |  CAST(sum(dur_us) AS BIGINT) AS total_us,
        |  round(CAST(sum(CAST(value AS DECIMAL(19,6)) * dur_us) AS DOUBLE)
        |    / CAST(sum(dur_us) AS DOUBLE), 6) AS twap,
        |  round(CAST(sum(CAST(value AS DECIMAL(19,6))) AS DOUBLE)
        |    / count(*), 6) AS plain_avg
        |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin,
    // same gap construction as q51/q89's oracles, reduced per user
    "q95_session_cohort" ->
      s"""WITH b AS (SELECT user_id, ts,
         |    CASE WHEN prev IS NULL OR date_diff('second', prev, ts) > ${CoreQueries.sessionGapSec}
         |         THEN 1 ELSE 0 END AS brk FROM
         |  (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
         |   FROM events) t),
         |s AS (SELECT user_id, CAST(sum(brk) AS BIGINT) AS sessions FROM b GROUP BY 1),
         |c AS (SELECT user_id, date_trunc('month', CAST(min(ts) AS DATE)) AS cohort
         |  FROM events GROUP BY 1)
         |SELECT cohort, count(*) AS users,
         |  CAST(sum(sessions) AS BIGINT) AS total_sessions,
         |  round(CAST(sum(sessions) AS DOUBLE) / count(*), 6) AS avg_sessions,
         |  max(sessions) AS max_sessions
         |FROM s JOIN c USING (user_id)
         |GROUP BY cohort ORDER BY cohort""".stripMargin,
    // Σ c·ln c folds in list order (list(... ORDER BY type) — the pqTopK
    // ordered-fold pairing); sums of counts cast off DuckDB's HUGEINT
    "q94_user_entropy" ->
      """WITH ut AS (SELECT user_id, event_type, count(*) AS c FROM events
        |    GROUP BY 1, 2),
        |u AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
        |    list_sum(list(c * ln(c) ORDER BY event_type)) AS slnc
        |  FROM ut GROUP BY 1),
        |h AS (SELECT n, CAST(floor(GREATEST(ln(n) - slnc / n, 0) * 10) AS BIGINT)
        |    AS decibucket FROM u)
        |SELECT decibucket, count(*) AS users,
        |  round(CAST(sum(n) AS DOUBLE) / count(*), 6) AS avg_events
        |FROM h GROUP BY 1 ORDER BY decibucket""".stripMargin,
    // the lifecycle readout must equal this raw-table window — a staged
    // cycle that drops or double-appends a batch changes n_gaps/avg and
    // fails the hash compare
    "q96_events_lifecycle" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000, 6) AS avg_gap_sec
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the delta-compaction cycle stages (pre-cutoff ∪ purchase): the same
    // raw-table recomputation as q96, restricted to the staged content —
    // a row lost or doubled in the bucket file swap breaks the hash
    "q97_compact_delta" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
        |  FROM events
        |  WHERE epoch_us(ts) < 1705881600000000 OR event_type = 'purchase')
        |SELECT event_type, count(*) AS n_gaps,
        |  CAST(max(gap_us) AS BIGINT) AS max_gap_us,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000, 6) AS avg_gap_sec
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // 2-D skyline via the strict prefix-max frontier (the banded Spark
    // construction and this flat window name the same rows)
    "q98_skyline" ->
      """WITH perx AS (SELECT p_retailprice AS x, max(p_size) AS my
        |  FROM part GROUP BY 1),
        |pm AS (SELECT x, my, max(my) OVER (ORDER BY x
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM perx),
        |sk AS (SELECT x, my FROM pm WHERE pmax IS NULL OR my > pmax)
        |SELECT p_partkey, round(p_retailprice, 2) AS price, p_size AS size
        |FROM part JOIN sk ON p_retailprice = sk.x AND p_size = sk.my
        |ORDER BY price, p_partkey LIMIT 500""".stripMargin,
    // exact DECIMAL sums; the one double division mirrors the Spark
    // expression shape exactly (see q99's scaladoc)
    "q99_gini" ->
      """WITH cv AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        |  FROM orders GROUP BY 1),
        |rk AS (SELECT c_nationkey, v, row_number() OVER
        |    (PARTITION BY c_nationkey ORDER BY v, o_custkey) AS i
        |  FROM cv JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT c_nationkey, count(*) AS customers, sum(v) AS S,
        |    sum(v * i) AS S1 FROM rk GROUP BY 1)
        |SELECT n_name AS nation, customers, round(CAST(S AS DOUBLE), 2) AS revenue,
        |  round((2.0 * CAST(S1 AS DOUBLE)
        |      - CAST(customers + 1 AS DOUBLE) * CAST(S AS DOUBLE))
        |    / (CAST(customers AS DOUBLE) * CAST(S AS DOUBLE)), 6) AS gini
        |FROM g JOIN nation ON c_nationkey = n_nationkey ORDER BY nation""".stripMargin,
    // Benford shares are 12-digit literals CAST to double on both engines
    // (identical parsed bits); χ² sums scale-9 decimals, order-free
    "q100_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS digit, count(*) AS n
        |  FROM orders GROUP BY 1),
        |j AS (SELECT digit, n, sum(n) OVER () AS total,
        |    CAST(CASE digit WHEN 1 THEN 0.301029995664 WHEN 2 THEN 0.176091259056
        |      WHEN 3 THEN 0.124938736608 WHEN 4 THEN 0.096910013008
        |      WHEN 5 THEN 0.079181246048 WHEN 6 THEN 0.066946789631
        |      WHEN 7 THEN 0.057991946978 WHEN 8 THEN 0.051152522447
        |      WHEN 9 THEN 0.045757490561 END AS DOUBLE) AS p FROM d),
        |c AS (SELECT digit, n, total, p,
        |    (n - total * p) * (n - total * p) / (total * p) AS contrib FROM j)
        |SELECT digit, n, round(CAST(n AS DOUBLE) / total, 6) AS share,
        |  round(p, 6) AS expected, round(contrib, 6) AS chi2_part,
        |  round(CAST(sum(CAST(round(contrib, 9) AS DECIMAL(28,9))) OVER ()
        |    AS DOUBLE), 6) AS chi2
        |FROM c ORDER BY digit""".stripMargin,
    // DPP star join: the weekend set is recomputed from the calendar
    // (DuckDB dayofweek: 0=Sun..6=Sat vs Spark's 1=Sun..7=Sat); exact
    // integer aggregates
    "q107_dpp" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // LISTAGG surface: the total order (cnt DESC, day ASC) rides INTO the
    // string, so the rendered CSV hash-matches across engines
    "q110_listagg" ->
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY cnt DESC, day) AS rn FROM daily)
         |SELECT event_type,
         |  (SELECT count(*) FROM daily d WHERE d.event_type = r.event_type) AS days,
         |  string_agg(CAST(day AS VARCHAR) || ':' || CAST(cnt AS VARCHAR), ','
         |    ORDER BY cnt DESC, day) AS top_days
         |FROM r WHERE rn <= ${CoreQueries.listaggTopDays}
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // nearest as-of: per purchase, min |delta| click with backward tie
    // preference; quadratic per-user join here — the join-free Spark plan
    // computes the same pairs without one (the q60 oracle convention)
    "q109_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS cts, value AS click_value FROM events
        |  WHERE event_type = 'click'),
        |j AS (SELECT p.event_id, p.user_id, p.value, c.click_value,
        |    epoch_us(c.cts) - epoch_us(p.ts) AS delta_us,
        |    ROW_NUMBER() OVER (PARTITION BY p.event_id
        |      ORDER BY abs(epoch_us(c.cts) - epoch_us(p.ts)),
        |        CASE WHEN epoch_us(c.cts) <= epoch_us(p.ts) THEN 0 ELSE 1 END) AS rn
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id)
        |SELECT event_id, user_id, value, click_value, delta_us
        |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,
    // rolling Pearson over integer daily volumes: six exact integer moments,
    // then a fixed dag of correctly-rounded IEEE ops before round(.,6)
    "q108_moving_corr" ->
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
         |    count(CASE WHEN event_type = 'click' THEN 1 END) AS x,
         |    count(CASE WHEN event_type = 'view' THEN 1 END) AS y
         |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
         |m AS (SELECT day,
         |    count(*) OVER w AS k,
         |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         |    sum(x*y) OVER w AS sxy, sum(x*x) OVER w AS sxx,
         |    sum(y*y) OVER w AS syy
         |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN ${CoreQueries.corrWindowDays - 1} PRECEDING AND CURRENT ROW))
         |SELECT day, CAST(sx AS BIGINT) AS clicks, CAST(sy AS BIGINT) AS views,
         |  round(CAST(${CoreQueries.corrWindowDays}*sxy - sx*sy AS DOUBLE) /
         |    (sqrt(CAST(${CoreQueries.corrWindowDays}*sxx - sx*sx AS DOUBLE)) *
         |     sqrt(CAST(${CoreQueries.corrWindowDays}*syy - sy*sy AS DOUBLE))), 6) AS corr7
         |FROM m WHERE k = ${CoreQueries.corrWindowDays}
         |  AND ${CoreQueries.corrWindowDays}*sxx - sx*sx > 0
         |  AND ${CoreQueries.corrWindowDays}*syy - sy*sy > 0
         |ORDER BY day""".stripMargin,
    "q111_moving_corr_dense" ->
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
         |    count(CASE WHEN event_type = 'click' THEN 1 END) AS x,
         |    count(CASE WHEN event_type = 'view' THEN 1 END) AS y
         |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
         |cal AS (SELECT CAST(unnest(generate_series(
         |    (SELECT min(day) FROM daily), (SELECT max(day) FROM daily),
         |    INTERVAL 1 DAY)) AS DATE) AS day),
         |dense AS (SELECT cal.day, coalesce(x, 0) AS x, coalesce(y, 0) AS y
         |  FROM cal LEFT JOIN daily USING (day)),
         |m AS (SELECT day,
         |    count(*) OVER w AS k,
         |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         |    sum(x*y) OVER w AS sxy, sum(x*x) OVER w AS sxx,
         |    sum(y*y) OVER w AS syy
         |  FROM dense WINDOW w AS (ORDER BY day ROWS BETWEEN ${CoreQueries.corrWindowDays - 1} PRECEDING AND CURRENT ROW))
         |SELECT day, CAST(sx AS BIGINT) AS clicks, CAST(sy AS BIGINT) AS views,
         |  round(CAST(${CoreQueries.corrWindowDays}*sxy - sx*sy AS DOUBLE) /
         |    (sqrt(CAST(${CoreQueries.corrWindowDays}*sxx - sx*sx AS DOUBLE)) *
         |     sqrt(CAST(${CoreQueries.corrWindowDays}*syy - sy*sy AS DOUBLE))), 6) AS corr7
         |FROM m WHERE k = ${CoreQueries.corrWindowDays}
         |  AND ${CoreQueries.corrWindowDays}*sxx - sx*sx > 0
         |  AND ${CoreQueries.corrWindowDays}*syy - sy*sy > 0
         |ORDER BY day""".stripMargin,
    // seasonal-naive backtest: integer absolute errors sum exactly; the
    // percentage errors round at scale 9 into an exact decimal sum
    "q106_forecast" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, x,
        |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        |  FROM daily),
        |e AS (SELECT event_type, abs(x - f) AS abs_err,
        |    CAST(round(CAST(abs(x - f) AS DOUBLE) / CAST(x AS DOUBLE), 9)
        |      AS DECIMAL(38,9)) AS ape9
        |  FROM l WHERE f IS NOT NULL)
        |SELECT event_type, count(*) AS n_scored,
        |  CAST(sum(abs_err) AS BIGINT) AS abs_err_total,
        |  round(CAST(sum(abs_err) AS DOUBLE) / count(*), 6) AS mae,
        |  round(CAST(sum(ape9) AS DOUBLE) / count(*), 6) AS mape
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // expectations render from the SAME rules list the engine evaluates —
    // one UNION ALL branch per rule, counts exact
    "q104_expectations" -> {
      val branches = CoreQueries.q104Rules.map { case (id, c, lo, hi) =>
        s"""SELECT $id AS rule_id, '$c' AS col_name,
           |  CAST($lo AS DOUBLE) AS lo, CAST($hi AS DOUBLE) AS hi,
           |  count(*) AS n_rows, count(CASE WHEN $c IS NULL THEN 1 END) AS nulls,
           |  count(CASE WHEN $c < $lo OR $c > $hi THEN 1 END) AS violations
           |FROM lineitem""".stripMargin
      }.mkString(" UNION ALL\n")
      s"""SELECT rule_id, col_name, lo, hi, n_rows, nulls, violations,
         |  (violations = 0 AND nulls = 0) AS pass
         |FROM ($branches) ORDER BY rule_id""".stripMargin
    },
    // Theil-Sen: slope numerators subtract exact decimals before one exact
    // cast; the median's interpolation ulp is absorbed by the scale-2 round
    "q103_theilsen" ->
      """WITH m AS (SELECT n_name AS nation,
        |    (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS x,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |p AS (SELECT a.nation,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM m a JOIN m b ON a.nation = b.nation AND a.x < b.x),
        |mm AS (SELECT nation, count(*) AS n_months FROM m GROUP BY 1)
        |SELECT p.nation AS nation, n_months, count(*) AS n_pairs,
        |  round(median(slope), 2) AS ts_slope
        |FROM p JOIN mm ON p.nation = mm.nation
        |GROUP BY 1, 2 ORDER BY p.nation""".stripMargin,
    // zone-map audit: zones from the same micros div, overlap test on the
    // per-zone min/max envelope, residual range agg with exact decimal sum
    "q101_zonemap" ->
      s"""WITH z AS (SELECT epoch_us(ts) // ${CoreQueries.zoneMicrosOracle} AS zone,
        |    epoch_us(ts) AS us, value FROM events),
        |st AS (SELECT zone, min(us) AS mn, max(us) AS mx FROM z GROUP BY zone),
        |pr AS (SELECT count(*) AS zones_scanned FROM st
        |  WHERE mn < ${CoreQueries.q101HiUs} AND mx >= ${CoreQueries.q101LoUs}),
        |a AS (SELECT count(*) AS n_rows,
        |    round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_value
        |  FROM z WHERE us >= ${CoreQueries.q101LoUs} AND us < ${CoreQueries.q101HiUs})
        |SELECT (SELECT count(*) FROM st) AS zones_total,
        |  (SELECT zones_scanned FROM pr) AS zones_scanned, n_rows, sum_value
        |FROM a""".stripMargin,
    // same audit as q101, over the cutoff-crossing window; the oracle reads
    // the raw table — equality proves the append is complete and unduplicated
    "q105_zone_append" ->
      s"""WITH z AS (SELECT epoch_us(ts) // ${CoreQueries.zoneMicrosOracle} AS zone,
        |    epoch_us(ts) AS us, value FROM events),
        |st AS (SELECT zone, min(us) AS mn, max(us) AS mx FROM z GROUP BY zone),
        |pr AS (SELECT count(*) AS zones_scanned FROM st
        |  WHERE mn < ${CoreQueries.q105HiUs} AND mx >= ${CoreQueries.q105LoUs}),
        |a AS (SELECT count(*) AS n_rows,
        |    round(CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_value
        |  FROM z WHERE us >= ${CoreQueries.q105LoUs} AND us < ${CoreQueries.q105HiUs})
        |SELECT (SELECT count(*) FROM st) AS zones_total,
        |  (SELECT zones_scanned FROM pr) AS zones_scanned, n_rows, sum_value
        |FROM a""".stripMargin,
    // CUSUM deviation n·P_i − i·T is INTEGER (the division-cleared form of
    // the classic statistic), so the argmax compares identical BIGINTs in
    // both engines; the one double division renders the normalized peak
    "q102_cusum" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |sc AS (SELECT event_type, day,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    sum(x) OVER (PARTITION BY event_type ORDER BY day) AS p,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(x) OVER (PARTITION BY event_type) AS t
        |  FROM daily),
        |dev AS (SELECT event_type, day, n, t,
        |    CAST(n AS BIGINT) * CAST(p AS BIGINT)
        |      - CAST(i AS BIGINT) * CAST(t AS BIGINT) AS dev FROM sc),
        |best AS (SELECT *, row_number() OVER
        |    (PARTITION BY event_type ORDER BY abs(dev) DESC, day) AS rn FROM dev)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, day AS cp_day,
        |  abs(dev) AS cusum_abs,
        |  round(CAST(abs(dev) AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS cusum_norm
        |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // RAKE: phrase runs by (pos − row_number) islands; micro-unit integer
    // word scores keep every accumulation order-independent
    "text_rake" ->
      """WITH raw AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ts) AS w,
        |    unnest(generate_series(0, len(ts) - 1)) AS pos FROM raw),
        |cand AS (SELECT doc_id, w, pos, pos - row_number() OVER
        |    (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM tok WHERE w <> '' AND w NOT IN ('the','a','of','and','is')),
        |wl AS (SELECT *, count(*) OVER (PARTITION BY doc_id, grp) AS plen
        |  FROM cand),
        |ws AS (SELECT w, (sum(plen) * 1000000) // count(*) AS score_u
        |  FROM wl GROUP BY w),
        |ph AS (SELECT doc_id, grp, string_agg(wl.w, ' ' ORDER BY pos) AS phrase,
        |    sum(ws.score_u) AS pscore_u
        |  FROM wl JOIN ws USING (w) GROUP BY doc_id, grp)
        |SELECT phrase, count(*) AS occurrences,
        |  round(max(pscore_u) / 1000000.0, 6) AS score
        |FROM ph GROUP BY phrase ORDER BY score DESC, phrase LIMIT 25""".stripMargin,
    // Spark dayofweek is 1=Sunday..7; DuckDB's is 0=Sunday..6, hence the +1
    "q93_seasonality" ->
      """WITH c AS (SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    CAST(hour(ts) AS INTEGER) AS hr, count(*) AS n,
        |    round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS avg_value
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hr, n, avg_value,
        |  round(n / sum(n) OVER (PARTITION BY dow), 6) AS dow_share
        |FROM c ORDER BY dow, hr""".stripMargin,
    "q53_growth" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id)
        |SELECT day, count(*) AS new_users,
        |       CAST(sum(count(*)) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM f GROUP BY day ORDER BY day""".stripMargin,
    // Bloom prefilter passes a superset of matching keys and the exact
    // equi-join re-drops the false positives, so the oracle is the PLAIN join.
    "q54_bloom_join" ->
      """SELECT p_brand,
        |       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
        |       count(*) AS items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 3
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q55_quantile_bins" ->
      """WITH c AS (SELECT quantile_cont(l_extendedprice, 0.2) AS c1,
        |                  quantile_cont(l_extendedprice, 0.4) AS c2,
        |                  quantile_cont(l_extendedprice, 0.6) AS c3,
        |                  quantile_cont(l_extendedprice, 0.8) AS c4 FROM lineitem)
        |SELECT CASE WHEN l_extendedprice < c1 THEN 0 WHEN l_extendedprice < c2 THEN 1
        |            WHEN l_extendedprice < c3 THEN 2 WHEN l_extendedprice < c4 THEN 3
        |            ELSE 4 END AS bin,
        |       count(*) AS n, round(min(l_extendedprice), 6) AS lo, round(max(l_extendedprice), 6) AS hi
        |FROM lineitem, c GROUP BY bin ORDER BY bin""".stripMargin,
    "q56_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |a AS (SELECT count(*) AS n_keys, round(avg(c), 6) AS mean_c,
        |       round(quantile_cont(c, 0.5), 6) AS p50, round(quantile_cont(c, 0.9), 6) AS p90,
        |       round(quantile_cont(c, 0.99), 6) AS p99, max(c) AS max_c FROM c)
        |SELECT n_keys, mean_c, p50, p90, p99, CAST(max_c AS BIGINT) AS max_c,
        |       round(max_c/mean_c, 6) AS skew FROM a""".stripMargin,
    "q57_table_checksum" ->
      """SELECT l_orderkey % 16 AS bucket, count(*) AS cnt,
        |  bit_xor(('0x'||substr(md5(
        |    l_orderkey || '|' || l_partkey || '|' || l_suppkey || '|' || l_linenumber || '|' ||
        |    l_returnflag || '|' || l_linestatus || '|' || CAST(l_shipdate AS VARCHAR)
        |  ),1,15))::BIGINT) AS checksum
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q58_ship_priority" ->
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    // DuckDB's native ASOF LEFT JOIN — an independent implementation of the
    // backward-as-of semantic (>= means at-or-before, matching asofBackward).
    "q59_asof_join" ->
      """SELECT p.event_id, p.user_id, p.value, c.value AS click_value,
        |  CASE WHEN c.ts IS NULL THEN NULL
        |       ELSE date_diff('second', c.ts, p.ts) END AS lag_sec
        |FROM (SELECT event_id, user_id, ts, value FROM events
        |      WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    // Plain inequality join: quadratic in DuckDB, which is the point — the
    // Spark side computes the same pairs through the bucketed hash join.
    "q60_range_join" ->
      s"""SELECT e.event_id, e.user_id, count(c.user_id) AS follows
         |FROM (SELECT event_id, user_id, ts FROM events
         |      WHERE event_type = 'error') e
         |LEFT JOIN (SELECT user_id, ts FROM events
         |      WHERE event_type = 'click') c
         |  ON e.user_id = c.user_id
         | AND epoch_us(c.ts) > epoch_us(e.ts)
         | AND epoch_us(c.ts) <= epoch_us(e.ts) + ${CoreQueries.rangeJoinWindowSec * 1000000L}
         |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin,
    // Plain inequality overlap join — quadratic per user in DuckDB; the
    // Spark side buckets and claims each pair once. floor() both sides.
    "q61_interval_join" ->
      """SELECT v.event_id, v.user_id, count(c.user_id) AS overlaps
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS vs,
        |             epoch_us(ts) + CAST(floor(value) AS BIGINT)*10000000 AS ve
        |      FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT user_id, epoch_us(ts) AS cs,
        |             epoch_us(ts) + CAST(floor(value) AS BIGINT)*1000000 AS ce
        |      FROM events WHERE event_type = 'click') c
        |  ON v.user_id = c.user_id AND greatest(v.vs, c.cs) < least(v.ve, c.ce)
        |GROUP BY v.event_id, v.user_id ORDER BY v.event_id""".stripMargin,
    // Same gaps-and-islands construction, independently phrased with
    // DuckDB's WINDOW clause.
    "q63_scd2" ->
      """WITH r AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
        |  CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |        OR lag(o_orderstatus) OVER w <> o_orderstatus THEN 1 ELSE 0 END AS chg
        | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |g AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
        |      FROM r),
        |h AS (SELECT o_custkey, run, min(o_orderstatus) AS status,
        |        min(o_orderdate) AS valid_from, count(*) AS n_orders
        |      FROM g GROUP BY o_custkey, run)
        |SELECT o_custkey, run AS version, status, valid_from,
        |  lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run) AS valid_to,
        |  n_orders
        |FROM h ORDER BY o_custkey, version""".stripMargin,
    // NOT EXISTS mirrors left-anti; all five checks in one UNION ALL
    "q85_integrity" -> {
      def check(name: String, child: String, ckey: String,
                parent: String, pkey: String): String =
        s"""SELECT '$name' AS fk,
           |  (SELECT count(*) FROM $child) AS child_rows,
           |  (SELECT count(*) FROM $child c WHERE NOT EXISTS
           |     (SELECT 1 FROM $parent p WHERE p.$pkey = c.$ckey)) AS orphans,
           |  (SELECT count(*) FROM $child c WHERE NOT EXISTS
           |     (SELECT 1 FROM $parent p WHERE p.$pkey = c.$ckey)) = 0 AS ok""".stripMargin
      Seq(
        check("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        check("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        check("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        check("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        check("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    },
    // identical 6-rounded fences, decimal moments, cast-once closed forms
    "q86_winsorize" ->
      s"""WITH f AS (SELECT event_type,
         |    round(quantile_cont(value, ${CoreQueries.winsorLo}), 6) AS lo,
         |    round(quantile_cont(value, ${CoreQueries.winsorHi}), 6) AS hi
         |  FROM events GROUP BY 1),
         |c AS (SELECT e.event_type, value,
         |    least(greatest(value, lo), hi) AS w
         |  FROM events e JOIN f USING (event_type)),
         |m AS (SELECT event_type, count(*) AS n,
         |    sum(CAST(value AS DECIMAL(28,6))) AS sr,
         |    sum(CAST(value * value AS DECIMAL(38,6))) AS ssr,
         |    sum(CAST(w AS DECIMAL(28,6))) AS sw,
         |    sum(CAST(w * w AS DECIMAL(38,6))) AS ssw
         |  FROM c GROUP BY 1)
         |SELECT event_type, n,
         |  round(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_raw,
         |  round(sqrt(CAST(CAST(n AS DECIMAL(20,0)) * ssr - sr * sr AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS sd_raw,
         |  round(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_wins,
         |  round(sqrt(CAST(CAST(n AS DECIMAL(20,0)) * ssw - sw * sw AS DOUBLE)
         |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS sd_wins
         |FROM m ORDER BY event_type""".stripMargin,
    // same prefix/running-min closed form, explicit ROWS frames
    "q87_clamped_balance" ->
      s"""WITH d AS (SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
         |    sum(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity
         |             ELSE -l_quantity END AS DECIMAL(18,2))) AS net
         |  FROM lineitem WHERE l_partkey < ${CoreQueries.balanceMaxPart}
         |  GROUP BY 1, 2),
         |w1 AS (SELECT l_partkey, day, net, sum(net) OVER
         |    (PARTITION BY l_partkey ORDER BY day ROWS UNBOUNDED PRECEDING) AS pfx
         |  FROM d),
         |w2 AS (SELECT *, min(pfx) OVER
         |    (PARTITION BY l_partkey ORDER BY day ROWS UNBOUNDED PRECEDING) AS rmin
         |  FROM w1)
         |SELECT l_partkey, day, round(CAST(net AS DOUBLE), 2) AS net,
         |  round(CAST(pfx - least(CAST(0 AS DECIMAL(18,2)), rmin) AS DOUBLE), 2)
         |    AS balance
         |FROM w2 ORDER BY l_partkey, day""".stripMargin,
    // q64's frame with the median aggregate inside it
    "q88_rolling_median" ->
      """WITH t AS (SELECT event_type, event_id, value,
        |  count(value) OVER w AS roll_n,
        |  round(quantile_cont(value, 0.5) OVER w, 6) AS roll_med
        | FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, round(value, 6) AS value, roll_med
        |FROM t WHERE roll_n >= 10
        |ORDER BY event_type, event_id LIMIT 500""".stripMargin,
    // first-touch via row_number CTE — mechanism differs from Spark's
    // packed-min (deliberate: (us, event_id) is a total order, so both
    // derivations name the same event); HUGEINT-prone sums cast to BIGINT
    "q80_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |    epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, event_type AS first_touch FROM
        |  (SELECT user_id, event_type, row_number() OVER
        |     (PARTITION BY user_id ORDER BY us, event_id) AS rn FROM e) t
        |  WHERE rn = 1),
        |c AS (SELECT user_id, count(*) AS np,
        |    sum(CAST(value AS DECIMAL(28,6))) AS v
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT first_touch, count(*) AS users,
        |  CAST(sum(CASE WHEN np IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS converted,
        |  CAST(coalesce(sum(np), 0) AS BIGINT) AS purchases,
        |  round(CAST(coalesce(sum(v), 0) AS DOUBLE), 2) AS attributed_value
        |FROM f LEFT JOIN c USING (user_id)
        |GROUP BY first_touch ORDER BY first_touch""".stripMargin,
    // identical cascaded running-max construction; window bound shared
    "q81_window_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |w1 AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER
         |   (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv FROM e),
         |w2 AS (SELECT *, max(CASE WHEN event_type = 'click' THEN lv END) OVER
         |   (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ca FROM w1),
         |u AS (SELECT user_id,
         |   max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
         |   max(CASE WHEN event_type = 'click'
         |     AND lv >= us - ${CoreQueries.funnelWindowUs} THEN 1 ELSE 0 END) AS l2,
         |   max(CASE WHEN event_type = 'purchase'
         |     AND ca >= us - ${CoreQueries.funnelWindowUs} THEN 1 ELSE 0 END) AS l3
         | FROM w2 GROUP BY user_id)
         |SELECT CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
         |            WHEN l1 = 1 THEN 1 ELSE 0 END AS level,
         |  count(*) AS users
         |FROM u GROUP BY 1 ORDER BY level""".stripMargin,
    "q82_fill_rate" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(lag) AS INTEGER) AS min_lag, CAST(max(lag) AS INTEGER) AS max_lag,
        |  round(quantile_cont(lag, 0.5), 6) AS p50,
        |  round(quantile_cont(lag, 0.9), 6) AS p90,
        |  round(quantile_cont(lag, 0.99), 6) AS p99
        |FROM (SELECT o_orderpriority,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey) t
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q83_ratio_report" ->
      """WITH rev AS (SELECT r_name, n_name,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revd
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |t AS (SELECT sum(revd) AS gt FROM rev),
        |w AS (SELECT r_name, n_name, revd,
        |    sum(revd) OVER (PARTITION BY r_name) AS rtot FROM rev)
        |SELECT r_name, n_name, round(CAST(revd AS DOUBLE), 2) AS revenue,
        |  round(CAST(revd AS DOUBLE) / CAST(rtot AS DOUBLE), 6) AS share_region,
        |  round(CAST(revd AS DOUBLE) / CAST(gt AS DOUBLE), 6) AS share_total
        |FROM w, t ORDER BY r_name, n_name""".stripMargin,
    "q84_paths" ->
      """SELECT path, count(*) AS n FROM
        |  (SELECT lag(event_type, 2) OVER w || '>' ||
        |          lag(event_type, 1) OVER w || '>' || event_type AS path
        |   FROM events
        |   WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |WHERE path IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 20""".stripMargin,
    // brute-force window join (sound at verify scale); the Spark side's
    // bounded coverage-interval explode must produce identical counts
    "q73_rolling_wau" ->
      s"""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |days AS (SELECT DISTINCT d + CAST(i AS INTEGER) AS day
         |  FROM act, range(${CoreQueries.wauDays}) t(i))
         |SELECT day, count(DISTINCT a.user_id) AS wau
         |FROM days j JOIN act a
         |  ON a.d BETWEEN j.day - ${CoreQueries.wauDays - 1} AND j.day
         |GROUP BY day ORDER BY day""".stripMargin,
    // single global window cumsum (fine at verify scale); class boundaries
    // compare exact decimals times integer percents on both sides
    "q74_pareto" ->
      s"""WITH rev AS (SELECT l_partkey,
         |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
         |  FROM lineitem GROUP BY 1),
         |t AS (SELECT sum(r) AS T FROM rev),
         |c AS (SELECT l_partkey, r,
         |    sum(r) OVER (ORDER BY r DESC, l_partkey) AS cum FROM rev),
         |k AS (SELECT l_partkey, r, cum - r AS cb, T FROM c, t)
         |SELECT CASE WHEN cb*100 < T*${CoreQueries.paretoA} THEN 'A'
         |            WHEN cb*100 < T*${CoreQueries.paretoB} THEN 'B'
         |            ELSE 'C' END AS cls,
         |  count(*) AS n_parts, round(CAST(sum(r) AS DOUBLE), 2) AS revenue,
         |  round(CAST(sum(r) AS DOUBLE) / CAST(min(T) AS DOUBLE), 6) AS share
         |FROM k GROUP BY 1 ORDER BY cls""".stripMargin,
    "q75_basket" ->
      s"""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS N FROM it),
         |pc AS (SELECT l_partkey, count(*) AS c FROM it GROUP BY 1),
         |pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS cnt
         |  FROM it a JOIN it b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= ${CoreQueries.basketMinSup})
         |SELECT p1, p2, cnt, round(cnt / N, 6) AS support,
         |  round(cnt / c1.c, 6) AS confidence,
         |  round(cnt * N / (CAST(c1.c AS DOUBLE) * CAST(c2.c AS DOUBLE)), 6) AS lift
         |FROM pr JOIN pc c1 ON c1.l_partkey = pr.p1
         |  JOIN pc c2 ON c2.l_partkey = pr.p2, nn
         |ORDER BY lift DESC, p1, p2 LIMIT 20""".stripMargin,
    "q76_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
        |    o_totalprice FROM orders),
        |f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
        |sz AS (SELECT cohort, count(*) AS customers FROM f GROUP BY 1),
        |rev AS (SELECT cohort,
        |    CAST(date_diff('month', cohort, m) AS INTEGER) AS m_offset,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revd
        |  FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
        |c AS (SELECT cohort, m_offset, revd,
        |    sum(revd) OVER (PARTITION BY cohort ORDER BY m_offset) AS cum
        |  FROM rev)
        |SELECT c.cohort, m_offset, customers,
        |  round(CAST(revd AS DOUBLE), 2) AS revenue,
        |  round(CAST(cum AS DOUBLE), 2) AS cum_revenue,
        |  round(CAST(cum AS DOUBLE) / customers, 6) AS ltv
        |FROM c JOIN sz USING (cohort) ORDER BY cohort, m_offset""".stripMargin,
    // Same islands construction; interval lengths floor() to integers on
    // both sides, running max/sum phrased with explicit ROWS frames.
    "q68_interval_coverage" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT)*10000000 AS en
        |  FROM events WHERE event_type = 'view'),
        |m AS (SELECT user_id, st, en, max(en) OVER (PARTITION BY user_id
        |    ORDER BY st, en ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM iv),
        |g AS (SELECT *, CAST(sum(CASE WHEN maxe IS NULL OR st > maxe THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY st, en ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS grp
        |  FROM m),
        |i AS (SELECT user_id, grp, min(st) AS gs, max(en) AS ge, count(*) AS nsrc
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, count(*) AS n_merged, CAST(sum(nsrc) AS BIGINT) AS n_raw,
        |  CAST(sum(ge - gs) AS BIGINT) AS covered_us
        |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin,
    // quantile_cont matches Spark's percentile interpolation; the outlier
    // predicate thresholds on the 6-ROUNDED med/mad both engines share.
    "q69_mad_outliers" ->
      s"""WITH med AS (SELECT event_type,
         |    round(quantile_cont(value, 0.5), 6) AS med
         |  FROM events GROUP BY event_type),
         |mad AS (SELECT e.event_type, min(m.med) AS med,
         |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
         |    count(*) AS n
         |  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type)
         |SELECT e.event_type, min(t.n) AS n, min(t.med) AS med, min(t.mad) AS mad,
         |  CAST(sum(CASE WHEN round(abs(e.value - t.med) - t.mad * ${CoreQueries.madK}, 6) > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS outliers
         |FROM events e JOIN mad t USING (event_type)
         |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    // exact DECIMAL revenue sums; numerators cast to double exactly once.
    "q70_pop_movers" ->
      """WITH rev AS (SELECT n_name, date_trunc('month', o_orderdate) AS month,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revd
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, 2),
        |l AS (SELECT *, lag(revd) OVER (PARTITION BY n_name ORDER BY month) AS prev
        |  FROM rev)
        |SELECT n_name, month, round(CAST(revd AS DOUBLE), 6) AS revenue,
        |  round(CAST(prev AS DOUBLE), 6) AS prev_revenue,
        |  round(CAST(revd - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100, 6) AS pct_change
        |FROM l ORDER BY n_name, month""".stripMargin,
    "q71_ewma" -> ewmaOracle,
    // direct recompute — the Spark side's base+delta state merge must equal
    // it bit-for-bit (exact DECIMAL moments, cast-once doubles).
    "q72_incr_agg" ->
      """WITH st AS (SELECT date_trunc('month', o_orderdate) AS month,
        |    count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
        |    sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,6))) AS ss
        |  FROM orders GROUP BY 1)
        |SELECT month, CAST(n AS BIGINT) AS n,
        |  round(CAST(s AS DOUBLE), 2) AS total,
        |  round(CAST(s AS DOUBLE) / n, 6) AS avg_price,
        |  CASE WHEN n > 1 THEN
        |    round(sqrt(CAST(CAST(n AS DECIMAL(20,0)) * ss - s * s AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) END AS sd_price
        |FROM st ORDER BY month""".stripMargin,
    // the predicate compares 6-rounded stats (see the Spark-side comment:
    // segment-tree vs recompute window partials differ in last ulps)
    "q64_rolling_anomaly" ->
      """WITH t AS (SELECT event_type, event_id, value,
        |  count(value) OVER w AS roll_n,
        |  round(avg(value) OVER w, 6) AS roll_avg,
        |  round(stddev_samp(value) OVER w, 6) AS roll_sd
        | FROM events WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, event_id, round(value, 6) AS value, roll_avg, roll_sd
        |FROM t
        |WHERE roll_n >= 10 AND roll_sd > 0
        |  AND round(abs(value - roll_avg) - roll_sd*3, 6) > 0
        |ORDER BY event_type, event_id LIMIT 500""".stripMargin,
    "q65_gap_audit" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h FROM events)
        |SELECT event_type, min(h) AS first_hour, max(h) AS last_hour,
        |  count(*) AS n_events,
        |  CAST(epoch(max(h)) AS BIGINT)//3600 - CAST(epoch(min(h)) AS BIGINT)//3600 + 1
        |    AS expected_hours,
        |  count(DISTINCT h) AS actual_hours,
        |  CAST(epoch(max(h)) AS BIGINT)//3600 - CAST(epoch(min(h)) AS BIGINT)//3600 + 1
        |    - count(DISTINCT h) AS missing_hours
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q66_transitions" ->
      """WITH t AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        | FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS transitions
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    // identical deterministic v2 derivation (drop %97, mutate %101, clone
    // %103 at key+1e7), digest-level full-outer diff
    "q67_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS d1 FROM documents),
        |v2 AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 101 = 0 THEN text || ' v2' ELSE text END) AS d2
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id, md5(text) AS d2
        |  FROM documents WHERE doc_id % 103 = 0),
        |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |    CASE WHEN v1.d1 IS NULL THEN 'added'
        |         WHEN v2.d2 IS NULL THEN 'removed'
        |         WHEN v1.d1 <> v2.d2 THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT status, count(*) AS n, min(doc_id) AS first_key,
        |  max(doc_id) AS last_key
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    "q19_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, round(${SqlGen.cosSql("e.embedding", "q.qe")}, 6) AS cos_sim
         |FROM embeddings e, q
         |ORDER BY cos_sim DESC, e.vec_id LIMIT 10""".stripMargin
  )
}
