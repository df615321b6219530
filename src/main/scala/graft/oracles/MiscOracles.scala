package graft.oracles

/** Rows outside the named families (sketches, TS, misc SQL surface).
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object MiscOracles {
  private[graft] val sql: Map[String, String] = Map(
    "rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "distinct_segments" ->
      """SELECT DISTINCT c_mktsegment, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_mktsegment, n_name""",
    "set_ops" ->
      """SELECT 'except' AS op, k FROM (
           SELECT o_custkey AS k FROM orders
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         UNION ALL
         SELECT 'intersect' AS op, k FROM (
           SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
           INTERSECT
           SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
         UNION ALL
         SELECT 'union' AS op, k FROM (
           SELECT DISTINCT k FROM (
             SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
             UNION ALL
             SELECT CAST(s_nationkey AS BIGINT) FROM supplier))
         ORDER BY op, k""",
    "math_funcs" ->
      """SELECT p_partkey,
         ROUND(SQRT(p_retailprice), 4) AS sqrt_price,
         ROUND(LN(p_retailprice), 4) AS ln_price,
         ROUND(POW(CAST(p_size AS DOUBLE), 2), 1) AS size_sq,
         ABS(p_size - 25) AS size_dev,
         CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
         CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
         p_partkey % 7 AS key_mod
         FROM part ORDER BY p_partkey""",
    "date_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         CAST(day(o_orderdate) AS BIGINT) AS dom,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
         strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
         strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
         CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
           AS days_to_eoy,
         CAST(((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7 + 7) % 7 AS BIGINT)
           AS weekday_mod
         FROM orders WHERE o_orderkey < 2000
         ORDER BY o_orderkey""",
    "string_funcs" ->
      """SELECT p_partkey,
         UPPER(p_brand) AS brand_u,
         LOWER(p_type) AS type_l,
         CAST(LENGTH(p_name) AS BIGINT) AS name_len,
         SUBSTRING(p_name, 1, 5) AS name_pfx,
         CONCAT_WS('|', p_brand, p_type) AS brand_type,
         REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
         CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a
         FROM part ORDER BY p_partkey""",
    "price_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "pivot_status" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",
    "cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "percentile_qty" ->
      """SELECT l_returnflag,
         ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
         ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
         ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "corr_price_qty" ->
      """SELECT l_returnflag, n,
         ROUND((n * sxy - sx * sy)
           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           AS corr_price_qty
         FROM (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1) t
         ORDER BY l_returnflag""",
    "segment_nations" ->
      """SELECT c_mktsegment,
         string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
         COUNT(DISTINCT n_name) AS n_nations
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "sliding_two_hour" ->
      """WITH e AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         w AS (SELECT date_trunc('hour', ts) AS ws FROM e
               UNION ALL
               SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
                strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
                COUNT(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY 1""",
    "sessionize" ->
      """SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
         FROM (
           SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, event_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
         GROUP BY user_id ORDER BY user_id""",
    "map_funcs" ->
      """SELECT event_type, first_key, COUNT(*) AS n,
         CAST(SUM(k_value) AS BIGINT) AS sum_k,
         CAST(MAX(n_keys) AS BIGINT) AS max_keys
         FROM (
           SELECT event_type,
             json_keys(props)[1] AS first_key,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
             len(json_keys(props)) AS n_keys
           FROM events) t
         GROUP BY 1, 2 ORDER BY event_type, first_key""",
    "null_funcs" ->
      """SELECT event_id,
         COALESCE(t, 'missing') AS t_or_default,
         NULLIF(t, '') AS t_nullif_empty,
         CASE WHEN t IS NOT NULL THEN 'present' ELSE 'absent' END AS nvl2_style,
         CAST(CASE WHEN t IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_null
         FROM (
           SELECT event_id,
             CASE WHEN value < 10 THEN NULL
                  WHEN value < 20 THEN ''
                  ELSE event_type END AS t
           FROM events) x
         ORDER BY event_id""",
    "session_windows" ->
      """SELECT user_id,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, value, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, value, event_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
         GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
         COUNT(CASE WHEN k >= 50 THEN 1 END) AS n_high
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events) t
         GROUP BY 1 ORDER BY event_type""",
    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "skew_salted_join" ->
      """SELECT e.event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(weight AS DECIMAL(3,1))) AS DOUBLE)
           AS weighted_value
         FROM events e JOIN (VALUES
           ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
           ('error', 0.0), ('signup', 2.0)) d(event_type, weight)
           ON e.event_type = d.event_type
         GROUP BY 1 ORDER BY e.event_type""",
    "explode_outer_stats" ->
      """SELECT lang,
         CAST(SUM(greatest(n_sh, 1)) AS BIGINT) AS n_rows,
         CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
         COUNT(CASE WHEN n_sh = 0 THEN 1 END) AS n_empty_docs
         FROM (
           SELECT lang,
             CASE WHEN len(string_split(text, ' ')) >= 5
                  THEN len(list_distinct(
                    [array_to_string(string_split(text, ' ')[i:i+4], ' ')
                     for i in range(1, len(string_split(text, ' '))-3)]))
                  ELSE 0 END AS n_sh
           FROM documents) t
         GROUP BY lang ORDER BY lang""",
    "array_funcs" ->
      """SELECT doc_id,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
         CAST(len(list_intersect(list_distinct(w),
           ['the','a','of','and','to','in','is','for','on','with'])) AS BIGINT)
           AS n_stop_kinds,
         CAST(len(list_distinct(list_concat(list_distinct(w),
           ['the','a','of','and','to','in','is','for','on','with']))) AS BIGINT)
           AS n_union_stop,
         array_to_string(list_sort(list_distinct(w))[1:3], ',') AS first3_sorted,
         w[1] AS head_tok, w[-1] AS tail_tok
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
         ORDER BY doc_id""",
    "grouping_sets_mix" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "unpivot_metrics" ->
      """WITH base AS (SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, value
         FROM (UNPIVOT base ON sum_qty, sum_price, sum_disc
               INTO NAME metric VALUE value)
         ORDER BY l_returnflag, metric""",
    "basket_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_orders
                FROM li GROUP BY 1),
         no AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM li),
         p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS n_co
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         st AS (SELECT p1, p2, n_co, c1.item_orders AS c1,
                  c2.item_orders AS c2, n_orders
                FROM p JOIN ic c1 ON p.p1 = c1.l_partkey
                       JOIN ic c2 ON p.p2 = c2.l_partkey, no),
         dr AS (SELECT p1 AS ante, p2 AS cons, n_co, c1 AS c_ante,
                  c2 AS c_cons, n_orders FROM st
                UNION ALL
                SELECT p2, p1, n_co, c2, c1, n_orders FROM st)
         SELECT ante, cons, n_co AS support,
           ROUND(CAST(n_co AS DOUBLE) / CAST(c_ante AS DOUBLE), 6)
             AS confidence,
           ROUND(CAST(n_co AS DOUBLE) * n_orders / (c_ante * c_cons), 6)
             AS lift,
           ROUND(CAST(n_co AS DOUBLE) / CAST(n_orders AS DOUBLE)
             - (CAST(c_ante AS DOUBLE) / CAST(n_orders AS DOUBLE))
               * (CAST(c_cons AS DOUBLE) / CAST(n_orders AS DOUBLE)), 6)
             AS leverage
         FROM dr ORDER BY confidence DESC, ante, cons LIMIT 20""",
    // sketch_hll_intersect: exact set sides are the truth; the HLL
    // inclusion-exclusion verdicts are asserted TRUE (the documented
    // weaker sketch-gate, as sketch_hll)
    // sketch_kmv: fully deterministic (md5-prefix hash, exact 48-bit →
    // double mapping), so unlike the HLL rows the oracle recomputes the
    // ESTIMATES themselves and the gate is a straight hash compare
    "sketch_kmv" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         h AS (SELECT DISTINCT event_type,
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM du),
         hv AS (SELECT event_type, hx,
             SUM((strpos('0123456789abcdef', substr(hx, g.i, 1)) - 1)
               * POWER(16.0, 12 - g.i)) / POWER(16.0, 12) AS v
           FROM h, generate_series(1, 12) AS g(i) GROUP BY 1, 2),
         sig AS (SELECT event_type, hx, v FROM (
             SELECT event_type, hx, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hx)
                 AS rk
             FROM hv) s WHERE rk <= 32),
         st AS (SELECT s.event_type, e.exact_n,
             CASE WHEN s.n_sig < 32 THEN CAST(s.n_sig AS DOUBLE)
                  ELSE 31.0 / s.v_max END AS est_n
           FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sig,
                   MAX(v) AS v_max FROM sig GROUP BY 1) s
           JOIN (SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n
                 FROM du GROUP BY 1) e USING (event_type)),
         pr AS (SELECT a.event_type AS type_a, a.exact_n AS exact_a,
                  a.est_n AS est_a, b.event_type AS type_b,
                  b.exact_n AS exact_b, b.est_n AS est_b
                FROM st a JOIN st b ON a.event_type < b.event_type),
         pe AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  CAST(COUNT(*) AS BIGINT) AS exact_inter
                FROM du a JOIN du b ON a.user_id = b.user_id
                  AND a.event_type < b.event_type GROUP BY 1, 2),
         uall AS (SELECT DISTINCT type_a, type_b, hx, v FROM (
             SELECT p.type_a, p.type_b, s.hx, s.v
             FROM pr p JOIN sig s ON s.event_type = p.type_a
             UNION ALL
             SELECT p.type_a, p.type_b, s.hx, s.v
             FROM pr p JOIN sig s ON s.event_type = p.type_b) u),
         usig AS (SELECT type_a, type_b, hx, v FROM (
             SELECT type_a, type_b, hx, v,
               ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                 ORDER BY hx) AS rk
             FROM uall) z WHERE rk <= 32),
         kst AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_k,
             MAX(v) AS v_k
           FROM usig GROUP BY 1, 2),
         ov AS (SELECT u.type_a, u.type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
           FROM usig u
           JOIN sig sa ON sa.event_type = u.type_a AND sa.hx = u.hx
           JOIN sig sb ON sb.event_type = u.type_b AND sb.hx = u.hx
           GROUP BY 1, 2)
         SELECT pr.type_a, pr.type_b, pr.exact_a, pr.exact_b,
           pr.exact_a + pr.exact_b - COALESCE(pe.exact_inter, 0)
             AS exact_union,
           COALESCE(pe.exact_inter, 0) AS exact_inter,
           ROUND(CAST(COALESCE(pe.exact_inter, 0) AS DOUBLE)
             / CAST(pr.exact_a + pr.exact_b - COALESCE(pe.exact_inter, 0)
                 AS DOUBLE), 6) AS exact_jaccard,
           ROUND(pr.est_a, 6) AS est_a, ROUND(pr.est_b, 6) AS est_b,
           ROUND(CASE WHEN kst.n_k < 32 THEN CAST(kst.n_k AS DOUBLE)
                 ELSE 31.0 / kst.v_k END, 6) AS est_union,
           ROUND((CAST(COALESCE(ov.n_both, 0) AS DOUBLE)
               / CAST(kst.n_k AS DOUBLE))
             * CASE WHEN kst.n_k < 32 THEN CAST(kst.n_k AS DOUBLE)
                 ELSE 31.0 / kst.v_k END, 6) AS est_inter,
           ROUND(CAST(COALESCE(ov.n_both, 0) AS DOUBLE)
             / CAST(kst.n_k AS DOUBLE), 6) AS est_jaccard
         FROM pr JOIN kst USING (type_a, type_b)
         LEFT JOIN ov USING (type_a, type_b)
         LEFT JOIN pe USING (type_a, type_b)
         ORDER BY type_a, type_b""",
    "sketch_hll_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase')
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM (SELECT user_id FROM a UNION ALL SELECT user_id FROM b) u)
             AS exact_union,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a JOIN b USING (user_id))
             AS exact_inter,
           TRUE AS inter_within_bound, TRUE AS union_within_bound""",
    "sketch_quantiles" ->
      """WITH v AS (SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         n AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM v GROUP BY 1),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct),
         k AS (SELECT o_orderpriority, pct, n_rows,
             (pct * n_rows + 99) // 100 AS k
           FROM n CROSS JOIN p),
         h AS (SELECT o_orderpriority, c, COUNT(*) AS cnt
           FROM v GROUP BY 1, 2),
         cdf AS (SELECT o_orderpriority, c,
             SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY c)
               AS cum
           FROM h)
         SELECT k.o_orderpriority, k.pct, k.n_rows,
           CAST(MIN(cdf.c) AS BIGINT) AS exact_quantile_c,
           TRUE AS sketch_within_bound
         FROM k JOIN cdf ON cdf.o_orderpriority = k.o_orderpriority
           AND cdf.cum >= k.k
         GROUP BY 1, 2, 3
         ORDER BY k.o_orderpriority, k.pct""",
    "ts_decompose" -> OracleGen.tsDecomposeOracle,
    "basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_orders
                FROM li GROUP BY 1),
         no AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM li),
         p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS n_co
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 3)
         SELECT p1, p2, n_co, c1.item_orders AS c1, c2.item_orders AS c2,
           ROUND(CAST(n_co AS DOUBLE) * n_orders /
             (c1.item_orders * c2.item_orders), 6) AS lift
         FROM p JOIN ic c1 ON p.p1 = c1.l_partkey
                JOIN ic c2 ON p.p2 = c2.l_partkey, no
         ORDER BY n_co DESC, p1, p2""",
    "merge_upsert" ->
      """WITH target AS (
           SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
           FROM customer WHERE c_custkey % 3 <> 0),
         source AS (
           SELECT o_custkey AS key,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
         SELECT COALESCE(t.key, s.key) AS key,
           CASE WHEN t.bal IS NOT NULL AND s.delta IS NOT NULL THEN 'update'
                WHEN t.bal IS NULL THEN 'insert' ELSE 'keep' END AS action,
           CAST(COALESCE(t.bal, 0) + COALESCE(s.delta, 0) AS DOUBLE) AS new_bal
         FROM target t FULL OUTER JOIN source s ON t.key = s.key
         ORDER BY key""",
    "scd2_history" ->
      """WITH runs AS (
           SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
           FROM (
             SELECT user_id, event_type, ts, event_id,
               CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
             FROM events) a),
         agg AS (
           SELECT user_id, run_id, event_type, MIN(ts) AS vf,
                  COUNT(*) AS n_events
           FROM runs GROUP BY 1, 2, 3)
         SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id),
                             '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           n_events
         FROM agg ORDER BY user_id, run_id""",
    "gap_fill_hourly" ->
      """WITH spine AS (
           SELECT s.h AS hour_start, t.event_type
           FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-02 23:00:00',
                                INTERVAL 1 HOUR) s(h)
           CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
         observed AS (
           SELECT date_trunc('hour', ts) AS hour_start, event_type,
                  COUNT(*) AS n,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                        / COUNT(*), 6) AS avg_raw
           FROM events
           WHERE value > 100 AND ts < TIMESTAMP '2024-01-03 00:00:00'
           GROUP BY 1, 2)
         SELECT sp.event_type,
           strftime(sp.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(o.n, 0) AS n,
           COALESCE(last_value(o.avg_raw IGNORE NULLS) OVER (
             PARTITION BY sp.event_type ORDER BY sp.hour_start
             ROWS UNBOUNDED PRECEDING), -1.0) AS filled_avg
         FROM spine sp LEFT JOIN observed o
           ON sp.hour_start = o.hour_start AND sp.event_type = o.event_type
         ORDER BY sp.event_type, hour_start""",
    "lateral_topn" ->
      """SELECT n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
         FROM nation,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_nationkey = n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
         ORDER BY n_name, acctbal DESC, c_custkey""",
    "set_ops_all" ->
      """WITH f AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
         ea AS (SELECT 'except_all' AS op, o_orderpriority FROM
           (SELECT o_orderpriority FROM f EXCEPT ALL
            SELECT o_orderpriority FROM o)),
         ia AS (SELECT 'intersect_all' AS op, o_orderpriority FROM
           (SELECT o_orderpriority FROM f INTERSECT ALL
            SELECT o_orderpriority FROM o))
         SELECT op, o_orderpriority, COUNT(*) AS n
         FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "page_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
         FROM orders ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 20 OFFSET 40""",
    "regr_price_qty" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
           SUM(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM m ORDER BY l_returnflag""",
    "user_journey" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
                    FROM events),
         f AS (SELECT user_id, event_type AS first_type FROM (
           SELECT user_id, event_type, ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY tsu, event_id) AS r FROM e)
           WHERE r = 1),
         l AS (SELECT user_id, event_type AS last_type FROM (
           SELECT user_id, event_type, ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS r FROM e)
           WHERE r = 1),
         s AS (SELECT user_id, COUNT(*) AS n_events,
                 (MAX(tsu) - MIN(tsu)) // 1000000 AS span_seconds
               FROM e GROUP BY 1)
         SELECT s.user_id, s.n_events, f.first_type, l.last_type,
                s.span_seconds
         FROM s JOIN f USING (user_id) JOIN l USING (user_id)
         ORDER BY s.user_id""",
    "array_hof" ->
      """SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
             AS BIGINT) AS total_chars,
           CAST(len(list_filter(w, x -> length(x) > 5)) AS BIGINT) AS n_long,
           len(list_filter(w, x -> length(x) > 9)) > 0 AS has_very_long,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(w, x -> length(x) > 6)))[1:3], ','), '') AS top_long
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE doc_id < 50)
         ORDER BY doc_id""",
    // approx gates: the oracle cannot reproduce engine-specific sketch
    // estimates, so both sides emit the EXACT values plus within-bound
    // booleans (oracle: literal TRUE). Estimate drift flips the Spark
    // boolean -> hash mismatch -> red row. See Relational.approxStats.
    "approx_stats" ->
      """SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS parts_within_bound,
           ROUND(quantile_cont(l_quantity, 0.5), 2) AS exact_median,
           TRUE AS median_within_bound
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "sketch_hll" ->
      """WITH per AS (SELECT o_orderpriority, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS exact_distinct
           FROM orders GROUP BY 1),
         tot AS (SELECT 'ALL' AS o_orderpriority, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS exact_distinct
           FROM orders)
         SELECT o_orderpriority, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           TRUE AS est_within_bound
         FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
         ORDER BY o_orderpriority""",
    "skew_profile" ->
      """WITH tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM orders),
         top AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY n DESC, o_custkey LIMIT 10)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey)
             AS BIGINT) AS rk,
           o_custkey, n,
           ROUND(n / n_total, 6) AS share,
           ROUND(SUM(n) OVER (ORDER BY n DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / n_total, 6) AS cum_share
         FROM top, tot ORDER BY rk""",
    "pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         c AS (SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t),
         pw AS (SELECT source, (cum - n_tok) // 256 AS win,
             CAST(COUNT(*) AS BIGINT) AS docs_in_win,
             SUM(n_tok) AS tok_start
           FROM c GROUP BY 1, 2)
         SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
         FROM pw GROUP BY 1 ORDER BY 1""",
    // sketch_freq_topk: the exact top-10 token census is the truth side;
    // within_bounds pins the Misra-Gries lb <= true <= ub contract,
    // which holds under any merge order, so the oracle asserts TRUE
    "sketch_freq_topk" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_bounds
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY n DESC, token LIMIT 10""",
    "sketch_countmin" ->
      """WITH ev AS (SELECT user_id FROM events),
         hs AS (SELECT user_id, j,
             md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))
               AS h
           FROM ev CROSS JOIN range(3) t(j)),
         hb AS (SELECT user_id, j,
             CAST(((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 64
               AS INT) AS bucket
           FROM hs),
         b AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM hb GROUP BY 1, 2),
         exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact
           FROM ev GROUP BY 1),
         tracked AS (SELECT user_id, exact, CAST(rk AS INT) AS rk FROM (
             SELECT *, ROW_NUMBER() OVER (ORDER BY exact DESC, user_id)
               AS rk FROM exact) z WHERE rk <= 10),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev),
         pr AS (SELECT t.user_id, t.exact, t.rk,
             MIN(b.cnt) AS est
           FROM tracked t
           JOIN hb ON hb.user_id = t.user_id
           JOIN b ON b.j = hb.j AND b.bucket = hb.bucket
           GROUP BY 1, 2, 3)
         SELECT rk, user_id, exact, CAST(est AS BIGINT) AS est,
           CAST(est - exact AS BIGINT) AS overestimate,
           est >= exact AS never_under,
           est - exact <= (2 * n_total + 63) // 64 AS within_bound
         FROM pr, n ORDER BY rk""",
    "sketch_ams_f2" ->
      """WITH pk AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         exact AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2
           FROM pk),
         sg AS (SELECT pk.user_id, pk.cnt, CAST(j AS INT) AS j,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('ams' || CAST(j AS VARCHAR) || ':'
                   || CAST(user_id AS VARCHAR)), 4, 1)) - 1) % 2 = 0
               THEN 1 ELSE -1 END AS s
           FROM pk CROSS JOIN range(9) t(j)),
         z AS (SELECT j, CAST(SUM(s * cnt) AS BIGINT) AS z,
             CAST(SUM(s * cnt) * SUM(s * cnt) AS BIGINT) AS est
           FROM sg GROUP BY 1),
         med AS (SELECT CAST(MEDIAN(est) AS BIGINT) AS median_est FROM z)
         SELECT j, z, est, median_est, exact_f2,
           ROUND(CAST(ABS(median_est - exact_f2) AS DOUBLE) / exact_f2, 6)
             AS rel_err
         FROM z, med, exact ORDER BY j""",
    "sketch_linear_counting" ->
      """WITH ev AS (SELECT event_type, user_id FROM events),
         slots AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
             AS occupied
           FROM (SELECT DISTINCT event_type,
               CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
                   * 268435456
                 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
                   * 16777216
                 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
                   * 1048576
                 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
                   * 65536
                 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)
                   * 4096
                 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
                   * 256
                 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1)
                   * 16
                 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
                 % 4096 AS BIGINT) AS slot
             FROM (SELECT event_type, md5('lc:'
                 || CAST(user_id AS VARCHAR)) AS h FROM ev) a) b
           GROUP BY 1),
         exact AS (SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
           FROM ev GROUP BY 1),
         j AS (SELECT e.event_type, exact_distinct, occupied,
             CASE WHEN occupied < 4096 THEN
               -4096.0 * ln(CAST(4096 - occupied AS DOUBLE) / 4096)
             END AS est
           FROM exact e JOIN slots s ON e.event_type = s.event_type)
         SELECT event_type, exact_distinct, occupied,
           ROUND(est, 2) AS estimate,
           ROUND(ABS(est - CAST(exact_distinct AS DOUBLE))
             / exact_distinct, 6) AS rel_err,
           ABS(est - CAST(exact_distinct AS DOUBLE))
             <= CAST(exact_distinct AS DOUBLE) * 0.05 AS within_5pct
         FROM j ORDER BY event_type""",
  )
}
