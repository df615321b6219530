package graft.oracles

/** Relational / TPC-H-shaped / windowing / aggregate rows.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object RelationalOracles {
  private[graft] val sql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2)) * CAST(1+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY 1, 2
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM region, nation, customer, orders, lineitem, supplier
         WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
           AND n_nationkey = c_nationkey AND c_custkey = o_custkey
           AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "q6_sql_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "join_outer_customer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 0.0) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1, 2 ORDER BY c_custkey""",
    "join_semi_customer" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
         FROM lineitem WHERE l_orderkey < 200
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "window_distribution" ->
      """SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
         CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
         ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
         ROUND(CUME_DIST() OVER w, 6) AS cume,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
         FROM part WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
         WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
         ORDER BY p_brand, price, p_partkey""",
    "window_navigation" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         LAG(o_orderkey, 1) OVER w AS prev_order,
         LEAD(o_orderkey, 1) OVER w AS next_order,
         FIRST_VALUE(o_orderkey) OVER wf AS first_order,
         LAST_VALUE(o_orderkey) OVER wf AS last_order
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, orderdate, o_orderkey""",
    "agg_stats" ->
      """SELECT l_returnflag,
         CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
         COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(*) AS n_rows,
         ROUND(STDDEV_SAMP(l_quantity), 2) AS sd_qty
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "join_asof_attribution" ->
      """SELECT event_id, user_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         strftime(asof_view_ts, '%Y-%m-%d %H:%M:%S') AS asof_view_ts,
         epoch_us(ts) - epoch_us(asof_view_ts) AS gap_us
         FROM (
           SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS asof_view_ts
           FROM events) t
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "join_range_bands" ->
      """SELECT band, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
         FROM orders JOIN (VALUES
           ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
           ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 1000000000.0))
           b(band, lo, hi)
           ON o_totalprice >= lo AND o_totalprice < hi
         GROUP BY band ORDER BY band""",
    "subq_scalar_corr" ->
      """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
         FROM customer c
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
               (SELECT COUNT(*) FROM customer c2
                WHERE c2.c_nationkey = c.c_nationkey)
             > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3
                WHERE c3.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",
    "subq_exists" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "subq_in_notin" ->
      """SELECT p_partkey, p_name
         FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                             WHERE l_extendedprice > 104000)
           AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                 WHERE l_quantity >= 50)
         ORDER BY p_partkey""",
    "subq_having" ->
      """SELECT c_custkey, c_name, CAST(t.total_dec AS DOUBLE) AS total_spent,
             t.n_orders
         FROM customer c JOIN (
           SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
                  CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY o_custkey
           HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 3500000
         ) t ON c.c_custkey = t.o_custkey
         ORDER BY c_custkey""",
    "topk_aggregator" ->
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk,
                o_totalprice AS price, o_orderkey AS orderkey
         FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders) t
         WHERE rk <= 3 ORDER BY o_orderpriority, rk""",
    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rev_7d,
         CAST(COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_7d
         FROM orders WHERE o_custkey < 200
         ORDER BY o_custkey, o_orderkey""",
    "orders_cohort_revenue" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS m0
           FROM o GROUP BY 1)
         SELECT strftime(f.m0, '%Y-%m') AS cohort,
           CAST(datediff('month', f.m0,
             date_trunc('month', o.o_orderdate)) AS BIGINT) AS m_offset,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS DOUBLE) / 100 AS revenue
         FROM o JOIN f ON o.o_custkey = f.o_custkey
         GROUP BY 1, 2 ORDER BY cohort, m_offset""",
    "orders_rfm" ->
      """WITH cust AS (SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
               (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
           FROM orders GROUP BY 1),
         c2 AS (SELECT *, monetary_c // 100000 AS m_band FROM cust),
         n AS (SELECT COUNT(*) AS n FROM c2),
         rc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT recency AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         rt AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM rc, n),
         fc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT frequency AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         ft AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM fc, n),
         mc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT m_band AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         mt AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM mc, n),
         scored AS (SELECT c2.monetary_c,
             5 - (1 + CAST(c2.recency > rt.t25 AS BIGINT)
                    + CAST(c2.recency > rt.t50 AS BIGINT)
                    + CAST(c2.recency > rt.t75 AS BIGINT)) AS r_score,
             1 + CAST(c2.frequency > ft.t25 AS BIGINT)
               + CAST(c2.frequency > ft.t50 AS BIGINT)
               + CAST(c2.frequency > ft.t75 AS BIGINT) AS f_score,
             1 + CAST(c2.m_band > mt.t25 AS BIGINT)
               + CAST(c2.m_band > mt.t50 AS BIGINT)
               + CAST(c2.m_band > mt.t75 AS BIGINT) AS m_score
           FROM c2, rt, ft, mt)
         SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(monetary_c) AS DOUBLE) / (COUNT(*) * 100), 2)
             AS avg_monetary
         FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "agg_weighted_median" ->
      """WITH hist AS (SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT flag, price_c, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price_c) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
           FROM hist)
         SELECT flag,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 3) // 4
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_p25,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 1) // 2
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_median,
           ROUND(CAST(MIN(CASE WHEN cum >= (3 * tot + 3) // 4
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_p75,
           CAST(MAX(tot) AS DOUBLE) / 100.0 AS total_qty
         FROM c GROUP BY flag ORDER BY flag""",
    "orders_pareto_abc" ->
      """WITH rev AS (SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
           FROM lineitem GROUP BY 1),
         c AS (SELECT l_partkey, rev4,
             SUM(rev4) OVER (ORDER BY rev4 DESC, l_partkey) AS cum,
             SUM(rev4) OVER () AS t
           FROM rev)
         SELECT CASE WHEN cum * 10 <= t * 7 THEN 'A'
                     WHEN cum * 10 <= t * 9 THEN 'B'
                     ELSE 'C' END AS cls,
           COUNT(*) AS n_parts,
           ROUND(CAST(SUM(rev4) AS DOUBLE) / 10000, 2) AS revenue,
           ROUND(CAST(SUM(rev4) AS DOUBLE) / CAST(MAX(t) AS DOUBLE), 6)
             AS rev_share
         FROM c GROUP BY 1 ORDER BY cls""",
    "orders_shipping_aging" ->
      """WITH j AS (SELECT o_orderpriority AS priority,
             date_diff('day', CAST(o_orderdate AS DATE),
               CAST(l_shipdate AS DATE)) AS age_d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         hist AS (SELECT priority, age_d, COUNT(*) AS cnt
           FROM j GROUP BY 1, 2),
         cd AS (SELECT *,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY age_d) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS tot,
             SUM(age_d * cnt) OVER (PARTITION BY priority) AS wsum
           FROM hist)
         SELECT priority, CAST(MAX(tot) AS BIGINT) AS n_lines,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_age_d,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN age_d END)
             AS BIGINT) AS p50_age_d,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN age_d END)
             AS BIGINT) AS p90_age_d
         FROM cd GROUP BY priority ORDER BY priority""",
    "orders_repeat_latency" ->
      """WITH ranked AS (SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rk
           FROM orders),
         pc AS (SELECT o_custkey, COUNT(*) AS n2,
             date_diff('day', CAST(MIN(o_orderdate) AS DATE),
               CAST(MAX(o_orderdate) AS DATE)) AS gap_d
           FROM ranked WHERE rk <= 2 GROUP BY 1),
         tt AS (SELECT COUNT(*) AS n_customers,
             CAST(SUM(CASE WHEN n2 = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat
           FROM pc),
         hist AS (SELECT gap_d, COUNT(*) AS cnt FROM pc
           WHERE n2 = 2 GROUP BY 1),
         cd AS (SELECT gap_d, cnt,
             SUM(cnt) OVER (ORDER BY gap_d) AS cum FROM hist)
         SELECT MAX(tt.n_customers) AS n_customers,
           MAX(tt.n_repeat) AS n_repeat,
           ROUND(CAST(MAX(tt.n_repeat) AS DOUBLE)
             / MAX(tt.n_customers), 6) AS repeat_rate,
           ROUND(CAST(SUM(gap_d * cnt) AS DOUBLE) / MAX(tt.n_repeat), 2)
             AS mean_days,
           CAST(MIN(CASE WHEN cum >= (tt.n_repeat + 1) // 2
             THEN gap_d END) AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cum * 10 >= tt.n_repeat * 9
             THEN gap_d END) AS BIGINT) AS p90_days
         FROM cd, tt""",
    "join_asof_tolerance" ->
      """WITH w AS (SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
           FROM events),
         p AS (SELECT
             date_diff('second', prev_view_ts, ts) AS gap_back,
             date_diff('second', ts, next_view_ts) AS gap_fwd
           FROM w WHERE event_type = 'purchase'),
         o AS (SELECT
             CASE WHEN gap_back <= 1800 AND (gap_fwd IS NULL
                    OR gap_fwd > 1800 OR gap_back <= gap_fwd)
                  THEN 'before'
                  WHEN gap_fwd <= 1800 THEN 'after'
                  ELSE 'none' END AS outcome,
             CASE WHEN gap_back <= 1800 AND (gap_fwd IS NULL
                    OR gap_fwd > 1800 OR gap_back <= gap_fwd)
                  THEN gap_back
                  WHEN gap_fwd <= 1800 THEN gap_fwd END AS gap_s
           FROM p)
         SELECT outcome, COUNT(*) AS n_purchases,
           CASE WHEN SUM(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END)
                  > 0
             THEN ROUND(CAST(SUM(COALESCE(gap_s, 0)) AS DOUBLE)
               / SUM(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END), 2)
           END AS mean_gap_s
         FROM o GROUP BY 1 ORDER BY outcome""",
    "window_ntile" ->
      """WITH rev AS (SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
               AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1)
         SELECT n_name, ROUND(revenue, 2) AS revenue,
           CAST(NTILE(4) OVER (ORDER BY revenue DESC, n_name) AS BIGINT)
             AS quartile
         FROM rev ORDER BY quartile, revenue DESC, n_name""",
    "agg_bitwise" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(BIT_AND(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS all_bits,
         CAST(BIT_OR(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS any_bits,
         CAST(BIT_XOR(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS parity_bits,
         CAST(SUM(bit_count(CAST(l_linenumber AS BIGINT))) AS BIGINT)
           AS total_popcount
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "orders_qoq_growth" ->
      """WITH q AS (SELECT c_mktsegment,
             date_trunc('quarter', o_orderdate) AS qtr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         g AS (SELECT c_mktsegment, qtr, rev_c,
             LAG(rev_c, 1) OVER (PARTITION BY c_mktsegment
               ORDER BY qtr) AS prev_c
           FROM q)
         SELECT c_mktsegment, strftime(qtr, '%Y-%m-%d') AS quarter,
           ROUND(CAST(rev_c AS DOUBLE) / 100, 2) AS revenue,
           CASE WHEN prev_c IS NOT NULL THEN
             ROUND((CAST(rev_c AS DOUBLE) - CAST(prev_c AS DOUBLE))
               / CAST(prev_c AS DOUBLE), 6) END AS qoq_growth
         FROM g ORDER BY c_mktsegment, quarter""",
    "orders_basket_profile" ->
      """WITH po AS (SELECT o_orderkey, COUNT(*) AS n_lines,
             MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS price_c
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1)
         SELECT CAST(n_lines AS BIGINT) AS n_lines,
           price_c // 5000000 AS value_band,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / (COUNT(*) * 100), 2)
             AS avg_value
         FROM po GROUP BY 1, 2 ORDER BY n_lines, value_band""",
    "window_rolling_median" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           ROUND(median(n) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 1) AS med7
         FROM daily ORDER BY event_type, day""",
    "window_ewma" -> {
      val num = (0 to 7).map(k =>
        s"COALESCE(l$k * ${math.pow(2.0, -k)}, 0.0)").mkString(" + ")
      val den = (0 to 7).map(k =>
        s"CASE WHEN l$k IS NOT NULL THEN ${math.pow(2.0, -k)} ELSE 0.0 END")
        .mkString(" + ")
      val lags = (0 to 7).map(k => s"lag(n, $k) OVER w AS l$k")
        .mkString(", ")
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, d, n, $lags
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY d))
         SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           ROUND(($num) / ($den), 4) AS ewma
         FROM l ORDER BY event_type, day"""
    },
    "join_asof_nearest" ->
      """WITH w AS (
           SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
           FROM events),
         g AS (SELECT *,
             epoch_us(ts) - epoch_us(prev_view_ts) AS gap_back,
             epoch_us(next_view_ts) - epoch_us(ts) AS gap_fwd
           FROM w WHERE event_type = 'purchase'),
         d AS (SELECT *,
             CASE WHEN gap_back IS NOT NULL AND
                       (gap_fwd IS NULL OR gap_back <= gap_fwd)
                  THEN 'before'
                  WHEN gap_fwd IS NOT NULL THEN 'after'
                  ELSE 'none' END AS direction
           FROM g)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(CASE WHEN direction = 'before' THEN prev_view_ts
                         WHEN direction = 'after' THEN next_view_ts END,
                    '%Y-%m-%d %H:%M:%S') AS nearest_view_ts,
           direction,
           CASE WHEN direction = 'before' THEN gap_back
                WHEN direction = 'after' THEN gap_fwd END AS gap_us
         FROM d ORDER BY event_id""",
    "agg_collect" ->
      """WITH base AS (
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                    AS statuses
           FROM orders GROUP BY 1),
         mx AS (SELECT o_orderpriority, o_orderkey AS top_key FROM (
           SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey DESC) AS r
           FROM orders) WHERE r = 1),
         mn AS (SELECT o_orderpriority, o_orderkey AS bot_key FROM (
           SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS r
           FROM orders) WHERE r = 1)
         SELECT base.o_orderpriority, n, statuses, top_key, bot_key
         FROM base JOIN mx USING (o_orderpriority) JOIN mn USING (o_orderpriority)
         ORDER BY base.o_orderpriority""",
    "window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders WHERE o_custkey < 300
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "join_nullsafe" ->
      """WITH ev AS (SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
             AS INTEGER) < 10 THEN NULL
             ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 5
           END AS k10 FROM events),
         dim AS (SELECT DISTINCT k10 AS dk,
             COALESCE('b' || CAST(k10 AS VARCHAR), 'b_null') AS bucket_label
           FROM ev)
         SELECT bucket_label, COUNT(*) AS n
         FROM ev JOIN dim ON ev.k10 IS NOT DISTINCT FROM dim.dk
         GROUP BY 1 ORDER BY 1""",
    "agg_bool_listagg" ->
      """SELECT o_orderpriority,
           bool_and(o_orderstatus = 'F') AS all_f,
           bool_or(o_orderstatus = 'P') AS any_p,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
           string_agg(DISTINCT o_orderstatus, ','
             ORDER BY o_orderstatus) AS statuses
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
           AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 250)
         SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, sum_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         ORDER BY sum_qty DESC, o_orderkey LIMIT 100""",
    "agg_mode_median" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
                    FROM orders GROUP BY 1, 2),
         m AS (SELECT o_orderpriority, o_orderstatus AS mode_status,
                 CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                   AS n_orders,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY n DESC, o_orderstatus DESC) AS rn
               FROM c),
         md AS (SELECT o_orderpriority,
                  ROUND(MEDIAN(o_totalprice), 4) AS median_price
                FROM orders GROUP BY 1)
         SELECT m.o_orderpriority, m.mode_status, m.n_orders, md.median_price
         FROM m JOIN md USING (o_orderpriority)
         WHERE rn = 1 ORDER BY m.o_orderpriority""",
    "q14_promo_revenue" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1-l_discount AS DECIMAL(4,2))
             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_rev,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_rev,
         ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "window_mom_change" ->
      """WITH m AS (
           SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS month,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
           FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag, month, rev,
           LAG(rev) OVER (PARTITION BY l_returnflag ORDER BY month) AS prev_rev,
           ROUND(100.0 * (rev - LAG(rev) OVER (PARTITION BY l_returnflag
             ORDER BY month)) / LAG(rev) OVER (PARTITION BY l_returnflag
             ORDER BY month), 6) AS mom_pct
         FROM m ORDER BY l_returnflag, month""",
    "q2_min_acctbal_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         esupp AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE')
         SELECT p_partkey, s_name, s_acctbal
         FROM part
         JOIN ps ON p_partkey = l_partkey
         JOIN esupp ON l_suppkey = s_suppkey
         WHERE p_type = 'STANDARD' AND p_size <= 10
           AND s_acctbal = (SELECT MIN(s2.s_acctbal) FROM ps ps2
                            JOIN esupp s2 ON ps2.l_suppkey = s2.s_suppkey
                            WHERE ps2.l_partkey = p_partkey)
         ORDER BY s_acctbal, p_partkey, s_name LIMIT 100""",
    "q7_volume_shipping" ->
      """WITH agg AS (
           SELECT supp_nation, cust_nation, yr,
             SUM(volume) AS rev_dec, COUNT(*) AS n
           FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS yr,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(1-l_discount AS DECIMAL(4,2)) AS volume
                 FROM lineitem
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
                 WHERE n1.n_name <> n2.n_name)
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT *, SUM(n) OVER (PARTITION BY
               least(supp_nation, cust_nation),
               greatest(supp_nation, cust_nation)) AS pair_total
           FROM agg),
         top AS (
           SELECT *, DENSE_RANK() OVER (ORDER BY pair_total DESC,
               least(supp_nation, cust_nation),
               greatest(supp_nation, cust_nation)) AS rk
           FROM ranked)
         SELECT supp_nation, cust_nation, yr,
           CAST(rev_dec AS DOUBLE) AS revenue, n
         FROM top WHERE rk = 1 ORDER BY 1, 2, 3""",
    "q8_market_share" ->
      """SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS nation_rev,
           CAST(SUM(volume) AS DOUBLE) AS total_rev,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
               ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
         FROM (SELECT n1.n_name AS supp_nation,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1-l_discount AS DECIMAL(4,2)) AS volume
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               JOIN region ON n2.n_regionkey = r_regionkey
               WHERE r_name = 'ASIA')
         GROUP BY yr ORDER BY yr""",
    "q9_product_profit" ->
      """SELECT nation, yr, CAST(SUM(profit) AS DOUBLE) AS sum_profit
         FROM (SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1-l_discount AS DECIMAL(4,2))
                 - CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(0.1 AS DECIMAL(3,1)) AS profit
               FROM lineitem
               JOIN part ON l_partkey = p_partkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE p_type = 'PROMO')
         GROUP BY 1, 2 ORDER BY nation, yr""",
    "q13_order_distribution" ->
      """SELECT n_orders, COUNT(*) AS n_customers
         FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey)
         GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""",
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1-l_discount AS DECIMAL(4,2))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         FROM supplier JOIN rev ON s_suppkey = suppkey
         WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         ORDER BY s_suppkey""",
    "q17_small_qty_revenue" ->
      """WITH b3 AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
         pq AS (SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt
           FROM lineitem JOIN b3 ON l_partkey = p_partkey
           GROUP BY l_partkey)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
         FROM lineitem JOIN b3 ON l_partkey = p_partkey
         JOIN pq ON l_partkey = pk
         WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty""",
    "q19_disjunctive_revenue" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 40)""",
    "q21_waiting_supplier" ->
      """WITH ol AS (SELECT l_orderkey AS okey, l_suppkey AS skey,
             MAX(l_shipdate) AS ship
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F' GROUP BY 1, 2)
         SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         FROM ol a JOIN supplier ON a.skey = s_suppkey
         WHERE EXISTS (SELECT 1 FROM ol b
                 WHERE b.okey = a.okey AND b.skey <> a.skey)
           AND NOT EXISTS (SELECT 1 FROM ol c
                 WHERE c.okey = a.okey AND c.skey <> a.skey
                   AND c.ship >= a.ship)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q11_important_parts" ->
      """WITH esupp AS (SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         v AS (SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1-l_discount AS DECIMAL(4,2))) AS val_dec
           FROM lineitem
           WHERE l_suppkey IN (SELECT s_suppkey FROM esupp)
           GROUP BY l_partkey)
         SELECT partkey, CAST(val_dec AS DOUBLE) AS value
         FROM v
         WHERE CAST(val_dec AS DECIMAL(28,4)) * 1000 >
           (SELECT SUM(val_dec) FROM v)
         ORDER BY value DESC, partkey""",
    "q12_priority_lateness" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > o_orderdate + INTERVAL 90 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_dominant_supplier" ->
      """WITH pq AS (SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             AND l_partkey IN
               (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
           GROUP BY 1, 2),
         t AS (SELECT *, SUM(q) OVER (PARTITION BY l_partkey) AS tot FROM pq)
         SELECT s_name, s_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND s_suppkey IN (SELECT l_suppkey FROM t WHERE q * 2 > tot)
         ORDER BY s_name""",
    "q22_idle_balances" ->
      """WITH lapsed AS (
           SELECT c_custkey, c_name, c_acctbal FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')),
         pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
             COUNT(*) AS n
           FROM customer WHERE c_acctbal > 0)
         SELECT substring(c_name, 18, 1) AS code,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM lapsed, pos
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
         GROUP BY 1 ORDER BY 1""",
    "orders_drawdown" ->
      """WITH daily AS (SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM orders GROUP BY 1, 2),
         s AS (SELECT *,
             MAX(rev_c) OVER (PARTITION BY o_orderpriority ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS peak,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_days
           FROM daily),
         s2 AS (SELECT *, peak - rev_c AS dd FROM s),
         b AS (SELECT *, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority ORDER BY dd DESC, d) AS rk
           FROM s2)
         SELECT o_orderpriority, CAST(n_days AS BIGINT) AS n_days,
           strftime(d, '%Y-%m-%d') AS trough_day,
           ROUND(CAST(peak AS DOUBLE) / 100, 2) AS peak_rev,
           ROUND(CAST(rev_c AS DOUBLE) / 100, 2) AS trough_rev,
           ROUND(CAST(dd AS DOUBLE) / 100, 2) AS max_drawdown,
           ROUND(CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE), 6)
             AS drawdown_frac
         FROM b WHERE rk = 1 ORDER BY 1""",
    "join_pit_dimension" ->
      """WITH runs0 AS (SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events WHERE event_type <> 'purchase'),
         runs1 AS (SELECT *, CASE WHEN prev IS DISTINCT FROM event_type
             THEN 1 ELSE 0 END AS chg FROM runs0),
         runs2 AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
           FROM runs1),
         dim AS (SELECT user_id AS du, run_id,
             event_type AS state_type, MIN(ts) AS vf
           FROM runs2 GROUP BY 1, 2, 3),
         facts AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         j AS (SELECT f.event_id, f.user_id, f.ts, d.state_type,
             d.run_id, d.vf,
             ROW_NUMBER() OVER (PARTITION BY f.event_id
               ORDER BY d.vf DESC, d.run_id DESC) AS rk
           FROM facts f LEFT JOIN dim d
             ON f.user_id = d.du AND d.vf <= f.ts)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           COALESCE(state_type, 'none') AS state_type,
           CAST(COALESCE(run_id, -1) AS BIGINT) AS state_run_id,
           COALESCE(strftime(vf, '%Y-%m-%d %H:%M:%S'), '')
             AS state_since
         FROM j WHERE rk = 1 ORDER BY event_id""",
    "window_vwap" ->
      """WITH daily AS (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS pv,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
               AS BIGINT) AS qv
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT *,
             SUM(pv) OVER (PARTITION BY l_returnflag ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS cum_pv,
             SUM(qv) OVER (PARTITION BY l_returnflag ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS cum_qv
           FROM daily)
         SELECT l_returnflag, strftime(d, '%Y-%m-%d') AS day,
           ROUND(CAST(cum_pv AS DOUBLE) / 100, 2) AS cum_revenue,
           ROUND(CAST(cum_qv AS DOUBLE) / 100, 2) AS cum_qty,
           ROUND(CAST(cum_pv AS DOUBLE) / CAST(cum_qv AS DOUBLE), 6)
             AS vwap
         FROM c ORDER BY l_returnflag, day""",
    "orders_theil_decomp" ->
      """WITH cust AS (SELECT n_name,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name, o_custkey
           HAVING SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) > 0),
         pop AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(x) AS BIGINT) AS x_all FROM cust),
         grp AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS x_g FROM cust GROUP BY 1),
         terms AS (SELECT c.n_name, g.n_g, g.x_g, p.n_all, p.x_all,
             CAST(x AS DOUBLE) / (CAST(x_g AS DOUBLE) / n_g) AS rg,
             CAST(x AS DOUBLE) / (CAST(x_all AS DOUBLE) / n_all) AS ra
           FROM cust c JOIN grp g ON c.n_name = g.n_name, pop p),
         q AS (SELECT n_name, n_g, x_g, n_all, x_all,
             CAST(rg * ln(rg) AS DECIMAL(28,12)) AS tw,
             CAST(ra * ln(ra) AS DECIMAL(28,12)) AS tt
           FROM terms),
         tot AS (SELECT CAST(SUM(tt) AS DOUBLE) / MAX(n_all)
             AS theil_total FROM q),
         g2 AS (SELECT n_name, MAX(n_g) AS n_cust, MAX(x_g) AS x_g,
             MAX(n_all) AS n_all, MAX(x_all) AS x_all,
             CAST(SUM(tw) AS DOUBLE) / MAX(n_g) AS theil_within
           FROM q GROUP BY 1)
         SELECT n_name, n_cust,
           ROUND(CAST(x_g AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(x_g AS DOUBLE) / x_all, 6) AS share,
           ROUND(theil_within, 6) AS theil_within,
           ROUND(CAST(x_g AS DOUBLE) / x_all * theil_within, 6)
             AS contrib_within,
           ROUND(CAST(x_g AS DOUBLE) / x_all
             * ln((CAST(x_g AS DOUBLE) / n_cust)
               / (CAST(x_all AS DOUBLE) / n_all)), 6) AS contrib_between,
           ROUND(theil_total, 6) AS theil_total
         FROM g2, tot ORDER BY n_name""",
    "agg_trimmed_mean" ->
      """WITH cents AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
             AS c FROM orders),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cents
           GROUP BY 1),
         ch AS (SELECT c, cnt, SUM(cnt) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc FROM cents),
         axis AS (SELECT p, n, sc, n * p // 100 AS k
           FROM (VALUES (1), (5), (10)) t(p), tot),
         lo AS (SELECT p, MIN(c) AS lo FROM ch, axis
           WHERE cum >= k + 1 GROUP BY 1),
         hi AS (SELECT p, MIN(c) AS hi FROM ch, axis
           WHERE cum >= n - k GROUP BY 1),
         inr AS (SELECT p,
             CAST(SUM(take * c) AS BIGINT) AS ts,
             CAST(SUM(take) AS BIGINT) AS tn
           FROM (SELECT a.p, ch.c,
               GREATEST(0, LEAST(cum, n - k) - GREATEST(cum - cnt, k))
                 AS take
             FROM ch, axis a) z GROUP BY 1)
         SELECT a.p, a.k, tn AS n_kept,
           ROUND(CAST(sc AS DOUBLE) / n / 100.0, 4) AS raw_mean,
           ROUND(CAST(ts AS DOUBLE) / tn / 100.0, 4) AS trimmed_mean,
           ROUND(CAST(ts + a.k * (lo.lo + hi.hi) AS DOUBLE) / n / 100.0,
             4) AS winsor_mean,
           ROUND(CAST(lo.lo AS DOUBLE) / 100.0, 2) AS lo_clamp,
           ROUND(CAST(hi.hi AS DOUBLE) / 100.0, 2) AS hi_clamp
         FROM axis a JOIN inr ON a.p = inr.p
         JOIN lo ON a.p = lo.p JOIN hi ON a.p = hi.p
         ORDER BY a.p""",
    "window_interpolate" ->
      """WITH ev AS (SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'
             AND value IS NOT NULL),
         obs AS (SELECT date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc
           FROM ev GROUP BY 1),
         obs2 AS (SELECT h, n,
             CAST(CAST(sc AS DOUBLE) / n AS DECIMAL(18,9)) AS v
           FROM obs),
         span AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1 FROM ev),
         spine AS (SELECT h0 + to_hours(CAST(k AS BIGINT)) AS h,
             CAST(k + 1 AS BIGINT) AS t
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         series AS (SELECT s.h, s.t, o.n, o.v
           FROM spine s LEFT JOIN obs2 o ON s.h = o.h),
         f AS (SELECT h, t, n, v,
             LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS pt,
             FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM series)
         SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(n, 0) AS n_obs,
           v IS NOT NULL AS observed,
           ROUND(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
               + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                 * (t - pt) / (nt - pt) END, 6) AS value
         FROM f ORDER BY hour_start""",
    "orders_demand_classes" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qm
           FROM lineitem GROUP BY 1, 2),
         span AS (SELECT CAST(date_diff('month',
             date_trunc('month', MIN(l_shipdate)),
             date_trunc('month', MAX(l_shipdate))) + 1 AS BIGINT)
             AS n_months FROM lineitem),
         parts AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(qm) AS BIGINT) AS s,
             CAST(SUM(qm * qm) AS BIGINT) AS qq
           FROM monthly GROUP BY 1),
         cls AS (SELECT p.*, n_months,
             n_months * 100 >= m * 132 AS adi_hi,
             (m * qq - s * s) * 100 >= s * s * 49 AS cv2_hi,
             CAST(CAST(n_months AS DOUBLE) / m AS DECIMAL(18,9)) AS adi,
             CAST(CAST(m * qq - s * s AS DOUBLE)
               / CAST(s * s AS DOUBLE) AS DECIMAL(18,9)) AS cv2
           FROM parts p, span),
         lab AS (SELECT *,
             CASE WHEN NOT adi_hi AND NOT cv2_hi THEN 'smooth'
                  WHEN adi_hi AND NOT cv2_hi THEN 'intermittent'
                  WHEN NOT adi_hi AND cv2_hi THEN 'erratic'
                  ELSE 'lumpy' END AS quadrant
           FROM cls),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM parts)
         SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_parts), 6)
             AS share,
           ROUND(CAST(SUM(adi) AS DOUBLE) / COUNT(*), 6) AS avg_adi,
           ROUND(CAST(SUM(cv2) AS DOUBLE) / COUNT(*), 6) AS avg_cv2
         FROM lab, tot GROUP BY quadrant ORDER BY quadrant""",
    // orders_bass_diffusion: exact DECIMAL(38,0) power sums, one
    // identical double Cramer expression per coefficient on both sides
    "orders_bass_diffusion" ->
      """WITH firsts AS (SELECT o_custkey,
           MIN(CAST(o_orderdate AS DATE)) AS fd
           FROM orders GROUP BY 1),
         rng AS (SELECT MIN(fd) AS d0, MAX(fd) AS d1 FROM firsts),
         wk AS (SELECT CAST(FLOOR(date_diff('day', d0, fd) / 7)
               AS BIGINT) AS week,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM firsts, rng GROUP BY 1),
         spine AS (SELECT unnest(generate_series(0,
             CAST(FLOOR(date_diff('day', d0, d1) / 7) AS BIGINT)))
             AS week FROM rng),
         cum AS (SELECT s2.week, COALESCE(SUM(w2.n), 0) AS x
           FROM spine s2 LEFT JOIN wk w2 ON w2.week < s2.week
           GROUP BY 1),
         series AS (SELECT s.week, COALESCE(wk.n, 0) AS n, c.x,
             CAST(c.x AS HUGEINT) AS hx,
             CAST(COALESCE(wk.n, 0) AS HUGEINT) AS hn
           FROM spine s LEFT JOIN wk USING (week)
           JOIN cum c ON c.week = s.week),
         sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(n) AS BIGINT) AS n_adopters,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(hx * hx AS DECIMAL(38,0))) AS sx2,
             SUM(CAST(hx * hx * hx AS DECIMAL(38,0))) AS sx3,
             SUM(CAST(hx * hx * hx * hx AS DECIMAL(38,0))) AS sx4,
             SUM(CAST(n AS DECIMAL(38,0))) AS sy,
             SUM(CAST(hx * hn AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(hx * hx * hn AS DECIMAL(38,0))) AS sx2y
           FROM series),
         dsum AS (SELECT nw, n_adopters,
             CAST(nw AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
             CAST(sx2 AS DOUBLE) AS dsx2, CAST(sx3 AS DOUBLE) AS dsx3,
             CAST(sx4 AS DOUBLE) AS dsx4, CAST(sy AS DOUBLE) AS dsy,
             CAST(sxy AS DOUBLE) AS dsxy,
             CAST(sx2y AS DOUBLE) AS dsx2y
           FROM sums),
         dets AS (SELECT *,
             dn * (dsx2 * dsx4 - dsx3 * dsx3)
               - dsx * (dsx * dsx4 - dsx3 * dsx2)
               + dsx2 * (dsx * dsx3 - dsx2 * dsx2) AS det,
             dsy * (dsx2 * dsx4 - dsx3 * dsx3)
               - dsx * (dsxy * dsx4 - dsx3 * dsx2y)
               + dsx2 * (dsxy * dsx3 - dsx2 * dsx2y) AS det_a,
             dn * (dsxy * dsx4 - dsx3 * dsx2y)
               - dsy * (dsx * dsx4 - dsx3 * dsx2)
               + dsx2 * (dsx * dsx2y - dsxy * dsx2) AS det_b,
             dn * (dsx2 * dsx2y - dsxy * dsx3)
               - dsx * (dsx * dsx2y - dsxy * dsx2)
               + dsy * (dsx * dsx3 - dsx2 * dsx2) AS det_c
           FROM dsum),
         coefs AS (SELECT *,
             CASE WHEN det <> 0 THEN det_a / det END AS a,
             CASE WHEN det <> 0 THEN det_b / det END AS b,
             CASE WHEN det <> 0 THEN det_c / det END AS c
           FROM dets),
         quad AS (SELECT *, b * b - 4.0 * a * c AS disc FROM coefs),
         mrow AS (SELECT *,
             CASE WHEN disc IS NOT NULL AND disc >= 0 AND c <> 0
               THEN (-b - sqrt(disc)) / (2.0 * c) END AS m_hat
           FROM quad),
         prow AS (SELECT *,
             CASE WHEN m_hat IS NOT NULL AND m_hat <> 0
               THEN a / m_hat END AS p
           FROM mrow),
         qrow AS (SELECT *, CASE WHEN p IS NOT NULL THEN b + p END AS q
           FROM prow)
         SELECT nw AS n_weeks, n_adopters,
           ROUND(a, 6) AS coef_a, ROUND(b, 6) AS coef_b,
           ROUND(c, 9) AS coef_c, ROUND(m_hat, 2) AS m_hat,
           ROUND(p, 6) AS p_innovation, ROUND(q, 6) AS q_imitation,
           ROUND(CASE WHEN p IS NOT NULL AND p > 0 AND q > 0
             THEN ln(q / p) / (p + q) END, 2) AS peak_week
         FROM qrow""",
    "orders_croston" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS z
           FROM lineitem GROUP BY 1, 2),
         mi AS (SELECT *, CAST(year(mo) * 12 + month(mo) AS BIGINT)
             AS midx FROM monthly),
         top AS (SELECT l_partkey, COUNT(*) AS m FROM monthly
           GROUP BY 1 ORDER BY m DESC, l_partkey LIMIT 5),
         sq AS (SELECT mi.l_partkey, z, midx,
             CAST(ROW_NUMBER() OVER (PARTITION BY mi.l_partkey
               ORDER BY midx) AS BIGINT) AS t,
             midx - LAG(midx) OVER (PARTITION BY mi.l_partkey
               ORDER BY midx) AS gap
           FROM mi JOIN top USING (l_partkey)),
         zmx AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM sq GROUP BY 1),
         zses AS (SELECT s.l_partkey,
             CAST(SUM(CAST((CASE WHEN t = 1 THEN pow(0.8, n - 1)
               ELSE 0.2 * pow(0.8, n - t) END) * z AS DECIMAL(28,12)))
               AS DOUBLE) AS z_ses,
             MAX(n) AS m
           FROM sq s JOIN zmx USING (l_partkey) GROUP BY 1),
         gp AS (SELECT l_partkey, t - 1 AS t, gap FROM sq
           WHERE gap IS NOT NULL),
         gmx AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM gp GROUP BY 1),
         pses AS (SELECT g.l_partkey,
             CAST(SUM(CAST((CASE WHEN t = 1 THEN pow(0.8, n - 1)
               ELSE 0.2 * pow(0.8, n - t) END) * gap
               AS DECIMAL(28,12))) AS DOUBLE) AS p_ses
           FROM gp g JOIN gmx USING (l_partkey) GROUP BY 1)
         SELECT z.l_partkey, m, ROUND(z_ses / 100.0, 6) AS z_ses,
           ROUND(p_ses, 6) AS p_ses,
           ROUND(z_ses / p_ses / 100.0, 6) AS croston,
           ROUND(z_ses / p_ses / 100.0 * 0.9, 6) AS sba
         FROM zses z JOIN pses USING (l_partkey) ORDER BY z.l_partkey""",
    "agg_gh_means" ->
      """WITH c AS (SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders WHERE o_totalprice > 0)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*) / 100.0, 4) AS mean,
           ROUND(exp(CAST(SUM(CAST(ln(CAST(c AS DOUBLE))
             AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)) / 100.0, 4)
             AS gmean,
           ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / c AS DECIMAL(28,12)))
               AS DOUBLE) / 100.0, 4) AS hmean
         FROM c GROUP BY 1 ORDER BY o_orderpriority""",
    "orders_price_index" ->
      """WITH li AS (SELECT l_partkey, year(l_shipdate) AS yr,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS e,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS q
           FROM lineitem),
         span AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM li),
         pp AS (SELECT l_partkey,
             CASE WHEN yr = y0 THEN 0 ELSE 1 END AS period,
             CAST(SUM(e) AS BIGINT) AS ee, CAST(SUM(q) AS BIGINT) AS qq
           FROM li, span WHERE yr = y0 OR yr = y1
           GROUP BY 1, 2),
         p2 AS (SELECT *, CAST(ee AS DOUBLE) / qq AS p FROM pp),
         bp AS (SELECT b.l_partkey, b.p AS p0, b.qq AS q0,
             c.p AS p1, c.qq AS q1
           FROM p2 b JOIN p2 c ON b.l_partkey = c.l_partkey
           WHERE b.period = 0 AND c.period = 1),
         sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             SUM(CAST(p1 * q0 AS DECIMAL(28,12))) AS l_num,
             SUM(CAST(p0 * q0 AS DECIMAL(28,12))) AS l_den,
             SUM(CAST(p1 * q1 AS DECIMAL(28,12))) AS p_num,
             SUM(CAST(p0 * q1 AS DECIMAL(28,12))) AS p_den
           FROM bp),
         idx AS (SELECT n_parts,
             CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE) AS laspeyres,
             CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS paasche
           FROM sums)
         SELECT y0 AS base_year, y1 AS current_year, n_parts,
           ROUND(laspeyres, 6) AS laspeyres,
           ROUND(paasche, 6) AS paasche,
           ROUND(sqrt(laspeyres * paasche), 6) AS fisher
         FROM idx, span""",
    "orders_hhi" ->
      """WITH cust AS (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         j AS (SELECT n_name, x FROM cust
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(CAST(SUM(x) AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
             / (CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6)
             AS hhi,
           ROUND(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
             / CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE), 4)
             AS effective_n
         FROM j GROUP BY 1 ORDER BY n_name""",
    "window_bollinger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         w AS (SELECT day, c,
             CAST(COUNT(*) OVER win AS BIGINT) AS k,
             SUM(CAST(c AS DECIMAL(38,0))) OVER win AS sx,
             SUM(CAST(c AS DECIMAL(38,0)) * c) OVER win AS sxx
           FROM daily WINDOW win AS (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         f AS (SELECT * FROM w WHERE k = 7),
         g AS (SELECT day, c, CAST(sx AS DOUBLE) / k AS m,
             sqrt(CAST(sxx * k - sx * sx AS DOUBLE)
               / (CAST(k AS DOUBLE) * CAST(k - 1 AS DOUBLE))) AS sd
           FROM f)
         SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(m / 100.0, 4) AS mean7, ROUND(sd / 100.0, 4) AS sd7,
           ROUND((m + sd * 2.0) / 100.0, 4) AS upper,
           ROUND((m - sd * 2.0) / 100.0, 4) AS lower,
           (c > m + sd * 2.0 OR c < m - sd * 2.0) AS breakout
         FROM g ORDER BY day""",
    "orders_safety_stock" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qm
           FROM lineitem GROUP BY 1, 2),
         span AS (SELECT CAST(date_diff('month',
             date_trunc('month', MIN(l_shipdate)),
             date_trunc('month', MAX(l_shipdate))) + 1 AS BIGINT)
             AS n_months FROM lineitem),
         parts AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(qm) AS BIGINT) AS s,
             CAST(SUM(qm * qm) AS BIGINT) AS qq
           FROM monthly GROUP BY 1),
         pq AS (SELECT l_partkey,
             CASE WHEN NOT (n_months * 100 >= m * 132)
                   AND NOT ((m * qq - s * s) * 100 >= s * s * 49)
                 THEN 'smooth'
               WHEN n_months * 100 >= m * 132
                   AND NOT ((m * qq - s * s) * 100 >= s * s * 49)
                 THEN 'intermittent'
               WHEN NOT (n_months * 100 >= m * 132)
                 THEN 'erratic'
               ELSE 'lumpy' END AS quadrant
           FROM parts, span),
         wq AS (SELECT quadrant, qm, monthly.l_partkey
           FROM monthly JOIN pq USING (l_partkey)),
         hist AS (SELECT quadrant, qm, CAST(COUNT(*) AS BIGINT) AS n
           FROM wq GROUP BY 1, 2),
         ch AS (SELECT quadrant, qm, SUM(n) OVER (PARTITION BY quadrant
             ORDER BY qm ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT quadrant,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(*) AS BIGINT) AS n_months,
             CAST(SUM(qm) AS BIGINT) AS sq
           FROM wq GROUP BY 1),
         q50 AS (SELECT ch.quadrant, MIN(qm) AS q50
           FROM ch JOIN tot USING (quadrant)
           WHERE cum * 100 >= n_months * 50 GROUP BY 1),
         q95 AS (SELECT ch.quadrant, MIN(qm) AS q95
           FROM ch JOIN tot USING (quadrant)
           WHERE cum * 100 >= n_months * 95 GROUP BY 1)
         SELECT t.quadrant, n_parts, n_months,
           ROUND(CAST(sq AS DOUBLE) / n_months / 100.0, 4) AS mean_qty,
           ROUND(CAST(q50 AS DOUBLE) / 100.0, 2) AS q50_qty,
           ROUND(CAST(q95 AS DOUBLE) / 100.0, 2) AS q95_qty,
           ROUND(CAST(q95 AS DOUBLE) / 100.0
             - CAST(sq AS DOUBLE) / n_months / 100.0, 4) AS safety_stock
         FROM tot t JOIN q50 USING (quadrant) JOIN q95 USING (quadrant)
         ORDER BY t.quadrant""",
    "agg_skew_kurtosis" ->
      """WITH c AS (SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
         mu AS (SELECT o_orderpriority,
             CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu
           FROM c GROUP BY 1),
         d AS (SELECT c.o_orderpriority,
             (CAST(c AS DOUBLE) - mu) / 100.0 AS d
           FROM c JOIN mu ON c.o_orderpriority = mu.o_orderpriority),
         s AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(d * d AS DECIMAL(38,6))) AS s2,
             SUM(CAST(d * d * d AS DECIMAL(38,6))) AS s3,
             SUM(CAST(d * d * d * d AS DECIMAL(38,6))) AS s4
           FROM d GROUP BY 1),
         m AS (SELECT o_orderpriority, n,
             CAST(s2 AS DOUBLE) / n AS m2, CAST(s3 AS DOUBLE) / n AS m3,
             CAST(s4 AS DOUBLE) / n AS m4
           FROM s)
         SELECT o_orderpriority, n,
           ROUND(sqrt(m2), 4) AS stddev,
           ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
         FROM m ORDER BY o_orderpriority""",
    "window_rsi" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         chg AS (SELECT day, c,
             LAG(c) OVER (ORDER BY day) AS prev FROM daily),
         gl AS (SELECT day, c,
             GREATEST(c - prev, 0) AS gain,
             GREATEST(prev - c, 0) AS loss
           FROM chg WHERE prev IS NOT NULL),
         w AS (SELECT day, c,
             CAST(COUNT(*) OVER win AS BIGINT) AS k,
             CAST(SUM(gain) OVER win AS BIGINT) AS sg,
             CAST(SUM(loss) OVER win AS BIGINT) AS sl
           FROM gl WINDOW win AS (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(sg AS DOUBLE) / 14 / 100.0, 4) AS avg_gain,
           ROUND(CAST(sl AS DOUBLE) / 14 / 100.0, 4) AS avg_loss,
           ROUND(CASE WHEN sg + sl > 0 THEN
             100.0 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE) END,
             4) AS rsi
         FROM w WHERE k = 14 ORDER BY day""",
    "orders_lorenz_curve" ->
      """WITH cust AS (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         hist AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(x * COUNT(*) AS BIGINT) AS ev
           FROM cust GROUP BY 1),
         ch AS (SELECT x, n, ev,
             SUM(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_u,
             SUM(ev) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_e
           FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS u_tot,
             CAST(SUM(x) AS BIGINT) AS e_tot FROM cust),
         ks AS (SELECT CAST(k AS INT) AS k FROM range(1, 11) t(k)),
         cut AS (SELECT ch.*, k, (k * u_tot) // 10 AS cut, e_tot
           FROM ch, tot, ks
           WHERE cum_u - n < (k * u_tot) // 10
             AND cum_u >= (k * u_tot) // 10),
         pts AS (SELECT k, cut AS n_customers,
             cum_e - ev + (cut - (cum_u - n)) * x AS rev_cents, e_tot
           FROM cut)
         SELECT k, n_customers,
           ROUND(CAST(rev_cents AS DOUBLE) / 100.0, 2) AS cum_revenue,
           ROUND(CAST(rev_cents AS DOUBLE) / e_tot, 6) AS cum_share,
           ROUND(CAST(k AS DOUBLE) / 10.0
             - CAST(rev_cents AS DOUBLE) / e_tot, 6) AS equality_gap
         FROM pts ORDER BY k""",
    "orders_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM daily
           GROUP BY 1),
         ch AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
         med AS (SELECT MIN(c) AS median FROM ch, tot
           WHERE cum * 2 >= nd),
         signs AS (SELECT day, c > median AS above,
             LAG(c > median) OVER (ORDER BY day) AS prev
           FROM daily, med WHERE c <> median),
         runs AS (SELECT
             CAST(SUM(CASE WHEN prev IS NULL OR prev <> above
               THEN 1 ELSE 0 END) AS BIGINT) AS r,
             CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
               AS n2
           FROM signs),
         st AS (SELECT *, n1 + n2 AS n,
             2.0 * n1 * n2 / (n1 + n2) + 1.0 AS mu,
             2.0 * n1 * n2 * CAST(n1 * n2 * 2 - (n1 + n2) AS DOUBLE)
               / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                 * (n1 + n2 - 1)) AS var
           FROM runs)
         SELECT n1, n2, r AS runs, ROUND(mu, 4) AS expected_runs,
           ROUND((r - mu) / sqrt(var), 6) AS z
         FROM st""",
    "orders_seasonal_index" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         pm AS (SELECT month(day) AS m, CAST(COUNT(*) AS BIGINT)
             AS n_days, CAST(SUM(c) AS BIGINT) AS rev
           FROM daily GROUP BY 1),
         ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd_all,
             CAST(SUM(c) AS BIGINT) AS rev_all FROM daily)
         SELECT m AS month, n_days,
           ROUND(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / n_days / 100.0, 4) AS mean_daily,
           ROUND((CAST(rev AS DOUBLE) / n_days)
             / (CAST(rev_all AS DOUBLE) / nd_all), 6) AS seasonal_index
         FROM pm, ov ORDER BY month""",
  )
}
