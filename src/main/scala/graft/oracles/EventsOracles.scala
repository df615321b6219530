package graft.oracles

/** Event-analytics rows over the events table.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object EventsOracles {
  private[graft] val sql: Map[String, String] = Map(
    "events_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                    WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
               JOIN v ON e.user_id = v.user_id
                 AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 3 DAY
               WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
               JOIN c ON e.user_id = c.user_id
                 AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 3 DAY
               WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase""",
    "events_retention" ->
      """WITH first AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
                        FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
         SELECT strftime(d0, '%Y-%m-%d') AS cohort,
                CAST(d - d0 AS BIGINT) AS day_offset,
                CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
         FROM act JOIN first USING (user_id)
         WHERE d - d0 BETWEEN 0 AND 7
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_cusum" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, h, n,
             COUNT(*) OVER (PARTITION BY event_type) AS t_hours,
             SUM(n) OVER (PARTITION BY event_type) AS s_tot,
             SUM(n) OVER (PARTITION BY event_type ORDER BY h) AS cum_n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS idx
           FROM hourly),
         sc AS (SELECT *,
             t_hours * cum_n - idx * s_tot AS cusum_sc FROM c),
         mx AS (SELECT *,
             MAX(abs(cusum_sc)) OVER (PARTITION BY event_type) AS maxabs
           FROM sc)
         SELECT event_type, CAST(MAX(t_hours) AS BIGINT) AS n_hours,
           CAST(MAX(s_tot) AS BIGINT) AS total_events,
           strftime(MIN(h), '%Y-%m-%d %H:%M:%S') AS changepoint_hour,
           ROUND(CAST(MAX(maxabs) AS DOUBLE) / MAX(t_hours), 4)
             AS max_abs_cusum
         FROM mx WHERE abs(cusum_sc) = maxabs
         GROUP BY event_type ORDER BY event_type""",
    "events_paths" ->
      """WITH s AS (SELECT event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e3
           FROM events),
         counts AS (SELECT event_type || '>' || e2 || '>' || e3 AS path,
             COUNT(*) AS n
           FROM s WHERE e3 IS NOT NULL GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts),
         rk AS (SELECT path, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk
           FROM counts)
         SELECT path, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / (SELECT tot FROM tot), 6) AS share
         FROM rk WHERE rk <= 15 ORDER BY n DESC, path""",
    "events_power_pareto" ->
      """WITH per_user AS (SELECT user_id, COUNT(*) AS v
           FROM events GROUP BY 1),
         hist AS (SELECT v, COUNT(*) AS n_users, v * COUNT(*) AS ev
           FROM per_user GROUP BY 1),
         cum AS (SELECT *,
             SUM(n_users) OVER (ORDER BY v DESC) AS cum_u,
             SUM(ev) OVER (ORDER BY v DESC) AS cum_e
           FROM hist),
         tt AS (SELECT COUNT(*) AS u_tot, CAST(SUM(v) AS BIGINT) AS e_tot
           FROM per_user),
         p AS (SELECT unnest([CAST(1 AS BIGINT), 5, 10, 25]) AS pct),
         j AS (SELECT cum.*, tt.e_tot, p.pct,
             (p.pct * tt.u_tot + 99) // 100 AS k
           FROM cum, tt, p)
         SELECT pct, CAST(k AS BIGINT) AS n_top_users,
           CAST(cum_e - ev + (k - (cum_u - n_users)) * v AS BIGINT)
             AS n_events,
           ROUND(CAST(cum_e - ev + (k - (cum_u - n_users)) * v AS DOUBLE)
             / e_tot, 6) AS share
         FROM j WHERE cum_u - n_users < k AND cum_u >= k
         ORDER BY pct""",
    "events_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         isl AS (SELECT user_id,
             date_diff('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
           FROM days),
         runs AS (SELECT user_id, grp, COUNT(*) AS len
           FROM isl GROUP BY 1, 2),
         mx AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
           FROM runs GROUP BY 1)
         SELECT max_streak, COUNT(*) AS n_users
         FROM mx GROUP BY 1 ORDER BY max_streak""",
    "events_interarrival" ->
      """WITH g AS (SELECT event_type,
             date_diff('second', LAG(ts, 1) OVER (PARTITION BY user_id,
               event_type ORDER BY ts, event_id), ts) AS gap_s
           FROM events),
         hist AS (SELECT event_type, gap_s, COUNT(*) AS cnt
           FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
         c AS (SELECT event_type, gap_s, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_s)
               AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot,
             SUM(gap_s * cnt) OVER (PARTITION BY event_type) AS wsum
           FROM hist)
         SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_gaps,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_gap_s,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END)
             AS BIGINT) AS p50_gap_s,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN gap_s END)
             AS BIGINT) AS p90_gap_s
         FROM c GROUP BY event_type ORDER BY event_type""",
    "events_forecast_compare" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         f AS (SELECT event_type, n,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY d) AS p1,
             LAG(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS p7
           FROM daily),
         s AS (SELECT event_type, n, p1, p7 FROM f
           WHERE p1 IS NOT NULL AND p7 IS NOT NULL)
         SELECT event_type, COUNT(*) AS n_days,
           ROUND(CAST(SUM(abs(n - p1)) AS DOUBLE) / COUNT(*), 4)
             AS mae_naive,
           ROUND(CAST(SUM(abs(n - p7)) AS DOUBLE) / COUNT(*), 4)
             AS mae_seasonal,
           CASE WHEN SUM(abs(n - p7)) < SUM(abs(n - p1)) THEN 'seasonal'
                WHEN SUM(abs(n - p1)) < SUM(abs(n - p7)) THEN 'naive'
                ELSE 'tie' END AS winner
         FROM s GROUP BY event_type ORDER BY event_type""",
    "events_uplift_did" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, value
           FROM events),
         mid AS (SELECT (MIN(tsu) + MAX(tsu)) // 2 AS mid FROM ev),
         t AS (SELECT CASE WHEN user_id % 2 = 1 THEN 'treat'
                  ELSE 'control' END AS grp,
             CAST(tsu > mid AS BIGINT) AS post, value
           FROM ev, mid)
         SELECT grp,
           CAST(SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pre,
           CAST(SUM(post) AS BIGINT) AS n_post,
           ROUND(CAST(SUM(CASE WHEN post = 0
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END), 6) AS mean_pre,
           ROUND(CAST(SUM(CASE WHEN post = 1
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
             / SUM(post), 6) AS mean_post,
           ROUND(CAST(SUM(CASE WHEN post = 1
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
               / SUM(post)
             - CAST(SUM(CASE WHEN post = 0
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
               / SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END), 6) AS diff
         FROM t GROUP BY grp ORDER BY grp""",
    "events_transition_entropy" ->
      """WITH s AS (SELECT event_type AS from_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         tr AS (SELECT from_type, to_type, COUNT(*) AS n FROM s
           WHERE to_type IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM tr)
         SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total,
           COUNT(*) AS n_successors,
           ROUND(ln(CAST(SUM(n) AS DOUBLE))
             - CAST(SUM(CAST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                 AS DECIMAL(28,12))) AS DOUBLE) / SUM(n), 6) AS entropy,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(t), 6) AS share
         FROM tr, tot GROUP BY from_type ORDER BY from_type""",
    "events_funnel_latency" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
           JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.vt
             AND e.ts <= v.vt + INTERVAL 3 DAY
           GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
           JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.ct
             AND e.ts <= c.ct + INTERVAL 3 DAY
           GROUP BY 1),
         hops AS (
           SELECT '1_view_click' AS hop,
             date_diff('second', v.vt, c.ct) AS gap_s
           FROM c JOIN v ON c.user_id = v.user_id
           UNION ALL
           SELECT '2_click_purchase',
             date_diff('second', c.ct, p.pt)
           FROM p JOIN c ON p.user_id = c.user_id),
         hist AS (SELECT hop, gap_s, COUNT(*) AS cnt
           FROM hops GROUP BY 1, 2),
         cd AS (SELECT hop, gap_s, cnt,
             SUM(cnt) OVER (PARTITION BY hop ORDER BY gap_s) AS cum,
             SUM(cnt) OVER (PARTITION BY hop) AS tot,
             SUM(gap_s * cnt) OVER (PARTITION BY hop) AS wsum
           FROM hist)
         SELECT hop, CAST(MAX(tot) AS BIGINT) AS n_conversions,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_gap_s,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END)
             AS BIGINT) AS p50_gap_s,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN gap_s END)
             AS BIGINT) AS p90_gap_s
         FROM cd GROUP BY hop ORDER BY hop""",
    "events_gini" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS v FROM events
           GROUP BY 1),
         hist AS (SELECT v, COUNT(*) AS c FROM pu GROUP BY 1),
         r AS (SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS r0
           FROM hist)
         SELECT CAST(SUM(c) AS BIGINT) AS n_users,
           CAST(SUM(v * c) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(v * (2 * c * r0 + c * (c + 1))) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(v * c) AS DOUBLE))
             - CAST(SUM(c) + 1 AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS gini
         FROM r""",
    "events_bot_detection" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_err,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM pu),
         f AS (SELECT CAST(n > days * 3 AS BIGINT) AS high_rate,
             CAST(n_err * 3 >= n AS BIGINT) AS error_heavy,
             CAST(n >= 80 AS BIGINT) AS high_volume, n
           FROM pu)
         SELECT high_rate, error_heavy, high_volume,
           COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(t), 6) AS event_share
         FROM f, tot GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "events_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         daily AS (SELECT date_trunc('week', d) AS week,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dau) AS BIGINT) AS sum_dau FROM
           (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1)
           GROUP BY 1),
         weekly AS (SELECT week, COUNT(*) AS wau FROM
           (SELECT DISTINCT date_trunc('week', d) AS week, user_id
            FROM ud) GROUP BY 1)
         SELECT strftime(daily.week, '%Y-%m-%d') AS week,
           n_days, wau,
           ROUND(CAST(sum_dau AS DOUBLE) / n_days, 2) AS avg_dau,
           ROUND(CAST(sum_dau AS DOUBLE) / (n_days * wau), 6)
             AS stickiness
         FROM daily JOIN weekly ON daily.week = weekly.week
         ORDER BY week""",
    "events_reach_curve" ->
      """WITH fd AS (SELECT user_id, event_type, MIN(CAST(ts AS DATE))
             AS d
           FROM events GROUP BY 1, 2),
         daily AS (SELECT event_type, d, COUNT(*) AS n_new
           FROM fd GROUP BY 1, 2),
         tot AS (SELECT event_type, COUNT(*) AS t FROM fd GROUP BY 1)
         SELECT daily.event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (PARTITION BY daily.event_type
             ORDER BY d) AS BIGINT) AS cum_users,
           ROUND(CAST(SUM(n_new) OVER (PARTITION BY daily.event_type
             ORDER BY d) AS DOUBLE) / tot.t, 6) AS reach_share
         FROM daily JOIN tot ON daily.event_type = tot.event_type
         ORDER BY daily.event_type, day""",
    "events_type_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         sizes AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
           ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
             AS jaccard
         FROM pairs
         JOIN sizes sa ON type_a = sa.event_type
         JOIN sizes sb ON type_b = sb.event_type
         ORDER BY type_a, type_b""",
    "events_heatmap" ->
      """WITH cells AS (SELECT isodow(ts) AS isodow,
             CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells)
         SELECT CAST(isodow AS BIGINT) AS isodow, hr,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS share
         FROM cells ORDER BY isodow, hr""",
    "events_new_returning" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         fd AS (SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY 1)
         SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN d <> d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           ROUND(CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS new_share
         FROM ev JOIN fd USING (user_id)
         GROUP BY d ORDER BY day""",
    "events_session_value" ->
      """WITH s AS (SELECT user_id, ts, event_id, value,
             CASE WHEN lag_ts IS NULL
                       OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM (SELECT user_id, ts, event_id, value,
                   LAG(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS lag_ts
                 FROM events) a),
         sess AS (SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid,
             value
           FROM s),
         sv AS (SELECT user_id, sid,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_c
           FROM sess GROUP BY 1, 2),
         tt AS (SELECT COUNT(*) AS ns, CAST(SUM(value_c) AS BIGINT)
             AS vc FROM sv),
         hist AS (SELECT value_c // 100 AS value_d, COUNT(*) AS cnt
           FROM sv GROUP BY 1),
         cd AS (SELECT value_d, cnt,
             SUM(cnt) OVER (ORDER BY value_d) AS cum FROM hist)
         SELECT MAX(tt.ns) AS n_sessions,
           ROUND(CAST(MAX(tt.vc) AS DOUBLE) / (MAX(tt.ns) * 100), 2)
             AS mean_value,
           CAST(MIN(CASE WHEN cum >= (tt.ns + 1) // 2 THEN value_d END)
             AS BIGINT) AS p50_value_d,
           CAST(MIN(CASE WHEN cum * 10 >= tt.ns * 9 THEN value_d END)
             AS BIGINT) AS p90_value_d
         FROM cd, tt""",
    "events_value_dist" ->
      """WITH hist AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v_c, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         cd AS (SELECT event_type, v_c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot,
             SUM(v_c * cnt) OVER (PARTITION BY event_type) AS wsum
           FROM hist)
         SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_events,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / (MAX(tot) * 100), 4)
             AS mean_value,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 1) // 2
             THEN v_c END) AS DOUBLE) / 100, 2) AS p50_value,
           ROUND(CAST(MIN(CASE WHEN cum * 10 >= tot * 9
             THEN v_c END) AS DOUBLE) / 100, 2) AS p90_value,
           ROUND(CAST(MIN(CASE WHEN cum * 100 >= tot * 99
             THEN v_c END) AS DOUBLE) / 100, 2) AS p99_value
         FROM cd GROUP BY event_type ORDER BY event_type""",
    "events_conversion_by_activity" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS n,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
           FROM events GROUP BY 1)
         SELECT CASE WHEN n < 8 THEN 'a_lt8' WHEN n < 16 THEN 'b_8_15'
             WHEN n < 32 THEN 'c_16_31' WHEN n < 64 THEN 'd_32_63'
             ELSE 'e_64plus' END AS band,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
         FROM pu GROUP BY 1 ORDER BY band""",
    "events_attribution_touch" ->
      """WITH t AS (SELECT event_type,
             COALESCE(first_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'none') AS ft,
             COALESCE(last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'none') AS lt
           FROM events),
         p AS (SELECT ft, lt FROM t WHERE event_type = 'purchase'),
         f AS (SELECT ft AS channel, COUNT(*) AS fc FROM p GROUP BY 1),
         l AS (SELECT lt AS channel, COUNT(*) AS lc FROM p GROUP BY 1)
         SELECT COALESCE(f.channel, l.channel) AS channel,
           CAST(COALESCE(f.fc, 0) AS BIGINT) AS first_touch_credits,
           CAST(COALESCE(l.lc, 0) AS BIGINT) AS last_touch_credits
         FROM f FULL OUTER JOIN l ON f.channel = l.channel
         ORDER BY channel""",
    "events_wow_growth" ->
      """WITH weekly AS (SELECT event_type,
             date_trunc('week', ts) AS wk, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, wk, n,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY wk)
               AS prev
           FROM weekly)
         SELECT event_type, strftime(wk, '%Y-%m-%d') AS week,
           CAST(n AS BIGINT) AS n,
           CASE WHEN prev IS NOT NULL THEN
             ROUND(CAST(n - prev AS DOUBLE) / prev, 6) END AS wow_growth
         FROM g ORDER BY event_type, week""",
    "events_survival_km" ->
      """WITH w AS (SELECT MIN(ts) + INTERVAL 7 DAY AS wend FROM events),
         users AS (SELECT user_id,
             CAST(MIN(ts) AS DATE) AS f0,
             CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS DATE) AS p0,
             CAST(MAX(wend) AS DATE) AS wd
           FROM events, w WHERE ts < wend GROUP BY 1),
         obs AS (SELECT user_id,
             CAST(CASE WHEN p0 IS NOT NULL THEN date_diff('day', f0, p0)
                  ELSE date_diff('day', f0, wd) END AS BIGINT) AS t,
             (p0 IS NOT NULL) AS ev
           FROM users),
         hist AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM obs GROUP BY 1),
         risk AS (SELECT t, n_obs, d,
             SUM(n_obs) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_at_risk
           FROM hist),
         km AS (SELECT t, n_obs, d, n_at_risk,
             1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS factor
           FROM risk WHERE d > 0)
         SELECT t AS t_day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           d AS n_deaths, n_obs - d AS n_censored_here,
           ROUND(factor, 6) AS factor,
           CASE WHEN MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) = 1 THEN 0.0
             ELSE ROUND(exp(SUM(ln(factor)) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           END AS survival
         FROM km ORDER BY t_day""",
    "events_segment_migration" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         w1 AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n1
           FROM events, t0 WHERE ts < t0 + INTERVAL 7 DAY GROUP BY 1),
         w2 AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n2
           FROM events, t0
           WHERE ts >= t0 + INTERVAL 7 DAY AND ts < t0 + INTERVAL 14 DAY
           GROUP BY 1),
         aligned AS (SELECT
             CASE WHEN n1 IS NULL THEN 'absent'
                  WHEN n1 >= 18 THEN 'high'
                  WHEN n1 >= 14 THEN 'mid' ELSE 'low' END AS seg_w1,
             CASE WHEN n2 IS NULL THEN 'absent'
                  WHEN n2 >= 18 THEN 'high'
                  WHEN n2 >= 14 THEN 'mid' ELSE 'low' END AS seg_w2
           FROM w1 FULL OUTER JOIN w2 USING (user_id)),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM aligned)
         SELECT seg_w1, seg_w2, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE)
             / (SELECT CAST(n_total AS DOUBLE) FROM tot), 6) AS share
         FROM aligned GROUP BY 1, 2 ORDER BY seg_w1, seg_w2""",
    "events_funnel_sweep" -> {
      val blocks = Seq(("06h", "6 HOUR"), ("1d", "1 DAY"), ("3d", "3 DAY"))
        .map { case (lbl, iv) =>
          s"""SELECT '$lbl' AS win,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c_$lbl) AS n_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p_$lbl) AS n_purchase"""
        }.mkString("\n           UNION ALL ")
      val ctes = Seq(("06h", "6 HOUR"), ("1d", "1 DAY"), ("3d", "3 DAY"))
        .map { case (lbl, iv) =>
          s""",
         c_$lbl AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
               JOIN v ON e.user_id = v.user_id
                 AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL $iv
               WHERE e.event_type = 'click' GROUP BY 1),
         p_$lbl AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
               JOIN c_$lbl c ON e.user_id = c.user_id
                 AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL $iv
               WHERE e.event_type = 'purchase' GROUP BY 1)"""
        }.mkString
      s"""WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                    WHERE event_type = 'view' GROUP BY 1)$ctes
         SELECT win, n_view, n_click, n_purchase,
           ROUND(CASE WHEN n_view > 0 THEN CAST(n_click AS DOUBLE)
             / CAST(n_view AS DOUBLE) END, 6) AS click_rate,
           ROUND(CASE WHEN n_click > 0 THEN CAST(n_purchase AS DOUBLE)
             / CAST(n_click AS DOUBLE) END, 6) AS purchase_rate
         FROM ($blocks) u ORDER BY win"""
    },
    "events_markov_eval" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         tr AS (SELECT user_id, ts, event_id, event_type FROM events, t0
                WHERE ts < t0 + INTERVAL 15 DAY),
         te AS (SELECT user_id, ts, event_id, event_type FROM events, t0
                WHERE ts >= t0 + INTERVAL 15 DAY),
         trp AS (SELECT from_type, to_type FROM (
             SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
             FROM tr) z WHERE to_type IS NOT NULL),
         model AS (SELECT from_type, to_type AS predicted FROM (
             SELECT from_type, to_type,
               ROW_NUMBER() OVER (PARTITION BY from_type
                 ORDER BY COUNT(*) DESC, to_type) AS rn
             FROM trp GROUP BY 1, 2) z WHERE rn = 1),
         tep AS (SELECT from_type, to_type FROM (
             SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
             FROM te) z WHERE to_type IS NOT NULL)
         SELECT tep.from_type, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS accuracy
         FROM tep LEFT JOIN model USING (from_type)
         GROUP BY 1, 2 ORDER BY from_type""",
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events
           UNION ALL
           SELECT DISTINCT '0_all' AS event_type, user_id FROM events),
         g AS (SELECT event_type,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b
           FROM u GROUP BY 1)
         SELECT event_type, n_a, n_b,
           ROUND(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
           CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) > 3.841459 AS srm_flag
         FROM g ORDER BY event_type""",
    "events_retention_fit" ->
      """WITH first AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
           FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         offs AS (SELECT CAST(d - d0 AS BIGINT) AS t
           FROM act JOIN first USING (user_id)
           WHERE d - d0 BETWEEN 0 AND 7),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM offs
           WHERE t = 0),
         curve AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) AS DOUBLE) / CAST(n0 AS DOUBLE) AS r,
             CAST(t AS DOUBLE) AS x,
             ln(CAST(COUNT(*) AS DOUBLE) / CAST(n0 AS DOUBLE)) AS y
           FROM offs, tot WHERE t >= 1 GROUP BY t, n0),
         fit0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
           FROM curve),
         fit AS (SELECT
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, sx, sy, n
           FROM fit0),
         fit2 AS (SELECT b, (sy - b * sx) / n AS a FROM fit)
         SELECT t, n_active, ROUND(r, 6) AS retention,
           ROUND(exp(a + b * x), 6) AS fitted,
           ROUND(b, 6) AS slope,
           ROUND(-ln(2.0) / b, 4) AS half_life_days
         FROM curve, fit2 ORDER BY t""",
    "events_dispersion" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ssq
           FROM daily GROUP BY 1),
         z AS (SELECT event_type, n_days, s,
             CAST(s AS DOUBLE) / n_days AS mean,
             CAST(n_days * ssq - s * s AS DOUBLE)
               / CAST(n_days * (n_days - 1) AS DOUBLE) AS variance
           FROM g)
         SELECT event_type, n_days, s AS n_events,
           ROUND(mean, 4) AS mean_daily,
           ROUND(variance, 4) AS var_daily,
           ROUND(variance / mean, 4) AS vmr,
           variance / mean > 1.5 AS overdispersed
         FROM z ORDER BY event_type""",
    "events_ab_cuped" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         x AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
           FROM events, t0 WHERE event_type = 'purchase'
             AND ts < t0 + INTERVAL 7 DAY GROUP BY 1),
         y AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS y
           FROM events, t0 WHERE event_type = 'purchase'
             AND ts >= t0 + INTERVAL 7 DAY
             AND ts < t0 + INTERVAL 14 DAY GROUP BY 1),
         u AS (SELECT DISTINCT user_id FROM events),
         users AS (SELECT u.user_id, COALESCE(x, 0) AS x,
             COALESCE(y, 0) AS y,
             CASE WHEN u.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
           FROM u LEFT JOIN x USING (user_id) LEFT JOIN y USING (user_id)),
         fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
           FROM users),
         th AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
           FROM fit),
         adj AS (SELECT arm, y,
             CAST(y AS DOUBLE) - theta * (CAST(x AS DOUBLE) - mx) AS ya,
             theta
           FROM users, th),
         g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(CAST(ya AS DECIMAL(28,12))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(ya * ya AS DECIMAL(28,12))) AS DOUBLE) AS saa,
             MAX(theta) AS theta
           FROM adj GROUP BY 1),
         z AS (SELECT *,
             CAST(n * syy - sy * sy AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) AS var_y,
             (CAST(n AS DOUBLE) * saa - sa * sa)
               / CAST(n * (n - 1) AS DOUBLE) AS var_ya
           FROM g)
         SELECT arm, n AS n_users,
           ROUND(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
           ROUND(sa / n, 6) AS mean_y_adj,
           ROUND(var_y, 6) AS var_y,
           ROUND(var_ya, 6) AS var_y_adj,
           ROUND(1 - var_ya / var_y, 6) AS var_reduction,
           ROUND(theta, 6) AS theta
         FROM z ORDER BY arm""",
    "events_user_similarity" ->
      """WITH c AS (SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         v AS (SELECT user_id, event_type AS dom FROM (
             SELECT user_id, event_type, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
             FROM c) z WHERE rn = 1),
         s AS (SELECT user_id, CAST(SUM(n * n) AS BIGINT) AS nsq
           FROM c GROUP BY 1),
         w AS (SELECT c.user_id, dom, event_type, n, nsq
           FROM c JOIN v USING (user_id) JOIN s USING (user_id)),
         p AS (SELECT a.dom, a.user_id AS u1, b.user_id AS u2,
             a.nsq AS s1, b.nsq AS s2,
             CAST(SUM(a.n * b.n) AS BIGINT) AS dot
           FROM w a JOIN w b ON a.dom = b.dom
             AND a.event_type = b.event_type AND a.user_id < b.user_id
           GROUP BY 1, 2, 3, 4, 5)
         SELECT u1, u2, dom AS shared_block,
           ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(s1 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE))), 6)
             AS cos
         FROM p
         ORDER BY CAST(dot AS DOUBLE)
           / (sqrt(CAST(s1 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE))) DESC,
           u1, u2
         LIMIT 20""",
    "events_attribution_markov" -> {
      val rounds = (1 to 8).map { i =>
        s""",
         v$i AS (SELECT pr.config, pr.t AS state,
             CAST(SUM(CAST(v${i - 1}.m * pr.p AS DECIMAL(28,12)))
               AS DOUBLE) AS m
           FROM v${i - 1} JOIN pr ON v${i - 1}.config = pr.config
             AND v${i - 1}.state = pr.f
           GROUP BY 1, 2)"""
      }.mkString
      s"""WITH fc AS (SELECT user_id, ts, event_id FROM (
             SELECT user_id, ts, event_id, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM events WHERE event_type = 'purchase') z WHERE rn = 1),
         j AS (SELECT e.user_id, e.ts, e.event_id,
             CASE WHEN e.event_type = 'purchase' THEN 'conv'
                  ELSE e.event_type END AS state
           FROM events e LEFT JOIN fc ON e.user_id = fc.user_id
           WHERE fc.user_id IS NULL
             OR (e.ts, e.event_id) <= (fc.ts, fc.event_id)),
         st AS (SELECT user_id, state,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             LEAD(state) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
           FROM j),
         tr AS (SELECT 'start' AS f, state AS t FROM st WHERE rn = 1
           UNION ALL SELECT state, nxt FROM st
             WHERE nxt IS NOT NULL AND state <> 'conv'
           UNION ALL SELECT state, 'end' FROM st
             WHERE nxt IS NULL AND state <> 'conv'),
         tc AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
           FROM tr GROUP BY 1, 2),
         cfg AS (SELECT unnest(
             ['full', 'view', 'click', 'signup', 'error']) AS config),
         ct AS (SELECT config, f,
             CASE WHEN t = config THEN 'end' ELSE t END AS t2,
             CAST(SUM(n) AS BIGINT) AS n
           FROM tc CROSS JOIN cfg WHERE f <> config GROUP BY 1, 2, 3),
         pr AS (SELECT config, f, t2 AS t,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
               PARTITION BY config, f) AS DOUBLE) AS p
           FROM ct
           UNION ALL SELECT config, 'conv', 'conv', 1.0 FROM cfg
           UNION ALL SELECT config, 'end', 'end', 1.0 FROM cfg),
         v0 AS (SELECT config, 'start' AS state, 1.0 AS m FROM cfg)$rounds,
         pc AS (SELECT config, m AS p_conv FROM v8 WHERE state = 'conv'),
         fl AS (SELECT p_conv AS p_full FROM pc WHERE config = 'full')
         SELECT config AS channel, ROUND(p_full, 6) AS p_full,
           ROUND(p_conv, 6) AS p_removed,
           ROUND((p_full - p_conv) / p_full, 6) AS removal_effect
         FROM pc, fl WHERE config <> 'full' ORDER BY channel"""
    },
    "events_markov_stationary" ->
      """WITH nx AS (SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         tr AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2),
         trs AS (SELECT from_type, to_type, n,
             SUM(n) OVER (PARTITION BY from_type) AS rs FROM tr),
         emp AS (SELECT event_type,
             CAST((COUNT(*) * 1000000)
               // (SELECT COUNT(*) FROM events) AS BIGINT) AS pi
           FROM events GROUP BY 1),
         p1 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM emp e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p2 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p1 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p3 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p2 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p4 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p3 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1)
         SELECT e.event_type, e.pi AS empirical_micro,
           p4.pi AS stationary_micro,
           abs(e.pi - p4.pi) AS drift_micro
         FROM emp e JOIN p4 ON e.event_type = p4.event_type
         ORDER BY e.event_type""",
    "events_forecast_naive" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         f AS (SELECT *, LAG(n, 7) OVER (PARTITION BY event_type
             ORDER BY d) AS fc FROM daily),
         s AS (SELECT event_type, n, fc,
             CAST(CAST(abs(n - fc) AS DOUBLE) / n AS DECIMAL(28,8))
               AS ape,
             CAST(n - fc AS BIGINT) AS err
           FROM f WHERE fc IS NOT NULL)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 4) AS mape,
           CAST(SUM(err) AS BIGINT) AS total_bias,
           CAST(MAX(abs(err)) AS BIGINT) AS worst_abs_err
         FROM s GROUP BY 1 ORDER BY event_type""",
    "events_concurrency" ->
      """WITH lagd AS (SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS lag_ts
           FROM events),
         flags AS (SELECT user_id, ts,
             CASE WHEN lag_ts IS NULL
                       OR epoch_us(ts) - epoch_us(lag_ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session, event_id
           FROM lagd),
         sids AS (SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM flags),
         sess AS (SELECT user_id, sid, MIN(ts) AS s,
             MAX(ts) + INTERVAL 30 MINUTE AS e
           FROM sids GROUP BY 1, 2),
         deltas AS (SELECT s AS t, 1 AS d FROM sess
                    UNION ALL SELECT e, -1 FROM sess),
         run AS (SELECT t, d, date_trunc('hour', t) AS h,
             SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run
           FROM deltas)
         SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(MAX(run) AS BIGINT) AS max_concurrency,
           CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ends
         FROM run GROUP BY h ORDER BY hour_start""",
    "events_ab_test" ->
      """WITH v AS (SELECT user_id, ts FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
         conv AS (SELECT DISTINCT v.user_id FROM v JOIN p
               ON v.user_id = p.user_id
              AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
               AS converted
           FROM (SELECT DISTINCT user_id FROM v) u
           LEFT JOIN conv c ON u.user_id = c.user_id),
         arms AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
               AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
           FROM pu GROUP BY 1),
         a AS (SELECT n_users AS n_a, n_conv AS c_a FROM arms
               WHERE arm = 'A'),
         b AS (SELECT n_users AS n_b, n_conv AS c_b FROM arms
               WHERE arm = 'B')
         SELECT n_a, c_a, n_b, c_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 4) AS rate_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 4) AS rate_b,
           CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
             ROUND((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a) /
               sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 / n_a + 1.0 / n_b)), 4)
           END AS z
         FROM a, b""",
    "events_anomaly_stl" ->
      s"""WITH dec AS (SELECT * FROM (${OracleGen.tsDecomposeOracle}) q),
         med AS (SELECT event_type, median(residual) AS med
                 FROM dec GROUP BY 1),
         mad AS (SELECT d.event_type, m.med,
             median(abs(d.residual - m.med)) AS mad
           FROM dec d JOIN med m ON d.event_type = m.event_type
           GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.n, d.residual,
           ROUND(a.med, 4) AS resid_median,
           ROUND(a.mad * 2.0, 4) AS gate
         FROM dec d JOIN mad a ON d.event_type = a.event_type
         WHERE abs(d.residual - a.med) > a.mad * 2.0
         ORDER BY d.event_type, d.day""",
    "events_transitions" ->
      """WITH nx AS (
           SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, COUNT(*) AS n
               FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE) /
             CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
         FROM c ORDER BY from_type, to_type""",
    "events_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, SUM(cnt) AS s, SUM(cnt*cnt) AS ss,
             COUNT(*) AS n
           FROM daily GROUP BY 1)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.cnt AS BIGINT) AS cnt,
           ROUND((CAST(d.cnt AS DOUBLE) - CAST(st.s AS DOUBLE)/st.n)
             / sqrt(CAST(st.ss AS DOUBLE)/st.n
                 - (CAST(st.s AS DOUBLE)/st.n)*(CAST(st.s AS DOUBLE)/st.n)),
             4) AS z
         FROM daily d JOIN st ON d.event_type = st.event_type
         WHERE st.n > 1 AND (st.n * st.ss - st.s * st.s) > 0
           AND (d.cnt * st.n - st.s) * (d.cnt * st.n - st.s)
             >= 4 * (st.n * st.ss - st.s * st.s)
         ORDER BY d.event_type, day"""
    ,
    "events_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         days AS (SELECT DISTINCT d FROM ud),
         ex AS (SELECT user_id, off,
             d + CAST(off AS INTEGER) AS gd
           FROM ud CROSS JOIN range(28) t(off)),
         agg AS (SELECT gd,
             CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END)
               AS BIGINT) AS dau,
             CAST(COUNT(DISTINCT CASE WHEN off <= 6 THEN user_id END)
               AS BIGINT) AS wau7,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau28
           FROM ex JOIN days ON ex.gd = days.d GROUP BY 1)
         SELECT strftime(gd, '%Y-%m-%d') AS day, dau, wau7, mau28,
           ROUND(CAST(dau AS DOUBLE) / wau7, 6) AS dau_wau
         FROM agg ORDER BY day""",
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         pre AS (SELECT event_type, d,
             SUM(n) OVER (PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS sl,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS nl,
             SUM(n) OVER (PARTITION BY event_type) AS s,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
           FROM daily),
         scored AS (SELECT *,
             CAST(sl * sl AS DOUBLE) / nl
               + CAST((s - sl) * (s - sl) AS DOUBLE) / (nd - nl)
               - CAST(s * s AS DOUBLE) / nd AS gain
           FROM pre WHERE nl < nd),
         best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY gain DESC, d) AS rk FROM scored)
         SELECT event_type, strftime(d, '%Y-%m-%d') AS split_day,
           CAST(nd AS BIGINT) AS n_days, CAST(nl AS BIGINT) AS n_left,
           ROUND(CAST(sl AS DOUBLE) / nl, 6) AS mean_left,
           ROUND(CAST(s - sl AS DOUBLE) / (nd - nl), 6) AS mean_right,
           ROUND(gain, 6) AS gain
         FROM best WHERE rk = 1 ORDER BY event_type""",
    "events_seasonal_strength" ->
      s"""WITH dec AS (SELECT * FROM (${OracleGen.tsDecomposeOracle}) q),
         comp AS (SELECT event_type,
             CAST(residual AS DECIMAL(18,6)) AS r,
             CAST(seasonal + residual AS DECIMAL(18,6)) AS sr,
             CAST(n - seasonal AS DECIMAL(18,6)) AS tr
           FROM dec),
         v AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(r * r) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(r) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(r) AS DOUBLE) / COUNT(*)) AS var_r,
             CAST(SUM(sr * sr) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(sr) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(sr) AS DOUBLE) / COUNT(*)) AS var_sr,
             CAST(SUM(tr * tr) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(tr) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(tr) AS DOUBLE) / COUNT(*)) AS var_tr
           FROM comp GROUP BY 1)
         SELECT event_type, n_days, ROUND(var_r, 6) AS var_resid,
           ROUND(CASE WHEN var_sr > 0 THEN
             GREATEST(CAST(0 AS DOUBLE), 1 - var_r / var_sr) END, 6)
             AS f_seasonal,
           ROUND(CASE WHEN var_tr > 0 THEN
             GREATEST(CAST(0 AS DOUBLE), 1 - var_r / var_tr) END, 6)
             AS f_trend
         FROM v ORDER BY event_type""",
    "events_ab_sequential" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         e1 AS (SELECT event_type, user_id, ts FROM events, t0
           WHERE ts < t0 + INTERVAL 15 DAY),
         v1 AS (SELECT user_id, ts FROM e1 WHERE event_type = 'view'),
         p1 AS (SELECT user_id, ts FROM e1
           WHERE event_type = 'purchase'),
         conv1 AS (SELECT DISTINCT v.user_id FROM v1 v JOIN p1 p
           ON v.user_id = p.user_id AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu1 AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS cv
           FROM (SELECT DISTINCT user_id FROM v1) u
           LEFT JOIN conv1 c ON u.user_id = c.user_id),
         arms1 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cv) AS BIGINT) AS c
           FROM pu1 GROUP BY 1),
         l1 AS (SELECT 1 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM arms1 WHERE is_a) a,
                (SELECT n, c FROM arms1 WHERE NOT is_a) b),
         v2 AS (SELECT user_id, ts FROM events
           WHERE event_type = 'view'),
         p2 AS (SELECT user_id, ts FROM events
           WHERE event_type = 'purchase'),
         conv2 AS (SELECT DISTINCT v.user_id FROM v2 v JOIN p2 p
           ON v.user_id = p.user_id AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu2 AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS cv
           FROM (SELECT DISTINCT user_id FROM v2) u
           LEFT JOIN conv2 c ON u.user_id = c.user_id),
         arms2 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cv) AS BIGINT) AS c
           FROM pu2 GROUP BY 1),
         l2 AS (SELECT 2 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM arms2 WHERE is_a) a,
                (SELECT n, c FROM arms2 WHERE NOT is_a) b),
         looks AS (SELECT *, CASE WHEN look = 1
             THEN CAST(2.797 AS DOUBLE) ELSE CAST(1.977 AS DOUBLE) END
             AS boundary,
             CASE WHEN pp > 0 AND pp < 1 THEN
               (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
               / sqrt(pp * (1 - pp)
                 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
             END AS z
           FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2) u)
         SELECT look, n_a, c_a, n_b, c_b, ROUND(z, 4) AS z, boundary,
           COALESCE(ABS(z) > boundary, false) AS crossed
         FROM looks ORDER BY look""",
    "events_holt_forecast" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         rnd AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM daily),
         st(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rnd WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM st s JOIN rnd r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         fin AS (SELECT s.event_type, s.l, s.t FROM st s
           JOIN (SELECT event_type, MAX(rn) AS m FROM st GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1)
         SELECT f.event_type, n_days, ROUND(l, 6) AS level,
           ROUND(t, 6) AS trend, ROUND(l + t, 6) AS f1,
           ROUND(l + CAST(2 AS DOUBLE) * t, 6) AS f2,
           ROUND(l + CAST(3 AS DOUBLE) * t, 6) AS f3
         FROM fin f JOIN nd USING (event_type) ORDER BY event_type""",
    "events_forecast_backtest" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         mk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY d DESC) AS rdesc FROM daily),
         train AS (SELECT * FROM mk WHERE rdesc > 5),
         test AS (SELECT event_type, 6 - rdesc AS h,
             CAST(n AS DOUBLE) AS y FROM mk WHERE rdesc <= 5),
         rnd AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM train),
         st(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rnd WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM st s JOIN rnd r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         fin AS (SELECT s.event_type, s.l, s.t FROM st s
           JOIN (SELECT event_type, MAX(rn) AS m FROM st GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         lasty AS (SELECT event_type, CAST(n AS DOUBLE) AS last_y
           FROM mk WHERE rdesc = 6),
         nt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train
           FROM train GROUP BY 1),
         sc AS (SELECT t.event_type,
             CAST(ABS(t.y - l2.last_y) AS DECIMAL(18,6)) AS e_naive,
             CAST(ABS(t.y - (f.l + CAST(t.h AS DOUBLE) * f.t))
               AS DECIMAL(18,6)) AS e_holt
           FROM test t JOIN fin f USING (event_type)
           JOIN lasty l2 USING (event_type)),
         agg AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             ROUND(CAST(SUM(e_naive) AS DOUBLE) / COUNT(*), 6)
               AS naive_mae,
             ROUND(CAST(SUM(e_holt) AS DOUBLE) / COUNT(*), 6)
               AS holt_mae
           FROM sc GROUP BY 1)
         SELECT a.event_type, n_train, n_test, naive_mae, holt_mae,
           CASE WHEN holt_mae < naive_mae THEN 'holt'
                WHEN holt_mae > naive_mae THEN 'naive'
                ELSE 'tie' END AS winner
         FROM agg a JOIN nt USING (event_type)
         ORDER BY a.event_type""",
    "events_bursts" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         fl AS (SELECT *,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS k,
             COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS s
           FROM daily),
         fb AS (SELECT *, n * k > 2 * s AND k > 0 AS burst FROM fl),
         runs AS (SELECT *, d - CAST(ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY d) AS INT) AS grp
           FROM fb WHERE burst),
         rc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bursts,
             CAST(MAX(run_len) AS BIGINT) AS longest_run FROM (
             SELECT event_type, grp, COUNT(*) AS run_len
             FROM runs GROUP BY 1, 2) z GROUP BY 1),
         peak AS (SELECT event_type,
             strftime(d, '%Y-%m-%d') AS peak_day, n AS peak_n FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY n DESC, d) AS rk FROM runs) z WHERE rk = 1),
         bd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN burst THEN 1 ELSE 0 END) AS BIGINT)
               AS n_burst_days
           FROM fb GROUP BY 1)
         SELECT bd.event_type, n_days, n_burst_days,
           COALESCE(n_bursts, 0) AS n_bursts,
           COALESCE(longest_run, 0) AS longest_run,
           COALESCE(peak_day, '') AS peak_day,
           COALESCE(peak_n, 0) AS peak_n
         FROM bd LEFT JOIN rc USING (event_type)
         LEFT JOIN peak USING (event_type)
         ORDER BY bd.event_type""",
    "events_poisson_bootstrap" ->
      """WITH ev AS (SELECT event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         wx AS (SELECT event_id, cents, rep,
             CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
               + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0
               + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0
               + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0
               + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0
               + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0
               + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0
               + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
               / 4294967296.0 AS DOUBLE) AS u
           FROM (SELECT event_id, cents, rep,
               md5(CAST(rep AS VARCHAR) || ':'
                 || CAST(event_id AS VARCHAR)) AS h
             FROM ev CROSS JOIN range(20) t(rep)) z),
         ww AS (SELECT rep, cents,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
           FROM wx),
         rm AS (SELECT rep,
             CAST(CAST(SUM(w * cents) AS DOUBLE)
               / CAST(SUM(w) AS DOUBLE) AS DECIMAL(18,9)) AS m
           FROM ww GROUP BY 1),
         pt AS (SELECT CAST(SUM(cents) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS sample_mean_c FROM ev),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
             CAST(SUM(m) AS DOUBLE) / COUNT(*) AS boot_mean_c,
             (CAST(SUM(m * m) AS DOUBLE)
               - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                 / COUNT(*)) / (COUNT(*) - 1) AS var_c,
             CAST(MIN(m) AS DOUBLE) AS lo_c,
             CAST(MAX(m) AS DOUBLE) AS hi_c
           FROM rm)
         SELECT n_reps, ROUND(sample_mean_c / 100.0, 4) AS sample_mean,
           ROUND(boot_mean_c / 100.0, 4) AS boot_mean,
           ROUND(sqrt(var_c) / 100.0, 4) AS boot_se,
           ROUND(lo_c / 100.0, 4) AS ci_lo,
           ROUND(hi_c / 100.0, 4) AS ci_hi
         FROM ag, pt""",
    "events_autocorr" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h FROM events),
         counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM ev
           GROUP BY 1),
         span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
         spine AS (SELECT CAST(k AS BIGINT) AS t0
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         idx AS (SELECT CAST(date_diff('hour', span.h0, counts.h)
               AS BIGINT) AS t0, y
           FROM counts, span),
         series AS (SELECT s.t0 + 1 AS t, COALESCE(y, 0) AS y
           FROM spine s LEFT JOIN idx ON s.t0 = idx.t0),
         ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s FROM series),
         dev AS (SELECT t, CAST(y * n - s AS DECIMAL(38,0)) AS d, n
           FROM series, ns),
         den AS (SELECT SUM(d * d) AS den, MAX(n) AS n FROM dev),
         nums AS (SELECT lag, SUM(a.d * b.d) AS num
           FROM (SELECT CAST(k AS INT) AS lag FROM range(1, 25) t(k)) l
           JOIN dev a ON TRUE
           JOIN dev b ON b.t = a.t - lag
           GROUP BY 1),
         terms AS (SELECT lag,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r,
             CAST((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * n * (n + 2) / (n - lag) AS DECIMAL(28,12)) AS lb_term
           FROM nums, den)
         SELECT lag, ROUND(r, 6) AS acf,
           ROUND(CAST(SUM(lb_term) OVER (ORDER BY lag
             ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS lb_q
         FROM terms ORDER BY lag""",
    "events_powerlaw_fit" ->
      """WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         hist AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_users FROM pu
           GROUP BY 1),
         ax AS (SELECT CAST(v AS BIGINT) AS xmin
           FROM (VALUES (2), (5), (10)) t(v)),
         tail AS (SELECT xmin, x, n_users,
             CAST(ln(CAST(x AS DOUBLE) / xmin) AS DECIMAL(25,12))
               * CAST(n_users AS DECIMAL(12,0)) AS lnterm
           FROM hist CROSS JOIN ax WHERE x >= xmin),
         fit AS (SELECT xmin, CAST(SUM(n_users) AS BIGINT) AS n_tail,
             SUM(lnterm) AS sum_ln,
             1.0 + CAST(SUM(n_users) AS DOUBLE)
               / CAST(SUM(lnterm) AS DOUBLE) AS alpha
           FROM tail GROUP BY 1),
         sv AS (SELECT t.xmin, t.x,
             SUM(t.n_users) OVER (PARTITION BY t.xmin ORDER BY t.x DESC
               ROWS UNBOUNDED PRECEDING) AS ge,
             f.n_tail, f.alpha
           FROM tail t JOIN fit f ON t.xmin = f.xmin),
         ks AS (SELECT xmin, MAX(ABS(CAST(ge AS DOUBLE) / n_tail
             - pow(CAST(x AS DOUBLE) / xmin, 1.0 - alpha))) AS ks
           FROM sv GROUP BY 1)
         SELECT f.xmin, n_tail, ROUND(CAST(sum_ln AS DOUBLE), 6) AS sum_ln,
           ROUND(alpha, 6) AS alpha, ROUND(ks, 6) AS ks
         FROM fit f JOIN ks USING (xmin) ORDER BY xmin""",
    "events_seq_patterns" ->
      """WITH s AS (SELECT user_id, event_type, MIN(ts) AS t_min,
             MAX(ts) AS t_max
           FROM events GROUP BY 1, 2),
         nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events),
         pat AS (SELECT a.event_type AS a, b.event_type AS b,
             CAST(COUNT(*) AS BIGINT) AS n_users_pattern
           FROM s a JOIN s b
             ON a.user_id = b.user_id AND a.t_min < b.t_max
           GROUP BY 1, 2),
         ha AS (SELECT event_type AS a,
             CAST(COUNT(*) AS BIGINT) AS n_users_a
           FROM s GROUP BY 1)
         SELECT pat.a, pat.b, n_users_pattern,
           ROUND(CAST(n_users_pattern AS DOUBLE) / n_users, 6) AS support,
           ROUND(CAST(n_users_pattern AS DOUBLE) / n_users_a, 6)
             AS confidence
         FROM pat JOIN ha ON pat.a = ha.a, nu
         ORDER BY pat.a, pat.b""",
    "events_did_pretrends" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events
           WHERE value IS NOT NULL),
         pre AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'treat'
               ELSE 'control' END AS arm,
             date_diff('day', CAST(t0 AS DATE), CAST(ts AS DATE)) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0
           WHERE value IS NOT NULL AND ts < t0 + INTERVAL 15 DAY),
         daily AS (SELECT arm, day, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc FROM pre GROUP BY 1, 2),
         d2 AS (SELECT arm, day,
             CAST(CAST(sc AS DOUBLE) / n AS DECIMAL(18,9)) AS y
           FROM daily),
         fit AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(day * day) AS BIGINT) AS sxx,
             SUM(y) AS sy, SUM(y * day) AS sxy
           FROM d2 GROUP BY 1),
         f2 AS (SELECT arm, n_days, sx, sy,
             (n_days * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope
           FROM fit),
         f3 AS (SELECT arm, n_days, slope,
             (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n_days
               AS intercept
           FROM f2),
         gap AS (SELECT MAX(CASE WHEN arm = 'treat' THEN slope END)
             - MAX(CASE WHEN arm = 'control' THEN slope END)
             AS slope_gap FROM f3)
         SELECT arm, n_days, ROUND(slope / 100.0, 6) AS slope,
           ROUND(intercept / 100.0, 4) AS intercept,
           ROUND(slope_gap / 100.0, 6) AS slope_gap
         FROM f3, gap ORDER BY arm""",
    "events_att_matching" ->
      """WITH users AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sc,
             user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         u2 AS (SELECT *, CAST(CAST(sc AS DOUBLE) / x AS DECIMAL(18,9))
             AS y FROM users),
         hist AS (SELECT x, COUNT(*) AS n FROM u2 GROUP BY 1),
         ch AS (SELECT x, SUM(n) OVER (ORDER BY x
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM u2),
         bounds AS (SELECT k, MIN(x) AS b
           FROM ch, tot, range(1, 10) t(k)
           WHERE cum >= CAST(ceil(k * nu / 10.0) AS BIGINT)
           GROUP BY 1),
         bk AS (SELECT treat, y,
             CAST(1 + SUM(CASE WHEN x > b THEN 1 ELSE 0 END) AS BIGINT)
               AS bucket
           FROM u2 CROSS JOIN bounds GROUP BY user_id, treat, y, x),
         strata AS (SELECT bucket,
             CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
               AS n_c,
             SUM(CASE WHEN treat THEN y END) AS sy_t,
             SUM(CASE WHEN treat THEN NULL ELSE y END) AS sy_c
           FROM bk GROUP BY 1),
         s2 AS (SELECT *,
             CASE WHEN n_t > 0 AND n_c > 0 THEN
               CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c
             END AS diff,
             LEAST(n_t, n_c) AS w
           FROM strata),
         s3 AS (SELECT *, CAST(diff * w AS DECIMAL(28,12)) AS wd
           FROM s2),
         att AS (SELECT CAST(SUM(wd) AS DOUBLE) / SUM(w) AS att FROM s3)
         SELECT bucket, n_t, n_c, ROUND(diff / 100.0, 6) AS diff,
           w AS weight, ROUND(att / 100.0, 6) AS att
         FROM s3, att ORDER BY bucket""",
    "events_periodogram" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h FROM events),
         counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM ev
           GROUP BY 1),
         span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
         spine AS (SELECT CAST(k AS BIGINT) AS t0
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         idx AS (SELECT CAST(date_diff('hour', span.h0, counts.h)
               AS BIGINT) AS t0, y
           FROM counts, span),
         series AS (SELECT s.t0 + 1 AS t, COALESCE(y, 0) AS y
           FROM spine s LEFT JOIN idx ON s.t0 = idx.t0),
         ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s FROM series),
         dev AS (SELECT t, CAST(y * n - s AS DECIMAL(38,0)) AS d
           FROM series, ns),
         den AS (SELECT SUM(d * d) AS den FROM dev),
         terms AS (SELECT period,
             SUM(CAST(CAST(d AS DOUBLE)
               * cos(2 * pi() * ((t - 1) % period) / period)
               AS DECIMAL(28,12))) AS cs,
             SUM(CAST(CAST(d AS DOUBLE)
               * sin(2 * pi() * ((t - 1) % period) / period)
               AS DECIMAL(28,12))) AS ss
           FROM dev, (VALUES (6), (12), (24), (168)) p(period)
           GROUP BY 1)
         SELECT period,
           ROUND((CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
             + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) * 2.0
             / (CAST(n AS DOUBLE) * CAST(den AS DOUBLE)), 6)
             AS power_frac
         FROM terms, den, ns ORDER BY period""",
    "events_mann_whitney" ->
      """WITH ev AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
             user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
               AS nt
           FROM ev GROUP BY 1),
         ch AS (SELECT *, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         mr AS (SELECT *, cum * 2 - n + 1 AS mr2 FROM ch),
         sums AS (SELECT CAST(SUM(nt * mr2) AS BIGINT) AS r2_t,
             CAST(SUM(nt) AS BIGINT) AS n1,
             CAST(SUM(n - nt) AS BIGINT) AS n2,
             CAST(SUM(n * n * n - n) AS DECIMAL(38,0)) AS tie
           FROM mr),
         st AS (SELECT *, n1 + n2 AS nn,
             CAST(r2_t AS DOUBLE) / 2.0
               - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u
           FROM sums),
         v AS (SELECT *,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(nn + 1 AS DOUBLE) - CAST(tie AS DOUBLE)
                 / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))
               AS var
           FROM st)
         SELECT n1, n2, ROUND(u, 2) AS u,
           ROUND((u - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(var), 6)
             AS z,
           ROUND(CAST(tie AS DOUBLE), 2) AS tie_term
         FROM v""",
    "events_ab_power" ->
      """WITH arms AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS n_conv
           FROM events GROUP BY 1),
         a AS (SELECT n_events AS n_a, n_conv AS c_a FROM arms
           WHERE is_a),
         b AS (SELECT n_events AS n_b, n_conv AS c_b FROM arms
           WHERE NOT is_a),
         j AS (SELECT *,
             CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
               AS p_pool,
             2.0 * n_a * n_b / CAST(n_a + n_b AS DOUBLE) AS n_harm
           FROM a, b),
         m AS (SELECT *,
             2.801585 * sqrt(2.0 * p_pool * (1.0 - p_pool) / n_harm)
               AS mde
           FROM j)
         SELECT n_a, n_b, c_a, c_b, ROUND(p_pool, 6) AS p_pool,
           ROUND(n_harm, 2) AS n_harmonic, ROUND(mde, 6) AS mde_abs,
           ROUND(mde / p_pool, 6) AS mde_rel
         FROM m""",
  )
}
