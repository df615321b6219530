package graft.oracles

/** Structured-streaming rows (foreachBatch pipelines).
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object StreamOracles {
  private[graft] val sql: Map[String, String] = Map(
    "stream_sliding_two_hour" ->
      """WITH e AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         w AS (SELECT date_trunc('hour', ts) AS ws FROM e
               UNION ALL
               SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
                strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
                COUNT(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY 1""",
    "stream_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_distinct_pairs" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "stream_sessionize_stateful" ->
      """WITH sess AS (SELECT user_id, sid, COUNT(*) AS n FROM (
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
                 LAG(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
           GROUP BY user_id, sid)
         SELECT user_id, COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(n) AS BIGINT) AS max_session_events
         FROM sess GROUP BY user_id ORDER BY user_id""",
    // stream_reservoir: maintained streaming state must equal the
    // one-shot batch sample — identical oracle to sample_reservoir
    "stream_reservoir" ->
      """WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('rsv:' || CAST(doc_id AS VARCHAR)) AS pr
           FROM documents),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY pr, doc_id) AS rk FROM d)
         SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_tok
         FROM r WHERE rk <= 20 ORDER BY source, rk""",
    "stream_decontaminate" ->
      """WITH s AS (SELECT doc_id, source, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         tr AS (SELECT doc_id, w,
             CAST(substr(source, 4, 8) AS INT) AS sn,
             CAST(len(w) AS BIGINT) AS n_tok
           FROM s WHERE split = 'train'),
         contam AS (SELECT DISTINCT doc_id FROM (
             SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 13
                    THEN [array_to_string(w[i:i+12], ' ')
                          for i in range(1, len(w)-11)]
                    ELSE []::VARCHAR[] END)) AS g
             FROM tr) tz
           WHERE g IN (SELECT g FROM bg)),
         flagged AS (SELECT tr.doc_id, tr.sn, tr.n_tok,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
           FROM tr LEFT JOIN contam c USING (doc_id)),
         inc AS (SELECT CASE WHEN sn < 10 THEN 1 ELSE 2 END AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(hit) AS BIGINT) AS n_contam_docs,
             CAST(SUM(hit * n_tok) AS BIGINT) AS contam_tokens,
             CAST(SUM((1 - hit) * n_tok) AS BIGINT) AS clean_tokens
           FROM flagged GROUP BY 1),
         fold AS (SELECT CAST(0 AS BIGINT) AS increment,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_contam_docs) AS BIGINT) AS n_contam_docs,
             CAST(SUM(contam_tokens) AS BIGINT) AS contam_tokens,
             CAST(SUM(clean_tokens) AS BIGINT) AS clean_tokens
           FROM inc)
         SELECT CAST(increment AS BIGINT) AS increment, n_docs,
           n_contam_docs, contam_tokens, clean_tokens,
           ROUND(CAST(contam_tokens AS DOUBLE)
             / CAST(contam_tokens + clean_tokens AS DOUBLE), 6)
             AS contam_share
         FROM (SELECT * FROM inc UNION ALL SELECT * FROM fold) u
         ORDER BY increment""",
    "stream_anomaly" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CASE WHEN ts < t0 + INTERVAL 15 DAY THEN 1 ELSE 2 END AS inc,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM events, t0 GROUP BY 1, 2, 3),
         st1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS ssq
           FROM daily WHERE inc = 1 GROUP BY 1),
         r1 AS (SELECT CAST(1 AS BIGINT) AS increment, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(0 AS BIGINT) AS n_flagged
           FROM daily WHERE inc = 1 GROUP BY 2),
         sc2 AS (SELECT d.event_type, d.x, st1.n, st1.s, st1.ssq
           FROM daily d LEFT JOIN st1 USING (event_type) WHERE d.inc = 2),
         r2 AS (SELECT CAST(2 AS BIGINT) AS increment, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN n IS NOT NULL AND
                 (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
                   > 4 * (CAST(n AS HUGEINT) * ssq
                     - CAST(s AS HUGEINT) * s)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
           FROM sc2 GROUP BY 2)
         SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
         ORDER BY increment, event_type""",
    "stream_kmeans" ->
      """WITH e1 AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 0),
         e2 AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 1),
         seeds AS (SELECT vec_id AS cid, embedding AS cemb
           FROM e1 ORDER BY vec_id LIMIT 8),
         a1 AS (SELECT vec_id, embedding, cid, sim FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM e1 e CROSS JOIN seeds s) z WHERE rn = 1),
         r1 AS (SELECT CAST(1 AS BIGINT) AS increment, cid,
             CAST(COUNT(*) AS BIGINT) AS n_assigned,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos
           FROM a1 GROUP BY 2),
         dims AS (SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent1 AS (SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d) z
           GROUP BY cid),
         a2 AS (SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM e2 e CROSS JOIN cent1 c) z WHERE rn = 1),
         r2 AS (SELECT CAST(2 AS BIGINT) AS increment, cid,
             CAST(COUNT(*) AS BIGINT) AS n_assigned,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos
           FROM a2 GROUP BY 2)
         SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
         ORDER BY increment, cid""",
    // stream_hll_distinct: exact cumulative distincts are the truth;
    // the maintained-sketch verdict is asserted TRUE (the documented
    // weaker sketch-gate)
    // stream_kmv_distinct: the maintained bottom-k state after each
    // increment equals the from-scratch bottom-k over the cumulative
    // prefix (KMV merge law) — the oracle recomputes BOTH states and
    // the estimates hash-compare exactly
    "stream_kmv_distinct" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         h1 AS (SELECT DISTINCT
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY),
         hA AS (SELECT DISTINCT
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM events),
         s1 AS (SELECT hx FROM h1 ORDER BY hx LIMIT 32),
         sA AS (SELECT hx FROM hA ORDER BY hx LIMIT 32),
         st1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_state,
           MAX(hx) AS hmax FROM s1),
         stA AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_state,
           MAX(hx) AS hmax FROM sA),
         ex1 AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_cum
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY),
         exA AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_cum
           FROM events),
         incr AS (
           SELECT CAST(1 AS BIGINT) AS increment, st1.n_state,
             st1.hmax, ex1.exact_cum FROM st1, ex1
           UNION ALL
           SELECT CAST(2 AS BIGINT), stA.n_state, stA.hmax,
             exA.exact_cum FROM stA, exA),
         vv AS (SELECT increment, n_state, exact_cum,
             SUM((strpos('0123456789abcdef', substr(hmax, g.i, 1)) - 1)
               * POWER(16.0, 12 - g.i)) / POWER(16.0, 12) AS v_k
           FROM incr, generate_series(1, 12) g(i) GROUP BY 1, 2, 3)
         SELECT increment, n_state, exact_cum,
           ROUND(CASE WHEN n_state < 32 THEN CAST(n_state AS DOUBLE)
             ELSE 31.0 / v_k END, 6) AS est_distinct
         FROM vv ORDER BY increment""",
    "stream_hll_distinct" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events)
         SELECT CAST(2 AS BIGINT) AS n_increments,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY)
             AS exact_inc1,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
             AS exact_total,
           TRUE AS est_within_bound""",
    "stream_mix_rebalance" -> {
      val inc = Seq((1, "CAST(substr(source, 4, 8) AS INT) < 10"),
        (2, "TRUE")).map { case (i, cond) =>
        s""",
         pl_$i AS (SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents WHERE $cond GROUP BY 1),
         sc_$i AS (SELECT lang, n_tokens,
             CASE WHEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM pl_$i),
         z_$i AS (SELECT CAST(SUM(s) AS BIGINT) AS z FROM sc_$i),
         r_$i AS (SELECT CAST($i AS BIGINT) AS increment, lang, n_tokens,
             ROUND(CAST(s AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
             CAST(ROUND(CAST(s * 50000 AS DOUBLE) / CAST(z AS DOUBLE), 0)
               AS BIGINT) AS target_tokens
           FROM sc_$i, z_$i)"""
      }.mkString
      s"""WITH dummy AS (SELECT 1)$inc
         SELECT * FROM (SELECT * FROM r_1 UNION ALL SELECT * FROM r_2) u
         ORDER BY increment, lang"""
    },
    "stream_join_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
         FROM events p JOIN events v ON v.user_id = p.user_id
           AND p.event_type = 'purchase' AND v.event_type = 'view'
           AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
         ORDER BY purchase_id, view_ts""",
    "stream_session_windows" ->
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
    "stream_static_join" ->
      """SELECT 'T_' || upper(event_type) AS type_label, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "stream_quantiles" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         v1 AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cent
           FROM events, t0 WHERE value IS NOT NULL
             AND ts < t0 + INTERVAL 15 DAY),
         v2 AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cent
           FROM events WHERE value IS NOT NULL),
         h1 AS (SELECT cent, COUNT(*) AS cnt FROM v1 GROUP BY 1),
         c1 AS (SELECT cent, SUM(cnt) OVER (ORDER BY cent
             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS tot FROM h1),
         q1 AS (SELECT 1 AS increment,
             CAST(MAX(tot) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cum >= (tot + 3) // 4 THEN cent END) AS c25,
             MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cent END) AS c50,
             MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN cent END) AS c75,
             MIN(CASE WHEN cum >= (19 * tot + 19) // 20 THEN cent END)
               AS c95
           FROM c1),
         h2 AS (SELECT cent, COUNT(*) AS cnt FROM v2 GROUP BY 1),
         c2 AS (SELECT cent, SUM(cnt) OVER (ORDER BY cent
             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS tot FROM h2),
         q2 AS (SELECT 2 AS increment,
             CAST(MAX(tot) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cum >= (tot + 3) // 4 THEN cent END) AS c25,
             MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cent END) AS c50,
             MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN cent END) AS c75,
             MIN(CASE WHEN cum >= (19 * tot + 19) // 20 THEN cent END)
               AS c95
           FROM c2)
         SELECT increment, n_rows,
           ROUND(CAST(c25 AS DOUBLE) / 100, 2) AS p25,
           ROUND(CAST(c50 AS DOUBLE) / 100, 2) AS p50,
           ROUND(CAST(c75 AS DOUBLE) / 100, 2) AS p75,
           ROUND(CAST(c95 AS DOUBLE) / 100, 2) AS p95
         FROM (SELECT * FROM q1 UNION ALL SELECT * FROM q2) u
         ORDER BY increment""",
    "stream_decay_topk" ->
      """WITH RECURSIVE pw(k, g) AS (
           SELECT 0, CAST(1.0 AS DOUBLE)
           UNION ALL
           SELECT k + 1, g * CAST(0.9 AS DOUBLE) FROM pw WHERE k < 60),
         t0 AS (SELECT MIN(ts) AS t0 FROM events),
         h1 AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY GROUP BY 1, 2),
         h2 AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         r1 AS (SELECT MAX(d) AS r FROM h1),
         r2 AS (SELECT MAX(d) AS r FROM h2),
         m1 AS (SELECT event_type,
             SUM(CAST(cnt * g AS DECIMAL(28,12))) AS mass
           FROM h1, r1, pw WHERE pw.k = datediff('day', h1.d, r1.r)
           GROUP BY 1),
         m2 AS (SELECT event_type,
             SUM(CAST(cnt * g AS DECIMAL(28,12))) AS mass
           FROM h2, r2, pw WHERE pw.k = datediff('day', h2.d, r2.r)
           GROUP BY 1),
         t1 AS (SELECT 1 AS increment, CAST(rk AS INT) AS rk, event_type,
             ROUND(CAST(mass AS DOUBLE), 6) AS mass FROM (
             SELECT event_type, mass, ROW_NUMBER() OVER (
               ORDER BY mass DESC, event_type) AS rk FROM m1) z
           WHERE rk <= 5),
         t2 AS (SELECT 2 AS increment, CAST(rk AS INT) AS rk, event_type,
             ROUND(CAST(mass AS DOUBLE), 6) AS mass FROM (
             SELECT event_type, mass, ROW_NUMBER() OVER (
               ORDER BY mass DESC, event_type) AS rk FROM m2) z
           WHERE rk <= 5)
         SELECT * FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2) u
         ORDER BY increment, rk""",
    "stream_cc_incremental" ->
      """WITH RECURSIVE directed AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         e1 AS (SELECT v1, v2 FROM knn WHERE v1 % 2 = 0),
         sym1 AS (SELECT v1 AS a, v2 AS b FROM e1
           UNION SELECT v2, v1 FROM e1),
         w1(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM sym1) t
           UNION
           SELECT e.b, w.lbl FROM w1 w JOIN sym1 e ON e.a = w.node),
         l1 AS (SELECT node, MIN(lbl) AS cid FROM w1 GROUP BY 1),
         c1 AS (SELECT cid, COUNT(*) AS csize FROM l1 GROUP BY 1),
         a1 AS (SELECT 1 AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(csize) AS BIGINT) AS n_nodes,
             CAST(MAX(csize) AS BIGINT) AS max_size,
             CAST(SUM(CASE WHEN csize = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs
           FROM c1),
         sym2 AS (SELECT v1 AS a, v2 AS b FROM knn
           UNION SELECT v2, v1 FROM knn),
         w2(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM sym2) t
           UNION
           SELECT e.b, w.lbl FROM w2 w JOIN sym2 e ON e.a = w.node),
         l2 AS (SELECT node, MIN(lbl) AS cid FROM w2 GROUP BY 1),
         c2 AS (SELECT cid, COUNT(*) AS csize FROM l2 GROUP BY 1),
         a2 AS (SELECT 2 AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(csize) AS BIGINT) AS n_nodes,
             CAST(MAX(csize) AS BIGINT) AS max_size,
             CAST(SUM(CASE WHEN csize = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs
           FROM c2)
         SELECT * FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2) u
         ORDER BY increment""",
    "stream_holt" ->
      """WITH RECURSIVE d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0
           FROM events),
         dailyA AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events, d0 WHERE CAST(ts AS DATE) < d0 + 15
           GROUP BY 1, 2),
         rndA AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM dailyA),
         stA(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rndA WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM stA s JOIN rndA r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         finA AS (SELECT s.event_type, s.l, s.t FROM stA s
           JOIN (SELECT event_type, MAX(rn) AS m FROM stA GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         ndA AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dailyA GROUP BY 1),
         dailyB AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         rndB AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM dailyB),
         stB(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rndB WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM stB s JOIN rndB r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         finB AS (SELECT s.event_type, s.l, s.t FROM stB s
           JOIN (SELECT event_type, MAX(rn) AS m FROM stB GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         ndB AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dailyB GROUP BY 1),
         u AS (SELECT 1 AS increment, f.event_type, n_days,
             ROUND(l, 6) AS level, ROUND(t, 6) AS trend,
             ROUND(l + t, 6) AS f1
           FROM finA f JOIN ndA USING (event_type)
           UNION ALL
           SELECT 2, f.event_type, n_days, ROUND(l, 6), ROUND(t, 6),
             ROUND(l + t, 6)
           FROM finB f JOIN ndB USING (event_type))
         SELECT * FROM u ORDER BY increment, event_type""",
    "stream_ab_monitor" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         a1 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS c
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY GROUP BY 1),
         l1 AS (SELECT 1 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM a1 WHERE is_a) a,
                (SELECT n, c FROM a1 WHERE NOT is_a) b),
         a2 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS c
           FROM events GROUP BY 1),
         l2 AS (SELECT 2 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM a2 WHERE is_a) a,
                (SELECT n, c FROM a2 WHERE NOT is_a) b),
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
    "stream_psi_monitor" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         base AS (SELECT CASE WHEN ts < t0 + INTERVAL 15 DAY
               THEN 1 ELSE 2 END AS half,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0 WHERE value IS NOT NULL),
         hist AS (SELECT c, COUNT(*) AS n FROM base WHERE half = 1
           GROUP BY 1),
         cdf AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM base
           WHERE half = 1),
         n2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM base
           WHERE half = 2),
         bounds AS (SELECT k, MIN(c) AS b
           FROM cdf, tot, range(1, 10) t(k)
           WHERE cum >= CAST(ceil(k * n1 / 10.0) AS BIGINT)
           GROUP BY 1),
         hc AS (SELECT half, c, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM base GROUP BY 1, 2),
         asg AS (SELECT half, cnt,
             1 + SUM(CASE WHEN c > b THEN 1 ELSE 0 END) AS bucket
           FROM hc CROSS JOIN bounds GROUP BY half, c, cnt),
         counts AS (SELECT half, bucket, CAST(SUM(cnt) AS BIGINT) AS n
           FROM asg GROUP BY 1, 2),
         ht AS (SELECT half, CAST(COUNT(*) AS BIGINT) AS ht FROM base
           GROUP BY 1),
         sh AS (SELECT c2.half, bucket, n, CAST(n AS DOUBLE) / ht AS p
           FROM counts c2 JOIN ht ON c2.half = ht.half),
         pr1 AS (SELECT bucket, n AS n_ref, p AS p_ref FROM sh
           WHERE half = 1),
         pr2 AS (SELECT bucket, n AS n_cur, p AS p_cur FROM sh
           WHERE half = 2),
         spine AS (SELECT CAST(k AS INT) AS bucket FROM range(1, 11) t(k)),
         pb AS (SELECT s.bucket,
             CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               CAST((p_cur - p_ref) * ln(p_cur / p_ref)
                 AS DECIMAL(28,12)) END AS contrib
           FROM spine s LEFT JOIN pr1 ON s.bucket = pr1.bucket
           LEFT JOIN pr2 ON s.bucket = pr2.bucket),
         psis AS (SELECT SUM(contrib) AS psi_sum FROM pb)
         SELECT CAST(1 AS INT) AS look, n1 AS n_ref, n1 AS n_cur,
           0.0 AS psi_total FROM tot
         UNION ALL
         SELECT CAST(2 AS INT), n1, n2,
           ROUND(CAST(psi_sum AS DOUBLE), 6)
         FROM tot, n2t, psis
         ORDER BY look""",
  )
}
