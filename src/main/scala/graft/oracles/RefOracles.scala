package graft.oracles

/** Reference-surface rows (SURVEY.md §2 over events).
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object RefOracles {
  private[graft] val sql: Map[String, String] = Map(
    "ref_pipeline" ->
      """SELECT b.event_id AS af_id,
         strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS install_time,
         b.user_id AS customer_user_id, b.event_type AS event_name,
         b.value AS event_value
         FROM events b
         WHERE b.ts >= TIMESTAMP '2024-01-15 00:00:00'
           AND b.ts <= TIMESTAMP '2024-01-15 02:00:00'
           AND NOT EXISTS (SELECT 1 FROM events e
             WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'
               AND e.ts <= TIMESTAMP '2024-01-15 01:00:00'
               AND e.event_id = b.event_id)
         ORDER BY af_id""",
    "ref_parse_datetime" ->
      """SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
         END AS parsed_ts
         FROM events ORDER BY event_id""",
    "ref_sentinel_null" ->
      """SELECT CASE WHEN event_type IN ('error','view','click') THEN NULL
                     ELSE event_type END AS norm,
                COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY norm NULLS FIRST""",
    "ref_window_filter" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <= TIMESTAMP '2024-01-10 06:00:00'
         ORDER BY event_id""",
    "ref_key_filter" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
         FROM events WHERE value >= 20 GROUP BY 1 ORDER BY key""",
    "ref_window_count" ->
      """SELECT COUNT(*) AS n FROM events
         WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
           AND ts <= TIMESTAMP '2024-01-15 02:00:00'""",
    "ref_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
         ORDER BY c_custkey""",
  )
}
