package graft.oracles

/** Curation / data-quality / sampling rows.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object CurationOracles {
  private[graft] val sql: Map[String, String] = Map(
    "docs_prep_pipeline" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
           FROM documents),
         keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         losers AS (SELECT DISTINCT v.d2 AS doc_id
                    FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                          FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                                       JOIN sizes s2 ON x.d2 = s2.doc_id) v
                    WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
         FROM scored q
         WHERE n_tok >= 10
           AND CAST(n_stop AS DOUBLE) / n_tok <= 0.5
           AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.3
           AND q.doc_id IN (SELECT doc_id FROM keepers)
           AND q.doc_id NOT IN (SELECT doc_id FROM losers)
         GROUP BY lang ORDER BY lang""",
    "split_assign" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
           (strpos('0123456789abcdef',
              substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
              substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
         FROM documents)
         SELECT CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
                     ELSE 'test' END AS split,
           lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    "docs_spearman" ->
      """WITH s AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         sc AS (SELECT doc_id, n_tok,
             CAST(n_uniq AS DOUBLE) / n_tok AS score
           FROM s WHERE n_tok > 0),
         r AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS r1,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS r2
           FROM sc)
         SELECT COUNT(*) AS n_docs,
           CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
           ROUND(1.0 - 6.0 * CAST(SUM((r1 - r2) * (r1 - r2)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
               * (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
                 - 1.0)), 6) AS spearman
         FROM r""",
    "docs_gate_overlap" ->
      """WITH s AS (SELECT doc_id, text, string_split(text, ' ') AS w,
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
         t AS (SELECT doc_id, md5(text) AS fp_exact,
             CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ')
                        for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ')
                           for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM bg)),
         f AS (SELECT t.doc_id, t.fp_exact, t.n_tok,
             (t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS q_fail,
             (COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10
                 > COALESCE(tr.n_tri, 0) * 3) AS rep_fail,
             (cont.doc_id IS NOT NULL) AS contam
           FROM t LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id)
             LEFT JOIN cont ON t.doc_id = cont.doc_id),
         k AS (SELECT fp_exact, MIN(doc_id) AS keeper_id FROM f
           GROUP BY 1)
         SELECT CAST(f.q_fail AS BIGINT) AS g_qual,
           CAST(f.rep_fail AS BIGINT) AS g_rep,
           CAST(f.doc_id <> k.keeper_id AS BIGINT) AS g_dup,
           CAST(f.contam AS BIGINT) AS g_contam,
           COUNT(*) AS n_docs, CAST(SUM(f.n_tok) AS BIGINT) AS n_tokens
         FROM f JOIN k USING (fp_exact)
         GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    "dq_freshness" ->
      """WITH u AS (SELECT 'events' AS table_name, MAX(ts) AS mx
             FROM events
           UNION ALL SELECT 'orders', MAX(o_orderdate) FROM orders),
         nw AS (SELECT MAX(mx) AS newest FROM u)
         SELECT table_name,
           strftime(mx, '%Y-%m-%d %H:%M:%S') AS watermark,
           CAST((epoch_us(newest) // 1000000
             - epoch_us(mx) // 1000000) // 3600 AS BIGINT) AS lag_hours
         FROM u, nw ORDER BY table_name""",
    "sample_reservoir" ->
      """WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('rsv:' || CAST(doc_id AS VARCHAR)) AS pr
           FROM documents),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY pr, doc_id) AS rk FROM d)
         SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_tok
         FROM r WHERE rk <= 20 ORDER BY source, rk""",
    "docs_gate_kappa" ->
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
         t AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ')
                        for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         f AS (SELECT t.source,
             CAST((t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS BIGINT) AS gq,
             CAST((COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10
                 > COALESCE(tr.n_tri, 0) * 3) AS BIGINT) AS gr
           FROM t LEFT JOIN mb USING (doc_id)
             LEFT JOIN tr USING (doc_id)),
         cells AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN gq = 0 AND gr = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(SUM(CASE WHEN gq = 0 AND gr = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(SUM(CASE WHEN gq = 1 AND gr = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(SUM(CASE WHEN gq = 1 AND gr = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS d
           FROM f GROUP BY 1),
         x AS (SELECT *,
             CAST(a + b AS DECIMAL(38,0)) * CAST(a + c AS DECIMAL(38,0))
               + CAST(c + d AS DECIMAL(38,0))
                 * CAST(b + d AS DECIMAL(38,0)) AS pe_num
           FROM cells)
         SELECT source, n_docs, a AS n_pass_both, b AS n_rep_only,
           c AS n_qual_only, d AS n_flag_both,
           CASE WHEN CAST(n_docs AS DECIMAL(38,0))
                  * CAST(n_docs AS DECIMAL(38,0)) <> pe_num
                THEN ROUND(CAST(CAST(n_docs AS DECIMAL(38,0))
                    * CAST(a + d AS DECIMAL(38,0)) - pe_num AS DOUBLE)
                  / CAST(CAST(n_docs AS DECIMAL(38,0))
                    * CAST(n_docs AS DECIMAL(38,0)) - pe_num AS DOUBLE),
                  6)
           END AS kappa
         FROM x ORDER BY source""",
    "docs_ccnet_buckets" ->
      """WITH s AS (SELECT doc_id, lang, text,
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
         tu AS (SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS cw FROM
             (SELECT unnest(string_split(text, ' ')) AS tok FROM s
              WHERE split = 'train') q
           WHERE tok <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train FROM tu),
         terms AS (SELECT t.doc_id, t.lang,
             CAST(-ln(CAST(COALESCE(tu.cw, 0) + 1 AS DOUBLE)
               / (nv.n_train + nv.v_train)) AS DECIMAL(28,12)) AS nll
           FROM (SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS w FROM s) t
           LEFT JOIN tu ON t.w = tu.w CROSS JOIN nv
           WHERE t.w <> ''),
         pd AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
             SUM(nll) AS nll_sum
           FROM terms GROUP BY 1, 2),
         pdm AS (SELECT *, CAST(nll_sum AS DOUBLE) / n_tok AS mean_nll
           FROM pd),
         rk AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
             (ORDER BY mean_nll, doc_id) AS BIGINT) AS rk FROM pdm),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pdm)
         SELECT lang,
           CASE WHEN rk.rk * 3 <= tot.n THEN 'a_head'
                WHEN rk.rk * 3 <= tot.n * 2 THEN 'b_middle'
                ELSE 'c_tail' END AS bucket,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(nll_sum) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS mean_nll
         FROM pdm JOIN rk USING (doc_id), tot
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "mix_temperature" ->
      """WITH pl AS (SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS nt FROM pl),
         sh AS (SELECT lang, n_tokens,
             CAST(n_tokens AS DOUBLE) / CAST(nt AS DOUBLE) AS share
           FROM pl, tot),
         al AS (SELECT unnest([0.3, 0.5, 0.7, 1.0]) AS alpha),
         p AS (SELECT alpha, lang, n_tokens, share,
             pow(share, alpha) AS pa FROM sh CROSS JOIN al),
         z AS (SELECT alpha,
             CAST(SUM(CAST(pa AS DECIMAL(28,12))) AS DOUBLE) AS z
           FROM p GROUP BY 1)
         SELECT p.alpha, lang, n_tokens, ROUND(share, 6) AS share,
           ROUND(pa / z, 6) AS temp_weight,
           ROUND(pa / z / share, 4) AS boost
         FROM p JOIN z USING (alpha) ORDER BY alpha, lang""",
    "docs_uncertainty_sample" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
           FROM tf JOIN lab USING (doc_id) GROUP BY j),
         s AS (SELECT tf.doc_id,
             CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
           FROM tf LEFT JOIN g USING (j) GROUP BY 1)
         SELECT d.doc_id, d.lang, d.source,
           abs(m2000) AS abs_m2000,
           ROUND(CAST(m2000 AS DOUBLE) / 2000.0, 6) AS margin
         FROM s JOIN documents d USING (doc_id)
         ORDER BY abs_m2000, d.doc_id LIMIT 20""",
    "docs_probe_cv" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         dims AS (SELECT tf.doc_id, label, tf.doc_id % 2 AS fold, j, x
           FROM tf JOIN lab USING (doc_id)),
         g2f AS (SELECT fold, j,
             CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2f
           FROM dims GROUP BY 1, 2),
         g2a AS (SELECT j, CAST(SUM(g2f) AS BIGINT) AS g2a
           FROM g2f GROUP BY 1),
         m AS (SELECT fold, doc_id, label,
             CAST(SUM(x * (g2a - g2f.g2f)) AS BIGINT) AS margin
           FROM dims JOIN g2f USING (fold, j) JOIN g2a USING (j)
           GROUP BY 1, 2, 3),
         bv AS (SELECT fold, margin,
             CAST(SUM(label) AS BIGINT) AS np_v,
             CAST(SUM(1 - label) AS BIGINT) AS nn_v
           FROM m GROUP BY 1, 2),
         w AS (SELECT fold, np_v, nn_v,
             COALESCE(SUM(nn_v) OVER (PARTITION BY fold ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nn_lt
           FROM bv),
         agg AS (SELECT fold, CAST(SUM(np_v) AS BIGINT) AS n_pos,
             CAST(SUM(nn_v) AS BIGINT) AS n_neg,
             CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS BIGINT) AS u2
           FROM w GROUP BY 1),
         ts AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_fold
           FROM m GROUP BY 1),
         ta AS (SELECT CAST(SUM(n_fold) AS BIGINT) AS n_all FROM ts)
         SELECT agg.fold, CAST(n_all - n_fold AS BIGINT) AS n_train,
           n_pos, n_neg, u2,
           ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
         FROM agg JOIN ts USING (fold), ta ORDER BY fold""",
    "docs_gate_ablation" ->
      """WITH scored AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
           FROM documents),
         keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         losers AS (SELECT DISTINCT v.d2 AS doc_id
                    FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                          FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                                       JOIN sizes s2 ON x.d2 = s2.doc_id) v
                    WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         flags AS (SELECT q.doc_id, n_tok,
             (n_tok >= 10 AND CAST(n_stop AS DOUBLE) / n_tok <= 0.5
               AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.3) AS q_ok,
             q.doc_id IN (SELECT doc_id FROM keepers) AS e_keep,
             q.doc_id IN (SELECT doc_id FROM losers) AS n_drop
           FROM scored q)
         SELECT * FROM (
           SELECT '0_none' AS config, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM flags
           UNION ALL
           SELECT '1_quality', CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN q_ok THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '2_exact', CAST(SUM(CASE WHEN e_keep THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN e_keep THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '3_neardup', CAST(SUM(CASE WHEN NOT n_drop THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN NOT n_drop THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '4_all', CAST(SUM(CASE WHEN q_ok AND e_keep AND NOT n_drop THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN q_ok AND e_keep AND NOT n_drop THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
         ) u ORDER BY config""",
    "docs_rank_fusion" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
           FROM tf JOIN lab USING (doc_id) GROUP BY j),
         s AS (SELECT tf.doc_id,
             CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
           FROM tf LEFT JOIN g USING (j) GROUP BY 1),
         r1 AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY m2000 DESC, doc_id) AS BIGINT) AS r_margin FROM s),
         q AS (SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
           FROM documents),
         r2 AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY ratio DESC, doc_id) AS BIGINT) AS r_quality FROM q)
         SELECT r1.doc_id, r_margin, r_quality,
           ROUND(1.0 / (60.0 + r_margin) + 1.0 / (60.0 + r_quality), 6)
             AS rrf_score
         FROM r1 JOIN r2 USING (doc_id)
         ORDER BY 1.0 / (60.0 + r_margin) + 1.0 / (60.0 + r_quality)
           DESC, r1.doc_id
         LIMIT 20""",
    "docs_pii_scrub" ->
      """WITH inj AS (SELECT lang, text ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
                       '@mail.test please' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' card 4111111111111111 on file' ELSE '' END AS t0
           FROM documents),
         sc AS (SELECT lang, t0, regexp_replace(regexp_replace(t0,
             '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '[0-9]{13,19}', '<NUM>', 'g') AS t2
           FROM inj)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(t2, '<EMAIL>')) - 1) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(string_split(t2, '<NUM>')) - 1) AS BIGINT)
             AS n_nums,
           CAST(SUM(length(t0) - length(t2)) AS BIGINT) AS chars_redacted
         FROM sc GROUP BY 1 ORDER BY lang""",
    "sample_stratified" ->
      """WITH h AS (SELECT lang, source, n_chars,
           (strpos('0123456789abcdef',
              substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
              substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
         FROM documents)
         SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM h WHERE b < CASE WHEN lang = 'en' THEN 64 ELSE 128 END
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "feature_zscore" ->
      """WITH stats AS (
           SELECT event_type, COUNT(*) AS n,
                  SUM(CAST(value AS DECIMAL(28,4))) AS s,
                  SUM(CAST(CAST(value AS DECIMAL(18,4))
                       * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS ss
           FROM events GROUP BY 1)
         SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - CAST(s AS DOUBLE) / n)
             / sqrt(CAST(ss AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
             AS z
         FROM events e JOIN stats USING (event_type)
         WHERE e.event_id < 300
         ORDER BY e.event_id""",
    "dq_profile" ->
      """WITH
         c1 AS (SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           FROM orders),
         c2 AS (SELECT 'o_totalprice', COUNT(*),
           COUNT(*) - COUNT(o_totalprice),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           MIN(o_totalprice), MAX(o_totalprice), NULL, NULL FROM orders),
         c3 AS (SELECT 'o_orderdate', COUNT(*),
           COUNT(*) - COUNT(o_orderdate),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT), NULL, NULL,
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders),
         c4 AS (SELECT 'o_orderpriority', COUNT(*),
           COUNT(*) - COUNT(o_orderpriority),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), NULL, NULL,
           MIN(o_orderpriority), MAX(o_orderpriority) FROM orders),
         c5 AS (SELECT 'o_orderstatus', COUNT(*),
           COUNT(*) - COUNT(o_orderstatus),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), NULL, NULL,
           MIN(o_orderstatus), MAX(o_orderstatus) FROM orders)
         SELECT * FROM c1 UNION ALL SELECT * FROM c2
         UNION ALL SELECT * FROM c3
         UNION ALL SELECT * FROM c4
         UNION ALL SELECT * FROM c5
         ORDER BY "column"""",
    "dq_checks" ->
      """SELECT 'orders_pk_unique' AS check,
           CAST(SUM(n - 1) AS BIGINT) AS n_violations,
           COUNT(*) AS n_checked
         FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
         UNION ALL
         SELECT 'lineitem_fk_orders',
           COUNT(*) FILTER (o.o_orderkey IS NULL), COUNT(*)
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         UNION ALL
         SELECT 'customer_fk_nation',
           COUNT(*) FILTER (n.n_nationkey IS NULL), COUNT(*)
         FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         UNION ALL
         SELECT 'orders_status_domain',
           COUNT(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')), COUNT(*)
         FROM orders
         UNION ALL
         SELECT 'lineitem_qty_range',
           COUNT(*) FILTER (l_quantity IS NULL
             OR l_quantity < 1 OR l_quantity > 50), COUNT(*)
         FROM lineitem
         ORDER BY 1""",
    "split_contamination" ->
      """WITH s AS (SELECT doc_id, md5(substring(text, 1, 64)) AS fp,
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
           FROM documents)
         SELECT a.split AS split_a, b.split AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_leaked_pairs,
           CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_leaked_texts
         FROM s a JOIN s b ON a.fp = b.fp AND a.doc_id < b.doc_id
           AND a.split <> b.split
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "mix_weights" ->
      """WITH per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang),
         pers AS (SELECT lang, n_docs, n_tokens,
             CASE WHEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM per),
         tot AS (SELECT SUM(s) AS z FROM pers)
         SELECT lang, n_docs, n_tokens,
           ROUND(CAST(s AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
           CAST(ROUND(CAST(s * 50000 AS DOUBLE) / CAST(z AS DOUBLE), 0)
             AS BIGINT) AS target_tokens,
           ROUND(CAST(CAST(ROUND(CAST(s * 50000 AS DOUBLE)
               / CAST(z AS DOUBLE), 0) AS BIGINT) AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), 4) AS epochs
         FROM pers, tot ORDER BY lang""",
    "docs_curation_pipeline" ->
      """WITH s AS (SELECT doc_id, source, text, string_split(text, ' ') AS w,
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
         t AS (SELECT doc_id, source, md5(text) AS fp_exact,
             CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM bg)),
         f AS (SELECT t.doc_id, t.source, t.fp_exact, t.n_tok,
             (t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS q_fail,
             (COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10 > COALESCE(tr.n_tri, 0) * 3)
               AS rep_fail,
             (cont.doc_id IS NOT NULL) AS contam
           FROM t LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id)
             LEFT JOIN cont ON t.doc_id = cont.doc_id),
         k AS (SELECT fp_exact, MIN(doc_id) AS keeper_id FROM f
           WHERE NOT q_fail AND NOT rep_fail GROUP BY 1),
         st AS (SELECT f.source, f.n_tok,
             CASE WHEN f.q_fail THEN 'drop_quality'
                  WHEN f.rep_fail THEN 'drop_repetition'
                  WHEN f.doc_id <> k.keeper_id THEN 'drop_duplicate'
                  WHEN f.contam THEN 'drop_contaminated'
                  ELSE 'kept' END AS stage
           FROM f LEFT JOIN k USING (fp_exact))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN stage = 'drop_quality' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_quality,
           CAST(SUM(CASE WHEN stage = 'drop_repetition' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_repetition,
           CAST(SUM(CASE WHEN stage = 'drop_duplicate' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_duplicate,
           CAST(SUM(CASE WHEN stage = 'drop_contaminated' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_contaminated,
           CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN stage = 'kept' THEN n_tok ELSE 0 END)
             AS BIGINT) AS kept_tokens,
           (CAST(SUM(CASE WHEN stage = 'kept' THEN n_tok ELSE 0 END)
             AS BIGINT) + 255) // 256 AS n_windows
         FROM st GROUP BY source ORDER BY source""",
    "mix_apply" ->
      """WITH d AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         pl AS (SELECT lang, SUM(n_tok) AS n_tokens FROM d GROUP BY 1),
         pls AS (SELECT lang, n_tokens,
             CASE WHEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM pl),
         zt AS (SELECT SUM(s) AS z FROM pls),
         r AS (SELECT lang, n_tokens,
             (50000 * s) // z AS target_tokens,
             ((50000 * s) // z) // n_tokens AS n_full,
             ((50000 * s) // z) % n_tokens AS rem
           FROM pls, zt),
         c AS (SELECT d.lang, d.n_tok, r.n_tokens, r.target_tokens,
             r.n_full + CASE WHEN
               CAST(CAST(('0x' || substr(md5('mix:' ||
                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS HUGEINT)
                 * CAST(r.n_tokens AS HUGEINT)
               < CAST(r.rem AS HUGEINT) * 4294967296
               THEN 1 ELSE 0 END AS copies
           FROM d JOIN r USING (lang))
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
           CAST(SUM(copies) AS BIGINT) AS n_sampled_rows,
           CAST(SUM(copies * n_tok) AS BIGINT) AS sampled_tokens
         FROM c GROUP BY lang ORDER BY lang""",
    "docs_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang, substr(md5(word), 1, 2) AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                 FROM documents)),
         raw AS (SELECT b, COUNT(*) AS rb FROM tok GROUP BY 1),
         tgt AS (SELECT b, COUNT(*) AS tb FROM tok WHERE lang = 'en' GROUP BY 1),
         tots AS (SELECT (SELECT SUM(rb) FROM raw) AS r_total,
                         (SELECT COALESCE(SUM(tb), 0) FROM tgt) AS t_total),
         w AS (SELECT raw.b,
             CAST(ln(CAST(COALESCE(tb, 0) + 1 AS DOUBLE)
                     / CAST(t_total + 256 AS DOUBLE))
                - ln(CAST(rb + 1 AS DOUBLE)
                     / CAST(r_total + 256 AS DOUBLE))
               AS DECIMAL(28,12)) AS wv
           FROM raw LEFT JOIN tgt USING (b), tots),
         per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             ROUND(CAST(SUM(wv) AS DOUBLE) / COUNT(*), 6) AS dsir_score
           FROM tok JOIN w USING (b) GROUP BY 1)
         SELECT d.doc_id, d.lang, n_tok, dsir_score
         FROM per JOIN documents d USING (doc_id)
         ORDER BY dsir_score DESC, doc_id LIMIT 20""",
    "docs_length_histogram" ->
      """WITH h AS (SELECT lang,
             CAST(length(bin(n_chars)) - 1 AS INTEGER) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM documents GROUP BY 1, 2)
         SELECT lang, bucket, (CAST(1 AS BIGINT) << bucket) AS bucket_lo,
           n_docs, total_chars,
           ROUND(CAST(n_docs AS DOUBLE) /
             CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
         FROM h ORDER BY lang, bucket""",
    "docs_quality_quantile" ->
      """WITH base AS (SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         med AS (SELECT source, quantile_cont(n_tok, 0.5) AS median_tok
           FROM base GROUP BY 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(ANY_VALUE(median_tok), 1) AS median_tok,
           CAST(SUM(CASE WHEN n_tok >= median_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN n_tok < median_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped
         FROM base JOIN med USING (source)
         GROUP BY source ORDER BY source""",
    "docs_quota_sample" ->
      """SELECT source, rk, doc_id, n_chars FROM (
           SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS rk
           FROM documents) t
         WHERE rk <= 10 ORDER BY source, rk""",
    "feature_robust_outliers" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
         med AS (SELECT event_type, quantile_cont(v, 0.5) AS med
                 FROM ev GROUP BY 1),
         stats AS (SELECT e.event_type, ANY_VALUE(m.med) AS med,
             quantile_cont(abs(e.v - m.med), 0.5) AS mad
           FROM ev e JOIN med m USING (event_type) GROUP BY 1)
         SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(s.med), 4) AS median_v,
           ROUND(ANY_VALUE(s.mad), 4) AS mad,
           CAST(SUM(CASE WHEN abs(e.v - s.med) > 3 * 1.4826 * s.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM ev e JOIN stats s USING (event_type)
         GROUP BY 1 ORDER BY 1""",
    // docs_semantic_quality: anchor means mirror sim_label_centroids'
    // decimal-sum-then-one-double-division convention; dot products and
    // norms accumulate as DECIMAL(38,15) in both engines so no float sum
    // depends on evaluation order; dim index bases differ (0 vs 1) but
    // each engine joins its own dims to its own anchor consistently
    "docs_semantic_quality" ->
      """WITH dims AS (SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
           FROM embeddings),
         anchor AS (SELECT d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*) AS c
           FROM dims WHERE label = 0 GROUP BY d),
         sc AS (SELECT vec_id,
             CAST(SUM(CAST(CAST(v AS DOUBLE) * c AS DECIMAL(38,15)))
               AS DOUBLE) AS dot,
             CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
               AS DECIMAL(38,15))) AS DOUBLE) AS na2
           FROM dims JOIN anchor USING (d) GROUP BY vec_id),
         cn AS (SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,15))) AS DOUBLE)
             AS nc2 FROM anchor)
         SELECT vec_id AS doc_id, lang, source,
           ROUND(dot / (sqrt(na2) * sqrt(nc2)), 4) AS score
         FROM sc, cn JOIN documents ON vec_id = doc_id
         ORDER BY dot / (sqrt(na2) * sqrt(nc2)) DESC, doc_id LIMIT 20""",
    "docs_loo_influence" ->
      """WITH sp AS (SELECT doc_id, source, text,
             CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         trw AS (SELECT source, word FROM (
             SELECT source, unnest(string_split(text, ' ')) AS word
             FROM sp WHERE split = 'train') t WHERE word <> ''),
         csw AS (SELECT word, source, CAST(COUNT(*) AS BIGINT) AS cs
           FROM trw GROUP BY 1, 2),
         cw AS (SELECT word, CAST(SUM(cs) AS BIGINT) AS c
           FROM csw GROUP BY 1),
         nv AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all,
             CAST(COUNT(*) AS BIGINT) AS v_all FROM cw),
         ps AS (SELECT s.source, CAST(SUM(s.cs) AS BIGINT) AS n_s,
             CAST(SUM(CASE WHEN s.cs = c.c THEN 1 ELSE 0 END) AS BIGINT)
               AS v_excl
           FROM csw s JOIN cw c USING (word) GROUP BY 1),
         ho AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS m FROM (
             SELECT unnest(string_split(text, ' ')) AS word
             FROM sp WHERE split = 'test') t
           WHERE word <> '' GROUP BY 1),
         mt AS (SELECT CAST(SUM(m) AS BIGINT) AS m_tot FROM ho),
         grid AS (SELECT p.source, h.m,
             COALESCE(c.c, 0) - COALESCE(s.cs, 0) AS c_loo,
             nv.n_all - p.n_s AS n_loo, nv.v_all - p.v_excl AS v_loo
           FROM ho h CROSS JOIN ps p
           LEFT JOIN cw c ON h.word = c.word
           LEFT JOIN csw s ON h.word = s.word AND p.source = s.source,
           nv),
         lo AS (SELECT source,
             SUM(m * CAST(-ln(CAST(c_loo + 1 AS DOUBLE)
               / CAST(n_loo + v_loo AS DOUBLE)) AS DECIMAL(28,12)))
               AS nll_sum
           FROM grid GROUP BY 1),
         base AS (SELECT
             SUM(m * CAST(-ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
               / CAST(nv.n_all + nv.v_all AS DOUBLE)) AS DECIMAL(28,12)))
               AS base_sum
           FROM ho h LEFT JOIN cw c ON h.word = c.word, nv)
         SELECT l.source, p.n_s AS n_tokens_removed,
           p.v_excl AS v_exclusive,
           ROUND(CAST(l.nll_sum AS DOUBLE) / m_tot, 6) AS mean_nll_loo,
           ROUND(CAST(l.nll_sum - base_sum AS DOUBLE) / m_tot, 6)
             AS delta_nll
         FROM lo l JOIN ps p USING (source), mt, base
         ORDER BY l.source""",
    "dq_reconciliation" ->
      """WITH detail AS (SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS s_c
           FROM lineitem GROUP BY 1),
         o AS (SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS t_c
           FROM orders),
         j AS (SELECT o.o_orderstatus, o.t_c, d.s_c,
             ABS(o.t_c - COALESCE(d.s_c, 0)) AS diff
           FROM o LEFT JOIN detail d ON o.o_orderkey = d.l_orderkey)
         SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN s_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_lines,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 100 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 10 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 2 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_50pct,
           ROUND(CAST(SUM(CASE WHEN s_c IS NOT NULL THEN
               CAST(CAST(diff AS DOUBLE) / CAST(t_c AS DOUBLE)
                 AS DECIMAL(18,9)) END) AS DOUBLE)
             / SUM(CASE WHEN s_c IS NOT NULL THEN 1 ELSE 0 END), 6)
             AS mean_rel_diff
         FROM j GROUP BY 1 ORDER BY 1""",
    "dq_referential" ->
      """WITH lk AS (SELECT CAST(l_orderkey AS VARCHAR) || ':'
             || CAST(l_linenumber AS VARCHAR) AS lk FROM lineitem),
         checks AS (
           SELECT 'pk_orders' AS check_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
               HAVING COUNT(*) > 1) z) AS n_violations
           UNION ALL
           SELECT 'pk_customer',
             (SELECT COUNT(*) FROM customer),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'pk_part',
             (SELECT COUNT(*) FROM part),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM part GROUP BY p_partkey
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'pk_lineitem_composite',
             (SELECT COUNT(*) FROM lk),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM lk GROUP BY lk
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'fk_lineitem_orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           UNION ALL
           SELECT 'fk_lineitem_part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
           UNION ALL
           SELECT 'fk_lineitem_supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
           UNION ALL
           SELECT 'fk_orders_customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           UNION ALL
           SELECT 'fk_customer_nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (
               SELECT 1 FROM nation n
               WHERE n.n_nationkey = c.c_nationkey)))
         SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS ok
         FROM checks ORDER BY check_name""",
    "sample_balanced" ->
      """WITH k AS (SELECT MIN(n) AS k FROM (
             SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1) z),
         r AS (SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5('balance:' || CAST(doc_id AS VARCHAR)),
                 doc_id) AS BIGINT) AS rk
           FROM documents)
         SELECT lang, rk, doc_id FROM r, k WHERE rk <= k
         ORDER BY lang, rk""",
    "dq_psi_drift" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         base AS (SELECT CASE WHEN ts < t0 + INTERVAL 15 DAY
               THEN 1 ELSE 2 END AS half,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0 WHERE value IS NOT NULL),
         hist AS (SELECT c, COUNT(*) AS n FROM base WHERE half = 1
           GROUP BY 1),
         cdf AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT COUNT(*) AS n1 FROM base WHERE half = 1),
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
         pb AS (SELECT s.bucket, n_ref, n_cur, p_ref, p_cur,
             CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               CAST((p_cur - p_ref) * ln(p_cur / p_ref)
                 AS DECIMAL(28,12)) END AS contrib
           FROM spine s LEFT JOIN pr1 ON s.bucket = pr1.bucket
           LEFT JOIN pr2 ON s.bucket = pr2.bucket),
         psis AS (SELECT SUM(contrib) AS psi_sum FROM pb)
         SELECT bucket, COALESCE(n_ref, 0) AS n_ref,
           COALESCE(n_cur, 0) AS n_cur,
           ROUND(COALESCE(p_ref, 0), 6) AS p_ref,
           ROUND(COALESCE(p_cur, 0), 6) AS p_cur,
           ROUND(CAST(contrib AS DOUBLE), 6) AS contrib,
           ROUND(CAST(psi_sum AS DOUBLE), 6) AS psi_total
         FROM pb, psis ORDER BY bucket""",
    "dq_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice
               * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice > 0),
         hist AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
           GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM d),
         pd AS (SELECT s.digit, COALESCE(n, 0) AS n, n_tot,
             log10(1 + 1.0 / s.digit) AS p_exp
           FROM (SELECT CAST(k AS INT) AS digit FROM range(1, 10) t(k)) s
           LEFT JOIN hist ON s.digit = hist.digit CROSS JOIN tot),
         pc AS (SELECT *,
             CAST((n - n_tot * p_exp) * (n - n_tot * p_exp)
               / (n_tot * p_exp) AS DECIMAL(28,12)) AS contrib
           FROM pd),
         c2 AS (SELECT SUM(contrib) AS chi2_sum FROM pc)
         SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / n_tot, 6) AS p_obs,
           ROUND(p_exp, 6) AS p_exp,
           ROUND(CAST(contrib AS DOUBLE), 6) AS chi2_contrib,
           ROUND(CAST(chi2_sum AS DOUBLE), 6) AS chi2_total
         FROM pc, c2 ORDER BY digit""",
    "dq_candidate_keys" ->
      """WITH c1 AS (SELECT 'o_orderkey' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(cnt) AS BIGINT) AS mx
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)),
         c2 AS (SELECT 'o_custkey', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey)),
         c3 AS (SELECT 'o_orderdate', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderdate)),
         c4 AS (SELECT 'o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_totalprice)),
         c5 AS (SELECT 'o_custkey,o_orderdate', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_custkey, o_orderdate)),
         c6 AS (SELECT 'o_custkey,o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_custkey, o_totalprice)),
         c7 AS (SELECT 'o_orderdate,o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_orderdate, o_totalprice)),
         u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
           UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
           UNION ALL SELECT * FROM c5 UNION ALL SELECT * FROM c6
           UNION ALL SELECT * FROM c7),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
         SELECT candidate, n_rows, n AS n_distinct,
           n_rows - n AS dup_rows, mx AS max_group,
           ROUND(CAST(n AS DOUBLE) / n_rows, 6) AS uniqueness,
           n = n_rows AS is_key
         FROM u, t ORDER BY candidate""",
    "sample_neyman_alloc" ->
      """WITH mom AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
           FROM documents GROUP BY 1),
         m2 AS (SELECT lang, nh,
             CASE WHEN nh > 1 THEN
               sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)
                 / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)))
             ELSE 0.0 END AS sh
           FROM mom),
         m3 AS (SELECT *, CAST(CAST(nh AS DOUBLE) * sh AS DECIMAL(28,12))
             AS w FROM m2),
         tot AS (SELECT CAST(SUM(nh) AS BIGINT) AS n_pop, SUM(w) AS wt
           FROM m3),
         alloc AS (SELECT lang, nh, sh,
             100 * CAST(nh AS DOUBLE) / n_pop AS n_prop,
             100 * CAST(w AS DOUBLE) / CAST(wt AS DOUBLE) AS n_ney,
             n_pop
           FROM m3, tot),
         vt AS (SELECT *,
             CAST(CAST(nh AS DOUBLE) * nh * sh * sh
               / (n_prop * CAST(n_pop AS DOUBLE) * n_pop)
               AS DECIMAL(28,12)) AS vp,
             CAST(CASE WHEN n_ney > 0 THEN
                 CAST(nh AS DOUBLE) * nh * sh * sh
                   / (n_ney * CAST(n_pop AS DOUBLE) * n_pop)
               ELSE 0.0 END AS DECIMAL(28,12)) AS vn
           FROM alloc),
         vs AS (SELECT SUM(vp) AS var_prop, SUM(vn) AS var_ney FROM vt)
         SELECT lang, nh, ROUND(sh, 6) AS s_h,
           ROUND(n_prop, 6) AS n_prop, ROUND(n_ney, 6) AS n_neyman,
           ROUND(CAST(var_prop AS DOUBLE), 6) AS var_prop,
           ROUND(CAST(var_ney AS DOUBLE), 6) AS var_neyman,
           ROUND(CAST(var_ney AS DOUBLE) / CAST(var_prop AS DOUBLE), 6)
             AS efficiency
         FROM vt, vs ORDER BY lang""",
    "dq_pchart" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null
           FROM events GROUP BY 1),
         pooled AS (SELECT CAST(SUM(n_null) AS BIGINT) AS tx,
             CAST(SUM(n) AS BIGINT) AS tn FROM daily)
         SELECT strftime(day, '%Y-%m-%d') AS day, n, n_null,
           ROUND(CAST(n_null AS DOUBLE) / n, 6) AS rate,
           ROUND(CAST(tx AS DOUBLE) / tn, 6) AS center,
           ROUND(GREATEST(0.0, CAST(tx AS DOUBLE) / tn
             - 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
               * (1.0 - CAST(tx AS DOUBLE) / tn) / n)), 6) AS lcl,
           ROUND(LEAST(1.0, CAST(tx AS DOUBLE) / tn
             + 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
               * (1.0 - CAST(tx AS DOUBLE) / tn) / n)), 6) AS ucl,
           (CAST(n_null AS DOUBLE) / n > CAST(tx AS DOUBLE) / tn
              + 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
                * (1.0 - CAST(tx AS DOUBLE) / tn) / n)
            OR CAST(n_null AS DOUBLE) / n < CAST(tx AS DOUBLE) / tn
              - 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
                * (1.0 - CAST(tx AS DOUBLE) / tn) / n))
             AS out_of_control
         FROM daily, pooled ORDER BY day""",
    "docs_skyline_pareto" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS types,
             CAST(SUM(c) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
         pq AS (SELECT *, CAST(CAST(types AS DOUBLE) / n_tokens
             AS DECIMAL(18,9)) AS ttr FROM pd),
         sk AS (SELECT *, MAX(ttr) OVER (
             ORDER BY n_tokens DESC, ttr DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_prev FROM pq),
         fr AS (SELECT * FROM sk
           WHERE best_prev IS NULL OR ttr > best_prev)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
             AS INT) AS rank,
           doc_id, n_tokens, types,
           ROUND(CAST(ttr AS DOUBLE), 6) AS ttr
         FROM fr ORDER BY rank""",
    "dq_fd_discovery" -> {
      // 12 directed column pairs share one census shape — generated from
      // one template so the pair bodies cannot drift apart
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate")
      def fd(a: String, b: String): String =
        s"""SELECT '$a' AS determinant, '$b' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(SUM(sz - best) AS BIGINT) AS g3_rows,
             ROUND(CAST(SUM(sz - best) AS DOUBLE)
               / (SELECT COUNT(*) FROM orders), 6) AS g3_rate,
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS holds
           FROM (SELECT det, COUNT(*) AS n_dep, SUM(cnt) AS sz,
               MAX(cnt) AS best
             FROM (SELECT CAST($a AS VARCHAR) AS det,
                 CAST($b AS VARCHAR) AS dep, COUNT(*) AS cnt
               FROM o GROUP BY 1, 2) ab
             GROUP BY det) g"""
      val pairs = (for { a <- cols; b <- cols if a != b } yield fd(a, b))
        .mkString("\n         UNION ALL ")
      s"""WITH o AS (SELECT o_custkey, o_orderstatus, o_orderpriority,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
           FROM orders)
         $pairs
         ORDER BY determinant, dependent"""
    },
    "dq_rowhash_rollup" -> {
      // 48-bit value of the first 12 md5 hex nibbles, one term per
      // nibble — generated so the positional weights cannot drift
      val hexVal = (0 until 12).map { i =>
        s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * " +
          (1L << (4 * (11 - i)))
      }.mkString(" + ")
      s"""WITH rows0 AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             md5(CAST(o_orderkey AS VARCHAR) || '|'
               || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus
               || '|' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 AS VARCHAR)
               || '|' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               || '|' || o_orderpriority) AS h
           FROM orders),
         hashed AS (SELECT day, CAST($hexVal AS BIGINT) AS rh
           FROM rows0),
         perday AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(rh) AS BIGINT) AS hash_xor
           FROM hashed GROUP BY 1),
         allr AS (SELECT 'ALL' AS day, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(rh) AS BIGINT) AS hash_xor FROM hashed)
         SELECT * FROM perday UNION ALL SELECT * FROM allr
         ORDER BY day"""
    },
    // sample_monetary_unit: the oracle's cumsum is the textbook
    // single-partition window (fine in DuckDB); the Spark side runs the
    // bucketed two-pass exactCumsum — hash equality proves the kernel
    "sample_monetary_unit" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         cum AS (SELECT o_orderkey, o_orderpriority, c,
             SUM(CAST(c AS DECIMAL(38,0))) OVER (ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM o),
         tot AS (SELECT SUM(CAST(c AS DECIMAL(38,0))) AS t FROM o),
         iv AS (SELECT t, CAST(FLOOR(CAST(t AS DOUBLE) / 50) AS BIGINT)
             AS iv FROM tot),
         sp AS (SELECT iv, CAST(FLOOR(iv / 2) AS BIGINT) AS s FROM iv),
         pts AS (SELECT CAST(s + j * iv AS DECIMAL(38,0)) AS p
           FROM sp, generate_series(0, 49) g(j)),
         hits AS (SELECT m.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_points_hit,
             CAST(COUNT(DISTINCT m.o_orderkey) AS BIGINT)
               AS n_selected_orders
           FROM cum m JOIN pts ON pts.p > m.cum - m.c
             AND pts.p <= m.cum
           GROUP BY 1),
         book AS (SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(c AS DECIMAL(38,0))) AS book_cents
           FROM o GROUP BY 1)
         SELECT b.o_orderpriority, b.n_orders,
           CAST(b.book_cents AS BIGINT) AS book_cents,
           ROUND(CAST(b.book_cents AS DOUBLE) / CAST(t AS DOUBLE), 6)
             AS book_share,
           COALESCE(h.n_points_hit, 0) AS n_points_hit,
           COALESCE(h.n_selected_orders, 0) AS n_selected_orders,
           ROUND(CAST(COALESCE(h.n_points_hit, 0) AS DOUBLE) / 50.0, 6)
             AS point_share
         FROM book b LEFT JOIN hits h USING (o_orderpriority)
         CROSS JOIN tot
         ORDER BY b.o_orderpriority""",
    "sample_systematic" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
         pop AS (SELECT 'population' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM d),
         sysr AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY
             md5('sys:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM d),
         syss AS (SELECT 'systematic' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM sysr
           WHERE rk % 10 = 1),
         convr AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY doc_id)
             AS rk FROM d),
         nt AS (SELECT COUNT(*) AS nt FROM d),
         conv AS (SELECT 'convenience' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM convr, nt
           WHERE rk <= (nt + 9) // 10),
         u AS (SELECT * FROM pop UNION ALL SELECT * FROM syss
           UNION ALL SELECT * FROM conv),
         pm AS (SELECT CAST(s AS DOUBLE) / n AS pm FROM pop)
         SELECT method, n, ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_chars,
           ROUND(ABS(CAST(s AS DOUBLE) / n - pm), 4) AS abs_error
         FROM u, pm ORDER BY method""",
    "docs_token_infogain" ->
      """WITH dt AS (SELECT DISTINCT doc_id, lang, token FROM
           (SELECT doc_id, lang, unnest(string_split(text, ' '))
              AS token FROM documents) WHERE token <> ''),
         lt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
           FROM documents GROUP BY 1),
         ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
         head AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
             AS df FROM dt GROUP BY 1 ORDER BY df DESC, token LIMIT 50),
         pres AS (SELECT dt.token, lang, CAST(COUNT(*) AS BIGINT) AS np
           FROM dt JOIN head ON dt.token = head.token GROUP BY 1, 2),
         cells AS (SELECT h.token, l.lang, COALESCE(np, 0) AS np,
             nl - COALESCE(np, 0) AS na
           FROM head h CROSS JOIN lt l
           LEFT JOIN pres p ON p.token = h.token AND p.lang = l.lang),
         hl AS (SELECT CAST(SUM(CASE WHEN nl > 0 THEN
               CAST(CAST(nl AS DOUBLE) / nd * ln(CAST(nd AS DOUBLE) / nl)
                 AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_lang
           FROM lt, ndt),
         pt AS (SELECT c.token, h.df, ndt.nd,
             CAST(SUM(CASE WHEN np > 0 THEN
               CAST(CAST(np AS DOUBLE) / df * ln(CAST(df AS DOUBLE) / np)
                 AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_pres,
             CAST(SUM(CASE WHEN na > 0 THEN
               CAST(CAST(na AS DOUBLE) / (nd - df)
                 * ln(CAST(nd - df AS DOUBLE) / na) AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_abs
           FROM cells c JOIN head h ON c.token = h.token, ndt
           GROUP BY 1, 2, 3),
         ig AS (SELECT token, df,
             h_lang - (CAST(df AS DOUBLE) / nd * h_pres
               + CAST(nd - df AS DOUBLE) / nd * h_abs) AS ig
           FROM pt, hl),
         rk AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY ig DESC, token)
             AS INT) AS rk, token, df, ig FROM ig)
         SELECT rk, token, df, ROUND(ig, 6) AS info_gain
         FROM rk WHERE rk <= 10 ORDER BY rk""",
  )
}
