package graft.oracles

/** Deduplication-ladder rows over documents.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object DedupOracles {
  private[graft] val sql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY fp""",
    // dedup_cascade: the three standalone tier oracles composed, each
    // tier's pair set restricted to the previous tier's survivors
    "dedup_cascade" ->
      """WITH keep1 AS (SELECT MIN(doc_id) AS doc_id FROM documents
           GROUP BY md5(text)),
         surv1 AS (SELECT doc_id FROM documents
           WHERE doc_id IN (SELECT doc_id FROM keep1)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i,
             MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
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
                       JOIN sh b ON c.d2 = b.doc_id
                         AND a.shingle = b.shingle
           GROUP BY 1, 2),
         mhp AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         p2 AS (SELECT d1, d2 FROM mhp
           WHERE d1 IN (SELECT doc_id FROM surv1)
             AND d2 IN (SELECT doc_id FROM surv1)),
         losers2 AS (SELECT DISTINCT d2 AS doc_id FROM p2),
         surv2 AS (SELECT doc_id FROM surv1
           WHERE doc_id NOT IN (SELECT doc_id FROM losers2)),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1)
               * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1))
               - 1)) % 64 AS bucket,
             COUNT(*) AS c
           FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
           FROM cand c JOIN tf a ON c.d1 = a.doc_id
                       JOIN tf b ON c.d2 = b.doc_id
                         AND a.bucket = b.bucket
           GROUP BY 1, 2),
         cosp AS (SELECT d1, d2 FROM dot
           JOIN norms n1 ON d1 = n1.doc_id
           JOIN norms n2 ON d2 = n2.doc_id
           WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE))
               * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9),
         p3 AS (SELECT d1, d2 FROM cosp
           WHERE d1 IN (SELECT doc_id FROM surv2)
             AND d2 IN (SELECT doc_id FROM surv2)),
         losers3 AS (SELECT DISTINCT d2 AS doc_id FROM p3),
         c AS (SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_all,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv1) AS n_s1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p2) AS n_p2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM losers2) AS n_l2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv2) AS n_s2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p3) AS n_p3,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM losers3) AS n_l3)
         SELECT stage, candidates_in, n_pairs, n_removed, survivors,
           ROUND(CAST(n_removed AS DOUBLE)
             / CAST(candidates_in AS DOUBLE), 6) AS removal_rate
         FROM (
           SELECT '1_exact' AS stage, n_all AS candidates_in,
             n_all - n_s1 AS n_pairs, n_all - n_s1 AS n_removed,
             n_s1 AS survivors FROM c
           UNION ALL
           SELECT '2_minhash', n_s1, n_p2, n_l2, n_s2 FROM c
           UNION ALL
           SELECT '3_cosine', n_s2, n_p3, n_l3, n_s2 - n_l3 FROM c) u
         ORDER BY stage""",
    "dedup_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (n1 + n2 - i), 3) AS jaccard
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5
         ORDER BY d1, d2""",
    "dedup_containment" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT d1, d2,
           CASE WHEN n1 <= n2 THEN d1 ELSE d2 END AS contained_doc,
           ROUND(CAST(i AS DOUBLE) / LEAST(n1, n2), 3) AS containment
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / LEAST(n1, n2) >= 0.8
         ORDER BY d1, d2""",
    "dedup_minhash_calibration" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
         slots AS (SELECT c.d1, c.d2,
             CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
               AS slots_eq
           FROM cand c JOIN mh a ON c.d1 = a.doc_id
                       JOIN mh b ON c.d2 = b.doc_id AND a.i = b.i
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2)
         SELECT v.d1, v.d2, sl.slots_eq,
           ROUND(CAST(sl.slots_eq AS DOUBLE) / 9, 3) AS est_jaccard,
           ROUND(CAST(v.i AS DOUBLE) / (v.n1 + v.n2 - v.i), 3)
             AS exact_jaccard,
           ROUND(abs(CAST(sl.slots_eq AS DOUBLE) / 9 -
             CAST(v.i AS DOUBLE) / (v.n1 + v.n2 - v.i)), 3) AS abs_err
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         JOIN slots sl ON v.d1 = sl.d1 AND v.d2 = sl.d2
         ORDER BY v.d1, v.d2""",
    "dedup_minhash_lsh" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
                   GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (n1 + n2 - i), 3) AS jaccard
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5
         ORDER BY d1, d2""",
    "dedup_embedding_cosine" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2)
         SELECT d1 AS keeper, d2 AS dup,
           ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))), 4) AS cos
         FROM dot JOIN norms n1 ON d1 = n1.doc_id JOIN norms n2 ON d2 = n2.doc_id
         WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9
         ORDER BY keeper, dup""",
    "dedup_cosine_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2),
         scored AS (SELECT d1, d2,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))
               AS cos
           FROM dot JOIN norms n1 ON d1 = n1.doc_id
                    JOIN norms n2 ON d2 = n2.doc_id),
         sw AS (SELECT s.*, t.threshold
                FROM scored s, unnest([0.80, 0.90, 0.95, 0.99]) t(threshold)
                WHERE s.cos >= t.threshold)
         SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT d2) AS BIGINT) AS n_dup_docs,
           ROUND(MIN(cos), 4) AS min_cos,
           ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 4) AS avg_cos
         FROM sw GROUP BY 1 ORDER BY threshold""",
    "dedup_simhash" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
                    FROM documents),
         h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
         bits AS (
           SELECT doc_id, j,
             SUM(CASE WHEN ((strpos('0123456789abcdef',
                               substr(hx, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   // (CASE CAST(j % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4
                       WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                 THEN 1 ELSE -1 END) AS s
           FROM h CROSS JOIN range(64) t(j) GROUP BY doc_id, j)
         SELECT doc_id, simhash, substr(simhash, 1, 16) AS bucket16 FROM (
           SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
           FROM bits GROUP BY doc_id) z
         ORDER BY doc_id""",
    "dedup_clusters" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node)
         SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
         FROM walk GROUP BY node ORDER BY node""",
    "dedup_source_matrix" ->
      """WITH docs AS (SELECT md5(substr(text, 1, 64)) AS fp, doc_id,
             source
           FROM documents),
         keepers AS (SELECT fp, MIN(doc_id) AS keeper_id
           FROM docs GROUP BY 1)
         SELECT kd.source AS keeper_source, d.source AS dup_source,
           COUNT(*) AS n_dup_copies,
           CAST(COUNT(DISTINCT d.fp) AS BIGINT) AS n_texts
         FROM docs d
         JOIN keepers k ON d.fp = k.fp AND d.doc_id <> k.keeper_id
         JOIN docs kd ON kd.doc_id = k.keeper_id
         GROUP BY 1, 2 ORDER BY keeper_source, dup_source""",
    "dedup_bitext_mine" ->
      """WITH vn AS (SELECT e.vec_id, d.lang,
             list_transform(e.embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
               AS qe
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         vq AS (SELECT vec_id, lang, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT)
               AS nsq
           FROM vn),
         dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':'
                 || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1
               THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
               THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
               ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         lb AS (SELECT b.band, b.bucket, b.vec_id, vq.lang
           FROM bands b JOIN vq ON vq.vec_id = b.vec_id),
         okb AS (SELECT band, bucket FROM lb GROUP BY 1, 2
           HAVING COUNT(*) BETWEEN 2 AND 64),
         posting AS (SELECT lb.* FROM lb JOIN okb
           USING (band, bucket)),
         cand AS (SELECT DISTINCT a.lang AS lang_a, b.lang AS lang_b,
             a.vec_id AS v1, b.vec_id AS v2
           FROM posting a JOIN posting b USING (band, bucket)
           WHERE a.lang < b.lang),
         scored AS (SELECT lang_a, lang_b, v1, v2,
             CAST(CAST(list_dot_product(x.qe, y.qe) AS BIGINT)
                 AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE))
                 * sqrt(CAST(y.nsq AS DOUBLE))) AS cos
           FROM cand JOIN vq x ON x.vec_id = cand.v1
           JOIN vq y ON y.vec_id = cand.v2),
         surveyed AS (SELECT lang_a, lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
           FROM scored GROUP BY 1, 2),
         mined AS (SELECT lang_a, lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_mined_pairs,
             ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 6) AS mean_cos,
             ROUND(MAX(cos), 6) AS max_cos
           FROM scored WHERE cos >= 0.35 GROUP BY 1, 2),
         topp AS (SELECT lang_a, lang_b, v1 AS top_a, v2 AS top_b
           FROM (SELECT *, ROW_NUMBER() OVER (
               PARTITION BY lang_a, lang_b
               ORDER BY cos DESC, v1, v2) AS rk
             FROM scored WHERE cos >= 0.35) z WHERE rk = 1),
         langs AS (SELECT DISTINCT lang FROM documents),
         spine AS (SELECT a.lang AS lang_a, b.lang AS lang_b
           FROM langs a, langs b WHERE a.lang < b.lang)
         SELECT s.lang_a, s.lang_b,
           COALESCE(n_candidate_pairs, 0) AS n_candidate_pairs,
           COALESCE(n_mined_pairs, 0) AS n_mined_pairs,
           mean_cos, max_cos, top_a, top_b
         FROM spine s
         LEFT JOIN surveyed USING (lang_a, lang_b)
         LEFT JOIN mined USING (lang_a, lang_b)
         LEFT JOIN topp USING (lang_a, lang_b)
         ORDER BY s.lang_a, s.lang_b""",
    "dedup_asymmetry" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         v AS (SELECT x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id),
         b AS (SELECT CAST(i * 2 >= n1 + n2 - i AS BIGINT) AS jac_high,
             CAST(i * 5 >= LEAST(n1, n2) * 4 AS BIGINT) AS cont_high,
             CAST(CAST(LEAST(n1, n2) AS DOUBLE)
               / GREATEST(n1, n2) AS DECIMAL(18,9)) AS size_ratio
           FROM v)
         SELECT jac_high, cont_high, COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(size_ratio) AS DOUBLE) / COUNT(*), 4)
             AS avg_size_ratio
         FROM b GROUP BY 1, 2 ORDER BY jac_high, cont_high""",
    "dedup_shingle_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh3 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz3 AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY 1),
         ok3 AS (SELECT s FROM sh3 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p3 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh3 a JOIN sh3 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok3 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz3 s1 ON x.d1 = s1.doc_id
           JOIN sz3 s2 ON x.d2 = s2.doc_id),
         sh5 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 5
                  THEN [array_to_string(w[i:i+4], ' ')
                        for i in range(1, len(w)-3)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz5 AS (SELECT doc_id, COUNT(*) AS n FROM sh5 GROUP BY 1),
         ok5 AS (SELECT s FROM sh5 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p5 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh5 a JOIN sh5 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok5 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz5 s1 ON x.d1 = s1.doc_id
           JOIN sz5 s2 ON x.d2 = s2.doc_id),
         sh7 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz7 AS (SELECT doc_id, COUNT(*) AS n FROM sh7 GROUP BY 1),
         ok7 AS (SELECT s FROM sh7 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p7 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh7 a JOIN sh7 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok7 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz7 s1 ON x.d1 = s1.doc_id
           JOIN sz7 s2 ON x.d2 = s2.doc_id),
         u AS (SELECT CAST(3 AS BIGINT) AS k, d1, d2, jac FROM p3
           UNION ALL SELECT 5, d1, d2, jac FROM p5
           UNION ALL SELECT 7, d1, d2, jac FROM p7),
         e AS (SELECT k, d1 AS doc, jac FROM u
           UNION ALL SELECT k, d2, jac FROM u)
         SELECT k, CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs_flagged,
           ROUND(CAST(SUM(jac) AS DOUBLE) / COUNT(*), 4) AS avg_jaccard
         FROM e GROUP BY k ORDER BY k""",
    "dedup_threshold_impact" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         v AS (SELECT x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id),
         ts AS (SELECT unnest([CAST(3 AS BIGINT), 5, 7]) AS t10),
         dropped AS (SELECT DISTINCT ts.t10, v.d2 AS doc_id
           FROM v CROSS JOIN ts
           WHERE v.i * 10 >= ts.t10 * (v.n1 + v.n2 - v.i)),
         toks AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         tot AS (SELECT COUNT(*) AS nd, CAST(SUM(n_tok) AS BIGINT) AS nt
           FROM toks)
         SELECT ROUND(CAST(t10 AS DOUBLE) / 10, 1) AS threshold,
           COUNT(*) AS n_dropped_docs,
           CAST(SUM(n_tok) AS BIGINT) AS dropped_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE)
             / (SELECT nt FROM tot), 6) AS token_share_dropped
         FROM dropped JOIN toks USING (doc_id)
         GROUP BY t10 ORDER BY threshold""",
    "dedup_hot_shingles" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh3 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sh5 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 5
                  THEN [array_to_string(w[i:i+4], ' ')
                        for i in range(1, len(w)-3)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sh7 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         df0 AS (SELECT COUNT(*) AS df
           FROM (SELECT md5(substr(text, 1, 64)) AS s FROM documents) f0
           GROUP BY s HAVING COUNT(*) > 1),
         df3 AS (SELECT COUNT(*) AS df FROM sh3 GROUP BY s HAVING COUNT(*) > 1),
         df5 AS (SELECT COUNT(*) AS df FROM sh5 GROUP BY s HAVING COUNT(*) > 1),
         df7 AS (SELECT COUNT(*) AS df FROM sh7 GROUP BY s HAVING COUNT(*) > 1),
         u AS (
           SELECT CAST(0 AS BIGINT) AS k, df FROM df0
           UNION ALL SELECT 3, df FROM df3
           UNION ALL SELECT 5, df FROM df5
           UNION ALL SELECT 7, df FROM df7)
         SELECT k, COUNT(*) AS n_shared_shingles,
           COALESCE(MAX(df), 0) AS max_df,
           CAST(COALESCE(SUM(CAST(df > 64 AS BIGINT)), 0) AS BIGINT)
             AS n_hot_shingles,
           CAST(COALESCE(SUM(CASE WHEN df > 64 THEN df ELSE 0 END), 0)
             AS BIGINT) AS postings_dropped,
           CAST(COALESCE(SUM(CASE WHEN df > 64
             THEN (df * (df - 1)) // 2 ELSE 0 END), 0) AS BIGINT)
             AS pairs_avoided
         FROM u GROUP BY k ORDER BY k""",
    "dedup_cc_agreement" ->
      """WITH RECURSIVE directed AS (SELECT a.label, a.vec_id AS v1,
             b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         edges AS (SELECT v1 AS a, v2 AS b FROM knn
           UNION SELECT v2, v1 FROM knn),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cc AS (SELECT node, MIN(lbl) AS lbl FROM walk GROUP BY node),
         szs AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz
           FROM cc GROUP BY lbl)
         SELECT sz AS cluster_size,
           COUNT(*) AS n_clusters_prop,
           COUNT(*) AS n_clusters_star,
           CAST(0 AS BIGINT) AS n_label_mismatches
         FROM szs GROUP BY sz ORDER BY cluster_size""",
    "dedup_soft_weights" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cc AS (SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
           FROM walk GROUP BY node),
         sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csz
           FROM cc GROUP BY 1),
         d AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         wd AS (SELECT d.source, d.n_tok,
             COALESCE(sz.csz, 1) AS szw,
             CAST(CAST(d.n_tok AS DOUBLE) / COALESCE(sz.csz, 1)
               AS DECIMAL(28,12)) AS eff
           FROM d LEFT JOIN cc USING (doc_id)
             LEFT JOIN sz USING (cluster_id))
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN szw > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clustered,
           CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
           ROUND(CAST(SUM(eff) AS DOUBLE), 4) AS effective_tokens,
           ROUND(1 - CAST(SUM(eff) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS discount
         FROM wd GROUP BY 1 ORDER BY source""",
    "dedup_semdedup" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
           FROM embeddings),
         n AS (SELECT vec_id, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nsq
           FROM q),
         seeds AS (SELECT vec_id AS sid, qe AS se, nsq AS sn
           FROM n ORDER BY vec_id LIMIT 8),
         sims AS (SELECT e.vec_id, s.sid,
             CAST(list_dot_product(e.qe, s.se) AS DOUBLE)
               / (sqrt(CAST(e.nsq AS DOUBLE)) * sqrt(CAST(s.sn AS DOUBLE)))
               AS sim
           FROM n e CROSS JOIN seeds s),
         asg AS (SELECT vec_id, sid AS cid FROM (
             SELECT vec_id, sid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, sid) AS rn FROM sims) WHERE rn = 1),
         members AS (SELECT n.vec_id, a.cid, n.qe, n.nsq
           FROM n JOIN asg a USING (vec_id)),
         pairs AS (SELECT x.cid, x.vec_id AS v1, y.vec_id AS v2,
             CAST(list_dot_product(x.qe, y.qe) AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE)) * sqrt(CAST(y.nsq AS DOUBLE)))
               AS c
           FROM members x JOIN members y
             ON x.cid = y.cid AND x.vec_id < y.vec_id),
         fl AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
             CAST(COUNT(DISTINCT v2) AS BIGINT) AS n_pruned,
             ROUND(MAX(c), 6) AS max_cos
           FROM pairs WHERE c >= 0.35 GROUP BY 1),
         mem AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
           FROM asg GROUP BY 1)
         SELECT mem.cid, n_members,
           COALESCE(n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(n_pruned, 0) AS n_pruned,
           COALESCE(max_cos, 0.0) AS max_cos,
           ROUND(1 - CAST(COALESCE(n_pruned, 0) AS DOUBLE)
             / CAST(n_members AS DOUBLE), 6) AS keep_rate
         FROM mem LEFT JOIN fl USING (cid) ORDER BY cid""",
    "dedup_perm_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(18) t(i) GROUP BY doc_id, i),
         b9 AS (SELECT CAST(9 AS BIGINT) AS n_perms, doc_id, i // 3 AS band,
                  md5(string_agg(h, ',' ORDER BY i)) AS bucket
                FROM mh WHERE i < 9 GROUP BY doc_id, i // 3),
         b18 AS (SELECT CAST(18 AS BIGINT) AS n_perms, doc_id, i // 3 AS band,
                  md5(string_agg(h, ',' ORDER BY i)) AS bucket
                FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.n_perms, x.doc_id AS d1, y.doc_id AS d2
                  FROM (SELECT * FROM b9 UNION ALL SELECT * FROM b18) x
                  JOIN (SELECT * FROM b9 UNION ALL SELECT * FROM b18) y
                    ON x.n_perms = y.n_perms AND x.band = y.band
                       AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
                  HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                     AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM truth)
         SELECT c.n_perms, c.n_perms // 3 AS n_bands,
           CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
           CAST(MAX(nt.n_true_pairs) AS BIGINT) AS n_true_pairs,
           CAST(SUM(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / MAX(nt.n_true_pairs), 6) AS recall
         FROM cand c LEFT JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2,
           nt
         GROUP BY c.n_perms ORDER BY c.n_perms""",
    "dedup_bloom_fpr" ->
      """WITH d AS (SELECT substr(text, 1, 32) AS fp,
             CAST(substr(source, 4, 8) AS INT) AS sn FROM documents),
         c AS (SELECT DISTINCT fp FROM d WHERE sn < 10),
         b AS (SELECT DISTINCT fp FROM d WHERE sn >= 10),
         tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_td
           FROM b JOIN c USING (fp)),
         np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM b)
         SELECT np.n_probes, tp.n_td AS n_bloom_pos,
           tp.n_td AS n_true_dup,
           CAST(0 AS BIGINT) AS n_false_pos,
           np.n_probes - tp.n_td AS n_true_neg,
           CAST(0.0 AS DOUBLE) AS fpr_observed,
           TRUE AS within_design_fpp
         FROM np, tp""",
    "dedup_dup_quality" ->
      """WITH docs AS (SELECT md5(substr(text, 1, 64)) AS fp, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         s AS (SELECT fp,
             CAST(n_uniq AS DOUBLE) / n_tok AS score
           FROM docs WHERE n_tok > 0),
         copies AS (SELECT fp, COUNT(*) AS n_copies FROM s GROUP BY 1)
         SELECT CAST(n_copies > 1 AS BIGINT) AS dup_flag,
           1 + CAST(score >= 0.5 AS BIGINT)
             + CAST(score >= 0.75 AS BIGINT)
             + CAST(score >= 0.9 AS BIGINT) AS band,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_score
         FROM s JOIN copies USING (fp)
         GROUP BY 1, 2 ORDER BY dup_flag, band""",
    "dedup_cluster_census" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cl AS (SELECT node, MIN(lbl) AS cluster_id FROM walk GROUP BY node),
         csizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
           FROM cl GROUP BY 1),
         hist AS (SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_clusters
           FROM csizes GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         cls AS (SELECT CAST(COALESCE(SUM(csize), 0) AS BIGINT)
           AS n_clustered FROM csizes),
         uni AS (SELECT csize, n_clusters FROM hist
           UNION ALL SELECT CAST(1 AS BIGINT), n_total - n_clustered
           FROM tot, cls)
         SELECT csize AS cluster_size, n_clusters,
           CAST(csize * n_clusters AS BIGINT) AS n_docs,
           CAST((csize - 1) * n_clusters AS BIGINT) AS n_dup_docs,
           ROUND(CAST(csize * n_clusters AS DOUBLE) / n_total, 6)
             AS doc_share
         FROM uni, tot ORDER BY cluster_size""",
    "dedup_keep_best" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cl AS (SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
                FROM walk GROUP BY node),
         j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
                 ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                   ORDER BY d.n_chars DESC, cl.doc_id) AS r
               FROM cl JOIN documents d USING (doc_id))
         SELECT j.cluster_id, j.doc_id AS keep_doc_id,
           CAST(j.n_chars AS BIGINT) AS keep_n_chars, m.n_members
         FROM j JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
                      FROM j GROUP BY 1) m USING (cluster_id)
         WHERE j.r = 1 ORDER BY j.cluster_id""",
    "dedup_semantic_clusters" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2)
         SELECT d1, d2
         FROM dot JOIN norms n1 ON d1 = n1.doc_id JOIN norms n2 ON d2 = n2.doc_id
         WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node)
         SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
         FROM walk GROUP BY node ORDER BY node""",
    "dedup_prefix" ->
      """SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
         FROM (SELECT doc_id,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 16),
               ' ')) AS fp
           FROM documents) t
         GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""",
    // dedup_bloom_prefilter: the Bloom stage is a pure prefilter whose
    // candidates are exactly verified, so the final relation is the plain
    // bloom-free exact join below — and that IS the no-false-negative
    // gate: Spark counts n_dup through the Bloom candidates, this oracle
    // counts it without any Bloom, so a filter that drops a true
    // duplicate hash-mismatches
    "dedup_bloom_prefilter" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 32) AS fp, source,
             CAST(substr(source, 4, 8) AS INT) AS sn FROM documents),
         c AS (SELECT DISTINCT fp FROM d WHERE sn < 10),
         b AS (SELECT source, fp FROM d WHERE sn >= 10)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup,
           CAST(COUNT(*) - SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new
         FROM b LEFT JOIN c ON b.fp = c.fp
         GROUP BY source ORDER BY source""",
    // dedup_recall_eval: truth = the ngram-jaccard oracle's pair set,
    // candidates = the minhash oracle's pre-verification cand CTE
    "dedup_recall_eval" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         counts AS (SELECT
             (SELECT COUNT(*) FROM truth) AS n_true,
             (SELECT COUNT(*) FROM cand) AS n_candidates,
             (SELECT COUNT(*) FROM truth t
              WHERE EXISTS (SELECT 1 FROM cand c
                WHERE c.d1 = t.d1 AND c.d2 = t.d2)) AS n_caught)
         SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_caught AS BIGINT) AS n_caught,
           CASE WHEN n_true > 0 THEN
             ROUND(CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
           END AS recall
         FROM counts""",
    // dedup_incremental_minhash: the minhash oracle's machinery with the
    // candidate join restricted to batch x corpus (source-id halves) and
    // a per-batch-doc best-match argmax (jaccard DESC, corpus doc ASC)
    "dedup_incremental_minhash" ->
      OracleGen.incrementalMinhashOracleSql(Seq("sx.sn >= 10 AND sy.sn < 10")),
    "dedup_winnowing_pairs" ->
      """WITH g AS (SELECT doc_id, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fp AS (SELECT DISTINCT doc_id, wkey
           FROM sel WHERE p <= n_grams - 3),
         fpd AS (SELECT DISTINCT doc_id, substr(wkey, 1, 32) AS hash
           FROM fp),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM fpd GROUP BY 1),
         okdf AS (SELECT hash FROM fpd GROUP BY hash
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS n_shared
           FROM fpd a JOIN fpd b
             ON a.hash = b.hash AND a.doc_id < b.doc_id
           JOIN okdf k ON k.hash = a.hash
           GROUP BY 1, 2)
         SELECT d1, d2, n_shared, s1.n AS n1, s2.n AS n2,
           ROUND(CAST(n_shared AS DOUBLE)
             / CAST(s1.n + s2.n - n_shared AS DOUBLE), 6) AS est_jaccard
         FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                    JOIN sizes s2 ON d2 = s2.doc_id
         WHERE n_shared >= 3
         ORDER BY n_shared DESC, d1, d2 LIMIT 10""",
    "dedup_winnowing_eval" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT x.d1, x.d2 FROM inter x
           JOIN sizes s1 ON x.d1 = s1.doc_id
           JOIN sizes s2 ON x.d2 = s2.doc_id
           WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         g AS (SELECT doc_id, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fpw AS (SELECT DISTINCT doc_id, wkey
           FROM sel WHERE p <= n_grams - 3),
         fpd AS (SELECT DISTINCT doc_id, substr(wkey, 1, 32) AS hash
           FROM fpw),
         wok AS (SELECT hash FROM fpd GROUP BY hash
           HAVING COUNT(*) BETWEEN 2 AND 64),
         cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS inter
           FROM fpd a JOIN fpd b
             ON a.hash = b.hash AND a.doc_id < b.doc_id
           JOIN wok k ON k.hash = a.hash
           GROUP BY 1, 2),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         fl AS (SELECT c.inter,
             CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END AS tp,
             th.threshold
           FROM cand c
           LEFT JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2
           CROSS JOIN (SELECT unnest([3, 5, 10]) AS threshold) th
           WHERE c.inter >= th.threshold)
         SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pred, n_truth,
           CAST(SUM(tp) AS BIGINT) AS n_tp,
           ROUND(CAST(SUM(tp) AS DOUBLE) / COUNT(*), 6) AS prec,
           ROUND(CAST(SUM(tp) AS DOUBLE) / n_truth, 6) AS recall
         FROM fl, nt GROUP BY threshold, n_truth
         ORDER BY threshold""",
    "dedup_trigram_cosine" ->
      """WITH tg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id,
               unnest([substr(text, i, 3)
                 for i in range(1, length(text) - 1)]) AS g
             FROM documents WHERE length(text) >= 3) z
           GROUP BY 1, 2),
         norms AS (SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS nsq
           FROM tg GROUP BY 1),
         keep AS (SELECT g FROM tg GROUP BY g
           HAVING COUNT(*) BETWEEN 2 AND 64),
         cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM tg a JOIN tg b ON a.g = b.g AND a.doc_id < b.doc_id
           JOIN keep k ON k.g = a.g),
         dot AS (SELECT c.d1, c.d2,
             CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
           FROM cand c
           JOIN tg a ON a.doc_id = c.d1
           JOIN tg b ON b.doc_id = c.d2 AND b.g = a.g
           GROUP BY 1, 2),
         cs AS (SELECT d1, d2, dot,
             ROUND(CAST(dot AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE))
                 * sqrt(CAST(y.nsq AS DOUBLE))), 6) AS cosine
           FROM dot JOIN norms x ON d1 = x.doc_id
           JOIN norms y ON d2 = y.doc_id)
         SELECT d1, d2, dot, cosine FROM cs WHERE cosine * 100 >= 90
         ORDER BY cosine DESC, d1, d2""",
  )
}
