package graft.oracles

/** Similarity / ANN rows over embeddings.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object SimilarityOracles {
  private[graft] val sql: Map[String, String] = Map(
    "sim_knn_graph" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2, sim FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         rec AS (SELECT x.label, CAST(COUNT(*) AS BIGINT) AS n_recip
                 FROM knn x JOIN knn y ON x.v1 = y.v2 AND x.v2 = y.v1
                 GROUP BY 1)
         SELECT k.label, CAST(COUNT(DISTINCT k.v1) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COALESCE(MAX(r.n_recip), 0) AS BIGINT) AS n_reciprocal,
           ROUND(CAST(SUM(CAST(CAST(k.sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 4) AS avg_sim
         FROM knn k LEFT JOIN rec r ON k.label = r.label
         GROUP BY k.label ORDER BY k.label""",
    "sim_brute_topk" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
         SELECT v.vec_id, v.label,
           ROUND(CAST(list_cosine_similarity(v.embedding, q.e) AS DOUBLE), 4) AS sim
         FROM embeddings v, q WHERE v.vec_id <> 0
         ORDER BY list_cosine_similarity(v.embedding, q.e) DESC, v.vec_id
         LIMIT 10""",
    "sim_label_pairs" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2, a.label,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.30
         ORDER BY v1, v2""",
    "sim_ann_lsh" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
                        generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) - 1)
               % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                      ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END) AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         cand AS (SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         SELECT v1, v2,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS sim
         FROM cand JOIN embeddings a ON v1 = a.vec_id
                   JOIN embeddings b ON v2 = b.vec_id
         ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, v1, v2
         LIMIT 20""",
    "sim_ivf_topk" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
                        generate_subscripts(embedding, 1) AS d FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         q AS (SELECT d, val AS qv FROM dims WHERE vec_id = 0),
         score AS (SELECT cent.label,
             CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
           FROM cent JOIN q USING (d) GROUP BY 1),
         probe AS (SELECT label FROM score ORDER BY s DESC, label LIMIT 2),
         qe AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
         SELECT v.vec_id, v.label,
           ROUND(CAST(list_cosine_similarity(v.embedding, qe.e) AS DOUBLE), 4) AS sim
         FROM embeddings v JOIN probe USING (label), qe
         WHERE v.vec_id <> 0
         ORDER BY list_cosine_similarity(v.embedding, qe.e) DESC, v.vec_id
         LIMIT 10""",
    "sim_pq_adc" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 3),
         ranked AS (SELECT q_id, v.vec_id AS c_id,
             list_cosine_similarity(v.embedding, q_emb) AS s,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(v.embedding, q_emb) DESC,
                        v.vec_id) AS rn
           FROM embeddings v, q WHERE v.vec_id <> q_id)
         SELECT q_id, c_id AS exact_top1,
           ROUND(CAST(s AS DOUBLE), 4) AS exact_top1_sim,
           TRUE AS pq_quality_ok
         FROM ranked WHERE rn = 1 ORDER BY q_id""",
    // composed IVF -> PQ/ADC -> exact-refine serving pipeline: the oracle
    // replays the deterministic exact side (per-query coarse probe +
    // exact top-1 within the probed cells); the PQ quality boolean is the
    // Spark side's to prove (>= 0.8x exact mass, measured ~1.0 since the
    // exact re-rank recovers ADC ordering noise)
    "sim_ivf_pq_topk" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         qd AS (SELECT vec_id AS q_id, d, val AS qv FROM dims WHERE vec_id < 3),
         score AS (SELECT q_id, cent.label,
             CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
           FROM cent JOIN qd USING (d) GROUP BY 1, 2),
         probe AS (SELECT q_id, label FROM (
             SELECT q_id, label,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, label) AS rn
             FROM score) pr WHERE rn <= 2),
         q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 3),
         ranked AS (SELECT p.q_id, v.vec_id AS c_id,
             list_cosine_similarity(v.embedding, q.q_emb) AS s,
             ROW_NUMBER() OVER (PARTITION BY p.q_id
               ORDER BY list_cosine_similarity(v.embedding, q.q_emb) DESC,
                        v.vec_id) AS rn
           FROM embeddings v JOIN probe p USING (label)
           JOIN q ON q.q_id = p.q_id
           WHERE v.vec_id <> p.q_id)
         SELECT q_id, c_id AS ivf_top1,
           ROUND(CAST(s AS DOUBLE), 4) AS ivf_top1_sim,
           TRUE AS pipeline_quality_ok
         FROM ranked WHERE rn = 1 ORDER BY q_id""",
    "sim_batch_topk" ->
      """SELECT q_id, rk, vec_id, label,
         ROUND(CAST(sim_raw AS DOUBLE), 4) AS sim FROM (
           SELECT q.vec_id AS q_id, v.vec_id, v.label,
             list_cosine_similarity(v.embedding, q.embedding) AS sim_raw,
             CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(v.embedding, q.embedding) DESC,
                        v.vec_id) AS BIGINT) AS rk
           FROM embeddings v JOIN embeddings q
             ON v.label = q.label AND q.vec_id < 5 AND v.vec_id <> q.vec_id) t
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "sim_label_centroids" ->
      """SELECT label, d,
           CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c,
           COUNT(*) AS n_vecs
         FROM (SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS d FROM embeddings) t
         WHERE d <= 8 GROUP BY label, d ORDER BY label, d""",
    "sim_contrastive_pairs" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         pos AS (SELECT label,
             CAST(COUNT(*) AS BIGINT) AS n_pos,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 4) AS avg_pos
           FROM (SELECT label, sim, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 1 GROUP BY label),
         nn AS (SELECT COUNT(*) AS n FROM embeddings),
         neg AS (SELECT a.label,
             CAST(COUNT(*) AS BIGINT) AS n_neg,
             ROUND(CAST(SUM(CAST(CAST(
               list_cosine_similarity(a.embedding, b.embedding)
               AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
               AS avg_neg
           FROM embeddings a CROSS JOIN nn
           JOIN embeddings b ON b.vec_id = (a.vec_id * 7 + 13) % nn.n
           WHERE a.label <> b.label
           GROUP BY a.label)
         SELECT p.label, p.n_pos, p.avg_pos, g.n_neg, g.avg_neg,
           ROUND(p.avg_pos - g.avg_neg, 4) AS gap
         FROM pos p JOIN neg g ON p.label = g.label
         ORDER BY p.label""",
    "sim_mips_augment" ->
      """WITH xq AS (SELECT vec_id, j,
             CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
           FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS j,
                   unnest(embedding) AS x
                 FROM embeddings)),
         q AS (SELECT vec_id AS qid FROM embeddings
           ORDER BY vec_id LIMIT 3),
         qc AS (SELECT q.qid, x.j, x.xq AS qx
           FROM xq x JOIN q ON x.vec_id = q.qid),
         dots AS (SELECT c.qid, x.vec_id, SUM(c.qx * x.xq) AS dot
           FROM xq x JOIN qc c ON x.j = c.j
           WHERE x.vec_id <> c.qid GROUP BY 1, 2),
         norms AS (SELECT vec_id, SUM(xq * xq) AS nsq
           FROM xq GROUP BY 1),
         m AS (SELECT MAX(nsq) AS m2 FROM norms),
         ra AS (SELECT qid, vec_id, dot, ROW_NUMBER() OVER
             (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rk
           FROM dots),
         rb AS (SELECT d.qid, d.vec_id, ROW_NUMBER() OVER
             (PARTITION BY d.qid ORDER BY
               CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(dn.nsq AS DOUBLE)
                    + sqrt(CAST(m.m2 - dn.nsq AS DOUBLE))
                      * sqrt(CAST(m.m2 - dn.nsq AS DOUBLE)))
                  * sqrt(CAST(n2.nsq AS DOUBLE))) DESC, d.vec_id) AS rk
           FROM dots d
           JOIN norms n2 ON d.qid = n2.vec_id
           JOIN norms dn ON d.vec_id = dn.vec_id, m),
         agree AS (SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_agree
           FROM ra a JOIN rb b
             ON a.qid = b.qid AND a.vec_id = b.vec_id AND b.rk <= 10
           WHERE a.rk <= 10 GROUP BY 1),
         t1 AS (SELECT qid, vec_id AS top1_vec,
             ROUND(CAST(dot AS DOUBLE) / 1e12, 6) AS top1_ip
           FROM ra WHERE rk = 1)
         SELECT g.qid, g.n_agree, t1.top1_vec, t1.top1_ip
         FROM agree g JOIN t1 ON g.qid = t1.qid ORDER BY g.qid""",
    "sim_hnsw_levels" ->
      """WITH lv AS (SELECT CASE WHEN b = 0 THEN 8
             WHEN b % 2 = 1 THEN 0 WHEN b % 4 = 2 THEN 1
             WHEN b % 8 = 4 THEN 2 WHEN b % 16 = 8 THEN 3
             WHEN b % 32 = 16 THEN 4 WHEN b % 64 = 32 THEN 5
             WHEN b % 128 = 64 THEN 6 ELSE 7 END AS level
           FROM (SELECT (strpos('0123456789abcdef',
                    substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 2, 1))
                    - 1) AS b
                 FROM embeddings)),
         hist AS (SELECT CAST(level AS BIGINT) AS level,
             CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lv GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS t FROM hist)
         SELECT level, n_nodes,
           ROUND(CAST(n_nodes AS DOUBLE) / (SELECT t FROM tot), 4)
             AS share,
           ROUND(CASE WHEN level = 8 THEN 0.00390625
             ELSE 1.0 / pow(2.0, level + 1) END, 4) AS expected_share,
           CAST(SUM(n_nodes) OVER (ORDER BY level DESC) AS BIGINT)
             AS layer_size
         FROM hist ORDER BY level""",
    "sim_jl_projection" ->
      """WITH xq AS (SELECT vec_id, j,
             CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
           FROM (SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS j,
                   unnest(embedding) AS x
                 FROM embeddings)),
         dims AS (SELECT DISTINCT j FROM xq),
         rmat AS (SELECT r.r, d.j,
             CASE WHEN (strpos('0123456789abcdef', substr(
                 md5('jl:' || CAST(r.r AS VARCHAR) || ':'
                   || CAST(d.j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
               THEN 1 ELSE -1 END AS s
           FROM (SELECT unnest(range(0, 16)) AS r) r, dims d),
         proj AS (SELECT x.vec_id, m.r, SUM(m.s * x.xq) AS p
           FROM xq x JOIN rmat m ON x.j = m.j GROUP BY 1, 2),
         nn AS (SELECT COUNT(*) AS n FROM embeddings),
         pairs AS (SELECT e.vec_id AS v1,
             (e.vec_id * 7 + 13) % nn.n AS v2
           FROM embeddings e CROSS JOIN nn
           WHERE e.vec_id <> (e.vec_id * 7 + 13) % nn.n),
         od AS (SELECT p.v1,
             SUM((a.xq - b.xq) * (a.xq - b.xq)) AS od2
           FROM pairs p
           JOIN xq a ON a.vec_id = p.v1
           JOIN xq b ON b.vec_id = p.v2 AND b.j = a.j
           GROUP BY 1),
         pd AS (SELECT p.v1,
             SUM((a.p - b.p) * (a.p - b.p)) AS pd2
           FROM pairs p
           JOIN proj a ON a.vec_id = p.v1
           JOIN proj b ON b.vec_id = p.v2 AND b.r = a.r
           GROUP BY 1),
         ratios AS (SELECT CAST(pd.pd2 AS DOUBLE)
             / (CAST(od.od2 AS DOUBLE) * 16) AS ratio
           FROM od JOIN pd ON od.v1 = pd.v1)
         SELECT COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 4) AS mean_ratio,
           ROUND(MIN(ratio), 4) AS min_ratio,
           ROUND(MAX(ratio), 4) AS max_ratio,
           ROUND(CAST(SUM(CASE WHEN abs(ratio - 1.0) <= 0.2 THEN 1
             ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS share_within_20pct
         FROM ratios""",
    "sim_cluster_validity" ->
      """WITH dims AS (SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM embeddings),
         cent AS (SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT label AS cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY label, d)
           GROUP BY cid),
         sc AS (SELECT e.vec_id, e.label,
             MAX(CASE WHEN c.cid = e.label THEN
               list_cosine_similarity(e.embedding, c.cemb) END) AS own,
             MAX(CASE WHEN c.cid <> e.label THEN
               list_cosine_similarity(e.embedding, c.cemb) END)
               AS best_other
           FROM embeddings e CROSS JOIN cent c GROUP BY 1, 2)
         SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(CAST(own AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 4) AS avg_own,
           ROUND(CAST(SUM(CAST(CAST(best_other AS DOUBLE)
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4) AS avg_other,
           ROUND(ROUND(CAST(SUM(CAST(CAST(own AS DOUBLE)
               AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
             - ROUND(CAST(SUM(CAST(CAST(best_other AS DOUBLE)
               AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4), 4)
             AS margin,
           ROUND(CAST(SUM(CASE WHEN best_other > own THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 4) AS share_confused
         FROM sc GROUP BY label ORDER BY label""",
    "sim_quant_sweep" ->
      """WITH xq AS (SELECT vec_id,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x
                 FROM embeddings) t),
         mx AS (SELECT vec_id, MAX(abs(xq)) AS ma FROM xq GROUP BY 1),
         bt AS (SELECT CAST(unnest([4, 6, 8]) AS BIGINT) AS bits),
         e AS (SELECT bits, abs(xq.xq) AS axq, mx.ma,
             (CAST(1 AS BIGINT) << CAST(bits - 1 AS INT)) - 1 AS levels
           FROM xq JOIN mx USING (vec_id) CROSS JOIN bt
           WHERE mx.ma > 0),
         e2 AS (SELECT bits, axq,
             axq - (((((axq * levels) // ma) * ma) // levels)) AS err
           FROM e)
         SELECT bits, CAST(COUNT(*) AS BIGINT) AS n_lanes,
           CAST(MAX(err) AS BIGINT) AS max_err_micro,
           ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 4)
             AS mean_err_micro
         FROM e2 GROUP BY 1 ORDER BY bits""",
    "sim_recall_curve" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
             embedding AS q_emb
           FROM embeddings WHERE vec_id < 5),
         brute AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rb
           FROM embeddings, q WHERE vec_id <> q_id),
         blocked AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rl
           FROM embeddings e JOIN q ON e.label = q.q_label
           WHERE vec_id <> q_id),
         ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
         hits AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM brute b JOIN blocked bl
             ON b.q_id = bl.q_id AND b.vec_id = bl.vec_id
           CROSS JOIN ks
           WHERE b.rb <= k AND bl.rl <= k GROUP BY 1)
         SELECT ks.k, COALESCE(n_hits, 0) AS n_hits,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE)
             / CAST(ks.k * 5 AS DOUBLE), 6) AS recall
         FROM ks LEFT JOIN hits ON ks.k = hits.k
         ORDER BY ks.k""",
    "sim_ivf_balance" ->
      """WITH dims AS (SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
           FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         pv AS (SELECT vec_id, dims.label,
             SUM(CAST((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)
               AS DECIMAL(28,12))) AS d2
           FROM dims JOIN cent ON dims.label = cent.label
             AND dims.d = cent.d
           GROUP BY 1, 2),
         cells AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(d2) AS DOUBLE) / COUNT(*) AS dist
           FROM pv GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(n_vecs * n_vecs) AS BIGINT) AS ss
           FROM cells)
         SELECT label, n_vecs,
           ROUND(CAST(n_vecs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
           ROUND(dist, 6) AS mean_sq_dist,
           ROUND(CAST(nc AS DOUBLE) * CAST(ss AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS imbalance
         FROM cells, tot ORDER BY label""",
    "sim_seed_sweep" ->
      """WITH f8 AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         h8 AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings
           ORDER BY md5('seed:' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
         a1 AS (SELECT vec_id, sim FROM (
             SELECT e.vec_id,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN f8 s) z WHERE rn = 1),
         a2 AS (SELECT vec_id, sim FROM (
             SELECT e.vec_id,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN h8 s) z WHERE rn = 1)
         SELECT * FROM (
           SELECT '0_first8' AS seeding,
             CAST(COUNT(*) AS BIGINT) AS n_vecs,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos,
             ROUND(MIN(CAST(sim AS DOUBLE)), 6) AS min_cos
           FROM a1
           UNION ALL
           SELECT '1_hash8',
             CAST(COUNT(*) AS BIGINT),
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6),
             ROUND(MIN(CAST(sim AS DOUBLE)), 6)
           FROM a2) u ORDER BY seeding""",
    "sim_dim_sweep" -> {
      // t_64 first: the truth CTE must precede the cases that join it
      val cases = Seq(64, 16, 32).map { d =>
        s""",
         t_$d AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(e.embedding[1:$d],
                   q.q_emb[1:$d]) DESC, e.vec_id) AS rn
             FROM embeddings e CROSS JOIN q
             WHERE e.vec_id <> q.q_id) z WHERE rn <= 10),
         r_$d AS (SELECT CAST($d AS BIGINT) AS dim,
             CAST(COUNT(*) AS BIGINT) AS n_hits,
             ROUND(CAST(COUNT(*) AS DOUBLE) / 50, 6) AS recall
           FROM t_$d a JOIN t_64 b
             ON a.q_id = b.q_id AND a.vec_id = b.vec_id)"""
      }.mkString
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < 5)$cases
         SELECT * FROM (SELECT * FROM r_16 UNION ALL
           SELECT * FROM r_32 UNION ALL SELECT * FROM r_64) u
         ORDER BY dim"""
    },
    "sim_binary_recall" ->
      """WITH lanes AS (SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS j
           FROM embeddings),
         packed AS (SELECT vec_id,
             CAST(bit_or(CASE WHEN j <= 32 AND x > 0
               THEN 1::BIGINT << (CAST(j AS INT) - 1) ELSE 0 END)
               AS BIGINT) AS b_lo,
             CAST(bit_or(CASE WHEN j > 32 AND x > 0
               THEN 1::BIGINT << (CAST(j AS INT) - 33) ELSE 0 END)
               AS BIGINT) AS b_hi
           FROM lanes GROUP BY 1),
         q AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb,
             p.b_lo AS q_lo, p.b_hi AS q_hi
           FROM embeddings e JOIN packed p USING (vec_id)
           WHERE e.vec_id < 5),
         bt AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, p.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY bit_count(xor(p.b_lo, q.q_lo))
                   + bit_count(xor(p.b_hi, q.q_hi)), p.vec_id) AS rn
             FROM packed p CROSS JOIN q WHERE p.vec_id <> q.q_id) z
           WHERE rn <= 10),
         tt AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(e.embedding, q.q_emb)
                   DESC, e.vec_id) AS rn
             FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id) z
           WHERE rn <= 10),
         hits AS (SELECT bt.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM bt JOIN tt ON bt.q_id = tt.q_id AND bt.vec_id = tt.vec_id
           GROUP BY 1)
         SELECT q.q_id, COALESCE(n_hits, 0) AS n_hits,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10, 6)
             AS recall_at_10
         FROM q LEFT JOIN hits ON q.q_id = hits.q_id ORDER BY q.q_id""",
    "sim_knn_diversify" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2, sim, rk FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         piv AS (SELECT label, v1, CAST(COUNT(*) AS BIGINT) AS deg,
             MAX(CASE WHEN rk = 1 THEN v2 END) AS n1,
             MAX(CASE WHEN rk = 2 THEN v2 END) AS n2,
             MAX(CASE WHEN rk = 3 THEN v2 END) AS n3,
             MAX(CASE WHEN rk = 1 THEN sim END) AS s1,
             MAX(CASE WHEN rk = 2 THEN sim END) AS s2,
             MAX(CASE WHEN rk = 3 THEN sim END) AS s3
           FROM knn GROUP BY 1, 2),
         sims AS (SELECT p.*,
             list_cosine_similarity(e1.embedding, e2.embedding) AS s12,
             list_cosine_similarity(e1.embedding, e3.embedding) AS s13,
             list_cosine_similarity(e2.embedding, e3.embedding) AS s23
           FROM piv p
           LEFT JOIN embeddings e1 ON p.n1 = e1.vec_id
           LEFT JOIN embeddings e2 ON p.n2 = e2.vec_id
           LEFT JOIN embeddings e3 ON p.n3 = e3.vec_id),
         fl AS (SELECT label, deg, s1, s2, s3,
             (n2 IS NOT NULL AND s2 > s12) AS keep2,
             (n3 IS NOT NULL AND s3 > s13
               AND (NOT (n2 IS NOT NULL AND s2 > s12) OR s3 > s23))
               AS keep3
           FROM sims)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(deg) AS BIGINT) AS n_edges_before,
           CAST(SUM(1 + CAST(keep2 AS BIGINT) + CAST(keep3 AS BIGINT))
             AS BIGINT) AS n_edges_after,
           CAST(SUM(deg) - SUM(1 + CAST(keep2 AS BIGINT)
             + CAST(keep3 AS BIGINT)) AS BIGINT) AS n_pruned,
           ROUND(CAST(SUM(CAST(s1 AS DECIMAL(18,9)))
               + SUM(CASE WHEN keep2 THEN CAST(s2 AS DECIMAL(18,9))
                     ELSE 0 END)
               + SUM(CASE WHEN keep3 THEN CAST(s3 AS DECIMAL(18,9))
                     ELSE 0 END) AS DOUBLE)
             / CAST(SUM(1 + CAST(keep2 AS BIGINT)
                 + CAST(keep3 AS BIGINT)) AS DOUBLE), 4) AS avg_kept_sim
         FROM fl GROUP BY label ORDER BY label""",
    "sim_kmeans_inertia" ->
      """WITH seeds AS (
           SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, embedding, cid, sim FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
         dims AS (
           SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent2 AS (
           SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d)
           GROUP BY cid),
         a2 AS (
           SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM embeddings e CROSS JOIN cent2 c) WHERE rn = 1),
         u AS (SELECT CAST(1 AS BIGINT) AS iter, sim FROM a1
           UNION ALL SELECT CAST(2 AS BIGINT), sim FROM a2)
         SELECT iter, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos,
           ROUND(MIN(CAST(sim AS DOUBLE)), 6) AS min_cos
         FROM u GROUP BY iter ORDER BY iter""",
    "sim_pca_power" -> OracleGen.pcaPowerOracle,
    "sim_pca_project" ->
      s"""WITH cq AS (SELECT j,
             CAST(ROUND(component * 1e6) AS BIGINT) AS cq
           FROM (${OracleGen.pcaPowerOracle}) pw),
         xq AS (SELECT vec_id, j - 1 AS j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS j
                 FROM embeddings) t),
         proj AS (SELECT vec_id, CAST(SUM(xq.xq * cq.cq) AS BIGINT) AS p
           FROM xq JOIN cq USING (j) GROUP BY 1),
         b AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM proj)
         SELECT CAST(FLOOR((p - lo) * 8 / (hi - lo + 1)) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND((CAST(SUM(p) AS DOUBLE) / COUNT(*)) / 1e12, 6)
             AS mean_proj
         FROM proj, b GROUP BY 1 ORDER BY bin""",
    "sim_kmeans_iter" ->
      """WITH seeds AS (
           SELECT vec_id AS seed_id, embedding AS seed_emb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         sims AS (
           SELECT e.vec_id, s.seed_id,
             list_cosine_similarity(e.embedding, s.seed_emb) AS sim
           FROM embeddings e CROSS JOIN seeds s),
         best AS (
           SELECT vec_id, seed_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, seed_id) AS rn
           FROM sims)
         SELECT seed_id, COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos
         FROM best WHERE rn = 1
         GROUP BY seed_id ORDER BY seed_id""",
    "sim_quantize_int8" ->
      """WITH v AS (
           SELECT label, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS maxabs
           FROM embeddings),
         s AS (SELECT label, embedding,
             127.0 / CAST(maxabs AS DOUBLE) AS scale
           FROM v WHERE maxabs > 0),
         q AS (SELECT label, embedding, scale,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INT)) AS q
           FROM s),
         e AS (SELECT label, scale, q,
             list_max([abs(CAST(embedding[i] AS DOUBLE)
                 - CAST(q[i] AS DOUBLE) / scale)
               for i in range(1, len(embedding) + 1)]) AS err
           FROM q)
         SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(list_sum(q) AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(SUM(len(list_filter(q, x -> abs(x) = 127))) AS BIGINT) AS n_sat,
           ROUND(MAX(err), 6) AS max_err
         FROM e GROUP BY label ORDER BY label""",
    "sim_recall_eval" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
             embedding AS q_emb
           FROM embeddings WHERE vec_id < 5),
         brute AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rn
           FROM embeddings, q WHERE vec_id <> q_id),
         blocked AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rn
           FROM embeddings e JOIN q ON e.label = q.q_label
           WHERE vec_id <> q_id),
         hits AS (SELECT b.q_id, COUNT(*) AS n_hits
           FROM brute b JOIN blocked bl
             ON b.q_id = bl.q_id AND b.vec_id = bl.vec_id AND bl.rn <= 10
           WHERE b.rn <= 10 GROUP BY b.q_id)
         SELECT q.q_id, CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / 10, 6)
             AS recall_at_10
         FROM q LEFT JOIN hits ON q.q_id = hits.q_id
         ORDER BY q.q_id""",
    "sim_kmeans_lloyd2" ->
      """WITH seeds AS (
           SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
         dims AS (
           SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent2 AS (
           SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d)
           GROUP BY cid),
         a2 AS (
           SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM embeddings e CROSS JOIN cent2 c) WHERE rn = 1)
         SELECT cid, COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos
         FROM a2 GROUP BY cid ORDER BY cid""",
    "sim_dbscan" ->
      """WITH RECURSIVE nbr AS (
           SELECT a.label, a.vec_id AS v1, b.vec_id AS v2
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.20),
         deg AS (SELECT label, v1, COUNT(*) AS deg FROM nbr GROUP BY 1, 2),
         cores AS (SELECT label, v1 AS node FROM deg WHERE deg >= 3),
         ce AS (SELECT n.v1 AS a, n.v2 AS b FROM nbr n
           WHERE EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v1)
             AND EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v2)),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM ce) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN ce e ON e.a = w.node),
         cc AS (SELECT node, MIN(lbl) AS cluster_id
           FROM walk GROUP BY node),
         corecl AS (SELECT c.label, c.node,
             COALESCE(cc.cluster_id, c.node) AS cluster_id
           FROM cores c LEFT JOIN cc ON c.node = cc.node),
         borders AS (SELECT n.label, n.v1 AS node,
             MIN(k.cluster_id) AS cluster_id
           FROM nbr n JOIN corecl k ON n.v2 = k.node
           WHERE NOT EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v1)
           GROUP BY 1, 2),
         members AS (SELECT label, node, cluster_id, 'core' AS role
             FROM corecl
           UNION ALL
           SELECT label, node, cluster_id, 'border' FROM borders),
         sizes AS (SELECT label, cluster_id, COUNT(*) AS csize
           FROM members GROUP BY 1, 2),
         agg AS (SELECT label,
             CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_core,
             CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_border
           FROM members GROUP BY 1),
         cl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(MAX(csize) AS BIGINT) AS max_cluster
           FROM sizes GROUP BY 1),
         alln AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_all
           FROM embeddings GROUP BY 1)
         SELECT label, n_core, n_border,
           n_all - n_core - n_border AS n_noise, n_clusters, max_cluster
         FROM agg JOIN cl USING (label) JOIN alln USING (label)
         ORDER BY label""",
    "sim_triplet_mining" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) - 1)
               % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                      ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END) AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         lab AS (SELECT vec_id, label FROM embeddings),
         cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS n
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket
               AND x.vec_id <> y.vec_id
           JOIN lab lx ON x.vec_id = lx.vec_id
           JOIN lab ly ON y.vec_id = ly.vec_id
           WHERE lx.label <> ly.label),
         knn1 AS (SELECT label, v1 AS a, v2 AS p, sim FROM (
             SELECT a1.label, a1.vec_id AS v1, b1.vec_id AS v2,
               list_cosine_similarity(a1.embedding, b1.embedding) AS sim,
               ROW_NUMBER() OVER (PARTITION BY a1.vec_id
                 ORDER BY list_cosine_similarity(a1.embedding, b1.embedding)
                   DESC, b1.vec_id) AS rk
             FROM embeddings a1 JOIN embeddings b1
               ON a1.label = b1.label AND a1.vec_id <> b1.vec_id) z
           WHERE rk = 1),
         cls AS (SELECT k.label,
             CAST(k.sim AS DOUBLE) AS sim_ap,
             CAST(list_cosine_similarity(ea.embedding, en.embedding)
               AS DOUBLE) AS sim_an
           FROM cand c JOIN knn1 k ON c.a = k.a
           JOIN embeddings ea ON c.a = ea.vec_id
           JOIN embeddings en ON c.n = en.vec_id),
         cls2 AS (SELECT label, sim_ap, sim_an,
             CASE WHEN sim_an >= sim_ap THEN 'hard'
                  WHEN sim_an >= sim_ap - CAST(0.05 AS DOUBLE)
                    THEN 'semihard'
                  ELSE 'easy' END AS klass FROM cls),
         agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN klass = 'hard' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hard,
             CAST(SUM(CASE WHEN klass = 'semihard' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_semihard,
             ROUND(CAST(SUM(CASE WHEN klass = 'semihard'
                 THEN CAST(sim_ap - sim_an AS DECIMAL(18,9)) END)
               AS DOUBLE)
               / SUM(CASE WHEN klass = 'semihard' THEN 1 ELSE 0 END), 4)
               AS avg_semihard_gap
           FROM cls2 GROUP BY 1),
         anch AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_anchors
           FROM knn1 GROUP BY 1)
         SELECT a.label, a.n_anchors,
           COALESCE(g.n_candidates, 0) AS n_candidates,
           COALESCE(g.n_hard, 0) AS n_hard,
           COALESCE(g.n_semihard, 0) AS n_semihard,
           g.avg_semihard_gap
         FROM anch a LEFT JOIN agg g USING (label) ORDER BY a.label""",
    "sim_facility_select" ->
      """WITH xq AS (SELECT label, vec_id, j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS q
           FROM (SELECT label, vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS j FROM embeddings) t),
         nsq AS (SELECT label, vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
           FROM xq GROUP BY 1, 2),
         dots AS (SELECT a.label, a.vec_id AS v, b.vec_id AS c,
             CAST(SUM(a.q * b.q) AS BIGINT) AS dot
           FROM xq a JOIN xq b ON a.label = b.label AND a.j = b.j
           GROUP BY 1, 2, 3),
         pairs AS (SELECT d.label, d.v, d.c,
             na.n2 + nb.n2 - 2 * d.dot AS d2
           FROM dots d
           JOIN nsq na ON d.label = na.label AND d.v = na.vec_id
           JOIN nsq nb ON d.label = nb.label AND d.c = nb.vec_id),
         s1 AS (SELECT label, c, CAST(SUM(d2) AS BIGINT) AS obj
           FROM pairs GROUP BY 1, 2),
         p1 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s1) z WHERE rk = 1),
         b1 AS (SELECT pr.label, pr.v, pr.d2 AS bd FROM pairs pr
           JOIN p1 ON pr.label = p1.label AND pr.c = p1.pc),
         s2 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b1 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p2 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s2) z WHERE rk = 1),
         b2 AS (SELECT b.label, b.v, LEAST(b.bd, pr.d2) AS bd
           FROM b1 b JOIN p2 ON b.label = p2.label
           JOIN pairs pr ON pr.label = b.label AND pr.v = b.v
             AND pr.c = p2.pc),
         s3 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b2 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p3 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s3) z WHERE rk = 1),
         b3 AS (SELECT b.label, b.v, LEAST(b.bd, pr.d2) AS bd
           FROM b2 b JOIN p3 ON b.label = p3.label
           JOIN pairs pr ON pr.label = b.label AND pr.v = b.v
             AND pr.c = p3.pc),
         s4 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b3 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p4 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s4) z WHERE rk = 1),
         picks AS (SELECT label, 1 AS step, pc AS vec_id, obj FROM p1
           UNION ALL SELECT label, 2, pc, obj FROM p2
           UNION ALL SELECT label, 3, pc, obj FROM p3
           UNION ALL SELECT label, 4, pc, obj FROM p4)
         SELECT label, step, vec_id, obj AS objective,
           LAG(obj) OVER (PARTITION BY label ORDER BY step) - obj
             AS reduction
         FROM picks ORDER BY label, step""",
    "sim_metric_agreement" ->
      """WITH xq AS (SELECT label, vec_id, j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS q
           FROM (SELECT label, vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS j FROM embeddings) t),
         nsq AS (SELECT label, vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
           FROM xq GROUP BY 1, 2),
         seeds AS (SELECT label, MIN(vec_id) AS qid
           FROM embeddings GROUP BY 1),
         dots AS (SELECT a.label, a.vec_id AS cid,
             CAST(SUM(a.q * b.q) AS BIGINT) AS dot
           FROM xq a JOIN seeds s ON a.label = s.label
           JOIN xq b ON b.label = a.label AND b.vec_id = s.qid
             AND b.j = a.j
           WHERE a.vec_id <> s.qid GROUP BY 1, 2),
         cosr AS (SELECT e.label, e.vec_id AS cid,
             list_cosine_similarity(e.embedding, q.embedding) AS cos
           FROM embeddings e JOIN seeds s ON e.label = s.label
           JOIN embeddings q ON q.vec_id = s.qid
           WHERE e.vec_id <> s.qid),
         m AS (SELECT c.label, c.cid, c.cos, d.dot,
             na.n2 + nq.n2 - 2 * d.dot AS d2
           FROM cosr c JOIN dots d
             ON c.label = d.label AND c.cid = d.cid
           JOIN nsq na ON na.label = c.label AND na.vec_id = c.cid
           JOIN seeds s ON s.label = c.label
           JOIN nsq nq ON nq.label = c.label AND nq.vec_id = s.qid),
         r AS (SELECT label, cid,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY cos DESC, cid) AS rc,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY dot DESC, cid) AS rd,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY d2, cid) AS rl
           FROM m),
         p AS (SELECT x.label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (x.rc - y.rc) * (x.rd - y.rd) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_cd,
             CAST(SUM(CASE WHEN (x.rc - y.rc) * (x.rl - y.rl) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_cl
           FROM r x JOIN r y ON x.label = y.label AND x.cid < y.cid
           GROUP BY 1),
         cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cands
           FROM r GROUP BY 1)
         SELECT c.label, s.qid, n_cands, n_pairs,
           ROUND(CAST(2 * c_cd - n_pairs AS DOUBLE)
             / CAST(n_pairs AS DOUBLE), 6) AS tau_cos_dot,
           ROUND(CAST(2 * c_cl - n_pairs AS DOUBLE)
             / CAST(n_pairs AS DOUBLE), 6) AS tau_cos_l2
         FROM cnt c JOIN seeds s USING (label) JOIN p USING (label)
         ORDER BY c.label""",
    "sim_prf_expansion" ->
      """WITH q AS (SELECT label, MIN(vec_id) AS qid
           FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         s1 AS (SELECT qe.label, qe.qid, c.vec_id AS cid,
             c.label AS clabel,
             list_cosine_similarity(c.embedding, qe.q_emb) AS sim
           FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid),
         r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
             ORDER BY sim DESC, cid) AS rk FROM s1),
         bef AS (SELECT label,
             CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
               AS BIGINT) AS nb
           FROM r1 WHERE rk <= 10 GROUP BY 1),
         top5 AS (SELECT label, qid, cid FROM r1 WHERE rk <= 5),
         fd AS (SELECT t.label, t.qid,
             generate_subscripts(e.embedding, 1) AS d,
             unnest(e.embedding) AS v
           FROM top5 t JOIN embeddings e ON t.cid = e.vec_id),
         cent AS (SELECT label, qid, d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*) AS c
           FROM fd GROUP BY 1, 2, 3),
         xq AS (SELECT label, qid,
             list(CAST(c AS FLOAT) ORDER BY d) AS x_emb
           FROM cent GROUP BY 1, 2),
         s2 AS (SELECT x.label, x.qid, c.vec_id AS cid,
             c.label AS clabel,
             list_cosine_similarity(c.embedding, x.x_emb) AS sim
           FROM xq x CROSS JOIN embeddings c WHERE c.vec_id <> x.qid),
         r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
             ORDER BY sim DESC, cid) AS rk FROM s2),
         aft AS (SELECT label,
             CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
               AS BIGINT) AS na
           FROM r2 WHERE rk <= 10 GROUP BY 1)
         SELECT q.label, q.qid,
           ROUND(CAST(nb AS DOUBLE) / 10, 6) AS recall10_before,
           ROUND(CAST(na AS DOUBLE) / 10, 6) AS recall10_after,
           na - nb AS gain
         FROM q JOIN bef USING (label) JOIN aft USING (label)
         ORDER BY q.label""",
    "sim_residual_quant" ->
      """WITH dv AS (SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*) AS c
           FROM dv GROUP BY 1, 2),
         resid AS (SELECT dv.label, dv.vec_id, dv.d,
             CAST(ROUND((CAST(val AS DOUBLE) - c) * 1e6) AS BIGINT)
               AS rq
           FROM dv JOIN cent
             ON dv.label = cent.label AND dv.d = cent.d),
         cb AS (SELECT vec_id AS cw FROM embeddings
           ORDER BY vec_id LIMIT 8),
         cbr AS (SELECT r.vec_id AS cw, r.d, r.rq AS cq
           FROM resid r JOIN cb ON r.vec_id = cb.cw),
         d2s AS (SELECT r.label, r.vec_id, c.cw,
             CAST(SUM((r.rq - c.cq) * (r.rq - c.cq)) AS BIGINT) AS d2
           FROM resid r JOIN cbr c ON r.d = c.d GROUP BY 1, 2, 3),
         asg AS (SELECT label, vec_id, d2 FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cw) AS rk FROM d2s) z WHERE rk = 1),
         s1 AS (SELECT label, vec_id,
             CAST(SUM(rq * rq) AS BIGINT) AS e1
           FROM resid GROUP BY 1, 2),
         agg AS (SELECT s1.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             ROUND((CAST(SUM(e1) AS DOUBLE) / COUNT(*)) / 1e12, 6)
               AS mse_stage1,
             ROUND((CAST(SUM(d2) AS DOUBLE) / COUNT(*)) / 1e12, 6)
               AS mse_stage2
           FROM s1 JOIN asg USING (vec_id) GROUP BY s1.label)
         SELECT label, n_vecs, mse_stage1, mse_stage2,
           ROUND(CASE WHEN mse_stage1 > 0
             THEN 1 - mse_stage2 / mse_stage1 END, 6) AS reduction
         FROM agg ORDER BY label""",
    "sim_cluster_nmi" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
                 1, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(8) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id),
         cells AS (SELECT e.label, b.bucket, CAST(COUNT(*) AS BIGINT) AS n
           FROM embeddings e JOIN bands b ON e.vec_id = b.vec_id
           GROUP BY 1, 2),
         ma AS (SELECT label, CAST(SUM(n) AS BIGINT) AS na FROM cells
           GROUP BY 1),
         mb AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS nb FROM cells
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells),
         ha AS (SELECT SUM(CAST(CAST(na AS DOUBLE) / nt
             * ln(CAST(nt AS DOUBLE) / na) AS DECIMAL(28,12)))
             AS h_label FROM ma, tot),
         hb AS (SELECT SUM(CAST(CAST(nb AS DOUBLE) / nt
             * ln(CAST(nt AS DOUBLE) / nb) AS DECIMAL(28,12)))
             AS h_bucket FROM mb, tot),
         mi AS (SELECT c.label, c.bucket, c.n,
             CAST(CAST(n AS DOUBLE) / nt
               * ln(CAST(nt AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb))
               AS DECIMAL(28,12)) AS contrib
           FROM cells c JOIN ma USING (label) JOIN mb USING (bucket),
             tot),
         it AS (SELECT SUM(contrib) AS i_total FROM mi)
         SELECT label, bucket, n,
           ROUND(CAST(contrib AS DOUBLE), 6) AS mi_contrib,
           ROUND(CAST(i_total AS DOUBLE), 6) AS i_total,
           ROUND(CAST(i_total AS DOUBLE)
             / sqrt(CAST(h_label AS DOUBLE) * CAST(h_bucket AS DOUBLE)),
             6) AS nmi
         FROM mi, it, ha, hb ORDER BY label, bucket""",
    "sim_multiprobe_lsh" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
                 1, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(8) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         vb AS (SELECT vec_id,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id),
         q AS (SELECT label, MIN(vec_id) AS qid FROM embeddings
           GROUP BY 1),
         qproj AS (SELECT q.label, pr.j, pr.p FROM q
           JOIN proj pr ON pr.vec_id = q.qid),
         qsig AS (SELECT label,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM qproj GROUP BY label),
         flips AS (SELECT qp.label,
             CAST(ROW_NUMBER() OVER (PARTITION BY qp.label
               ORDER BY ABS(qp.p), qp.j) AS INT) AS pr,
             substr(s.bucket, 1, qp.j)
               || (CASE WHEN substr(s.bucket, qp.j + 1, 1) = '1'
                   THEN '0' ELSE '1' END)
               || substr(s.bucket, qp.j + 2, 8) AS bucket
           FROM qproj qp JOIN qsig s USING (label)),
         probes AS (SELECT label, 0 AS pr, bucket FROM qsig
           UNION ALL SELECT label, pr, bucket FROM flips),
         cand AS (SELECT DISTINCT p2.label, np.n_probes, v.vec_id
           FROM probes p2 JOIN vb v USING (bucket)
           CROSS JOIN (VALUES (1), (5), (9)) np(n_probes)
           WHERE p2.pr < np.n_probes),
         cand2 AS (SELECT c.label, c.n_probes, c.vec_id
           FROM cand c JOIN q USING (label) WHERE c.vec_id <> q.qid),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb FROM q
           JOIN embeddings e ON e.vec_id = q.qid),
         brute AS (SELECT label, cid AS vec_id FROM (
             SELECT qe.label, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qe.label
                 ORDER BY list_cosine_similarity(c.embedding, qe.q_emb)
                   DESC, c.vec_id) AS rk
             FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid) z
           WHERE rk <= 10),
         hits AS (SELECT c.label, c.n_probes,
             CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM cand2 c JOIN brute b
             ON c.label = b.label AND c.vec_id = b.vec_id
           GROUP BY 1, 2),
         nc AS (SELECT label, n_probes,
             CAST(COUNT(*) AS BIGINT) AS n_candidates
           FROM cand2 GROUP BY 1, 2),
         spine AS (SELECT q.label, np.n_probes FROM q
           CROSS JOIN (VALUES (1), (5), (9)) np(n_probes))
         SELECT sp.label, sp.n_probes,
           COALESCE(n_candidates, 0) AS n_candidates,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0, 6) AS recall
         FROM spine sp
         LEFT JOIN nc ON sp.label = nc.label AND sp.n_probes = nc.n_probes
         LEFT JOIN hits
           ON sp.label = hits.label AND sp.n_probes = hits.n_probes
         ORDER BY sp.label, sp.n_probes""",
    "sim_hnsw_search" -> {
      // layered descent: per-layer edge CTEs plus six unrolled hops
      // (two per layer, 2 -> 1 -> 0) share one generated shape
      def layerSql(l: Int): String =
        s"""n$l AS (SELECT label, vec_id, embedding FROM lv
             WHERE level >= $l),
           d$l AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM n$l a JOIN n$l b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           k$l AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM d$l) z
             WHERE rk <= 3),
           e$l AS MATERIALIZED (SELECT DISTINCT label, v1, v2 FROM (
               SELECT label, v1, v2 FROM k$l
               UNION ALL SELECT label, v2, v1 FROM k$l) u),
           """
      def stepSql(t: Int, l: Int): String =
        s"""nb$t AS MATERIALIZED (SELECT s.label, s.qid,
               y.v2 AS cand,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim
             FROM s${t - 1} s
             JOIN e$l y ON y.label = s.label AND y.v1 = s.cur
             JOIN embeddings e ON e.vec_id = y.v2
             JOIN qe ON qe.label = s.label
             WHERE y.v2 <> s.qid),
           s$t AS MATERIALIZED (SELECT label, qid, cand AS cur, sim
             FROM (SELECT c.label, c.qid, c.cand, c.sim,
                 ROW_NUMBER() OVER (PARTITION BY c.label
                   ORDER BY c.sim DESC, c.cand) AS rk
               FROM (SELECT label, qid, cand, sim FROM nb$t
                     UNION ALL SELECT label, qid, cur, sim
                       FROM s${t - 1}) c) z WHERE rk = 1),
           x$t AS (SELECT label, cand, $t AS fstep FROM nb$t),
           """
      val layers = Seq(2, 2, 1, 1, 0, 0)
      val stepsSql = layers.zipWithIndex
        .map { case (l, i) => stepSql(i + 1, l) }.mkString
      val xUnion = (0 to 6).map(t => s"SELECT * FROM x$t")
        .mkString(" UNION ALL ")
      val traceSel = (0 +: layers.indices.map(_ + 1)).zip(2 +: layers)
        .map { case (t, l) =>
          s"SELECT label, $t AS step, $l AS layer, cur AS node, sim FROM s$t" }
        .mkString("\n           UNION ALL ")
      s"""WITH lv AS (SELECT vec_id, label, embedding,
             CASE WHEN b = 0 THEN 8
               WHEN b % 2 = 1 THEN 0 WHEN b % 4 = 2 THEN 1
               WHEN b % 8 = 4 THEN 2 WHEN b % 16 = 8 THEN 3
               WHEN b % 32 = 16 THEN 4 WHEN b % 64 = 32 THEN 5
               WHEN b % 128 = 64 THEN 6 ELSE 7 END AS level
           FROM (SELECT vec_id, label, embedding,
               (strpos('0123456789abcdef',
                  substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 1, 1))
                  - 1) * 16
               + (strpos('0123456789abcdef',
                  substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 2, 1))
                  - 1) AS b
               FROM embeddings) zb),
         ${Seq(2, 1, 0).map(layerSql).mkString}q AS (
           SELECT label, MIN(vec_id) AS qid FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         entry AS (SELECT label, vec_id AS cur FROM (
             SELECT lv.label, lv.vec_id, ROW_NUMBER()
               OVER (PARTITION BY lv.label
                 ORDER BY lv.level DESC, lv.vec_id) AS rk
             FROM lv JOIN q ON q.label = lv.label
             WHERE lv.vec_id <> q.qid) z WHERE rk = 1),
         s0 AS (SELECT qe.label, qe.qid, entry.cur,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM qe JOIN entry ON entry.label = qe.label
           JOIN embeddings e ON e.vec_id = entry.cur),
         x0 AS (SELECT label, cur AS cand, 0 AS fstep FROM s0),
         ${stepsSql}fs AS (SELECT label, cand, MIN(fstep) AS fs
           FROM ($xUnion) xs GROUP BY 1, 2),
         brute AS (SELECT label, cid AS cand FROM (
             SELECT qe.label, c.vec_id AS cid, ROW_NUMBER()
               OVER (PARTITION BY qe.label ORDER BY
                 list_cosine_similarity(c.embedding, qe.q_emb) DESC,
                 c.vec_id) AS rk
             FROM qe JOIN embeddings c ON c.label = qe.label
             WHERE c.vec_id <> qe.qid) z WHERE rk <= 10),
         spine AS (SELECT label, step FROM q
           CROSS JOIN range(7) t(step)),
         census AS (SELECT sp.label, CAST(sp.step AS BIGINT) AS step,
             CAST(SUM(CASE WHEN fs.fs <= sp.step THEN 1 ELSE 0 END)
               AS BIGINT) AS n_explored,
             CAST(SUM(CASE WHEN fs.fs <= sp.step
                 AND b.cand IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits
           FROM spine sp LEFT JOIN fs ON fs.label = sp.label
           LEFT JOIN brute b
             ON b.label = fs.label AND b.cand = fs.cand
           GROUP BY 1, 2),
         trace AS ($traceSel)
         SELECT t.label, CAST(t.step AS BIGINT) AS step,
           CAST(t.layer AS BIGINT) AS layer, t.node,
           ROUND(CAST(t.sim AS DOUBLE), 4) AS sim,
           c.n_explored,
           ROUND(CAST(c.n_hits AS DOUBLE) / 10, 4) AS recall_at_10
         FROM trace t JOIN census c
           ON c.label = t.label AND c.step = t.step
         ORDER BY t.label, t.step"""
    },
    "sim_greedy_search" -> {
      // six unrolled greedy steps share one shape — generated, not
      // hand-copied, so the hop bodies cannot drift apart
      def stepSql(i: Int): String =
        s"""c$i AS (SELECT s.label, s.qid, s.cur AS cand FROM s${i - 1} s
           UNION ALL SELECT s.label, s.qid, y.v2 FROM s${i - 1} s
             JOIN sym y ON y.label = s.label AND y.v1 = s.cur
             WHERE y.v2 <> s.qid),
         s$i AS (SELECT label, qid, cand AS cur, sim FROM (
             SELECT c.label, c.qid, c.cand,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY c.label ORDER BY
                 list_cosine_similarity(e.embedding, qe.q_emb) DESC,
                 c.cand) AS rk
             FROM c$i c JOIN embeddings e ON e.vec_id = c.cand
             JOIN qe ON qe.label = c.label) z WHERE rk = 1),
         """
      val traceSel = (0 to 6).map(h =>
        s"SELECT label, $h AS hop, cur, sim FROM s$h")
        .mkString("\n           UNION ALL ")
      s"""WITH directed AS (SELECT a.label, a.vec_id AS v1,
             b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, v1, v2 FROM (
             SELECT label, v1, v2 FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         q AS (SELECT label, MIN(vec_id) AS qid, MAX(vec_id) AS entry
           FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, q.entry, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         s0 AS (SELECT q.label, q.qid, q.entry AS cur,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM q JOIN embeddings e ON e.vec_id = q.entry
           JOIN qe ON qe.label = q.label),
         ${(1 to 6).map(stepSql).mkString}brute AS (
           SELECT label, cid AS nn_id, bsim FROM (
             SELECT qe.label, c.vec_id AS cid,
               list_cosine_similarity(c.embedding, qe.q_emb) AS bsim,
               ROW_NUMBER() OVER (PARTITION BY qe.label ORDER BY
                 list_cosine_similarity(c.embedding, qe.q_emb) DESC,
                 c.vec_id) AS rk
             FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid) z
           WHERE rk = 1),
         trace AS ($traceSel)
         SELECT t.label, t.hop, t.cur AS node,
           ROUND(CAST(t.sim AS DOUBLE), 4) AS sim,
           b.nn_id, ROUND(CAST(b.bsim AS DOUBLE), 4) AS nn_sim,
           t.cur = b.nn_id AS reached
         FROM trace t JOIN brute b ON t.label = b.label
         ORDER BY t.label, t.hop"""
    },
    "sim_intrinsic_dim" ->
      """WITH directed AS (SELECT a.label, a.vec_id,
             list_cosine_similarity(a.embedding, b.embedding) AS sim,
             b.vec_id AS v2
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         r AS (SELECT label, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, v2) AS rk
           FROM directed),
         two AS (SELECT label, vec_id,
             MAX(CASE WHEN rk = 1 THEN 1.0 - sim END) AS d1,
             MAX(CASE WHEN rk = 2 THEN 1.0 - sim END) AS d2
           FROM r WHERE rk <= 2 GROUP BY 1, 2),
         t AS (SELECT label,
             d1 > 0 AND d2 IS NOT NULL AS usable,
             CASE WHEN d1 > 0 AND d2 IS NOT NULL
               THEN CAST(ln(d2 / d1) AS DECIMAL(28,12))
             END AS lnmu
           FROM two)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
             AS n_used,
           ROUND(CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(SUM(lnmu) AS DOUBLE), 4) AS id_hat
         FROM t GROUP BY 1 ORDER BY label""",
    "sim_norm_census" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val
           FROM embeddings),
         norms AS (SELECT label, vec_id,
             sqrt(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))
               * CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
               AS norm
           FROM dims GROUP BY 1, 2),
         agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(norm AS DECIMAL(28,12))) AS sn,
             SUM(CAST(norm * norm AS DECIMAL(28,12))) AS snn,
             MIN(norm) AS mn, MAX(norm) AS mx
           FROM norms GROUP BY 1)
         SELECT label, n, ROUND(CAST(sn AS DOUBLE) / n, 6) AS mean_norm,
           ROUND(mn, 6) AS min_norm, ROUND(mx, 6) AS max_norm,
           ROUND(sqrt(GREATEST(CAST(n * snn - sn * sn AS DOUBLE), 0.0)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
             / (CAST(sn AS DOUBLE) / n), 6) AS cv
         FROM agg ORDER BY label""",
  )
}
