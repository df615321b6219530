package graft.oracles

/** Derived oracle rows: entries whose SQL embeds ANOTHER row's oracle
  * text (composition keeps base-relation fixes from silently diverging
  * from their consumers) plus the generated unrolled-iteration oracles
  * from [[OracleGen]]. Moved verbatim from SparkEntry in round 16. */
object DerivedOracles {
  private[graft] def apply(m: Map[String, String]): Map[String, String] = {
    // the star-contraction variant computes the identical relation, so it
    // shares dedup_clusters' recursive-CTE oracle verbatim; the streaming
    // prep pipeline computes the batch pipeline's exact relation through a
    // twice-run foreachBatch job, so it shares that oracle too
    m + ("dedup_clusters_star" -> m("dedup_clusters")) +
      // purity wraps the cluster assignment as a subquery, so the
      // component semantics can never drift from the gated row
      ("dedup_cluster_purity" -> s"""WITH cl AS (${m("dedup_clusters")}),
         cs AS (SELECT cluster_id, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM cl JOIN documents USING (doc_id) GROUP BY 1, 2),
         top AS (SELECT cluster_id, source AS top_source, n AS top_n
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
               ORDER BY n DESC, source) AS rk FROM cs) z WHERE rk = 1),
         sizes AS (SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS csize
           FROM cs GROUP BY 1),
         per AS (SELECT s.cluster_id, csize, top_source, top_n
           FROM sizes s JOIN top ON s.cluster_id = top.cluster_id),
         tot AS (SELECT CAST(SUM(csize) AS BIGINT) AS docs,
             CAST(SUM(top_n) AS BIGINT) AS pure_docs FROM per)
         SELECT cluster_id, csize, top_source, top_n,
           ROUND(CAST(top_n AS DOUBLE) / csize, 6) AS purity,
           ROUND(CAST(pure_docs AS DOUBLE) / docs, 6) AS weighted_purity
         FROM per, tot ORDER BY cluster_id""") +
      ("stream_docs_prep" -> m("docs_prep_pipeline")) +
      // the streaming index-maintenance loop emits, per its scaladoc, the
      // one-increment batch relation — so it shares that exact oracle
      ("stream_sig_index" -> m("dedup_incremental_minhash")) +
      // the frozen quantizer makes the unrolled-increment replay
      // arrival-order independent: one assignment pass over base +
      // both increments IS the two-batch append, which is the property
      // the streaming query pins (replay-skip proves idempotence)
      ("stream_ivf_append" ->
        """WITH base AS (SELECT vec_id, label, embedding
               FROM embeddings WHERE vec_id % 4 <> 3),
           bd AS (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM base),
           cent AS (SELECT label AS cell, d,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM bd GROUP BY 1, 2),
           cn AS (SELECT cell, sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE)) AS cnorm
             FROM cent GROUP BY 1),
           ad AS (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           per AS (SELECT vec_id, cell,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE) AS dot,
               sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE)) AS vnorm
             FROM ad JOIN cent USING (d) GROUP BY 1, 2),
           scored AS (SELECT vec_id, cell, dot / (vnorm * cnorm) AS s
             FROM per JOIN cn USING (cell)),
           asn AS (SELECT vec_id, cell, CAST(s AS DECIMAL(18,9)) AS sim,
               CASE WHEN vec_id % 4 <> 3 THEN 0
                 WHEN vec_id % 8 = 3 THEN 1 ELSE 2 END AS inc
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY s DESC, cell) AS rn FROM scored) z
             WHERE rn = 1)
           SELECT cell,
             CAST(SUM(CASE WHEN inc = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_seed,
             CAST(SUM(CASE WHEN inc = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inc1,
             CAST(SUM(CASE WHEN inc = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inc2,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             ROUND(CAST(SUM(CASE WHEN inc = 1 THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN inc = 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS appended_share,
             ROUND(CAST(SUM(CASE WHEN inc > 0 THEN sim END) AS DOUBLE)
               / SUM(CASE WHEN inc > 0 THEN 1 END), 6)
               AS mean_sim_appended
           FROM asn GROUP BY cell ORDER BY cell""") +
      // the maintained Misra-Gries sketch must bracket the exact corpus
      // top-k (mergeable-summaries invariant), so the streaming row
      // shares the batch sketch's exact-truth-side oracle verbatim
      ("stream_freq_topk" -> m("sketch_freq_topk")) +
      // greedy k-center unrolls to k-1 chained farthest-point CTE blocks
      ("sim_kcenter_coreset" -> OracleGen.kcenterOracleSql(8)) +
      // two Louvain levels from ONE generated move/Q block per level —
      // the level bodies cannot drift apart
      ("graph_louvain_full" -> OracleGen.louvainFullOracleSql) +
      ("graph_louvain_conv" -> OracleGen.louvainConvOracleSql()) +
      ("stream_hnsw_append" -> OracleGen.hnswAppendOracleSql()) +
      // one exact integer-Lloyd pass per PQ subspace: the assignment
      // block is generated once and instantiated for both codebooks
      ("sim_pq_train" -> OracleGen.pqTrainOracleSql()) +
      // the BPE trainer's bounded loop unrolls to chained CTE blocks
      ("text_bpe_merges" -> OracleGen.bpeMergeOracleSql(6)) +
      ("stream_bpe_encode" -> OracleGen.streamBpeEncodeOracleSql(6)) +
      ("stream_unigram_encode" -> OracleGen.streamUnigramEncodeOracleSql()) +
      ("text_bpe_encode" -> OracleGen.bpeEncodeOracleSql(6)) +
      // tokenizer -> packer: per-doc BPE lengths (vocabulary join, OOV
      // tokens count 1) feed the same fixed-256 packing census as
      // pack_sequences
      ("text_bpe_pack" -> OracleGen.bpePackOracleSql(6)) +
      // one logistic gradient step at w=0: doubled gradient and margin
      // are pure BIGINT sums (see Curation.qualityProbe), one final
      // double division — the TF bucket expression is the same
      // relational md5 rendering dedup_embedding_cosine uses
      ("docs_quality_probe" ->
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
             ROUND(CAST(m2000 AS DOUBLE) / 2000.0, 6) AS margin
           FROM s JOIN documents d USING (doc_id)
           ORDER BY margin DESC, doc_id LIMIT 20""") +
      // two hard-sigmoid gradient steps, integral under common
      // denominators (see Curation.qualityProbe2's ladder): step-1
      // doubled gradient g2, labeled margins ×2000, clamped sigmoid
      // ×16000, residual gradient g2p ×16000, folded weights ×16e6 —
      // ONE final double division
      ("docs_quality_probe2" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf LEFT JOIN w USING (j) GROUP BY 1)
           SELECT d.doc_id, d.lang, d.source,
             ROUND(CAST(m16 AS DOUBLE) / 16000000.0, 6) AS margin
           FROM sc JOIN documents d USING (doc_id)
           ORDER BY margin DESC, doc_id LIMIT 20""") +
      // tie-aware Mann-Whitney AUC of both probe steps over the labeled
      // seed: margins stay in their integer numerators (rank-based, the
      // denominator cancels), doubled pair-count u2 counts concordant
      // pairs twice / tied pairs once, ONE final double division
      ("docs_probe_auc" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS MATERIALIZED (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf JOIN lab USING (doc_id) LEFT JOIN w USING (j)
             GROUP BY 1),
           lm AS (SELECT lab.label, 'step1' AS step, m.m2000 AS margin
               FROM m JOIN lab USING (doc_id)
             UNION ALL
             SELECT lab.label, 'step2', sc.m16
               FROM sc JOIN lab USING (doc_id)),
           bv AS (SELECT step, margin,
               CAST(SUM(label) AS BIGINT) AS np_v,
               CAST(SUM(1 - label) AS BIGINT) AS nn_v
             FROM lm GROUP BY 1, 2),
           cum AS (SELECT *, COALESCE(SUM(nn_v) OVER (PARTITION BY step
               ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nn_lt
             FROM bv)
           SELECT step, CAST(SUM(np_v) AS BIGINT) AS n_pos,
             CAST(SUM(nn_v) AS BIGINT) AS n_neg,
             CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS BIGINT) AS u2,
             ROUND(CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS DOUBLE)
               / (2.0 * SUM(np_v) * SUM(nn_v)), 6) AS auc
           FROM cum GROUP BY step ORDER BY step""") +
      // F1-argmax operating point over the step-2 margin cuts: cumulative
      // precision/recall from the per-margin-value aggregate, ties to
      // the stricter (higher-margin) cut
      ("docs_probe_threshold" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf JOIN lab USING (doc_id) LEFT JOIN w USING (j)
             GROUP BY 1),
           bv AS (SELECT sc.m16 AS margin,
               CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(lab.label) AS BIGINT) AS np_v
             FROM sc JOIN lab USING (doc_id) GROUP BY 1),
           tot AS (SELECT CAST(SUM(np_v) AS BIGINT) AS n_pos_total FROM bv),
           cum AS (SELECT margin,
               SUM(n_v) OVER (ORDER BY margin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
               SUM(np_v) OVER (ORDER BY margin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
             FROM bv)
           SELECT margin, CAST(n_pred AS BIGINT) AS n_pred,
             CAST(tp AS BIGINT) AS tp,
             ROUND(CAST(tp AS DOUBLE) / n_pred, 6) AS precision,
             ROUND(CAST(tp AS DOUBLE) / n_pos_total, 6) AS recall,
             ROUND(2.0 * tp / (n_pred + n_pos_total), 6) AS f1
           FROM cum, tot
           ORDER BY f1 DESC, margin DESC LIMIT 1""") +
      // reliability diagram of the step-1 hard-sigmoid predictions: 8
      // equal probability bins, observed positive rate vs mean predicted
      ("docs_probe_calibration" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           bins AS (SELECT
               LEAST(CAST(FLOOR(sgm / 2000.0) AS BIGINT), 7) AS bin,
               lab.label, sgm
             FROM sg JOIN lab USING (doc_id))
           SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             ROUND(CAST(SUM(sgm) AS DOUBLE) / (COUNT(*) * 16000.0), 6)
               AS mean_pred,
             ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS frac_pos
           FROM bins GROUP BY bin ORDER BY bin""") +
      // LSH banding sweep: one 9-hash signature re-banded at 9x1 / 3x3 /
      // 1x9, candidates per setting scored against the exact
      // Jaccard>=0.5 posting-list truth set
      ("dedup_lsh_tune" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 5
                    THEN [array_to_string(w[i:i+4], ' ')
                          for i in range(1, len(w)-3)]
                    ELSE []::VARCHAR[] END)) AS shingle
             FROM words),
           mh AS MATERIALIZED (SELECT doc_id, i,
               MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
             FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
           settings AS (SELECT CAST(unnest([1, 3, 9]) AS BIGINT)
             AS rows_per_band),
           bands AS (SELECT s.rows_per_band, doc_id,
               i // s.rows_per_band AS band,
               md5(string_agg(h, ',' ORDER BY i)) AS bucket
             FROM mh CROSS JOIN settings s
             GROUP BY s.rows_per_band, doc_id, i // s.rows_per_band),
           cand AS (SELECT DISTINCT x.rows_per_band,
               x.doc_id AS d1, y.doc_id AS d2
             FROM bands x JOIN bands y
               ON x.rows_per_band = y.rows_per_band AND x.band = y.band
                  AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
           okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
           inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             JOIN okdf k ON k.shingle = a.shingle
             GROUP BY 1, 2),
           truth AS (SELECT d1, d2 FROM (SELECT x.d1, x.d2, x.i,
               s1.n AS n1, s2.n AS n2
             FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                          JOIN sizes s2 ON x.d2 = s2.doc_id) v
             WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
           tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs
             FROM truth),
           hits AS (SELECT c.rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM cand c JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2
             GROUP BY 1),
           nc AS (SELECT rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_cand_pairs
             FROM cand GROUP BY 1)
           SELECT 9 // nc.rows_per_band AS n_bands, nc.rows_per_band,
             nc.n_cand_pairs, tc.n_true_pairs,
             CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
             ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
               / tc.n_true_pairs, 6) AS recall
           FROM nc LEFT JOIN hits h USING (rows_per_band), tc
           ORDER BY rows_per_band""") +
      // IVF serving-tuning curve: each query's cell ranking (exact-
      // decimal centroid cosine) computed once, probe widths {1,2,4}
      // joined on cell_rank <= nprobe, top-10 per (nprobe, query) scored
      // against the brute-force ground truth
      ("sim_nprobe_sweep" ->
        """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
           cent AS (SELECT label, d,
               CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM dims GROUP BY 1, 2),
           qd AS (SELECT vec_id AS q_id, d, val AS qv FROM dims
             WHERE vec_id < 5),
           score AS (SELECT qd.q_id, cent.label,
               CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))
                   * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
               / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))
                     * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                  * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                     * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
             FROM cent JOIN qd USING (d) GROUP BY 1, 2),
           rk AS (SELECT q_id, label,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY s DESC, label) AS BIGINT) AS cell_rk
             FROM score QUALIFY cell_rk <= 4),
           np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
           qe AS (SELECT vec_id AS q_id, embedding AS q_emb
             FROM embeddings WHERE vec_id < 5),
           cand AS (SELECT np.nprobe, rk.q_id, v.vec_id,
               v.embedding, qe.q_emb
             FROM rk JOIN np ON rk.cell_rk <= np.nprobe
             JOIN embeddings v ON v.label = rk.label
             JOIN qe ON qe.q_id = rk.q_id
             WHERE v.vec_id <> rk.q_id),
           swtop AS (SELECT nprobe, q_id, vec_id FROM (SELECT nprobe,
               q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
                 ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                   vec_id) AS rn
             FROM cand) WHERE rn <= 10),
           brute AS (SELECT q_id, vec_id FROM (SELECT qe.q_id, v.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qe.q_id
                 ORDER BY list_cosine_similarity(v.embedding, qe.q_emb)
                   DESC, v.vec_id) AS rn
             FROM embeddings v, qe WHERE v.vec_id <> qe.q_id)
             WHERE rn <= 10),
           hits AS (SELECT nprobe, COUNT(*) AS n_hits
             FROM swtop JOIN brute USING (q_id, vec_id) GROUP BY 1),
           nc AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand
             FROM cand GROUP BY 1)
           SELECT nc.nprobe, nc.n_cand,
             CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
             ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / 50.0, 6)
               AS recall
           FROM nc LEFT JOIN hits USING (nprobe) ORDER BY nprobe""") +
      // per-type chi-square decomposition of second-half drift against
      // the first half's distribution as the null
      ("events_drift" ->
        """WITH h AS (SELECT event_type,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 0 ELSE 1 END) AS BIGINT) AS n_first,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_second
           FROM events GROUP BY 1),
           t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
             CAST(SUM(n_second) AS BIGINT) AS t2 FROM h)
           SELECT event_type, n_first, n_second,
             ROUND(CAST(n_first AS DOUBLE) / t1, 6) AS share_first,
             ROUND(CAST(n_second AS DOUBLE) / t2, 6) AS share_second,
             ROUND(POWER(n_second - CAST(t2 AS DOUBLE) * n_first / t1, 2)
               / (CAST(t2 AS DOUBLE) * n_first / t1), 6) AS chi2_term
           FROM h, t ORDER BY event_type""") +
      // curriculum phases: exact global quality rank (score DESC,
      // doc_id) cut into 4 equal integer-arithmetic phases; DECIMAL-
      // summed per-phase mean score (the oracle may use a plain global
      // window — the Spark plan decomposes the same rank distributedly)
      ("docs_curriculum" ->
        """WITH scored AS (SELECT * FROM (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents) WHERE n_tok > 0),
           sc2 AS (SELECT *,
             CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS score
           FROM scored),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc2),
           rk AS (SELECT lang, n_tok, score,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS BIGINT) AS r
           FROM sc2),
           ph AS (SELECT lang, n_tok, score,
             1 + ((r - 1) * 4 // nn.n) AS phase FROM rk, nn)
           SELECT phase, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tokens,
             ROUND(CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 6) AS mean_score
           FROM ph GROUP BY 1, 2 ORDER BY phase, lang""") +
      // budget-constrained greedy selection: quality-ranked prefix whose
      // running token sum fits half the corpus's token mass; ties
      // (score DESC, doc_id); floor(total/2) == truncation on positives
      ("docs_budget_select" ->
        """WITH scored AS (SELECT * FROM (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents) WHERE n_tok > 0),
           sc2 AS (SELECT *,
             CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS score
           FROM scored),
           b AS (SELECT CAST(FLOOR(SUM(n_tok) / 2) AS BIGINT) AS budget
             FROM scored),
           ranked AS (SELECT lang, n_tok,
             SUM(n_tok) OVER (ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM sc2),
           lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens
             FROM scored GROUP BY lang),
           kept AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
             FROM ranked, b WHERE cum <= b.budget GROUP BY lang)
           SELECT k.lang, k.n_docs_kept, k.tokens_kept,
             ROUND(CAST(k.tokens_kept AS DOUBLE)
               / CAST(lt.lang_tokens AS DOUBLE), 6) AS lang_share_kept
           FROM kept k JOIN lt USING (lang) ORDER BY lang""") +
      // watermark late-data policy (see StreamingAnalytics.streamLateData
      // for the 3-file arrival schedule): deep-late rows (ts < Jan 2,
      // arriving after the watermark passed) are ABSENT, within-watermark
      // late rows (Jan 7 morning) are PRESENT, and windows past the final
      // watermark (max event time - 1 hour) are withheld
      ("stream_late_data" ->
        """WITH e AS (SELECT ts FROM events
             WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
           kept AS (SELECT ts FROM e
             WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'),
           wmf AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM e),
           win AS (SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM kept GROUP BY 1)
           SELECT strftime(win.h, '%Y-%m-%d %H:%M:%S') AS hour_start, n
           FROM win, wmf WHERE win.h + INTERVAL 1 HOUR <= wmf.w
           ORDER BY hour_start""") +
      // the growing-corpus loop, two real increments: increment 1 dedups
      // against the corpus, increment 2 against corpus + increment 1's
      // appended signatures — the same candidate/verify/argmax program
      // per step with the index side widened
      ("stream_sig_index_multi" -> OracleGen.incrementalMinhashOracleSql(Seq(
        "sx.sn >= 10 AND sx.sn < 15 AND sy.sn < 10",
        "sx.sn >= 15 AND sy.sn < 15"))) +
      // stream-stream LEFT OUTER interval join: the flush sentinel
      // advances both watermarks past every real purchase, so eviction
      // emits every unmatched row and the streamed result equals the
      // batch outer join; null view side rendered '-' (null-free rows)
      ("stream_join_outer" ->
        """SELECT p.event_id AS purchase_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           COALESCE(strftime(v.ts, '%Y-%m-%d %H:%M:%S'), '-') AS view_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON v.user_id = p.user_id
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
           ORDER BY purchase_id, view_ts""") +
      // FULL OUTER completion: view-side unmatched rows emit on
      // eviction too; both null sides rendered -1 / '-'
      ("stream_join_full_outer" ->
        """SELECT CAST(COALESCE(p.event_id, -1) AS BIGINT) AS purchase_id,
           COALESCE(p.user_id, v.user_id) AS user_id,
           CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_id,
           COALESCE(strftime(p.ts, '%Y-%m-%d %H:%M:%S'), '-')
             AS purchase_ts,
           COALESCE(strftime(v.ts, '%Y-%m-%d %H:%M:%S'), '-') AS view_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON v.user_id = p.user_id
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
           ORDER BY purchase_id, view_id""") +
      // update-mode changelog folded to final state == the batch answer
      ("stream_update_counts" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS hour_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
           GROUP BY 1, 2 ORDER BY hour_start, event_type""") +
      // CDC upsert: count folds by addition, latest-event folds by
      // argmax on (ts, event_id) — both associative, so the merged
      // state equals the one-pass batch answer however arrivals split
      ("stream_cdc_upsert" ->
        """SELECT user_id, n_events,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             event_type AS last_type, value AS last_value
           FROM (
             SELECT user_id, ts, event_type, value,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) t
           WHERE rn = 1 ORDER BY user_id""") +
      // watermark-horizon dedup: the streamed census equals the exact
      // batch census because every injected retry replay is dropped
      // in-state (overcount if the drop failed, undercount if eviction
      // ran early)
      ("stream_dedup_watermark" ->
        """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1 ORDER BY event_type""") +
      ("events_ks_test" ->
        """WITH ev AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
               user_id % 2 = 0 AS treat
             FROM events WHERE value IS NOT NULL),
           hist AS (SELECT c,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                 AS nb
             FROM ev GROUP BY 1),
           cum AS (SELECT c,
               SUM(na) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                 AS cuma,
               SUM(nb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                 AS cumb
             FROM hist),
           tot AS (SELECT CAST(SUM(na) AS BIGINT) AS n1,
               CAST(SUM(nb) AS BIGINT) AS n2 FROM hist),
           d AS (SELECT n1, n2,
               MAX(ABS(CAST(cuma AS DECIMAL(38,0)) * n2
                 - CAST(cumb AS DECIMAL(38,0)) * n1)) AS dnum
             FROM cum, tot GROUP BY 1, 2),
           s AS (SELECT n1, n2, CAST(dnum AS DOUBLE)
                 / CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)
                 AS d_stat
             FROM d),
           l AS (SELECT *,
               sqrt(CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE)) * d_stat AS lambda
             FROM s)
           SELECT n1, n2, ROUND(d_stat, 6) AS d_stat,
             ROUND(lambda, 6) AS lambda,
             ROUND(LEAST(1.0, GREATEST(0.0,
               2.0 * (exp(-2.0 * lambda * lambda)
                 - exp(-8.0 * lambda * lambda)
                 + exp(-18.0 * lambda * lambda)))), 6) AS p_approx
           FROM l""") +
      ("events_chisq" ->
        """WITH cells AS (SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS o_t,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
                 AS BIGINT) AS o_c
             FROM events GROUP BY 1),
           tot AS (SELECT CAST(SUM(o_t) AS BIGINT) AS m_t,
               CAST(SUM(o_c) AS BIGINT) AS m_c,
               CAST(COUNT(*) AS BIGINT) AS r FROM cells),
           ct AS (SELECT event_type, o_t, o_c, r, m_t + m_c AS n,
               CAST(CAST(o_t + o_c AS DECIMAL(38,0)) * m_t AS DOUBLE)
                 / CAST(m_t + m_c AS DOUBLE) AS e_t,
               CAST(CAST(o_t + o_c AS DECIMAL(38,0)) * m_c AS DOUBLE)
                 / CAST(m_t + m_c AS DOUBLE) AS e_c
             FROM cells, tot),
           cb AS (SELECT *,
               CAST((o_t - e_t) * (o_t - e_t) / e_t
                 + (o_c - e_c) * (o_c - e_c) / e_c
                 AS DECIMAL(28,12)) AS contrib
             FROM ct),
           st AS (SELECT SUM(contrib) AS chi2_sum FROM cb)
           SELECT event_type, o_t, o_c, ROUND(e_t, 4) AS e_t,
             ROUND(CAST(contrib AS DOUBLE), 6) AS contrib,
             ROUND(CAST(chi2_sum AS DOUBLE), 6) AS chi2,
             CAST(r - 1 AS BIGINT) AS df,
             ROUND(sqrt(CAST(chi2_sum AS DOUBLE) / CAST(n AS DOUBLE)),
               6) AS cramers_v
           FROM cb, st ORDER BY event_type""") +
      ("events_fdr_bh" ->
        """WITH t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_t
             FROM events GROUP BY 1),
           z AS (SELECT *, CAST(2.0 * n_t - n AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE)) AS z FROM t),
           a AS (SELECT *, ABS(z) / sqrt(2.0) AS az FROM z),
           e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * az) AS tt FROM a),
           p AS (SELECT *, CAST(tt * (0.254829592
                 + tt * (-0.284496736 + tt * (1.421413741
                 + tt * (-1.453152027 + tt * 1.061405429))))
                 * exp(-az * az) AS DECIMAL(28,12)) AS p FROM e),
           m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
           r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p, event_type)
                 AS rk FROM p, m),
           q AS (SELECT *, CAST(p AS DOUBLE) * m / rk AS q FROM r),
           adj AS (SELECT *, LEAST(1.0, MIN(q) OVER (ORDER BY rk DESC
                 ROWS UNBOUNDED PRECEDING)) AS p_adj FROM q)
           SELECT event_type, n, n_t, ROUND(z, 6) AS z,
             ROUND(CAST(p AS DOUBLE), 6) AS p_raw,
             CAST(rk AS BIGINT) AS rk, ROUND(p_adj, 6) AS p_adj,
             p_adj < 0.05 AS rejected
           FROM adj ORDER BY rk""") +
      ("text_good_turing" ->
        """WITH tok AS (SELECT lang,
               unnest(string_split(text, ' ')) AS token FROM documents),
           cnt AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           cofc AS (SELECT lang, cnt AS r, CAST(COUNT(*) AS BIGINT)
                 AS n_r FROM cnt GROUP BY 1, 2),
           tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens
             FROM cnt GROUP BY 1),
           led AS (SELECT lang, r, n_r,
               LEAD(n_r) OVER (PARTITION BY lang ORDER BY r) AS n_next,
               LEAD(r) OVER (PARTITION BY lang ORDER BY r) AS next_r
             FROM cofc),
           f AS (SELECT led.lang, r, n_r, n_tokens,
               CASE WHEN next_r = r + 1 THEN
                 CAST(r + 1 AS DOUBLE) * n_next / n_r END AS r_star,
               MAX(CASE WHEN r = 1 THEN n_r END)
                 OVER (PARTITION BY led.lang) AS p0_num
             FROM led JOIN tot ON led.lang = tot.lang
             WHERE r <= 5)
           SELECT lang, r, n_r, ROUND(r_star, 6) AS r_star,
             ROUND(r_star / CAST(n_tokens AS DOUBLE), 9) AS p_gt,
             ROUND(CAST(p0_num AS DOUBLE) / CAST(n_tokens AS DOUBLE),
               9) AS p0_unseen
           FROM f ORDER BY lang, r""") +
      ("orders_newsvendor" ->
        """WITH monthly AS (SELECT l_partkey,
               date_trunc('month', l_shipdate) AS mo,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS qm
             FROM lineitem GROUP BY 1, 2),
           top AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m
             FROM monthly GROUP BY 1
             ORDER BY m DESC, l_partkey LIMIT 5),
           d AS (SELECT monthly.l_partkey, qm, m,
               COUNT(*) OVER (PARTITION BY monthly.l_partkey
                 ORDER BY qm, mo ROWS UNBOUNDED PRECEDING) AS cum
             FROM monthly JOIN top USING (l_partkey)),
           qs AS (SELECT l_partkey, MIN(qm) AS q_star, MAX(m) AS m
             FROM d WHERE cum * 10 >= m * 9 GROUP BY 1),
           c AS (SELECT d.l_partkey, d.qm, qs.q_star, qs.m
             FROM d JOIN qs ON d.l_partkey = qs.l_partkey)
           SELECT l_partkey, MAX(m) AS n_months,
             ROUND(CAST(MAX(q_star) AS DOUBLE) / 100.0, 2) AS q_star,
             ROUND(CAST(SUM(qm) AS DOUBLE) / MAX(m) / 100.0, 4)
               AS mean_demand,
             ROUND(CAST(SUM(CASE WHEN qm < q_star
                 THEN 1 * (q_star - qm)
                 ELSE 9 * (qm - q_star) END) AS DOUBLE)
               / MAX(m) / 100.0, 4) AS exp_cost
           FROM c GROUP BY 1 ORDER BY l_partkey""") +
      ("dq_gap_islands" ->
        """WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderstatus = 'F'),
           g AS (SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp
             FROM keys),
           isl AS (SELECT grp, MIN(k) AS lo, MAX(k) AS hi,
               CAST(COUNT(*) AS BIGINT) AS len FROM g GROUP BY 1),
           gp AS (SELECT hi + 1 AS gap_start,
               LEAD(lo) OVER (ORDER BY lo) - hi - 1 AS gap_len
             FROM isl),
           census AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(len) AS BIGINT) AS n_keys,
               CAST(MAX(len) AS BIGINT) AS longest_island,
               MAX(hi) - MIN(lo) + 1 AS span FROM isl),
           top AS (SELECT gap_start, gap_len, ROW_NUMBER()
                 OVER (ORDER BY gap_len DESC, gap_start) AS rk
             FROM gp WHERE gap_len IS NOT NULL AND gap_len > 0)
           SELECT CAST(rk AS BIGINT) AS rk, gap_start, gap_len,
             n_islands, n_keys, longest_island,
             span - n_keys AS n_missing
           FROM top, census WHERE rk <= 5 ORDER BY rk""") +
      ("mm_vad_segments" ->
        """WITH audio AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 3 = 1 AND length(text) > 0),
           b AS (SELECT doc_id, (pos - 1) // 32 AS w,
               CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
                 AS BIGINT) AS v
             FROM (SELECT doc_id, text,
                     unnest([p for p in range(1, length(text) + 1)])
                       AS pos
                   FROM audio) u),
           wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT)
                 AS energy FROM b GROUP BY 1, 2),
           tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_windows, MAX(energy) AS peak
             FROM wins GROUP BY 1),
           act AS (SELECT wins.doc_id, w FROM wins
             JOIN tot ON wins.doc_id = tot.doc_id
             WHERE energy * 10 >= peak * 9),
           seg0 AS (SELECT doc_id, w,
               LAG(w) OVER (PARTITION BY doc_id ORDER BY w) AS prev
             FROM act),
           seg1 AS (SELECT doc_id, w, CASE WHEN prev IS NULL
                 OR w - prev > 2 THEN 1 ELSE 0 END AS new_seg
             FROM seg0),
           seg2 AS (SELECT doc_id, w, SUM(new_seg)
                 OVER (PARTITION BY doc_id ORDER BY w
                   ROWS UNBOUNDED PRECEDING) AS seg_id
             FROM seg1),
           segs AS (SELECT doc_id, seg_id, MIN(w) AS s, MAX(w) AS e,
               CAST(COUNT(*) AS BIGINT) AS n_active
             FROM seg2 GROUP BY 1, 2),
           per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_segments,
               CAST(SUM(n_active) AS BIGINT) AS n_active_windows,
               MAX(e - s + 1) AS longest_segment,
               MIN(s) AS first_onset
             FROM segs GROUP BY 1)
           SELECT per.doc_id, n_segments, n_active_windows,
             longest_segment, first_onset, n_windows,
             ROUND(CAST(n_active_windows AS DOUBLE)
               / CAST(n_windows AS DOUBLE), 4) AS active_ratio
           FROM per JOIN tot ON per.doc_id = tot.doc_id
           ORDER BY per.doc_id""") +
      ("sim_maxsim_multivec" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 3),
           inter AS (SELECT e.label, q.q_id,
               MAX(CAST(list_cosine_similarity(e.embedding, q.q_emb)
                 AS DECIMAL(18,9))) AS tok_max
             FROM embeddings e, q WHERE e.vec_id <> q.q_id
             GROUP BY 1, 2),
           sc AS (SELECT label, CAST(COUNT(*) AS BIGINT)
                 AS n_tokens_matched,
               SUM(tok_max) AS score, MIN(tok_max) AS weakest
             FROM inter GROUP BY 1),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, label) AS rk FROM sc)
           SELECT CAST(rk AS BIGINT) AS rk, label, n_tokens_matched,
             ROUND(CAST(score AS DOUBLE), 6) AS maxsim_score,
             ROUND(CAST(weakest AS DOUBLE), 6) AS weakest_token
           FROM r ORDER BY rk""") +
      ("events_shapley_attribution" ->
        """WITH users AS (SELECT user_id,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                   AND value IS NOT NULL
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev
             FROM events GROUP BY 1),
           touch AS (SELECT e.user_id,
               array_to_string(list_sort(list(DISTINCT e.event_type)),
                 ',') AS c_key
             FROM events e JOIN users u ON e.user_id = u.user_id
             WHERE e.event_type <> 'purchase'
               AND (u.fp IS NULL OR e.ts < u.fp)
             GROUP BY 1),
           coal AS (SELECT COALESCE(t.c_key, '') AS c_key,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(rev) AS BIGINT) AS rev
             FROM users u LEFT JOIN touch t ON u.user_id = t.user_id
             GROUP BY 1),
           chs AS (SELECT channel,
               CAST(ROW_NUMBER() OVER (ORDER BY channel) - 1 AS INT)
                 AS i
             FROM (SELECT DISTINCT event_type AS channel FROM events
                   WHERE event_type <> 'purchase') d),
           nch AS (SELECT CAST(COUNT(*) AS INT) AS n FROM chs),
           fct AS (SELECT * FROM (VALUES (0, 1), (1, 1), (2, 2),
               (3, 6), (4, 24)) AS t(s, f)),
           masks AS (SELECT CAST(range AS INT) AS mask
             FROM range(16) CROSS JOIN nch WHERE range < (1 << n)),
           enum0 AS (SELECT m.mask,
               COALESCE(string_agg(c.channel, ','
                   ORDER BY c.channel), '') AS c_key,
               CAST(COUNT(c.channel) AS INT) AS sz
             FROM masks m
             LEFT JOIN chs c ON ((m.mask >> c.i) & 1) = 1
             GROUP BY m.mask),
           v AS (SELECT mask, sz,
               COALESCE(CAST(CAST(rev AS DOUBLE) / n_users
                   AS DECIMAL(28,12)),
                 CAST(0 AS DECIMAL(28,12))) AS v
             FROM enum0 LEFT JOIN coal USING (c_key)),
           terms AS (SELECT c.channel,
               CAST((f0.f * f1.f) * (v1.v - v0.v) AS DECIMAL(28,12))
                 AS term
             FROM chs c
             CROSS JOIN nch
             JOIN v v0 ON ((v0.mask >> c.i) & 1) = 0
             JOIN v v1 ON v1.mask = v0.mask + (1 << c.i)
             JOIN fct f0 ON f0.s = v0.sz
             JOIN fct f1 ON f1.s = nch.n - 1 - v0.sz),
           phi AS (SELECT channel, SUM(term) AS phin FROM terms
             GROUP BY 1),
           tot AS (SELECT SUM(phin) AS phi_sum FROM phi),
           nf AS (SELECT CAST(f AS DOUBLE) AS nfact FROM fct
             JOIN nch ON fct.s = nch.n)
           SELECT channel,
             ROUND(CAST(phin AS DOUBLE) / nfact / 100.0, 4)
               AS phi_revenue,
             ROUND(CAST(phin AS DOUBLE) / CAST(phi_sum AS DOUBLE), 6)
               AS share
           FROM phi CROSS JOIN tot CROSS JOIN nf
           ORDER BY channel""") +
      ("events_granger" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
             FROM events WHERE value IS NOT NULL GROUP BY 1),
           lagged AS (SELECT y,
               LAG(y) OVER (ORDER BY d) AS yl,
               LAG(x) OVER (ORDER BY d) AS xl
             FROM daily),
           f AS (SELECT * FROM lagged WHERE yl IS NOT NULL),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(yl) AS BIGINT) AS syl,
               CAST(SUM(xl) AS BIGINT) AS sxl,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
               SUM(CAST(y AS DECIMAL(38,0)) * yl) AS syyl,
               SUM(CAST(y AS DECIMAL(38,0)) * xl) AS syxl,
               SUM(CAST(yl AS DECIMAL(38,0)) * yl) AS syll,
               SUM(CAST(xl AS DECIMAL(38,0)) * xl) AS sxll,
               SUM(CAST(yl AS DECIMAL(38,0)) * xl) AS sylxl
             FROM f),
           c AS (SELECT n,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
                 / CAST(n AS DOUBLE) AS cyy,
               CAST(syyl AS DOUBLE) - CAST(sy AS DOUBLE) * syl
                 / CAST(n AS DOUBLE) AS c01,
               CAST(syxl AS DOUBLE) - CAST(sy AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c02,
               CAST(syll AS DOUBLE) - CAST(syl AS DOUBLE) * syl
                 / CAST(n AS DOUBLE) AS c11,
               CAST(sxll AS DOUBLE) - CAST(sxl AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c22,
               CAST(sylxl AS DOUBLE) - CAST(syl AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c12
             FROM s),
           bb AS (SELECT *,
               c11 * c22 - c12 * c12 AS det FROM c),
           b AS (SELECT *,
               CASE WHEN det > 0
                 THEN (c01 * c22 - c02 * c12) / det END AS b1,
               CASE WHEN det > 0
                 THEN (c02 * c11 - c01 * c12) / det END AS b2
             FROM bb),
           r AS (SELECT *,
               cyy - b1 * c01 - b2 * c02 AS rss_u,
               CASE WHEN c11 > 0
                 THEN cyy - c01 * c01 / c11 END AS rss_r
             FROM b)
           SELECT n AS n_days, ROUND(b1, 6) AS beta_self,
             ROUND(b2, 6) AS beta_cross,
             ROUND(rss_r / 1e8, 4) AS rss_restricted,
             ROUND(rss_u / 1e8, 4) AS rss_unrestricted,
             ROUND((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat
           FROM r""") +
      ("events_qini_curve" ->
        """WITH sp AS (SELECT epoch(MIN(ts))
               + (epoch(MAX(ts)) - epoch(MIN(ts))) / 2 AS mid
             FROM events),
           u AS (SELECT user_id,
               CAST(SUM(CASE WHEN epoch(ts) < mid THEN 1 ELSE 0 END)
                 AS BIGINT) AS score,
               CAST(SUM(CASE WHEN epoch(ts) >= mid
                   AND event_type = 'purchase' AND value IS NOT NULL
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev,
               user_id % 2 = 0 AS treat
             FROM events, sp GROUP BY user_id),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM u),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, user_id) AS rk
             FROM u, nn),
           bkt AS (SELECT *,
               CAST((rk * 5 + n_all - 1) // n_all AS BIGINT) AS bucket
             FROM r),
           g AS (SELECT bucket,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_t,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_c,
               CAST(SUM(CASE WHEN treat THEN rev ELSE 0 END)
                 AS BIGINT) AS r_t,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE rev END)
                 AS BIGINT) AS r_c
             FROM bkt GROUP BY 1),
           cm AS (SELECT bucket,
               SUM(n_t) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cn_t,
               SUM(n_c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cn_c,
               SUM(r_t) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cr_t,
               SUM(r_c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cr_c
             FROM g),
           qn AS (SELECT *, (CAST(cr_t AS DOUBLE)
                 - CAST(cr_c AS DOUBLE) * cn_t / cn_c) / 100.0 AS qini
             FROM cm),
           ql AS (SELECT *, LAST_VALUE(qini) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS qini_last
             FROM qn)
           SELECT bucket, CAST(cn_t AS BIGINT) AS cn_t,
             CAST(cn_c AS BIGINT) AS cn_c,
             ROUND(CAST(cr_t AS DOUBLE) / 100.0, 2) AS rev_treat,
             ROUND(CAST(cr_c AS DOUBLE) / 100.0, 2) AS rev_ctrl,
             ROUND(qini, 4) AS qini,
             ROUND(qini_last * bucket / 5, 4) AS qini_random
           FROM ql ORDER BY bucket""") +
      ("graph_squares" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
             UNION SELECT label, v2, v1 FROM knn),
           pairs AS (SELECT x.label, x.v AS a, y.v AS b,
               CAST(COUNT(*) AS BIGINT) AS m
             FROM und x JOIN und y
               ON x.label = y.label AND x.u = y.u AND x.v < y.v
             GROUP BY 1, 2, 3)
           SELECT label, CAST(COUNT(*) AS BIGINT) AS n_diag_pairs,
             CAST(SUM((m * (m - 1)) // 2) // 2 AS BIGINT) AS n_squares
           FROM pairs GROUP BY label ORDER BY label""") +
      ("text_bm25_topk" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_terms_hit, SUM(term_score) AS score
             FROM sc GROUP BY 1),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, doc_id) AS rk FROM agg)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_terms_hit,
             ROUND(CAST(score AS DOUBLE), 6) AS bm25
           FROM r WHERE rk <= 10 ORDER BY rk""") +
      ("dq_k_anonymity" ->
        """WITH classes AS (SELECT lang, source,
               n_chars - (n_chars % 100) AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS sz
             FROM documents GROUP BY 1, 2, 3),
           hist AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_classes
             FROM classes GROUP BY 1),
           tot AS (SELECT CAST(SUM(n_classes) AS BIGINT) AS all_classes,
               CAST(SUM(sz * n_classes) AS BIGINT) AS all_rows,
               CAST(MIN(sz) AS BIGINT) AS min_class_size FROM hist),
           ks AS (SELECT unnest([2, 5, 10]) AS k),
           per AS (SELECT k,
               CAST(SUM(CASE WHEN sz < k THEN n_classes ELSE 0 END)
                 AS BIGINT) AS classes_below_k,
               CAST(SUM(CASE WHEN sz < k THEN sz * n_classes
                 ELSE 0 END) AS BIGINT) AS rows_at_risk
             FROM ks, hist GROUP BY 1)
           SELECT CAST(k AS BIGINT) AS k, all_classes AS n_classes,
             classes_below_k, rows_at_risk,
             ROUND(CAST(rows_at_risk AS DOUBLE)
               / CAST(all_rows AS DOUBLE), 6) AS risk_share,
             min_class_size
           FROM per, tot ORDER BY k""") +
      ("dedup_bbit_minhash" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
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
           slots AS (SELECT c.d1, c.d2,
               CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END)
                 AS BIGINT) AS slots_eq,
               CAST(SUM(CASE WHEN
                   (strpos('0123456789abcdef', substr(a.h, 32, 1)) - 1)
                     % 2 =
                   (strpos('0123456789abcdef', substr(b.h, 32, 1)) - 1)
                     % 2 THEN 1 ELSE 0 END) AS BIGINT) AS bits_eq
             FROM cand c JOIN mh a ON c.d1 = a.doc_id
                         JOIN mh b ON c.d2 = b.doc_id AND a.i = b.i
             GROUP BY 1, 2),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh
             GROUP BY doc_id),
           inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                     FROM cand c JOIN sh a ON c.d1 = a.doc_id
                                 JOIN sh b ON c.d2 = b.doc_id
                                   AND a.shingle = b.shingle
                     GROUP BY 1, 2),
           v AS (SELECT x.d1, x.d2,
               CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) AS exact
             FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                          JOIN sizes s2 ON x.d2 = s2.doc_id)
           SELECT v.d1, v.d2, sl.slots_eq, sl.bits_eq,
             ROUND(CAST(sl.slots_eq AS DOUBLE) / 9, 3) AS est_full,
             ROUND(2.0 * CAST(sl.bits_eq AS DOUBLE) / 9 - 1.0, 3)
               AS est_b1,
             ROUND(v.exact, 3) AS exact_jaccard,
             ROUND(abs(CAST(sl.slots_eq AS DOUBLE) / 9 - v.exact), 3)
               AS err_full,
             ROUND(abs(2.0 * CAST(sl.bits_eq AS DOUBLE) / 9 - 1.0
               - v.exact), 3) AS err_b1
           FROM v JOIN slots sl ON v.d1 = sl.d1 AND v.d2 = sl.d2
           ORDER BY v.d1, v.d2""") +
      ("events_absorption_time" -> OracleGen.absorptionOracle(12)) +
      ("sim_hubness" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           ind AS (SELECT label, v2, CAST(COUNT(*) AS BIGINT) AS d
             FROM knn GROUP BY 1, 2),
           verts AS (SELECT e.label, e.vec_id,
               CAST(COALESCE(d, 0) AS BIGINT) AS d
             FROM embeddings e LEFT JOIN ind
               ON e.label = ind.label AND e.vec_id = ind.v2),
           top AS (SELECT label, vec_id AS top_hub, d AS top_k_occ
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY d DESC, vec_id) AS rk FROM verts) z
             WHERE rk = 1),
           agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_antihubs
             FROM verts GROUP BY 1)
           SELECT a.label, n_vectors, n_antihubs, top_hub,
             CAST(top_k_occ AS BIGINT) AS top_k_occ,
             ROUND(CAST(sd AS DOUBLE) / n_vectors, 6) AS mean_k_occ,
             ROUND(sqrt(CAST(n_vectors * sdd - sd * sd AS DOUBLE))
               / CAST(n_vectors AS DOUBLE), 6) AS std_k_occ
           FROM agg a JOIN top t ON a.label = t.label
           ORDER BY a.label""") +
      ("sim_filtered_topk" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 5),
           scored AS (SELECT q.q_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.q_emb) AS sim
             FROM embeddings e, q WHERE e.vec_id <> q.q_id),
           pre AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
                 AS rk
               FROM scored WHERE vec_id % 2 = 0) z WHERE rk <= 10),
           post AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
                 AS rk
               FROM scored) z WHERE rk <= 20 AND vec_id % 2 = 0),
           hit AS (SELECT pre.q_id, CAST(COUNT(*) AS BIGINT)
                 AS n_truth,
               CAST(SUM(CASE WHEN post.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS n_hit
             FROM pre LEFT JOIN post ON pre.q_id = post.q_id
               AND pre.vec_id = post.vec_id
             GROUP BY 1),
           pk AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_post_kept
             FROM post GROUP BY 1)
           SELECT hit.q_id, n_truth, n_post_kept, n_hit,
             ROUND(CAST(n_hit AS DOUBLE) / n_truth, 4) AS recall_post
           FROM hit JOIN pk USING (q_id) ORDER BY hit.q_id""") +
      ("docs_rho_select" ->
        """WITH toks AS (SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tk AS (SELECT * FROM toks WHERE token <> ''),
           tgt AS (SELECT MIN(source) AS tgt FROM tk),
           gen AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_gen
             FROM tk GROUP BY 1),
           tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_tgt
             FROM tk, tgt WHERE source = tgt GROUP BY 1),
           vt AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
               CAST(SUM(c_gen) AS BIGINT) AS n_gen FROM gen),
           tt AS (SELECT CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM tc),
           ratio AS (SELECT token,
               ln(CAST(COALESCE(c_tgt, 0) + 1 AS DOUBLE)
                   / CAST(n_tgt + v AS DOUBLE))
                 - ln(CAST(c_gen + 1 AS DOUBLE)
                   / CAST(n_gen + v AS DOUBLE)) AS lr
             FROM gen LEFT JOIN tc USING (token), vt, tt),
           pd AS (SELECT doc_id, source, token,
               CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2, 3),
           s AS (SELECT doc_id, source,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               SUM(CAST(tf * lr AS DECIMAL(28,12))) AS s
             FROM pd JOIN ratio USING (token) GROUP BY 1, 2),
           r AS (SELECT *, CAST(s AS DOUBLE) / n_tokens AS rho FROM s),
           rr AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY rho DESC, doc_id) AS rk FROM r)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id, source, n_tokens,
             ROUND(rho, 6) AS rho, source = tgt AS from_target
           FROM rr, tgt WHERE rk <= 10 ORDER BY rk""") +
      ("sim_semantic_drift" ->
        """WITH seeds AS (SELECT vec_id AS seed_id, embedding AS s_emb
               FROM embeddings ORDER BY vec_id LIMIT 8),
           asg AS (SELECT e.label, e.vec_id, seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.s_emb)
                   DESC, seed_id) AS rk
             FROM embeddings e, seeds s),
           a AS (SELECT label, seed_id AS bucket FROM asg WHERE rk = 1),
           bl AS (SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS c
             FROM a GROUP BY 1, 2),
           lt AS (SELECT label, CAST(SUM(c) AS BIGINT) AS n_label
             FROM bl GROUP BY 1),
           gb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS g
             FROM bl GROUP BY 1),
           gt AS (SELECT CAST(SUM(g) AS BIGINT) AS n_all FROM gb),
           grid AS (SELECT lt.label, gb.bucket, lt.n_label, gb.g,
               gt.n_all, CAST(COALESCE(bl.c, 0) AS BIGINT) AS c
             FROM lt CROSS JOIN gb CROSS JOIN gt
             LEFT JOIN bl ON bl.label = lt.label
               AND bl.bucket = gb.bucket),
           t AS (SELECT label, n_label, c, bucket,
               CAST((CASE WHEN p > 0 THEN p * ln(p / m) / 2.0
                   ELSE 0.0 END)
                 + (CASE WHEN q > 0 THEN q * ln(q / m) / 2.0
                   ELSE 0.0 END) AS DECIMAL(28,12)) AS term
             FROM (SELECT *, CAST(c AS DOUBLE) / n_label AS p,
                     CAST(g AS DOUBLE) / n_all AS q,
                     (CAST(c AS DOUBLE) / n_label
                       + CAST(g AS DOUBLE) / n_all) / 2.0 AS m
                   FROM grid) z),
           top AS (SELECT label, bucket AS top_bucket, c AS top_c
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY c DESC, bucket DESC) AS rk FROM t) y
             WHERE rk = 1)
           SELECT t.label, CAST(MAX(n_label) AS BIGINT) AS n_vectors,
             ROUND(CAST(SUM(term) AS DOUBLE), 6) AS js_to_global,
             MAX(top_bucket) AS top_bucket,
             ROUND(CAST(MAX(top_c) AS DOUBLE) / MAX(n_label), 4)
               AS top_bucket_share
           FROM t JOIN top ON t.label = top.label
           GROUP BY t.label ORDER BY t.label""") +
      ("json_variant_agg" ->
        """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CAST(json_extract_string(props, '$.k')
               AS BIGINT)) AS BIGINT) AS n_k_present,
             CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT)
               AS n_missing_path,
             MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS max_k,
             CAST(SUM(CAST(json_extract_string(props, '$.k')
               AS BIGINT)) AS BIGINT) AS sum_k
           FROM events GROUP BY 1 ORDER BY event_type""") +
      ("orders_theil_sen" ->
        """WITH daily0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d0 AS (SELECT MIN(day) AS day0 FROM daily0),
           daily AS (SELECT CAST(datediff('day', day0, day) AS BIGINT)
                 AS t, c
             FROM daily0, d0),
           pairs AS (SELECT a.t AS t1, b.t AS t2,
               CAST(b.c - a.c AS DOUBLE) / (b.t - a.t) AS slope
             FROM daily a JOIN daily b ON a.t < b.t),
           np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
             FROM pairs),
           ms AS (SELECT n_pairs, MIN(slope) AS sen_slope FROM (
               SELECT *, ROW_NUMBER() OVER (ORDER BY slope, t1, t2)
                 AS rk FROM pairs, np) z
             WHERE rk * 2 = n_pairs OR rk * 2 = n_pairs + 1
             GROUP BY n_pairs),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days
             FROM daily),
           mi AS (SELECT n_days, n_pairs, sen_slope,
               MIN(b) AS sen_intercept FROM (
               SELECT *, ROW_NUMBER() OVER (ORDER BY b, t) AS rk
               FROM (SELECT daily.t,
                       CAST(c AS DOUBLE) - sen_slope * t AS b,
                       n_days, n_pairs, sen_slope
                     FROM daily, ms, nd) y) z
             WHERE rk * 2 = n_days OR rk * 2 = n_days + 1
             GROUP BY 1, 2, 3),
           ols AS (SELECT (CAST(stc AS DOUBLE)
                 - CAST(st AS DOUBLE) * sc / n)
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
               AS ols_slope
             FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS st,
                 CAST(SUM(c) AS BIGINT) AS sc,
                 SUM(CAST(t AS DECIMAL(38,0)) * c) AS stc,
                 SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt
               FROM daily) s)
           SELECT n_days, n_pairs,
             ROUND(sen_slope / 100.0, 4) AS sen_slope,
             ROUND(sen_intercept / 100.0, 2) AS sen_intercept,
             ROUND(ols_slope / 100.0, 4) AS ols_slope
           FROM mi, ols""") +
      ("sample_horvitz_thompson" ->
        """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
           tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS mass FROM d),
           wp AS (SELECT lang, doc_id, n_chars,
               LEAST(1.0, 100.0 * n_chars / CAST(mass AS DOUBLE))
                 AS pi,
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
                 AS DOUBLE) / 4294967296.0 AS u
             FROM (SELECT *, md5('ht:' || CAST(doc_id AS VARCHAR))
                 AS h FROM d) z, tot),
           sam AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
               SUM(CAST(CAST(n_chars AS DOUBLE) / pi
                 AS DECIMAL(28,12))) AS ht_est
             FROM wp WHERE u < pi GROUP BY 1),
           pl AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT)
                 AS true_mass,
               CAST(COUNT(*) AS BIGINT) AS n_docs_lang
             FROM d GROUP BY 1),
           ex AS (SELECT lang, SUM(CAST(pi AS DECIMAL(28,12)))
                 AS exp_n
             FROM wp GROUP BY 1)
           SELECT sam.lang, n_docs_lang, n_sampled,
             ROUND(CAST(exp_n AS DOUBLE), 2) AS expected_n,
             true_mass,
             ROUND(CAST(ht_est AS DOUBLE), 2) AS ht_estimate,
             ROUND(abs(CAST(ht_est AS DOUBLE)
               - CAST(true_mass AS DOUBLE))
               / CAST(true_mass AS DOUBLE), 4) AS rel_err
           FROM sam JOIN pl ON sam.lang = pl.lang
           JOIN ex ON sam.lang = ex.lang
           ORDER BY sam.lang""") +
      ("events_growth_accounting" ->
        """WITH uw AS (SELECT user_id, date_trunc('week', ts) AS wk,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS rev
             FROM events
             WHERE event_type = 'purchase' AND value IS NOT NULL
             GROUP BY 1, 2),
           f AS (SELECT *,
               LAG(wk) OVER (PARTITION BY user_id ORDER BY wk)
                 AS prev_wk,
               LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk)
                 AS nxt_wk
             FROM uw),
           fl AS (SELECT wk, rev,
               prev_wk IS NULL AS is_new,
               prev_wk = wk - INTERVAL 7 DAY AS is_retained,
               prev_wk IS NOT NULL
                 AND prev_wk < wk - INTERVAL 7 DAY AS is_resurrected,
               nxt_wk IS NULL OR nxt_wk > wk + INTERVAL 7 DAY
                 AS churns_next
             FROM f),
           bw AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(rev) AS BIGINT) AS rev,
               CAST(SUM(CASE WHEN is_new THEN rev ELSE 0 END)
                 AS BIGINT) AS new_rev,
               CAST(SUM(CASE WHEN is_retained THEN rev ELSE 0 END)
                 AS BIGINT) AS retained_rev,
               CAST(SUM(CASE WHEN is_resurrected THEN rev ELSE 0 END)
                 AS BIGINT) AS resurrected_rev,
               CAST(SUM(CASE WHEN churns_next THEN rev ELSE 0 END)
                 AS BIGINT) AS churning_rev
             FROM fl GROUP BY 1),
           wc AS (SELECT bw.*, COALESCE(pr.churning_rev, 0)
                 AS churned_rev
             FROM bw LEFT JOIN bw pr
               ON pr.wk = bw.wk - INTERVAL 7 DAY)
           SELECT strftime(wk, '%Y-%m-%d') AS week, n_users,
             ROUND(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue,
             ROUND(CAST(new_rev AS DOUBLE) / 100.0, 2) AS new_rev,
             ROUND(CAST(retained_rev AS DOUBLE) / 100.0, 2)
               AS retained_rev,
             ROUND(CAST(resurrected_rev AS DOUBLE) / 100.0, 2)
               AS resurrected_rev,
             ROUND(CAST(churned_rev AS DOUBLE) / 100.0, 2)
               AS churned_prior_rev
           FROM wc ORDER BY week""") +
      ("feature_target_encoding" ->
        """WITH rows_ AS (SELECT o_orderpriority AS cat,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
             FROM orders),
           g AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS sy
             FROM rows_ GROUP BY 1),
           enc AS (SELECT rows_.cat, y, n_g, sy,
               CASE WHEN n_g > 1 THEN CAST(sy - y AS DOUBLE)
                 / CAST(n_g - 1 AS DOUBLE) END AS loo
             FROM rows_ JOIN g ON rows_.cat = g.cat)
           SELECT cat, CAST(MAX(n_g) AS BIGINT) AS n,
             ROUND(CAST(MAX(sy) AS DOUBLE) / MAX(n_g) / 100.0, 4)
               AS naive_mean,
             ROUND(CAST(SUM(CAST(loo AS DECIMAL(28,12))) AS DOUBLE)
               / MAX(n_g) / 100.0, 4) AS loo_mean,
             ROUND(MIN(loo) / 100.0, 2) AS loo_min,
             ROUND(MAX(loo) / 100.0, 2) AS loo_max,
             SUM(CAST((loo - CAST(sy AS DOUBLE) / n_g)
               * (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n_g)
               AS DECIMAL(28,12))) < 0 AS loo_anticorrelated
           FROM enc GROUP BY cat ORDER BY cat""") +
      ("orders_tier_migration" ->
        """WITH sp AS (SELECT epoch(MIN(o_orderdate))
               + (epoch(MAX(o_orderdate)) - epoch(MIN(o_orderdate)))
                 / 2 AS mid
             FROM orders),
           h1b AS (SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS m
             FROM orders, sp WHERE epoch(o_orderdate) < mid
             GROUP BY 1),
           n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM h1b),
           t1 AS (SELECT o_custkey,
               CAST((rk * 3 + n_cust - 1) // n_cust AS BIGINT)
                 AS tier_from
             FROM (SELECT *, ROW_NUMBER()
                   OVER (ORDER BY m, o_custkey) AS rk
                 FROM h1b, n1) z),
           h2b AS (SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS m
             FROM orders, sp WHERE epoch(o_orderdate) >= mid
             GROUP BY 1),
           n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM h2b),
           t2 AS (SELECT o_custkey,
               CAST((rk * 3 + n_cust - 1) // n_cust AS BIGINT)
                 AS tier_to
             FROM (SELECT *, ROW_NUMBER()
                   OVER (ORDER BY m, o_custkey) AS rk
                 FROM h2b, n2) z),
           j AS (SELECT CAST(COALESCE(tier_from, 0) AS BIGINT)
                 AS tier_from,
               CAST(COALESCE(tier_to, 0) AS BIGINT) AS tier_to
             FROM t1 FULL OUTER JOIN t2 USING (o_custkey)),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM j)
           SELECT tier_from, tier_to,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             ROUND(CAST(COUNT(*) AS DOUBLE) / n_all, 6) AS share
           FROM j, tot GROUP BY 1, 2, n_all
           ORDER BY tier_from, tier_to""") +
      ("text_source_ce_matrix" ->
        """WITH tok AS (SELECT source,
               unnest(string_split(text, ' ')) AS token FROM documents),
           cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           tt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
             FROM cnt GROUP BY 1),
           vb AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
             FROM cnt),
           sb AS (SELECT source AS src_b, n_src AS n_b FROM tt),
           ex AS (SELECT a.source AS src_a, sb.src_b, a.c, tt.n_src,
               sb.n_b, vb.v, b.c AS c_b
             FROM cnt a JOIN tt ON a.source = tt.source
             CROSS JOIN sb CROSS JOIN vb
             LEFT JOIN cnt b ON b.source = sb.src_b
               AND b.token = a.token),
           t AS (SELECT src_a, src_b,
               CAST(-p * ln(CAST(COALESCE(c_b, 0) + 1 AS DOUBLE)
                 / CAST(n_b + v AS DOUBLE)) AS DECIMAL(28,12))
                 AS ce_term,
               CAST(-p * ln(p) AS DECIMAL(28,12)) AS h_term
             FROM (SELECT *, CAST(c AS DOUBLE) / n_src AS p FROM ex) z)
           SELECT src_a, src_b,
             ROUND(CAST(SUM(ce_term) AS DOUBLE), 6) AS cross_entropy,
             ROUND(CAST(SUM(ce_term) AS DOUBLE)
               - CAST(SUM(h_term) AS DOUBLE), 6) AS kl_a_b
           FROM t GROUP BY 1, 2 ORDER BY src_a, src_b""") +
      ("orders_anova_weekday" ->
        """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d2 AS (SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS wd, c
             FROM daily),
           g AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(c) AS BIGINT) AS sy,
               SUM(CAST(c AS DECIMAL(38,0)) * c) AS syy
             FROM d2 GROUP BY 1),
           g2 AS (SELECT *,
               CAST(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_g
                 AS DECIMAL(38,6)) AS ssw_g,
               CAST(CAST(sy AS DOUBLE) * sy / n_g AS DECIMAL(38,6))
                 AS ssb_term
             FROM g),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS ty,
               SUM(ssw_g) AS ssw, SUM(ssb_term) AS ssb_raw FROM g2),
           st AS (SELECT *, CAST(ssb_raw AS DOUBLE)
                 - CAST(ty AS DOUBLE) * ty / CAST(n AS DOUBLE) AS ssb
             FROM tot),
           st2 AS (SELECT *,
               (ssb / CAST(k - 1 AS DOUBLE))
                 / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
                 AS f_stat,
               ssb / (ssb + CAST(ssw AS DOUBLE)) AS eta_sq
             FROM st)
           SELECT wd AS weekday, n_g AS n_days,
             ROUND(CAST(sy AS DOUBLE) / n_g / 100.0, 2)
               AS mean_revenue,
             k, n AS n_total_days, ROUND(f_stat, 6) AS f_stat,
             ROUND(eta_sq, 6) AS eta_sq
           FROM g2, st2 ORDER BY weekday""") +
      ("sim_ood_mahalanobis" ->
        """WITH d AS (SELECT label, vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(CAST(unnest(embedding) AS DOUBLE)
                 AS DECIMAL(18,9)) AS x
             FROM embeddings),
           mom AS (SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx,
               SUM(CAST(x * x AS DECIMAL(28,12))) AS sxx
             FROM d GROUP BY 1, 2),
           m2 AS (SELECT label, dim, CAST(sx AS DOUBLE) / n AS mu,
               CASE WHEN n > 1 THEN (CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / CAST(n - 1 AS DOUBLE) END AS var
             FROM mom),
           d2 AS (SELECT d.label, vec_id,
               SUM(CAST(CASE WHEN var > 0 THEN (CAST(x AS DOUBLE) - mu)
                 * (CAST(x AS DOUBLE) - mu) / var
                 ELSE 0.0 END AS DECIMAL(28,12)))
                 AS d2,
               CAST(COUNT(*) AS BIGINT) AS ndim
             FROM d JOIN m2 ON d.label = m2.label AND d.dim = m2.dim
             GROUP BY 1, 2),
           worst AS (SELECT label, vec_id AS worst_vec FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY d2 DESC, vec_id DESC) AS rk FROM d2) z
             WHERE rk = 1)
           SELECT d2.label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(MAX(ndim) AS BIGINT) AS n_dims,
             CAST(SUM(CASE WHEN CAST(d2 AS DOUBLE) > 2.0 * ndim
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
             ROUND(CAST(SUM(d2) AS DOUBLE) / COUNT(*), 4) AS mean_d2,
             ROUND(CAST(MAX(d2) AS DOUBLE), 4) AS max_d2,
             MAX(worst_vec) AS worst_vec
           FROM d2 JOIN worst ON d2.label = worst.label
           GROUP BY d2.label ORDER BY d2.label""") +
      ("graph_local_cc" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
             UNION SELECT label, v2, v1 FROM knn),
           deg AS (SELECT label, u, CAST(COUNT(*) AS BIGINT) AS deg
             FROM und GROUP BY 1, 2),
           wedge AS (SELECT x.label, x.u AS c, x.v AS a, y.v AS b
             FROM und x JOIN und y
               ON x.label = y.label AND x.u = y.u AND x.v < y.v),
           closedw AS (SELECT w.label, w.c,
               CAST(COUNT(*) AS BIGINT) AS closed
             FROM wedge w WHERE EXISTS (SELECT 1 FROM und e
               WHERE e.label = w.label AND e.u = w.a AND e.v = w.b)
             GROUP BY 1, 2),
           perv AS (SELECT deg.label, deg.u, deg.deg,
               CAST(COALESCE(closed, 0) AS BIGINT) AS closed,
               (deg * (deg - 1)) // 2 AS wedges
             FROM deg LEFT JOIN closedw
               ON deg.label = closedw.label AND deg.u = closedw.c),
           cc AS (SELECT label,
               CASE WHEN wedges > 0
                 THEN CAST(CAST(closed AS DOUBLE) / wedges
                   AS DECIMAL(18,9))
                 ELSE CAST(0.0 AS DECIMAL(18,9)) END AS cc
             FROM perv)
           SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices,
             ROUND(CAST(SUM(cc) AS DOUBLE) / COUNT(*), 6)
               AS mean_local_cc,
             CAST(SUM(CASE WHEN cc >= 1.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fully_clustered,
             CAST(SUM(CASE WHEN cc = 0.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero_cc
           FROM cc GROUP BY label ORDER BY label""") +
      ("sim_matryoshka_recall" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 5),
           sc AS (SELECT q.q_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.q_emb) AS s64,
               list_cosine_similarity(e.embedding[1:32],
                 q.q_emb[1:32]) AS s32,
               list_cosine_similarity(e.embedding[1:16],
                 q.q_emb[1:16]) AS s16
             FROM embeddings e, q WHERE e.vec_id <> q.q_id),
           t64 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s64 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           t32 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s32 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           t16 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s16 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           r AS (SELECT t64.q_id,
               CAST(SUM(CASE WHEN h32.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS hits_32,
               CAST(SUM(CASE WHEN h16.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS hits_16
             FROM t64
             LEFT JOIN t32 h32 ON t64.q_id = h32.q_id
               AND t64.vec_id = h32.vec_id
             LEFT JOIN t16 h16 ON t64.q_id = h16.q_id
               AND t64.vec_id = h16.vec_id
             GROUP BY 1)
           SELECT q_id, CAST(10 AS BIGINT) AS k, hits_32, hits_16,
             ROUND(CAST(hits_32 AS DOUBLE) / 10, 4) AS recall_d32,
             ROUND(CAST(hits_16 AS DOUBLE) / 10, 4) AS recall_d16
           FROM r ORDER BY q_id""") +
      ("text_bpe_oov" ->
        """WITH tv AS (SELECT DISTINCT lower(t) AS w
             FROM (SELECT unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE doc_id % 2 = 0) z
             WHERE regexp_matches(lower(t), '^[a-z]+$')),
           ho AS (SELECT lang, lower(t) AS w,
               CAST(COUNT(*) AS BIGINT) AS occ
             FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE doc_id % 2 <> 0) z
             WHERE regexp_matches(lower(t), '^[a-z]+$')
             GROUP BY 1, 2)
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN tv.w IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS oov_types,
             ROUND(CAST(SUM(CASE WHEN tv.w IS NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS oov_type_rate,
             CAST(SUM(occ) AS BIGINT) AS n_occ,
             CAST(SUM(CASE WHEN tv.w IS NULL THEN occ ELSE 0 END)
               AS BIGINT) AS oov_occ,
             ROUND(CAST(SUM(CASE WHEN tv.w IS NULL THEN occ
                 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(occ) AS DOUBLE), 6) AS oov_occ_rate,
             CAST(SUM(CASE WHEN tv.w IS NULL
               THEN occ * length(ho.w) ELSE 0 END) AS BIGINT)
               AS oov_chars
           FROM ho LEFT JOIN tv ON ho.w = tv.w
           GROUP BY lang ORDER BY lang""") +
      ("text_hybrid_retrieval" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           lex AS (SELECT doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1),
           lexr AS (SELECT doc_id, r_lex FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
               FROM lex) zl WHERE r_lex <= 100),
           anchor AS (SELECT e.vec_id AS a_id, e.embedding AS a_emb
             FROM lexr JOIN embeddings e ON lexr.doc_id = e.vec_id
             WHERE r_lex = 1),
           semr AS (SELECT doc_id, r_sem FROM (
               SELECT vec_id AS doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, vec_id) AS r_sem
               FROM (SELECT e.vec_id,
                       list_cosine_similarity(e.embedding, a.a_emb)
                         AS sim
                     FROM embeddings e, anchor a
                     WHERE e.vec_id <> a.a_id) z) zs
             WHERE r_sem <= 100),
           fused AS (SELECT COALESCE(lexr.doc_id, semr.doc_id)
                 AS doc_id,
               r_lex, r_sem,
               COALESCE(1.0 / (60.0 + r_lex), 0.0)
                 + COALESCE(1.0 / (60.0 + r_sem), 0.0) AS rrf
             FROM lexr FULL OUTER JOIN semr
               ON lexr.doc_id = semr.doc_id),
           top AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id,
             CAST(r_lex AS BIGINT) AS r_lex,
             CAST(r_sem AS BIGINT) AS r_sem,
             ROUND(rrf, 6) AS rrf_score
           FROM top WHERE rk <= 10 ORDER BY rk""") +
      ("text_retrieval_ndcg" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           lex AS (SELECT doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1),
           lexr AS (SELECT doc_id, r_lex FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
               FROM lex) zl WHERE r_lex <= 100),
           anchor AS (SELECT e.vec_id AS a_id, e.embedding AS a_emb
             FROM lexr JOIN embeddings e ON lexr.doc_id = e.vec_id
             WHERE r_lex = 1),
           sims AS (SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, a.a_emb) AS sim
             FROM embeddings e, anchor a WHERE e.vec_id <> a.a_id),
           lexev AS (SELECT doc_id, CAST(r_lex - 1 AS BIGINT) AS r
             FROM lexr WHERE r_lex >= 2),
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
           abands AS (SELECT band, bucket FROM bands
             JOIN anchor ON vec_id = a_id),
           cand AS (SELECT DISTINCT b.vec_id AS doc_id
             FROM bands b JOIN abands USING (band, bucket)),
           semev AS (SELECT doc_id, r FROM (
               SELECT s.doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, s.doc_id) AS r
               FROM cand c JOIN sims s ON c.doc_id = s.doc_id) z
             WHERE r <= 100),
           fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + l.r), 0.0)
                 + COALESCE(1.0 / (60.0 + s.r), 0.0) AS rrf
             FROM lexev l FULL OUTER JOIN semev s
               ON l.doc_id = s.doc_id),
           hybev AS (SELECT doc_id, CAST(r0 AS BIGINT) AS pos FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY rrf DESC, doc_id) AS r0 FROM fused) z
             WHERE r0 <= 10),
           lists AS (
             SELECT 'a_lexical' AS arm, doc_id, r AS pos
               FROM lexev WHERE r <= 10
             UNION ALL SELECT 'b_semantic_lsh', doc_id, r
               FROM semev WHERE r <= 10
             UNION ALL SELECT 'c_hybrid_rrf', doc_id, pos FROM hybev),
           cdocs AS (SELECT s.doc_id AS cd, s.sim AS cs
             FROM (SELECT DISTINCT doc_id FROM lists) ld
             JOIN sims s USING (doc_id)),
           gains0 AS (SELECT cd,
               CAST(SUM(CASE WHEN sim > cs THEN 1 ELSE 0 END)
                 AS BIGINT) + 1 AS lo,
               CAST(COUNT(*) AS BIGINT) AS hi
             FROM sims JOIN cdocs ON sim >= cs GROUP BY cd),
           gains AS (SELECT cd AS doc_id,
               CASE WHEN lo > 10 THEN 0.0
                 ELSE CAST((LEAST(hi, 10) - lo + 1)
                     * (22 - lo - LEAST(hi, 10)) AS DOUBLE)
                   / CAST(2 * (hi - lo + 1) AS DOUBLE) END AS gain
             FROM gains0),
           truth AS (SELECT doc_id, CAST(1 AS BIGINT) AS rel FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, doc_id) AS rn FROM sims) z
             WHERE rn <= 10),
           idcg AS (SELECT SUM(CAST(CAST(11 - r AS DOUBLE)
               / log2(CAST(r + 1 AS DOUBLE)) AS DECIMAL(28,12)))
               AS idcg
             FROM range(1, 11) t(r)),
           per AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_listed,
               CAST(SUM(COALESCE(rel, 0)) AS BIGINT) AS n_relevant,
               MIN(CASE WHEN rel = 1 THEN pos END) AS first_rel,
               SUM(CAST(COALESCE(gain, 0.0)
                 / log2(CAST(pos + 1 AS DOUBLE)) AS DECIMAL(28,12)))
                 AS dcg
             FROM lists LEFT JOIN gains USING (doc_id)
             LEFT JOIN truth USING (doc_id) GROUP BY 1)
           SELECT arm, n_listed, n_relevant,
             ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS mrr,
             ROUND(CAST(dcg AS DOUBLE), 6) AS dcg10,
             ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
               AS ndcg10
           FROM per, idcg ORDER BY arm""") +
      ("text_retrieval_ndcg_multi" ->
        s"""WITH ${OracleGen.retrievalPerQuerySql(20)}
           SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_queries,
             CAST(SUM(n_listed) AS BIGINT) AS n_listed_total,
             CAST(SUM(n_relevant) AS BIGINT) AS n_relevant_total,
             ROUND(CAST(SUM(ndcg) AS DOUBLE) / COUNT(*), 6)
               AS ndcg10_mean,
             ROUND(CAST(MIN(ndcg) AS DOUBLE), 6) AS ndcg10_min,
             ROUND(CAST(MAX(ndcg) AS DOUBLE), 6) AS ndcg10_max,
             ROUND(CAST(SUM(mrr) AS DOUBLE) / COUNT(*), 6)
               AS mrr_mean
           FROM fin GROUP BY arm ORDER BY arm""") +
      ("text_retrieval_panel_ci" -> OracleGen.retrievalPanelCiOracleSql()) +
      ("text_unigram_tokenizer" -> OracleGen.unigramOracleSql()) +
      ("text_tokenizer_fertility" -> OracleGen.fertilityOracleSql()) +
      ("text_wordpiece_greedy" -> OracleGen.wordpieceOracleSql()) +
      ("sim_beam_search" -> OracleGen.beamSearchOracleSql()) +
      ("sim_mmr_rerank" -> OracleGen.mmrOracleSql()) +
      ("events_event_study" ->
        """WITH sp AS (SELECT epoch(MIN(ts))
               + (epoch(MAX(ts)) - epoch(MIN(ts))) / 2 AS mid
             FROM events WHERE value IS NOT NULL),
           wk AS (SELECT CAST(floor((epoch(ts) - mid) / 604800.0)
                 AS BIGINT) AS w,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS t,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS c
             FROM events, sp WHERE value IS NOT NULL
               AND floor((epoch(ts) - mid) / 604800.0) BETWEEN -4 AND 3
             GROUP BY 1),
           g AS (SELECT *, t - c AS gap FROM wk),
           base AS (SELECT gap AS base_gap FROM g WHERE w = -1)
           SELECT w AS rel_week,
             ROUND(CAST(t AS DOUBLE) / 100.0, 2) AS rev_treat,
             ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS rev_control,
             ROUND(CAST(gap AS DOUBLE) / 100.0, 2) AS gap,
             ROUND(CAST(gap - base_gap AS DOUBLE) / 100.0, 2)
               AS coef_vs_wm1,
             w < 0 AS is_pre
           FROM g LEFT JOIN base ON TRUE ORDER BY rel_week""") +
      ("orders_eoq" ->
        """WITH sp AS (SELECT (epoch(MAX(l_shipdate))
               - epoch(MIN(l_shipdate))) / CAST(86400.0 * 365.0 AS DOUBLE) AS years
             FROM lineitem),
           b AS (SELECT p_brand AS brand,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1),
           e AS (SELECT brand,
               CAST(q AS DOUBLE) / 100.0 / years AS d_rate,
               CAST(rev AS DOUBLE) / CAST(q AS DOUBLE) AS unit_price
             FROM b, sp),
           e2 AS (SELECT *,
               sqrt(CAST(200.0 AS DOUBLE) * d_rate
                 / (CAST(0.2 AS DOUBLE) * unit_price)) AS eoq
             FROM e)
           SELECT brand, ROUND(d_rate, 2) AS annual_demand,
             ROUND(unit_price, 4) AS unit_price,
             ROUND(eoq, 2) AS eoq_units,
             ROUND(d_rate / eoq, 2) AS orders_per_year,
             ROUND(eoq * unit_price / 2.0, 2) AS cycle_stock_value
           FROM e2 ORDER BY brand""") +
      ("graph_betweenness" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           sym AS MATERIALIZED (SELECT DISTINCT label, v1, v2 FROM (
               SELECT label, v1, v2 FROM knn
               UNION ALL SELECT label, v2, v1 FROM knn) u),
           nodes AS (SELECT label, vec_id AS node FROM embeddings),
           seeds AS (SELECT label, node AS seed FROM (
               SELECT label, node, ROW_NUMBER() OVER (
                 PARTITION BY label ORDER BY node) AS srk
               FROM nodes) z WHERE srk <= 3),
           l0 AS MATERIALIZED (SELECT label, seed, seed AS node,
               CAST(1 AS BIGINT) AS sig FROM seeds),
           l1 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l0 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
               WHERE x.label = d.label AND x.seed = d.seed
                 AND x.node = s.v2)
             GROUP BY 1, 2, 3),
           l2 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l1 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
                 WHERE x.label = d.label AND x.seed = d.seed
                   AND x.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l1 y
                 WHERE y.label = d.label AND y.seed = d.seed
                   AND y.node = s.v2)
             GROUP BY 1, 2, 3),
           l3 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l2 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
                 WHERE x.label = d.label AND x.seed = d.seed
                   AND x.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l1 y
                 WHERE y.label = d.label AND y.seed = d.seed
                   AND y.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l2 z
                 WHERE z.label = d.label AND z.seed = d.seed
                   AND z.node = s.v2)
             GROUP BY 1, 2, 3),
           d2d AS MATERIALIZED (SELECT v.label, v.seed, v.node, v.sig,
               COALESCE(SUM(CAST(CAST(v.sig AS DOUBLE) / w.sig
                 * (1.0 + CAST(w.delta AS DOUBLE))
                 AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)))
                 AS delta
             FROM l2 v
             LEFT JOIN sym s ON s.label = v.label AND s.v1 = v.node
             LEFT JOIN (SELECT label, seed, node, sig,
                 CAST(0 AS DECIMAL(28,12)) AS delta FROM l3) w
               ON w.label = v.label AND w.seed = v.seed
                 AND w.node = s.v2
             GROUP BY 1, 2, 3, 4),
           d1d AS MATERIALIZED (SELECT v.label, v.seed, v.node, v.sig,
               COALESCE(SUM(CAST(CAST(v.sig AS DOUBLE) / w.sig
                 * (1.0 + CAST(w.delta AS DOUBLE))
                 AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)))
                 AS delta
             FROM l1 v
             LEFT JOIN sym s ON s.label = v.label AND s.v1 = v.node
             LEFT JOIN d2d w
               ON w.label = v.label AND w.seed = v.seed
                 AND w.node = s.v2
             GROUP BY 1, 2, 3, 4),
           bc AS (SELECT label, node, SUM(delta) AS bc,
               CAST(COUNT(*) AS BIGINT) AS n_seed_paths
             FROM (SELECT label, seed, node, delta FROM d1d
               UNION ALL SELECT label, seed, node, delta FROM d2d) u
             GROUP BY 1, 2)
           SELECT label, CAST(rk AS BIGINT) AS rk, node,
             ROUND(CAST(bc AS DOUBLE), 6) AS betweenness, n_seed_paths
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY bc DESC, node) AS rk FROM bc) z
           WHERE rk <= 3 ORDER BY label, rk""") +
      ("events_ucb_allocation" ->
        """WITH first AS (SELECT user_id, event_type AS arm FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events) z WHERE rn = 1),
           conv AS (SELECT DISTINCT user_id FROM events
             WHERE event_type = 'purchase'),
           arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS n_conv
             FROM first LEFT JOIN conv USING (user_id) GROUP BY 1),
           tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_all
             FROM arms),
           sc AS (SELECT arm, n_users, n_conv,
               CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                 AS rate,
               CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                 + sqrt(2.0 * ln(CAST(n_all AS DOUBLE))
                   / CAST(n_users AS DOUBLE)) AS ucb1
             FROM arms, tot),
           mx AS (SELECT arm AS best_arm FROM sc
             ORDER BY ucb1 DESC, arm LIMIT 1)
           SELECT arm, n_users, n_conv,
             ROUND(rate, 6) AS conv_rate, ROUND(ucb1, 6) AS ucb1,
             arm = best_arm AS chosen
           FROM sc, mx ORDER BY arm""") +
      ("orders_its_segmented" ->
        """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d0 AS (SELECT MIN(day) AS day0,
               CAST(datediff('day', MIN(day), MAX(day)) // 2
                 AS BIGINT) AS tmid
             FROM daily),
           seg AS (SELECT CASE WHEN t < tmid THEN 'pre' ELSE 'post'
                 END AS seg, MAX(tmid) AS tmid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(c) AS BIGINT) AS sc,
               SUM(CAST(t AS DECIMAL(38,0)) * c) AS stc,
               SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt
             FROM (SELECT CAST(datediff('day', day0, day) AS BIGINT)
                 AS t, c, tmid FROM daily, d0) z
             GROUP BY 1),
           fit AS (SELECT *,
               (CAST(stc AS DOUBLE) - CAST(st AS DOUBLE)
                 * CAST(sc AS DOUBLE) / n)
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
                 * CAST(st AS DOUBLE) / n) AS slope
             FROM seg),
           fit2 AS (SELECT *,
               (CAST(sc AS DOUBLE) - slope * CAST(st AS DOUBLE)) / n
                 AS icept
             FROM fit),
           fit3 AS (SELECT *,
               icept + slope * CAST(tmid AS DOUBLE) AS at_mid
             FROM fit2),
           p AS (SELECT
               MAX(CASE WHEN seg = 'pre' THEN n END) AS n_pre,
               MAX(CASE WHEN seg = 'post' THEN n END) AS n_post,
               MAX(CASE WHEN seg = 'pre' THEN slope END) AS b_pre,
               MAX(CASE WHEN seg = 'post' THEN slope END) AS b_post,
               MAX(CASE WHEN seg = 'pre' THEN at_mid END) AS y_pre,
               MAX(CASE WHEN seg = 'post' THEN at_mid END) AS y_post
             FROM fit3)
           SELECT n_pre, n_post,
             ROUND(b_pre / 100.0, 4) AS pre_slope,
             ROUND(b_post / 100.0, 4) AS post_slope,
             ROUND((b_post - b_pre) / 100.0, 4) AS slope_change,
             ROUND((y_post - y_pre) / 100.0, 2) AS level_jump,
             ROUND((y_post - y_pre) / y_pre, 6) AS jump_rel
           FROM p""") +
      ("dq_profile_drift" ->
        """WITH sp AS (SELECT epoch(MIN(o_orderdate))
               + (epoch(MAX(o_orderdate)) - epoch(MIN(o_orderdate)))
                 / 2 AS mid
             FROM orders),
           hv AS (SELECT o_totalprice, o_orderpriority, o_orderstatus,
               CASE WHEN epoch(o_orderdate) < mid THEN 1 ELSE 2 END
                 AS h
             FROM orders, sp),
           num AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
             FROM (SELECT h, CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 AS y FROM hv) z GROUP BY 1),
           nm AS (SELECT h, n, CAST(sy AS DOUBLE) / n AS mean,
               CASE WHEN n > 1 THEN
                 (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / n) / CAST(n - 1 AS DOUBLE)
               END AS v
             FROM num),
           nrow AS (SELECT
               MAX(CASE WHEN h = 1 THEN n END) AS n1,
               MAX(CASE WHEN h = 2 THEN n END) AS n2,
               MAX(CASE WHEN h = 1 THEN mean END) AS m1,
               MAX(CASE WHEN h = 2 THEN mean END) AS m2,
               MAX(CASE WHEN h = 1 THEN v END) AS v1,
               MAX(CASE WHEN h = 2 THEN v END) AS v2
             FROM nm),
           nout AS (SELECT 'o_totalprice' AS column_name,
               'numeric_mean_z' AS kind, n1 AS n_first,
               n2 AS n_second,
               ROUND(m1 / 100.0, 4) AS stat_first,
               ROUND(m2 / 100.0, 4) AS stat_second,
               CASE WHEN v1 / n1 + v2 / n2 > 0.0 THEN
                 ROUND(abs(m2 - m1) / sqrt(v1 / n1 + v2 / n2), 6)
               END AS drift_stat,
               CASE WHEN v1 / n1 + v2 / n2 > 0.0 THEN
                 abs(m2 - m1) / sqrt(v1 / n1 + v2 / n2) > 3.0
               END AS drifted
             FROM nrow),
           cp AS (SELECT h, o_orderpriority AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt FROM hv GROUP BY 1, 2),
           cpt AS (SELECT h, CAST(SUM(cnt) AS BIGINT) AS nt FROM cp
             GROUP BY 1),
           cps AS (SELECT v, cp.h,
               CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS p, nt
             FROM cp JOIN cpt ON cp.h = cpt.h),
           cpv AS (SELECT v,
               SUM(CASE WHEN h = 1 THEN p ELSE 0.0 END) AS p1,
               SUM(CASE WHEN h = 2 THEN p ELSE 0.0 END) AS p2,
               MAX(CASE WHEN h = 1 THEN nt END) AS n1,
               MAX(CASE WHEN h = 2 THEN nt END) AS n2
             FROM cps GROUP BY 1),
           cpr AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(p1) AS top1, MAX(p2) AS top2,
               CAST(SUM(CAST(abs(p1 - p2) AS DECIMAL(28,12)))
                 AS DOUBLE) / 2.0 AS tvd
             FROM cpv),
           cout AS (SELECT 'o_orderpriority' AS column_name,
               'categorical_tvd' AS kind, n1 AS n_first,
               n2 AS n_second, ROUND(top1, 6) AS stat_first,
               ROUND(top2, 6) AS stat_second,
               ROUND(tvd, 6) AS drift_stat, tvd > 0.1 AS drifted
             FROM cpr),
           sp2 AS (SELECT h, o_orderstatus AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt FROM hv GROUP BY 1, 2),
           spt AS (SELECT h, CAST(SUM(cnt) AS BIGINT) AS nt FROM sp2
             GROUP BY 1),
           sps AS (SELECT v, sp2.h,
               CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS p, nt
             FROM sp2 JOIN spt ON sp2.h = spt.h),
           spv AS (SELECT v,
               SUM(CASE WHEN h = 1 THEN p ELSE 0.0 END) AS p1,
               SUM(CASE WHEN h = 2 THEN p ELSE 0.0 END) AS p2,
               MAX(CASE WHEN h = 1 THEN nt END) AS n1,
               MAX(CASE WHEN h = 2 THEN nt END) AS n2
             FROM sps GROUP BY 1),
           spr AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(p1) AS top1, MAX(p2) AS top2,
               CAST(SUM(CAST(abs(p1 - p2) AS DECIMAL(28,12)))
                 AS DOUBLE) / 2.0 AS tvd
             FROM spv),
           sout AS (SELECT 'o_orderstatus' AS column_name,
               'categorical_tvd' AS kind, n1 AS n_first,
               n2 AS n_second, ROUND(top1, 6) AS stat_first,
               ROUND(top2, 6) AS stat_second,
               ROUND(tvd, 6) AS drift_stat, tvd > 0.1 AS drifted
             FROM spr)
           SELECT * FROM nout UNION ALL SELECT * FROM cout
           UNION ALL SELECT * FROM sout
           ORDER BY column_name""") +
      ("sim_centroid_margin" ->
        """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           cent AS (SELECT label AS cell, d,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM dims GROUP BY 1, 2),
           cn AS (SELECT cell, sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE)) AS cnorm
             FROM cent GROUP BY 1),
           per AS (SELECT vec_id, label, cell,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE) AS dot,
               sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE)) AS vnorm
             FROM dims JOIN cent USING (d) GROUP BY 1, 2, 3),
           sc AS (SELECT vec_id, label, cell,
               dot / (vnorm * cnorm) AS s
             FROM per JOIN cn USING (cell)),
           t2 AS (SELECT vec_id, label,
               MAX(CASE WHEN rn = 1 THEN cell END) AS pred,
               MAX(CASE WHEN rn = 1 THEN s END) AS s1,
               MAX(CASE WHEN rn = 2 THEN s END) AS s2
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY s DESC, cell) AS rn FROM sc) z
             WHERE rn <= 2 GROUP BY 1, 2),
           m AS (SELECT label AS true_label, pred AS assigned_label,
               CAST(s1 - s2 AS DECIMAL(18,9)) AS margin FROM t2)
           SELECT true_label, assigned_label,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             ROUND(CAST(SUM(margin) AS DOUBLE) / COUNT(*), 6)
               AS mean_margin,
             ROUND(CAST(MIN(margin) AS DOUBLE), 6) AS min_margin
           FROM m GROUP BY 1, 2
           ORDER BY true_label, assigned_label""") +
      ("orders_price_elasticity" ->
        """WITH bm AS (SELECT p_brand AS brand,
               date_trunc('month', l_shipdate) AS mo,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2 HAVING SUM(CAST(ROUND(l_quantity * 100)
               AS BIGINT)) > 0),
           lx AS (SELECT brand,
               ln(CAST(q AS DOUBLE) / 100.0) AS lq,
               ln(CAST(rev AS DOUBLE) / CAST(q AS DOUBLE)) AS lp
             FROM bm),
           g AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_months,
               SUM(CAST(lp AS DECIMAL(28,12))) AS sx,
               SUM(CAST(lq AS DECIMAL(28,12))) AS sy,
               SUM(CAST(lp * lq AS DECIMAL(28,12))) AS sxy,
               SUM(CAST(lp * lp AS DECIMAL(28,12))) AS sxx,
               SUM(CAST(lq * lq AS DECIMAL(28,12))) AS syy
             FROM lx GROUP BY 1),
           c AS (SELECT brand, n_months, sx, sy,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n_months AS cxy,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / n_months AS cxx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n_months AS cyy
             FROM g)
           SELECT brand, n_months,
             ROUND(CASE WHEN cxx > 0 THEN cxy / cxx END, 6)
               AS elasticity,
             ROUND(CASE WHEN cxx > 0 AND cyy > 0
               THEN cxy * cxy / (cxx * cyy) END, 6) AS r2,
             ROUND(CAST(sx AS DOUBLE) / n_months, 6) AS mean_ln_price,
             ROUND(CAST(sy AS DOUBLE) / n_months, 6) AS mean_ln_qty
           FROM c ORDER BY brand""") +
      ("feature_woe_iv" ->
        """WITH cat AS (SELECT o_orderpriority AS category,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                 END) AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0
                 END) AS BIGINT) AS neg
             FROM orders GROUP BY 1),
           tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS pt,
               CAST(SUM(neg) AS BIGINT) AS nt FROM cat),
           w AS (SELECT category, pos, neg,
               CAST(pos AS DOUBLE) / pt AS ps,
               CAST(neg AS DOUBLE) / nt AS ns,
               CASE WHEN pos > 0 AND neg > 0
                 THEN ln((CAST(pos AS DOUBLE) / pt)
                   / (CAST(neg AS DOUBLE) / nt)) END AS woe
             FROM cat, tot),
           t AS (SELECT *, COALESCE(CAST((ps - ns) * woe
               AS DECIMAL(28,12)), CAST(0 AS DECIMAL(28,12)))
               AS iv_term FROM w),
           iv AS (SELECT SUM(iv_term) AS iv FROM t)
           SELECT category, pos, neg,
             ROUND(ps, 6) AS pos_share, ROUND(ns, 6) AS neg_share,
             ROUND(woe, 6) AS woe,
             ROUND(CAST(iv AS DOUBLE), 6) AS iv_total
           FROM t, iv ORDER BY category""") +
      ("dq_l_diversity" ->
        """WITH cells AS (SELECT lang,
               n_chars - (n_chars % 100) AS len_bucket, source,
               CAST(COUNT(*) AS BIGINT) AS c
             FROM documents GROUP BY 1, 2, 3),
           classes AS (SELECT lang, len_bucket,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS l,
               CAST(SUM(c) AS BIGINT) AS sz,
               SUM(CAST(-CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                 AS DECIMAL(28,12))) AS hnum
             FROM cells GROUP BY 1, 2),
           ce AS (SELECT *, ln(CAST(sz AS DOUBLE))
                 + CAST(hnum AS DOUBLE) / CAST(sz AS DOUBLE)
                 AS entropy FROM classes),
           tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_rows_all
             FROM classes)
           SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(sz) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(sz) AS DOUBLE) / n_rows_all, 6)
               AS rows_share,
             ROUND(CAST(SUM(CAST(entropy AS DECIMAL(28,12)))
               AS DOUBLE) / COUNT(*), 6) AS mean_entropy
           FROM ce, tot GROUP BY l, n_rows_all ORDER BY l""") +
      ("text_kn_bigram" ->
        """WITH d AS (SELECT doc_id, lang, string_split(text, ' ')
               AS tk FROM documents),
           trt AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
               unnest(tk) AS word FROM d WHERE doc_id % 2 = 0),
           trb AS (SELECT a.word AS w1, b.word AS w2 FROM trt a
             JOIN trt b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
           hot AS (SELECT doc_id, lang, generate_subscripts(tk, 1)
                 AS i, unnest(tk) AS word
             FROM d WHERE doc_id % 2 <> 0),
           ho AS (SELECT a.lang, a.word AS w1, b.word AS w2,
               CAST(COUNT(*) AS BIGINT) AS f
             FROM hot a JOIN hot b
               ON a.doc_id = b.doc_id AND b.i = a.i + 1
             GROUP BY 1, 2, 3),
           pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
             FROM trb GROUP BY 1, 2),
           ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
               CAST(COUNT(*) AS BIGINT) AS n1w1 FROM pc GROUP BY 1),
           cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w2
             FROM pc GROUP BY 1),
           n1a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1all FROM pc),
           j AS (SELECT ho.lang, ho.f, pc.c, ctx.cw1, ctx.n1w1,
               cont.n1w2, n1a.n1all
             FROM ho LEFT JOIN pc USING (w1, w2)
             LEFT JOIN ctx USING (w1)
             LEFT JOIN cont USING (w2), n1a),
           fl AS (SELECT lang, f,
               cw1 IS NULL AS oov_ctx,
               cw1 IS NOT NULL AND n1w2 IS NULL AS oov_cont,
               CASE WHEN cw1 IS NOT NULL AND n1w2 IS NOT NULL THEN
                 CAST(-ln(GREATEST(CAST(COALESCE(c, 0) AS DOUBLE)
                     - 0.75, 0.0) / CAST(cw1 AS DOUBLE)
                   + 0.75 * CAST(n1w1 AS DOUBLE) / CAST(cw1 AS DOUBLE)
                     * (CAST(n1w2 AS DOUBLE) / CAST(n1all AS DOUBLE)))
                   AS DECIMAL(28,12)) END AS nll
             FROM j)
           SELECT lang,
             CAST(SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END)
               AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN oov_ctx THEN f ELSE 0 END) AS BIGINT)
               AS n_oov_ctx,
             CAST(SUM(CASE WHEN oov_cont THEN f ELSE 0 END) AS BIGINT)
               AS n_oov_cont,
             ROUND(CAST(SUM(CAST(nll * f AS DECIMAL(38,12)))
                 AS DOUBLE)
               / SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END), 6)
               AS mean_nll,
             ROUND(exp(CAST(SUM(CAST(nll * f AS DECIMAL(38,12)))
                 AS DOUBLE)
               / SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END)), 4)
               AS perplexity
           FROM fl GROUP BY lang ORDER BY lang""") +
      ("window_rolling_corr" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
             FROM events WHERE value IS NOT NULL GROUP BY 1),
           fr AS (SELECT d, x, y,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) OVER w AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) OVER w AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) OVER w AS syy
             FROM daily
             WINDOW w AS (ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
           c AS (SELECT *,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
             FROM fr)
           SELECT strftime(d, '%Y-%m-%d') AS day, n AS n_window,
             ROUND(CAST(x AS DOUBLE) / 100.0, 2) AS rev_even,
             ROUND(CAST(y AS DOUBLE) / 100.0, 2) AS rev_odd,
             ROUND(CASE WHEN cxx > 0 AND cyy > 0
               THEN cxy / sqrt(cxx * cyy) END, 6) AS rolling_corr
           FROM c ORDER BY day""") +
      ("orders_fe_regression" ->
        """WITH li AS (SELECT l_partkey,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
             FROM lineitem),
           g AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
             FROM li GROUP BY 1),
           t AS (SELECT n, sx, sy, sxy, sxx,
               CAST(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n
                 AS DECIMAL(28,12)) AS cxy,
               CAST(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n
                 AS DECIMAL(28,12)) AS cxx,
               CAST(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                 AS DECIMAL(28,12)) AS cyy
             FROM g),
           a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(sx) AS BIGINT) AS tsx,
               CAST(SUM(sy) AS BIGINT) AS tsy,
               SUM(cxy) AS wxy, SUM(cxx) AS wxx, SUM(cyy) AS wyy,
               SUM(sxy) AS sxy_all, SUM(sxx) AS sxx_all FROM t)
           SELECT n_parts, n_rows,
             ROUND((CAST(sxy_all AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy
                 / CAST(n_rows AS DOUBLE))
               / (CAST(sxx_all AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx
                 / CAST(n_rows AS DOUBLE)), 6) AS slope_pooled,
             ROUND(CAST(wxy AS DOUBLE) / CAST(wxx AS DOUBLE), 6)
               AS slope_fe,
             ROUND(CAST(wxy AS DOUBLE) * CAST(wxy AS DOUBLE)
               / (CAST(wxx AS DOUBLE) * CAST(wyy AS DOUBLE)), 6)
               AS r2_within
           FROM a""")
  }
}
