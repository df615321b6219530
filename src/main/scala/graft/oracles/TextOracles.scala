package graft.oracles

/** Text-analysis and tokenizer rows over documents.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object TextOracles {
  private[graft] val sql: Map[String, String] = Map(
    "text_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
         CAST(SUM(n_uniq) AS DOUBLE) / SUM(n_tok) AS avg_ttr
         FROM (SELECT lang, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
               FROM documents) t
         GROUP BY lang ORDER BY lang""",
    "text_quality" ->
      """SELECT doc_id, lang, n_tok,
         CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
         CAST(n_chars AS DOUBLE) / n_tok AS avg_tok_len,
         CASE WHEN n_tok < 10 THEN 'too_short'
              WHEN CAST(n_stop AS DOUBLE) / n_tok > 0.5 THEN 'boilerplate'
              WHEN CAST(n_uniq AS DOUBLE) / n_tok < 0.3 THEN 'repetitive'
              ELSE 'ok' END AS quality
         FROM (SELECT doc_id, lang, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
               FROM documents) t
         ORDER BY doc_id""",
    "text_langid" ->
      """SELECT lang, pred_lang, COUNT(*) AS n FROM (
           SELECT lang,
             CASE WHEN contains(t, ' der ') OR contains(t, ' und ') OR contains(t, ' die ') THEN 'de'
                  WHEN contains(t, ' le ') OR contains(t, ' la ') OR contains(t, ' et ') THEN 'fr'
                  WHEN contains(t, ' el ') OR contains(t, ' los ') OR contains(t, ' que ') THEN 'es'
                  WHEN regexp_matches(t, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                  WHEN contains(t, ' the ') OR contains(t, ' and ') OR contains(t, ' of ') THEN 'en'
                  ELSE 'unknown' END AS pred_lang
           FROM (SELECT lang, ' ' || text || ' ' AS t FROM documents) a) b
         GROUP BY 1, 2 ORDER BY lang, pred_lang""",
    "text_fingerprint" ->
      """SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper, MAX(doc_id) AS max_doc
         FROM (SELECT doc_id, md5(substr(text, 1, 64)) AS fp FROM documents) t
         GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""",
    "text_token_bpe" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
         CAST(SUM(n_chars) AS DOUBLE)
           / SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS chars_per_bpe
         FROM documents GROUP BY lang ORDER BY lang""",
    "text_levenshtein" ->
      """WITH fp AS (SELECT doc_id, text, md5(substr(text, 1, 64)) AS f
                     FROM documents),
         okf AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) BETWEEN 2 AND 64)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(levenshtein(substr(a.text, 1, 200), substr(b.text, 1, 200))
                AS BIGINT) AS lev
         FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
         JOIN okf k ON k.f = a.f
         ORDER BY d1, d2""",
    "text_tfidf" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                        FROM documents),
         tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                FROM words WHERE doc_id < 50 GROUP BY 1, 2),
         df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM words GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         scored AS (SELECT t.doc_id, t.word, t.tf, d.df,
             ROUND(t.tf * ln(CAST(n.n_total AS DOUBLE) / d.df), 6) AS tfidf
           FROM tf t JOIN df d USING (word) CROSS JOIN n),
         ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, word) AS rk FROM scored)
         SELECT doc_id, word, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""",
    "text_hapax" ->
      """WITH tf AS (SELECT lang, token, COUNT(*) AS cnt FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS vocab_size,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_ratio,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6)
             AS type_token_ratio
         FROM tf GROUP BY lang ORDER BY lang""",
    "text_coverage_curve" ->
      """WITH vocab AS (SELECT token, COUNT(*) AS cnt FROM
           (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1),
         ranked AS (SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
           FROM vocab),
         tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
             COUNT(*) AS vocab_size FROM vocab)
         SELECT k, COUNT(*) AS n_types,
           ROUND(CAST(SUM(cnt) AS DOUBLE) / MAX(tot), 6) AS mass_share,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(vocab_size), 6)
             AS vocab_share
         FROM ranked, tt,
           (SELECT unnest([CAST(10 AS BIGINT), 100, 1000]) AS k) ks
         WHERE rk <= k
         GROUP BY k ORDER BY k""",
    "text_lm_heldout" ->
      """WITH sp AS (SELECT lang, text,
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
         train_tok AS (SELECT unnest(string_split(text, ' ')) AS word
           FROM sp WHERE split = 'train'),
         lm AS (SELECT word, COUNT(*) AS cw FROM train_tok
           WHERE word <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_train,
             COUNT(*) AS v_train FROM lm),
         test_tok AS (SELECT lang, w AS word FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM sp WHERE split = 'test')
           WHERE w <> ''),
         scored AS (SELECT t.lang, COALESCE(lm.cw, 0) AS cw,
             CAST(-ln(CAST(COALESCE(lm.cw, 0) + 1 AS DOUBLE)
               / (nv.n_train + nv.v_train)) AS DECIMAL(28,12)) AS nll
           FROM test_tok t LEFT JOIN lm ON t.word = lm.word, nv)
         SELECT lang, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN cw = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN cw = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
         FROM scored GROUP BY lang ORDER BY lang""",
    "text_burstiness" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         st AS (SELECT token, CAST(SUM(c) AS BIGINT) AS total,
             COUNT(*) AS df, CAST(SUM(c * c) AS BIGINT) AS sq
           FROM tf GROUP BY 1),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         rnk AS (SELECT *, ROW_NUMBER()
             OVER (ORDER BY total DESC, token) AS rk
           FROM st)
         SELECT token, total, df,
           ROUND(CAST(total AS DOUBLE) / n_docs, 6) AS mean_c,
           ROUND((CAST(sq AS DOUBLE) / n_docs
               - (CAST(total AS DOUBLE) / n_docs)
                 * (CAST(total AS DOUBLE) / n_docs))
             / (CAST(total AS DOUBLE) / n_docs), 4) AS vmr
         FROM rnk, nd WHERE rk <= 20
         ORDER BY total DESC, token""",
    "text_langid_trigram" ->
      """WITH tri AS (SELECT doc_id, lang,
             unnest([substr(text, i, 3)
               for i in range(1, greatest(len(text) - 2, 0) + 1)]) AS g
           FROM documents),
         prof AS (SELECT lang AS profile_lang, g FROM (
             SELECT lang, g, ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY COUNT(*) DESC, g) AS rk
             FROM tri GROUP BY lang, g) WHERE rk <= 20),
         dt AS (SELECT DISTINCT doc_id, lang, g FROM tri),
         ov AS (SELECT d.doc_id, d.lang, p.profile_lang,
             COUNT(*) AS ov
           FROM dt d JOIN prof p ON d.g = p.g GROUP BY 1, 2, 3),
         pred AS (SELECT * FROM (SELECT *, ROW_NUMBER()
             OVER (PARTITION BY doc_id ORDER BY ov DESC, profile_lang)
               AS rk FROM ov) WHERE rk = 1),
         tt AS (SELECT lang, COUNT(*) AS lang_total FROM pred GROUP BY 1)
         SELECT p.lang AS true_lang, p.profile_lang AS pred_lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.lang_total), 6)
             AS share
         FROM pred p JOIN tt t ON p.lang = t.lang
         GROUP BY 1, 2 ORDER BY true_lang, pred_lang""",
    "text_dedup_lm_effect" ->
      """WITH sp AS (SELECT doc_id, lang, text,
             md5(substr(text, 1, 64)) AS fp,
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
         train AS (SELECT * FROM sp WHERE split = 'train'),
         keep AS (SELECT MIN(doc_id) AS doc_id FROM train GROUP BY fp),
         ttok AS (SELECT doc_id, w AS word FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM train) WHERE w <> ''),
         dtok AS (SELECT t.* FROM ttok t
           JOIN keep k ON t.doc_id = k.doc_id),
         lmF AS (SELECT word, COUNT(*) AS cwf FROM ttok GROUP BY 1),
         lmD AS (SELECT word, COUNT(*) AS cwd FROM dtok GROUP BY 1),
         nv AS (SELECT
             (SELECT CAST(SUM(cwf) AS BIGINT) FROM lmF) AS nf,
             (SELECT COUNT(*) FROM lmF) AS vf,
             (SELECT CAST(SUM(cwd) AS BIGINT) FROM lmD) AS nd,
             (SELECT COUNT(*) FROM lmD) AS vd),
         testtok AS (SELECT lang, w AS word FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM sp WHERE split = 'test') WHERE w <> ''),
         sc AS (SELECT t.lang,
             CAST(-ln(CAST(COALESCE(f.cwf, 0) + 1 AS DOUBLE)
               / (nv.nf + nv.vf)) AS DECIMAL(28,12)) AS nllf,
             CAST(-ln(CAST(COALESCE(d.cwd, 0) + 1 AS DOUBLE)
               / (nv.nd + nv.vd)) AS DECIMAL(28,12)) AS nlld
           FROM testtok t
           LEFT JOIN lmF f ON t.word = f.word
           LEFT JOIN lmD d ON t.word = d.word, nv)
         SELECT lang, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(nllf) AS DOUBLE) / COUNT(*), 6)
             AS mean_nll_full,
           ROUND(CAST(SUM(nlld) AS DOUBLE) / COUNT(*), 6)
             AS mean_nll_dedup,
           ROUND(ROUND(CAST(SUM(nlld) AS DOUBLE) / COUNT(*), 6)
             - ROUND(CAST(SUM(nllf) AS DOUBLE) / COUNT(*), 6), 6)
             AS delta_nll
         FROM sc GROUP BY lang ORDER BY lang""",
    "text_bigram_llr" ->
      """WITH words AS (SELECT string_split(text, ' ') AS t
           FROM documents),
         bi AS (SELECT t[i] AS w1, t[i + 1] AS w2
           FROM words, unnest(range(1, greatest(len(t), 1))) u(i)),
         bc AS (SELECT w1, w2, COUNT(*) AS a FROM bi GROUP BY 1, 2),
         fr AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS r1
           FROM bi GROUP BY 1),
         sc AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c1
           FROM bi GROUP BY 1),
         nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM bi),
         j AS (SELECT bc.w1, bc.w2, bc.a, fr.r1, sc.c1, nb.nn,
             fr.r1 - bc.a AS k12, sc.c1 - bc.a AS k21,
             nb.nn - fr.r1 - sc.c1 + bc.a AS k22
           FROM bc JOIN fr ON bc.w1 = fr.w1
                   JOIN sc ON bc.w2 = sc.w2, nb
           WHERE bc.a >= 5)
         SELECT w1, w2, CAST(a AS BIGINT) AS n_pair,
           ROUND(2.0 * (
             (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                * ln((CAST(a AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)
                * ln((CAST(k12 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)
                * ln((CAST(k21 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)
                * ln((CAST(k22 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE)))
                ELSE 0.0 END)), 4) AS llr
         FROM j ORDER BY llr DESC, w1, w2 LIMIT 25""",
    "text_stopword_discovery" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         st AS (SELECT token, CAST(SUM(c) AS BIGINT) AS total,
             COUNT(*) AS df, CAST(SUM(c * c) AS BIGINT) AS sq
           FROM tf GROUP BY 1),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT token, df,
           ROUND(CAST(df AS DOUBLE) / n_docs, 4) AS df_share,
           ROUND(CAST(total AS DOUBLE) / n_docs, 6) AS mean_c,
           ROUND((CAST(sq AS DOUBLE) / n_docs
               - (CAST(total AS DOUBLE) / n_docs)
                 * (CAST(total AS DOUBLE) / n_docs))
             / (CAST(total AS DOUBLE) / n_docs), 4) AS vmr
         FROM st, nd WHERE df * 2 >= n_docs
         ORDER BY df DESC, token""",
    "text_extractive_pick" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         nd AS (SELECT COUNT(*) AS n FROM documents),
         df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY 1),
         sc AS (SELECT t.doc_id, (t.i - 1) // 15 AS pidx,
             CAST(ln(CAST(nd.n AS DOUBLE) / df.df) AS DECIMAL(28,12))
               AS idf
           FROM tok t JOIN df ON t.w = df.w, nd WHERE t.doc_id < 20),
         ch AS (SELECT doc_id, pidx, COUNT(*) AS n_words,
             CAST(SUM(idf) AS DOUBLE) / COUNT(*) AS raw
           FROM sc GROUP BY 1, 2),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY raw DESC, pidx) AS rk FROM ch)
         SELECT doc_id, CAST(pidx AS BIGINT) AS chunk_idx,
           CAST(n_words AS BIGINT) AS n_words, ROUND(raw, 6) AS score
         FROM rk WHERE rk = 1 ORDER BY doc_id""",
    "text_ttr_curve" ->
      """WITH d AS (SELECT
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         b AS (SELECT CASE WHEN n_tok < 32 THEN 'a_lt32'
               WHEN n_tok < 64 THEN 'b_32_63'
               WHEN n_tok < 128 THEN 'c_64_127'
               WHEN n_tok < 256 THEN 'd_128_255'
               ELSE 'e_256plus' END AS band,
             n_tok,
             CAST(CAST(n_uniq AS DOUBLE) / n_tok AS DECIMAL(18,9))
               AS ttr
           FROM d WHERE n_tok > 0)
         SELECT band, COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 2) AS mean_len,
           ROUND(CAST(SUM(ttr) AS DOUBLE) / COUNT(*), 6) AS mean_ttr
         FROM b GROUP BY 1 ORDER BY band""",
    "text_lm_interp" ->
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
         tbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cbi FROM
             (SELECT w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT w, unnest(generate_series(1,
                  CAST(len(w) - 1 AS INT))) AS i
                FROM s WHERE split = 'train' AND len(w) >= 2) z)
           GROUP BY 1, 2),
         tu AS (SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS cu FROM
             (SELECT unnest(w) AS tok FROM s WHERE split = 'train') q
           WHERE tok <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train FROM tu),
         teb AS (SELECT w[i] AS w1, w[i + 1] AS w2
           FROM (SELECT w, unnest(generate_series(1,
               CAST(len(w) - 1 AS INT))) AS i
             FROM s WHERE split = 'test' AND len(w) >= 2) z2),
         lam AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT)
           AS lambda_pct),
         terms AS (SELECT l.lambda_pct,
             CAST(-ln(CAST(l.lambda_pct AS DOUBLE) / 100 *
                 (CASE WHEN COALESCE(u1.cu, 0) > 0
                       THEN CAST(COALESCE(b.cbi, 0) AS DOUBLE) / u1.cu
                       ELSE 0 END)
               + (1 - CAST(l.lambda_pct AS DOUBLE) / 100) *
                 (CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE)
                   / (nv.n_train + nv.v_train)))
               AS DECIMAL(28,12)) AS nll
           FROM teb t
           LEFT JOIN tbg b ON t.w1 = b.w1 AND t.w2 = b.w2
           LEFT JOIN tu u1 ON t.w1 = u1.w
           LEFT JOIN tu u2 ON t.w2 = u2.w
           CROSS JOIN nv CROSS JOIN lam l)
         SELECT lambda_pct, COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
         FROM terms GROUP BY 1 ORDER BY 1""",
    "text_contamination_sweep" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w,
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
         tt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok
           FROM s WHERE split = 'train'),
         tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS nt FROM tt),
         b7 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c7 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 7
                     THEN [array_to_string(w[i:i+6], ' ')
                           for i in range(1, len(w)-5)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b7)),
         r7 AS (SELECT CAST(7 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c7 JOIN tt USING (doc_id)),
         b13 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c13 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ')
                           for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b13)),
         r13 AS (SELECT CAST(13 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c13 JOIN tt USING (doc_id)),
         b20 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 20
                  THEN [array_to_string(w[i:i+19], ' ')
                        for i in range(1, len(w)-18)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c20 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 20
                     THEN [array_to_string(w[i:i+19], ' ')
                           for i in range(1, len(w)-18)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b20)),
         r20 AS (SELECT CAST(20 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c20 JOIN tt USING (doc_id))
         SELECT n_gram, n_contam_docs, contam_tokens,
           ROUND(CAST(contam_tokens AS DOUBLE)
             / (SELECT CAST(nt AS DOUBLE) FROM tot), 6) AS token_share
         FROM (SELECT * FROM r7 UNION ALL SELECT * FROM r13
               UNION ALL SELECT * FROM r20) u
         ORDER BY n_gram""",
    "text_readability" ->
      """WITH wd AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
           FROM documents),
         syl AS (SELECT doc_id, source,
             GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))) AS s
           FROM wd WHERE length(w) > 0),
         pd AS (SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(s) AS BIGINT) AS ns,
             CAST(SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nc
           FROM syl GROUP BY 1, 2),
         sc AS (SELECT source, nw, ns, nc,
             CAST(nw AS DOUBLE) / CAST((nw + 14) // 15 AS DOUBLE) AS wps,
             CAST(ns AS DOUBLE) / CAST(nw AS DOUBLE) AS spw
           FROM pd)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS n_words,
           CAST(SUM(ns) AS BIGINT) AS n_syllables,
           ROUND(CAST(SUM(nc) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE), 6)
             AS pct_complex,
           ROUND(CAST(SUM(CAST(0.39 * wps + 11.8 * spw - 15.59
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4) AS mean_fk_grade,
           ROUND(CAST(SUM(CAST(206.835 - 1.015 * wps - 84.6 * spw
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
             AS mean_flesch_ease
         FROM sc GROUP BY 1 ORDER BY source""",
    "text_kneser_ney" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w,
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
         ttok AS (SELECT doc_id, unnest(w) AS word,
             generate_subscripts(w, 1) AS pos FROM s WHERE split = 'train'),
         tbi AS (SELECT a.word AS w1, b.word AS w2
           FROM ttok a JOIN ttok b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM tbi GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1pf FROM c12 GROUP BY 1),
         cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pb
           FROM c12 GROUP BY 1),
         types AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c12),
         etok AS (SELECT doc_id, unnest(w) AS word,
             generate_subscripts(w, 1) AS pos FROM s WHERE split = 'test'),
         ebi AS (SELECT a.word AS w1, b.word AS w2
           FROM etok a JOIN etok b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         ev AS (SELECT e.w1, e.w2, c12.c12, ctx.c1, ctx.n1pf,
             CAST(COALESCE(cont.n1pb, 0) AS DOUBLE) / CAST(tt AS DOUBLE)
               AS pcont
           FROM ebi e LEFT JOIN c12 ON e.w1 = c12.w1 AND e.w2 = c12.w2
             LEFT JOIN ctx ON e.w1 = ctx.w1
             LEFT JOIN cont ON e.w2 = cont.w2
             CROSS JOIN types),
         scored AS (SELECT
             CASE WHEN COALESCE(c12, 0) > 0 THEN 'known_pair'
                  WHEN c1 IS NOT NULL THEN 'known_context'
                  ELSE 'unknown_context' END AS bucket,
             CASE WHEN c1 IS NOT NULL THEN
                 GREATEST(CAST(COALESCE(c12, 0) AS DOUBLE) - 0.75, 0.0)
                   / CAST(c1 AS DOUBLE)
                 + ((0.75 * CAST(n1pf AS DOUBLE)) / CAST(c1 AS DOUBLE))
                   * pcont
               ELSE pcont END AS p
           FROM ev)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
             AS mean_kn_prob,
           ROUND(MAX(p), 6) AS max_kn_prob
         FROM scored GROUP BY 1 ORDER BY bucket""",
    "text_compression_ratio" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
         base AS (SELECT doc_id, source,
             CAST(GREATEST(len(w) - 3, 0) AS BIGINT) AS total
           FROM d),
         uq AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS uniq FROM (
             SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 4
                    THEN [array_to_string(w[i:i+3], ' ')
                          for i in range(1, len(w)-2)]
                    ELSE []::VARCHAR[] END)) AS g
             FROM d) t GROUP BY 1),
         j AS (SELECT base.source, base.total,
             COALESCE(uq.uniq, 0) AS uniq
           FROM base LEFT JOIN uq USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN total = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           CAST(SUM(total) AS BIGINT) AS total_grams,
           CAST(SUM(uniq) AS BIGINT) AS uniq_grams,
           ROUND(CAST(SUM(CASE WHEN total > 0 THEN
               CAST(CAST(uniq AS DOUBLE) / CAST(total AS DOUBLE)
                 AS DECIMAL(18,9)) END) AS DOUBLE)
             / SUM(CASE WHEN total > 0 THEN 1 ELSE 0 END), 6) AS mean_ratio,
           CAST(SUM(CASE WHEN total > 0 AND uniq * 10 < total * 3
             THEN 1 ELSE 0 END) AS BIGINT) AS n_compressible
         FROM j GROUP BY 1 ORDER BY source""",
    "text_span_corruption" ->
      """WITH t AS (SELECT doc_id, source,
             generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents),
         s AS (SELECT doc_id, source, pos,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(pos AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(pos AS VARCHAR)), 2, 1)) - 1)
               < 38 THEN 1 ELSE 0 END AS strt
           FROM t),
         m AS (SELECT doc_id, source, pos, strt,
             MAX(strt) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mk
           FROM s),
         sp AS (SELECT doc_id, source, mk,
             CASE WHEN mk = 1 AND COALESCE(lag(mk) OVER (
                 PARTITION BY doc_id ORDER BY pos), 0) = 0
               THEN 1 ELSE 0 END AS span_start
           FROM m)
         SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(mk) AS BIGINT) AS n_masked,
           ROUND(CAST(SUM(mk) AS DOUBLE) / COUNT(*), 6) AS mask_share,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           ROUND(CAST(SUM(mk) AS DOUBLE) / SUM(span_start), 4)
             AS mean_span_len
         FROM sp GROUP BY 1 ORDER BY source""",
    "text_entropy_rate" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t
           FROM documents),
         uni AS (SELECT lang, unnest(t) AS w FROM d),
         uc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n
           FROM uni GROUP BY 1, 2),
         ut AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM uc GROUP BY 1),
         h1 AS (SELECT uc.lang,
             CAST(SUM(CAST(-(CAST(n AS DOUBLE) / nt)
               * ln(CAST(n AS DOUBLE) / nt) AS DECIMAL(28,12)))
               AS DOUBLE) AS h1,
             MAX(nt) AS n_tokens
           FROM uc JOIN ut ON uc.lang = ut.lang GROUP BY 1),
         tokp AS (SELECT doc_id, lang, unnest(t) AS w,
             generate_subscripts(t, 1) AS pos FROM d),
         bi AS (SELECT a.lang, a.w AS w1, b.w AS w2
           FROM tokp a JOIN tokp b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         bc AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
           FROM bi GROUP BY 1, 2, 3),
         bt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM bc GROUP BY 1),
         h2 AS (SELECT bc.lang,
             CAST(SUM(CAST(-(CAST(n AS DOUBLE) / nt)
               * ln(CAST(n AS DOUBLE) / nt) AS DECIMAL(28,12)))
               AS DOUBLE) AS h2
           FROM bc JOIN bt ON bc.lang = bt.lang GROUP BY 1)
         SELECT h1.lang, n_tokens, ROUND(h1, 6) AS h_unigram,
           ROUND(h2 - h1, 6) AS h_rate,
           ROUND(exp(h2 - h1), 4) AS cond_perplexity
         FROM h1 JOIN h2 ON h1.lang = h2.lang ORDER BY h1.lang""",
    "text_heaps_law" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             string_split(text, ' ') AS t
           FROM documents),
         rg AS (SELECT MIN(doc_id) AS dmin, MAX(doc_id) AS dmax FROM d),
         ks AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS k),
         cuts AS (SELECT k,
             CAST(dmin + ((dmax - dmin) * k) // 10 AS BIGINT) AS cut
           FROM ks, rg),
         fd AS (SELECT w, MIN(doc_id) AS fd FROM (
             SELECT doc_id, unnest(list_distinct(t)) AS w FROM d) z
           GROUP BY 1),
         va AS (SELECT k, cut, CAST(COUNT(*) AS BIGINT) AS vocab_size
           FROM fd JOIN cuts ON fd.fd <= cuts.cut GROUP BY 1, 2),
         ta AS (SELECT k, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           FROM d JOIN cuts ON d.doc_id <= cuts.cut GROUP BY 1),
         pts AS (SELECT va.k, cut, n_tokens, vocab_size,
             ln(CAST(n_tokens AS DOUBLE)) AS x,
             ln(CAST(vocab_size AS DOUBLE)) AS y
           FROM va JOIN ta USING (k)),
         fit0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
           FROM pts),
         fit AS (SELECT
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta0,
             sx, sy, n
           FROM fit0)
         SELECT k, cut, n_tokens, vocab_size,
           ROUND(beta0, 4) AS beta,
           ROUND(exp((sy - beta0 * sx) / n), 4) AS k_coef
         FROM pts, fit ORDER BY k""",
    "text_rake_keywords" ->
      """WITH toks AS (SELECT doc_id, pos - 1 AS p, tok AS w
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents) z),
         fl AS (SELECT doc_id, p, w,
             (w IN ('the','a','of','and','to','in','is','for','on','with')
               OR w = '') AS is_stop
           FROM toks),
         g AS (SELECT doc_id, p, w, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER
               (PARTITION BY doc_id ORDER BY p) AS grp
           FROM fl),
         ph AS (SELECT doc_id, grp,
             string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS len
           FROM g WHERE NOT is_stop GROUP BY 1, 2
           HAVING COUNT(*) <= 8),
         ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(len) AS BIGINT) AS deg
           FROM (SELECT len, unnest(string_split(phrase, ' ')) AS w
                 FROM ph) e
           GROUP BY 1),
         dp AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurs,
             MAX(len) AS len FROM ph GROUP BY 1),
         sc AS (SELECT d2.phrase, d2.n_occurs, d2.len,
             SUM(CAST(CAST(ws.deg AS DOUBLE) / ws.freq
               AS DECIMAL(18,9))) AS score_d
           FROM (SELECT phrase, n_occurs, len,
                   unnest(string_split(phrase, ' ')) AS w FROM dp) d2
           JOIN ws USING (w)
           GROUP BY 1, 2, 3)
         SELECT CAST(rk AS BIGINT) AS rk, phrase, len AS n_words,
           n_occurs, ROUND(CAST(score_d AS DOUBLE), 4) AS score
         FROM (SELECT *, ROW_NUMBER() OVER
             (ORDER BY score_d DESC, phrase) AS rk FROM sc) r
         WHERE rk <= 25 ORDER BY rk""",
    "text_js_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         stf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cs
                 FROM tok GROUP BY 1, 2),
         ctf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cc
                 FROM tok GROUP BY 1),
         st AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns,
                  CAST(COUNT(*) AS BIGINT) AS n_types
                FROM stf GROUP BY 1),
         ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc FROM ctf),
         pt AS (SELECT s.source,
             CAST(((p * log2(p / m) + q * log2(q / m)) / 2)
               AS DECIMAL(28,10)) AS term_js,
             CAST(q / 2 AS DECIMAL(28,10)) AS q_present_half
           FROM (SELECT s.source,
                   CAST(s.cs AS DOUBLE) / t.ns AS p,
                   CAST(c.cc AS DOUBLE) / x.nc AS q,
                   (CAST(s.cs AS DOUBLE) / t.ns +
                    CAST(c.cc AS DOUBLE) / x.nc) / 2 AS m
                 FROM stf s JOIN ctf c ON s.tok = c.tok
                      JOIN st t ON s.source = t.source
                      CROSS JOIN ct x) s)
         SELECT g.source, t.ns AS n_tok, t.n_types,
           ROUND(CAST(g.jsp AS DOUBLE) +
             (0.5 - CAST(g.qp AS DOUBLE)), 4) AS jsd
         FROM (SELECT source, SUM(term_js) AS jsp,
                 SUM(q_present_half) AS qp
               FROM pt GROUP BY 1) g
         JOIN st t ON g.source = t.source
         ORDER BY g.source""",
    "text_cdc_chunks" ->
      """WITH w AS (SELECT doc_id, w, pos,
             CASE WHEN substr(md5(w), 1, 1) = '0' THEN 1 ELSE 0 END AS b
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents) u),
         c AS (SELECT *, SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS cid FROM w),
         chunks AS (SELECT doc_id, cid,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             md5(string_agg(w, ' ' ORDER BY pos)) AS fp
           FROM c GROUP BY doc_id, cid),
         occ AS (SELECT fp, COUNT(*) AS n_occ FROM chunks GROUP BY fp)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(CASE WHEN n_occ > 1 THEN n_words ELSE 0 END)
             AS DOUBLE) / SUM(n_words), 4) AS dup_word_mass
         FROM chunks JOIN occ USING (fp)
         GROUP BY doc_id ORDER BY doc_id""",
    "text_ngram_novelty" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         firsts AS (SELECT shingle, MIN(doc_id) AS first_doc
                    FROM sh GROUP BY shingle),
         per_doc AS (SELECT s.doc_id, COUNT(*) AS n_sh,
             SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
           FROM sh s JOIN firsts f ON s.shingle = f.shingle
           GROUP BY s.doc_id),
         tot AS (SELECT COUNT(*) AS n_total FROM documents)
         SELECT CAST(FLOOR(doc_id * 10 / n_total) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE), 4)
             AS novelty_rate
         FROM per_doc, tot
         GROUP BY 1 ORDER BY decile""",
    "text_token_entropy" ->
      """WITH tf AS (SELECT doc_id, tok, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents) t
           GROUP BY doc_id, tok)
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(n_types AS BIGINT) AS n_types,
           ROUND(log2(CAST(n_tok AS DOUBLE)) -
             CAST(clogc AS DOUBLE) / CAST(n_tok AS DOUBLE), 3) AS entropy
         FROM (SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_types,
             SUM(CAST(c * log2(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS clogc
           FROM tf GROUP BY doc_id) g
         ORDER BY doc_id""",
    "text_chunks" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l
                    FROM documents WHERE doc_id < 40),
         c AS (SELECT doc_id, l,
                 unnest(generate_series(0, CAST(greatest(0,
                   ceil((len(l) - 40) / 20.0)) AS BIGINT))) AS chunk_idx
               FROM s)
         SELECT doc_id, chunk_idx,
           md5(array_to_string(l[(chunk_idx*20+1):(chunk_idx*20+40)], ' '))
             AS chunk_md5,
           CAST(len(l[(chunk_idx*20+1):(chunk_idx*20+40)]) AS BIGINT)
             AS n_words
         FROM c ORDER BY doc_id, chunk_idx""",
    "text_pmi" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
         tok AS (SELECT doc_id, unnest(w) AS word,
                   generate_subscripts(w, 1) AS pos FROM words),
         bi AS (SELECT a.word AS w1, b.word AS w2
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
                FROM bi GROUP BY 1, 2),
         uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cu
                FROM tok GROUP BY 1),
         tots AS (SELECT CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) AS n_uni,
                         CAST((SELECT COUNT(*) FROM bi) AS DOUBLE) AS n_bi)
         SELECT w1, w2, n_pair,
           ROUND((CAST(n_pair AS DOUBLE) / n_bi) /
             ((CAST(u1.cu AS DOUBLE) / n_uni)
              * (CAST(u2.cu AS DOUBLE) / n_uni)), 4) AS lift,
           ROUND(ln((CAST(n_pair AS DOUBLE) / n_bi) /
             ((CAST(u1.cu AS DOUBLE) / n_uni)
              * (CAST(u2.cu AS DOUBLE) / n_uni))), 6) AS pmi
         FROM bc JOIN uc u1 ON bc.w1 = u1.word
                 JOIN uc u2 ON bc.w2 = u2.word
                 CROSS JOIN tots
         WHERE n_pair >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 25""",
    "text_normalize" ->
      """WITH raw AS (SELECT doc_id,
           'Cafe' || chr(769) || ' nai' || chr(776) || 've '
             || substr(text, 1, 40) AS raw
           FROM documents WHERE doc_id < 10),
         n AS (SELECT doc_id, length(raw) AS len_raw,
                 nfc_normalize(raw) AS nfc FROM raw)
         SELECT doc_id, len_raw, length(nfc) AS len_nfc,
           md5(nfc) AS nfc_md5,
           substr(lower(strip_accents(nfc)), 1, 24) AS folded
         FROM n ORDER BY doc_id""",
    "text_vocab_coverage" ->
      """WITH cnt AS (SELECT lang, w, COUNT(*) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY 1, 2),
         rk AS (SELECT lang, c, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY c DESC, w) AS rn FROM cnt)
         SELECT lang,
           CAST(SUM(CASE WHEN rn <= 20 THEN c ELSE 0 END) AS BIGINT)
             AS top20_occurrences,
           CAST(SUM(c) AS BIGINT) AS total_occurrences,
           ROUND(CAST(SUM(CASE WHEN rn <= 20 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE), 6) AS coverage
         FROM rk GROUP BY lang ORDER BY lang""",
    "text_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM tok),
         lm AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cw
           FROM tok GROUP BY 1)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
           ROUND(CAST(SUM(CAST(ln(CAST(cw AS DOUBLE) / n_total)
               AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_logprob
         FROM tok JOIN lm USING (word), tot
         GROUP BY doc_id
         ORDER BY mean_logprob, doc_id LIMIT 20""",
    "text_repetition" ->
      """WITH base AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         d AS (SELECT base.source, base.n_tok,
             COALESCE(mb.max_bg, 0) AS max_bg,
             COALESCE(tr.n_tri, 0) AS n_tri,
             COALESCE(tr.dup_tri, 0) AS dup_tri
           FROM base LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN max_bg * 10 > n_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flag_top2,
           CAST(SUM(CASE WHEN dup_tri * 10 > n_tri * 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flag_dup3,
           ROUND(CAST(SUM(max_bg * 2) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS top2_frac_micro,
           CASE WHEN SUM(n_tri) > 0 THEN ROUND(CAST(SUM(dup_tri) AS DOUBLE)
             / CAST(SUM(n_tri) AS DOUBLE), 6) END AS dup3_frac_micro
         FROM d GROUP BY source ORDER BY source""",
    "text_source_overlap" ->
      """WITH s AS (SELECT doc_id, source, md5(substr(text, 1, 64)) AS fp
           FROM documents),
         okf AS (SELECT fp FROM s GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_shared_fps
         FROM s a JOIN s b ON a.fp = b.fp AND a.source < b.source
         JOIN okf k ON k.fp = a.fp
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // text_boilerplate_lines: the same string_split + (i-1)//p line
    // boundary as paragraph_dedup; per-(source, line-text) df census,
    // drop-all removable mass for lines in >= 2 same-source docs
    "text_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, source, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         ln AS MATERIALIZED (SELECT doc_id, source, (i - 1) // 10 AS lidx,
             string_agg(w, ' ' ORDER BY i) AS ltxt,
             CAST(COUNT(*) AS BIGINT) AS tok
           FROM tok GROUP BY 1, 2, 3),
         census AS (SELECT source, ltxt,
             CAST(COUNT(*) AS BIGINT) AS n_occ,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_line,
             MAX(tok) AS tok
           FROM ln GROUP BY 1, 2),
         boiler AS MATERIALIZED (SELECT * FROM census
           WHERE n_docs_line >= 2),
         totals AS (SELECT source,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(tok) AS BIGINT) AS total_tokens
           FROM ln GROUP BY 1),
         agg AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_boiler_lines,
             CAST(SUM(n_occ) AS BIGINT) AS boiler_occurrences,
             CAST(SUM(n_occ * tok) AS BIGINT) AS removable_tokens
           FROM boiler GROUP BY 1),
         aff AS (SELECT l.source,
             CAST(COUNT(DISTINCT l.doc_id) AS BIGINT) AS docs_affected
           FROM ln l JOIN boiler b
             ON l.source = b.source AND l.ltxt = b.ltxt
           GROUP BY 1)
         SELECT t.source, t.n_docs, t.n_lines, t.total_tokens,
           COALESCE(a.n_boiler_lines, 0) AS n_boiler_lines,
           COALESCE(a.boiler_occurrences, 0) AS boiler_occurrences,
           COALESCE(f.docs_affected, 0) AS docs_affected,
           COALESCE(a.removable_tokens, 0) AS removable_tokens,
           ROUND(CAST(COALESCE(a.removable_tokens, 0) AS DOUBLE)
             / CAST(t.total_tokens AS DOUBLE), 6) AS removable_share
         FROM totals t LEFT JOIN agg a USING (source)
         LEFT JOIN aff f USING (source)
         ORDER BY source""",
    // text_paragraph_dedup: non-overlapping 15-word chunks from the same
    // string_split relation; first-occurrence keep is a row_number over
    // the raw paragraph TEXT (the Spark side ranks xxhash64 fingerprints
    // — grouping text here doubles as the standing collision check)
    "text_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, source, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         para AS (SELECT doc_id, source, (i - 1) // 15 AS pidx,
             string_agg(w, ' ' ORDER BY i) AS ptxt,
             CAST(COUNT(*) AS BIGINT) AS ptok
           FROM tok GROUP BY 1, 2, 3),
         ranked AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY ptxt ORDER BY doc_id, pidx) AS rn FROM para)
         SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_paras,
           CAST(SUM(ptok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN rn = 1 THEN ptok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           ROUND(1.0 - CAST(SUM(CASE WHEN rn = 1 THEN ptok ELSE 0 END)
               AS DOUBLE) / CAST(SUM(ptok) AS DOUBLE), 6) AS removed_frac
         FROM ranked GROUP BY source ORDER BY source""",
    "text_decontaminate" ->
      """WITH s AS (SELECT doc_id, source,
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
               ELSE 'test' END AS split,
             string_split(text, ' ') AS w
           FROM documents),
         tg AS (SELECT doc_id, source, unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'train'),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         contam AS (SELECT DISTINCT doc_id, source FROM tg
           WHERE g IN (SELECT g FROM bg))
         SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COALESCE(MAX(c.n), 0) AS BIGINT) AS n_contaminated
         FROM (SELECT doc_id, source FROM s WHERE split = 'train') t
         LEFT JOIN (SELECT source, COUNT(*) AS n FROM contam GROUP BY 1) c
           ON t.source = c.source
         GROUP BY t.source ORDER BY t.source""",
    "text_minkprob_contamination" ->
      """WITH d AS (SELECT doc_id, source,
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
               ELSE 'test' END AS split,
             string_split(text, ' ') AS tk
           FROM documents),
         trt AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
             unnest(tk) AS word FROM d WHERE split = 'train'),
         trb AS (SELECT a.word AS w1, b.word AS w2 FROM trt a
           JOIN trt b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         pc AS MATERIALIZED (SELECT w1, w2,
             CAST(COUNT(*) AS BIGINT) AS c FROM trb GROUP BY 1, 2),
         ctx AS MATERIALIZED (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
             CAST(COUNT(*) AS BIGINT) AS n1w1 FROM pc GROUP BY 1),
         cont AS MATERIALIZED (SELECT w2,
             CAST(COUNT(*) AS BIGINT) AS n1w2 FROM pc GROUP BY 1),
         n1a AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n1all
           FROM pc),
         tet AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
             unnest(tk) AS word FROM d WHERE split = 'test'),
         teb AS (SELECT a.doc_id, a.word AS w1, b.word AS w2,
             a.i - 1 AS pos
           FROM tet a JOIN tet b
             ON a.doc_id = b.doc_id AND b.i = a.i + 1),
         sc AS MATERIALIZED (SELECT t.doc_id, t.pos,
             CAST(-ln(GREATEST(CAST(COALESCE(pc.c, 0) AS DOUBLE)
                 - 0.75, 0.0) / CAST(ctx.cw1 AS DOUBLE)
               + 0.75 * CAST(ctx.n1w1 AS DOUBLE) / CAST(ctx.cw1 AS DOUBLE)
                 * (CAST(cont.n1w2 AS DOUBLE) / CAST(n1a.n1all AS DOUBLE)))
               AS DECIMAL(28,12)) AS nll
           FROM teb t LEFT JOIN pc USING (w1, w2)
           LEFT JOIN ctx USING (w1)
           LEFT JOIN cont USING (w2), n1a
           WHERE ctx.cw1 IS NOT NULL AND cont.n1w2 IS NOT NULL),
         nd AS MATERIALIZED (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_scored FROM sc GROUP BY 1),
         rk AS (SELECT doc_id, pos, nll, ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY nll DESC, pos) AS rk FROM sc),
         mk AS MATERIALIZED (SELECT r.doc_id,
             CAST(CAST(SUM(r.nll) AS DOUBLE) / COUNT(*)
               AS DECIMAL(18,9)) AS m
           FROM rk r JOIN nd USING (doc_id)
           WHERE r.rk <= (nd.n_scored * 20 + 99) // 100
           GROUP BY 1),
         st AS MATERIALIZED (SELECT
             CAST(SUM(m) AS DOUBLE) / COUNT(*) AS mean_m,
             CASE WHEN COUNT(*) > 1 THEN sqrt(
               (CAST(SUM(m * m) AS DOUBLE) - CAST(SUM(m) AS DOUBLE)
                 * CAST(SUM(m) AS DOUBLE) / COUNT(*))
               / (COUNT(*) - 1)) END AS sd_m
           FROM mk),
         fl AS (SELECT mk.doc_id, mk.m,
             st.sd_m IS NOT NULL
               AND CAST(mk.m AS DOUBLE) < st.mean_m - st.sd_m
               AS mink_flag
           FROM mk, st),
         tg AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(tk) >= 13
                  THEN [array_to_string(tk[i:i+12], ' ') for i in range(1, len(tk)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM d WHERE split = 'test'),
         trg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(tk) >= 13
                  THEN [array_to_string(tk[i:i+12], ' ') for i in range(1, len(tk)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM d WHERE split = 'train'),
         ex AS MATERIALIZED (SELECT DISTINCT doc_id FROM tg
           WHERE g IN (SELECT g FROM trg)),
         base AS (SELECT doc_id, source FROM d WHERE split = 'test')
         SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN f.m IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_scored_docs,
           CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN COALESCE(f.mink_flag, false)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_mink,
           CAST(SUM(CASE WHEN COALESCE(f.mink_flag, false)
               AND e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both,
           CAST(SUM(CASE WHEN COALESCE(f.mink_flag, false)
               AND e.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mink_only,
           CASE WHEN SUM(CASE WHEN f.m IS NOT NULL THEN 1 ELSE 0 END) > 0
             THEN ROUND(CAST(SUM(f.m) AS DOUBLE)
               / SUM(CASE WHEN f.m IS NOT NULL THEN 1 ELSE 0 END), 6)
             END AS mean_mink_nll
         FROM base b LEFT JOIN fl f USING (doc_id)
         LEFT JOIN ex e USING (doc_id)
         GROUP BY 1 ORDER BY 1""",
    "text_substring_dup" ->
      """WITH base AS (SELECT doc_id, source FROM documents),
         win AS (SELECT doc_id, md5(g) AS fp FROM
           (SELECT doc_id, unnest(
              CASE WHEN len(w) >= 20
                   THEN [array_to_string(w[i:i+19], ' ') for i in range(1, len(w)-18)]
                   ELSE []::VARCHAR[] END) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
         spread AS (SELECT fp, COUNT(*) AS nd FROM
             (SELECT DISTINCT doc_id, fp FROM win) GROUP BY fp),
         pd AS (SELECT doc_id, COUNT(*) AS n_win,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_shared
           FROM win JOIN spread USING (fp) GROUP BY doc_id),
         d AS (SELECT base.source,
             COALESCE(pd.n_win, 0) AS n_win,
             COALESCE(pd.n_shared, 0) AS n_shared
           FROM base LEFT JOIN pd USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_shared,
           CAST(SUM(n_win) AS BIGINT) AS window_mass,
           CAST(SUM(n_shared) AS BIGINT) AS shared_mass,
           CASE WHEN SUM(n_win) > 0 THEN ROUND(CAST(SUM(n_shared) AS DOUBLE)
             / CAST(SUM(n_win) AS DOUBLE), 6) END AS shared_frac
         FROM d GROUP BY source ORDER BY source""",
    "text_bigram_logprob" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bg AS (SELECT doc_id,
             string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
           FROM (SELECT doc_id, unnest(
               CASE WHEN len(w) >= 2
                    THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                    ELSE []::VARCHAR[] END) AS g
             FROM words)),
         cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
         tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         cu AS (SELECT word, COUNT(*) AS cu FROM tok GROUP BY 1),
         vocab AS (SELECT COUNT(DISTINCT word) AS v FROM tok)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(ln(CAST(cb.cb + 1 AS DOUBLE)
               / CAST(cu.cu + v AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_logprob
         FROM bg JOIN cb USING (w1, w2) JOIN cu ON bg.w1 = cu.word, vocab
         GROUP BY doc_id ORDER BY mean_logprob, doc_id LIMIT 20""",
    "text_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word
           FROM documents),
         top AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY 1
           ORDER BY freq DESC, word LIMIT 100),
         r AS (SELECT freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rk FROM top),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ln(CAST(freq AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(freq AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sxy
           FROM r)
         SELECT CAST(n AS BIGINT) AS n_words,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) AS intercept
         FROM s""",
    // text_substring_removal: same 20-gram relation as the census oracle
    // but with POSITIONS (generate_subscripts - 1 matches posexplode's
    // 0-base); interval union via gaps-and-islands, all integer
    "text_substring_removal" ->
      """WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
         base AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok
           FROM words),
         lst AS (SELECT doc_id,
             CASE WHEN len(w) >= 20
                  THEN [array_to_string(w[i:i+19], ' ') for i in range(1, len(w)-18)]
                  ELSE []::VARCHAR[] END AS gs
           FROM words),
         win AS (SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos,
             unnest(gs) AS g FROM lst),
         shared AS (SELECT g FROM
             (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM win GROUP BY g) t
           WHERE nd > 1),
         ss AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM win
           WHERE g IN (SELECT g FROM shared)),
         isl AS (SELECT doc_id, pos,
             CASE WHEN MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
           FROM ss),
         isl2 AS (SELECT doc_id, pos, SUM(new_island) OVER
             (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         iv AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos + 20) AS e
           FROM isl2 GROUP BY 1, 2),
         cov AS (SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS covered
           FROM iv GROUP BY 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(COALESCE(covered, 0)) AS BIGINT) AS removed_tokens,
           CAST(SUM(n_tok) - SUM(COALESCE(covered, 0)) AS BIGINT)
             AS kept_tokens,
           CASE WHEN SUM(n_tok) > 0 THEN
             ROUND(CAST(SUM(COALESCE(covered, 0)) AS DOUBLE)
               / CAST(SUM(n_tok) AS DOUBLE), 6) END AS removed_frac
         FROM base LEFT JOIN cov USING (doc_id)
         GROUP BY source ORDER BY source""",
    "text_winnowing" ->
      """WITH g AS (SELECT doc_id, source, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, source, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, source, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fp AS (SELECT DISTINCT doc_id, source, n_grams, wkey
           FROM sel WHERE p <= n_grams - 3),
         fph AS (SELECT doc_id, source, n_grams,
             substr(wkey, 1, 32) AS hash FROM fp),
         perdoc AS (SELECT doc_id, source,
             MAX(n_grams - 3) AS n_windows,
             CAST(COUNT(*) AS BIGINT) AS n_fp
           FROM fph GROUP BY 1, 2),
         hd AS (SELECT source, hash,
             COUNT(DISTINCT doc_id) AS df FROM fph GROUP BY 1, 2),
         sharing AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_hash_distinct,
             CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hash_shared
           FROM hd GROUP BY 1)
         SELECT p.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_windows) AS BIGINT) AS n_windows,
           CAST(SUM(n_fp) AS BIGINT) AS n_fp,
           ROUND(CAST(SUM(n_fp) AS DOUBLE) / SUM(n_windows), 6)
             AS density,
           MAX(s.n_hash_distinct) AS n_hash_distinct,
           MAX(s.n_hash_shared) AS n_hash_shared
         FROM perdoc p JOIN sharing s USING (source)
         GROUP BY p.source ORDER BY p.source""",
    "text_textrank" ->
      """WITH ws0 AS (SELECT lang,
             [lower(w) for w in string_split(text, ' ')
              if regexp_matches(lower(w), '^[a-z]+$')] AS ws
           FROM documents),
         pos AS (SELECT lang, ws, unnest(range(1, len(ws))) AS i
           FROM ws0),
         bi0 AS (SELECT lang, ws[i] AS w1, ws[i + 1] AS w2 FROM pos
           WHERE ws[i] <> ws[i + 1]),
         bic AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM bi0 GROUP BY 1, 2, 3),
         edges AS (SELECT lang, src, dst, CAST(SUM(c) AS BIGINT) AS w
           FROM (SELECT lang, w1 AS src, w2 AS dst, c FROM bic
             UNION ALL SELECT lang, w2, w1, c FROM bic) u
           GROUP BY 1, 2, 3),
         outw AS (SELECT lang, src, CAST(SUM(w) AS BIGINT) AS ow
           FROM edges GROUP BY 1, 2),
         ew AS (SELECT e.lang, e.src, e.dst,
             CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS ratio
           FROM edges e JOIN outw o ON e.lang = o.lang AND e.src = o.src),
         nodes AS (SELECT DISTINCT lang, src AS node FROM edges),
         nn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
           FROM nodes GROUP BY 1),
         pr0 AS (SELECT n.lang, n.node,
             CAST(1 AS DOUBLE) / CAST(nl AS DOUBLE) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang),
         c1 AS (SELECT e.lang, e.dst,
             CAST(SUM(CAST(p.pr * e.ratio AS DECIMAL(28,12))) AS DOUBLE)
               AS cv
           FROM ew e JOIN pr0 p ON e.lang = p.lang AND e.src = p.node
           GROUP BY 1, 2),
         pr1 AS (SELECT n.lang, n.node,
             CAST(0.15 AS DOUBLE) / CAST(nn.nl AS DOUBLE)
               + CAST(0.85 AS DOUBLE)
                 * COALESCE(c1.cv, CAST(0 AS DOUBLE)) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang
           LEFT JOIN c1 ON n.lang = c1.lang AND n.node = c1.dst),
         c2 AS (SELECT e.lang, e.dst,
             CAST(SUM(CAST(p.pr * e.ratio AS DECIMAL(28,12))) AS DOUBLE)
               AS cv
           FROM ew e JOIN pr1 p ON e.lang = p.lang AND e.src = p.node
           GROUP BY 1, 2),
         pr2 AS (SELECT n.lang, n.node,
             CAST(0.15 AS DOUBLE) / CAST(nn.nl AS DOUBLE)
               + CAST(0.85 AS DOUBLE)
                 * COALESCE(c2.cv, CAST(0 AS DOUBLE)) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang
           LEFT JOIN c2 ON n.lang = c2.lang AND n.node = c2.dst)
         SELECT lang, CAST(rk AS INT) AS rk, node AS word,
           ROUND(pr, 8) AS score
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY pr DESC, node) AS rk FROM pr2) z
         WHERE rk <= 10 ORDER BY lang, rk""",
    "text_prefix_compression" ->
      """WITH vocab AS (SELECT DISTINCT lang, w FROM (
             SELECT lang, unnest([lower(x)
               for x in string_split(text, ' ')
               if regexp_matches(lower(x), '^[a-z]+$')]) AS w
             FROM documents) t),
         lagd AS (SELECT lang, w,
             LAG(w) OVER (PARTITION BY lang ORDER BY w) AS p
           FROM vocab),
         lcps AS (SELECT lang, w, CASE WHEN p IS NULL THEN 0
             ELSE len([k for k in
               range(1, least(length(w), length(p)) + 1)
               if substr(w, 1, CAST(k AS INT))
                 = substr(p, 1, CAST(k AS INT))]) END AS lcp
           FROM lagd)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(w)) AS BIGINT) AS total_chars,
           CAST(SUM(lcp) AS BIGINT) AS saved_chars,
           CAST(SUM(length(w)) - SUM(lcp) AS BIGINT) AS residual_chars,
           ROUND(CAST(SUM(lcp) AS DOUBLE)
             / CAST(SUM(length(w)) AS DOUBLE), 6) AS savings_ratio
         FROM lcps GROUP BY 1 ORDER BY 1""",
    "text_yule_k" ->
      """WITH tf AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
             FROM documents)
           WHERE token <> '' GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS vocab,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * cnt) AS BIGINT) AS s2,
           ROUND(10000.0 * CAST(SUM(cnt * cnt) - SUM(cnt) AS DOUBLE)
             / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)), 6)
             AS yule_k,
           ROUND(CAST(SUM(cnt * cnt) - SUM(cnt) AS DOUBLE)
             / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) - 1 AS DOUBLE)),
             6) AS simpson_d
         FROM tf GROUP BY lang ORDER BY lang""",
    "text_msttr" ->
      """WITH tok AS (SELECT doc_id, lang,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token,
             len(string_split(text, ' ')) AS n_tok
           FROM documents),
         seg AS (SELECT doc_id, lang, w, pos // w AS seg, token
           FROM tok, (VALUES (10), (25), (50)) ws(w)
           WHERE token <> '' AND (pos // w + 1) * w <= n_tok),
         st AS (SELECT doc_id, lang, w, seg,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS types
           FROM seg GROUP BY 1, 2, 3, 4)
         SELECT lang, w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(CAST(SUM(types) AS DOUBLE) / (w * COUNT(*)), 6) AS msttr
         FROM st GROUP BY 1, 2 ORDER BY lang, w""",
    "text_burrows_delta" ->
      """WITH tok AS (SELECT source, token FROM
           (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents) WHERE token <> ''),
         st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tok GROUP BY 1, 2),
         totals AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
           FROM st GROUP BY 1),
         topw AS (SELECT token FROM (SELECT token, SUM(cnt) AS tc
             FROM st GROUP BY 1) z
           ORDER BY tc DESC, token LIMIT 30),
         f AS (SELECT t.source, w.token,
             CAST(CAST(COALESCE(cnt, 0) AS DOUBLE) * 1000.0
               / CAST(tot AS DOUBLE) AS DECIMAL(18,9)) AS fr
           FROM totals t CROSS JOIN topw w
           LEFT JOIN st ON st.source = t.source AND st.token = w.token),
         mo AS (SELECT token, SUM(fr) AS sf, SUM(fr * fr) AS sff,
             CAST(COUNT(*) AS BIGINT) AS ns
           FROM f GROUP BY 1),
         m2 AS (SELECT token, CAST(sf AS DOUBLE) / ns AS mu,
             sqrt(CAST(ns * sff - sf * sf AS DOUBLE)
               / (CAST(ns AS DOUBLE) * CAST(ns - 1 AS DOUBLE))) AS sd
           FROM mo),
         z AS (SELECT f.source, f.token,
             (CAST(fr AS DOUBLE) - mu) / sd AS z
           FROM f JOIN m2 ON f.token = m2.token)
         SELECT a.source AS s1, b.source AS s2,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(CAST(ABS(a.z - b.z) AS DECIMAL(28,12)))
             AS DOUBLE) / COUNT(*), 6) AS delta
         FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
         GROUP BY 1, 2 ORDER BY s1, s2""",
    "text_langid_eval" ->
      """WITH conf AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT)
             AS n FROM (
           SELECT lang,
             CASE WHEN contains(t, ' der ') OR contains(t, ' und ')
                    OR contains(t, ' die ') THEN 'de'
                  WHEN contains(t, ' le ') OR contains(t, ' la ')
                    OR contains(t, ' et ') THEN 'fr'
                  WHEN contains(t, ' el ') OR contains(t, ' los ')
                    OR contains(t, ' que ') THEN 'es'
                  WHEN regexp_matches(t, '[\x{4e00}-\x{9fff}]')
                    THEN 'zh'
                  WHEN contains(t, ' the ') OR contains(t, ' and ')
                    OR contains(t, ' of ') THEN 'en'
                  ELSE 'unknown' END AS pred_lang
           FROM (SELECT lang, ' ' || text || ' ' AS t FROM documents) a)
           b GROUP BY 1, 2),
         bt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM conf
           GROUP BY 1),
         bpd AS (SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT)
             AS n_pred FROM conf GROUP BY 1),
         tp AS (SELECT lang, n AS tp FROM conf
           WHERE lang = pred_lang),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM conf),
         acc AS (SELECT CAST(SUM(n) AS BIGINT) AS n_correct FROM conf
           WHERE lang = pred_lang),
         pc AS (SELECT bt.lang, COALESCE(tp, 0) AS tp,
             COALESCE(n_pred, 0) - COALESCE(tp, 0) AS fp,
             n_true - COALESCE(tp, 0) AS fn
           FROM bt LEFT JOIN tp ON bt.lang = tp.lang
           LEFT JOIN bpd ON bt.lang = bpd.lang),
         m1 AS (SELECT *,
             CASE WHEN tp + fp > 0
               THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END
               AS precision,
             CASE WHEN tp + fn > 0
               THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END
               AS recall
           FROM pc),
         m2 AS (SELECT *,
             CASE WHEN precision + recall > 0
               THEN 2.0 * precision * recall / (precision + recall)
               ELSE 0.0 END AS f1
           FROM m1),
         mac AS (SELECT CAST(SUM(CAST(f1 AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*) AS macro_f1 FROM m2)
         SELECT m2.lang, tp, fp, fn,
           ROUND(precision, 6) AS precision, ROUND(recall, 6) AS recall,
           ROUND(f1, 6) AS f1,
           ROUND(CAST(n_correct AS DOUBLE) / n_all, 6) AS accuracy,
           ROUND(macro_f1, 6) AS macro_f1
         FROM m2, mac, acc, tot ORDER BY m2.lang""",
    "text_char_entropy" ->
      """WITH chars AS (SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT lang, unnest(string_split_regex(text, '')) AS ch
             FROM documents) z
           WHERE ch <> '' GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS vocab FROM chars GROUP BY 1),
         t AS (SELECT c.lang, nt, vocab,
             CAST(CAST(n AS DOUBLE) / nt
               * (ln(CAST(nt AS DOUBLE) / n) / ln(2.0))
               AS DECIMAL(28,12)) AS term
           FROM chars c JOIN tot ON c.lang = tot.lang)
         SELECT lang, MAX(nt) AS n_chars, MAX(vocab) AS vocab,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS entropy_bits,
           ROUND(1.0 - CAST(SUM(term) AS DOUBLE)
             / (ln(CAST(MAX(vocab) AS DOUBLE)) / ln(2.0)), 6)
             AS redundancy
         FROM t GROUP BY 1 ORDER BY lang""",
  )
}
