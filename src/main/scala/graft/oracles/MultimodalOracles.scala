package graft.oracles

/** Multimodal (binary-payload) rows.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object MultimodalOracles {
  private[graft] val sql: Map[String, String] = Map(
    "mm_payload_stats" ->
      """SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         COUNT(*) AS n,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
         CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes
         FROM documents GROUP BY 1 ORDER BY modality""",
    "mm_feature_extract" ->
      """SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_frames,
         CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS BIGINT) AS f0,
         CAST((strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS BIGINT) AS f1
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      """WITH frames AS (
           SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
             octet_length(encode(text)) AS byte_len,
             unnest(range(0, (octet_length(encode(text)) - 1) // 64 + 1)) AS frame_no
           FROM documents)
         SELECT modality, COUNT(*) AS n_frames_sampled,
           CAST(SUM(least(64, byte_len - frame_no * 64)) AS BIGINT) AS bytes_sampled,
           COUNT(DISTINCT doc_id) AS n_docs
         FROM frames WHERE frame_no % 4 = 0
         GROUP BY modality ORDER BY modality""",
    "mm_scene_cuts" ->
      """WITH v AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 3 = 2 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 64 AS f,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM v) u),
         fr AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS inten
           FROM b GROUP BY 1, 2),
         d AS (SELECT doc_id, f, inten,
             abs(inten - lag(inten) OVER (PARTITION BY doc_id ORDER BY f))
               AS delta
           FROM fr),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN delta >= 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cuts,
             CAST(MAX(COALESCE(delta, 0)) AS BIGINT) AS max_delta
           FROM d GROUP BY 1)
         SELECT doc_id, n_frames, n_cuts, n_cuts + 1 AS n_scenes,
           ROUND(CAST(n_frames AS DOUBLE) / CAST(n_cuts + 1 AS DOUBLE), 4)
             AS mean_scene_len,
           max_delta
         FROM pd ORDER BY doc_id""",
    "mm_pack_budget" ->
      """WITH t AS (SELECT
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS source,
             doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT)
               + CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 49 WHEN 1 THEN 25 ELSE 16 END
                 * ((CAST(length(text) AS BIGINT) + 63) // 64) AS n_tok
           FROM documents),
         c AS (SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t),
         pw AS (SELECT source, (cum - n_tok) // 1024 AS win,
             CAST(COUNT(*) AS BIGINT) AS docs_in_win,
             SUM(n_tok) AS tok_start
           FROM c GROUP BY 1, 2)
         SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
         FROM pw GROUP BY 1 ORDER BY 1""",
    "mm_audio_neardup" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 256 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         sig AS (SELECT doc_id, w // 4 AS band,
             md5(string_agg(CAST(energy // 16384 AS VARCHAR), ','
               ORDER BY w)) AS bucket
           FROM wins GROUP BY 1, 2),
         sh AS (SELECT doc_id,
             CAST(band AS VARCHAR) || ':' || bucket AS shingle FROM sig),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b2.doc_id AS d2,
             COUNT(*) AS i
           FROM sh a JOIN sh b2
             ON a.shingle = b2.shingle AND a.doc_id < b2.doc_id
           JOIN okdf kf ON kf.shingle = a.shingle
           GROUP BY 1, 2)
         SELECT d1, d2, CAST(i AS BIGINT) AS n_bands_agree,
           CAST(s1.n AS BIGINT) AS n_bands_1,
           CAST(s2.n AS BIGINT) AS n_bands_2,
           ROUND(CAST(i AS DOUBLE) / GREATEST(s1.n, s2.n), 3)
             AS band_frac
         FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                    JOIN sizes s2 ON d2 = s2.doc_id
         WHERE i * 100 >= GREATEST(s1.n, s2.n) * 50
         ORDER BY d1, d2""",
    "mm_audio_energy" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 256 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         z AS (SELECT doc_id, energy,
             MAX(energy) OVER (PARTITION BY doc_id) AS peak FROM wins)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(MAX(energy) AS BIGINT) AS peak_energy,
           CAST(SUM(CASE WHEN energy * 10 >= peak * 9 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_near_peak,
           ROUND(CAST(SUM(CASE WHEN energy * 10 >= peak * 9
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS near_peak_ratio
         FROM z GROUP BY doc_id ORDER BY doc_id""",
    "mm_resize" ->
      """WITH d AS (SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           text, CAST(length(text) AS BIGINT) AS orig_len,
           CAST(ceil(length(text) / 64.0) AS BIGINT) AS nf
           FROM documents WHERE doc_id < 200),
         k AS (SELECT *, greatest(1, CAST(ceil(nf / 8.0) AS BIGINT))
                 AS stride FROM d),
         fr AS (SELECT doc_id, modality, orig_len, stride, text,
                  unnest(generate_series(0, nf - 1)) AS f FROM k),
         kept AS (SELECT doc_id, modality, orig_len,
             string_agg(substr(text, CAST(f * 64 + 1 AS BIGINT), 64),
                        '' ORDER BY f) AS resized
           FROM fr WHERE f % stride = 0 GROUP BY 1, 2, 3)
         SELECT doc_id, modality, orig_len,
           CAST(length(resized) AS BIGINT) AS resized_len,
           md5(resized) AS resized_md5
         FROM kept ORDER BY doc_id""",
    "mm_phash_hamming" ->
      """WITH fr AS (SELECT doc_id, unnest(list_distinct(
             [substr(text, i*64 + 1, 64)
              for i in range(0, (length(text) + 63) // 64)])) AS frame
           FROM documents),
         h AS (SELECT doc_id, substr(md5(frame), 1, 16) AS hx FROM fr),
         bits AS (
           SELECT doc_id, j,
             SUM(CASE WHEN ((strpos('0123456789abcdef',
                               substr(hx, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   // (CASE CAST(j % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4
                       WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                 THEN 1 ELSE -1 END) AS s
           FROM h CROSS JOIN range(64) t(j) GROUP BY doc_id, j),
         sig AS (SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS sig
           FROM bits GROUP BY doc_id),
         cand AS (SELECT x.doc_id AS d1, y.doc_id AS d2,
             x.sig AS s1, y.sig AS s2
           FROM sig x JOIN sig y ON x.doc_id < y.doc_id)
         SELECT d1, d2,
           CAST(len(list_filter(range(1, 65),
             i -> substr(s1, CAST(i AS INT), 1)
               <> substr(s2, CAST(i AS INT), 1))) AS BIGINT) AS hamming
         FROM cand
         WHERE len(list_filter(range(1, 65),
             i -> substr(s1, CAST(i AS INT), 1)
               <> substr(s2, CAST(i AS INT), 1))) <= 7
         ORDER BY d1, d2""",
    "mm_patch_grid" ->
      """WITH b AS (SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]
               AS modality,
             unnest(range(1, 17)) AS i, md5(text) AS h
           FROM documents),
         vals AS (SELECT modality, CAST((i - 1) // 4 AS INT) AS band,
             CAST((strpos('0123456789abcdef',
                 substr(h, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(h, CAST(2 * i AS INT), 1)) - 1) AS BIGINT)
               AS byte_val
           FROM b)
         SELECT modality, band, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(byte_val) AS BIGINT) AS sum_bytes,
           ROUND(CAST(SUM(byte_val) AS DOUBLE) / (COUNT(*) * 255), 6)
             AS mean_intensity,
           CAST(MIN(byte_val) AS BIGINT) AS min_byte,
           CAST(MAX(byte_val) AS BIGINT) AS max_byte
         FROM vals GROUP BY 1, 2 ORDER BY 1, 2""",
    "mm_audio_fingerprint" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 32 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         lags AS (SELECT doc_id, w, energy,
             LAG(energy) OVER (PARTITION BY doc_id ORDER BY w) AS pe,
             LEAD(energy) OVER (PARTITION BY doc_id ORDER BY w) AS ne
           FROM wins),
         pk AS (SELECT doc_id, w, energy // 4096 AS q,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS rk
           FROM lags WHERE energy > COALESCE(pe, -1)
             AND energy >= COALESCE(ne, -1)),
         sig AS (SELECT DISTINCT a.doc_id,
             md5(CAST(a.q AS VARCHAR) || ':' || CAST(bb.q AS VARCHAR)
               || ':' || CAST(bb.w - a.w AS VARCHAR)) AS h
           FROM pk a JOIN pk bb ON a.doc_id = bb.doc_id
             AND bb.rk > a.rk AND bb.rk <= a.rk + 3),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sig
           GROUP BY 1),
         keep AS (SELECT h FROM sig GROUP BY h
           HAVING COUNT(*) BETWEEN 2 AND 64),
         pr AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS inter
           FROM sig s1 JOIN sig s2
             ON s1.h = s2.h AND s1.doc_id < s2.doc_id
           JOIN keep k ON k.h = s1.h
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT d1, d2, inter AS n_shared, z1.n AS n1, z2.n AS n2,
           ROUND(CAST(inter AS DOUBLE) / least(z1.n, z2.n), 6) AS score
         FROM pr JOIN sizes z1 ON d1 = z1.doc_id
         JOIN sizes z2 ON d2 = z2.doc_id
         ORDER BY n_shared DESC, d1, d2""",
  )
}
