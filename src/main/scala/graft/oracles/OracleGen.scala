package graft.oracles

/** Generated DuckDB oracle SQL: unrolled fixed-iteration replays and
  * shared CTE bodies, moved verbatim from SparkEntry in round 16. Each
  * generator exists so the Spark loop and its oracle can never disagree
  * on an iteration count / parameter silently. */
object OracleGen {
  /** Shared CTE bodies: rows that COMPOSE another row's semantics
    * (anomaly gate over the decomposition, projection over the learned
    * component) embed the SAME oracle text, so a fix to the base
    * relation can never silently diverge from its consumers. */
  private[graft] val tsDecomposeOracle: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         tr AS (SELECT *,
             CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend,
             dayofweek(d) AS dow
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         dt AS (SELECT *, CAST(n - trend AS DECIMAL(28,8)) AS detr FROM tr),
         se AS (SELECT event_type, dow,
             CAST(SUM(detr) AS DOUBLE) / COUNT(*) AS seasonal
           FROM dt GROUP BY 1, 2)
         SELECT t.event_type, strftime(t.d, '%Y-%m-%d') AS day, t.n,
           ROUND(t.trend, 4) AS trend,
           ROUND(s.seasonal, 4) AS seasonal,
           ROUND(CAST(t.detr AS DOUBLE) - s.seasonal, 4) AS residual
         FROM dt t JOIN se s
           ON t.event_type = s.event_type AND t.dow = s.dow
         ORDER BY t.event_type, day"""

  private[graft] val pcaPowerOracle: String =
    """WITH xq AS (SELECT vec_id, j - 1 AS j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS j
                 FROM embeddings) t),
         s AS (SELECT vec_id, CAST(SUM(xq) AS BIGINT) AS s
               FROM xq GROUP BY 1),
         w AS (SELECT j, CAST(SUM(xq.xq * s.s) AS BIGINT) AS w
               FROM xq JOIN s USING (vec_id) GROUP BY 1),
         nm AS (SELECT SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                  AS DECIMAL(38,6))) AS nsq FROM w)
         SELECT j, w,
           ROUND(CAST(w AS DOUBLE) / sqrt(CAST(nsq AS DOUBLE)), 6)
             AS component
         FROM w, nm ORDER BY j"""



  /** DuckDB replay of [[graft.operators.EventAnalytics.absorptionTime]]
    * with the SAME fixed Jacobi iteration count unrolled as CTEs h1..hN
    * — generated so the Spark loop and the oracle can never disagree
    * on the iteration count silently. */
  private[graft] def absorptionOracle(iters: Int): String = {
    val hCtes = (1 to iters).map { i =>
      val prev = s"h${i - 1}"
      s"""h$i AS (SELECT st.cur,
            1.0 + COALESCE(SUM(CAST(qn.p * hp.h AS DECIMAL(28,12))), 0)
              AS h
          FROM states st
          LEFT JOIN qn ON qn.cur = st.cur
          LEFT JOIN $prev hp ON hp.cur = qn.nxt
          GROUP BY st.cur)"""
    }.mkString(",\n")
    s"""WITH seq AS (SELECT user_id, event_type, ts, event_id,
            LEAD(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS nxt
          FROM events),
        trans AS (SELECT event_type AS cur, nxt,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM seq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
          GROUP BY 1, 2),
        tot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS n_out FROM trans
          GROUP BY 1),
        p AS (SELECT trans.cur, nxt,
            CAST(c AS DOUBLE) / CAST(n_out AS DOUBLE) AS p
          FROM trans JOIN tot ON trans.cur = tot.cur),
        qn AS (SELECT * FROM p WHERE nxt <> 'purchase'),
        states AS (SELECT cur FROM tot),
        h0 AS (SELECT cur, 0.0 AS h FROM states),
        $hCtes,
        pabs AS (SELECT cur, p AS p_purchase FROM p
          WHERE nxt = 'purchase')
        SELECT st.cur AS state, tot.n_out,
          ROUND(COALESCE(pabs.p_purchase, 0.0), 6) AS p_purchase_1step,
          ROUND(hf.h, 6) AS expected_steps_12
        FROM states st JOIN tot ON st.cur = tot.cur
        JOIN h$iters hf ON hf.cur = st.cur
        LEFT JOIN pabs ON pabs.cur = st.cur
        ORDER BY state"""
  }

  /** DuckDB replay of the incremental MinHash dedup, parameterized by
    * increment: each `steps` entry is a predicate over `sx.sn` (the
    * incoming batch's source number) and `sy.sn` (the index side as it
    * stands when that increment arrives). One entry renders the classic
    * single-increment query; several entries render the GROWING-corpus
    * loop (`stream_sig_index_multi`): increment k dedups against corpus
    * plus every earlier increment, exactly what the streaming job's
    * per-batch index append produces. Shared relations (shingles, bands,
    * sizes) are MATERIALIZED once; per-step blocks only differ in the
    * candidate predicate. */
  /** Generated oracle for `sim_mmr_rerank`: the greedy selection
    * unrolls to k rounds of (remaining → redundancy-vs-selected →
    * argmax) CTEs — mechanical, so built here like
    * [[unigramOracleSql]]. Interpolated double literals (λ, 1−λ)
    * print Scala's exact double representation, which is the same
    * value the Spark side's `lit(1.0 - lambda)` computes. */
  private[graft] def mmrOracleSql(queryId: Long = 0L, nCand: Int = 20,
      k: Int = 10, lambda: Double = 0.7): String = {
    // bare numeric literals parse as DECIMAL in DuckDB and drag the
    // whole score into decimal arithmetic — force DOUBLE so the score
    // is the same IEEE expression Spark evaluates
    val lam = s"CAST($lambda AS DOUBLE)"
    val oml = s"CAST(${1.0 - lambda} AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings
           WHERE vec_id = $queryId),
         cand AS MATERIALIZED (SELECT vec_id, embedding, rel FROM (
             SELECT e.vec_id, e.embedding,
               list_cosine_similarity(e.embedding, q.q_emb) AS rel,
               ROW_NUMBER() OVER (ORDER BY
                 list_cosine_similarity(e.embedding, q.q_emb) DESC,
                 e.vec_id) AS rn
             FROM embeddings e, q WHERE e.vec_id <> $queryId) z
           WHERE rn <= $nCand),
         pairs AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
             list_cosine_similarity(a.embedding, b.embedding) AS psim
           FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         pick_1 AS MATERIALIZED (SELECT 1 AS mmr_rank, vec_id, rel,
             CAST(NULL AS DOUBLE) AS msim,
             $lam * rel - $oml * 0.0 AS score
           FROM cand ORDER BY $lam * rel - $oml * 0.0 DESC, vec_id
           LIMIT 1),
         sel_1 AS (SELECT vec_id FROM pick_1),
"""
    for (t <- 2 to k) {
      sb ++= s"""rem_$t AS (SELECT c.vec_id, c.rel FROM cand c
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel_${t - 1})),
         red_$t AS (SELECT r.vec_id, r.rel, MAX(p.psim) AS msim
           FROM rem_$t r LEFT JOIN (SELECT p0.a, p0.psim FROM pairs p0
             JOIN sel_${t - 1} s ON p0.b = s.vec_id) p
             ON p.a = r.vec_id
           GROUP BY 1, 2),
         pick_$t AS MATERIALIZED (SELECT $t AS mmr_rank, vec_id, rel,
             msim, $lam * rel - $oml * COALESCE(msim, 0.0) AS score
           FROM red_$t ORDER BY score DESC, vec_id LIMIT 1),
         sel_$t AS (SELECT vec_id FROM sel_${t - 1}
           UNION ALL SELECT vec_id FROM pick_$t),
"""
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= "\n" + (1 to k).map(t =>
      s"""SELECT CAST(mmr_rank AS BIGINT) AS mmr_rank, vec_id,
          ROUND(CAST(rel AS DOUBLE), 6) AS relevance,
          ROUND(CAST(msim AS DOUBLE), 6) AS max_sim_selected,
          ROUND(score, 6) AS mmr_score FROM pick_$t""")
      .mkString(" UNION ALL ")
    sb ++= " ORDER BY mmr_rank"
    sb.toString
  }

  /** Generated oracle for `text_unigram_tokenizer`: the hard-EM
    * Viterbi DP unrolls to `maxLen` levels per round and the
    * backpointer walk to `maxLen` steps — mechanical CTE chains, so
    * the SQL is BUILT here (the [[incrementalMinhashOracleSql]]
    * discipline) instead of hand-maintained. Every level CTE is
    * MATERIALIZED: DuckDB inlines re-referenced CTEs, and dp level i
    * references levels i−4..i−1 — un-materialized, the chain
    * re-evaluates combinatorially (the same reason the Spark side
    * localCheckpoints each level). */
  /** One trainer EM round's CTE chain (shared by both generated
    * unigram oracles): Viterbi DP levels, backpointer walk, usage
    * census, stats row. */
  private[graft] def unigramDpChainSql(r: Int, vsName: String, maxLen: Int,
      maxPiece: Int): String = {
    val sb = new StringBuilder
    sb ++= s"dp${r}_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM words),\n"
    for (i <- 1 to maxLen) {
      val lo = math.max(0, i - maxPiece)
      val prevUnion = (lo until i)
        .map(j => s"SELECT * FROM dp${r}_$j").mkString(" UNION ALL ")
      sb ++= s"""dp${r}_$i AS MATERIALIZED (SELECT w, $i AS pos,
          CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
          SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
            ROW_NUMBER() OVER (PARTITION BY vs.w
              ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
          FROM $vsName vs JOIN ($prevUnion) d
            ON vs.w = d.w AND vs.j = d.pos
          WHERE vs.i = $i) z WHERE rn = 1),\n"""
    }
    sb ++= s"dpall$r AS MATERIALIZED (" + (0 to maxLen)
      .map(i => s"SELECT * FROM dp${r}_$i").mkString(" UNION ALL ") +
      "),\n"
    sb ++= s"""fin$r AS MATERIALIZED (SELECT d.w, words.f, words.len,
        d.dp FROM dpall$r d
        JOIN words ON d.w = words.w AND d.pos = words.len),\n"""
    sb ++= s"wk${r}_0 AS MATERIALIZED (SELECT w, f, len AS pos " +
      s"FROM fin$r),\n"
    for (t <- 1 to maxLen) {
      val prev = if (t == 1) s"wk${r}_0"
        else s"(SELECT w, f, bp AS pos FROM wk${r}_${t - 1})"
      sb ++= s"""wk${r}_$t AS MATERIALIZED (SELECT k.w, k.f, d.bp,
          d.pos FROM $prev k
          JOIN dpall$r d ON k.w = d.w AND k.pos = d.pos
          WHERE k.pos > 0),\n"""
    }
    sb ++= s"pieces$r AS MATERIALIZED (" + (1 to maxLen)
      .map(t => s"SELECT w, f, bp AS j, pos AS i FROM wk${r}_$t")
      .mkString(" UNION ALL ") + "),\n"
    sb ++= s"""usage$r AS MATERIALIZED (SELECT
        substr(w, j + 1, i - j) AS piece,
        CAST(SUM(f) AS BIGINT) AS u FROM pieces$r GROUP BY 1),\n"""
    sb ++= s"""stats$r AS (SELECT CAST(COUNT(*) AS BIGINT)
        AS n_word_types, CAST(SUM(f) AS BIGINT) AS n_tokens,
        SUM(CAST(dp * f AS DECIMAL(38,12))) AS nll_sum
        FROM fin$r),\n"""
    sb ++= s"pc$r AS (SELECT CAST(SUM(f) AS BIGINT) AS n_pieces " +
      s"FROM pieces$r),\n"
    sb ++= s"""top$r AS (SELECT piece AS top_piece,
        u AS top_piece_count FROM (SELECT *, ROW_NUMBER()
          OVER (ORDER BY u DESC, piece) AS rk
        FROM usage$r WHERE length(piece) > 1) z WHERE rk = 1),\n"""
    sb.toString
  }

  /** The trainer PREFIX both generated unigram oracles share: train
    * words + span lattice + seed vocabulary/costs, EM round 1, and
    * the re-estimated round-1 vocabulary costs (`cost1`) — the frozen
    * artifact `stream_unigram_encode` applies. Emitted WITHOUT the
    * leading WITH so each generator appends its own tail. */
  private[graft] def unigramTrainPrefixSql(maxLen: Int, maxPiece: Int,
      v0: Int, vKeep: Int): String =
    s"""words AS MATERIALIZED (SELECT w,
           CAST(COUNT(*) AS BIGINT) AS f, length(w) AS len FROM (
           SELECT lower(t) AS w FROM (
             SELECT unnest(string_split(text, ' ')) AS t
             FROM documents WHERE doc_id % 2 = 0) z
           WHERE regexp_matches(lower(t), '^[a-z]+$$')
             AND length(t) <= $maxLen) zz
         GROUP BY 1),
       spans AS MATERIALIZED (SELECT w, f, st - 1 AS j,
           st + pl - 1 AS i, substr(w, CAST(st AS INT),
             CAST(pl AS INT)) AS piece
         FROM words, range(1, ${maxLen + 1}) s(st),
           range(1, ${maxPiece + 1}) p(pl)
         WHERE st + pl - 1 <= len),
       c0 AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS c
         FROM spans GROUP BY 1),
       vocab0 AS MATERIALIZED (SELECT piece, MAX(c) AS c FROM (
           SELECT piece, c FROM (SELECT *, ROW_NUMBER()
               OVER (ORDER BY c DESC, piece) AS rk FROM c0) z
             WHERE rk <= $v0
           UNION ALL SELECT piece, c FROM c0
             WHERE length(piece) = 1) m GROUP BY 1),
       t0 AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab0),
       cost0 AS MATERIALIZED (SELECT piece,
           CAST(-ln(CAST(c AS DOUBLE) / t) AS DECIMAL(28,12)) AS cost
         FROM vocab0, t0),
       vs1 AS MATERIALIZED (SELECT s.w, s.f, s.j, s.i, cost
         FROM spans s JOIN cost0 USING (piece)),
       ${unigramDpChainSql(1, "vs1", maxLen, maxPiece)}
       vocab1 AS MATERIALIZED (SELECT piece, MAX(u) AS u FROM (
           SELECT piece, u FROM (SELECT *, ROW_NUMBER()
               OVER (ORDER BY u DESC, piece) AS rk FROM usage1) z
             WHERE rk <= $vKeep
           UNION ALL SELECT v.piece, COALESCE(u1.u, 0)
             FROM vocab0 v LEFT JOIN usage1 u1 USING (piece)
             WHERE length(v.piece) = 1) m GROUP BY 1),
       t1 AS (SELECT CAST(SUM(u + 1) AS BIGINT) AS t FROM vocab1),
       cost1 AS MATERIALIZED (SELECT piece,
           CAST(-ln(CAST(u + 1 AS DOUBLE) / t) AS DECIMAL(28,12))
             AS cost
         FROM vocab1, t1),"""

  /** Generated oracle for `text_unigram_tokenizer`: trainer prefix +
    * EM round 2 + the two stats rows. */
  private[graft] def unigramOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String =
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       vs2 AS MATERIALIZED (SELECT s.w, s.f, s.j, s.i, cost
         FROM spans s JOIN cost1 USING (piece)),
       ${unigramDpChainSql(2, "vs2", maxLen, maxPiece)}
       v0sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size
         FROM cost0),
       v1sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size
         FROM cost1),
       row1 AS (SELECT CAST(1 AS BIGINT) AS em_round, vocab_size,
           n_word_types, n_tokens, n_pieces,
           ROUND(CAST(n_pieces AS DOUBLE) / n_tokens, 6)
             AS pieces_per_token,
           ROUND(CAST(nll_sum AS DOUBLE) / n_tokens, 6)
             AS nll_per_token,
           top_piece, top_piece_count
         FROM v0sz, stats1, pc1, top1),
       row2 AS (SELECT CAST(2 AS BIGINT) AS em_round, vocab_size,
           n_word_types, n_tokens, n_pieces,
           ROUND(CAST(n_pieces AS DOUBLE) / n_tokens, 6)
             AS pieces_per_token,
           ROUND(CAST(nll_sum AS DOUBLE) / n_tokens, 6)
             AS nll_per_token,
           top_piece, top_piece_count
         FROM v1sz, stats2, pc2, top2)
       SELECT * FROM row1 UNION ALL SELECT * FROM row2
       ORDER BY em_round"""

  /** Generated oracle for `stream_unigram_encode`: the SAME trainer
    * prefix (so the frozen `cost1` can never drift from the trainer's),
    * then each staged increment's word types Viterbi-encoded against
    * cost1 — DP levels, backpointer walk to a per-word piece count,
    * per-(increment, lang) census with OOV accounting — plus the fold
    * row (increment 0 = sums re-divided). */
  private[graft] def streamUnigramEncodeOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String = {
    def incChain(k: Int, pred: String): String = {
      val sb = new StringBuilder
      sb ++= s"""lw$k AS MATERIALIZED (SELECT lang, w,
          CAST(COUNT(*) AS BIGINT) AS occ FROM (
          SELECT lang, lower(t) AS w FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS t
            FROM documents WHERE $pred) z
          WHERE regexp_matches(lower(t), '^[a-z]+$$')
            AND length(t) <= $maxLen) zz
        GROUP BY 1, 2),\n"""
      sb ++= s"""ty$k AS MATERIALIZED (SELECT w, length(w) AS len
        FROM (SELECT DISTINCT w FROM lw$k) d),\n"""
      sb ++= s"""sp$k AS MATERIALIZED (SELECT w, st - 1 AS j,
          st + pl - 1 AS i,
          substr(w, CAST(st AS INT), CAST(pl AS INT)) AS piece
        FROM ty$k, range(1, ${maxLen + 1}) s(st),
          range(1, ${maxPiece + 1}) p(pl)
        WHERE st + pl - 1 <= len),\n"""
      sb ++= s"""vsi$k AS MATERIALIZED (SELECT s.w, s.j, s.i, cost
        FROM sp$k s JOIN cost1 USING (piece)),\n"""
      sb ++= s"idp${k}_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
        s"CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM ty$k),\n"
      for (i <- 1 to maxLen) {
        val lo = math.max(0, i - maxPiece)
        val prevUnion = (lo until i)
          .map(j => s"SELECT * FROM idp${k}_$j").mkString(" UNION ALL ")
        sb ++= s"""idp${k}_$i AS MATERIALIZED (SELECT w, $i AS pos,
            CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
            SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
              ROW_NUMBER() OVER (PARTITION BY vs.w
                ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
            FROM vsi$k vs JOIN ($prevUnion) d
              ON vs.w = d.w AND vs.j = d.pos
            WHERE vs.i = $i) z WHERE rn = 1),\n"""
      }
      sb ++= s"idpall$k AS MATERIALIZED (" + (0 to maxLen)
        .map(i => s"SELECT * FROM idp${k}_$i").mkString(" UNION ALL ") +
        "),\n"
      sb ++= s"""ifin$k AS MATERIALIZED (SELECT d.w, t.len, d.dp
        FROM idpall$k d
        JOIN ty$k t ON d.w = t.w AND d.pos = t.len),\n"""
      sb ++= s"iwk${k}_0 AS MATERIALIZED (SELECT w, len AS pos " +
        s"FROM ifin$k),\n"
      for (t <- 1 to maxLen) {
        val prev = if (t == 1) s"iwk${k}_0"
          else s"(SELECT w, bp AS pos FROM iwk${k}_${t - 1})"
        sb ++= s"""iwk${k}_$t AS MATERIALIZED (SELECT k.w, d.bp
          FROM $prev k
          JOIN idpall$k d ON k.w = d.w AND k.pos = d.pos
          WHERE k.pos > 0),\n"""
      }
      sb ++= s"inp$k AS MATERIALIZED (SELECT w, " +
        "CAST(COUNT(*) AS BIGINT) AS n_pieces FROM (" +
        (1 to maxLen).map(t => s"SELECT w FROM iwk${k}_$t")
          .mkString(" UNION ALL ") + ") u GROUP BY 1),\n"
      sb ++= s"""iseg$k AS MATERIALIZED (SELECT f.w, f.dp, n.n_pieces
        FROM ifin$k f JOIN inp$k n ON f.w = n.w),\n"""
      sb ++= s"""cen$k AS (SELECT CAST($k AS BIGINT) AS increment,
          lang, CAST(SUM(occ) AS BIGINT) AS total_words,
          CAST(SUM(CASE WHEN s.w IS NULL THEN occ ELSE 0 END)
            AS BIGINT) AS oov_words,
          CAST(SUM(CASE WHEN s.w IS NULL THEN 0
            ELSE occ * n_pieces END) AS BIGINT) AS total_pieces,
          SUM(CASE WHEN s.w IS NULL THEN NULL
            ELSE CAST(dp * occ AS DECIMAL(38,12)) END) AS nll_sum
        FROM lw$k l LEFT JOIN iseg$k s ON l.w = s.w GROUP BY 2),\n"""
      sb.toString
    }
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       ${incChain(1, "doc_id % 4 = 1")}
       ${incChain(2, "doc_id % 4 = 3")}
       per AS (SELECT * FROM cen1 UNION ALL SELECT * FROM cen2),
       fold AS (SELECT CAST(0 AS BIGINT) AS increment, lang,
           CAST(SUM(total_words) AS BIGINT) AS total_words,
           CAST(SUM(oov_words) AS BIGINT) AS oov_words,
           CAST(SUM(total_pieces) AS BIGINT) AS total_pieces,
           SUM(nll_sum) AS nll_sum
         FROM per GROUP BY 2),
       allr AS (SELECT * FROM per UNION ALL SELECT * FROM fold)
       SELECT increment, lang, total_words, oov_words, total_pieces,
         CASE WHEN total_words > oov_words THEN
           ROUND(CAST(total_pieces AS DOUBLE)
             / CAST(total_words - oov_words AS DOUBLE), 6)
         END AS pieces_per_word,
         CASE WHEN total_words > oov_words THEN
           ROUND(CAST(nll_sum AS DOUBLE)
             / CAST(total_words - oov_words AS DOUBLE), 6)
         END AS nll_per_word
       FROM allr ORDER BY increment, lang"""
  }

  /** Generated oracle for `sim_beam_search`: the greedy-search oracle's
    * label-blocked k-NN/entry/truth CTEs, then per beam width an
    * unrolled frontier chain (candidates = beam ∪ neighbors minus the
    * query, scored, top-b per label) and the explored-set recall fold —
    * generated so the hop bodies cannot drift from the Spark loop. */
  private[graft] def beamSearchOracleSql(kEdges: Int = 3, hops: Int = 4,
      beams: Seq[Int] = Seq(1, 2, 4), kTruth: Int = 10): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH directed AS (SELECT a.label, a.vec_id AS v1,
           b.vec_id AS v2,
           list_cosine_similarity(a.embedding, b.embedding) AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id <> b.vec_id),
       knn AS (SELECT label, v1, v2 FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
             ORDER BY sim DESC, v2) AS rk FROM directed) r
         WHERE rk <= $kEdges),
       sym AS MATERIALIZED (SELECT DISTINCT label, v1 AS node,
           v2 AS nxt FROM (
           SELECT label, v1, v2 FROM knn
           UNION ALL SELECT label, v2, v1 FROM knn) u),
       q AS (SELECT label, MIN(vec_id) AS qid, MAX(vec_id) AS entry
         FROM embeddings GROUP BY 1),
       qe AS MATERIALIZED (SELECT q.label, q.qid, q.entry,
           e.embedding AS q_emb
         FROM q JOIN embeddings e ON e.vec_id = q.qid),
       truth AS MATERIALIZED (SELECT label, cid, bsim, rk FROM (
           SELECT qe.label, e.vec_id AS cid,
             list_cosine_similarity(e.embedding, qe.q_emb) AS bsim,
             ROW_NUMBER() OVER (PARTITION BY qe.label ORDER BY
               list_cosine_similarity(e.embedding, qe.q_emb) DESC,
               e.vec_id) AS rk
           FROM embeddings e JOIN qe ON qe.label = e.label
           WHERE e.vec_id <> qe.qid) z WHERE rk <= $kTruth),
       tn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_truth
         FROM truth GROUP BY 1),
       nn AS (SELECT label, bsim AS nn_sim FROM truth WHERE rk = 1),
       s0 AS MATERIALIZED (SELECT qe.label, qe.entry AS node,
           list_cosine_similarity(e.embedding, qe.q_emb) AS sim
         FROM qe JOIN embeddings e ON e.vec_id = qe.entry),
"""
    for (b <- beams) {
      sb ++= s"sb${b}_0 AS (SELECT label, node, sim FROM s0),\n"
      for (h <- 1 to hops) {
        sb ++= s"""cb${b}_$h AS (SELECT DISTINCT c.label, c.node FROM (
            SELECT label, node FROM sb${b}_${h - 1}
            UNION ALL
            SELECT s.label, y.nxt AS node FROM sb${b}_${h - 1} s
              JOIN sym y ON y.label = s.label AND y.node = s.node) c
          JOIN qe ON qe.label = c.label WHERE c.node <> qe.qid),
         scb${b}_$h AS MATERIALIZED (SELECT c.label, c.node,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM cb${b}_$h c JOIN embeddings e ON e.vec_id = c.node
           JOIN qe ON qe.label = c.label),
         sb${b}_$h AS MATERIALIZED (SELECT label, node, sim FROM (
             SELECT label, node, sim, ROW_NUMBER() OVER (
               PARTITION BY label ORDER BY sim DESC, node) AS rk
             FROM scb${b}_$h) z WHERE rk <= $b),
"""
      }
      val exUnion = (s"SELECT label, node FROM sb${b}_0" +:
        (1 to hops).map(h => s"SELECT label, node FROM scb${b}_$h"))
        .mkString(" UNION ALL ")
      sb ++= s"""exb$b AS MATERIALIZED (SELECT DISTINCT label, node
           FROM ($exUnion) u),
         nxb$b AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_explored
           FROM exb$b GROUP BY 1),
         htb$b AS (SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_hit,
             CAST(MAX(CASE WHEN t.rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS got_nn
           FROM exb$b e JOIN truth t ON t.label = e.label
             AND t.cid = e.node GROUP BY 1),
         bsb$b AS (SELECT label, MAX(sim) AS best_sim
           FROM sb${b}_$hops GROUP BY 1),
         finb$b AS (SELECT CAST($b AS BIGINT) AS beam, n.label,
             n.n_explored, tn.n_truth,
             COALESCE(h.n_hit, 0) AS n_hit,
             ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
               / CAST(tn.n_truth AS DOUBLE), 4) AS recall,
             ROUND(CAST(b2.best_sim AS DOUBLE), 4) AS best_sim,
             ROUND(CAST(nn.nn_sim AS DOUBLE), 4) AS nn_sim,
             COALESCE(h.got_nn, 0) = 1 AS reached_nn
           FROM nxb$b n JOIN bsb$b b2 USING (label)
           LEFT JOIN htb$b h USING (label)
           JOIN tn USING (label) JOIN nn USING (label)),
"""
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= "\n" + beams.map(b => s"SELECT * FROM finb$b")
      .mkString(" UNION ALL ")
    sb ++= " ORDER BY beam, label"
    sb.toString
  }

  /** Corpus-wide eval chain shared by the tokenizer-eval oracles
    * (`text_tokenizer_fertility`, `text_wordpiece_greedy`): the
    * (lang, word, occ) eval grain, its distinct types + span lattice
    * joined to the frozen `cost1`, and the unrolled Viterbi DP +
    * backpointer walk down to per-word piece counts (`enp`) and final
    * costs (`efin`). Ends with a trailing comma. */
  private[graft] def evalViterbiChainSql(maxLen: Int, maxPiece: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""ew AS MATERIALIZED (SELECT lang, w,
        CAST(COUNT(*) AS BIGINT) AS occ FROM (
        SELECT lang, lower(t) AS w FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS t
          FROM documents) z
        WHERE regexp_matches(lower(t), '^[a-z]+$$')
          AND length(t) <= $maxLen) zz
      GROUP BY 1, 2),\n"""
    sb ++= "ety AS MATERIALIZED (SELECT w, length(w) AS len " +
      "FROM (SELECT DISTINCT w FROM ew) d),\n"
    sb ++= s"""esp AS MATERIALIZED (SELECT w, st - 1 AS j,
        st + pl - 1 AS i,
        substr(w, CAST(st AS INT), CAST(pl AS INT)) AS piece
      FROM ety, range(1, ${maxLen + 1}) s(st),
        range(1, ${maxPiece + 1}) p(pl)
      WHERE st + pl - 1 <= len),\n"""
    sb ++= "evsi AS MATERIALIZED (SELECT s.w, s.j, s.i, cost " +
      "FROM esp s JOIN cost1 USING (piece)),\n"
    sb ++= "edp_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM ety),\n"
    for (i <- 1 to maxLen) {
      val lo = math.max(0, i - maxPiece)
      val prevUnion = (lo until i)
        .map(j => s"SELECT * FROM edp_$j").mkString(" UNION ALL ")
      sb ++= s"""edp_$i AS MATERIALIZED (SELECT w, $i AS pos,
          CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
          SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
            ROW_NUMBER() OVER (PARTITION BY vs.w
              ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
          FROM evsi vs JOIN ($prevUnion) d
            ON vs.w = d.w AND vs.j = d.pos
          WHERE vs.i = $i) z WHERE rn = 1),\n"""
    }
    sb ++= "edpall AS MATERIALIZED (" + (0 to maxLen)
      .map(i => s"SELECT * FROM edp_$i").mkString(" UNION ALL ") +
      "),\n"
    sb ++= """efin AS MATERIALIZED (SELECT d.w, t.len, d.dp
      FROM edpall d
      JOIN ety t ON d.w = t.w AND d.pos = t.len),
"""
    sb ++= "ewk_0 AS MATERIALIZED (SELECT w, len AS pos FROM efin),\n"
    for (t <- 1 to maxLen) {
      val prev = if (t == 1) "ewk_0"
        else s"(SELECT w, bp AS pos FROM ewk_${t - 1})"
      sb ++= s"""ewk_$t AS MATERIALIZED (SELECT k.w, d.bp
        FROM $prev k
        JOIN edpall d ON k.w = d.w AND k.pos = d.pos
        WHERE k.pos > 0),\n"""
    }
    sb ++= "enp AS MATERIALIZED (SELECT w, " +
      "CAST(COUNT(*) AS BIGINT) AS n_pieces FROM (" +
      (1 to maxLen).map(t => s"SELECT w FROM ewk_$t")
        .mkString(" UNION ALL ") + ") u GROUP BY 1),\n"
    sb.toString
  }

  /** Generated oracle for `text_tokenizer_fertility`: the BPE
    * trainer's CTE chain ([[bpeMergeCtes]], its word-census CTE named
    * `bwords` via the builder's parameter — no post-hoc string surgery
    * — to coexist with the unigram trainer prefix's `words`) + the
    * unigram frozen-cost prefix ([[unigramTrainPrefixSql]]) + ONE eval
    * Viterbi chain over the corpus-wide eval types + the two per-arm
    * censuses. */
  private[graft] def fertilityOracleSql(rounds: Int = 6,
      maxLen: Int = 10, maxPiece: Int = 4, v0: Int = 300,
      vKeep: Int = 200): String = {
    val bpeCtes = bpeMergeCtes(rounds, wordsCte = "bwords")
    val sb = new StringBuilder
    sb ++= evalViterbiChainSql(maxLen, maxPiece)
    sb ++= s"""bnp AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
      FROM syms_$rounds GROUP BY w),\n"""
    def cen(arm: String, npCte: String): String =
      s"""(SELECT '$arm' AS arm, lang,
          CAST(SUM(occ) AS BIGINT) AS total_words,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0 ELSE occ END)
            AS BIGINT) AS covered_words,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0
            ELSE occ * n.n_pieces END) AS BIGINT) AS total_pieces,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0
            ELSE occ * length(l.w) END) AS BIGINT) AS total_chars
        FROM ew l LEFT JOIN $npCte n ON l.w = n.w GROUP BY 2)"""
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       $bpeCtes,
       ${sb.toString}
       cens AS (SELECT * FROM ${cen("bpe", "bnp")}
         UNION ALL SELECT * FROM ${cen("unigram", "enp")})
       SELECT arm, lang, total_words, covered_words, total_pieces,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(total_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS pieces_per_word,
         CASE WHEN total_pieces > 0 THEN
           ROUND(CAST(total_chars AS DOUBLE)
             / CAST(total_pieces AS DOUBLE), 6) END AS chars_per_piece
       FROM cens ORDER BY arm, lang"""
  }

  /** Generated oracle for `text_wordpiece_greedy`: the unigram
    * frozen-cost prefix + the shared eval Viterbi chain
    * ([[evalViterbiChainSql]]) + an unrolled greedy longest-match walk
    * (per step: argmax span end per active word, piece cost joined
    * back) + the per-language two-arm census. */
  private[graft] def wordpieceOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String = {
    val sb = new StringBuilder
    sb ++= evalViterbiChainSql(maxLen, maxPiece)
    sb ++= "g_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS BIGINT) AS np, CAST(0 AS DECIMAL(28,12)) AS cost " +
      "FROM ety),\n"
    for (i <- 1 to maxLen) {
      sb ++= s"""ga_$i AS (SELECT z.w, z.pos, z.np, z.cost, z.ni,
          v2.cost AS pc FROM (
          SELECT s.w, s.pos, s.np, s.cost, MAX(v.i) AS ni
          FROM g_${i - 1} s JOIN evsi v ON v.w = s.w AND v.j = s.pos
          GROUP BY 1, 2, 3, 4) z
        JOIN evsi v2 ON v2.w = z.w AND v2.j = z.pos AND v2.i = z.ni),
       g_$i AS MATERIALIZED (SELECT w, ni AS pos,
          CAST(np + 1 AS BIGINT) AS np,
          CAST(cost + pc AS DECIMAL(28,12)) AS cost FROM ga_$i),
"""
    }
    val finUnion = (1 to maxLen).map(i =>
      s"""SELECT g.w, g.np, g.cost FROM g_$i g
          JOIN ety t ON g.w = t.w AND g.pos = t.len""")
      .mkString(" UNION ALL ")
    sb ++= s"gfin AS MATERIALIZED ($finUnion),\n"
    sb ++= """cens AS (SELECT lang,
        CAST(SUM(occ) AS BIGINT) AS total_words,
        CAST(SUM(CASE WHEN g.w IS NULL THEN 0 ELSE occ END)
          AS BIGINT) AS covered_words,
        CAST(SUM(CASE WHEN g.w IS NULL THEN 0 ELSE occ * g.np END)
          AS BIGINT) AS greedy_pieces,
        CAST(SUM(CASE WHEN n.w IS NULL THEN 0
          ELSE occ * n.n_pieces END) AS BIGINT) AS viterbi_pieces,
        CAST(SUM(CASE WHEN g.w IS NOT NULL AND g.cost > f.dp
          THEN occ ELSE 0 END) AS BIGINT) AS suboptimal_words,
        SUM(CASE WHEN g.w IS NOT NULL
          THEN CAST((g.cost - f.dp) * occ AS DECIMAL(38,12)) END)
          AS excess_sum
      FROM ew l LEFT JOIN gfin g ON l.w = g.w
      LEFT JOIN enp n ON l.w = n.w
      LEFT JOIN efin f ON l.w = f.w
      GROUP BY 1)
"""
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       ${sb.toString}
       SELECT lang, total_words, covered_words, greedy_pieces,
         viterbi_pieces, suboptimal_words,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(greedy_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS greedy_ppw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(viterbi_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS viterbi_ppw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(excess_sum AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS excess_nll_pw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(suboptimal_words AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END
           AS suboptimal_share
       FROM cens ORDER BY lang"""
  }

  private[graft] def incrementalMinhashOracleSql(steps: Seq[String]): String = {
    val base =
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         src AS MATERIALIZED (SELECT doc_id, CAST(substr(source, 4, 8) AS INT) AS sn
                 FROM documents),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS MATERIALIZED (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)"""
    val blocks = steps.zipWithIndex.map { case (pred, ix) =>
      val k = ix + 1
      s""",
         cand_$k AS (SELECT DISTINCT x.doc_id AS bd, y.doc_id AS cd
                  FROM bands x JOIN src sx ON x.doc_id = sx.doc_id
                       JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
                       JOIN src sy ON y.doc_id = sy.doc_id
                  WHERE $pred),
         inter_$k AS (SELECT c.bd, c.cd, COUNT(*) AS i
                   FROM cand_$k c JOIN sh a ON c.bd = a.doc_id
                               JOIN sh b ON c.cd = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         j_$k AS (SELECT x.bd, x.cd,
                 CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) AS jac
               FROM inter_$k x JOIN sizes s1 ON x.bd = s1.doc_id
                            JOIN sizes s2 ON x.cd = s2.doc_id
               WHERE CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) >= 0.5),
         sel_$k AS (SELECT bd AS doc_id, cd AS match_doc, ROUND(jac, 3) AS jaccard
           FROM (SELECT bd, cd, jac, ROW_NUMBER() OVER (PARTITION BY bd
                   ORDER BY jac DESC, cd) AS rn FROM j_$k) t_$k
           WHERE rn = 1)"""
    }.mkString
    val union = steps.indices.map(ix => s"SELECT * FROM sel_${ix + 1}")
      .mkString("\n UNION ALL\n")
    s"$base$blocks\n SELECT * FROM (\n$union\n ) u ORDER BY doc_id"
  }

  /** DuckDB replay of [[graft.operators.Similarity.kcenterCoreset]]:
    * greedy farthest-point traversal unrolled into k−1 chained CTE
    * blocks — p_i picks the point with the max running-min squared
    * distance (ties to the smallest vec_id), d_i folds the new center
    * into the running min via the exact-BIGINT n1 + n2 − 2·dot
    * expansion over micro-unit coordinates. Generated so k stays one
    * knob. */
  /** One synchronous Louvain gain-move round as a CTE block (prefix
    * `p`, over `symCte`/`commCte`, reading the shared `m2x` total):
    * the DuckDB replay of [[graft.operators.Graph]]'s louvainMove —
    * generated once, instantiated per level, so the two levels of
    * `graph_louvain_full` cannot drift apart. */
  private[graft] def louvainMoveSql(p: String, symCte: String,
      commCte: String): String =
    s"""${p}degn AS MATERIALIZED (SELECT node, SUM(w) AS ki
         FROM $symCte GROUP BY 1),
       ${p}degc AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS degw
         FROM ${p}degn d JOIN $commCte c USING (node) GROUP BY 1),
       ${p}kic AS MATERIALIZED (SELECT s.node, cb.community AS cand,
           SUM(s.w) AS kc
         FROM $symCte s JOIN $commCte cb ON s.nbr = cb.node
         WHERE s.nbr <> s.node GROUP BY 1, 2),
       ${p}base AS MATERIALIZED (SELECT c.node, c.community AS cur,
           d.ki, COALESCE(ka.kc, 0) AS kia, dca.degw AS dega
         FROM $commCte c JOIN ${p}degn d USING (node)
         LEFT JOIN ${p}kic ka ON ka.node = c.node
           AND ka.cand = c.community
         JOIN ${p}degc dca ON dca.community = c.community),
       ${p}gains AS MATERIALIZED (SELECT b.node, b.cur, k.cand,
           2.0 * (CAST(k.kc AS DOUBLE) - CAST(b.kia AS DOUBLE))
             / CAST(tw AS DOUBLE)
           - 2.0 * CAST(b.ki AS DOUBLE) * (CAST(b.ki AS DOUBLE)
               + CAST(dcb.degw AS DOUBLE) - CAST(b.dega AS DOUBLE))
             / (CAST(tw AS DOUBLE) * CAST(tw AS DOUBLE)) AS gain
         FROM ${p}base b JOIN ${p}kic k ON k.node = b.node
           AND k.cand <> b.cur
         JOIN ${p}degc dcb ON dcb.community = k.cand
         CROSS JOIN m2x),
       ${p}best AS MATERIALIZED (SELECT node, cand, gain FROM (
           SELECT node, cand, gain, ROW_NUMBER() OVER (
             PARTITION BY node ORDER BY gain DESC, cand) AS rn
           FROM ${p}gains) g WHERE rn = 1),
       ${p}comm2 AS MATERIALIZED (SELECT c.node,
           CASE WHEN bm.gain > 0 THEN bm.cand
                ELSE c.community END AS community,
           c.community AS cur
         FROM $commCte c LEFT JOIN ${p}best bm ON bm.node = c.node)"""

  /** Modularity Q of partition `commCte` over `symCte` as a 1-row CTE
    * `${p}q` (DECIMAL(28,12)-quantized per-community contributions,
    * summed) — the replay of louvainQCensus folded to its Q sum. */
  private[graft] def louvainQSql(p: String, symCte: String, commCte: String,
      degnCte: String): String =
    s"""${p}internal AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
         FROM $symCte s JOIN $commCte ca ON s.node = ca.node
         JOIN $commCte cb ON s.nbr = cb.node
         WHERE ca.community = cb.community GROUP BY 1),
       ${p}degcq AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS deg_w
         FROM $degnCte d JOIN $commCte c USING (node) GROUP BY 1),
       ${p}conts AS MATERIALIZED (SELECT dc.community,
           CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE) / CAST(tw AS DOUBLE)
             - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
             AS DECIMAL(28,12)) AS contrib
         FROM ${p}degcq dc LEFT JOIN ${p}internal i USING (community)
         CROSS JOIN m2x),
       ${p}q AS MATERIALIZED (SELECT SUM(contrib) AS q FROM ${p}conts)"""

  /** Generated oracle for `graph_louvain_full`: the graph_louvain
    * prelude (edges/sym/labelProp/comm), then per level ONE
    * instantiation of [[louvainMoveSql]] + two [[louvainQSql]] blocks
    * + a decimal-compare acceptance CTE; level 2 runs on the coarse
    * super-graph built from level 1's ACCEPTED partition. */
  /** Acceptance CTE shared by the Louvain level replays: keep the
    * moved partition only if realized Q did not fall. */
  private def louvainAcceptSql(p: String, movedCte: String): String =
    s"""${p}acc AS MATERIALIZED (SELECT c.node,
         CASE WHEN (SELECT q FROM ${p}mq) >= (SELECT q FROM ${p}sq)
           THEN c.community ELSE c.cur END AS community,
         c.cur
       FROM $movedCte c)"""

  /** One Louvain level's readout row (scalar subqueries over the
    * level's CTEs) — shared by the 2-level and convergence oracles. */
  private def louvainRowSql(lvl: Int, p: String, symCte: String,
      commCte: String): String =
    s"""SELECT CAST($lvl AS BIGINT) AS level,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM $commCte) AS n_nodes,
         (SELECT CAST(COUNT(DISTINCT community) AS BIGINT)
           FROM $commCte) AS n_communities_start,
         (SELECT CAST(COALESCE(SUM(CASE WHEN community <> cur
             THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ${p}acc)
           AS n_moved,
         (SELECT CAST(COUNT(DISTINCT community) AS BIGINT)
           FROM ${p}acc) AS n_communities_end,
         (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) FROM $symCte
           WHERE node = nbr) AS self_loop_w,
         ROUND((SELECT CAST(q AS DOUBLE) FROM ${p}sq), 6) AS q_start,
         ROUND((SELECT CAST(q AS DOUBLE) FROM ${p}mq), 6) AS q_move,
         ROUND(CAST(GREATEST((SELECT q FROM ${p}sq),
           (SELECT q FROM ${p}mq)) AS DOUBLE), 6) AS q_end"""

  /** The graph_louvain prelude: trade edges, symmetrized graph,
    * two-round label propagation, start partition, 2m scalar. */
  private def louvainPreludeSql: String =
    s"""edges AS MATERIALIZED (
         SELECT s_nationkey AS src, c_nationkey AS dst,
           SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
         FROM lineitem, orders, customer, supplier
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey
         GROUP BY 1, 2),
       sym AS MATERIALIZED (SELECT node, nbr, SUM(w) AS w FROM (
           SELECT src AS node, dst AS nbr, w FROM edges
           UNION ALL SELECT dst, src, w FROM edges) t
         GROUP BY 1, 2),
       tot AS MATERIALIZED (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
       nbrs AS MATERIALIZED (SELECT node, nbr, w FROM sym, tot
         WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
           >= CAST(tw AS HUGEINT)),
       l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
       a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
              FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
       lp1 AS (SELECT node, lbl FROM (
           SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
             ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
       a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
              FROM nbrs n JOIN lp1 l ON n.nbr = l.node GROUP BY 1, 2),
       lp2 AS (SELECT node, lbl FROM (
           SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
             ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
       nodes AS (SELECT DISTINCT node FROM sym),
       comm AS MATERIALIZED (SELECT n.node,
           COALESCE(l2.lbl, n.node) AS community
         FROM nodes n LEFT JOIN lp2 l2 ON n.node = l2.node),
       m2x AS MATERIALIZED (SELECT SUM(w) AS tw FROM sym)"""

  /** One Louvain level's CTE block (move + two Q sums + acceptance)
    * for level prefix `p` over `symCte`/`commCte`. */
  private def louvainLevelSql(p: String, symCte: String,
      commCte: String): String =
    s"""${louvainMoveSql(p, symCte, commCte)},
       ${louvainQSql(s"${p}s", symCte, commCte, s"${p}degn")},
       ${louvainQSql(s"${p}m", symCte, s"${p}comm2", s"${p}degn")},
       ${louvainAcceptSql(p, s"${p}comm2")}"""

  /** Coarsening CTEs: level `p`'s accepted partition contracted into
    * its community super-graph (internal mass as self-loops) plus the
    * next level's identity start partition. */
  private def louvainCoarsenSql(p: String, symCte: String,
      nextSym: String, nextComm: String): String =
    s"""$nextSym AS MATERIALIZED (SELECT ca.community AS node,
           cb.community AS nbr, SUM(s.w) AS w
         FROM $symCte s JOIN ${p}acc ca ON s.node = ca.node
         JOIN ${p}acc cb ON s.nbr = cb.node GROUP BY 1, 2),
       $nextComm AS MATERIALIZED (SELECT DISTINCT node,
           node AS community FROM $nextSym)"""

  private[graft] def louvainFullOracleSql: String =
    s"""WITH ${louvainPreludeSql},
       ${louvainLevelSql("l1", "sym", "comm")},
       ${louvainCoarsenSql("l1", "sym", "sym2", "comm20")},
       ${louvainLevelSql("l2", "sym2", "comm20")}
       SELECT * FROM (
       ${louvainRowSql(1, "l1", "sym", "comm")}
       UNION ALL
       ${louvainRowSql(2, "l2", "sym2", "comm20")}) r ORDER BY level"""

  /** Generated oracle for `graph_louvain_conv`: [[louvainFullOracleSql]]
    * extended to `maxLevels` unrolled levels with EXECUTION filters —
    * level k's row is emitted only while every earlier level accepted
    * at least one move (the Spark loop's convergence rule; the level
    * that accepts zero moves still executes and emits — its n_moved=0
    * row is the convergence certificate). Converged levels' surplus
    * CTEs still evaluate in DuckDB (|communities|²-bounded — cheap);
    * the filter only controls row emission, mirroring the driver loop
    * exactly. */
  private[graft] def louvainConvOracleSql(maxLevels: Int = 4): String = {
    def sym(k: Int) = if (k == 1) "sym" else s"sym$k"
    def comm(k: Int) = if (k == 1) "comm" else s"comm${k}0"
    val levels = (1 to maxLevels).map { k =>
      val lvl = louvainLevelSql(s"l$k", sym(k), comm(k))
      val co = if (k < maxLevels)
        ",\n       " + louvainCoarsenSql(s"l$k", sym(k), sym(k + 1), comm(k + 1))
      else ""
      lvl + co
    }.mkString(",\n       ")
    def movedCond(k: Int): String = (1 until k).map { j =>
      s"""(SELECT COALESCE(SUM(CASE WHEN community <> cur
           THEN 1 ELSE 0 END), 0) FROM l${j}acc) > 0"""
    }.mkString(" AND ")
    val rows = (1 to maxLevels).map { k =>
      val r = s"SELECT * FROM (${louvainRowSql(k, s"l$k", sym(k), comm(k))}) z$k"
      if (k == 1) r else s"$r WHERE ${movedCond(k)}"
    }.mkString("\n       UNION ALL ")
    s"""WITH ${louvainPreludeSql},
       $levels
       SELECT * FROM (
       $rows) r ORDER BY level"""
  }

  /** Generated oracle for `stream_hnsw_append`: the layered-HNSW
    * maintenance replayed UNROLLED — seed directed top-k lists over the
    * base stripe, then per increment the fresh-node lists plus the
    * re-prune of every stored list a fresh node enters, the
    * latest-version resolution, the from-scratch rebuild, the per-label
    * edge diff, and BOTH layered descents (maintained and rebuilt, 6
    * hops, the sim_hnsw_search shape). Every pair kernel is ONE scored
    * label-blocked relation with a 3-row VALUES layer axis, mirroring
    * the Spark side's literal-axis explode. */
  private[graft] def hnswAppendOracleSql(k: Int = 3): String = {
    // scored label-blocked pairs of two LEVELED node sets, all layers
    def pairsSql(p: String, aCte: String, bCte: String): String =
      s"""${p} AS MATERIALIZED (SELECT ll.l AS layer, a.label,
           a.vec_id AS v1, b.vec_id AS v2,
           list_cosine_similarity(a.embedding, b.embedding) AS sim
         FROM (VALUES (2), (1), (0)) ll(l)
         JOIN $aCte a ON a.level >= ll.l
         JOIN $bCte b ON b.label = a.label AND b.level >= ll.l
           AND b.vec_id <> a.vec_id)"""
    def topkSql(p: String, pairsCte: String): String =
      s"""$p AS MATERIALIZED (SELECT layer, label, v1, v2 FROM (
           SELECT layer, label, v1, v2, ROW_NUMBER() OVER (
             PARTITION BY layer, v1 ORDER BY sim DESC, v2) AS rk
           FROM $pairsCte) z WHERE rk <= $k)"""
    // one increment's maintenance: fresh lists + entered-list re-prune
    // + version resolution (stPrev -> stCur latest)
    def incSql(b: Int, priorCte: String, freshCte: String,
        allCte: String, prevLatest: String): String =
      s"""${pairsSql(s"fp$b", freshCte, allCte)},
         ${topkSql(s"fl$b", s"fp$b")},
         ${pairsSql(s"pp$b", priorCte, freshCte)},
         c${b}r AS MATERIALIZED (SELECT layer, label, v1, v2, isf,
             ROW_NUMBER() OVER (PARTITION BY layer, v1
               ORDER BY sim DESC, v2) AS rk
           FROM (
             SELECT s.layer, s.label, s.v1, s.v2,
               list_cosine_similarity(e1.embedding, e2.embedding)
                 AS sim, FALSE AS isf
             FROM $prevLatest s
             JOIN embeddings e1 ON e1.vec_id = s.v1
             JOIN embeddings e2 ON e2.vec_id = s.v2
             UNION ALL
             SELECT layer, label, v1, v2, sim, TRUE FROM pp$b) u),
         t$b AS (SELECT DISTINCT layer, v1 FROM c${b}r
           WHERE rk <= $k AND isf),
         wr$b AS (SELECT layer, label, v1, v2,
             CAST($b AS BIGINT) AS inc FROM fl$b
           UNION ALL
           SELECT c.layer, c.label, c.v1, c.v2, CAST($b AS BIGINT)
           FROM c${b}r c JOIN t$b USING (layer, v1) WHERE c.rk <= $k),
         st$b AS (SELECT * FROM st${b - 1} UNION ALL
           SELECT * FROM wr$b),
         st${b}m AS (SELECT layer, v1, MAX(inc) AS mi FROM st$b
           GROUP BY 1, 2),
         st${b}l AS MATERIALIZED (SELECT s.layer, s.label, s.v1, s.v2
           FROM st$b s JOIN st${b}m m ON s.layer = m.layer
             AND s.v1 = m.v1 AND s.inc = m.mi)"""
    // layered descent over an edge CTE, folded to final cursor +
    // explored recall inputs (the sim_hnsw_search six-hop shape)
    def descentSql(p: String, edgesCte: String): String = {
      val layers = Seq(2, 2, 1, 1, 0, 0)
      val steps = layers.zipWithIndex.map { case (l, i) =>
        val t = i + 1
        s"""${p}nb$t AS MATERIALIZED (SELECT s.label, s.qid,
             y.v2 AS cand,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM ${p}s${t - 1} s
           JOIN ${p}sy y ON y.layer = $l AND y.label = s.label
             AND y.v1 = s.cur
           JOIN embeddings e ON e.vec_id = y.v2
           JOIN qe ON qe.label = s.label
           WHERE y.v2 <> s.qid),
         ${p}s$t AS MATERIALIZED (SELECT label, qid, cand AS cur, sim
           FROM (SELECT c.label, c.qid, c.cand, c.sim,
               ROW_NUMBER() OVER (PARTITION BY c.label
                 ORDER BY c.sim DESC, c.cand) AS rk
             FROM (SELECT label, qid, cand, sim FROM ${p}nb$t
                   UNION ALL SELECT label, qid, cur, sim
                     FROM ${p}s${t - 1}) c) z WHERE rk = 1),
         ${p}x$t AS (SELECT label, cand FROM ${p}nb$t)"""
      }.mkString(",\n         ")
      val xu = (0 to 6).map(t => s"SELECT * FROM ${p}x$t")
        .mkString(" UNION ALL ")
      s"""${p}sy AS MATERIALIZED (SELECT DISTINCT layer, label, v1, v2
           FROM (SELECT layer, label, v1, v2 FROM $edgesCte
             UNION ALL SELECT layer, label, v2, v1 FROM $edgesCte) u),
         ${p}s0 AS (SELECT qe.label, qe.qid, entry.cur,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM qe JOIN entry ON entry.label = qe.label
           JOIN embeddings e ON e.vec_id = entry.cur),
         ${p}x0 AS (SELECT label, cur AS cand FROM ${p}s0),
         $steps,
         ${p}ex AS (SELECT DISTINCT label, cand FROM ($xu) xs),
         ${p}cn AS MATERIALIZED (SELECT x.label,
             CAST(COUNT(*) AS BIGINT) AS n_explored,
             CAST(SUM(CASE WHEN b.cid IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits
           FROM ${p}ex x LEFT JOIN brute b
             ON b.label = x.label AND b.cid = x.cand
           GROUP BY 1),
         ${p}fin AS MATERIALIZED (SELECT s.label, s.cur AS end_node,
             s.sim AS end_sim, c.n_explored, c.n_hits
           FROM ${p}s6 s JOIN ${p}cn c ON c.label = s.label)"""
    }
    s"""WITH lv AS MATERIALIZED (SELECT vec_id, label, embedding,
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
       bn AS MATERIALIZED (SELECT * FROM lv WHERE vec_id % 4 <> 3),
       f1 AS MATERIALIZED (SELECT * FROM lv WHERE vec_id % 8 = 3),
       f2 AS MATERIALIZED (SELECT * FROM lv WHERE vec_id % 8 = 7),
       n1 AS (SELECT * FROM bn UNION ALL SELECT * FROM f1),
       ${pairsSql("sp", "bn", "bn")},
       ${topkSql("sd", "sp")},
       st0 AS (SELECT layer, label, v1, v2, CAST(0 AS BIGINT) AS inc
         FROM sd),
       st0l AS (SELECT layer, label, v1, v2 FROM sd),
       ${incSql(1, "bn", "f1", "n1", "st0l")},
       ${incSql(2, "n1", "f2", "lv", "st1l")},
       ${pairsSql("rp", "lv", "lv")},
       ${topkSql("rb", "rp")},
       df AS MATERIALIZED (SELECT label,
           CAST(SUM(CASE WHEN in_m THEN 1 ELSE 0 END) AS BIGINT)
             AS edges_maintained,
           CAST(SUM(CASE WHEN in_r THEN 1 ELSE 0 END) AS BIGINT)
             AS edges_rebuild,
           CAST(SUM(CASE WHEN NOT in_m OR NOT in_r THEN 1 ELSE 0 END)
             AS BIGINT) AS edge_diff
         FROM (SELECT COALESCE(m.label, r.label) AS label,
             m.v1 IS NOT NULL AS in_m, r.v1 IS NOT NULL AS in_r
           FROM st2l m FULL OUTER JOIN rb r
             ON m.layer = r.layer AND m.label = r.label
               AND m.v1 = r.v1 AND m.v2 = r.v2) u
         GROUP BY 1),
       q AS (SELECT label, MIN(vec_id) AS qid FROM embeddings
         GROUP BY 1),
       qe AS MATERIALIZED (SELECT q.label, q.qid,
           e.embedding AS q_emb
         FROM q JOIN embeddings e ON e.vec_id = q.qid),
       entry AS MATERIALIZED (SELECT label, vec_id AS cur FROM (
           SELECT lv.label, lv.vec_id, ROW_NUMBER()
             OVER (PARTITION BY lv.label
               ORDER BY lv.level DESC, lv.vec_id) AS rk
           FROM lv JOIN q ON q.label = lv.label
           WHERE lv.vec_id <> q.qid) z WHERE rk = 1),
       brute AS MATERIALIZED (SELECT label, cid FROM (
           SELECT qe.label, c.vec_id AS cid, ROW_NUMBER()
             OVER (PARTITION BY qe.label ORDER BY
               list_cosine_similarity(c.embedding, qe.q_emb) DESC,
               c.vec_id) AS rk
           FROM qe JOIN embeddings c ON c.label = qe.label
           WHERE c.vec_id <> qe.qid) z WHERE rk <= 10),
       ${descentSql("m", "st2l")},
       ${descentSql("r", "rb")},
       ct AS (SELECT label,
           CAST(SUM(CASE WHEN vec_id % 4 <> 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN vec_id % 8 = 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_inc1,
           CAST(SUM(CASE WHEN vec_id % 8 = 7 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_inc2
         FROM embeddings GROUP BY 1)
       SELECT ct.label, ct.n_base, ct.n_inc1, ct.n_inc2,
         df.edges_maintained, df.edges_rebuild, df.edge_diff,
         m.end_node AS end_m,
         ROUND(CAST(m.end_sim AS DOUBLE), 4) AS end_sim,
         m.n_explored,
         ROUND(CAST(m.n_hits AS DOUBLE) / 10.0, 4) AS recall_at_10,
         (m.end_node = r.end_node AND m.n_hits = r.n_hits)
           AS agrees_rebuild
       FROM ct JOIN df USING (label)
       JOIN mfin m ON m.label = ct.label
       JOIN rfin r ON r.label = ct.label
       ORDER BY ct.label"""
  }

  /** Generated oracle for `sim_pq_train`: the exact integer-Lloyd PQ
    * pass of [[graft.operators.Similarity.pqTrainDistortion]] — ONE
    * assignment CTE block instantiated for the seed and the trained
    * codebook, the round-half-up integer mean via the same positive
    * shift, and the per-subspace distortion census. */
  private[graft] def pqTrainOracleSql(m: Int = 16, sub: Int = 4,
      k: Int = 64, off: Long = 16000000L): String = {
    def assignSql(p: String, cb: String): String =
      s"""${p}pair AS (SELECT l.vec_id, l.m, c.cid,
           SUM((l.v - c.w) * (l.v - c.w)) AS dist
         FROM lanes l JOIN $cb c ON l.m = c.m AND l.d = c.d
         GROUP BY 1, 2, 3),
       ${p}asg AS MATERIALIZED (SELECT vec_id, m, cid, dist FROM (
           SELECT vec_id, m, cid, dist, ROW_NUMBER() OVER (
             PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
           FROM ${p}pair) z WHERE rn = 1),
       ${p}dm AS MATERIALIZED (SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(dist AS DECIMAL(38,0))) AS sd
         FROM ${p}asg GROUP BY 1)"""
    s"""WITH qe AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
         FROM embeddings),
       lanes AS MATERIALIZED (SELECT vec_id,
           CAST((i - 1) // $sub AS INT) AS m,
           CAST((i - 1) % $sub AS INT) AS d, v
         FROM (SELECT vec_id, unnest(qe) AS v,
             generate_subscripts(qe, 1) AS i FROM qe) z),
       sd AS MATERIALIZED (SELECT vec_id,
           CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid
         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id
               LIMIT $k) s),
       cb0 AS MATERIALIZED (SELECT l.m, s.cid, l.d, l.v AS w
         FROM lanes l JOIN sd s USING (vec_id)),
       ${assignSql("a0", "cb0")},
       cb1 AS MATERIALIZED (SELECT a.m, a.cid, l.d,
           CAST((2 * (SUM(l.v) + COUNT(*) * $off) + COUNT(*))
             // (2 * COUNT(*)) AS BIGINT) - $off AS w
         FROM a0asg a JOIN lanes l
           ON a.vec_id = l.vec_id AND a.m = l.m
         GROUP BY 1, 2, l.d),
       ${assignSql("a1", "cb1")},
       live AS (SELECT m, CAST(COUNT(DISTINCT cid) AS BIGINT)
           AS n_live_codewords FROM cb1 GROUP BY 1)
       SELECT CAST(d0.m AS BIGINT) AS subspace, d0.n AS n_vectors,
         CAST($k AS BIGINT) AS k_seed, live.n_live_codewords,
         CAST(CAST(d0.sd AS HUGEINT) // d0.n AS BIGINT)
           AS mean_dist_seed,
         CAST(CAST(d1.sd AS HUGEINT) // d0.n AS BIGINT)
           AS mean_dist_trained,
         ROUND(1.0 - CAST(d1.sd AS DOUBLE) / CAST(d0.sd AS DOUBLE), 6)
           AS distortion_drop
       FROM a0dm d0 JOIN a1dm d1 ON d0.m = d1.m
       JOIN live ON live.m = d0.m
       ORDER BY subspace"""
  }

  /** The retrieval panel's per-(arm, query) evaluation as a CTE
    * chain ending in `fin(arm, q_id, n_listed, n_relevant, mrr,
    * ndcg)` — generated once, shared by the `text_retrieval_ndcg_multi`
    * rollup and the `text_retrieval_panel_ci` bootstrap tail. */
  private[graft] def retrievalPerQuerySql(nQ: Int): String =
    s"""tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           qp AS (SELECT vec_id AS q_id FROM embeddings
             ORDER BY vec_id LIMIT $nQ),
           qe AS (SELECT q_id, embedding AS q_emb FROM qp
             JOIN embeddings e ON e.vec_id = qp.q_id),
           qt AS (SELECT q_id, token, df FROM (
               SELECT qp.q_id, tf.token, df.df, ROW_NUMBER()
                 OVER (PARTITION BY qp.q_id
                   ORDER BY df.df ASC, tf.token) AS rk
               FROM qp JOIN tf ON tf.doc_id = qp.q_id
               JOIN df ON df.token = tf.token) z WHERE rk <= 8),
           sc AS (SELECT qt.q_id, tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - qt.df + 0.5)
                   / (CAST(qt.df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN qt USING (token) JOIN lens USING (doc_id),
               nd),
           lex AS (SELECT q_id, doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1, 2),
           lexev AS (SELECT q_id, doc_id, CAST(r AS BIGINT) AS r
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY bm25 DESC, doc_id) AS r
               FROM lex WHERE doc_id <> q_id) zl WHERE r <= 100),
           sims AS (SELECT qe.q_id, e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim
             FROM embeddings e, qe WHERE e.vec_id <> qe.q_id),
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
           abands AS (SELECT q_id, band, bucket FROM bands
             JOIN qp ON vec_id = q_id),
           cand AS (SELECT DISTINCT a.q_id, b.vec_id AS doc_id
             FROM bands b JOIN abands a USING (band, bucket)),
           semev AS (SELECT q_id, doc_id, CAST(r AS BIGINT) AS r
             FROM (SELECT s.q_id, s.doc_id, ROW_NUMBER()
                 OVER (PARTITION BY s.q_id
                   ORDER BY sim DESC, s.doc_id) AS r
               FROM cand c JOIN sims s
                 ON c.q_id = s.q_id AND c.doc_id = s.doc_id) z
             WHERE r <= 100),
           fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + l.r), 0.0)
                 + COALESCE(1.0 / (60.0 + s.r), 0.0) AS rrf
             FROM lexev l FULL OUTER JOIN semev s
               ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
           hybev AS (SELECT q_id, doc_id, CAST(r0 AS BIGINT) AS pos
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY rrf DESC, doc_id) AS r0 FROM fused) z
             WHERE r0 <= 10),
           lists AS (
             SELECT 'a_lexical' AS arm, q_id, doc_id, r AS pos
               FROM lexev WHERE r <= 10
             UNION ALL SELECT 'b_semantic_lsh', q_id, doc_id, r
               FROM semev WHERE r <= 10
             UNION ALL SELECT 'c_hybrid_rrf', q_id, doc_id, pos
               FROM hybev),
           cdocs AS (SELECT s.q_id AS cq, s.doc_id AS cd, s.sim AS cs
             FROM (SELECT DISTINCT q_id, doc_id FROM lists) ld
             JOIN sims s USING (q_id, doc_id)),
           gains0 AS (SELECT cq, cd,
               CAST(SUM(CASE WHEN sim > cs THEN 1 ELSE 0 END)
                 AS BIGINT) + 1 AS lo,
               CAST(COUNT(*) AS BIGINT) AS hi
             FROM sims JOIN cdocs ON sims.q_id = cq AND sim >= cs
             GROUP BY 1, 2),
           gains AS (SELECT cq AS q_id, cd AS doc_id,
               CASE WHEN lo > 10 THEN 0.0
                 ELSE CAST((LEAST(hi, 10) - lo + 1)
                     * (22 - lo - LEAST(hi, 10)) AS DOUBLE)
                   / CAST(2 * (hi - lo + 1) AS DOUBLE) END AS gain
             FROM gains0),
           truth AS (SELECT q_id, doc_id, CAST(1 AS BIGINT) AS rel
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY sim DESC, doc_id) AS rn FROM sims) z
             WHERE rn <= 10),
           idcg AS (SELECT SUM(CAST(CAST(11 - r AS DOUBLE)
               / log2(CAST(r + 1 AS DOUBLE)) AS DECIMAL(28,12)))
               AS idcg
             FROM range(1, 11) t(r)),
           per AS (SELECT arm, q_id,
               CAST(COUNT(*) AS BIGINT) AS n_listed,
               CAST(SUM(COALESCE(rel, 0)) AS BIGINT) AS n_relevant,
               MIN(CASE WHEN rel = 1 THEN pos END) AS first_rel,
               SUM(CAST(COALESCE(gain, 0.0)
                 / log2(CAST(pos + 1 AS DOUBLE)) AS DECIMAL(28,12)))
                 AS dcg
             FROM lists LEFT JOIN gains USING (q_id, doc_id)
             LEFT JOIN truth USING (q_id, doc_id) GROUP BY 1, 2),
           perq AS (SELECT arm, q_id, n_listed, n_relevant,
               CAST(COALESCE(CAST(1.0 AS DOUBLE) / first_rel, 0.0)
                 AS DECIMAL(28,12)) AS mrr,
               CAST(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
                 AS DECIMAL(28,12)) AS ndcg
             FROM per, idcg),
           spine AS (SELECT arm, q_id FROM (VALUES ('a_lexical'),
               ('b_semantic_lsh'), ('c_hybrid_rrf')) a(arm)
             CROSS JOIN qp),
           fin AS (SELECT s.arm, s.q_id,
               COALESCE(n_listed, 0) AS n_listed,
               COALESCE(n_relevant, 0) AS n_relevant,
               COALESCE(mrr, CAST(0 AS DECIMAL(28,12))) AS mrr,
               COALESCE(ndcg, CAST(0 AS DECIMAL(28,12))) AS ndcg
             FROM spine s LEFT JOIN perq p
               ON s.arm = p.arm AND s.q_id = p.q_id)"""

  /** Generated oracle for `text_retrieval_panel_ci`: the shared
    * per-query chain + the paired Poisson(1) md5-coin replicate tail
    * (the events_poisson_bootstrap weight convention, keyed on
    * (replicate, q_id) so every arm sees the same resampled panel). */
  private[graft] def retrievalPanelCiOracleSql(nQ: Int = 20,
      reps: Int = 200): String = {
    val loRk = math.ceil(0.025 * reps).toLong
    val hiRk = math.ceil(0.975 * reps).toLong
    s"""WITH ${retrievalPerQuerySql(nQ)},
       wx AS (SELECT arm, q_id, ndcg, rep,
           CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0
             + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0
             + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
             / 4294967296.0 AS DOUBLE) AS u
         FROM (SELECT arm, q_id, ndcg, rep,
             md5(CAST(rep AS VARCHAR) || ':'
               || CAST(q_id AS VARCHAR)) AS h
           FROM fin CROSS JOIN range($reps) t(rep)) z),
       ww AS (SELECT arm, rep, ndcg,
           CASE WHEN u < 0.36787944117144233 THEN 0
                WHEN u < 0.7357588823428847 THEN 1
                WHEN u < 0.9196986029286058 THEN 2
                WHEN u < 0.9810118431238462 THEN 3
                WHEN u < 0.9963401531726563 THEN 4
                ELSE 5 END AS w
         FROM wx),
       rm AS MATERIALIZED (SELECT arm, rep,
           -- w cast to DECIMAL(1,0): ndcg(28,12) x BIGINT would exceed
           -- DECIMAL width and DuckDB silently computes it in DOUBLE
           -- (as Spark silently reduces the scale) — (28,12) x (1,0)
           -- keeps the weighted sum EXACT in both engines
           CAST(CASE WHEN SUM(w) > 0
             THEN CAST(SUM(ndcg * CAST(w AS DECIMAL(1,0))) AS DOUBLE)
               / CAST(SUM(w) AS DOUBLE)
             ELSE 0.0 END AS DECIMAL(18,9)) AS m
         FROM ww GROUP BY 1, 2),
       wins AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_top FROM (
           SELECT arm, rep, ROW_NUMBER() OVER (PARTITION BY rep
             ORDER BY m DESC, arm) AS rk FROM rm) z
         WHERE rk = 1 GROUP BY 1),
       rr AS (SELECT arm, rep, m, ROW_NUMBER() OVER (
           PARTITION BY arm ORDER BY m, rep) AS rn FROM rm),
       ci AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_reps,
           -- exact nano-unit sum: boot_mean rounds half-up at 6 dp in
           -- INTEGER floor-division (never ROUND(double, 6), whose
           -- half-ulp boundary semantics differ between engines)
           SUM(CAST(m * 1000000000 AS HUGEINT)) AS si,
           (CAST(SUM(m * m) AS DOUBLE)
             - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
               / COUNT(*)) / (COUNT(*) - 1) AS var_r,
           CAST(MIN(CASE WHEN rn >= $loRk THEN m END) AS DOUBLE)
             AS lo_r,
           CAST(MIN(CASE WHEN rn >= $hiRk THEN m END) AS DOUBLE)
             AS hi_r
         FROM rr GROUP BY 1),
       pt AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(ndcg) AS DOUBLE) / COUNT(*) AS point_r
         FROM fin GROUP BY 1)
       SELECT pt.arm, pt.n_queries, ci.n_reps,
         ROUND(pt.point_r, 6) AS ndcg10_mean,
         CAST((2 * ci.si + ci.n_reps * 1000)
           // (2 * ci.n_reps * 1000) AS DOUBLE) / 1000000.0
           AS boot_mean,
         ROUND(sqrt(ci.var_r), 6) AS boot_se,
         ROUND(ci.lo_r, 6) AS ci_lo,
         ROUND(ci.hi_r, 6) AS ci_hi,
         ROUND(CAST(COALESCE(wins.n_top, 0) AS DOUBLE)
           / CAST(ci.n_reps AS DOUBLE), 6) AS top_share
       FROM pt JOIN ci ON pt.arm = ci.arm
       LEFT JOIN wins ON wins.arm = pt.arm
       ORDER BY pt.arm"""
  }

  private[graft] def kcenterOracleSql(k: Int): String = {
    val steps = (2 to k).map { i =>
      s""",
         p$i AS (SELECT vec_id, qe, nsq, mind FROM d${i - 1}
           ORDER BY mind DESC, vec_id LIMIT 1),
         d$i AS (SELECT d.vec_id, d.qe, d.nsq,
             LEAST(d.mind, d.nsq + p.nsq
               - 2 * CAST(list_dot_product(d.qe, p.qe) AS BIGINT)) AS mind
           FROM d${i - 1} d, p$i p)"""
    }.mkString
    val pickRows = (2 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS pick_order, vec_id,
             CAST(mind AS BIGINT) AS dist_micro2 FROM p$i"""
    }.mkString("\n           UNION ALL ")
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
           FROM embeddings),
         n AS (SELECT vec_id, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nsq
           FROM q),
         c1 AS (SELECT vec_id, qe, nsq FROM n ORDER BY vec_id LIMIT 1),
         d1 AS (SELECT d.vec_id, d.qe, d.nsq,
             d.nsq + c.nsq - 2 * CAST(list_dot_product(d.qe, c.qe) AS BIGINT)
               AS mind
           FROM n d, c1 c)$steps,
         cov AS (SELECT CAST(0 AS BIGINT) AS pick_order, vec_id,
             CAST(mind AS BIGINT) AS dist_micro2
           FROM d$k ORDER BY mind DESC, vec_id LIMIT 1)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS pick_order, vec_id,
             CAST(0 AS BIGINT) AS dist_micro2 FROM c1
           UNION ALL $pickRows
           UNION ALL SELECT * FROM cov) u
         ORDER BY pick_order"""
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeMergeLearn]]:
    * SQL cannot loop, but the trainer's round count is bounded, so the
    * iterative program unrolls into `rounds` chained CTE blocks — each
    * block is the SAME relational round the Spark side runs (lead-window
    * pair census -> 1-row winner with count-then-lexicographic tie-break
    * -> gaps-and-islands greedy non-overlapping apply). Generated, not
    * hand-written, so round count stays a single knob.
    *
    * Composed from [[bpeMergeCtes]] (the CTE block, exposed so
    * composite oracles can embed the trainer WITHOUT substring or
    * regex surgery on the assembled query) + the per-round readout
    * select. */
  private[graft] def bpeMergeOracleSql(rounds: Int,
      docWhere: String = ""): String = {
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS INT) AS merge_round, b.a AS lhs, b.b AS rhs,
          b.cnt AS pair_count,
          (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) FROM syms_$r)
            AS vocab_size,
          (SELECT CAST(SUM(freq) AS BIGINT) FROM syms_$r) AS total_symbols
          FROM best_$r b"""
    }.mkString("\n UNION ALL\n")
    s"WITH ${bpeMergeCtes(rounds, docWhere)}" +
      s"\n SELECT * FROM (\n$rows\n ) mr ORDER BY merge_round"
  }

  /** The BPE trainer's CTE chain alone (no `WITH`, no final select).
    * `wordsCte` renames the word-census CTE so the block can coexist
    * with another trainer prefix that also declares `words` (the
    * fertility oracle embeds both this and the unigram prefix). */
  private[graft] def bpeMergeCtes(rounds: Int, docWhere: String = "",
      wordsCte: String = "words"): String = {
    val base =
      s"""toks AS (SELECT unnest(string_split(text, ' ')) AS tok
           FROM documents $docWhere),""" +
      s"""
         $wordsCte AS MATERIALIZED (SELECT lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS freq
           FROM toks WHERE regexp_matches(lower(tok), '^[a-z]+$$')
           GROUP BY 1),
         sy0 AS (SELECT w, freq,
             unnest(generate_series(1, CAST(len(w) AS INT))) AS pos
           FROM $wordsCte),
         syms_0 AS MATERIALIZED (
           SELECT w, freq, pos, substr(w, pos, 1) AS sym FROM sy0
           UNION ALL
           SELECT w, freq, len(w) + 1 AS pos, '</w>' AS sym FROM $wordsCte)"""
    val blocks = (1 to rounds).map { r =>
      val p = r - 1
      s""",
         m_$r AS MATERIALIZED (
           SELECT w, freq, pos, sym,
                  LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
                  LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos,
                  ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS rn
           FROM syms_$p),
         best_$r AS MATERIALIZED (
           SELECT a, b, a || b AS ab, cnt FROM (
             SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS cnt
             FROM m_$r WHERE nxt IS NOT NULL GROUP BY 1, 2) pc_$r
           ORDER BY cnt DESC, a, b LIMIT 1),
         ap_$r AS MATERIALIZED (
           SELECT w, pos, npos FROM (
             SELECT w, pos, npos,
                    ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos) AS k
             FROM (SELECT m.w, m.pos, m.npos,
                          m.rn - ROW_NUMBER() OVER
                            (PARTITION BY m.w ORDER BY m.pos) AS grp
                   FROM m_$r m, best_$r b
                   WHERE m.sym = b.a AND m.nxt = b.b) mt_$r) rk_$r
           WHERE k % 2 = 1),
         syms_$r AS MATERIALIZED (
           SELECT s.w, s.freq, s.pos,
                  CASE WHEN a1.pos IS NOT NULL THEN (SELECT ab FROM best_$r)
                       ELSE s.sym END AS sym
           FROM syms_$p s
           LEFT JOIN ap_$r a1 ON s.w = a1.w AND s.pos = a1.pos
           LEFT JOIN ap_$r a2 ON s.w = a2.w AND s.pos = a2.npos
           WHERE a2.w IS NULL)"""
    }.mkString
    s"$base$blocks"
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeEncode]]: the
    * same unrolled trainer CTEs, then the final vocabulary's per-word
    * subword counts joined back onto one corpus token pass. */
  private[graft] def bpeEncodeOracleSql(rounds: Int): String = {
    s"""WITH ${bpeMergeCtes(rounds)},
       wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
         FROM syms_$rounds GROUP BY w),
       dw AS (SELECT lang, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS occ
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
               FROM documents) dt
         WHERE regexp_matches(lower(tok), '^[a-z]+$$') GROUP BY 1, 2)
       SELECT lang, CAST(SUM(occ) AS BIGINT) AS total_words,
         CAST(SUM(occ * (len(w) + 1)) AS BIGINT) AS total_chars,
         CAST(SUM(occ * n_sub) AS BIGINT) AS total_bpe_tokens,
         ROUND(CAST(SUM(occ * (len(w) + 1)) AS DOUBLE)
           / SUM(occ * n_sub), 6) AS chars_per_token
       FROM dw JOIN wt USING (w) GROUP BY lang ORDER BY lang"""
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpePackSequences]]:
    * the unrolled trainer CTEs, per-document BPE lengths (vocabulary
    * LEFT join; out-of-vocabulary tokens count 1), then the identical
    * fixed-256 packing census `pack_sequences` runs on whitespace
    * lengths. */
  private[graft] def bpePackOracleSql(rounds: Int): String = {
    s"""WITH ${bpeMergeCtes(rounds)},
       wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
         FROM syms_$rounds GROUP BY w),
       dt AS (SELECT source, doc_id, lower(tok) AS w
         FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents) dx),
       dl AS (SELECT source, doc_id,
           CAST(SUM(COALESCE(wt.n_sub, 1)) AS BIGINT) AS n_tok
         FROM dt LEFT JOIN wt USING (w) GROUP BY 1, 2),
       cm AS (SELECT source, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM dl),
       pw AS (SELECT source, (cum - n_tok) // 256 AS win,
           CAST(COUNT(*) AS BIGINT) AS docs_in_win,
           SUM(n_tok) AS tok_start
         FROM cm GROUP BY 1, 2)
       SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
       FROM pw GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB replay of
    * [[graft.operators.StreamingAnalytics.streamBpeEncode]]: the trainer
    * CTEs restricted to the corpus half (sources 0-9), then for EACH
    * staged increment the frozen merges re-applied round by round to
    * that increment's own vocabulary (the same window/island/merge
    * blocks, with `best_r` read from the trainer chain instead of
    * recomputed), per-(increment, lang) censuses, and the increment-0
    * fold of their integer sums. */
  private[graft] def streamBpeEncodeOracleSql(rounds: Int): String = {
    val ctes = "WITH " + bpeMergeCtes(rounds,
      "WHERE CAST(substr(source, 4, 8) AS INT) < 10")
    val incRanges = Seq(1 -> "BETWEEN 10 AND 14", 2 -> ">= 15")
    val incBlocks = incRanges.map { case (i, rng) =>
      val apply = (1 to rounds).map { r =>
        val p = r - 1
        s""",
           im_${i}_$r AS MATERIALIZED (
             SELECT w, freq, pos, sym,
                    LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
                    LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos,
                    ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS rn
             FROM is_${i}_$p),
           iap_${i}_$r AS MATERIALIZED (
             SELECT w, pos, npos FROM (
               SELECT w, pos, npos,
                      ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos)
                        AS k
               FROM (SELECT m.w, m.pos, m.npos,
                            m.rn - ROW_NUMBER() OVER
                              (PARTITION BY m.w ORDER BY m.pos) AS grp
                     FROM im_${i}_$r m, best_$r b
                     WHERE m.sym = b.a AND m.nxt = b.b) imt_${i}_$r)
                 irk_${i}_$r
             WHERE k % 2 = 1),
           is_${i}_$r AS MATERIALIZED (
             SELECT s.w, s.freq, s.pos,
                    CASE WHEN a1.pos IS NOT NULL
                         THEN (SELECT ab FROM best_$r)
                         ELSE s.sym END AS sym
             FROM is_${i}_$p s
             LEFT JOIN iap_${i}_$r a1 ON s.w = a1.w AND s.pos = a1.pos
             LEFT JOIN iap_${i}_$r a2 ON s.w = a2.w AND s.pos = a2.npos
             WHERE a2.w IS NULL)"""
      }.mkString
      s""",
         iw_$i AS MATERIALIZED (
           SELECT lang, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS occ
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents
                 WHERE CAST(substr(source, 4, 8) AS INT) $rng) it_$i
           WHERE regexp_matches(lower(tok), '^[a-z]+$$') GROUP BY 1, 2),
         ivw_$i AS (SELECT w, CAST(SUM(occ) AS BIGINT) AS freq
           FROM iw_$i GROUP BY 1),
         is_${i}_0 AS MATERIALIZED (
           SELECT w, freq, pos, substr(w, pos, 1) AS sym FROM (
             SELECT w, freq,
                 unnest(generate_series(1, CAST(len(w) AS INT))) AS pos
             FROM ivw_$i) iz_$i
           UNION ALL
           SELECT w, freq, len(w) + 1 AS pos, '</w>' AS sym FROM ivw_$i)
         $apply,
         iwt_$i AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
           FROM is_${i}_$rounds GROUP BY w),
         ic_$i AS (SELECT CAST($i AS BIGINT) AS increment, lang,
             CAST(SUM(occ) AS BIGINT) AS total_words,
             CAST(SUM(occ * (len(w) + 1)) AS BIGINT) AS total_chars,
             CAST(SUM(occ * n_sub) AS BIGINT) AS total_bpe_tokens
           FROM iw_$i JOIN iwt_$i USING (w) GROUP BY 1, 2)"""
    }.mkString
    s"""$ctes$incBlocks,
       iu AS (SELECT * FROM ic_1 UNION ALL SELECT * FROM ic_2),
       ifold AS (SELECT CAST(0 AS BIGINT) AS increment, lang,
           CAST(SUM(total_words) AS BIGINT) AS total_words,
           CAST(SUM(total_chars) AS BIGINT) AS total_chars,
           CAST(SUM(total_bpe_tokens) AS BIGINT) AS total_bpe_tokens
         FROM iu GROUP BY 2)
       SELECT increment, lang, total_words, total_chars, total_bpe_tokens,
         ROUND(CAST(total_chars AS DOUBLE) / total_bpe_tokens, 6)
           AS chars_per_token
       FROM (SELECT * FROM iu UNION ALL SELECT * FROM ifold) iz
       ORDER BY increment, lang"""
  }
}
