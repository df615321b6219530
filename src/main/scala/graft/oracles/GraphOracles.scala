package graft.oracles

/** Graph rows over the trade graph.
  *
  * DuckDB-dialect oracle SQL moved VERBATIM from SparkEntry.oracleSql in
  * round 16 (verdict item 6: SparkEntry held 486 registrations AND all
  * oracle text; the full-battery hash gate is the refactor's test).
  * Conventions: see [[graft.SparkEntry.oracleSql]]. */
object GraphOracles {
  private[graft] val sql: Map[String, String] = Map(
    "graph_triangles" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
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
         pairs AS (SELECT x.d1, x.d2 FROM inter x
           JOIN sizes s1 ON x.d1 = s1.doc_id
           JOIN sizes s2 ON x.d2 = s2.doc_id
           WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS g FROM (
             SELECT d1 AS v FROM pairs UNION ALL SELECT d2 FROM pairs)
           GROUP BY v),
         oriented AS (SELECT
             CASE WHEN (g1, d1) < (g2, d2) THEN d1 ELSE d2 END AS src,
             CASE WHEN (g1, d1) < (g2, d2) THEN d2 ELSE d1 END AS dst,
             CASE WHEN (g1, d1) < (g2, d2) THEN g2 ELSE g1 END AS gd
           FROM (SELECT p.d1, p.d2, x1.g AS g1, x2.g AS g2
             FROM pairs p JOIN deg x1 ON p.d1 = x1.v
                          JOIN deg x2 ON p.d2 = x2.v)),
         wedge AS (SELECT o1.dst AS wa, o2.dst AS wb
           FROM oriented o1 JOIN oriented o2
             ON o1.src = o2.src AND (o1.gd, o1.dst) < (o2.gd, o2.dst)),
         tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
           FROM wedge w WHERE EXISTS (SELECT 1 FROM oriented o
             WHERE o.src = w.wa AND o.dst = w.wb)),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(g * (g - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
         ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs)
         SELECT st.n_nodes, ec.n_edges, st.n_wedges, tri.n_triangles,
           CASE WHEN st.n_wedges > 0
                THEN ROUND(3.0 * tri.n_triangles / st.n_wedges, 6)
                ELSE 0.0 END AS transitivity
         FROM st, ec, tri""",
    "graph_link_predict" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         cand AS (SELECT x.label, x.v AS a, y.v AS b,
             COUNT(*) AS common
           FROM und x JOIN und y
             ON x.label = y.label AND x.u = y.u AND x.v < y.v
           GROUP BY 1, 2, 3),
         nonadj AS (SELECT c.* FROM cand c WHERE NOT EXISTS
           (SELECT 1 FROM und e WHERE e.label = c.label
              AND e.u = c.a AND e.v = c.b)),
         deg AS (SELECT label, u, COUNT(*) AS deg FROM und GROUP BY 1, 2),
         scored AS (SELECT n.label, n.common,
             ROUND(CAST(n.common AS DOUBLE)
               / (da.deg + db.deg - n.common), 6) AS jaccard
           FROM nonadj n
           JOIN deg da ON n.label = da.label AND n.a = da.u
           JOIN deg db ON n.label = db.label AND n.b = db.u)
         SELECT label, COUNT(*) AS n_candidates,
           CAST(MAX(common) AS BIGINT) AS max_common,
           ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_jaccard
         FROM scored GROUP BY label ORDER BY label""",
    "graph_kcore" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         u0 AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         c0 AS (SELECT CAST(0 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u0 GROUP BY label),
         k1 AS (SELECT label, u FROM u0 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u1 AS (SELECT e.* FROM u0 e
           JOIN k1 a ON e.label = a.label AND e.u = a.u
           JOIN k1 b ON e.label = b.label AND e.v = b.u),
         c1 AS (SELECT CAST(1 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u1 GROUP BY label),
         k2 AS (SELECT label, u FROM u1 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u2 AS (SELECT e.* FROM u1 e
           JOIN k2 a ON e.label = a.label AND e.u = a.u
           JOIN k2 b ON e.label = b.label AND e.v = b.u),
         c2 AS (SELECT CAST(2 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u2 GROUP BY label),
         k3 AS (SELECT label, u FROM u2 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u3 AS (SELECT e.* FROM u2 e
           JOIN k3 a ON e.label = a.label AND e.u = a.u
           JOIN k3 b ON e.label = b.label AND e.v = b.u),
         c3 AS (SELECT CAST(3 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u3 GROUP BY label)
         SELECT * FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1
           UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
         ORDER BY round, label""",
    "graph_assortativity" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         deg AS (SELECT label, u, COUNT(*) AS deg FROM und GROUP BY 1, 2),
         s AS (SELECT e.label, COUNT(*) AS n,
             CAST(SUM(a.deg) AS BIGINT) AS sx,
             CAST(SUM(b.deg) AS BIGINT) AS sy,
             CAST(SUM(a.deg * b.deg) AS BIGINT) AS sxy,
             CAST(SUM(a.deg * a.deg) AS BIGINT) AS sxx,
             CAST(SUM(b.deg * b.deg) AS BIGINT) AS syy
           FROM und e
           JOIN deg a ON e.label = a.label AND e.u = a.u
           JOIN deg b ON e.label = b.label AND e.v = b.u
           GROUP BY 1)
         SELECT label, n AS n_edges,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy
                  - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
         FROM s ORDER BY label""",
    "graph_modularity" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2 AS (SELECT SUM(w) AS tw FROM sym),
         internal AS (SELECT ca.community,
             SUM(s.w) AS in_w
           FROM sym s JOIN comm ca ON s.node = ca.node
             JOIN comm cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc AS (SELECT c.community,
             CAST(COUNT(*) AS BIGINT) AS n_nodes, SUM(d.dw) AS deg_w
           FROM (SELECT node, SUM(w) AS dw FROM sym GROUP BY 1) d
             JOIN comm c USING (node)
           GROUP BY 1)
         SELECT degc.community, n_nodes,
           CAST(COALESCE(in_w, 0) AS BIGINT) AS in_w,
           CAST(deg_w AS BIGINT) AS deg_w,
           ROUND(CAST(COALESCE(in_w, 0) AS DOUBLE) / CAST(tw AS DOUBLE)
             - (CAST(deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               * (CAST(deg_w AS DOUBLE) / CAST(tw AS DOUBLE)), 6)
             AS contribution
         FROM degc LEFT JOIN internal USING (community) CROSS JOIN m2
         ORDER BY community""",
    // graph_louvain: the modularity oracle's edge/labelProp chain, then
    // one synchronous Louvain gain round replayed with the identical
    // double expression shape (exact DECIMAL operands on both sides)
    "graph_louvain" ->
      """WITH edges AS MATERIALIZED (
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
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS MATERIALIZED (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2x AS MATERIALIZED (SELECT SUM(w) AS tw FROM sym),
         degn AS MATERIALIZED (SELECT node, SUM(w) AS ki FROM sym GROUP BY 1),
         degc AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS degw
           FROM degn d JOIN comm c USING (node) GROUP BY 1),
         kic AS MATERIALIZED (SELECT s.node, cb.community AS cand, SUM(s.w) AS kc
           FROM sym s JOIN comm cb ON s.nbr = cb.node
           WHERE s.nbr <> s.node GROUP BY 1, 2),
         base AS MATERIALIZED (SELECT c.node, c.community AS cur, d.ki,
             COALESCE(ka.kc, 0) AS kia, dca.degw AS dega
           FROM comm c JOIN degn d USING (node)
           LEFT JOIN kic ka ON ka.node = c.node
             AND ka.cand = c.community
           JOIN degc dca ON dca.community = c.community),
         gains AS MATERIALIZED (SELECT b.node, b.cur, k.cand,
             2.0 * (CAST(k.kc AS DOUBLE) - CAST(b.kia AS DOUBLE))
               / CAST(tw AS DOUBLE)
             - 2.0 * CAST(b.ki AS DOUBLE) * (CAST(b.ki AS DOUBLE)
                 + CAST(dcb.degw AS DOUBLE) - CAST(b.dega AS DOUBLE))
               / (CAST(tw AS DOUBLE) * CAST(tw AS DOUBLE)) AS gain
           FROM base b JOIN kic k ON k.node = b.node AND k.cand <> b.cur
           JOIN degc dcb ON dcb.community = k.cand
           CROSS JOIN m2x),
         best AS MATERIALIZED (SELECT node, cand, gain FROM (
             SELECT node, cand, gain, ROW_NUMBER() OVER (
               PARTITION BY node ORDER BY gain DESC, cand) AS rn
             FROM gains) g WHERE rn = 1),
         comm2 AS MATERIALIZED (SELECT c.node,
             CASE WHEN bm.gain > 0 THEN bm.cand
                  ELSE c.community END AS community,
             c.community AS cur
           FROM comm c LEFT JOIN best bm ON bm.node = c.node),
         internal1 AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
           FROM sym s JOIN comm ca ON s.node = ca.node
           JOIN comm cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc1 AS MATERIALIZED (SELECT c.community, CAST(COUNT(*) AS BIGINT)
             AS n_nodes, SUM(d.ki) AS deg_w
           FROM degn d JOIN comm c USING (node) GROUP BY 1),
         conts1 AS MATERIALIZED (SELECT dc.community,
             CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE)
                 / CAST(tw AS DOUBLE)
               - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
                 * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               AS DECIMAL(28,12)) AS contrib
           FROM degc1 dc LEFT JOIN internal1 i USING (community)
           CROSS JOIN m2x),
         internal2 AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
           FROM sym s JOIN comm2 ca ON s.node = ca.node
           JOIN comm2 cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc2 AS MATERIALIZED (SELECT c.community, CAST(COUNT(*) AS BIGINT)
             AS n_nodes, SUM(d.ki) AS deg_w
           FROM degn d JOIN comm2 c USING (node) GROUP BY 1),
         conts2 AS MATERIALIZED (SELECT dc.community, dc.n_nodes,
             COALESCE(i.in_w, 0) AS in_w, dc.deg_w,
             CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE)
                 / CAST(tw AS DOUBLE)
               - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
                 * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               AS DECIMAL(28,12)) AS contrib
           FROM degc2 dc LEFT JOIN internal2 i USING (community)
           CROSS JOIN m2x),
         movers AS (SELECT community, CAST(COUNT(*) AS BIGINT)
             AS n_moved_in
           FROM comm2 WHERE community <> cur GROUP BY 1),
         gsum AS (SELECT COALESCE(SUM(CAST(gain AS DECIMAL(28,12))),
             0) AS gain_sum
           FROM best WHERE gain > 0)
         SELECT c2.community, c2.n_nodes,
           COALESCE(mv.n_moved_in, 0) AS n_moved_in,
           CAST(c2.in_w AS BIGINT) AS in_w,
           CAST(c2.deg_w AS BIGINT) AS deg_w,
           ROUND(CAST(c2.contrib AS DOUBLE), 6) AS contribution,
           ROUND((SELECT CAST(SUM(contrib) AS DOUBLE) FROM conts1), 6)
             AS q_before,
           ROUND((SELECT CAST(SUM(contrib) AS DOUBLE) FROM conts2), 6)
             AS q_after,
           ROUND((SELECT CAST(gain_sum AS DOUBLE) FROM gsum), 6)
             AS gain_sum
         FROM conts2 c2 LEFT JOIN movers mv USING (community)
         ORDER BY community""",
    "graph_ppr" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         ew AS (SELECT src, dst, CAST(w AS DOUBLE) /
                  CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS ratio
                FROM edges),
         nodes AS (SELECT DISTINCT src AS node FROM edges
                   UNION SELECT DISTINCT dst FROM edges),
         pr0 AS (SELECT node,
             CASE WHEN node = 0 THEN 1.0 ELSE 0.0 END AS pr FROM nodes),
         c1 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr0 ON ew.src = pr0.node GROUP BY dst),
         pr1 AS (SELECT node,
             CASE WHEN node = 0 THEN 0.15 ELSE 0.0 END
               + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes LEFT JOIN c1 ON c1.dst = nodes.node),
         c2 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr1 ON ew.src = pr1.node GROUP BY dst),
         pr2 AS (SELECT node,
             CASE WHEN node = 0 THEN 0.15 ELSE 0.0 END
               + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes LEFT JOIN c2 ON c2.dst = nodes.node)
         SELECT node, n_name, ROUND(pr, 8) AS ppr
         FROM pr2 JOIN nation ON node = n_nationkey
         ORDER BY ppr DESC, node""",
    "graph_conductance" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2 AS (SELECT SUM(w) AS tw FROM sym),
         fl AS (SELECT s.node, s.nbr, s.w, ca.community, cb.community AS c2
           FROM sym s JOIN comm ca ON s.node = ca.node
             JOIN comm cb ON s.nbr = cb.node),
         cut AS (SELECT community, SUM(w) AS cut_w FROM fl
           WHERE community <> c2 GROUP BY 1),
         vol AS (SELECT community, SUM(w) AS vol_w FROM fl GROUP BY 1),
         np AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
           FROM comm GROUP BY 1)
         SELECT np.community, n_nodes,
           CAST(COALESCE(cut_w, 0) AS BIGINT) AS cut_w,
           CAST(COALESCE(vol_w, 0) AS BIGINT) AS vol_w,
           ROUND(CASE WHEN LEAST(COALESCE(vol_w, 0),
               tw - COALESCE(vol_w, 0)) > 0
             THEN CAST(COALESCE(cut_w, 0) AS DOUBLE)
               / CAST(LEAST(COALESCE(vol_w, 0), tw - COALESCE(vol_w, 0))
                 AS DOUBLE) END, 6) AS conductance
         FROM np LEFT JOIN vol USING (community)
           LEFT JOIN cut USING (community), m2
         ORDER BY np.community""",
    "graph_pagerank" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         ew AS (SELECT src, dst, CAST(w AS DOUBLE) /
                  CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS ratio
                FROM edges),
         nodes AS (SELECT DISTINCT src AS node FROM edges
                   UNION SELECT DISTINCT dst FROM edges),
         params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
         pr0 AS (SELECT node, 1.0 / nn AS pr FROM nodes CROSS JOIN params),
         c1 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr0 ON ew.src = pr0.node GROUP BY dst),
         pr1 AS (SELECT node, 0.15 / nn + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes CROSS JOIN params
                 LEFT JOIN c1 ON c1.dst = nodes.node),
         c2 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr1 ON ew.src = pr1.node GROUP BY dst),
         pr2 AS (SELECT node, 0.15 / nn + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes CROSS JOIN params
                 LEFT JOIN c2 ON c2.dst = nodes.node)
         SELECT n_name, ROUND(pr, 8) AS pagerank
         FROM pr2 JOIN nation ON node = n_nationkey
         ORDER BY pagerank DESC, n_name""",
    // graph_label_prop: two synchronous LPA rounds mirrored CTE-for-CTE;
    // the argmax tie-break (max weight, then smallest label) is the
    // ROW_NUMBER ordering, and label mass is an exact DECIMAL sum so the
    // ordering can't be perturbed by float accumulation
    "graph_label_prop" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym)
         SELECT n.node, COALESCE(l2.lbl, n.node) AS community, n_name
         FROM nodes n LEFT JOIN l2 ON n.node = l2.node
         JOIN nation ON n.node = n_nationkey
         ORDER BY n.node""",
    "graph_bfs_knn" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
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
         nodes AS (SELECT label, vec_id AS node FROM embeddings),
         d0 AS (SELECT label, MIN(node) AS node FROM nodes GROUP BY 1),
         f1 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN d0 ON s.label = d0.label AND s.v1 = d0.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)),
         f2 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN f1 ON s.label = f1.label AND s.v1 = f1.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = s.label AND y.node = s.v2)),
         f3 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN f2 ON s.label = f2.label AND s.v1 = f2.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = s.label AND y.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f2 z
               WHERE z.label = s.label AND z.node = s.v2)),
         allv AS (SELECT label, node, 0 AS dist FROM d0
           UNION ALL SELECT label, node, 1 FROM f1
           UNION ALL SELECT label, node, 2 FROM f2
           UNION ALL SELECT label, node, 3 FROM f3
           UNION ALL SELECT n.label, n.node, -1 FROM nodes n
             WHERE NOT EXISTS (SELECT 1 FROM d0 a
                 WHERE a.label = n.label AND a.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f1 b
                 WHERE b.label = n.label AND b.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f2 c
                 WHERE c.label = n.label AND c.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f3 e
                 WHERE e.label = n.label AND e.node = n.node))
         SELECT label, dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM allv GROUP BY 1, 2 ORDER BY 1, 2""",
    "graph_weak_ties" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, a, b FROM (
             SELECT label, v1 AS a, v2 AS b FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         und AS (SELECT label, a AS u, b AS v FROM sym WHERE a < b),
         wed AS (SELECT e.label, e.u, e.v, s.b AS w
           FROM und e JOIN sym s ON e.label = s.label AND s.a = e.u
           WHERE s.b <> e.v),
         closed AS (SELECT w1.label, w1.u, w1.v,
             CAST(COUNT(*) AS BIGINT) AS support
           FROM wed w1
           WHERE EXISTS (SELECT 1 FROM sym s2 WHERE s2.label = w1.label
             AND s2.a = w1.v AND s2.b = w1.w)
           GROUP BY 1, 2, 3),
         cen AS (SELECT e.label, COALESCE(c.support, 0) AS s
           FROM und e LEFT JOIN closed c
             ON e.label = c.label AND e.u = c.u AND e.v = c.v)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weak,
           ROUND(CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS weak_share,
           ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 4) AS mean_support
         FROM cen GROUP BY 1 ORDER BY 1""",
    "graph_closeness" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
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
         nodes AS (SELECT label, vec_id AS node FROM embeddings),
         seeds AS (SELECT label, node AS seed FROM (
             SELECT label, node, ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY node) AS srk FROM nodes) z WHERE srk <= 3),
         d0 AS (SELECT label, seed, seed AS node FROM seeds),
         f1 AS (SELECT DISTINCT d0.label, d0.seed, s.v2 AS node
           FROM sym s JOIN d0 ON s.label = d0.label AND s.v1 = d0.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = d0.label AND x.seed = d0.seed
               AND x.node = s.v2)),
         f2 AS (SELECT DISTINCT f1.label, f1.seed, s.v2 AS node
           FROM sym s JOIN f1 ON s.label = f1.label AND s.v1 = f1.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = f1.label AND x.seed = f1.seed
               AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = f1.label AND y.seed = f1.seed
                 AND y.node = s.v2)),
         f3 AS (SELECT DISTINCT f2.label, f2.seed, s.v2 AS node
           FROM sym s JOIN f2 ON s.label = f2.label AND s.v1 = f2.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = f2.label AND x.seed = f2.seed
               AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = f2.label AND y.seed = f2.seed
                 AND y.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f2 z
               WHERE z.label = f2.label AND z.seed = f2.seed
                 AND z.node = s.v2)),
         reach AS (SELECT label, seed, node, 1 AS dist FROM f1
           UNION ALL SELECT label, seed, node, 2 FROM f2
           UNION ALL SELECT label, seed, node, 3 FROM f3),
         bs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nv FROM nodes
           GROUP BY 1),
         agg AS (SELECT r.label, r.seed,
             CAST(COUNT(*) AS BIGINT) AS n_reached,
             CAST(SUM(dist) AS BIGINT) AS sum_dist,
             SUM(CAST(CAST(1.0 AS DOUBLE) / dist AS DECIMAL(18,9)))
               AS harm
           FROM reach r GROUP BY 1, 2)
         SELECT a.label, a.seed, n_reached,
           nv - 1 - n_reached AS n_unreached, sum_dist,
           ROUND(CAST(n_reached AS DOUBLE) / sum_dist, 6) AS closeness,
           ROUND(CAST(harm AS DOUBLE), 6) AS harmonic
         FROM agg a JOIN bs ON a.label = bs.label
         ORDER BY a.label, a.seed""",
    "graph_hits" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         a1r AS (SELECT label, v2 AS node,
             CAST(COUNT(*) AS DOUBLE) AS a FROM knn GROUP BY 1, 2),
         a1t AS (SELECT label, SUM(CAST(a AS DECIMAL(28,12))) AS tot
           FROM a1r GROUP BY 1),
         a1 AS (SELECT r.label, node,
             CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) AS a
           FROM a1r r JOIN a1t USING (label)),
         h1r AS (SELECT k.label, k.v1 AS node,
             CAST(SUM(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS h
           FROM knn k JOIN a1 ON a1.label = k.label AND a1.node = k.v2
           GROUP BY 1, 2),
         h1t AS (SELECT label, SUM(CAST(h AS DECIMAL(28,12))) AS tot
           FROM h1r GROUP BY 1),
         h1 AS (SELECT r.label, node,
             CAST(h AS DOUBLE) / CAST(tot AS DOUBLE) AS h
           FROM h1r r JOIN h1t USING (label)),
         a2r AS (SELECT k.label, k.v2 AS node,
             CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE) AS a
           FROM knn k JOIN h1 ON h1.label = k.label AND h1.node = k.v1
           GROUP BY 1, 2),
         a2t AS (SELECT label, SUM(CAST(a AS DECIMAL(28,12))) AS tot
           FROM a2r GROUP BY 1),
         a2 AS (SELECT r.label, node,
             CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) AS a
           FROM a2r r JOIN a2t USING (label)),
         ranked AS (SELECT a2.label, a2.node, a2.a, h1.h,
             CAST(ROW_NUMBER() OVER (PARTITION BY a2.label
               ORDER BY a2.a DESC, a2.node) AS INT) AS rk
           FROM a2 LEFT JOIN h1
             ON h1.label = a2.label AND h1.node = a2.node)
         SELECT label, rk, node, ROUND(a, 6) AS authority,
           ROUND(COALESCE(h, 0.0), 6) AS hub
         FROM ranked WHERE rk <= 3 ORDER BY label, rk""",
    "graph_reciprocity" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         mut AS (SELECT k1.label, CAST(COUNT(*) AS BIGINT) AS n_mutual
           FROM knn k1 WHERE EXISTS (SELECT 1 FROM knn k2
             WHERE k2.label = k1.label AND k2.v1 = k1.v2
               AND k2.v2 = k1.v1)
           GROUP BY 1),
         tot AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_directed
           FROM knn GROUP BY 1)
         SELECT t.label, n_directed, COALESCE(n_mutual, 0) AS n_mutual,
           ROUND(CAST(COALESCE(n_mutual, 0) AS DOUBLE) / n_directed, 6)
             AS reciprocity
         FROM tot t LEFT JOIN mut ON t.label = mut.label
         ORDER BY t.label""",
  )
}
