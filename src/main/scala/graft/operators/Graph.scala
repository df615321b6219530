package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Iterative graph analytics expressed as relational dataflow — the
  * "graphs are joins" half of a training-data platform (the other half,
  * connected components, lives in [[DedupOps.dedupClusters]]).
  *
  * Scale design mirrors the clusters loop: the edge relation is built
  * once (a fact-table join), cached, and every iteration is one
  * co-partitioned equi-join + one aggregation — no driver-side adjacency,
  * no quadratic step. Iteration count is FIXED and unrolled (two damped
  * steps), so the whole program is a single declarative plan and the
  * DuckDB oracle can mirror it CTE-for-CTE.
  */
object Graph {

  /** Weighted PageRank over the nation→nation trade graph.
    *
    * Edges: supplier nation → customer nation, weighted by the exact
    * lineitem revenue (integer hundredths) flowing between them; the
    * weight build is the only fact-scale work. Two damped (0.85)
    * iterations from the uniform vector; nations with no outgoing trade
    * are dangling (their mass is not redistributed — documented, and
    * identical in the oracle).
    *
    * Determinism: edge weights and out-weights are exact decimals; each
    * contribution `pr·w/outw` is a per-edge double (deterministic), and
    * the per-node contribution SUM — the only order-sensitive reduction —
    * accumulates as DECIMAL(28,12), so shuffle order can't flip a bit.
    * At 100 TB the same loop runs with per-iteration checkpoints and the
    * node vector stays partitioned by node key — nothing here collects
    * beyond two scalar actions (node count, convergence not needed for
    * fixed iterations). */
  /** The nation→nation trade edge relation shared by every graph query:
    * supplier nation → customer nation, weighted by exact lineitem
    * revenue in integer hundredths. The fact-scale work is this one
    * join+agg; its OUTPUT is nation²-bounded (≤625 rows).
    * localCheckpoint materializes that tiny result eagerly so each graph
    * query does exactly ONE fact pass: without it, any scalar action on
    * a derived relation re-executes the lineitem⋈orders⋈dims build
    * (exchange reuse does not span actions). Unlike a .cache() (the r5
    * pinned-cache finding class), what stays resident is ≤625 rows, not
    * a fact-scale intermediate — but note the residency is
    * SESSION-LIFETIME: checkpoint blocks stay pinned until the backing
    * RDD is GC'd, so a long-lived shared session running graph queries
    * in a loop accumulates ≤625-row blocks (tiny each, unbounded in
    * count), and localCheckpoint lineage is unrecoverable on executor
    * loss. A resident service would hold ONE checkpointed edge relation
    * per dataset (or use reliable checkpointing) rather than re-deriving
    * per query as this oracle-gated battery does. */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("dst"))
    val s = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").as("src"))
    Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("decimal(38,0)"))
        .as("w"))
      .localCheckpoint()
  }

  def pagerankNations(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ew = edges.join(broadcast(outw), "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("outw").cast("double")).as("ratio"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    val nn = nodes.count().toDouble
    // every relation below is nation-bounded (≤25 nodes, ≤625 edges) at
    // ANY fact size, but the checkpointed ExistingRDD carries no size
    // stats, so without explicit hints Catalyst plans sort-merge joins —
    // broadcast is categorically right here
    def step(pr: DataFrame): DataFrame = {
      val contrib = ew.join(broadcast(pr), ew("src") === pr("node"))
        .groupBy(col("dst"))
        .agg(sum((col("pr") * col("ratio")).cast("decimal(28,12)"))
          .cast("double").as("contrib"))
      nodes.join(broadcast(contrib), nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(0.15 / nn) + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
            .as("pr"))
    }
    val pr0 = nodes.select(col("node"), lit(1.0 / nn).as("pr"))
    step(step(pr0))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("node") === col("n_nationkey"))
      .select(col("n_name"), round(col("pr"), 8).as("pagerank"))
      .orderBy(col("pagerank").desc, col("n_name"))
  }

  /** CONDUCTANCE of [[labelPropNations]]' communities — the cut-based
    * quality measure beside [[modularity]]'s null-model one (a
    * partition can score well on one and poorly on the other; reading
    * both is the standard practice): per community, boundary cut
    * weight (symmetrized edges leaving the community), internal
    * volume (sum of member strengths), and φ = cut / min(vol, 2m −
    * vol) — low φ means a real cluster, φ near 1 means the "community"
    * is mostly boundary.
    *
    * All weights are exact integer hundredths; one double division
    * per community. Scale shape inherits [[modularity]] verbatim: one
    * fact pass, then nation-bounded algebra with the community map
    * broadcast twice. */
  def conductance(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir) // ONE fact pass for both views
    val sym = symOfEdges(edges)
    val comm = labelPropOnEdges(spark, dir, edges)
      .select(col("node"), col("community"))
    val m2 = sym.agg(sum(col("w")).as("tw"))
    val flagged = sym
      .join(broadcast(comm), Seq("node"))
      .join(broadcast(comm.select(col("node").as("nbr"),
        col("community").as("c2"))), Seq("nbr"))
    val cut = flagged.filter(col("community") =!= col("c2"))
      .groupBy(col("community")).agg(sum(col("w")).as("cut_w"))
    val vol = flagged.groupBy(col("community"))
      .agg(count(lit(1)).as("n_incidences"), sum(col("w")).as("vol_w"))
    val nodesPer = comm.groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"))
    nodesPer.join(vol, Seq("community"), "left")
      .join(cut, Seq("community"), "left")
      .crossJoin(broadcast(m2)) // 1-row total-volume scalar
      .select(col("community"), col("n_nodes"),
        coalesce(col("cut_w"), lit(0L)).cast("long").as("cut_w"),
        coalesce(col("vol_w"), lit(0L)).cast("long").as("vol_w"),
        // a whole-graph community has min(vol, 2m - vol) = 0: emit NULL
        // rather than a cross-engine 0/0
        round(when(least(coalesce(col("vol_w"), lit(0L)),
            col("tw") - coalesce(col("vol_w"), lit(0L))) > 0,
          coalesce(col("cut_w"), lit(0L)).cast("double") /
            least(coalesce(col("vol_w"), lit(0L)),
              col("tw") - coalesce(col("vol_w"), lit(0L))).cast("double")),
          6).as("conductance"))
      .orderBy(col("community"))
  }

  /** PERSONALIZED PageRank from one seed nation — the "importance
    * relative to me" ranking behind related-item panels and local graph
    * exploration, versus [[pagerankNations]]' global prestige: the
    * teleport vector is the seed indicator instead of uniform, so mass
    * radiates from the seed through trade edges and the scores read as
    * seed-conditional affinity. Two damped (0.85) synchronous
    * iterations from the seed indicator; dangling mass is dropped
    * exactly as in the global variant (documented there, identical in
    * the oracle).
    *
    * Determinism and scale shape inherit the global loop verbatim:
    * per-edge contributions are doubles over exact ratios, the one
    * order-sensitive reduction accumulates DECIMAL(28,12), every
    * relation after the one fact pass is nation-bounded, and at a
    * billion nodes the same two joins run hash-partitioned with the
    * seed vector broadcast. */
  def pprFromSeed(spark: SparkSession, dir: String,
                  seed: Long = 0L): DataFrame = {
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ew = edges.join(broadcast(outw), "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("outw").cast("double")).as("ratio"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
    def tele(node: Column): Column =
      when(node === seed, lit(0.15)).otherwise(lit(0.0))
    def step(pr: DataFrame): DataFrame = {
      val contrib = ew.join(broadcast(pr), ew("src") === pr("node"))
        .groupBy(col("dst"))
        .agg(sum((col("pr") * col("ratio")).cast("decimal(28,12)"))
          .cast("double").as("contrib"))
      nodes.join(broadcast(contrib), nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (tele(col("node")) + lit(0.85) * coalesce(col("contrib"), lit(0.0)))
            .as("pr"))
    }
    val pr0 = nodes.select(col("node"),
      when(col("node") === seed, lit(1.0)).otherwise(lit(0.0)).as("pr"))
    step(step(pr0))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("node") === col("n_nationkey"))
      .select(col("node"), col("n_name"), round(col("pr"), 8).as("ppr"))
      .orderBy(col("ppr").desc, col("node"))
  }

  /** Weighted label propagation (community detection) over the same
    * trade graph, treated as UNDIRECTED: each node starts labeled with
    * itself, and in each synchronous round adopts the label carrying the
    * greatest incident edge weight among its neighbors' current labels
    * (Raghavan et al. 2007). Two unrolled rounds; trading blocs emerge
    * as nations converge onto shared labels.
    *
    * Determinism (classic LPA is notoriously order-dependent; this one
    * is not): rounds are SYNCHRONOUS (every round joins the previous
    * round's complete label relation — no in-round adoption order),
    * label mass is an exact DECIMAL sum of integer-hundredth weights,
    * and the argmax tie-breaks to the SMALLEST label via the same
    * struct-ordered max_by as [[DedupOps.dedupKeepBest]] — so the oracle
    * can mirror it with a ROW_NUMBER. Scale: after the one fact pass in
    * [[tradeEdges]], every round is one broadcast join + two
    * nation²-bounded hash-aggs; at a billion-node graph the same loop
    * runs with the label relation hash-partitioned by node and the
    * neighbor relation co-partitioned — label propagation is the
    * textbook "graphs are joins" iteration. */
  def labelPropNations(spark: SparkSession, dir: String): DataFrame =
    labelPropOnEdges(spark, dir, tradeEdges(spark, dir))

  /** [[labelPropNations]] over a PREBUILT trade-edge relation — so a
    * caller that also needs [[symTradeEdges]] pays the corpus-scale
    * fact join ONCE (tradeEdges checkpoints; both derivations reuse
    * the materialized relation). */
  private def labelPropOnEdges(spark: SparkSession, dir: String,
      edges: DataFrame): DataFrame = {
    // undirected incidence: both endpoints see the edge; parallel
    // src→dst / dst→src edges merge their weight
    val sym = edges.select(col("src").as("node"), col("dst").as("nbr"), col("w"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr"), col("w")))
      .groupBy(col("node"), col("nbr")).agg(sum(col("w")).as("w"))
    // a revenue-weighted trade graph is near-complete, so unrestricted
    // LPA collapses to one global community (measured: all 25 nations on
    // one label by round 2). Propagate over STRONG edges only — weight
    // at least the graph's mean — which is where bloc structure lives.
    // The mean gate compares in exact integer cross-multiplication
    // (w * n_edges >= total_w), never a float threshold an engine could
    // round differently.
    val tot = sym.agg(sum(col("w")).as("tw"),
      count(lit(1)).cast("decimal(38,0)").as("ne"))
    val nbrs = sym.crossJoin(broadcast(tot))
      .filter(col("w") * col("ne") >= col("tw"))
      .select(col("node"), col("nbr"), col("w"))
    val init = nbrs.select(col("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    def round(labels: DataFrame): DataFrame =
      nbrs.join(broadcast(labels.withColumnRenamed("node", "nbr")), "nbr")
        .groupBy(col("node"), col("lbl")).agg(sum(col("w")).as("sw"))
        .groupBy(col("node"))
        .agg(max_by(col("lbl"), struct(col("sw"), negate(col("lbl"))))
          .as("lbl"))
    // nations with no strong edge keep their own label (singleton bloc)
    val nodes = sym.select(col("node")).distinct()
    nodes.join(broadcast(round(round(init))), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("community"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("node") === col("n_nationkey"))
      .select(col("node"), col("community"), col("n_name"))
      .orderBy(col("node"))
  }

  /** Weighted MODULARITY of [[labelPropNations]]' communities — the
    * "was the partition any good" number every community detector logs
    * (Newman's Q), closing the cluster→measure loop the way
    * [[Similarity.kmeansInertia]] does for Lloyd: per community c,
    * contribution = in_c/2m − (deg_c/2m)², where in_c sums the
    * symmetrized weights of edges with BOTH endpoints in c, deg_c sums
    * member strengths, and 2m is the total symmetrized weight. Q is the
    * sum of the per-community rows this census reports. Self-loops
    * (domestic trade) carry their symmetrized (doubled) weight and
    * count as internal — the convention is applied identically in both
    * engines, so it cannot flip the hash.
    *
    * Determinism: weights are exact integer hundredths (DECIMAL(38,0));
    * in_c, deg_c, 2m are exact sums ≤ ~10¹³ at bench SFs (double-exact
    * below 2⁵³ — beyond that, rescale the unit before the double cast);
    * each contribution is one double expression over exact operands,
    * rounded once.
    *
    * Scale shape: the fact-scale work is [[tradeEdges]]' one join+agg;
    * everything after is nation²-bounded (≤625 edges), the community
    * map broadcasts into the edge relation twice, and the census is
    * |communities| rows. On a billion-edge graph the same plan holds:
    * two broadcast (or co-partitioned) map joins + two aggregations. */
  /** Symmetrized (node, nbr, w) view of [[tradeEdges]] — the undirected
    * incidence [[modularity]] measures on; package-private so the spec
    * can replay Newman's Q from first principles over the identical
    * relation. */
  private[graft] def symTradeEdges(spark: SparkSession,
                                   dir: String): DataFrame =
    symOfEdges(tradeEdges(spark, dir))

  private def symOfEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"), col("dst").as("nbr"), col("w"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr"), col("w")))
      .groupBy(col("node"), col("nbr")).agg(sum(col("w")).as("w"))

  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir) // ONE fact pass for both views
    val sym = symOfEdges(edges)
    val comm = labelPropOnEdges(spark, dir, edges)
      .select(col("node"), col("community"))
    val m2 = sym.agg(sum(col("w")).as("tw"))
    val internal = sym
      .join(broadcast(comm), Seq("node"))
      .join(broadcast(comm.select(col("node").as("nbr"),
        col("community").as("c2"))), Seq("nbr"))
      .filter(col("community") === col("c2"))
      .groupBy(col("community")).agg(sum(col("w")).as("in_w"))
    val degc = sym.groupBy(col("node")).agg(sum(col("w")).as("dw"))
      .join(broadcast(comm), Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("dw")).as("deg_w"))
    degc.join(internal, Seq("community"), "left")
      .crossJoin(broadcast(m2)) // 1-row total-weight scalar
      .select(col("community"), col("n_nodes"),
        coalesce(col("in_w"), lit(0L)).cast("long").as("in_w"),
        col("deg_w").cast("long").as("deg_w"),
        round(coalesce(col("in_w"), lit(0L)).cast("double") /
            col("tw").cast("double") -
          (col("deg_w").cast("double") / col("tw").cast("double")) *
            (col("deg_w").cast("double") / col("tw").cast("double")), 6)
          .as("contribution"))
      .orderBy(col("community"))
  }

  /** Triangle count + transitivity of the near-dup document graph — the
    * clique-density diagnostic on top of [[DedupOps.dedupClusters]]'
    * evidence pairs: a near-dup cluster whose edges close into
    * triangles is a true duplicate family; a star (hub document paired
    * with many leaves that aren't pairs of each other) is the signature
    * of template/boilerplate contamination, which a keep-one policy
    * handles differently. One row: nodes, edges, wedges (length-2
    * paths), triangles, and transitivity = 3·triangles / wedges.
    *
    * The algorithm is the DEGREE-ORDERED orientation — the standard
    * distributed triangle count: orient every edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges only
    * from each node's OUT-neighbors (out-degree is bounded by √(2m) on
    * any graph, so no hub ever explodes a join group — the property
    * that makes this survive a power-law 100-TB graph where naive
    * wedge-joins on a hub are quadratic), and close each wedge against
    * the oriented edge list; every triangle is counted exactly once.
    * Joins stay on the blocked-pair graph (edges << corpus); degree
    * relation is node-sized. */
  def triangleCount(spark: SparkSession, dir: String): DataFrame = {
    val e0 = DedupOps.ngramJaccardPairs(spark, dir)
      .select(col("d1"), col("d2")).localCheckpoint()
    val deg = e0.select(explode(array(col("d1"), col("d2"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val keyed = e0
      .join(deg.select(col("v").as("d1"), col("deg").as("g1")), "d1")
      .join(deg.select(col("v").as("d2"), col("deg").as("g2")), "d2")
    // total order (deg, id): struct comparison orients each edge
    def key(g: String, d: String) =
      struct(col(g).as("gk"), col(d).as("dk"))
    val oriented = keyed.select(
        when(key("g1", "d1") < key("g2", "d2"),
          struct(col("d1").as("src"), col("d2").as("dst"),
            key("g2", "d2").as("kd")))
          .otherwise(struct(col("d2").as("src"), col("d1").as("dst"),
            key("g1", "d1").as("kd"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.kd"))
    val wedge = oriented.as("o1")
      .join(oriented.as("o2"),
        col("o1.src") === col("o2.src") && col("o1.kd") < col("o2.kd"))
      .select(col("o1.dst").as("wa"), col("o2.dst").as("wb"))
    val tri = wedge.join(oriented,
        col("wa") === col("src") && col("wb") === col("dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
    val edges = e0.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(edges).crossJoin(tri) // three 1-row scalars
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("transitivity"))
  }

  /** Degree ASSORTATIVITY of the k-NN similarity graph — do
    * high-degree vertices link to other hubs (r > 0, resilient
    * core-periphery) or to low-degree spokes (r < 0, hub-and-spoke,
    * the shape that makes graph-ANN search brittle)? Pearson
    * correlation of endpoint degrees over the DIRECTED edge list,
    * computed entirely from exact integer sums (n, Σx, Σy, Σxy, Σx²,
    * Σy² — degrees are k-bounded, products tiny) with ONE double
    * expression at the end, per label block.
    *
    * Same degree-bounded envelope as [[linkPredict]]: two joins of the
    * edge relation against the vertex-grain degree agg, then a
    * |labels|-row census. */
  def assortativity(spark: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2"))
    val und = edges.select(col("label"), col("v1").as("u"), col("v2").as("v"))
      .union(edges.select(col("label"), col("v2").as("u"), col("v1").as("v")))
      .distinct()
    val deg = und.groupBy(col("label"), col("u"))
      .agg(count(lit(1)).as("deg"))
    val sums = und
      .join(deg.select(col("label"), col("u"), col("deg").as("dx")),
        Seq("label", "u"))
      .join(deg.select(col("label"), col("u").as("v"),
        col("deg").as("dy")), Seq("label", "v"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
    sums.select(col("label"), col("n").as("n_edges"),
      round((col("n").cast("double") * col("sxy") -
        col("sx").cast("double") * col("sy")) /
        (sqrt(col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")) *
         sqrt(col("n").cast("double") * col("syy") -
           col("sy").cast("double") * col("sy"))), 6)
        .as("assortativity"))
      .orderBy(col("label"))
  }

  /** k-core PEEL TRACE over the k-NN similarity graph — the
    * graph-density diagnostic an HNSW/NSG builder or a community miner
    * reads before trusting the structure: iteratively delete vertices
    * with (undirected) degree < k and report, per label block and peel
    * round, how many vertices and edges survive. A graph whose core
    * collapses by round 2 has hub-and-spoke structure (poor ANN
    * navigability); a stable core is clusterable. Three unrolled
    * rounds, k = 3; the trace (not the fixpoint) is the product, so
    * the round count is FIXED and the whole program is one declarative
    * plan the oracle mirrors CTE-for-CTE — the [[pagerankNations]]
    * convention for iterative dataflow.
    *
    * Scale shape: the edge relation is degree-bounded (≤2k per vertex
    * after symmetrizing top-k edges), each round is one vertex-grain
    * degree agg plus two semi-joins of the edge relation against the
    * surviving-vertex relation — all equi-joins on vertex id, linear
    * per round at any corpus size. */
  def kcoreTrace(spark: SparkSession, dir: String, k: Int = 3,
      rounds: Int = 3): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2"))
    // localCheckpoint: the union-of-censuses consumes each round's edge
    // relation in every LATER round's lineage too — without a cut the
    // expensive k-NN pair scan would replay once per round. The edge
    // relation is k·|V|-bounded (tiny next to the pair scan), the same
    // materialize-the-small-relation call dedup_clusters_star makes.
    val und0 = edges.select(col("label"), col("v1").as("u"), col("v2").as("v"))
      .union(edges.select(col("label"), col("v2").as("u"), col("v1").as("v")))
      .distinct()
      .localCheckpoint()
    def census(und: DataFrame, round: Int): DataFrame =
      und.groupBy(col("label"))
        .agg(countDistinct(col("u")).as("n_vertices"),
          (count(lit(1)) / 2).cast("long").as("n_edges"))
        .select(lit(round.toLong).as("round"), col("label"),
          col("n_vertices"), col("n_edges"))
    var und = und0
    var out = census(und, 0)
    for (r <- 1 to rounds) {
      val keep = und.groupBy(col("label"), col("u"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("label"), col("u"))
      und = und
        .join(keep, Seq("label", "u"), "left_semi")
        .join(keep.select(col("label"), col("u").as("v")),
          Seq("label", "v"), "left_semi")
      out = out.union(census(und, r))
    }
    out.orderBy(col("round"), col("label"))
  }

  /** Common-neighbor link prediction over the k-NN similarity graph —
    * the candidate generator a graph-ANN refiner or a
    * "related documents" recommender runs on the neighbor structure
    * [[Similarity.knnEdges]] already built: for every NON-adjacent
    * vertex pair sharing at least one neighbor, the common-neighbor
    * count and the neighborhood Jaccard (|Γa∩Γb| / |Γa∪Γb|), reported
    * as a per-label census (candidate pairs, strongest overlap, mean
    * Jaccard).
    *
    * Scale shape: the k-NN edge set is degree-BOUNDED by construction
    * (≤k out-edges per vertex, ≤2k after symmetrization), so the wedge
    * join through the shared-neighbor center emits at most C(2k,2)
    * pairs per vertex — linear in the corpus, never the all-pairs
    * space. Adjacency check is a left-anti join of the wedge relation
    * against the (equally bounded) edge relation; degrees come from
    * one vertex-grain agg joined back on the candidate endpoints.
    * Per-pair Jaccard quantizes to DECIMAL(18,9) before the mean so
    * the sum is order-independent. */
  def linkPredict(spark: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2"))
    val und = edges.select(col("label"), col("v1").as("u"), col("v2").as("v"))
      .union(edges.select(col("label"), col("v2").as("u"), col("v1").as("v")))
      .distinct()
    val cand = und.select(col("label"), col("u").as("c"), col("v").as("a"))
      .join(und.select(col("label"), col("u").as("c"), col("v").as("b")),
        Seq("label", "c"))
      .filter(col("a") < col("b"))
      .groupBy(col("label"), col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    val nonadj = cand.join(
      und.select(col("label"), col("u").as("a"), col("v").as("b")),
      Seq("label", "a", "b"), "left_anti")
    val deg = und.groupBy(col("label"), col("u"))
      .agg(count(lit(1)).as("deg"))
    nonadj
      .join(deg.select(col("label"), col("u").as("a"),
        col("deg").as("dega")), Seq("label", "a"))
      .join(deg.select(col("label"), col("u").as("b"),
        col("deg").as("degb")), Seq("label", "b"))
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("dega") + col("degb") - col("common")).cast("double"), 6))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_candidates"),
        max(col("common")).as("max_common"),
        round(sum(col("jaccard").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 6).as("avg_jaccard"))
      .orderBy(col("label"))
  }

  /** BFS distance census over the k-NN graph — per label block, how
    * many vertices sit at hop distance 0/1/2/3 from the block's seed
    * (its minimum vec_id) on the symmetrized [[Similarity.knnEdges]]
    * relation, plus the UNREACHED remainder (dist −1). This is the
    * graph-search reachability probe behind every graph-ANN design
    * review: a k-NN graph whose BFS ball grows slowly (or strands
    * vertices) will not converge under greedy search no matter how
    * good the edges' similarities are — [[Similarity.knnDiversify]]
    * fixes edge DIRECTION, this row measures edge CONNECTIVITY.
    *
    * Three unrolled frontier hops, each one equi-join of the current
    * frontier against the degree-bounded (≤ 2k·|V| rows) symmetric
    * edge relation followed by an anti-join against the visited set —
    * min-hop semantics fall out because a vertex joins the visited set
    * the first hop it appears. No iteration-to-fixpoint, no driver
    * loop; every relation is |V|- or edge-bounded, so the plan is
    * identical at a billion vertices (frontier joins shuffle on
    * vertex id; the census is |labels|·5 rows). */
  def bfsKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = e.union(e.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "v1", "v2").distinct().localCheckpoint()
    val nodes = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id").as("node"))
    val d0 = nodes.groupBy(col("label")).agg(min(col("node")).as("node"))
      .withColumn("dist", lit(0))
    // frontier/visited carry sym-derived attributes: re-alias via toDF
    // before every join against sym (the attributionMarkov lesson)
    def hop(visited: DataFrame, frontier: DataFrame, d: Int): DataFrame = {
      val f = frontier.select(col("label"), col("node")).toDF("fl", "fn")
      f.join(sym, f("fl") === sym("label") && f("fn") === sym("v1"))
        .select(col("fl").as("label"), col("v2").as("node")).distinct()
        .join(visited.select(col("label"), col("node"))
          .toDF("label", "node"), Seq("label", "node"), "left_anti")
        .withColumn("dist", lit(d))
    }
    val f1 = hop(d0, d0, 1)
    val v1 = d0.unionByName(f1)
    val f2 = hop(v1, f1, 2)
    val v2 = v1.unionByName(f2)
    val f3 = hop(v2, f2, 3)
    val v3 = v2.unionByName(f3)
    val unreached = nodes.join(v3, Seq("label", "node"), "left_anti")
      .withColumn("dist", lit(-1))
    v3.unionByName(unreached)
      .groupBy(col("label"), col("dist"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("label"), col("dist"))
  }

  /** WEAK-TIE census over the k-NN graph (Granovetter) — edges whose
    * endpoints share NO common neighbor. In an embedding k-NN graph
    * weak ties are exactly the long-range links that keep greedy
    * search out of local minima (HNSW's upper layers exist to add
    * them), so their share is the connectivity-health number beside
    * [[bfsKnn]]'s reachability and [[Graph.triangles]]' clustering:
    * all ties strong reads "clumped, slow search"; mostly weak reads
    * "no local structure at all". Per label: edges, weak count/share,
    * and mean common-neighbor support.
    *
    * The support count is the degree-bounded WEDGE join (the
    * [[triangles]] shape — never the pair space): each undirected
    * edge expands to its ≤ 2k wedges, one adjacency semi-probe marks
    * closures, missing edges coalesce to support 0. */
  def weakTies(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = e0.union(e0.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "a", "b").distinct().localCheckpoint()
    val und = sym.filter(col("a") < col("b"))
    val wedge = und.toDF("label", "u", "v")
      .join(sym.toDF("label", "u", "w"), Seq("label", "u"))
      .filter(col("w") =!= col("v"))
    val closed = wedge
      .join(sym.toDF("label", "v", "w"), Seq("label", "v", "w"),
        "left_semi")
      .groupBy(col("label"), col("u"), col("v"))
      .agg(count(lit(1)).as("support"))
    und.toDF("label", "u", "v")
      .join(closed, Seq("label", "u", "v"), "left")
      .withColumn("s", coalesce(col("support"), lit(0L)))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_edges"),
        sum((col("s") === 0L).cast("long")).as("n_weak"),
        round(sum((col("s") === 0L).cast("long")).cast("double") /
          count(lit(1)), 6).as("weak_share"),
        round(sum(col("s")).cast("double") / count(lit(1)), 4)
          .as("mean_support"))
      .orderBy(col("label"))
  }
  /** Closeness / harmonic centrality census for the three lowest-id
    * seeds of each label block over the k-NN graph — the navigability
    * spread readout beside [[bfsKnn]]'s single-seed reachability: for
    * each seed, BFS distances to hop 3, classic closeness
    * n_reached/Σd over the reached set, and harmonic centrality
    * Σ 1/d (which handles the unreached gracefully — they contribute
    * 0). Three seeds per block measure the SPREAD: a graph where
    * closeness varies wildly across seeds routes unevenly under
    * greedy search.
    *
    * Same unrolled-hop machinery as [[bfsKnn]] (three frontier
    * equi-joins + anti-joins against visited, all keyed on (label,
    * seed, node)); per-distance 1/d terms quantize to DECIMAL(18,9)
    * before summation. Multi-source BFS is ONE program: the seed id
    * rides the frontier key, so 3 seeds cost the same three joins. */
  def closenessCentrality(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = e.union(e.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "v1", "v2").distinct().localCheckpoint()
    val nodes = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id").as("node"))
    val seeds = nodes
      .withColumn("srk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("node"))))
      .filter(col("srk") <= 3)
      .select(col("label"), col("node").as("seed"))
    val d0 = seeds.select(col("label"), col("seed"),
      col("seed").as("node"), lit(0).as("dist"))
    def hop(visited: DataFrame, frontier: DataFrame, d: Int): DataFrame = {
      val f = frontier.select(col("label"), col("seed"), col("node"))
        .toDF("fl", "fs", "fn")
      f.join(sym, f("fl") === sym("label") && f("fn") === sym("v1"))
        .select(col("fl").as("label"), col("fs").as("seed"),
          col("v2").as("node")).distinct()
        .join(visited.select(col("label"), col("seed"), col("node"))
          .toDF("label", "seed", "node"),
          Seq("label", "seed", "node"), "left_anti")
        .withColumn("dist", lit(d))
    }
    val f1 = hop(d0, d0, 1)
    val v1 = d0.unionByName(f1)
    val f2 = hop(v1, f1, 2)
    val v2 = v1.unionByName(f2)
    val f3 = hop(v2, f2, 3)
    val v3 = v2.unionByName(f3)
    val blockSizes = nodes.groupBy(col("label")).agg(count(lit(1)).as("nv"))
    v3.filter(col("dist") > 0)
      .groupBy(col("label"), col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(col("dist")).as("sum_dist"),
        sum((lit(1.0) / col("dist")).cast("decimal(18,9)")).as("harm"))
      .join(broadcast(blockSizes), Seq("label"))
      .select(col("label"), col("seed"), col("n_reached"),
        (col("nv") - 1 - col("n_reached")).as("n_unreached"),
        col("sum_dist"),
        round(col("n_reached").cast("double") /
          col("sum_dist").cast("double"), 6).as("closeness"),
        round(col("harm").cast("double"), 6).as("harmonic"))
      .orderBy(col("label"), col("seed"))
  }
  /** Sampled-source BRANDES betweenness over the k-NN graph — the
    * missing member of the centrality family ([[pagerankNations]] /
    * [[closenessCentrality]] / [[hitsKnn]] measure importance;
    * betweenness measures BROKERAGE — the nodes shortest paths route
    * through, i.e. the bottlenecks a navigating search or a failure
    * analysis cares about): Brandes' two-phase algorithm (forward BFS
    * accumulating shortest-path counts σ, backward pass accumulating
    * dependencies δ(v) = Σ_w σ_v/σ_w·(1+δ(w))) run from the three
    * lowest-id sources per label block, truncated at the 3-hop
    * horizon — the standard source-sampled estimator (Brandes & Pich
    * 2007): exact all-sources betweenness is O(V·E), which nothing at
    * 100 TB runs; sampled sources keep every pass linear in edges.
    * Reported: each block's top-3 brokers with their accumulated
    * dependency.
    *
    * Determinism: σ are exact BIGINT path counts; each dependency
    * term quantizes to DECIMAL(28,12) before its per-node sum, so the
    * backward accumulation is order-independent; rankings tie on
    * node id.
    *
    * Plan: the [[closenessCentrality]] multi-source frontier shape —
    * three forward equi-join/anti-join/sum levels and two backward
    * equi-join/sum levels, all keyed on (label, seed, node), over the
    * checkpointed degree-bounded edge relation. */
  def betweennessSampled(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = e.union(e.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "v1", "v2").distinct().localCheckpoint()
    val nodes = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id").as("node"))
    val seeds = nodes
      .withColumn("srk", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("node"))))
      .filter(col("srk") <= 3)
      .select(col("label"), col("node").as("seed"))
    val l0 = seeds.select(col("label"), col("seed"),
      col("seed").as("node"), lit(0).as("dist"), lit(1L).as("sig"))
    def expand(visited: DataFrame, frontier: DataFrame,
        d: Int): DataFrame =
      frontier.select(col("label").as("fl"), col("seed").as("fs"),
          col("node").as("fn"), col("sig").as("fsig"))
        .join(sym, col("fl") === sym("label") && col("fn") === sym("v1"))
        .select(col("fl").as("label"), col("fs").as("seed"),
          col("v2").as("node"), col("fsig").as("sig"))
        .join(visited.select(col("label"), col("seed"), col("node")),
          Seq("label", "seed", "node"), "left_anti")
        .groupBy(col("label"), col("seed"), col("node"))
        .agg(sum(col("sig")).as("sig"))
        .withColumn("dist", lit(d))
        .select(col("label"), col("seed"), col("node"), col("dist"),
          col("sig"))
    val l1 = expand(l0, l0, 1)
    val a1 = l0.unionByName(l1)
    val l2 = expand(a1, l1, 2)
    val a2 = a1.unionByName(l2)
    val l3 = expand(a2, l2, 3)
    val lev = a2.unionByName(l3).localCheckpoint() // (seed,node) grain
    def back(next: DataFrame, d: Int): DataFrame = {
      val vcur = lev.filter(col("dist") === d)
        .select(col("label"), col("seed"), col("node"), col("sig"))
      val contrib = vcur
        .join(sym.toDF("label", "node", "nbr"), Seq("label", "node"))
        .join(next.select(col("label"), col("seed"),
          col("node").as("nbr"), col("sig").as("wsig"),
          col("delta").as("wdelta")), Seq("label", "seed", "nbr"))
        .withColumn("term",
          ((col("sig").cast("double") / col("wsig").cast("double")) *
            (lit(1.0) + col("wdelta").cast("double")))
            .cast("decimal(28,12)"))
        .groupBy(col("label"), col("seed"), col("node"))
        .agg(sum(col("term")).as("dsum"))
      vcur.join(contrib, Seq("label", "seed", "node"), "left")
        .select(col("label"), col("seed"), col("node"), col("sig"),
          coalesce(col("dsum"), lit(0).cast("decimal(28,12)"))
            .as("delta"))
    }
    val d3 = lev.filter(col("dist") === 3)
      .select(col("label"), col("seed"), col("node"), col("sig"),
        lit(0).cast("decimal(28,12)").as("delta"))
    val d2 = back(d3, 2)
    val d1 = back(d2, 1)
    d1.unionByName(d2)
      .groupBy(col("label"), col("node"))
      .agg(sum(col("delta")).as("bc"),
        count(lit(1)).as("n_seed_paths"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("bc").desc, col("node"))))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk").cast("long").as("rk"),
        col("node"), round(col("bc").cast("double"), 6)
          .as("betweenness"),
        col("n_seed_paths"))
      .orderBy(col("label"), col("rk"))
  }

  /** HITS hubs-and-authorities over the DIRECTED k-NN graph — the
    * second eigenvector-flavored centrality beside [[pagerankNations]],
    * on the asymmetric relation the symmetrized operators throw away:
    * a vector many others CHOOSE as a near neighbor is an authority
    * (a natural cluster medoid); a vector whose out-edges point at
    * authorities is a hub (a good search entry point —
    * [[graft.operators.Similarity.greedySearch]] would rather start
    * here than at an arbitrary id). Two unrolled mutual-reinforcement
    * rounds (a ← Aᵀh, h ← A a), each sum-normalized PER LABEL so
    * scores stay O(1) without a vector-norm (the rational-arithmetic
    * variant; contributions quantize to DECIMAL(28,12) before sums).
    * Reported: each block's top-3 authorities with both scores.
    *
    * Scale shape: every step is one equi-join of the degree-bounded
    * edge relation against a |V|-grain score relation plus a hash-agg
    * — the [[pagerankNations]] loop shape on a corpus-scale graph,
    * shuffling on vertex id only. */
  def hitsKnn(spark: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    def normalize(raw: DataFrame, c: String): DataFrame = {
      val tot = raw.groupBy(col("label")).agg(
        sum(col(c).cast("decimal(28,12)")).as("tot"))
      raw.join(broadcast(tot), Seq("label"))
        .select(col("label"), col("node"),
          (col(c).cast("double") / col("tot").cast("double")).as(c))
    }
    // a1 <- A' h0 with h0 = 1: in-degree, normalized
    val a1 = normalize(edges.groupBy(col("label"), col("v2").as("node"))
      .agg(count(lit(1)).cast("double").as("a")), "a")
    val h1 = normalize(edges
      .join(broadcast(a1.toDF("label", "v2", "a")), Seq("label", "v2"))
      .groupBy(col("label"), col("v1").as("node"))
      .agg(sum(col("a").cast("decimal(28,12)")).cast("double").as("h")),
      "h")
    val a2 = normalize(edges
      .join(broadcast(h1.toDF("label", "v1", "h")), Seq("label", "v1"))
      .groupBy(col("label"), col("v2").as("node"))
      .agg(sum(col("h").cast("decimal(28,12)")).cast("double").as("a")),
      "a")
    a2.join(h1, Seq("label", "node"), "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("a").desc, col("node"))))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk"), col("node"),
        round(col("a"), 6).as("authority"),
        round(coalesce(col("h"), lit(0.0)), 6).as("hub"))
      .orderBy(col("label"), col("rk"))
  }
  /** Edge reciprocity of the DIRECTED k-NN relation — the asymmetry
    * census that explains [[hitsKnn]]'s hub/authority split and
    * [[graft.operators.Similarity.knnDiversify]]'s motivation: per
    * label block, how many directed nearest-neighbor edges are
    * MUTUAL (you are my top-3 and I am yours). Low reciprocity marks
    * hubness — a few vectors absorb everyone's out-edges without
    * reciprocating, the known failure mode of high-dimensional k-NN
    * graphs.
    *
    * One self-join of the degree-bounded edge relation on the
    * reversed key, all within-label; the census is |labels| rows. */
  def reciprocity(spark: SparkSession, dir: String): DataFrame = {
    val e = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val mutual = e.join(
      e.select(col("label"), col("v2").as("v1"), col("v1").as("v2")),
      Seq("label", "v1", "v2"), "left_semi")
    e.groupBy(col("label")).agg(count(lit(1)).as("n_directed"))
      .join(mutual.groupBy(col("label")).agg(count(lit(1)).as("n_mutual")),
        Seq("label"), "left")
      .select(col("label"), col("n_directed"),
        coalesce(col("n_mutual"), lit(0L)).as("n_mutual"),
        round(coalesce(col("n_mutual"), lit(0L)).cast("double") /
          col("n_directed"), 6).as("reciprocity"))
      .orderBy(col("label"))
  }

  /** 4-CYCLE (square) census per label over the k-NN similarity graph
    * — the higher-order motif next to [[triangles]]: squares are the
    * signature of BIPARTITE-like structure (two hub vectors sharing
    * two satellites) that triangle counts are blind to. Counted via
    * the diagonal identity: every unordered vertex pair (a, b) with m
    * common neighbors closes C(m, 2) squares on its diagonal, and each
    * square has exactly two diagonals, so #C4 = Σ C(m, 2) / 2 — the
    * same wedge-through-center join [[linkPredict]] already bounds
    * (≤ C(2k, 2) pairs per center vertex; never all-pairs).
    *
    * All integers end to end; the /2 is exact because the diagonal sum
    * is even by the identity.
    *
    * Plan: the degree-bounded k-NN edge kernel, one wedge self-join at
    * center grain, a pair-grain count, a label-grain reduce. */
  def squares(spark: SparkSession, dir: String): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2"))
    val und = edges
      .select(col("label"), col("v1").as("u"), col("v2").as("v"))
      .union(edges.select(col("label"), col("v2").as("u"),
        col("v1").as("v")))
      .distinct()
    val pairs = und.select(col("label"), col("u").as("c"),
        col("v").as("a"))
      .join(und.select(col("label"), col("u").as("c"),
        col("v").as("b")), Seq("label", "c"))
      .filter(col("a") < col("b"))
      .groupBy(col("label"), col("a"), col("b"))
      .agg(count(lit(1)).as("m"))
    pairs.groupBy(col("label"))
      .agg(count(lit(1)).as("n_diag_pairs"),
        sum(expr("(m * (m - 1)) DIV 2")).as("c2_sum"))
      .select(col("label"), col("n_diag_pairs"),
        expr("CAST(c2_sum DIV 2 AS BIGINT)").as("n_squares"))
      .orderBy(col("label"))
  }

  /** LOCAL clustering-coefficient census per label — the per-vertex
    * refinement of [[triangles]]' global transitivity: for every
    * vertex, cc(v) = closed wedges at v / C(deg, 2), found by counting
    * each vertex's adjacent-neighbor pairs through the SAME
    * degree-bounded wedge join the square census uses (neighbor pairs
    * (a, b) of center v that are themselves edges). Reported per
    * label: the mean local cc (quantized per-vertex before the mean —
    * the Watts–Strogatz statistic, ≠ global transitivity), the share
    * of fully-clustered vertices (cc = 1), and the zero-cc share.
    *
    * Plan: wedge join at center grain (≤ C(2k,2) pairs per vertex),
    * an edge semi-join to keep closed wedges, two vertex-grain aggs,
    * a label census. All integer until the final ratios. */
  def localClusteringCoefficient(spark: SparkSession,
      dir: String): DataFrame = {
    val edges = Similarity.knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2"))
    val und = edges
      .select(col("label"), col("v1").as("u"), col("v2").as("v"))
      .union(edges.select(col("label"), col("v2").as("u"),
        col("v1").as("v")))
      .distinct()
    val deg = und.groupBy(col("label"), col("u"))
      .agg(count(lit(1)).as("deg"))
    // neighbor pairs of each center that are themselves adjacent
    val closed = und.select(col("label"), col("u").as("c"),
        col("v").as("a"))
      .join(und.select(col("label"), col("u").as("c"),
        col("v").as("b")), Seq("label", "c"))
      .filter(col("a") < col("b"))
      .join(und.select(col("label"), col("u").as("a"),
        col("v").as("b"), lit(1L).as("hit")),
        Seq("label", "a", "b"), "left_semi")
      .groupBy(col("label"), col("c"))
      .agg(count(lit(1)).as("closed"))
    val perV = deg
      .join(closed.withColumnRenamed("c", "u"),
        Seq("label", "u"), "left")
      .withColumn("wedges", expr("(deg * (deg - 1)) DIV 2"))
      .withColumn("cc",
        when(col("wedges") > 0,
          (coalesce(col("closed"), lit(0L)).cast("double") /
            col("wedges").cast("double")).cast("decimal(18,9)"))
          .otherwise(lit(0.0).cast("decimal(18,9)")))
    perV.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vertices"),
        round(sum(col("cc")).cast("double") / count(lit(1)), 6)
          .as("mean_local_cc"),
        sum((col("cc") >= 1.0).cast("long")).as("n_fully_clustered"),
        sum((col("cc") === 0.0).cast("long")).as("n_zero_cc"))
      .orderBy(col("label"))
  }

  /** One SYNCHRONOUS Louvain refinement round over the trade graph —
    * the modularity-GAIN move step that turns [[modularity]]'s static
    * census into an optimizer: starting from [[labelPropNations]]'
    * partition, every node evaluates the standard Louvain gain of
    * moving to each NEIGHBORING community,
    * ΔQ(i: a→b) = 2(k_{i,b} − k_{i,a})/2m − 2k_i(k_i + Σtot_b −
    * Σtot_a)/(2m)², takes its best strictly-positive move (ties to the
    * smaller community id), and all moves apply SIMULTANEOUSLY — the
    * parallel-Louvain variant (synchronous gain evaluation, one apply
    * per round) that a distributed engine actually runs, since
    * sequential per-node application is order-dependent and
    * unparallelizable. The readout is the per-NEW-community census
    * (size, movers absorbed, internal/total weight, Q contribution)
    * with the partition-level q_before/q_after beside it — synchronous
    * rounds may overshoot (two nodes swapping toward each other), so
    * the honest readout reports the measured after-Q rather than
    * assuming monotonicity, plus the sum of applied per-node gains
    * (each valid only if that node had moved alone) — the
    * gain_sum vs (q_after − q_before) gap IS the synchronous-collision
    * diagnostic a parallel-Louvain implementation tunes its
    * move-damping against.
    *
    * Determinism: weights, k_i, k_{i,c}, Σtot are exact
    * DECIMAL(38,0) sums (≤ ~10¹³ at bench SFs — double-exact); each
    * gain is ONE double expression over exact operands written
    * identically in both engines; per-community contributions quantize
    * to DECIMAL(28,12) before the partition sum (order-independent).
    * Self-loops cancel in ΔQ (they move with the node), so k_{i,c}
    * excludes the self-edge on both sides.
    *
    * Scale shape: the fact-scale work is [[tradeEdges]]' one join+agg;
    * the community map broadcasts into the edge relation (the Louvain
    * inner loop is one edge-grain join + two bounded aggs per round —
    * the shape that holds on a billion-edge graph); the move choice is
    * a per-NODE partitioned rank over candidate communities (bounded
    * by degree); every census after that is |communities|-sized. */
  /** One synchronous gain-move round over a (node, nbr, w) symmetric
    * edge relation and a (node, community) partition — the kernel
    * [[louvainRound]] and [[louvainFull]] share. Returns the moved
    * partition (node, cur, community) and the per-node best gains
    * (node, cand, gain). */
  private def louvainMove(sym: DataFrame,
      comm: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val m2 = sym.agg(sum(col("w")).as("tw"))
    val degN = sym.groupBy(col("node")).agg(sum(col("w")).as("ki"))
    val degC = degN.join(broadcast(comm), Seq("node"))
      .groupBy(col("community")).agg(sum(col("ki")).as("degw"))
    // k_{i,c}: node's weight into each community, self-edge excluded
    val kic = sym.filter(col("nbr") =!= col("node"))
      .join(broadcast(comm.select(col("node").as("nbr"),
        col("community").as("cand"))), Seq("nbr"))
      .groupBy(col("node"), col("cand")).agg(sum(col("w")).as("kc"))
    val cm = comm.withColumnRenamed("community", "cur")
    val kia = kic.join(broadcast(cm), Seq("node"))
      .filter(col("cand") === col("cur"))
      .select(col("node"), col("kc").as("kia"))
    val base = cm
      .join(degN, Seq("node"))
      .join(kia, Seq("node"), "left")
      .join(broadcast(degC.select(col("community").as("cur"),
        col("degw").as("dega"))), Seq("cur"))
      .select(col("node"), col("cur"), col("ki"),
        coalesce(col("kia"), lit(0L).cast("decimal(38,0)")).as("kia"),
        col("dega"))
    val twD = col("tw").cast("double")
    val gains = base
      .join(kic, Seq("node"))
      .filter(col("cand") =!= col("cur"))
      .join(broadcast(degC.select(col("community").as("cand"),
        col("degw").as("degb"))), Seq("cand"))
      .crossJoin(broadcast(m2)) // 1-row 2m scalar
      .select(col("node"), col("cur"), col("cand"),
        (lit(2.0) * (col("kc").cast("double") - col("kia").cast("double"))
          / twD -
          lit(2.0) * col("ki").cast("double") *
            (col("ki").cast("double") + col("degb").cast("double") -
              col("dega").cast("double")) / (twD * twD)).as("gain"))
    val best = gains
      .withColumn("rn", row_number().over(Window.partitionBy(col("node"))
        .orderBy(col("gain").desc, col("cand"))))
      .filter(col("rn") === 1)
      .select(col("node"), col("cand"), col("gain"))
    val comm2 = comm.withColumnRenamed("community", "cur")
      .join(broadcast(best), Seq("node"), "left")
      .select(col("node"), col("cur"),
        when(col("gain") > 0.0, col("cand")).otherwise(col("cur"))
          .as("community"))
      .localCheckpoint() // node-sized; reused by census + both Q sums
    (comm2, best)
  }

  /** Per-community modularity census over a (node, nbr, w) symmetric
    * edge relation and a (node, community) map: size, internal weight,
    * degree mass, DECIMAL(28,12) Q contribution — the shared readout
    * grain of [[louvainRound]] and [[louvainFull]]. */
  private def louvainQCensus(sym: DataFrame, cm: DataFrame): DataFrame = {
    val m2 = sym.agg(sum(col("w")).as("tw"))
    val degN = sym.groupBy(col("node")).agg(sum(col("w")).as("ki"))
    val twD = col("tw").cast("double")
    val internal = sym
      .join(broadcast(cm.select(col("node"), col("community"))),
        Seq("node"))
      .join(broadcast(cm.select(col("node").as("nbr"),
        col("community").as("c2"))), Seq("nbr"))
      .filter(col("community") === col("c2"))
      .groupBy(col("community")).agg(sum(col("w")).as("in_w"))
    degN.join(broadcast(cm.select(col("node"), col("community"))),
        Seq("node"))
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("ki")).as("deg_w"))
      .join(internal, Seq("community"), "left")
      .crossJoin(broadcast(m2)) // 1-row total-weight scalar
      .select(col("community"), col("n_nodes"),
        coalesce(col("in_w"), lit(0L).cast("decimal(38,0)"))
          .as("in_w"), col("deg_w"),
        (coalesce(col("in_w"), lit(0L).cast("decimal(38,0)"))
            .cast("double") / twD -
          (col("deg_w").cast("double") / twD) *
            (col("deg_w").cast("double") / twD))
          .cast("decimal(28,12)").as("contrib"))
  }

  def louvainRound(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir) // ONE fact pass for both views
    val sym = symOfEdges(edges).localCheckpoint()
    val comm = labelPropOnEdges(spark, dir, edges)
      .select(col("node"), col("community")).localCheckpoint()
    val (comm2, best) = louvainMove(sym, comm)
    def qCensus(cm: DataFrame): DataFrame = louvainQCensus(sym, cm)
    // the sum of the APPLIED per-node gains — each valid only if that
    // node moved alone; reported beside the realized q_after − q_before
    // so the synchronous-collision gap is part of the readout
    val gainSum = best.filter(col("gain") > 0.0)
      .agg(sum(col("gain").cast("decimal(28,12)")).as("gs"))
      .select(coalesce(col("gs"), lit(0).cast("decimal(28,12)"))
        .as("gain_sum"))
    val qBefore = qCensus(comm.select(col("node"), col("community")))
      .agg(sum(col("contrib")).as("q_before"))
    val after = qCensus(comm2.select(col("node"), col("community")))
    val qAfter = after.agg(sum(col("contrib")).as("q_after"))
    val movers = comm2.filter(col("community") =!= col("cur"))
      .groupBy(col("community")).agg(count(lit(1)).as("n_moved_in"))
    after
      .join(movers, Seq("community"), "left")
      .crossJoin(broadcast(qBefore)).crossJoin(broadcast(qAfter))
      .crossJoin(broadcast(gainSum)) // 1-row expected-ΔQ scalar
      .select(col("community"), col("n_nodes"),
        coalesce(col("n_moved_in"), lit(0L)).as("n_moved_in"),
        col("in_w").cast("long").as("in_w"),
        col("deg_w").cast("long").as("deg_w"),
        round(col("contrib").cast("double"), 6).as("contribution"),
        round(col("q_before").cast("double"), 6).as("q_before"),
        round(col("q_after").cast("double"), 6).as("q_after"),
        round(col("gain_sum").cast("double"), 6).as("gain_sum"))
      .orderBy(col("community"))
  }

  /** FULL Louvain level step (r15 verdict item 4) — [[louvainRound]]'s
    * synchronous move round closed into the real algorithm's loop
    * shape (the `sim_kmeans_lloyd2` full-loop discipline applied to
    * community detection). LEVEL 1 runs the gain-move round from
    * [[labelPropNations]]' partition and ACCEPTS the moved partition
    * only if the realized Q did not fall (the standard
    * synchronous-collision guard: rejection keeps the start
    * partition, so Q is monotone BY CONSTRUCTION rather than by
    * hope — the relational `when` over the two exact-decimal Q
    * scalars, no driver branch). The accepted partition then
    * COARSENS into its community super-graph — one super-node per
    * community, inter-community weights summed, internal mass as
    * self-loops — which preserves every per-community Q contribution
    * OPERAND-FOR-OPERAND (same in_w, deg_w, 2m), so
    * q_start(level 2) == q_end(level 1) EXACTLY (the spec asserts
    * it). LEVEL 2 re-runs the accepted move round on the coarse
    * graph from the identity partition. One row per level: graph
    * size, community counts, accepted mover count, self-loop mass,
    * and the q_start/q_move/q_end trajectory whose q_end is
    * non-decreasing across rows.
    *
    * Determinism: the move and census kernels are the SAME functions
    * as [[louvainRound]] (exact DECIMAL(38,0) operands, one double
    * expression per gain/contribution, DECIMAL(28,12) quantization
    * before the order-independent Q sums); the acceptance compare is
    * exact decimal. Scale shape: level 1 is louvainRound's plan;
    * coarsening is one edge-grain groupBy at community width; level 2
    * runs entirely on the |communities|-bounded super-graph. */
  private def louvainQSumOf(sym: DataFrame, cm: DataFrame,
      as: String): DataFrame =
    louvainQCensus(sym, cm).agg(sum(col("contrib")).as(as))

  /** One Louvain LEVEL: the synchronous gain-move round, ACCEPTED only
    * if realized Q did not fall (exact-decimal relational `when`), as a
    * (1-row readout, accepted node-partition) pair — the level kernel
    * [[louvainFull]] and [[louvainConverge]] share, so the convergence
    * loop can never drift from the gated 2-level row. */
  private def louvainLevelRow(level: Int, sym: DataFrame,
      start: DataFrame): (DataFrame, DataFrame) = {
    val (moved, _) = louvainMove(sym, start)
    val qs = louvainQSumOf(sym, start, "qs")
    val qm = louvainQSumOf(sym,
      moved.select(col("node"), col("community")), "qm")
    val acc = moved.crossJoin(broadcast(qs)).crossJoin(broadcast(qm))
      .select(col("node"), col("cur"),
        when(col("qm") >= col("qs"), col("community"))
          .otherwise(col("cur")).as("community"))
      .localCheckpoint() // node-sized; reused by census + coarsening
    val counts = start.agg(count(lit(1)).as("n_nodes"),
      countDistinct(col("community")).as("n_communities_start"))
    val endCounts = acc.agg(
      countDistinct(col("community")).as("n_communities_end"),
      sum((col("community") =!= col("cur")).cast("long"))
        .as("n_moved"))
    val selfW = sym.filter(col("node") === col("nbr"))
      .agg(coalesce(sum(col("w")), lit(0).cast("decimal(38,0)"))
        .as("self_w"))
    val row = counts.crossJoin(broadcast(endCounts))
      .crossJoin(broadcast(selfW))
      .crossJoin(broadcast(qs)).crossJoin(broadcast(qm)) // 1-row scalars
      .select(lit(level.toLong).as("level"), col("n_nodes"),
        col("n_communities_start"), col("n_moved"),
        col("n_communities_end"),
        col("self_w").cast("long").as("self_loop_w"),
        round(col("qs").cast("double"), 6).as("q_start"),
        round(col("qm").cast("double"), 6).as("q_move"),
        round(greatest(col("qs"), col("qm")).cast("double"), 6)
          .as("q_end"))
    (row, acc)
  }

  /** Coarsen the ACCEPTED partition: community super-graph with the
    * internal mass as self-loops — Q-preserving by construction
    * (same in_w, deg_w, 2m operand-for-operand). */
  private def louvainCoarsen(sym: DataFrame, acc: DataFrame): DataFrame = {
    val cmap = acc.select(col("node"), col("community"))
    sym
      .join(broadcast(cmap), Seq("node"))
      .join(broadcast(cmap.select(col("node").as("nbr"),
        col("community").as("c2"))), Seq("nbr"))
      .groupBy(col("community").as("node"), col("c2").as("nbr"))
      .agg(sum(col("w")).as("w"))
      .localCheckpoint() // |communities|²-bounded super-graph
  }

  def louvainFull(spark: SparkSession, dir: String): DataFrame = {
    val edges = tradeEdges(spark, dir) // ONE fact pass for both views
    val sym1 = symOfEdges(edges).localCheckpoint()
    val comm0 = labelPropOnEdges(spark, dir, edges)
      .select(col("node"), col("community")).localCheckpoint()
    val (row1, acc1) = louvainLevelRow(1, sym1, comm0)
    val sym2 = louvainCoarsen(sym1, acc1)
    val comm20 = sym2.select(col("node")).distinct()
      .select(col("node"), col("node").as("community"))
      .localCheckpoint()
    val (row2, _) = louvainLevelRow(2, sym2, comm20)
    row1.unionByName(row2).orderBy(col("level"))
  }

  /** Louvain TO CONVERGENCE (r16 verdict item 5) — [[louvainFull]]'s
    * two fixed levels generalized to the real algorithm's outer loop:
    * levels run until a round ACCEPTS zero moves (the converged round
    * itself still executes and is emitted — its n_moved = 0 row IS the
    * convergence certificate), bounded by `maxLevels` = 4 (structural:
    * each level contracts communities, and the trade graph's nation
    * width converges in 2-3). One row per EXECUTED level; q_start of
    * each level equals q_end of the previous one EXACTLY (coarsening
    * preserves every Q operand) and q_end is non-decreasing across ALL
    * rows (each level's acceptance guard). Levels 1-2 are bit-equal to
    * [[louvainFull]]'s rows — the SAME [[louvainLevelRow]] /
    * [[louvainCoarsen]] kernels run (the spec pins it).
    *
    * Loop discipline: the starComponents convergence loop — one
    * blocking action per level (the accepted partition's checkpoint)
    * plus ONE bounded driver read (the 1-row level readout's n_moved;
    * bound written at the collect). Scale shape: level 1 is
    * louvainRound's plan; every later level runs on the
    * |communities|²-bounded super-graph. */
  def louvainConverge(spark: SparkSession, dir: String,
      maxLevels: Int = 4): DataFrame = {
    val edges = tradeEdges(spark, dir) // ONE fact pass for both views
    var sym = symOfEdges(edges).localCheckpoint()
    var start = labelPropOnEdges(spark, dir, edges)
      .select(col("node"), col("community")).localCheckpoint()
    var rows = Vector.empty[DataFrame]
    var level = 1
    var moving = true
    while (moving && level <= maxLevels) {
      val (row, acc) = louvainLevelRow(level, sym, start)
      val r = row.localCheckpoint() // 1-row level readout
      rows = rows :+ r
      // bounded driver-side convergence read: ONE row, one long — the
      // accepted-mover count of the level that just executed
      moving = r.select(col("n_moved")).collect()(0).getLong(0) > 0
      if (moving && level < maxLevels) {
        sym = louvainCoarsen(sym, acc)
        start = sym.select(col("node")).distinct()
          .select(col("node"), col("node").as("community"))
          .localCheckpoint()
      }
      level += 1
    }
    rows.reduce(_.unionByName(_)).orderBy(col("level"))
  }
}
