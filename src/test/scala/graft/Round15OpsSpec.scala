package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Similarity, TextAnalysis}

/** Property coverage for the round-15 additions beyond the automatic
  * smoke/oracle gates: the full Louvain level step's three structural
  * invariants — level 1 pins to the standalone move round's Q numbers,
  * coarsening preserves Q exactly, and the acceptance guard makes
  * q_end monotone non-decreasing across levels. */
class Round15OpsSpec extends SparkSpec {

  test("graph_louvain_full: level 1 pins to louvainRound's q_before/" +
    "q_after; coarsening preserves Q exactly; q_end is monotone") {
    val full = Graph.louvainFull(spark, sf0001)
      .collect().sortBy(_.getAs[Long]("level"))
    assert(full.length === 2)
    val Array(l1, l2) = full
    // level 1 IS louvainRound's synchronous move round: its q
    // trajectory must match the standalone row's readout
    val one = Graph.louvainRound(spark, sf0001).collect().head
    assert(l1.getAs[Double]("q_start") === one.getAs[Double]("q_before"))
    assert(l1.getAs[Double]("q_move") === one.getAs[Double]("q_after"))
    // the coarse super-graph starts at EXACTLY the accepted level-1 Q:
    // per-community in_w/deg_w/2m survive coarsening operand-for-operand
    assert(l2.getAs[Double]("q_start") === l1.getAs[Double]("q_end"),
      "coarsening must preserve modularity exactly")
    // acceptance guard: q_end never falls, within a level or across
    for (r <- full) {
      assert(r.getAs[Double]("q_end") >= r.getAs[Double]("q_start"))
      assert(r.getAs[Double]("q_end") >=
        math.max(r.getAs[Double]("q_start"), r.getAs[Double]("q_move"))
          - 1e-12)
      // a rejected round moves nobody; an accepted one may
      if (r.getAs[Double]("q_move") < r.getAs[Double]("q_start"))
        assert(r.getAs[Long]("n_moved") === 0L,
          "a rejected move round must leave the partition untouched")
    }
    assert(l2.getAs[Double]("q_end") >= l1.getAs[Double]("q_end"))
    // the super-graph has one node per accepted level-1 community
    assert(l2.getAs[Long]("n_nodes") ===
      l1.getAs[Long]("n_communities_end"))
    // internal mass surfaces as coarse self-loops: never less than the
    // fine graph's own self-loop weight
    assert(l2.getAs[Long]("self_loop_w") >= l1.getAs[Long]("self_loop_w"))
  }

  test("sim_pq_train: one exact integer-Lloyd pass NEVER increases " +
    "per-subspace distortion (the quantized mean is the optimal " +
    "integer codeword); census shapes hold") {
    val out = Similarity.pqTrainDistortion(spark, sf0001).collect()
    assert(out.length === 16, "one row per subspace")
    val nVecs = out.map(_.getAs[Long]("n_vectors")).distinct
    assert(nVecs.length === 1 && nVecs.head > 0,
      "every vector contributes one sub-vector per subspace")
    for (r <- out) {
      // EXACT monotonicity, no tolerance: mean step picks the optimal
      // integer codeword per cluster, re-assignment only lowers rows
      assert(r.getAs[Long]("mean_dist_trained") <=
        r.getAs[Long]("mean_dist_seed"),
        s"subspace ${r.getAs[Long]("subspace")}: Lloyd pass raised " +
          "distortion")
      assert(r.getAs[Double]("distortion_drop") >= 0.0)
      val live = r.getAs[Long]("n_live_codewords")
      assert(live >= 1L && live <= r.getAs[Long]("k_seed"))
    }
  }

  test("text_retrieval_panel_ci: paired-bootstrap invariants — " +
    "top shares partition the replicates, bands bracket the point") {
    val out = TextAnalysis.retrievalPanelCi(spark, sf0001, reps = 50)
      .collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("n_queries")).distinct.toSeq === Seq(20L))
    assert(out.map(_.getAs[Long]("n_reps")).distinct.toSeq === Seq(50L))
    // every replicate has exactly one winner (paired draw) — shares
    // sum to 1 up to the per-arm rounding
    val shareSum = out.map(_.getAs[Double]("top_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"top shares sum $shareSum")
    for (r <- out) {
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
      val bm = r.getAs[Double]("boot_mean")
      assert(bm >= r.getAs[Double]("ci_lo") - 1e-9 &&
        bm <= r.getAs[Double]("ci_hi") + 1e-9,
        "bootstrap mean must sit inside its own ceil-rank band")
      assert(r.getAs[Double]("boot_se") >= 0.0)
    }
  }

  test("text_boilerplate_lines: planted same-source boilerplate is " +
    "censused with its full drop-all token mass; cross-source and " +
    "single-doc lines are not") {
    import spark.implicits._
    val header = (1 to 10).map(i => s"hdr$i").mkString(" ") // one line
    val bodyA = (1 to 10).map(i => s"worda$i").mkString(" ")
    val bodyB = (1 to 10).map(i => s"wordb$i").mkString(" ")
    // srcX: 3 docs share the header (boilerplate, 2 occurrences in one
    // doc via a repeat), each with a unique body line; srcY: the SAME
    // header once only (single doc — not boilerplate THERE)
    val docs = Seq(
      (1L, s"$header $bodyA", "en", "srcX", 0L),
      (2L, s"$header $bodyB", "en", "srcX", 0L),
      (3L, s"$header $header", "en", "srcX", 0L),
      (4L, s"$header $bodyA", "en", "srcY", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_boiler").toString
    docs.write.parquet(s"$dir/documents.parquet")
    try {
      val out = TextAnalysis.boilerplateLines(spark, dir)
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      val x = out("srcX")
      // the header line occurs in 3 distinct srcX docs, 4 times total
      assert(x.getAs[Long]("n_boiler_lines") === 1L)
      assert(x.getAs[Long]("boiler_occurrences") === 4L)
      assert(x.getAs[Long]("docs_affected") === 3L)
      assert(x.getAs[Long]("removable_tokens") === 40L) // drop-ALL mass
      // bodyA appears in srcX once and srcY once — never same-source
      // boilerplate; srcY's lone header is single-doc there
      val y = out("srcY")
      assert(y.getAs[Long]("n_boiler_lines") === 0L)
      assert(y.getAs[Long]("removable_tokens") === 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
