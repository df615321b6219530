package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Quality, Relational, Similarity,
  StreamingAnalytics, TextAnalysis}

/** Property coverage for the round-14 additions, beyond the automatic
  * smoke/oracle gates: the KMV merge law (signature-union bottom-k ==
  * from-scratch bottom-k — the mergeability claim both kmv rows stand
  * on), the Louvain round's consistency with the standalone modularity
  * census, and structural invariants of the beam-search, fertility and
  * Bass readouts. */
class Round14OpsSpec extends SparkSpec {

  private def hx(prefix: String, c: org.apache.spark.sql.Column) =
    substring(md5(concat(lit(prefix), c.cast("string"))), 1, 12)

  test("sketch_kmv: pair union estimate equals from-scratch bottom-k " +
    "over the combined audience (KMV merge law)") {
    val out = Quality.kmvSketch(spark, sf0001).collect()
    assert(out.nonEmpty)
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).distinct()
    for (r <- out) {
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val combined = ev
        .filter(col("event_type") === ta || col("event_type") === tb)
        .select(hx("u:", col("user_id")).as("hx")).distinct()
        .orderBy(col("hx")).limit(32)
        .agg(count(lit(1)).as("n"), max(col("hx")).as("hmax"))
        .select(col("n"),
          (conv(col("hmax"), 16, 10).cast("long").cast("double") /
            pow(lit(16.0), lit(12))).as("vk"))
        .collect().head
      val expected =
        if (combined.getLong(0) < 32) combined.getLong(0).toDouble
        else 31.0 / combined.getDouble(1)
      val got = r.getAs[Double]("est_union")
      assert(math.abs(got - math.rint(expected * 1e6) / 1e6) < 1e-9,
        s"($ta,$tb): merged-signature est_union $got != scratch $expected")
    }
  }

  test("sketch_kmv: estimates land near exact at k=32 (sanity band)") {
    val out = Quality.kmvSketch(spark, sf0001).collect()
    for (r <- out) {
      val exact = r.getAs[Long]("exact_union").toDouble
      val est = r.getAs[Double]("est_union")
      assert(math.abs(est - exact) <= exact * 0.6,
        s"est_union $est vs exact $exact out of the loose k=32 band")
    }
  }

  test("stream_kmv_distinct: each maintained state equals the " +
    "from-scratch bottom-k over its cumulative prefix") {
    val out = StreamingAnalytics.streamKmvDistinct(spark, sf0001)
      .collect().map(r => r.getAs[Long]("increment") -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    val ev = Tables(spark, sf0001, "events")
    val t0 = ev.agg(min(col("ts")).as("t0"))
    def scratch(prefixOnly: Boolean): Double = {
      val base = ev.crossJoin(broadcast(t0))
      val rows = (if (prefixOnly)
        base.filter(col("ts") < col("t0") + expr("INTERVAL 15 DAYS"))
      else base)
        .select(hx("u:", col("user_id")).as("hx")).distinct()
        .orderBy(col("hx")).limit(32)
        .agg(count(lit(1)).as("n"), max(col("hx")).as("hmax"))
        .select(col("n"),
          (conv(col("hmax"), 16, 10).cast("long").cast("double") /
            pow(lit(16.0), lit(12))).as("vk"))
        .collect().head
      if (rows.getLong(0) < 32) rows.getLong(0).toDouble
      else 31.0 / rows.getDouble(1)
    }
    for ((inc, pfx) <- Seq(1L -> true, 2L -> false)) {
      val want = math.rint(scratch(pfx) * 1e6) / 1e6
      val got = out(inc).getAs[Double]("est_distinct")
      assert(math.abs(got - want) < 1e-9,
        s"increment $inc maintained est $got != from-scratch $want")
    }
  }

  test("graph_louvain: q_before matches the standalone modularity " +
    "census and the partition covers all 25 nations") {
    val out = Graph.louvainRound(spark, sf0001).collect()
    assert(out.map(_.getAs[Long]("n_nodes")).sum === 25L)
    val qBefore = out.head.getAs[Double]("q_before")
    val modSum = Graph.modularity(spark, sf0001).collect()
      .map(_.getAs[Double]("contribution")).sum
    assert(math.abs(qBefore - modSum) < 1e-4,
      s"q_before $qBefore != modularity census sum $modSum")
    val qAfter = out.head.getAs[Double]("q_after")
    val contribSum = out.map(_.getAs[Double]("contribution")).sum
    assert(math.abs(qAfter - contribSum) < 1e-4,
      s"q_after $qAfter != sum of reported contributions $contribSum")
  }

  test("sim_beam_search: one row per (beam, label); recall and " +
    "explored-set invariants hold") {
    val out = Similarity.beamSearch(spark, sf0001).collect()
    // expected labels derive from the EMBEDDINGS relation, not from
    // the output itself — a label beamSearch silently dropped (empty
    // truth set via the inner truthN join) must FAIL here, not shrink
    // the readout. Labels with >= 2 vectors have non-empty truth.
    val expected = Tables(spark, sf0001, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(_.getAs[Int]("label")).toSet
    assert(expected.nonEmpty)
    val labels = out.map(_.getAs[Int]("label")).distinct
    assert(labels.toSet === expected,
      s"output labels ${labels.toSet} != embeddings-derived $expected")
    assert(out.length === expected.size * 3)
    for (r <- out) {
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_explored") >= 1L)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
      if (r.getAs[Boolean]("reached_nn"))
        assert(r.getAs[Long]("n_hit") >= 1L)
      // rounded-at-4 values can cross by half an ulp of the rounding
      assert(r.getAs[Double]("best_sim") <= r.getAs[Double]("nn_sim") + 1e-4)
    }
  }

  test("text_tokenizer_fertility: both arms census the same word " +
    "totals; BPE covers everything; ratios are sane") {
    val out = TextAnalysis.tokenizerFertility(spark, sf0001).collect()
    val byArm = out.groupBy(_.getAs[String]("arm"))
    assert(byArm.keySet === Set("bpe", "unigram"))
    val bpeTot = byArm("bpe")
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("total_words"))
      .toMap
    val uniTot = byArm("unigram")
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("total_words"))
      .toMap
    assert(bpeTot === uniTot, "arms disagree on the shared eval corpus")
    for (r <- byArm("bpe"))
      assert(r.getAs[Long]("covered_words") === r.getAs[Long]("total_words"),
        "corpus-trained BPE must cover every eval word")
    for (r <- out) {
      assert(r.getAs[Long]("covered_words") <= r.getAs[Long]("total_words"))
      if (r.getAs[Long]("covered_words") > 0)
        assert(r.getAs[Double]("pieces_per_word") >= 1.0)
      if (r.getAs[Long]("total_pieces") > 0)
        assert(r.getAs[Double]("chars_per_piece") > 0.0)
    }
  }

  test("text_wordpiece_greedy: greedy never beats Viterbi on cost; " +
    "both arms strand on the same OOV set") {
    val out = TextAnalysis.wordpieceGreedy(spark, sf0001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val covered = r.getAs[Long]("covered_words")
      assert(covered <= r.getAs[Long]("total_words"))
      if (covered > 0) {
        assert(r.getAs[Double]("excess_nll_pw") >= -1e-12,
          "greedy cost below the Viterbi minimum is impossible")
        val share = r.getAs[Double]("suboptimal_share")
        assert(share >= 0.0 && share <= 1.0)
        // greedy covered == viterbi covered: viterbi_pieces counts the
        // same covered set, so a zero there with covered > 0 would
        // mean the two arms disagree on OOV
        assert(r.getAs[Long]("viterbi_pieces") >= covered)
        assert(r.getAs[Long]("greedy_pieces") >= covered)
      }
    }
  }

  test("wordpiece kernels: a planted cost table where maximal-munch " +
    "is strictly suboptimal IS detected (greedy cost > Viterbi cost)") {
    import spark.implicits._
    // word "abcd": greedy eats "abc" then "d" (cost 5 + 1 = 6);
    // Viterbi finds "ab" + "cd" (cost 1 + 1 = 2)
    val types = Seq(("abcd", 4)).toDF("w", "len")
    val frozen = Seq(("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 1.0),
        ("ab", 1.0), ("cd", 1.0), ("abc", 5.0))
      .toDF("piece", "c0")
      .select(col("piece"), col("c0").cast("decimal(28,12)").as("cost"))
    val g = TextAnalysis.greedyPieceCounts(types, frozen, 4, 3)
      .collect().head
    val v = TextAnalysis.viterbiPieceCounts(types, frozen, 4, 3)
      .collect().head
    assert(g.getAs[Long]("np") === 2L) // "abc" + "d"
    assert(v.getAs[Long]("n_pieces") === 2L) // "ab" + "cd"
    val gc = g.getAs[java.math.BigDecimal]("cost").doubleValue()
    val vc = v.getAs[java.math.BigDecimal]("dp").doubleValue()
    assert(gc === 6.0 && vc === 2.0,
      s"planted suboptimality not detected: greedy $gc viterbi $vc")
  }

  test("dedup_cascade: funnel is monotone and tier 1 matches the " +
    "standalone exact-dedup census") {
    val out = graft.operators.DedupOps.dedupCascade(spark, sf0001)
      .collect().map(r => r.getAs[String]("stage") -> r).toMap
    assert(out.keySet === Set("1_exact", "2_minhash", "3_cosine"))
    val t1 = out("1_exact"); val t2 = out("2_minhash")
    val t3 = out("3_cosine")
    assert(t1.getAs[Long]("survivors") === t2.getAs[Long]("candidates_in"))
    assert(t2.getAs[Long]("survivors") === t3.getAs[Long]("candidates_in"))
    for (t <- Seq(t1, t2, t3)) {
      assert(t.getAs[Long]("n_removed") <= t.getAs[Long]("candidates_in"))
      assert(t.getAs[Long]("survivors") ===
        t.getAs[Long]("candidates_in") - t.getAs[Long]("n_removed"))
    }
    val exact = graft.operators.DedupOps.dedupExact(spark, sf0001)
      .agg(sum(col("n_copies")).as("rows"), count(lit(1)).as("groups"))
      .collect().head
    assert(t1.getAs[Long]("n_removed") ===
      exact.getAs[Long]("rows") - exact.getAs[Long]("groups"))
  }

  test("sample_monetary_unit: every grid point lands in exactly one " +
    "order span (hits sum to n); selected orders never exceed hits") {
    val out = graft.operators.Curation.monetaryUnitSample(spark, sf0001)
      .collect()
    assert(out.map(_.getAs[Long]("n_points_hit")).sum === 50L,
      "the mid-interval grid must partition onto the cents number line")
    for (r <- out) {
      assert(r.getAs[Long]("n_selected_orders") <=
        r.getAs[Long]("n_points_hit"))
      val ps = r.getAs[Double]("point_share")
      assert(ps >= 0.0 && ps <= 1.0)
    }
    assert(math.abs(out.map(_.getAs[Double]("point_share")).sum - 1.0)
      < 1e-9)
  }

  test("orders_bass_diffusion: one-row readout; adopter count is the " +
    "distinct-customer truth; guards never leak NaN") {
    val out = Relational.bassDiffusion(spark, sf0001).collect()
    assert(out.length === 1)
    val r = out.head
    val nCust = Tables(spark, sf0001, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(r.getAs[Long]("n_adopters") === nCust)
    assert(r.getAs[Long]("n_weeks") >= 1L)
    for (c <- Seq("coef_a", "coef_b", "coef_c", "m_hat",
        "p_innovation", "q_imitation", "peak_week")) {
      val v = r.getAs[Any](c)
      if (v != null)
        assert(!v.asInstanceOf[Double].isNaN, s"$c is NaN")
    }
  }
}
