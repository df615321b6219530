package graft

import org.apache.spark.sql.functions._
import graft.operators.TpchReports

/** Round 7: the last classic shapes (q4/q11/q12/q16/q20) + the ANSI-mode
  * execution guard. Value-level correctness is the DuckDB oracle gate's
  * job; these tests pin structural invariants the hash compare can't
  * express (partition-of-counts, scope containment, threshold semantics).
  */
class Round7OpsSpec extends SparkSpec {

  test("q4: late-order counts partition the semi-joined order set") {
    val rows = TpchReports.q4OrderPriority(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).distinct.length == rows.length)
    // independently recompute the total with a distinct-count formulation
    val li = Tables(spark, sf0001, "lineitem")
    val expected = Tables(spark, sf0001, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("o_orderkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == expected,
      "EXISTS semi-join must count each order once, however many late lines")
  }

  test("q11: every surviving part exceeds the 0.1% fraction; ordering is by value desc") {
    val rows = TpchReports.q11ImportantParts(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val values = rows.map(_.getDouble(1))
    assert(values.sameElements(values.sorted(Ordering[Double].reverse)))
    assert(values.forall(_ > 0))
  }

  test("q12: high+low line counts sum to the late-1997 join cardinality per flag") {
    val rows = TpchReports.q12PriorityLateness(spark, sf0001).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val expected = Tables(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .count()
    assert(total == expected, "conditional agg must partition, not sample")
  }

  test("q16: no excluded supplier contributes; counts bounded by supplier table") {
    val nSupp = Tables(spark, sf0001, "supplier").count()
    val rows = TpchReports.q16SupplierCount(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= nSupp))
    // the NOT-IN proxy: re-run with an empty exclusion by checking that
    // brands/types violate the part filter nowhere
    assert(rows.forall(r => r.getString(0) != "Brand#1" && r.getString(1) != "PROMO"))
  }

  test("q20: dominance is strict-majority — every winner ships >half its part's volume") {
    val rows = TpchReports.q20DominantSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // scope containment: all returned suppliers are EUROPE-region
    val euro = Tables(spark, sf0001, "supplier")
      .join(Tables(spark, sf0001, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf0001, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_name")).collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).forall(euro.contains))
    // strict majority means at most ONE dominant supplier per part — the
    // dominant set can never exceed the large-part count
    val nLarge = Tables(spark, sf0001, "part")
      .filter(col("p_name").like("large%")).count()
    assert(rows.length <= nLarge)
  }

  test("containment: matches an independent array_intersect recompute, " +
    "and the contained side is the smaller shingle set") {
    import graft.operators.DedupOps
    val got = DedupOps.containmentPairs(spark, sf0001).collect()
    assert(got.nonEmpty)
    // independent formulation: per-doc DISTINCT shingle SETS, pairwise
    // array_intersect on the flagged pairs only
    val sets = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        array_distinct(graft.functions.ExprColumns.shingles(spark, "text", 5))
          .as("sh"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toSet).toMap
    got.foreach { r =>
      val (d1, d2, cd, c) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val (s1, s2) = (sets(d1), sets(d2))
      val expect = (s1 & s2).size.toDouble / math.min(s1.size, s2.size)
      assert(math.abs(c - (math.rint(expect * 1000) / 1000)) < 1e-9,
        s"pair ($d1,$d2): got $c, recomputed $expect")
      assert(expect >= 0.8)
      assert(cd == (if (s1.size <= s2.size) d1 else d2),
        "contained_doc must be the smaller shingle set's doc")
    }
  }

  test("containment dominates jaccard: every jaccard>=0.8 pair appears in " +
    "the containment>=0.8 result (C = i/min >= i/union = J always)") {
    import graft.operators.DedupOps
    val cPairs = DedupOps.containmentPairs(spark, sf0001)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val jHigh = DedupOps.ngramJaccardPairs(spark, sf0001, threshold = 0.8)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(jHigh.forall(cPairs.contains),
      "containment >= jaccard pointwise, so the high-jaccard set must embed")
  }

  test("pq-adc: quality gate holds and the exact side agrees with brute force") {
    import graft.operators.Similarity
    val rows = Similarity.pqAdcRecall(spark, sf0001).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getBoolean(3), s"pq quality gate failed: $r"))
    // the exact ground-truth side must agree with the independent
    // brute-force query for q_id = 0
    val bf = Similarity.bruteForceTopK(spark, sf0001, queryId = 0L).collect().head
    val q0 = rows.find(_.getLong(0) == 0L).get
    assert(q0.getLong(1) == bf.getLong(0) &&
      q0.getDouble(2) == bf.getDouble(2))
  }

  test("ANSI mode: the division/variance/overflow-prone query classes " +
    "execute with spark.sql.ansi.enabled=true") {
    // The full 152-query ANSI sweep at sf0.01 is the CI step
    // `graft.dev.AnsiSweep` (r7 run: ok=152 fail=0, recorded in README).
    // This in-suite guard pins the historically risky classes — ratio
    // (0/0), variance (zero-variance groups), decimal-overflow sums,
    // interval arithmetic — so a regression fails fast in `sbt test`.
    val risky = Seq("events_anomaly", "regr_price_qty", "corr_price_qty",
      "skew_profile", "window_distribution", "q8_market_share",
      "text_vocab_coverage", "agg_stats", "feature_zscore", "dq_profile",
      "q4_order_priority", "q12_priority_lateness", "text_bigram_logprob")
    // Spark 4 defaults spark.sql.ansi.enabled=true, so the whole battery
    // already runs ANSI-strict everywhere (tests, Verify, Bench); pin the
    // default here so a future session-level opt-out can't silently
    // weaken the guarantee, then execute the risky set explicitly.
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the battery must keep running in ANSI mode — do not disable it")
    risky.foreach { name =>
      SparkEntry.queries(name)(spark, sf0001)
        .write.format("noop").mode("overwrite").save()
    }
  }
}
