package graft

/** Error bounds for the sketch aggregates. The oracle gate now checks the
  * within-bound booleans row-by-row (both engines emit exact values +
  * booleans); these tests additionally recompute the exact references
  * independently and check the sketch-algebra properties the booleans
  * alone can't express (union-merge deduplicates). */
class ApproxSpec extends SparkSpec {
  test("approx distinct and approx median stay within the gated bounds") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational.approxStats(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_bound"),
        s"${r.getString(0)}: HLL++ estimate out of bound")
      assert(r.getAs[Boolean]("median_within_bound"),
        s"${r.getString(0)}: approx median out of bound")
    }
    // exact columns really are exact (recomputed independently)
    val exact = Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        round(percentile(col("l_quantity"), lit(0.5)), 2).as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      assert(exact(r.getString(0)) ==
        ((r.getAs[Long]("exact_parts"), r.getAs[Double]("exact_median"))))
    }
  }

  test("HLL sketches: per-group and union-merged estimates within bound; merge dedups") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Quality.sketchHll(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).contains("ALL"))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_within_bound"),
        s"${r.getString(0)}: sketch estimate out of bound")
    }
    // union-merge must deduplicate: the global exact distinct is well
    // below the sum of the per-priority distincts (customers order under
    // several priorities), and the gated global estimate tracks IT — a
    // sum-of-parts "merge" would blow the 5% bound by ~5x.
    val per = rows.filter(_.getString(0) != "ALL")
    val all = rows.find(_.getString(0) == "ALL").get
    assert(all.getAs[Long]("exact_distinct") <
      per.map(_.getAs[Long]("exact_distinct")).sum * 0.95)
    // exact global recomputed independently
    val exactAll = Tables(spark, sf0001, "orders")
      .select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(all.getAs[Long]("exact_distinct") == exactAll)
  }
}
