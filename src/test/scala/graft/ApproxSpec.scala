package graft

/** Error bounds for the sketch aggregates (no DuckDB oracle — sketch
  * internals are engine-specific, so correctness means bounded relative
  * error against the exact computation in the same row). */
class ApproxSpec extends SparkSpec {
  test("approx distinct and approx median stay within tolerance of exact") {
    import org.apache.spark.sql.functions._
    val approx = graft.operators.Relational.approxStats(spark, sf0001)
    // exact references computed separately (mixing them into the sketch
    // agg would force an Expand — see the operator's scaladoc)
    val exact = Tables(spark, sf0001, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        percentile(col("l_quantity"), lit(0.5)).as("exact_median"))
    val rows = approx.join(exact, "l_returnflag").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approxParts = r.getAs[Long]("approx_parts").toDouble
      val exactParts = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
        s"HLL++ relative error too high: $approxParts vs $exactParts")
      val am = r.getAs[Double]("approx_median")
      val em = r.getAs[Double]("exact_median")
      assert(math.abs(am - em) <= math.max(1.0, em * 0.05),
        s"approx median too far off: $am vs $em")
    }
  }

  test("HLL sketches: per-group estimates track exact; union-merge tracks global") {
    import org.apache.spark.sql.functions._
    val sk = graft.operators.Quality.sketchHllNoracle(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val orders = Tables(spark, sf0001, "orders")
    val exactPer = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exactPer.foreach { case (p, exact) =>
      assert(math.abs(sk(p) - exact) / exact < 0.05,
        s"sketch estimate off for $p: ${sk(p)} vs $exact")
    }
    val exactAll = orders.select(countDistinct(col("o_custkey")))
      .head.getLong(0).toDouble
    assert(math.abs(sk("ALL") - exactAll) / exactAll < 0.05,
      s"merged sketch off: ${sk("ALL")} vs $exactAll")
    // merged estimate must NOT be the sum of the parts (it deduplicates
    // customers appearing under several priorities)
    assert(sk("ALL") < sk.filterKeys(_ != "ALL").values.sum * 0.95)
  }
}
