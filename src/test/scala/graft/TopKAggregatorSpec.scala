package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

/** Unit + query-level coverage for the typed top-k Aggregator. */
class TopKAggregatorSpec extends SparkSpec {

  test("reduce keeps at most k, ordered desc by value, id asc on ties") {
    val a = new TopKAggregator(3)
    val rows = Seq((5.0, 2L), (7.0, 9L), (5.0, 1L), (9.0, 4L), (1.0, 7L))
    val buf = rows.foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) == Seq((9.0, 4L), (7.0, 9L), (5.0, 1L)))
  }

  test("merge is order-insensitive (partial-aggregation safety)") {
    val a = new TopKAggregator(2)
    val left = Seq((3.0, 1L), (2.0, 2L)).foldLeft(a.zero)(a.reduce)
    val right = Seq((5.0, 3L), (1.0, 4L)).foldLeft(a.zero)(a.reduce)
    assert(a.merge(left, right) == a.merge(right, left))
    assert(a.finish(a.merge(left, right)) == Seq((5.0, 3L), (3.0, 1L)))
  }

  test("random data: equals sort-take under any partition split (property)") {
    val a = new TopKAggregator(5)
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(60)
      // duplicate values on purpose: tie-break must stay deterministic
      val rows = (0 until n).map(i => (rnd.nextInt(8).toDouble, i.toLong))
      val expect = rows.sortBy { case (v, id) => (-v, id) }.take(5)
      // fold under a random 3-way split with merges in shuffled order
      val parts = rows.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(a.zero)(a.reduce)))
      val merged = bufs.foldLeft(a.zero)(a.merge)
      assert(a.finish(merged) == expect, s"seed=$seed")
    }
  }

  test("query matches the window-rank formulation on real data") {
    val viaAgg = graft.operators.Relational.topkAggregated(spark, sf0001)
    val orders = Tables(spark, sf0001, "orders")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"),
        col("o_totalprice").as("price"), col("o_orderkey").as("orderkey"))
      .orderBy(col("o_orderpriority"), col("rk"))
    assert(viaAgg.collect().toSeq == viaWindow.collect().toSeq)
  }
}
