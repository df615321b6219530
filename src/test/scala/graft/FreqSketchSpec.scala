package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.expressions.FreqSketchAgg]] (Misra-Gries heavy hitters): the
  * oracle gate checks the no-eviction regime (corpus vocabulary fits the
  * map); these specs force the regimes it can't reach — eviction under a
  * planted skew, the no-heavy-hitter flat stream, and partition-layout
  * independence of the guarantees.
  */
class FreqSketchSpec extends SparkSpec {

  private def sketchRows(df: DataFrame, maxMap: Int) = {
    graft.functions.ExprColumns.register(spark)
    df.createOrReplaceTempView("freq_spec_in")
    spark.sql(
      s"""SELECT explode(graft_freq_agg(token, $maxMap)) AS (item, v)
         FROM freq_spec_in""")
      .select(col("item"), col("v.est"), col("v.lb"), col("v.ub"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("no eviction: a small vocabulary is tracked exactly (lb = est = ub)") {
    val df = spark.range(3000)
      .select(concat(lit("w"), col("id") % 30).as("token"))
    val rows = sketchRows(df, 64)
    assert(rows.length == 30)
    rows.foreach { case (_, est, lb, ub) =>
      assert(est == 100L && lb == 100L && ub == 100L,
        "within capacity the sketch must be an exact counter")
    }
  }

  test("eviction regime: heavy hitters survive with valid loose bounds; " +
    "no tail key is promoted") {
    val tail = spark.range(20000)
      .select(concat(lit("t"), col("id")).as("token"))
    val heavy = spark.range(2000)
      .crossJoin(spark.range(5).select(col("id").as("h")))
      .select(concat(lit("H"), col("h")).as("token"))
    for (parts <- Seq(3, 16)) { // guarantees must not depend on layout
      val rows = sketchRows(tail.unionAll(heavy).repartition(parts), 64)
      val m = rows.map(r => r._1 -> r).toMap
      (0 until 5).foreach { h =>
        val key = s"H$h"
        assert(m.contains(key),
          s"$key true count 2000 exceeds the error bound — NO_FALSE_NEGATIVES " +
            s"requires it in the item set (parts=$parts)")
        val (_, _, lb, ub) = m(key)
        assert(lb <= 2000L && 2000L <= ub,
          s"$key bounds [$lb,$ub] must bracket the true count (parts=$parts)")
      }
      // eviction definitely happened (20k distinct >> 64 slots), so the
      // deterministic error bound is nonzero and bounds are loose
      assert(rows.exists { case (_, _, lb, ub) => ub > lb },
        "a saturated sketch cannot report exact counts")
      // lb <= true for EVERY item; a tail key's true count is 1
      rows.filter(_._1.startsWith("t")).foreach { case (k, _, lb, _) =>
        assert(lb <= 1L, s"$k lb=$lb fabricates mass (true count is 1)")
      }
    }
  }

  test("flat stream: no fabricated heavy hitters") {
    val df = spark.range(10000).select(concat(lit("u"), col("id")).as("token"))
    val rows = sketchRows(df, 64)
    rows.foreach { case (k, _, lb, _) =>
      assert(lb <= 1L, s"$k lb=$lb exceeds its true count 1")
    }
  }
}
