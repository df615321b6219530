package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, TextAnalysis}

/** Round-12 wave-7 operators: customer tier migration, the
  * source cross-entropy matrix, and weekday ANOVA — scalar replays on
  * sf0.001. */
class Round12Wave7Spec extends SparkSpec {

  test("orders_tier_migration matches a scalar tercile replay") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")),
        round(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ts = rows.map(_._2)
    val mid = ts.min + (ts.max - ts.min) / 2.0
    def tiers(half: Array[(Long, Long, Long)]): Map[Long, Long] = {
      val byC = half.groupBy(_._1).map { case (c, g) =>
        (c, g.map(_._3).sum) }.toSeq.sortBy { case (c, m) => (m, c) }
      val n = byC.length
      byC.zipWithIndex.map { case ((c, _), i) =>
        c -> ((i + 1).toLong * 3 + n - 1) / n }.toMap
    }
    val t1 = tiers(rows.filter(_._2 < mid))
    val t2 = tiers(rows.filter(_._2 >= mid))
    val all = (t1.keySet ++ t2.keySet).toSeq
    val cells = all.map(c => (t1.getOrElse(c, 0L), t2.getOrElse(c, 0L)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = Relational.tierMigration(spark, sf0001).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === cells(key), s"cell $key")
      // the operator rounds share to 6 decimals
      assert(math.abs(r.getDouble(3) -
        cells(key).toDouble / all.length) < 1e-6)
    }
    assert(got.map(_.getLong(2)).sum === all.length.toLong)
  }

  test("text_source_ce_matrix: diagonal is minimal per row and KL of " +
    "the diagonal reflects only the smoothing gap") {
    val got = TextAnalysis.sourceCeMatrix(spark, sf0001).collect()
    val srcs = got.map(_.getString(0)).distinct
    assert(got.length === srcs.length * srcs.length)
    srcs.foreach { a =>
      val row = got.filter(_.getString(0) == a)
      val self = row.find(_.getString(1) == a).get
      // H(P_a, Q_a-smoothed) beats H(P_a, Q_b) for every other b
      row.filter(_.getString(1) != a).foreach { r =>
        assert(self.getDouble(2) < r.getDouble(2),
          s"diagonal not minimal for $a vs ${r.getString(1)}")
      }
      // KL >= 0 up to rounding; self-KL is just the smoothing cost
      row.foreach(r => assert(r.getDouble(3) > -1e-6))
      val offDiagMin = row.filter(_.getString(1) != a)
        .map(_.getDouble(3)).min
      assert(self.getDouble(3) < offDiagMin,
        "self-KL below every cross-KL")
    }
  }

  test("orders_anova_weekday matches a scalar one-way ANOVA replay") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .select(dayofweek(col("day")).cast("long"), col("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val groups = daily.groupBy(_._1).map { case (w, g) =>
      w -> g.map(_._2.toDouble) }
    val n = daily.length
    val k = groups.size
    val grand = daily.map(_._2.toDouble).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(y => (y - m) * (y - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val got = Relational.anovaWeekday(spark, sf0001).collect()
    assert(got.length === k)
    got.foreach { r =>
      val w = r.getLong(0)
      val g = groups(w)
      assert(r.getLong(1) === g.length.toLong)
      assert(math.abs(r.getDouble(2) - g.sum / g.length / 100) < 1e-2)
      assert(r.getLong(3) === k.toLong)
      assert(r.getLong(4) === n.toLong)
      assert(math.abs(r.getDouble(5) - f) < 1e-3, "F statistic")
      assert(math.abs(r.getDouble(6) - ssb / (ssb + ssw)) < 1e-5)
    }
  }
}
