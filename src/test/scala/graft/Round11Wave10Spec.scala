package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Quality, Relational}

/** Round-11 wave-10 operators: scalar replays for the Pareto skyline,
  * Croston/SBA intermittent-demand forecasts, and approximate-FD
  * discovery. */
class Round11Wave10Spec extends SparkSpec {

  private def q9(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("docs_skyline_pareto matches a scalar dominance replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1).filter(_.nonEmpty)
        (r.getLong(0), toks.length.toLong, toks.distinct.length.toLong)
      }
    // the round-12 dominance ordering: equal-length rows compete on
    // TTR first (higher TTR precedes), so an equal-length lower-TTR
    // doc always sees its dominator in the running max
    val sorted = docs.sortBy { case (id, n, ty) =>
      (-n, -q9(ty.toDouble / n), id) }
    var best = BigDecimal(-1)
    val frontier = sorted.flatMap { case (id, n, ty) =>
      val ttr = q9(ty.toDouble / n)
      if (ttr > best) { best = ttr; Some((id, n, ty)) } else None
    }
    val got = Curation.skylinePareto(spark, sf0001).collect()
    assert(got.length === frontier.length)
    got.zip(frontier).zipWithIndex.foreach { case ((r, (id, n, ty)), i) =>
      assert(r.getInt(0) === i + 1)
      assert(r.getLong(1) === id, s"doc at rank ${i + 1}")
      assert(r.getLong(2) === n && r.getLong(3) === ty)
    }
    // frontier members are mutually non-dominated
    frontier.sliding(2).foreach { w =>
      if (w.length == 2) {
        assert(w(0)._2 >= w(1)._2)
        assert(q9(w(0)._3.toDouble / w(0)._2) < q9(w(1)._3.toDouble / w(1)._2))
      }
    }
  }

  test("orders_croston matches a scalar SES replay") {
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"),
        (year(date_trunc("month", col("l_shipdate"))) * 12 +
          month(date_trunc("month", col("l_shipdate")))).cast("long"),
        round(col("l_quantity") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val monthly = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val byPart = monthly.keys.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq.sorted).toMap
    val top = byPart.toSeq.sortBy { case (k, ms) => (-ms.length, k) }
      .take(5)
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def ses(xs: Seq[Double]): Double = {
      val n = xs.length
      xs.zipWithIndex.map { case (x, i) =>
        val t = i + 1
        val w = if (t == 1) math.pow(0.8, n - 1)
        else 0.2 * math.pow(0.8, (n - t).toDouble)
        q12(w * x)
      }.sum.toDouble
    }
    val got = Relational.crostonForecast(spark, sf0001).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val part = r.getLong(0)
      val ms = byPart(part)
      assert(r.getLong(1) === ms.length.toLong)
      val zs = ms.map(m => monthly((part, m)).toDouble)
      val gaps = ms.sliding(2).map(w => (w(1) - w(0)).toDouble).toSeq
      val zS = ses(zs); val pS = ses(gaps)
      assert(math.abs(r.getDouble(2) - zS / 100.0) < 1e-5, s"z_ses $part")
      assert(math.abs(r.getDouble(3) - pS) < 1e-5, s"p_ses $part")
      assert(math.abs(r.getDouble(4) - zS / pS / 100.0) < 1e-5)
      assert(math.abs(r.getDouble(5) - zS / pS / 100.0 * 0.9) < 1e-5)
      // an interval forecast can never be under one month
      assert(r.getDouble(3) >= 1.0 - 1e-9)
    }
  }

  test("dq_fd_discovery matches a scalar group replay and is " +
    "direction-sensitive") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_custkey").cast("string"),
        col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))
      .collect()
      .map(r => Map("o_custkey" -> r.getString(0),
        "o_orderstatus" -> r.getString(1),
        "o_orderpriority" -> r.getString(2),
        "o_orderdate" -> r.getString(3)))
    val got = Quality.fdDiscovery(spark, sf0001).collect()
    assert(got.length === 12)
    got.foreach { r =>
      val a = r.getString(0); val b = r.getString(1)
      val groups = rows.groupBy(_(a))
      assert(r.getLong(2) === groups.size.toLong, s"n_groups $a->$b")
      val viol = groups.values.count(_.map(_(b)).distinct.length > 1)
      assert(r.getLong(3) === viol.toLong, s"n_violating $a->$b")
      val g3 = groups.values.map { g =>
        g.length - g.groupBy(_(b)).values.map(_.length).max
      }.sum
      assert(r.getLong(4) === g3.toLong, s"g3_rows $a->$b")
      assert(math.abs(r.getDouble(5) - g3.toDouble / rows.length) < 1e-6)
      assert(r.getBoolean(6) === (viol == 0))
    }
  }
}
