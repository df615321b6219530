package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Relational, Similarity}

/** Round-12 wave-5 operators: semantic-drift JS monitor, VARIANT
  * aggregation, and the Theil–Sen robust trend — scalar replays on
  * sf0.001. */
class Round12Wave5Spec extends SparkSpec {

  test("sim_semantic_drift matches a scalar bucket-JS replay") {
    val vs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val seeds = vs.sortBy(_._1).take(8)
    val assigned = vs.map { case (_, lbl, e) =>
      val best = seeds.map { case (sid, _, se) => (cos(e, se), -sid) }
        .max // max sim, then max(-sid) = min seed id
      (lbl, -best._2)
    }
    val global = assigned.groupBy(_._2).map { case (b, g) =>
      b -> g.length }
    val nAll = assigned.length
    val got = Similarity.semanticDrift(spark, sf0001).collect()
    got.foreach { r =>
      val lbl = r.get(0).toString.toLong
      val mine = assigned.filter(_._1 == lbl)
      assert(r.getLong(1) === mine.length.toLong)
      val byB = mine.groupBy(_._2).map { case (b, g) => b -> g.length }
      val js = global.keys.toSeq.sorted.map { b =>
        val p = byB.getOrElse(b, 0).toDouble / mine.length
        val q = global(b).toDouble / nAll
        val m = (p + q) / 2.0
        val t = (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
          (if (q > 0) q * math.log(q / m) / 2 else 0.0)
        BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      assert(math.abs(r.getDouble(2) - js) < 1e-5, s"JS for $lbl")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= math.log(2.0))
      val top = byB.toSeq.map { case (b, c) => (c, b) }.max
      assert(r.getLong(3) === top._2, "top bucket")
      assert(math.abs(r.getDouble(4) -
        top._1.toDouble / mine.length) < 1e-4)
    }
  }

  test("json_variant_agg matches the string-path JSON extraction") {
    val got = EventAnalytics.variantAgg(spark, sf0001).collect()
    val exp = Tables(spark, sf0001, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("nk"),
        min(col("k")).as("mn"), max(col("k")).as("mx"),
        sum(col("k")).as("s"))
      .orderBy(col("event_type")).collect()
    assert(got.length === exp.length)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) === e.getString(0))
      assert(g.getLong(1) === e.getLong(1), "n")
      assert(g.getLong(2) === e.getLong(2), "variant get == json get")
      assert(g.getLong(3) === 0L, "missing path probes all null")
      assert(g.getLong(4) === e.getLong(2 + 1), "min")
      assert(g.getLong(5) === e.getLong(4), "max")
      assert(g.getLong(6) === e.getLong(5), "sum")
    }
  }

  test("orders_theil_sen matches a scalar pairwise-median replay and " +
    "resists a planted outlier better than OLS") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .orderBy(col("day")).collect()
    val day0 = daily.map(_.getDate(0).toLocalDate).min(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val pts = daily.map(r => (java.time.temporal.ChronoUnit.DAYS
      .between(day0, r.getDate(0).toLocalDate), r.getLong(1)))
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      (t1, c1) = pts(i); (t2, c2) = pts(j)
      s = if (t1 < t2) ((c2 - c1).toDouble / (t2 - t1), t1, t2)
          else ((c1 - c2).toDouble / (t1 - t2), t2, t1)
    } yield s).sortBy { case (s, a, b) => (s, a, b) }
    val n = slopes.length
    val sen = slopes((n + 1) / 2 - 1)._1 // lower median, ceil-rank
    val bs = pts.map { case (t, c) => (c.toDouble - sen * t, t) }
      .sortBy(identity)
    val intercept = bs((pts.length + 1) / 2 - 1)._1
    val got = Relational.theilSen(spark, sf0001).collect().head
    assert(got.getLong(0) === pts.length.toLong)
    assert(got.getLong(1) === n.toLong)
    assert(math.abs(got.getDouble(2) - sen / 100.0) < 1e-4, "slope")
    assert(math.abs(got.getDouble(3) - intercept / 100.0) < 5e-2)
    // robustness: planting one huge day moves OLS more than Sen
    val planted = pts :+ (pts.map(_._1).max + 1, pts.map(_._2).max * 50)
    def olsSlope(ps: Seq[(Long, Long)]): Double = {
      val m = ps.length
      val st = ps.map(_._1).sum.toDouble; val sc = ps.map(_._2).sum
      val stc = ps.map(p => p._1.toDouble * p._2).sum
      val stt = ps.map(p => p._1.toDouble * p._1).sum
      (stc - st * sc.toDouble / m) / (stt - st * st / m)
    }
    def senSlope(ps: Seq[(Long, Long)]): Double = {
      val ss = (for {
        i <- ps.indices; j <- (i + 1) until ps.length
      } yield (ps(j)._2 - ps(i)._2).toDouble /
        (ps(j)._1 - ps(i)._1)).sorted
      ss((ss.length + 1) / 2 - 1)
    }
    val olsShift = math.abs(olsSlope(planted) - olsSlope(pts))
    val senShift = math.abs(senSlope(planted) - senSlope(pts))
    assert(senShift < olsShift, "Sen slope is the robust one")
  }
}
