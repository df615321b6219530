package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Relational, Temporal}

/** Round-11 wave-8 operators: scalar replays for trimmed/winsorized
  * means, linear-interpolation gap fill, and the DiD pre-trends check. */
class Round11Wave8Spec extends SparkSpec {

  test("agg_trimmed_mean matches a scalar order-statistics replay") {
    val cents = Tables(spark, sf0001, "orders")
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100)).sorted
    val n = cents.length
    val got = Relational.trimmedMeans(spark, sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(1, 5, 10))
    got.foreach { r =>
      val p = r.getInt(0); val k = (n.toLong * p / 100).toInt
      assert(r.getLong(1) === k.toLong)
      val inner = cents.slice(k, n - k)
      assert(r.getLong(2) === inner.length.toLong, s"n_kept p=$p")
      assert(math.abs(r.getDouble(4) -
        inner.map(BigInt(_)).sum.toDouble / inner.length / 100.0) < 1e-3)
      val lo = cents(k); val hi = cents(n - k - 1)
      assert(math.abs(r.getDouble(6) - lo / 100.0) < 1e-9, "lo_clamp")
      assert(math.abs(r.getDouble(7) - hi / 100.0) < 1e-9, "hi_clamp")
      val winsor = (inner.map(BigInt(_)).sum + BigInt(k) * (lo + hi))
        .toDouble / n / 100.0
      assert(math.abs(r.getDouble(5) - winsor) < 1e-3, s"winsor p=$p")
      // trimming can only pull the mean toward the median side
      assert(r.getDouble(4) > 0 && r.getDouble(5) > 0)
    }
  }

  test("window_interpolate reproduces observed hours exactly and " +
    "interpolates gaps linearly") {
    val ev = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(date_trunc("hour", col("ts")).cast("long").as("h"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0) / 3600, r.getLong(1)))
    val byHour = ev.groupBy(_._1).view
      .mapValues(cs => (cs.length.toLong, cs.map(_._2).sum)).toMap
    val h0 = ev.map(_._1).min; val h1 = ev.map(_._1).max
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val vs = (h0 to h1).map(h => byHour.get(h)
      .map { case (n, sc) => q9(sc.toDouble / n).toDouble })
    val got = Temporal.interpolateHourly(spark, sf0001).collect()
    assert(got.length === (h1 - h0 + 1).toInt)
    assert(got.map(_.getLong(1)).sum === ev.length.toLong)
    got.zipWithIndex.foreach { case (r, i) =>
      val obs = vs(i)
      assert(r.getBoolean(2) === obs.isDefined, s"observed at $i")
      val expected = obs.getOrElse {
        val prev = (0 until i).reverse.find(vs(_).isDefined)
        val next = (i + 1 until vs.length).find(vs(_).isDefined)
        (prev, next) match {
          case (Some(p), Some(nn)) =>
            vs(p).get + (vs(nn).get - vs(p).get) *
              (i - p).toDouble / (nn - p).toDouble
          case (None, Some(nn)) => vs(nn).get
          case (Some(p), None) => vs(p).get
          case _ => fail("series has no observations")
        }
      }
      assert(math.abs(r.getDouble(3) - expected) < 1e-5, s"value at $i")
    }
  }

  test("events_did_pretrends matches a scalar daily-OLS replay") {
    val ev = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .select(col("ts").cast("long"), col("user_id"),
        round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val t0 = ev.map(_._1).min
    val t0Day = java.time.Instant.ofEpochSecond(t0)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val pre = ev.filter(_._1 < t0 + 15L * 86400)
      .map { case (ts, uid, c) =>
        val d = java.time.Instant.ofEpochSecond(ts)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        (if (uid % 2 == 0) "treat" else "control",
          java.time.temporal.ChronoUnit.DAYS.between(t0Day, d), c)
      }
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val got = EventAnalytics.didPretrends(spark, sf0001).collect()
    assert(got.length === 2)
    got.foreach { r =>
      val arm = r.getString(0)
      val daily = pre.filter(_._1 == arm).groupBy(_._2).view.mapValues {
        es => q9(es.map(_._3).sum.toDouble / es.length) }.toMap
      assert(r.getLong(1) === daily.size.toLong, s"n_days $arm")
      val nd = daily.size
      val sx = daily.keys.sum
      val sxx = daily.keys.map(d => d * d).sum
      val sy = daily.values.sum
      val sxy = daily.map { case (d, y) => y * d }.sum
      val slope = (nd * sxy.toDouble - sx.toDouble * sy.toDouble) /
        (nd * sxx - sx * sx).toDouble
      assert(math.abs(r.getDouble(2) - slope / 100.0) < 1e-5, s"slope $arm")
      val intercept = (sy.toDouble - slope * sx) / nd
      assert(math.abs(r.getDouble(3) - intercept / 100.0) < 1e-3)
    }
    val gap = got.find(_.getString(0) == "treat").get.getDouble(2) -
      got.find(_.getString(0) == "control").get.getDouble(2)
    got.foreach(r => assert(math.abs(r.getDouble(4) - gap) < 2e-6))
  }
}
