package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Quality}

/** Round-11 wave-3 operators: driver-side first-principles recomputations
  * for the Benford first-digit test, the AMS F2 sketch, and the hourly
  * autocorrelation / Ljung–Box census. */
class Round11Wave3Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dq_benford matches a scalar first-digit replay and chi-square") {
    val cents = Tables(spark, sf0001, "orders")
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100))
      .filter(_ > 0)
    val byDigit = cents.map(_.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = cents.length.toLong
    val expChi2 = (1 to 9).map { d =>
      val n = byDigit.getOrElse(d, 0L)
      val p = math.log10(1.0 + 1.0 / d)
      val c = (n - nTot * p) * (n - nTot * p) / (nTot * p)
      BigDecimal(c).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val got = Quality.benfordDigits(spark, sf0001).collect()
    assert(got.length === 9)
    got.foreach { r =>
      val d = r.getInt(0)
      assert(r.getLong(1) === byDigit.getOrElse(d, 0L), s"n digit $d")
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6)
      assert(math.abs(r.getDouble(5) - expChi2.toDouble) < 1e-5,
        s"chi2 ${r.getDouble(5)} vs $expChi2")
    }
    // digit counts cover every positive order exactly once
    assert(got.map(_.getLong(1)).sum === nTot)
  }

  test("sketch_ams_f2 signed sums match a scalar replay and every " +
    "estimator is the square of its Z") {
    val perKey = Tables(spark, sf0001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exactF2 = perKey.map { case (_, c) => c * c }.sum
    val zs = (0 to 8).map { j =>
      perKey.map { case (k, c) =>
        val nib = Integer.parseInt(md5hex(s"ams$j:$k").substring(3, 4), 16)
        (if (nib % 2 == 0) 1L else -1L) * c
      }.sum
    }
    val medianEst = zs.map(z => z * z).sorted.apply(4)
    val got = Quality.sketchAmsF2(spark, sf0001).collect()
    assert(got.length === 9)
    got.foreach { r =>
      val j = r.getInt(0)
      assert(r.getLong(1) === zs(j), s"z_$j")
      assert(r.getLong(2) === zs(j) * zs(j), s"est_$j")
      assert(r.getLong(3) === medianEst)
      assert(r.getLong(4) === exactF2)
    }
  }

  test("events_autocorr matches a scalar gap-filled ACF replay with " +
    "Ljung-Box accumulation") {
    val hours = Tables(spark, sf0001, "events")
      .select(date_trunc("hour", col("ts")).as("h")).collect()
      .map(_.getTimestamp(0).getTime / 3600000L)
    val h0 = hours.min; val h1 = hours.max
    val byHour = hours.groupBy(identity).view.mapValues(_.length.toLong)
    val y = (h0 to h1).map(h => byHour.getOrElse(h, 0L)).toArray
    val n = y.length.toLong
    val s = y.sum
    val d = y.map(v => BigInt(v * n - s))
    val den = d.map(x => x * x).sum
    val got = EventAnalytics.autocorrelation(spark, sf0001).collect()
    assert(got.length === 24)
    var q = BigDecimal(0)
    got.foreach { r =>
      val k = r.getInt(0)
      val num = (k until y.length).map(t => d(t) * d(t - k)).sum
      val acf = num.toDouble / den.toDouble
      assert(math.abs(r.getDouble(1) - acf) < 1e-6, s"acf lag $k")
      q += BigDecimal(acf * acf * n * (n + 2) / (n - k))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(r.getDouble(2) - q.toDouble) < 1e-5, s"lb_q lag $k")
    }
    // every autocorrelation is a valid correlation and Q only grows
    assert(got.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    assert(got.sliding(2).forall(p => p(1).getDouble(2) >= p(0).getDouble(2)))
  }
}
