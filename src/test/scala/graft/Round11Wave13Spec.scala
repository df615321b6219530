package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, EventAnalytics, Relational}

/** Round-11 wave-13 operators: scalar replays for the periodogram,
  * HHI concentration, and the systematic-vs-convenience sampler. */
class Round11Wave13Spec extends SparkSpec {

  test("events_periodogram matches a scalar Fourier-pair replay") {
    val hours = Tables(spark, sf0001, "events")
      .select(date_trunc("hour", col("ts")).cast("long")).collect()
      .map(_.getLong(0) / 3600)
    val h0 = hours.min; val h1 = hours.max
    val byHour = hours.groupBy(identity).view.mapValues(_.length.toLong)
    val y = (h0 to h1).map(h => byHour.getOrElse(h, 0L)).toArray
    val n = y.length.toLong; val s = y.sum
    val d = y.map(v => v * n - s)
    val den = d.map(x => BigInt(x) * BigInt(x)).sum
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = EventAnalytics.periodogram(spark, sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(6, 12, 24, 168))
    got.foreach { r =>
      val p = r.getInt(0)
      val cs = d.indices.map(i => q12(d(i).toDouble *
        math.cos(2 * math.Pi * (i % p) / p))).sum.toDouble
      val ss = d.indices.map(i => q12(d(i).toDouble *
        math.sin(2 * math.Pi * (i % p) / p))).sum.toDouble
      val power = (cs * cs + ss * ss) * 2.0 / (n * den.toDouble)
      assert(math.abs(r.getDouble(1) - power) < 1e-5, s"power p=$p")
      assert(r.getDouble(1) >= 0.0)
    }
  }

  test("orders_hhi matches an exact rational replay and effective_n " +
    "never exceeds the customer count") {
    val cust = Tables(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .join(Tables(spark, sf0001, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .join(Tables(spark, sf0001, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name")),
        Seq("c_nationkey"))
      .select(col("n_name"), col("x")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = Relational.hhiConcentration(spark, sf0001).collect()
    val groups = cust.groupBy(_._1)
    assert(got.length === groups.size)
    got.foreach { r =>
      val xs = groups(r.getString(0)).map(_._2)
      assert(r.getLong(1) === xs.length.toLong)
      val sx = xs.map(BigInt(_)).sum; val sxx = xs.map(x => BigInt(x) * x).sum
      val hhi = sxx.toDouble / (sx.toDouble * sx.toDouble)
      assert(math.abs(r.getDouble(3) - hhi) < 1e-6, s"hhi ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - 1.0 / hhi) < 1e-2)
      // 1 <= effective_n <= n_cust
      assert(r.getDouble(4) >= 1.0 - 1e-9 &&
        r.getDouble(4) <= xs.length + 1e-9)
    }
  }

  test("sample_systematic matches a scalar replay and the hash-ordered " +
    "sample is unbiased relative to the head sample") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val popMean = docs.map(_._2).sum.toDouble / docs.length
    val sys = docs.sortBy(d => (md5hex(s"sys:${d._1}"), d._1))
      .zipWithIndex.filter(_._2 % 10 == 0).map(_._1)
    val conv = docs.sortBy(_._1).take((docs.length + 9) / 10)
    val got = Curation.systematicSample(spark, sf0001).collect()
    assert(got.length === 3)
    val byM = got.map(r => r.getString(0) -> r).toMap
    assert(byM("population").getLong(1) === docs.length.toLong)
    assert(byM("systematic").getLong(1) === sys.length.toLong)
    assert(byM("convenience").getLong(1) === conv.length.toLong)
    assert(math.abs(byM("systematic").getDouble(2) -
      sys.map(_._2).sum.toDouble / sys.length) < 1e-3)
    assert(math.abs(byM("convenience").getDouble(2) -
      conv.map(_._2).sum.toDouble / conv.length) < 1e-3)
    assert(math.abs(byM("population").getDouble(2) - popMean) < 1e-3)
    assert(byM("population").getDouble(3) === 0.0)
  }
}
