package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Relational, TextAnalysis}

/** Round-11 wave-11 operators: scalar replays for Burrows' Delta,
  * stratified-matching ATT, and the Pythagorean means. */
class Round11Wave11Spec extends SparkSpec {

  private def q9(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("text_burrows_delta matches a scalar stylometric replay") {
    val tok = Tables(spark, sf0001, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val st = tok.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = tok.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val top = st.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(30).map(_._1)
    val sources = totals.keys.toSeq.sorted
    val fr = (for (s <- sources; w <- top) yield
      ((s, w), q9(st.getOrElse((s, w), 0L).toDouble * 1000.0 /
        totals(s)))).toMap
    val ns = sources.length
    val z = (for (w <- top) yield {
      val fs = sources.map(s => fr((s, w)))
      val sf = fs.sum; val sff = fs.map(x => x * x).sum
      val mu = sf.toDouble / ns
      val sd = math.sqrt((ns * sff - sf * sf).toDouble /
        (ns.toDouble * (ns - 1)))
      w -> sources.map(s => s -> ((fr((s, w)).toDouble - mu) / sd)).toMap
    }).toMap
    val got = TextAnalysis.burrowsDelta(spark, sf0001).collect()
    assert(got.length === ns * (ns - 1) / 2)
    got.foreach { r =>
      val s1 = r.getString(0); val s2 = r.getString(1)
      assert(r.getLong(2) === top.length.toLong)
      val delta = top.map(w => BigDecimal(math.abs(z(w)(s1) - z(w)(s2)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        top.length
      assert(math.abs(r.getDouble(3) - delta) < 1e-5, s"delta $s1/$s2")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("events_att_matching matches a scalar stratified replay and " +
    "drops unmatched strata") {
    val users = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("value") * 100).cast("long")).as("sc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val xs = users.map(_._2).sorted
    val nu = xs.length
    val bounds = (1 to 9).map(k => xs(math.ceil(k * nu / 10.0).toInt - 1))
    def bucket(x: Long): Int = 1 + bounds.count(b => x > b)
    val byBucket = users.groupBy(u => bucket(u._2))
    val got = EventAnalytics.attMatching(spark, sf0001).collect()
    var wdSum = BigDecimal(0); var wSum = 0L
    byBucket.foreach { case (b, us) =>
      val (t, c) = us.partition(_._1 % 2 == 0)
      val r = got.find(_.getLong(0) == b.toLong).get
      assert(r.getLong(1) === t.length.toLong, s"n_t bucket $b")
      assert(r.getLong(2) === c.length.toLong, s"n_c bucket $b")
      if (t.nonEmpty && c.nonEmpty) {
        def m(g: Array[(Long, Long, Long)]): Double =
          g.map(u => q9(u._3.toDouble / u._2)).sum.toDouble / g.length
        val diff = m(t) - m(c)
        assert(math.abs(r.getDouble(3) - diff / 100.0) < 1e-5)
        val w = math.min(t.length, c.length).toLong
        assert(r.getLong(4) === w)
        wdSum += BigDecimal(diff * w)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        wSum += w
      } else assert(r.getLong(4) === 0L, "unmatched stratum has weight 0")
    }
    val att = wdSum.toDouble / wSum / 100.0
    got.foreach(r => assert(math.abs(r.getDouble(5) - att) < 1e-5))
  }

  test("agg_gh_means matches a scalar replay and AM >= GM >= HM") {
    val rows = Tables(spark, sf0001, "orders")
      .filter(col("o_totalprice") > 0)
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = Relational.pythagoreanMeans(spark, sf0001).collect()
    val groups = rows.groupBy(_._1)
    assert(got.length === groups.size)
    got.foreach { r =>
      val cs = groups(r.getString(0)).map(_._2)
      assert(r.getLong(1) === cs.length.toLong)
      val am = cs.map(BigInt(_)).sum.toDouble / cs.length / 100.0
      val gm = math.exp(cs.map(c => q12(math.log(c.toDouble))).sum
        .toDouble / cs.length) / 100.0
      val hm = cs.length.toDouble /
        cs.map(c => q12(1.0 / c)).sum.toDouble / 100.0
      assert(math.abs(r.getDouble(2) - am) < 1e-3, "mean")
      assert(math.abs(r.getDouble(3) - gm) < 1e-3, "gmean")
      assert(math.abs(r.getDouble(4) - hm) < 1e-3, "hmean")
      assert(r.getDouble(2) >= r.getDouble(3) &&
        r.getDouble(3) >= r.getDouble(4), "AM >= GM >= HM")
    }
  }
}
