package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Relational, TextAnalysis}

/** Round-11 wave-15 operators: scalar replays for langid eval metrics,
  * the tie-corrected Mann-Whitney test, and skewness/kurtosis. */
class Round11Wave15Spec extends SparkSpec {

  test("text_langid_eval matches a scalar confusion replay and the " +
    "diagonal accounts for the accuracy") {
    val conf = TextAnalysis.langIdConfusion(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val trues = conf.keys.map(_._1).toSeq.distinct
    val nAll = conf.values.sum
    val nCorrect = trues.map(l => conf.getOrElse((l, l), 0L)).sum
    val got = TextAnalysis.langidEval(spark, sf0001).collect()
    assert(got.length === trues.length)
    val f1s = got.map { r =>
      val l = r.getString(0)
      val tp = conf.getOrElse((l, l), 0L)
      val fp = conf.filter(_._1._2 == l).values.sum - tp
      val fn = conf.filter(_._1._1 == l).values.sum - tp
      assert(r.getLong(1) === tp && r.getLong(2) === fp &&
        r.getLong(3) === fn, s"counts $l")
      val p = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
      val rec = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
      val f1 = if (p + rec > 0) 2 * p * rec / (p + rec) else 0.0
      assert(math.abs(r.getDouble(4) - p) < 1e-6)
      assert(math.abs(r.getDouble(5) - rec) < 1e-6)
      assert(math.abs(r.getDouble(6) - f1) < 1e-6)
      assert(math.abs(r.getDouble(7) - nCorrect.toDouble / nAll) < 1e-6)
      BigDecimal(f1).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val macroF1 = f1s.sum.toDouble / f1s.length
    got.foreach(r => assert(math.abs(r.getDouble(8) - macroF1) < 1e-5))
  }

  test("events_mann_whitney matches a scalar midrank replay") {
    val vals = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .select(round(col("value") * 100).cast("long"),
        col("user_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = vals.map(_._1).sorted
    val ranks = sorted.zipWithIndex.groupBy(_._1).view.mapValues { g =>
      g.map(_._2 + 1).sum.toDouble / g.length // midrank
    }.toMap
    val n1 = vals.count(_._2).toLong
    val n2 = vals.length - n1
    val rT = vals.filter(_._2).map(v => ranks(v._1)).sum
    val u = rT - n1 * (n1 + 1) / 2.0
    val nn = vals.length.toLong
    val tie = vals.map(_._1).groupBy(identity).values
      .map(g => { val t = BigInt(g.length); t * t * t - t }).sum
    val variance = n1.toDouble * n2 / 12.0 *
      ((nn + 1).toDouble - tie.toDouble / (nn.toDouble * (nn - 1)))
    val z = (u - n1.toDouble * n2 / 2.0) / math.sqrt(variance)
    val got = EventAnalytics.mannWhitney(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    assert(math.abs(r.getDouble(2) - u) < 1e-2, "u")
    assert(math.abs(r.getDouble(3) - z) < 1e-5, "z")
    assert(math.abs(r.getDouble(4) - tie.toDouble) < 1.0)
  }

  test("agg_skew_kurtosis matches a scalar two-pass moment replay") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = Relational.skewKurtosis(spark, sf0001).collect()
    val groups = rows.groupBy(_._1)
    assert(got.length === groups.size)
    got.foreach { r =>
      val cs = groups(r.getString(0)).map(_._2)
      val n = cs.length
      val mu = cs.map(BigInt(_)).sum.toDouble / n
      val d = cs.map(c => (c - mu) / 100.0)
      val m2 = d.map(x => q6(x * x)).sum.toDouble / n
      val m3 = d.map(x => q6(x * x * x)).sum.toDouble / n
      val m4 = d.map(x => q6(x * x * x * x)).sum.toDouble / n
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - math.sqrt(m2)) < 1e-2, "stddev")
      assert(math.abs(r.getDouble(3) - m3 / math.pow(m2, 1.5)) < 1e-4)
      assert(math.abs(r.getDouble(4) - (m4 / (m2 * m2) - 3.0)) < 1e-4)
      // order totals are right-skewed sums of positive items
      assert(r.getDouble(3) > -2 && r.getDouble(3) < 5)
    }
  }
}
