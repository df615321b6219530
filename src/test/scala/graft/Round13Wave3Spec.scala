package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Quality, Relational, Similarity}

/** Round-13 wave-3 scalar replays: MMR greedy selection, UCB1 arms,
  * segmented ITS, and the profile-drift verdicts. */
class Round13Wave3Spec extends SparkSpec {

  test("sim_mmr_rerank matches a scalar greedy replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dd += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dd / math.sqrt(na * nb)
    }
    val qEmb = vecs.find(_._1 == 0L).get._2
    val cand = vecs.filter(_._1 != 0L)
      .map { case (v, e) => (v, e, cos(e, qEmb)) }
      .sortBy { case (v, _, s) => (-s, v) }.take(20)
    val lam = 0.7; val oml = 1.0 - lam
    var selected = Vector.empty[(Long, Array[Float])]
    var expect = Vector.empty[(Long, Double, Option[Double])]
    for (_ <- 1 to 10) {
      val pick = cand.filter(c => !selected.exists(_._1 == c._1))
        .map { case (v, e, rel) =>
          val msim = if (selected.isEmpty) None
            else Some(selected.map(s => cos(e, s._2)).max)
          (v, e, rel, msim, lam * rel - oml * msim.getOrElse(0.0))
        }
        .sortBy { case (v, _, _, _, sc) => (-sc, v) }.head
      selected :+= ((pick._1, pick._2))
      expect :+= ((pick._1, pick._3, pick._4))
    }
    val got = Similarity.mmrRerank(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(expect).foreach { case (r, (v, rel, msim)) =>
      assert(r.getLong(1) === v, s"rank ${r.getLong(0)}")
      assert(math.abs(r.getDouble(2) - rel) < 1e-6)
      msim match {
        case Some(m) => assert(math.abs(r.getDouble(3) - m) < 1e-6)
        case None => assert(r.isNullAt(3))
      }
    }
    // MMR scores are non-increasing only within the relevance trade —
    // but the FIRST pick is always the raw top-1
    assert(got.head.getLong(1) === cand.head._1)
  }

  test("events_ucb_allocation: exactly one chosen arm, bonus shrinks " +
    "with n, replay of counts") {
    val rows = EventAnalytics.ucbAllocation(spark, sf0001).collect()
    assert(rows.count(_.getBoolean(5)) === 1, "one argmax arm")
    val nUsers = Tables(spark, sf0001, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers,
      "first-touch arms partition the users")
    rows.foreach { r =>
      val bonus = r.getDouble(4) - r.getDouble(3)
      assert(bonus > 0.0, "optimism bonus is positive")
      // columns are rounded to 6 decimals, so compare at that grain
      assert(math.abs(bonus - math.sqrt(2.0 * math.log(nUsers.toDouble)
        / r.getLong(1))) < 2e-6)
    }
  }

  test("orders_its_segmented matches a scalar two-segment OLS replay") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val day0 = daily.head._1
    val tmax = java.time.temporal.ChronoUnit.DAYS
      .between(day0, daily.last._1)
    val tmid = tmax / 2
    def fit(pts: Seq[(Long, Long)]): (Double, Double) = {
      val n = pts.length.toDouble
      val st = pts.map(_._1).sum.toDouble
      val sc = pts.map(_._2).sum.toDouble
      val stc = pts.map(p => p._1.toDouble * p._2).sum
      val stt = pts.map(p => p._1.toDouble * p._1).sum
      val b = (stc - st * sc / n) / (stt - st * st / n)
      (b, (sc - b * st) / n)
    }
    val ts = daily.map { case (d, c) =>
      (java.time.temporal.ChronoUnit.DAYS.between(day0, d), c) }
    val (bPre, aPre) = fit(ts.filter(_._1 < tmid))
    val (bPost, aPost) = fit(ts.filter(_._1 >= tmid))
    val r = Relational.itsSegmented(spark, sf0001).collect().head
    assert(r.getLong(0) === ts.count(_._1 < tmid).toLong)
    assert(r.getLong(1) === ts.count(_._1 >= tmid).toLong)
    assert(math.abs(r.getDouble(2) - bPre / 100.0) < 1e-3)
    assert(math.abs(r.getDouble(3) - bPost / 100.0) < 1e-3)
    val jump = (aPost + bPost * tmid) - (aPre + bPre * tmid)
    assert(math.abs(r.getDouble(5) - jump / 100.0) < 0.5)
  }

  test("dq_profile_drift: three columns profiled, tvd in [0,1], halves " +
    "cover the table") {
    val rows = Quality.profileDrift(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq.sorted ===
      Seq("o_orderpriority", "o_orderstatus", "o_totalprice"))
    val n = Tables(spark, sf0001, "orders").count()
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === n, r.getString(0))
      if (r.getString(1) == "categorical_tvd") {
        val tvd = r.getDouble(6)
        assert(tvd >= 0.0 && tvd <= 1.0 + 1e-9)
      }
    }
  }
}
