package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Quality, Relational}

/** Round-11 wave-16 operators: scalar replays for trigram TF-cosine
  * near-dups, Cutler's RSI, and the linear-counting estimator. */
class Round11Wave16Spec extends SparkSpec {

  test("dedup_trigram_cosine matches a scalar TF-cosine replay") {
    val docs = Tables(spark, sf0001, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tg = docs.map { case (id, t) =>
      id -> (0 until t.length - 2).map(i => t.substring(i, i + 3))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = tg.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size).toMap
    val ids = tg.keys.toSeq.sorted
    val cand = (for {
      d1 <- ids; d2 <- ids if d1 < d2
      if (tg(d1).keySet intersect tg(d2).keySet)
        .exists(g => df(g) >= 2 && df(g) <= 64)
    } yield (d1, d2)).toSet
    val exp = cand.flatMap { case (d1, d2) =>
      val g1 = tg(d1); val g2 = tg(d2)
      val dot = (g1.keySet intersect g2.keySet).toSeq
        .map(g => g1(g) * g2(g)).sum
      val n1 = g1.values.map(c => c * c).sum
      val n2 = g2.values.map(c => c * c).sum
      val cos = BigDecimal(dot.toDouble /
        (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      if (cos * 100 >= 90) Some(((d1, d2), (dot, cos.toDouble))) else None
    }.toMap
    val got = DedupOps.trigramCosine(spark, sf0001).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (dot, cos) = exp((r.getLong(0), r.getLong(1)))
      assert(r.getLong(2) === dot)
      assert(math.abs(r.getDouble(3) - cos) < 1e-9)
      assert(r.getDouble(3) >= 0.9)
    }
  }

  test("window_rsi matches a scalar gain/loss replay and stays in " +
    "[0, 100]") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val chg = daily.sliding(2).map { w =>
      (w(1)._1, w(1)._2, math.max(w(1)._2 - w(0)._2, 0L),
        math.max(w(0)._2 - w(1)._2, 0L))
    }.toArray
    val got = Relational.rsiCutler(spark, sf0001).collect()
    assert(got.length === math.max(0, chg.length - 13))
    got.zipWithIndex.foreach { case (r, i) =>
      val win = chg.slice(i, i + 14)
      assert(r.getString(0) === win.last._1)
      val sg = win.map(_._3).sum; val sl = win.map(_._4).sum
      assert(math.abs(r.getDouble(2) - sg.toDouble / 14 / 100.0) < 1e-3)
      assert(math.abs(r.getDouble(3) - sl.toDouble / 14 / 100.0) < 1e-3)
      if (sg + sl > 0) {
        val rsi = 100.0 * sg / (sg + sl)
        assert(math.abs(r.getDouble(4) - rsi) < 1e-3, s"rsi at $i")
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 100.0)
      } else assert(r.isNullAt(4))
    }
  }

  test("sketch_linear_counting matches a scalar bitmap replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def slot(uid: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lc:$uid".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 4096
    }
    val got = Quality.linearCounting(spark, sf0001).collect()
    ev.groupBy(_._1).foreach { case (t, es) =>
      val users = es.map(_._2).distinct
      val occ = users.map(slot).distinct.length.toLong
      val r = got.find(_.getString(0) == t).get
      assert(r.getLong(1) === users.length.toLong, s"exact $t")
      assert(r.getLong(2) === occ, s"occupied $t")
      val est = -4096.0 * math.log((4096.0 - occ) / 4096.0)
      assert(math.abs(r.getDouble(3) - est) < 1e-2, s"estimate $t")
      // linear counting at low load should be tight
      assert(math.abs(est - users.length) < users.length * 0.2)
    }
  }
}
