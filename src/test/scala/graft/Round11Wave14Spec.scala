package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Relational}

/** Round-11 wave-14 operators: scalar replays for Bollinger bands,
  * per-quadrant safety stock, and token information gain. */
class Round11Wave14Spec extends SparkSpec {

  test("window_bollinger matches a scalar rolling-moments replay") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val got = Relational.bollingerBands(spark, sf0001).collect()
    assert(got.length === math.max(0, daily.length - 6))
    got.zipWithIndex.foreach { case (r, i) =>
      val win = daily.slice(i, i + 7)
      assert(r.getString(0) === win.last._1)
      val cs = win.map(_._2)
      val sx = cs.sum; val sxx = cs.map(x => x * x).sum
      val m = sx.toDouble / 7
      val sd = math.sqrt((7 * sxx - sx * sx).toDouble / (7.0 * 6.0))
      assert(math.abs(r.getDouble(2) - m / 100.0) < 1e-3, s"mean7 $i")
      assert(math.abs(r.getDouble(3) - sd / 100.0) < 1e-3, s"sd7 $i")
      assert(math.abs(r.getDouble(4) - (m + 2 * sd) / 100.0) < 1e-3)
      assert(math.abs(r.getDouble(5) - (m - 2 * sd) / 100.0) < 1e-3)
      val c = cs.last
      assert(r.getBoolean(6) === (c > m + 2 * sd || c < m - 2 * sd))
    }
  }

  test("orders_safety_stock matches a scalar histogram-quantile replay " +
    "and the quadrants partition the parts") {
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"),
        (year(date_trunc("month", col("l_shipdate"))) * 12 +
          month(date_trunc("month", col("l_shipdate")))).cast("long"),
        round(col("l_quantity") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val months = rows.map(_._2)
    val span = months.max - months.min + 1
    val monthly = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    def quadrant(part: Long): String = {
      val qs = monthly.filter(_._1._1 == part).values.toSeq
      val m = qs.length.toLong; val s = qs.sum
      val qq = qs.map(x => x * x).sum
      val adiHi = span * 100 >= m * 132
      val cv2Hi = (m * qq - s * s) * 100 >= s * s * 49
      if (!adiHi && !cv2Hi) "smooth"
      else if (adiHi && !cv2Hi) "intermittent"
      else if (!adiHi) "erratic" else "lumpy"
    }
    val byQuad = monthly.toSeq.groupBy { case ((p, _), _) => quadrant(p) }
    val got = Relational.safetyStock(spark, sf0001).collect()
    assert(got.map(_.getLong(2)).sum === monthly.size.toLong)
    got.foreach { r =>
      val q = r.getString(0)
      val es = byQuad(q)
      assert(r.getLong(1) === es.map(_._1._1).distinct.length.toLong)
      assert(r.getLong(2) === es.length.toLong)
      val vals = es.map(_._2).sorted
      def quant(p: Int): Long =
        vals(math.ceil(p * vals.length / 100.0).toInt - 1)
      assert(math.abs(r.getDouble(4) - quant(50) / 100.0) < 1e-9)
      assert(math.abs(r.getDouble(5) - quant(95) / 100.0) < 1e-9)
      val mean = vals.map(BigInt(_)).sum.toDouble / vals.length / 100.0
      assert(math.abs(r.getDouble(3) - mean) < 1e-3)
      assert(math.abs(r.getDouble(6) - (quant(95) / 100.0 - mean)) < 1e-3)
    }
  }

  test("docs_token_infogain matches a scalar contingency replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).filter(_.nonEmpty).toSet))
    val nd = docs.length
    val langTot = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val df = docs.flatMap(d => d._3).groupBy(identity).view
      .mapValues(_.length).toMap
    val head = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def ent(parts: Seq[(Long, Long)]): Double =
      parts.map { case (n, tot) =>
        if (n > 0) q12(n.toDouble / tot * math.log(tot.toDouble / n))
        else BigDecimal(0)
      }.sum.toDouble
    val hLang = ent(langTot.values.map(v => (v.toLong, nd.toLong)).toSeq)
    val igs = head.map { case (tok, dfc) =>
      val byLang = langTot.keys.map { l =>
        val np = docs.count(d => d._2 == l && d._3.contains(tok)).toLong
        (l, np, langTot(l).toLong - np)
      }.toSeq
      val hPres = ent(byLang.map(x => (x._2, dfc.toLong)))
      val hAbs = ent(byLang.map(x => (x._3, (nd - dfc).toLong)))
      val ig = hLang - (dfc.toDouble / nd * hPres +
        (nd - dfc).toDouble / nd * hAbs)
      (tok, dfc.toLong, ig)
    }.sortBy { case (t, _, ig) => (-ig, t) }.take(10)
    val got = Curation.tokenInfogain(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(igs).zipWithIndex.foreach { case ((r, (tok, dfc, ig)), i) =>
      assert(r.getInt(0) === i + 1)
      assert(r.getString(1) === tok, s"token at rank ${i + 1}")
      assert(r.getLong(2) === dfc)
      assert(math.abs(r.getDouble(3) - ig) < 1e-5, s"ig $tok")
      assert(r.getDouble(3) >= -1e-9)
    }
  }
}
