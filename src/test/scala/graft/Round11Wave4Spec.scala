package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Similarity, TextAnalysis}

/** Round-11 wave-4 operators: driver-side first-principles recomputations
  * for Yule's K, the discrete power-law (Hill) tail fit, and the
  * label-vs-LSH-bucket NMI census. */
class Round11Wave4Spec extends SparkSpec {

  private def md5bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))

  test("text_yule_k matches a scalar frequency-spectrum replay") {
    val tok = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val byLang = tok.groupBy(_._1)
    val got = TextAnalysis.yuleK(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val lang = r.getString(0)
      val freqs = byLang(lang).groupBy(_._2).map(_._2.length.toLong)
      val n = freqs.sum; val s2 = freqs.map(c => c * c).sum
      assert(r.getLong(1) === freqs.size.toLong, s"vocab $lang")
      assert(r.getLong(2) === n, s"n_tokens $lang")
      assert(r.getLong(3) === s2, s"s2 $lang")
      val k = 10000.0 * (s2 - n) / (n.toDouble * n.toDouble)
      assert(math.abs(r.getDouble(4) - k) < 1e-6, s"yule_k $lang")
      val d = (s2 - n).toDouble / (n.toDouble * (n - 1).toDouble)
      assert(math.abs(r.getDouble(5) - d) < 1e-6, s"simpson_d $lang")
    }
  }

  test("events_powerlaw_fit matches a scalar Hill-MLE + KS replay") {
    val perUser = Tables(spark, sf0001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("x")).collect()
      .map(_.getLong(1))
    val got = EventAnalytics.powerlawFit(spark, sf0001).collect()
    assert(got.length === 3)
    got.foreach { r =>
      val xmin = r.getLong(0)
      val tail = perUser.filter(_ >= xmin)
      assert(r.getLong(1) === tail.length.toLong, s"n_tail $xmin")
      val sumLn = tail.map(x => BigDecimal(math.log(x.toDouble / xmin))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      assert(math.abs(r.getDouble(2) - sumLn.toDouble) < 1e-5, s"sum_ln")
      val alpha = 1.0 + tail.length / sumLn.toDouble
      assert(math.abs(r.getDouble(3) - alpha) < 1e-5, s"alpha $xmin")
      val ks = tail.distinct.map { x =>
        val emp = tail.count(_ >= x).toDouble / tail.length
        math.abs(emp - math.pow(x.toDouble / xmin, 1.0 - alpha))
      }.max
      assert(math.abs(r.getDouble(4) - ks) < 1e-4, s"ks $xmin")
      // a fitted tail exponent must be > 1 for the MLE to be a pdf
      assert(r.getDouble(3) > 1.0)
    }
  }

  test("sim_cluster_nmi matches a scalar contingency replay and sits " +
    "in [0, 1]") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).toArray))
    // band-0 bucket: 8 md5-sign hyperplane projections, double accum
    def bucket(v: Array[Float]): String =
      (0 until 8).map { j =>
        var p = 0.0
        for (d <- v.indices)
          p += (if (((md5bytes(s"$j:${d + 1}")(0) >> 4) & 0xf) % 2 == 1)
            v(d) else -v(d))
        if (p > 0) '1' else '0'
      }.mkString
    val cells = vecs.map { case (l, v) => (l, bucket(v)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nt = vecs.length.toDouble
    val na = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nb = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def q(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val i = cells.map { case ((a, b), n) =>
      q(n / nt * math.log(nt * n / (na(a).toDouble * nb(b)))) }.sum
    val hA = na.values.map(x => q(x / nt * math.log(nt / x))).sum
    val hB = nb.values.map(x => q(x / nt * math.log(nt / x))).sum
    val nmi = i.toDouble / math.sqrt(hA.toDouble * hB.toDouble)
    val got = Similarity.clusterNmi(spark, sf0001).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      assert(r.getLong(2) === cells(key), s"n $key")
      assert(math.abs(r.getDouble(4) - i.toDouble) < 1e-5, "i_total")
      assert(math.abs(r.getDouble(5) - nmi) < 1e-5, "nmi")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }
}
