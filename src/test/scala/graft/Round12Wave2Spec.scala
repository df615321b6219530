package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Graph}

/** Round-12 wave-2 operators: exact Shapley attribution, Granger
  * lead-lag, the Qini uplift curve, and the 4-cycle census — each
  * checked against an independent in-memory scalar replay on sf0.001. */
class Round12Wave2Spec extends SparkSpec {

  test("events_shapley_attribution matches a scalar full-enumeration " +
    "Shapley replay and satisfies efficiency") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    val byUser = ev.groupBy(_._1)
    val chans = Seq("click", "error", "signup", "view")
    // user -> (coalition key, revenue cents)
    // note .toSeq BEFORE map: mapping a Map to (key, value) pairs
    // would collapse users that share a coalition key
    val users = byUser.toSeq.map { case (_, rows) =>
      // full-precision timestamp compare (getTime drops sub-ms nanos)
      val fp = rows.filter(_._2 == "purchase").map(_._3)
        .sortBy(t => (t.getTime, t.getNanos)).headOption
      val rev = rows.filter(r => r._2 == "purchase" && r._4.isDefined)
        .map(r => math.round(r._4.get * 100)).sum
      val touched = rows.filter(r => r._2 != "purchase" &&
        fp.forall(t => r._3.compareTo(t) < 0))
        .map(_._2).distinct.sorted
      (touched.mkString(","), rev)
    }.toSeq
    val coal = users.groupBy(_._1).map { case (k, g) =>
      k -> (BigDecimal(g.map(_._2).sum) / g.size)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    def key(mask: Int): String =
      chans.zipWithIndex.filter { case (_, i) => (mask >> i & 1) == 1 }
        .map(_._1).mkString(",")
    def v(mask: Int): BigDecimal = coal.getOrElse(key(mask), BigDecimal(0))
    val phi = chans.zipWithIndex.map { case (c, i) =>
      val bit = 1 << i
      val t = (0 until 16).filter(m => (m & bit) == 0).map { m =>
        val sz = Integer.bitCount(m)
        val w = if (sz == 0 || sz == 3) 6 else 2
        (v(m | bit) - v(m)) * w
      }.sum
      c -> t
    }.toMap
    val got = EventAnalytics.shapleyAttribution(spark, sf0001).collect()
    assert(got.length === 4)
    got.foreach { r =>
      val c = r.getString(0)
      val exp = (phi(c) / 24 / 100).toDouble
      assert(math.abs(r.getDouble(1) - exp) < 1e-3, s"phi for $c")
    }
    // efficiency: sum of phi equals v(full) - v(empty)
    val sumPhi = got.map(_.getDouble(1)).sum
    val eff = ((v(15) - v(0)) / 100).toDouble
    assert(math.abs(sumPhi - eff) < 1e-2, "efficiency axiom")
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-4, "shares")
  }

  test("events_granger matches a scalar OLS F-test replay") {
    val daily = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("user_id") % 2 === 0,
        round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("user_id") % 2 =!= 0,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val rows = daily.sliding(2).map { case Array((x0, y0), (_, y1)) =>
      (y1.toDouble, y0.toDouble, x0.toDouble) }.toArray
    val n = rows.length
    def mean(f: ((Double, Double, Double)) => Double) =
      rows.map(f).sum / n
    val (my, myl, mxl) = (mean(_._1), mean(_._2), mean(_._3))
    def c(f: ((Double, Double, Double)) => Double, mf: Double,
        g: ((Double, Double, Double)) => Double, mg: Double) =
      rows.map(r => (f(r) - mf) * (g(r) - mg)).sum
    val cyy = c(_._1, my, _._1, my)
    val c01 = c(_._1, my, _._2, myl); val c02 = c(_._1, my, _._3, mxl)
    val c11 = c(_._2, myl, _._2, myl); val c22 = c(_._3, mxl, _._3, mxl)
    val c12 = c(_._2, myl, _._3, mxl)
    val det = c11 * c22 - c12 * c12
    val b1 = (c01 * c22 - c02 * c12) / det
    val b2 = (c02 * c11 - c01 * c12) / det
    val rssU = cyy - b1 * c01 - b2 * c02
    val rssR = cyy - c01 * c01 / c11
    val f = (rssR - rssU) * (n - 3) / rssU
    val got = EventAnalytics.grangerLeadLag(spark, sf0001).collect().head
    assert(got.getLong(0) === n.toLong)
    assert(math.abs(got.getDouble(1) - b1) < 1e-4, "beta_self")
    assert(math.abs(got.getDouble(2) - b2) < 1e-4, "beta_cross")
    assert(math.abs(got.getDouble(5) - f) < 1e-3, "F statistic")
    assert(rssU <= rssR + 1e-9, "extra regressor cannot raise RSS")
  }

  test("events_qini_curve: cumulative counts cover the population and " +
    "the curve ends on the random diagonal") {
    val got = EventAnalytics.qiniCurve(spark, sf0001).collect()
    assert(got.length === 5)
    val last = got.last
    // final cumulative counts = whole population
    val nUsers = Tables(spark, sf0001, "events")
      .select(col("user_id")).distinct().count()
    assert(last.getLong(1) + last.getLong(2) === nUsers)
    // qini and the random diagonal meet at the final bucket
    assert(math.abs(last.getDouble(5) - last.getDouble(6)) < 1e-6)
    // cumulative counts are monotone
    val cnt = got.map(r => r.getLong(1) + r.getLong(2))
    assert(cnt.zip(cnt.tail).forall { case (a, b) => a < b })
    // random diagonal is linear in bucket
    val q5 = last.getDouble(5)
    got.foreach(r => assert(math.abs(r.getDouble(6) -
      q5 * r.getLong(0) / 5.0) < 1e-3))
  }

  test("graph_squares matches a scalar 4-cycle replay on the knn graph") {
    // rebuild the k=3 knn graph exactly as Similarity.knnEdges does
    val vecs = Tables(spark, sf0001, "embeddings")
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
    val byLabel = vecs.groupBy(_._2)
    val expected = byLabel.map { case (lbl, block) =>
      val edges = block.flatMap { case (v1, _, e1) =>
        block.filter(_._1 != v1)
          .map { case (v2, _, e2) => (v2, cos(e1, e2)) }
          .sortBy { case (v2, s) => (-s, v2) }.take(3)
          .map { case (v2, _) => (v1, v2) }
      }
      val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .distinct
      val adj = und.groupBy(_._1).map { case (k, g) =>
        k -> g.map(_._2).toSet }
      val verts = adj.keys.toSeq.sorted
      var c2 = 0L
      for {
        i <- verts.indices; j <- (i + 1) until verts.length
      } {
        val m = (adj(verts(i)) & adj(verts(j))).size.toLong
        c2 += m * (m - 1) / 2
      }
      lbl -> c2 / 2
    }
    val got = Graph.squares(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val lbl = r.get(0).toString.toLong
      assert(r.getLong(2) === expected(lbl), s"squares for label $lbl")
    }
    assert(got.map(_.getLong(2)).sum > 0, "graph has squares")
  }
}
