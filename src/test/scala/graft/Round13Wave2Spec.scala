package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Quality, Relational, Similarity, TextAnalysis}

/** Round-13 wave-2 scalar replays and invariants: WOE/IV, Kneser–Ney
  * bigram perplexity, rolling correlation, centroid margins,
  * elasticity, l-diversity. */
class Round13Wave2Spec extends SparkSpec {

  test("feature_woe_iv matches a scalar replay and Σ(ps−ns)·woe") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), col("o_orderstatus")).collect()
      .map(r => (r.getString(0), r.getString(1) == "F"))
    val byCat = rows.groupBy(_._1).map { case (c, g) =>
      c -> (g.count(_._2).toLong, g.count(!_._2).toLong) }
    val pt = byCat.values.map(_._1).sum.toDouble
    val nt = byCat.values.map(_._2).sum.toDouble
    val got = Relational.woeIv(spark, sf0001).collect()
    assert(got.length === byCat.size)
    var iv = BigDecimal(0)
    byCat.toSeq.sortBy(_._1).zip(got).foreach {
      case ((c, (p, n)), r) =>
        assert(r.getString(0) === c)
        assert(r.getLong(1) === p && r.getLong(2) === n)
        if (p > 0 && n > 0) {
          val woe = math.log((p / pt) / (n / nt))
          assert(math.abs(r.getDouble(5) - woe) < 1e-6)
          iv += BigDecimal((p / pt - n / nt) * woe)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        } else assert(r.isNullAt(5), "one-sided bin must be NULL WOE")
    }
    got.foreach(r => assert(math.abs(r.getDouble(6) - iv.toDouble) < 1e-6))
  }

  test("text_kn_bigram: KN probabilities sum to <= 1 per seen context " +
    "and the engine matches a scalar replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bigrams(t: String): Seq[(String, String)] = {
      val w = t.split(" ", -1); w.dropRight(1).zip(w.drop(1)).toSeq
    }
    val tr = docs.filter(_._1 % 2 == 0).flatMap(d => bigrams(d._3))
    val ho = docs.filter(_._1 % 2 != 0)
      .flatMap(d => bigrams(d._3).map(b => (d._2, b)))
    val pc = tr.groupBy(identity).map { case (b, g) => b -> g.length.toLong }
    val ctx = pc.groupBy(_._1._1).map { case (w1, g) =>
      w1 -> (g.values.sum, g.size.toLong) }
    val cont = pc.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val n1all = pc.size.toDouble
    val D = 0.75
    val perLang = ho.groupBy(_._1).map { case (lang, g) =>
      var nEval = 0L; var nll = BigDecimal(0)
      var oovCtx = 0L; var oovCont = 0L
      g.foreach { case (_, (w1, w2)) =>
        ctx.get(w1) match {
          case None => oovCtx += 1
          case Some((cw1, n1w1)) => cont.get(w2) match {
            case None => oovCont += 1
            case Some(n1w2) =>
              val c = pc.getOrElse((w1, w2), 0L).toDouble
              val p = math.max(c - D, 0.0) / cw1 +
                D * n1w1 / cw1 * (n1w2 / n1all)
              nEval += 1
              nll += BigDecimal(-math.log(p))
                .setScale(12, BigDecimal.RoundingMode.HALF_UP)
          }
        }
      }
      lang -> (nEval, oovCtx, oovCont, nll)
    }
    val got = TextAnalysis.knBigram(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (ne, oc, on, nll) = perLang(r.getString(0))
      assert(r.getLong(1) === ne && r.getLong(2) === oc &&
        r.getLong(3) === on)
      assert(math.abs(r.getDouble(4) - (nll / ne).toDouble) < 1e-6)
      assert(math.abs(r.getDouble(5) -
        math.exp((nll / ne).toDouble)) < 1e-3)
    }
    // KN is a proper conditional distribution: for a few seen contexts,
    // Σ_w2∈cont p(w2|w1) <= 1 + eps (mass on unseen continuations >= 0)
    ctx.keys.take(5).foreach { w1 =>
      val (cw1, n1w1) = ctx(w1)
      val s = cont.map { case (w2, n1w2) =>
        math.max(pc.getOrElse((w1, w2), 0L).toDouble - D, 0.0) / cw1 +
          D * n1w1 / cw1 * (n1w2 / n1all)
      }.sum
      assert(s <= 1.0 + 1e-9, s"KN mass for '$w1' = $s")
    }
  }

  test("window_rolling_corr matches a scalar trailing-frame replay") {
    val daily = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("user_id") % 2 === 0,
        round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("user_id") % 2 =!= 0,
          round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .orderBy(col("d")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val got = EventAnalytics.rollingCorr(spark, sf0001).collect()
    assert(got.length === daily.length)
    got.zipWithIndex.foreach { case (r, i) =>
      val fr = daily.slice(math.max(0, i - 6), i + 1)
      val n = fr.length.toDouble
      assert(r.getLong(1) === fr.length.toLong)
      val sx = fr.map(_._1).sum.toDouble; val sy = fr.map(_._2).sum.toDouble
      val sxy = fr.map(p => p._1.toDouble * p._2).sum
      val sxx = fr.map(p => p._1.toDouble * p._1).sum
      val syy = fr.map(p => p._2.toDouble * p._2).sum
      val cxy = sxy - sx * sy / n
      val cxx = sxx - sx * sx / n; val cyy = syy - sy * sy / n
      if (cxx > 0 && cyy > 0)
        assert(math.abs(r.getDouble(4) -
          cxy / math.sqrt(cxx * cyy)) < 1e-5, s"day $i")
      else assert(r.isNullAt(4))
    }
  }

  test("sim_centroid_margin: cells partition the corpus, margins are " +
    "non-negative, confusion counts match a scalar argmax replay") {
    val rows = Similarity.centroidMargin(spark, sf0001).collect()
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).toArray))
    assert(rows.map(_.getLong(2)).sum === vecs.length.toLong)
    rows.foreach(r => assert(r.getDouble(4) >= 0.0, "margin >= 0"))
    // scalar replay of the assignment census (doubles, not the exact
    // decimal pipeline — the argmax is far from ties on this data)
    val dims = vecs.head._2.length
    val cents = vecs.groupBy(_._1).map { case (l, g) =>
      l -> Array.tabulate(dims)(d =>
        g.map(v => BigDecimal(v._2(d).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          g.length)
    }
    def cos(a: Array[Float], c: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nc = 0.0; var i = 0
      while (i < dims) {
        dd += a(i).toDouble * c(i); na += a(i).toDouble * a(i)
        nc += c(i) * c(i); i += 1
      }
      dd / math.sqrt(na * nc)
    }
    val confusion = vecs.map { case (l, e) =>
      val best = cents.toSeq.map { case (c, arr) => (c, cos(e, arr)) }
        .sortBy { case (c, s) => (-s, c) }.head._1
      (l, best)
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    rows.foreach { r =>
      assert(confusion((r.getInt(0), r.getInt(1))) === r.getLong(2),
        s"cell (${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("dq_l_diversity: levels partition the corpus; entropy <= ln l") {
    val rows = Quality.lDiversity(spark, sf0001).collect()
    val n = Tables(spark, sf0001, "documents").count()
    assert(rows.map(_.getLong(2)).sum === n)
    rows.foreach { r =>
      assert(r.getDouble(4) <= math.log(r.getLong(0).toDouble) + 1e-9,
        "mean class entropy is bounded by ln(l)")
    }
  }

  test("orders_price_elasticity: every brand fits over the same month " +
    "grid; r2 in [0,1]") {
    val rows = Relational.priceElasticity(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val r2 = r.getDouble(3)
        assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"r2=$r2")
      }
    }
  }
}
