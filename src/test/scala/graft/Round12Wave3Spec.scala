package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, EventAnalytics, Quality, Relational,
  TextAnalysis}

/** Round-12 wave-3 operators: BM25 retrieval, k-anonymity census,
  * 1-bit MinHash calibration, Markov absorption time, and
  * fixed-effects regression — scalar replays on sf0.001. */
class Round12Wave3Spec extends SparkSpec {

  test("text_bm25_topk matches a scalar BM25 replay") {
    val toks = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = toks.groupBy(identity).map { case ((d, t), g) =>
      (d, t, g.length.toLong) }.toSeq
    val lens = tf.groupBy(_._1).map { case (d, g) =>
      d -> g.map(_._3).sum }
    val nDocs = lens.size
    val totalLen = lens.values.sum
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val query = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .slice(19, 22).toMap
    val scores = tf.filter(r => query.contains(r._2))
      .groupBy(_._1).map { case (d, g) =>
        val s = g.map { case (_, t, f) =>
          val dfT = df(t)
          val idf = math.log(1.0 + (nDocs.toDouble - dfT + 0.5) /
            (dfT.toDouble + 0.5))
          val norm = 1.2 * (0.25 + 0.75 * lens(d).toDouble * nDocs /
            totalLen.toDouble)
          BigDecimal(idf * f * 2.2 / (f.toDouble + norm))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        (d, g.size.toLong, s.toDouble)
      }.toSeq.sortBy { case (d, _, s) => (-s, d) }.take(10)
    val got = TextAnalysis.bm25TopK(spark, sf0001).collect()
    assert(got.length === scores.length)
    got.zip(scores).foreach { case (r, (d, nh, s)) =>
      assert(r.getLong(1) === d, s"rank ${r.getLong(0)}")
      assert(r.getLong(2) === nh)
      assert(math.abs(r.getDouble(3) - s) < 1e-5, s"bm25 for doc $d")
    }
  }

  test("dq_k_anonymity matches a scalar equivalence-class replay") {
    val rows = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2) - r.getLong(2) % 100))
    val classes = rows.groupBy(identity).map(_._2.length.toLong).toSeq
    val got = Quality.kAnonymity(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 5L, 10L))
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) === classes.length.toLong, "n_classes")
      assert(r.getLong(2) === classes.count(_ < k).toLong, s"below k=$k")
      assert(r.getLong(3) === classes.filter(_ < k).sum, "rows at risk")
      assert(math.abs(r.getDouble(4) -
        classes.filter(_ < k).sum.toDouble / rows.length) < 1e-8)
      assert(r.getLong(5) === classes.min)
    }
  }

  test("dedup_bbit_minhash: 1-bit estimator obeys its definition and " +
    "full-width rows match the existing calibration") {
    val got = DedupOps.bbitMinhash(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (slots, bits) = (r.getLong(2), r.getLong(3))
      assert(bits >= slots, "a matching slot always matches on its bit")
      assert(math.abs(r.getDouble(5) - (2.0 * bits / 9 - 1.0)) < 1e-3)
      assert(math.abs(r.getDouble(4) - slots / 9.0) < 1e-3)
    }
    // full-width columns agree pair-for-pair with minhashCalibration
    val cal = DedupOps.minhashCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { r =>
      assert(cal((r.getLong(0), r.getLong(1))) === r.getDouble(4))
    }
  }

  test("events_absorption_time matches a scalar Jacobi replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._3.getTime, r._3.getNanos, r._4))
      s.zip(s.tail).map { case (a, b) => (a._2, b._2) }
    }.filter(_._1 != "purchase")
    val counts = trans.groupBy(identity).map { case (k, g) =>
      k -> g.size.toLong }
    val outTot = counts.groupBy(_._1._1).map { case (c, g) =>
      c -> g.values.sum }
    val p = counts.map { case ((c, n), cnt) =>
      (c, n) -> cnt.toDouble / outTot(c) }
    val states = outTot.keys.toSeq.sorted
    var h = states.map(_ -> 0.0).toMap
    for (_ <- 1 to 12) {
      h = states.map { s =>
        val contrib = p.collect {
          case ((c, n), pr) if c == s && n != "purchase" &&
            h.contains(n) =>
            BigDecimal(pr * h(n))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        s -> (1.0 + contrib.toDouble)
      }.toMap
    }
    val got = EventAnalytics.absorptionTime(spark, sf0001).collect()
    assert(got.length === states.length)
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) === outTot(s))
      assert(math.abs(r.getDouble(2) -
        p.getOrElse((s, "purchase"), 0.0)) < 1e-6)
      assert(math.abs(r.getDouble(3) - h(s)) < 1e-4,
        s"expected steps from $s")
      assert(r.getDouble(3) >= 1.0)
    }
  }

  test("orders_fe_regression matches a scalar within-estimator replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long"),
        round(col("l_extendedprice") * 100).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val groups = li.groupBy(_._1).values.toSeq
    def cmom(g: Array[(Long, Long, Long)],
        fx: ((Long, Long, Long)) => Long,
        fy: ((Long, Long, Long)) => Long): Double = {
      val n = g.length
      val sx = g.map(r => BigInt(fx(r))).sum
      val sy = g.map(r => BigInt(fy(r))).sum
      val sxy = g.map(r => BigInt(fx(r)) * BigInt(fy(r))).sum
      sxy.toDouble - sx.toDouble * sy.toDouble / n
    }
    val wxy = groups.map(g => cmom(g.toArray, _._2, _._3)).sum
    val wxx = groups.map(g => cmom(g.toArray, _._2, _._2)).sum
    val wyy = groups.map(g => cmom(g.toArray, _._3, _._3)).sum
    val all = li
    val pxy = cmom(all, _._2, _._3)
    val pxx = cmom(all, _._2, _._2)
    val got = Relational.feRegression(spark, sf0001).collect().head
    assert(got.getLong(0) === groups.length.toLong)
    assert(got.getLong(1) === li.length.toLong)
    assert(math.abs(got.getDouble(2) - pxy / pxx) < 1e-4, "pooled")
    assert(math.abs(got.getDouble(3) - wxy / wxx) < 1e-4, "FE slope")
    assert(math.abs(got.getDouble(4) -
      wxy * wxy / (wxx * wyy)) < 1e-4, "within R2")
  }
}
