package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Multimodal, Quality, Relational,
  Similarity, TextAnalysis}

/** Round-12 wave-1 operators: KS / chi-square / BH-FDR statistics,
  * Good–Turing smoothing, newsvendor stocking, gaps-and-islands,
  * VAD segmentation, and MaxSim multi-vector retrieval — each checked
  * against an independent in-memory scalar replay on sf0.001. */
class Round12Wave1Spec extends SparkSpec {

  test("events_ks_test matches a scalar two-sample KS replay") {
    val vals = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("user_id") % 2 === 0).as("t")).collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val a = vals.filter(_._2).map(_._1).sorted
    val b = vals.filter(!_._2).map(_._1).sorted
    val domain = vals.map(_._1).distinct.sorted
    var d = 0.0
    domain.foreach { x =>
      val fa = a.count(_ <= x).toDouble / a.length
      val fb = b.count(_ <= x).toDouble / b.length
      d = math.max(d, math.abs(fa - fb))
    }
    val row = EventAnalytics.ksTest(spark, sf0001).collect().head
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(math.abs(row.getDouble(2) - d) < 1e-6, "D statistic")
    val lam = math.sqrt(a.length.toDouble * b.length /
      (a.length + b.length)) * d
    assert(math.abs(row.getDouble(3) - lam) < 1e-5)
    val p = row.getDouble(4)
    assert(p >= 0.0 && p <= 1.0)
  }

  test("events_chisq matches a scalar contingency replay") {
    val rows = Tables(spark, sf0001, "events")
      .select(col("event_type"), (col("user_id") % 2 === 0).as("t"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val types = rows.map(_._1).distinct.sorted
    val n = rows.length.toDouble
    val mt = rows.count(_._2).toDouble
    val mc = n - mt
    var chi2 = 0.0
    types.foreach { ty =>
      val ot = rows.count(r => r._1 == ty && r._2).toDouble
      val oc = rows.count(r => r._1 == ty && !r._2).toDouble
      val et = (ot + oc) * mt / n
      val ec = (ot + oc) * mc / n
      chi2 += (ot - et) * (ot - et) / et + (oc - ec) * (oc - ec) / ec
    }
    val got = EventAnalytics.chisqIndependence(spark, sf0001).collect()
    assert(got.length === types.length)
    got.foreach { r =>
      assert(math.abs(r.getDouble(5) - chi2) < 1e-4, "global chi2")
      assert(r.getLong(6) === types.length.toLong - 1, "df")
      assert(math.abs(r.getDouble(7) - math.sqrt(chi2 / n)) < 1e-5)
    }
    // per-cell contributions sum to the global statistic
    assert(math.abs(got.map(_.getDouble(4)).sum - chi2) < 1e-4)
  }

  test("events_fdr_bh: BH adjustment is monotone in rank order and " +
    "matches a scalar step-up replay") {
    val got = EventAnalytics.fdrBh(spark, sf0001).collect()
      .sortBy(_.getLong(5))
    val m = got.length
    val praw = got.map(_.getDouble(4))
    // p sorted ascending by rank
    assert(praw.zip(praw.tail).forall { case (x, y) => x <= y + 1e-9 })
    // step-up replay: adj_i = min_{j>=i} (m p_j / j), clamped at 1
    val q = praw.zipWithIndex.map { case (p, i) => p * m / (i + 1) }
    val adj = q.scanRight(Double.MaxValue)(math.min).init
      .map(math.min(_, 1.0))
    got.zip(adj).foreach { case (r, e) =>
      assert(math.abs(r.getDouble(6) - e) < 1e-4,
        s"p_adj for ${r.getString(0)}")
      assert(r.getBoolean(7) === (r.getDouble(6) < 0.05))
    }
  }

  test("text_good_turing matches a scalar count-of-counts replay") {
    val toks = Tables(spark, sf0001, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val got = TextAnalysis.goodTuring(spark, sf0001).collect()
    got.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val counts = toks.filter(_._1 == lang).groupBy(_._2)
        .map(_._2.length.toLong)
      val nTok = counts.sum
      val cofc = counts.groupBy(identity).map { case (r, g) =>
        (r, g.size.toLong) }
      rows.foreach { row =>
        val r = row.getLong(1)
        assert(row.getLong(2) === cofc(r), s"N_$r")
        val exp = cofc.get(r + 1).map(nn => (r + 1.0) * nn / cofc(r))
        if (exp.isEmpty) assert(row.isNullAt(3))
        else assert(math.abs(row.getDouble(3) - exp.get) < 1e-5)
        cofc.get(1L) match {
          case Some(n1) => assert(math.abs(row.getDouble(5) -
            n1.toDouble / nTok) < 1e-8, "unseen mass")
          case None => assert(row.isNullAt(5), "no singletons -> null")
        }
      }
    }
  }

  test("orders_newsvendor: Q* is the 0.9 ceil-rank quantile and the " +
    "cost is minimal over candidate stocks") {
    val got = Relational.newsvendor(spark, sf0001).collect()
    assert(got.length === 5)
    val monthly = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).as("mo"),
        round(col("l_quantity") * 100).cast("long").as("q"))
      .groupBy(col("l_partkey"), col("mo"))
      .agg(sum(col("q")).as("qm")).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    got.foreach { r =>
      val part = r.getLong(0)
      val ds = monthly.filter(_._1 == part).map(_._2).sorted
      val m = ds.length
      assert(r.getLong(1) === m.toLong)
      val qs = ds(math.ceil(0.9 * m).toInt - 1)
      assert(math.abs(r.getDouble(2) - qs / 100.0) < 1e-9, "Q*")
      def cost(stock: Long): Double =
        ds.map(d => if (d < stock) 1.0 * (stock - d)
          else 9.0 * (d - stock)).sum / m / 100.0
      assert(math.abs(r.getDouble(4) - cost(qs)) < 1e-3)
      // the critical-fractile stock is optimal among observed demands
      ds.distinct.foreach(c =>
        assert(cost(qs) <= cost(c) + 1e-9, s"beaten by stock $c"))
    }
  }

  test("dq_gap_islands matches a scalar islands replay") {
    val ks = Tables(spark, sf0001, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey")).distinct().collect()
      .map(_.getLong(0)).sorted
    val islands = ks.foldLeft(List.empty[(Long, Long, Long)]) {
      case (acc, k) => acc match {
        case (lo, hi, len) :: tail if k == hi + 1 =>
          (lo, k, len + 1) :: tail
        case _ => (k, k, 1L) :: acc
      }
    }.reverse
    val gaps = islands.zip(islands.tail).map { case ((_, hi, _),
      (lo2, _, _)) => (hi + 1, lo2 - hi - 1) }
      .filter(_._2 > 0).sortBy(g => (-g._2, g._1)).take(5)
    val got = Quality.gapIslands(spark, sf0001).collect()
    assert(got.length === math.min(5, gaps.length))
    got.zip(gaps).foreach { case (r, (start, len)) =>
      assert(r.getLong(1) === start, "gap_start")
      assert(r.getLong(2) === len, "gap_len")
      assert(r.getLong(3) === islands.length.toLong, "n_islands")
      assert(r.getLong(4) === ks.length.toLong, "n_keys")
      assert(r.getLong(5) === islands.map(_._3).max, "longest")
      assert(r.getLong(6) ===
        (ks.max - ks.min + 1) - ks.length, "n_missing")
    }
  }

  test("mm_vad_segments: censuses are consistent and hangover merges") {
    val got = Multimodal.vadSegments(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nSeg, nAct, longest, onset, nWin) = (r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nSeg >= 1 && nAct >= nSeg, "every segment has a window")
      assert(longest <= nWin && onset >= 0 && onset < nWin)
      // a segment's span can exceed its active count only via the
      // 1-window hangover bridges: span <= 2*active - 1
      assert(longest <= 2 * nAct - 1, "hangover bound")
      assert(math.abs(r.getDouble(6) -
        nAct.toDouble / nWin) < 1e-4)
    }
    // at least one track has more than one segment (threshold bites)
    assert(got.exists(_.getLong(1) > 1), "segmentation is non-trivial")
  }

  test("sim_maxsim_multivec matches a scalar MaxSim replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val q = vecs.sortBy(_._1).take(3)
    val scores = vecs.map(_._2).distinct.map { lbl =>
      val block = vecs.filter(_._2 == lbl)
      val s = q.map { case (qid, _, qe) =>
        block.filter(_._1 != qid).map(v => cos(v._3, qe)).max
      }.sum
      (lbl, s)
    }.sortBy { case (l, s) => (-s, l) }
    val got = Similarity.maxsimMultivec(spark, sf0001).collect()
    assert(got.length === scores.length)
    got.zip(scores).foreach { case (r, (lbl, s)) =>
      assert(r.get(1).toString.toLong === lbl,
        s"rank ${r.getLong(0)} label")
      assert(math.abs(r.getDouble(3) - s) < 1e-4, s"score for $lbl")
      assert(r.getLong(2) === 3L)
    }
  }
}
