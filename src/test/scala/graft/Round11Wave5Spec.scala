package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Quality, TextAnalysis}

/** Round-11 wave-5 operators: driver-side first-principles recomputations
  * for candidate-key uniqueness, Neyman allocation, and MSTTR. */
class Round11Wave5Spec extends SparkSpec {

  test("dq_candidate_keys matches a scalar group-and-count replay and " +
    "flags the primary key") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string").as("o_orderdate"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val n = rows.length.toLong
    def profile[K](key: Tuple4[Long, Long, String, Double] => K)
        : (Long, Long) = {
      val g = rows.groupBy(key).map(_._2.length.toLong)
      (g.size.toLong, g.max)
    }
    val exp = Map(
      "o_orderkey" -> profile(_._1),
      "o_custkey" -> profile(_._2),
      "o_orderdate" -> profile(_._3),
      "o_totalprice" -> profile(_._4),
      "o_custkey,o_orderdate" -> profile(t => (t._2, t._3)),
      "o_custkey,o_totalprice" -> profile(t => (t._2, t._4)),
      "o_orderdate,o_totalprice" -> profile(t => (t._3, t._4)))
    val got = Quality.candidateKeys(spark, sf0001).collect()
    assert(got.length === 7)
    got.foreach { r =>
      val (nd, mx) = exp(r.getString(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === nd, s"n_distinct ${r.getString(0)}")
      assert(r.getLong(3) === n - nd)
      assert(r.getLong(4) === mx, s"max_group ${r.getString(0)}")
      assert(r.getBoolean(6) === (nd == n))
    }
    // the synthetic corpus keys orders by o_orderkey
    assert(got.find(_.getString(0) == "o_orderkey").get.getBoolean(6))
  }

  test("sample_neyman_alloc matches a scalar stratified-design replay " +
    "and Neyman never loses to proportional") {
    val rows = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val strata = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nPop = rows.length.toDouble
    def q(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sh = strata.view.mapValues { xs =>
      val n = xs.length.toLong; val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      math.sqrt((n * sxx - sx * sx).toDouble / (n.toDouble * (n - 1)))
    }.toMap
    val wt = strata.keys.toSeq.map(l => q(strata(l).length * sh(l))).sum
    val got = Curation.neymanAllocation(spark, sf0001).collect()
    assert(got.length === strata.size)
    got.foreach { r =>
      val l = r.getString(0); val nh = strata(l).length
      assert(r.getLong(1) === nh.toLong)
      assert(math.abs(r.getDouble(2) - sh(l)) < 1e-5, s"s_h $l")
      assert(math.abs(r.getDouble(3) - 100.0 * nh / nPop) < 1e-5)
      assert(math.abs(r.getDouble(4) -
        100.0 * q(nh * sh(l)).toDouble / wt.toDouble) < 1e-4, s"n_ney $l")
      // Neyman is the variance-minimizing allocation
      assert(r.getDouble(7) <= 1.0 + 1e-9, "efficiency")
    }
  }

  test("text_msttr matches a scalar segmentation replay and diversity " +
    "falls as segments grow") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)
        .filter(_.nonEmpty)))
    val got = TextAnalysis.msttr(spark, sf0001).collect()
    for (w <- Seq(10, 25, 50)) {
      val perLang = docs.groupBy(_._1).view.mapValues { ds =>
        val segs = ds.flatMap { case (_, toks) =>
          toks.grouped(w).filter(_.length == w).map(_.distinct.length.toLong)
        }
        val withSeg = ds.count(_._2.length >= w).toLong
        (withSeg, segs.length.toLong, segs.sum)
      }.toMap
      got.filter(_.getInt(1) == w).foreach { r =>
        val (ndocs, nsegs, stypes) = perLang(r.getString(0))
        assert(r.getLong(2) === ndocs, s"n_docs ${r.getString(0)} w=$w")
        assert(r.getLong(3) === nsegs, s"n_segments w=$w")
        assert(math.abs(r.getDouble(4) -
          stypes.toDouble / (w * nsegs)) < 1e-6, s"msttr w=$w")
      }
    }
    // within a language, a longer segment can only repeat more
    got.groupBy(_.getString(0)).values.foreach { rs =>
      val byW = rs.map(r => r.getInt(1) -> r.getDouble(4)).toMap
      assert(byW(10) >= byW(25) && byW(25) >= byW(50))
    }
  }
}
