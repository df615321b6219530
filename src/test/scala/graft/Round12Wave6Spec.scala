package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, EventAnalytics, Relational}

/** Round-12 wave-6 operators: Horvitz–Thompson estimation, growth
  * accounting, and leave-one-out target encoding — scalar replays on
  * sf0.001. */
class Round12Wave6Spec extends SparkSpec {

  test("sample_horvitz_thompson matches a scalar replay and the " +
    "estimator lands near the true mass") {
    val d = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mass = d.map(r => BigInt(r._3)).sum.toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(id: Long): Double = {
      md.reset()
      val h = md.digest(s"ht:$id".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16).toDouble / 4294967296.0
    }
    val withPi = d.map { case (l, id, nc) =>
      (l, nc, math.min(1.0, 100.0 * nc / mass), u(id)) }
    val got = Curation.horvitzThompson(spark, sf0001).collect()
    got.foreach { r =>
      val lang = r.getString(0)
      val mine = withPi.filter(_._1 == lang)
      val sampled = mine.filter(x => x._4 < x._3)
      assert(r.getLong(1) === mine.length.toLong)
      assert(r.getLong(2) === sampled.length.toLong, "realized n")
      val ht = sampled.map(x =>
        BigDecimal(x._2.toDouble / x._3)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(math.abs(r.getDouble(5) - ht) < 1e-2, s"HT for $lang")
      assert(r.getLong(4) === mine.map(x => BigInt(x._2)).sum.toLong)
      // unbiasedness in practice: within 50% of truth per language
      assert(r.getDouble(6) < 0.5, s"rel_err for $lang")
    }
  }

  test("events_growth_accounting: components tile the weekly revenue") {
    val got = EventAnalytics.growthAccounting(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rev, nw, ret, res) = (r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))
      // every active user-week is exactly one of new/retained/resurrected
      assert(math.abs(rev - (nw + ret + res)) < 1e-6,
        s"partition of revenue in week ${r.getString(0)}")
    }
    // first week is all-new by definition
    assert(math.abs(got.head.getDouble(2) - got.head.getDouble(3)) < 1e-6)
    assert(got.head.getDouble(6) === 0.0, "nothing churned before week 1")
    // week-over-week bridge: rev_w = rev_{w-1} + new + res - churned
    //   + (retained_w - prior rev of retained users); the bridge terms
    //   we emit must at least bound the direct delta
    val weeks = got.map(_.getString(0))
    assert(weeks === weeks.sorted)
  }

  test("feature_target_encoding matches a scalar LOO replay") {
    val rows = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = Relational.targetEncoding(spark, sf0001).collect()
    assert(got.length === rows.map(_._1).distinct.length)
    got.foreach { r =>
      val cat = r.getString(0)
      val ys = rows.filter(_._1 == cat).map(_._2)
      val n = ys.length
      val sy = ys.map(BigInt(_)).sum
      assert(r.getLong(1) === n.toLong)
      val loo = ys.map(y => (sy - y).toDouble / (n - 1))
      assert(math.abs(r.getDouble(2) - sy.toDouble / n / 100) < 1e-3)
      // LOO mean equals the naive mean by algebra
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-3)
      assert(math.abs(r.getDouble(4) - loo.min / 100) < 1e-2)
      assert(math.abs(r.getDouble(5) - loo.max / 100) < 1e-2)
      // the anti-correlation fingerprint of a leak-free encode
      assert(r.getBoolean(6), s"LOO must anticorrelate in $cat")
    }
  }
}
