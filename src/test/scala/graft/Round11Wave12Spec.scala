package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Quality, Relational, Similarity}

/** Round-11 wave-12 operators: scalar replays for HITS, the row-hash
  * XOR rollup, and the Laspeyres/Paasche/Fisher price indexes. */
class Round11Wave12Spec extends SparkSpec {

  private def q12(x: Double) = BigDecimal(x)
    .setScale(12, BigDecimal.RoundingMode.HALF_UP)

  test("graph_hits matches a scalar two-round mutual-reinforcement " +
    "replay") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val got = Graph.hitsKnn(spark, sf0001).collect()
    edges.groupBy(_._1).foreach { case (label, es) =>
      def normalize(m: Map[Long, Double]): Map[Long, Double] = {
        val tot = m.values.map(q12).sum.toDouble
        m.view.mapValues(_ / tot).toMap
      }
      val a1 = normalize(es.groupBy(_._3).view
        .mapValues(_.length.toDouble).toMap)
      val h1 = normalize(es.groupBy(_._2).view.mapValues(
        _.map(e => q12(a1(e._3))).sum.toDouble).toMap)
      val a2 = normalize(es.groupBy(_._3).view.mapValues(
        _.map(e => q12(h1.getOrElse(e._2, 0.0))).sum.toDouble).toMap)
      val top = a2.toSeq.sortBy { case (n, a) => (-a, n) }.take(3)
      val rs = got.filter(_.getInt(0) == label).sortBy(_.getInt(1))
      assert(rs.length === 3)
      rs.zip(top).foreach { case (r, (node, a)) =>
        assert(r.getLong(2) === node, s"node label $label rk ${r.getInt(1)}")
        assert(math.abs(r.getDouble(3) - a) < 1e-5, "authority")
        assert(math.abs(r.getDouble(4) - h1.getOrElse(node, 0.0)) < 1e-5)
      }
      // each normalized score relation sums to 1
      assert(math.abs(a2.values.sum - 1.0) < 1e-9)
    }
  }

  test("dq_rowhash_rollup: the ALL fingerprint is the XOR of the day " +
    "fingerprints and flips on any row change") {
    val got = Quality.rowhashRollup(spark, sf0001).collect()
    val (all, days) = got.partition(_.getString(0) == "ALL")
    assert(all.length === 1)
    assert(all.head.getLong(1) === days.map(_.getLong(1)).sum)
    assert(all.head.getLong(2) ===
      days.map(_.getLong(2)).reduce(_ ^ _),
      "ALL is the XOR-fold of the day partitions")
    // scalar replay of one day's fingerprint
    val md = java.security.MessageDigest.getInstance("MD5")
    val sample = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
        col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd")).collect()
    val byDay = sample.groupBy(_.getString(6))
    val (day, rows) = byDay.head
    val expected = rows.map { r =>
      val s = s"${r.getLong(0)}|${r.getLong(1)}|${r.getString(2)}|" +
        s"${r.getLong(3)}|${r.getString(4)}|${r.getString(5)}"
      md.reset()
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(6)
          .map("%02x".format(_)).mkString, 16)
    }.reduce(_ ^ _)
    assert(days.find(_.getString(0) == day).get.getLong(2) === expected)
  }

  test("orders_price_index matches a scalar replay and Fisher sits " +
    "between Laspeyres and Paasche") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"), year(col("l_shipdate")),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_quantity") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val y0 = li.map(_._2).min; val y1 = li.map(_._2).max
    def period(y: Int): Map[Long, (Double, Long)] =
      li.filter(_._2 == y).groupBy(_._1).view.mapValues { es =>
        val e = es.map(_._3).sum; val q = es.map(_._4).sum
        (e.toDouble / q, q)
      }.toMap
    val p0 = period(y0); val p1 = period(y1)
    val common = p0.keySet intersect p1.keySet
    def s(f: Long => Double): Double =
      common.toSeq.map(k => q12(f(k))).sum.toDouble
    val l = s(k => p1(k)._1 * p0(k)._2) / s(k => p0(k)._1 * p0(k)._2)
    val p = s(k => p1(k)._1 * p1(k)._2) / s(k => p0(k)._1 * p1(k)._2)
    val got = Relational.priceIndexes(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getInt(0) === y0 && r.getInt(1) === y1)
    assert(r.getLong(2) === common.size.toLong)
    assert(math.abs(r.getDouble(3) - l) < 1e-5, "laspeyres")
    assert(math.abs(r.getDouble(4) - p) < 1e-5, "paasche")
    assert(math.abs(r.getDouble(5) - math.sqrt(l * p)) < 1e-5, "fisher")
    val lo = math.min(r.getDouble(3), r.getDouble(4))
    val hi = math.max(r.getDouble(3), r.getDouble(4))
    assert(r.getDouble(5) >= lo - 1e-9 && r.getDouble(5) <= hi + 1e-9)
  }
}
