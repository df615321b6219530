package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Graph, Relational, Similarity}

/** Round-11 wave-17 operators: scalar replays for the Lorenz curve,
  * A/B power analysis, and k-NN edge reciprocity. */
class Round11Wave17Spec extends SparkSpec {

  test("orders_lorenz_curve matches a scalar decile replay and the " +
    "curve is convex below the diagonal") {
    val xs = Tables(spark, sf0001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(_.getLong(1)).sorted
    val eTot = xs.map(BigInt(_)).sum
    val got = Relational.lorenzCurve(spark, sf0001).collect()
    assert(got.length === 10)
    got.foreach { r =>
      val k = r.getInt(0)
      val cut = (k.toLong * xs.length / 10).toInt
      assert(r.getLong(1) === cut.toLong)
      val rev = xs.take(cut).map(BigInt(_)).sum
      assert(math.abs(r.getDouble(2) - rev.toDouble / 100.0) < 1e-2,
        s"cum_revenue k=$k")
      assert(math.abs(r.getDouble(3) - rev.toDouble / eTot.toDouble)
        < 1e-6)
      // the poorest k deciles never hold more than k/10 of the revenue
      assert(r.getDouble(4) >= -1e-9, s"below diagonal k=$k")
    }
    // shares are monotone and end at 1
    assert(got.map(_.getDouble(3)).sliding(2).forall(w => w(1) >= w(0)))
    assert(math.abs(got.last.getDouble(3) - 1.0) < 1e-9)
  }

  test("events_ab_power matches a scalar MDE replay") {
    val users = Tables(spark, sf0001, "events")
      .select(col("user_id"), (col("event_type") === "purchase"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val byArm = users.groupBy(_._1 % 2 == 0)
    val got = EventAnalytics.abPower(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    def stats(a: Boolean): (Long, Long) = {
      val us = byArm(a)
      (us.length.toLong, us.count(_._2).toLong)
    }
    val (nA, cA) = stats(true); val (nB, cB) = stats(false)
    assert(r.getLong(0) === nA && r.getLong(1) === nB)
    assert(r.getLong(2) === cA && r.getLong(3) === cB)
    val pPool = (cA + cB).toDouble / (nA + nB)
    val nHarm = 2.0 * nA * nB / (nA + nB)
    val mde = (1.959964 + 0.841621) *
      math.sqrt(2.0 * pPool * (1.0 - pPool) / nHarm)
    assert(math.abs(r.getDouble(4) - pPool) < 1e-6)
    assert(math.abs(r.getDouble(5) - nHarm) < 1e-2)
    assert(math.abs(r.getDouble(6) - mde) < 1e-6)
    assert(math.abs(r.getDouble(7) - mde / pPool) < 1e-6)
    // MDE must shrink if arms grew: sanity on the direction
    assert(r.getDouble(6) > 0 && r.getDouble(6) < 1)
  }

  test("graph_reciprocity matches a scalar mutual-edge replay") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val set = edges.toSet
    val got = Graph.reciprocity(spark, sf0001).collect()
    edges.groupBy(_._1).foreach { case (label, es) =>
      val mutual = es.count(e => set.contains((e._1, e._3, e._2)))
      val r = got.find(_.getInt(0) == label).get
      assert(r.getLong(1) === es.length.toLong, s"n_directed $label")
      assert(r.getLong(2) === mutual.toLong, s"n_mutual $label")
      assert(math.abs(r.getDouble(3) -
        mutual.toDouble / es.length) < 1e-6)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
