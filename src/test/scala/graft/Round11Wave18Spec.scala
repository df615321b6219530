package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Relational, Similarity}

/** Round-11 wave-18 operators: scalar replays for cluster source
  * purity, the Wald-Wolfowitz runs test, and two-NN intrinsic
  * dimension. */
class Round11Wave18Spec extends SparkSpec {

  test("dedup_cluster_purity matches a scalar majority replay over the " +
    "gated cluster assignment") {
    val clusters = DedupOps.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byCluster = clusters.groupBy(_._2)
    val got = DedupOps.clusterPurity(spark, sf0001).collect()
    assert(got.length === byCluster.size)
    var pure = 0L; var docs = 0L
    byCluster.foreach { case (cid, members) =>
      val counts = members.map(m => srcOf(m._1))
        .groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (s, n) => (-n, s) }
      val r = got.find(_.getLong(0) == cid).get
      assert(r.getLong(1) === members.length.toLong)
      assert(r.getString(2) === counts.head._1, s"top_source $cid")
      assert(r.getLong(3) === counts.head._2.toLong)
      assert(math.abs(r.getDouble(4) -
        counts.head._2.toDouble / members.length) < 1e-6)
      pure += counts.head._2; docs += members.length
    }
    got.foreach(r => assert(math.abs(r.getDouble(5) -
      pure.toDouble / docs) < 1e-6))
  }

  test("orders_runs_test matches a scalar runs replay") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).cast("string").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val sorted = daily.map(_._2).sorted
    val median = sorted(math.ceil(sorted.length / 2.0).toInt - 1)
    val signs = daily.filter(_._2 != median).map(_._2 > median)
    val r0 = 1 + signs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
    val n1 = signs.count(identity).toLong
    val n2 = signs.length - n1
    val n = n1 + n2
    val mu = 2.0 * n1 * n2 / n + 1.0
    val variance = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) /
      (n.toDouble * n * (n - 1))
    val got = Relational.runsTest(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    assert(r.getLong(2) === r0.toLong, "runs")
    assert(math.abs(r.getDouble(3) - mu) < 1e-3)
    assert(math.abs(r.getDouble(4) -
      (r0 - mu) / math.sqrt(variance)) < 1e-4)
  }

  test("sim_intrinsic_dim matches a scalar two-NN replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0f; var na = 0.0f; var nb = 0.0f
      for (i <- a.indices) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      (dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)).toFloat)
        .toDouble
    }
    val got = Similarity.intrinsicDim(spark, sf0001).collect()
    vecs.groupBy(_._2).foreach { case (label, vs) =>
      var sln = BigDecimal(0); var used = 0L
      vs.foreach { case (id, _, v) =>
        val sims = vs.filter(_._1 != id)
          .map(o => (cos(v, o._3), o._1))
          .sortBy { case (s, oid) => (-s, oid) }.take(2)
        val d1 = 1.0 - sims(0)._1; val d2 = 1.0 - sims(1)._1
        if (d1 > 0) {
          used += 1
          sln += BigDecimal(math.log(d2 / d1))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      val r = got.find(_.getInt(0) == label).get
      assert(r.getLong(1) === vs.length.toLong)
      assert(r.getLong(2) === used, s"n_used $label")
      assert(math.abs(r.getDouble(3) - used / sln.toDouble) < 0.05,
        s"id_hat $label")
      // a 64-d random-ish block should not read as low-dimensional
      assert(r.getDouble(3) > 5.0)
    }
  }
}
