package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Similarity}

/** Round-12 wave-8 operators: diagonal-Mahalanobis OOD census and the
  * local clustering-coefficient census — scalar replays on sf0.001. */
class Round12Wave8Spec extends SparkSpec {

  private def vecs() = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("label").cast("long"), col("embedding"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))

  test("sim_ood_mahalanobis matches a scalar diagonal replay") {
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vs = vecs()
    val got = Similarity.oodMahalanobis(spark, sf0001).collect()
    got.foreach { r =>
      val lbl = r.get(0).toString.toLong
      val block = vs.filter(_._2 == lbl)
      val dim = block.head._3.length
      val d2s = block.map { case (v, _, e) =>
        val terms = (0 until dim).map { j =>
          val xs = block.map(b => q9(b._3(j).toDouble))
          val n = xs.length
          val mu = xs.sum / n
          val varJ = (xs.map(x => x * x).sum - xs.sum * xs.sum / n) /
            (n - 1)
          val x = q9(e(j).toDouble)
          BigDecimal((x - mu) * (x - mu) / varJ)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
        (v, terms)
      }
      assert(r.getLong(1) === block.length.toLong)
      assert(r.getLong(2) === dim.toLong)
      assert(r.getLong(3) === d2s.count(_._2 > 2.0 * dim).toLong,
        s"flag count for $lbl")
      assert(math.abs(r.getDouble(4) -
        d2s.map(_._2).sum / block.length) < 1e-2, "mean d2")
      assert(math.abs(r.getDouble(5) - d2s.map(_._2).max) < 1e-2)
      val worst = d2s.maxBy { case (v, d) => (d, v) }
      assert(r.getLong(6) === worst._1, "worst vector id")
      // E[d2] = d for in-distribution data: mean stays near dim
      assert(r.getDouble(4) > 0.5 * dim && r.getDouble(4) < 2.0 * dim)
    }
  }

  test("graph_local_cc matches a scalar per-vertex replay") {
    val vs = vecs()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val got = Graph.localClusteringCoefficient(spark, sf0001).collect()
    got.foreach { r =>
      val lbl = r.get(0).toString.toLong
      val block = vs.filter(_._2 == lbl)
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
      val ccs = adj.toSeq.map { case (v, ns) =>
        val deg = ns.size
        val wedges = deg.toLong * (deg - 1) / 2
        if (wedges == 0) BigDecimal(0)
        else {
          val nsSeq = ns.toSeq.sorted
          var closed = 0L
          for {
            i <- nsSeq.indices; j <- (i + 1) until nsSeq.length
            if adj(nsSeq(i)).contains(nsSeq(j))
          } closed += 1
          BigDecimal(closed.toDouble / wedges)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      assert(r.getLong(1) === adj.size.toLong, "vertex count")
      assert(math.abs(r.getDouble(2) -
        (ccs.sum / ccs.length).toDouble) < 1e-5, s"mean cc for $lbl")
      assert(r.getLong(3) === ccs.count(_ >= 1).toLong)
      assert(r.getLong(4) === ccs.count(_ == 0).toLong)
    }
  }
}
