package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Round-12 wave-4 operators: hubness census, filtered ANN tradeoff,
  * and rho-filtering data selection — scalar replays on sf0.001. */
class Round12Wave4Spec extends SparkSpec {

  private def vecs() = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("label").cast("long"), col("embedding"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    d / math.sqrt(na * nb)
  }

  test("sim_hubness matches a scalar in-degree replay") {
    val vs = vecs()
    val got = Similarity.hubness(spark, sf0001).collect()
    val byLabel = vs.groupBy(_._2)
    assert(got.length === byLabel.size)
    got.foreach { r =>
      val lbl = r.get(0).toString.toLong
      val block = byLabel(lbl)
      val inDeg = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      block.foreach { case (v1, _, e1) =>
        block.filter(_._1 != v1)
          .map { case (v2, _, e2) => (v2, cos(e1, e2)) }
          .sortBy { case (v2, s) => (-s, v2) }.take(3)
          .foreach { case (v2, _) => inDeg(v2) += 1 }
      }
      val ds = block.map(b => inDeg(b._1))
      assert(r.getLong(1) === block.length.toLong, "n_vectors")
      assert(r.getLong(2) === ds.count(_ == 0).toLong, "anti-hubs")
      val hub = block.map(b => (inDeg(b._1), b._1))
        .sortBy { case (d, v) => (-d, v) }.head
      assert(r.getLong(3) === hub._2, "top hub id")
      assert(r.getLong(4) === hub._1, "top k-occurrence")
      val mean = ds.sum.toDouble / ds.length
      assert(math.abs(r.getDouble(5) - mean) < 1e-6)
      // mean in-degree equals k when every vertex has k out-edges
      assert(math.abs(mean - 3.0) < 1e-9)
      val variance = (ds.length.toLong * ds.map(d => d * d).sum -
        ds.sum * ds.sum).toDouble
      assert(math.abs(r.getDouble(6) -
        math.sqrt(variance) / ds.length) < 1e-6, "std")
    }
  }

  test("sim_filtered_topk matches a scalar pre/post-filter replay") {
    val vs = vecs()
    val q = vs.sortBy(_._1).take(5)
    val got = Similarity.filteredTopK(spark, sf0001).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val qid = r.getLong(0)
      val qe = q.find(_._1 == qid).get._3
      val scored = vs.filter(_._1 != qid)
        .map { case (v, _, e) => (v, cos(e, qe)) }
        .sortBy { case (v, s) => (-s, v) }
      val pre = scored.filter(_._1 % 2 == 0).take(10).map(_._1).toSet
      val post = scored.take(20).map(_._1).filter(_ % 2 == 0).toSet
      assert(r.getLong(1) === pre.size.toLong, "n_truth")
      assert(r.getLong(2) === post.size.toLong, "n_post_kept")
      assert(r.getLong(3) === (pre & post).size.toLong, "n_hit")
      assert(math.abs(r.getDouble(4) -
        (pre & post).size.toDouble / pre.size) < 1e-4)
      // post-filter can never beat the exact pre-filter ground truth
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("docs_rho_select matches a scalar perplexity-ratio replay") {
    val toks = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tgt = toks.map(_._2).min
    val gen = toks.groupBy(_._3).map { case (t, g) => t -> g.length.toLong }
    val tc = toks.filter(_._2 == tgt).groupBy(_._3)
      .map { case (t, g) => t -> g.length.toLong }
    val v = gen.size.toLong
    val nGen = gen.values.sum
    val nTgt = tc.values.sum
    def lr(t: String): Double =
      math.log((tc.getOrElse(t, 0L) + 1).toDouble / (nTgt + v)) -
        math.log((gen(t) + 1).toDouble / (nGen + v))
    val perDoc = toks.groupBy(r => (r._1, r._2)).map { case ((d, s), g) =>
      val terms = g.groupBy(_._3).map { case (t, tg) =>
        BigDecimal(tg.length * lr(t))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (d, s, g.length.toLong, terms.toDouble / g.length)
    }.toSeq.sortBy { case (d, _, _, rho) => (-rho, d) }.take(10)
    val got = Curation.rhoSelect(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(perDoc).foreach { case (r, (d, s, n, rho)) =>
      assert(r.getLong(1) === d, s"rank ${r.getLong(0)}")
      assert(r.getString(2) === s)
      assert(r.getLong(3) === n)
      assert(math.abs(r.getDouble(4) - rho) < 1e-5, s"rho for doc $d")
      assert(r.getBoolean(5) === (s == tgt))
    }
  }
}
