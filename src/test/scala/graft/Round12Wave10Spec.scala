package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-12 wave-10: the hybrid lexical+semantic RRF retrieval
  * capstone — scalar replay on sf0.001. */
class Round12Wave10Spec extends SparkSpec {

  test("text_hybrid_retrieval matches a scalar BM25 + cosine RRF replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = docs.flatMap { case (d, t) =>
      t.split(" ", -1).filter(_.nonEmpty).map(w => (d, w))
    }.groupBy(identity).map { case ((d, w), g) => (d, w, g.length.toLong) }
      .toSeq
    val lens = tf.groupBy(_._1).map { case (d, g) => d -> g.map(_._3).sum }
    val n = lens.size
    val totalLen = lens.values.sum
    val dfm = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val query = dfm.toSeq.sortBy { case (w, d) => (-d, w) }
      .slice(19, 22).toMap
    val bm25 = tf.filter(r => query.contains(r._2)).groupBy(_._1)
      .map { case (d, g) =>
        d -> g.map { case (_, w, f) =>
          val dfT = dfm(w)
          val idf = math.log(1.0 + (n.toDouble - dfT + 0.5) /
            (dfT.toDouble + 0.5))
          val norm = 1.2 * (0.25 + 0.75 * lens(d).toDouble * n /
            totalLen.toDouble)
          BigDecimal(idf * f * 2.2 / (f.toDouble + norm))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
      }
    val rLex = bm25.toSeq.sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, _), i) => d -> (i + 1L) }.toMap
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dd += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dd / math.sqrt(na * nb)
    }
    val anchorId = rLex.find(_._2 == 1L).get._1
    val aEmb = vecs.find(_._1 == anchorId).get._2
    val rSem = vecs.filter(_._1 != anchorId)
      .map { case (v, e) => (v, cos(e, aEmb)) }
      .sortBy { case (v, s) => (-s, v) }
      .zipWithIndex.map { case ((v, _), i) => v -> (i + 1L) }.toMap
    val allIds = (rLex.keySet ++ rSem.keySet).toSeq
    val fused = allIds.map { d =>
      val rrf = rLex.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rSem.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (d, rrf)
    }.sortBy { case (d, s) => (-s, d) }.take(10)
    val got = TextAnalysis.hybridRetrieval(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(fused).foreach { case (r, (d, rrf)) =>
      assert(r.getLong(1) === d, s"doc at fused rank ${r.getLong(0)}")
      assert(math.abs(r.getDouble(4) - rrf) < 1e-6)
      if (!r.isNullAt(2)) assert(r.getLong(2) === rLex(d), "r_lex")
      if (!r.isNullAt(3)) assert(r.getLong(3) === rSem(d), "r_sem")
    }
    // the anchor document itself fuses with no semantic rank
    val anchorRow = got.find(_.getLong(1) == anchorId)
    anchorRow.foreach(r => assert(r.isNullAt(3),
      "anchor has no semantic self-rank"))
  }
}
