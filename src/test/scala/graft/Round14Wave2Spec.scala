package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-14 wave-2: scalar replay of the layered HNSW search — level
  * draws, the three per-layer 3-NN graphs, the six-hop coarse-to-fine
  * descent, the explored census and the recall@10 fold are all
  * re-derived in plain Scala and compared row-for-row. */
class Round14Wave2Spec extends SparkSpec {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dd += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dd / math.sqrt(na * nb)
  }

  /** Level draw replica: trailing zeros of the first md5 byte of
    * "hnsw:<id>" (0 -> level 8). */
  private def level(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val dg = md.digest(s"hnsw:$id".getBytes("UTF-8"))
    val b = dg(0) & 0xff
    if (b == 0) 8 else java.lang.Integer.numberOfTrailingZeros(b)
  }

  test("sim_hnsw_search matches a scalar layered-descent replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    val layersOfStep = Seq(2, 2, 1, 1, 0, 0)

    val expect = collection.mutable.Map[(Int, Long),
      (Long, Long, Double, Long, Double)]()
    for ((lbl, g) <- byLabel) {
      val qid = g.map(_._1).min
      val qEmb = g.find(_._1 == qid).get._3
      // per-layer symmetric 3-NN graph over nodes with level >= l
      def layerAdj(l: Int): Map[Long, Set[Long]] = {
        val nl = g.filter { case (v, _, _) => level(v) >= l }
        val adj = collection.mutable.Map[Long, Set[Long]]()
          .withDefaultValue(Set.empty)
        for ((v, _, ev) <- nl) {
          val nn = nl.filter(_._1 != v)
            .map { case (u, _, eu) => (u, cos(ev, eu)) }
            .sortBy { case (u, s) => (-s, u) }.take(3).map(_._1)
          for (u <- nn) { adj(v) += u; adj(u) += v }
        }
        adj.toMap.withDefaultValue(Set.empty)
      }
      val adjOf = Seq(2, 1, 0).map(l => l -> layerAdj(l)).toMap
      val simOf = g.filter(_._1 != qid)
        .map { case (v, _, ev) => (v, cos(ev, qEmb)) }.toMap
      val entry = g.filter(_._1 != qid)
        .map { case (v, _, _) => (v, level(v)) }
        .sortBy { case (v, lv) => (-lv, v) }.head._1
      var cur = entry
      val firstSeen = collection.mutable.Map[Long, Int](entry -> 0)
      def record(step: Int, layer: Int): Unit = {
        val brute = simOf.toSeq.sortBy { case (v, s) => (-s, v) }
          .take(10).map(_._1).toSet
        val seen = firstSeen.filter(_._2 <= step).keys.toSet
        expect((lbl, step.toLong)) = (layer.toLong, cur,
          BigDecimal(simOf(cur)).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          seen.size.toLong,
          BigDecimal(seen.count(brute).toDouble / 10).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      record(0, 2)
      for ((l, i) <- layersOfStep.zipWithIndex) {
        val step = i + 1
        val nbrs = adjOf(l)(cur).filter(_ != qid)
        for (n <- nbrs if !firstSeen.contains(n)) firstSeen(n) = step
        val best = (nbrs + cur).toSeq
          .map(v => (v, simOf(v)))
          .sortBy { case (v, s) => (-s, v) }.head._1
        cur = best
        record(step, l)
      }
    }

    val got = Similarity.hnswSearch(spark, sf0001).collect()
    assert(got.nonEmpty)
    assert(got.length === byLabel.size * 7)
    got.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      val e = expect(key)
      assert(r.getLong(2) === e._1, s"layer of $key")
      assert(r.getLong(3) === e._2, s"node of $key")
      assert(math.abs(r.getDouble(4) - e._3) < 1e-3, s"sim of $key")
      assert(r.getLong(5) === e._4, s"n_explored of $key")
      assert(math.abs(r.getDouble(6) - e._5) < 1e-9, s"recall of $key")
    }
    // descent invariants: sim is monotone non-decreasing along steps,
    // explored count is non-decreasing, and at least one label climbs
    val byLbl = got.groupBy(_.getInt(0))
    for ((_, rows) <- byLbl) {
      val o = rows.sortBy(_.getLong(1))
      o.sliding(2).foreach { w =>
        assert(w(1).getDouble(4) >= w(0).getDouble(4) - 1e-9)
        assert(w(1).getLong(5) >= w(0).getLong(5))
      }
    }
    assert(byLbl.values.exists { rows =>
      val o = rows.sortBy(_.getLong(1))
      o.last.getDouble(4) > o.head.getDouble(4)
    }, "no label improved over its entry — descent is inert")
  }
}
