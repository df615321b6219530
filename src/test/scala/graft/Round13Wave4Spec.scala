package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-13 wave-4: scalar Brandes replay for the sampled-source
  * betweenness row. */
class Round13Wave4Spec extends SparkSpec {

  test("graph_betweenness matches a scalar 3-hop Brandes replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dd += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dd / math.sqrt(na * nb)
    }
    val byLabel = vecs.groupBy(_._2)
    // directed 3-NN per vector within its label, then symmetrize
    val adj = collection.mutable.Map[(Int, Long), Set[Long]]()
      .withDefaultValue(Set.empty)
    for ((lbl, g) <- byLabel; (v, _, e) <- g) {
      val nn = g.filter(_._1 != v)
        .map { case (u, _, eu) => (u, cos(e, eu)) }
        .sortBy { case (u, s) => (-s, u) }.take(3).map(_._1)
      for (u <- nn) {
        adj((lbl, v)) += u
        adj((lbl, u)) += v
      }
    }
    val expect = collection.mutable.Map[(Int, Long), BigDecimal]()
    val hits = collection.mutable.Map[(Int, Long), Long]()
    for ((lbl, g) <- byLabel;
         seed <- g.map(_._1).sorted.take(3)) {
      // forward BFS to 3 hops with path counts
      val dist = collection.mutable.Map[Long, Int](seed -> 0)
      val sig = collection.mutable.Map[Long, Long](seed -> 1L)
      var frontier = Seq(seed)
      for (d <- 1 to 3) {
        val next = collection.mutable.Map[Long, Long]()
        for (v <- frontier; u <- adj((lbl, v)).toSeq.sorted
             if !dist.contains(u) || dist(u) == d)
          if (!dist.contains(u) || dist(u) == d) {
            dist(u) = d
            next(u) = next.getOrElse(u, 0L) + sig(v)
          }
        next.foreach { case (u, s) => sig(u) = s }
        frontier = next.keys.toSeq
      }
      // backward dependency accumulation, horizon-truncated at 3
      val delta = collection.mutable.Map[Long, BigDecimal]()
        .withDefaultValue(BigDecimal(0))
      for (d <- 2 to 1 by -1;
           v <- dist.filter(_._2 == d).keys.toSeq.sorted) {
        var acc = BigDecimal(0)
        for (w <- adj((lbl, v)) if dist.get(w).contains(d + 1))
          acc += BigDecimal(sig(v).toDouble / sig(w) *
            (1.0 + delta(w).toDouble))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        delta(v) = acc
      }
      for ((v, d) <- dist if d == 1 || d == 2) {
        expect((lbl, v)) = expect.getOrElse((lbl, v), BigDecimal(0)) +
          delta(v)
        hits((lbl, v)) = hits.getOrElse((lbl, v), 0L) + 1L
      }
    }
    val got = Graph.betweennessSampled(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val key = (r.getInt(0), r.getLong(2))
      assert(math.abs(r.getDouble(3) - expect(key).toDouble) < 1e-6,
        s"betweenness of $key")
      assert(r.getLong(4) === hits(key), s"seed paths of $key")
    }
    // per label the emitted rows are the top-3 by dependency
    got.groupBy(_.getInt(0)).foreach { case (lbl, rows) =>
      val top = expect.filter(_._1._1 == lbl).toSeq
        .sortBy { case ((_, v), b) => (-b, v) }.take(rows.length)
        .map(_._1._2)
      assert(rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq === top,
        s"label $lbl top brokers")
    }
  }

  test("events_event_study: week -1 coefficient is exactly 0 (the " +
    "omitted baseline) and gap algebra is internally consistent") {
    val rows = graft.operators.EventAnalytics
      .eventStudy(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val wm1 = rows.find(_.getLong(0) == -1L).get
    assert(wm1.getDouble(4) === 0.0, "baseline week normalizes to 0")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3) -
        (r.getDouble(1) - r.getDouble(2))) < 0.02, "gap = treat - ctrl")
      assert(r.getBoolean(5) === (r.getLong(0) < 0))
    }
  }

  test("orders_eoq: EOQ grows with sqrt of demand and the cycle value " +
    "is half EOQ x price") {
    val rows = graft.operators.Relational.eoq(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // inputs are rounded outputs (2/4 decimals), so compare
      // relatively — replays from rounded terms drift up to ~q*5e-5
      val (d, p, q) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      def close(a: Double, b: Double): Boolean =
        math.abs(a - b) <= 0.001 * math.abs(b) + 0.05
      assert(close(q, math.sqrt(200.0 * d / (0.2 * p))), "eoq")
      assert(close(r.getDouble(5), q * p / 2.0), "cycle value")
      assert(close(r.getDouble(4), d / q), "orders per year")
    }
  }
}
