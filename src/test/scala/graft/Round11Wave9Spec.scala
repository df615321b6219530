package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Relational, Similarity}

/** Round-11 wave-9 operators: replays for greedy graph search, the
  * Syntetos-Boylan demand quadrants, and the daily null-rate p-chart. */
class Round11Wave9Spec extends SparkSpec {

  test("sim_greedy_search trace is monotone, starts at the entry, and " +
    "its brute side matches a scalar nearest-neighbor replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val got = Similarity.greedySearch(spark, sf0001).collect()
    val labels = vecs.map(_._2).distinct
    assert(got.length === labels.length * 7)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      dot / math.sqrt(na * nb)
    }
    labels.foreach { label =>
      val rs = got.filter(_.getInt(0) == label).sortBy(_.getInt(1))
      assert(rs.map(_.getInt(1)).toSeq === (0 to 6))
      val ids = vecs.filter(_._2 == label).map(_._1)
      val qid = ids.min
      assert(rs.head.getLong(2) === ids.max, "hop 0 is the max-id entry")
      // the greedy trace never decreases and never beats brute force
      assert(rs.map(_.getDouble(3)).sliding(2)
        .forall(w => w(1) >= w(0) - 1e-9), s"monotone trace $label")
      val q = vecs.find(_._1 == qid).get._3
      val nn = vecs.filter(v => v._1 != qid)
        .map(v => (v._1, cos(v._3, q)))
        .maxBy { case (id, sNN) => (sNN, -id) }
      rs.foreach { r =>
        assert(r.getLong(4) === nn._1, s"nn_id label $label")
        assert(r.getDouble(3) <= r.getDouble(5) + 1e-9)
        assert(r.getBoolean(6) === (r.getLong(2) == r.getLong(4)))
        assert(ids.contains(r.getLong(2)), "walk stays in the block")
      }
    }
  }

  test("orders_demand_classes matches an exact integer-rational replay") {
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"),
        date_trunc("month", col("l_shipdate")).cast("long").as("mo"),
        round(col("l_quantity") * 100).cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val span = {
      val months = rows.map(_._2).distinct.sorted.map { s =>
        val d = java.time.Instant.ofEpochSecond(s)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
        d.getYear * 12 + d.getMonthValue
      }
      months.max - months.min + 1L
    }
    case class P(m: Long, s: Long, qq: Long)
    val parts = rows.groupBy(_._1).map { case (_, es) =>
      val ms = es.groupBy(_._2).map(_._2.map(_._3).sum)
      P(ms.size.toLong, ms.sum, ms.map(x => x * x).sum)
    }
    def quadrant(p: P): String = {
      val adiHi = span * 100 >= p.m * 132
      val cv2Hi = (p.m * p.qq - p.s * p.s) * 100 >= p.s * p.s * 49
      (adiHi, cv2Hi) match {
        case (false, false) => "smooth"
        case (true, false)  => "intermittent"
        case (false, true)  => "erratic"
        case _              => "lumpy"
      }
    }
    val expected = parts.groupBy(quadrant).view.mapValues(_.size.toLong)
    val got = Relational.demandClasses(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      assert(r.getLong(1) === expected(r.getString(0)),
        s"n_parts ${r.getString(0)}")
      assert(r.getDouble(4) >= 0.0)
    }
    assert(got.map(_.getLong(1)).sum === parts.size.toLong)
  }

  test("dq_pchart matches a scalar binomial-limits replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(to_date(col("ts")).cast("string"), col("value").isNull)
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    val daily = ev.groupBy(_._1).view.mapValues { es =>
      (es.length.toLong, es.count(_._2).toLong) }.toMap
    val tx = daily.values.map(_._2).sum
    val tn = daily.values.map(_._1).sum
    val pbar = tx.toDouble / tn
    val got = Quality.pChart(spark, sf0001).collect()
    assert(got.length === daily.size)
    got.foreach { r =>
      val (n, x) = daily(r.getString(0))
      assert(r.getLong(1) === n && r.getLong(2) === x)
      val sigma = math.sqrt(pbar * (1.0 - pbar) / n)
      assert(math.abs(r.getDouble(3) - x.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(4) - pbar) < 1e-6)
      assert(math.abs(r.getDouble(5) - math.max(0.0, pbar - 3 * sigma))
        < 1e-6)
      assert(math.abs(r.getDouble(6) - math.min(1.0, pbar + 3 * sigma))
        < 1e-6)
      val out = x.toDouble / n > pbar + 3 * sigma ||
        x.toDouble / n < pbar - 3 * sigma
      assert(r.getBoolean(7) === out, s"flag ${r.getString(0)}")
    }
  }
}
