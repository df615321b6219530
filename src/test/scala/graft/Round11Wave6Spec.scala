package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Relational, Similarity,
  StreamingAnalytics}

/** Round-11 wave-6 operators: scalar replays for sequential-pattern
  * support, multi-probe LSH candidate generation, and the streaming PSI
  * monitor's fold to the batch drift operator. */
class Round11Wave6Spec extends SparkSpec {

  private def md5bytes(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))

  test("events_seq_patterns matches a scalar min/max-timestamp replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val summary = ev.groupBy(e => (e._1, e._2)).view.mapValues { es =>
      (es.map(_._3).min, es.map(_._3).max)
    }.toMap
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct
    val exp = (for (a <- types; b <- types) yield {
      val n = users.count { u =>
        (summary.get((u, a)), summary.get((u, b))) match {
          case (Some((mnA, _)), Some((_, mxB))) => mnA < mxB
          case _ => false
        }
      }
      ((a, b), n.toLong)
    }).filter(_._2 > 0).toMap
    val hasA = types.map(a => a -> users.count(u =>
      summary.contains((u, a))).toLong).toMap
    val got = EventAnalytics.seqPatterns(spark, sf0001).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === exp(key), s"n_users_pattern $key")
      assert(math.abs(r.getDouble(3) -
        exp(key).toDouble / users.length) < 1e-6)
      assert(math.abs(r.getDouble(4) -
        exp(key).toDouble / hasA(key._1)) < 1e-6)
    }
  }

  test("sim_multiprobe_lsh candidate sets match a scalar bucket replay " +
    "and recall/candidates grow with the probe budget") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def proj(v: Array[Float], j: Int): Double = {
      var p = 0.0
      for (d <- v.indices)
        p += (if (((md5bytes(s"$j:${d + 1}")(0) >> 4) & 0xf) % 2 == 1)
          v(d) else -v(d))
      p
    }
    def bucket(v: Array[Float]): String =
      (0 until 8).map(j => if (proj(v, j) > 0) '1' else '0').mkString
    val vb = vecs.map { case (id, _, v) => (id, bucket(v)) }.toMap
    val queries = vecs.groupBy(_._2).view.mapValues(_.minBy(_._1)).toMap
    val got = Similarity.multiprobeLsh(spark, sf0001).collect()
    queries.foreach { case (label, (qid, _, qv)) =>
      val margins = (0 until 8).map(j => (math.abs(proj(qv, j)), j)).sorted
      val base = bucket(qv)
      val probeBuckets = base +: margins.map { case (_, j) =>
        base.updated(j, if (base(j) == '1') '0' else '1')
      }
      for (p <- Seq(1, 5, 9)) {
        val bs = probeBuckets.take(p).toSet
        val cand = vecs.filter(v => v._1 != qid && bs.contains(vb(v._1)))
        val row = got.find(r => r.getInt(0) == label && r.getInt(1) == p)
        assert(row.isDefined, s"row $label/$p")
        assert(row.get.getLong(2) === cand.length.toLong,
          s"n_candidates $label/$p")
      }
      // more probes never shrink the candidate set or the recall
      val rs = got.filter(_.getInt(0) == label).sortBy(_.getInt(1))
      assert(rs.map(_.getLong(2)).sliding(2).forall(w => w(0) <= w(1)))
      assert(rs.map(_.getDouble(3)).sliding(2).forall(w => w(0) <= w(1)))
    }
  }

  test("stream_psi_monitor look 1 is the zero self-compare and look 2 " +
    "folds to the batch dq_psi_drift total") {
    val got = StreamingAnalytics.streamPsiMonitor(spark, sf0001).collect()
    assert(got.length === 2)
    val l1 = got(0); val l2 = got(1)
    assert(l1.getInt(0) === 1 && l2.getInt(0) === 2)
    assert(l1.getLong(1) === l1.getLong(2))
    assert(l1.getDouble(3) === 0.0)
    val batch = Relational.psiDrift(spark, sf0001)
      .select(col("psi_total")).head().getDouble(0)
    assert(l2.getDouble(3) === batch,
      "streaming look-2 PSI must equal the batch operator's total")
    assert(l1.getLong(1) + l2.getLong(2) > 0)
  }
}
