package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Round-14 wave-3: scalar replay of the cross-lingual bitext miner —
  * MD5 hyperplane bands, the 2..64 hot-bucket cap, exact micro-unit
  * integer cosine, the mined census and the lang×lang spine are all
  * re-derived in plain Scala and compared cell-for-cell. */
class Round14Wave3Spec extends SparkSpec {

  private def lshBands(v: Array[Float]): Array[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(j: Int, d1: Int): Int = {
      md.reset()
      val dg = md.digest(s"$j:$d1".getBytes("UTF-8"))
      if (((dg(0) >> 4) & 0xf) % 2 == 1) 1 else -1
    }
    Array.tabulate(4) { band =>
      val sb = new StringBuilder
      for (i <- 0 until 8) {
        val j = band * 8 + i
        var p = 0.0
        for (d <- v.indices) p += sign(j, d + 1) * v(d).toDouble
        sb.append(if (p > 0) '1' else '0')
      }
      sb.toString
    }
  }

  test("dedup_bitext_mine matches a scalar LSH-blocked replay") {
    val langOf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter { case (id, _) => langOf.contains(id) }
    val micro = vecs.map { case (id, v) =>
      (id, v.map(x => math.round(x.toDouble * 1e6))) }.toMap
    def cosExact(a: Long, b: Long): Double = {
      val (x, y) = (micro(a), micro(b))
      var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i)
        i += 1
      }
      dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
    }
    // postings with the 2..64 bucket cap
    val posting = vecs.flatMap { case (id, v) =>
      lshBands(v).zipWithIndex.map { case (b, j) => ((j, b), id) } }
      .groupBy(_._1).filter { case (_, m) =>
        m.length >= 2 && m.length <= 64 }
    val cand = collection.mutable.Set[(String, String, Long, Long)]()
    for ((_, members) <- posting) {
      val ids = members.map(_._2)
      for (a <- ids; b <- ids
           if langOf(a) < langOf(b))
        cand += ((langOf(a), langOf(b), a, b))
    }
    val scored = cand.toSeq.map { case (la, lb, a, b) =>
      (la, lb, a, b, cosExact(a, b)) }
    def q9(d: Double): BigDecimal =
      BigDecimal(d).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val langs = langOf.values.toSeq.distinct.sorted
    val expect = (for {
      la <- langs; lb <- langs if la < lb
    } yield {
      val sv = scored.filter(s => s._1 == la && s._2 == lb)
      val mined = sv.filter(_._5 >= 0.35)
      val top = mined.sortBy { case (_, _, a, b, c) => (-c, a, b) }
        .headOption
      ((la, lb), (sv.size.toLong, mined.size.toLong,
        if (mined.isEmpty) None
        else Some(r6((mined.map(m => q9(m._5)).sum /
          mined.size).toDouble)),
        if (mined.isEmpty) None else Some(r6(mined.map(_._5).max)),
        top.map(t => (t._3, t._4))))
    }).toMap

    val got = DedupOps.bitextMine(spark, sf0001).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val e = expect(key)
      assert(r.getLong(2) === e._1, s"candidates of $key")
      assert(r.getLong(3) === e._2, s"mined of $key")
      e._3 match {
        case Some(m) =>
          assert(math.abs(r.getDouble(4) - m) < 1e-9, s"mean of $key")
          assert(math.abs(r.getDouble(5) - e._4.get) < 1e-9,
            s"max of $key")
          assert(r.getLong(6) === e._5.get._1, s"top_a of $key")
          assert(r.getLong(7) === e._5.get._2, s"top_b of $key")
        case None =>
          assert(r.isNullAt(4) && r.isNullAt(5), s"empty pair $key " +
            "must carry NULL stats, not zeros")
      }
    }
  }
}
