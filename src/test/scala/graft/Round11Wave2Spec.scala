package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Graph, Similarity, TextAnalysis}

/** Round-11 wave-2 operators: driver-side first-principles
  * recomputations for the winnowing fingerprint census, the rolling
  * active-user time series, and the k-NN-graph BFS distance census. */
class Round11Wave2Spec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("text_winnowing census matches a scalar winnowing replay and " +
    "obeys the density guarantee") {
    val k = 8; val w = 4
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // plain scalar winnowing: k-gram md5s, rightmost-min per window,
    // dedup selected (hash, pos) pairs
    case class D(source: String, nWindows: Int, fps: Set[(String, Int)])
    val per = docs.flatMap { case (_, src, text) =>
      val n = text.length - (k - 1)
      if (n < w) None else {
        val h = (1 to n).map(i => md5hex(text.substring(i - 1, i - 1 + k)))
        val sel = (1 to n - w + 1).map { j =>
          // rightmost min of h(j-1 .. j+w-2)
          val win = (j to j + w - 1).map(p => (h(p - 1), p))
          win.minBy { case (hh, p) => (hh, -p) }
        }.toSet
        Some(D(src, n - w + 1, sel))
      }
    }
    val expected = per.groupBy(_.source).map { case (src, ds) =>
      val allHashes = ds.flatMap(d => d.fps.map(_._1).toSeq.distinct
        .map(h => (h, d))).groupBy(_._1)
      (src, (ds.length.toLong, ds.map(_.nWindows.toLong).sum,
        ds.map(_.fps.size.toLong).sum,
        allHashes.size.toLong,
        allHashes.count(_._2.length >= 2).toLong))
    }
    val got = TextAnalysis.winnowing(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val e = expected(r.getString(0))
      assert(r.getLong(1) === e._1, s"n_docs ${r.getString(0)}")
      assert(r.getLong(2) === e._2, s"n_windows ${r.getString(0)}")
      assert(r.getLong(3) === e._3, s"n_fp ${r.getString(0)}")
      assert(r.getLong(5) === e._4, s"n_hash_distinct ${r.getString(0)}")
      assert(r.getLong(6) === e._5, s"n_hash_shared ${r.getString(0)}")
      // winnowing guarantees >= 1 fp per window and expected density
      // ~ 2/(w+1) = 0.4; the census must sit in a sane band around it
      val density = r.getDouble(4)
      assert(density > 0.2 && density < 0.6, s"density $density")
    }
  }

  test("events_rolling_actives matches a scalar sliding-window replay " +
    "and nests dau <= wau7 <= mau28") {
    val ud = Tables(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct.sorted
    val got = EventAnalytics.rollingActives(spark, sf0001).collect()
    assert(got.length === days.length)
    got.foreach { r =>
      val day = java.time.LocalDate.parse(r.getString(0))
      def actives(span: Int): Long = ud.filter { case (_, d) =>
        !d.isAfter(day) && d.isAfter(day.minusDays(span))
      }.map(_._1).distinct.length.toLong
      assert(r.getLong(1) === actives(1), s"dau $day")
      assert(r.getLong(2) === actives(7), s"wau7 $day")
      assert(r.getLong(3) === actives(28), s"mau28 $day")
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3))
    }
  }

  test("graph_bfs_knn census matches a scalar BFS over the same edges " +
    "and accounts for every vertex exactly once") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nodes = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val expected = nodes.groupBy(_._1).toSeq.flatMap { case (lbl, ns) =>
      val vs = ns.map(_._2).toSet
      val adj = edges.filter(_._1 == lbl)
        .flatMap(e => Seq((e._2, e._3), (e._3, e._2)))
        .groupBy(_._1).map { case (v, es) => (v, es.map(_._2).toSet) }
      val seed = vs.min
      var visited = Map(seed -> 0)
      var frontier = Set(seed)
      for (d <- 1 to 3) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .diff(visited.keySet)
        visited = visited ++ next.map(_ -> d)
        frontier = next
      }
      val dists = vs.toSeq.map(v => visited.getOrElse(v, -1))
      dists.groupBy(identity).map { case (d, g) =>
        ((lbl, d), g.length.toLong)
      }
    }.toMap
    val got = Graph.bfsKnn(spark, sf0001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got === expected)
    // every vertex appears exactly once across the distance census
    val perLabel = got.toSeq.groupBy(_._1._1)
      .map { case (l, g) => (l, g.map(_._2).sum) }
    val nodesPerLabel = nodes.groupBy(_._1)
      .map { case (l, g) => (l, g.length.toLong) }
    assert(perLabel === nodesPerLabel)
  }
}
