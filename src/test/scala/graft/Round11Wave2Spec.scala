package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, DedupOps, EventAnalytics, Graph,
  Multimodal, Quality, Relational, Similarity, StreamingAnalytics,
  TextAnalysis}

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

  test("sim_dbscan census matches a scalar DBSCAN replay on the same " +
    "neighbor relation") {
    val eps = 0.20; val minPts = 3
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Float = {
      var dot = 0f; var na = 0f; var nb = 0f
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      // mirror CosineSimilarityF32 exactly: float division by the
      // product of FLOAT-truncated square roots
      dot / (math.sqrt(na.toDouble).toFloat *
        math.sqrt(nb.toDouble).toFloat)
    }
    val byLabel = vecs.groupBy(_._1)
    val expected = byLabel.toSeq.map { case (lbl, vs) =>
      val nbrs = vs.map { case (_, v1, e1) =>
        v1 -> vs.filter { case (_, v2, e2) =>
          v2 != v1 && cos(e1, e2) >= eps
        }.map(_._2).toSet
      }.toMap
      val cores = nbrs.filter(_._2.size >= minPts).keySet
      // CC over core-core edges via union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for (c <- cores; n <- nbrs(c) if cores(n)) {
        val (ra, rb) = (find(c), find(n))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // cluster id = min member id of the component
      val comp = cores.groupBy(c => find(c))
      val clusterOf = comp.flatMap { case (_, ms) =>
        val cid = ms.min; ms.map(_ -> cid)
      }
      val borders = vs.map(_._2).filterNot(cores)
        .flatMap { v =>
          val coreNbrs = nbrs.getOrElse(v, Set.empty).filter(cores)
          if (coreNbrs.isEmpty) None
          else Some(v -> coreNbrs.map(clusterOf).min)
        }.toMap
      val sizes = (clusterOf.toSeq ++ borders.toSeq).groupBy(_._2)
        .map(_._2.length)
      (lbl, (cores.size.toLong, borders.size.toLong,
        (vs.length - cores.size - borders.size).toLong,
        sizes.size.toLong, sizes.max.toLong))
    }.toMap
    val got = Similarity.dbscan(spark, sf0001).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
  }

  test("events_changepoint maximizes between-segment sum of squares " +
    "over every candidate split") {
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = EventAnalytics.changepoint(spark, sf0001).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val series = daily.filter(_._1 == et).sortBy(_._2.toEpochDay)
      val s = series.map(_._3).sum
      val nd = series.length
      val cands = (1 until nd).map { nl =>
        val sl = series.take(nl).map(_._3).sum
        val gain = sl.toDouble * sl / nl +
          (s - sl).toDouble * (s - sl) / (nd - nl) - s.toDouble * s / nd
        (series(nl - 1)._2, nl, sl, gain)
      }
      val best = cands.maxBy(c => (c._4, -c._1.toEpochDay))
      assert(r.getString(1) === best._1.toString, s"split_day $et")
      assert(r.getLong(2) === nd.toLong && r.getLong(3) === best._2.toLong)
      assert(math.abs(r.getDouble(6) -
        BigDecimal(best._4).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"gain $et")
      // the reported gain must dominate every other candidate's
      assert(cands.forall(_._4 <= best._4 + 1e-9))
    }
    assert(got.nonEmpty)
  }

  test("stream_quantiles trajectory equals scalar quantiles over the " +
    "unrolled prefixes and is monotone within each row") {
    val ev = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
    val t0 = ev.map(_._1.getTime).min
    val cut = t0 + 15L * 24 * 3600 * 1000
    def quants(cs: Seq[Long]): (Long, Double, Double, Double, Double) = {
      val sorted = cs.sorted
      val n = sorted.length.toLong
      def at(rank: Long): Double = sorted((rank - 1).toInt) / 100.0
      (n, at((n + 3) / 4), at((n + 1) / 2), at((3 * n + 3) / 4),
        at((19 * n + 19) / 20))
    }
    val p1 = quants(ev.filter(_._1.getTime < cut).map(_._2).toSeq)
    val p2 = quants(ev.map(_._2).toSeq)
    val got = StreamingAnalytics.streamQuantiles(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    assert(got.length === 2)
    Seq(p1, p2).zip(got).foreach { case (e, r) =>
      assert(r.getLong(1) === e._1)
      assert(r.getDouble(2) === e._2 && r.getDouble(3) === e._3 &&
        r.getDouble(4) === e._4 && r.getDouble(5) === e._5)
      assert(r.getDouble(2) <= r.getDouble(3) &&
        r.getDouble(3) <= r.getDouble(4) &&
        r.getDouble(4) <= r.getDouble(5))
    }
  }

  private def q12(x: Double): BigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  test("docs_loo_influence equals a scalar retrain-by-subtraction " +
    "replay and the full-corpus baseline sits where it should") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def splitOf(docId: Long): String = {
      val h = md.digest(s"doc:$docId".getBytes("UTF-8"))
      val b = h(0) & 0xff
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] = t.split(" ", -1).filter(_.nonEmpty)
    val trainTok = docs.filter(d => splitOf(d._1) == "train")
      .flatMap(d => toks(d._3).map(w => (d._2, w)))
    val heldTok = docs.filter(d => splitOf(d._1) == "test")
      .flatMap(d => toks(d._3))
    val csw = trainTok.groupBy(identity).map { case ((s, w), g) =>
      ((s, w), g.length.toLong)
    }
    val cw = trainTok.groupBy(_._2).map { case (w, g) => (w, g.length.toLong) }
    val nAll = trainTok.length.toLong
    val vAll = cw.size.toLong
    val hm = heldTok.groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val mTot = heldTok.length.toLong
    val sources = trainTok.map(_._1).distinct.sorted
    def nll(c: Long, n: Long, v: Long): BigDecimal =
      q12(-math.log((c + 1).toDouble / (n + v).toDouble))
    val baseSum = hm.map { case (w, m) =>
      nll(cw.getOrElse(w, 0L), nAll, vAll) * m
    }.sum
    val got = Curation.looInfluence(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet === sources.toSet)
    sources.foreach { s =>
      val nS = trainTok.count(_._1 == s).toLong
      val vExcl = cw.count { case (w, c) => csw.getOrElse((s, w), 0L) == c }
      val looSum = hm.map { case (w, m) =>
        nll(cw.getOrElse(w, 0L) - csw.getOrElse((s, w), 0L),
          nAll - nS, vAll - vExcl) * m
      }.sum
      val r = got(s)
      assert(r.getLong(1) === nS, s"n_tokens_removed $s")
      assert(r.getLong(2) === vExcl.toLong, s"v_exclusive $s")
      def r6(x: BigDecimal): Double =
        BigDecimal(x.toDouble / mTot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === r6(looSum), s"mean_nll_loo $s")
      assert(r.getDouble(4) === r6(looSum - baseSum), s"delta_nll $s")
    }
  }

  test("sim_triplet_mining counts are internally consistent and the " +
    "per-label candidate census matches a replay over the expression's " +
    "own buckets") {
    import spark.implicits._
    graft.functions.ExprColumns.register(spark)
    val e = Tables(spark, sf0001, "embeddings")
    val sig = e.select(col("vec_id"), col("label"),
        posexplode(graft.functions.ExprColumns
          .hyperplaneLsh(spark, "embedding")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3)))
    val lbl = sig.map(x => (x._1, x._2)).toMap
    val cand = sig.groupBy(x => (x._3, x._4)).values.toSeq.flatMap { g0 =>
      val g = g0.toSeq
      for (x <- g; y <- g if lbl(x._1) != lbl(y._1))
        yield (x._1, y._1)
    }.toSet
    val expPerLabel = cand.toSeq.map { case (a, _) => lbl(a) }
      .groupBy(identity).map { case (l, g) => (l, g.length.toLong) }
    val got = Similarity.tripletMining(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val l = r.getInt(0)
      assert(r.getLong(2) === expPerLabel.getOrElse(l, 0L),
        s"n_candidates label $l")
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(2),
        "hard + semihard <= candidates")
      if (r.getLong(4) > 0) {
        val gap = r.getDouble(5)
        assert(gap >= 0.0 && gap <= 0.05 + 1e-9,
          s"semi-hard gap within margin band, got $gap")
      }
    }
    // anchors = every vector that has a same-label neighbor
    val perLabelVecs = sig.map(x => (x._2, x._1)).distinct
      .groupBy(_._1).map { case (l, g) => (l, g.length.toLong) }
    got.foreach { r =>
      assert(r.getLong(1) === perLabelVecs(r.getInt(0)), "n_anchors")
    }
  }

  test("stream_decay_topk trajectory equals the scalar decayed replay " +
    "over the unrolled prefixes") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("event_type"), to_date(col("ts")).as("d"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getDate(2).toLocalDate))
    val t0 = ev.map(_._1).min
    val cut = t0 + 15L * 24 * 3600 * 1000
    def decay(k: Int): Double = {
      var g = 1.0; var i = 0
      while (i < k) { g *= 0.9; i += 1 }
      g
    }
    def top5(rows: Seq[(String, java.time.LocalDate)])
        : Seq[(Int, String, Double)] = {
      val hist = rows.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
      val r = rows.map(_._2).maxBy(_.toEpochDay)
      val mass = hist.toSeq.groupBy(_._1._1).map { case (et, entries) =>
        val m = entries.map { case ((_, d), cnt) =>
          q12(cnt * decay((r.toEpochDay - d.toEpochDay).toInt))
        }.sum
        (et, m)
      }.toSeq.sortBy { case (et, m) => (-m, et) }
      mass.take(5).zipWithIndex.map { case ((et, m), i) =>
        (i + 1, et, BigDecimal(m.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val p1 = top5(ev.filter(_._1 < cut).map(e => (e._2, e._3)).toSeq)
    val p2 = top5(ev.map(e => (e._2, e._3)).toSeq)
    val got = StreamingAnalytics.streamDecayTopk(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val exp = p1.map(t => (1, t._1, t._2, t._3)) ++
      p2.map(t => (2, t._1, t._2, t._3))
    assert(got.toSeq === exp)
  }

  test("text_textrank equals a scalar two-iteration PageRank replay " +
    "over the same co-occurrence graph") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val langs = docs.map(_._1).distinct.sorted
    val expected = langs.flatMap { lg =>
      val seqs = docs.filter(_._1 == lg).map(_._2.split(" ", -1).toSeq
        .map(_.toLowerCase).filter(_.matches("^[a-z]+$")))
      val biPairs = seqs.flatMap(ws => ws.zip(ws.drop(1)))
        .filter(p => p._1 != p._2)
      val bic = biPairs.groupBy(identity)
        .map { case (p, g) => (p, g.length.toLong) }
      val edges = (bic.toSeq.map { case ((a, b), c) => ((a, b), c) } ++
        bic.toSeq.map { case ((a, b), c) => ((b, a), c) })
        .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      val outw = edges.toSeq.groupBy(_._1._1)
        .map { case (s, g) => (s, g.map(_._2).sum) }
      val nodes = edges.keys.map(_._1).toSeq.distinct.sorted
      val nl = nodes.length
      def step(pr: Map[String, Double]): Map[String, Double] = {
        val contrib = edges.toSeq.map { case ((s, d2), w) =>
          (d2, q12(pr(s) * (w.toDouble / outw(s))))
        }.groupBy(_._1).map { case (d2, g) => (d2, g.map(_._2).sum) }
        nodes.map { n =>
          (n, 0.15 / nl + 0.85 * contrib.getOrElse(n, BigDecimal(0)).toDouble)
        }.toMap
      }
      val pr2 = step(step(nodes.map(n => (n, 1.0 / nl)).toMap))
      pr2.toSeq.sortBy { case (w, p) => (-p, w) }.take(10).zipWithIndex
        .map { case ((w, p), i) =>
          ((lg, i + 1), (w, BigDecimal(p)
            .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
    }.toMap
    val got = TextAnalysis.textrank(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getString(2), r.getDouble(3)))).toMap
    assert(got === expected)
  }

  test("events_seasonal_strength recomputes from the published " +
    "decomposition and stays in [0, 1]") {
    val dec = graft.operators.EventAnalytics.tsDecompose(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    def q6d(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val got = EventAnalytics.seasonalStrength(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val et = r.getString(0)
      val rows = dec.filter(_._1 == et)
      def variance(xs: Seq[BigDecimal]): Double = {
        val n = xs.length
        (xs.map(x => x * x).sum.toDouble / n) -
          (xs.sum.toDouble / n) * (xs.sum.toDouble / n)
      }
      val vr = variance(rows.map(x => q6d(x._5)).toSeq)
      val vsr = variance(rows.map(x => q6d(x._4 + x._5)).toSeq)
      val vtr = variance(rows.map(x => q6d(x._2 - x._4)).toSeq)
      assert(r.getLong(1) === rows.length.toLong)
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === r6(vr), s"var_resid $et")
      assert(r.getDouble(3) === r6(math.max(0.0, 1.0 - vr / vsr)),
        s"f_seasonal $et")
      assert(r.getDouble(4) === r6(math.max(0.0, 1.0 - vr / vtr)),
        s"f_trend $et")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
    }
  }

  test("sim_facility_select equals a scalar greedy facility-location " +
    "replay and reductions are non-increasing (submodularity)") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).toArray.map(x =>
          BigDecimal(x.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)))
    val expected = vecs.groupBy(_._1).toSeq.flatMap { case (lbl, vs) =>
      def d2(a: Array[Long], b: Array[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      var best = Map.empty[Long, Long]
      var out = Seq.empty[(Int, Long, Long)]
      for (step <- 1 to 4) {
        val scored = vs.map { case (_, c, qc) =>
          val obj = vs.map { case (_, v, qv) =>
            val d = d2(qv, qc)
            if (step == 1) d else math.min(best(v), d)
          }.sum
          (c, obj)
        }
        val (pc, pobj) = scored.minBy { case (c, o) => (o, c) }
        out = out :+ ((step, pc, pobj))
        val qcPick = vs.find(_._2 == pc).get._3
        best = vs.map { case (_, v, qv) =>
          val d = d2(qv, qcPick)
          (v, if (step == 1) d else math.min(best(v), d))
        }.toMap
      }
      out.map { case (s, pc, o) => ((lbl, s), (pc, o)) }
    }.toMap
    val got = Similarity.facilitySelect(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      assert((r.getLong(2), r.getLong(3)) === expected(k), s"step $k")
    }
    // submodularity: marginal reductions non-increasing per label
    got.filter(!_.isNullAt(4))
      .groupBy(_.getInt(0)).values.foreach { rows =>
        val reds = rows.sortBy(_.getInt(1)).map(_.getLong(4))
        assert(reds.zip(reds.drop(1)).forall { case (a, b) => b <= a },
          s"reductions not diminishing: ${reds.toSeq}")
      }
  }

  private def cents(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("dq_reconciliation matches a scalar cents-exact replay of the " +
    "header-vs-detail audit") {
    val details = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")).collect()
      .map(r => (r.getLong(0),
        cents(r.getDouble(1) * (1 - r.getDouble(2)) *
          (1 + r.getDouble(3)) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        cents(r.getDouble(2) * 100)))
    val got = Relational.reconciliation(spark, sf0001).collect()
    got.foreach { r =>
      val st = r.getString(0)
      val os = orders.filter(_._2 == st)
      val withLines = os.flatMap { case (k, _, t) =>
        details.get(k).map(s => (t, (t - s).abs))
      }
      assert(r.getLong(1) === os.length.toLong)
      assert(r.getLong(2) === (os.length - withLines.length).toLong)
      assert(r.getLong(3) ===
        withLines.count { case (t, d) => d * 100 <= t }.toLong)
      assert(r.getLong(4) ===
        withLines.count { case (t, d) => d * 10 <= t }.toLong)
      assert(r.getLong(5) ===
        withLines.count { case (t, d) => d * 2 <= t }.toLong)
      val mean = withLines.map { case (t, d) =>
        BigDecimal(d.toDouble / t.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / withLines.length
      assert(r.getDouble(6) === BigDecimal(mean)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.nonEmpty)
  }

  test("orders_drawdown matches a scalar running-peak replay") {
    val daily = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"), to_date(col("o_orderdate")),
        col("o_totalprice")).collect()
      .map(r => ((r.getString(0), r.getDate(1).toLocalDate),
        cents(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val got = Relational.drawdown(spark, sf0001).collect()
    got.foreach { r =>
      val pr = r.getString(0)
      val series = daily.filter(_._1._1 == pr).toSeq
        .map { case ((_, d), c) => (d, c) }.sortBy(_._1.toEpochDay)
      var peak = Long.MinValue
      val dds = series.map { case (d, c) =>
        peak = math.max(peak, c); (d, c, peak, peak - c)
      }
      val best = dds.maxBy { case (d, _, _, dd) => (dd, -d.toEpochDay) }
      def r2(c: Long): Double = BigDecimal(c.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(1) === series.length.toLong)
      assert(r.getString(2) === best._1.toString)
      assert(r.getDouble(5) === r2(best._4))
      assert(r.getDouble(3) === r2(best._3))
    }
    assert(got.nonEmpty)
  }

  test("stream_cc_incremental trajectory matches per-prefix union-find " +
    "and components only ever merge") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("v1"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def components(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.toSeq.map(v => (v, find(v))).toMap
    }
    val p1 = components(edges.filter(_._1 % 2 == 0).toSeq)
    val p2 = components(edges.toSeq)
    def censusOf(m: Map[Long, Long]): (Long, Long, Long, Long) = {
      val sizes = m.toSeq.groupBy(_._2).map(_._2.length.toLong).toSeq
      (sizes.length.toLong, sizes.sum, sizes.max,
        sizes.count(_ == 2L).toLong)
    }
    val got = StreamingAnalytics.streamCcIncremental(spark, sf0001)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got(0) === censusOf(p1))
    assert(got(1) === censusOf(p2))
    // merge-only: nodes together in prefix 1 stay together in prefix 2
    val byComp = p1.toSeq.groupBy(_._2).values
    byComp.foreach { members =>
      val roots = members.map(m => p2(m._1)).distinct
      assert(roots.length === 1, "a component split across increments")
    }
  }

  test("graph_weak_ties equals a scalar common-neighbor replay over " +
    "the same edges") {
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val expected = edges.groupBy(_._1).map { case (lbl, es) =>
      val adj = es.flatMap(e => Seq((e._2, e._3), (e._3, e._2)))
        .groupBy(_._1).map { case (v, g) => (v, g.map(_._2).toSet) }
      val und = es.flatMap(e => Seq((e._2, e._3), (e._3, e._2)))
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val supports = und.map { case (u, v) =>
        (adj(u) & adj(v)).size.toLong
      }
      val nW = supports.count(_ == 0L).toLong
      (lbl, (und.length.toLong, nW,
        BigDecimal(nW.toDouble / und.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(supports.sum.toDouble / und.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Graph.weakTies(spark, sf0001).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got === expected)
  }

  test("events_ab_sequential recomputes both looks exactly and the " +
    "interim boundary is the stricter one") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2)))
    val t0 = ev.map(_._1).min
    val cut = t0 + 15L * 24 * 3600 * 1000
    def look(rows: Seq[(Long, Long, String)])
        : (Long, Long, Long, Long, Option[Double]) = {
      val views = rows.filter(_._3 == "view")
      val purch = rows.filter(_._3 == "purchase")
        .groupBy(_._2).map { case (u, g) => (u, g.map(_._1)) }
      val users = views.map(_._2).distinct
      val conv = users.filter { u =>
        val vts = views.filter(_._2 == u).map(_._1)
        purch.get(u).exists(pts => vts.exists(v =>
          pts.exists(p => p > v && p <= v + 30 * 60 * 1000)))
      }.toSet
      val (ua, ub) = users.partition(_ % 2 == 0)
      val (na, nb) = (ua.length.toLong, ub.length.toLong)
      val (ca, cb) = (ua.count(conv).toLong, ub.count(conv).toLong)
      val pp = (ca + cb).toDouble / (na + nb)
      val z = if (pp > 0 && pp < 1)
        Some((cb.toDouble / nb - ca.toDouble / na) /
          math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)))
      else None
      (na, ca, nb, cb, z)
    }
    val l1 = look(ev.filter(_._1 < cut).toSeq)
    val l2 = look(ev.toSeq)
    val rows = EventAnalytics.abSequential(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    assert(rows.length === 2)
    Seq((l1, 2.797), (l2, 1.977)).zip(rows).foreach {
      case (((na, ca, nb, cb, z), bound), r) =>
        assert(r.getLong(1) === na && r.getLong(2) === ca)
        assert(r.getLong(3) === nb && r.getLong(4) === cb)
        z.foreach { zz =>
          assert(r.getDouble(5) === BigDecimal(zz)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
          assert(r.getBoolean(7) === (math.abs(zz) > bound))
        }
        assert(r.getDouble(6) === bound)
    }
    // look-2 sample can only grow
    assert(rows(1).getLong(1) >= rows(0).getLong(1))
    assert(rows(0).getDouble(6) > rows(1).getDouble(6))
  }

  test("mm_patch_grid equals a scalar md5-byte replay of the 4x4 grid") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val vals = docs.flatMap { case (id, text) =>
      val mod = Seq("image", "audio", "video")((id % 3).toInt)
      val bytes = md.digest(text.getBytes("UTF-8")).map(_ & 0xff)
      bytes.zipWithIndex.map { case (b, i) => (mod, i / 4, b.toLong) }
    }
    val expected = vals.groupBy(v => (v._1, v._2)).map { case (k, g) =>
      val bs = g.map(_._3)
      (k, (bs.length.toLong, bs.sum,
        BigDecimal(bs.sum.toDouble / (bs.length * 255))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        bs.min, bs.max))
    }
    val got = Multimodal.patchGrid(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got === expected)
  }

  test("events_holt_forecast equals a scalar left-fold replay of the " +
    "identical recursion") {
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = EventAnalytics.holtForecast(spark, sf0001).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val ys = daily.filter(_._1 == et).sortBy(_._2.toEpochDay)
        .map(_._3.toDouble)
      var l = ys.head; var t = 0.0
      ys.drop(1).foreach { y =>
        val l2 = 0.5 * y + 0.5 * (l + t)
        val t2 = 0.3 * ((0.5 * y + 0.5 * (l + t)) - l) + 0.7 * t
        l = l2; t = t2
      }
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(1) === ys.length.toLong)
      assert(r.getDouble(2) === r6(l), s"level $et")
      assert(r.getDouble(3) === r6(t), s"trend $et")
      assert(r.getDouble(4) === r6(l + t))
      assert(r.getDouble(5) === r6(l + 2.0 * t))
      assert(r.getDouble(6) === r6(l + 3.0 * t))
    }
    assert(got.nonEmpty)
  }

  test("sim_metric_agreement equals a scalar Kendall-tau replay over " +
    "the three metrics' rankings") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def micro(a: Array[Float]): Array[Long] = a.map(x =>
      BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    def cosF32(a: Array[Float], b: Array[Float]): Float = {
      var dot = 0f; var na = 0f; var nb = 0f; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na.toDouble).toFloat *
        math.sqrt(nb.toDouble).toFloat)
    }
    val got = Similarity.metricAgreement(spark, sf0001).collect()
    got.foreach { r =>
      val lbl = r.getInt(0)
      val vs = vecs.filter(_._1 == lbl)
      val qid = vs.map(_._2).min
      assert(r.getLong(1) === qid)
      val qv = vs.find(_._2 == qid).get._3
      val qq = micro(qv)
      val cands = vs.filter(_._2 != qid).map { case (_, id, v) =>
        val mv = micro(v)
        val dot = mv.zip(qq).map { case (x, y) => x * y }.sum
        val d2 = mv.zip(qq).map { case (x, y) =>
          (x - y) * (x - y)
        }.sum
        (id, cosF32(v, qv), dot, d2)
      }
      def ranks[T](xs: Seq[(Long, T)])(implicit o: Ordering[T])
          : Map[Long, Int] =
        xs.sortBy { case (id, k) => (k, id) }.zipWithIndex
          .map { case ((id, _), i) => (id, i + 1) }.toMap
      val rc = ranks(cands.map(c => (c._1, -c._2)).toSeq)
      val rd = ranks(cands.map(c => (c._1, -c._3)).toSeq)
      val rl = ranks(cands.map(c => (c._1, c._4)).toSeq)
      val ids = cands.map(_._1).toSeq
      val pairs = for (a <- ids; b <- ids if a < b) yield (a, b)
      val cCd = pairs.count { case (a, b) =>
        (rc(a) - rc(b)).toLong * (rd(a) - rd(b)) > 0 }
      val cCl = pairs.count { case (a, b) =>
        (rc(a) - rc(b)).toLong * (rl(a) - rl(b)) > 0 }
      def tau(c: Int): Double = BigDecimal(
        (2.0 * c - pairs.length) / pairs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) === ids.length.toLong)
      assert(r.getLong(3) === pairs.length.toLong)
      assert(r.getDouble(4) === tau(cCd), s"tau_cos_dot label $lbl")
      assert(r.getDouble(5) === tau(cCl), s"tau_cos_l2 label $lbl")
    }
    assert(got.nonEmpty)
  }

  test("text_prefix_compression equals a scalar sorted-vocabulary LCP " +
    "replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lg, ds) =>
      val vocab = ds.flatMap(_._2.split(" ", -1))
        .map(_.toLowerCase).filter(_.matches("^[a-z]+$"))
        .distinct.sorted
      val lcps = vocab.zipWithIndex.map { case (w, i) =>
        if (i == 0) 0
        else {
          val p = vocab(i - 1)
          val n = math.min(w.length, p.length)
          (1 to n).count(k => w.take(k) == p.take(k))
        }
      }
      val tc = vocab.map(_.length.toLong).sum
      val sv = lcps.map(_.toLong).sum
      (lg, (vocab.length.toLong, tc, sv, tc - sv,
        BigDecimal(sv.toDouble / tc)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = TextAnalysis.prefixCompression(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expected)
  }

  test("dedup_winnowing_pairs equals the scalar winnowing replay's " +
    "df-capped shared-fingerprint pairs") {
    val k = 8; val w = 4
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fps = docs.flatMap { case (id, text) =>
      val n = text.length - (k - 1)
      if (n < w) None else {
        val h = (1 to n).map(i => md5hex(text.substring(i - 1, i - 1 + k)))
        val sel = (1 to n - w + 1).map { j =>
          (j to j + w - 1).map(p => (h(p - 1), p))
            .minBy { case (hh, p) => (hh, -p) }
        }.toSet
        Some((id, sel.map(_._1)))
      }
    }
    val posting = fps.flatMap { case (id, hs) => hs.map(h => (h, id)) }
      .groupBy(_._1)
    val sizes = fps.map { case (id, hs) => (id, hs.size.toLong) }.toMap
    val pairCounts = scala.collection.mutable.Map[(Long, Long), Long]()
    posting.values.foreach { entries =>
      val ds = entries.map(_._2).distinct.sorted
      if (ds.length >= 2 && ds.length <= 64)
        for (i <- ds.indices; j <- i + 1 until ds.length)
          pairCounts((ds(i), ds(j))) =
            pairCounts.getOrElse((ds(i), ds(j)), 0L) + 1L
    }
    val expected = pairCounts.toSeq.filter(_._2 >= 3)
      .map { case ((d1, d2), c) => (d1, d2, c) }
      .sortBy { case (d1, d2, c) => (-c, d1, d2) }.take(10)
    val got = DedupOps.winnowingPairs(spark, sf0001).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (d1, d2, c)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((d1, d2, c)))
      assert(r.getLong(3) === sizes(d1) && r.getLong(4) === sizes(d2))
    }
  }

  test("join_pit_dimension never leaks future state and matches a " +
    "scalar as-of replay on every purchase") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))
    val got = graft.operators.Temporal.pitJoin(spark, sf0001).collect()
    val purchases = ev.filter(_._4 == "purchase")
    assert(got.length === purchases.length)
    val byId = got.map(r => r.getLong(0) -> r).toMap
    purchases.foreach { case (eid, uid, ts, _) =>
      // the user's non-purchase runs: (run first ts, type)
      val stream = ev.filter(e => e._2 == uid && e._4 != "purchase")
        .sortBy(e => (e._3.getTime, e._1))
      val runs = stream.foldLeft(Vector.empty[(java.sql.Timestamp, String)]) {
        case (acc, e) =>
          if (acc.nonEmpty && acc.last._2 == e._4) acc
          else acc :+ (e._3, e._4)
      }
      val valid = runs.filter(!_._1.after(ts))
      val r = byId(eid)
      if (valid.isEmpty) {
        assert(r.getString(3) === "none")
        assert(r.getLong(4) === -1L)
      } else {
        val (vf, tp) = valid.last
        assert(r.getString(3) === tp, s"state for purchase $eid")
        assert(r.getString(5).startsWith(
          new java.text.SimpleDateFormat("yyyy-MM-dd")
            .format(vf)), s"state_since for $eid")
        // no leakage: the chosen state began at or before the purchase
        assert(!vf.after(ts))
      }
    }
  }

  test("stream_holt increments equal the scalar prefix folds and the " +
    "carried state continues the recursion exactly") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).minBy(_.toEpochDay)
    val cut = d0.plusDays(15)
    def fold(rows: Seq[(String, java.time.LocalDate)])
        : Map[String, (Long, Double, Double)] =
      rows.groupBy(_._1).map { case (et, g) =>
        val ys = g.groupBy(_._2).toSeq.sortBy(_._1.toEpochDay)
          .map(_._2.length.toDouble)
        var l = ys.head; var t = 0.0
        ys.drop(1).foreach { y =>
          val l2 = 0.5 * y + 0.5 * (l + t)
          val t2 = 0.3 * ((0.5 * y + 0.5 * (l + t)) - l) + 0.7 * t
          l = l2; t = t2
        }
        (et, (ys.length.toLong, l, t))
      }
    val p1 = fold(ev.filter(_._2.isBefore(cut)).toSeq)
    val p2 = fold(ev.toSeq)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = StreamingAnalytics.streamHolt(spark, sf0001).collect()
    got.foreach { r =>
      val exp = (if (r.getInt(0) == 1) p1 else p2)(r.getString(1))
      assert(r.getLong(2) === exp._1, s"n_days ${r.getString(1)}")
      assert(r.getDouble(3) === r6(exp._2), s"level ${r.getString(1)}")
      assert(r.getDouble(4) === r6(exp._3), s"trend ${r.getString(1)}")
      assert(r.getDouble(5) === r6(exp._2 + exp._3))
    }
    assert(got.length === p1.size + p2.size)
  }

  test("events_forecast_backtest equals a scalar holdout replay of " +
    "both models") {
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = EventAnalytics.forecastBacktest(spark, sf0001).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val series = daily.filter(_._1 == et).sortBy(_._2.toEpochDay)
        .map(_._3.toDouble)
      val train = series.dropRight(5)
      val test = series.takeRight(5)
      var l = train.head; var t = 0.0
      train.drop(1).foreach { y =>
        val l2 = 0.5 * y + 0.5 * (l + t)
        val t2 = 0.3 * ((0.5 * y + 0.5 * (l + t)) - l) + 0.7 * t
        l = l2; t = t2
      }
      def q6(x: Double): BigDecimal = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val eN = test.map(y => q6(math.abs(y - train.last))).sum
      val eH = test.zipWithIndex.map { case (y, i) =>
        q6(math.abs(y - (l + (i + 1).toDouble * t)))
      }.sum
      assert(r.getLong(1) === train.length.toLong)
      assert(r.getLong(2) === 5L)
      assert(r.getDouble(3) === r6(eN.toDouble / 5))
      assert(r.getDouble(4) === r6(eH.toDouble / 5))
      val (nm, hm) = (r.getDouble(3), r.getDouble(4))
      assert(r.getString(5) ===
        (if (hm < nm) "holt" else if (hm > nm) "naive" else "tie"))
    }
    assert(got.nonEmpty)
  }

  test("sketch_countmin never underestimates and matches a scalar " +
    "count-min replay") {
    val users = Tables(spark, sf0001, "events")
      .select(col("user_id")).collect().map(_.getLong(0))
    def bucket(j: Int, u: Long): Int = {
      val h = md5hex(s"$j:$u")
      Integer.parseInt(h.substring(0, 4), 16) % 64
    }
    val table = scala.collection.mutable.Map[(Int, Int), Long]()
    users.foreach { u =>
      (0 to 2).foreach { j =>
        val b = (j, bucket(j, u))
        table(b) = table.getOrElse(b, 0L) + 1L
      }
    }
    val exact = users.groupBy(identity)
      .map { case (u, g) => (u, g.length.toLong) }
    val tracked = exact.toSeq.sortBy { case (u, c) => (-c, u) }.take(10)
    val got = Quality.sketchCountMin(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(tracked).foreach { case (r, (u, c)) =>
      assert(r.getLong(1) === u && r.getLong(2) === c)
      val est = (0 to 2).map(j => table((j, bucket(j, u)))).min
      assert(r.getLong(3) === est, s"est user $u")
      assert(r.getBoolean(5), "count-min must never underestimate")
    }
  }

  test("sim_prf_expansion recall pair matches a scalar Rocchio replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def cosF32(a: Array[Float], b: Array[Float]): Float = {
      var dot = 0f; var na = 0f; var nb = 0f; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na.toDouble).toFloat *
        math.sqrt(nb.toDouble).toFloat)
    }
    def topN(qid: Long, q: Array[Float], n: Int): Seq[(Long, Int)] =
      vecs.filter(_._2 != qid)
        .map { case (lb, id, v) => (id, lb, cosF32(v, q)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(n)
        .map(x => (x._1, x._2)).toSeq
    val got = Similarity.prfExpansion(spark, sf0001).collect()
    got.foreach { r =>
      val lbl = r.getInt(0)
      val qid = vecs.filter(_._1 == lbl).map(_._2).min
      assert(r.getLong(1) === qid)
      val q = vecs.find(_._2 == qid).get._3
      val before = topN(qid, q, 10).count(_._2 == lbl)
      val fb = topN(qid, q, 5).map(_._1)
      val fbVecs = fb.map(id => vecs.find(_._2 == id).get._3)
      val dim = q.length
      val cent = (0 until dim).map { d =>
        val s = fbVecs.map(v => BigDecimal(v(d).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
        (s.toDouble / fbVecs.length).toFloat
      }.toArray
      val after = topN(qid, cent, 10).count(_._2 == lbl)
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) === r6(before / 10.0), s"before label $lbl")
      assert(r.getDouble(3) === r6(after / 10.0), s"after label $lbl")
      assert(r.getLong(4) === (after - before).toLong)
    }
    assert(got.nonEmpty)
  }

  test("dedup_winnowing_eval matches a scalar PR replay against the " +
    "word-5-gram truth and recall is monotone in the threshold") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // truth: df-capped exact word-5-gram jaccard >= 0.5
    val shingles = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val sh = if (w.length >= 5)
        (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
      else Set.empty[String]
      (id, sh)
    }
    val sizes = shingles.map { case (id, s) => (id, s.size) }.toMap
    val post = shingles.flatMap { case (id, s) => s.map(x => (x, id)) }
      .groupBy(_._1).filter { case (_, g) =>
        g.length >= 2 && g.length <= 64 }
    val interC = scala.collection.mutable.Map[(Long, Long), Int]()
    post.values.foreach { g =>
      val ds = g.map(_._2).sorted
      for (i <- ds.indices; j <- i + 1 until ds.length)
        interC((ds(i), ds(j))) = interC.getOrElse((ds(i), ds(j)), 0) + 1
    }
    // .toSeq first: Map.collect returning tuples rebuilds a Map and
    // silently collapses by key (the standing Scala trap)
    val truth = interC.toSeq.collect { case ((a, b), i)
      if i.toDouble / (sizes(a) + sizes(b) - i) >= 0.5 => (a, b)
    }.toSet
    // candidates: winnowing fingerprints, df-capped
    val k = 8; val w = 4
    val fps = docs.flatMap { case (id, text) =>
      val n = text.length - (k - 1)
      if (n < w) None else {
        val h = (1 to n).map(i => md5hex(text.substring(i - 1, i - 1 + k)))
        Some((id, (1 to n - w + 1).map { j =>
          (j to j + w - 1).map(p => (h(p - 1), p))
            .minBy { case (hh, p) => (hh, -p) }
        }.map(_._1).toSet))
      }
    }
    val wpost = fps.flatMap { case (id, hs) => hs.map(x => (x, id)) }
      .groupBy(_._1).filter { case (_, g) =>
        g.length >= 2 && g.length <= 64 }
    val cand = scala.collection.mutable.Map[(Long, Long), Int]()
    wpost.values.foreach { g =>
      val ds = g.map(_._2).sorted
      for (i <- ds.indices; j <- i + 1 until ds.length)
        cand((ds(i), ds(j))) = cand.getOrElse((ds(i), ds(j)), 0) + 1
    }
    val got = DedupOps.winnowingEval(spark, sf0001).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    Seq(3, 5, 10).foreach { t =>
      val pred = cand.filter(_._2 >= t).keySet
      val tp = pred.count(truth)
      val (np, nt, ntp) = got(t)
      assert(np === pred.size.toLong, s"n_pred @$t")
      assert(nt === truth.size.toLong)
      assert(ntp === tp.toLong, s"n_tp @$t")
    }
    // monotone: higher threshold can only lose predictions
    assert(got(3)._1 >= got(5)._1 && got(5)._1 >= got(10)._1)
  }

  test("events_bursts matches a scalar trailing-window replay") {
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val got = EventAnalytics.burstCensus(spark, sf0001).collect()
    got.foreach { r =>
      val et = r.getString(0)
      val series = daily.filter(_._1 == et).sortBy(_._2.toEpochDay)
      val bursts = series.zipWithIndex.map { case ((_, d, n), i) =>
        val wnd = series.slice(math.max(0, i - 7), i)
        val kk = wnd.length.toLong
        val ss = wnd.map(_._3).sum
        (d, n, n * kk > 2 * ss && kk > 0)
      }
      val bdays = bursts.filter(_._3)
      assert(r.getLong(1) === series.length.toLong)
      assert(r.getLong(2) === bdays.length.toLong, s"burst days $et")
      // runs: consecutive calendar days among burst days
      val runs = bdays.map(_._1).foldLeft(Vector.empty[Vector[java.time.LocalDate]]) {
        case (acc, d) =>
          if (acc.nonEmpty && acc.last.last.plusDays(1) == d)
            acc.init :+ (acc.last :+ d)
          else acc :+ Vector(d)
      }
      assert(r.getLong(3) === runs.length.toLong, s"n_bursts $et")
      if (runs.nonEmpty) {
        assert(r.getLong(4) === runs.map(_.length).max.toLong)
        val peak = bdays.maxBy { case (d, n, _) => (n, -d.toEpochDay) }
        assert(r.getString(5) === peak._1.toString)
        assert(r.getLong(6) === peak._2)
      }
    }
    assert(got.nonEmpty)
  }

  test("events_poisson_bootstrap matches a scalar replay and the band " +
    "brackets the point estimate") {
    val ev = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("c")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def uOf(rep: Int, eid: Long): Double =
      java.lang.Long.parseLong(md5hex(s"$rep:$eid").substring(0, 8), 16)
        .toDouble / 4294967296.0
    def wOf(u: Double): Long =
      if (u < 0.36787944117144233) 0L
      else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L
      else if (u < 0.9810118431238462) 3L
      else if (u < 0.9963401531726563) 4L else 5L
    val ms = (0 until 20).map { rep =>
      val (num, den) = ev.foldLeft((0L, 0L)) { case ((n, d), (eid, c)) =>
        val w = wOf(uOf(rep, eid)); (n + w * c, d + w)
      }
      BigDecimal(num.toDouble / den.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val n = ms.length
    val bootMean = ms.sum.toDouble / n
    val varC = (ms.map(m => m * m).sum.toDouble -
      ms.sum.toDouble * ms.sum.toDouble / n) / (n - 1)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = EventAnalytics.poissonBootstrap(spark, sf0001).collect().head
    assert(r.getLong(0) === 20L)
    assert(r.getDouble(2) === r4(bootMean / 100.0))
    assert(r.getDouble(3) === r4(math.sqrt(varC) / 100.0))
    assert(r.getDouble(4) === r4(ms.min.toDouble / 100.0))
    assert(r.getDouble(5) === r4(ms.max.toDouble / 100.0))
    assert(r.getDouble(4) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(5))
  }

  test("stream_ab_monitor equals the scalar prefix replay of the " +
    "additive arm statistics") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2)))
    val t0 = ev.map(_._1).min
    val cut = t0 + 15L * 24 * 3600 * 1000
    def arms(rows: Seq[(Long, Long, String)]): (Long, Long, Long, Long) = {
      val (a, b) = rows.partition(_._2 % 2 == 0)
      (a.length.toLong, a.count(_._3 == "purchase").toLong,
        b.length.toLong, b.count(_._3 == "purchase").toLong)
    }
    val looks = Seq(arms(ev.filter(_._1 < cut).toSeq), arms(ev.toSeq))
    val got = StreamingAnalytics.streamAbMonitor(spark, sf0001).collect()
      .sortBy(_.getInt(0))
    assert(got.length === 2)
    looks.zip(got).foreach { case ((na, ca, nb, cb), r) =>
      assert(r.getLong(1) === na && r.getLong(2) === ca)
      assert(r.getLong(3) === nb && r.getLong(4) === cb)
      val pp = (ca + cb).toDouble / (na + nb)
      val z = (cb.toDouble / nb - ca.toDouble / na) /
        math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      assert(r.getDouble(5) === BigDecimal(z)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getBoolean(7) === (math.abs(z) > r.getDouble(6)))
    }
  }

  test("dq_referential verdicts match scalar key audits of the star " +
    "schema") {
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val custkeys = Tables(spark, sf0001, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val partkeys = Tables(spark, sf0001, "part")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val suppkeys = Tables(spark, sf0001, "supplier")
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val got = Relational.referentialAudit(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got.size === 9)
    val okeySet = orders.map(_._1).toSet
    assert(got("pk_orders") ===
      ((orders.length.toLong,
        orders.groupBy(_._1).values.filter(_.length > 1)
          .map(_.length.toLong).sum, true)))
    assert(got("fk_lineitem_orders")._2 ===
      li.count(l => !okeySet(l._1)).toLong)
    assert(got("fk_lineitem_part")._2 ===
      li.count(l => !partkeys(l._2)).toLong)
    assert(got("fk_lineitem_supplier")._2 ===
      li.count(l => !suppkeys(l._3)).toLong)
    assert(got("fk_orders_customer")._2 ===
      orders.count(o => !custkeys.toSet(o._2)).toLong)
    got.values.foreach { case (_, v, ok) => assert(ok === (v == 0L)) }
  }

  test("sim_residual_quant matches a scalar two-stage replay and the " +
    "second stage never increases distortion") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("vec_id"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val dim = vecs.head._3.length
    // stage 1: label centroid (decimal(18,9)-quantized sums / n)
    val cents = vecs.groupBy(_._1).map { case (lbl, vs) =>
      (lbl, (0 until dim).map { d =>
        vs.map(v => BigDecimal(v._3(d).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
          vs.length
      }.toArray)
    }
    def micro(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val resid = vecs.map { case (lbl, id, v) =>
      (lbl, id, (0 until dim).map(d =>
        micro(v(d).toDouble - cents(lbl)(d))).toArray)
    }
    val codebook = resid.sortBy(_._2).take(8).map(r => (r._2, r._3))
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = resid.groupBy(_._1).map { case (lbl, rs) =>
      val e1s = rs.map(r => r._3.map(x => x * x).sum)
      val e2s = rs.map { r =>
        codebook.map { case (cw, cq) => (d2(r._3, cq), cw) }.min._1
      }
      def r6(x: Double): Double = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lbl, (rs.length.toLong,
        r6((e1s.sum.toDouble / rs.length) / 1e12),
        r6((e2s.sum.toDouble / rs.length) / 1e12)))
    }
    val got = Similarity.residualQuant(spark, sf0001).collect()
    got.foreach { r =>
      val e = expected(r.getInt(0))
      assert(r.getLong(1) === e._1)
      assert(r.getDouble(2) === e._2, s"mse_stage1 label ${r.getInt(0)}")
      assert(r.getDouble(3) === e._3, s"mse_stage2 label ${r.getInt(0)}")
      // reduction column is derived from the two rounded mses
      val expRed = BigDecimal(1.0 - r.getDouble(3) / r.getDouble(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) === expRed)
    }
    assert(got.nonEmpty)
  }

  test("sample_balanced keeps exactly the floor-class count per " +
    "language, selected by hash priority") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val k = docs.groupBy(_._1).map(_._2.length).min
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lg, ds) =>
      ds.map(d => (md5hex(s"balance:${d._2}"), d._2))
        .sortBy(identity).take(k).zipWithIndex
        .map { case ((_, id), i) => ((lg, (i + 1).toLong), id) }
    }.toMap
    val got = Curation.balancedSample(spark, sf0001).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === expected)
    assert(got.keys.groupBy(_._1).forall(_._2.size == k))
  }

  test("dq_psi_drift matches a scalar decile-PSI replay and the total " +
    "is the sum of the contributions") {
    val ev = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val t0 = ev.map(_._1).min
    val cut = t0 + 15L * 24 * 3600 * 1000
    val ref = ev.filter(_._1 < cut).map(_._2).sorted
    val cur = ev.filter(_._1 >= cut).map(_._2)
    val n1 = ref.length
    val bounds = (1 to 9).map { kk =>
      val rank = math.ceil(kk * n1.toLong / 10.0).toLong
      ref((rank - 1).toInt)
    }
    def bucketOf(v: Long): Int = 1 + bounds.count(b => v > b)
    val c1 = ref.map(bucketOf).groupBy(identity)
      .map { case (b, g) => (b, g.length.toLong) }
    val c2 = cur.map(bucketOf).groupBy(identity)
      .map { case (b, g) => (b, g.length.toLong) }
    val got = Relational.psiDrift(spark, sf0001).collect()
    var psiSum = BigDecimal(0)
    got.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(1) === c1.getOrElse(b, 0L), s"n_ref bucket $b")
      assert(r.getLong(2) === c2.getOrElse(b, 0L), s"n_cur bucket $b")
      if (c1.getOrElse(b, 0L) > 0 && c2.getOrElse(b, 0L) > 0) {
        val p1 = c1(b).toDouble / ref.length
        val p2 = c2(b).toDouble / cur.length
        val contrib = BigDecimal((p2 - p1) * math.log(p2 / p1))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        psiSum += contrib
        assert(r.getDouble(5) === BigDecimal(contrib.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else assert(r.isNullAt(5))
    }
    got.foreach { r =>
      assert(r.getDouble(6) === BigDecimal(psiSum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.length === 10)
  }

  test("window_vwap equals a scalar running-ratio replay") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), to_date(col("l_shipdate")),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        cents(r.getDouble(2) * 100), cents(r.getDouble(3) * 100)))
    val got = Relational.vwap(spark, sf0001).collect()
    val byKey = got.map(r => ((r.getString(0), r.getString(1)),
      (r.getDouble(2), r.getDouble(4)))).toMap
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val daily = rows.groupBy(_._2).toSeq
        .map { case (d, g) => (d, g.map(_._3).sum, g.map(_._4).sum) }
        .sortBy(_._1.toEpochDay)
      var (cpv, cqv) = (0L, 0L)
      daily.foreach { case (d, pv, qv) =>
        cpv += pv; cqv += qv
        val (rev, vw) = byKey((flag, d.toString))
        def r2(x: Long): Double = BigDecimal(x.toDouble / 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rev === r2(cpv), s"cum_revenue $flag $d")
        assert(vw === BigDecimal(cpv.toDouble / cqv.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"vwap $flag $d")
      }
    }
    assert(got.length === li.map(l => (l._1, l._2)).distinct.length)
  }
}

