package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, EventAnalytics, Multimodal, Quality,
  Similarity, TextAnalysis}

/** Round-11 operators: driver-side first-principles recomputations for
  * the algorithm-agreement CC gate, the Bloom FPR census, the mergeable
  * quantile-sketch rung, the deterministic reservoir sample, the Markov
  * stationary distribution, and the k-NN neighbor diversification. */
class Round11OpsSpec extends SparkSpec {

  test("dedup_cc_agreement equals a first-principles union-find census " +
    "and reports zero label mismatches") {
    // ground truth: collect the SAME k-NN edge relation and run a plain
    // union-find over it — no Spark machinery shared with either CC
    // implementation under test
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("v1"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = parent.keys.toSeq.groupBy(find).values
      .map(_.length.toLong).toSeq
    val expected = sizes.groupBy(identity).map { case (sz, g) =>
      (sz, g.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = DedupOps.ccAgreement(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.map(g => (g._1, g._2)) === expected, "propagation census")
    assert(got.map(g => (g._1, g._3)) === expected, "star census")
    assert(got.forall(_._4 == 0L), "per-vertex label agreement")
  }

  test("dedup_bloom_fpr counts match the exact split and the observed " +
    "FPR sits far inside both the design and theoretical bounds") {
    val docs = Tables(spark, sf0001, "documents")
      .select(substring(col("text"), 1, 32).as("fp"),
        substring(col("source"), 4, 8).cast("int").as("sn"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val corpus = docs.filter(_._2 < 10).map(_._1).toSet
    val batch = docs.filter(_._2 >= 10).map(_._1).toSet
    val row = DedupOps.bloomFprCensus(spark, sf0001).collect().head
    assert(row.getAs[Long]("n_probes") === batch.size.toLong)
    assert(row.getAs[Long]("n_true_dup") === (batch & corpus).size.toLong)
    // no false negatives: every true dup must be bloom-positive
    assert(row.getAs[Long]("n_bloom_pos") >= row.getAs[Long]("n_true_dup"))
    assert(row.getAs[Boolean]("within_design_fpp"))
    // theoretical fpp for 4M bits / k=29 hashes (Spark's
    // round(m/n·ln2) at the 100k-item estimate) at this insert count:
    // expected false positives over the true-negative population are
    // far below one, so the observed count must be exactly zero
    val theory = math.pow(
      1.0 - math.exp(-29.0 * corpus.size / 4194304.0), 29.0)
    val trueNeg = batch.size - (batch & corpus).size
    assert(theory * trueNeg < 0.001)
    assert(row.getAs[Long]("n_false_pos") === 0L)
  }

  test("sample_reservoir equals a driver-side md5-priority top-k " +
    "per source") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map(r => (md5hex(s"rsv:${r._2}"), r._2, r._3))
        .sortBy(t => (t._1, t._2)).take(20).zipWithIndex
        .map { case ((_, id, nt), i) => (src, i + 1L, id, nt) }
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.reservoirSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("events_markov_stationary equals a driver-side integer " +
    "power-iteration replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).getTime,
        r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.zip(s.drop(1))
    }.toSeq.groupBy(identity).map { case ((a, b), g) =>
      ((a, b), g.length.toLong)
    }
    val rs = trans.groupBy(_._1._1).map { case (a, g) =>
      (a, g.values.sum)
    }
    val total = ev.length.toLong
    var pi: Map[String, Long] = ev.groupBy(_._4).map { case (t, g) =>
      (t, g.length.toLong * 1000000L / total)
    }
    (1 to 4).foreach { _ =>
      pi = trans.toSeq.flatMap { case ((a, b), n) =>
        pi.get(a).map(p => (b, p * n / rs(a)))
      }.groupBy(_._1).map { case (b, g) => (b, g.map(_._2).sum) }
    }
    val got = EventAnalytics.markovStationary(spark, sf0001).collect()
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getAs[Long]("stationary_micro") === pi(t), s"type $t")
      assert(r.getAs[Long]("drift_micro") ===
        math.abs(r.getAs[Long]("empirical_micro") - pi(t)))
    }
    assert(got.map(_.getString(0)).toSet === pi.keySet)
  }

  test("sim_knn_diversify equals a driver-side f32 greedy-pruning " +
    "replay") {
    def cosF32(x: Array[Float], y: Array[Float]): Float = {
      var dot = 0f; var nx = 0f; var ny = 0f; var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)
    }
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    val byLabel = embs.groupBy(_._2)
    val census = byLabel.toSeq.map { case (label, vs) =>
      val vecs = vs.map(v => v._1 -> v._3).toMap
      var before = 0L; var after = 0L
      var keptSimSum = BigDecimal(0)
      vs.foreach { case (v1, _, e1) =>
        val nn = vs.filter(_._1 != v1)
          .map { case (v2, _, e2) => (v2, cosF32(e1, e2)) }
          .sortBy { case (v2, s) => (-s.toDouble, v2) }.take(3)
        before += nn.length
        // greedy relative-neighborhood pruning, best-first: the first
        // neighbor is always kept (forall over empty), later ones only
        // if closer to the vertex than to every kept neighbor
        var kept = List.empty[(Long, Float)]
        nn.foreach { case (v2, s) =>
          if (kept.forall { case (m, _) => s > cosF32(vecs(v2), vecs(m)) })
            kept = kept :+ ((v2, s))
        }
        after += kept.length
        kept.foreach { case (_, s) =>
          keptSimSum += BigDecimal(s.toDouble)
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      (label, vs.length.toLong, before, after, before - after,
        (keptSimSum / after).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    }.sortBy(_._1)
    val got = Similarity.knnDiversify(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)) ===
      census.map(c => (c._1, c._2, c._3, c._4, c._5)))
    got.zip(census).foreach { case (g, c) =>
      assert(math.abs(g._6 - c._6.toDouble) < 1e-3,
        s"label ${g._1} avg kept sim")
    }
  }

  test("stream_reservoir's maintained state equals the one-shot batch " +
    "sample (the fold identity, in-suite)") {
    val batch = TextAnalysis.reservoirSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val streamed = graft.operators.StreamingAnalytics
      .streamReservoir(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("text_lm_interp equals a driver-side interpolated-NLL replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(id: Long): String = {
      val b = Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val trainToks = docs.filter(d => split(d._1) == "train")
      .map(_._2.split(" ", -1))
    val cbi = trainToks.flatMap(w => w.zip(w.drop(1)))
      .groupBy(identity).map { case (p, g) => (p, g.length.toLong) }
    val cu = trainToks.flatten.filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val n = cu.values.sum
    val v = cu.size.toLong
    val testBg = docs.filter(d => split(d._1) == "test")
      .map(_._2.split(" ", -1)).flatMap(w => w.zip(w.drop(1)))
    val expected = Seq(25L, 50L, 75L).map { lam =>
      val terms = testBg.map { case (w1, w2) =>
        val pbi =
          if (cu.getOrElse(w1, 0L) > 0)
            cbi.getOrElse((w1, w2), 0L).toDouble / cu(w1)
          else 0.0
        val puni = (cu.getOrElse(w2, 0L) + 1).toDouble / (n + v)
        val l = lam.toDouble / 100.0
        BigDecimal(-math.log(l * pbi + (1.0 - l) * puni))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      (lam, terms.length.toLong,
        (terms.sum / terms.length).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextAnalysis.lmInterpSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(g => (g._1, g._2)) === expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-6, s"lambda ${g._1} mean NLL")
    }
    // the sweep must be non-degenerate: NLL actually varies with lambda
    assert(got.map(_._3).distinct.length > 1)
  }

  test("docs_gate_kappa equals a driver-side confusion/kappa replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16) < 204
    val stop = graft.functions.TextFunctions.stopwords.toSet
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => isTrain(d._1))
    val cells = docs.map { case (_, src, text) =>
      val w = text.split(" ", -1)
      val nTok = w.length.toLong
      val nStop = w.count(stop.contains).toLong
      val nUniq = w.distinct.length.toLong
      val gq = nTok < 10 || nStop * 2 > nTok || nUniq * 10 < nTok * 3
      val maxBg = if (w.length >= 2)
        w.zip(w.drop(1)).groupBy(identity).values.map(_.length).max.toLong
      else 0L
      // mkString: sliding yields Arrays, which would group by REFERENCE
      val tris = if (w.length >= 3)
        w.sliding(3).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.length.toLong)
      else Seq.empty
      val nTri = tris.sum
      val dupTri = tris.filter(_ > 1).sum
      val gr = maxBg * 10 > nTok || dupTri * 10 > nTri * 3
      (src, gq, gr)
    }.groupBy(_._1).map { case (src, g) =>
      val a = g.count(x => !x._2 && !x._3).toLong
      val b = g.count(x => !x._2 && x._3).toLong
      val c = g.count(x => x._2 && !x._3).toLong
      val d = g.count(x => x._2 && x._3).toLong
      (src, (g.length.toLong, a, b, c, d))
    }
    val got = TextAnalysis.gateKappa(spark, sf0001).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (nD, a, b, c, d) = cells(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === ((nD, a, b, c, d)), s"source $src cells")
      val peNum = BigDecimal(a + b) * BigDecimal(a + c) +
        BigDecimal(c + d) * BigDecimal(b + d)
      val nn = BigDecimal(nD) * BigDecimal(nD)
      if (nn == peNum) assert(r.isNullAt(6), s"source $src degenerate")
      else {
        val kappa = ((BigDecimal(nD) * BigDecimal(a + d) - peNum) /
          (nn - peNum)).toDouble
        assert(math.abs(r.getDouble(6) - kappa) < 1e-5, s"source $src kappa")
      }
    }
  }

  test("docs_ccnet_buckets equals a driver-side score/rank/thirds " +
    "replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean =
      Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16) < 204
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cu = docs.filter(d => isTrain(d._1))
      .flatMap(_._3.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    val n = cu.values.sum
    val v = cu.size.toLong
    val perDoc = docs.flatMap { case (id, lang, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      if (ws.isEmpty) None
      else {
        val nll = ws.map { w =>
          BigDecimal(-math.log(
            (cu.getOrElse(w, 0L) + 1).toDouble / (n + v)))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.sum
        Some((id, lang, ws.length.toLong, nll))
      }
    }
    val ranked = perDoc
      .sortBy(d => (d._4.toDouble / d._3, d._1)).zipWithIndex
      .map { case ((id, lang, nt, nll), i) => (id, lang, nt, nll, i + 1L) }
    val total = ranked.length.toLong
    val expected = ranked.groupBy { case (_, lang, _, _, rk) =>
      val bucket = if (rk * 3 <= total) "a_head"
        else if (rk * 3 <= total * 2) "b_middle" else "c_tail"
      (lang, bucket)
    }.map { case ((lang, bucket), g) =>
      ((lang, bucket), (g.length.toLong, g.map(_._3).sum,
        (g.map(_._4).sum / BigDecimal(g.map(_._3).sum))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = graft.operators.Curation.ccnetBuckets(spark, sf0001)
      .collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val (nD, nT, mNll) = expected(key)
      assert(r.getLong(2) === nD, s"$key n_docs")
      assert(r.getLong(3) === nT, s"$key n_tokens")
      assert(math.abs(r.getDouble(4) - mNll) < 1e-6, s"$key mean_nll")
    }
  }

  test("mm_audio_neardup equals a driver-side energy-band replay and " +
    "flags the planted payload duplicates") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._1 % 3 == 1 && d._2.nonEmpty)
    def sig(text: String): Map[Long, String] = {
      val energies = text.getBytes("UTF-8").grouped(256).map { chunk =>
        chunk.map { b => val x = (b & 0xff) - 128; x.toLong * x }.sum
      }.toSeq
      energies.zipWithIndex.groupBy(_._2 / 4).map { case (band, g) =>
        (band.toLong, g.map(_._1 / 16384).mkString(","))
      }
    }
    val sigs = docs.map { case (id, t) => (id, sig(t)) }
    val expected = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      // band-level df cap: a band signature shared by > 64 docs drops
      shared = s1.keySet.intersect(s2.keySet).count { b =>
        s1(b) == s2(b) &&
          sigs.count(x => x._2.get(b).contains(s1(b))) <= 64
      }.toLong
      if shared * 100 >= math.max(s1.size, s2.size) * 50
    } yield (d1, d2, shared, s1.size.toLong, s2.size.toLong)).sorted
    val got = Multimodal.audioNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "the planted duplicates must surface")
  }

  test("text_rake_keywords equals a driver-side RAKE replay") {
    val stop = graft.functions.TextFunctions.stopwords.toSet + ""
    val docs = Tables(spark, sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val phrases = docs.flatMap { t =>
      val runs = scala.collection.mutable.ListBuffer[List[String]]()
      var cur = List.empty[String]
      t.split(" ", -1).foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else cur = w :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs.toSeq.filter(_.length <= 8).map(_.mkString(" "))
    }
    val wordStats = phrases.flatMap { p =>
      val ws = p.split(" "); ws.map(w => (w, ws.length.toLong))
    }.groupBy(_._1).map { case (w, g) =>
      (w, (g.length.toLong, g.map(_._2).sum))
    }
    val scored = phrases.groupBy(identity).map { case (p, g) =>
      val score = p.split(" ").map { w =>
        val (freq, deg) = wordStats(w)
        BigDecimal(deg.toDouble / freq)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (p, g.length.toLong, p.split(" ").length.toLong, score)
    }.toSeq.sortBy(s => (-s._4, s._1)).take(25).zipWithIndex
      .map { case ((p, occ, nw, sc), i) =>
        (i + 1L, p, nw, occ,
          sc.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = TextAnalysis.rakeKeywords(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got.map(g => (g._1, g._2, g._3, g._4)) ===
      scored.map(s => (s._1, s._2, s._3, s._4)))
    got.zip(scored).foreach { case (g, s) =>
      assert(math.abs(g._5 - s._5) < 1e-4, s"phrase ${g._2} score")
    }
  }

  test("text_contamination_sweep equals a driver-side n-gram overlap " +
    "replay for every n") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(id: Long): String = {
      val b = Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String, n: Int): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < n) Set.empty
      else w.sliding(n).map(_.mkString(" ")).toSet
    }
    val train = docs.filter(d => split(d._1) == "train")
    val test = docs.filter(d => split(d._1) == "test")
    val totTok = train.map(_._2.split(" ", -1).length.toLong).sum
    val expected = Seq(7, 13, 20).map { n =>
      val bench = test.flatMap(d => grams(d._2, n)).toSet
      val contam = train.filter(d => grams(d._2, n).exists(bench))
      (n.toLong, contam.length.toLong,
        contam.map(_._2.split(" ", -1).length.toLong).sum)
    }
    val got = TextAnalysis.contaminationSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) === expected)
    got.foreach { g =>
      assert(math.abs(g._4 - g._3.toDouble / totTok) < 1e-6)
    }
    // monotonicity: a larger n can only catch fewer docs
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("sim_quant_sweep equals a driver-side integer quantization " +
    "replay and error shrinks with bit width") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val lanes = embs.flatMap { case (_, e) =>
      val xq = e.map(x => math.round(x.toDouble * 1e6))
      val ma = xq.map(math.abs).max
      if (ma > 0) xq.map(v => (math.abs(v), ma)) else Array.empty[(Long, Long)]
    }
    val expected = Seq(4L, 6L, 8L).map { bits =>
      val levels = (1L << (bits - 1).toInt) - 1
      val errs = lanes.map { case (axq, ma) =>
        axq - ((axq * levels) / ma) * ma / levels
      }
      (bits, errs.length.toLong, errs.max,
        BigDecimal(errs.sum) / errs.length)
    }
    val got = Similarity.quantSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ===
      expected.map(e => (e._1, e._2, e._3)))
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4.toDouble) < 1e-3, s"bits ${g._1}")
    }
    // more bits, less error
    assert(got.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  test("dedup_soft_weights equals a driver-side capped-jaccard " +
    "union-find weighting replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val sh = docs.map(d => (d._1, shingles(d._3))).toMap
    // df-capped posting expansion: shingles in 2..64 docs
    val posting = docs.flatMap(d => sh(d._1).map(s => (s, d._1)))
      .groupBy(_._1).filter { case (_, g) =>
        g.length >= 2 && g.length <= 64
      }
    val inter = posting.values.flatMap { g =>
      val ds = g.map(_._2).sorted
      for (i <- ds.indices; j <- (i + 1) until ds.length)
        yield ((ds(i), ds(j)), 1L)
    }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
    val edges = inter.collect { case ((d1, d2), i)
      if i.toDouble / (sh(d1).size + sh(d2).size - i) >= 0.5 => (d1, d2)
    }.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val csize = parent.keys.toSeq.groupBy(find).flatMap { case (_, ms) =>
      ms.map(m => (m, ms.length.toLong))
    }
    val expected = docs.groupBy(_._2).map { case (src, g) =>
      val rows = g.map { d =>
        val nTok = d._3.split(" ", -1).length.toLong
        val szw = csize.getOrElse(d._1, 1L)
        (nTok, szw, BigDecimal(nTok.toDouble / szw)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP))
      }
      (src, (g.length.toLong, rows.count(_._2 > 1).toLong,
        rows.map(_._1).sum, rows.map(_._3).sum))
    }
    val got = DedupOps.softDedupWeights(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val src = r.getString(0)
      val (nD, nC, raw, eff) = expected(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((nD, nC, raw)),
        s"source $src counts")
      assert(math.abs(r.getDouble(4) - eff.toDouble) < 1e-3,
        s"source $src effective tokens")
    }
  }

  test("sketch_quantiles exact side equals a sorted-array ceil-rank " +
    "recomputation and every sketch verdict is within bound") {
    val vals = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      Seq(25L, 50L, 75L).map { pct =>
        val k = (pct * n + 99) / 100
        ((g, pct), (n, sorted((k - 1).toInt)))
      }
    }
    val got = Quality.sketchQuantiles(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (n, q) = expected(key)
      assert(r.getAs[Long]("n_rows") === n, s"$key n_rows")
      assert(r.getAs[Long]("exact_quantile_c") === q, s"$key quantile")
      assert(r.getAs[Boolean]("sketch_within_bound"), s"$key sketch bound")
    }
  }

  test("dedup_semdedup equals a driver-side micro-integer cluster-then-" +
    "pair replay and never prunes a cluster's lowest vec_id") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1e6))))
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val seeds = embs.sortBy(_._1).take(8)
    val asg = embs.map { case (v, q) =>
      val best = seeds.map { case (sid, se) => (cos(q, se), sid) }
        .maxBy { case (s, sid) => (s, -sid) }
      (v, q, best._2)
    }
    val byC = asg.groupBy(_._3)
    val expected = byC.map { case (cid, ms) =>
      val flagged = for {
        i <- ms.indices; j <- (i + 1) until ms.length
        a = ms(i); b = ms(j)
        (v1, v2) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
        c = cos(a._2, b._2) if c >= 0.35
      } yield (v1, v2, c)
      (cid, (ms.length.toLong, flagged.length.toLong,
        flagged.map(_._2).distinct.length.toLong,
        if (flagged.isEmpty) 0.0 else flagged.map(_._3).max,
        flagged.map(_._2).toSet))
    }
    val got = Similarity.semDedup(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val cid = r.getLong(0)
      val (n, p, pr, mc, prunedSet) = expected(cid)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((n, p, pr)),
        s"cluster $cid counts")
      assert(math.abs(r.getDouble(4) - mc) < 1e-6, s"cluster $cid max_cos")
      assert(math.abs(r.getDouble(5) - (1.0 - pr.toDouble / n)) < 1e-6)
      // the pruned side of every pair is the GREATER vec_id, so each
      // cluster's lowest member always survives
      assert(!prunedSet.contains(byC(cid).map(_._1).min),
        s"cluster $cid pruned its lowest member")
      assert(r.getLong(3) < r.getLong(1), s"cluster $cid pruned everything")
    }
  }

  test("graph_modularity contributions equal a first-principles Newman Q " +
    "over the collected trade graph and sum to a sane Q") {
    val sym = graft.operators.Graph.symTradeEdges(spark, sf0001)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, BigInt(r.getDecimal(2).toBigInteger)))
    val comm = graft.operators.Graph.labelPropNations(spark, sf0001)
      .select(col("node"), col("community")).collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).toMap
    val tw = sym.map(_._3).sum
    val inW = sym.filter { case (a, b, _) => comm(a) == comm(b) }
      .groupBy { case (a, _, _) => comm(a) }
      .map { case (c, es) => (c, es.map(_._3).sum) }
    val degW = sym.groupBy { case (a, _, _) => comm(a) }
      .map { case (c, es) => (c, es.map(_._3).sum) }
    val nNodes = comm.groupBy(_._2).map { case (c, ms) => (c, ms.size) }
    val got = graft.operators.Graph.modularity(spark, sf0001).collect()
    assert(got.map(_.getAs[Number](0).longValue).toSet === nNodes.keySet)
    var q = 0.0
    got.foreach { r =>
      val c = r.getAs[Number](0).longValue
      assert(r.getLong(1) === nNodes(c).toLong, s"community $c nodes")
      assert(r.getLong(2) === inW.getOrElse(c, BigInt(0)).toLong)
      assert(r.getLong(3) === degW(c).toLong)
      val expect = inW.getOrElse(c, BigInt(0)).toDouble / tw.toDouble -
        math.pow(degW(c).toDouble / tw.toDouble, 2)
      assert(math.abs(r.getDouble(4) - expect) < 1e-6, s"community $c")
      q += r.getDouble(4)
    }
    // Q is bounded in [-0.5, 1] for any partition
    assert(q >= -0.5 && q <= 1.0, s"Q=$q out of range")
  }

  test("events_survival_km equals a first-principles product-limit " +
    "replay and the curve is monotone non-increasing") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2)))
    val wend = new java.sql.Timestamp(
      ev.map(_._1.getTime).min + 7L * 86400 * 1000)
    val in = ev.filter(_._1.before(wend))
    def day(t: java.sql.Timestamp): Long =
      t.toLocalDateTime.toLocalDate.toEpochDay
    val obs = in.groupBy(_._2).toSeq.map { case (_, es) =>
      val f0 = day(es.map(_._1).minBy(_.getTime))
      val ps = es.filter(_._3 == "purchase").map(_._1)
      if (ps.nonEmpty) (day(ps.minBy(_.getTime)) - f0, true)
      else (day(wend) - f0, false)
    }
    val hist = obs.groupBy(_._1).map { case (t, g) =>
      (t, g.size.toLong, g.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Double)]
    var surv = 1.0
    hist.foreach { case (t, nObs, d) =>
      val atRisk = hist.filter(_._1 >= t).map(_._2).sum
      if (d > 0) {
        val factor = 1.0 - d.toDouble / atRisk
        surv *= factor
        expected += ((t, atRisk, d, nObs - d, surv))
      }
    }
    val got = EventAnalytics.survivalKm(spark, sf0001).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (t, n, d, c, s)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        === ((t, n, d, c)))
      assert(math.abs(r.getDouble(5) - s) < 1e-5, s"t=$t survival")
    }
    val curve = got.map(_.getDouble(5))
    assert(curve.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(curve.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("stream_decontaminate increments fold to a driver-side batch " +
    "13-gram overlap replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(id: Long): String = {
      val b = Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 13) Set.empty
      else w.sliding(13).map(_.mkString(" ")).toSet
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bench = docs.filter(d => split(d._1) == "test")
      .flatMap(d => grams(d._3)).toSet
    val train = docs.filter(d => split(d._1) == "train")
    val perInc = train.groupBy(d => if (d._2.drop(3).toInt < 10) 1L else 2L)
      .map { case (inc, g) =>
        val hits = g.filter(d => grams(d._3).exists(bench))
        def tok(s: String) = s.split(" ", -1).length.toLong
        (inc, (g.length.toLong, hits.length.toLong,
          hits.map(d => tok(d._3)).sum,
          g.filterNot(d => grams(d._3).exists(bench)).map(d => tok(d._3)).sum))
      }
    val got = graft.operators.StreamingAnalytics
      .streamDecontaminate(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
    got.filter(_.getLong(0) > 0).foreach { r =>
      val (nD, nC, ct, cl) = perInc(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        === ((nD, nC, ct, cl)), s"increment ${r.getLong(0)}")
    }
    val fold = got.find(_.getLong(0) == 0L).get
    assert(fold.getLong(1) === perInc.values.map(_._1).sum)
    assert(fold.getLong(3) === perInc.values.map(_._3).sum)
  }

  test("text_readability equals a driver-side vowel-group syllable " +
    "replay of the Flesch formulas") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val vg = "[aeiouy]+".r
    val perDoc = docs.map { case (_, src, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val syls = ws.map(w => math.max(1, vg.findAllIn(w).length.toLong))
      val nw = ws.length.toLong
      val ns = syls.sum
      val nc = syls.count(_ >= 3).toLong
      val wps = nw.toDouble / ((nw + 14) / 15)
      val spw = ns.toDouble / nw
      (src, nw, ns, nc, 0.39 * wps + 11.8 * spw - 15.59,
        206.835 - 1.015 * wps - 84.6 * spw)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, g) =>
      (src, (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).sum.toDouble / g.map(_._2).sum,
        g.map(_._5).sum / g.length, g.map(_._6).sum / g.length))
    }
    val got = TextAnalysis.readability(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nD, nW, nS, pc, fk, ease) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((nD, nW, nS)),
        s"source ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - pc) < 1e-6)
      assert(math.abs(r.getDouble(5) - fk) < 1e-3, s"${r.getString(0)} fk")
      assert(math.abs(r.getDouble(6) - ease) < 1e-3)
    }
  }

  test("sim_kcenter_coreset equals a driver-side greedy farthest-point " +
    "replay with exact integer distances") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1e6))))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val first = embs.head
    var mind = embs.map { case (v, q) => (v, q, d2(q, first._2)) }
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, first._1, 0L))
    for (i <- 2 to 8) {
      val p = mind.minBy { case (v, _, m) => (-m, v) }
      picks += ((i.toLong, p._1, p._3))
      mind = mind.map { case (v, q, m) => (v, q, math.min(m, d2(q, p._2))) }
    }
    val cov = mind.minBy { case (v, _, m) => (-m, v) }
    val got = Similarity.kcenterCoreset(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq ===
      ((0L, cov._1, cov._3) +: picks.toSeq).sortBy(_._1))
    // farthest-point picks are non-increasing in distance-to-set, and
    // the final coverage radius never exceeds the last pick's distance
    val seq = picks.drop(1).map(_._3).toSeq
    assert(seq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(cov._3 <= seq.last)
  }

  test("text_kneser_ney equals a driver-side interpolated-KN replay " +
    "and every probability is a valid probability") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def split(id: Long): String = {
      val b = Integer.parseInt(md5hex(s"doc:$id").substring(0, 2), 16)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def bigrams(t: String): Seq[(String, String)] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty else w.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val trainBi = docs.filter(d => split(d._1) == "train").flatMap(d => bigrams(d._2))
    val c12 = trainBi.groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val c1 = c12.groupBy(_._1._1).map { case (w1, g) => (w1, g.values.sum) }
    val n1pf = c12.keys.groupBy(_._1).map { case (w1, g) => (w1, g.size.toLong) }
    val n1pb = c12.keys.groupBy(_._2).map { case (w2, g) => (w2, g.size.toLong) }
    val tt = c12.size.toLong
    val testBi = docs.filter(d => split(d._1) == "test").flatMap(d => bigrams(d._2))
    val scored = testBi.map { case (w1, w2) =>
      val pcont = n1pb.getOrElse(w2, 0L).toDouble / tt
      c1.get(w1) match {
        case Some(cc1) =>
          val cc12 = c12.getOrElse((w1, w2), 0L)
          val p = math.max(cc12.toDouble - 0.75, 0.0) / cc1 +
            ((0.75 * n1pf(w1)) / cc1) * pcont
          (if (cc12 > 0) "known_pair" else "known_context", p)
        case None => ("unknown_context", pcont)
      }
    }
    val expected = scored.groupBy(_._1).map { case (b, g) =>
      (b, (g.length.toLong, g.map(_._2).sum / g.length, g.map(_._2).max))
    }
    val got = TextAnalysis.kneserNey(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, mean, mx) = expected(r.getString(0))
      assert(r.getLong(1) === n, s"bucket ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - mean) < 1e-6)
      assert(math.abs(r.getDouble(3) - mx) < 1e-6)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // a seen pair always gets at least the continuation mass a merely
    // seen context gets on average (the discount redistributes, it
    // never inverts the ordering of the bucket means on this corpus)
    val m = got.map(r => r.getString(0) -> r.getDouble(2)).toMap
    if (m.contains("known_pair") && m.contains("known_context"))
      assert(m("known_pair") > m("known_context"))
  }

  test("events_segment_migration equals a driver-side weekly cross-tab " +
    "and shares sum to one") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val t0 = ev.map(_._1.getTime).min
    val d7 = 7L * 86400 * 1000
    val w1 = ev.filter(_._1.getTime < t0 + d7).groupBy(_._2)
      .map { case (u, g) => (u, g.length.toLong) }
    val w2 = ev.filter(e => e._1.getTime >= t0 + d7 &&
      e._1.getTime < t0 + 2 * d7).groupBy(_._2)
      .map { case (u, g) => (u, g.length.toLong) }
    def seg(n: Option[Long]): String = n match {
      case None => "absent"
      case Some(x) if x >= 18 => "high"
      case Some(x) if x >= 14 => "mid"
      case _ => "low"
    }
    val users = (w1.keySet ++ w2.keySet).toSeq
    val expected = users.map(u => (seg(w1.get(u)), seg(w2.get(u))))
      .groupBy(identity).map { case (k, g) => (k, g.length.toLong) }
    val got = EventAnalytics.segmentMigration(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) === expected(k), s"cell $k")
      assert(math.abs(r.getDouble(3) -
        expected(k).toDouble / users.length) < 1e-6)
    }
    assert(math.abs(got.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("mm_scene_cuts equals a driver-side byte-sum delta replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._1 % 3 == 2 && d._2.nonEmpty)
    val expected = docs.map { case (id, text) =>
      val intens = text.getBytes("UTF-8").grouped(64)
        .map(_.map(b => (b & 0xff).toLong).sum).toArray
      val deltas =
        if (intens.length < 2) Array.empty[Long]
        else intens.sliding(2).map(p => math.abs(p(1) - p(0))).toArray
      val cuts = deltas.count(_ >= 300).toLong
      (id, (intens.length.toLong, cuts,
        if (deltas.isEmpty) 0L else deltas.max))
    }.toMap
    val got = graft.operators.Multimodal.sceneCuts(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nf, nc, mx) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((nf, nc, nc + 1)),
        s"doc ${r.getLong(0)}")
      assert(r.getLong(5) === mx)
      // the operator rounds to 4 decimals, so allow half an ulp of that
      assert(math.abs(r.getDouble(4) - nf.toDouble / (nc + 1)) < 1e-4)
    }
  }

  test("stream_anomaly scores increment 2 against increment-1 state " +
    "only, with a flagless cold start") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)))
    val t0 = ev.map(_._1.getTime).min
    val cut = t0 + 15L * 86400 * 1000
    def day(t: java.sql.Timestamp): java.time.LocalDate =
      t.toLocalDateTime.toLocalDate
    // the cut sits at a sub-day offset, so a calendar day can straddle
    // it; the operator (and oracle) census each increment's OWN partial
    // day — replay with (type, day, side) cells accordingly
    val byCell = ev.groupBy(e => (e._2, day(e._1), e._1.getTime < cut))
      .map { case (k, g) => (k, g.length.toLong) }.toSeq
    val st1 = byCell.filter(_._1._3).groupBy(_._1._1)
      .map { case (ty, g) =>
        val xs = g.map(_._2)
        (ty, (xs.length.toLong, xs.sum, xs.map(x => x * x).sum))
      }
    val expected2 = byCell.filterNot(_._1._3).groupBy(_._1._1)
      .map { case (ty, g) =>
        val flags = st1.get(ty) match {
          case None => 0L
          case Some((n, s, ssq)) =>
            g.count { case (_, x) =>
              val lhs = BigInt(n * x - s).pow(2)
              lhs > 4 * (BigInt(n) * ssq - BigInt(s) * s)
            }.toLong
        }
        (ty, (g.length.toLong, flags))
      }
    val got = graft.operators.StreamingAnalytics
      .streamAnomaly(spark, sf0001).collect()
    got.filter(_.getLong(0) == 1L).foreach { r =>
      assert(r.getLong(3) === 0L, s"cold start flagged ${r.getString(1)}")
    }
    got.filter(_.getLong(0) == 2L).foreach { r =>
      val (nd, fl) = expected2(r.getString(1))
      assert((r.getLong(2), r.getLong(3)) === ((nd, fl)),
        s"type ${r.getString(1)}")
    }
    assert(got.count(_.getLong(0) == 2L) === expected2.size)
  }

  test("text_compression_ratio equals a driver-side distinct-4-gram " +
    "replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (_, src, text) =>
      val w = text.split(" ", -1)
      val total = math.max(w.length - 3, 0).toLong
      val uniq =
        if (total == 0) 0L
        else w.sliding(4).map(_.mkString(" ")).toSet.size.toLong
      (src, total, uniq)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, g) =>
      val scored = g.filter(_._2 > 0)
      (src, (g.length.toLong, g.count(_._2 == 0).toLong,
        g.map(_._2).sum, g.map(_._3).sum,
        scored.map(d => d._3.toDouble / d._2).sum / scored.length,
        scored.count(d => d._3 * 10 < d._2 * 3).toLong))
    }
    val got = TextAnalysis.compressionRatio(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nD, nS, tg, ug, mr, nc) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(6)) === ((nD, nS, tg, ug, nc)), s"source ${r.getString(0)}")
      assert(math.abs(r.getDouble(5) - mr) < 1e-6)
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("sim_recall_curve k=10 row equals sim_recall_eval's totals and " +
    "recall is attainable at every k") {
    val got = Similarity.recallCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 5L, 10L))
    val atTen = Similarity.recallAt10(spark, sf0001).collect()
      .map(_.getLong(1)).sum
    assert(got.find(_._1 == 10L).get._2 === atTen)
    got.foreach { case (k, h, rec) =>
      assert(h <= 5 * k, s"k=$k hits exceed the attainable maximum")
      assert(math.abs(rec - h.toDouble / (5 * k)) < 1e-6)
    }
  }

  test("mix_temperature equals a driver-side tempered-share replay; " +
    "alpha=1 is proportional and lower alpha boosts small languages") {
    val toks = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).map { case (l, g) => (l, g.map(_._2).sum) }
    val nt = toks.values.sum
    val got = TextAnalysis.mixTemperature(spark, sf0001).collect()
      .map(r => ((r.getDouble(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.size === 4 * toks.size)
    Seq(0.3, 0.5, 0.7, 1.0).foreach { a =>
      val z = toks.values.map(n => math.pow(n.toDouble / nt, a)).sum
      toks.foreach { case (l, n) =>
        val share = n.toDouble / nt
        val (gn, gs, gw, gb) = got((a, l))
        assert(gn === n)
        assert(math.abs(gs - share) < 1e-6)
        assert(math.abs(gw - math.pow(share, a) / z) < 1e-6, s"($a,$l)")
        assert(math.abs(gb - math.pow(share, a) / z / share) < 1e-3)
      }
    }
    // alpha=1 reproduces the natural shares; tempering boosts the
    // smallest language strictly more as alpha falls
    toks.keys.foreach { l =>
      assert(math.abs(got((1.0, l))._3 - got((1.0, l))._2) < 2e-6)
    }
    val smallest = toks.minBy(_._2)._1
    val boosts = Seq(0.3, 0.5, 0.7, 1.0).map(a => got((a, smallest))._4)
    assert(boosts.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
  }

  test("docs_uncertainty_sample picks the 20 smallest |m2000| margins " +
    "and is disjoint in rank sense from the top-margin picks") {
    // first-principles margins: hashed-TF x doubled gradient
    def bucket(w: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val b = (h(0) & 0xff)
      b % 64
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val labels = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val tf = docs.map { case (id, t) =>
      (id, t.split(" ", -1).groupBy(bucket)
        .map { case (j, ws) => (j, ws.length.toLong) })
    }.toMap
    val g2 = tf.toSeq.flatMap { case (id, m) =>
      labels.get(id).toSeq.flatMap { l =>
        m.map { case (j, x) => (j, (2L * l - 1) * x) } }
    }.groupBy(_._1).map { case (j, g) => (j, g.map(_._2).sum) }
    val margins = tf.map { case (id, m) =>
      (id, m.map { case (j, x) => g2.getOrElse(j, 0L) * x }.sum)
    }
    val expected = margins.toSeq
      .sortBy { case (id, m2) => (math.abs(m2), id) }.take(20)
    val got = graft.operators.Curation.uncertaintySample(spark, sf0001)
      .collect()
    assert(got.length === 20)
    got.zip(expected).foreach { case (r, (id, m2)) =>
      assert(r.getLong(0) === id)
      assert(r.getLong(3) === math.abs(m2))
      assert(math.abs(r.getDouble(4) - m2 / 2000.0) < 1e-5)
    }
    // the uncertainty picks rank from |margin| ~ 0 while qualityProbe
    // ranks from the top margin — the smallest |m2000| can't exceed
    // the largest margin's magnitude
    val topMargin = margins.values.map(math.abs).max
    assert(got.map(_.getLong(3)).max <= topMargin)
  }

  test("stream_freq_topk maintained Misra-Gries state brackets every " +
    "exact count and the output verdicts are all true") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exact = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
    // driver-side replay of the two-increment merge-compress loop
    val cap = 128
    var state = Map.empty[String, Long]
    var d = 0L
    Seq(docs.filter(_._1.drop(3).toInt < 10),
        docs.filter(_._1.drop(3).toInt >= 10)).foreach { inc =>
      val bc = inc.flatMap(_._2.split(" ", -1))
        .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      val merged = (state.keySet ++ bc.keySet).map(t =>
        (t, state.getOrElse(t, 0L) + bc.getOrElse(t, 0L))).toMap
      val o =
        if (merged.size <= cap) 0L
        else merged.toSeq.sortBy { case (t, c) => (-c, t) }.apply(cap)._2
      state = merged.map { case (t, c) => (t, c - o) }.filter(_._2 > 0)
      d += o
    }
    // MG invariant on the replayed state vs exact counts
    state.foreach { case (t, c) =>
      assert(c <= exact(t) && exact(t) <= c + d, s"token $t")
    }
    exact.filterNot(e => state.contains(e._1)).foreach { case (t, f) =>
      assert(f <= d, s"absent token $t exceeds the decrement bound")
    }
    val got = graft.operators.StreamingAnalytics
      .streamFreqTopk(spark, sf0001).collect()
    val expectedTop = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(10)
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === expectedTop)
    assert(got.forall(_.getBoolean(2)), "a sketch bound failed")
  }

  test("basket_rules equals a driver-side directional-rule replay over " +
    "the supported pairs") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).map { case (o, g) =>
      (o, g.map(_._2).distinct.sorted) }
    val ic = li.groupBy(_._2).map { case (p, g) =>
      (p, g.map(_._1).distinct.length.toLong) }
    val n = li.map(_._1).distinct.length.toLong
    val co = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      .filter(_._2 >= 3)
    val rules = co.toSeq.flatMap { case ((p1, p2), s) =>
      Seq((p1, p2, s, ic(p1), ic(p2)), (p2, p1, s, ic(p2), ic(p1)))
    }.map { case (a, c, s, ca, cc) =>
      (a, c, s, s.toDouble / ca, s.toDouble * n / (ca * cc),
        s.toDouble / n - (ca.toDouble / n) * (cc.toDouble / n))
    }.sortBy { case (a, c, _, conf, _, _) => (-conf, a, c) }.take(20)
    val got = graft.operators.Relational.basketRules(spark, sf0001).collect()
    assert(got.length === rules.length)
    got.zip(rules).foreach { case (r, (a, c, s, conf, lift, lev)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((a, c, s)))
      assert(math.abs(r.getDouble(3) - conf) < 1e-6)
      assert(math.abs(r.getDouble(4) - lift) < 1e-4)
      assert(math.abs(r.getDouble(5) - lev) < 1e-6)
      // a confident rule implies positive association on this corpus
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("events_funnel_sweep is monotone in the window and its 3d row " +
    "equals events_funnel") {
    val got = EventAnalytics.funnelSweep(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq("06h", "1d", "3d"))
    // n_view is window-independent; deeper stages can only grow with
    // the window (a conversion inside a small window is inside every
    // larger one under first-touch semantics)
    assert(got.map(_._2).distinct.length === 1)
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    assert(got.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
    val base = EventAnalytics.funnelSteps(spark, sf0001).collect().head
    val d3 = got.find(_._1 == "3d").get
    assert((d3._2, d3._3, d3._4) ===
      ((base.getLong(0), base.getLong(1), base.getLong(2))))
  }

  test("sim_ivf_balance equals a driver-side centroid-distortion replay " +
    "and the imbalance factor is at least 1") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](1 + 1).toArray.map(_.toDouble)))
    val byLabel = embs.groupBy(_._2)
    val expected = byLabel.map { case (l, g) =>
      val d = g.head._3.length
      val cent = (0 until d).map { j =>
        val s = g.map(v => BigDecimal(v._3(j)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (s.toDouble / g.length)
      }
      val dist = g.map { v =>
        v._3.zip(cent).map { case (x, c) =>
          BigDecimal((x - c) * (x - c)).setScale(12,
            BigDecimal.RoundingMode.HALF_UP) }.sum
      }.sum.toDouble / g.length
      (l, (g.length.toLong, dist))
    }
    val n = embs.length.toLong
    val ss = byLabel.values.map(g => g.length.toLong * g.length).sum
    val imbalance = byLabel.size.toDouble * ss / (n.toDouble * n)
    val got = Similarity.ivfBalance(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nv, dist) = expected(r.getInt(0))
      assert(r.getLong(1) === nv, s"label ${r.getInt(0)}")
      assert(math.abs(r.getDouble(2) - nv.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(3) - dist) < 1e-4, s"label ${r.getInt(0)}")
      assert(math.abs(r.getDouble(4) - imbalance) < 1e-5)
      assert(r.getDouble(4) >= 1.0 - 1e-9)
    }
  }

  test("docs_probe_cv equals a driver-side fold-complement gradient " +
    "replay and both held-out AUCs are valid") {
    def bucket(w: String): Int =
      (java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))(0) & 0xff) % 64
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val labels = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val tf = docs.filter(d => labels.contains(d._1)).map { case (id, t) =>
      (id, labels(id), id % 2,
        t.split(" ", -1).groupBy(bucket).map { case (j, ws) =>
          (j, ws.length.toLong) })
    }
    val g2f = tf.flatMap { case (_, l, f, m) =>
      m.map { case (j, x) => ((f, j), (2L * l - 1) * x) }
    }.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val g2a = g2f.groupBy(_._1._2).map { case (j, g) => (j, g.map(_._2).sum) }
    val margins = tf.map { case (id, l, f, m) =>
      (f, id, l, m.map { case (j, x) =>
        x * (g2a.getOrElse(j, 0L) - g2f.getOrElse((f, j), 0L)) }.sum)
    }
    val expected = margins.groupBy(_._1).map { case (f, g) =>
      val pos = g.filter(_._3 == 1).map(_._4)
      val neg = g.filter(_._3 == 0).map(_._4)
      // doubled rank-sum: 2*[pairs with pos>neg] + [ties]
      val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
      (f, (pos.length.toLong, neg.length.toLong, u2,
        u2.toDouble / (2.0 * pos.length * neg.length)))
    }
    val nAll = tf.length.toLong
    val got = graft.operators.Curation.probeCv(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val f = r.getLong(0)
      val (np, nn, u2, auc) = expected(f)
      val nFold = margins.count(_._1 == f).toLong
      assert(r.getLong(1) === nAll - nFold, s"fold $f train size")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((np, nn, u2)))
      assert(math.abs(r.getDouble(5) - auc) < 1e-6)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
  }

  test("graph_ppr equals a driver-side two-step push replay, " +
    "concentrates on the seed, and sums to at most one") {
    val sym = graft.operators.Graph.symTradeEdges(spark, sf0001)
    // directed edges with out-weight normalization, replayed from the
    // same trade relation the operator uses
    val edges = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sf0001, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("decimal(38,0)"))
        .as("w"))
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, BigInt(r.getDecimal(2).toBigInteger)))
    val outw = edges.groupBy(_._1).map { case (s, g) => (s, g.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    def step(pr: Map[Long, Double]): Map[Long, Double] = {
      val contrib = edges.groupBy(_._2).map { case (d, g) =>
        (d, g.map { case (s, _, w) =>
          BigDecimal(pr.getOrElse(s, 0.0) *
            (w.toDouble / outw(s).toDouble)).setScale(12,
            BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble)
      }
      nodes.map(n => (n, (if (n == 0L) 0.15 else 0.0) +
        0.85 * contrib.getOrElse(n, 0.0))).toMap
    }
    val pr0 = nodes.map(n => (n, if (n == 0L) 1.0 else 0.0)).toMap
    val expected = step(step(pr0))
    val got = graft.operators.Graph.pprFromSeed(spark, sf0001).collect()
    assert(got.length === nodes.length)
    got.foreach { r =>
      val n = r.getAs[Number](0).longValue
      assert(math.abs(r.getDouble(2) - expected(n)) < 1e-6, s"node $n")
    }
    // mass radiates from the seed: seed holds the max score, and total
    // mass <= 1 (dangling mass is dropped, never redistributed)
    val bySc = got.map(r => (r.getAs[Number](0).longValue, r.getDouble(2)))
    assert(bySc.maxBy(_._2)._1 === 0L)
    assert(bySc.map(_._2).sum <= 1.0 + 1e-9)
    assert(sym.count() > 0)
  }

  test("stream_mix_rebalance increment 2 equals the batch mix_weights " +
    "solve and weights sum to one per increment") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    def solve(g: Seq[(String, Long)]): Map[String, (Long, Double, Long)] = {
      val perLang = g.groupBy(_._1).map { case (l, xs) =>
        (l, xs.map(_._2).sum) }
      val s = perLang.map { case (l, n) =>
        val s0 = math.sqrt(n.toDouble).floor.toLong
        (l, n, if (s0 * s0 > n) s0 - 1 else s0)
      }
      val z = s.map(_._3).sum
      s.map { case (l, n, sv) =>
        (l, (n, sv.toDouble / z,
          math.round(sv.toDouble * 50000 / z)))
      }.toMap
    }
    val inc1 = solve(docs.filter(_._2.drop(3).toInt < 10)
      .map(d => (d._1, d._3)))
    val inc2 = solve(docs.map(d => (d._1, d._3)))
    val got = graft.operators.StreamingAnalytics
      .streamMixRebalance(spark, sf0001).collect()
    Seq((1L, inc1), (2L, inc2)).foreach { case (inc, exp) =>
      val rows = got.filter(_.getLong(0) == inc)
      assert(rows.length === exp.size, s"increment $inc")
      rows.foreach { r =>
        val (n, w, t) = exp(r.getString(1))
        assert(r.getLong(2) === n, s"inc $inc lang ${r.getString(1)}")
        assert(math.abs(r.getDouble(3) - w) < 1e-6)
        assert(math.abs(r.getLong(4) - t) <= 1)
      }
      assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
  }

  test("docs_gate_ablation flag algebra is consistent and the all row " +
    "equals the summed prep pipeline census") {
    val got = graft.operators.DedupOps.gateAblation(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set("0_none", "1_quality", "2_exact",
      "3_neardup", "4_all"))
    val (nAll, tAll) = got("0_none")
    // every single gate keeps a subset of the corpus, and the
    // conjunction keeps a subset of every single gate
    Seq("1_quality", "2_exact", "3_neardup").foreach { g =>
      assert(got(g)._1 <= nAll && got(g)._2 <= tAll, g)
      assert(got("4_all")._1 <= got(g)._1, s"all vs $g")
    }
    val prep = graft.operators.DedupOps.prepPipeline(spark, sf0001)
      .collect()
    assert(got("4_all")._1 === prep.map(_.getLong(1)).sum)
    assert(got("4_all")._2 === prep.map(_.getLong(2)).sum)
    // exact dedup must keep at least one doc per distinct text
    val nDistinct = Tables(spark, sf0001, "documents")
      .select(md5(col("text"))).distinct().count()
    assert(got("2_exact")._1 === nDistinct)
  }

  test("events_markov_eval equals a driver-side argmax-baseline replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val t0 = ev.map(_._1.getTime).min
    val cut = t0 + 15L * 86400 * 1000
    def pairs(es: Seq[(java.sql.Timestamp, Long, Long, String)]) =
      es.groupBy(_._3).toSeq.flatMap { case (_, g) =>
        val ordered = g.sortBy(e => (e._1.getTime, e._2))
        ordered.zip(ordered.drop(1)).map(p => (p._1._4, p._2._4))
      }
    val trainP = pairs(ev.filter(_._1.getTime < cut))
    val testP = pairs(ev.filter(_._1.getTime >= cut))
    val model = trainP.groupBy(_._1).map { case (f, g) =>
      (f, g.groupBy(_._2).toSeq
        .map { case (t, h) => (t, h.length) }
        .minBy { case (t, n) => (-n, t) }._1)
    }
    val expected = testP.groupBy(_._1).map { case (f, g) =>
      val pred = model.get(f)
      (f, (pred, g.length.toLong,
        g.count(p => pred.contains(p._2)).toLong))
    }
    val got = EventAnalytics.markovEval(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (pred, n, c) = expected(r.getString(0))
      assert(Option(r.getString(1)) === pred, s"from ${r.getString(0)}")
      assert((r.getLong(2), r.getLong(3)) === ((n, c)))
      assert(math.abs(r.getDouble(4) - c.toDouble / n) < 1e-6)
    }
  }

  test("mm_pack_budget equals a driver-side per-modality cost cumsum " +
    "replay and window mass conserves the corpus cost") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val costs = docs.map { case (id, t) =>
      val mod = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val perFrame = mod match {
        case "image" => 49L; case "audio" => 25L; case _ => 16L }
      val frames = (t.getBytes("UTF-8").length + 63) / 64
      (mod, id, t.split(" ", -1).length.toLong + perFrame * frames)
    }
    val wins = costs.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(_._2)
      var cum = 0L
      ordered.map { case (m, id, c) =>
        val start = cum; cum += c; (m, start / 1024, c)
      }
    }
    val expected = wins.groupBy(w => (w._1, w._2)).toSeq
      .map { case (_, g) => (g.length.toLong, g.map(_._3).sum) }
      .groupBy(_._1).map { case (d, g) =>
        (d, (g.length.toLong, g.map(_._2).sum)) }
    val got = graft.operators.Multimodal.packBudget(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nw, st) = expected(r.getLong(0))
      assert((r.getLong(1), r.getLong(2)) === ((nw, st)),
        s"docs_in_win ${r.getLong(0)}")
    }
    assert(got.map(_.getLong(2)).sum === costs.map(_._3).sum)
  }

  test("text_span_corruption equals a driver-side deterministic-coin " +
    "replay and realized mask share sits near the design rate") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, src, t) =>
      val n = t.split(" ", -1).length
      val starts = (1 to n).map(p =>
        Integer.parseInt(md5hex(s"span:$id:$p").substring(0, 2), 16) < 38)
      val masked = (1 to n).map(p =>
        ((math.max(1, p - 2)) to p).exists(q => starts(q - 1)))
      val spans = masked.zipWithIndex.count { case (m, i) =>
        m && (i == 0 || !masked(i - 1)) }
      (src, n.toLong, masked.count(identity).toLong, spans.toLong)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, g) =>
      (src, (g.length.toLong, g.map(_._2).sum, g.map(_._3).sum,
        g.map(_._4).sum))
    }
    val got = TextAnalysis.spanCorruption(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nD, nT, nM, nS) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
        === ((nD, nT, nM, nS)), s"source ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - nM.toDouble / nT) < 1e-6)
      // ~15% start rate with 3-token spans => roughly 30-45% masked
      assert(r.getDouble(4) > 0.15 && r.getDouble(4) < 0.60)
      assert(r.getDouble(6) >= 3.0, "a maximal span is at least 3 long")
    }
  }

  test("events_ab_srm equals a driver-side chi-square replay and the " +
    "parity split on this corpus is not degenerate") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def cell(users: Seq[Long]): (Long, Long) =
      (users.count(_ % 2 == 0).toLong, users.count(_ % 2 == 1).toLong)
    val byType = ev.distinct.groupBy(_._1)
      .map { case (t, g) => (t, cell(g.map(_._2))) }
    val overall = ("0_all", cell(ev.map(_._2).distinct))
    val expected = byType + overall
    val got = EventAnalytics.abSrm(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (na, nb) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) === ((na, nb)),
        s"type ${r.getString(0)}")
      val chi2 = (na - nb).toDouble * (na - nb) / (na + nb)
      assert(math.abs(r.getDouble(3) - chi2) < 1e-6)
      assert(r.getBoolean(4) === (chi2 > 3.841459))
      assert(na > 0 && nb > 0, "a degenerate arm")
    }
  }

  test("stream_kmeans increment 2 scores against centroids derived " +
    "from increment 1 only (driver-side replay)") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val e1 = embs.filter(_._1 % 2 == 0).sortBy(_._1)
    val e2 = embs.filter(_._1 % 2 == 1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum))
    }
    val seeds = e1.take(8).map { case (id, e) => (id, e) }
    def assign(vs: Seq[(Long, Array[Float])],
               cents: Seq[(Long, Array[Float])]) =
      vs.map { case (id, e) =>
        val best = cents.map { case (c, ce) => (cos(e, ce), c) }
          .maxBy { case (s, c) => (s, -c) }
        (id, e, best._2, best._1)
      }
    val a1 = assign(e1, seeds)
    val cent1 = a1.groupBy(_._3).toSeq.map { case (c, g) =>
      val d = g.head._2.length
      (c, (0 until d).map { j =>
        val s = g.map(v => BigDecimal(v._2(j).toDouble).setScale(9,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (s.toDouble / g.length).toFloat
      }.toArray)
    }
    val a2 = assign(e2, cent1)
    val got = graft.operators.StreamingAnalytics.streamKmeans(spark, sf0001)
      .collect()
    Seq((1L, a1), (2L, a2)).foreach { case (inc, a) =>
      val exp = a.groupBy(_._3).map { case (c, g) =>
        (c, (g.size.toLong, g.map(_._4).sum / g.size)) }
      val rows = got.filter(_.getLong(0) == inc)
      assert(rows.length === exp.size, s"increment $inc cells")
      rows.foreach { r =>
        val (n, avg) = exp(r.getLong(1))
        assert(r.getLong(2) === n, s"inc $inc cell ${r.getLong(1)}")
        assert(math.abs(r.getDouble(3) - avg) < 1e-4)
      }
    }
  }

  test("sim_seed_sweep equals a driver-side two-seeding assignment " +
    "replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val first8 = embs.sortBy(_._1).take(8)
    val hash8 = embs.sortBy(e => (md5hex(s"seed:${e._1}"), e._1)).take(8)
    def census(seeds: Seq[(Long, Array[Float])]) = {
      val sims = embs.map { case (_, e) =>
        seeds.map { case (c, ce) => (cos(e, ce), c) }
          .maxBy { case (s, c) => (s, -c) }._1
      }
      (embs.length.toLong, sims.sum / sims.length, sims.min)
    }
    val expected = Map("0_first8" -> census(first8),
      "1_hash8" -> census(hash8))
    val got = Similarity.seedSweep(spark, sf0001).collect()
    assert(got.length === 2)
    got.foreach { r =>
      val (n, avg, mn) = expected(r.getString(0))
      assert(r.getLong(1) === n)
      assert(math.abs(r.getDouble(2) - avg) < 1e-4, r.getString(0))
      assert(math.abs(r.getDouble(3) - mn) < 1e-4)
    }
  }

  test("text_heaps_law equals a driver-side first-occurrence replay " +
    "and the fitted exponent is sublinear") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val dmin = docs.map(_._1).min
    val dmax = docs.map(_._1).max
    val firstDoc = docs.flatMap { case (id, ws) =>
      ws.distinct.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, g) => (w, g.map(_._2).min) }
    val pts = (1L to 10L).map { k =>
      val cut = dmin + (dmax - dmin) * k / 10
      val nTok = docs.filter(_._1 <= cut).map(_._2.length.toLong).sum
      val vocab = firstDoc.count(_._2 <= cut).toLong
      (k, cut, nTok, vocab)
    }
    val xs = pts.map(p => math.log(p._3.toDouble))
    val ys = pts.map(p => math.log(p._4.toDouble))
    val n = pts.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val got = TextAnalysis.heapsLaw(spark, sf0001).collect()
    assert(got.length === 10)
    got.zip(pts).foreach { case (r, (k, cut, nT, v)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        === ((k, cut, nT, v)))
      assert(math.abs(r.getDouble(4) - beta) < 1e-3)
    }
    // Heaps' law: vocabulary grows sublinearly in corpus size (the
    // synthetic corpus shares one tiny vocabulary, so it saturates in
    // the first decile and beta legitimately rounds to 0 here)
    assert(got.head.getDouble(4) >= 0.0 && got.head.getDouble(4) < 1.0)
    // vocabulary is monotone non-decreasing across checkpoints
    assert(got.map(_.getLong(3)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("dedup_perm_sweep recall is monotone in permutations and its " +
    "9-perm candidates match the production banding") {
    val got = graft.operators.DedupOps.permSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq === Seq(9L, 18L))
    val p9 = got.find(_._1 == 9L).get
    val p18 = got.find(_._1 == 18L).get
    // more bands can only ADD candidate pairs, hence hits and recall
    assert(p18._3 >= p9._3, "candidates shrank with more permutations")
    assert(p18._5 >= p9._5 && p18._6 >= p9._6 - 1e-9)
    assert(p9._4 === p18._4, "truth side must not depend on the config")
    got.foreach { g =>
      assert(g._2 === g._1 / 3)
      assert(g._6 >= 0.0 && g._6 <= 1.0)
    }
    // the 9-perm prefix of the 18-perm signature IS the production
    // 9-perm signature, so recall must match the banding sweep's r=3 row
    val banding = graft.operators.DedupOps.lshBandingSweep(spark, sf0001)
      .collect().find(_.getLong(1) == 3L).get
    assert(p9._3 === banding.getLong(2), "candidate count vs banding r=3")
    assert(p9._5 === banding.getLong(4))
  }

  test("sim_dim_sweep truth case is perfect recall and truncation can " +
    "only lose recall") {
    val got = Similarity.dimSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(16L, 32L, 64L))
    val d64 = got.find(_._1 == 64L).get
    assert(d64._2 === 50L && math.abs(d64._3 - 1.0) < 1e-9,
      "the full-dimension case must recall itself exactly")
    got.foreach { case (d, h, rec) =>
      assert(h <= 50, s"dim $d")
      assert(math.abs(rec - h.toDouble / 50) < 1e-6)
    }
    // driver-side replay of the d=16 case against the full-dim truth
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      val ad = a.take(d).map(_.toDouble); val bd = b.take(d).map(_.toDouble)
      ad.zip(bd).map { case (x, y) => x * y }.sum /
        (math.sqrt(ad.map(x => x * x).sum) *
          math.sqrt(bd.map(x => x * x).sum))
    }
    def topk(qid: Long, d: Int): Set[Long] = {
      val q = embs.find(_._1 == qid).get._2
      embs.filter(_._1 != qid)
        .map { case (v, e) => (v, cos(e, q, d)) }
        .sortBy { case (v, s) => (-s, v) }.take(10).map(_._1).toSet
    }
    val hits16 = (0L until 5L).map { qid =>
      (topk(qid, 16) intersect topk(qid, 64)).size
    }.sum
    assert(got.find(_._1 == 16L).get._2 === hits16.toLong)
  }

  test("events_retention_fit equals a driver-side pooled-curve OLS " +
    "replay and the fitted curve decays") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val first = ev.groupBy(_._1).map { case (u, g) => (u, g.map(_._2).minBy(_.toEpochDay)) }
    val offs = ev.distinct.map { case (u, d) =>
      d.toEpochDay - first(u).toEpochDay }
      .filter(t => t >= 0 && t <= 7)
    val n0 = offs.count(_ == 0).toLong
    val curve = (1L to 7L).flatMap { t =>
      val n = offs.count(_ == t).toLong
      if (n > 0) Some((t, n, n.toDouble / n0)) else None
    }
    val xs = curve.map(_._1.toDouble); val ys = curve.map(c => math.log(c._3))
    val n = curve.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val b = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val got = EventAnalytics.retentionFit(spark, sf0001).collect()
    assert(got.length === curve.length)
    got.zip(curve).foreach { case (r, (t, na, rr)) =>
      assert((r.getLong(0), r.getLong(1)) === ((t, na)))
      assert(math.abs(r.getDouble(2) - rr) < 1e-6)
      assert(math.abs(r.getDouble(4) - b) < 1e-4)
      assert(math.abs(r.getDouble(5) - (-math.log(2.0) / b)) < 1e-2)
    }
    // the synthetic corpus keeps every user active all month, so the
    // pooled curve is flat (slope ~0, may even tilt positive) — assert
    // only shape consistency: fitted values are monotone in the slope's
    // direction and the half-life carries the slope's sign
    val slope = got.head.getDouble(4)
    val fitted = got.map(_.getDouble(3))
    if (slope <= 0)
      assert(fitted.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    else
      assert(fitted.sliding(2).forall(p => p(0) <= p(1) + 1e-9))
    assert((got.head.getDouble(5) > 0) === (slope < 0))
  }

  test("events_dispersion equals a driver-side sufficient-statistics " +
    "replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.toLocalDate))
    val expected = ev.groupBy(identity).toSeq
      .map { case ((ty, _), g) => (ty, g.length.toLong) }
      .groupBy(_._1).map { case (ty, g) =>
        val xs = g.map(_._2)
        val nd = xs.length.toLong
        val mean = xs.sum.toDouble / nd
        val variance = (nd * xs.map(x => x * x).sum - xs.sum * xs.sum)
          .toDouble / (nd * (nd - 1))
        (ty, (nd, xs.sum, mean, variance))
      }
    val got = EventAnalytics.dispersion(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nd, s, mean, variance) = expected(r.getString(0))
      assert((r.getLong(1), r.getLong(2)) === ((nd, s)))
      assert(math.abs(r.getDouble(3) - mean) < 1e-4)
      assert(math.abs(r.getDouble(4) - variance) < 1e-4)
      assert(math.abs(r.getDouble(5) - variance / mean) < 1e-3)
      assert(r.getBoolean(6) === (variance / mean > 1.5))
    }
  }

  test("docs_rank_fusion equals a driver-side RRF replay over exact " +
    "descending ranks") {
    def bucket(w: String): Int =
      (java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))(0) & 0xff) % 64
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val labels = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val tf = docs.map { case (id, t) =>
      (id, t.split(" ", -1).groupBy(bucket)
        .map { case (j, ws) => (j, ws.length.toLong) }) }.toMap
    val g2 = tf.toSeq.flatMap { case (id, m) =>
      labels.get(id).toSeq.flatMap(l =>
        m.map { case (j, x) => (j, (2L * l - 1) * x) })
    }.groupBy(_._1).map { case (j, g) => (j, g.map(_._2).sum) }
    val m2000 = docs.map { case (id, _) =>
      (id, tf(id).map { case (j, x) => g2.getOrElse(j, 0L) * x }.sum) }
    val ratio = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      (id, w.distinct.length.toDouble / w.length) }
    def ranks[T](xs: Seq[(Long, T)])(implicit o: Ordering[T])
        : Map[Long, Long] =
      xs.sortBy { case (id, v) => (v, id) }(Ordering.Tuple2(o.reverse,
        implicitly[Ordering[Long]]))
        .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }.toMap
    val r1 = ranks(m2000)
    val r2 = ranks(ratio)
    val expected = docs.map(_._1).map { id =>
      (id, r1(id), r2(id),
        1.0 / (60 + r1(id)) + 1.0 / (60 + r2(id)))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = graft.operators.Curation.rankFusion(spark, sf0001).collect()
    assert(got.length === 20)
    got.zip(expected).foreach { case (r, (id, a, b, s)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((id, a, b)))
      assert(math.abs(r.getDouble(3) - s) < 1e-6)
    }
  }

  test("text_entropy_rate equals a driver-side MLE entropy replay and " +
    "conditioning never increases entropy") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val expected = docs.groupBy(_._1).map { case (lang, g) =>
      val uni = g.flatMap(_._2)
      val nt = uni.length.toLong
      def h[K](xs: Seq[K]): Double = {
        val n = xs.length.toDouble
        xs.groupBy(identity).values
          .map { grp => val p = grp.size / n; -p * math.log(p) }.sum
      }
      val bi = g.flatMap(d =>
        if (d._2.length < 2) Seq.empty
        else d._2.sliding(2).map(p => (p(0), p(1))).toSeq)
      (lang, (nt, h(uni), h(bi) - h(uni)))
    }
    val got = TextAnalysis.entropyRate(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nt, h1, rate) = expected(r.getString(0))
      assert(r.getLong(1) === nt)
      assert(math.abs(r.getDouble(2) - h1) < 1e-4, s"${r.getString(0)} h1")
      assert(math.abs(r.getDouble(3) - rate) < 1e-4)
      assert(math.abs(r.getDouble(4) - math.exp(rate)) < 1e-2)
      // H(W2|W1) <= H(W1): conditioning cannot increase entropy (MLE
      // estimates share the property on the same sample)
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-9)
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("events_attribution_markov equals a driver-side truncated-chain " +
    "replay and every removal effect is a valid share") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val journeys = ev.groupBy(_._1).values.map { g =>
      val ordered = g.toSeq.sortBy(e => (e._2.getTime, e._3))
      val cut = ordered.indexWhere(_._4 == "purchase")
      val states = (if (cut >= 0) ordered.take(cut + 1) else ordered)
        .map(e => if (e._4 == "purchase") "conv" else e._4)
      states
    }.toSeq
    val trans = journeys.flatMap { s =>
      Seq(("start", s.head)) ++
        s.zip(s.drop(1)).filter(_._1 != "conv") ++
        (if (s.last != "conv") Seq((s.last, "end")) else Seq.empty)
    }.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    def pConv(removed: Option[String]): Double = {
      val ct = trans.toSeq
        .filter { case ((f, _), _) => !removed.contains(f) }
        .map { case ((f, t), n) =>
          ((f, if (removed.contains(t)) "end" else t), n) }
        .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      val outT = ct.groupBy(_._1._1).map { case (f, g) =>
        (f, g.values.sum) }
      val p = ct.map { case ((f, t), n) =>
        ((f, t), n.toDouble / outT(f)) } ++
        Map(("conv", "conv") -> 1.0, ("end", "end") -> 1.0)
      var v = Map("start" -> 1.0)
      for (_ <- 1 to 8)
        v = p.toSeq.flatMap { case ((f, t), pp) =>
          v.get(f).map(m => (t, m * pp)) }
          .groupBy(_._1).map { case (t, g) => (t, g.map(_._2).sum) }
      v.getOrElse("conv", 0.0)
    }
    val pFull = pConv(None)
    val got = EventAnalytics.attributionMarkov(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSeq ===
      Seq("click", "error", "signup", "view"))
    got.foreach { r =>
      val pr = pConv(Some(r.getString(0)))
      assert(math.abs(r.getDouble(1) - pFull) < 1e-5)
      assert(math.abs(r.getDouble(2) - pr) < 1e-5, r.getString(0))
      assert(math.abs(r.getDouble(3) - (pFull - pr) / pFull) < 1e-4)
      // removing a channel can only LOWER the conversion probability
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) <= 1.0)
    }
  }

  test("sketch_hll_intersect exact sides equal a driver-side set replay " +
    "and the inclusion-exclusion estimate is within its bound") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val a = ev.filter(_._1 == "view").map(_._2).toSet
    val b = ev.filter(_._1 == "purchase").map(_._2).toSet
    val got = graft.operators.Quality.hllIntersect(spark, sf0001)
      .collect().head
    assert((got.getLong(0), got.getLong(1)) ===
      ((a.size.toLong, b.size.toLong)))
    assert(got.getLong(2) === (a ++ b).size.toLong)
    assert(got.getLong(3) === (a intersect b).size.toLong)
    assert(got.getBoolean(4), "intersection estimate out of bound")
    assert(got.getBoolean(5), "union estimate out of bound")
  }

  test("sim_binary_recall equals a driver-side sign-bit Hamming replay") {
    val embs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def bits(e: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (j <- 0 until 32) if (e(j) > 0) lo |= (1L << j)
      for (j <- 32 until 64) if (e(j) > 0) hi |= (1L << (j - 32))
      (lo, hi)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val packed = embs.map { case (v, e) => (v, bits(e)) }.toMap
    val expected = (0L until 5L).map { qid =>
      val (qlo, qhi) = packed(qid)
      val qe = embs.find(_._1 == qid).get._2
      val binTop = embs.filter(_._1 != qid).map { case (v, _) =>
        val (lo, hi) = packed(v)
        (v, java.lang.Long.bitCount(lo ^ qlo) +
          java.lang.Long.bitCount(hi ^ qhi))
      }.sortBy { case (v, h) => (h, v) }.take(10).map(_._1).toSet
      val truth = embs.filter(_._1 != qid)
        .map { case (v, e) => (v, cos(e, qe)) }
        .sortBy { case (v, s) => (-s, v) }.take(10).map(_._1).toSet
      (qid, (binTop intersect truth).size.toLong)
    }
    val got = Similarity.binaryRecall(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("events_user_similarity equals a driver-side blocked cosine " +
    "replay") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = ev.groupBy(identity).map { case ((u, t), g) =>
      ((u, t), g.size.toLong) }
    val byUser = counts.groupBy(_._1._1).map { case (u, g) =>
      (u, g.map { case ((_, t), n) => (t, n) }.toMap) }
    val dom = byUser.map { case (u, m) =>
      (u, m.toSeq.minBy { case (t, n) => (-n, t) }._1) }
    val nsq = byUser.map { case (u, m) =>
      (u, m.values.map(n => n * n).sum) }
    val users = byUser.keys.toSeq
    val pairs = for {
      i <- users.indices; j <- users.indices
      u1 = users(i); u2 = users(j)
      if u1 < u2 && dom(u1) == dom(u2)
    } yield {
      val m1 = byUser(u1); val m2 = byUser(u2)
      val dot = m1.keySet.intersect(m2.keySet).toSeq
        .map(t => m1(t) * m2(t)).sum
      (u1, u2, dom(u1),
        dot.toDouble / (math.sqrt(nsq(u1).toDouble) *
          math.sqrt(nsq(u2).toDouble)))
    }
    val expected = pairs.sortBy { case (u1, u2, _, c) => (-c, u1, u2) }
      .take(20)
    val got = EventAnalytics.userSimilarity(spark, sf0001).collect()
    assert(got.length === expected.length)
    got.zip(expected).foreach { case (r, (u1, u2, d, c)) =>
      assert((r.getLong(0), r.getLong(1), r.getString(2)) === ((u1, u2, d)))
      assert(math.abs(r.getDouble(3) - c) < 1e-6)
      assert(r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("stream_hll_distinct exact sides equal a driver-side replay and " +
    "the maintained sketch lands in bound") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val cut = ev.map(_._1.getTime).min + 15L * 86400 * 1000
    val got = graft.operators.StreamingAnalytics
      .streamHllDistinct(spark, sf0001).collect().head
    assert(got.getLong(0) === 2L)
    assert(got.getLong(1) ===
      ev.filter(_._1.getTime < cut).map(_._2).distinct.length.toLong)
    assert(got.getLong(2) === ev.map(_._2).distinct.length.toLong)
    assert(got.getBoolean(3), "maintained HLL estimate out of bound")
  }

  test("graph_conductance equals a first-principles cut-volume replay " +
    "over the symmetrized graph") {
    val sym = graft.operators.Graph.symTradeEdges(spark, sf0001)
      .collect().map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue, BigInt(r.getDecimal(2).toBigInteger)))
    val comm = graft.operators.Graph.labelPropNations(spark, sf0001)
      .select(col("node"), col("community")).collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).toMap
    val tw = sym.map(_._3).sum
    val byComm = comm.values.toSeq.distinct.map { c =>
      val cut = sym.filter { case (a, b, _) =>
        comm(a) == c && comm(b) != c }.map(_._3).sum
      val vol = sym.filter { case (a, _, _) => comm(a) == c }.map(_._3).sum
      (c, (comm.count(_._2 == c).toLong, cut, vol))
    }.toMap
    val got = graft.operators.Graph.conductance(spark, sf0001).collect()
    assert(got.length === byComm.size)
    got.foreach { r =>
      val c = r.getAs[Number](0).longValue
      val (nn, cut, vol) = byComm(c)
      assert(r.getLong(1) === nn, s"community $c")
      assert(r.getLong(2) === cut.toLong)
      assert(r.getLong(3) === vol.toLong)
      val denom = vol.min(tw - vol)
      if (denom > 0) {
        val phi = cut.toDouble / denom.toDouble
        assert(math.abs(r.getDouble(4) - phi) < 1e-6)
        assert(r.getDouble(4) >= 0.0)
      } else assert(r.isNullAt(4))
    }
  }

  test("events_ab_cuped equals a driver-side theta-fit replay and " +
    "never inflates variance") {
    val ev = Tables(spark, sf0001, "events")
      .select(col("ts"), col("user_id"), col("event_type")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getString(2)))
    val t0 = ev.map(_._1).min
    val d7 = 7L * 86400 * 1000
    val users = ev.map(_._2).distinct
    def cnt(lo: Long, hi: Long): Map[Long, Long] =
      ev.filter(e => e._3 == "purchase" && e._1 >= lo && e._1 < hi)
        .groupBy(_._2).map { case (u, g) => (u, g.length.toLong) }
    val xs = cnt(Long.MinValue, t0 + d7)
    val ys = cnt(t0 + d7, t0 + 2 * d7)
    val rows = users.map(u =>
      (u, xs.getOrElse(u, 0L), ys.getOrElse(u, 0L),
        if (u % 2 == 0) "A" else "B"))
    val n = rows.length.toLong
    val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
    val sxy = rows.map(r => r._2 * r._3).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    val theta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    val mx = sx.toDouble / n
    val got = EventAnalytics.abCuped(spark, sf0001).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("A", "B"))
    got.foreach { r =>
      val arm = rows.filter(_._4 == r.getString(0))
      val na = arm.length.toLong
      val ya = arm.map(a => a._3.toDouble - theta * (a._2 - mx))
      assert(r.getLong(1) === na)
      assert(math.abs(r.getDouble(2) - arm.map(_._3).sum.toDouble / na)
        < 1e-6)
      assert(math.abs(r.getDouble(3) - ya.sum / na) < 1e-5)
      val varY = (na * arm.map(a => a._3 * a._3).sum -
        arm.map(_._3).sum * arm.map(_._3).sum).toDouble / (na * (na - 1))
      assert(math.abs(r.getDouble(4) - varY) < 1e-4)
      assert(math.abs(r.getDouble(7) - theta) < 1e-5)
      // CUPED cannot inflate variance when theta is the pooled OLS
      // coefficient and the arms are balanced random splits
      assert(r.getDouble(6) > -0.05, s"arm ${r.getString(0)} inflated")
    }
  }
}
