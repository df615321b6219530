package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-10 operators and guards. */
class Round10OpsSpec extends SparkSpec {

  test("bpeMergeLearn fails fast, naming the condition, when the corpus " +
    "exhausts its learnable merges before `rounds`") {
    import spark.implicits._
    // a single 1-letter word: round 1 merges (a, </w>); round 2 has no
    // adjacent pairs left anywhere
    val dir = Files.createTempDirectory("graft_bpe_tiny").toString
    Seq(("a a a", 1L)).toDF("text", "doc_id")
      .write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeMergeLearn(spark, dir, rounds = 3).collect()
    }
    assert(e.getMessage.contains("no adjacent pairs left at round 2"))
    assert(e.getMessage.contains("supports only 1 merges"))
  }

  test("text_bpe_pack equals an independent segmentation + packing pass " +
    "(reference trainer vocabulary, OOV tokens count 1, greedy windows)") {
    val words = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (_, vocab) = BpeReference.trainFull(words, rounds = 6)
    val nSub: Map[String, Long] =
      vocab.map { case (w, syms) => w -> syms.length.toLong }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // independent per-doc BPE length: trained words by vocabulary lookup,
    // everything else (digits, punctuation, empty splits) 1 atomic token
    val docLens = docs.map { case (src, id, text) =>
      val len = text.split(" ", -1).iterator
        .map(t => nSub.getOrElse(t.toLowerCase, 1L)).sum
      (src, id, len)
    }
    // independent packing census
    val hist = docLens.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, _, n) =>
        val win = cum / 256; cum += n; (win, n)
      }.groupBy(_._1).values.map(g => (g.length.toLong, g.map(_._2).sum))
    }
    val expected = hist.groupBy(_._1).map { case (d, ws) =>
      (d, ws.length.toLong, ws.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.bpePackSequences(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // the tokenizer must genuinely change the packing: BPE total token
    // mass is strictly below the whitespace+marker char mass and the
    // histogram differs from the whitespace packing
    val ws = TextAnalysis.packSequences(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ws !== got)
  }

  test("sim_ivf_pq_topk: the composed pipeline's recall@10 vs brute force " +
    "matches the IVF-only rung (exact re-rank recovers the shortlist)") {
    import graft.operators.Similarity
    val nQ = 3
    val (finalTopK, ivfExact) =
      Similarity.ivfPqPipeline(spark, sf0001, nQueries = nQ, nProbe = 2,
        shortlist = 50, k = 10)
    def ids(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val composed = ids(finalTopK)
    val ivfOnly = ids(ivfExact)
    // brute-force ground truth per query
    val brute = (0 until nQ).map { qid =>
      qid.toLong -> Similarity.bruteForceTopK(spark, sf0001, queryId = qid)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    def recall(got: Map[Long, Set[Long]]): Int =
      brute.map { case (q, truth) =>
        got.getOrElse(q, Set.empty).count(truth.contains)
      }.sum
    // the verdict's bar: composing PQ/ADC + re-rank between the coarse
    // probe and the answer must not lose recall vs the IVF-only rung
    assert(recall(composed) >= recall(ivfOnly),
      s"composed=${recall(composed)} ivf=${recall(ivfOnly)}")
    // and each query's sets line up rank-for-rank when the shortlist
    // covers the cells' true top-10 (the expected regime at this SF)
    assert(composed === ivfOnly)
  }

  /** Plain-Scala replay of the two-step hard-sigmoid probe trainer on
    * sf0.001 (same ladder as Curation.qualityProbe2): returns, per
    * labeled doc id, (label, step-1 margin ×2000, step-1 sigmoid ×16000,
    * step-2 margin ×16e6). Independent of the Spark implementation:
    * features via MessageDigest (HashedTf64's first-md5-byte % 64
    * scheme), arithmetic in driver loops. */
  private def replayTrainer(): Seq[(Long, Int, Long, Long, Long)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def tf64(text: String): Array[Long] = {
      val counts = new Array[Long](64)
      text.split(" ", -1).foreach { w =>
        md.reset()
        counts((md.digest(w.getBytes("UTF-8"))(0) & 0xff) % 64) += 1L
      }
      counts
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> tf64(r.getString(1))).toMap
    val labels = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .filter { case (id, _) => docs.contains(id) }
    val g2 = new Array[Long](64)
    for ((id, y) <- labels; j <- 0 until 64)
      g2(j) += (2L * y - 1L) * docs(id)(j)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val sgm = labels.map { case (id, _) =>
      id -> math.min(math.max(8000L + 2L * dot(g2, docs(id)), 0L), 16000L)
    }.toMap
    val g2p = new Array[Long](64)
    for ((id, y) <- labels; j <- 0 until 64)
      g2p(j) += (16000L * y - sgm(id)) * docs(id)(j)
    val wBoth = Array.tabulate(64)(j => 8000L * g2(j) + g2p(j))
    labels.map { case (id, y) =>
      (id, y, dot(g2, docs(id)), sgm(id), dot(wBoth, docs(id)))
    }.toSeq
  }

  test("docs_probe_auc equals a driver-side replay: plain-Scala two-step " +
    "trainer + brute-force all-pairs tie-aware AUC") {
    import graft.operators.Curation
    val replay = replayTrainer()
    val m2000 = replay.map { case (_, y, m1, _, _) => (y, m1) }.toArray
    val m16 = replay.map { case (_, y, _, _, m2) => (y, m2) }.toArray
    // brute-force all-pairs tie-aware doubled rank-sum
    def auc(ms: Array[(Int, Long)]): (Long, Long, Long, Double) = {
      val pos = ms.filter(_._1 == 1).map(_._2)
      val neg = ms.filter(_._1 == 0).map(_._2)
      val u2 = pos.iterator.map(p =>
        neg.iterator.map(n =>
          if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      (pos.length.toLong, neg.length.toLong, u2,
        BigDecimal(u2.toDouble / (2.0 * pos.length * neg.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expected = Seq("step1" -> auc(m2000), "step2" -> auc(m16))
      .map { case (s, (np, nn, u2, a)) => (s, np, nn, u2, a) }
    val got = Curation.probeAuc(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // the filter story closes: the second gradient step must not rank
    // worse than chance, and both AUCs are well-defined probabilities
    got.foreach { case (_, _, _, _, a) => assert(a >= 0.0 && a <= 1.0) }
  }

  test("docs_probe_calibration equals a driver-side replay of the step-1 " +
    "predictions bucketed into 8 reliability bins") {
    import graft.operators.Curation
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = replayTrainer()
      .map { case (_, y, _, sgm, _) =>
        (math.min(sgm / 2000L, 7L), y.toLong, sgm)
      }
      .groupBy(_._1).toSeq.map { case (bin, xs) =>
        val n = xs.length.toLong
        val nPos = xs.map(_._2).sum
        val sumSgm = xs.map(_._3).sum
        (bin, n, nPos, r6(sumSgm.toDouble / (n * 16000.0)),
          r6(nPos.toDouble / n))
      }.sortBy(_._1)
    val got = Curation.probeCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // every labeled doc lands in exactly one bin
    assert(got.map(_._2).sum === replayTrainer().size.toLong)
  }

  test("sim_nprobe_sweep equals a driver-side replay: exact-decimal cell " +
    "ranking, candidate widening by rank, f32 top-10 vs brute ground truth") {
    import graft.operators.Similarity
    def d9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cosF32(a: Array[Float], b: Array[Float]): Float = {
      var dot = 0f; var nx = 0f; var ny = 0f; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)
    }
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val nQ = 5; val k = 10
    val queries = vecs.filter(_._1 < nQ)
    // exact-decimal per-(label, dim) centroid means, then per-query cosine
    val byLabel = vecs.groupBy(_._2)
    val cent: Map[Int, Array[Double]] = byLabel.map { case (lab, xs) =>
      lab -> Array.tabulate(xs.head._3.length) { d =>
        (xs.map(x => d9(x._3(d).toDouble)).sum.toDouble / xs.length)
      }
    }
    def cellRank(q: Array[Float]): Seq[Int] = cent.toSeq.map { case (lab, c) =>
      val dq = q.indices.map(d => d9(q(d).toDouble) * d9(c(d))).sum.toDouble
      val qq = q.indices.map(d => d9(q(d).toDouble) * d9(q(d).toDouble))
        .sum.toDouble
      val cc = q.indices.map(d => d9(c(d)) * d9(c(d))).sum.toDouble
      (lab, dq / (math.sqrt(qq) * math.sqrt(cc)))
    }.sortBy { case (lab, s) => (-s, lab) }.map(_._1).take(4)
    val ranked: Map[Long, Seq[Int]] =
      queries.map(q => q._1 -> cellRank(q._3)).toMap
    val brute: Map[Long, Set[Long]] = queries.map { q =>
      q._1 -> vecs.filter(_._1 != q._1)
        .map(v => (v._1, cosF32(v._3, q._3)))
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
    }.toMap
    val expected = Seq(1, 2, 4).map { p =>
      val cand = for {
        q <- queries.toSeq
        cells = ranked(q._1).take(p).toSet
        v <- vecs if v._1 != q._1 && cells.contains(v._2)
      } yield (q._1, v._1, cosF32(v._3, q._3))
      val hits = cand.groupBy(_._1).map { case (qid, xs) =>
        xs.sortBy { case (_, id, s) => (-s, id) }.take(k)
          .count { case (_, id, _) => brute(qid).contains(id) }
      }.sum.toLong
      (p.toLong, cand.length.toLong, hits, r6(hits.toDouble / (nQ * k)))
    }
    val got = Similarity.nprobeSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
    // the tuning-curve invariants the sweep exists to expose
    assert(got.map(_._2) === got.map(_._2).sorted, "candidates monotone")
    assert(got.map(_._3) === got.map(_._3).sorted, "hits monotone")
  }

  test("docs_curriculum equals a driver-side replay: exact global rank, " +
    "integer phase cut, decimal-summed means; means fall phase over phase") {
    import graft.operators.Curation
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).split(" ", -1)
        (r.getLong(0), r.getString(1), toks.length.toLong,
          toks.distinct.length.toLong)
      }
      .filter(_._3 > 0)
      .map { case (id, lang, nTok, nUniq) =>
        (id, lang, nTok, nUniq.toDouble / nTok.toDouble)
      }
    val n = docs.length.toLong
    val ranked = docs.sortBy { case (id, _, _, s) => (-s, id) }.zipWithIndex
      .map { case ((_, lang, nTok, s), i) =>
        (1L + (i.toLong * 4L) / n, lang, nTok, s)
      }
    val expected = ranked.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((phase, lang), xs) =>
        (phase, lang, xs.length.toLong, xs.map(_._3).sum,
          r6(xs.map(x => d9(x._4)).sum.toDouble / xs.length))
      }.sortBy(x => (x._1, x._2))
    val got = Curation.curriculum(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // the curriculum invariant: overall phase quality strictly falls
    val phaseMeans = got.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) =>
        xs.map(x => x._5 * x._3).sum / xs.map(_._3).sum
      }
    assert(phaseMeans === phaseMeans.sorted.reverse,
      s"mean quality must fall phase over phase: $phaseMeans")
  }

  test("docs_probe_threshold equals a driver-side sweep of every margin " +
    "cut (argmax F1, ties to the stricter cut)") {
    import graft.operators.Curation
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lm = replayTrainer().map { case (_, y, _, _, m2) => (y, m2) }
    val nPos = lm.count(_._1 == 1).toLong
    val cuts = lm.map(_._2).distinct.map { v =>
      val kept = lm.filter(_._2 >= v)
      val tp = kept.count(_._1 == 1).toLong
      (v, kept.length.toLong, tp,
        2.0 * tp / (kept.length + nPos))
    }
    val best = cuts.sortBy { case (v, _, _, f1) => (-f1, -v) }.head
    val expected = (best._1, best._2, best._3,
      r6(best._3.toDouble / best._2), r6(best._3.toDouble / nPos),
      r6(best._4))
    val got = Curation.probeThreshold(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.length === 1)
    assert(got.head === expected)
    // sanity: the chosen point dominates the trivial keep-everything cut
    assert(expected._6 >= 2.0 * nPos / (lm.length + nPos) - 1e-9)
  }

  test("graph_triangles equals a brute-force driver-side count over the " +
    "near-dup pair graph (every unordered triple checked)") {
    import graft.operators.{DedupOps, Graph}
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val edge = pairs.flatMap { case (a, b) => Set((a, b), (b, a)) }
    val nodes = pairs.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct
    val deg = nodes.map(v => v -> edge.count(_._1 == v)).toMap
    val triples = nodes.combinations(3).count { t =>
      edge((t(0), t(1))) && edge((t(1), t(2))) && edge((t(0), t(2)))
    }
    val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
    val got = Graph.triangleCount(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((nodes.length.toLong, pairs.size.toLong, wedges, triples.toLong)))
    val expTrans = if (wedges > 0)
      BigDecimal(3.0 * triples / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    else 0.0
    assert(r.getDouble(4) === expTrans)
  }

  test("dedup_cluster_census equals a driver-side histogram of the " +
    "cluster map; shares sum to 1; dup mass = clustered docs - clusters") {
    import graft.operators.DedupOps
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val clusters = DedupOps.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nTotal = Tables(spark, sf0001, "documents").count()
    val bySize = clusters.groupBy(_._2).values.map(_.length.toLong).toSeq
      .groupBy(identity).map { case (sz, xs) => (sz, xs.length.toLong) }
    val withSingles = bySize + (1L -> (nTotal - clusters.length))
    val expected = withSingles.toSeq.sortBy(_._1).map { case (sz, nc) =>
      (sz, nc, sz * nc, (sz - 1) * nc, r6(sz * nc.toDouble / nTotal))
    }
    val got = DedupOps.clusterCensus(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4, "shares sum to ~1")
    assert(got.map(_._4).sum === clusters.length - bySize.values.sum)
  }

  test("dedup_lsh_tune: relational re-banding reproduces the fused " +
    "expression's buckets; candidate/hit sets nest as bands tighten") {
    import graft.functions.ExprColumns
    import graft.operators.DedupOps
    ExprColumns.register(spark)
    val e = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        ExprColumns.shingles(spark, "text", 5).as("sh_arr"))
    // the 3x3 banding derived from the raw signature must equal the
    // fused MinHashBandBuckets buckets bit-for-bit
    val fused = e.select(col("doc_id"),
        posexplode(ExprColumns.minhashBuckets(spark, "sh_arr")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val rel = e.select(col("doc_id"), posexplode(expr(
        """transform(sequence(0, 2), b -> md5(array_join(
             slice(graft_minhash_values(sh_arr), b * 3 + 1, 3), ',')))""")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rel === fused)
    // sweep invariants: a pair colliding at rows-per-band r collides at
    // every divisor of its band, so candidates and hits NEST downward
    val rows = DedupOps.lshBandingSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._2).toSeq === Seq(1L, 3L, 9L))
    assert(rows.map(_._1).toSeq === Seq(9L, 3L, 1L))
    assert(rows.map(_._3).toSeq === rows.map(_._3).toSeq.sorted.reverse,
      "candidate count must fall as bands tighten")
    assert(rows.map(_._5).toSeq === rows.map(_._5).toSeq.sorted.reverse,
      "hit count must fall as bands tighten")
    assert(rows.map(_._4).distinct.length === 1,
      "the exact truth-set size is setting-independent")
    rows.foreach { case (_, _, _, nTrue, nHits, recall) =>
      assert(recall === BigDecimal(nHits.toDouble / nTrue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("events_drift equals a driver-side chi-square recomputation over " +
    "collected per-type half-month counts") {
    import graft.operators.EventAnalytics
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)))
    val byType = ev.groupBy(_._1).toSeq.map { case (t, xs) =>
      val first = xs.count(_._2.before(cut)).toLong
      (t, first, xs.length.toLong - first)
    }.sortBy(_._1)
    val t1 = byType.map(_._2).sum
    val t2 = byType.map(_._3).sum
    val expected = byType.map { case (t, n1, n2) =>
      val e = t2.toDouble * n1 / t1
      (t, n1, n2, r6(n1.toDouble / t1), r6(n2.toDouble / t2),
        r6(math.pow(n2 - e, 2.0) / e))
    }
    val got = EventAnalytics.eventsDrift(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("ngramNovelty equals an independent driver-side first-occurrence " +
    "recomputation (deciles, integer masses, exact rates)") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val nTotal = docs.length
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val docSh = docs.map { case (id, t) => (id, shingles(t)) }
    val first = scala.collection.mutable.Map.empty[String, Long]
    docSh.foreach { case (id, sh) =>
      sh.foreach(s => if (!first.contains(s)) first(s) = id)
    }
    val perDoc = docSh.filter(_._2.nonEmpty).map { case (id, sh) =>
      (id, sh.size.toLong, sh.count(s => first(s) == id).toLong)
    }
    val expected = perDoc.groupBy { case (id, _, _) =>
      (id * 10 / nTotal).toInt
    }.map { case (dec, xs) =>
      val nSh = xs.map(_._2).sum
      val nNov = xs.map(_._3).sum
      (dec, xs.length.toLong, nSh, nNov,
        BigDecimal(nNov.toDouble / nSh)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.ngramNovelty(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // the curve must carry signal: later deciles cannot all be fully novel
    assert(got.last._5 < 1.0)
  }

  test("tokenEntropy matches a driver-side Shannon entropy within the " +
    "rounding quantum, and pins the repetitiveness ordering") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, t) =>
      val counts = t.split(" ", -1).groupBy(identity).map(_._2.length)
      val n = counts.sum.toDouble
      val ent = (math.log(n) / math.log(2)) -
        counts.map(c => c * math.log(c) / math.log(2)).sum / n
      (id, counts.sum.toLong, counts.size.toLong, ent)
    }.sortBy(_._1)
    val got = TextAnalysis.tokenEntropy(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === expected.length)
    got.zip(expected).foreach { case ((gi, gn, gt, ge), (ei, en, et, ee)) =>
      assert(gi === ei && gn === en && gt === et)
      // quantized-sum + round(3) vs unquantized reference: off by at
      // most the rounding quantum
      assert(math.abs(ge - ee) <= 0.0011, s"doc $gi: $ge vs $ee")
    }
    // a maximally repetitive doc would score 0; all-distinct scores log2(n)
    got.foreach { case (id, n, types, e) =>
      assert(e >= -0.001 && e <= math.log(n.toDouble) / math.log(2) + 0.001,
        s"doc $id entropy $e outside [0, log2($n)]")
      if (types == 1) assert(e === 0.0)
    }
  }

  test("asofNearest equals a per-user driver-side nearest-view scan " +
    "(direction ties to 'before', event_id breaks timestamp ties)") {
    import graft.operators.EventAnalytics
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.getTimestamp(2)),
        r.getString(3)))
    val byUser = ev.groupBy(_._2)
    val expected = ev.filter(_._4 == "purchase").map {
      case (eid, uid, ts, _) =>
        // ordering key (ts, event_id): strictly-before rows in the
        // backward frame, strictly-after rows in the forward frame
        val views = byUser(uid).filter(_._4 == "view")
        val before = views
          .filter(v => v._3 < ts || (v._3 == ts && v._1 < eid))
          .map(_._3).maxOption
        val after = views
          .filter(v => v._3 > ts || (v._3 == ts && v._1 > eid))
          .map(_._3).minOption
        val gapB = before.map(ts - _)
        val gapF = after.map(_ - ts)
        val dir = (gapB, gapF) match {
          case (Some(b), Some(f)) =>
            if (b <= f) "before" else "after"
          case (Some(_), None) => "before"
          case (None, Some(_)) => "after"
          case _ => "none"
        }
        val gap = dir match {
          case "before" => gapB
          case "after" => gapF
          case _ => None
        }
        (eid, uid, dir, gap.getOrElse(-1L))
    }.sortBy(_._1).toSeq
    val got = EventAnalytics.asofNearest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSeq
    assert(got === expected)
    assert(expected.exists(_._3 == "before") &&
      expected.exists(_._3 == "after"))
  }

  test("streamCdcUpsert: two staged increments merge to the batch argmax " +
    "state (update + insert paths both exercised)") {
    import graft.operators.StreamingAnalytics
    val ev = Tables(spark, sf0001, "events")
    val cut = lit("2024-01-08 00:00:00").cast("timestamp")
    val w1Users = ev.filter(col("ts") < cut)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val w2Users = ev.filter(col("ts") >= cut)
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    // the merge must hit both branches: users updated across batches and
    // users only inserted by batch 2
    assert((w1Users & w2Users).nonEmpty)
    val batch = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max_by(struct(col("ts"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("l"))
      .select(col("user_id"), col("n_events"),
        date_format(col("l.ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("l.event_type").as("last_type"),
        col("l.value").as("last_value"))
      .orderBy(col("user_id")).collect().toSeq
    val got = StreamingAnalytics.streamCdcUpsert(spark, sf0001)
      .collect().toSeq
    assert(got === batch)
  }

  test("basketPairs equals a driver-side co-occurrence scan (support, " +
    "lift, bounded per-order pair fan-out)") {
    import graft.operators.Relational
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // the quadratic envelope the operator relies on: orders are small
    // (this corpus tops out around a dozen distinct parts per order)
    assert(byOrder.values.map(_.length).max <= 16)
    val itemCnt = li.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = byOrder.size.toLong
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        if (parts(i) != parts(j)) {
          val k = (parts(i), parts(j))
          pairCnt(k) = pairCnt.getOrElse(k, 0L) + 1L
        }
    }
    val minSup = 2L // sf0.001 is too small for support 3
    val expected = pairCnt.toSeq.filter(_._2 >= minSup).map {
      case ((p1, p2), nCo) =>
        val c1 = itemCnt(p1); val c2 = itemCnt(p2)
        val lift = BigDecimal(nCo.toDouble * nOrders / (c1 * c2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (p1, p2, nCo, c1, c2, lift)
    }.sortBy { case (p1, p2, nCo, _, _, _) => (-nCo, p1, p2) }
    val got = Relational.basketPairs(spark, sf0001, minSupport = minSup)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("ewmaDaily equals an exact driver-side power-of-two EWMA " +
    "(every weight and product representable, no float-order slack)") {
    import graft.operators.Relational
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val sorted = xs.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, day, n), i) =>
        val lo = math.max(0, i - 7)
        val num = (lo to i).map(j =>
          sorted(j)._3.toDouble * math.pow(2.0, j + 1)).sum
        val den = (lo to i).map(j => math.pow(2.0, j + 1)).sum
        (t, day, n, BigDecimal(num / den)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Relational.ewmaDaily(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    // smoothing sanity: ewma is within the window's [min, max]
    got.groupBy(_._1).foreach { case (_, xs) =>
      xs.foreach(x => assert(x._4 >= 0.0))
    }
  }

  test("streamDedupWatermark drops the injected retry replay exactly " +
    "(census equals batch; the retry slice is genuinely non-empty)") {
    import graft.operators.StreamingAnalytics
    val ev = Tables(spark, sf0001, "events")
    val cut = lit("2024-01-08 00:00:00").cast("timestamp")
    val nRetry = ev.filter(col("ts") < cut && col("user_id") % 7 === 0).count()
    assert(nRetry > 0, "retry injection slice is empty — the test is vacuous")
    val batch = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double")
          .as("sum_value"))
      .orderBy(col("event_type")).collect().toSeq
    val got = StreamingAnalytics.streamDedupWatermark(spark, sf0001)
      .collect().toSeq
    assert(got === batch)
  }

  test("tsDecompose: additive identity holds per row and the seasonal " +
    "means recompute driver-side") {
    import graft.operators.EventAnalytics
    val rows = EventAnalytics.tsDecompose(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // n = trend + seasonal + residual exactly before rounding; after
    // three independent round(4)s the identity holds to 2e-4
    rows.foreach { case (t, day, n, tr, se, re) =>
      assert(math.abs(n.toDouble - (tr + se + re)) <= 2e-4,
        s"$t $day: $n != $tr + $se + $re")
    }
    // driver-side recompute of the full decomposition
    val daily = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    daily.foreach { case (t, xs) =>
      val ns = xs.map(_._3.toDouble)
      xs.indices.foreach { i =>
        val lo = math.max(0, i - 3); val hi = math.min(xs.length - 1, i + 3)
        val trend = (lo to hi).map(ns).sum / (hi - lo + 1)
        assert(math.abs(trend - xs(i)._4) <= 1e-4,
          s"$t ${xs(i)._2}: trend ${xs(i)._4} != $trend")
      }
      // seasonal constant within a weekday, for each type
      val byDow = xs.groupBy(x => java.time.LocalDate.parse(x._2).getDayOfWeek)
      byDow.values.foreach { g =>
        assert(g.map(_._5).distinct.size == 1,
          s"$t: seasonal differs within one weekday")
      }
    }
  }

  test("pcaPowerIteration equals an exact driver-side integer power step " +
    "and yields a unit direction") {
    import graft.operators.Similarity
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dim = vecs.head._2.length
    val xq = vecs.map { case (_, v) =>
      v.map(x => BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val s = xq.map(_.sum)
    val w = Array.tabulate(dim)(j =>
      xq.indices.map(i => xq(i)(j) * s(i)).sum)
    val norm = math.sqrt(w.map(x => x.toDouble * x.toDouble).sum)
    val expected = w.zipWithIndex.map { case (wj, j) =>
      (j, wj, BigDecimal(wj.toDouble / norm)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq
    val got = Similarity.pcaPowerIteration(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(x => (x._1, x._2)) === expected.map(x => (x._1, x._2)))
    got.zip(expected).foreach { case ((_, _, g), (_, _, e)) =>
      assert(math.abs(g - e) <= 1e-6) // norm sums in different orders
    }
    val n2 = got.map(x => x._3 * x._3).sum
    assert(math.abs(n2 - 1.0) <= 1e-4, s"component norm^2 = $n2")
  }

  test("piiScrub redacts exactly the injected set (counts and character " +
    "mass recompute from the injection rule)") {
    import graft.operators.Curation
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.map { case (lang, xs) =>
      val emails = xs.filter(_._1 % 5 == 0)
      val nums = xs.count(_._1 % 7 == 0).toLong
      // redacted chars: |"userN@mail.test"| - |"<EMAIL>"| per email,
      // |16-digit card| - |"<NUM>"| per number
      val emailChars = emails.map { case (id, _) =>
        s"user$id@mail.test".length - "<EMAIL>".length
      }.sum.toLong
      val numChars = nums * ("4111111111111111".length - "<NUM>".length)
      (lang, xs.length.toLong, emails.length.toLong, nums,
        emailChars + numChars)
    }.sortBy(_._1)
    assert(expected.map(_._3).sum > 0 && expected.map(_._4).sum > 0,
      "injection sets must be non-empty")
    val got = Curation.piiScrub(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("anomalyStl flags exactly the residuals past the per-type MAD " +
    "gate, recomputed driver-side with interpolated medians") {
    import graft.operators.EventAnalytics
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val dec = EventAnalytics.tsDecompose(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(5)))
    val expected = dec.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val m = med(xs.map(_._4))
      val mad = med(xs.map(x => math.abs(x._4 - m)))
      xs.filter(x => math.abs(x._4 - m) > mad * 2.0)
        .map(x => (t, x._2, x._3, x._4))
    }.sortBy(x => (x._1, x._2))
    val got = EventAnalytics.anomalyStl(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "the gate should fire somewhere at sf0.001")
  }

  test("pcaProject equals an exact driver-side integer projection and " +
    "histogram, and covers the whole corpus") {
    import graft.operators.Similarity
    val comp = Similarity.pcaPowerIteration(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(2))).sortBy(_._1)
    val cq = comp.map(c => BigDecimal(c._2 * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val proj = vecs.map { case (_, v) =>
      v.zipWithIndex.map { case (x, j) =>
        BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong * cq(j)
      }.sum
    }
    val lo = proj.min; val hi = proj.max
    val expected = proj.groupBy(p => ((p - lo) * 8.0 / (hi - lo + 1)).toInt)
      .map { case (bin, ps) =>
        (bin, ps.length.toLong,
          BigDecimal(ps.map(BigDecimal(_)).sum.toDouble / ps.length / 1e12)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy(_._1)
    val got = Similarity.pcaProject(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === vecs.length.toLong)
  }

  test("minhashCalibration: slot agreement and exact Jaccard recompute " +
    "from first principles (independent md5 MinHash replay)") {
    import graft.operators.DedupOps
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val shMap = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val sig = shMap.collect { case (id, sh) if sh.nonEmpty =>
      id -> (0 until 9).map(i => sh.map(s => md5hex(s"$i:$s")).min)
    }
    // candidates: same (band of 3 slots) collision rule as the ladder
    def bands(s: Seq[String]): Seq[String] =
      s.grouped(3).map(g => md5hex(g.mkString(","))).toSeq
    val ids = sig.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      if bands(sig(a)).zip(bands(sig(b))).exists { case (x, y) => x == y }
    } yield {
      val slots = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
      val inter = (shMap(a) & shMap(b)).size
      val uni = shMap(a).size + shMap(b).size - inter
      (a, b, slots,
        BigDecimal(slots / 9.0).setScale(3,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(inter.toDouble / uni).setScale(3,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).filter(x => (shMap(x._1) & shMap(x._2)).nonEmpty).sortBy(x => (x._1, x._2))
    val got = DedupOps.minhashCalibration(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // an unbiased estimator should be close on the near-dup population
    val worst = got.map(x => math.abs(x._4 - x._5)).max
    assert(worst <= 4.0 / 9 + 1e-9, s"calibration error $worst implausible")
  }

  test("cdcChunks recomputes driver-side, and boundaries are genuinely " +
    "content-defined: an insertion only disturbs its own chunk") {
    import graft.operators.TextAnalysis
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def chunksOf(text: String): Seq[String] = {
      val words = text.split(" ", -1)
      val out = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      words.foreach { w =>
        if (md5hex(w).startsWith("0")) { // boundary STARTS a new chunk
          if (cur.nonEmpty || out.nonEmpty) out += cur.reverse
          cur = List(w)
        } else cur = w :: cur
      }
      out += cur.reverse
      out.filter(_.nonEmpty).map(_.mkString(" ")).toSeq
    }
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs.map { case (id, t) => id -> chunksOf(t) }
    val occ = all.flatMap(_._2).groupBy(md5hex).view.mapValues(_.length).toMap
    val expected = all.map { case (id, cs) =>
      val dup = cs.filter(c => occ(md5hex(c)) > 1)
      val nw = cs.map(_.split(" ", -1).length.toLong).sum
      val dw = dup.map(_.split(" ", -1).length.toLong).sum
      (id, cs.length.toLong, dup.length.toLong, nw,
        BigDecimal(dw.toDouble / nw)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.cdcChunks(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // content-defined property: insert a word mid-document — chunks
    // BEFORE the edit keep their fingerprints (a fixed-window scheme
    // would re-align everything after position 0)
    val (_, text) = docs.maxBy(_._2.length)
    val w = text.split(" ", -1)
    val edited = (w.take(w.length / 2) ++ Array("INSERTED") ++
      w.drop(w.length / 2)).mkString(" ")
    val before = chunksOf(text)
    val after = chunksOf(edited)
    val commonPrefix = before.zip(after).takeWhile { case (a, b) => a == b }
    assert(commonPrefix.nonEmpty && commonPrefix.length >= before.length / 4,
      s"expected a stable chunk prefix, got ${commonPrefix.length} of " +
        s"${before.length}")
    // and the suffix realigns too (geometric boundaries re-synchronize)
    val commonSuffix = before.reverse.zip(after.reverse)
      .takeWhile { case (a, b) => a == b }
    assert(commonSuffix.nonEmpty,
      "chunking never re-synchronized after the edit")
  }

  test("jsDivergence recomputes driver-side (present-term sum + " +
    "absent-mass correction) and stays within JSD bounds") {
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val toks = docs.flatMap { case (s, t) => t.split(" ", -1).map(s -> _) }
    val corpus = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nc = toks.length.toDouble
    def q10(x: Double): BigDecimal =
      BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    val expected = toks.groupBy(_._1).toSeq.map { case (src, xs) =>
      val tf = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ns = xs.length.toDouble
      def lg(x: Double) = math.log(x) / math.log(2)
      val parts = tf.toSeq.map { case (w, cs) =>
        val p = cs / ns; val q = corpus(w) / nc; val m = (p + q) / 2
        (q10((p * lg(p / m) + q * lg(q / m)) / 2), q10(q / 2))
      }
      val jsp = parts.map(_._1).sum.toDouble
      val qp = parts.map(_._2).sum.toDouble
      (src, xs.length.toLong, tf.size.toLong,
        BigDecimal(jsp + (0.5 - qp))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = TextAnalysis.jsDivergence(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ===
      expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case ((s, _, _, g), (_, _, _, e)) =>
      assert(math.abs(g - e) <= 2e-4, s"$s: $g vs $e")
      assert(g >= -1e-9 && g <= 1.0 + 1e-9, s"$s: jsd $g out of [0,1]")
    }
  }

  test("abTest recomputes driver-side and NULLs z on a degenerate pool " +
    "instead of throwing under ANSI") {
    import graft.operators.EventAnalytics
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), micros(r.getTimestamp(1)), r.getString(2)))
    val views = ev.filter(_._3 == "view")
    val purch = ev.filter(_._3 == "purchase").groupBy(_._1)
    val exposed = views.map(_._1).distinct
    val conv = exposed.filter { u =>
      val ps = purch.getOrElse(u, Array.empty).map(_._2)
      views.filter(_._1 == u).exists(v =>
        ps.exists(p => p > v._2 && p <= v._2 + 30L * 60 * 1000000))
    }.toSet
    def arm(sel: Long => Boolean) = {
      val us = exposed.filter(sel)
      (us.length.toLong, us.count(conv).toLong)
    }
    val (na, ca) = arm(_ % 2 == 0); val (nb, cb) = arm(_ % 2 != 0)
    val row = EventAnalytics.abTest(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((na, ca, nb, cb)))
    val pool = (ca + cb).toDouble / (na + nb)
    if (ca + cb > 0 && ca + cb < na + nb) {
      val z = (cb.toDouble / nb - ca.toDouble / na) /
        math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
      assert(math.abs(row.getDouble(6) - z) <= 1e-4)
    } else assert(row.isNullAt(6))
    // degenerate corpus: every view converts -> z must be NULL, no throw
    val d = java.nio.file.Files.createTempDirectory("graft_ab").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 2L, "purchase", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 3L, "view", 1.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val deg = EventAnalytics.abTest(spark, d).collect().head
    assert(deg.isNullAt(6), "100% pooled conversion must yield NULL z")
  }

  test("concurrency equals a driver-side +1/-1 sweep over the session " +
    "intervals (ends before starts at equal instants)") {
    import graft.operators.EventAnalytics
    val sess = Tables(spark, sf0001, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)))
      .select(col("session_window.start"), col("session_window.end"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
    val deltas = sess.flatMap { case (s, e) => Seq((s, 1L), (e, -1L)) }
      .sortBy(identity) // (t, d): d=-1 sorts before d=+1 at equal t
    var run = 0L
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val byHour = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long, Long)]
    deltas.foreach { case (t, d) =>
      run += d
      val h = fmt.format(new java.util.Date(t - t % 3600000L))
      val (mx, st, en) = byHour.getOrElse(h, (Long.MinValue, 0L, 0L))
      byHour(h) = (math.max(mx, run),
        st + (if (d == 1) 1L else 0L), en + (if (d == -1) 1L else 0L))
    }
    val expected = byHour.toSeq
      .map { case (h, (m, s, e)) => (h, m, s, e) }.sortBy(_._1)
    val got = EventAnalytics.concurrency(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // conservation: every started session ends
    assert(got.map(_._3).sum === got.map(_._4).sum)
    assert(got.map(_._2).max > 1, "test is vacuous without overlap")
  }

  test("audioEnergy equals a driver-side byte-window recompute over the " +
    "audio modality payloads") {
    import graft.operators.Multimodal
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id % 3 == 1 && t.nonEmpty }
    val expected = docs.map { case (id, t) =>
      val energies = t.getBytes("UTF-8").grouped(256).map { c =>
        c.foldLeft(0L) { (a, b) =>
          val v = (b & 0xff) - 128; a + v.toLong * v
        }
      }.toSeq
      val peak = energies.max
      val near = energies.count(e => e * 10 >= peak * 9).toLong
      (id, energies.length.toLong, energies.sum, peak, near,
        BigDecimal(near.toDouble / energies.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = Multimodal.audioEnergy(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.exists(_._2 > 1),
      "needs at least one multi-window payload")
  }

  private def dailyCounts(): Map[String, Seq[(String, Long)]] =
    Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap

  test("forecastNaive: MAPE/bias equal a driver-side lag-7 backtest") {
    import graft.operators.EventAnalytics
    val expected = dailyCounts().toSeq.map { case (t, xs) =>
      val scored = xs.indices.drop(7).map { i =>
        val n = xs(i)._2; val fc = xs(i - 7)._2
        (BigDecimal(math.abs(n - fc).toDouble / n)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP), n - fc)
      }
      (t, scored.length.toLong,
        BigDecimal(scored.map(_._1).sum.toDouble / scored.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        scored.map(_._2).sum, scored.map(x => math.abs(x._2)).max)
    }.sortBy(_._1)
    val got = EventAnalytics.forecastNaive(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("rollingMedianDaily equals a driver-side 7-window median " +
    "(odd picks middle, even averages the two middles)") {
    import graft.operators.Relational
    val expected = dailyCounts().toSeq.flatMap { case (t, xs) =>
      xs.indices.map { i =>
        val win = xs.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
        val m =
          if (win.length % 2 == 1) win(win.length / 2).toDouble
          else (win(win.length / 2 - 1) + win(win.length / 2)) / 2.0
        (t, xs(i)._1, xs(i)._2,
          BigDecimal(m).setScale(1, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
    }.sortBy(x => (x._1, x._2))
    val got = Relational.rollingMedianDaily(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("cosineThresholdSweep nests correctly and its 0.90 point matches " +
    "the production embedding-cosine row exactly") {
    import graft.operators.DedupOps
    val sweep = DedupOps.cosineThresholdSweep(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(sweep.map(_._1) === Seq(0.80, 0.90, 0.95, 0.99))
    // candidate sets nest: tighter threshold, never more pairs/docs
    sweep.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3, s"$lo !>= $hi")
    }
    // min kept similarity respects the threshold
    sweep.foreach { case (t, n, _, minCos) =>
      if (n > 0) assert(minCos >= t - 5e-5) // round(4) boundary slack
    }
    val prod = DedupOps.embeddingCosinePairs(spark, sf0001).collect()
    assert(sweep.find(_._1 == 0.90).get._2 === prod.length.toLong)
  }

  test("knnGraph equals a driver-side f32 top-k neighbor recomputation " +
    "(reciprocity counted on the edge set)") {
    import graft.operators.Similarity
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cosF32(x: Array[Float], y: Array[Float]): Float = {
      var dot = 0f; var nx = 0f; var ny = 0f; var i = 0
      while (i < x.length) {
        dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      dot / (math.sqrt(nx.toDouble).toFloat * math.sqrt(ny.toDouble).toFloat)
    }
    val byLabel = vecs.toSeq.groupBy(_._2)
    val edges = byLabel.toSeq.flatMap { case (lbl, vs) =>
      vs.flatMap { case (v1, _, e1) =>
        vs.filter(_._1 != v1)
          .map { case (v2, _, e2) => (v2, cosF32(e1, e2)) }
          .sortBy { case (v2, s) => (-s.toDouble, v2) }
          .take(3).map { case (v2, s) => (lbl, v1, v2, s) }
      }
    }
    val edgeSet = edges.map(e => (e._2, e._3)).toSet
    val expected = edges.groupBy(_._1).toSeq.map { case (lbl, es) =>
      val recip = es.count(e => edgeSet.contains((e._3, e._2))).toLong
      val avg = es.map(e => BigDecimal(e._4.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
        es.length
      (lbl, es.map(_._2).distinct.length.toLong, es.length.toLong, recip,
        BigDecimal(avg).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.sortBy(_._1)
    val got = Similarity.knnGraph(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    assert(got.map(_._4).sum > 0, "some reciprocity expected in blocks")
  }

  test("cohortRevenue equals a driver-side first-month triangle with " +
    "exact cents") {
    import graft.operators.Relational
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate.withDayOfMonth(1),
        math.round(r.getDouble(2) * 100)))
    val firstM = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def months(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      (b.getYear - a.getYear) * 12L + (b.getMonthValue - a.getMonthValue)
    val expected = orders.groupBy { case (c, m, _) =>
      (firstM(c).toString.substring(0, 7), months(firstM(c), m))
    }.map { case ((coh, off), xs) =>
      (coh, off, xs.map(_._1).distinct.length.toLong, xs.length.toLong,
        xs.map(_._3).sum.toDouble / 100)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = Relational.cohortRevenue(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expected)
    // offset 0 cell of each cohort contains every cohort member
    val byCohort = got.groupBy(_._1)
    byCohort.values.foreach { xs =>
      val m0 = xs.find(_._2 == 0L).get
      assert(xs.forall(_._3 <= m0._3),
        "a later offset cannot exceed the cohort's size")
    }
  }

  test("text_hapax equals a driver-side token-frequency recomputation") {
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val freq = xs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val vocab = freq.size.toLong
      val hapax = freq.values.count(_ == 1L).toLong
      val total = freq.values.sum
      (lang, vocab, hapax, total,
        BigDecimal(hapax.toDouble / vocab)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(vocab.toDouble / total)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.hapaxStats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("agg_weighted_median matches a driver-side weighted-percentile " +
    "scan and brackets correctly (p25 <= median <= p75)") {
    import graft.operators.Relational
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2) * 100)))
    val expected = rows.groupBy(_._1).map { case (flag, xs) =>
      val hist = xs.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      def thr(num: Long, den: Long): Double = {
        val k = (num * tot + den - 1) / den // ceil(num*tot/den)
        var cum = 0L
        hist.find { case (_, w) => cum += w; cum >= k }.get._1 / 100.0
      }
      (flag, thr(1, 4), thr(1, 2), thr(3, 4), tot.toDouble / 100.0)
    }.toSeq.sortBy(_._1)
    val got = Relational.weightedMedianPrice(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expected)
    got.foreach { case (_, p25, med, p75, _) =>
      assert(p25 <= med && med <= p75)
    }
  }

  test("orders_rfm: quartile cells partition all ordering customers; " +
    "scores stay in 1..4; spend rises with m_score") {
    import graft.operators.Relational
    val got = Relational.ordersRfm(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val nCust = Tables(spark, sf0001, "orders")
      .select(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    assert(got.map(_._4).sum === nCust,
      "every customer with an order lands in exactly one RFM cell")
    got.foreach { case (r, f, m, _, _) =>
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4)
    }
    // monetary quartiles order mean spend: cell means averaged per
    // m_score (weighted by cell size) must be non-decreasing in m_score
    val byM = got.groupBy(_._3).view.mapValues { xs =>
      xs.map(x => x._5 * x._4).sum / xs.map(_._4).sum
    }.toSeq.sortBy(_._1)
    assert(byM.map(_._2) === byM.map(_._2).sorted,
      "mean spend must be monotone in the monetary quartile")
    // each quartile holds between 1/8 and 1/2 of customers (banded $1k
    // monetary ties can unbalance, but not pathologically at sf0.001)
    val byMn = got.groupBy(_._3).view.mapValues(_.map(_._4).sum).toSeq
    byMn.foreach { case (_, n) =>
      assert(n >= nCust / 8 && n <= nCust / 2 + 1) }
  }

  test("graph_link_predict equals a driver-side recomputation from the " +
    "same knn edge set (symmetrize, wedge, anti-adjacency, Jaccard)") {
    import graft.operators.{Graph, Similarity}
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val und = edges.flatMap { case (l, a, b) => Seq((l, a, b), (l, b, a)) }
      .distinct
    val adj = und.groupBy(x => (x._1, x._2)).view
      .mapValues(_.map(_._3).toSet).toMap
    val expected = und.map(_._1).distinct.sorted.flatMap { l =>
      val verts = adj.keys.filter(_._1 == l).map(_._2)
      val cand = (for {
        c <- verts.toSeq
        ns = adj((l, c)).toSeq.sorted
        a <- ns; b <- ns if a < b
      } yield (a, b)).groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case ((a, b), _) => !adj((l, a)).contains(b) }.toSeq
      if (cand.isEmpty) None else {
        val jac = cand.map { case ((a, b), common) =>
          BigDecimal(common.toDouble /
            (adj((l, a)).size + adj((l, b)).size - common))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
        Some((l, cand.size.toLong, cand.map(_._2).max,
          BigDecimal(jac.sum.toDouble / jac.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val got = Graph.linkPredict(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("events_cusum equals a driver-side integer CUSUM scan") {
    import graft.operators.EventAnalytics
    val ev = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("ts")).collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Timestamp](1).toInstant
          .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
          .withMinute(0).withSecond(0).withNano(0)))
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      val hourly = xs.groupBy(_._2).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)(Ordering.fromLessThan(_ isBefore _))
      val tH = hourly.length.toLong
      val sTot = hourly.map(_._2).sum
      var cum = 0L
      val scans = hourly.zipWithIndex.map { case ((h, n), i) =>
        cum += n; (h, tH * cum - (i + 1) * sTot)
      }
      val maxabs = scans.map(s => math.abs(s._2)).max
      val cpH = scans.filter(s => math.abs(s._2) == maxabs).map(_._1)
        .min(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      (t, tH, sTot,
        cpH.format(java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss")),
        BigDecimal(maxabs.toDouble / tH)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.cusumChangepoint(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSeq
    assert(got === expected)
  }

  test("events_paths equals a driver-side trigram count and tops out " +
    "at 15 rows") {
    import graft.operators.EventAnalytics
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).toInstant
          .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime,
        r.getLong(2), r.getString(3)))
    val tsOrd = Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _)
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3))(Ordering.Tuple2(tsOrd,
        implicitly[Ordering[Long]])).map(_._4)
      s.sliding(3).filter(_.length == 3).map(_.mkString(">")).toSeq
    }
    val counts = tris.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val tot = counts.map(_._2).sum
    val expected = counts.sortBy { case (p, n) => (-n, p) }.take(15)
      .map { case (p, n) => (p, n,
        BigDecimal(n.toDouble / tot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val got = EventAnalytics.topPaths(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("events_power_pareto equals an explicit per-user ranking cut " +
    "(ties split exactly) and shares are monotone in pct") {
    import graft.operators.EventAnalytics
    val perUser = Tables(spark, sf0001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      .collect().map(_.getLong(1)).sorted(Ordering.Long.reverse)
    val eTot = perUser.sum
    val expected = Seq(1L, 5L, 10L, 25L).map { pct =>
      val k = ((pct * perUser.length + 99) / 100).toInt
      val ev = perUser.take(k).sum
      (pct, k.toLong, ev,
        BigDecimal(ev.toDouble / eTot)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = EventAnalytics.powerPareto(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._4) === got.map(_._4).sorted,
      "share must grow with the pct cut")
  }

  test("dedup_source_matrix accounts for exactly the non-keeper copies") {
    import graft.operators.DedupOps
    val docs = Tables(spark, sf0001, "documents")
      .select(col("text"), col("doc_id"), col("source")).collect()
      .map(r => (r.getString(0).take(64), r.getLong(1), r.getString(2)))
    val byText = docs.groupBy(_._1)
    val expTotal = byText.values.map(_.length - 1).sum.toLong
    val got = DedupOps.sourceDupMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._3).sum === expTotal,
      "matrix cells must sum to total non-keeper copies")
    // recompute one cell independently
    val cells = byText.values.filter(_.length > 1).toSeq.flatMap { xs =>
      val keeper = xs.minBy(_._2)
      xs.filter(_._2 != keeper._2).map(d => (keeper._3, d._3))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (ks, ds, n, _) =>
      assert(cells((ks, ds)) === n)
    }
    assert(cells.size === got.length)
  }

  test("text_coverage_curve is consistent with text_hapax totals and " +
    "monotone in k") {
    import graft.operators.TextAnalysis
    val freq = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").groupBy(col("t"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val tot = freq.map(_._2).sum
    val vocab = freq.length.toLong
    val ranked = freq.sortBy { case (t, c) => (-c, t) }
    val got = TextAnalysis.coverageCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    got.foreach { case (k, nTypes, massShare, vocabShare) =>
      val kk = math.min(k, vocab).toInt
      assert(nTypes === kk.toLong)
      val mass = ranked.take(kk).map(_._2).sum
      assert(massShare === BigDecimal(mass.toDouble / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(vocabShare === BigDecimal(nTypes.toDouble / vocab)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.map(_._3) === got.map(_._3).sorted)
  }

  test("events_streaks equals a driver-side gaps-and-islands scan") {
    import graft.operators.EventAnalytics
    val ud = Tables(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val expected = ud.groupBy(_._1).map { case (_, xs) =>
      val days = xs.map(_._2.toEpochDay).sorted.toSeq
      var best = 1L; var cur = 1L
      days.zip(days.drop(1)).foreach { case (a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      }
      best
    }.toSeq.groupBy(x => x).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val got = EventAnalytics.activityStreaks(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("dedup_dup_quality equals a driver-side interaction census") {
    import graft.operators.DedupOps
    val docs = Tables(spark, sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val scored = docs.map { t =>
      val toks = t.split(" ", -1)
      (t.take(64), toks.length.toLong, toks.distinct.length.toLong)
    }.filter(_._2 > 0)
      .map { case (fp, n, u) => (fp, u.toDouble / n) }
    val copies = scored.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = scored.groupBy { case (fp, s) =>
      (if (copies(fp) > 1) 1L else 0L,
        1L + (if (s >= 0.5) 1L else 0L) + (if (s >= 0.75) 1L else 0L) +
          (if (s >= 0.9) 1L else 0L))
    }.map { case ((dup, band), xs) =>
      val sum = xs.map(x => BigDecimal(x._2)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
      (dup, band, xs.length.toLong,
        BigDecimal(sum.toDouble / xs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = DedupOps.dupQualityCensus(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
  }

  test("sim_kmeans_inertia: both rounds cover the corpus and the Lloyd " +
    "step does not degrade mean assignment quality") {
    import graft.operators.Similarity
    val n = Tables(spark, sf0001, "embeddings").count()
    val got = Similarity.kmeansInertia(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    got.foreach { case (_, nv, avg, mn) =>
      assert(nv === n)
      assert(mn <= avg && avg <= 1.0 && mn >= -1.0)
    }
    assert(got(1)._3 >= got(0)._3 - 1e-9,
      "re-derived centroids must not lower mean assigned cosine")
  }

  test("events_interarrival equals a driver-side per-user gap scan") {
    import graft.operators.EventAnalytics
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[java.sql.Timestamp](2).toInstant.getEpochSecond,
        r.getLong(3)))
    val gaps = ev.groupBy(x => (x._1, x._2)).toSeq.flatMap { case (k, xs) =>
      val s = xs.sortBy(x => (x._3, x._4)).map(_._3)
      s.zip(s.drop(1)).map { case (a, b) => (k._2, b - a) }
    }
    val expected = gaps.groupBy(_._1).map { case (t, xs) =>
      val gs = xs.map(_._2).sorted
      val n = gs.length.toLong
      def thr(cond: Long => Boolean): Long = {
        var cum = 0L
        gs.groupBy(identity(_)).toSeq.sortBy(_._1)
          .find { case (_, g) => cum += g.length; cond(cum) }.get._1
      }
      (t, n,
        BigDecimal(gs.sum.toDouble / n)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        thr(c => c >= (n + 1) / 2), thr(c => c * 10 >= n * 9))
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.interarrival(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("text_lm_heldout: train tokens never count as OOV for themselves " +
    "and NLL is bounded by the OOV floor") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.lmHeldout(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    // the add-1 NLL of any token is at most ln(N+V) (cw=0) and at least
    // ln((N+V)/(maxc+1)) > 0 — mean must sit strictly inside
    val docs = Tables(spark, sf0001, "documents")
    import org.apache.spark.sql.functions.{col => c}
    val nTestDocs = docs.count()
    assert(nTestDocs > 0)
    got.foreach { case (_, nTok, nOov, oovRate, meanNll) =>
      assert(nTok > 0 && nOov >= 0 && nOov <= nTok)
      assert(oovRate === BigDecimal(nOov.toDouble / nTok)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(meanNll > 0.0 && meanNll < 30.0)
    }
  }

  test("orders_pareto_abc equals a driver-side exact cumulative cut " +
    "and classes partition all parts") {
    import graft.operators.Relational
    val rev = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100) *
          (100L - math.round(r.getDouble(2) * 100))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val t = rev.map(_._2).sum
    val sorted = rev.sortBy { case (pk, r) => (-r, pk) }
    var cum = 0L
    val classed = sorted.map { case (_, r) =>
      cum += r
      val cls = if (cum * BigInt(10) <= BigInt(t) * 7) "A"
        else if (cum * BigInt(10) <= BigInt(t) * 9) "B" else "C"
      (cls, r)
    }
    val expected = classed.groupBy(_._1).map { case (cls, xs) =>
      val s = xs.map(x => BigInt(x._2)).sum
      (cls, xs.length.toLong,
        BigDecimal(s.toDouble / 10000)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(s.toDouble / t.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Relational.paretoAbc(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === rev.length.toLong)
  }

  test("graph_kcore equals a driver-side peel from the same edge set " +
    "and the trace is monotone non-increasing") {
    import graft.operators.{Graph, Similarity}
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    var und: Set[(Int, Long, Long)] =
      edges.flatMap { case (l, a, b) => Seq((l, a, b), (l, b, a)) }.toSet
    def census(round: Long): Seq[(Long, Int, Long, Long)] =
      und.groupBy(_._1).toSeq.map { case (l, es) =>
        (round, l, es.map(_._2).toSet.size.toLong, es.size.toLong / 2)
      }
    var expected = census(0L)
    for (r <- 1 to 3) {
      val keep = und.groupBy(x => (x._1, x._2)).view
        .mapValues(_.size).filter(_._2 >= 3).keySet
      und = und.filter(e =>
        keep((e._1, e._2)) && keep((e._1, e._3)))
      expected = expected ++ census(r.toLong)
    }
    val exp = expected.sortBy(x => (x._1, x._2))
    val got = Graph.kcoreTrace(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === exp)
    // per label, vertices and edges never grow round-over-round
    got.groupBy(_._2).values.foreach { xs =>
      val s = xs.sortBy(_._1)
      s.zip(s.drop(1)).foreach { case (a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4)
      }
    }
  }

  test("events_forecast_compare equals a driver-side two-model score") {
    import graft.operators.EventAnalytics
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toLocalDate,
        r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, xs) =>
      val s = xs.sortBy(_._2.toEpochDay).map(_._3)
      val scored = (7 until s.length).map(i =>
        (math.abs(s(i) - s(i - 1)), math.abs(s(i) - s(i - 7))))
      val (a1, a7) = (scored.map(_._1).sum, scored.map(_._2).sum)
      (t, scored.length.toLong,
        BigDecimal(a1.toDouble / scored.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(a7.toDouble / scored.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (a7 < a1) "seasonal" else if (a1 < a7) "naive" else "tie")
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.forecastCompare(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getString(4))).toSeq
    assert(got === expected)
  }

  test("text_burstiness: stopword-like high-frequency terms and exact " +
    "moment recomputation") {
    import graft.operators.TextAnalysis
    val counts = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).split(" ", -1).filter(_.nonEmpty)
          .groupBy(identity(_)).map { case (t, xs) =>
            (t, xs.length.toLong) }
      }
    val nDocs = Tables(spark, sf0001, "documents").count()
    val byTok = counts.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = TextAnalysis.burstiness(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length === 20)
    got.foreach { case (tok, total, df, meanC, vmr) =>
      val cs = byTok(tok)
      assert(total === cs.sum && df === cs.length.toLong)
      val mean = cs.sum.toDouble / nDocs
      val sq = cs.map(c => c * c).sum.toDouble / nDocs
      assert(meanC === BigDecimal(mean)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(vmr === BigDecimal((sq - mean * mean) / mean)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(vmr > 0)
    }
    // ranked by frequency: the listed totals are the global top-20
    val top = counts.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq === top)
  }

  test("events_uplift_did equals a driver-side 2x2 recomputation") {
    import graft.operators.EventAnalytics
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val expected = ev.groupBy(x =>
      if (x._1 % 2 == 1) "treat" else "control").map { case (g, xs) =>
      val (pre, post) = xs.partition(_._2 <= mid)
      def m(s: Seq[(Long, Long, Double)]): Double = {
        val dec = s.map(x => BigDecimal(x._3)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
        dec.toDouble / s.length
      }
      val (mp, mq) = (m(pre.toSeq), m(post.toSeq))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (g, pre.length.toLong, post.length.toLong, r6(mp), r6(mq),
        r6(mq - mp))
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.upliftDid(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("events_transition_entropy: entropy bounded by ln(successors), " +
    "shares sum to 1, row_totals match the transition matrix") {
    import graft.operators.EventAnalytics
    val got = EventAnalytics.transitionEntropy(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (_, rt, ns, h, _) =>
      assert(rt > 0 && ns > 0)
      assert(h >= -1e-9 && h <= math.log(ns.toDouble) + 1e-9,
        s"entropy $h outside [0, ln($ns)]")
    }
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-4)
    // cross-check row totals against the already-verified matrix
    val matrix = EventAnalytics.eventTransitions(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    got.foreach { case (t, rt, _, _, _) => assert(matrix(t) === rt) }
  }

  test("text_langid_trigram equals a driver-side Cavnar-Trenkle " +
    "recomputation and row shares sum to 1") {
    // NOTE: the synthetic corpus shares one vocabulary across langs, so
    // ACCURACY is near-chance by design — the spec pins the mechanics
    // (profiles, overlap argmax, tie-break), not linguistic skill.
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] =
      (0 to math.max(t.length - 3, -1)).map(i =>
        t.substring(i, math.min(i + 3, t.length)))
        .filter(_.length == 3)
    val prof: Map[String, Set[String]] = docs.groupBy(_._2).map {
      case (l, xs) =>
        val cnt = xs.flatMap(x => tris(x._3))
          .groupBy(identity(_)).view.mapValues(_.size).toSeq
        l -> cnt.sortBy { case (g, c) => (-c, g) }.take(20).map(_._1).toSet
    }
    val langs = prof.keys.toSeq.sorted
    val preds = docs.flatMap { case (_, trueLang, text) =>
      val dt = tris(text).toSet
      val ovs = langs.map(l => (l, (dt & prof(l)).size)).filter(_._2 > 0)
      if (ovs.isEmpty) None
      else Some((trueLang, ovs.sortBy { case (l, o) => (-o, l) }.head._1))
    }
    val totals = preds.groupBy(_._1).view.mapValues(_.length).toMap
    val expected = preds.groupBy(identity(_)).map { case ((t, p), xs) =>
      (t, p, xs.length.toLong,
        BigDecimal(xs.length.toDouble / totals(t))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = TextAnalysis.langidTrigram(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    got.groupBy(_._1).foreach { case (lang, xs) =>
      assert(math.abs(xs.map(_._4).sum - 1.0) < 1e-4,
        s"$lang shares must sum to 1")
    }
  }

  test("events_funnel_latency: converting populations match funnelSteps " +
    "exactly; gaps bounded by the 3-day window; p50 <= p90") {
    import graft.operators.EventAnalytics
    val counts = EventAnalytics.funnelSteps(spark, sf0001).collect()(0)
    val got = EventAnalytics.funnelLatency(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq ===
      Seq("1_view_click", "2_click_purchase"))
    assert(got(0)._2 === counts.getLong(1),
      "hop-1 conversions must equal the funnel's view->click count")
    assert(got(1)._2 === counts.getLong(2),
      "hop-2 conversions must equal the funnel's full-path count")
    got.foreach { case (_, n, mean, p50, p90) =>
      assert(n > 0 && p50 <= p90 && p90 <= 3L * 86400)
      assert(mean > 0 && mean <= 3.0 * 86400)
    }
  }

  test("events_gini equals a driver-side sorted-scan Gini and agrees " +
    "with the Pareto concentration direction") {
    import graft.operators.EventAnalytics
    val perUser = Tables(spark, sf0001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      .collect().map(_.getLong(1)).sorted
    val n = perUser.length.toLong
    val t = perUser.sum
    val s = perUser.zipWithIndex.map { case (x, i) =>
      (i + 1L) * x }.sum
    val gini = BigDecimal(2.0 * s / (n.toDouble * t.toDouble) -
      (n + 1).toDouble / n).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = EventAnalytics.activityGini(spark, sf0001).collect()(0)
    assert(got.getLong(0) === n && got.getLong(1) === t)
    assert(math.abs(got.getDouble(2) - gini) < 2e-6,
      s"gini ${got.getDouble(2)} vs driver $gini")
    assert(got.getDouble(2) >= 0.0 && got.getDouble(2) < 1.0)
  }

  test("docs_spearman equals a driver-side rank recomputation") {
    import graft.operators.Curation
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .map { case (id, t) =>
        val toks = t.split(" ", -1)
        (id, toks.length.toLong, toks.distinct.length.toLong)
      }.filter(_._2 > 0)
      .map { case (id, n, u) => (id, n, u.toDouble / n) }
    val r1 = docs.sortBy(x => (x._2, x._1)).zipWithIndex
      .map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val r2 = docs.sortBy(x => (x._3, x._1)).zipWithIndex
      .map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val n = docs.length.toLong
    val sumD2 = docs.map { x =>
      val d = r1(x._1) - r2(x._1); d * d }.sum
    val rho = BigDecimal(1.0 - 6.0 * sumD2.toDouble /
      (n.toDouble * (n.toDouble * n.toDouble - 1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Curation.spearmanLengthQuality(spark, sf0001).collect()(0)
    assert(got.getLong(0) === n)
    assert(got.getLong(1) === sumD2)
    assert(got.getDouble(2) === rho)
  }

  test("events_bot_detection: cells partition users, shares sum to 1, " +
    "rules recompute driver-side") {
    import graft.operators.EventAnalytics
    val pu = Tables(spark, sf0001, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("ne"),
        countDistinct(to_date(col("ts"))).as("d"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = pu.groupBy { case (n, ne, d) =>
      (if (n > d * 3) 1L else 0L, if (ne * 3 >= n) 1L else 0L,
        if (n >= 80) 1L else 0L)
    }.map { case (k, xs) => (k._1, k._2, k._3, xs.length.toLong,
      xs.map(_._1).sum) }.toSeq.sortBy(x => (x._1, x._2, x._3))
    val got = EventAnalytics.botDetection(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.map(x => (x._1, x._2, x._3, x._4, x._5)).toSeq === expected)
    assert(got.map(_._4).sum === pu.length.toLong)
    assert(math.abs(got.map(_._6).sum - 1.0) < 1e-4)
    assert(got.length > 1, "rules must be discriminative on the corpus")
  }

  test("text_dedup_lm_effect: full-LM column equals text_lm_heldout's " +
    "NLL exactly; dedup shifts it only where duplicates exist") {
    import graft.operators.TextAnalysis
    val heldout = TextAnalysis.lmHeldout(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    val got = TextAnalysis.dedupLmEffect(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    got.foreach { case (lang, nTok, full, dedup, delta) =>
      val (hn, hnll) = heldout(lang)
      assert(nTok === hn, "same eval tokens as the held-out row")
      assert(full === hnll,
        "the full-train LM must equal the held-out row's LM exactly")
      assert(delta === BigDecimal(dedup - full)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("orders_shipping_aging equals a driver-side aging scan") {
    import graft.operators.Relational
    val rows = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (p, xs) =>
      val gs = xs.map(_._2).sorted
      val n = gs.length.toLong
      def thr(cond: Long => Boolean): Long = {
        var cum = 0L
        gs.groupBy(identity(_)).toSeq.sortBy(_._1)
          .find { case (_, g) => cum += g.length; cond(cum) }.get._1
      }
      (p, n, BigDecimal(gs.sum.toDouble / n)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        thr(c => c >= (n + 1) / 2), thr(c => c * 10 >= n * 9))
    }.toSeq.sortBy(_._1)
    val got = Relational.shippingAging(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("text_bigram_llr: G2 recomputes driver-side from exact counts " +
    "and dominates the same pairs' PMI ranking head") {
    import graft.operators.TextAnalysis
    val bigrams = Tables(spark, sf0001, "documents")
      .select(col("text")).collect().flatMap { r =>
        val t = r.getString(0).split(" ", -1)
        t.zip(t.drop(1))
      }
    val nn = bigrams.length.toLong
    val bc = bigrams.groupBy(identity(_)).view.mapValues(_.length.toLong)
    val fr = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val sc = bigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def llr(w1: String, w2: String, a: Long): Double = {
      val (r1, c1) = (fr(w1), sc(w2))
      def term(k: Long, row: Long, colm: Long): Double =
        if (k > 0) k.toDouble *
          math.log((k.toDouble * nn) / (row.toDouble * colm)) else 0.0
      BigDecimal(2.0 * (term(a, r1, c1) + term(r1 - a, r1, nn - c1) +
        term(c1 - a, nn - r1, c1) +
        term(nn - r1 - c1 + a, nn - r1, nn - c1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = bc.toSeq.filter(_._2 >= 5)
      .map { case ((w1, w2), a) => (w1, w2, a, llr(w1, w2, a)) }
      .sortBy { case (w1, w2, _, l) => (-l, w1, w2) }.take(25)
    val got = TextAnalysis.bigramLlr(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("dedup_asymmetry: pair population equals the shared kernel's and " +
    "band predicates match the ratio definitions") {
    import graft.operators.DedupOps
    val got = DedupOps.asymmetryCensus(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    // total pairs = candidate pairs sharing >= 1 shingle (recompute)
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet))
    val pairs = for {
      i <- docs.indices; j <- (i + 1) until docs.length
      inter = (docs(i)._2 & docs(j)._2).size if inter > 0
    } yield {
      val (n1, n2) = (docs(i)._2.size.toLong, docs(j)._2.size.toLong)
      val in = inter.toLong
      (if (in * 2 >= n1 + n2 - in) 1L else 0L,
        if (in * 5 >= math.min(n1, n2) * 4) 1L else 0L)
    }
    val expCells = pairs.groupBy(identity(_)).view.mapValues(_.size.toLong)
      .toSeq.map { case ((j, c), n) => (j, c, n) }.sortBy(x => (x._1, x._2))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq === expCells)
    got.foreach { case (_, _, _, ratio) =>
      assert(ratio > 0.0 && ratio <= 1.0) }
  }

  test("events_stickiness equals a driver-side weekly rollup and stays " +
    "in (0, 1]") {
    import graft.operators.EventAnalytics
    val ud = Tables(spark, sf0001, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    def wk(d: java.time.LocalDate): java.time.LocalDate =
      d.minusDays((d.getDayOfWeek.getValue - 1).toLong)
    val expected = ud.groupBy(x => wk(x._2)).map { case (w, xs) =>
      val byDay = xs.groupBy(_._2).view.mapValues(_.length.toLong)
      val sumDau = byDay.values.sum
      val nDays = byDay.size.toLong
      val wau = xs.map(_._1).distinct.length.toLong
      (w.toString, nDays, wau,
        BigDecimal(sumDau.toDouble / nDays)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(sumDau.toDouble / (nDays * wau))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.stickiness(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(got === expected)
    got.foreach { case (_, _, _, _, s) => assert(s > 0.0 && s <= 1.0) }
  }

  test("sim_contrastive_pairs: positives beat negatives in every label " +
    "block (positive gap) and counts are bounded by block sizes") {
    import graft.operators.Similarity
    val labelSizes = Tables(spark, sf0001, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Similarity.contrastivePairs(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (l, nPos, avgPos, nNeg, avgNeg, gap) =>
      assert(nPos === labelSizes(l),
        "every vector in a block >= 2 has exactly one top-1 positive")
      assert(nNeg <= labelSizes(l))
      assert(gap === BigDecimal(avgPos - avgNeg)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(gap > 0,
        s"label $l: same-label top-1 must out-similar the hash negative")
    }
  }

  test("sim_mips_augment: the augmented-cosine ranking reproduces the " +
    "exact inner-product top-10 (the reduction holds)") {
    import graft.operators.Similarity
    val got = Similarity.mipsAugment(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length === 3)
    got.foreach { case (_, nAgree, _, ip) =>
      assert(nAgree === 10L, "top-10 sets must agree under the reduction")
      assert(ip > 0.0)
    }
  }

  test("text_stopword_discovery: every fixed-list stopword that clears " +
    "the df gate appears; rows recompute from burstiness moments") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.stopwordDiscovery(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    val nDocs = Tables(spark, sf0001, "documents").count()
    got.foreach { case (_, df, share, _, vmr) =>
      assert(df * 2 >= nDocs)
      assert(share === BigDecimal(df.toDouble / nDocs)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(vmr > 0)
    }
    // cross-signal sanity: corpus glue from the fixed list must surface
    val discovered = got.map(_._1).toSet
    assert(discovered.exists(t =>
      graft.functions.TextFunctions.stopwords.contains(t)),
      s"no fixed-list stopword discovered; got ${discovered.take(5)}")
  }

  test("events_reach_curve: per-type curves are monotone, end at " +
    "reach_share 1.0, and the final cum equals the type's adopters") {
    import graft.operators.EventAnalytics
    val adopters = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = EventAnalytics.reachCurve(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    got.groupBy(_._1).foreach { case (t, xs) =>
      val s = xs.sortBy(_._2)
      assert(s.map(_._4).toSeq === s.map(_._4).sorted,
        "cumulative adopters must be monotone")
      assert(s.map(_._3).sum === s.last._4,
        "new-adopter increments must telescope to the final cum")
      assert(s.last._4 === adopters(t))
      assert(math.abs(s.last._5 - 1.0) < 1e-9)
    }
  }

  test("graph_assortativity equals a driver-side Pearson over the " +
    "shared edge set") {
    import graft.operators.{Graph, Similarity}
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("label"), col("v1"), col("v2")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val und = edges.flatMap { case (l, a, b) => Seq((l, a, b), (l, b, a)) }
      .distinct
    val deg = und.groupBy(x => (x._1, x._2)).view
      .mapValues(_.length.toLong).toMap
    val expected = und.groupBy(_._1).map { case (l, es) =>
      val pairs = es.map(e => (deg((l, e._2)), deg((l, e._3))))
      val n = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val (sxx, syy) = (pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum)
      val r = (n.toDouble * sxy - sx.toDouble * sy) /
        (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
          math.sqrt(n.toDouble * syy - sy.toDouble * sy))
      (l, n, BigDecimal(r).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Graph.assortativity(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    got.foreach { case (_, _, a) => assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9) }
  }

  test("orders_repeat_latency equals a driver-side recomputation") {
    import graft.operators.Relational
    val orders = Tables(spark, sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate, r.getLong(2)))
    val dOrd = Ordering.fromLessThan[java.time.LocalDate](_ isBefore _)
    val perCust = orders.groupBy(_._1).toSeq.map { case (_, xs) =>
      val two = xs.sortBy(x => (x._2, x._3))(Ordering.Tuple2(dOrd,
        implicitly[Ordering[Long]])).take(2)
      (two.length,
        two.last._2.toEpochDay - two.head._2.toEpochDay)
    }
    val nCust = perCust.length.toLong
    val repeats = perCust.filter(_._1 == 2).map(_._2)
    val nRep = repeats.length.toLong
    val gs = repeats.sorted
    def thr(cond: Long => Boolean): Long = {
      var cum = 0L
      gs.groupBy(identity(_)).toSeq.sortBy(_._1)
        .find { case (_, g) => cum += g.length; cond(cum) }.get._1
    }
    val got = Relational.repeatLatency(spark, sf0001).collect()(0)
    assert(got.getLong(0) === nCust && got.getLong(1) === nRep)
    assert(got.getDouble(2) === BigDecimal(nRep.toDouble / nCust)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getDouble(3) === BigDecimal(gs.sum.toDouble / nRep)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getLong(4) === thr(c => c >= (nRep + 1) / 2))
    assert(got.getLong(5) === thr(c => c * 10 >= nRep * 9))
  }

  test("sim_hnsw_levels: geometric level draw recomputes driver-side; " +
    "layer sizes telescope") {
    import graft.operators.Similarity
    val ids = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id")).collect().map(_.getLong(0))
    def lvl(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hnsw:$id".getBytes("UTF-8"))
      val b = md(0) & 0xff
      if (b == 0) 8L else java.lang.Integer.numberOfTrailingZeros(b).toLong
    }
    val expected = ids.map(lvl).groupBy(identity(_)).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = Similarity.hnswLevels(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.map(x => (x._1, x._2)).toSeq === expected)
    // layer_size at level l = sum of node counts at levels >= l
    got.foreach { case (l, _, _, _, ls) =>
      assert(ls === got.filter(_._1 >= l).map(_._2).sum)
    }
    assert(got.map(_._2).sum === ids.length.toLong)
  }

  test("dedup_shingle_sweep: k=5 row agrees with the production pair " +
    "kernel; candidates shrink as k grows") {
    import graft.operators.DedupOps
    val got = DedupOps.shingleSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(3L, 5L, 7L))
    val byK = got.map(x => x._1 -> x).toMap
    assert(byK(3L)._2 >= byK(5L)._2 && byK(5L)._2 >= byK(7L)._2,
      "longer shingles can only reduce the candidate-pair count")
    // k=5 pair population must equal the production jaccard kernel's
    // threshold-0 pair count (recomputed via the kernel with tiny cut)
    val prod = DedupOps.ngramJaccardPairs(spark, sf0001, threshold = 0.0)
      .count()
    assert(byK(5L)._2 === prod)
  }

  test("events_type_overlap equals a driver-side set-overlap scan") {
    import graft.operators.EventAnalytics
    val ut = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
      inter = (byType(types(i)) & byType(types(j))).size if inter > 0
    } yield (types(i), types(j), inter.toLong,
      BigDecimal(inter.toDouble /
        (byType(types(i)).size + byType(types(j)).size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSeq
    val got = EventAnalytics.typeOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("sim_jl_projection: pair accounting exact; the projection " +
    "roughly preserves distances (mean ratio near 1)") {
    import graft.operators.Similarity
    val n = Tables(spark, sf0001, "embeddings").count()
    val expPairs = (0L until n).count(v => (v * 7 + 13) % n != v).toLong
    val r = Similarity.jlProjection(spark, sf0001).collect()(0)
    assert(r.getLong(0) === expPairs)
    val (mean, mn, mx, share) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    assert(mn > 0 && mn <= mean && mean <= mx)
    assert(mean > 0.5 && mean < 1.6,
      s"JL mean distortion $mean should concentrate near 1")
    assert(share > 0.0 && share <= 1.0)
  }

  test("events_heatmap: cells cover all events, shares sum to 1, " +
    "coordinates in range") {
    import graft.operators.EventAnalytics
    val total = Tables(spark, sf0001, "events").count()
    val got = EventAnalytics.heatmap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._3).sum === total)
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-3)
    got.foreach { case (dow, hr, n2, _) =>
      assert(dow >= 1 && dow <= 7 && hr >= 0 && hr <= 23 && n2 > 0)
    }
    assert(got.length <= 168)
  }

  test("text_extractive_pick equals a driver-side idf argmax") {
    import graft.operators.TextAnalysis
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val nDocs = docs.length.toLong
    val df = docs.flatMap { case (_, ws) => ws.distinct }
      .groupBy(identity(_)).view.mapValues(_.size.toLong).toMap
    val expected = docs.filter(_._1 < 20).map { case (id, ws) =>
      val chunks = ws.zipWithIndex.groupBy(_._2 / 15).toSeq
        .map { case (pidx, xs) =>
          val idfs = xs.map { case (w, _) =>
            BigDecimal(math.log(nDocs.toDouble / df(w)))
              .setScale(12, BigDecimal.RoundingMode.HALF_UP) }
          (pidx.toLong, xs.length.toLong,
            idfs.sum.toDouble / xs.length)
        }
      val best = chunks.sortBy { case (p, _, raw) => (-raw, p) }.head
      (id, best._1, best._2,
        BigDecimal(best._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.extractivePick(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
  }

  test("docs_gate_overlap is consistent with the curation pipeline: " +
    "population matches and first-gate attribution is a projection") {
    import graft.operators.TextAnalysis
    val overlap = TextAnalysis.gateOverlap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val pipe = TextAnalysis.curationPipeline(spark, sf0001).collect()
    val nTrain = pipe.map(_.getLong(1)).sum
    assert(overlap.map(_._5).sum === nTrain,
      "cells must partition the train population")
    // quality attributions equal quality-flag marginal (quality is the
    // FIRST gate, so attribution == the independent flag)
    val qMarginal = overlap.filter(_._1 == 1L).map(_._5).sum
    assert(qMarginal === pipe.map(_.getLong(2)).sum)
    // and the pipeline's kept docs can never exceed the all-clear cell
    val clear = overlap.find(x =>
      x._1 == 0 && x._2 == 0 && x._3 == 0 && x._4 == 0).map(_._5)
      .getOrElse(0L)
    assert(pipe.map(_.getLong(6)).sum <= clear)
  }

  test("events_new_returning: day-1 is all-new, totals reconcile, and " +
    "each user contributes new exactly once per day-0") {
    import graft.operators.EventAnalytics
    val total = Tables(spark, sf0001, "events").count()
    val got = EventAnalytics.newVsReturning(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.map(x => x._2 + x._3).sum === total)
    assert(got.head._3 === 0L, "the first day has no returners")
    // sum of new events = events that happened on each user's first day
    val firstDayEvents = {
      val ev = Tables(spark, sf0001, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val fd = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
      ev.join(fd, "user_id").filter(col("d") === col("d0")).count()
    }
    assert(got.map(_._2).sum === firstDayEvents)
  }

  test("join_asof_tolerance: outcomes partition purchases and agree " +
    "with the unbounded as-of within the window") {
    import graft.operators.EventAnalytics
    val nPurch = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "purchase").count()
    val got = EventAnalytics.asofTolerance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(got.map(_._2).sum === nPurch)
    got.foreach {
      case ("none", _, g) => assert(g.isEmpty)
      case (_, n, g) =>
        assert(n > 0 && g.exists(v => v >= 0 && v <= 1800.0))
    }
    // the unbounded nearest row, restricted to gaps <= tol, must agree
    // on the matched-purchase count
    val unbounded = EventAnalytics.asofNearest(spark, sf0001).collect()
      .count { r =>
        !r.isNullAt(5) && r.getLong(5) <= 1800L * 1000000L
      }.toLong
    assert(got.filter(_._1 != "none").map(_._2).sum === unbounded,
      "tolerance filter must equal the unbounded row's within-window set")
  }

  test("stream_sessionize_stateful equals the batch sessionize census " +
    "and adds a consistent per-user max") {
    import graft.operators.{EventAnalytics, StreamingAnalytics}
    val streamed = StreamingAnalytics
      .streamSessionizeStateful(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = EventAnalytics.sessionize(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.length === b.size)
    streamed.foreach { case (u, ns, ne, mx) =>
      val (bs, be) = b(u)
      assert(ns === bs && ne === be,
        s"user $u: stateful stream must equal the batch formulation")
      assert(mx >= (ne + ns - 1) / ns && mx <= ne,
        "max session length bounded by mean-ceiling and total")
    }
  }

  test("window_ntile: quartiles balance over the 25-nation league " +
    "table and order by revenue") {
    import graft.operators.Relational
    val got = Relational.windowNtile(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.length === 25)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes === Map(1L -> 7, 2L -> 6, 3L -> 6, 4L -> 6))
    // revenue never increases across quartile boundaries
    val byQ = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    (1L to 3L).foreach { q =>
      assert(byQ(q).min >= byQ(q + 1).max - 1e-9)
    }
  }

  test("agg_bitwise equals a driver-side fold") {
    import graft.operators.Relational
    val rows = Tables(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_linenumber")).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
    val expected = rows.groupBy(_._1).map { case (f, xs) =>
      val vs = xs.map(_._2)
      (f, vs.length.toLong, vs.reduce(_ & _), vs.reduce(_ | _),
        vs.reduce(_ ^ _),
        vs.map(v => java.lang.Long.bitCount(v).toLong).sum)
    }.toSeq.sortBy(_._1)
    val got = Relational.aggBitwise(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("dedup_threshold_impact: monotone in threshold and consistent " +
    "with the production jaccard pairs at 0.5") {
    import graft.operators.DedupOps
    val got = DedupOps.thresholdImpact(spark, sf0001).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(0.3, 0.5, 0.7))
    // higher threshold can only drop fewer docs / less mass
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.reverse)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.reverse)
    // 0.5 row equals the production pair relation's distinct d2 count
    val prod = DedupOps.ngramJaccardPairs(spark, sf0001, threshold = 0.5)
      .select(col("d2")).distinct().count()
    assert(got.find(_._1 == 0.5).get._2 === prod)
  }

  test("orders_qoq_growth equals a driver-side quarterly scan") {
    import graft.operators.Relational
    val rows = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderdate"),
        col("o_totalprice")).collect()
      .map(r => (r.getString(0),
        r.getAs[java.time.LocalDateTime](1).toLocalDate,
        math.round(r.getDouble(2) * 100)))
    def qtr(d: java.time.LocalDate): java.time.LocalDate =
      java.time.LocalDate.of(d.getYear, ((d.getMonthValue - 1) / 3) * 3 + 1, 1)
    val expected = rows.groupBy(x => (x._1, qtr(x._2))).view
      .mapValues(_.map(_._3).sum).toSeq
      .sortBy { case ((seg, q), _) => (seg, q.toString) }
      .groupBy(_._1._1).toSeq.flatMap { case (_, xs) =>
        xs.zip(None +: xs.map(x => Some(x._2)).dropRight(1)).map {
          case (((seg, q), rev), prev) =>
            (seg, q.toString,
              BigDecimal(rev.toDouble / 100).setScale(2,
                BigDecimal.RoundingMode.HALF_UP).toDouble,
              prev.map(p => BigDecimal((rev.toDouble - p.toDouble) / p)
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }.sortBy(x => (x._1, x._2))
    val got = Relational.qoqGrowth(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got === expected)
  }

  test("sim_cluster_validity: margin identity holds and cohesion beats " +
    "confusion on the labeled corpus") {
    import graft.operators.Similarity
    val sizes = Tables(spark, sf0001, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = Similarity.clusterValidity(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.length === sizes.size)
    got.foreach { case (l, n, own, other, margin, confused) =>
      assert(n === sizes(l))
      assert(margin === BigDecimal(own - other)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // NOTE: no own > other assertion — best_other is a MAX over 9
      // foreign centroids, and on this weakly-clustered corpus it can
      // exceed the single own-centroid cosine. That near-zero (or
      // negative) margin IS the measurement the row exists to surface.
      assert(own >= -1.0 && own <= 1.0 && other >= -1.0 && other <= 1.0)
      assert(confused >= 0.0 && confused <= 1.0)
    }
  }

  test("events_session_value: session population equals sessionize and " +
    "total cents reconcile with the corpus") {
    import graft.operators.EventAnalytics
    val sessTotal = EventAnalytics.sessionize(spark, sf0001).collect()
      .map(_.getLong(1)).sum
    val r = EventAnalytics.sessionValue(spark, sf0001).collect()(0)
    assert(r.getLong(0) === sessTotal)
    val totalCents = Tables(spark, sf0001, "events")
      .select(sum(round(col("value") * 100).cast("long"))).collect()(0)
      .getLong(0)
    assert(r.getDouble(1) === BigDecimal(
      totalCents.toDouble / (sessTotal * 100))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getLong(2) <= r.getLong(3))
  }

  test("events_value_dist equals a driver-side cents-histogram cut") {
    import graft.operators.EventAnalytics
    val rows = Tables(spark, sf0001, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
    val expected = rows.groupBy(_._1).map { case (t, xs) =>
      val gs = xs.map(_._2).sorted
      val n = gs.length.toLong
      def thr(cond: Long => Boolean): Long = {
        var cum = 0L
        gs.groupBy(identity(_)).toSeq.sortBy(_._1)
          .find { case (_, g) => cum += g.length; cond(cum) }.get._1
      }
      def d2(c: Long) = BigDecimal(c.toDouble / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, n, BigDecimal(gs.sum.toDouble / (n * 100))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        d2(thr(c => c >= (n + 1) / 2)), d2(thr(c => c * 10 >= n * 9)),
        d2(thr(c => c * 100 >= n * 99)))
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.valueDist(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expected)
  }

  test("dq_freshness: the freshest table lags zero hours and lags are " +
    "exact truncated-hour arithmetic") {
    import graft.operators.Quality
    val got = Quality.dqFreshness(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq("events", "orders"))
    assert(got.exists(_._3 == 0L), "one table is the freshest")
    got.foreach { case (_, _, lag) => assert(lag >= 0L) }
  }

  test("events_conversion_by_activity: bands partition users and rates " +
    "recompute exactly") {
    import graft.operators.EventAnalytics
    val pu = Tables(spark, sf0001, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    def band(n: Long): String =
      if (n < 8) "a_lt8" else if (n < 16) "b_8_15"
      else if (n < 32) "c_16_31" else if (n < 64) "d_32_63"
      else "e_64plus"
    val expected = pu.groupBy(x => band(x._1)).map { case (b, xs) =>
      (b, xs.length.toLong, xs.map(_._2).sum,
        BigDecimal(xs.map(_._2).sum.toDouble / xs.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = EventAnalytics.conversionByActivity(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === pu.length.toLong)
  }

  test("orders_basket_profile: cells partition the joined orders and " +
    "means recompute") {
    import graft.operators.Relational
    val po = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("nl"),
        max(round(col("o_totalprice") * 100).cast("long")).as("pc"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val expected = po.groupBy(x => (x._1, x._2 / 5000000)).map {
      case ((nl, vb), xs) =>
        (nl, vb, xs.length.toLong,
          BigDecimal(xs.map(x => BigInt(x._2)).sum.toDouble /
            (xs.length * 100))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = Relational.basketProfile(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === expected)
    assert(got.map(_._3).sum === po.length.toLong)
  }

  test("events_attribution_touch: both models distribute exactly one " +
    "credit per purchase and recompute driver-side") {
    import graft.operators.EventAnalytics
    val ev = Tables(spark, sf0001, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).getTime, r.getLong(2),
        r.getString(3)))
    val tsOrd = implicitly[Ordering[(Long, Long)]]
    val credits = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3))(tsOrd)
      s.zipWithIndex.filter(_._1._4 == "purchase").map { case (_, i) =>
        val before = s.take(i).map(_._4).filter(_ != "purchase")
        (before.headOption.getOrElse("none"),
          before.lastOption.getOrElse("none"))
      }
    }
    val nPurch = credits.length.toLong
    val expF = credits.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expL = credits.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics.attributionTouch(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sum === nPurch)
    assert(got.map(_._3).sum === nPurch)
    got.foreach { case (ch, fc, lc) =>
      assert(fc === expF.getOrElse(ch, 0L), s"first-touch $ch")
      assert(lc === expL.getOrElse(ch, 0L), s"last-touch $ch")
    }
  }

  test("events_wow_growth: first week per type has null growth; " +
    "growth recomputes from counts") {
    import graft.operators.EventAnalytics
    val got = EventAnalytics.wowGrowth(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    got.groupBy(_._1).values.foreach { xs =>
      val s = xs.sortBy(_._2)
      assert(s.head._4.isEmpty)
      s.zip(s.drop(1)).foreach { case (a, b) =>
        assert(b._4.contains(BigDecimal(
          (b._3 - a._3).toDouble / a._3)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
  }

  test("text_ttr_curve: bands partition docs and TTR falls with length") {
    import graft.operators.TextAnalysis
    val nDocs = Tables(spark, sf0001, "documents")
      .filter(size(split(col("text"), " ")) > 0).count()
    val got = TextAnalysis.ttrCurve(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.map(_._2).sum === nDocs)
    // the control curve: mean TTR is non-increasing as bands lengthen
    val s = got.sortBy(_._1)
    s.zip(s.drop(1)).foreach { case (a, b) =>
      assert(b._4 <= a._4 + 1e-9,
        s"TTR must fall with length: ${a._1} ${a._4} -> ${b._1} ${b._4}")
    }
  }
}
