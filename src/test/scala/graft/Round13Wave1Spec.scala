package graft

import org.apache.spark.sql.functions._
import graft.operators.{StreamingAnalytics, TextAnalysis}

/** Round-13 wave-1: the unigram-LM tokenizer trainer (scalar hard-EM
  * Viterbi replay on sf0.001 — the text_bpe_merges discipline), the
  * retrieval nDCG evaluation's structural invariants, and the
  * incremental IVF append census's conservation laws. */
class Round13Wave1Spec extends SparkSpec {

  test("text_unigram_tokenizer matches a scalar hard-EM Viterbi replay") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    val maxLen = 10; val maxPiece = 4; val v0 = 300; val vKeep = 200
    val words: Map[String, Long] = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.split(" ", -1)).map(_.toLowerCase)
      .filter(w => w.nonEmpty && w.length <= maxLen &&
        w.forall(c => c >= 'a' && c <= 'z'))
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val c0 = collection.mutable.Map[String, Long]()
    for ((w, f) <- words; st <- 0 until w.length;
         pl <- 1 to maxPiece if st + pl <= w.length) {
      val p = w.substring(st, st + pl)
      c0(p) = c0.getOrElse(p, 0L) + f
    }
    val vocab0: Map[String, Long] =
      (c0.toSeq.sortBy { case (p, c) => (-c, p) }.take(v0) ++
        c0.toSeq.filter(_._1.length == 1)).toMap
    def costs(counts: Map[String, Long], smooth: Long)
        : Map[String, BigDecimal] = {
      val t = counts.values.map(_ + smooth).sum
      counts.map { case (p, c) => p ->
        BigDecimal(-math.log((c + smooth).toDouble / t.toDouble))
          .setScale(12, HALF_UP) }
    }
    // (usage, weighted nll, weighted piece count)
    def viterbi(cost: Map[String, BigDecimal])
        : (Map[String, Long], BigDecimal, Long) = {
      val usage = collection.mutable.Map[String, Long]()
      var nll = BigDecimal(0); var nPieces = 0L
      for ((w, f) <- words) {
        val L = w.length
        val dp = Array.fill(L + 1)(BigDecimal(0))
        val bp = Array.fill(L + 1)(-1)
        for (i <- 1 to L) {
          var bd: BigDecimal = null; var bj = -1
          for (j <- math.max(0, i - maxPiece) until i)
            cost.get(w.substring(j, i)).foreach { c =>
              val cand = dp(j) + c
              if (bd == null || cand < bd) { bd = cand; bj = j }
              // engine tie-break: smaller start j wins; iteration is
              // ascending j, so strict < already keeps the smaller j
            }
          dp(i) = bd; bp(i) = bj
        }
        nll += dp(L) * f
        var pos = L
        while (pos > 0) {
          val j = bp(pos)
          val p = w.substring(j, pos)
          usage(p) = usage.getOrElse(p, 0L) + f
          nPieces += f
          pos = j
        }
      }
      (usage.toMap, nll, nPieces)
    }
    val (u1, nll1, np1) = viterbi(costs(vocab0, 0L))
    val vocab1: Map[String, Long] =
      (u1.toSeq.sortBy { case (p, u) => (-u, p) }.take(vKeep) ++
        vocab0.keys.filter(_.length == 1)
          .map(p => p -> u1.getOrElse(p, 0L))).toMap
    val (u2, nll2, np2) = viterbi(costs(vocab1, 1L))
    val nTok = words.values.sum
    val topOf = (u: Map[String, Long]) =>
      u.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.head
    val got = TextAnalysis.unigramTokenizer(spark, sf0001).collect()
    assert(got.length === 2)
    val expect = Seq(
      (1L, vocab0.size.toLong, nll1, np1, topOf(u1)),
      (2L, vocab1.size.toLong, nll2, np2, topOf(u2)))
    got.zip(expect).foreach { case (r, (rd, vs, nll, np, (tp, tc))) =>
      assert(r.getLong(0) === rd)
      assert(r.getLong(1) === vs, s"vocab_size round $rd")
      assert(r.getLong(2) === words.size.toLong, "n_word_types")
      assert(r.getLong(3) === nTok, "n_tokens")
      assert(r.getLong(4) === np, s"n_pieces round $rd")
      assert(math.abs(r.getDouble(5) - np.toDouble / nTok) < 1e-6)
      assert(math.abs(r.getDouble(6) - (nll / nTok).toDouble) < 1e-6,
        s"nll_per_token round $rd")
      assert(r.getString(7) === tp, s"top_piece round $rd")
      assert(r.getLong(8) === tc, s"top_piece_count round $rd")
    }
    // the prune must shrink the vocabulary and not worsen likelihood
    assert(vocab1.size < vocab0.size)
    assert(nll2 <= nll1)
  }

  test("text_retrieval_ndcg: 3 arms, nDCG in [0,1], MRR consistent " +
    "with relevant hits") {
    val rows = TextAnalysis.retrievalNdcg(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("a_lexical", "b_semantic_lsh", "c_hybrid_rrf"))
    rows.foreach { r =>
      assert(r.getLong(1) <= 10, "n_listed <= k")
      assert(r.getLong(2) <= r.getLong(1), "relevant <= listed")
      val ndcg = r.getDouble(5)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg10=$ndcg")
      val mrr = r.getDouble(3)
      if (r.getLong(2) == 0) assert(mrr === 0.0)
      else assert(mrr > 0.0 && mrr <= 1.0)
    }
    // the exact-cosine re-ranked LSH arm must dominate the lexical arm
    // on a semantic truth — if it ever stops, the arms are mislabeled
    val byArm = rows.map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(byArm("b_semantic_lsh") >= byArm("a_lexical"))
  }

  test("stream_ivf_append: census conservation — cells partition the " +
    "corpus, appends are exactly the staged increments") {
    val rows = StreamingAnalytics.streamIvfAppend(spark, sf0001).collect()
    val e = Tables(spark, sf0001, "embeddings")
    val nAll = e.count()
    val nApp = e.filter(col("vec_id") % 4 === 3).count()
    assert(rows.map(_.getLong(4)).sum === nAll, "every vector indexed")
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum === nApp,
      "appended = the two staged increments, exactly once (replay-skip)")
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) === r.getLong(4),
        "seed + inc1 + inc2 = total per cell")
    }
  }
}
