package graft

import org.apache.spark.sql.functions._
import graft.operators.StreamingAnalytics

/** Round-14 wave-4: independent scalar replay of the frozen-unigram
  * streaming encoder — the round-1 trainer (seed vocab, exact-decimal
  * Viterbi, usage re-estimation) and the frozen apply over both
  * staged increments are re-derived in plain Scala/BigDecimal and
  * compared to all 15 census rows, including the fold identity and
  * OOV accounting. */
class Round14Wave4Spec extends SparkSpec {

  private val MaxLen = 10
  private val MaxPiece = 4
  private val V0 = 300
  private val VKeep = 200

  private def q12(d: Double): BigDecimal =
    BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
  private def r6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Viterbi over one word against a piece-cost table: returns
    * (nll, n_pieces) or None when no path (OOV). */
  private def viterbi(w: String,
      cost: Map[String, BigDecimal]): Option[(BigDecimal, Long)] = {
    val n = w.length
    val dp = Array.fill[Option[(BigDecimal, Int)]](n + 1)(None)
    dp(0) = Some((BigDecimal(0), -1))
    for (i <- 1 to n) {
      var best: Option[(BigDecimal, Int)] = None
      for (j <- math.max(0, i - MaxPiece) until i) {
        (dp(j), cost.get(w.substring(j, i))) match {
          case (Some((dj, _)), Some(c)) =>
            val d = dj + c
            if (best.isEmpty || d < best.get._1 ||
              (d == best.get._1 && j < best.get._2)) best = Some((d, j))
          case _ =>
        }
      }
      dp(i) = best
    }
    dp(n).map { case (d, _) =>
      var pieces = 0L
      var pos = n
      while (pos > 0) { pieces += 1; pos = dp(pos).get._2 }
      (d, pieces)
    }
  }

  test("stream_unigram_encode matches a scalar train+freeze+encode " +
    "replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def wordsOf(t: String): Seq[String] =
      t.split(" ", -1).map(_.toLowerCase)
        .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z')
          && w.length <= MaxLen).toSeq

    // ---- trainer round 1 on the doc_id-even half
    val trainF = docs.filter(_._1 % 2 == 0).flatMap(d => wordsOf(d._3))
      .groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
    def spansOf(w: String): Seq[String] =
      for (st <- 1 to w.length; pl <- 1 to MaxPiece
           if st + pl - 1 <= w.length)
        yield w.substring(st - 1, st + pl - 1)
    val c0 = collection.mutable.Map[String, Long]()
    for ((w, f) <- trainF; p <- spansOf(w))
      c0(p) = c0.getOrElse(p, 0L) + f
    val top0 = c0.toSeq.sortBy { case (p, c) => (-c, p) }.take(V0)
    val vocab0 = (top0 ++ c0.filter(_._1.length == 1))
      .groupBy(_._1).map { case (p, v) => (p, v.map(_._2).max) }
    val t0 = vocab0.values.sum
    val cost0 = vocab0.map { case (p, c) =>
      (p, q12(-math.log(c.toDouble / t0.toDouble))) }
    val usage = collection.mutable.Map[String, Long]()
    for ((w, f) <- trainF; (_, np) <- viterbi(w, cost0)) {
      // walk again to collect pieces (viterbi returns count only)
      var pos = w.length
      val dp = Array.fill[Option[(BigDecimal, Int)]](w.length + 1)(None)
      dp(0) = Some((BigDecimal(0), -1))
      for (i <- 1 to w.length) {
        var best: Option[(BigDecimal, Int)] = None
        for (j <- math.max(0, i - MaxPiece) until i) {
          (dp(j), cost0.get(w.substring(j, i))) match {
            case (Some((dj, _)), Some(c)) =>
              val d = dj + c
              if (best.isEmpty || d < best.get._1 ||
                (d == best.get._1 && j < best.get._2))
                best = Some((d, j))
            case _ =>
          }
        }
        dp(i) = best
      }
      while (pos > 0) {
        val j = dp(pos).get._2
        val p = w.substring(j, pos)
        usage(p) = usage.getOrElse(p, 0L) + f
        pos = j
      }
      assert(np > 0)
    }
    val top1 = usage.toSeq.sortBy { case (p, u) => (-u, p) }.take(VKeep)
    val vocab1 = (top1 ++ vocab0.keys.filter(_.length == 1)
        .map(p => (p, usage.getOrElse(p, 0L))))
      .groupBy(_._1).map { case (p, v) => (p, v.map(_._2).max) }
    val t1 = vocab1.values.map(_ + 1).sum
    val cost1 = vocab1.map { case (p, u) =>
      (p, q12(-math.log((u + 1).toDouble / t1.toDouble))) }

    // ---- frozen apply per increment
    def census(pred: Long => Boolean)
        : Map[String, (Long, Long, Long, BigDecimal)] = {
      val lw = docs.filter(d => pred(d._1))
        .flatMap(d => wordsOf(d._3).map(w => (d._2, w)))
        .groupBy(identity)
        .map { case ((lang, w), v) => ((lang, w), v.size.toLong) }
      lw.groupBy(_._1._1).map { case (lang, m) =>
        var tw = 0L; var oov = 0L; var tp = 0L
        var nll = BigDecimal(0)
        for (((_, w), occ) <- m) {
          tw += occ
          viterbi(w, cost1) match {
            case Some((d, np)) => tp += occ * np; nll += d * occ
            case None => oov += occ
          }
        }
        (lang, (tw, oov, tp, nll))
      }
    }
    val c1 = census(_ % 4 == 1)
    val c2 = census(_ % 4 == 3)
    val langs = (c1.keySet ++ c2.keySet).toSeq.sorted
    val fold = langs.map { l =>
      val a = c1.getOrElse(l, (0L, 0L, 0L, BigDecimal(0)))
      val b = c2.getOrElse(l, (0L, 0L, 0L, BigDecimal(0)))
      (l, (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    }.toMap

    val got = StreamingAnalytics.streamUnigramEncode(spark, sf0001)
      .collect()
    assert(got.nonEmpty)
    val expect: Map[(Long, String), (Long, Long, Long, BigDecimal)] =
      c1.map { case (l, v) => ((1L, l), v) } ++
        c2.map { case (l, v) => ((2L, l), v) } ++
        fold.map { case (l, v) => ((0L, l), v) }
    assert(got.length === expect.size,
      s"row count ${got.length} vs ${expect.size}")
    got.foreach { r =>
      val key = (r.getLong(0), r.getString(1))
      val (tw, oov, tp, nll) = expect(key)
      assert(r.getLong(2) === tw, s"total_words of $key")
      assert(r.getLong(3) === oov, s"oov_words of $key")
      assert(r.getLong(4) === tp, s"total_pieces of $key")
      if (tw > oov) {
        assert(math.abs(r.getDouble(5) -
          r6(tp.toDouble / (tw - oov))) < 1e-9, s"ppw of $key")
        assert(math.abs(r.getDouble(6) -
          r6(nll.toDouble / (tw - oov).toDouble)) < 1e-9,
          s"nll_per_word of $key")
      } else {
        assert(r.isNullAt(5) && r.isNullAt(6),
          s"all-OOV row $key must carry NULL ratios")
      }
    }
  }
}
