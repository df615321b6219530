package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-6 wave 2 (repetition filter, sequence packing, source overlap):
  * each operator's full result is recomputed here from raw driver-side
  * Scala over the sf0.001 corpus and compared exactly — an independent
  * second implementation, not just an invariant check. (500 docs at
  * sf0.001 make the naive recomputation cheap; the operator itself never
  * collects.) */
class Round6Wave2Spec extends SparkSpec {

  private def corpus: Array[(Long, String, String)] =
    Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def grams(toks: Array[String], k: Int): Seq[String] =
    if (toks.length < k) Seq.empty
    else toks.sliding(k).map(_.mkString(" ")).toSeq

  test("text_repetition equals a driver-side recomputation") {
    val expect = corpus
      .map { case (_, src, text) =>
        val toks = text.split(" ", -1)
        val maxBg = grams(toks, 2).groupBy(identity)
          .map(_._2.size).foldLeft(0)(math.max)
        val triCnt = grams(toks, 3).groupBy(identity).map(_._2.size).toSeq
        val nTri = triCnt.sum
        val dupTri = triCnt.filter(_ > 1).sum
        (src, toks.length.toLong, maxBg.toLong, nTri.toLong, dupTri.toLong)
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, ds) =>
        val flag2 = ds.count(d => d._3 * 10 > d._2)
        val flag3 = ds.count(d => d._5 * 10 > d._4 * 3)
        val top2 = BigDecimal(ds.map(_._3).sum.toDouble * 2 /
          ds.map(_._2).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val dup3 = BigDecimal(ds.map(_._5).sum.toDouble /
          ds.map(_._4).sum.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (src, ds.size.toLong, flag2.toLong, flag3.toLong, top2, dup3)
      }
    val got = TextAnalysis.repetitionFilter(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect, s"got ${got.take(3)}… expected ${expect.take(3)}…")
  }

  test("pack_sequences equals a driver-side next-window packing") {
    val perWin = corpus
      .map { case (id, src, text) => (src, id, text.split(" ", -1).length.toLong) }
      .groupBy(_._1).toSeq
      .flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._2).map { case (_, _, n) =>
          val win = cum / 256 // cum == (cum+n) - n, the window of the first token
          cum += n
          ((src, win), n)
        }
      }
      .groupBy(_._1).toSeq
      .map { case (_, xs) => (xs.size.toLong, xs.map(_._2).sum) }
    val expect = perWin.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, ws) => (d, ws.size.toLong, ws.map(_._2).sum) }
    val got = TextAnalysis.packSequences(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got $got expected $expect")
    // the histogram must census the whole corpus
    assert(got.map(r => r._1 * r._2).sum == corpus.length)
  }

  test("text_decontaminate equals a driver-side 13-gram overlap scan") {
    // independent split re-derivation: same md5-first-byte rule, raw JDK
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"doc:$id".getBytes("UTF-8"))
      val b = h(0) & 0xff
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = corpus
    def g13(text: String): Set[String] =
      grams(text.split(" ", -1), 13).toSet
    val bench = docs.filter(d => split(d._1) == "test")
      .flatMap(d => g13(d._3)).toSet
    val train = docs.filter(d => split(d._1) == "train").toSeq
    val expect = train
      .map(d => (d._2, if (g13(d._3).exists(bench.contains)) 1L else 0L))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, xs) => (src, xs.size.toLong, xs.map(_._2).sum) }
    val got = TextAnalysis.decontaminate(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.map(_._3).sum > 0, "the corpus plants cross-split near-dups")
  }

  test("docs_curation_pipeline equals a driver-side gate-by-gate replay") {
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"doc:$id".getBytes("UTF-8"))
      val b = h(0) & 0xff
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val stop = graft.functions.TextFunctions.stopwords.toSet
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = corpus
    val bench = docs.filter(d => split(d._1) == "test")
      .flatMap(d => grams(d._3.split(" ", -1), 13)).toSet
    case class F(id: Long, src: String, fp: String, nTok: Long,
      qFail: Boolean, repFail: Boolean, contam: Boolean)
    val flags = docs.filter(d => split(d._1) == "train").map { case (id, src, text) =>
      val toks = text.split(" ", -1)
      val nTok = toks.length.toLong
      val nStop = toks.count(stop.contains).toLong
      val nUniq = toks.distinct.length.toLong
      val maxBg = grams(toks, 2).groupBy(identity)
        .map(_._2.size).foldLeft(0)(math.max).toLong
      val triCnt = grams(toks, 3).groupBy(identity).map(_._2.size).toSeq
      val nTri = triCnt.sum.toLong
      val dupTri = triCnt.filter(_ > 1).sum.toLong
      F(id, src, md5hex(text), nTok,
        qFail = nTok < 10 || nStop * 2 > nTok || nUniq * 10 < nTok * 3,
        repFail = maxBg * 10 > nTok || dupTri * 10 > nTri * 3,
        contam = grams(toks, 13).exists(bench.contains))
    }
    val keeper = flags.filter(f => !f.qFail && !f.repFail)
      .groupBy(_.fp).map { case (fp, fs) => fp -> fs.map(_.id).min }
    def stage(f: F): String =
      if (f.qFail) "drop_quality"
      else if (f.repFail) "drop_repetition"
      else if (f.id != keeper(f.fp)) "drop_duplicate"
      else if (f.contam) "drop_contaminated"
      else "kept"
    val expect = flags.groupBy(_.src).toSeq.sortBy(_._1).map { case (src, fs) =>
      val st = fs.map(f => (stage(f), f.nTok))
      val keptTok = st.filter(_._1 == "kept").map(_._2).sum
      (src, fs.length.toLong,
        st.count(_._1 == "drop_quality").toLong,
        st.count(_._1 == "drop_repetition").toLong,
        st.count(_._1 == "drop_duplicate").toLong,
        st.count(_._1 == "drop_contaminated").toLong,
        st.count(_._1 == "kept").toLong, keptTok, (keptTok + 255) / 256)
    }
    val got = TextAnalysis.curationPipeline(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSeq
    assert(got == expect, s"got ${got.take(3)}… expected ${expect.take(3)}…")
    // stage counts must partition n_train
    got.foreach(r => assert(r._3 + r._4 + r._5 + r._6 + r._7 == r._2))
  }

  test("mix_apply equals a driver-side exact-integer resampling replay") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val perLang = docs.groupBy(_._2).map { case (l, ds) =>
      val n = ds.map(_._3).sum
      val s0 = math.sqrt(n.toDouble).toLong
      l -> (n, if (s0 * s0 > n) s0 - 1 else s0)
    }
    val z = perLang.values.map(_._2).sum
    val expect = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (l, ds) =>
      val (nTokens, s) = perLang(l)
      val target = 50000L * s / z
      val (nFull, rem) = (target / nTokens, target % nTokens)
      val copies = ds.map { case (id, _, nTok) =>
        val u32 = java.lang.Long.parseLong(md5hex(s"mix:$id").take(8), 16)
        val extra = if (BigInt(u32) * nTokens < BigInt(rem) * 4294967296L) 1L else 0L
        (nFull + extra, nTok)
      }
      (l, ds.size.toLong, nTokens, target,
        copies.map(_._1).sum, copies.map(c => c._1 * c._2).sum)
    }
    val got = TextAnalysis.mixtureApply(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"got ${got.take(2)}… expected ${expect.take(2)}…")
    // the sampled token mass must track the target within one doc length
    got.foreach(r => assert(r._6 > 0 && r._5 > 0))
  }

  test("dedup_semantic_clusters equals a driver-side union-find over the pair list") {
    val pairs = graft.operators.DedupOps.embeddingCosinePairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.toSeq.map(n => (n, find(n))).sortBy(_._1)
    val got = graft.operators.DedupOps.semanticClusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("text_substring_dup equals a driver-side window-overlap scan") {
    val docs = corpus
    val windows = docs.map { case (id, src, text) =>
      (id, src, grams(text.split(" ", -1), 20))
    }
    val spread = windows.flatMap { case (id, _, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    val expect = windows.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val per = ds.map { case (_, _, ws) =>
        (ws.size.toLong, ws.count(w => spread(w) > 1).toLong) }
      val (mass, shared) = (per.map(_._1).sum, per.map(_._2).sum)
      val frac = if (mass > 0)
        BigDecimal(shared.toDouble / mass.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else Double.NaN
      (src, ds.size.toLong, per.count(_._2 > 0).toLong, mass, shared, frac)
    }
    val got = TextAnalysis.substringDupCensus(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expect)
    assert(got.map(_._5).sum > 0, "the corpus plants verbatim overlaps")
  }

  test("text_bigram_logprob equals a driver-side smoothed-LM replay") {
    val docs = corpus
    val allBg = docs.flatMap(d => grams(d._3.split(" ", -1), 2))
    val cb = allBg.groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val allTok = docs.flatMap(_._3.split(" ", -1))
    val cu = allTok.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val v = allTok.distinct.length.toLong
    val expect = docs.toSeq
      .map { case (id, _, text) =>
        val bgs = grams(text.split(" ", -1), 2)
        val lps = bgs.map { g =>
          val w1 = g.split(" ")(0)
          val lp = math.log((cb(g) + 1).toDouble / (cu(w1) + v).toDouble)
          BigDecimal(lp).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }
        (id, bgs.size.toLong,
          if (bgs.nonEmpty)
            // exact decimal sum, then the same cast-to-double division
            // Spark performs
            BigDecimal(lps.sum.toDouble / bgs.size)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else Double.NaN)
      }
      .filter(_._2 > 0)
      .sortBy(r => (r._3, r._1)).take(20)
    val got = TextAnalysis.bigramLogprob(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect, s"got ${got.take(3)} expected ${expect.take(3)}")
  }

  test("text_source_overlap equals a driver-side pair census") {
    val fps = Tables(spark, sf0001, "documents")
      .select(col("source"), md5(substring(col("text"), 1, 64)).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val pairs = for {
      (sa, fa) <- fps; (sb, fb) <- fps
      if fa == fb && sa < sb
    } yield ((sa, sb), fa)
    val expect = pairs.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case ((a, b), xs) =>
        (a, b, xs.length.toLong, xs.map(_._2).distinct.length.toLong) }
    val got = TextAnalysis.sourceOverlap(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "the corpus plants cross-source near-dups")
  }
}
