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
