package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}

/** Round-12 wave-9 operators: Matryoshka truncation recall and the
  * held-out tokenizer OOV census — scalar replays on sf0.001. */
class Round12Wave9Spec extends SparkSpec {

  test("sim_matryoshka_recall matches a scalar truncation replay") {
    val vs = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], w: Int): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < w) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / math.sqrt(na * nb)
    }
    val q = vs.sortBy(_._1).take(5)
    val got = Similarity.matryoshkaRecall(spark, sf0001).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val qid = r.getLong(0)
      val qe = q.find(_._1 == qid).get._2
      def top(w: Int): Set[Long] = vs.filter(_._1 != qid)
        .map { case (v, e) => (v, cos(e, qe, w)) }
        .sortBy { case (v, s) => (-s, v) }.take(10).map(_._1).toSet
      val truth = top(64)
      assert(r.getLong(2) === (truth & top(32)).size.toLong, "hits@32")
      assert(r.getLong(3) === (truth & top(16)).size.toLong, "hits@16")
      assert(math.abs(r.getDouble(4) - r.getLong(2) / 10.0) < 1e-9)
      assert(math.abs(r.getDouble(5) - r.getLong(3) / 10.0) < 1e-9)
      // wider prefixes can only preserve more of the ranking signal,
      // measured as recall here (allow equality)
      assert(r.getLong(2) >= r.getLong(3) - 2,
        "d32 should not be far below d16")
    }
  }

  test("text_bpe_oov matches a scalar held-out vocabulary replay") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def words(t: String): Seq[String] =
      t.split(" ", -1).toSeq.map(_.toLowerCase)
        .filter(w => w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
    val vocab = docs.filter(_._1 % 2 == 0).flatMap(d => words(d._3)).toSet
    val held = docs.filter(_._1 % 2 != 0)
      .flatMap(d => words(d._3).map(w => (d._2, w)))
    val got = TextAnalysis.bpeOov(spark, sf0001).collect()
    got.foreach { r =>
      val lang = r.getString(0)
      val mine = held.filter(_._1 == lang)
      val types = mine.map(_._2).distinct
      val oovT = types.filterNot(vocab.contains)
      assert(r.getLong(1) === types.length.toLong, "types")
      assert(r.getLong(2) === oovT.length.toLong, "oov types")
      assert(r.getLong(4) === mine.length.toLong, "occurrences")
      val oovOcc = mine.count(w => !vocab.contains(w._2))
      assert(r.getLong(5) === oovOcc.toLong, "oov occurrences")
      assert(math.abs(r.getDouble(6) -
        oovOcc.toDouble / mine.length) < 1e-6)
      val oovChars = mine.filter(w => !vocab.contains(w._2))
        .map(_._2.length.toLong).sum
      assert(r.getLong(7) === oovChars, "oov char mass")
      // the long tail is less covered than the occurrence mass
      assert(r.getDouble(3) >= r.getDouble(6) - 1e-9,
        "type rate >= occurrence rate")
    }
  }
}
