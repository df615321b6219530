package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprColumns

/** WordGramHashes / BigramHashPairs: the one-pass hashed-gram expressions
  * must preserve the EQUALITY STRUCTURE of the gram strings they replace
  * (every consumer is equality-only), and BigramHashPairs.h1 must be
  * bit-identical to SQL xxhash64 so it can probe a model built with the
  * plain function. */
class GramHashSpec extends SparkSpec {

  import spark.implicits._

  private def fps(text: String, k: Int): Seq[Long] = {
    ExprColumns.register(spark)
    Seq(text).toDF("t")
      .select(expr(s"graft_gram_hashes(t, $k)"))
      .as[Seq[Long]].head()
  }

  /** The string grams the expression replaces (positional, every
    * occurrence kept) — built independently in plain Scala. */
  private def gramStrings(text: String, k: Int): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < k) Seq.empty
    else (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" "))
  }

  test("window count and positions: n-k+1 fingerprints, empty below k") {
    assert(fps("a b c d e", 3).length == 3)
    assert(fps("a b", 3).isEmpty)
    assert(fps("a b c", 3).length == 1)
    assert(fps("solo", 1).length == 1)
    // empty string splits to one empty word
    assert(fps("", 1).length == 1)
    assert(fps("", 2).isEmpty)
  }

  test("equality structure matches gram strings across a corpus") {
    // deterministic corpus with deliberate repetition within and across
    // docs, plus empty-token edge shapes (double spaces)
    val texts = Seq(
      "a b c a b c a b",
      "b c a b z z z",
      "a  b c a b", // empty token from double space — distinct word
      "x y z x y z",
      "c a b c",
      "")
    for (k <- Seq(1, 2, 3, 13)) {
      val pairs = texts.flatMap(t => gramStrings(t, k).zip(fps(t, k)))
      // functional: same gram string -> same fingerprint
      pairs.groupBy(_._1).foreach { case (g, ps) =>
        assert(ps.map(_._2).distinct.length == 1,
          s"k=$k gram '$g' got multiple fingerprints")
      }
      // injective on the sample: distinct gram -> distinct fingerprint
      val byFp = pairs.groupBy(_._2)
      byFp.foreach { case (fp, ps) =>
        assert(ps.map(_._1).distinct.length == 1,
          s"k=$k fingerprint $fp collides: ${ps.map(_._1).distinct}")
      }
    }
  }

  test("repetition is preserved — occurrence counts per gram agree") {
    val t = "a b a b a b a b"
    val strs = gramStrings(t, 2).groupBy(identity).map { case (g, o) => (g, o.length) }
    val hs = fps(t, 2).groupBy(identity).map { case (h, o) => o.length }.toSeq.sorted
    assert(strs.values.toSeq.sorted == hs)
  }

  test("bigram pairs: gb matches WordGramHashes(2), h1 is SQL xxhash64") {
    ExprColumns.register(spark)
    val t = "quick brown fox jumps over brown fox"
    val rows = Seq(t).toDF("t")
      .select(explode(expr("graft_bigram_pairs(t)")).as("p"))
      .select($"p.gb", $"p.h1").as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1) == fps(t, 2))
    val words = t.split(" ", -1).dropRight(1).toSeq
    val expectH1 = words.toDF("w").select(xxhash64($"w")).as[Long].collect().toSeq
    assert(rows.map(_._2) == expectH1)
    // short input -> empty
    assert(Seq("one").toDF("t").select(expr("graft_bigram_pairs(t)"))
      .as[Seq[(Long, Long)]].head().isEmpty)
  }

  test("null text yields null, not a crash") {
    ExprColumns.register(spark)
    val r = Seq[Option[String]](None).toDF("t")
      .select(expr("graft_gram_hashes(t, 3)").as("g"), expr("graft_bigram_pairs(t)").as("p"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
