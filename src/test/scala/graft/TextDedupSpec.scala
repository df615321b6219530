package graft

import org.apache.spark.sql.functions._
import graft.functions.{ExprColumns, TextFunctions}
import graft.operators.DedupOps

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("simhash64 matches independently-computed fixture values") {
    // expected values computed with python hashlib (md5 digest bytes,
    // MSB-first bits, +1/-1 vote per distinct token) — independent of the
    // Scala implementation
    val df = Seq("hello world", "the quick brown fox jumps").toDF("text")
      .select(ExprColumns.simhash64(spark, "array_distinct(split(text, ' '))")
        .as("h"))
    val got = df.as[String].collect().toSeq
    assert(got === Seq(
      "0101110101000001000000000010001010100000010000100000000000000110",
      "0000111111010100011110000110100001011111100010110110011011001110"))
  }

  test("simhash of near-identical docs differs in few bits") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val Seq(ha, hb) = Seq(a, b).toDF("text")
      .select(ExprColumns.simhash64(spark, "array_distinct(split(text, ' '))")
        .as("h")).as[String].collect().toSeq
    val hamming = ha.zip(hb).count { case (x, y) => x != y }
    assert(hamming > 0 && hamming <= 24, s"hamming=$hamming")
  }

  test("shingles: 1-based inclusive 5-gram slices, short docs empty") {
    val df = Seq("a b c d e f", "a b c").toDF("text")
      .select(TextFunctions.shingles(col("text"), 5).as("s"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) === Seq("a b c d e", "b c d e f"))
    assert(got(1) === Seq.empty)
  }

  test("minhash LSH finds the planted near-dups that exact jaccard finds") {
    val exact = DedupOps.ngramJaccardPairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact), "LSH pairs are exact-verified, so ⊆ exact")
    // planted near-dups have jaccard ~0.98 -> P(miss) = (1-s^3)^3 ≈ 1e-4
    assert(lsh.size >= exact.size - 1,
      s"LSH recall too low: ${lsh.size}/${exact.size}")
  }

  test("dedup_exact keeps one keeper per distinct text") {
    val df = DedupOps.dedupExact(spark, sf0001)
    val total = Tables(spark, sf0001, "documents").count()
    assert(df.agg(sum("n_copies")).as[Long].head === total)
  }

  test("WordShingles expression equals the Column composition") {
    import graft.functions.{ExprColumns, TextFunctions}
    val docs = Tables(spark, sf0001, "documents")
    val both = docs.select(
      TextFunctions.shingles(col("text"), 5).as("slow"),
      ExprColumns.shingles(spark, "text", 5).as("fast"))
    val mismatch = both.filter(
      size(array_except(col("slow"), col("fast"))) > 0 ||
      size(array_except(col("fast"), col("slow"))) > 0 ||
      size(col("slow")) =!= size(col("fast"))).count()
    assert(mismatch == 0)
    // short-doc edge: both yield empty arrays
    val s = spark
    import s.implicits._
    val tiny = Seq("one two three").toDF("text")
    assert(tiny.select(ExprColumns.shingles(spark, "text", 5)).head()
      .getSeq[String](0).isEmpty)
  }

  test("WordShingles equals the composition on random strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import graft.functions.{ExprColumns, TextFunctions}
    // word-ish strings with repeated tokens, plus raw ascii noise
    val wordy = (0 until 100).map { i =>
      val words = (0 until (i % 12)).map(j => s"w${(i * 7 + j * 3) % 9}")
      words.mkString(" ")
    }
    val noise = (0 until 100).flatMap { i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(i + 5000L))
    }
    val s = spark
    import s.implicits._
    val df = (wordy ++ noise).toDF("text").select(
      TextFunctions.shingles(col("text"), 5).as("slow"),
      ExprColumns.shingles(spark, "text", 5).as("fast"))
    val bad = df.filter(
      size(array_except(col("slow"), col("fast"))) > 0 ||
      size(array_except(col("fast"), col("slow"))) > 0 ||
      size(col("slow")) =!= size(col("fast"))).count()
    assert(bad == 0)
  }

  test("embedding-cosine near-dup finds the planted pairs, keeper < dup") {
    val rows = DedupOps.embeddingCosinePairs(spark, sf0001).collect()
    assert(rows.nonEmpty, "planted near-dups should survive the 0.9 cosine bar")
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r => val c = r.getDouble(2); c >= 0.9 && c <= 1.0001 })
    // near-dup texts differ by a few words -> hashed-TF cosine close to 1
    val jaccardPairs = DedupOps.ngramJaccardPairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val cosPairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((cosPairs intersect jaccardPairs).size >= jaccardPairs.size / 2,
      "cosine near-dups should broadly agree with exact jaccard")
  }

  test("BPE-ish token counts: per-lang totals, subword >= whitespace") {
    val df = graft.operators.TextAnalysis.bpeTokenStats(spark, sf0001)
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val ws = r.getAs[Long]("total_ws_tokens")
      val bpe = r.getAs[Long]("total_bpe_tokens")
      assert(ws > 0 && bpe > 0)
      assert(bpe >= ws || r.getAs[String]("lang") == "zh",
        s"${r.getAs[String]("lang")}: punctuation splits should not shrink counts")
      assert(r.getAs[Double]("chars_per_bpe") > 0)
    }
  }
}
