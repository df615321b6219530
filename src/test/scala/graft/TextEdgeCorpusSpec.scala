package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The wave-2 text operators on a hand-built corpus of boundary
  * documents the generated testdata never contains: empty text, one
  * token, exactly two tokens (one bigram), 12 tokens (no 13-gram — the
  * `sequence(1, 0)`-descends guard), exactly 13 tokens (one 13-gram),
  * an identical text in a second source, and a pure-repetition doc.
  * Expected values are worked by hand in the comments. */
class TextEdgeCorpusSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_edge").toString
    val s = spark
    import s.implicits._
    Seq(
      (0L, "", "en", "srcA"),                                    // split(" ") -> [""]: 1 token
      (1L, "one", "en", "srcA"),                                 // 1 token: zero bigrams
      (2L, "a b", "en", "srcA"),                                 // exactly one bigram
      (3L, (1 to 12).map(i => s"w$i").mkString(" "), "en", "srcB"), // 12 tokens: no 13-gram
      (4L, (1 to 13).map(i => s"w$i").mkString(" "), "en", "srcB"), // 13 tokens: exactly one
      (5L, (1 to 13).map(i => s"w$i").mkString(" "), "en", "srcC"), // same text, other source
      (6L, "x y x y x y x y", "en", "srcC")                      // pure repetition
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition filter on boundary docs: zero-gram docs count toward the census") {
    val rows = TextAnalysis.repetitionFilter(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // srcA: docs 0/1 have zero bigrams (max_bg 0, unflagged) but doc 2's
    // single bigram covers 100% of its 2 tokens — correctly flagged (a
    // length floor is the quality gate's job, not this metric's).
    // srcC: doc 5 is 13 distinct tokens (max_bg 1, no flag); doc 6 has
    // bigram "x y" 4 times over 8 tokens (40 > 8) and trigram dup mass
    // 6 of 6 (60 > 18) — both flags fire exactly once.
    assert(rows == Seq(("srcA", 3L, 1L, 0L), ("srcB", 2L, 0L, 0L),
      ("srcC", 2L, 1L, 1L)))
    // srcA has zero trigram mass: dup3_frac_micro must be NULL, not a
    // DIVIDE_BY_ZERO crash (ANSI mode) — the bug this corpus caught.
    val srcA = TextAnalysis.repetitionFilter(spark, dir).collect()
      .find(_.getString(0) == "srcA").get
    assert(srcA.isNullAt(srcA.fieldIndex("dup3_frac_micro")))
  }

  test("packing on boundary docs: sub-budget sources fill exactly one window each") {
    val rows = TextAnalysis.packSequences(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // tokens: srcA 1+1+2=4, srcB 12+13=25, srcC 13+8=21 — all < 256, so
    // one window per source; histogram: two 2-doc windows, one 3-doc.
    assert(rows == Seq((2L, 2L, 46L), (3L, 1L, 4L)))
  }

  test("source overlap on boundary docs: the planted cross-source twin is the only pair") {
    val rows = TextAnalysis.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(("srcB", "srcC", 1L, 1L)))
  }

  test("decontamination on boundary docs equals the first-principles replay") {
    def split(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"doc:$id".getBytes("UTF-8"))
      val b = h(0) & 0xff
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def g13(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 13) Set.empty
      else w.sliding(13).map(_.mkString(" ")).toSet
    }
    val bench = docs.filter(d => split(d._1) == "test").flatMap(d => g13(d._3)).toSet
    val expect = docs.filter(d => split(d._1) == "train")
      .map(d => (d._2, if (g13(d._3).exists(bench.contains)) 1L else 0L))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, xs) => (src, xs.size.toLong, xs.map(_._2).sum) }
    val got = TextAnalysis.decontaminate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("substring census on boundary docs: zero window mass yields NULL fraction, not 0/0") {
    // every doc here is shorter than 20 tokens — window mass is zero for
    // all three sources, so shared_frac must be NULL under ANSI mode
    val rows = TextAnalysis.substringDupCensus(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.isNullAt(r.fieldIndex("shared_frac")))
    }
  }

  test("curation pipeline on boundary docs: stages partition n_train, token math holds") {
    val rows = TextAnalysis.curationPipeline(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrain, drops, kept) =
        (r.getLong(1), (2 to 5).map(r.getLong).sum, r.getLong(6))
      assert(drops + kept == nTrain, s"stage attribution must partition: $r")
      val keptTokens = r.getLong(7)
      assert(r.getLong(8) == (keptTokens + 255) / 256,
        "window count is exact ceil division")
    }
  }

  test("token entropy on boundary docs: degenerate and uniform cases " +
    "land on their closed-form values") {
    val rows = TextAnalysis.tokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows(0L) === ((1L, 1L, 0.0)))   // "" -> one empty token
    assert(rows(1L) === ((1L, 1L, 0.0)))   // single token
    assert(rows(6L) === ((8L, 2L, 1.0)))   // x/y uniform -> exactly 1 bit
    // 13 distinct tokens -> log2(13)
    val (n4, t4, e4) = rows(4L)
    assert(n4 == 13L && t4 == 13L &&
      math.abs(e4 - math.log(13.0) / math.log(2.0)) <= 0.001)
  }

  test("ngram novelty on boundary docs: the shared-prefix twin shows " +
    "partial novelty and the exact twin shows none") {
    // docs with >= 5 words: 3 (8 shingles), 4 (9: the first 8 IDENTICAL
    // to doc 3's windows, one new), 5 (doc 4's text verbatim -> 0 novel),
    // 6 (2 distinct repeating windows). n_total=7 -> decile floor(id*10/7)
    val rows = TextAnalysis.ngramNovelty(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(rows === Seq(
      (4, 1L, 8L, 8L, 1.0),    // doc 3: all novel
      (5, 1L, 9L, 1L, 0.1111), // doc 4: only the w9..w13 window is new
      (7, 1L, 9L, 0L, 0.0),    // doc 5: exact twin, nothing new
      (8, 1L, 2L, 2L, 1.0)))   // doc 6: both repeating windows first here
  }

  test("cdc chunks on boundary docs: exact twins share every chunk, " +
    "token mass is conserved") {
    val rows = TextAnalysis.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byId = rows.map(r => r._1 -> r).toMap
    // docs 4 and 5 are the same text: every chunk recurs -> dup mass 1.0
    assert(byId(4L)._5 === 1.0 && byId(5L)._5 === 1.0)
    assert(byId(4L)._2 === byId(5L)._2) // identical chunking
    // token conservation: n_words == whitespace token count per doc
    val toks = Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 12L, 4L -> 13L,
      5L -> 13L, 6L -> 8L)
    rows.foreach { case (id, _, _, nw, mass) =>
      assert(nw === toks(id), s"doc $id token mass")
      assert(mass >= 0.0 && mass <= 1.0)
    }
    // unique single-chunk docs can't be duplicated
    assert(byId(1L)._3 === 0L)
  }

  test("langid trigram on short/empty docs: no spurious truncated trigrams") {
    // Spark's sequence(1, 0) is the DESCENDING [1, 0] — unguarded, a
    // doc under 3 chars would emit two junk 'trigrams' (and DuckDB's
    // range(1, ...) would emit none, breaking the oracle gate). The
    // guard must drop sub-trigram docs entirely: they carry no signal,
    // so only the two >=3-char 'bb' docs are classified.
    val d = java.nio.file.Files.createTempDirectory("graft_langid").toString
    val s = spark
    import s.implicits._
    Seq(
      (0L, "", "aa", "srcA"),     // 0 chars: would emit "" twice unguarded
      (1L, "xy", "aa", "srcA"),   // 2 chars: would emit truncated junk
      (2L, "abc", "bb", "srcA"),  // exactly one trigram
      (3L, "abcd", "bb", "srcA")  // two trigrams
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.langidTrigram(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // lang 'aa' has NO trigrams at all -> no profile, no predictions;
    // docs 2 and 3 overlap only the 'bb' profile -> one census cell
    assert(rows == Seq(("bb", "bb", 2L, 1.0)))
  }
}
