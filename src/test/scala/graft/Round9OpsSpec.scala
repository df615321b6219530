package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Round-9 operators: the BPE merge-learning loop, recomputed against an
  * INDEPENDENT in-memory reference trainer (classic mutable-sequence BPE
  * over the collected word-frequency table — a different algorithmic
  * shape from the relational windows/gaps-islands program, so agreement
  * pins the semantics, not the implementation). */
class Round9OpsSpec extends SparkSpec {

  test("text_bpe_merges equals an independent in-memory BPE trainer on " +
    "the sf0.001 corpus") {
    val words = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = BpeReference.train(words, rounds = 6)
    val got = TextAnalysis.bpeMergeLearn(spark, sf0001, rounds = 6)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
  }

  test("greedy non-overlapping apply: 'aaaa' under merge (a,a) yields " +
    "two 'aa' symbols, 'aaa' yields aa+a") {
    // pin the islands logic the relational apply implements, on the
    // reference trainer the operator is gated against
    val out = BpeReference.train(Seq(("aaaa", 1L), ("aaa", 1L)), rounds = 1)
    val (_, a, b, cnt, vocab, total) = out.head
    assert((a, b) === ("a", "a"))
    // overlap counting: aaaa has 3 adjacent (a,a) pairs, aaa has 2
    assert(cnt === 5L)
    // aaaa -> [aa, aa, </w>] (3 syms), aaa -> [aa, a, </w>] (3 syms)
    assert(total === 6L)
    assert(vocab === 3L) // aa, a, </w>
  }

  test("merge table is deterministic across repeated runs") {
    val r1 = TextAnalysis.bpeMergeLearn(spark, sf0001, rounds = 3).collect().toSeq
    val r2 = TextAnalysis.bpeMergeLearn(spark, sf0001, rounds = 3).collect().toSeq
    assert(r1 === r2)
  }

  test("text_bpe_encode ties back to the trainer's census: corpus BPE " +
    "tokens equal round-6 total_symbols, chars equal round-0 symbols") {
    val merges = TextAnalysis.bpeMergeLearn(spark, sf0001, rounds = 6)
      .collect()
    val enc = TextAnalysis.bpeEncode(spark, sf0001, rounds = 6).collect()
    val encBpe = enc.map(_.getLong(3)).sum
    val encChars = enc.map(_.getLong(2)).sum
    // the final merge row's total_symbols is the whole corpus's
    // frequency-weighted symbol count — exactly what the encode pass
    // re-derives by joining occurrences to per-word subword counts
    val r6Total = merges.filter(_.getInt(0) == 6).head.getLong(5)
    assert(encBpe === r6Total)
    // chars+marker = the pre-merge symbol count = round-1 total + its
    // pair_count (each applied... overlap makes that inequality-only),
    // so derive round 0 directly: total_symbols(r) + applied(r) is not
    // recoverable from the table — instead recompute: every merge
    // reduces totals, so chars must strictly exceed the round-6 total
    assert(encChars > r6Total)
    assert(enc.map(_.getString(0)).toSeq === enc.map(_.getString(0)).toSeq.sorted)
  }

  test("docs_budget_select: kept token mass fits the half-corpus budget " +
    "and adding the next-ranked doc would exceed it") {
    import graft.operators.Curation
    import graft.functions.TextFunctions
    val scored = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.distinctTokenCount(col("text")).as("n_uniq"))
      .filter(col("n_tok") > 0)
      .withColumn("score",
        col("n_uniq").cast("double") / col("n_tok").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    val total = scored.map(_._3).sum
    val budget = total / 2
    // independent greedy selection in plain Scala
    val ranked = scored.sortBy { case (id, _, _, s) => (-s, id) }
    var cum = 0L
    val kept = ranked.takeWhile { case (_, _, t, _) => cum += t; cum <= budget }
    val expected = kept.groupBy(_._2).map { case (lang, docs) =>
      val share = docs.map(_._3).sum.toDouble /
        scored.filter(_._2 == lang).map(_._3).sum
      (lang, docs.length.toLong, docs.map(_._3).sum,
        BigDecimal(share) // Spark's round() is HALF_UP, not rint's HALF_EVEN
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Curation.budgetSelect(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === expected)
    // the budget genuinely binds: selection stops strictly mid-corpus
    val keptTokens = kept.map(_._3).sum
    assert(keptTokens <= budget && kept.length < scored.length)
    val nextTok = ranked(kept.length)._3
    assert(keptTokens + nextTok > budget,
      "greedy prefix must be maximal under the budget")
  }

  test("docs_quality_probe2: two hard-sigmoid steps recompute exactly " +
    "through an independent explode path, and the clamp engages") {
    import graft.operators.Curation
    graft.functions.ExprColumns.register(spark)
    val tf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        posexplode(expr("graft_hashed_tf64(split(text, ' '))"))
          .as(Seq("j", "xv")))
      .filter(col("xv") > 0)
    val lab = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id").as("doc_id"), col("label"))
    val g2 = tf.join(lab, "doc_id").groupBy(col("j"))
      .agg(sum((col("label") * 2 - 1) * col("xv")).as("g2"))
    val m = tf.join(lab, "doc_id").join(g2, Seq("j"), "left")
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(coalesce(col("g2"), lit(0L)) * col("xv")).as("m2000"))
    val sg = m.select(col("doc_id"), col("label"),
      least(greatest(lit(8000L) + lit(2L) * col("m2000"), lit(0L)),
        lit(16000L)).as("sgm"))
    // the piecewise-linear region must actually clip somewhere, or the
    // second step is indistinguishable from a linear re-scale
    assert(sg.filter(col("sgm") === 0L || col("sgm") === 16000L).count() > 0)
    val g2p = tf.join(sg, "doc_id").groupBy(col("j"))
      .agg(sum((lit(16000L) * col("label") - col("sgm")) * col("xv")).as("g2p"))
    val w = g2.join(g2p, Seq("j"), "full")
      .select(col("j"), (lit(8000L) * coalesce(col("g2"), lit(0L)) +
        coalesce(col("g2p"), lit(0L))).as("wj"))
    val margins = tf.join(w, Seq("j"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("wj"), lit(0L)) * col("xv")).as("m16"))
      .select(col("doc_id"),
        round(col("m16").cast("double") / 16000000.0, 6).as("margin"))
    val expected = margins
      .join(Tables(spark, sf0001, "documents")
        .select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .orderBy(col("margin").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("lang"), col("source"), col("margin"))
      .collect().toSeq
    val got = Curation.qualityProbe2(spark, sf0001).collect().toSeq
    assert(got === expected)
    assert(Curation.qualityProbe2(spark, sf0001).collect().toSeq === got)
  }

  test("docs_quality_probe margins equal an independent relational " +
    "recomputation and are integer-exact") {
    import graft.operators.Curation
    graft.functions.ExprColumns.register(spark)
    // independent path: explode the TF vectors to (doc, bucket, count)
    // rows and recompute the doubled gradient and margin as joins/aggs —
    // no zip_with, no broadcast weight array
    val tf = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        posexplode(expr("graft_hashed_tf64(split(text, ' '))"))
          .as(Seq("j", "xv")))
      .filter(col("xv") > 0)
    val lab = Tables(spark, sf0001, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id").as("doc_id"), col("label"))
    val g2 = tf.join(lab, "doc_id")
      .groupBy(col("j"))
      .agg(sum((col("label") * 2 - 1) * col("xv")).as("g2"))
    val margins = tf.join(g2, Seq("j"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("g2"), lit(0L)) * col("xv")).as("m2000"))
      .select(col("doc_id"),
        round(col("m2000").cast("double") / 2000.0, 6).as("margin"))
    val expected = margins
      .join(Tables(spark, sf0001, "documents")
        .select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .orderBy(col("margin").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("lang"), col("source"), col("margin"))
      .collect().toSeq
    val got = Curation.qualityProbe(spark, sf0001).collect().toSeq
    assert(got === expected)
    // determinism: a second run is bit-identical (everything up to the
    // single final division is BIGINT arithmetic)
    assert(Curation.qualityProbe(spark, sf0001).collect().toSeq === got)
  }
}
