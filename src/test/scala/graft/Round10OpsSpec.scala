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
}
