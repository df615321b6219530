package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators beyond the dedup/quality/mixing families —
  * the selection and profiling passes a training-data pipeline runs
  * between raw ingest and tokenization (importance weighting, boilerplate
  * prefix census, length profiling, Zipf diagnostics, per-source quantile
  * gates). Reference scope: the AppsFlyer ETL (main.py) has no curation
  * stage at all; these extend the rebuild the same way the dedup ladder
  * does (SURVEY.md "beyond the reference" mandate).
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-like its hashed-n-gram feature distribution
    * is, where the target is the English sub-corpus and the raw
    * distribution is everything. Features are unigrams hashed into 256
    * buckets (first md5 hex byte — portable across engines); the
    * per-bucket weight is the add-one-smoothed log likelihood ratio
    * `ln((t_b+1)/(T+K)) - ln((r_b+1)/(R+K))`, and a document's score is
    * the mean bucket weight over its tokens. The top-k most target-like
    * review queue returns (doc_id, lang, n_tok, dsir_score) — English
    * docs ranking high is the built-in sanity signal.
    *
    * Plan: ONE corpus explode feeds both distribution hash-aggs (raw and
    * target), each collapsing to at most 256 rows; the weight table and
    * the two scalar totals broadcast back into the same exploded
    * relation, so the corpus is tokenized exactly once and never
    * reshuffled (the probe agg groups on doc_id — co-partitioned with
    * the explode's natural layout). At 100 TB the model is KB-sized
    * state on the driver side of a broadcast, the classic DSIR
    * asymmetry. Per-token weights are cast to DECIMAL(28,12) before the
    * sum so accumulation order cannot wobble the mean (same convention
    * as unigramLogprob).
    */
  def dsirWeights(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val d = docs(spark, dir)
    val tok = d.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("word"))
      .select(col("doc_id"), col("lang"),
        substring(md5(col("word")), 1, 2).as("b"))
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("rb"))
    val tgt = tok.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tb"))
    val tots = raw.agg(sum(col("rb")).as("r_total"))
      .crossJoin(tgt.agg(coalesce(sum(col("tb")), lit(0L)).as("t_total")))
    // <=256-row weight model: smoothed target/raw log likelihood ratio
    val w = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tots))
      .select(col("b"),
        (log((coalesce(col("tb"), lit(0L)) + 1).cast("double") /
            (col("t_total") + 256).cast("double")) -
          log((col("rb") + 1).cast("double") /
            (col("r_total") + 256).cast("double")))
          .cast("decimal(28,12)").as("wv"))
    val per = tok.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(col("wv")).cast("double") / count(lit(1)), 6)
          .as("dsir_score"))
    per.join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(k)
  }

  /** Boilerplate-prefix census: documents sharing an identical first-16-
    * token prefix (the template/mirror signal — pages that differ only
    * past their boilerplate head, which exact dedup misses and shingle
    * Jaccard dilutes on long docs). Keep-first semantics like
    * [[DedupOps.dedupExact]]: one row per colliding prefix with the
    * minimum doc_id as keeper. One projection (the prefix fp is a
    * map-side md5 of a bounded 16-token slice — cost independent of
    * document length) and one hash-agg; at 100 TB this is strictly
    * cheaper than any shingle pass. */
  def dedupPrefix(spark: SparkSession, dir: String, nTok: Int = 16): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        md5(array_join(slice(split(col("text"), " "), 1, nTok), " ")).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** Power-of-two length histogram per language — the length-filter
    * design view (what do cutoffs at 2^b chars drop, per language?).
    * Bucket = floor(log2(n_chars)) computed EXACTLY as the bit length of
    * the integer (`length(bin(x)) - 1`) — never floating log2, whose
    * rounding at exact powers of two is engine-specific. One hash-agg on
    * a (lang x ~30 buckets)-bounded key; `share` is each bucket's doc
    * fraction within its language (window over the tiny aggregate, not
    * the corpus). */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val perLang = Window.partitionBy(col("lang"))
    docs(spark, dir)
      .groupBy(col("lang"),
        (length(bin(col("n_chars"))) - 1).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .withColumn("bucket_lo", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
      .withColumn("share",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(perLang).cast("double"), 6))
      .select(col("lang"), col("bucket"), col("bucket_lo"), col("n_docs"),
        col("total_chars"), col("share"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Zipf-law fit over the corpus vocabulary: least-squares slope and
    * intercept of ln(freq) against ln(rank) for the top-k words (natural
    * text sits near slope -1; word-soup and boilerplate corpora flatten
    * toward 0 — a one-row corpus-health diagnostic).
    *
    * Determinism: the five regression sums (n, Sx, Sy, Sxx, Sxy) are
    * DECIMAL(38,18)-accumulated over per-rank doubles (each a pure
    * function of exact integers), so accumulation order cannot move
    * them; the closed-form slope/intercept arithmetic is then a fixed
    * double expression evaluated identically by both engines. Plan: one
    * corpus hash-agg to vocabulary scale, top-k, and a single-partition
    * window over <=k rows for the rank. */
  def zipfFit(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val top = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(k)
    val ranked = top.withColumn("rk",
      row_number().over(Window.orderBy(col("freq").desc, col("word"))))
      .select(log(col("rk").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x").cast("decimal(38,18)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(38,18)")).cast("double").as("sy"),
      sum((col("x") * col("x")).cast("decimal(38,18)")).cast("double").as("sxx"),
      sum((col("x") * col("y")).cast("decimal(38,18)")).cast("double").as("sxy"))
    s.select(
      col("n").cast("long").as("n_words"),
      round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
      round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
        col("n"), 6).as("intercept"))
  }

  /** Per-source median-length gate — the quantile form of a length
    * filter (an absolute cutoff is wrong across sources whose length
    * distributions differ; the per-source median self-calibrates). For
    * each source: exact interpolated median token count, and how many
    * docs a keep-if-at-least-median gate retains vs drops. Two
    * dimension-bounded hash-aggs (the exact `percentile` is a per-source
    * sort at most — at 100 TB swap for approx_percentile and gate the
    * comparison on the same output shape); the median table broadcasts
    * back onto the doc-level relation. */
  def qualityQuantile(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val med = base.groupBy(col("source"))
      .agg(expr("percentile(n_tok, 0.5)").as("median_tok"))
    base.join(broadcast(med), Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(first(col("median_tok")), 1).as("median_tok"),
        sum(when(col("n_tok") >= col("median_tok"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("n_tok") < col("median_tok"), 1L).otherwise(0L)).as("n_dropped"))
      .orderBy(col("source"))
  }

  /** Fixed per-source quota sampling by hash priority ("bottom-k"): keep
    * exactly `quota` docs per source, chosen by the smallest salted-md5
    * priority — the budgeted complement of [[TextAnalysis
    * .stratifiedSample]]'s keep-RATE gate. Bottom-k-by-hash IS a uniform
    * sample without replacement, and because the priority is a pure
    * function of the stable doc key it is reproducible on any cluster
    * layout and needs no global sort. Under corpus GROWTH the sample
    * never reshuffles — an existing doc's priority can't change, so
    * the only churn is boundary displacement when a new arrival hashes
    * below the current rank-k pick (inherent to any fixed-budget
    * bottom-k; a doc kept against more competitors was necessarily kept
    * against fewer, the invariant BloomQuotaSpec pins).
    *
    * Plan: `row_number() <= k` over (source, priority) is rewritten by
    * Spark into a two-phase WindowGroupLimit — every input partition
    * keeps only its own top-`quota` rows per source BEFORE the exchange
    * (Partial mode), so the shuffle carries at most quota x partitions
    * rows per source, not the corpus (the property PlanAuditSpec pins).
    * At 100 TB the alternative formulations are strictly worse: a global
    * orderBy sorts everything; a per-source percentile threshold needs a
    * second pass. */
  def quotaSample(spark: SparkSession, dir: String, quota: Int = 10): DataFrame =
    quotaSampleOf(docs(spark, dir), quota)

  /** [[quotaSample]] over an arbitrary documents-shaped relation (the
    * corpus-growth test samples a filtered corpus through this). */
  def quotaSampleOf(documents: DataFrame, quota: Int): DataFrame = {
    val pri = md5(concat(lit("quota:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source")).orderBy(pri, col("doc_id"))
    documents
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy(col("source"), col("rk"))
  }

  /** Quality-classifier TRAINING step (the "train the filter" half of the
    * FineWeb-Edu recipe that [[Similarity.semanticQuality]]'s fixed-anchor
    * scorer stops short of): one logistic-regression gradient step over
    * 64-bucket hashed-TF features ([[graft.expressions.HashedTf64]])
    * against the label-0/label-1 split of the `embeddings` table, then
    * every document scored by the learned linear probe and the top-k
    * review queue emitted — exactly what a curation team reads before
    * committing the trained gate to the pipeline.
    *
    * Exactness: at w=0 the logistic gradient is Σᵢ (yᵢ − ½)·xᵢ, so the
    * DOUBLED gradient g2ⱼ = Σᵢ (2yᵢ−1)·xᵢⱼ is a pure BIGINT sum (labels
    * are 0/1, features are token counts), and with learning rate 1/1000
    * the scored margin w·x = (Σⱼ g2ⱼ·xⱼ)/2000 stays integer until ONE
    * final double division — no float accumulation anywhere, so shuffle
    * order cannot perturb a score and DuckDB reproduces every margin
    * bit-for-bit (sigmoid is monotone, so ranking by margin IS ranking
    * by predicted probability; the oracle never needs exp()).
    *
    * Scale shape: the gradient runs over the LABELED subset only (at
    * 100 TB that's the curated seed sample, exactly how FineWeb-Edu
    * trains on ~500k annotated pages); its 64-row result folds into one
    * broadcast weight array, and scoring the full corpus is a map-side
    * zip_with dot per document plus TakeOrderedAndProject — one corpus
    * pass, no shuffle. Further gradient steps repeat the same two-agg
    * round shape with w≠0 (the sigmoid then needs float math; this
    * operator deliberately emits the exact first step a reviewer can
    * audit). */
  /** Integer doubled margins (doc_id, lang, source, m2000) of the
    * one-step probe — the shared relation behind [[qualityProbe]] (top
    * margins) and [[uncertaintySample]] (margins nearest zero); one
    * definition so the two selections can never drift on the gradient
    * or the TF build. */
  private def probeMargins(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        expr("graft_hashed_tf64(split(text, ' '))").as("x"))
    val labels = Tables(spark, dir, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id").as("doc_id"), col("label"))
    // doubled gradient per bucket, BIGINT-exact; buckets no labeled doc
    // touches default to 0 via the map fill below (w=0 there)
    val g2 = tf.join(labels, "doc_id")
      .select(col("label"), posexplode(col("x")).as(Seq("j", "xv")))
      .groupBy(col("j"))
      .agg(sum((col("label") * 2 - 1) * col("xv")).as("g2"))
    // 1-row dense weight vector (collect_list order is irrelevant: the
    // map lookup re-indexes by bucket)
    val w2 = g2
      .agg(expr("map_from_entries(collect_list(struct(j, g2)))").as("m"))
      .select(expr(
        "transform(sequence(0, 63), j -> coalesce(m[int(j)], 0L))").as("w2"))
    tf.crossJoin(broadcast(w2)) // 1-row scalar
      .withColumn("m2000", expr(
        "aggregate(zip_with(x, w2, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .select(col("doc_id"), col("lang"), col("source"), col("m2000"))
  }

  def qualityProbe(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    probeMargins(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        round(col("m2000").cast("double") / 2000.0, 6).as("margin"))
      .orderBy(col("margin").desc, col("doc_id"))
      .limit(k)

  /** ACTIVE-LEARNING batch selection — uncertainty sampling on the
    * trained probe: the k documents whose margin sits NEAREST the
    * decision boundary (smallest |margin|, ties to the smallest
    * doc_id) are exactly the ones a labeling team should annotate
    * next; the third leg of the probe loop after train
    * ([[qualityProbe]]) and evaluate ([[probeAuc]]). Selection ranks
    * the EXACT integer doubled margin's absolute value — no float
    * enters until the reported margin — so the picked set is
    * bit-deterministic in both engines.
    *
    * Scale shape: margins are [[probeMargins]]' one broadcast-weight
    * narrow map; the smallest-k selection is a TakeOrdered reduction
    * (partial top-k per partition, never a global sort). */
  def uncertaintySample(spark: SparkSession, dir: String,
                        k: Int = 20): DataFrame =
    probeMargins(spark, dir)
      .withColumn("abs_m2000", abs(col("m2000")))
      .orderBy(col("abs_m2000"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("source"),
        col("abs_m2000"),
        round(col("m2000").cast("double") / 2000.0, 6).as("margin"))

  /** Token-budget-constrained corpus selection — the decision step after
    * scoring: rank every document by quality (distinct-token ratio, the
    * same integer-derived signal the prep pipeline gates on; ONE double
    * division per doc, identical in both engines) and keep the
    * best-scoring PREFIX whose cumulative whitespace-token count fits
    * the budget. The budget is half the corpus's total tokens, derived
    * from the data itself so the cut genuinely lands mid-corpus at
    * every scale factor. Emits the per-language census of the kept set
    * (docs, tokens, share of that language's token mass kept — greedy
    * selection under a global budget is deliberately NOT
    * language-balanced; quota/mixture reweighting is [[quotaSample]] /
    * `mix_weights`' job downstream).
    *
    * Plan shape: the DISTRIBUTED two-pass prefix sum (the classic
    * parallel exclusive-scan). A corpus-sized single-partition running
    * sum would funnel every document through ONE task at scale, so the
    * global cum is decomposed: (1) `approx_percentile` samples the
    * score distribution into B-1 bucket boundaries (GK sketch —
    * deterministic, so the two consumers of the bucketed relation
    * always agree on boundaries even if recomputed); (2) each document
    * maps to a bucket by counting boundaries above its score — bucket
    * assignment is monotone in score, so bucket-ascending refines the
    * global (score DESC, doc_id) order; (3) the per-bucket running sum
    * is a window PARTITIONED by bucket (B-way parallel, one corpus
    * shuffle); (4) bucket totals aggregate to B rows and a tiny global
    * window over THOSE yields each bucket's exact starting offset (the
    * serial scan-of-block-sums step — B rows regardless of corpus
    * size); (5) cum = offset + local prefix, exact, and the boundary
    * bucket's straddling document is fixed up by the same `cum <=
    * budget` predicate as everywhere else. Skew bound: a bucket can
    * exceed corpus/B only by score-tie mass, the same bound any range
    * partitioning has. The 1-row budget scalar broadcasts. Ties:
    * (score DESC, doc_id). Documents with no tokens (null/empty text)
    * are excluded up front so the ranking domain is well-defined in
    * both engines (no null/NaN scores reaching the sort). */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables(spark, dir, "documents")
    val scored = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      TextFunctions.distinctTokenCount(col("text")).as("n_uniq"))
      .filter(col("n_tok") > 0)
      .withColumn("score",
        col("n_uniq").cast("double") / col("n_tok").cast("double"))
    // floor(total/2): positive floor == truncation in BOTH engines (the
    // totals stay far under 2^53, so the double midstep is exact)
    val budget = scored.agg(
      floor(sum(col("n_tok")) / 2).cast("long").as("budget"))
    // sampled score thresholds -> B order-respecting buckets
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pcts = (1 until nBuckets).map(i =>
      (i.toDouble / nBuckets).toString).mkString(", ")
    val bnds = scored.agg(
      expr(s"approx_percentile(score, array($pcts))").as("bnds"))
    val bucketed = scored.crossJoin(broadcast(bnds)) // 1-row boundary array
      .withColumn("bucket",
        size(filter(col("bnds"), b => b > col("score"))))
      .drop("bnds")
    val wLocal = Window.partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localCum = bucketed
      .withColumn("local_cum", sum(col("n_tok")).over(wLocal))
    // exact per-bucket offsets: B rows, serial scan is O(B) not O(corpus)
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col("n_tok")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select(col("bucket"), col("off"))
    val langTotals = scored.groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("lang_tokens"))
    localCum
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum", col("off") + col("local_cum"))
      .crossJoin(broadcast(budget)) // 1-row scalar
      .filter(col("cum") <= col("budget"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tok")).as("tokens_kept"))
      .join(langTotals, "lang")
      .select(col("lang"), col("n_docs_kept"), col("tokens_kept"),
        round(col("tokens_kept").cast("double") /
          col("lang_tokens").cast("double"), 6).as("lang_share_kept"))
      .orderBy(col("lang"))
  }

  /** Curriculum phase assignment — the data-ORDERING decision after
    * selection: every document gets an exact global quality rank
    * (distinct-token ratio DESC, doc_id — the same signal the budget
    * selector ranks on) and the ranking is cut into 4 equal phases,
    * highest-quality first: phase = 1 + (rank−1)·4 div N (pure integer
    * arithmetic, so both engines cut identically; a curriculum scheduler
    * then feeds phase 1 before phase 2, the anneal-from-clean-data
    * shape). Emits the per-(phase, lang) census: docs, tokens, and the
    * phase's mean score (DECIMAL-summed, ONE double division — no
    * order-dependent float accumulation), which is also the monotone
    * sanity signal: mean score strictly falls phase over phase.
    *
    * Plan shape: the exact GLOBAL RANK is the same distributed two-pass
    * scan as [[budgetSelect]] — sampled percentile boundaries bucket the
    * corpus order-compatibly, row_number runs per bucket (B-way
    * parallel), per-bucket COUNTS aggregate to B rows whose tiny window
    * yields exact starting offsets, global rank = offset + local rank.
    * NTILE over a corpus-sized ORDER BY would be one task at scale;
    * this is the decomposition that survives 100x. The N scalar and the
    * boundary array broadcast. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables(spark, dir, "documents")
    val scored = docs.select(col("doc_id"), col("lang"),
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      TextFunctions.distinctTokenCount(col("text")).as("n_uniq"))
      .filter(col("n_tok") > 0)
      .withColumn("score",
        col("n_uniq").cast("double") / col("n_tok").cast("double"))
    val nTotal = scored.agg(count(lit(1)).as("n"))
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pcts = (1 until nBuckets).map(i =>
      (i.toDouble / nBuckets).toString).mkString(", ")
    val bnds = scored.agg(
      expr(s"approx_percentile(score, array($pcts))").as("bnds"))
    val bucketed = scored.crossJoin(broadcast(bnds)) // 1-row boundary array
      .withColumn("bucket",
        size(filter(col("bnds"), b => b > col("score"))))
      .drop("bnds")
    val wLocal = Window.partitionBy(col("bucket"))
      .orderBy(col("score").desc, col("doc_id"))
    val localRk = bucketed
      .withColumn("local_rk", row_number().over(wLocal).cast("long"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wOff), lit(0L)))
      .select(col("bucket"), col("off"))
    localRk
      .join(broadcast(offsets), Seq("bucket"))
      .withColumn("rank", col("off") + col("local_rk"))
      .crossJoin(broadcast(nTotal)) // 1-row N scalar
      .withColumn("phase", expr("1L + ((rank - 1L) * 4L) div n"))
      .groupBy(col("phase"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
        sum(col("score").cast("decimal(18,9)")).as("score_sum"))
      .select(col("phase"), col("lang"), col("n_docs"), col("tokens"),
        round(col("score_sum").cast("double") / col("n_docs"), 6)
          .as("mean_score"))
      .orderBy(col("phase"), col("lang"))
  }

  /** TWO exact logistic gradient steps (the iterative half
    * [[qualityProbe]] stops short of — the same relationship
    * `sim_kmeans_lloyd2` has to `sim_kmeans_iter`): step 2 needs
    * σ(w·x) at nonzero w, which would put a transcendental exp() into
    * the gradient and break cross-engine exactness — so the trainer
    * uses the HARD sigmoid σ̂(m) = clamp(½ + m/4, 0, 1) (the standard
    * piecewise-linear logistic surrogate), whose step-1 special case
    * σ̂(0) = ½ is exactly [[qualityProbe]]'s gradient. Every quantity
    * then stays integral under common denominators:
    *
    *   g2ⱼ   = Σ (2yᵢ−1)·xᵢⱼ                       (×2;      step 1)
    *   m2000ᵢ = Σⱼ g2ⱼ·xᵢⱼ                          (×2000:   w₁·xᵢ)
    *   sᵢ    = clamp(8000 + 2·m2000ᵢ, 0, 16000)     (×16000:  σ̂(w₁·xᵢ))
    *   g2'ⱼ  = Σ (16000·yᵢ − sᵢ)·xᵢⱼ                (×16000;  step 2)
    *   Wⱼ    = 8000·g2ⱼ + g2'ⱼ                      (×16⋅10⁶: w₂)
    *   margin₂ᵢ = (Σⱼ Wⱼ·xᵢⱼ) / 16 000 000          (ONE division)
    *
    * (learning rate 1/1000 per step, as in [[qualityProbe]].) All sums
    * are BIGINT — bounded by 16000 × labeled-corpus token mass, far
    * inside Long — so DuckDB replays the full two-step trainer
    * bit-for-bit. Scale shape is unchanged from step 1: both gradient
    * passes and the labeled-margin pass run over the LABELED seed only,
    * weights fold to one broadcast array, corpus scoring stays one
    * map pass + top-k. Further steps repeat the same two aggregations
    * per step with the denominator growing 8000× each time — Long
    * affords 3-4 steps before the arithmetic needs DECIMAL(38),
    * which is the honest place to switch. */
  def qualityProbe2(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val m = trainProbe(spark, dir)
    m.tf.crossJoin(broadcast(m.w2))
      .withColumn("m16", expr(
        "aggregate(zip_with(x, w, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .select(col("doc_id"), col("lang"), col("source"),
        round(col("m16").cast("double") / 16000000.0, 6).as("margin"))
      .orderBy(col("margin").desc, col("doc_id"))
      .limit(k)
  }

  /** The two-step hard-sigmoid probe trainer shared by [[qualityProbe2]]
    * and [[probeAuc]]: `tf` is the corpus feature relation, `labeled` the
    * labeled seed join, `w1`/`w2` the 1-row dense 64-weight arrays after
    * step 1 (×2000 denominator) and the folded two-step vector (×16e6).
    * See [[qualityProbe2]]'s scaladoc for the integer-exactness ladder. */
  private case class ProbeModel(tf: DataFrame, labeled: DataFrame,
      w1: DataFrame, w2: DataFrame)

  private def trainProbe(spark: SparkSession, dir: String): ProbeModel = {
    graft.functions.ExprColumns.register(spark)
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        expr("graft_hashed_tf64(split(text, ' '))").as("x"))
    val labels = Tables(spark, dir, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id").as("doc_id"), col("label"))
    val labeled = tf.join(labels, "doc_id")
    def weightArray(g: DataFrame, valCol: String): DataFrame = g
      .agg(expr(s"map_from_entries(collect_list(struct(j, $valCol)))").as("m"))
      .select(expr(
        "transform(sequence(0, 63), j -> coalesce(m[int(j)], 0L))").as("w"))
    // step 1: doubled gradient at w=0
    val g2 = labeled
      .select(col("label"), posexplode(col("x")).as(Seq("j", "xv")))
      .groupBy(col("j"))
      .agg(sum((col("label") * 2 - 1) * col("xv")).as("g2"))
    val w1 = weightArray(g2, "g2")
    // labeled margins under w1 (×2000), then ×16000 hard-sigmoid
    val sig = labeled.crossJoin(broadcast(w1))
      .withColumn("m2000", expr(
        "aggregate(zip_with(x, w, (a, b) -> a * b), 0L, (acc, v) -> acc + v)"))
      .select(col("doc_id"), col("label"), col("x"),
        least(greatest(lit(8000L) + lit(2L) * col("m2000"), lit(0L)),
          lit(16000L)).as("sgm"))
    // step 2: residual gradient against the hard-sigmoid predictions
    val g2p = sig
      .select(col("label"), col("sgm"), posexplode(col("x")).as(Seq("j", "xv")))
      .groupBy(col("j"))
      .agg(sum((lit(16000L) * col("label") - col("sgm")) * col("xv")).as("g2p"))
    // fold both steps into one weight vector (×16e6)
    val wBoth = g2.join(g2p, Seq("j"), "full")
      .select(col("j"),
        (lit(8000L) * coalesce(col("g2"), lit(0L)) +
          coalesce(col("g2p"), lit(0L))).as("wj"))
    ProbeModel(tf, labeled, w1, weightArray(wBoth, "wj"))
  }

  /** Ranking-quality evaluation of the trained probes — "train the
    * filter" ([[qualityProbe]]/[[qualityProbe2]]) closes with "measure
    * the filter": tie-aware AUC of each step's margin over the labeled
    * seed, via the Mann-Whitney rank-sum identity. All arithmetic is
    * BIGINT until the single final division: the margins stay in their
    * integer numerators (×2000 for step 1, ×16e6 for step 2 — AUC is
    * rank-based, so the common denominator cancels), and the doubled
    * pair-count
    *
    *   u2 = Σ_v np_v · (2·nn_<v + nn_v)
    *
    * (np_v / nn_v = positives/negatives AT margin value v, nn_<v =
    * negatives strictly below) counts each concordant positive-negative
    * pair twice and each tied pair once, so auc = u2 / (2·n_pos·n_neg)
    * — exactly Σ [m⁺>m⁻] + ½[m⁺=m⁻] over all pairs, reproducible
    * bit-for-bit in DuckDB.
    *
    * Scale shape: every pass runs over the LABELED seed only (the same
    * bounded-sample argument as the trainers — at 100 TB that's the
    * ~500k-page annotated set, not the corpus). The rank-sum is computed
    * on the per-margin-VALUE aggregate — at most |seed| rows and
    * typically far fewer — so the one ordered window scans an
    * aggregated, seed-bounded relation (the scan-of-block-sums shape),
    * never corpus-sized data; no all-pairs join anywhere. */
  def probeAuc(spark: SparkSession, dir: String): DataFrame = {
    val m = trainProbe(spark, dir)
    def margins(w: DataFrame, step: String): DataFrame = m.labeled
      .crossJoin(broadcast(w)) // 1-row weight scalar
      .select(lit(step).as("step"), col("label").cast("long").as("label"),
        expr("aggregate(zip_with(x, w, (a, b) -> a * b), " +
          "0L, (acc, v) -> acc + v)").as("margin"))
    val byVal = margins(m.w1, "step1")
      .unionAll(margins(m.w2, "step2"))
      .groupBy(col("step"), col("margin"))
      .agg(sum(col("label")).as("np_v"),
        sum(lit(1L) - col("label")).as("nn_v"))
    val wLt = Window.partitionBy(col("step")).orderBy(col("margin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("nn_lt", coalesce(sum(col("nn_v")).over(wLt), lit(0L)))
      .groupBy(col("step"))
      .agg(sum(col("np_v")).as("n_pos"), sum(col("nn_v")).as("n_neg"),
        sum(col("np_v") * (lit(2L) * col("nn_lt") + col("nn_v"))).as("u2"))
      .select(col("step"), col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
      .orderBy(col("step"))
  }

  /** Reciprocal-rank FUSION of two quality signals — the standard
    * score-merge (RRF, Cormack et al.) for combining rankings whose
    * scales don't compare: each document's fused score is
    * Σ 1/(60 + rank_i) over its rank under the probe margin and under
    * the distinct-token ratio, and the top-k fused documents are the
    * curation pick that neither signal alone would make. Ranks are
    * EXACT distributed ranks (descending, best = 1, doc_id tiebreak)
    * via the bucketed two-pass prefix sum — the `docs_budget_select`
    * machinery, so no corpus-wide sort window anywhere.
    *
    * Determinism: both rank inputs are exact (integer margin; an
    * exact-integer-ratio double), ranks are integers, and the fused
    * score is the same two-term double expression in both engines.
    * Scale shape: two [[exactRank]] passes + a doc-keyed join + a
    * TakeOrdered top-k. */
  def rankFusion(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"),
        graft.functions.TextFunctions.distinctTokenCount(col("text"))
          .as("n_uniq"))
      .withColumn("ratio",
        col("n_uniq").cast("double") / col("n_tok").cast("double"))
    val margins = probeMargins(spark, dir).select(col("doc_id"), col("m2000"))
    // descending ranks: rank ascending on the negated signal
    val r1 = exactRank(spark,
      margins.withColumn("neg_m", -col("m2000")), "neg_m", "r_margin")
    val r2 = exactRank(spark,
      docs.withColumn("neg_q", -col("ratio")), "neg_q", "r_quality")
    r1.join(r2, Seq("doc_id"))
      .withColumn("rrf",
        lit(1.0) / (lit(60.0) + col("r_margin")) +
          lit(1.0) / (lit(60.0) + col("r_quality")))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("r_margin"), col("r_quality"),
        round(col("rrf"), 6).as("rrf_score"))
  }

  /** 2-fold CROSS-VALIDATED probe AUC — the generalization check the
    * in-sample [[probeAuc]] row cannot give (a memorizing probe scores
    * perfect AUC on its own training labels): labeled docs split by
    * doc_id parity; each fold's margins are scored under the gradient
    * trained on the OTHER fold only, and ranked by the same exact
    * integer rank-sum AUC. The train-on-complement gradient is
    * computed in one pass as g2_all − g2_own_fold (gradients are
    * sums, so the complement is a subtraction — no second corpus
    * pass). Per fold: train size, held-out pos/neg, doubled U
    * statistic, AUC.
    *
    * All-integer to the final division. Scale shape: one explode of
    * the LABELED set (seed-bounded, same argument as [[probeAuc]]),
    * two bucket-grain aggs, a margin agg, and a fold-partitioned
    * rank window over margin VALUES. */
  def probeCv(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("graft_hashed_tf64(split(text, ' '))").as("x"))
    val labels = Tables(spark, dir, "embeddings")
      .filter(col("label").isin(0, 1))
      .select(col("vec_id").as("doc_id"), col("label"))
    val dims = tf.join(labels, "doc_id")
      .withColumn("fold", col("doc_id") % 2)
      .select(col("doc_id"), col("label"), col("fold"),
        posexplode(col("x")).as(Seq("j", "xv")))
    val g2f = dims.groupBy(col("fold"), col("j"))
      .agg(sum((col("label") * 2 - 1) * col("xv")).as("g2f"))
    val g2all = g2f.groupBy(col("j")).agg(sum(col("g2f")).as("g2a"))
    // margin of a fold-h doc under the complement-trained weights
    val margins = dims
      .join(broadcast(g2f), Seq("fold", "j"))
      .join(broadcast(g2all), Seq("j"))
      .groupBy(col("fold"), col("doc_id"), col("label"))
      .agg(sum(col("xv") * (col("g2a") - col("g2f"))).as("margin"))
    val byVal = margins.groupBy(col("fold"), col("margin"))
      .agg(sum(col("label").cast("long")).as("np_v"),
        sum(lit(1L) - col("label")).as("nn_v"))
    val wLt = Window.partitionBy(col("fold")).orderBy(col("margin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val trainSz = margins.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_fold"))
    val tot = trainSz.agg(sum(col("n_fold")).as("n_all"))
    byVal
      .withColumn("nn_lt", coalesce(sum(col("nn_v")).over(wLt), lit(0L)))
      .groupBy(col("fold"))
      .agg(sum(col("np_v")).as("n_pos"), sum(col("nn_v")).as("n_neg"),
        sum(col("np_v") * (lit(2L) * col("nn_lt") + col("nn_v"))).as("u2"))
      .join(trainSz, Seq("fold"))
      .crossJoin(broadcast(tot)) // 1-row labeled total
      .select(col("fold"), (col("n_all") - col("n_fold")).as("n_train"),
        col("n_pos"), col("n_neg"), col("u2"),
        round(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
      .orderBy(col("fold"))
  }

  /** Operating-point selection for the trained probe — the decision
    * [[probeAuc]] (ranking) and [[probeCalibration]] (honesty) inform
    * but don't make: sweep every distinct step-2 margin as a candidate
    * cut ("keep documents scoring ≥ v"), compute precision / recall /
    * F1 at each from cumulative counts, and return the F1-argmax row —
    * the threshold a curation pipeline would actually deploy, with the
    * counts (predicted-positive set size, true positives) that justify
    * it. F1 = 2·tp / (n_pred + n_pos_total) — ONE division per
    * candidate cut; ties broken toward the HIGHER margin (the stricter
    * filter at equal F1).
    *
    * Scale shape: margins are the labeled SEED's (same bounded-sample
    * argument as [[probeAuc]]); the cumulative sweep is one ordered
    * window over the per-margin-VALUE aggregate (seed-bounded,
    * aggregated — never corpus rows), and the argmax is a
    * TakeOrderedAndProject(1). The positives total broadcasts. */
  def probeThreshold(spark: SparkSession, dir: String): DataFrame = {
    val m = trainProbe(spark, dir)
    val lm = m.labeled.crossJoin(broadcast(m.w2)) // 1-row weight scalar
      .select(col("label").cast("long").as("label"),
        expr("aggregate(zip_with(x, w, (a, b) -> a * b), " +
          "0L, (acc, v) -> acc + v)").as("margin"))
    val byVal = lm.groupBy(col("margin"))
      .agg(count(lit(1)).as("n_v"), sum(col("label")).as("np_v"))
    val totals = byVal.agg(sum(col("np_v")).as("n_pos_total"))
    val wCum = Window.orderBy(col("margin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byVal
      .withColumn("n_pred", sum(col("n_v")).over(wCum))
      .withColumn("tp", sum(col("np_v")).over(wCum))
      .crossJoin(broadcast(totals)) // 1-row scalar
      .select(col("margin"), col("n_pred"), col("tp"),
        round(col("tp").cast("double") / col("n_pred"), 6).as("precision"),
        round(col("tp").cast("double") / col("n_pos_total"), 6).as("recall"),
        round(lit(2.0) * col("tp") /
          (col("n_pred") + col("n_pos_total")), 6).as("f1"))
      .orderBy(col("f1").desc, col("margin").desc)
      .limit(1)
  }

  /** Calibration census of the trained probe — the reliability-diagram
    * companion to [[probeAuc]] (AUC measures ranking; calibration
    * measures whether the probability the filter ACTS on is honest):
    * the step-1 hard-sigmoid predictions σ̂(w₁·x) — exactly the ×16000
    * integer `sgm` the step-2 trainer consumes, no new arithmetic — are
    * bucketed into 8 equal-width probability bins, and each bin reports
    * observed positive rate next to mean predicted probability. A
    * calibrated probe has frac_pos ≈ mean_pred per bin; a filter
    * thresholding raw margins needs exactly this census to pick the
    * operating point. All aggregation is BIGINT (count, Σlabel, Σsgm);
    * the two divisions happen once per of-8-bins output row.
    *
    * Scale shape: one pass over the LABELED seed (bounded sample, as
    * [[probeAuc]]), one 8-group hash aggregation — no window, no join
    * beyond the 1-row broadcast weight scalar. */
  def probeCalibration(spark: SparkSession, dir: String): DataFrame = {
    val m = trainProbe(spark, dir)
    m.labeled.crossJoin(broadcast(m.w1)) // 1-row weight scalar
      .select(col("label").cast("long").as("label"),
        least(greatest(lit(8000L) + lit(2L) * expr(
          "aggregate(zip_with(x, w, (a, b) -> a * b), " +
            "0L, (acc, v) -> acc + v)"), lit(0L)), lit(16000L)).as("sgm"))
      // sgm = 16000 lands in the top bin (least(..., 7))
      .withColumn("bin",
        least(floor(col("sgm").cast("double") / 2000.0).cast("long"), lit(7L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"),
        sum(col("sgm")).as("sum_sgm"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("sum_sgm").cast("double") /
          (col("n") * lit(16000.0)), 6).as("mean_pred"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"))
      .orderBy(col("bin"))
  }

  /** PII redaction census — the compliance pass every training-data
    * pipeline runs before release: emails and long card-like digit runs
    * replaced by typed markers, with per-language counts of what was
    * redacted. The synthetic corpus carries no natural PII, so the
    * query INJECTS it deterministically first (doc_id-derived emails on
    * every 5th doc, a card number on every 7th) — the same
    * prove-the-mechanism-by-injection pattern as
    * [[StreamingAnalytics.streamDedupWatermark]]'s retry replay: the
    * census counts would be zero if the scrub missed, and chars_redacted
    * would go negative if it over-matched.
    *
    * Both regexes are plain character-class patterns with identical
    * semantics in Java regex (Spark codegen) and RE2 (DuckDB); counting
    * is marker-split based (split on a literal), not engine regex-count
    * APIs. Map-side only until the final small rollup — one narrow
    * projection pass over the corpus, no shuffle before the per-lang
    * agg. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val injected = docs.withColumn("t0",
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.test please"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit(" card 4111111111111111 on file")).otherwise(lit(""))))
    val scrubbed = injected
      .withColumn("t1", regexp_replace(col("t0"),
        "[a-z0-9._-]+@[a-z0-9.-]+", "<EMAIL>"))
      .withColumn("t2", regexp_replace(col("t1"),
        "[0-9]{13,19}", "<NUM>"))
    scrubbed
      .select(col("lang"),
        (size(split(col("t2"), "<EMAIL>", -1)) - 1).cast("long")
          .as("n_email"),
        (size(split(col("t2"), "<NUM>", -1)) - 1).cast("long").as("n_num"),
        (length(col("t0")) - length(col("t2"))).cast("long").as("removed"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("n_emails"),
        sum(col("n_num")).as("n_nums"),
        sum(col("removed")).as("chars_redacted"))
      .orderBy(col("lang"))
  }

  /** Exact global rank of `valueCol` (ascending, doc_id tiebreak) via
    * the bucketed two-pass scan — the [[curriculum]] decomposition,
    * now housed in [[Ranks.exactRank]] so every operator family shares
    * one implementation and rank-based statistics never plan a
    * corpus-sized single-partition window. Returns (doc_id, <out>). */
  private def exactRank(spark: SparkSession, df: DataFrame,
      valueCol: String, out: String): DataFrame =
    Ranks.exactRank(spark, df, valueCol, "doc_id", out)

  /** Spearman rank correlation between document LENGTH and the
    * distinct-token-ratio QUALITY signal — the monotone-association
    * audit a filter designer runs before trusting either as a proxy
    * for the other (Pearson, the corr rows, sees only linear
    * association; rank correlation survives any monotone transform).
    * Ranks are DISTINCT ranks with doc_id tiebreak (no tie-averaging —
    * the same convention in both engines), so Σd² is an exact integer
    * and ρ = 1 − 6·Σd²/(n·(n²−1)) has exactly one float step.
    *
    * Scale shape: each rank is an [[exactRank]] bucketed two-pass scan
    * (B-way parallel, never a corpus-sized global window — this is
    * what replaces the textbook ROW_NUMBER() OVER (ORDER BY x) at
    * 100 TB); the two rank relations join back on doc_id and collapse
    * to ONE row. d² squares in DECIMAL (d can reach n, and n²
    * overflows int64 at ~3e9 documents). */
  def spearmanLengthQuality(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val scored = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.distinctTokenCount(col("text")).as("n_uniq"))
      .filter(col("n_tok") > 0)
      .withColumn("score",
        col("n_uniq").cast("double") / col("n_tok").cast("double"))
    val r1 = exactRank(spark, scored.select(col("doc_id"), col("n_tok")),
      "n_tok", "r1")
    val r2 = exactRank(spark, scored.select(col("doc_id"), col("score")),
      "score", "r2")
    r1.join(r2, "doc_id")
      .select((col("r1") - col("r2")).cast("decimal(38,0)").as("d"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("d") * col("d")).as("sum_d2"))
      .select(col("n_docs"), col("sum_d2").cast("long").as("sum_d2"),
        round(lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
          (col("n_docs").cast("double") *
            (col("n_docs").cast("double") * col("n_docs").cast("double")
              - lit(1.0))), 6).as("spearman"))
  }

  /** CCNet-style PERPLEXITY bucKETING (Wenzek et al. 2020): every
    * document scored by its mean token NLL under the train-split
    * add-one unigram LM (the [[TextAnalysis.lmHeldout]] model applied
    * corpus-wide), then cut into head / middle / tail THIRDS by exact
    * global rank — the standard "keep the head, inspect the middle,
    * drop the tail" curation gate, reported per (lang, bucket) with
    * doc and token mass and the token-weighted mean NLL. CCNet's
    * actual LM is a KenLM 5-gram; the bucketing machinery — score,
    * rank, cut at corpus percentiles, act per bucket — is identical
    * and is what this row exercises.
    *
    * Exactness + scale: per-token NLL terms quantize to
    * DECIMAL(28,12) before the per-doc sum (order-independent); the
    * per-doc mean is ONE double division evaluated identically in
    * both engines; the global rank is the bucketed two-pass
    * [[exactRank]] (sampled boundaries → local ranks → offsets — B-way
    * parallel, never a corpus-wide ROW_NUMBER window); the thirds are
    * integer ceil-division cut points; the census is ≤ 3·|langs|
    * rows. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = docs(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        TextAnalysis.splitCol.as("split"))
    val lm = d.filter(col("split") === "train")
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val nv = lm.agg(sum(col("cw")).as("n_train"),
      count(lit(1)).as("v_train"))
    val perDoc = d
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(lm, Seq("w"), "left")
      .crossJoin(broadcast(nv)) // 1-row (N, V) scalar
      .select(col("doc_id"), col("lang"),
        (-log((coalesce(col("cw"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_train") + col("v_train")).cast("double")))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"), sum(col("nll")).as("nll_sum"))
      .withColumn("mean_nll",
        col("nll_sum").cast("double") / col("n_tok").cast("double"))
    val ranked = perDoc.join(
      exactRank(spark, perDoc, "mean_nll", "rk"), "doc_id")
    val tot = perDoc.agg(count(lit(1)).as("n_scored"))
    ranked.crossJoin(broadcast(tot)) // 1-row corpus count
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n_scored"), "a_head")
          .when(col("rk") * 3 <= col("n_scored") * 2, "b_middle")
          .otherwise("c_tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(sum(col("nll_sum")).cast("double") /
          sum(col("n_tok")).cast("double"), 6).as("mean_nll"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Leave-one-SOURCE-out influence — data attribution at the grain a
    * curation team actually acts on (drop/keep/reweight whole sources,
    * not documents): for every source s, the held-out mean NLL of the
    * add-1 unigram LM trained on the train split WITHOUT s, against
    * the full-train baseline. delta_nll > 0 reads "removing s hurts —
    * s carries signal"; delta ≈ 0 reads "redundant"; < 0 reads
    * "s is noise the model is better off without". This is the
    * datamodels/influence-function readout computed EXACTLY, which
    * unigram sufficiency makes affordable: complement-model counts are
    * pure subtractions (c − c_s, N − N_s, V − |exclusive_s|) off ONE
    * (word, source) count pass — 20 retrained models for the price of
    * one corpus scan plus vocabulary-bounded algebra. No gradient
    * approximation needed when the model family is additive.
    *
    * Determinism: [[TextAnalysis.lmHeldout]]'s exact conventions —
    * integer counts, one ln per (heldout word, source) pair quantized
    * to DECIMAL(28,12) BEFORE the occurrence-weighted sum. Scale
    * shape: two corpus passes (train counts by (word, source), heldout
    * word histogram), then every relation is vocabulary- or
    * |sources|-bounded; the heldout-vocab × |sources| expansion is the
    * largest derived relation and is domain-bounded, never
    * corpus-sized. */
  def looInfluence(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        TextAnalysis.splitCol.as("split"))
    val trainTok = docs.filter(col("split") === "train")
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val csw = trainTok.groupBy(col("word"), col("source"))
      .agg(count(lit(1)).as("cs")).localCheckpoint()
    val cw = csw.groupBy(col("word")).agg(sum(col("cs")).as("c"))
    val nv = cw.agg(sum(col("c")).as("n_all"), count(lit(1)).as("v_all"))
    // per-source removal deltas: token mass and exclusive vocabulary
    val perSource = csw
      .join(cw, Seq("word"))
      .groupBy(col("source"))
      .agg(sum(col("cs")).as("n_s"),
        sum((col("cs") === col("c")).cast("long")).as("v_excl"))
    val heldout = docs.filter(col("split") === "test")
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("m"))
    val mTot = heldout.agg(sum(col("m")).as("m_tot"))
    // heldout-vocab x |sources| grid; c' = c - c_s for the left-out s
    val grid = heldout
      .join(cw, Seq("word"), "left")
      .crossJoin(broadcast(perSource.select(col("source"))))
      .join(csw.select(col("word"), col("source"), col("cs")),
        Seq("word", "source"), "left")
      .crossJoin(broadcast(nv))
      .join(broadcast(perSource), Seq("source"))
      .select(col("source"), col("m"),
        (coalesce(col("c"), lit(0L)) - coalesce(col("cs"), lit(0L)))
          .as("c_loo"),
        (col("n_all") - col("n_s")).as("n_loo"),
        (col("v_all") - col("v_excl")).as("v_loo"))
    val nllLoo = grid
      .select(col("source"), col("m"),
        (col("m") * (-log((col("c_loo") + lit(1L)).cast("double") /
          (col("n_loo") + col("v_loo")).cast("double")))
          .cast("decimal(28,12)")).as("nll"))
      .groupBy(col("source"))
      .agg(sum(col("nll")).as("nll_sum"))
    // full-train baseline: same smoothing, nothing removed
    val base = heldout
      .join(cw, Seq("word"), "left")
      .crossJoin(broadcast(nv))
      .select(col("m"),
        (col("m") * (-log((coalesce(col("c"), lit(0L)) + lit(1L))
          .cast("double") /
          (col("n_all") + col("v_all")).cast("double")))
          .cast("decimal(28,12)")).as("nll"))
      .agg(sum(col("nll")).as("base_sum"))
    nllLoo
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(mTot))    // 1-row heldout mass
      .crossJoin(broadcast(base))    // 1-row baseline scalar
      .select(col("source"), col("n_s").as("n_tokens_removed"),
        col("v_excl").as("v_exclusive"),
        round(col("nll_sum").cast("double") / col("m_tot"), 6)
          .as("mean_nll_loo"),
        round((col("nll_sum") - col("base_sum")).cast("double") /
          col("m_tot"), 6).as("delta_nll"))
      .orderBy(col("source"))
  }

  /** Class-BALANCED sampling — [[quotaSample]]'s fixed quota replaced
    * by the DATA-DEPENDENT one every imbalanced-training recipe needs:
    * every language is downsampled to the SMALLEST language's document
    * count, selection by the same md5 hash-priority bottom-k (so the
    * kept set is reproducible, layout-independent, and stable under
    * corpus growth except for boundary displacement). Emits the kept
    * rows (lang, rank, doc_id) — row-level so the oracle pins the
    * exact selection, not just counts.
    *
    * The dynamic k arrives as a 1-row broadcast scalar, which costs
    * the static-quota WindowGroupLimit pushdown ([[quotaSample]]'s
    * plan note): the rank filter here evaluates post-window. A
    * production pipeline that knows its floor class pins k as a
    * literal and gets the pushdown back — this row keeps k honest to
    * the data instead. */
  def balancedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("lang"), col("doc_id"))
    val k = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("k"))
    val pri = md5(concat(lit("balance:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(pri, col("doc_id"))
    d.withColumn("rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(k)) // 1-row floor-class scalar
      .filter(col("rk") <= col("k"))
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }
  /** Neyman-optimal vs proportional stratified-sampling allocation over
    * the language strata — the design readout a corpus sampler computes
    * before drawing [[balancedSample]]'s rows: for a fixed budget of
    * B = 100 draws, the per-stratum allocation n_h ∝ N_h (proportional)
    * against n_h ∝ N_h·S_h (Neyman, variance-optimal), with the
    * resulting stratified-mean variances Σ N_h²S_h²/(n_h·N²) and the
    * efficiency ratio that says what the optimal design buys. The
    * target variable is document length (n_chars).
    *
    * Determinism: per-stratum moments are exact integer sums (Σx, Σx²
    * over BIGINT chars); S_h = √((nΣx²−(Σx)²)/(n(n−1))) is one double
    * expression per stratum; each N_h·S_h weight is quantized to
    * DECIMAL(28,12) before the shared denominator sum, so allocations
    * are order-independent; allocations are REAL-valued by design (the
    * integer apportionment step is a separate concern this census
    * deliberately leaves out).
    *
    * Scale shape: one corpus pass to |strata| rows of exact moments;
    * everything after runs on the strata-bounded relation with 1-row
    * broadcast scalars. */
  def neymanAllocation(spark: SparkSession, dir: String,
      budget: Int = 100): DataFrame = {
    val mom = docs(spark, dir)
      .select(col("lang"), col("n_chars").as("x"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("nh"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      // A singleton stratum (nh = 1) has no sample variance: the n−1
      // denominator would yield 0.0/0.0 = NaN, and the NaN→DECIMAL
      // cast below throws under ANSI mode. Define S_h = 0 for
      // singletons (zero Neyman weight — one observation carries no
      // dispersion signal), matching survey-sampling convention.
      .withColumn("sh", when(col("nh") > 1, sqrt(
        (col("nh") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("nh").cast("double") * (col("nh") - 1).cast("double"))))
        .otherwise(lit(0.0)))
      .withColumn("w", (col("nh").cast("double") * col("sh"))
        .cast("decimal(28,12)"))
    val tot = mom.agg(sum(col("nh")).as("n_pop"), sum(col("w")).as("wt"))
    val alloc = mom.crossJoin(broadcast(tot)) // 1-row totals
      .withColumn("n_prop", lit(budget) * col("nh").cast("double") /
        col("n_pop").cast("double"))
      .withColumn("n_ney", lit(budget) * col("w").cast("double") /
        col("wt").cast("double"))
      .withColumn("vterm_prop",
        (col("nh").cast("double") * col("nh").cast("double") *
          col("sh") * col("sh") /
          (col("n_prop") * col("n_pop").cast("double") *
            col("n_pop").cast("double"))).cast("decimal(28,12)"))
      // A zero-variance stratum draws n_ney = 0; its variance term is
      // identically 0 (the numerator carries sh² = 0), not 0/0.
      .withColumn("vterm_ney",
        when(col("n_ney") > 0,
          (col("nh").cast("double") * col("nh").cast("double") *
            col("sh") * col("sh") /
            (col("n_ney") * col("n_pop").cast("double") *
              col("n_pop").cast("double"))).cast("decimal(28,12)"))
          .otherwise(lit(0.0).cast("decimal(28,12)")))
    val vs = alloc.agg(sum(col("vterm_prop")).as("var_prop"),
      sum(col("vterm_ney")).as("var_ney"))
    alloc.crossJoin(broadcast(vs)) // 1-row design variances
      .select(col("lang"), col("nh"),
        round(col("sh"), 6).as("s_h"),
        round(col("n_prop"), 6).as("n_prop"),
        round(col("n_ney"), 6).as("n_neyman"),
        round(col("var_prop").cast("double"), 6).as("var_prop"),
        round(col("var_ney").cast("double"), 6).as("var_neyman"),
        round(col("var_ney").cast("double") /
          col("var_prop").cast("double"), 6).as("efficiency"))
      .orderBy(col("lang"))
  }
  /** SKYLINE (Pareto-frontier) selection over documents on the
    * (length, lexical-diversity) plane — the multi-objective "best
    * corpus members" operator a curator reaches for when no single
    * quality score exists: a document is on the frontier iff no other
    * document is at least as long AND strictly more diverse (type-
    * token ratio). The classic window formulation: sort by token count
    * descending, keep rows whose quantized TTR strictly exceeds the
    * running maximum — one sort, one window, no pair join (the O(n²)
    * dominance test a naive skyline pays).
    *
    * Dominance compares QUANTIZED DECIMAL(18,9) TTRs, so the frontier
    * membership is bit-stable across engines. The best_prev window
    * orders equal-length rows by ttr DESC (then doc_id) so an
    * equal-length higher-TTR document always PRECEDES the rows it
    * dominates — under a doc_id-only tie-break a dominated doc with a
    * smaller doc_id would never see its dominator in the running max
    * and would wrongly stay on the frontier. doc_id ordering fixes
    * only the emitted rank.
    *
    * Scale note: the running max DECOMPOSES exactly like
    * [[Ranks.exactRank]] (round-13 re-plan — the textbook global
    * window is ONE task holding every document): sample B−1 length
    * boundaries, compute the running max INSIDE each bucket (a
    * partitioned window), and fold in the prefix of whole-bucket
    * maxima (a ≤B-row bounded window) — every row's best_prev is
    * greatest(local running max, previous buckets' max), exactly the
    * single-sort value, B-way parallel. Ties in n_tokens share a
    * bucket by construction, so the ttr-DESC tie handling above stays
    * inside one partitioned window. The emitted frontier rank is an
    * exactRank over the (small, but not provably bounded) frontier. */
  def skylinePareto(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(col("tk")).as("token"))
      .filter(col("token") =!= "")
    val perDoc = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("types"), sum(col("c")).as("n_tokens"))
      .withColumn("ttr", (col("types").cast("double") /
        col("n_tokens").cast("double")).cast("decimal(18,9)"))
      .withColumn("s", (-col("n_tokens")).cast("double"))
      // doc-grain, 4 narrow columns — the bucketed decomposition reads
      // it four times (boundaries, local max, bucket maxima, frontier);
      // without the cut each pass re-runs the token explode
      .localCheckpoint()
    val nB = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pcts = (1 until nB).map(i =>
      (i.toDouble / nB).toString).mkString(", ")
    val bnds = perDoc.agg(expr(
      s"approx_percentile(s, array($pcts))").as("bnds"))
    val b = perDoc.crossJoin(broadcast(bnds)) // 1-row boundary array
      .withColumn("bucket",
        size(filter(col("bnds"), x => x < col("s"))))
      .drop("bnds", "s")
    val wLoc = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens").desc, col("ttr").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrefix = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefMax = b.groupBy(col("bucket"))
      .agg(max(col("ttr")).as("bmax"))
      .withColumn("pmax", max(col("bmax")).over(wPrefix))
      .select(col("bucket"), col("pmax"))
    val frontier = b.join(broadcast(prefMax), Seq("bucket"))
      // greatest() skips NULLs: first bucket + first row == no prev
      .withColumn("best_prev",
        greatest(max(col("ttr")).over(wLoc), col("pmax")))
      .filter(col("best_prev").isNull || col("ttr") > col("best_prev"))
      .withColumn("neg_tokens", (-col("n_tokens")).cast("double"))
      .localCheckpoint() // frontier-sized: feeds the rank's 3 passes
    frontier.join(Ranks.exactRank(spark,
        frontier.select(col("doc_id"), col("neg_tokens")),
        "neg_tokens", "doc_id", "rank0"), Seq("doc_id"))
      .select(col("rank0").cast("int").as("rank"), col("doc_id"),
        col("n_tokens"), col("types"),
        round(col("ttr").cast("double"), 6).as("ttr"))
      .orderBy(col("rank"))
  }
  /** Systematic vs convenience sampling — the estimator-bias lesson
    * every sampling plan encodes, measured: a SYSTEMATIC sample (every
    * 10th document in deterministic md5 order — equivalent to simple
    * random sampling when the order is hash-random) against a
    * CONVENIENCE sample (the first n/10 doc_ids — what a naive "just
    * take the head" pipeline does), each estimating mean document
    * length against the full-population truth. The convenience row's
    * larger error is the operational argument for [[balancedSample]] /
    * [[neymanAllocation]]-style designs.
    *
    * Determinism: the sampling order is the md5 of the doc id (both
    * engines sort the same strings); means are exact integer sums
    * divided once.
    *
    * Plan: each method's doc-grain rank is a [[Ranks.exactRank]]
    * bucketed two-pass scan (round-13 re-plan — the naive global
    * ROW_NUMBER funneled the corpus through ONE task): the md5-order
    * rank buckets on the hash's first-8-nibble NUMERIC prefix (a
    * monotone coarsening of the full-string order, so local rank +
    * bucket offset is exact), the doc_id rank buckets on the id
    * itself. Three aggregate rows come out. */
  def systematicSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("n_chars"))
      .localCheckpoint() // doc-grain, read by 3 branches
    val pop = d.agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .select(lit("population").as("method"), col("n"), col("s"))
    val sysRk = Ranks.exactRankOrdered(spark,
      d.select(col("doc_id"),
        md5(concat(lit("sys:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("hb",
          expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)")),
      "hb", Seq(col("h")), "doc_id", "rk")
    val sys = d.join(sysRk, Seq("doc_id"))
      .filter((col("rk") % 10) === 1)
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .select(lit("systematic").as("method"), col("n"), col("s"))
    val conv = d
      .join(Ranks.exactRank(spark, d.select(col("doc_id")),
        "doc_id", "doc_id", "rk"), Seq("doc_id"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("nt"))))
      .filter(col("rk") <= expr("(nt + 9) div 10"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .select(lit("convenience").as("method"), col("n"), col("s"))
    val popMean = pop.select(
      (col("s").cast("double") / col("n")).as("pm"))
    pop.unionByName(sys).unionByName(conv)
      .crossJoin(broadcast(popMean)) // 1-row truth scalar
      .select(col("method"), col("n"),
        round(col("s").cast("double") / col("n"), 4).as("mean_chars"),
        round(abs(col("s").cast("double") / col("n") - col("pm")), 4)
          .as("abs_error"))
      .orderBy(col("method"))
  }
  /** Information-gain feature ranking of tokens against the language
    * label — the feature-selection pass a quality-probe or router
    * model runs before training ([[Similarity.clusterNmi]]'s mutual
    * information, applied at token level): for each of the 50 highest
    * document-frequency tokens, IG = H(lang) − [p·H(lang|present) +
    * (1−p)·H(lang|absent)] over document-level presence, reporting
    * the top 10. A high-IG token is a language shibboleth; an IG≈0
    * token is corpus boilerplate ([[boilerplatePrefixes]]' cousin,
    * detected statistically).
    *
    * All contingency counts are exact integers (absent counts derived
    * from language totals); every entropy term quantizes to
    * DECIMAL(28,12) before its sum.
    *
    * Plan: one (doc, token) distinct explode (corpus-scale, the only
    * big relation), a 50-row broadcast head, token×lang contingency
    * at vocabulary grain, and a 10-row census. */
  def tokenInfogain(spark: SparkSession, dir: String): DataFrame = {
    val dt = docs(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("token"))
      .filter(col("token") =!= "")
      .select(col("doc_id"), col("lang"), col("token")).distinct()
      .localCheckpoint() // (doc, token) presence relation, read twice
    val langTot = docs(spark, dir).groupBy(col("lang"))
      .agg(count(lit(1)).as("nl"))
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("nd"))
    val head = dt.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(col("df").desc, col("token")).limit(50)
    val pres = dt.join(broadcast(head.select(col("token"))), Seq("token"))
      .groupBy(col("token"), col("lang"))
      .agg(count(lit(1)).as("np"))
    // FULL token x lang grid: a language with zero presence still
    // contributes its absent-side entropy term (na = nl)
    val cells = head.select(col("token"))
      .crossJoin(broadcast(langTot))
      .join(pres, Seq("token", "lang"), "left")
      .select(col("token"), col("lang"),
        coalesce(col("np"), lit(0L)).as("np"),
        (col("nl") - coalesce(col("np"), lit(0L))).as("na"))
    def h(nCol: Column, totCol: Column): Column =
      when(nCol > 0, (nCol.cast("double") / totCol *
        log(totCol.cast("double") / nCol)).cast("decimal(28,12)"))
        .otherwise(lit(0.0).cast("decimal(28,12)"))
    val hLang = langTot.crossJoin(broadcast(nDocs))
      .agg(sum(h(col("nl"), col("nd"))).cast("double").as("h_lang"))
    val perToken = cells
      .join(broadcast(head), Seq("token"))
      .crossJoin(broadcast(nDocs)) // 1-row doc total
      .groupBy(col("token"), col("df"), col("nd"))
      .agg(sum(h(col("np"), col("df"))).cast("double").as("h_pres"),
        sum(h(col("na"), col("nd") - col("df"))).cast("double")
          .as("h_abs"))
    perToken.crossJoin(broadcast(hLang)) // 1-row entropy scalar
      .withColumn("ig",
        col("h_lang") -
          (col("df").cast("double") / col("nd") * col("h_pres") +
            (col("nd") - col("df")).cast("double") / col("nd") *
              col("h_abs")))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("ig").desc, col("token"))))
      .filter(col("rk") <= 10)
      .select(col("rk"), col("token"), col("df"),
        round(col("ig"), 6).as("info_gain"))
      .orderBy(col("rk"))
  }

  /** ρ-filtering (perplexity-ratio data selection) — the
    * classifier-free cousin of [[dsirWeights]] used by real pretraining
    * pipelines: score every document by the mean per-token log-prob
    * RATIO between a TARGET-domain unigram LM (the lexicographically
    * first source — deterministic) and the GENERAL corpus LM, both
    * add-1 smoothed over the SHARED global vocabulary (so an
    * out-of-target token is penalized, not undefined). High ρ means
    * "reads like the target domain"; the top-k census shows how many
    * selected docs actually come from the target — the selection-
    * -works sanity every ρ rollout checks first.
    *
    * Determinism: counts are exact BIGINTs; each token's weighted
    * log-ratio quantizes to DECIMAL(28,12) before the per-doc sum;
    * ranking ties on doc_id.
    *
    * Plan: one token pass to (doc, token, tf) postings; the per-token
    * log-ratio relation is vocabulary-grain and joins into the
    * postings by token (the shuffle every text statistic pays); the
    * per-doc reduce and the top-k window are the only other steps. */
  def rhoSelect(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    val target = toks.agg(min(col("source")).as("tgt"))
    val gen = toks.groupBy(col("token")).agg(count(lit(1)).as("c_gen"))
    val tgtCounts = toks.crossJoin(broadcast(target)) // 1-row target id
      .filter(col("source") === col("tgt"))
      .groupBy(col("token")).agg(count(lit(1)).as("c_tgt"))
    val vocabTot = gen.agg(count(lit(1)).as("v"),
      sum(col("c_gen")).as("n_gen"))
    val tgtTot = tgtCounts.agg(sum(col("c_tgt")).as("n_tgt"))
    val ratio = gen.join(tgtCounts, Seq("token"), "left")
      .crossJoin(broadcast(vocabTot)) // 1-row vocab/total
      .crossJoin(broadcast(tgtTot))   // 1-row target mass
      .select(col("token"),
        (log((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
          (col("n_tgt") + col("v")).cast("double")) -
          log((col("c_gen") + 1).cast("double") /
            (col("n_gen") + col("v")).cast("double"))).as("lr"))
    val perDoc = toks.groupBy(col("doc_id"), col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .join(ratio, Seq("token"))
      .withColumn("term", (col("tf") * col("lr")).cast("decimal(28,12)"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("term")).as("s"))
      .withColumn("rho", col("s").cast("double") /
        col("n_tokens").cast("double"))
    perDoc
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rho").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .crossJoin(broadcast(target))
      .select(col("rk").cast("long").as("rk"), col("doc_id"),
        col("source"), col("n_tokens"),
        round(col("rho"), 6).as("rho"),
        (col("source") === col("tgt")).as("from_target"))
      .orderBy(col("rk"))
  }

  /** Horvitz–Thompson estimation under unequal-probability sampling —
    * the companion to [[neymanAllocation]]'s design arithmetic: each
    * document is included with probability proportional to its length
    * (π_i = min(1, c·n_chars), c chosen so the EXPECTED sample is 100
    * docs), inclusion decided by the deterministic md5 coin every
    * sampling row here uses, and the total corpus character mass is
    * estimated by Σ y_i/π_i over the sample — the estimator that stays
    * unbiased precisely BECAUSE the unequal weights are inverted.
    * Reported per language: true total, HT estimate, relative error,
    * and realized vs expected sample size.
    *
    * Exactness: π is one double expression from exact sums; the
    * md5-uniform is the house 8-hex-digit coin; each y/π term
    * quantizes to DECIMAL(28,12) before the sum.
    *
    * Plan: one pass for the π normalizer, one sampling pass, a
    * per-language reduce. */
  def horvitzThompson(spark: SparkSession, dir: String,
      expectedN: Int = 100): DataFrame = {
    val d = docs(spark, dir).select(col("lang"), col("doc_id"),
      col("n_chars"))
    val tot = d.agg(sum(col("n_chars")).as("mass"),
      count(lit(1)).as("n_docs"))
    val withPi = d.crossJoin(broadcast(tot)) // 1-row normalizer
      .withColumn("pi", least(lit(1.0),
        lit(expectedN.toDouble) * col("n_chars") /
          col("mass").cast("double")))
      .withColumn("u",
        conv(substring(md5(concat(lit("ht:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("double") / lit(4294967296.0))
    val sampled = withPi.filter(col("u") < col("pi"))
      .withColumn("term", (col("n_chars").cast("double") / col("pi"))
        .cast("decimal(28,12)"))
    val perLang = d.groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("true_mass"),
        count(lit(1)).as("n_docs_lang"))
    val expSz = withPi.groupBy(col("lang"))
      .agg(sum(col("pi").cast("decimal(28,12)")).as("exp_n"))
    sampled.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("term")).as("ht_est"))
      .join(perLang, Seq("lang"))
      .join(expSz, Seq("lang"))
      .select(col("lang"), col("n_docs_lang"), col("n_sampled"),
        round(col("exp_n").cast("double"), 2).as("expected_n"),
        col("true_mass"),
        round(col("ht_est").cast("double"), 2).as("ht_estimate"),
        round(abs(col("ht_est").cast("double") -
          col("true_mass").cast("double")) /
          col("true_mass").cast("double"), 4).as("rel_err"))
      .orderBy(col("lang"))
  }

  /** MONETARY-UNIT (dollar-unit / PPS-systematic) SAMPLING — the audit
    * and data-valuation sampler that picks units with probability
    * proportional to their VALUE, not their count: the order book is
    * laid out as a cents number line ([[Ranks.exactCumsum]] — the
    * bucketed two-pass running total, never a single-task global
    * window), a fixed interval I = ⌊total/n⌋ with a deterministic
    * mid-interval start s = ⌊I/2⌋ places n sampling points, and an
    * order is selected once per point inside its (cum−c, cum] span —
    * high-value orders can absorb several points, which IS the PPS
    * property. The census reports, per order priority, the book-value
    * share beside the sampled-point share: their agreement (±1/n
    * quantization) is the readout that certifies the sampler, and the
    * selected-order counts are what an audit team pulls.
    *
    * Determinism: cents are exact integers, the cumulative layout is
    * the exact-decimal kernel, points are integer arithmetic off ONE
    * double floor (total < 2⁵³ — enforced plan-side with
    * `raise_error`, as is total ≥ 2n so the grid PARTITIONS onto the
    * cents line), and span membership is exact decimal
    * comparison — no randomness anywhere (the mid-interval start is
    * the fixed-grid convention, documented rather than drawn).
    *
    * Scale shape: one orders pass to cents grain; the running total
    * is B-way parallel; the 50-point relation broadcasts into a
    * nested-loop probe (linear in orders, 50 comparisons per row);
    * censuses are |priorities| rows. */
  def monetaryUnitSample(spark: SparkSession, dir: String,
      nPoints: Int = 50): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .localCheckpoint() // cents grain; cumsum + census + total reuse it
    val cum = Ranks.exactCumsum(spark, o, "o_orderkey", "c",
      "o_orderkey", "cum")
    val spans = o.join(cum, Seq("o_orderkey"))
    val tot = o.agg(sum(col("c").cast("decimal(38,0)")).as("t"))
    // the 'hits sum to n' invariant needs iv >= 2 (total >= 2*nPoints,
    // else s = 0 and the p = 0 grid point matches no strict span) and
    // total < 2^53 (the one double floor must be exact); outside that
    // envelope fail LOUDLY plan-side instead of silently dropping grid
    // points from the partition
    val iv = tot.select(col("t"),
        floor(col("t").cast("double") / nPoints).cast("long").as("iv0"))
      .select(col("t"),
        when(col("iv0") < 2 ||
            col("t") >= lit("9007199254740992").cast("decimal(38,0)"),
          raise_error(format_string(
            "monetaryUnitSample: total cents %s outside the documented " +
              s"envelope 2*$nPoints <= total < 2^53 (interval %s)",
            col("t").cast("string"), col("iv0").cast("string"))))
          .otherwise(col("iv0")).as("iv"))
      .withColumn("s", floor(col("iv") / 2).cast("long"))
    val pts = iv.select(col("s"), col("iv"),
        explode(sequence(lit(0), lit(nPoints - 1))).as("j"))
      .select((col("s") + col("j") * col("iv"))
        .cast("decimal(38,0)").as("p"))
    val hits = spans
      .join(broadcast(pts),
        col("p") > col("cum") - col("c") && col("p") <= col("cum"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_points_hit"),
        countDistinct(col("o_orderkey")).as("n_selected_orders"))
    val book = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("c").cast("decimal(38,0)")).as("book_cents"))
    book.join(hits, Seq("o_orderpriority"), "left")
      .crossJoin(broadcast(tot)) // 1-row book total
      .select(col("o_orderpriority"), col("n_orders"),
        col("book_cents").cast("long").as("book_cents"),
        round(col("book_cents").cast("double") /
          col("t").cast("double"), 6).as("book_share"),
        coalesce(col("n_points_hit"), lit(0L)).as("n_points_hit"),
        coalesce(col("n_selected_orders"), lit(0L))
          .as("n_selected_orders"),
        round(coalesce(col("n_points_hit"), lit(0L)).cast("double") /
          lit(nPoints.toDouble), 6).as("point_share"))
      .orderBy(col("o_orderpriority"))
  }
}
