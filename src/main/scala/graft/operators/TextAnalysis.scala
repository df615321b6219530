package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExprColumns
import graft.functions.TextFunctions._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting layer a training-data
  * pipeline runs before dedup (north-star §7.5).
  *
  * All are single-pass, shuffle-light (one hash-agg at most), and fully
  * expressible in the DuckDB oracle: tokenization is a plain space split
  * and every ratio is an exact-integer division done in double.
  */
object TextAnalysis {

  /** Per-language token statistics: corpus profiling pass. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), col("n_chars"), tokenCount(col("text")).as("n_tok"),
        distinctTokenCount(col("text")).as("n_uniq"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        (sum(col("n_uniq")).cast("double") / sum(col("n_tok"))).as("avg_ttr"))
      .orderBy(col("lang"))

  /** Per-document quality scoring: stopword ratio, type-token ratio, mean
    * token length, and a bucketed quality label — the filter stage of a
    * pretraining-data pipeline. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"), col("lang"),
        tokenCount(col("text")).as("n_tok"),
        stopwordCount(toks).as("n_stop"),
        distinctTokenCount(col("text")).as("n_uniq"),
        col("n_chars"))
      .select(
        col("doc_id"), col("lang"), col("n_tok"),
        (col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
        (col("n_uniq").cast("double") / col("n_tok")).as("ttr"),
        (col("n_chars").cast("double") / col("n_tok")).as("avg_tok_len"))
      .withColumn("quality",
        when(col("n_tok") < 10, "too_short")
          .when(col("stop_ratio") > 0.5, "boilerplate")
          .when(col("ttr") < 0.3, "repetitive")
          .otherwise("ok"))
      .orderBy(col("doc_id"))
  }

  /** Heuristic language ID via marker words, reported as a confusion
    * matrix against the labeled `lang` column. The markers are shared
    * verbatim with the oracle SQL — determinism is the contract here, not
    * accuracy on this synthetic corpus. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val t = concat(lit(" "), col("text"), lit(" "))
    val pred =
      when(t.contains(" der ") || t.contains(" und ") || t.contains(" die "), "de")
        .when(t.contains(" le ") || t.contains(" la ") || t.contains(" et "), "fr")
        .when(t.contains(" el ") || t.contains(" los ") || t.contains(" que "), "es")
        .when(t.rlike("[\\u4e00-\\u9fff]"), "zh")
        .when(t.contains(" the ") || t.contains(" and ") || t.contains(" of "), "en")
        .otherwise("unknown")
    Tables(spark, dir, "documents")
      .select(col("lang"), pred.as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Prefix-fingerprint near-dup clusters: md5 of the first 64 chars
    * groups documents sharing a long prefix (the corpus's planted
    * near-duplicates). The cheap first-pass signal before MinHash. */
  def fingerprintClusters(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("fp"))

  /** Array-function battery over token arrays: intersection/union sizes
    * against the stopword list, distinct/sort, head slice — the array
    * manipulation surface a document pipeline leans on, all codegen'd
    * built-ins (no explode, no shuffle before the final sort). */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = typedLit(stopwords)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        size(array_intersect(array_distinct(toks), stop)).cast("long")
          .as("n_stop_kinds"),
        size(array_union(array_distinct(toks), stop)).cast("long")
          .as("n_union_stop"),
        array_join(slice(array_sort(array_distinct(toks)), 1, 3), ",")
          .as("first3_sorted"),
        element_at(toks, 1).as("head_tok"),
        element_at(toks, -1).as("tail_tok"))
      .orderBy(col("doc_id"))
  }

  /** Outer-generator semantics: `explode_outer` keeps a NULL row for
    * documents whose shingle set is empty (plain explode silently drops
    * them — the classic lost-rows bug in fan-out pipelines). The oracle
    * computes the same totals arithmetically. */
  def explodeOuterStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExprColumns
    Tables(spark, dir, "documents")
      .select(col("lang"),
        explode_outer(ExprColumns.shingles(spark, "text", 5)).as("shingle"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("shingle")).as("n_shingles"),
        count(when(col("shingle").isNull, 1)).as("n_empty_docs"))
      .orderBy(col("lang"))
  }

  /** BPE-ish subword token counting: alongside the whitespace count, a
    * GPT-2-flavoured pre-tokenizer regex — letter runs, digit runs, and
    * single non-alphanumeric marks (`[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`,
    * ASCII classes so Java regex and DuckDB's RE2 agree; CJK text tokenizes
    * per character, which is the right BPE-ish behaviour for zh). Totals
    * are integer-exact; the ratio divides once at the end. */
  def bpeTokenStats(spark: SparkSession, dir: String): DataFrame = {
    val bpe = regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))
    Tables(spark, dir, "documents")
      .select(col("lang"), col("n_chars"),
        tokenCount(col("text")).as("n_ws"),
        size(bpe).cast("long").as("n_bpe"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("total_ws_tokens"),
        sum(col("n_bpe")).as("total_bpe_tokens"),
        (sum(col("n_chars")).cast("double") / sum(col("n_bpe")))
          .as("chars_per_bpe"))
      .orderBy(col("lang"))
  }

  /** Deterministic train/val/test split assignment — the partitioning
    * step of every training-data pipeline. The split is a pure function
    * of the stable document key (`md5("doc:" <> doc_id)`, first byte:
    * <204 train / <230 val / else test, i.e. ~80/10/10), so it is
    * reproducible across runs, engines, and cluster sizes, needs no
    * shuffle or global sort, and new documents never move existing ones
    * between splits. The salt prefix decouples the split from other
    * hash uses of the same key. Output is the per-split/lang census. */
  /** The [[splitAssign]] decision as a reusable column: train/val/test
    * from the first byte of md5("doc:" <> doc_id). */
  private[operators] def splitCol: Column = {
    val h = md5(concat(lit("doc:"), col("doc_id").cast("string")))
    val b = conv(substring(h, 1, 2), 16, 10).cast("int")
    when(b < 204, "train").when(b < 230, "val").otherwise("test")
  }

  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(splitCol.as("split"), col("lang"), col("n_chars"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))

  /** Train/test contamination check — the leakage audit every eval
    * pipeline needs: near-dup documents (same 64-char-prefix md5
    * fingerprint, the [[DedupOps.levenshteinPairs]] blocking key) that
    * landed in DIFFERENT splits of [[splitAssign]]. Output is the leaked
    * pair/text census per (split, split) direction; a clean corpus
    * returns zero rows.
    *
    * Plan: one narrow scan derives (fingerprint, split), the self-join is
    * an equi-join on the fingerprint (never a cross join), and both the
    * pair count and the distinct-text count come from one aggregate. At
    * 100 TB the fingerprint can be any blocking key already computed for
    * dedup (minhash band, simhash prefix) — the shape is identical. */
  def splitContamination(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("fp"),
        splitCol.as("split"))
    s.as("a").join(s.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
          col("a.split") =!= col("b.split"))
      .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
      .agg(count(lit(1)).as("n_leaked_pairs"),
        countDistinct(col("a.fp")).as("n_leaked_texts"))
      .orderBy(col("split_a"), col("split_b"))
  }

  /** Vocabulary coverage per language — the tokenizer-budget question:
    * what fraction of all token occurrences do the 20 most frequent
    * words cover? Word counts are one hash-agg (map-side combined on the
    * Zipf head); the per-language top-20 selection is a rank window over
    * the VOCABULARY relation (small), not the corpus; coverage divides
    * two exact integer sums once at the end. */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-N is fixed at 20: the output column is named top20_occurrences
    // and the oracle SQL pins the same constant, so a tunable parameter
    // here would only produce a schema that lies about its contents.
    val topN = 20
    val cnt = Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val rk = cnt.withColumn("rn", row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("c").desc, col("w"))))
    rk.groupBy(col("lang"))
      .agg(sum(when(col("rn") <= topN, col("c")).otherwise(0L))
          .as("top20_occurrences"),
        sum(col("c")).as("total_occurrences"))
      .withColumn("coverage", round(col("top20_occurrences").cast("double") /
        col("total_occurrences").cast("double"), 6))
      .orderBy(col("lang"))
  }

  /** Unigram log-probability scoring (the CCNet-style statistical
    * quality signal, next to the heuristic ratios of the quality
    * scorer): the corpus's own unigram LM scores every document by mean
    * token log-prob; the lowest-scoring documents — token distributions
    * far from the corpus — are the junk/outlier review queue this
    * returns (bottom-k with doc_id tiebreak, a total order).
    *
    * Plan: the LM is ONE hash-agg collapsing the token stream to
    * vocabulary size; scoring joins it back on the word key (vocabulary
    * scale, not corpus scale — AQE picks broadcast when it fits) and
    * mean-aggregates per doc. Log-probs are cast to DECIMAL(28,12)
    * before summing so accumulation order can never wobble the mean
    * (ln itself is engine-libm; 12 fractional digits absorb the ulp,
    * same convention as text_pmi). */
  def unigramLogprob(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val lm = tok.groupBy(col("word")).agg(count(lit(1)).as("cw"))
    // corpus token total from the vocabulary-sized lm relation — summing
    // cw is the identical exact count without a third corpus scan+explode
    val tot = lm.agg(sum(col("cw")).cast("double").as("n_total"))
    tok.join(lm, "word")
      .crossJoin(broadcast(tot)) // 1-row corpus total
      .withColumn("lp", log(col("cw").cast("double") / col("n_total")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(sum(col("lp").cast("decimal(28,12)")).cast("double") /
          count(lit(1)), 6).as("mean_logprob"))
      .orderBy(col("mean_logprob"), col("doc_id"))
      .limit(k)
  }

  /** Conditional bigram log-probability scoring — one order up from
    * [[unigramLogprob]], toward the n-gram LM CCNet actually uses: each
    * document's mean `ln P(w_i | w_{i-1})` under the corpus's own
    * add-one-smoothed bigram model, `P = (c(w1,w2)+1) / (c(w1)+V)`.
    * Repetitive docs score HIGH (their own bigrams dominate the model);
    * the bottom-k review queue surfaces the incoherent tail word-salad
    * that unigram frequency alone cannot separate from normal prose.
    *
    * Determinism: each log-prob is a single double division + `ln` of
    * exact-integer operands (bit-identical cross-engine), truncated to
    * DECIMAL(28,12) BEFORE the sum so accumulation order cannot move
    * the mean; ties at the LIMIT boundary break on doc_id.
    *
    * Residual cross-engine risk (r6 advice): the double→DECIMAL(28,12)
    * cast itself is the one step outside IEEE754 — Spark rounds the
    * double's shortest-decimal rendering HALF_UP while DuckDB scales the
    * binary value, so a last-ulp disagreement at the 12th decimal is
    * theoretically possible. Not observed at any tested SF (the oracle
    * gate hash-matches); if it ever flakes at a new scale, gate this
    * query through a within-bound boolean like `approx_stats` instead
    * of the exact hash.
    *
    * Scale: two corpus hash-aggs build the model (bigram and unigram
    * counts — both Zipf-headed, map-side combined), the vocab scalar
    * broadcasts, and the probe is the same posting equi-join every
    * operator here uses. */
  def bigramLogprob(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // model keys (bigram, unigram) are equality-only: one-pass
    // BigramHashPairs emits (bigram fingerprint, xxhash64(w1)) structs so
    // both corpus hash-aggs and both probe joins work on 8-byte keys with
    // no bigram string ever built (same trick as the dedup posting
    // relations; counts — and therefore every logprob — are unchanged
    // under an injective key mapping, and the DuckDB oracle still groups
    // raw text; h1 is bit-identical to the plain xxhash64 the unigram
    // model groups on)
    val bg = docs.select(col("doc_id"),
        explode(ExprColumns.bigramPairs(spark, "text")).as("p"))
      .select(col("doc_id"), col("p.gb").as("gb"), col("p.h1").as("hw1"))
    val cb = bg.groupBy(col("gb")).agg(count(lit(1)).as("cb"))
    val tok = docs.select(explode(split(col("text"), " ")).as("word"))
    val cu = tok.groupBy(xxhash64(col("word")).as("hw")).agg(count(lit(1)).as("cu"))
    // exact distinct-word count = the unigram model's row count — a
    // vocabulary-scale agg over cu, not a second Expand pass over the corpus
    val vocab = cu.agg(count(lit(1)).as("v"))
    bg.join(cb, Seq("gb"))
      .join(cu, col("hw1") === col("hw"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((col("cb") + 1).cast("double") /
        (col("cu") + col("v")).cast("double")).cast("decimal(28,12)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6)
          .as("mean_logprob"))
      .orderBy(col("mean_logprob"), col("doc_id"))
      .limit(k)
  }

  /** Temperature-based dataset mixture weighting — the sampling-rate
    * computation a multilingual/multi-source training run does before
    * reading a single byte of data (p_l proportional to n_l^alpha with
    * alpha = 0.5, the standard low-resource-upweighting mixture; see
    * e.g. the XLM-R recipe): per language, available tokens, mixture
    * weight, the token allocation of a fixed budget, and the implied
    * epochs over that language's data (>1 = oversampled).
    *
    * One hash-agg over the corpus (per-lang token totals are
    * dimension-bounded), then pure arithmetic against the broadcast
    * 1-row grand total — at 100 TB this runs on table statistics in
    * seconds and DRIVES the subsequent sampled scan ([[mixtureApply]]).
    *
    * The alpha weight uses the integer [[floorSqrt]] and an INTEGER
    * z-sum, so every reported double is a single division of two exact
    * integers (deterministic on any engine) — an earlier form summed
    * doubles (`Σ√n`) whose accumulation order is engine- and
    * partitioning-dependent; a last-ulp difference there lands exactly
    * on a `round(...)` boundary often enough to flip the hash gate. */
  /** Integer floor-sqrt of a BIGINT column: one correctly-rounded double
    * `sqrt` plus a one-step downward adjustment. (Correctly-rounded sqrt
    * of an exactly-representable integer can overshoot the true floor by
    * at most one — it equals k exactly at k² and rounding is monotone —
    * so a single `s·s > n` check suffices; both engines share it.) */
  private[operators] def floorSqrt(n: Column): Column = {
    val s0 = floor(sqrt(n.cast("double"))).cast("long")
    when(s0 * s0 > n, s0 - 1).otherwise(s0)
  }

  def mixtureWeights(spark: SparkSession, dir: String,
                     budgetTokens: Long = 50000L): DataFrame = {
    val perLang = Tables(spark, dir, "documents")
      .select(col("lang"), tokenCount(col("text")).as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("s", floorSqrt(col("n_tokens")))
    val tot = perLang.agg(sum(col("s")).as("z")) // exact integer sum
    perLang.crossJoin(broadcast(tot)) // 1-row grand total
      .withColumn("weight",
        round(col("s").cast("double") / col("z").cast("double"), 6))
      .withColumn("target_tokens",
        round((col("s") * budgetTokens).cast("double") /
          col("z").cast("double"), 0).cast("long"))
      .withColumn("epochs",
        round(col("target_tokens").cast("double") /
          col("n_tokens").cast("double"), 4))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("weight"),
        col("target_tokens"), col("epochs"))
      .orderBy(col("lang"))
  }

  /** TF-IDF top terms per document: tf from a per-doc hash-agg, df from a
    * distinct-agg over the posting list, idf joined back by term. The df
    * side is corpus-wide but collapses to one row per TERM (vocabulary-
    * sized, not corpus-sized), and the per-doc ranking window partitions
    * by doc_id, so restricting the reported docs prunes the tf side
    * without touching any other document's ranks. Ties break on the term
    * string, making the top-k fully deterministic. */
  def tfidfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val dfRel = words.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val nTotal = Tables(spark, dir, "documents").agg(count(lit(1)).as("n_total"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("word"))
    tf.join(dfRel, "word")
      .crossJoin(broadcast(nTotal))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_total").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("tfidf"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Overlapping passage chunking via the [[graft.expressions.ChunkWords]]
    * table function (40-word windows, stride 20): the pre-embedding step
    * of a RAG/training corpus build. Chunks stream out of `GenerateExec`
    * without an intermediate array column; text is reported as md5 so the
    * verified relation stays narrow. */
  def textChunks(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), expr("graft_chunk_words(text, 40, 20)"))
      .select(col("doc_id"), col("chunk_idx"),
        md5(col("chunk_text")).as("chunk_md5"), col("n_words"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Lambda higher-order functions over token arrays: `transform` /
    * `filter` / `aggregate` / `exists` composed per row — the declarative
    * array surface (interpreted per element: fine for occasional
    * analytics; hot-path per-token work belongs in a codegen'd custom
    * Expression, see [[graft.expressions.WordShingles]]'s scaladoc). */
  def arrayHof(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        aggregate(transform(col("w"), x => length(x).cast("long")),
          lit(0L), (acc, x) => acc + x).as("total_chars"),
        size(filter(col("w"), x => length(x) > 5)).cast("long").as("n_long"),
        exists(col("w"), x => length(x) > 9).as("has_very_long"),
        array_join(slice(array_sort(array_distinct(
          filter(col("w"), x => length(x) > 6))), 1, 3), ",").as("top_long"))
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling: per-language keep-rates applied
    * via a salted md5 of the stable document key (en 25%, others 50%).
    * Like [[splitAssign]] the decision is a pure row-local function — no
    * shuffle, no global sort, reproducible on any cluster size, and a
    * grown corpus never resamples existing documents. Output is the
    * per-(lang, source) census of the kept sample. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("smp:"), col("doc_id").cast("string")))
    val b = conv(substring(h, 1, 2), 16, 10).cast("int")
    Tables(spark, dir, "documents")
      .filter(b < when(col("lang") === "en", 64).otherwise(128))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Deterministic RESERVOIR sample — exactly k documents per source,
    * uniform without replacement, in bounded memory: every document
    * gets a pseudo-random priority (md5 of a salted stable key — no
    * rand(), so the sample is reproducible on any cluster and any
    * partitioning) and the k smallest priorities per source win. This
    * is Efraimidis–Spirakis A-Res with a hash in place of the RNG: the
    * per-source rank≤k window compiles to WindowGroupLimit, which
    * keeps only ~k rows per partition BEFORE the shuffle — each
    * partition's survivors are a mergeable top-k partial, which is
    * precisely reservoir-sampling's bounded-memory contract at 100 TB
    * (the [[stratifiedSample]] rate-based sibling keeps a FRACTION;
    * this keeps an exact COUNT, the shape an eval-set builder needs).
    * Emits the sample itself (source, rank, doc_id, token count) so
    * the oracle gate pins every selected document, not just a census. */
  def reservoirSample(spark: SparkSession, dir: String,
                      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pr = md5(concat(lit("rsv:"), col("doc_id").cast("string")))
    Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tok"),
        pr.as("pr"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("pr"), col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk").cast("long").as("rk"),
        col("doc_id"), col("n_tok"))
      .orderBy(col("source"), col("rk"))
  }

  /** Bigram collocations by pointwise mutual information: the corpus's
    * strongest adjacent word pairs (lift = P(w1w2)/(P(w1)P(w2)),
    * pmi = ln lift), min pair count 5, top 25.
    *
    * Bigrams derive MAP-SIDE from each document's token array (a
    * `transform` HOF over positions — no positional self-join, no window
    * sort); corpus totals come from two one-row aggregates that broadcast
    * into the scoring join. The only shuffles are the three word-keyed
    * hash aggregations — at 100 TB each is map-side-combined on a
    * Zipf-concentrated vocabulary, the classic word-count shape. The
    * doubles are safe for hash compare: every count is exact, and both
    * engines evaluate the identical division/log expression on identical
    * inputs (precedent: text_tfidf's ln). */
  def bigramPmi(spark: SparkSession, dir: String,
                minCount: Long = 5, topK: Int = 25): DataFrame = {
    val withT = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val bi = withT.select(explode(expr(
      """filter(transform(sequence(1, size(t)),
           i -> struct(element_at(t, i) AS w1, try_element_at(t, i + 1) AS w2)),
         p -> p.w2 IS NOT NULL)""")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val uni = withT.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nUni = withT.agg(sum(size(col("t"))).cast("double").as("n_uni"))
    val nBi = withT.agg(sum(greatest(size(col("t")) - 1, lit(0)))
      .cast("double").as("n_bi"))
    val liftRaw = (col("n_pair").cast("double") / col("n_bi")) /
      ((col("c1").cast("double") / col("n_uni")) *
        (col("c2").cast("double") / col("n_uni")))
    bc.join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .filter(col("n_pair") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"),
        round(liftRaw, 4).as("lift"),
        round(log(liftRaw), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Extractive SELECTION — pick each document's most informative
    * 15-word chunk by mean corpus IDF (the TextRank-zero baseline every
    * extractive summarizer is judged against, and the snippet picker a
    * search index ships first). IDF is trained corpus-wide
    * (ln(N/df), deterministic double quantized to DECIMAL before the
    * per-chunk mean); the demo emits the winning chunk for doc_id < 20
    * with its token count and score; ties break to the earliest chunk.
    *
    * Plan: one (word → df) vocabulary agg joined back onto the
    * positional token relation (the corpus pass), per-doc rank-1
    * windows over chunk-count-bounded partitions. */
  def extractivePick(spark: SparkSession, dir: String, p: Int = 15): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val tok = docs.select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    val df = tok.select(col("doc_id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tok.filter(col("doc_id") < 20)
      .join(df, "w")
      .crossJoin(broadcast(nDocs)) // 1-row corpus size
      .select(col("doc_id"), (col("pos") / p).cast("long").as("pidx"),
        log(col("n").cast("double") / col("df").cast("double"))
          .cast("decimal(28,12)").as("idf"))
      .groupBy(col("doc_id"), col("pidx"))
      .agg(count(lit(1)).as("n_words"),
        (sum(col("idf")).cast("double") / count(lit(1))).as("raw"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("raw").desc, col("pidx"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("pidx").as("chunk_idx"), col("n_words"),
        round(col("raw"), 6).as("score"))
      .orderBy(col("doc_id"))
  }

  /** Data-driven STOPWORD discovery — replaces the fixed 10-word list
    * ([[graft.functions.TextFunctions.stopwords]]) with the corpus's
    * own evidence: a term is stopword-like when it appears in at least
    * half of all documents (df·2 ≥ N, integer predicate) AND is
    * dispersed rather than bursty. Emits the candidate list with
    * document-frequency share, mean per-doc count, and the
    * [[burstiness]] VMR so the consumer can threshold on dispersion.
    *
    * Same (doc, token) hash-agg + vocabulary re-agg envelope as
    * burstiness; the census is bounded by the (tiny) set of terms that
    * clear the df gate. */
  def stopwordDiscovery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
    tf.groupBy(col("token"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("sq"))
      .crossJoin(broadcast(nDocs)) // 1-row corpus size
      .filter(col("df") * 2 >= col("n_docs"))
      .select(col("token"), col("df"),
        round(col("df").cast("double") / col("n_docs"), 4).as("df_share"),
        round(col("total").cast("double") / col("n_docs"), 6).as("mean_c"),
        round((col("sq").cast("double") / col("n_docs") -
          (col("total").cast("double") / col("n_docs")) *
          (col("total").cast("double") / col("n_docs"))) /
          (col("total").cast("double") / col("n_docs")), 4).as("vmr"))
      .orderBy(col("df").desc, col("token"))
  }

  /** Dunning log-likelihood-ratio collocations — the robust upgrade of
    * [[bigramPmi]] (PMI over-scores rare pairs; LLR's 2×2 contingency
    * test is the standard collocation-mining statistic precisely
    * because it stays calibrated at low counts): for each bigram, the
    * G² statistic over (pair, w1-without-w2, w2-without-w1, neither)
    * with marginals taken from the bigram relation itself. Top 25 by
    * G², min pair count 5, ties broken lexically.
    *
    * Every cell count is an exact integer; each k·ln(k·N/(R·C)) term is
    * one deterministic double expression per ROW (never a float
    * accumulation), written identically in the oracle. One bigram
    * explode, three vocabulary-sized aggs, two joins on the word key. */
  def bigramLlr(spark: SparkSession, dir: String,
                minCount: Long = 5, topK: Int = 25): DataFrame = {
    val withT = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val bi = withT.select(explode(expr(
      """filter(transform(sequence(1, size(t)),
           i -> struct(element_at(t, i) AS w1, try_element_at(t, i + 1) AS w2)),
         p -> p.w2 IS NOT NULL)""")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("a"))
    val firsts = bi.groupBy(col("w1")).agg(count(lit(1)).as("r1"))
    val seconds = bi.groupBy(col("w2")).agg(count(lit(1)).as("c1"))
    val nBi = withT.agg(sum(greatest(size(col("t")) - 1, lit(0)))
      .cast("long").as("nn"))
    def term(k: Column, row: Column, colm: Column): Column =
      when(k > 0, k.cast("double") *
        log((k.cast("double") * col("nn").cast("double")) /
          (row.cast("double") * colm.cast("double"))))
        .otherwise(lit(0.0))
    bc.join(firsts, "w1").join(seconds, "w2")
      .crossJoin(broadcast(nBi)) // 1-row bigram total
      .filter(col("a") >= minCount)
      .withColumn("k12", col("r1") - col("a"))
      .withColumn("k21", col("c1") - col("a"))
      .withColumn("k22", col("nn") - col("r1") - col("c1") + col("a"))
      .select(col("w1"), col("w2"), col("a").as("n_pair"),
        round(lit(2.0) * (
          term(col("a"), col("r1"), col("c1")) +
          term(col("k12"), col("r1"), col("nn") - col("c1")) +
          term(col("k21"), col("nn") - col("r1"), col("c1")) +
          term(col("k22"), col("nn") - col("r1"), col("nn") - col("c1"))),
          4).as("llr"))
      .orderBy(col("llr").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Unicode normalization pipeline ([[graft.expressions.NormalizeText]])
    * over deterministically-decorated text: the ASCII corpus is prefixed
    * with decomposed accents (e + U+0301, i + U+0308) so NFC composition,
    * accent stripping, and case folding all do real work the oracle
    * (DuckDB nfc_normalize / strip_accents / lower) verifies char-exact.
    * Narrow map, no shuffle — the normalize-before-tokenize stage of a
    * crawl pipeline. */
  def unicodeNormalize(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    // combining acute / diaeresis as Scala literals: Spark's SQL char() is
    // ASCII-mod-256, NOT a codepoint constructor like DuckDB's chr()
    val raw = concat(lit("Cafe\u0301 nai\u0308ve "),
      substring(col("text"), 1, 40))
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"),
        length(col("raw")).as("len_raw"),
        expr("graft_normalize_text(raw, 'nfc')").as("nfc"))
      .select(col("doc_id"), col("len_raw"),
        length(col("nfc")).as("len_nfc"),
        md5(col("nfc")).as("nfc_md5"),
        expr("graft_normalize_text(graft_normalize_text(nfc, 'strip_accents'), 'casefold')")
          .as("folded"))
      .withColumn("folded", substring(col("folded"), 1, 24))
      .orderBy(col("doc_id"))
  }

  /** Mixture APPLICATION — [[mixtureWeights]] plans per-language
    * sampling rates; this operator executes them as a deterministic,
    * engine-reproducible resampling pass: every document receives
    * `copies = floor(epochs) + (u < frac(epochs) ? 1 : 0)` where
    * `epochs = target_tokens / n_tokens` for its language and `u` is the
    * document's own md5-derived uniform. Oversampled languages
    * (epochs > 1) repeat documents; undersampled ones keep a hash-chosen
    * subset. Output is the per-language census of what the sampled
    * corpus would contain.
    *
    * EXACT INTEGER throughout, unlike the planning query's rounded
    * doubles: the alpha=0.5 weight uses the integer floor-sqrt of the
    * token count (one correctly-rounded `sqrt` plus a one-step
    * adjustment, identical in both engines), `z = SUM(s)` is an integer
    * sum (order-independent — a double Σ√n would differ in the last ulp
    * between engines and flip hash-threshold comparisons), the budget
    * allocation is integer division, and the Bernoulli test
    * `u32 · n_tokens < rem · 2^32` cross-multiplies in DECIMAL(18,0) —
    * products stay under 33 digits at any corpus size, so nothing
    * overflows at 100 TB where n_tokens is ~2^45.
    *
    * Scale: one hash-agg for the per-language totals, the (tiny) rate
    * relation broadcasts back onto the corpus scan, and the census is a
    * second dimension-bounded agg. The per-document decision is a pure
    * projection — this is exactly how a 1000-executor sampled read
    * stays reproducible under any partitioning. */
  def mixtureApply(spark: SparkSession, dir: String,
                   budgetTokens: Long = 50000L): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), tokenCount(col("text")).as("n_tok"))
    val perLang = docs.groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("s", floorSqrt(col("n_tokens")))
    val z = perLang.agg(sum(col("s")).as("z"))
    val rates = perLang.crossJoin(broadcast(z))
      .withColumn("target_tokens", expr(s"($budgetTokens * s) div z"))
      .withColumn("n_full", expr("target_tokens div n_tokens"))
      .withColumn("rem", expr("target_tokens % n_tokens"))
      .select(col("lang"), col("n_tokens"), col("target_tokens"),
        col("n_full"), col("rem"))
    val u32 = conv(substring(md5(concat(lit("mix:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("decimal(18,0)")
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("copies", col("n_full") +
        when(u32 * col("n_tokens").cast("decimal(18,0)") <
          col("rem").cast("decimal(18,0)") * lit(4294967296L).cast("decimal(18,0)"),
          1L).otherwise(0L))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("n_tokens"),
        max(col("target_tokens")).as("target_tokens"),
        sum(col("copies")).as("n_sampled_rows"),
        sum(col("copies") * col("n_tok")).as("sampled_tokens"))
      .orderBy(col("lang"))
  }

  /** Repetition filter — the Gopher-style "repetitive document" signals
    * every pretraining-data pipeline applies before dedup: per document,
    * the fraction of tokens covered by its single most frequent bigram
    * (`2·max_bigram_count / n_tok`, flagged above 0.2) and the fraction
    * of trigram occurrences whose trigram repeats within the document
    * (flagged above 0.3). Reported per source as flag counts plus the
    * micro-averaged fractions.
    *
    * Determinism contract: every per-document threshold is evaluated
    * CROSS-MULTIPLIED in exact integers (`10·max_bg > n_tok`,
    * `10·dup_tri > 3·n_tri`), and the micro fractions divide two exact
    * BIGINT sums once at the end — no per-doc double ever enters an
    * aggregate, so shuffle order cannot wiggle the hash compare.
    *
    * Scale: the k-gram explode is corpus-token-sized but partitions by
    * doc_id, the (doc, gram) counts are map-side combined in CODEGEN'd
    * hash aggregation, and every later relation is document- then
    * source-cardinality. A shuffle-free alternative — per-row sorted-run
    * `aggregate` HOFs over each doc's gram array — was A/B-measured at
    * sf0.1 (warm, same JVM, alternating): explode 2.1-2.6s vs HOF
    * 3.9-4.1s. Spark's HOF lambdas evaluate interpreted per element, so
    * the "no shuffle" plan loses to codegen by ~1.8x; keeping the
    * measured winner. */
  /** Positional k-gram fingerprint column ([[graft.expressions
    * .WordGramHashes]]) — every gram consumer below is equality-only
    * (count maps, posting lists, semi-joins), so the one-pass hashed-long
    * form replaces the gram STRINGS the composed `grams()` built (k-1
    * appends + an alloc per window through interpreted HOFs); the DuckDB
    * oracles keep grouping raw gram text and agree, a standing collision
    * check on every round's gate. */
  private def gramHashCol(docs: DataFrame, k: Int): Column = {
    ExprColumns.register(docs.sparkSession)
    expr(s"graft_gram_hashes(text, $k)")
  }

  /** Per-doc count of the most frequent bigram — one (doc, gram)
    * hash-agg; shared by [[repetitionFilter]] and [[curationPipeline]]
    * so a threshold or gram-shape fix can never diverge between them. */
  private def maxBigramCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(gramHashCol(docs, 2)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_bg"))

  /** Per-doc trigram occurrence total and duplicated-occurrence mass. */
  private def trigramDupStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(gramHashCol(docs, 3)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tri"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tri"))

  /** Distinct k-gram set of `docs` (the broadcastable benchmark side). */
  private[operators] def distinctGramSet(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(array_distinct(gramHashCol(docs, k))).as("g"))
      .distinct()

  /** doc_ids of `docs` sharing any k-gram with the (broadcast) benchmark
    * gram set — shared by [[decontaminate]] and [[curationPipeline]].
    * Both sides carry grams as hashed-long fingerprints: the gram is only
    * ever compared for equality, and a ~80-char 13-gram string costs ~10x
    * the broadcast bytes and hash-probe work of an 8-byte key — at
    * 100 TB the benchmark set's broadcast size is the binding
    * constraint on this join. The DuckDB oracles join raw gram text and
    * agree, a standing collision check. */
  private[operators] def contaminatedDocIds(docs: DataFrame,
      bench: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(gramHashCol(docs, k))).as("g"))
      .join(broadcast(bench), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()

  def repetitionFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val base = docs.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tok"))
    // left joins: a <2-token doc has no bigrams at all (explode drops the
    // empty array) but must still count toward n_docs.
    base
      .join(maxBigramCounts(docs), Seq("doc_id"), "left_outer")
      .join(trigramDupStats(docs), Seq("doc_id"), "left_outer")
      .select(col("source"), col("n_tok"),
        coalesce(col("max_bg"), lit(0L)).as("max_bg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("dup_tri"), lit(0L)).as("dup_tri"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("max_bg") * 10 > col("n_tok"), 1L).otherwise(0L))
          .as("n_flag_top2"),
        sum(when(col("dup_tri") * 10 > col("n_tri") * 3, 1L).otherwise(0L))
          .as("n_flag_dup3"),
        round(sum(col("max_bg") * 2).cast("double") /
          sum(col("n_tok")).cast("double"), 6).as("top2_frac_micro"),
        // n_tok >= 1 always (split("") is [""]), but a source whose docs
        // all have < 3 tokens has zero trigram mass — under ANSI mode the
        // unguarded 0/0 THROWS (found by TextEdgeCorpusSpec), so emit
        // NULL, and the oracle SQL carries the same CASE.
        when(sum(col("n_tri")) > 0,
          round(sum(col("dup_tri")).cast("double") /
            sum(col("n_tri")).cast("double"), 6)).as("dup3_frac_micro"))
      .orderBy(col("source"))
  }

  /** Sequence packing census — GPT-style sample packing: per source,
    * documents are concatenated in doc_id order and the token stream is
    * cut into fixed 256-token context windows; a document belongs to the
    * window holding its FIRST token. Output is the docs-per-window
    * histogram (how many windows start 1 doc, 2 docs, …) with the token
    * mass starting in them — the packing-efficiency question asked when
    * sizing a pretraining shard layout.
    *
    * The assignment is pure integer math both engines share: window =
    * (cumsum - n_tok) integer-div 256 over a per-source running sum.
    * Scale: the running sum partitions by source (the physical shard key
    * at 100 TB — packing never crosses shards, exactly as a real loader
    * packs within files), so no global single-partition window exists;
    * the histogram aggregates window- then count-cardinality relations. */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 256): DataFrame =
    packCensus(Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        tokenCount(col("text")).as("n_tok")), budget)

  /** Shared packing census over per-document token LENGTHS (`source`,
    * `doc_id`, `n_tok`): lengths fully determine the fixed-window cut —
    * the window of a document's first token is (cumsum − n_tok) div
    * budget, so the census never materializes the token stream itself. */
  private[operators] def packCensus(docLens: DataFrame, budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docLens
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("win", expr(s"(cum - n_tok) div $budget"))
      .groupBy(col("source"), col("win"))
      .agg(count(lit(1)).as("docs_in_win"), sum(col("n_tok")).as("tok_start"))
      .groupBy(col("docs_in_win"))
      .agg(count(lit(1)).as("n_windows"), sum(col("tok_start")).as("sum_tokens"))
      .orderBy(col("docs_in_win"))
  }

  /** BPE tokenizer → packer integration (the real pretraining shard
    * shape: documents are SEGMENTED with the learned merge table first,
    * and the packing windows cut the resulting subword stream, not the
    * whitespace stream [[packSequences]] cuts). Per document, each token
    * occurrence joins the trained vocabulary for its post-merge subword
    * count; tokens outside the trained vocabulary (punctuation, digits —
    * the trainer's `^[a-z]+$` domain) pass through as ONE atomic token,
    * the untrained-fallback every production encoder has. The summed
    * per-document BPE length then feeds the identical fixed-256 census
    * as [[packSequences]] — so the two rows differ exactly by what the
    * tokenizer bought.
    *
    * Scale shape: merge learning stays on the frequency-weighted
    * vocabulary ([[bpeMergeLearn]]); segmentation is one corpus
    * token-explode pass joined to the vocabulary-sized merge table
    * (Catalyst/AQE picks broadcast vs shuffle by stats — subword counts
    * per distinct word, never per-occurrence state), and the census'
    * running sum partitions by `source` (the physical shard key), never
    * a global window. Token ORDER within a document never needs to
    * materialize: window assignment depends only on each document's
    * length and its predecessors' cumulative length. */
  def bpePackSequences(spark: SparkSession, dir: String,
                       rounds: Int = 6, budget: Int = 256): DataFrame = {
    val (_, syms, _) = bpeTrain(spark, dir, rounds)
    val wordTok = syms
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    val docLens = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("source"), col("doc_id"), lower(col("tok")).as("w"))
      .join(wordTok, Seq("w"), "left")
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(coalesce(col("n_sub"), lit(1L))).as("n_tok"))
    packCensus(docLens, budget)
  }

  /** 13-gram decontamination census — the GPT-3-style eval-leakage
    * audit: a TRAIN document is contaminated when any of its distinct
    * 13-token grams also occurs in any TEST document. Where
    * [[splitContamination]] catches whole near-duplicate documents
    * (prefix fingerprints), this catches PARTIAL overlap — a benchmark
    * question quoted inside an otherwise-unique page — which is exactly
    * what the fingerprint pass misses. Output is the per-source census
    * (train docs, contaminated count); the removal itself is the same
    * relation used as an anti-join build side.
    *
    * Scale shape: the benchmark side is eval-set-sized (tiny against a
    * 100 TB corpus), so its distinct gram set BROADCASTS and the train
    * side never shuffles — one corpus scan, a broadcast semi-join on the
    * gram string, one distinct per doc, one dimension-bounded agg. The
    * distinct-before-join (`array_distinct`) keeps the exploded train
    * relation at most corpus-token-sized. */
  /** Decontamination n-gram-SIZE sweep — the knob [[decontaminate]]
    * fixes at 13, measured instead of inherited: for n ∈ {7, 13, 20},
    * how many train documents share any n-gram with the test split and
    * what token mass they carry. Small n = aggressive (catches
    * paraphrase-adjacent overlap, drops more clean data); large n =
    * conservative (verbatim-only). The 13 in every decontamination
    * paper is a judgment call — this row shows what it costs on THIS
    * corpus, the [[DedupOps.shingleSweep]] discipline applied to the
    * contamination gate.
    *
    * Scale shape: per n, one benchmark distinct-gram broadcast build
    * and one train-side semi-join ([[contaminatedDocIds]]'s hashed-gram
    * machinery verbatim — the sweep reuses the production kernel, so
    * it can never drift from the gate it tunes); censuses are ≤1-row
    * each, unioned into 3 rows. */
  def contaminationSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val train = docs.filter(splitCol === "train")
    val test = docs.filter(splitCol === "test")
    val toks = train.select(col("doc_id"),
      tokenCount(col("text")).as("n_tok"))
    val tot = toks.agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"))
    Seq(7, 13, 20).map { n =>
      contaminatedDocIds(train, distinctGramSet(test, n), n)
        .join(toks, "doc_id")
        .agg(count(lit(1)).as("n_contam_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).as("contam_tokens"))
        .crossJoin(broadcast(tot)) // 1-row corpus totals
        .select(lit(n.toLong).as("n_gram"), col("n_contam_docs"),
          col("contam_tokens"),
          round(col("contam_tokens").cast("double") /
            col("nt").cast("double"), 6).as("token_share"))
    }.reduce(_.union(_)).orderBy(col("n_gram"))
  }

  def decontaminate(spark: SparkSession, dir: String, k: Int = 13): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), splitCol.as("split"), col("text"))
    val train = docs.filter(col("split") === "train")
    val contaminated = contaminatedDocIds(train,
        distinctGramSet(docs.filter(col("split") === "test"), k), k)
      .join(train.select(col("doc_id"), col("source")), Seq("doc_id"))
    train.groupBy(col("source")).agg(count(lit(1)).as("n_train"))
      .join(contaminated.groupBy(col("source"))
          .agg(count(lit(1)).as("n_contaminated")),
        Seq("source"), "left_outer")
      .select(col("source"), col("n_train"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .orderBy(col("source"))
  }

  /** MIN-K%-PROB contamination detector (r16 verdict item 8) — the
    * PARAPHRASE-class rung above the n-gram-exact decontamination
    * family ([[decontaminate]] / [[contaminationSweep]] catch verbatim
    * 13-gram overlap and nothing else): score each TEST-split document
    * under the TRAIN-split interpolated Kneser–Ney bigram LM
    * ([[knBigram]]'s exact machinery — same formula, same
    * DECIMAL(28,12) quantization), take per document the mean NLL of
    * its `kPct`% HIGHEST-NLL scored bigrams (= the k% LOWEST token
    * probabilities — Shi et al.'s min-k% signal), and flag documents
    * whose min-k mean NLL is anomalously LOW against the split
    * baseline (below mean − 1·stddev): even this document's hardest
    * bigrams are predicted well, so its content leaked into train in
    * some form — including word-substituted paraphrases that break
    * every 13-gram. The readout censuses the overlap with the exact
    * detector run on the SAME side (test docs sharing any 13-gram with
    * the train split): `n_mink_only` is what the paraphrase-class
    * detector catches that the exact one misses.
    *
    * Exactness: NLLs quantize to DECIMAL(28,12) at scoring (knBigram's
    * convention), the per-doc min-k mean quantizes to DECIMAL(18,9)
    * (the retrievalPanelCi convention: its square is precision 37 —
    * exact in both engines), k = (n·kPct + 99) div 100 is pure integer
    * math, the per-doc rank window partitions by doc_id (bounded), and
    * the flag threshold is a broadcast 1-row scalar — no global rank.
    *
    * Scale shape: the LM build is [[knBigram]]'s bigram-type shuffle;
    * scoring is one test-split pass against the vocabulary-sized count
    * relations; the exact-gram side broadcasts the eval-split gram set
    * with doc ids ([[decontaminate]]'s broadcast discipline — the eval
    * split is the small side at 100 TB) through ONE train-corpus scan;
    * censuses are source-bounded. */
  def minkProbContamination(spark: SparkSession, dir: String,
      kPct: Int = 20, discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), splitCol.as("split"),
        split(col("text"), " ").as("tk"), col("text"))
    val train = d.filter(col("split") === "train")
    val test = d.filter(col("split") === "test")
    def bigrams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(expr(
        """transform(slice(tk, 1, greatest(size(tk) - 1, 0)),
             (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2,
               i AS pos))"""))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"),
        col("b.pos").as("pos"))
    val pc = bigrams(train)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      // lazy: the count relation feeds ctx/cont/n1all + scoring
      // (window-free interior; consumers join by key, sizes honest)
      .localCheckpoint(false)
    val ctx = pc.groupBy(col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1w1"))
    val cont = pc.groupBy(col("w2")).agg(count(lit(1)).as("n1w2"))
    val n1all = pc.agg(count(lit(1)).as("n1all"))
    val scored = bigrams(test)
      .join(pc, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(n1all)) // 1-row bigram-type total
      .filter(col("cw1").isNotNull && col("n1w2").isNotNull)
      .withColumn("nll", (-log(
        greatest(coalesce(col("c"), lit(0L)).cast("double") -
          discount, lit(0.0)) / col("cw1").cast("double") +
          lit(discount) * col("n1w1").cast("double") /
            col("cw1").cast("double") *
            (col("n1w2").cast("double") / col("n1all").cast("double"))
      )).cast("decimal(28,12)"))
      .localCheckpoint(false) // test-split bigram scores: rank + count
    val nDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_scored"))
    val mink = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("nll").desc, col("pos")))) // per-doc bounded
      .join(nDoc, Seq("doc_id"))
      .filter(col("rk") <= expr(s"(n_scored * $kPct + 99) div 100"))
      .groupBy(col("doc_id"))
      .agg(sum(col("nll")).as("nll_sum"), count(lit(1)).as("k_used"))
      .select(col("doc_id"),
        (col("nll_sum").cast("double") / col("k_used").cast("double"))
          .cast("decimal(18,9)").as("m"))
      .localCheckpoint(false) // |test docs| grain: stats + flags
    val stats = mink.agg(count(lit(1)).as("nd"),
      sum(col("m")).as("sm"), sum(col("m") * col("m")).as("smm"))
      .select(col("nd"),
        (col("sm").cast("double") / col("nd").cast("double"))
          .as("mean_m"),
        when(col("nd") > 1, sqrt(
          (col("smm").cast("double") - col("sm").cast("double") *
            col("sm").cast("double") / col("nd").cast("double")) /
            (col("nd").cast("double") - 1.0))).as("sd_m"))
    val flagged = mink.crossJoin(broadcast(stats)) // 1-row baseline
      .select(col("doc_id"), col("m"),
        (col("sd_m").isNotNull &&
          col("m").cast("double") < col("mean_m") - col("sd_m"))
          .as("mink_flag"))
    // exact 13-gram detector on the SAME side: test docs sharing any
    // gram with the train split — the eval-split gram set (with doc
    // ids) broadcasts; the train corpus is scanned once, never shuffled
    val testGrams = test.select(col("doc_id"),
      explode(array_distinct(gramHashCol(test, 13))).as("g"))
    val exactHit = train
      .select(explode(array_distinct(gramHashCol(train, 13))).as("g"))
      .join(broadcast(testGrams), Seq("g"))
      .select(col("doc_id")).distinct()
      .withColumn("exact_flag", lit(true))
    test.select(col("doc_id"), col("source"))
      .join(flagged, Seq("doc_id"), "left")
      .join(exactHit, Seq("doc_id"), "left")
      .select(col("source"),
        col("doc_id"), col("m"),
        coalesce(col("mink_flag"), lit(false)).as("mk"),
        coalesce(col("exact_flag"), lit(false)).as("ex"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_test"),
        sum(col("m").isNotNull.cast("long")).as("n_scored_docs"),
        sum(col("ex").cast("long")).as("n_exact"),
        sum(col("mk").cast("long")).as("n_mink"),
        sum((col("mk") && col("ex")).cast("long")).as("n_both"),
        sum((col("mk") && !col("ex")).cast("long")).as("n_mink_only"),
        // guarded: a source whose test docs all score OOV has zero
        // scored mass — the unguarded 0/0 would throw under ANSI
        when(sum(col("m").isNotNull.cast("long")) > 0,
          round(sum(col("m")).cast("double") /
            sum(col("m").isNotNull.cast("long")).cast("double"), 6))
          .as("mean_mink_nll"))
      .orderBy(col("source"))
  }

  /** Curation capstone — the full gate sequence a pretraining corpus
    * runs, with per-stage drop attribution: train-split documents pass
    * (1) the quality gate (length / stopword ratio / type-token ratio),
    * (2) the repetition gate ([[repetitionFilter]]'s thresholds),
    * (3) exact dedup (keep the min doc_id per md5(text), computed over
    * the GATE-SURVIVING population — a dropped doc can't claim keeper
    * status), and (4) 13-gram decontamination against the test split
    * ([[decontaminate]]'s relation). Output per source: the census of
    * where documents died, surviving token mass, and the 256-token
    * context windows those survivors fill (next-fit with straddling =
    * `ceil(tokens/256)` exactly).
    *
    * Each document is attributed to its FIRST failing stage (a
    * when-chain over the flag columns), so stage counts always sum to
    * n_train. Every gate predicate is integer cross-multiplied
    * (`2·n_stop > n_tok`, `10·n_uniq < 3·n_tok`, the repetition pair,
    * window count `(tokens+255) div 256`) — the whole result is exact
    * BIGINT, immune to shuffle order.
    *
    * Scale: reuses only blocked/broadcast shapes proven by the component
    * operators — gram hash-aggs partition by doc_id, the benchmark gram
    * set broadcasts, the keeper relation is an equi-join on the exact
    * hash, and the final census is source-cardinality. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val train = docs.filter(splitCol === "train")
    val toks = tokens(col("text"))
    val perDoc = train.select(col("doc_id"), col("source"),
      md5(col("text")).as("fp_exact"),
      tokenCount(col("text")).as("n_tok"),
      stopwordCount(toks).as("n_stop"),
      distinctTokenCount(col("text")).as("n_uniq"))
    val contaminated = contaminatedDocIds(train,
        distinctGramSet(docs.filter(splitCol === "test"), 13), 13)
      .withColumn("is_contam", lit(true))
    val flags = perDoc
      .join(maxBigramCounts(train), Seq("doc_id"), "left_outer")
      .join(trigramDupStats(train), Seq("doc_id"), "left_outer")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("source"), col("fp_exact"), col("n_tok"),
        (col("n_tok") < 10 || col("n_stop") * 2 > col("n_tok") ||
          col("n_uniq") * 10 < col("n_tok") * 3).as("q_fail"),
        (coalesce(col("max_bg"), lit(0L)) * 10 > col("n_tok") ||
          coalesce(col("dup_tri"), lit(0L)) * 10 >
            coalesce(col("n_tri"), lit(0L)) * 3).as("rep_fail"),
        coalesce(col("is_contam"), lit(false)).as("contam"))
    // exact-dup keeper among gate-1/2 survivors only
    val keeper = flags.filter(!col("q_fail") && !col("rep_fail"))
      .groupBy(col("fp_exact")).agg(min(col("doc_id")).as("keeper_id"))
    val staged = flags.join(keeper, Seq("fp_exact"), "left_outer")
      .withColumn("stage",
        when(col("q_fail"), "drop_quality")
          .when(col("rep_fail"), "drop_repetition")
          .when(col("doc_id") =!= col("keeper_id"), "drop_duplicate")
          .when(col("contam"), "drop_contaminated")
          .otherwise("kept"))
    staged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("stage") === "drop_quality", 1L).otherwise(0L))
          .as("n_drop_quality"),
        sum(when(col("stage") === "drop_repetition", 1L).otherwise(0L))
          .as("n_drop_repetition"),
        sum(when(col("stage") === "drop_duplicate", 1L).otherwise(0L))
          .as("n_drop_duplicate"),
        sum(when(col("stage") === "drop_contaminated", 1L).otherwise(0L))
          .as("n_drop_contaminated"),
        sum(when(col("stage") === "kept", 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("stage") === "kept", col("n_tok")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("n_windows", expr("(kept_tokens + 255) div 256"))
      .orderBy(col("source"))
  }

  /** TTR-vs-length CONTROL curve — type-token ratio naturally falls
    * with document length (more tokens, proportionally fewer new
    * types), so comparing raw TTR across sources of different length
    * mixes is a classic analysis error; this row measures the control
    * curve itself: documents banded by integer token-count edges
    * (32/64/128/256), each band's decimal-exact mean TTR and mean
    * length. Downstream quality thresholds should be read against this
    * curve, not a global cut. One doc-grain pass, ≤5-row census. */
  def ttrCurve(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(tokenCount(col("text")).as("n_tok"),
        distinctTokenCount(col("text")).as("n_uniq"))
      .filter(col("n_tok") > 0)
      .select(
        when(col("n_tok") < 32, "a_lt32")
          .when(col("n_tok") < 64, "b_32_63")
          .when(col("n_tok") < 128, "c_64_127")
          .when(col("n_tok") < 256, "d_128_255")
          .otherwise("e_256plus").as("band"),
        col("n_tok"),
        (col("n_uniq").cast("double") / col("n_tok").cast("double"))
          .cast("decimal(18,9)").as("ttr"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 2)
          .as("mean_len"),
        round(sum(col("ttr")).cast("double") / count(lit(1)), 6)
          .as("mean_ttr"))
      .orderBy(col("band"))

  /** Curation-gate REDUNDANCY census — which of
    * [[curationPipeline]]'s four gates are unique catchers and which
    * overlap: every train document's INDEPENDENT failure flags
    * (quality, repetition, exact-duplicate against a global keeper,
    * 13-gram contamination) cross-tabulated into the 16-cell
    * combination census with document and token mass per cell. The
    * all-zeros cell is the kept corpus; a gate whose failures all land
    * in multi-flag cells is redundant and can be dropped from the
    * hot path — the measured answer to "do we still need gate X".
    * (The pipeline row attributes each drop to its FIRST gate; this is
    * the complementary independent view — the keeper here is global,
    * not survivor-scoped, and the scaladoc of each row says which.)
    *
    * Same helper relations as the pipeline (one corpus pass each, all
    * joined on doc_id), ≤16-row output. */
  def gateOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val train = docs.filter(splitCol === "train")
    val toks = tokens(col("text"))
    val perDoc = train.select(col("doc_id"),
      md5(col("text")).as("fp_exact"),
      tokenCount(col("text")).as("n_tok"),
      stopwordCount(toks).as("n_stop"),
      distinctTokenCount(col("text")).as("n_uniq"))
    val keeper = perDoc.groupBy(col("fp_exact"))
      .agg(min(col("doc_id")).as("keeper_id"))
    val contaminated = contaminatedDocIds(train,
        distinctGramSet(docs.filter(splitCol === "test"), 13), 13)
      .withColumn("is_contam", lit(true))
    perDoc
      .join(maxBigramCounts(train), Seq("doc_id"), "left_outer")
      .join(trigramDupStats(train), Seq("doc_id"), "left_outer")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .join(keeper, Seq("fp_exact"))
      .select(col("n_tok"),
        (col("n_tok") < 10 || col("n_stop") * 2 > col("n_tok") ||
          col("n_uniq") * 10 < col("n_tok") * 3).cast("long").as("g_qual"),
        (coalesce(col("max_bg"), lit(0L)) * 10 > col("n_tok") ||
          coalesce(col("dup_tri"), lit(0L)) * 10 >
            coalesce(col("n_tri"), lit(0L)) * 3).cast("long").as("g_rep"),
        (col("doc_id") =!= col("keeper_id")).cast("long").as("g_dup"),
        coalesce(col("is_contam"), lit(false)).cast("long").as("g_contam"))
      .groupBy(col("g_qual"), col("g_rep"), col("g_dup"), col("g_contam"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("g_qual"), col("g_rep"), col("g_dup"), col("g_contam"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, "Rapid Automatic
    * Keyword Extraction") over the corpus — the unsupervised
    * keyphrase miner between [[bigramPmi]]'s pair collocations and
    * [[tfidf]]'s single-term weights: candidate phrases are maximal
    * stopword-delimited token runs (gaps-and-islands over positions,
    * capped at 8 tokens — a run with no stopword in a synthetic
    * corpus can be arbitrarily long and carries no keyphrase signal),
    * each word scores deg/freq (deg = Σ phrase length over its
    * phrases, freq = occurrences — both exact integers), and a
    * phrase's score is the sum of its words' scores. Top-25 distinct
    * phrases by (score DESC, phrase).
    *
    * Exactness: the only divisions are per-word deg/freq, quantized
    * to DECIMAL(18,9) BEFORE the per-phrase sum (≤ 8 terms, exact
    * decimal addition — order-independent). Scale shape: one
    * positional explode + per-doc running-stop-count window (the
    * sessionize idiom over token positions), phrase and word aggs on
    * content keys (Zipf-headed word counts — the word-count
    * envelope), scoring on the DISTINCT-phrase relation, and the
    * final top-k is a rank ≤ 25 WindowGroupLimit. */
  def rakeKeywords(spark: SparkSession, dir: String,
                   k: Int = 25): DataFrame = {
    import graft.functions.TextFunctions
    val stop = TextFunctions.stopwords
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "w")
      .withColumn("is_stop",
        col("w").isin(stop.map(lit(_)): _*) || col("w") === "")
    val wnd = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val phrases = toks
      .withColumn("grp", sum(col("is_stop").cast("long")).over(wnd))
      .filter(!col("is_stop"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(array_join(expr(
        """transform(array_sort(collect_list(struct(p, w))),
             x -> x.w)"""), " ").as("phrase"),
        count(lit(1)).as("len"))
      .filter(col("len") <= 8)
    val wordStats = phrases
      .select(col("len"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
    val distinctPhrases = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurs"), max(col("len")).as("len"))
    val scored = distinctPhrases
      .select(col("phrase"), col("n_occurs"), col("len"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordStats, "w")
      .groupBy(col("phrase"), col("n_occurs"), col("len"))
      .agg(sum((col("deg").cast("double") / col("freq").cast("double"))
        .cast("decimal(18,9)")).as("score_d"))
    scored
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score_d").desc, col("phrase"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("long").as("rk"), col("phrase"),
        col("len").as("n_words"), col("n_occurs"),
        round(col("score_d").cast("double"), 4).as("score"))
      .orderBy(col("rk"))
  }

  /** Cohen's KAPPA between the quality gate and the repetition gate —
    * the inter-rater-agreement number [[gateOverlap]]'s 16-cell census
    * implies but never computes: per source, the 2×2 confusion of the
    * two cheap heuristic gates and their chance-corrected agreement.
    * κ ≈ 0 means the gates fire independently (both earn their keep);
    * κ → 1 means one is redundant — the measured answer a curation
    * team wants before pruning its gate stack, with per-source rows
    * exposing sources where the gates collapse into each other.
    *
    * Exactness: κ = (n·(a+d) − (ra·ca + rb·cb)) / (n² − (ra·ca + rb·cb))
    * entirely from exact integer counts, products taken in
    * DECIMAL(38,0) (the [[EventAnalytics]] anomaly-predicate
    * convention — n² overflows int64 around 3e9 docs, feasible at
    * 100 TB), ONE final double division; the degenerate
    * all-agree-by-marginals source (denominator 0) emits NULL in both
    * engines. One doc-grain pass over train, ≤|sources|-row census. */
  def gateKappa(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val train = docs.filter(splitCol === "train")
    val toks = tokens(col("text"))
    val perDoc = train.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n_tok"),
      stopwordCount(toks).as("n_stop"),
      distinctTokenCount(col("text")).as("n_uniq"))
    val flags = perDoc
      .join(maxBigramCounts(train), Seq("doc_id"), "left_outer")
      .join(trigramDupStats(train), Seq("doc_id"), "left_outer")
      .select(col("source"),
        (col("n_tok") < 10 || col("n_stop") * 2 > col("n_tok") ||
          col("n_uniq") * 10 < col("n_tok") * 3).cast("long").as("gq"),
        (coalesce(col("max_bg"), lit(0L)) * 10 > col("n_tok") ||
          coalesce(col("dup_tri"), lit(0L)) * 10 >
            coalesce(col("n_tri"), lit(0L)) * 3).cast("long").as("gr"))
    val d38: Column => Column = c => c.cast("decimal(38,0)")
    flags.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(((col("gq") === 0) && (col("gr") === 0)).cast("long")).as("a"),
        sum(((col("gq") === 0) && (col("gr") === 1)).cast("long")).as("b"),
        sum(((col("gq") === 1) && (col("gr") === 0)).cast("long")).as("c"),
        sum(((col("gq") === 1) && (col("gr") === 1)).cast("long")).as("d"))
      .withColumn("pe_num",
        d38(col("a") + col("b")) * d38(col("a") + col("c")) +
          d38(col("c") + col("d")) * d38(col("b") + col("d")))
      .select(col("source"), col("n_docs"),
        col("a").as("n_pass_both"), col("b").as("n_rep_only"),
        col("c").as("n_qual_only"), col("d").as("n_flag_both"),
        when(d38(col("n_docs")) * d38(col("n_docs")) =!= col("pe_num"),
          round((d38(col("n_docs")) * d38(col("a") + col("d")) -
            col("pe_num")).cast("double") /
            (d38(col("n_docs")) * d38(col("n_docs")) - col("pe_num"))
              .cast("double"), 6)).as("kappa"))
      .orderBy(col("source"))
  }

  /** Exact-substring duplication census — the verbatim-overlap signal of
    * suffix-array training-data dedup, re-expressed relationally: a
    * document's 20-token window is SHARED when the identical window text
    * occurs in at least one OTHER document. Reported per source: docs
    * carrying any shared window, and the micro fraction of window mass
    * that is shared. Near-dup detection (MinHash et al.) misses this —
    * a long quote inside an otherwise-unique page — which is exactly
    * what the suffix-array method exists to catch.
    *
    * Shape: one-pass hashed 20-gram explode
    * ([[graft.expressions.WordGramHashes]]: per-word xxhash64 + a rolling
    * polynomial — the fingerprint never leaves the query, so any
    * injective-w.h.p. hash serves, and 8-byte longs with NO window-string
    * construction replace the per-window array_join alloc of the prior
    * form; the DuckDB oracle keeps grouping raw gram text and agrees
    * because both engines only use fp for equality). The corpus is
    * exploded exactly ONCE: (fp, doc) occurrence counts collapse
    * map-side, the per-gram doc-spread is a COUNT window over the fp
    * partition of that deduped relation (an agg + self-join formulation
    * re-derived the whole explode subtree on the build side — optimizer
    * null-filters made the two subtrees non-canonical, so
    * ReuseExchange could never fire), and the per-doc rollup shuffles
    * only the windows that ARE shared (the `nd > 1` filter runs before
    * the doc-side exchange; shared windows are the rare case, so that
    * shuffle is tiny). A document's total window count is
    * `n_tok - 19` by construction — computed from the token count, never
    * aggregated. All counts integer; the shared fraction divides two
    * exact BIGINT sums (guarded: a source whose docs are all shorter
    * than 20 tokens has zero window mass). At 100 TB the per-gram
    * doc-spread is the standard posting aggregation every inverted index
    * builds. */
  def substringDupCensus(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nTok = size(split(col("text"), " "))
    val base = docs.select(col("doc_id"), col("source"),
      when(nTok >= k, (nTok - (k - 1)).cast("long")).otherwise(0L).as("n_win"))
    val win = docs.select(col("doc_id"),
      explode(ExprColumns.gramHashes(spark, "text", k)).as("fp"))
    // (fp, doc) occurrence counts — duplicate windows inside one doc
    // collapse map-side here, before anything shuffles
    val wd = win.groupBy(col("fp"), col("doc_id")).agg(count(lit(1)).as("c"))
    val sharedPerDoc = wd
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("nd") > 1)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_shared"))
    base.join(sharedPerDoc, Seq("doc_id"), "left_outer")
      .select(col("source"), col("n_win"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_shared") > 0, 1L).otherwise(0L)).as("n_docs_shared"),
        sum(col("n_win")).as("window_mass"),
        sum(col("n_shared")).as("shared_mass"),
        when(sum(col("n_win")) > 0,
          round(sum(col("n_shared")).cast("double") /
            sum(col("n_win")).cast("double"), 6)).as("shared_frac"))
      .orderBy(col("source"))
  }

  /** The REMOVAL half of exact-substring dedup ([[substringDupCensus]]
    * is the census half): per source, how much token mass the
    * deduplicate-text-datasets policy (Lee et al. 2022 — cut every
    * verbatim >= k-token span that also appears in another document)
    * would actually delete. A document's covered mass is the length of
    * the UNION of its shared windows' [pos, pos+k) intervals —
    * overlapping windows must not double-count, so the per-doc interval
    * merge is the classic gaps-and-islands: an island starts where a
    * window's start clears the running max end of everything before it
    * (same pattern as [[graft.operators.Temporal]]'s SCD2 run
    * collapse, here over positions instead of dates).
    *
    * Plan: ONE hashed-k-gram explode with positions (the same
    * [[graft.expressions.WordGramHashes]] relation the census uses, via
    * posexplode), one posting agg to find cross-document fingerprints,
    * a semi-join to keep only shared window starts (rare — the same
    * `nd > 1` asymmetry the census exploits, so the per-doc windowing
    * that follows runs on the SMALL marked relation, never the corpus),
    * and integer interval arithmetic throughout: window starts satisfy
    * pos + k <= n_tok by construction, so covered sums need no
    * clamping and every output is an exact BIGINT (the fraction divides
    * two exact sums). At 100 TB: explode and posting agg are the
    * inverted-index build; the islands pass shuffles only docs that
    * contain at least one shared window. */
  def substringRemoval(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nTok = size(split(col("text"), " ")).cast("long")
    val base = docs.select(col("doc_id"), col("source"), nTok.as("n_tok"))
    val win = docs.select(col("doc_id"),
      posexplode(ExprColumns.gramHashes(spark, "text", k)).as(Seq("pos", "fp")))
    // fingerprints seen in more than one document (count over the
    // (fp, doc) dedup, as in the census)
    val sharedFp = win.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") > 1).select(col("fp"))
    val starts = win.join(sharedFp, Seq("fp"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val covered = starts
      .withColumn("prev_end", max(col("pos") + k)
        .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), max(col("pos") + k).as("e"))
      .groupBy(col("doc_id"))
      .agg(sum(col("e") - col("s")).as("covered"))
    base.join(covered, Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        sum(coalesce(col("covered"), lit(0L))).as("removed_tokens"),
        (sum(col("n_tok")) - sum(coalesce(col("covered"), lit(0L))))
          .as("kept_tokens"),
        when(sum(col("n_tok")) > 0,
          round(sum(coalesce(col("covered"), lit(0L))).cast("double") /
            sum(col("n_tok")).cast("double"), 6)).as("removed_frac"))
      .orderBy(col("source"))
  }

  /** Paragraph-level exact dedup — the CCNet / Lee-et-al granularity
    * between whole-document `dedup_exact` and the fixed-k sliding
    * windows of [[substringRemoval]]: split each document into
    * paragraphs, fingerprint each, keep only the globally FIRST
    * occurrence of every distinct paragraph (ordered by
    * `(doc_id, paragraph index)` — deterministic under any
    * partitioning), and report per-source kept mass. On a real corpus
    * the paragraph boundary is `\n`/`\n\n`; the synthetic corpus is a
    * single-line token stream, so the boundary is the deterministic
    * `p`-word chunking (`graft_chunk_words(text, p, p)` — stride =
    * size means NON-overlapping segments, last one short), which the
    * DuckDB oracle reproduces from `string_split` + `(i-1)//p`
    * grouping over the raw paragraph TEXT (hash-free — a standing
    * xxhash64 collision check, like the shingle oracles).
    *
    * Scale shape: paragraphs stream out of the `ChunkWords` generator
    * (never an array column), and first-occurrence ranking is ONE
    * shuffle — a `row_number` window partitioned by the paragraph
    * fingerprint, so each posting group ranks locally; the per-source
    * rollup that follows moves only the pre-aggregated source rows.
    * A pathologically hot paragraph (boilerplate) concentrates one
    * posting group on one task — the mitigation at 100 TB is the same
    * stop-gram head-drop as every posting shuffle here, and the skew
    * probe in Round8ScaleSpec measures the actual head mass. */
  def paragraphDedup(spark: SparkSession, dir: String,
                     p: Int = 15): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    val paras = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr(s"graft_chunk_words(text, $p, $p)"))
      .withColumn("fp", xxhash64(col("chunk_text")))
    val w = Window.partitionBy(col("fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    paras.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_paras"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_paras"),
        sum(col("n_words")).as("total_tokens"),
        sum(when(col("rn") === 1, col("n_words")).otherwise(0L))
          .as("kept_tokens"),
        round(lit(1.0) -
          sum(when(col("rn") === 1, col("n_words")).otherwise(0L))
            .cast("double") / sum(col("n_words")).cast("double"), 6)
          .as("removed_frac"))
      .orderBy(col("source"))
  }

  /** CCNet-style BOILERPLATE-LINE census (r15 verdict item 6) — the
    * per-line document-frequency pass real curation pipelines run
    * BEFORE any document-level dedup: a line (menu, header, footer,
    * cookie banner) that recurs across `minDocs`+ DISTINCT documents
    * of the SAME source is boilerplate, and a drop-all removal (CCNet
    * removes every occurrence — boilerplate is junk, not content,
    * unlike [[paragraphDedup]]'s global keep-first) reclaims its whole
    * token mass. Per source: corpus size, boilerplate line census,
    * documents affected, removable token mass and its share — the
    * numbers that decide whether a source needs the pass at all.
    *
    * The synthetic corpus is a single-line token stream, so the line
    * boundary is the deterministic non-overlapping `p`-word chunking
    * ([[graft.expressions.ChunkWords]], stride = size — the
    * [[paragraphDedup]] convention, reproduced in the oracle from
    * `string_split` + `(i-1)//p` grouping) and the census keys on the
    * RAW line text (hash-free — the standing collision check).
    *
    * Scale shape: lines stream out of the generator (never an array
    * column); the df census is ONE hash aggregation on (source, line)
    * — an aggregation, not a pair expansion, so a pathologically hot
    * boilerplate line costs one combiner path, no df-cap needed; the
    * affected-docs pass is a semi-join back on the same key; rollups
    * are |sources| rows. */
  def boilerplateLines(spark: SparkSession, dir: String, p: Int = 10,
      minDocs: Int = 2): DataFrame = {
    graft.functions.ExprColumns.register(spark)
    val lines = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr(s"graft_chunk_words(text, $p, $p)"))
      .select(col("doc_id"), col("source"), col("chunk_text"),
        col("n_words"))
      .localCheckpoint(false) // line grain: census + totals + affected
    val census = lines.groupBy(col("source"), col("chunk_text"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs_line"),
        max(col("n_words")).as("tok")) // identical text, identical tok
    val boiler = census.filter(col("n_docs_line") >= minDocs)
      .localCheckpoint(false) // read twice: rollup + affected semi-join
    val totals = lines.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_lines"),
        sum(col("n_words")).as("total_tokens"))
    val agg = boiler.groupBy(col("source"))
      .agg(count(lit(1)).as("n_boiler_lines"),
        sum(col("n_occ")).as("boiler_occurrences"),
        sum(col("n_occ") * col("tok")).as("removable_tokens"))
    val affected = lines
      .join(boiler.select(col("source"), col("chunk_text")),
        Seq("source", "chunk_text"), "left_semi")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("docs_affected"))
    totals.join(agg, Seq("source"), "left")
      .join(affected, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_lines"),
        col("total_tokens"),
        coalesce(col("n_boiler_lines"), lit(0L)).as("n_boiler_lines"),
        coalesce(col("boiler_occurrences"), lit(0L))
          .as("boiler_occurrences"),
        coalesce(col("docs_affected"), lit(0L)).as("docs_affected"),
        coalesce(col("removable_tokens"), lit(0L))
          .as("removable_tokens"),
        round(coalesce(col("removable_tokens"), lit(0L)).cast("double") /
          col("total_tokens").cast("double"), 6).as("removable_share"))
      .orderBy(col("source"))
  }

  /** Cross-source overlap matrix — the sibling of [[splitContamination]]
    * at corpus-curation time: for every source pair, how many documents
    * share a 64-char-prefix fingerprint across the two (syndicated /
    * mirrored content that inflates a mixture weight if double-counted).
    *
    * Same grouped-posting shape as [[DedupOps.ngramJaccardPairs]] —
    * ONE shuffle on the fingerprint builds the posting list, and the
    * cross-source doc pairs are expanded IN-TASK from the sorted list
    * (struct sort puts same-source entries adjacent; `i < j` plus the
    * `source_a < source_b` guard reproduces exactly the rows the
    * fp-equi self-join with `a.source < b.source` used to emit, at one
    * exchange fewer: the self-join form shuffled the posting relation
    * twice before the pair groupBy). Pair-space blow-up is bounded per
    * posting group, the same m(m-1)/2 envelope as every blocked dedup
    * here; at 100 TB the mitigation for a degenerate shared prefix
    * (boilerplate headers) is dropping top-frequency fingerprints —
    * implemented: posting lists above [[DedupOps.MaxShingleDf]] are
    * excluded from pair expansion (the shingle kernel's df-cap
    * discipline; the `dedup_hot_shingles` k=0 row reports exactly what
    * the cap drops on this fingerprint relation, and the DuckDB oracle
    * mirrors it). */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(substring(col("text"), 1, 64)).as("fp"))
    s.groupBy(col("fp"))
      .agg(sort_array(collect_list(struct(col("source"), col("doc_id"))))
        .as("ds"))
      .filter(size(col("ds")) > 1 &&
        size(col("ds")) <= DedupOps.MaxShingleDf)
      .select(col("fp"), explode(expr(
        """filter(
             flatten(transform(ds, (x, i) ->
               transform(slice(ds, i + 2, size(ds)),
                 y -> struct(x.source AS sa, y.source AS sb)))),
             p -> p.sa < p.sb)""")).as("p"))
      .groupBy(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("fp")).as("n_shared_fps"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** BPE merge LEARNING (Sennrich et al. 2016's trainer, relationally) —
    * the step [[bpeTokenStats]] stops short of: `rounds` iterations of
    * count-adjacent-pairs -> pick the most frequent (exact tie-break:
    * count DESC, then lexicographic) -> apply the merge left-to-right
    * non-overlapping, over the corpus's frequency-weighted vocabulary.
    * Emits the canonical trainer artifact: the merge table, one row per
    * round with the learned pair, its pre-apply frequency, and the
    * post-apply census (distinct-symbol vocabulary size, total weighted
    * symbol count — each applied merge removes one occurrence).
    *
    * Representation: one ROW per (word, position, symbol) with the
    * word's corpus frequency carried alongside — words (not documents)
    * are the unit, exactly how reference BPE trainers scale (the symbol
    * relation is vocabulary-sized, orders of magnitude under corpus
    * size; at 100 TB the word-frequency build is the only corpus pass).
    * Per round: adjacent pairs come from ONE window pass (lead over
    * (word, pos)), the winning pair broadcasts (1 row), and the apply is
    * the same window pass plus a gaps-and-islands ranking that realizes
    * greedy left-to-right NON-OVERLAPPING semantics declaratively — in a
    * run of k consecutive matching positions ("aaaa" under merge (a,a))
    * only the odd-indexed ones apply. Loop discipline matches the
    * Lloyd/star iterations: bounded rounds, `localCheckpoint` per round
    * so lineage stays flat, no driver-side data (the 1-row winner moves
    * via broadcast crossJoin, never `collect`).
    *
    * The DuckDB oracle replays the identical relational program as
    * `rounds` chained CTE blocks (generated by [[graft.SparkEntry
    * .bpeMergeOracleSql]]) — both engines run the same windows, same
    * tie-breaks, same integer arithmetic, so the merge tables must agree
    * exactly. */
  def bpeMergeLearn(spark: SparkSession, dir: String,
                    rounds: Int = 6): DataFrame =
    bpeTrain(spark, dir, rounds)._1.orderBy(col("merge_round"))

  /** BPE merge APPLICATION (the encode half of [[bpeMergeLearn]]): the
    * learned merge table is applied to the corpus vocabulary (the
    * trainer's final symbol relation IS the merged vocabulary — each
    * distinct word's subword count after all `rounds` merges), then one
    * corpus token pass joins every word occurrence to its subword count
    * and rolls up the per-language tokenization census: total words,
    * character-level token count (chars + the end-of-word marker — what
    * the encoder would emit with NO merges), BPE token count, and the
    * chars-per-token compression the merges bought. All sums are BIGINT;
    * one final division + round, so both engines agree exactly.
    *
    * Scale shape: merge learning runs on the frequency-weighted
    * vocabulary (see [[bpeMergeLearn]]); applying to the corpus is ONE
    * token-explode pass aggregated per (lang, word) — the word-keyed
    * posting shuffle every token statistic here already pays — plus a
    * vocabulary-sized join. No per-document symbol relation ever
    * materializes: documents meet the trained tokenizer only through
    * the word join, exactly how a production encoder ships (merge
    * table broadcast, corpus mapped once). */
  def bpeEncode(spark: SparkSession, dir: String,
                rounds: Int = 6): DataFrame = {
    val (_, syms, _) = bpeTrain(spark, dir, rounds)
    // n_sub = the word's symbol count — size() on the in-row symbol
    // array (cast keeps the old count()'s BIGINT schema)
    val wordTok = syms
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    val docWords = Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .select(col("lang"), lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("occ"))
    docWords.join(wordTok, "w")
      .groupBy(col("lang"))
      .agg(sum(col("occ")).as("total_words"),
        sum(col("occ") * (length(col("w")) + 1)).as("total_chars"),
        sum(col("occ") * col("n_sub")).as("total_bpe_tokens"),
        round(sum(col("occ") * (length(col("w")) + 1)).cast("double") /
          sum(col("occ") * col("n_sub")), 6).as("chars_per_token"))
      .orderBy(col("lang"))
  }

  /** The trainer's word-frequency vocabulary for an arbitrary
    * (text, ...) relation — exposed so the streaming frozen-tokenizer
    * job freezes merges on EXACTLY the word filter the batch trainer
    * uses (lowercase, alphabetic-only). */
  private[operators] def bpeWords(docs: DataFrame): DataFrame =
    docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Shared trainer loop: returns (merge table, final symbol relation,
    * word-frequency relation). See [[bpeMergeLearn]] for semantics. */
  private def bpeTrain(spark: SparkSession, dir: String,
                       rounds: Int): (DataFrame, DataFrame, DataFrame) =
    bpeTrainOnWords(spark, bpeWords(Tables(spark, dir, "documents")), rounds)

  /** Character + end-of-word-marker symbol ARRAY for a (w, freq)
    * vocabulary — one (pos, sym) struct per slot, pos the original
    * character position (the marker at len + 1): exactly the rows the
    * old per-(w, pos, sym) relation held, now in-row. The trainer AND
    * the frozen encoder share this starting point (divergence here
    * would change every merge). */
  private def initialSymsArr(words: DataFrame): DataFrame =
    words.select(col("w"), col("freq"), expr(
      """concat(
           transform(sequence(1, length(w)),
             p -> named_struct('pos', p, 'sym', substring(w, p, 1))),
           array(named_struct('pos', length(w) + 1, 'sym', '</w>')))""")
      .as("syms"))

  /** Greedy left-to-right non-overlapping application of ONE merge
    * (a, b) -> ab to a (pos, sym) array — the in-row form of the old
    * islands-ranking apply (r16 OPT: 3 windows + 2 joins per merge
    * round collapsed into one narrow fold): scan the symbols, merging
    * the current element into the previous one when (prev, cur) =
    * (a, b). A just-merged element equals a + b ≠ a (b is non-empty),
    * so a run of equal symbols merges at exactly the odd positions —
    * the same rows the old k % 2 = 1 rank filter kept. The merged
    * element keeps the LEFT constituent's pos (the old apply rewrote
    * the left row and dropped the absorbed right row). */
  private def mergeFold(syms: Column, a: Column, b: Column,
      ab: Column): Column =
    aggregate(syms,
      expr("CAST(array() AS ARRAY<STRUCT<pos: INT, sym: STRING>>)"),
      (acc, e) => when(
        size(acc) > lit(0) &&
          element_at(acc, -1).getField("sym") === a &&
          e.getField("sym") === b,
        concat(slice(acc, lit(1), size(acc) - lit(1)),
          array(struct(
            element_at(acc, -1).getField("pos").as("pos"),
            ab.as("sym")))))
        .otherwise(concat(acc, array(e))))

  /** ENCODE-ONLY application of a FROZEN ordered merge list to a new
    * (w, freq) vocabulary — the half of the tokenizer that ships: no
    * pair counting, no winner selection, just the R merges replayed in
    * training order over the increment's words. Returns the symbol
    * relation in ARRAY form (w, freq, syms) — one fused narrow stage
    * of chained [[mergeFold]]s (the merge pair is a literal: the merge
    * table IS a driver-side artifact — production encoders ship it as
    * a file). */
  private[operators] def applyFrozenMerges(spark: SparkSession,
      words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(initialSymsArr(words)) { case (syms, (a, b)) =>
      syms.select(col("w"), col("freq"),
        mergeFold(col("syms"), lit(a), lit(b), lit(a + b)).as("syms"))
    }

  private[operators] def bpeTrainOnWords(spark: SparkSession,
      words: DataFrame, rounds: Int): (DataFrame, DataFrame, DataFrame) = {
    // initial symbols: characters + an explicit end-of-word marker (the
    // trainer learns suffix merges like "e</w>" — dropping the marker
    // changes which pairs win). Each round: ONE adjacent-pair census
    // (explode + hash-agg; overlap included — the census convention
    // reference trainers use), winner by (count DESC, lexicographic),
    // then the same [[mergeFold]] the frozen encoder replays — with the
    // winner arriving as a broadcast 1-row crossJoin, never a collect.
    // BpeFrozenApplySpec pins the two apply paths bit-equal.
    var syms = initialSymsArr(words).localCheckpoint(false)
    var mergeRows: Option[DataFrame] = None
    (1 to rounds).foreach { r =>
      val best = syms
        .select(col("freq"), explode(expr(
          """IF(size(syms) < 2,
               CAST(array() AS ARRAY<STRUCT<a: STRING, b: STRING>>),
               transform(sequence(1, size(syms) - 1), x ->
                 named_struct('a', syms[x - 1].sym,
                   'b', syms[x].sym)))""")).as("p"))
        .groupBy(col("p").getField("a").as("a"),
          col("p").getField("b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .withColumn("ab", concat(col("a"), col("b")))
        .localCheckpoint() // 1 row; forces this round's winner now
      // a 0-row winner (the corpus exhausted its learnable merges before
      // `rounds`) would silently wipe the symbol relation through the
      // crossJoin below — fail fast instead, naming the condition
      require(best.count() == 1,
        s"bpeTrain: no adjacent pairs left at round $r — the corpus " +
          s"supports only ${r - 1} merges; lower `rounds`")
      syms = syms
        .crossJoin(broadcast(best.select(col("a"), col("b"),
          col("ab")))) // 1-row winner
        .select(col("w"), col("freq"),
          mergeFold(col("syms"), col("a"), col("b"), col("ab"))
            .as("syms"))
        // lazy: next round's census + the stats row share the RDD
        .localCheckpoint(false)
      val stats = syms.select(col("freq"), explode(col("syms")).as("e"))
        .agg(countDistinct(col("e").getField("sym")).as("vocab_size"),
          sum(col("freq")).as("total_symbols"))
      val row = best
        .select(lit(r).as("merge_round"), col("a").as("lhs"),
          col("b").as("rhs"), col("cnt").as("pair_count"))
        .crossJoin(stats)
      mergeRows = Some(mergeRows.fold(row)(_.unionAll(row)))
    }
    (mergeRows.get, syms, words)
  }

  /** N-gram novelty curve: for each ingestion-order decile, the fraction
    * of its documents' distinct 5-gram shingles that were never seen in
    * any EARLIER document (first occurrence = this doc). The canonical
    * "is the crawl still contributing new content?" diagnostic a data
    * team plots before committing another ingestion batch — a decaying
    * curve means the source is exhausting itself, a flat one means keep
    * crawling.
    *
    * Plan: one shingle explode feeding TWO aggregates — per-doc shingle
    * counts (map-side partial, doc-keyed) and the global
    * first-occurrence relation (shingle-keyed posting agg, same envelope
    * as [[tfidf]]) re-aggregated by its min doc to per-doc NOVEL counts
    * — then a doc-sized left join (a doc's novel count is derivable
    * from the firsts relation alone, so the corpus-sized posting
    * relation is never joined back; the join touches |docs| rows, not
    * |postings|). Per-decile rates are ratios of exact integer sums
    * (never a float aggregation), so partial-agg order cannot perturb
    * the hash. The doc-count scalar broadcasts. Docs shorter than
    * 5 words have no shingles and drop from the curve (both engines
    * agree — empty explode). At 100 TB: ingestion order is a monotone
    * doc_id in this corpus; a real deployment keys the decile off the
    * ingest timestamp the same way. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val sh = docs.select(col("doc_id"),
      explode(shingles(col("text"))).as("shingle"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // novel count per doc == how many shingles it is the FIRST holder of
    val novel = sh.groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    val perDoc = sizes.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
    val total = docs.agg(count(lit(1)).as("n_total")) // 1-row scalar
    perDoc.crossJoin(broadcast(total))
      .withColumn("decile",
        floor(col("doc_id") * 10 / col("n_total")).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_shingles"),
        sum(col("n_novel")).as("n_novel"),
        round(sum(col("n_novel")).cast("double") /
          sum(col("n_sh")).cast("double"), 4).as("novelty_rate"))
      .orderBy(col("decile"))
  }

  /** Content-defined chunking dedup census — the storage-dedup /
    * long-document technique the fixed-window substring census
    * ([[substringDupCensus]]) cannot replicate: chunk boundaries are cut
    * where a per-WORD fingerprint hits a 1-in-16 pattern
    * (md5 first hex nibble = 0), so inserting or deleting a sentence
    * shifts only the chunks it touches — every other boundary, being a
    * function of local content alone, stays put, and unchanged chunks
    * keep their fingerprints (fixed windows re-align everything after
    * an edit and lose all downstream matches). Per doc: chunk count,
    * chunks whose content recurs anywhere in the corpus, and the word
    * mass inside those duplicated chunks.
    *
    * The boundary predicate is md5-based so the oracle reproduces the
    * exact boundaries (the xxhash gram machinery is equality-only and
    * cannot anchor VALUE predicates cross-engine). Plan: one word
    * explode, one per-doc window cumsum for chunk ids (doc-partitioned
    * — no global window), one (doc, chunk) agg building the chunk
    * fingerprint from sorted positions, one posting-style fp count, a
    * doc-sized join back. Expected chunk length is geometric with mean
    * 16 words — bounded groups everywhere. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val w = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .withColumn("b",
        when(substring(md5(col("w")), 1, 1) === "0", 1L).otherwise(0L))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val chunks = w.withColumn("cid", sum(col("b")).over(byDoc))
      .groupBy(col("doc_id"), col("cid"))
      .agg(count(lit(1)).as("n_words"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ")).as("fp"))
    val occ = chunks.groupBy(col("fp")).agg(count(lit(1)).as("n_occ"))
    chunks.join(occ, "fp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(col("n_words")).as("n_words"),
        round(sum(when(col("n_occ") > 1, col("n_words")).otherwise(0L))
          .cast("double") / sum(col("n_words")), 4).as("dup_word_mass"))
      .orderBy(col("doc_id"))
  }

  /** Per-source Jensen-Shannon divergence from the corpus unigram
    * distribution — the text-side distribution-shift monitor (the
    * sibling of [[EventAnalytics.eventsDrift]]'s chi-square): a source
    * whose token distribution diverges from the corpus is a candidate
    * outlier (boilerplate farm, wrong language, spam) before any
    * per-document gate fires. JSD(p‖q) with p = source unigrams,
    * q = corpus unigrams, m = (p+q)/2; symmetric, bounded in [0,1] bit.
    *
    * The q-side sum over terms ABSENT from the source needs no join:
    * for p_i = 0 the contribution is q_i·log2(q_i/(q_i/2)) = q_i, so
    * Σ_absent = 1 − Σ_present q_i — one scalar correction. Only
    * (source, term) pairs that EXIST get per-term math: the relation is
    * source-vocabulary-sized, never |sources|×|vocab|. Per-term
    * contributions quantize to DECIMAL(28,10) before summing (the
    * [[tokenEntropy]] discipline), corpus totals broadcast. */
  def jsDivergence(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
    val srcTf = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cs"))
    val corpusTf = tok.groupBy(col("tok")).agg(count(lit(1)).as("cc"))
    val srcTotals = srcTf.groupBy(col("source"))
      .agg(sum(col("cs")).as("ns"), count(lit(1)).as("n_types"))
    val corpusTotal = corpusTf.agg(sum(col("cc")).as("nc")) // 1-row
    val p = col("cs").cast("double") / col("ns")
    val q = col("cc").cast("double") / col("nc")
    val m = (p + q) / 2
    val perTerm = srcTf
      .join(corpusTf, "tok")
      .join(srcTotals.select(col("source"), col("ns")), "source")
      .crossJoin(broadcast(corpusTotal))
      .select(col("source"),
        ((p * log2(p / m) + q * log2(q / m)) / 2)
          .cast("decimal(28,10)").as("term_js"),
        (q / 2).cast("decimal(28,10)").as("q_present_half"))
    perTerm.groupBy(col("source"))
      .agg(sum(col("term_js")).as("js_present"),
        sum(col("q_present_half")).as("qp"))
      .join(srcTotals, "source")
      .select(col("source"), col("ns").as("n_tok"), col("n_types"),
        // absent-term mass: (1 - sum of present q) / 2, exactly
        round(col("js_present").cast("double") +
          (lit(0.5) - col("qp").cast("double")), 4).as("jsd"))
      .orderBy(col("source"))
  }

  /** Per-document token-level Shannon entropy (bits): the
    * information-theoretic repetitiveness gate — low entropy flags
    * keyword-stuffed / template / looping text that survives simple
    * length and stopword-ratio checks. entropy = log2(n) - (Σ c·log2 c)/n
    * over the doc's term frequencies.
    *
    * Cross-engine float discipline: log2 may differ between engines by
    * ~1 ulp, so each per-term c·log2(c) is quantized to DECIMAL(28,8)
    * BEFORE the sum (exact, order-independent); quantum 1e-8 is ~1e6x
    * the worst-case ulp divergence while final rounding is only 1e-3,
    * so neither the quantization nor the engine's log can flip the
    * rounded digit. Plan: explode -> (doc, term) hash-agg -> doc
    * hash-agg; two shuffles both keyed on doc-sized relations, the
    * standard TF shape. */
  def tokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_types"),
        sum((col("c").cast("double") * log2(col("c").cast("double")))
          .cast("decimal(28,8)")).as("clogc"))
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        round(log2(col("n_tok").cast("double")) -
          col("clogc").cast("double") / col("n_tok").cast("double"), 3)
          .as("entropy"))
      .orderBy(col("doc_id"))
  }

  /** Hapax-legomenon census per language — the vocabulary-health signal
    * a tokenizer-training or dedup run reads first: a high hapax share
    * means the corpus is still vocabulary-open (more data keeps adding
    * words, BPE merges are under-trained); a low one means it is
    * saturating (near-dup mass or a closed domain). Emits per language:
    * vocabulary size, hapax count (frequency-1 types), total tokens,
    * hapax ratio (share of TYPES seen once) and type-token ratio.
    *
    * Plan: one explode → (lang, token) hash-agg with map-side partials
    * (the only corpus-sized shuffle), then a vocabulary-sized re-agg to
    * |langs| rows. No windows, no sorts beyond the 4-row output. Ratios
    * are exact-integer divisions done once in double. */
  def hapaxStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("cnt")).as("total_tokens"))
      .select(col("lang"), col("vocab_size"), col("n_hapax"),
        col("total_tokens"),
        round(col("n_hapax").cast("double") /
          col("vocab_size").cast("double"), 6).as("hapax_ratio"),
        round(col("vocab_size").cast("double") /
          col("total_tokens").cast("double"), 6).as("type_token_ratio"))
      .orderBy(col("lang"))

  /** DEDUP'S EFFECT ON THE LM — the before/after measurement that
    * closes the dedup story the way [[lmHeldout]] closes training: an
    * add-1 unigram LM fit on the FULL train split vs one fit on the
    * DEDUPED train split (prefix-fingerprint keep-first, the
    * [[DedupOps.sourceDupMatrix]] convention), both scored on the SAME
    * held-out test tokens, per language. A positive delta means the
    * removed copies were skewing the token distribution toward
    * duplicated content — the quantitative justification for running
    * dedup before tokenizer/LM training.
    *
    * Plan: both vocabularies come from the same train-token relation
    * (one pass, the dedup side a semi-join-filtered subset); the test
    * side joins each LM by word and aggregates per language; both
    * (N, V) scalars ride one broadcast row. */
  def dedupLmEffect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        splitCol.as("split"),
        md5(substring(col("text"), 1, 64)).as("fp"))
    val train = docs.filter(col("split") === "train")
    val keepers = train.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val trainTok = train
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val dedupTok = trainTok.join(keepers, Seq("doc_id"), "left_semi")
    val lmF = trainTok.groupBy(col("word")).agg(count(lit(1)).as("cwf"))
    val lmD = dedupTok.groupBy(col("word")).agg(count(lit(1)).as("cwd"))
    val nv = lmF.agg(sum(col("cwf")).as("nf"), count(lit(1)).as("vf"))
      .crossJoin(lmD.agg(sum(col("cwd")).as("nd"), count(lit(1)).as("vd")))
    val testTok = docs.filter(col("split") === "test")
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    testTok
      .join(lmF, Seq("word"), "left")
      .join(lmD, Seq("word"), "left")
      .crossJoin(broadcast(nv)) // 1-row (N, V) x 2 scalars
      .select(col("lang"),
        (-log((coalesce(col("cwf"), lit(0L)) + lit(1L)).cast("double") /
          (col("nf") + col("vf")).cast("double")))
          .cast("decimal(28,12)").as("nllf"),
        (-log((coalesce(col("cwd"), lit(0L)) + lit(1L)).cast("double") /
          (col("nd") + col("vd")).cast("double")))
          .cast("decimal(28,12)").as("nlld"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("nllf")).cast("double") / count(lit(1)), 6)
          .as("mean_nll_full"),
        round(sum(col("nlld")).cast("double") / count(lit(1)), 6)
          .as("mean_nll_dedup"))
      .select(col("lang"), col("n_tokens"), col("mean_nll_full"),
        col("mean_nll_dedup"),
        round(col("mean_nll_dedup") - col("mean_nll_full"), 6)
          .as("delta_nll"))
      .orderBy(col("lang"))
  }

  /** Statistical language ID by character-trigram profiles, with its
    * confusion matrix — the trainable upgrade of [[langIdConfusion]]'s
    * fixed-stopword heuristic (Cavnar–Trenkle n-gram profiling, the
    * classic): each language's 20 most frequent char trigrams form its
    * profile; a document is assigned the language whose profile its
    * DISTINCT trigrams overlap most (ties to the alphabetically first
    * language), and the census reports (true_lang → pred_lang) doc
    * counts with per-cell share of the true language. Only documents
    * matching ≥1 profile trigram are classified (zero-overlap docs
    * carry no signal; their count is the complement of the row sums).
    *
    * Scale shape: the trigram explode is the one corpus-sized pass
    * (n_chars rows); profiles come from a (lang, trigram) hash-agg
    * plus a rank≤20 window over the VOCABULARY relation
    * (WindowGroupLimit); the |langs|·20-row profile broadcasts into
    * the per-doc overlap count, the argmax is a per-doc ≤|langs|-row
    * window, and the census is |langs|²-bounded. */
  def langidTrigram(spark: SparkSession, dir: String, top: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    // Guard BEFORE sequence(): for docs shorter than 3 chars,
    // sequence(1, 0) is Spark's DESCENDING [1, 0] — two spurious
    // truncated 'trigrams' the DuckDB range(1, ...) oracle never emits.
    // Same empty-array-under-k convention as TextFunctions.shingles.
    val tri = docs
      .select(col("doc_id"), col("lang"),
        explode(expr(
          """CASE WHEN length(text) >= 3
               THEN transform(sequence(1, length(text) - 2),
                      i -> substring(text, i, 3))
               ELSE CAST(array() AS array<string>) END""")).as("g"))
    val profiles = tri
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("g"))))
      .filter(col("rk") <= top)
      .select(col("lang").as("profile_lang"), col("g"))
    val overlap = tri.select(col("doc_id"), col("lang"), col("g")).distinct()
      .join(broadcast(profiles), "g")
      .groupBy(col("doc_id"), col("lang"), col("profile_lang"))
      .agg(count(lit(1)).as("ov"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("ov").desc, col("profile_lang"))
    val pred = overlap
      .withColumn("rk", row_number().over(wDoc))
      .filter(col("rk") === 1)
    val trueTotals = pred.groupBy(col("lang"))
      .agg(count(lit(1)).as("lang_total"))
    pred.groupBy(col("lang").as("true_lang"),
        col("profile_lang").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(trueTotals.select(col("lang").as("true_lang"),
        col("lang_total"))), "true_lang")
      .select(col("true_lang"), col("pred_lang"), col("n_docs"),
        round(col("n_docs").cast("double") /
          col("lang_total").cast("double"), 6).as("share"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  /** Term BURSTINESS census — the dispersion statistic that separates
    * function words from topical words better than raw frequency: for
    * each of the 20 most frequent types, the variance-to-mean ratio
    * (VMR) of its per-document count over ALL documents. A uniformly
    * sprinkled word (stopword-like) has VMR ≈ 1 (Poisson); a topical
    * word concentrates in few documents (VMR ≫ 1) — the signal behind
    * burst-aware TF weighting and keyword extraction.
    *
    * Exactness: mean and E[x²] come from exact integer sums (Σx, Σx²
    * over per-doc counts; absent docs contribute zero to both, so only
    * the containing-doc relation is ever touched) divided once in
    * double; the 1-row corpus-size scalar broadcasts. Plan: one
    * (doc, token) hash-agg, one vocabulary-sized re-agg, a rank ≤ 20
    * literal filter (WindowGroupLimit prunes map-side). */
  def burstiness(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("c"))
    val stats = tf.groupBy(col("token"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("df"),
        sum(col("c") * col("c")).as("sq"))
    stats
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("total").desc, col("token"))))
      .filter(col("rk") <= k)
      .crossJoin(broadcast(nDocs)) // 1-row corpus size
      .select(col("token"), col("total"), col("df"),
        round(col("total").cast("double") / col("n_docs"), 6).as("mean_c"),
        round((col("sq").cast("double") / col("n_docs") -
          (col("total").cast("double") / col("n_docs")) *
          (col("total").cast("double") / col("n_docs"))) /
          (col("total").cast("double") / col("n_docs")), 4).as("vmr"))
      .orderBy(col("total").desc, col("token"))
  }

  /** HELD-OUT language-model evaluation — the measure step the
    * train-side rows ([[unigramLogprob]]'s corpus-fit LM) stop short
    * of: an add-1-smoothed unigram LM is fit on the TRAIN split of
    * [[splitCol]]'s deterministic hash split and scored on the TEST
    * split it has never seen, per language: token count, OOV rate, and
    * mean negative log-likelihood (lower = the corpus generalizes; a
    * train/test NLL gap is the memorization signal). Add-1 smoothing
    * makes OOV mass explicit: p(w) = (c_w + 1)/(N + V).
    *
    * Determinism: each token's log-prob is a deterministic double
    * (ln of an exact integer ratio), quantized to DECIMAL(28,12)
    * before summation so accumulation order can't perturb the mean —
    * the [[unigramLogprob]] convention. Plan: one train-vocab hash-agg
    * (vocabulary-sized output), one test-token join on word (the only
    * corpus-sized shuffle pair), one |langs|-row census; the (N, V)
    * scalar broadcasts. */
  def lmHeldout(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        splitCol.as("split"))
    val trainTok = docs.filter(col("split") === "train")
      .select(explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    val lm = trainTok.groupBy(col("word")).agg(count(lit(1)).as("cw"))
    val nv = lm.agg(sum(col("cw")).as("n_train"),
      count(lit(1)).as("v_train"))
    val testTok = docs.filter(col("split") === "test")
      .select(col("lang"), explode(tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
    testTok
      .join(lm, Seq("word"), "left")
      .crossJoin(broadcast(nv)) // 1-row (N, V) scalar
      .select(col("lang"),
        coalesce(col("cw"), lit(0L)).as("cw"),
        (-log((coalesce(col("cw"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_train") + col("v_train")).cast("double")))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cw") === 0L, 1L).otherwise(0L)).as("n_oov"),
        round(sum(when(col("cw") === 0L, 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 6).as("oov_rate"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6)
          .as("mean_nll"))
      .orderBy(col("lang"))
  }

  /** Interpolation-weight SWEEP for the bigram language model — the
    * measured knob [[lmHeldout]] stops short of: a production n-gram LM
    * never uses the raw bigram MLE (zero probability on any unseen
    * pair); it interpolates λ·P_bi + (1−λ)·P_uni, and λ is TUNED on
    * held-out data. This row runs the tune: for λ ∈ {0.25, 0.5, 0.75},
    * the held-out bigram count and mean negative log-likelihood under
    * the interpolated model (bigram MLE over the train split with the
    * unigram denominator; unigram add-one exactly as [[lmHeldout]]).
    * The λ row with the lowest NLL is the one a data team ships — the
    * [[DedupOps.lshBandingSweep]] / nprobe-sweep discipline applied to
    * the LM smoothing knob.
    *
    * Exactness: counts are exact BIGINTs; both engines evaluate the
    * identical division/ln expression per bigram and quantize each
    * term to DECIMAL(28,12) BEFORE summing, so the mean is
    * order-independent ([[bigramLogprob]]'s precedent). Scale shape:
    * two train-side hash-aggs (bigram + unigram — the word-count
    * envelope), one held-out bigram pass joined against both models,
    * a broadcast 3-row λ axis, a 3-row census. */
  def lmInterpSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bgArr = expr(
      """CASE WHEN size(split(text, ' ')) >= 2
           THEN transform(sequence(1, size(split(text, ' ')) - 1),
             i -> struct(element_at(split(text, ' '), i) AS w1,
                         element_at(split(text, ' '), i + 1) AS w2))
           ELSE CAST(array() AS array<struct<w1:string,w2:string>>)
         END""")
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), splitCol.as("split"))
    val trainBg = docs.filter(col("split") === "train")
      .select(explode(bgArr).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("cbi"))
    val trainUni = docs.filter(col("split") === "train")
      .select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nv = trainUni.agg(sum(col("cu")).as("n_train"),
      count(lit(1)).as("v_train"))
    val testBg = docs.filter(col("split") === "test")
      .select(explode(bgArr).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val lams = Seq(25L, 50L, 75L).toDF("lambda_pct")
    testBg
      .join(trainBg, Seq("w1", "w2"), "left")
      .join(trainUni.withColumnRenamed("w", "w1")
        .withColumnRenamed("cu", "cu1"), Seq("w1"), "left")
      .join(trainUni.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "cu2"), Seq("w2"), "left")
      .crossJoin(broadcast(nv)) // 1-row (N, V) scalar
      .crossJoin(broadcast(lams)) // 3-row lambda axis
      .select(col("lambda_pct"),
        (-log(col("lambda_pct").cast("double") / 100.0 *
          when(coalesce(col("cu1"), lit(0L)) > 0,
            coalesce(col("cbi"), lit(0L)).cast("double") /
              col("cu1").cast("double")).otherwise(lit(0.0)) +
          (lit(1.0) - col("lambda_pct").cast("double") / 100.0) *
            ((coalesce(col("cu2"), lit(0L)) + lit(1L)).cast("double") /
              (col("n_train") + col("v_train")).cast("double"))))
          .cast("decimal(28,12)").as("nll"))
      .groupBy(col("lambda_pct"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")).cast("double") / count(lit(1)), 6)
          .as("mean_nll"))
      .orderBy(col("lambda_pct"))
  }

  /** Vocabulary coverage curve: what share of the corpus's TOKEN MASS
    * do the top-10 / top-100 / top-1000 most frequent types cover — the
    * truncation-loss preview for a fixed-size vocabulary (the question
    * "how big must the tokenizer's word list be" in three numbers),
    * complementing [[hapaxStats]]'s openness signal at the other end of
    * the frequency spectrum.
    *
    * Scale shape: one corpus-sized (token) hash-agg with map-side
    * partials; the frequency ranking is a window over the VOCABULARY
    * relation with an immediate rank ≤ maxK literal filter (Spark plans
    * it as WindowGroupLimit, pruning map-side before the single-partition
    * step sees more than maxK rows per partition). The 3-row k axis and
    * the 1-row total broadcast. Ties rank by (count DESC, token) in both
    * engines. */
  def coverageCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val maxK = 1000
    val ranked = vocab
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("cnt").desc, col("token"))))
      .filter(col("rk") <= maxK)
    val tot = vocab.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("vocab_size"))
    val ks = Seq(10L, 100L, 1000L).toDF("k")
    ranked.crossJoin(broadcast(ks)) // 3-row k axis
      .filter(col("rk") <= col("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("mass"))
      .crossJoin(broadcast(tot)) // 1-row totals
      .select(col("k"), col("n_types"),
        round(col("mass").cast("double") / col("tot").cast("double"), 6)
          .as("mass_share"),
        round(col("n_types").cast("double") /
          col("vocab_size").cast("double"), 6).as("vocab_share"))
      .orderBy(col("k"))
  }

  /** Interpolated KNESER–NEY bigram probabilities on held-out data —
    * the production n-gram smoother ([[lmInterp]] tunes a linear
    * unigram mix; KN replaces the unigram with the CONTINUATION
    * distribution, which is what ships in every serious n-gram LM):
    * with absolute discount D = 3/4,
    * P(w2|w1) = max(c(w1w2)−D, 0)/c(w1·)
    *          + (D·N1+(w1·)/c(w1·)) · (N1+(·w2)/N1+(··)),
    * and a test bigram whose context was never seen backs off to the
    * continuation probability alone. Test bigrams are censused in
    * three buckets — pair seen in train, context seen but pair not,
    * context unseen — with count and mean KN probability per bucket:
    * the smoothing-mass picture (how much probability the discount
    * redistributes, and where) a data team reads before shipping the
    * tokenizer-adjacent LM.
    *
    * Determinism: all counts are exact BIGINTs; D = 3/4 is
    * binary-exact; each probability is the identical parenthesized
    * double expression in both engines over exact operands, quantized
    * to DECIMAL(18,9) before the bucket mean. Scale shape: bigram
    * censuses are corpus-pass hash-aggs; the evaluation is three
    * equi-joins on token keys (bigram table, context table,
    * continuation table) + a broadcast 1-row type count — all
    * shuffle-partitioned by key, nothing quadratic. */
  def kneserNey(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"),
        splitCol.as("split"))
    def bigrams(df: DataFrame): DataFrame = df.select(explode(expr(
      """filter(transform(sequence(1, size(t)),
           i -> struct(element_at(t, i) AS w1, try_element_at(t, i + 1) AS w2)),
         p -> p.w2 IS NOT NULL)""")).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val c12 = bigrams(docs.filter(col("split") === "train"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val ctx = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1pf"))
    val cont = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1pb"))
    val types = c12.agg(count(lit(1)).as("tt"))
    bigrams(docs.filter(col("split") === "test"))
      .join(c12, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types)) // 1-row bigram-type count
      .withColumn("pcont", coalesce(col("n1pb"), lit(0L)).cast("double") /
        col("tt").cast("double"))
      .withColumn("p", when(col("c1").isNotNull,
          greatest(coalesce(col("c12"), lit(0L)).cast("double") - lit(0.75),
            lit(0.0)) / col("c1").cast("double") +
          ((lit(0.75) * col("n1pf").cast("double")) /
            col("c1").cast("double")) * col("pcont"))
        .otherwise(col("pcont")))
      .withColumn("bucket",
        when(coalesce(col("c12"), lit(0L)) > 0, "known_pair")
          .when(col("c1").isNotNull, "known_context")
          .otherwise("unknown_context"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("p").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 6).as("mean_kn_prob"),
        round(max(col("p")), 6).as("max_kn_prob"))
      .orderBy(col("bucket"))
  }

  /** ENTROPY RATE of the token stream per language — the
    * information-theoretic compressibility floor [[tokenEntropy]]'s
    * unigram number overstates: H(W₂|W₁) = H(W₁W₂) − H(W₁) (joint
    * bigram entropy minus unigram entropy, both in nats over MLE
    * frequencies), with the conditional perplexity e^H — the number of
    * "effective next tokens" a bigram model faces, which is what
    * decides whether context helps on this corpus (rate ≪ unigram
    * entropy) or the stream is memoryless (rate ≈ unigram entropy).
    *
    * Determinism: counts exact; each −p·ln p term quantizes to
    * DECIMAL(28,12) before its sum. Scale: one token pass and one
    * bigram pass, both vocabulary-bounded aggs, |langs| output
    * rows. */
  def entropyRate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("lang"), split(col("text"), " ").as("t"))
    val uni = docs.select(col("lang"), explode(col("t")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("n"))
    val bi = docs.select(col("lang"), explode(expr(
      """filter(transform(sequence(1, size(t)),
           i -> struct(element_at(t, i) AS w1, try_element_at(t, i + 1) AS w2)),
         p -> p.w2 IS NOT NULL)""")).as("p"))
      .groupBy(col("lang"), col("p.w1"), col("p.w2"))
      .agg(count(lit(1)).as("n"))
    def entropy(counts: DataFrame): DataFrame = {
      val tot = counts.groupBy(col("lang")).agg(sum(col("n")).as("nt"))
      counts.join(tot, Seq("lang"))
        .withColumn("p", col("n").cast("double") / col("nt").cast("double"))
        .groupBy(col("lang"))
        .agg(sum((-col("p") * log(col("p"))).cast("decimal(28,12)"))
          .cast("double").as("h"), max(col("nt")).as("nt"))
    }
    val h1 = entropy(uni).select(col("lang"), col("h").as("h1"),
      col("nt").as("n_tokens"))
    val h2 = entropy(bi).select(col("lang"), col("h").as("h2"))
    h1.join(h2, Seq("lang"))
      .select(col("lang"), col("n_tokens"),
        round(col("h1"), 6).as("h_unigram"),
        round(col("h2") - col("h1"), 6).as("h_rate"),
        round(exp(col("h2") - col("h1")), 4).as("cond_perplexity"))
      .orderBy(col("lang"))
  }

  /** HEAPS'-LAW vocabulary growth — V(N) ≈ K·N^β measured on the
    * corpus, the number that predicts tokenizer vocabulary pressure at
    * 100 TB from a sample: ten ingestion checkpoints cut the corpus by
    * doc_id VALUE deciles (exact integer cutoffs over the id range —
    * no global rank needed, the scale-free checkpointing), each
    * reporting cumulative tokens and cumulative distinct vocabulary
    * (a token counts at the checkpoint iff its FIRST document is
    * inside it — so the whole curve costs one first-occurrence
    * hash-agg, never ten distinct-counts); the log–log OLS slope β
    * and intercept K ride along on every row.
    *
    * Determinism: counts exact; ln/OLS are fixed-arity double
    * expressions over a 10-row relation, each product quantized to
    * DECIMAL(28,12) before the fit sums. Scale: one token explode,
    * one vocab-grain min-agg, vocab×10 and docs×10 broadcast-axis
    * censuses, a 10-row fit. */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).as("n_tok"),
        split(col("text"), " ").as("t"))
    val range = docs.agg(min(col("doc_id")).as("dmin"),
      max(col("doc_id")).as("dmax"))
    val ks = (1L to 10L).toDF("k")
    val cuts = ks.crossJoin(broadcast(range)) // 1-row id range
      .select(col("k"),
        (col("dmin") + expr("(dmax - dmin) * k div 10")).as("cut"))
    val firstDoc = docs
      .select(col("doc_id"), explode(array_distinct(col("t"))).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val vocabAt = firstDoc.crossJoin(broadcast(cuts))
      .filter(col("fd") <= col("cut"))
      .groupBy(col("k"), col("cut")).agg(count(lit(1)).as("vocab_size"))
    val tokAt = docs.crossJoin(broadcast(cuts))
      .filter(col("doc_id") <= col("cut"))
      .groupBy(col("k")).agg(sum(col("n_tok")).as("n_tokens"))
    val pts = vocabAt.join(tokAt, Seq("k"))
      .withColumn("x", log(col("n_tokens").cast("double")))
      .withColumn("y", log(col("vocab_size").cast("double")))
    val fit = pts.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double")
        .as("sxy"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
        .as("sxx"))
      .select(
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))).as("beta"),
        col("sx"), col("sy"), col("n"))
      .select(round(col("beta"), 4).as("beta"),
        round(exp((col("sy") - col("beta") * col("sx")) / col("n")), 4)
          .as("k_coef"))
    pts.crossJoin(broadcast(fit)) // 1-row fit scalars
      .select(col("k"), col("cut"), col("n_tokens"), col("vocab_size"),
        col("beta"), col("k_coef"))
      .orderBy(col("k"))
  }

  /** T5-style SPAN CORRUPTION census — the denoising-objective prep
    * step: each token position starts a 3-token mask span with
    * probability ~15% (md5 of (doc, position) first byte < 38 — the
    * deterministic coin every reproducible data pipeline uses instead
    * of an RNG), overlapping spans merge, and each maximal masked run
    * is replaced by one sentinel at training time. Census per source:
    * tokens, masked tokens, mask share (the knob's realized value),
    * span count, and mean span length (> 3 means spans merged — the
    * statistic that decides whether the start rate needs lowering).
    *
    * All integer + md5; the mask window is per-document over ±2
    * positions (narrow), spans are the gaps-and-islands lag idiom.
    * One token explode, two doc-partitioned windows, one
    * |sources|-row census. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("source"), (col("pos") + 1).as("pos"))
      .withColumn("start",
        (conv(substring(md5(concat(lit("span:"),
          col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 2), 16, 10).cast("long") < 38)
          .cast("int"))
    val wSpan = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-2, 0)
    val wLag = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val masked = toks
      .withColumn("m", max(col("start")).over(wSpan))
      .withColumn("span_start",
        (col("m") === 1 &&
          coalesce(lag(col("m"), 1).over(wLag), lit(0)) === 0).cast("long"))
    masked.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(col("m").cast("long")).as("n_masked"),
        round(sum(col("m").cast("long")).cast("double") /
          count(lit(1)), 6).as("mask_share"),
        sum(col("span_start")).as("n_spans"),
        round(sum(col("m").cast("long")).cast("double") /
          sum(col("span_start")), 4).as("mean_span_len"))
      .orderBy(col("source"))
  }

  /** TEMPERATURE-scaled sampling weights — the multilingual mixing knob
    * (sample language ℓ with probability p_ℓ^α / Σ p^α): α = 1 is
    * proportional (big languages dominate), α → 0 is uniform (small
    * languages over-sampled), and every multilingual LM picks a point
    * on this curve. Swept at α ∈ {0.3, 0.5, 0.7, 1.0} over the corpus
    * token shares, reporting each language's natural share, tempered
    * weight, and the boost factor (weight/share — how many "epochs" of
    * its natural rate the language gets); the [[mixtureWeights]]
    * sqrt-scaling row is the α = 0.5 point of this sweep by
    * construction.
    *
    * Determinism: shares are exact-integer ratios; pow/sums are the
    * identical double expression in both engines (pow is ≤1-ulp in
    * both; rounding at 6 sits ~10 orders above that); the denominator
    * quantizes each pow term to DECIMAL(28,12) before summing so
    * shuffle order can't move a bit. Scale: one lang-grain agg + a
    * broadcast 4-row α axis over a |langs|-row relation. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perLang = Tables(spark, dir, "documents")
      .select(col("lang"), tokenCount(col("text")).as("n_tok"))
      .groupBy(col("lang")).agg(sum(col("n_tok")).as("n_tokens"))
    val tot = perLang.agg(sum(col("n_tokens")).as("nt"))
    val shares = perLang.crossJoin(broadcast(tot)) // 1-row token total
      .withColumn("share", col("n_tokens").cast("double") /
        col("nt").cast("double"))
    val alphas = Seq(0.3, 0.5, 0.7, 1.0).toDF("alpha")
    val powed = shares.crossJoin(broadcast(alphas)) // 4-row α axis
      .withColumn("pa", pow(col("share"), col("alpha")))
    val z = powed.groupBy(col("alpha"))
      .agg(sum(col("pa").cast("decimal(28,12)")).cast("double").as("z"))
    powed.join(broadcast(z), Seq("alpha"))
      .select(col("alpha"), col("lang"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("pa") / col("z"), 6).as("temp_weight"),
        round(col("pa") / col("z") / col("share"), 4).as("boost"))
      .orderBy(col("alpha"), col("lang"))
  }

  /** COMPRESSION-ratio proxy per source — the distinct-4-gram share of
    * each document (unique 4-grams / total 4-grams), the dictionary-
    * free stand-in for "would gzip crush this" that large-corpus
    * quality gates use alongside [[repetitionFilter]]'s top-n-gram
    * rules: boilerplate and template chrome compress (low ratio),
    * natural prose doesn't (ratio near 1). Census per source: docs,
    * gram mass, exact-decimal mean ratio, and the count flagged
    * highly-compressible (ratio < 0.3, tested as the integer
    * cross-multiplication distinct·10 < total·3 — no float
    * threshold). Documents under 4 tokens have no 4-grams and are
    * censused separately (n_short), never averaged.
    *
    * Scale shape: one 4-gram explode bounded by corpus token count
    * (array_distinct per doc before counting — the explode carries
    * (doc_id, gram-hash) only), a doc-grain agg, a |sources|-row
    * census. */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables(spark, dir, "documents")
    val docs = raw
      .select(col("doc_id"), col("source"),
        greatest(size(split(col("text"), " ")) - 3, lit(0)).cast("long")
          .as("total"))
    // md5-backed 4-gram fingerprints (gramHashCol) — a 32-bit hash's
    // birthday collisions would silently deflate the distinct count
    // against the oracle's raw-string distinct
    val uniq = raw
      .select(col("doc_id"),
        explode(array_distinct(gramHashCol(raw, 4))).as("g"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("uniq"))
    docs.join(uniq, Seq("doc_id"), "left")
      .select(col("source"), col("total"),
        coalesce(col("uniq"), lit(0L)).as("uniq"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("total") === 0L).cast("long")).as("n_short"),
        sum(col("total")).as("total_grams"),
        sum(col("uniq")).as("uniq_grams"),
        round(sum(when(col("total") > 0,
            (col("uniq").cast("double") / col("total").cast("double"))
              .cast("decimal(18,9)")))
          .cast("double") / sum((col("total") > 0L).cast("long")), 6)
          .as("mean_ratio"),
        sum(when(col("total") > 0 && col("uniq") * 10 < col("total") * 3,
          1L).otherwise(0L)).as("n_compressible"))
      .orderBy(col("source"))
  }

  /** READABILITY census per source — Flesch Reading Ease and
    * Flesch–Kincaid grade over a deterministic syllable heuristic
    * (vowel-group runs `[aeiouy]+`, floor 1 — the standard
    * dictionary-free approximation), the curation gate that catches
    * both keyboard-mash (too many syllables per "word") and
    * telegraphic fragments. The synthetic corpus carries no sentence
    * punctuation, so the formulas' words-per-sentence term uses a
    * NOMINAL 15-word sentence (ceil(words/15), documented convention —
    * the real machinery is the tokenize + syllable + complex-word
    * plumbing, which transfers unchanged to punctuated corpora by
    * swapping the sentence counter).
    *
    * Determinism: syllable counts are integer regexp censuses; each
    * per-doc score is one double expression over exact integers
    * (identical IEEE in both engines); per-source means quantize each
    * doc's score to DECIMAL(18,9) before summing. Scale shape: one
    * token explode (the corpus pass), a doc-grain agg, a source-grain
    * census — linear, output |sources|-bounded. */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("wd"))
      .filter(length(col("wd")) > 0)
      .withColumn("syl",
        greatest(lit(1),
          size(expr("regexp_extract_all(wd, '[aeiouy]+', 0)"))).cast("long"))
    val perDoc = words.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("nw"), sum(col("syl")).as("ns"),
        sum((col("syl") >= 3).cast("long")).as("nc"))
      .withColumn("nsent", expr("(nw + 14) div 15"))
      .withColumn("wps", col("nw").cast("double") / col("nsent").cast("double"))
      .withColumn("spw", col("ns").cast("double") / col("nw").cast("double"))
      .withColumn("fk",
        lit(0.39) * col("wps") + lit(11.8) * col("spw") - lit(15.59))
      .withColumn("ease",
        lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
        sum(col("ns")).as("n_syllables"),
        round(sum(col("nc")).cast("double") /
          sum(col("nw")).cast("double"), 6).as("pct_complex"),
        round(sum(col("fk").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 4).as("mean_fk_grade"),
        round(sum(col("ease").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 4).as("mean_flesch_ease"))
      .orderBy(col("source"))
  }

  /** The winnowing fingerprint relation shared by [[winnowing]]'s
    * census and [[DedupOps.winnowingPairs]]' candidate kernel:
    * (doc_id, source, n_grams, wkey, hash) — one row per selected
    * (hash, position) fingerprint. See [[winnowing]] for the selection
    * semantics and scale argument. */
  private[operators] def winnowFingerprints(spark: SparkSession,
      dir: String, k: Int = 8, w: Int = 4): DataFrame = {
    // r16 OPT (guide §2.4): the window-min + row-distinct form paid one
    // Exchange+Sort on (doc_id, p) over the corpus-char-sized gram
    // relation and a second Exchange for the distinct. Selection is
    // strictly PER-DOCUMENT, so both collapse into array HOFs inside one
    // narrow scan-side projection: `array_min(slice(keys, p, w))` IS the
    // rowsBetween(current, w-1) min (same UTF8 string ordering), and
    // `array_distinct` IS the distinct (every other output column is
    // doc-constant). Zero exchanges; rows out are bit-identical.
    // rightmost-min-of-window: equal hashes at LARGER p get a SMALLER
    // suffix, so the min is the rightmost minimum (unchanged encoding).
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (length(col("text")) - (k - 1)).as("n_grams"), col("text"))
      // keys built ONCE per position (md5 is the kernel's real CPU), the
      // window mins then slice the same array
      .withColumn("keys", when(col("n_grams") >= w, expr(
        s"""transform(sequence(1, n_grams),
              p -> concat(md5(substring(text, p, $k)),
                lpad(cast(1000000 - p as string), 7, '0')))"""))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("source"), col("n_grams"),
        explode(when(col("n_grams") >= w, expr(
          s"""array_distinct(transform(sequence(1, n_grams - ${w - 1}),
                p -> array_min(slice(keys, p, $w))))"""))
          .otherwise(array().cast("array<string>"))).as("wkey"))
      .withColumn("hash", substring(col("wkey"), 1, 32))
  }

  /** WINNOWING fingerprint census (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm) — the position-robust document fingerprinting scheme
    * that guarantees detection of any shared substring of length
    * ≥ k + w − 1 while sampling only ~2/(w+1) of the k-gram hashes:
    * per window of w consecutive k-gram hashes, keep the RIGHTMOST
    * minimum; adjacent windows mostly re-select the same (hash, pos)
    * pair, so the distinct selected pairs are the fingerprint set. The
    * reference's exact-hash dedup (main.py:168-181) is the degenerate
    * whole-row case of this; winnowing is what the same rung looks
    * like when partial overlap must be caught. Reported per source:
    * docs fingerprinted, windows, fingerprints, observed density (the
    * ~2/(w+1) = 0.4 guarantee check at w = 4), distinct hash values,
    * and hashes shared by ≥ 2 of the source's documents (the dup
    * signal winnowing exists to surface).
    *
    * The rightmost-min-with-ties selection is an array_min over a
    * sortable encoding — md5 hex ∥ zero-padded (10^6 − pos) — so equal
    * hashes at later positions sort FIRST; no second argmax pass, no
    * self-join, and the identical encoding runs in the oracle.
    *
    * Scale shape (r16 OPT): selection is strictly per-document, so the
    * k-gram hashing, the window mins AND the per-doc distinct all run
    * inside ONE narrow scan-side projection (array HOFs over the in-row
    * key array — see [[winnowFingerprints]]); only the ~2/(w+1)-sampled
    * fingerprints ever become rows. Zero exchanges before the
    * source-bounded aggs; skew bounded by max document length. */
  def winnowing(spark: SparkSession, dir: String,
                k: Int = 8, w: Int = 4): DataFrame = {
    val fp = winnowFingerprints(spark, dir, k, w)
    val perDoc = fp.groupBy(col("doc_id"), col("source"))
      .agg(max(col("n_grams") - (w - 1)).as("n_windows"),
        count(lit(1)).as("n_fp"))
    val hashDf = fp.select(col("source"), col("doc_id"), col("hash"))
      .distinct()
      .groupBy(col("source"), col("hash"))
      .agg(count(lit(1)).as("df"))
    val sharing = hashDf.groupBy(col("source"))
      .agg(count(lit(1)).as("n_hash_distinct"),
        sum((col("df") >= 2).cast("long")).as("n_hash_shared"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("n_fp")).as("n_fp"),
        round(sum(col("n_fp")).cast("double") /
          sum(col("n_windows")).cast("double"), 6).as("density"))
      .join(sharing, Seq("source"))
      .orderBy(col("source"))
  }

  /** TextRank keywords (Mihalcea & Tarau) — PageRank over the word
    * CO-OCCURRENCE graph, the graph-centrality alternative to
    * [[rakeKeywords]]' frequency heuristics: undirected edges between
    * ADJACENT lowercase alphabetic tokens weighted by co-occurrence
    * count, two damped (0.85) synchronous PageRank iterations per
    * language, top-10 words by score. A word ranks high when its
    * NEIGHBORS rank high — centrality frequency alone can't see.
    *
    * Determinism inherits [[Graph.pagerankNations]] verbatim: exact
    * integer edge weights, per-edge double ratios, the one
    * order-sensitive contribution sum accumulated as DECIMAL(28,12),
    * ties on the word. Scale shape: one corpus bigram pass; every
    * later relation is vocabulary-bounded (joins hash-partition on
    * word — the rank vector is NOT broadcast because vocabulary grows
    * with the corpus); the top-10 is a rank≤k window
    * (WindowGroupLimit pushes the limit map-side). */
  def textrank(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables(spark, dir, "documents")
      .select(col("lang"), expr(
        """filter(transform(split(text, ' '), w -> lower(w)),
             w -> w rlike '^[a-z]+$')""").as("ws"))
    val bi = words
      .select(col("lang"), explode(expr(
        """CASE WHEN size(ws) >= 2
             THEN transform(sequence(1, size(ws) - 1),
               i -> struct(element_at(ws, i) AS w1,
                           element_at(ws, i + 1) AS w2))
             ELSE CAST(array() AS array<struct<w1:string,w2:string>>)
           END""")).as("p"))
      .filter(col("p.w1") =!= col("p.w2"))
      .groupBy(col("lang"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val edges = bi.select(col("lang"), col("w1").as("src"),
        col("w2").as("dst"), col("c"))
      .unionByName(bi.select(col("lang"), col("w2").as("src"),
        col("w1").as("dst"), col("c")))
      .groupBy(col("lang"), col("src"), col("dst"))
      .agg(sum(col("c")).as("w"))
      .localCheckpoint()
    val outw = edges.groupBy(col("lang"), col("src"))
      .agg(sum(col("w")).as("outw"))
    val ew = edges.join(outw, Seq("lang", "src"))
      .select(col("lang"), col("src"), col("dst"),
        (col("w").cast("double") / col("outw").cast("double")).as("ratio"))
    val nodes = edges.select(col("lang"), col("src").as("node")).distinct()
    val nn = nodes.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    def step(pr: DataFrame): DataFrame = {
      // unique column names per hop (the attributionMarkov lesson)
      val p = pr.toDF("pl", "pnode", "prv")
      val contrib = ew
        .join(p, col("src") === col("pnode") && col("lang") === col("pl"))
        .groupBy(col("lang"), col("dst"))
        .agg(sum((col("prv") * col("ratio")).cast("decimal(28,12)"))
          .cast("double").as("cv"))
        .toDF("cl", "cdst", "cv")
      nodes.join(nn, Seq("lang"))
        .join(contrib,
          col("lang") === col("cl") && col("node") === col("cdst"),
          "left")
        .select(col("lang"), col("node"),
          (lit(0.15) / col("nl") + lit(0.85) *
            coalesce(col("cv"), lit(0.0))).as("pr"))
    }
    val pr0 = nodes.join(nn, Seq("lang"))
      .select(col("lang"), col("node"), (lit(1.0) / col("nl")).as("pr"))
    val w10 = Window.partitionBy(col("lang"))
      .orderBy(col("pr").desc, col("node"))
    step(step(pr0))
      .withColumn("rk", row_number().over(w10))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("rk"), col("node").as("word"),
        round(col("pr"), 8).as("score"))
      .orderBy(col("lang"), col("rk"))
  }

  /** FRONT-CODING compression estimate of the per-language
    * vocabulary — the dictionary-sizing number every inverted-index /
    * tokenizer-artifact design reads before choosing a term-dictionary
    * layout: sort the vocabulary, store each word as (shared-prefix
    * length, suffix), and the saved mass is Σ lcp(wᵢ, wᵢ₋₁). Reported
    * per language: vocabulary size, raw chars, chars saved by prefix
    * sharing, residual chars, and the savings ratio.
    *
    * The lcp is a HOF fold over the bounded prefix positions (prefix
    * equality is monotone in k, so max-matching-k needs no early
    * exit); the neighbor pairing is one lag window over the SORTED
    * per-language vocabulary — vocabulary-bounded relations after the
    * one corpus token pass, the [[stopwordDiscovery]] shape. */
  def prefixCompression(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables(spark, dir, "documents")
      .select(col("lang"), explode(expr(
        """filter(transform(split(text, ' '), w -> lower(w)),
             w -> w rlike '^[a-z]+$')""")).as("w"))
      .distinct()
    val wLag = Window.partitionBy(col("lang")).orderBy(col("w"))
    vocab
      .withColumn("p", lag(col("w"), 1).over(wLag))
      .withColumn("lcp", when(col("p").isNull, lit(0)).otherwise(expr(
        """CASE WHEN least(length(w), length(p)) = 0 THEN 0
             ELSE aggregate(sequence(1, least(length(w), length(p))), 0,
               (acc, i) -> IF(substring(w, 1, i) = substring(p, 1, i),
                 greatest(acc, i), acc)) END""")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("total_chars"),
        sum(col("lcp")).as("saved_chars"),
        (sum(length(col("w"))) - sum(col("lcp"))).as("residual_chars"),
        round(sum(col("lcp")).cast("double") /
          sum(length(col("w"))).cast("double"), 6).as("savings_ratio"))
      .orderBy(col("lang"))
  }
  /** Yule's K characteristic and Simpson's D over the per-language token
    * frequency spectrum — the repetitiveness-of-vocabulary constant a
    * corpus curator tracks beside [[hapaxStats]]' type ratios: K =
    * 10⁴·(Σc² − N)/N² where c runs over type frequencies, which is
    * length-invariant where raw TTR is not (the reason [[ttrCurve]]
    * needs a size-controlled design and this census doesn't). Simpson's
    * D = (Σc² − N)/(N(N−1)) is the same second moment as a
    * repeat-probability.
    *
    * Plan: one explode → (lang, token) hash-agg with map-side partials
    * (the only corpus-sized shuffle), then a vocabulary-grain re-agg to
    * |langs| rows; Σc² stays exact BIGINT, and each statistic is one
    * double division at the end. */
  def yuleK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("vocab"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("lang"), col("vocab"), col("n_tokens"), col("s2"),
        round(lit(10000.0) * (col("s2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")),
          6).as("yule_k"),
        round((col("s2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") *
            (col("n_tokens") - 1).cast("double")), 6).as("simpson_d"))
      .orderBy(col("lang"))
  /** Mean Segmental Type-Token Ratio (MSTTR) per language across a
    * segment-size axis — the length-controlled lexical-diversity
    * statistic that fixes raw TTR's document-length confound by
    * averaging the TTR of consecutive COMPLETE w-token segments
    * (w ∈ {10, 25, 50}; the trailing partial segment is dropped, so
    * every averaged segment is the same size and the numbers are
    * comparable across languages — the controlled-design discipline of
    * [[ttrCurve]] applied segment-wise).
    *
    * Exactness: per-segment type counts are exact integers; the mean
    * TTR is Σtypes/(w·n_segments) — one double division per output
    * row, no per-segment double averaging.
    *
    * Plan: one positional explode crossed with the 3-row w axis (the
    * only corpus-scale relations, both linear), a (doc, w, seg, token)
    * hash-agg for types, a segment-grain re-agg, then a |lang|×3
    * census. */
  def msttr(spark: SparkSession, dir: String): DataFrame = {
    val ws = spark.range(0, 3)
      .select(element_at(typedLit(Seq(10, 25, 50)),
        col("id").cast("int") + 1).as("w"))
    val tok = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        posexplode(tokens(col("text"))).as(Seq("pos", "token")),
        size(tokens(col("text"))).as("n_tok"))
      .filter(col("token") =!= "")
    val segTypes = tok.crossJoin(broadcast(ws)) // 3-row segment-size axis
      .filter((expr("pos div w") + 1) * col("w") <= col("n_tok"))
      .select(col("doc_id"), col("lang"), col("w"),
        expr("pos div w").as("seg"), col("token"))
      .groupBy(col("doc_id"), col("lang"), col("w"), col("seg"),
        col("token"))
      .agg(count(lit(1)).as("reps"))
      .groupBy(col("doc_id"), col("lang"), col("w"), col("seg"))
      .agg(count(lit(1)).as("types"))
    segTypes.groupBy(col("lang"), col("w"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_segments"),
        sum(col("types")).as("sum_types"))
      .select(col("lang"), col("w"), col("n_docs"), col("n_segments"),
        round(col("sum_types").cast("double") /
          (col("w") * col("n_segments")).cast("double"), 6).as("msttr"))
      .orderBy(col("lang"), col("w"))
  }
  /** Burrows' Delta authorship-style distance between sources — the
    * stylometric census a contamination or provenance analysis runs
    * when [[sourceOverlap]]'s exact-copy evidence is absent: over the
    * corpus's 30 most frequent words, each source's per-mille word
    * frequency standardizes to a z-score against the cross-source
    * mean/σ, and Delta(s₁, s₂) is the mean |z₁ − z₂| — low Delta
    * reads "same underlying generator", the signal that two scraped
    * sources are the same site under different names.
    *
    * Determinism: per-mille frequencies quantize to DECIMAL(18,9)
    * (O(1)-scaled so quantization noise stays 1e-9 against σ values
    * of similar order); word moments are exact decimal sums; each
    * |z₁ − z₂| quantizes to DECIMAL(28,12) before the pair mean.
    *
    * Plan: one (source, token) hash-agg, a 30-row broadcast word
    * head, source-grain z relations, and a |sources|²-bounded pair
    * join — nothing after the first agg touches corpus grain. */
  def burrowsDelta(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val st = tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // (source, token) grain, read twice
    val totals = st.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val topWords = st.groupBy(col("token"))
      .agg(sum(col("cnt")).as("tc"))
      .orderBy(col("tc").desc, col("token"))
      .limit(30).select(col("token"))
    val f = totals.crossJoin(broadcast(topWords)) // source x 30-word grid
      .join(st, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        (coalesce(col("cnt"), lit(0L)).cast("double") * 1000.0 /
          col("tot").cast("double")).cast("decimal(18,9)").as("fr"))
    val nSources = totals.agg(count(lit(1)).as("ns"))
    val moments = f.groupBy(col("token"))
      .agg(sum(col("fr")).as("sf"), sum(col("fr") * col("fr")).as("sff"),
        count(lit(1)).as("ns"))
      .withColumn("mu", col("sf").cast("double") / col("ns"))
      .withColumn("sd", sqrt(
        (col("ns") * col("sff") - col("sf") * col("sf")).cast("double") /
          (col("ns").cast("double") * (col("ns") - 1).cast("double"))))
    val z = f.join(broadcast(moments
        .select(col("token"), col("mu"), col("sd"))), Seq("token"))
      .select(col("source"), col("token"),
        ((col("fr").cast("double") - col("mu")) / col("sd")).as("z"))
    val pairs = z.toDF("s1", "token", "z1")
      .join(z.toDF("s2", "token", "z2"), Seq("token"))
      .filter(col("s1") < col("s2"))
      .withColumn("dz", abs(col("z1") - col("z2"))
        .cast("decimal(28,12)"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_words"),
        round(sum(col("dz")).cast("double") / count(lit(1)), 6)
          .as("delta"))
    pairs.orderBy(col("s1"), col("s2"))
  }
  /** Classifier-eval metrics over [[langIdConfusion]]'s matrix — the
    * precision/recall/F1 readout that turns the raw confusion census
    * into the numbers a model gate thresholds on: per true language,
    * tp / fp / fn, precision, recall, F1, plus the replicated
    * micro-accuracy and macro-F1 (the unweighted class mean — the
    * fairness-to-small-classes convention). "unknown" predictions
    * count as false negatives for their true class, never as a class
    * of their own (no document is truly "unknown").
    *
    * All counts are exact; each metric is one double division; the
    * macro mean sums DECIMAL(18,9)-quantized per-class F1s.
    *
    * Plan: the confusion matrix is one corpus pass into a ≤|langs|²
    * relation; everything downstream is class-grain arithmetic. */
  def langidEval(spark: SparkSession, dir: String): DataFrame = {
    val conf = langIdConfusion(spark, dir)
      .localCheckpoint() // class-grain confusion, read by 4 branches
    val byTrue = conf.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    val byPred = conf.groupBy(col("pred_lang"))
      .agg(sum(col("n")).as("n_pred"))
    val tp = conf.filter(col("lang") === col("pred_lang"))
      .select(col("lang"), col("n").as("tp"))
    val tot = conf.agg(sum(col("n")).as("n_all"))
    val acc = conf.filter(col("lang") === col("pred_lang"))
      .agg(sum(col("n")).as("n_correct"))
    val perClass = byTrue
      .join(broadcast(tp), Seq("lang"), "left")
      .join(broadcast(byPred.withColumnRenamed("pred_lang", "lang")),
        Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) -
          coalesce(col("tp"), lit(0L))).as("fp"),
        (col("n_true") - coalesce(col("tp"), lit(0L))).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
    val macroF1 = perClass.agg(
      (sum(col("f1").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("macro_f1"))
    perClass
      .crossJoin(broadcast(macroF1)) // 1-row macro scalar
      .crossJoin(broadcast(acc)) // 1-row correct count
      .crossJoin(broadcast(tot)) // 1-row total
      .select(col("lang"), col("tp"), col("fp"), col("fn"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"),
        round(col("n_correct").cast("double") / col("n_all"), 6)
          .as("accuracy"),
        round(col("macro_f1"), 6).as("macro_f1"))
      .orderBy(col("lang"))
  }
  /** Character-level unigram entropy per language — the
    * bits-per-character floor under [[tokenEntropy]]'s token-level
    * number and [[compressionRatio]]'s empirical one: H over the
    * character distribution (split-to-chars explode, exact counts,
    * quantized −p·log₂p terms), plus the character vocabulary and the
    * redundancy 1 − H/log₂|V| that says how far the script sits from
    * its own uniform bound.
    *
    * Plan: one explode → (lang, char) hash-agg (map-side partials),
    * then vocabulary-grain arithmetic to |langs| rows. */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    val chars = Tables(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("lang"), col("ch"))
      .agg(count(lit(1)).as("n"))
    val tot = chars.groupBy(col("lang")).agg(sum(col("n")).as("nt"),
      count(lit(1)).as("vocab"))
    chars.join(broadcast(tot), Seq("lang"))
      .withColumn("term",
        (col("n").cast("double") / col("nt") *
          log(2.0, col("nt").cast("double") / col("n")))
          .cast("decimal(28,12)"))
      .groupBy(col("lang"))
      .agg(max(col("nt")).as("n_chars"), max(col("vocab")).as("vocab"),
        sum(col("term")).as("h"))
      .select(col("lang"), col("n_chars"), col("vocab"),
        round(col("h").cast("double"), 6).as("entropy_bits"),
        round(lit(1.0) - col("h").cast("double") /
          (log(col("vocab").cast("double")) / math.log(2.0)), 6)
          .as("redundancy"))
      .orderBy(col("lang"))
  }

  /** Simple Good–Turing count-of-counts re-estimation per language —
    * the frequency smoothing that sits between [[hapaxStats]]'s raw
    * singleton census and [[kneserNey]]'s discounting: for the low
    * counts r = 1..5 (where the adjustment matters), the
    * count-of-counts N_r, the Turing-adjusted count
    * r* = (r+1)·N_{r+1}/N_r, the smoothed probability p_GT = r* / N,
    * and the per-language unseen mass P₀ = N₁/N that every add-k
    * comparison understates. A null r* marks an empty next bucket —
    * reported, not imputed (SGT's log-linear fallback is a modeling
    * choice this census deliberately leaves to the consumer).
    *
    * Exactness: N_r and N are exact BIGINTs; r* and p_GT are single
    * double ratios rounded at the edge.
    *
    * Plan: one token pass to (lang, token) counts, a (lang, r) re-agg
    * (the count-of-counts relation is tiny — r is bounded by the max
    * token frequency), a lead window and a 1-row-per-lang total join
    * on that bounded relation. */
  def goodTuring(spark: SparkSession, dir: String,
                 maxR: Int = 5): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val cofc = counts.groupBy(col("lang"), col("cnt").as("r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = counts.groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_tokens"))
    cofc
      .withColumn("n_next", lead(col("n_r"), 1).over(
        Window.partitionBy(col("lang")).orderBy(col("r"))))
      .withColumn("next_r", lead(col("r"), 1).over(
        Window.partitionBy(col("lang")).orderBy(col("r"))))
      .filter(col("r") <= maxR)
      .join(tot, Seq("lang"))
      .withColumn("r_star",
        when(col("next_r") === col("r") + 1,
          (col("r") + 1).cast("double") * col("n_next") / col("n_r")))
      .withColumn("p0_num", max(when(col("r") === 1, col("n_r")))
        .over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("r"), col("n_r"),
        round(col("r_star"), 6).as("r_star"),
        round(col("r_star") / col("n_tokens").cast("double"), 9)
          .as("p_gt"),
        round(col("p0_num").cast("double") /
          col("n_tokens").cast("double"), 9).as("p0_unseen"))
      .orderBy(col("lang"), col("r"))
  }

  /** BM25 top-k retrieval — the lexical ranking function production
    * search stacks still run under every neural re-ranker (and the
    * natural hybrid partner of [[Curation.rankFusion]]): score(q, d) =
    * Σ_t idf(t) · tf·(k₁+1)/(tf + k₁·(1−b+b·len/avglen)) with the
    * BM25+ idf = ln(1 + (N−df+0.5)/(df+0.5)), k₁ = 1.2, b = 0.75. The
    * query is DATA-DRIVEN for determinism: the three tokens at
    * document-frequency ranks 20–22 (df desc, token asc) — frequent
    * enough to touch many documents, rare enough that idf still
    * discriminates.
    *
    * Determinism: df/tf/lengths are exact BIGINTs; each per-term score
    * quantizes to DECIMAL(28,12) before the per-doc sum; ranking ties
    * on doc_id.
    *
    * Plan: one token pass to (doc, token) tf grain (the posting
    * shuffle every text statistic pays); df and avg length are
    * bounded aggregates; the 3-term query BROADCASTS into the posting
    * join so scoring touches only matching postings — never the full
    * corpus × query cross. Top-k is one rank window. */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(spark, dir, k1, b)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("long").as("rk"), col("doc_id"),
        col("n_terms_hit"),
        round(col("score").cast("double"), 6).as("bm25"))
      .orderBy(col("rk"))

  /** The lexical scoring kernel [[bm25TopK]] and [[hybridRetrieval]]
    * SHARE (single home — a constant or query-window change edits one
    * place, so the hybrid ranking can never silently de-sync from the
    * lexical operator): BM25+ per-doc scores on the data-driven
    * df-rank-20–22 query. Returns (doc_id, n_terms_hit, score) at
    * matching-doc grain; `score` is the DECIMAL(28,12) sum of
    * quantized per-term scores. Plan shape as documented on
    * [[bm25TopK]]: one posting shuffle, broadcast query + corpus
    * stats. */
  private def bm25Scored(spark: SparkSession, dir: String,
      k1: Double, b: Double): DataFrame =
    bm25ScoredBy(spark, dir, k1, b) { (_, df) =>
      df.withColumn("rk", row_number().over(
          Window.orderBy(col("df").desc, col("token"))))
        .filter(col("rk").between(20, 22))
        .select(lit(0L).as("q_id"), col("token"), col("df"))
    }.drop("q_id")

  /** The MULTI-QUERY generalization of the BM25 kernel the single-
    * query scorer above is now a specialization of: `mkQuery` maps the
    * (doc, token) tf relation and the token df relation to a SMALL
    * (q_id, token, df) query-term relation (broadcast into the posting
    * join), and scoring/grouping runs per (q_id, doc_id). The scoring
    * expression is the single home for the BM25+ formula — a constant
    * change here moves every lexical arm at once. */
  private def bm25ScoredBy(spark: SparkSession, dir: String,
      k1: Double, b: Double)(
      mkQuery: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val tf = Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
    val nDocs = lens.agg(count(lit(1)).as("n"),
      sum(col("len")).as("total_len"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val query = mkQuery(tf, df) // (q_id, token, df) — small by contract
    tf.join(broadcast(query), Seq("token"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(nDocs)) // 1-row corpus stats
      .withColumn("idf", log(lit(1.0) +
        (col("n").cast("double") - col("df") + 0.5) /
          (col("df").cast("double") + 0.5)))
      .withColumn("norm", lit(k1) * (lit(1.0 - b) + lit(b) *
        col("len").cast("double") * col("n") /
        col("total_len").cast("double")))
      .withColumn("term_score",
        (col("idf") * col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") + col("norm")))
          .cast("decimal(28,12)"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("term_score")).as("score"))
  }

  /** Cross-entropy MATRIX between the source unigram distributions —
    * the pairwise domain-distance table a mixture designer reads
    * before setting [[Curation.mixtureWeights]]: H(Pₐ, Q_b) =
    * −Σ_t pₐ(t)·ln q_b(t) with pₐ the source's EXACT empirical
    * distribution and q_b add-1 smoothed over the shared global
    * vocabulary (so a token absent from b is priced, not undefined),
    * plus KL(Pₐ‖Q_b) = H(Pₐ, Q_b) − H(Pₐ) against the unsmoothed
    * self-entropy. Asymmetric by design — "a reads like b" and
    * "b reads like a" are different facts.
    *
    * Per-token terms quantize to DECIMAL(28,12) before the sum.
    *
    * Plan: one token pass to (source, token) counts; the pair matrix
    * expands each source's vocabulary |sources| times (a bounded
    * constant), joined by token — the posting shuffle, never
    * all-pairs over rows. */
  def sourceCeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "documents")
      .select(col("source"), explode(tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source"))
      .agg(sum(col("c")).as("n_src"))
    val vocab = counts.agg(countDistinct(col("token")).as("v"))
    val srcB = totals.select(col("source").as("src_b"),
      col("n_src").as("n_b"))
    val expanded = counts
      .join(totals, Seq("source"))
      .crossJoin(broadcast(srcB))   // |sources| bounded expansion
      .join(counts.select(col("source").as("src_b"),
        col("token"), col("c").as("c_b")), Seq("src_b", "token"), "left")
      .crossJoin(broadcast(vocab))  // 1-row vocabulary size
      .withColumn("p", col("c").cast("double") /
        col("n_src").cast("double"))
      .withColumn("lnq", log(
        (coalesce(col("c_b"), lit(0L)) + 1).cast("double") /
          (col("n_b") + col("v")).cast("double")))
      .withColumn("ce_term", (-col("p") * col("lnq"))
        .cast("decimal(28,12)"))
      .withColumn("h_term",
        (-col("p") * log(col("p"))).cast("decimal(28,12)"))
    expanded.groupBy(col("source").as("src_a"), col("src_b"))
      .agg(sum(col("ce_term")).as("ce"), sum(col("h_term")).as("h"))
      .select(col("src_a"), col("src_b"),
        round(col("ce").cast("double"), 6).as("cross_entropy"),
        round(col("ce").cast("double") - col("h").cast("double"), 6)
          .as("kl_a_b"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Tokenizer OOV-rate evaluation — the held-out vocabulary-coverage
    * check [[bpeEncode]]'s in-corpus census can't give (its word join
    * silently covers every word the vocabulary was trained ON): the
    * word vocabulary is "trained" on the EVEN doc_ids and applied to
    * the ODD ones, reporting per language the held-out word-TYPE and
    * word-OCCURRENCE OOV rates and the character mass that would fall
    * to byte-fallback. The occurrence rate is the one that prices a
    * tokenizer (frequent words are covered first); the type rate is
    * the long tail.
    *
    * Exactness: all counts and character masses are BIGINTs; two
    * ratio divisions per row.
    *
    * Plan: two token passes (train vocabulary, held-out words) with
    * the bpeWords normalization (lowercase, alphabetic), one
    * vocabulary left-anti-shaped join, a language census. */
  def bpeOov(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val trainVocab = d.filter(col("doc_id") % 2 === 0)
      .select(explode(tokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .select(col("w")).distinct()
    val heldOut = d.filter(col("doc_id") % 2 =!= 0)
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .select(col("lang"), lower(col("tok")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("occ"))
    heldOut
      .join(trainVocab.withColumn("known", lit(1L)), Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("occ")).as("n_occ"),
        sum(when(col("known").isNull, 1L).otherwise(0L))
          .as("oov_types"),
        sum(when(col("known").isNull, col("occ")).otherwise(0L))
          .as("oov_occ"),
        sum(when(col("known").isNull, col("occ") * length(col("w")))
          .otherwise(0L)).as("oov_chars"))
      .select(col("lang"), col("n_types"), col("oov_types"),
        round(col("oov_types").cast("double") /
          col("n_types").cast("double"), 6).as("oov_type_rate"),
        col("n_occ"), col("oov_occ"),
        round(col("oov_occ").cast("double") /
          col("n_occ").cast("double"), 6).as("oov_occ_rate"),
        col("oov_chars"))
      .orderBy(col("lang"))
  }

  /** HYBRID lexical+semantic retrieval via reciprocal-rank fusion —
    * the modern two-tower search capstone connecting the text and
    * vector halves of this library: the lexical list is [[bm25TopK]]'s
    * BM25 ranking on the data-driven 3-term query; the semantic
    * anchor is the TOP-1 lexical hit's embedding (the
    * "more-like-this" expansion a hybrid engine runs when the query
    * has no dense encoding), the semantic list ranks every other
    * document by f32-exact cosine to that anchor; and the fused score
    * is RRF = Σ 1/(60 + rankᵢ) over the lists a document appears in
    * (Cormack's constant). Documents are vectors here by the shared
    * doc_id = vec_id key. Standard RRF fuses TRUNCATED lists: each
    * list is cut to its top `listN` (default 100) — absence from a
    * list is rank-∞, contributing 0 exactly as the coalesce does —
    * so both rank windows carry an immediate rank-limit filter and
    * plan as map-side partial top-k (WindowGroupLimit), never a
    * corpus-sized single-partition sort. The readout shows both
    * source ranks per fused hit — which list carried it (NULL = the
    * document was outside that list's top-`listN`).
    *
    * Determinism: both ranks tie on doc_id; RRF is the same 2-term
    * double expression cross-engine; fused order ties on doc_id.
    *
    * Plan: the shared [[bm25Scored]] kernel (single home with
    * [[bm25TopK]] — the posting join, query broadcast) + one
    * anchor-broadcast cosine map + two RANK-LIMITED windows
    * (WindowGroupLimit prunes each input partition to listN rows
    * before the exchange) + a full outer join of two ≤listN-row
    * lists. */
  def hybridRetrieval(spark: SparkSession, dir: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
      listN: Int = 100): DataFrame = {
    import graft.functions.ExprColumns
    val lexScored = bm25Scored(spark, dir, k1, b)
      .select(col("doc_id"), col("score").as("bm25"))
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("r_lex") <= listN) // truncated list -> group limit
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val anchor = lexScored.filter(col("r_lex") === 1)
      .join(emb, Seq("doc_id"))
      .select(col("doc_id").as("a_id"),
        col("embedding").as("a_emb"))
    val semScored = emb.join(broadcast(anchor)) // 1-row anchor
      .filter(col("doc_id") =!= col("a_id"))
      .withColumn("sim",
        ExprColumns.cosineF32(spark, "embedding", "a_emb"))
      .withColumn("r_sem", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("r_sem") <= listN) // truncated list -> group limit
      .select(col("doc_id"), col("r_sem"))
    lexScored.select(col("doc_id"), col("r_lex"))
      .join(semScored, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_sem")), lit(0.0)))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("long").as("rk"), col("doc_id"),
        col("r_lex").cast("long").as("r_lex"),
        col("r_sem").cast("long").as("r_sem"),
        round(col("rrf"), 6).as("rrf_score"))
      .orderBy(col("rk"))
  }

  /** Retrieval-QUALITY metrics — tie-aware nDCG@10 and reciprocal rank
    * for three retrieval arms against the exact-cosine truth, the
    * evaluation that justifies (or indicts) RRF over either list
    * alone (closing train→measure for retrieval the way probe-AUC did
    * for the quality classifier): the arms are (a) the lexical BM25
    * ranking ([[bm25Scored]], the shared kernel), (b) an APPROXIMATE
    * semantic arm — hyperplane-LSH candidates of the anchor re-ranked
    * by exact cosine, the realistic ANN serving list — and (c) their
    * RRF fusion over rank-100-truncated lists. Truth is the exact
    * cosine ranking to the anchor (the top-1 lexical hit's embedding,
    * the same more-like-this anchor [[hybridRetrieval]] expands); the
    * anchor document itself is removed from every arm (a retrieved
    * query is leakage, not relevance — lexical positions shift up by
    * one).
    *
    * TIE-AWARENESS: a document's gain is the MEAN of the ideal gain
    * g(r) = max(k+1−r, 0) over its exact-cosine rank INTERVAL
    * [1+|sim>s|, |sim≥s|] — equal-similarity documents are
    * interchangeable, so any permutation of a tie group scores the
    * same nDCG (the powerPareto boundary convention, applied to
    * relevance). IDCG is the untied ideal Σ (k+1−r)/log₂(r+1).
    * Reciprocal rank takes the first arm position carrying a
    * truth-top-k member. Gains and DCG terms are exact-integer
    * rationals evaluated in ONE double division each, quantized to
    * DECIMAL(28,12) before sums.
    *
    * Plan: the BM25 posting shuffle + one anchor-broadcast cosine map
    * (reused by truth, the semantic re-rank, and the gain intervals);
    * every rank window carries an immediate rank-limit filter
    * (WindowGroupLimit); gain intervals come from a bounded-axis
    * broadcast join (≤3k listed docs against the corpus sims — one
    * pass, never all-pairs). */
  def retrievalNdcg(spark: SparkSession, dir: String, k: Int = 10,
      listN: Int = 100, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.ExprColumns
    val lex = bm25Scored(spark, dir, k1, b)
      .select(col("doc_id"), col("score").as("bm25"))
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
      .filter(col("r_lex") <= listN)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val anchor = lex.filter(col("r_lex") === 1)
      .join(emb, Seq("doc_id"))
      .select(col("doc_id").as("a_id"), col("embedding").as("a_emb"))
    val sims = emb.join(broadcast(anchor)) // 1-row anchor
      .filter(col("doc_id") =!= col("a_id"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "embedding", "a_emb"))
      .select(col("doc_id"), col("sim"))
    // the anchor is rank 1 of its own lexical list by construction —
    // drop it and shift, so arm positions start at the first non-query hit
    val lexEval = lex.filter(col("r_lex") >= 2)
      .select(col("doc_id"), (col("r_lex") - 1).cast("long").as("r"))
    val vb = emb.select(col("doc_id"),
        posexplode(ExprColumns.hyperplaneLsh(spark, "embedding")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val ab = anchor.select(
        posexplode(ExprColumns.hyperplaneLsh(spark, "a_emb")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val semEval = vb.join(broadcast(ab), Seq("band", "bucket"))
      .select(col("doc_id")).distinct()
      .join(sims, Seq("doc_id")) // also drops the anchor id
      .withColumn("r0", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("r0") <= listN) // truncated list -> group limit
      .select(col("doc_id"), col("r0").cast("long").as("r"))
    val fused = lexEval.select(col("doc_id"), col("r").as("rl"))
      .join(semEval.select(col("doc_id"), col("r").as("rs")),
        Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rs")), lit(0.0)))
      .withColumn("r0", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("r0") <= k)
      .select(col("doc_id"), col("r0").cast("long").as("pos"))
    val lists = lexEval.filter(col("r") <= k)
        .select(lit("a_lexical").as("arm"), col("doc_id"),
          col("r").as("pos"))
      .unionByName(semEval.filter(col("r") <= k)
        .select(lit("b_semantic_lsh").as("arm"), col("doc_id"),
          col("r").as("pos")))
      .unionByName(fused
        .select(lit("c_hybrid_rrf").as("arm"), col("doc_id"), col("pos")))
    val cdocs = lists.select(col("doc_id")).distinct()
      .join(sims, Seq("doc_id"))
      .select(col("doc_id").as("cd"), col("sim").as("cs"))
    val gains = sims.join(broadcast(cdocs), col("sim") >= col("cs"))
      .groupBy(col("cd"))
      .agg(sum((col("sim") > col("cs")).cast("long")).as("nh"),
        count(lit(1)).as("ng"))
      .select(col("cd").as("doc_id"),
        (col("nh") + 1).as("lo"), col("ng").as("hi"))
      .withColumn("bcap", least(col("hi"), lit(k.toLong)))
      .withColumn("gain",
        when(col("lo") > k, lit(0.0))
          .otherwise(((col("bcap") - col("lo") + 1) *
            (lit(2L * (k + 1)) - col("lo") - col("bcap"))).cast("double") /
            (lit(2L) * (col("hi") - col("lo") + 1)).cast("double")))
      .select(col("doc_id"), col("gain"))
    val truth = sims
      .withColumn("rn", row_number().over(
        Window.orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("rn") <= k) // truth top-k -> group limit
      .select(col("doc_id"), lit(1L).as("rel"))
    val idcg = spark.range(1, k + 1)
      .agg(sum(((lit(k + 1) - col("id")).cast("double") /
        log2(col("id") + 1)).cast("decimal(28,12)")).as("idcg"))
    lists
      .join(broadcast(gains), Seq("doc_id"), "left")
      .join(broadcast(truth), Seq("doc_id"), "left")
      .withColumn("term", (coalesce(col("gain"), lit(0.0)) /
        log2(col("pos") + 1)).cast("decimal(28,12)"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_listed"),
        sum(coalesce(col("rel"), lit(0L))).as("n_relevant"),
        min(when(col("rel") === 1, col("pos"))).as("first_rel"),
        sum(col("term")).as("dcg"))
      .crossJoin(broadcast(idcg)) // 1-row ideal scalar
      .select(col("arm"), col("n_listed"), col("n_relevant"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6)
          .as("mrr"),
        round(col("dcg").cast("double"), 6).as("dcg10"),
        round(col("dcg").cast("double") /
          col("idcg").cast("double"), 6).as("ndcg10"))
      .orderBy(col("arm"))
  }

  /** MULTI-QUERY retrieval evaluation — [[retrievalNdcg]] generalized
    * from one data-driven anchor to a 20-query panel (the round-13
    * verdict's measurement gap: a single-query nDCG has no variance,
    * so it cannot RANK the arms reliably — and r15 item 8 widened the
    * panel from 5 to 20 so [[retrievalPanelCi]]'s bootstrap has
    * resampling room; the panel readout is mean ± spread per arm).
    * Queries are the nQ lowest embedding ids
    * (the [[graft.operators.Similarity.matryoshkaRecall]]
    * broadcast-queries convention); per query the three arms are
    * (a) a LEXICAL more-like-this — BM25+ over the query document's 8
    * RAREST tokens (global df asc, the discriminative end of its
    * vocabulary), through the shared [[bm25ScoredBy]] kernel —
    * (b) the approximate SEMANTIC arm (hyperplane-LSH candidates of
    * the query embedding, exact-cosine re-ranked), and (c) their RRF
    * fusion over rank-100-truncated lists. Truth per query is the
    * exact-cosine top-k; gains are the tie-aware rank-interval means
    * of [[retrievalNdcg]]; the query document itself is excluded from
    * every arm.
    *
    * Readout: one row per arm — n_queries, total listed/relevant, and
    * the MEAN / MIN / MAX nDCG@10 plus mean MRR over the panel, each
    * per-query value quantized to DECIMAL(28,12) before the
    * order-insensitive sum. Arm×query holes (an empty list for one
    * query) score 0 through an explicit spine, never a dropped row.
    *
    * Plan: ONE posting shuffle (the shared kernel), one corpus×5
    * broadcast cosine pass reused by truth, the semantic re-rank and
    * the gain intervals; EVERY rank window is partitioned by q_id and
    * carries an immediate rank-limit (map-side WindowGroupLimit, the
    * house discipline — nothing here funnels into one task); the gain
    * interval join broadcasts the ≤ 5·3k listed docs against the
    * cosine pass — one pass, never all-pairs. */
  /** The spine-completed per-(arm, query) retrieval evaluation —
    * [[retrievalNdcgMulti]]'s interior, exposed so the bootstrap-CI
    * row ([[retrievalPanelCi]]) consumes the identical panel: columns
    * (arm, q_id, n_listed, n_relevant, mrr, ndcg), one row per
    * arm×query with holes scored 0 through the explicit spine. */
  private[operators] def retrievalPerQuery(spark: SparkSession,
      dir: String, k: Int = 10, listN: Int = 100, nQ: Int = 20,
      mTerms: Int = 8, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.functions.ExprColumns
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val qids = emb.select(col("doc_id")).orderBy(col("doc_id"))
      .limit(nQ).select(col("doc_id").as("q_id"))
    val qemb = qids.join(
      emb.select(col("doc_id").as("q_id"),
        col("embedding").as("q_emb")), Seq("q_id"))
    val lexScores = bm25ScoredBy(spark, dir, k1, b) { (tf, df) =>
      tf.join(broadcast(qids.select(col("q_id").as("doc_id"))),
          Seq("doc_id"))
        .select(col("doc_id").as("q_id"), col("token"))
        .join(df, Seq("token"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("df").asc, col("token"))))
        .filter(col("rk") <= mTerms)
        .select(col("q_id"), col("token"), col("df"))
    }
    val lexEval = lexScores.filter(col("doc_id") =!= col("q_id"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("r") <= listN)
      .select(col("q_id"), col("doc_id"), col("r").cast("long").as("r"))
    val sims = emb.crossJoin(broadcast(qemb)) // nQ-row query panel
      .filter(col("doc_id") =!= col("q_id"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .select(col("q_id"), col("doc_id"), col("sim"))
    val vb = emb.select(col("doc_id"),
        posexplode(ExprColumns.hyperplaneLsh(spark, "embedding")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val ab = qemb.select(col("q_id"),
        posexplode(ExprColumns.hyperplaneLsh(spark, "q_emb")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val semEval = vb.join(broadcast(ab), Seq("band", "bucket"))
      .select(col("q_id"), col("doc_id")).distinct()
      .join(sims, Seq("q_id", "doc_id")) // also drops the query id
      .withColumn("r0", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("r0") <= listN)
      .select(col("q_id"), col("doc_id"), col("r0").cast("long").as("r"))
    val fused = lexEval.select(col("q_id"), col("doc_id"),
        col("r").as("rl"))
      .join(semEval.select(col("q_id"), col("doc_id"),
        col("r").as("rs")), Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rs")), lit(0.0)))
      .withColumn("r0", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("r0") <= k)
      .select(col("q_id"), col("doc_id"),
        col("r0").cast("long").as("pos"))
    val lists = lexEval.filter(col("r") <= k)
        .select(lit("a_lexical").as("arm"), col("q_id"), col("doc_id"),
          col("r").as("pos"))
      .unionByName(semEval.filter(col("r") <= k)
        .select(lit("b_semantic_lsh").as("arm"), col("q_id"),
          col("doc_id"), col("r").as("pos")))
      .unionByName(fused.select(lit("c_hybrid_rrf").as("arm"),
        col("q_id"), col("doc_id"), col("pos")))
    val cdocs = lists.select(col("q_id"), col("doc_id")).distinct()
      .join(sims, Seq("q_id", "doc_id"))
      .select(col("q_id").as("cq"), col("doc_id").as("cd"),
        col("sim").as("cs"))
    val gains = sims.join(broadcast(cdocs),
        col("q_id") === col("cq") && col("sim") >= col("cs"))
      .groupBy(col("cq"), col("cd"))
      .agg(sum((col("sim") > col("cs")).cast("long")).as("nh"),
        count(lit(1)).as("ng"))
      .select(col("cq").as("q_id"), col("cd").as("doc_id"),
        (col("nh") + 1).as("lo"), col("ng").as("hi"))
      .withColumn("bcap", least(col("hi"), lit(k.toLong)))
      .withColumn("gain",
        when(col("lo") > k, lit(0.0))
          .otherwise(((col("bcap") - col("lo") + 1) *
            (lit(2L * (k + 1)) - col("lo") - col("bcap"))).cast("double") /
            (lit(2L) * (col("hi") - col("lo") + 1)).cast("double")))
      .select(col("q_id"), col("doc_id"), col("gain"))
    val truth = sims
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("rn") <= k) // truth top-k -> group limit
      .select(col("q_id"), col("doc_id"), lit(1L).as("rel"))
    val idcg = spark.range(1, k + 1)
      .agg(sum(((lit(k + 1) - col("id")).cast("double") /
        log2(col("id") + 1)).cast("decimal(28,12)")).as("idcg"))
    val per = lists
      .join(broadcast(gains), Seq("q_id", "doc_id"), "left")
      .join(broadcast(truth), Seq("q_id", "doc_id"), "left")
      .withColumn("term", (coalesce(col("gain"), lit(0.0)) /
        log2(col("pos") + 1)).cast("decimal(28,12)"))
      .groupBy(col("arm"), col("q_id"))
      .agg(count(lit(1)).as("n_listed"),
        sum(coalesce(col("rel"), lit(0L))).as("n_relevant"),
        min(when(col("rel") === 1, col("pos"))).as("first_rel"),
        sum(col("term")).as("dcg"))
      .crossJoin(broadcast(idcg)) // 1-row ideal scalar
      .select(col("arm"), col("q_id"), col("n_listed"),
        col("n_relevant"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0))
          .cast("decimal(28,12)").as("mrr"),
        (col("dcg").cast("double") / col("idcg").cast("double"))
          .cast("decimal(28,12)").as("ndcg"))
    val arms = Seq("a_lexical", "b_semantic_lsh", "c_hybrid_rrf")
      .map(a => spark.range(1).select(lit(a).as("arm")))
      .reduce(_.unionByName(_))
    arms.crossJoin(broadcast(qids)) // |arms|×nQ arm×query spine
      .join(per, Seq("arm", "q_id"), "left")
      .select(col("arm"), col("q_id"),
        coalesce(col("n_listed"), lit(0L)).as("n_listed"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("mrr"), lit(0).cast("decimal(28,12)")).as("mrr"),
        coalesce(col("ndcg"), lit(0).cast("decimal(28,12)"))
          .as("ndcg"))
  }

  def retrievalNdcgMulti(spark: SparkSession, dir: String, k: Int = 10,
      listN: Int = 100, nQ: Int = 20, mTerms: Int = 8,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    retrievalPerQuery(spark, dir, k, listN, nQ, mTerms, k1, b)
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("n_listed")).as("n_listed_total"),
        sum(col("n_relevant")).as("n_relevant_total"),
        round(sum(col("ndcg")).cast("double") / count(lit(1)), 6)
          .as("ndcg10_mean"),
        round(min(col("ndcg")).cast("double"), 6).as("ndcg10_min"),
        round(max(col("ndcg")).cast("double"), 6).as("ndcg10_max"),
        round(sum(col("mrr")).cast("double") / count(lit(1)), 6)
          .as("mrr_mean"))
      .orderBy(col("arm"))
  }

  /** PAIRED Poisson-bootstrap CI on the retrieval panel (r15 verdict
    * item 8) — [[retrievalNdcgMulti]]'s mean±spread lifted to an
    * actual interval, and the arm ORDERING made a measured quantity:
    * the same 20-query per-(arm, query) nDCG panel
    * ([[retrievalPerQuery]] — the identical relation, not a copy) is
    * resampled `reps` times with per-QUERY Poisson(1) weights drawn
    * from the [[graft.operators.EventAnalytics.poissonBootstrap]]
    * md5-coin inverse-CDF convention. The weight keys on
    * (replicate, q_id) ONLY, so all three arms see the SAME resampled
    * query panel per replicate — the PAIRED bootstrap, which is what
    * makes the per-replicate winner census meaningful. Per arm:
    * the unweighted point mean, bootstrap mean/SE, the ceil-rank
    * 2.5%/97.5% replicate band, and top_share — the fraction of
    * replicates this arm wins outright (ties to the alphabetically
    * first arm). Overlapping CIs with a split top_share IS the
    * honest "the panel cannot rank these arms" readout.
    *
    * Exactness: per-query nDCG is DECIMAL(28,12); weights are small
    * ints; each replicate mean is one double division quantized back
    * to DECIMAL(28,12), so every reduction over replicates is
    * order-independent; the winner rank is per-replicate (bounded by
    * |arms|).
    *
    * Scale shape: the corpus-scale work is [[retrievalPerQuery]]'s
    * one posting shuffle + one broadcast cosine pass; everything here
    * operates on the |arms|×nQ panel × reps ≤ 12k-row relation. */
  def retrievalPanelCi(spark: SparkSession, dir: String, k: Int = 10,
      listN: Int = 100, nQ: Int = 20, mTerms: Int = 8,
      reps: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perq = retrievalPerQuery(spark, dir, k, listN, nQ, mTerms)
      .select(col("arm"), col("q_id"), col("ndcg"))
      .localCheckpoint(false) // |arms|×nQ panel: point + replicates
    val u = conv(substring(md5(concat(col("rep").cast("string"),
      lit(":"), col("q_id").cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .otherwise(5L)
    val repMeans = perq
      .select(col("arm"), col("q_id"), col("ndcg"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("w", w)
      .groupBy(col("arm"), col("rep"))
      // w cast to DECIMAL(1,0) (it is 0..5): ndcg(28,12) x LONG would
      // exceed precision 38 and Spark's precision-loss path silently
      // REDUCES the product scale to 6 (each term rounded at 1e-6)
      // while DuckDB silently computes the oversized product in DOUBLE
      // — two different inexact paths that drifted the replicate means
      // ~7e-9 apart and flipped boot_mean's 6-dp rounding at sf0.1.
      // (28,12) x (1,0) stays within precision: both engines EXACT.
      .agg(sum(col("ndcg") * col("w").cast("decimal(1,0)")).as("num"),
        sum(col("w")).as("den"))
      .select(col("arm"), col("rep"),
        // DECIMAL(18,9) (the poissonBootstrap convention): its square
        // is precision 37 — exact in BOTH engines, where a (28,12)
        // square would overflow precision 38 and round divergently.
        // den=0 (every Poisson weight in the replicate drew 0) is
        // coerced to mean 0.0 in BOTH engines — a deliberate bias with
        // probability e^-nQ per replicate-arm: negligible at the nQ=20
        // default (~2e-9), but at nQ<10 some of the `reps` replicates
        // start landing on it (expected count reps·e^-nQ ≈ 1% of 200
        // at nQ=10) and the CI deflates. Callers lowering nQ below 10
        // must filter den=0 replicates out instead (and re-derive the
        // oracle, which mirrors this exact convention).
        when(col("den") > 0, col("num").cast("double") /
          col("den").cast("double")).otherwise(lit(0.0))
          .cast("decimal(18,9)").as("m"))
      .localCheckpoint(false) // reps×|arms| grain: CI + winner census
    val wins = repMeans
      .withColumn("rk", row_number().over(Window.partitionBy(col("rep"))
        .orderBy(col("m").desc, col("arm"))))
      .filter(col("rk") === 1) // per-replicate winner (|arms|-bounded)
      .groupBy(col("arm")).agg(count(lit(1)).as("n_top"))
    val loRk = math.ceil(0.025 * reps).toLong
    val hiRk = math.ceil(0.975 * reps).toLong
    val ci = repMeans
      .withColumn("rn", row_number().over(Window.partitionBy(col("arm"))
        .orderBy(col("m"), col("rep")))) // reps-bounded per arm
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_reps"),
        // exact nano-unit sum of the replicate means: boot_mean's
        // 6-dp rounding is done in INTEGER half-up division below, not
        // round(double, 6) — Spark rounds the shortest decimal string
        // of a double where DuckDB rounds its true binary value, and a
        // mean landing a half-ulp off the .5e-6 boundary flips the two
        // engines apart (observed at sf0.1, boot_mean 0.160918 vs
        // 0.160919)
        sum((col("m") * lit(1000000000L)).cast("long")).as("si"),
        ((sum(col("m") * col("m")).cast("double") -
          sum(col("m")).cast("double") * sum(col("m")).cast("double") /
            count(lit(1))) / (count(lit(1)) - 1)).as("var_r"),
        min(when(col("rn") >= loRk, col("m"))).cast("double")
          .as("lo_r"),
        min(when(col("rn") >= hiRk, col("m"))).cast("double")
          .as("hi_r"))
    val point = perq.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_queries"),
        (sum(col("ndcg")).cast("double") / count(lit(1)))
          .as("point_r"))
    point.join(ci, Seq("arm"))
      .join(wins, Seq("arm"), "left")
      .select(col("arm"), col("n_queries"), col("n_reps"),
        round(col("point_r"), 6).as("ndcg10_mean"),
        // half-up at 6 dp as exact integer floor-div of nano-units
        // (si/(n·1000) is the mean in 1e-6 units); the final /1e6 is
        // one IEEE division of two exact integers — engine-identical
        (expr("(2 * si + n_reps * 1000) div (2 * n_reps * 1000)")
          .cast("double") / 1000000.0).as("boot_mean"),
        round(sqrt(col("var_r")), 6).as("boot_se"),
        round(col("lo_r"), 6).as("ci_lo"),
        round(col("hi_r"), 6).as("ci_hi"),
        round(coalesce(col("n_top"), lit(0L)).cast("double") /
          col("n_reps").cast("double"), 6).as("top_share"))
      .orderBy(col("arm"))
  }

  /** Interpolated KNESER-NEY bigram language model, held-out
    * perplexity per language — the smoothing rung above the add-1
    * ([[bigramLogprob]]) and Good–Turing rows, and still the strongest
    * count-based n-gram smoother: with absolute discount D = 0.75,
    *   p(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·)
    *            + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··),
    * where the backoff distribution is the CONTINUATION count (in how
    * many distinct contexts does w₂ appear) — the KN insight that
    * "Francisco" is frequent but follows only "San". Held-out bigrams
    * whose context was never seen (or whose target has no
    * continuation mass) are CENSUSED as OOV, not priced — the
    * [[bpeOov]] discipline.
    *
    * Exactness: all counts are exact BIGINTs; each bigram's NLL is one
    * double expression quantized to DECIMAL(28,12), then
    * occurrence-weighted into exact decimal sums; perplexity is one
    * exp at the edge.
    *
    * Plan: train and held-out corpora collapse to bigram-type grain
    * first (the posting shuffle); context/continuation relations are
    * vocabulary-grain aggregates of the PAIR relation (never a second
    * corpus pass); the scoring join is pair-keyed. */
  def knBigram(spark: SparkSession, dir: String,
      discount: Double = 0.75): DataFrame = {
    val d = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
    def bigrams(df: DataFrame): DataFrame = df
      .select(col("lang"), explode(expr(
        """transform(slice(tk, 1, greatest(size(tk) - 1, 0)),
             (x, i) -> struct(x AS w1, element_at(tk, i + 2) AS w2))"""))
        .as("b"))
      .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val tr = bigrams(d.filter(col("doc_id") % 2 === 0))
    val ho = bigrams(d.filter(col("doc_id") % 2 =!= 0))
      .groupBy(col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("f"))
    val pc = tr.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val ctx = pc.groupBy(col("w1"))
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1w1"))
    val cont = pc.groupBy(col("w2")).agg(count(lit(1)).as("n1w2"))
    val n1all = pc.agg(count(lit(1)).as("n1all"))
    val scored = ho
      .join(pc, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(n1all)) // 1-row bigram-type total
      .withColumn("oov_ctx", col("cw1").isNull)
      .withColumn("oov_cont", col("cw1").isNotNull && col("n1w2").isNull)
      .withColumn("nll",
        when(col("cw1").isNotNull && col("n1w2").isNotNull,
          (-log(
            greatest(coalesce(col("c"), lit(0L)).cast("double") -
              discount, lit(0.0)) / col("cw1").cast("double") +
              lit(discount) * col("n1w1").cast("double") /
                col("cw1").cast("double") *
                (col("n1w2").cast("double") / col("n1all").cast("double"))
          )).cast("decimal(28,12)")))
    scored.groupBy(col("lang"))
      .agg(sum(when(col("nll").isNotNull, col("f")).otherwise(0L))
          .as("n_eval"),
        sum(when(col("oov_ctx"), col("f")).otherwise(0L)).as("n_oov_ctx"),
        sum(when(col("oov_cont"), col("f")).otherwise(0L))
          .as("n_oov_cont"),
        sum((col("nll") * col("f")).cast("decimal(38,12)")).as("nll_sum"))
      .select(col("lang"), col("n_eval"), col("n_oov_ctx"),
        col("n_oov_cont"),
        round(col("nll_sum").cast("double") /
          col("n_eval").cast("double"), 6).as("mean_nll"),
        round(exp(col("nll_sum").cast("double") /
          col("n_eval").cast("double")), 4).as("perplexity"))
      .orderBy(col("lang"))
  }

  /** SentencePiece-style UNIGRAM-LM tokenizer trainer — the
    * alternative to the merge-driven BPE family ([[bpeMerges]] trains
    * bottom-up; the unigram model starts from an OVER-complete
    * substring vocabulary and PRUNES): seed pieces are the `v0`
    * highest-frequency character substrings (length ≤ `maxPiece`) of
    * the train-split word types plus every single character (the
    * coverage floor), and each hard-EM round (1) VITERBI-segments
    * every word type under costs −ln p(piece) and (2) re-estimates p
    * from the occurrence-weighted piece usage, pruning to the
    * `vKeep` most-used pieces (+ characters, add-1 smoothed so
    * coverage survives zero usage). Two rounds run — seed→usage and
    * pruned→usage — and the census row per round (vocab size, piece
    * count, pieces/token, NLL/token, top multi-char piece) is the
    * compression-vs-likelihood readout a tokenizer team compares
    * against [[bpeEncode]] on the same corpus.
    *
    * Determinism/exactness: costs quantize to DECIMAL(28,12); DP
    * sums are exact decimal additions, so the argmin (ties → smaller
    * start = LONGER final piece) is bit-stable cross-engine; usage
    * and NLL are integer-weighted decimal sums. Words longer than
    * `maxLen` chars are excluded (the DP unrolls `maxLen` levels —
    * the bound is structural, not a sample).
    *
    * Plan: word-TYPE grain throughout (the corpus collapses to the
    * train vocabulary first — at 100 TB the heavy-tail vocabulary is
    * the posting shuffle every text operator here pays, and each DP
    * level is one equi-join + per-word argmin agg on that grain).
    * Each Viterbi level and backpointer-walk step localCheckpoints:
    * the level relations are vocabulary-sized, and without the cut
    * the level-(i) lineage re-evaluates levels i−1..i−4
    * combinatorially. */
  def unigramTokenizer(spark: SparkSession, dir: String,
      maxLen: Int = 10, maxPiece: Int = 4, v0: Int = 300,
      vKeep: Int = 200): DataFrame = {
    val art = unigramRound1(spark, dir, maxLen, maxPiece, v0, vKeep)
    val (_, row2) = unigramEmRound(spark, 2, art.words,
      art.cost1, art.vocab1, maxLen, maxPiece)
    art.row1.unionByName(row2).orderBy(col("em_round"))
  }

  /** The FROZEN artifact a downstream encoder ships: the round-1-
    * re-estimated unigram piece costs (the exact relation round 2 of
    * [[unigramTokenizer]] trains against). Single home — the batch
    * trainer and the streaming frozen-apply row
    * (`stream_unigram_encode`) both read THIS, so the streaming
    * encoder can never drift from the trainer's vocabulary. */
  private[graft] def unigramFrozenCosts(spark: SparkSession,
      dir: String, maxLen: Int = 10, maxPiece: Int = 4, v0: Int = 300,
      vKeep: Int = 200): DataFrame =
    unigramRound1(spark, dir, maxLen, maxPiece, v0, vKeep).cost1

  private final case class UnigramRound1(words: DataFrame,
    vocab1: DataFrame, cost1: DataFrame, row1: DataFrame)

  private def unigramRound1(spark: SparkSession, dir: String,
      maxLen: Int, maxPiece: Int, v0: Int, vKeep: Int): UnigramRound1 = {
    val words = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .select(explode(tokens(col("text"))).as("t"))
      .select(lower(col("t")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxLen)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .withColumn("len", length(col("w")))
      // lazy (window-free; see withSpans discipline)
      .localCheckpoint(false) // train word types: reused by c0 + 2 rounds
    // seed census: every candidate substring (length ≤ maxPiece) of the
    // train types, occurrence-weighted — ONE explode + hash-agg, the
    // only place the span space materializes as rows (the EM rounds run
    // the in-row DP instead; see unigramEmRound / withSpans)
    val c0 = words
      .select(col("f"), explode(expr(
        s"""flatten(transform(sequence(1, len), st ->
              transform(sequence(1, least($maxPiece, len - st + 1)),
                pl -> substring(w, st, pl))))""")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("f")).as("c"))
    val vocab0 = c0
      .withColumn("rk", row_number().over(
        Window.orderBy(col("c").desc, col("piece"))))
      .filter(col("rk") <= v0)
      .select(col("piece"), col("c"))
      .unionByName(c0.filter(length(col("piece")) === 1)
        .select(col("piece"), col("c")))
      .groupBy(col("piece")).agg(max(col("c")).as("c"))
      .localCheckpoint()
    val t0 = vocab0.agg(sum(col("c")).as("t"))
    val cost0 = vocab0.crossJoin(broadcast(t0)) // 1-row normalizer
      .select(col("piece"),
        (-log(col("c").cast("double") / col("t").cast("double")))
          .cast("decimal(28,12)").as("cost"))
    val (u1, row1) = unigramEmRound(spark, 1, words, cost0,
      vocab0, maxLen, maxPiece)
    val vocab1 = u1
      .withColumn("rk", row_number().over(
        Window.orderBy(col("u").desc, col("piece"))))
      .filter(col("rk") <= vKeep)
      .select(col("piece"), col("u"))
      .unionByName(vocab0.filter(length(col("piece")) === 1)
        .select(col("piece"))
        .join(u1, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("u"), lit(0L)).as("u")))
      .groupBy(col("piece")).agg(max(col("u")).as("u"))
      .localCheckpoint()
    val t1 = vocab1.agg(sum(col("u") + 1).as("t"))
    val cost1 = vocab1.crossJoin(broadcast(t1)) // 1-row normalizer
      .select(col("piece"),
        (-log((col("u") + 1).cast("double") / col("t").cast("double")))
          .cast("decimal(28,12)").as("cost"))
    UnigramRound1(words, vocab1, cost1, row1)
  }

  /** One hard-EM round of the unigram trainer (Viterbi DP + walk +
    * usage census + stats row) over a (w, f, len) word-type relation —
    * shared by both trainer rounds.
    *
    * r16 OPT: the per-level DP unroll + maxLen-step backpointer walk
    * (~25 shuffle barriers per EM round) is now ONE in-row fold per
    * word type ([[viterbiDpCol]] — bit-equal argmin, see its note);
    * the optimal segmentation's pieces are retraced from the same
    * dp/backpointer array inside the row. */
  private def unigramEmRound(spark: SparkSession, r: Int,
      words: DataFrame, vocabCost: DataFrame,
      vocabOf: DataFrame, maxLen: Int,
      maxPiece: Int): (DataFrame, DataFrame) = {
      val fin = withSpans(words, vocabCost, maxPiece)
        .withColumn("dparr", viterbiDpCol)
        .withColumn("fin", expr("element_at(dparr, len + 1)"))
        .filter(col("fin").getField("d").isNotNull)
        .select(col("w"), col("f"), col("len"),
          col("fin").getField("d").as("dp"),
          // the walk: follow backpointers from len to 0 (≤ maxLen
          // steps — every piece covers ≥ 1 char), emitting the same
          // (j = bp, i = pos) spans the relational walk retraced
          expr(s"""aggregate(sequence(1, $maxLen),
              named_struct('pos', len, 'ps',
                CAST(array() AS ARRAY<STRUCT<j: INT, i: INT>>)),
              (st, x) -> IF(st.pos <= 0, st,
                named_struct('pos', element_at(dparr, st.pos + 1).b,
                  'ps', concat(st.ps, array(named_struct(
                    'j', element_at(dparr, st.pos + 1).b,
                    'i', st.pos))))),
              st -> st.ps)""").as("ps"))
        // lazy (window-free): usage + stats + pc share one pass
        .localCheckpoint(false)
      val usage = fin
        .select(col("f"), col("w"), explode(col("ps")).as("p"))
        .select(col("f"),
          expr("substring(w, p.j + 1, p.i - p.j)").as("piece"))
        .groupBy(col("piece")).agg(sum(col("f")).as("u"))
        .localCheckpoint(false)
      val stats = fin.agg(count(lit(1)).as("n_word_types"),
        sum(col("f")).as("n_tokens"),
        sum((col("dp") * col("f")).cast("decimal(38,12)")).as("nll_sum"))
      // Σ f · |pieces| — exactly the old Σ f over the exploded walk rows
      val pc = fin.agg(sum(col("f") * size(col("ps"))).as("n_pieces"))
      val vsize = vocabOf.agg(count(lit(1)).as("vocab_size"))
      val top = usage.filter(length(col("piece")) > 1)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("u").desc, col("piece"))))
        .filter(col("rk") === 1)
        .select(col("piece").as("top_piece"),
          col("u").as("top_piece_count"))
      val row = vsize.crossJoin(broadcast(stats))
        .crossJoin(broadcast(pc)).crossJoin(broadcast(top))
        .select(lit(r.toLong).as("em_round"), col("vocab_size"),
          col("n_word_types"), col("n_tokens"), col("n_pieces"),
          round(col("n_pieces").cast("double") /
            col("n_tokens").cast("double"), 6).as("pieces_per_token"),
          round(col("nll_sum").cast("double") /
            col("n_tokens").cast("double"), 6).as("nll_per_token"),
          col("top_piece"), col("top_piece_count"))
      (usage, row)
  }

  /** 1-row (piece -> cost) map of a frozen cost relation — the in-row
    * encoders' broadcast vocabulary artifact (≤ vKeep + alphabet
    * entries, the size a production encoder ships as a file). */
  private def pieceCostMap(frozen: DataFrame): DataFrame =
    frozen.agg(map_from_entries(
      collect_list(struct(col("piece"), col("cost")))).as("cm"))

  /** (w, len, …) types + frozen costs -> same rows with an in-row
    * `spans` lattice column: every (j, i, cost) with a frozen piece at
    * substring(w, j+1, i-j), j = start − 1, i = end. try_element_at
    * keeps the lookup ANSI-safe; a train-unseen substring is simply
    * absent (NULL cost -> filtered).
    *
    * r16 OPT (guide §1.2/§2.4): the span lattice used to be an exploded
    * relation broadcast-joined to the cost table and re-joined per DP
    * level (~2 shuffle barriers per level × ~10 levels, each behind a
    * MEMORY_AND_DISK lazy checkpoint — the documented contended-box IO
    * amplification of r15/r16). With the vocabulary as a 1-row scalar
    * map, the lattice AND both encoders below run inside ONE narrow
    * projection per word type: zero exchanges, zero per-level
    * checkpoints, and the disk-latency multiplier is gone outright. */
  private def withSpans(types: DataFrame, frozen: DataFrame,
      maxPiece: Int): DataFrame =
    types.crossJoin(broadcast(pieceCostMap(frozen))) // 1-row scalar map
      .withColumn("spans", expr(
        s"""filter(
              flatten(transform(sequence(1, len), st ->
                transform(sequence(1, least($maxPiece, len - st + 1)),
                  pl -> named_struct(
                    'j', st - 1, 'i', st + pl - 1,
                    'cost', try_element_at(cm, substring(w, st, pl)))))),
              s -> s.cost IS NOT NULL)"""))
      .drop("cm")

  /** The exact-decimal Viterbi DP as ONE array fold over the in-row
    * span lattice: the dp entry for position p (array index p + 1) is
    * the argmin struct (d, b, np) the old per-level relational unroll
    * carried — same DECIMAL(28,12) per-level quantization (candidate
    * sums compare at the exact (29,12) width, the winner is stored
    * back at (28,12), a lossless cast for these magnitudes), same
    * tie-break (d, then smaller j; b = j is unique per candidate, so
    * the old min-struct's trailing fields never decided a minimum).
    * d IS NULL marks an unreachable position. */
  private def viterbiDpCol: Column = expr(
    """aggregate(
         sequence(1, len),
         array(named_struct(
           'd', CAST(0 AS DECIMAL(28,12)), 'b', -1,
           'np', CAST(0 AS BIGINT))),
         (acc, i) -> concat(acc, array(
           aggregate(
             filter(spans, s -> s.i = i
               AND element_at(acc, s.j + 1).d IS NOT NULL),
             CAST(NULL AS STRUCT<d: DECIMAL(28,12), b: INT, np: BIGINT>),
             (best, s) -> CASE
               WHEN best.d IS NULL
                 OR element_at(acc, s.j + 1).d + s.cost < best.d
                 OR (element_at(acc, s.j + 1).d + s.cost = best.d
                   AND s.j < best.b)
               THEN named_struct(
                 'd', CAST(element_at(acc, s.j + 1).d + s.cost
                   AS DECIMAL(28,12)),
                 'b', s.j,
                 'np', element_at(acc, s.j + 1).np + CAST(1 AS BIGINT))
               ELSE best END))))""")

  /** Frozen-cost Viterbi segmentation of an arbitrary (w, len)
    * word-TYPE relation — the batch-shaped encode kernel under a
    * trained unigram vocabulary. Returns (w, n_pieces, dp); a type
    * with no path through the frozen lattice (a train-unseen
    * character), or longer than the trainer's `maxLen` DP bound,
    * simply has no row — the caller's LEFT join reads that as OOV.
    * One narrow projection per type (see [[withSpans]]). */
  private[graft] def viterbiPieceCounts(types: DataFrame,
      frozen: DataFrame, maxLen: Int = 10,
      maxPiece: Int = 4): DataFrame =
    withSpans(types.filter(col("len") <= maxLen), frozen, maxPiece)
      .withColumn("dparr", viterbiDpCol)
      .withColumn("fin", expr("element_at(dparr, len + 1)"))
      .filter(col("fin").getField("d").isNotNull)
      .select(col("w"), col("fin").getField("np").as("n_pieces"),
        col("fin").getField("d").as("dp"))

  /** GREEDY longest-match-first segmentation of a (w, len) word-TYPE
    * relation under frozen piece costs — WordPiece's maximal-munch
    * rule, as ONE in-row fold (at position pos consume the LONGEST
    * vocabulary piece starting there; the longest match is unique per
    * (w, pos), so the old max-struct's pc field never decided a
    * maximum). Returns (w, np, cost); a word whose walk hits a
    * train-unseen character strands mid-word (pos stops advancing)
    * and emits no row — the same OOV set as the Viterbi encoder,
    * since the frozen vocabulary contains every train character as a
    * fallback. Per-step cost accumulation casts back to
    * DECIMAL(28,12) exactly like the old per-step relational cast. */
  private def greedyStCol(maxLen: Int): Column = expr(
    s"""aggregate(
          sequence(1, $maxLen),
          named_struct('pos', 0, 'np', CAST(0 AS BIGINT),
            'cost', CAST(0 AS DECIMAL(28,12))),
          (st, x) -> IF(st.pos = len, st,
            element_at(transform(array(
              aggregate(filter(spans, s -> s.j = st.pos),
                CAST(NULL AS STRUCT<j: INT, i: INT,
                  cost: DECIMAL(28,12)>),
                (b, s) -> IF(b.i IS NULL OR s.i > b.i, s, b))),
              m -> IF(m.i IS NULL, st,
                named_struct('pos', m.i,
                  'np', st.np + CAST(1 AS BIGINT),
                  'cost', CAST(st.cost + m.cost
                    AS DECIMAL(28,12))))), 1)))""")

  private[graft] def greedyPieceCounts(types: DataFrame,
      frozen: DataFrame, maxLen: Int = 10,
      maxPiece: Int = 4): DataFrame =
    withSpans(types, frozen, maxPiece)
      .withColumn("gst", greedyStCol(maxLen))
      .filter(col("gst").getField("pos") === col("len"))
      .select(col("w"), col("gst").getField("np").as("np"),
        col("gst").getField("cost").as("cost"))

  /** WORDPIECE-STYLE greedy-vs-optimal segmentation gap — the eval a
    * tokenizer team runs before shipping the maximal-munch fast path
    * (WordPiece/BERT encodes greedily; SentencePiece-unigram encodes
    * Viterbi-optimally — same vocabulary, different search): the
    * SHARED eval vocabulary encoded BOTH ways under the SAME frozen
    * unigram costs ([[unigramFrozenCosts]]), reported per language as
    * pieces-per-word for each arm, the occurrence share of words
    * where greedy lands on a strictly costlier segmentation, and the
    * mean excess NLL greedy pays — the number that says whether the
    * O(n) greedy encoder is safe or the DP is worth its cost on this
    * corpus. Greedy's cost can only exceed Viterbi's (the DP is the
    * minimum), and both arms strand on exactly the train-unseen-
    * character OOV set, so coverage is shared by construction.
    *
    * Determinism: both walks run on the same exact-decimal span
    * lattice; the greedy step is an argmax over (w, pos) groups with
    * a unique longest match; cost comparisons are exact DECIMAL.
    *
    * Scale shape: one corpus token pass to the shared eval grain;
    * both encoders run at word-TYPE grain over the bounded `maxLen`-
    * step unrolls ([[viterbiPieceCounts]]'s discipline — each step
    * LAZILY checkpointed so levels share work without per-level
    * blocking jobs, each a type-keyed equi-join + hash agg); the
    * census is |langs| rows. */
  def wordpieceGreedy(spark: SparkSession, dir: String,
      maxLen: Int = 10, maxPiece: Int = 4): DataFrame = {
    val lw = evalLangWords(spark, dir, maxLen)
    val types = lw.select(col("w")).distinct()
      .withColumn("len", length(col("w"))).localCheckpoint(false)
    val frozen = unigramFrozenCosts(spark, dir).localCheckpoint(false)
    // both encoders are narrow in-row folds over the same types relation
    // (no lattice relation to share any more — see withSpans)
    val vit = viterbiPieceCounts(types, frozen, maxLen, maxPiece)
    val greedy = greedyPieceCounts(types, frozen, maxLen, maxPiece)
    val census = lw
      .join(greedy, Seq("w"), "left")
      .join(vit.select(col("w"), col("n_pieces"), col("dp")),
        Seq("w"), "left")
      .groupBy(col("lang"))
      .agg(sum(col("occ")).as("total_words"),
        sum(when(col("np").isNotNull, col("occ")).otherwise(0L))
          .as("covered_words"),
        sum(coalesce(col("occ") * col("np"), lit(0L)))
          .as("greedy_pieces"),
        sum(coalesce(col("occ") * col("n_pieces"), lit(0L)))
          .as("viterbi_pieces"),
        sum(when(col("np").isNotNull && col("cost") > col("dp"),
          col("occ")).otherwise(0L)).as("suboptimal_words"),
        sum(when(col("np").isNotNull,
          ((col("cost") - col("dp")) * col("occ"))
            .cast("decimal(38,12)"))).as("excess_sum"))
    census.select(col("lang"), col("total_words"), col("covered_words"),
      col("greedy_pieces"), col("viterbi_pieces"),
      col("suboptimal_words"),
      when(col("covered_words") > 0,
        round(col("greedy_pieces").cast("double") /
          col("covered_words").cast("double"), 6)).as("greedy_ppw"),
      when(col("covered_words") > 0,
        round(col("viterbi_pieces").cast("double") /
          col("covered_words").cast("double"), 6)).as("viterbi_ppw"),
      when(col("covered_words") > 0,
        round(col("excess_sum").cast("double") /
          col("covered_words").cast("double"), 6)).as("excess_nll_pw"),
      when(col("covered_words") > 0,
        round(col("suboptimal_words").cast("double") /
          col("covered_words").cast("double"), 6))
        .as("suboptimal_share"))
      .orderBy(col("lang"))
  }

  /** TOKENIZER-EVAL fertility matrix — the readout a tokenizer team
    * actually ranks candidates by (Rust et al. 2021): the SAME
    * occurrence-weighted eval vocabulary (lowercase alphabetic corpus
    * words, length ≤ `maxLen`) encoded under BOTH trained tokenizers —
    * the 6-round BPE merge table ([[bpeMergeLearn]], corpus-trained)
    * and the frozen unigram-LM vocabulary ([[unigramFrozenCosts]],
    * even-half-trained) — with per-(arm, lang) fertility
    * (pieces per covered word) and compression (chars per piece).
    * Coverage is part of the readout: a unigram type containing a
    * train-unseen character has no Viterbi path and counts OOV, while
    * corpus-trained BPE covers every eval word by construction — the
    * asymmetry a real multi-corpus eval must surface, not hide. The
    * BPE piece counts include the end-of-word marker symbol and the
    * unigram counts do not (each arm is scored under its own native
    * segmentation convention; chars count the raw word on both arms).
    *
    * Scale shape: one corpus token pass to (lang, word, occ) grain —
    * the posting shuffle every text row here pays; both encoders then
    * run at word-TYPE grain (trainer artifacts are vocabulary-sized
    * broadcasts; the Viterbi DP is the trainer's bounded `maxLen`-level
    * unroll over distinct eval types); the census is |arms|·|langs|
    * rows. Documents never meet a per-position symbol relation. */
  /** The shared (lang, word, occ) tokenizer-eval grain: lowercase
    * alphabetic corpus words, length-capped to the unigram trainer's
    * DP bound — one home so every tokenizer-eval row scores the SAME
    * occurrence-weighted vocabulary. */
  private def evalLangWords(spark: SparkSession, dir: String,
      maxLen: Int): DataFrame = Tables(spark, dir, "documents")
    .select(col("lang"), explode(tokens(col("text"))).as("t"))
    .select(col("lang"), lower(col("t")).as("w"))
    .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxLen)
    .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("occ"))
    .localCheckpoint(false) // eval grain: reused by arms + types

  def tokenizerFertility(spark: SparkSession, dir: String,
      rounds: Int = 6, maxLen: Int = 10, maxPiece: Int = 4): DataFrame = {
    val lw = evalLangWords(spark, dir, maxLen)
    def armCensus(arm: String, counts: DataFrame): DataFrame =
      lw.join(counts, Seq("w"), "left")
        .groupBy(col("lang"))
        .agg(sum(col("occ")).as("total_words"),
          sum(when(col("n_pieces").isNotNull, col("occ"))
            .otherwise(0L)).as("covered_words"),
          sum(coalesce(col("occ") * col("n_pieces"), lit(0L)))
            .as("total_pieces"),
          sum(when(col("n_pieces").isNotNull,
            col("occ") * length(col("w"))).otherwise(0L))
            .as("total_chars"))
        .select(lit(arm).as("arm"), col("lang"), col("total_words"),
          col("covered_words"), col("total_pieces"), col("total_chars"))
    val bpeCounts = bpeTrain(spark, dir, rounds)._2
      .select(col("w"), size(col("syms")).cast("long").as("n_pieces"))
    val types = lw.select(col("w")).distinct()
      .withColumn("len", length(col("w"))).localCheckpoint(false)
    val frozen = unigramFrozenCosts(spark, dir).localCheckpoint(false)
    val uniCounts = viterbiPieceCounts(types, frozen, maxLen, maxPiece)
      .select(col("w"), col("n_pieces"))
    armCensus("bpe", bpeCounts)
      .unionByName(armCensus("unigram", uniCounts))
      .select(col("arm"), col("lang"), col("total_words"),
        col("covered_words"), col("total_pieces"),
        when(col("covered_words") > 0,
          round(col("total_pieces").cast("double") /
            col("covered_words").cast("double"), 6))
          .as("pieces_per_word"),
        when(col("total_pieces") > 0,
          round(col("total_chars").cast("double") /
            col("total_pieces").cast("double"), 6))
          .as("chars_per_piece"))
      .orderBy(col("arm"), col("lang"))
  }
}
