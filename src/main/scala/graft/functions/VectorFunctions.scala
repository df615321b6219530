package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr
import graft.expressions.{BigramHashPairs, ChunkWords, CosineSimilarityF32, HashedTf64, HyperplaneLshBuckets, MinHashBandBuckets, MinHashValues, NormalizeText, ParseAfTimestamp, PqAssign, SimHash64, SimHash64Long, WordGramHashes, WordShingles}

/** Registration + Column accessors for graft's custom Catalyst
  * expressions. Spark 4 made Column a backend-agnostic wrapper, so the
  * supported route from a catalyst Expression to a Column is the session
  * FunctionRegistry (same mechanism `spark.udf` uses, but resolving to a
  * native Expression — no UDF serialization, full Catalyst visibility). */
object ExprColumns {

  /** Name -> Expression builder for every graft SQL function — the single
    * source both registration paths consume ([[register]] for ad-hoc
    * sessions, [[graft.GraftExtensions]] for `spark.sql.extensions`
    * deployments). */
  val builders: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
    "graft_simhash64_long" -> (exprs => SimHash64Long(exprs.head)),
    "graft_cosine_f32" -> (exprs => CosineSimilarityF32(exprs(0), exprs(1))),
    "graft_hyperplane_lsh" -> (exprs => HyperplaneLshBuckets(exprs.head, 32, 8)),
    "graft_parse_af_ts" -> (exprs => ParseAfTimestamp(exprs.head)),
    "graft_minhash_buckets" -> (exprs => MinHashBandBuckets(exprs.head, 9, 3)),
    "graft_minhash_values" -> (exprs => MinHashValues(exprs.head, 9)),
    "graft_minhash_values18" -> (exprs => MinHashValues(exprs.head, 18)),
    "graft_hashed_tf64" -> (exprs => HashedTf64(exprs.head)),
    "graft_pq_assign" -> (exprs => PqAssign(exprs(0), exprs(1))),
    "graft_shingles" -> (exprs => {
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_shingles k must be an int literal, got $other")
      }
      WordShingles(exprs(0), k)
    }),
    "graft_gram_hashes" -> (exprs => {
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_gram_hashes k must be an int literal, got $other")
      }
      WordGramHashes(exprs(0), k)
    }),
    "graft_bigram_pairs" -> (exprs => BigramHashPairs(exprs.head)),
    "graft_normalize_text" -> (exprs => {
      val mode = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
          v.toString
        case other => throw new IllegalArgumentException(
          s"graft_normalize_text mode must be a string literal, got $other")
      }
      NormalizeText(exprs(0), mode)
    }),
    "graft_chunk_words" -> (exprs => {
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
        e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_chunk_words size/stride must be int literals, got $other")
        }
      ChunkWords(exprs(0), intLit(exprs(1)), intLit(exprs(2)))
    }),
    // Spark ships a distributed Bloom filter as internal Catalyst
    // expressions (they power AQE's runtime row-level filtering) but does
    // NOT register them in the public FunctionRegistry — these two names
    // expose them for explicit prefilter plans like
    // [[graft.operators.DedupOps.bloomPrefilterDedup]].
    // graft_bloom_agg(xxhash64_key, est_items, num_bits): TypedImperative
    // aggregate producing the filter's BINARY serialized form, partial-
    // combinable map-side like any aggregate (per-partition filters OR
    // together). graft_bloom_might(bf, xxhash64_key): membership probe;
    // the bf argument must be a constant or scalar subquery, which is
    // what makes the built filter BROADCAST to the probe side.
    "graft_bloom_agg" -> (exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2))),
    "graft_bloom_might" -> (exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1))),
    // heavy-hitters sketch aggregate (DataSketches Misra-Gries) — map of
    // frequent item -> (est, lb, ub); maxMapSize must be an int literal
    // power of 2
    "graft_freq_agg" -> (exprs => {
      val m = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_freq_agg maxMapSize must be an int literal, got $other")
      }
      graft.expressions.FreqSketchAgg(exprs(0), m)
    }))

  /** Idempotently register graft's expressions on this session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Distinct k-word shingles (fast one-pass form of
    * [[TextFunctions.shingles]]). */
  def shingles(spark: SparkSession, textExpr: String, k: Int): Column = {
    register(spark)
    expr(s"graft_shingles($textExpr, $k)")
  }

  /** Positional k-gram fingerprints as array<bigint>
    * ([[graft.expressions.WordGramHashes]]). */
  def gramHashes(spark: SparkSession, textExpr: String, k: Int): Column = {
    register(spark)
    expr(s"graft_gram_hashes($textExpr, $k)")
  }

  /** Positional bigram (fingerprint, leading-word-hash) struct array
    * ([[graft.expressions.BigramHashPairs]]). */
  def bigramPairs(spark: SparkSession, textExpr: String): Column = {
    register(spark)
    expr(s"graft_bigram_pairs($textExpr)")
  }

  /** 3 banded MinHash LSH bucket strings for an array<string> of shingles
    * (NULL for an empty set). */
  def minhashBuckets(spark: SparkSession, shinglesExpr: String): Column = {
    register(spark)
    expr(s"graft_minhash_buckets($shinglesExpr)")
  }

  /** 4 banded 8-bit hyperplane-LSH bucket strings for an array<float>. */
  def hyperplaneLsh(spark: SparkSession, embExpr: String): Column = {
    register(spark)
    expr(s"graft_hyperplane_lsh($embExpr)")
  }

  /** Per-subspace PQ code positions (array<int>) of an embedding
    * against a nested codebook column — see
    * [[graft.expressions.PqAssign]]. */
  def pqAssign(spark: SparkSession, embExpr: String, cbExpr: String): Column = {
    register(spark)
    expr(s"graft_pq_assign($embExpr, $cbExpr)")
  }

  def cosineF32(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"graft_cosine_f32($a, $b)")
  }

  def simhash64(spark: SparkSession, tokensExpr: String): Column = {
    register(spark)
    expr(s"graft_simhash64($tokensExpr)")
  }

  /** Unicode normalization ([[graft.expressions.NormalizeText]]):
    * mode in nfc | nfkc | strip_accents | casefold. Validated here, before
    * the mode is spliced into a SQL literal — a bad mode (or one carrying
    * a quote) must fail with the mode-list message, not a parse error. */
  def normalizeText(spark: SparkSession, textExpr: String, mode: String): Column = {
    require(NormalizeText.modes.contains(mode),
      s"normalize_text mode must be one of ${NormalizeText.modes.mkString(", ")}, got $mode")
    register(spark)
    expr(s"graft_normalize_text($textExpr, '$mode')")
  }

  /** Overlapping word-window chunks (a generator — produces rows
    * `(chunk_idx, chunk_text, n_words)` per input row). */
  def chunkWords(spark: SparkSession, textExpr: String,
                 size: Int, stride: Int): Column = {
    register(spark)
    expr(s"graft_chunk_words($textExpr, $size, $stride)")
  }
}
