package graft

/** Partitioning-independence: every number this library emits is
  * supposed to be a pure function of the DATA, never of the partition
  * count (decimal-summed accumulations, struct-min ties, sorted
  * collect_lists — the conventions each operator's scaladoc claims).
  * The whole battery normally runs at shuffle.partitions=32, so those
  * claims are never actually exercised against a different layout;
  * this spec re-runs the riskiest order-sensitive queries on a sibling
  * session pinned to 7 partitions (odd, small — maximally different
  * shuffle assignment) and requires BIT-IDENTICAL rows. On a 1000-
  * executor cluster the partition count is whatever AQE decides, so
  * this is precisely the invariance production would rely on. */
class DeterminismSpec extends SparkSpec {

  private val risky = Seq(
    "text_bigram_logprob",   // double->decimal cast then decimal sums
    "dedup_minhash_lsh",     // signature build + bucket-group expansion
    "sim_pq_adc",            // Lloyd means + argmin ties + window top-k
    "sim_kmeans_lloyd2",     // re-derived centroids, f32 lanes
    "dedup_clusters_star",   // checkpointed fixpoint, convergence checksum
    "agg_stats",             // variance/stddev accumulation
    "sketch_hll",            // HLL merge order
    "mix_apply",             // deterministic integer resampling
    "sketch_freq_topk",      // Misra-Gries eviction depends on merge order;
                             //   the within-bound booleans must not
    "graph_label_prop",      // decimal label mass + smallest-label argmax
    "dedup_incremental_minhash", // bucket grouping + best-match argmax
    "dedup_bloom_prefilter", // bloom partial merge order; exact verify
    "docs_quota_sample",     // WindowGroupLimit partial pruning per layout
    "feature_robust_outliers") // interpolated percentile + MAD threshold

  test("risky queries are bit-identical at shuffle.partitions=7 vs 32, " +
    "and with AQE disabled") {
    val alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    risky.foreach { name =>
      val base = SparkEntry.queries(name)(spark, sf0001).collect()
        .map(_.toString).toSeq
      val other = SparkEntry.queries(name)(alt, sf0001).collect()
        .map(_.toString).toSeq
      assert(base == other,
        s"$name changes with the partition count — an accumulation or " +
          "tie-break depends on shuffle order")
      val fixed = SparkEntry.queries(name)(noAqe, sf0001).collect()
        .map(_.toString).toSeq
      assert(base == fixed,
        s"$name changes when AQE re-plans — a result depends on the " +
          "physical layout AQE happens to pick")
    }
  }
}
