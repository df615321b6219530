package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Curation, DedupOps, EventAnalytics, Graph, Multimodal, Quality, Relational, Similarity, StreamingAnalytics, Subqueries, Temporal, TextAnalysis, TpchReports}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 (or a §7.5
  * north-star extension); [[oracleSql]] carries the equivalent DuckDB SQL
  * over the same parquet tables. Column names and types are aligned pair by
  * pair (the driver's compare sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's whole main() shape: window filter -> key dedup
    * anti-join -> projection/rename (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    EventAnalytics.refPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference surface (SURVEY.md §2, over events per FIXTURES.md §B)
    "ref_pipeline" -> ((s, d) => EventAnalytics.refPipeline(s, d)),
    "ref_parse_datetime" -> ((s, d) => EventAnalytics.parseDatetime(s, d)),
    "ref_sentinel_null" -> ((s, d) => EventAnalytics.sentinelNulls(s, d)),
    "ref_window_filter" -> ((s, d) => EventAnalytics.windowFilter(s, d)),
    "ref_key_filter" -> ((s, d) => EventAnalytics.keyFilter(s, d)),
    "ref_window_count" -> ((s, d) => EventAnalytics.windowCount(s, d)),
    "ref_anti_join" -> ((s, d) => Relational.antiJoinCustomers(s, d)),
    // ---- relational gap coverage (§2 "not present" categories)
    "q1_pricing_summary" -> ((s, d) => Relational.q1PricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.q3ShippingPriority(s, d)),
    "q5_local_supplier" -> ((s, d) => Relational.q5LocalSupplier(s, d)),
    "q6_sql_revenue" -> ((s, d) => Relational.sqlRevenueQ6(s, d)),
    "join_outer_customer" -> ((s, d) => Relational.customerOrderStats(s, d)),
    "join_semi_customer" -> ((s, d) => Relational.semiJoinCustomers(s, d)),
    "topk_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "window_rank" -> ((s, d) => Relational.topOrdersPerCustomer(s, d)),
    "window_running" -> ((s, d) => Relational.runningQuantity(s, d)),
    "window_navigation" -> ((s, d) => Relational.windowNavigation(s, d)),
    "window_distribution" -> ((s, d) => Relational.priceDistribution(s, d)),
    "rollup_revenue" -> ((s, d) => Relational.revenueRollup(s, d)),
    "distinct_segments" -> ((s, d) => Relational.distinctSegments(s, d)),
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "agg_stats" -> ((s, d) => Relational.aggStats(s, d)),
    "math_funcs" -> ((s, d) => Relational.mathFuncs(s, d)),
    "date_funcs" -> ((s, d) => Relational.dateFuncs(s, d)),
    "string_funcs" -> ((s, d) => Relational.stringFuncs(s, d)),
    "price_buckets" -> ((s, d) => Relational.priceBuckets(s, d)),
    "pivot_status" -> ((s, d) => Relational.pivotStatusCounts(s, d)),
    "cube_revenue" -> ((s, d) => Relational.cubeRevenue(s, d)),
    "percentile_qty" -> ((s, d) => Relational.percentileQty(s, d)),
    "corr_price_qty" -> ((s, d) => Relational.corrPriceQty(s, d)),
    "segment_nations" -> ((s, d) => Relational.segmentNations(s, d)),
    // hash-gated via within-bound booleans vs exact values (see scaladoc)
    "approx_stats" -> ((s, d) => Relational.approxStats(s, d)),
    // ---- event analytics (§7.5)
    "tumbling_hourly" -> ((s, d) => EventAnalytics.tumblingHourly(s, d)),
    "sliding_two_hour" -> ((s, d) => EventAnalytics.slidingTwoHour(s, d)),
    "sessionize" -> ((s, d) => EventAnalytics.sessionize(s, d)),
    "session_windows" -> ((s, d) => EventAnalytics.sessionWindows(s, d)),
    "json_extract" -> ((s, d) => EventAnalytics.jsonExtract(s, d)),
    "map_funcs" -> ((s, d) => EventAnalytics.mapFuncs(s, d)),
    "null_funcs" -> ((s, d) => EventAnalytics.nullFuncs(s, d)),
    "join_asof_attribution" -> ((s, d) => EventAnalytics.asofAttribution(s, d)),
    "join_range_bands" -> ((s, d) => EventAnalytics.rangeJoinBands(s, d)),
    "skew_salted_agg" -> ((s, d) => EventAnalytics.saltedTypeStats(s, d)),
    "skew_salted_join" -> ((s, d) => EventAnalytics.saltedDimJoin(s, d)),
    "events_funnel" -> ((s, d) => EventAnalytics.funnelSteps(s, d)),
    "events_retention" -> ((s, d) => EventAnalytics.cohortRetention(s, d)),
    // ---- structured streaming (real streaming plans, AvailableNow)
    "stream_tumbling_hourly" -> ((s, d) => StreamingAnalytics.streamTumblingHourly(s, d)),
    "stream_distinct_pairs" -> ((s, d) => StreamingAnalytics.streamDistinctPairs(s, d)),
    "stream_sliding_two_hour" -> ((s, d) => StreamingAnalytics.streamSlidingTwoHour(s, d)),
    // ---- text analysis (north-star §7.5)
    "text_token_stats" -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "array_funcs" -> ((s, d) => TextAnalysis.arrayFuncs(s, d)),
    "explode_outer_stats" -> ((s, d) => TextAnalysis.explodeOuterStats(s, d)),
    "text_quality" -> ((s, d) => TextAnalysis.qualityScore(s, d)),
    "text_langid" -> ((s, d) => TextAnalysis.langIdConfusion(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalysis.fingerprintClusters(s, d)),
    // ---- dedup ladder (north-star §7.5)
    "dedup_exact" -> ((s, d) => DedupOps.dedupExact(s, d)),
    "dedup_cascade" -> ((s, d) => DedupOps.dedupCascade(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccardPairs(s, d)),
    "dedup_containment" -> ((s, d) => DedupOps.containmentPairs(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => DedupOps.minhashLshPairs(s, d)),
    "dedup_simhash" -> ((s, d) => DedupOps.simhashDocs(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => DedupOps.embeddingCosinePairs(s, d)),
    "docs_prep_pipeline" -> ((s, d) => DedupOps.prepPipeline(s, d)),
    "text_token_bpe" -> ((s, d) => TextAnalysis.bpeTokenStats(s, d)),
    // ---- multimodal binary columns (north-star §7.5)
    "mm_payload_stats" -> ((s, d) => Multimodal.payloadStats(s, d)),
    "mm_feature_extract" -> ((s, d) => Multimodal.featureExtract(s, d)),
    "mm_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)),
    // ---- similarity search (north-star §7.5)
    "sim_brute_topk" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "sim_label_pairs" -> ((s, d) => Similarity.labelBlockedPairs(s, d)),
    "sim_ann_lsh" -> ((s, d) => Similarity.annLshTopPairs(s, d)),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "sim_pq_adc" -> ((s, d) => Similarity.pqAdcRecall(s, d)),
    "sim_ivf_pq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "sim_label_centroids" -> ((s, d) => Similarity.labelCentroids(s, d)),
    "sim_batch_topk" -> ((s, d) => Similarity.batchLabelTopK(s, d)),
    // ---- subquery battery (SQL surface; Catalyst decorrelation)
    "subq_scalar_corr" -> ((s, d) => Subqueries.scalarCorrelated(s, d)),
    "subq_exists" -> ((s, d) => Subqueries.existsLateShip(s, d)),
    "subq_in_notin" -> ((s, d) => Subqueries.inNotIn(s, d)),
    "subq_having" -> ((s, d) => Subqueries.havingBigSpenders(s, d)),
    "grouping_sets_mix" -> ((s, d) => Subqueries.groupingSetsMix(s, d)),
    // ---- window range frames + reshape + typed aggregator
    "topk_aggregator" -> ((s, d) => Relational.topkAggregated(s, d)),
    "window_range_frame" -> ((s, d) => Relational.windowRangeFrame(s, d)),
    "unpivot_metrics" -> ((s, d) => Relational.unpivotMetrics(s, d)),
    // ---- training-pipeline ops (north-star §7.5)
    "split_assign" -> ((s, d) => TextAnalysis.splitAssign(s, d)),
    "text_levenshtein" -> ((s, d) => DedupOps.levenshteinPairs(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "dedup_clusters" -> ((s, d) => DedupOps.dedupClusters(s, d)),
    // ---- streaming breadth (stream-stream join, stateful sessions)
    "stream_join_attribution" -> ((s, d) => StreamingAnalytics.streamJoinAttribution(s, d)),
    "stream_session_windows" -> ((s, d) => StreamingAnalytics.streamSessionWindows(s, d)),
    // ---- temporal state maintenance (merge/SCD2/gap-fill)
    "merge_upsert" -> ((s, d) => Temporal.mergeUpsert(s, d)),
    "scd2_history" -> ((s, d) => Temporal.scd2History(s, d)),
    "gap_fill_hourly" -> ((s, d) => Temporal.gapFill(s, d)),
    // ---- collection/argmax aggregates, lateral SQL, chunking, sampling
    "agg_collect" -> ((s, d) => Relational.aggCollect(s, d)),
    "lateral_topn" -> ((s, d) => Subqueries.lateralTopn(s, d)),
    "text_chunks" -> ((s, d) => TextAnalysis.textChunks(s, d)),
    "sample_stratified" -> ((s, d) => TextAnalysis.stratifiedSample(s, d)),
    "feature_zscore" -> ((s, d) => EventAnalytics.featureZscore(s, d)),
    "dq_profile" -> ((s, d) => Quality.dqProfile(s, d)),
    "mm_resize" -> ((s, d) => Multimodal.resizePayloads(s, d)),
    "window_firstlast" -> ((s, d) => Relational.windowFirstLast(s, d)),
    "dedup_keep_best" -> ((s, d) => DedupOps.dedupKeepBest(s, d)),
    "set_ops_all" -> ((s, d) => Relational.setOpsAll(s, d)),
    "page_orders" -> ((s, d) => Relational.pageOrders(s, d)),
    "regr_price_qty" -> ((s, d) => Relational.regrPriceQty(s, d)),
    "stream_static_join" -> ((s, d) => StreamingAnalytics.streamStaticJoin(s, d)),
    "user_journey" -> ((s, d) => EventAnalytics.userJourney(s, d)),
    "agg_bool_listagg" -> ((s, d) => Subqueries.aggBoolListagg(s, d)),
    "array_hof" -> ((s, d) => TextAnalysis.arrayHof(s, d)),
    "join_nullsafe" -> ((s, d) => Relational.nullSafeJoin(s, d)),
    "sketch_hll" -> ((s, d) => Quality.sketchHll(s, d)),
    // ---- round 4: classic big-join reports, robust aggregates, DQ gates
    "q10_returned_items" -> ((s, d) => Relational.q10ReturnedItems(s, d)),
    "q18_large_orders" -> ((s, d) => Relational.q18LargeOrders(s, d)),
    "agg_mode_median" -> ((s, d) => Relational.aggModeMedian(s, d)),
    "dq_checks" -> ((s, d) => Quality.dqChecks(s, d)),
    "graph_pagerank" -> ((s, d) => Graph.pagerankNations(s, d)),
    "sim_kmeans_iter" -> ((s, d) => Similarity.kmeansAssignIter(s, d)),
    "text_pmi" -> ((s, d) => TextAnalysis.bigramPmi(s, d)),
    "text_normalize" -> ((s, d) => TextAnalysis.unicodeNormalize(s, d)),
    "mm_phash_hamming" -> ((s, d) => Multimodal.phashHamming(s, d)),
    "q14_promo_revenue" -> ((s, d) => Relational.q14PromoRevenue(s, d)),
    "window_mom_change" -> ((s, d) => Relational.monthOverMonth(s, d)),
    "events_transitions" -> ((s, d) => EventAnalytics.eventTransitions(s, d)),
    "sim_quantize_int8" -> ((s, d) => Similarity.quantizeInt8(s, d)),
    "dedup_clusters_star" -> ((s, d) => DedupOps.dedupClustersStar(s, d)),
    // ---- round 5: remaining TPC-H report shapes (adapted; TpchReports)
    "q2_min_acctbal_supplier" -> ((s, d) => TpchReports.q2MinAcctbalSupplier(s, d)),
    "q7_volume_shipping" -> ((s, d) => TpchReports.q7VolumeShipping(s, d)),
    "q8_market_share" -> ((s, d) => TpchReports.q8MarketShare(s, d)),
    "q9_product_profit" -> ((s, d) => TpchReports.q9ProductProfit(s, d)),
    "q13_order_distribution" -> ((s, d) => TpchReports.q13OrderDistribution(s, d)),
    "q15_top_supplier" -> ((s, d) => TpchReports.q15TopSupplier(s, d)),
    "q17_small_qty_revenue" -> ((s, d) => TpchReports.q17SmallQtyRevenue(s, d)),
    "q19_disjunctive_revenue" -> ((s, d) => TpchReports.q19DisjunctiveRevenue(s, d)),
    "q21_waiting_supplier" -> ((s, d) => TpchReports.q21WaitingSupplier(s, d)),
    "q22_idle_balances" -> ((s, d) => TpchReports.q22IdleBalances(s, d)),
    // ---- round 7: the last classic shapes (EXISTS, HAVING-fraction,
    // conditional agg, distinct-count with NOT-IN, nested-IN dominance)
    "q4_order_priority" -> ((s, d) => TpchReports.q4OrderPriority(s, d)),
    "q11_important_parts" -> ((s, d) => TpchReports.q11ImportantParts(s, d)),
    "q12_priority_lateness" -> ((s, d) => TpchReports.q12PriorityLateness(s, d)),
    "q16_supplier_count" -> ((s, d) => TpchReports.q16SupplierCount(s, d)),
    "q20_dominant_supplier" -> ((s, d) => TpchReports.q20DominantSupplier(s, d)),
    // ---- round 5: pipeline-evaluation ops
    "sim_recall_eval" -> ((s, d) => Similarity.recallAt10(s, d)),
    "split_contamination" -> ((s, d) => TextAnalysis.splitContamination(s, d)),
    "text_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(s, d)),
    "events_anomaly" -> ((s, d) => EventAnalytics.dailyAnomaly(s, d)),
    // ---- round 6: the full Lloyd loop + the streaming prep pipeline
    "sim_kmeans_lloyd2" -> ((s, d) => Similarity.kmeansLloydTwo(s, d)),
    "stream_docs_prep" -> ((s, d) => StreamingAnalytics.streamDocsPrep(s, d)),
    "stream_sig_index" -> ((s, d) => StreamingAnalytics.streamSignatureIndex(s, d)),
    "stream_ivf_append" -> ((s, d) => StreamingAnalytics.streamIvfAppend(s, d)),
    "mix_weights" -> ((s, d) => TextAnalysis.mixtureWeights(s, d)),
    "text_unigram_logprob" -> ((s, d) => TextAnalysis.unigramLogprob(s, d)),
    "skew_profile" -> ((s, d) => Quality.skewProfile(s, d)),
    // ---- round 6 wave 2: repetition filter, sequence packing, overlap
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionFilter(s, d)),
    "pack_sequences" -> ((s, d) => TextAnalysis.packSequences(s, d)),
    "text_source_overlap" -> ((s, d) => TextAnalysis.sourceOverlap(s, d)),
    "text_decontaminate" -> ((s, d) => TextAnalysis.decontaminate(s, d)),
    "docs_curation_pipeline" -> ((s, d) => TextAnalysis.curationPipeline(s, d)),
    "mix_apply" -> ((s, d) => TextAnalysis.mixtureApply(s, d)),
    "dedup_semantic_clusters" -> ((s, d) => DedupOps.semanticClusters(s, d)),
    "text_substring_dup" -> ((s, d) => TextAnalysis.substringDupCensus(s, d)),
    "text_bigram_logprob" -> ((s, d) => TextAnalysis.bigramLogprob(s, d)),
    // ---- round 7 wave 2: curation selection/profiling passes
    "docs_dsir_weights" -> ((s, d) => Curation.dsirWeights(s, d)),
    "dedup_prefix" -> ((s, d) => Curation.dedupPrefix(s, d)),
    "docs_length_histogram" -> ((s, d) => Curation.lengthHistogram(s, d)),
    "text_zipf" -> ((s, d) => Curation.zipfFit(s, d)),
    "docs_quality_quantile" -> ((s, d) => Curation.qualityQuantile(s, d)),
    // ---- round 7 wave 3: bloom-prefiltered incremental dedup + quota sample
    "dedup_bloom_prefilter" -> ((s, d) => DedupOps.bloomPrefilterDedup(s, d)),
    "docs_quota_sample" -> ((s, d) => Curation.quotaSample(s, d)),
    // ---- round 7 wave 4: LPA communities, blocking-recall eval, robust stats
    "graph_label_prop" -> ((s, d) => Graph.labelPropNations(s, d)),
    "dedup_recall_eval" -> ((s, d) => DedupOps.dedupRecallEval(s, d)),
    "feature_robust_outliers" -> ((s, d) => EventAnalytics.robustOutliers(s, d)),
    "dedup_incremental_minhash" -> ((s, d) => DedupOps.minhashIncrementalDedup(s, d)),
    "sketch_freq_topk" -> ((s, d) => Quality.sketchFreqTopk(s, d)),
    "docs_semantic_quality" -> ((s, d) => Similarity.semanticQuality(s, d)),
    "text_substring_removal" -> ((s, d) => TextAnalysis.substringRemoval(s, d)),
    "text_paragraph_dedup" -> ((s, d) => TextAnalysis.paragraphDedup(s, d)),
    "text_boilerplate_lines" ->
      ((s, d) => TextAnalysis.boilerplateLines(s, d)),
    // ---- round 9: BPE merge learning (the trainer loop) + the trained
    // quality probe (one exact logistic gradient step)
    "text_bpe_merges" -> ((s, d) => TextAnalysis.bpeMergeLearn(s, d)),
    "text_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "text_bpe_pack" -> ((s, d) => TextAnalysis.bpePackSequences(s, d)),
    "docs_quality_probe" -> ((s, d) => Curation.qualityProbe(s, d)),
    "docs_quality_probe2" -> ((s, d) => Curation.qualityProbe2(s, d)),
    "docs_probe_auc" -> ((s, d) => Curation.probeAuc(s, d)),
    "docs_budget_select" -> ((s, d) => Curation.budgetSelect(s, d)),
    "stream_late_data" -> ((s, d) => StreamingAnalytics.streamLateData(s, d)),
    "stream_sig_index_multi" ->
      ((s, d) => StreamingAnalytics.streamSignatureIndexMulti(s, d)),
    "stream_update_counts" ->
      ((s, d) => StreamingAnalytics.streamUpdateCounts(s, d)),
    // ---- round 10: probe evaluation + stateful outer join + drift
    "stream_join_outer" ->
      ((s, d) => StreamingAnalytics.streamJoinOuter(s, d)),
    "docs_probe_calibration" -> ((s, d) => Curation.probeCalibration(s, d)),
    "events_drift" -> ((s, d) => EventAnalytics.eventsDrift(s, d)),
    "sim_nprobe_sweep" -> ((s, d) => Similarity.nprobeSweep(s, d)),
    "docs_curriculum" -> ((s, d) => Curation.curriculum(s, d)),
    "stream_join_full_outer" ->
      ((s, d) => StreamingAnalytics.streamJoinFullOuter(s, d)),
    "dedup_lsh_tune" -> ((s, d) => DedupOps.lshBandingSweep(s, d)),
    "docs_probe_threshold" -> ((s, d) => Curation.probeThreshold(s, d)),
    "dedup_cluster_census" -> ((s, d) => DedupOps.clusterCensus(s, d)),
    "graph_triangles" -> ((s, d) => Graph.triangleCount(s, d)),
    "text_ngram_novelty" -> ((s, d) => TextAnalysis.ngramNovelty(s, d)),
    "text_token_entropy" -> ((s, d) => TextAnalysis.tokenEntropy(s, d)),
    "join_asof_nearest" -> ((s, d) => EventAnalytics.asofNearest(s, d)),
    "stream_cdc_upsert" ->
      ((s, d) => StreamingAnalytics.streamCdcUpsert(s, d)),
    "basket_pairs" -> ((s, d) => Relational.basketPairs(s, d)),
    "window_ewma" -> ((s, d) => Relational.ewmaDaily(s, d)),
    "stream_dedup_watermark" ->
      ((s, d) => StreamingAnalytics.streamDedupWatermark(s, d)),
    "ts_decompose" -> ((s, d) => EventAnalytics.tsDecompose(s, d)),
    "sim_pca_power" -> ((s, d) => Similarity.pcaPowerIteration(s, d)),
    "docs_pii_scrub" -> ((s, d) => Curation.piiScrub(s, d)),
    "events_anomaly_stl" -> ((s, d) => EventAnalytics.anomalyStl(s, d)),
    "sim_pca_project" -> ((s, d) => Similarity.pcaProject(s, d)),
    "dedup_minhash_calibration" ->
      ((s, d) => DedupOps.minhashCalibration(s, d)),
    "text_cdc_chunks" -> ((s, d) => TextAnalysis.cdcChunks(s, d)),
    "text_js_divergence" -> ((s, d) => TextAnalysis.jsDivergence(s, d)),
    "events_ab_test" -> ((s, d) => EventAnalytics.abTest(s, d)),
    "events_concurrency" -> ((s, d) => EventAnalytics.concurrency(s, d)),
    "mm_audio_energy" -> ((s, d) => Multimodal.audioEnergy(s, d)),
    "events_forecast_naive" ->
      ((s, d) => EventAnalytics.forecastNaive(s, d)),
    "window_rolling_median" ->
      ((s, d) => Relational.rollingMedianDaily(s, d)),
    "dedup_cosine_sweep" ->
      ((s, d) => DedupOps.cosineThresholdSweep(s, d)),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraph(s, d)),
    "orders_cohort_revenue" ->
      ((s, d) => Relational.cohortRevenue(s, d)),
    "orders_rfm" -> ((s, d) => Relational.ordersRfm(s, d)),
    "agg_weighted_median" ->
      ((s, d) => Relational.weightedMedianPrice(s, d)),
    "text_hapax" -> ((s, d) => TextAnalysis.hapaxStats(s, d)),
    "graph_link_predict" -> ((s, d) => Graph.linkPredict(s, d)),
    "events_cusum" -> ((s, d) => EventAnalytics.cusumChangepoint(s, d)),
    "events_paths" -> ((s, d) => EventAnalytics.topPaths(s, d)),
    "events_power_pareto" -> ((s, d) => EventAnalytics.powerPareto(s, d)),
    "dedup_source_matrix" -> ((s, d) => DedupOps.sourceDupMatrix(s, d)),
    "dedup_bitext_mine" -> ((s, d) => DedupOps.bitextMine(s, d)),
    "text_coverage_curve" -> ((s, d) => TextAnalysis.coverageCurve(s, d)),
    "events_streaks" -> ((s, d) => EventAnalytics.activityStreaks(s, d)),
    "dedup_dup_quality" -> ((s, d) => DedupOps.dupQualityCensus(s, d)),
    "sim_kmeans_inertia" -> ((s, d) => Similarity.kmeansInertia(s, d)),
    "events_interarrival" -> ((s, d) => EventAnalytics.interarrival(s, d)),
    "text_lm_heldout" -> ((s, d) => TextAnalysis.lmHeldout(s, d)),
    "orders_pareto_abc" -> ((s, d) => Relational.paretoAbc(s, d)),
    "graph_kcore" -> ((s, d) => Graph.kcoreTrace(s, d)),
    "events_forecast_compare" ->
      ((s, d) => EventAnalytics.forecastCompare(s, d)),
    "text_burstiness" -> ((s, d) => TextAnalysis.burstiness(s, d)),
    "events_uplift_did" -> ((s, d) => EventAnalytics.upliftDid(s, d)),
    "events_transition_entropy" ->
      ((s, d) => EventAnalytics.transitionEntropy(s, d)),
    "text_langid_trigram" ->
      ((s, d) => TextAnalysis.langidTrigram(s, d)),
    "events_funnel_latency" ->
      ((s, d) => EventAnalytics.funnelLatency(s, d)),
    "events_gini" -> ((s, d) => EventAnalytics.activityGini(s, d)),
    "docs_spearman" -> ((s, d) => Curation.spearmanLengthQuality(s, d)),
    "events_bot_detection" ->
      ((s, d) => EventAnalytics.botDetection(s, d)),
    "text_dedup_lm_effect" -> ((s, d) => TextAnalysis.dedupLmEffect(s, d)),
    "orders_shipping_aging" -> ((s, d) => Relational.shippingAging(s, d)),
    "text_bigram_llr" -> ((s, d) => TextAnalysis.bigramLlr(s, d)),
    "dedup_asymmetry" -> ((s, d) => DedupOps.asymmetryCensus(s, d)),
    "events_stickiness" -> ((s, d) => EventAnalytics.stickiness(s, d)),
    "sim_contrastive_pairs" ->
      ((s, d) => Similarity.contrastivePairs(s, d)),
    "sim_mips_augment" -> ((s, d) => Similarity.mipsAugment(s, d)),
    "text_stopword_discovery" ->
      ((s, d) => TextAnalysis.stopwordDiscovery(s, d)),
    "events_reach_curve" -> ((s, d) => EventAnalytics.reachCurve(s, d)),
    "graph_assortativity" -> ((s, d) => Graph.assortativity(s, d)),
    "orders_repeat_latency" -> ((s, d) => Relational.repeatLatency(s, d)),
    "sim_hnsw_levels" -> ((s, d) => Similarity.hnswLevels(s, d)),
    "dedup_shingle_sweep" -> ((s, d) => DedupOps.shingleSweep(s, d)),
    "events_type_overlap" -> ((s, d) => EventAnalytics.typeOverlap(s, d)),
    "sim_jl_projection" -> ((s, d) => Similarity.jlProjection(s, d)),
    "events_heatmap" -> ((s, d) => EventAnalytics.heatmap(s, d)),
    "text_extractive_pick" ->
      ((s, d) => TextAnalysis.extractivePick(s, d)),
    "docs_gate_overlap" -> ((s, d) => TextAnalysis.gateOverlap(s, d)),
    "events_new_returning" ->
      ((s, d) => EventAnalytics.newVsReturning(s, d)),
    "join_asof_tolerance" -> ((s, d) => EventAnalytics.asofTolerance(s, d)),
    "stream_sessionize_stateful" ->
      ((s, d) => StreamingAnalytics.streamSessionizeStateful(s, d)),
    "window_ntile" -> ((s, d) => Relational.windowNtile(s, d)),
    "agg_bitwise" -> ((s, d) => Relational.aggBitwise(s, d)),
    "dedup_threshold_impact" ->
      ((s, d) => DedupOps.thresholdImpact(s, d)),
    "orders_qoq_growth" -> ((s, d) => Relational.qoqGrowth(s, d)),
    "sim_cluster_validity" ->
      ((s, d) => Similarity.clusterValidity(s, d)),
    "events_session_value" ->
      ((s, d) => EventAnalytics.sessionValue(s, d)),
    "events_value_dist" -> ((s, d) => EventAnalytics.valueDist(s, d)),
    "dq_freshness" -> ((s, d) => Quality.dqFreshness(s, d)),
    "events_conversion_by_activity" ->
      ((s, d) => EventAnalytics.conversionByActivity(s, d)),
    "orders_basket_profile" -> ((s, d) => Relational.basketProfile(s, d)),
    "events_attribution_touch" ->
      ((s, d) => EventAnalytics.attributionTouch(s, d)),
    "events_wow_growth" -> ((s, d) => EventAnalytics.wowGrowth(s, d)),
    "text_ttr_curve" -> ((s, d) => TextAnalysis.ttrCurve(s, d)),
    "dedup_hot_shingles" -> ((s, d) => DedupOps.hotShingleCensus(s, d)),
    "dedup_cc_agreement" -> ((s, d) => DedupOps.ccAgreement(s, d)),
    "dedup_bloom_fpr" -> ((s, d) => DedupOps.bloomFprCensus(s, d)),
    "sketch_quantiles" -> ((s, d) => Quality.sketchQuantiles(s, d)),
    "stream_bpe_encode" ->
      ((s, d) => StreamingAnalytics.streamBpeEncode(s, d)),
    "stream_unigram_encode" ->
      ((s, d) => StreamingAnalytics.streamUnigramEncode(s, d)),
    "sample_reservoir" -> ((s, d) => TextAnalysis.reservoirSample(s, d)),
    "events_markov_stationary" ->
      ((s, d) => EventAnalytics.markovStationary(s, d)),
    "sim_knn_diversify" -> ((s, d) => Similarity.knnDiversify(s, d)),
    "text_lm_interp" -> ((s, d) => TextAnalysis.lmInterpSweep(s, d)),
    "docs_gate_kappa" -> ((s, d) => TextAnalysis.gateKappa(s, d)),
    "stream_reservoir" ->
      ((s, d) => StreamingAnalytics.streamReservoir(s, d)),
    "docs_ccnet_buckets" -> ((s, d) => Curation.ccnetBuckets(s, d)),
    "mm_audio_neardup" -> ((s, d) => Multimodal.audioNearDup(s, d)),
    "text_rake_keywords" -> ((s, d) => TextAnalysis.rakeKeywords(s, d)),
    "text_contamination_sweep" ->
      ((s, d) => TextAnalysis.contaminationSweep(s, d)),
    "dedup_soft_weights" -> ((s, d) => DedupOps.softDedupWeights(s, d)),
    "sim_quant_sweep" -> ((s, d) => Similarity.quantSweep(s, d)),
    "sim_pq_train" -> ((s, d) => Similarity.pqTrainDistortion(s, d)),
    "dedup_semdedup" -> ((s, d) => Similarity.semDedup(s, d)),
    "graph_modularity" -> ((s, d) => Graph.modularity(s, d)),
    "graph_louvain" -> ((s, d) => Graph.louvainRound(s, d)),
    "graph_louvain_full" -> ((s, d) => Graph.louvainFull(s, d)),
    "events_survival_km" -> ((s, d) => EventAnalytics.survivalKm(s, d)),
    "stream_decontaminate" ->
      ((s, d) => StreamingAnalytics.streamDecontaminate(s, d)),
    "text_readability" -> ((s, d) => TextAnalysis.readability(s, d)),
    "sim_kcenter_coreset" -> ((s, d) => Similarity.kcenterCoreset(s, d)),
    "text_kneser_ney" -> ((s, d) => TextAnalysis.kneserNey(s, d)),
    "events_segment_migration" ->
      ((s, d) => EventAnalytics.segmentMigration(s, d)),
    "mm_scene_cuts" -> ((s, d) => Multimodal.sceneCuts(s, d)),
    "stream_anomaly" -> ((s, d) => StreamingAnalytics.streamAnomaly(s, d)),
    "text_compression_ratio" ->
      ((s, d) => TextAnalysis.compressionRatio(s, d)),
    "sim_recall_curve" -> ((s, d) => Similarity.recallCurve(s, d)),
    "mix_temperature" -> ((s, d) => TextAnalysis.mixTemperature(s, d)),
    "docs_uncertainty_sample" ->
      ((s, d) => Curation.uncertaintySample(s, d)),
    "stream_freq_topk" ->
      ((s, d) => StreamingAnalytics.streamFreqTopk(s, d)),
    "basket_rules" -> ((s, d) => Relational.basketRules(s, d)),
    "events_funnel_sweep" -> ((s, d) => EventAnalytics.funnelSweep(s, d)),
    "sim_ivf_balance" -> ((s, d) => Similarity.ivfBalance(s, d)),
    "docs_probe_cv" -> ((s, d) => Curation.probeCv(s, d)),
    "graph_ppr" -> ((s, d) => Graph.pprFromSeed(s, d)),
    "stream_mix_rebalance" ->
      ((s, d) => StreamingAnalytics.streamMixRebalance(s, d)),
    "docs_gate_ablation" -> ((s, d) => DedupOps.gateAblation(s, d)),
    "events_markov_eval" -> ((s, d) => EventAnalytics.markovEval(s, d)),
    "mm_pack_budget" -> ((s, d) => Multimodal.packBudget(s, d)),
    "text_span_corruption" ->
      ((s, d) => TextAnalysis.spanCorruption(s, d)),
    "events_ab_srm" -> ((s, d) => EventAnalytics.abSrm(s, d)),
    "stream_kmeans" -> ((s, d) => StreamingAnalytics.streamKmeans(s, d)),
    "sim_seed_sweep" -> ((s, d) => Similarity.seedSweep(s, d)),
    "text_heaps_law" -> ((s, d) => TextAnalysis.heapsLaw(s, d)),
    "dedup_perm_sweep" -> ((s, d) => DedupOps.permSweep(s, d)),
    "sim_dim_sweep" -> ((s, d) => Similarity.dimSweep(s, d)),
    "events_retention_fit" ->
      ((s, d) => EventAnalytics.retentionFit(s, d)),
    "events_dispersion" -> ((s, d) => EventAnalytics.dispersion(s, d)),
    "docs_rank_fusion" -> ((s, d) => Curation.rankFusion(s, d)),
    "text_entropy_rate" -> ((s, d) => TextAnalysis.entropyRate(s, d)),
    "events_attribution_markov" ->
      ((s, d) => EventAnalytics.attributionMarkov(s, d)),
    "sketch_hll_intersect" -> ((s, d) => Quality.hllIntersect(s, d)),
    "sketch_kmv" -> ((s, d) => Quality.kmvSketch(s, d)),
    "sim_binary_recall" -> ((s, d) => Similarity.binaryRecall(s, d)),
    "events_user_similarity" ->
      ((s, d) => EventAnalytics.userSimilarity(s, d)),
    "stream_hll_distinct" ->
      ((s, d) => StreamingAnalytics.streamHllDistinct(s, d)),
    "stream_kmv_distinct" ->
      ((s, d) => StreamingAnalytics.streamKmvDistinct(s, d)),
    "graph_conductance" -> ((s, d) => Graph.conductance(s, d)),
    "events_ab_cuped" -> ((s, d) => EventAnalytics.abCuped(s, d)),
    "text_winnowing" -> ((s, d) => TextAnalysis.winnowing(s, d)),
    "events_rolling_actives" ->
      ((s, d) => EventAnalytics.rollingActives(s, d)),
    "graph_bfs_knn" -> ((s, d) => Graph.bfsKnn(s, d)),
    "sim_dbscan" -> ((s, d) => Similarity.dbscan(s, d)),
    "events_changepoint" -> ((s, d) => EventAnalytics.changepoint(s, d)),
    "stream_quantiles" ->
      ((s, d) => StreamingAnalytics.streamQuantiles(s, d)),
    "docs_loo_influence" -> ((s, d) => Curation.looInfluence(s, d)),
    "sim_triplet_mining" -> ((s, d) => Similarity.tripletMining(s, d)),
    "stream_decay_topk" ->
      ((s, d) => StreamingAnalytics.streamDecayTopk(s, d)),
    "text_textrank" -> ((s, d) => TextAnalysis.textrank(s, d)),
    "events_seasonal_strength" ->
      ((s, d) => EventAnalytics.seasonalStrength(s, d)),
    "sim_facility_select" -> ((s, d) => Similarity.facilitySelect(s, d)),
    "dq_reconciliation" -> ((s, d) => Relational.reconciliation(s, d)),
    "orders_drawdown" -> ((s, d) => Relational.drawdown(s, d)),
    "stream_cc_incremental" ->
      ((s, d) => StreamingAnalytics.streamCcIncremental(s, d)),
    "graph_weak_ties" -> ((s, d) => Graph.weakTies(s, d)),
    "events_ab_sequential" ->
      ((s, d) => EventAnalytics.abSequential(s, d)),
    "mm_patch_grid" -> ((s, d) => Multimodal.patchGrid(s, d)),
    "events_holt_forecast" ->
      ((s, d) => EventAnalytics.holtForecast(s, d)),
    "sim_metric_agreement" ->
      ((s, d) => Similarity.metricAgreement(s, d)),
    "text_prefix_compression" ->
      ((s, d) => TextAnalysis.prefixCompression(s, d)),
    "dedup_winnowing_pairs" -> ((s, d) => DedupOps.winnowingPairs(s, d)),
    "join_pit_dimension" -> ((s, d) => Temporal.pitJoin(s, d)),
    "stream_holt" -> ((s, d) => StreamingAnalytics.streamHolt(s, d)),
    "events_forecast_backtest" ->
      ((s, d) => EventAnalytics.forecastBacktest(s, d)),
    "sketch_countmin" -> ((s, d) => Quality.sketchCountMin(s, d)),
    "sim_prf_expansion" -> ((s, d) => Similarity.prfExpansion(s, d)),
    "dedup_winnowing_eval" -> ((s, d) => DedupOps.winnowingEval(s, d)),
    "events_bursts" -> ((s, d) => EventAnalytics.burstCensus(s, d)),
    "events_poisson_bootstrap" ->
      ((s, d) => EventAnalytics.poissonBootstrap(s, d)),
    "stream_ab_monitor" ->
      ((s, d) => StreamingAnalytics.streamAbMonitor(s, d)),
    "dq_referential" -> ((s, d) => Relational.referentialAudit(s, d)),
    "sim_residual_quant" -> ((s, d) => Similarity.residualQuant(s, d)),
    "sample_balanced" -> ((s, d) => Curation.balancedSample(s, d)),
    "dq_psi_drift" -> ((s, d) => Relational.psiDrift(s, d)),
    "window_vwap" -> ((s, d) => Relational.vwap(s, d)),
    "dq_benford" -> ((s, d) => Quality.benfordDigits(s, d)),
    "sketch_ams_f2" -> ((s, d) => Quality.sketchAmsF2(s, d)),
    "events_autocorr" -> ((s, d) => EventAnalytics.autocorrelation(s, d)),
    "text_yule_k" -> ((s, d) => TextAnalysis.yuleK(s, d)),
    "events_powerlaw_fit" -> ((s, d) => EventAnalytics.powerlawFit(s, d)),
    "sim_cluster_nmi" -> ((s, d) => Similarity.clusterNmi(s, d)),
    "dq_candidate_keys" -> ((s, d) => Quality.candidateKeys(s, d)),
    "sample_neyman_alloc" -> ((s, d) => Curation.neymanAllocation(s, d)),
    "text_msttr" -> ((s, d) => TextAnalysis.msttr(s, d)),
    "events_seq_patterns" -> ((s, d) => EventAnalytics.seqPatterns(s, d)),
    "sim_multiprobe_lsh" -> ((s, d) => Similarity.multiprobeLsh(s, d)),
    "stream_psi_monitor" ->
      ((s, d) => StreamingAnalytics.streamPsiMonitor(s, d)),
    "mm_audio_fingerprint" -> ((s, d) => Multimodal.audioFingerprint(s, d)),
    "graph_closeness" -> ((s, d) => Graph.closenessCentrality(s, d)),
    "orders_theil_decomp" -> ((s, d) => Relational.theilDecomp(s, d)),
    "agg_trimmed_mean" -> ((s, d) => Relational.trimmedMeans(s, d)),
    "window_interpolate" -> ((s, d) => Temporal.interpolateHourly(s, d)),
    "events_did_pretrends" -> ((s, d) => EventAnalytics.didPretrends(s, d)),
    "sim_greedy_search" -> ((s, d) => Similarity.greedySearch(s, d)),
    "sim_hnsw_search" -> ((s, d) => Similarity.hnswSearch(s, d)),
    "orders_demand_classes" -> ((s, d) => Relational.demandClasses(s, d)),
    "dq_pchart" -> ((s, d) => Quality.pChart(s, d)),
    "docs_skyline_pareto" -> ((s, d) => Curation.skylinePareto(s, d)),
    "orders_croston" -> ((s, d) => Relational.crostonForecast(s, d)),
    "orders_bass_diffusion" -> ((s, d) => Relational.bassDiffusion(s, d)),
    "dq_fd_discovery" -> ((s, d) => Quality.fdDiscovery(s, d)),
    "text_burrows_delta" -> ((s, d) => TextAnalysis.burrowsDelta(s, d)),
    "events_att_matching" -> ((s, d) => EventAnalytics.attMatching(s, d)),
    "agg_gh_means" -> ((s, d) => Relational.pythagoreanMeans(s, d)),
    "graph_hits" -> ((s, d) => Graph.hitsKnn(s, d)),
    "dq_rowhash_rollup" -> ((s, d) => Quality.rowhashRollup(s, d)),
    "orders_price_index" -> ((s, d) => Relational.priceIndexes(s, d)),
    "events_periodogram" -> ((s, d) => EventAnalytics.periodogram(s, d)),
    "orders_hhi" -> ((s, d) => Relational.hhiConcentration(s, d)),
    "sample_systematic" -> ((s, d) => Curation.systematicSample(s, d)),
    "sample_monetary_unit" ->
      ((s, d) => Curation.monetaryUnitSample(s, d)),
    "window_bollinger" -> ((s, d) => Relational.bollingerBands(s, d)),
    "orders_safety_stock" -> ((s, d) => Relational.safetyStock(s, d)),
    "docs_token_infogain" -> ((s, d) => Curation.tokenInfogain(s, d)),
    "text_langid_eval" -> ((s, d) => TextAnalysis.langidEval(s, d)),
    "events_mann_whitney" -> ((s, d) => EventAnalytics.mannWhitney(s, d)),
    "agg_skew_kurtosis" -> ((s, d) => Relational.skewKurtosis(s, d)),
    "dedup_trigram_cosine" -> ((s, d) => DedupOps.trigramCosine(s, d)),
    "window_rsi" -> ((s, d) => Relational.rsiCutler(s, d)),
    "sketch_linear_counting" -> ((s, d) => Quality.linearCounting(s, d)),
    "orders_lorenz_curve" -> ((s, d) => Relational.lorenzCurve(s, d)),
    "events_ab_power" -> ((s, d) => EventAnalytics.abPower(s, d)),
    "graph_reciprocity" -> ((s, d) => Graph.reciprocity(s, d)),
    "dedup_cluster_purity" -> ((s, d) => DedupOps.clusterPurity(s, d)),
    "orders_runs_test" -> ((s, d) => Relational.runsTest(s, d)),
    "sim_intrinsic_dim" -> ((s, d) => Similarity.intrinsicDim(s, d)),
    "orders_seasonal_index" -> ((s, d) => Relational.seasonalIndex(s, d)),
    "sim_norm_census" -> ((s, d) => Similarity.normCensus(s, d)),
    "text_char_entropy" -> ((s, d) => TextAnalysis.charEntropy(s, d)),
    "events_ks_test" -> ((s, d) => EventAnalytics.ksTest(s, d)),
    "events_chisq" -> ((s, d) => EventAnalytics.chisqIndependence(s, d)),
    "events_fdr_bh" -> ((s, d) => EventAnalytics.fdrBh(s, d)),
    "text_good_turing" -> ((s, d) => TextAnalysis.goodTuring(s, d)),
    "orders_newsvendor" -> ((s, d) => Relational.newsvendor(s, d)),
    "dq_gap_islands" -> ((s, d) => Quality.gapIslands(s, d)),
    "mm_vad_segments" -> ((s, d) => Multimodal.vadSegments(s, d)),
    "sim_maxsim_multivec" -> ((s, d) => Similarity.maxsimMultivec(s, d)),
    "events_shapley_attribution" ->
      ((s, d) => EventAnalytics.shapleyAttribution(s, d)),
    "events_granger" -> ((s, d) => EventAnalytics.grangerLeadLag(s, d)),
    "events_qini_curve" -> ((s, d) => EventAnalytics.qiniCurve(s, d)),
    "graph_squares" -> ((s, d) => Graph.squares(s, d)),
    "text_bm25_topk" -> ((s, d) => TextAnalysis.bm25TopK(s, d)),
    "dq_k_anonymity" -> ((s, d) => Quality.kAnonymity(s, d)),
    "dedup_bbit_minhash" -> ((s, d) => DedupOps.bbitMinhash(s, d)),
    "events_absorption_time" ->
      ((s, d) => EventAnalytics.absorptionTime(s, d)),
    "orders_fe_regression" -> ((s, d) => Relational.feRegression(s, d)),
    "sim_hubness" -> ((s, d) => Similarity.hubness(s, d)),
    "sim_filtered_topk" -> ((s, d) => Similarity.filteredTopK(s, d)),
    "docs_rho_select" -> ((s, d) => Curation.rhoSelect(s, d)),
    "sim_semantic_drift" -> ((s, d) => Similarity.semanticDrift(s, d)),
    "json_variant_agg" -> ((s, d) => EventAnalytics.variantAgg(s, d)),
    "orders_theil_sen" -> ((s, d) => Relational.theilSen(s, d)),
    "sample_horvitz_thompson" ->
      ((s, d) => Curation.horvitzThompson(s, d)),
    "events_growth_accounting" ->
      ((s, d) => EventAnalytics.growthAccounting(s, d)),
    "feature_target_encoding" ->
      ((s, d) => Relational.targetEncoding(s, d)),
    "orders_tier_migration" -> ((s, d) => Relational.tierMigration(s, d)),
    "text_source_ce_matrix" ->
      ((s, d) => TextAnalysis.sourceCeMatrix(s, d)),
    "orders_anova_weekday" -> ((s, d) => Relational.anovaWeekday(s, d)),
    "sim_ood_mahalanobis" -> ((s, d) => Similarity.oodMahalanobis(s, d)),
    "graph_local_cc" ->
      ((s, d) => Graph.localClusteringCoefficient(s, d)),
    "sim_matryoshka_recall" ->
      ((s, d) => Similarity.matryoshkaRecall(s, d)),
    "text_bpe_oov" -> ((s, d) => TextAnalysis.bpeOov(s, d)),
    "text_hybrid_retrieval" ->
      ((s, d) => TextAnalysis.hybridRetrieval(s, d)),
    "text_retrieval_ndcg" ->
      ((s, d) => TextAnalysis.retrievalNdcg(s, d)),
    "text_retrieval_ndcg_multi" ->
      ((s, d) => TextAnalysis.retrievalNdcgMulti(s, d)),
    "text_retrieval_panel_ci" ->
      ((s, d) => TextAnalysis.retrievalPanelCi(s, d)),
    "text_unigram_tokenizer" ->
      ((s, d) => TextAnalysis.unigramTokenizer(s, d)),
    "text_tokenizer_fertility" ->
      ((s, d) => TextAnalysis.tokenizerFertility(s, d)),
    "text_wordpiece_greedy" ->
      ((s, d) => TextAnalysis.wordpieceGreedy(s, d)),
    "sim_centroid_margin" ->
      ((s, d) => Similarity.centroidMargin(s, d)),
    "orders_price_elasticity" ->
      ((s, d) => Relational.priceElasticity(s, d)),
    "feature_woe_iv" -> ((s, d) => Relational.woeIv(s, d)),
    "dq_l_diversity" -> ((s, d) => Quality.lDiversity(s, d)),
    "text_kn_bigram" -> ((s, d) => TextAnalysis.knBigram(s, d)),
    "window_rolling_corr" ->
      ((s, d) => EventAnalytics.rollingCorr(s, d)),
    "sim_mmr_rerank" -> ((s, d) => Similarity.mmrRerank(s, d)),
    "sim_beam_search" -> ((s, d) => Similarity.beamSearch(s, d)),
    "events_ucb_allocation" ->
      ((s, d) => EventAnalytics.ucbAllocation(s, d)),
    "orders_its_segmented" ->
      ((s, d) => Relational.itsSegmented(s, d)),
    "dq_profile_drift" -> ((s, d) => Quality.profileDrift(s, d)),
    "graph_betweenness" ->
      ((s, d) => Graph.betweennessSampled(s, d)),
    "events_event_study" ->
      ((s, d) => EventAnalytics.eventStudy(s, d)),
    "orders_eoq" -> ((s, d) => Relational.eoq(s, d))
  )

  /** DuckDB-dialect ANSI SQL oracles, one per queries entry.
    * Conventions keeping the hash compare honest (see Relational scaladoc):
    * decimal-exact sums cast to double, explicit BIGINT casts where DuckDB
    * and Spark integer widths differ, timestamps formatted as strings,
    * NULLS FIRST to match Spark's ascending-sort null placement. */
  /** Shared CTE bodies: rows that COMPOSE another row's semantics
    * (anomaly gate over the decomposition, projection over the learned
    * component) embed the SAME oracle text, so a fix to the base
    * relation can never silently diverge from its consumers. */
  private val tsDecomposeOracle: String =
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         tr AS (SELECT *,
             CAST(SUM(n) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend,
             dayofweek(d) AS dow
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         dt AS (SELECT *, CAST(n - trend AS DECIMAL(28,8)) AS detr FROM tr),
         se AS (SELECT event_type, dow,
             CAST(SUM(detr) AS DOUBLE) / COUNT(*) AS seasonal
           FROM dt GROUP BY 1, 2)
         SELECT t.event_type, strftime(t.d, '%Y-%m-%d') AS day, t.n,
           ROUND(t.trend, 4) AS trend,
           ROUND(s.seasonal, 4) AS seasonal,
           ROUND(CAST(t.detr AS DOUBLE) - s.seasonal, 4) AS residual
         FROM dt t JOIN se s
           ON t.event_type = s.event_type AND t.dow = s.dow
         ORDER BY t.event_type, day"""

  private val pcaPowerOracle: String =
    """WITH xq AS (SELECT vec_id, j - 1 AS j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS j
                 FROM embeddings) t),
         s AS (SELECT vec_id, CAST(SUM(xq) AS BIGINT) AS s
               FROM xq GROUP BY 1),
         w AS (SELECT j, CAST(SUM(xq.xq * s.s) AS BIGINT) AS w
               FROM xq JOIN s USING (vec_id) GROUP BY 1),
         nm AS (SELECT SUM(CAST(CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
                  AS DECIMAL(38,6))) AS nsq FROM w)
         SELECT j, w,
           ROUND(CAST(w AS DOUBLE) / sqrt(CAST(nsq AS DOUBLE)), 6)
             AS component
         FROM w, nm ORDER BY j"""

  def oracleSql: Map[String, String] = {
    val m = Map(
    "ref_pipeline" ->
      """SELECT b.event_id AS af_id,
         strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS install_time,
         b.user_id AS customer_user_id, b.event_type AS event_name,
         b.value AS event_value
         FROM events b
         WHERE b.ts >= TIMESTAMP '2024-01-15 00:00:00'
           AND b.ts <= TIMESTAMP '2024-01-15 02:00:00'
           AND NOT EXISTS (SELECT 1 FROM events e
             WHERE e.ts >= TIMESTAMP '2024-01-15 00:00:00'
               AND e.ts <= TIMESTAMP '2024-01-15 01:00:00'
               AND e.event_id = b.event_id)
         ORDER BY af_id""",
    "ref_parse_datetime" ->
      """SELECT event_id,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S')
         END AS parsed_ts
         FROM events ORDER BY event_id""",
    "ref_sentinel_null" ->
      """SELECT CASE WHEN event_type IN ('error','view','click') THEN NULL
                     ELSE event_type END AS norm,
                COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY norm NULLS FIRST""",
    "ref_window_filter" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, event_type
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts <= TIMESTAMP '2024-01-10 06:00:00'
         ORDER BY event_id""",
    "ref_key_filter" ->
      """SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
         FROM events WHERE value >= 20 GROUP BY 1 ORDER BY key""",
    "ref_window_count" ->
      """SELECT COUNT(*) AS n FROM events
         WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
           AND ts <= TIMESTAMP '2024-01-15 02:00:00'""",
    "ref_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
         ORDER BY c_custkey""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2)) * CAST(1+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
         CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM customer, orders, lineitem
         WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
           AND l_orderkey = o_orderkey
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
         GROUP BY 1, 2
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_local_supplier" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM region, nation, customer, orders, lineitem, supplier
         WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
           AND n_nationkey = c_nationkey AND c_custkey = o_custkey
           AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
           AND c_nationkey = s_nationkey
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "q6_sql_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "stream_sliding_two_hour" ->
      """WITH e AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         w AS (SELECT date_trunc('hour', ts) AS ws FROM e
               UNION ALL
               SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
                strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
                COUNT(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY 1""",
    "join_outer_customer" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE), 0.0) AS total_spend
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY 1, 2 ORDER BY c_custkey""",
    "join_semi_customer" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
         FROM lineitem WHERE l_orderkey < 200
         ORDER BY l_suppkey, l_orderkey, l_linenumber""",
    "window_distribution" ->
      """SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
         CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
         ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
         ROUND(CUME_DIST() OVER w, 6) AS cume,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
         FROM part WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
         WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
         ORDER BY p_brand, price, p_partkey""",
    "window_navigation" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
         LAG(o_orderkey, 1) OVER w AS prev_order,
         LEAD(o_orderkey, 1) OVER w AS next_order,
         FIRST_VALUE(o_orderkey) OVER wf AS first_order,
         LAST_VALUE(o_orderkey) OVER wf AS last_order
         FROM orders WHERE o_custkey < 200
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, orderdate, o_orderkey""",
    "rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "distinct_segments" ->
      """SELECT DISTINCT c_mktsegment, n_name
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         ORDER BY c_mktsegment, n_name""",
    "set_ops" ->
      """SELECT 'except' AS op, k FROM (
           SELECT o_custkey AS k FROM orders
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         UNION ALL
         SELECT 'intersect' AS op, k FROM (
           SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
           INTERSECT
           SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
         UNION ALL
         SELECT 'union' AS op, k FROM (
           SELECT DISTINCT k FROM (
             SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
             UNION ALL
             SELECT CAST(s_nationkey AS BIGINT) FROM supplier))
         ORDER BY op, k""",
    "agg_stats" ->
      """SELECT l_returnflag,
         CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
         CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
         COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(*) AS n_rows,
         ROUND(STDDEV_SAMP(l_quantity), 2) AS sd_qty
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "math_funcs" ->
      """SELECT p_partkey,
         ROUND(SQRT(p_retailprice), 4) AS sqrt_price,
         ROUND(LN(p_retailprice), 4) AS ln_price,
         ROUND(POW(CAST(p_size AS DOUBLE), 2), 1) AS size_sq,
         ABS(p_size - 25) AS size_dev,
         CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
         CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
         p_partkey % 7 AS key_mod
         FROM part ORDER BY p_partkey""",
    "date_funcs" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(month(o_orderdate) AS BIGINT) AS mon,
         CAST(day(o_orderdate) AS BIGINT) AS dom,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
         strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
         strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
         CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
           AS days_to_eoy,
         CAST(((CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 7 + 7) % 7 AS BIGINT)
           AS weekday_mod
         FROM orders WHERE o_orderkey < 2000
         ORDER BY o_orderkey""",
    "string_funcs" ->
      """SELECT p_partkey,
         UPPER(p_brand) AS brand_u,
         LOWER(p_type) AS type_l,
         CAST(LENGTH(p_name) AS BIGINT) AS name_len,
         SUBSTRING(p_name, 1, 5) AS name_pfx,
         CONCAT_WS('|', p_brand, p_type) AS brand_type,
         REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowel,
         CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a
         FROM part ORDER BY p_partkey""",
    "price_buckets" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 150000 THEN 'medium'
                     ELSE 'large' END AS bucket,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f
         FROM orders GROUP BY 1 ORDER BY bucket""",
    "pivot_status" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY 1 ORDER BY o_orderpriority""",
    "cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "percentile_qty" ->
      """SELECT l_returnflag,
         ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
         ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
         ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "corr_price_qty" ->
      """SELECT l_returnflag, n,
         ROUND((n * sxy - sx * sy)
           / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
           AS corr_price_qty
         FROM (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1) t
         ORDER BY l_returnflag""",
    "segment_nations" ->
      """SELECT c_mktsegment,
         string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
         COUNT(DISTINCT n_name) AS n_nations
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "sliding_two_hour" ->
      """WITH e AS (SELECT ts FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00'),
         w AS (SELECT date_trunc('hour', ts) AS ws FROM e
               UNION ALL
               SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM e)
         SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
                strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
                COUNT(*) AS n
         FROM w GROUP BY 1, 2 ORDER BY 1""",
    "sessionize" ->
      """SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
         FROM (
           SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, event_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
         GROUP BY user_id ORDER BY user_id""",
    "map_funcs" ->
      """SELECT event_type, first_key, COUNT(*) AS n,
         CAST(SUM(k_value) AS BIGINT) AS sum_k,
         CAST(MAX(n_keys) AS BIGINT) AS max_keys
         FROM (
           SELECT event_type,
             json_keys(props)[1] AS first_key,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
             len(json_keys(props)) AS n_keys
           FROM events) t
         GROUP BY 1, 2 ORDER BY event_type, first_key""",
    "null_funcs" ->
      """SELECT event_id,
         COALESCE(t, 'missing') AS t_or_default,
         NULLIF(t, '') AS t_nullif_empty,
         CASE WHEN t IS NOT NULL THEN 'present' ELSE 'absent' END AS nvl2_style,
         CAST(CASE WHEN t IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_null
         FROM (
           SELECT event_id,
             CASE WHEN value < 10 THEN NULL
                  WHEN value < 20 THEN ''
                  ELSE event_type END AS t
           FROM events) x
         ORDER BY event_id""",
    "session_windows" ->
      """SELECT user_id,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, value, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, value, event_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
         GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k,
         COUNT(CASE WHEN k >= 50 THEN 1 END) AS n_high
         FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events) t
         GROUP BY 1 ORDER BY event_type""",
    "join_asof_attribution" ->
      """SELECT event_id, user_id,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         strftime(asof_view_ts, '%Y-%m-%d %H:%M:%S') AS asof_view_ts,
         epoch_us(ts) - epoch_us(asof_view_ts) AS gap_us
         FROM (
           SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS asof_view_ts
           FROM events) t
         WHERE event_type = 'purchase' ORDER BY event_id""",
    "join_range_bands" ->
      """SELECT band, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
         FROM orders JOIN (VALUES
           ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
           ('premium', 150000.0, 300000.0), ('luxury', 300000.0, 1000000000.0))
           b(band, lo, hi)
           ON o_totalprice >= lo AND o_totalprice < hi
         GROUP BY band ORDER BY band""",
    "skew_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "skew_salted_join" ->
      """SELECT e.event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(weight AS DECIMAL(3,1))) AS DOUBLE)
           AS weighted_value
         FROM events e JOIN (VALUES
           ('click', 1.0), ('view', 0.5), ('purchase', 5.0),
           ('error', 0.0), ('signup', 2.0)) d(event_type, weight)
           ON e.event_type = d.event_type
         GROUP BY 1 ORDER BY e.event_type""",
    "stream_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "stream_distinct_pairs" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "explode_outer_stats" ->
      """SELECT lang,
         CAST(SUM(greatest(n_sh, 1)) AS BIGINT) AS n_rows,
         CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
         COUNT(CASE WHEN n_sh = 0 THEN 1 END) AS n_empty_docs
         FROM (
           SELECT lang,
             CASE WHEN len(string_split(text, ' ')) >= 5
                  THEN len(list_distinct(
                    [array_to_string(string_split(text, ' ')[i:i+4], ' ')
                     for i in range(1, len(string_split(text, ' '))-3)]))
                  ELSE 0 END AS n_sh
           FROM documents) t
         GROUP BY lang ORDER BY lang""",
    "array_funcs" ->
      """SELECT doc_id,
         CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
         CAST(len(list_intersect(list_distinct(w),
           ['the','a','of','and','to','in','is','for','on','with'])) AS BIGINT)
           AS n_stop_kinds,
         CAST(len(list_distinct(list_concat(list_distinct(w),
           ['the','a','of','and','to','in','is','for','on','with']))) AS BIGINT)
           AS n_union_stop,
         array_to_string(list_sort(list_distinct(w))[1:3], ',') AS first3_sorted,
         w[1] AS head_tok, w[-1] AS tail_tok
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
         ORDER BY doc_id""",
    "text_token_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
         CAST(SUM(n_uniq) AS DOUBLE) / SUM(n_tok) AS avg_ttr
         FROM (SELECT lang, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
               FROM documents) t
         GROUP BY lang ORDER BY lang""",
    "text_quality" ->
      """SELECT doc_id, lang, n_tok,
         CAST(n_stop AS DOUBLE) / n_tok AS stop_ratio,
         CAST(n_uniq AS DOUBLE) / n_tok AS ttr,
         CAST(n_chars AS DOUBLE) / n_tok AS avg_tok_len,
         CASE WHEN n_tok < 10 THEN 'too_short'
              WHEN CAST(n_stop AS DOUBLE) / n_tok > 0.5 THEN 'boilerplate'
              WHEN CAST(n_uniq AS DOUBLE) / n_tok < 0.3 THEN 'repetitive'
              ELSE 'ok' END AS quality
         FROM (SELECT doc_id, lang, n_chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
                 CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
               FROM documents) t
         ORDER BY doc_id""",
    "text_langid" ->
      """SELECT lang, pred_lang, COUNT(*) AS n FROM (
           SELECT lang,
             CASE WHEN contains(t, ' der ') OR contains(t, ' und ') OR contains(t, ' die ') THEN 'de'
                  WHEN contains(t, ' le ') OR contains(t, ' la ') OR contains(t, ' et ') THEN 'fr'
                  WHEN contains(t, ' el ') OR contains(t, ' los ') OR contains(t, ' que ') THEN 'es'
                  WHEN regexp_matches(t, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                  WHEN contains(t, ' the ') OR contains(t, ' and ') OR contains(t, ' of ') THEN 'en'
                  ELSE 'unknown' END AS pred_lang
           FROM (SELECT lang, ' ' || text || ' ' AS t FROM documents) a) b
         GROUP BY 1, 2 ORDER BY lang, pred_lang""",
    "text_fingerprint" ->
      """SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper, MAX(doc_id) AS max_doc
         FROM (SELECT doc_id, md5(substr(text, 1, 64)) AS fp FROM documents) t
         GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""",
    "dedup_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY fp""",
    // dedup_cascade: the three standalone tier oracles composed, each
    // tier's pair set restricted to the previous tier's survivors
    "dedup_cascade" ->
      """WITH keep1 AS (SELECT MIN(doc_id) AS doc_id FROM documents
           GROUP BY md5(text)),
         surv1 AS (SELECT doc_id FROM documents
           WHERE doc_id IN (SELECT doc_id FROM keep1)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i,
             MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
           FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
             md5(string_agg(h, ',' ORDER BY i)) AS bucket
           FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket
                AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
           FROM cand c JOIN sh a ON c.d1 = a.doc_id
                       JOIN sh b ON c.d2 = b.doc_id
                         AND a.shingle = b.shingle
           GROUP BY 1, 2),
         mhp AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         p2 AS (SELECT d1, d2 FROM mhp
           WHERE d1 IN (SELECT doc_id FROM surv1)
             AND d2 IN (SELECT doc_id FROM surv1)),
         losers2 AS (SELECT DISTINCT d2 AS doc_id FROM p2),
         surv2 AS (SELECT doc_id FROM surv1
           WHERE doc_id NOT IN (SELECT doc_id FROM losers2)),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1)
               * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1))
               - 1)) % 64 AS bucket,
             COUNT(*) AS c
           FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
           FROM cand c JOIN tf a ON c.d1 = a.doc_id
                       JOIN tf b ON c.d2 = b.doc_id
                         AND a.bucket = b.bucket
           GROUP BY 1, 2),
         cosp AS (SELECT d1, d2 FROM dot
           JOIN norms n1 ON d1 = n1.doc_id
           JOIN norms n2 ON d2 = n2.doc_id
           WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE))
               * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9),
         p3 AS (SELECT d1, d2 FROM cosp
           WHERE d1 IN (SELECT doc_id FROM surv2)
             AND d2 IN (SELECT doc_id FROM surv2)),
         losers3 AS (SELECT DISTINCT d2 AS doc_id FROM p3),
         c AS (SELECT
           (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_all,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv1) AS n_s1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p2) AS n_p2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM losers2) AS n_l2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM surv2) AS n_s2,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p3) AS n_p3,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM losers3) AS n_l3)
         SELECT stage, candidates_in, n_pairs, n_removed, survivors,
           ROUND(CAST(n_removed AS DOUBLE)
             / CAST(candidates_in AS DOUBLE), 6) AS removal_rate
         FROM (
           SELECT '1_exact' AS stage, n_all AS candidates_in,
             n_all - n_s1 AS n_pairs, n_all - n_s1 AS n_removed,
             n_s1 AS survivors FROM c
           UNION ALL
           SELECT '2_minhash', n_s1, n_p2, n_l2, n_s2 FROM c
           UNION ALL
           SELECT '3_cosine', n_s2, n_p3, n_l3, n_s2 - n_l3 FROM c) u
         ORDER BY stage""",
    "dedup_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (n1 + n2 - i), 3) AS jaccard
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5
         ORDER BY d1, d2""",
    "dedup_containment" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT d1, d2,
           CASE WHEN n1 <= n2 THEN d1 ELSE d2 END AS contained_doc,
           ROUND(CAST(i AS DOUBLE) / LEAST(n1, n2), 3) AS containment
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / LEAST(n1, n2) >= 0.8
         ORDER BY d1, d2""",
    "dedup_minhash_calibration" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         slots AS (SELECT c.d1, c.d2,
             CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
               AS slots_eq
           FROM cand c JOIN mh a ON c.d1 = a.doc_id
                       JOIN mh b ON c.d2 = b.doc_id AND a.i = b.i
           GROUP BY 1, 2),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2)
         SELECT v.d1, v.d2, sl.slots_eq,
           ROUND(CAST(sl.slots_eq AS DOUBLE) / 9, 3) AS est_jaccard,
           ROUND(CAST(v.i AS DOUBLE) / (v.n1 + v.n2 - v.i), 3)
             AS exact_jaccard,
           ROUND(abs(CAST(sl.slots_eq AS DOUBLE) / 9 -
             CAST(v.i AS DOUBLE) / (v.n1 + v.n2 - v.i)), 3) AS abs_err
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         JOIN slots sl ON v.d1 = sl.d1 AND v.d2 = sl.d2
         ORDER BY v.d1, v.d2""",
    "dedup_minhash_lsh" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2)
         SELECT d1, d2, ROUND(CAST(i AS DOUBLE) / (n1 + n2 - i), 3) AS jaccard
         FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id) v
         WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5
         ORDER BY d1, d2""",
    "dedup_embedding_cosine" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2)
         SELECT d1 AS keeper, d2 AS dup,
           ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))), 4) AS cos
         FROM dot JOIN norms n1 ON d1 = n1.doc_id JOIN norms n2 ON d2 = n2.doc_id
         WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9
         ORDER BY keeper, dup""",
    "dedup_cosine_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2),
         scored AS (SELECT d1, d2,
             CAST(dot AS DOUBLE)
               / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE)))
               AS cos
           FROM dot JOIN norms n1 ON d1 = n1.doc_id
                    JOIN norms n2 ON d2 = n2.doc_id),
         sw AS (SELECT s.*, t.threshold
                FROM scored s, unnest([0.80, 0.90, 0.95, 0.99]) t(threshold)
                WHERE s.cos >= t.threshold)
         SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT d2) AS BIGINT) AS n_dup_docs,
           ROUND(MIN(cos), 4) AS min_cos,
           ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 4) AS avg_cos
         FROM sw GROUP BY 1 ORDER BY threshold""",
    "sim_knn_graph" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2, sim FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         rec AS (SELECT x.label, CAST(COUNT(*) AS BIGINT) AS n_recip
                 FROM knn x JOIN knn y ON x.v1 = y.v2 AND x.v2 = y.v1
                 GROUP BY 1)
         SELECT k.label, CAST(COUNT(DISTINCT k.v1) AS BIGINT) AS n_nodes,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COALESCE(MAX(r.n_recip), 0) AS BIGINT) AS n_reciprocal,
           ROUND(CAST(SUM(CAST(CAST(k.sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 4) AS avg_sim
         FROM knn k LEFT JOIN rec r ON k.label = r.label
         GROUP BY k.label ORDER BY k.label""",
    "text_token_bpe" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
         CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS total_bpe_tokens,
         CAST(SUM(n_chars) AS DOUBLE)
           / SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS chars_per_bpe
         FROM documents GROUP BY lang ORDER BY lang""",
    "docs_prep_pipeline" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
           FROM documents),
         keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         losers AS (SELECT DISTINCT v.d2 AS doc_id
                    FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                          FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                                       JOIN sizes s2 ON x.d2 = s2.doc_id) v
                    WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
         FROM scored q
         WHERE n_tok >= 10
           AND CAST(n_stop AS DOUBLE) / n_tok <= 0.5
           AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.3
           AND q.doc_id IN (SELECT doc_id FROM keepers)
           AND q.doc_id NOT IN (SELECT doc_id FROM losers)
         GROUP BY lang ORDER BY lang""",
    "dedup_simhash" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
                    FROM documents),
         h AS (SELECT doc_id, substr(md5(word), 1, 16) AS hx FROM w),
         bits AS (
           SELECT doc_id, j,
             SUM(CASE WHEN ((strpos('0123456789abcdef',
                               substr(hx, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   // (CASE CAST(j % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4
                       WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                 THEN 1 ELSE -1 END) AS s
           FROM h CROSS JOIN range(64) t(j) GROUP BY doc_id, j)
         SELECT doc_id, simhash, substr(simhash, 1, 16) AS bucket16 FROM (
           SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
           FROM bits GROUP BY doc_id) z
         ORDER BY doc_id""",
    "mm_payload_stats" ->
      """SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         COUNT(*) AS n,
         CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
         CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes
         FROM documents GROUP BY 1 ORDER BY modality""",
    "mm_feature_extract" ->
      """SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         CAST((octet_length(encode(text)) + 63) // 64 AS BIGINT) AS n_frames,
         CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS BIGINT) AS f0,
         CAST((strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS BIGINT) AS f1
         FROM documents ORDER BY doc_id""",
    "mm_frame_sample" ->
      """WITH frames AS (
           SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
             octet_length(encode(text)) AS byte_len,
             unnest(range(0, (octet_length(encode(text)) - 1) // 64 + 1)) AS frame_no
           FROM documents)
         SELECT modality, COUNT(*) AS n_frames_sampled,
           CAST(SUM(least(64, byte_len - frame_no * 64)) AS BIGINT) AS bytes_sampled,
           COUNT(DISTINCT doc_id) AS n_docs
         FROM frames WHERE frame_no % 4 = 0
         GROUP BY modality ORDER BY modality""",
    "sim_brute_topk" ->
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
         SELECT v.vec_id, v.label,
           ROUND(CAST(list_cosine_similarity(v.embedding, q.e) AS DOUBLE), 4) AS sim
         FROM embeddings v, q WHERE v.vec_id <> 0
         ORDER BY list_cosine_similarity(v.embedding, q.e) DESC, v.vec_id
         LIMIT 10""",
    "sim_label_pairs" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2, a.label,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id
         WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.30
         ORDER BY v1, v2""",
    "sim_ann_lsh" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
                        generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) - 1)
               % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                      ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END) AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         cand AS (SELECT DISTINCT x.vec_id AS v1, y.vec_id AS v2
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         SELECT v1, v2,
           ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS sim
         FROM cand JOIN embeddings a ON v1 = a.vec_id
                   JOIN embeddings b ON v2 = b.vec_id
         ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, v1, v2
         LIMIT 20""",
    "sim_ivf_topk" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
                        generate_subscripts(embedding, 1) AS d FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         q AS (SELECT d, val AS qv FROM dims WHERE vec_id = 0),
         score AS (SELECT cent.label,
             CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
           FROM cent JOIN q USING (d) GROUP BY 1),
         probe AS (SELECT label FROM score ORDER BY s DESC, label LIMIT 2),
         qe AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
         SELECT v.vec_id, v.label,
           ROUND(CAST(list_cosine_similarity(v.embedding, qe.e) AS DOUBLE), 4) AS sim
         FROM embeddings v JOIN probe USING (label), qe
         WHERE v.vec_id <> 0
         ORDER BY list_cosine_similarity(v.embedding, qe.e) DESC, v.vec_id
         LIMIT 10""",
    "sim_pq_adc" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 3),
         ranked AS (SELECT q_id, v.vec_id AS c_id,
             list_cosine_similarity(v.embedding, q_emb) AS s,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(v.embedding, q_emb) DESC,
                        v.vec_id) AS rn
           FROM embeddings v, q WHERE v.vec_id <> q_id)
         SELECT q_id, c_id AS exact_top1,
           ROUND(CAST(s AS DOUBLE), 4) AS exact_top1_sim,
           TRUE AS pq_quality_ok
         FROM ranked WHERE rn = 1 ORDER BY q_id""",
    // composed IVF -> PQ/ADC -> exact-refine serving pipeline: the oracle
    // replays the deterministic exact side (per-query coarse probe +
    // exact top-1 within the probed cells); the PQ quality boolean is the
    // Spark side's to prove (>= 0.8x exact mass, measured ~1.0 since the
    // exact re-rank recovers ADC ordering noise)
    "sim_ivf_pq_topk" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         qd AS (SELECT vec_id AS q_id, d, val AS qv FROM dims WHERE vec_id < 3),
         score AS (SELECT q_id, cent.label,
             CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
             / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9)) * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
           FROM cent JOIN qd USING (d) GROUP BY 1, 2),
         probe AS (SELECT q_id, label FROM (
             SELECT q_id, label,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s DESC, label) AS rn
             FROM score) pr WHERE rn <= 2),
         q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 3),
         ranked AS (SELECT p.q_id, v.vec_id AS c_id,
             list_cosine_similarity(v.embedding, q.q_emb) AS s,
             ROW_NUMBER() OVER (PARTITION BY p.q_id
               ORDER BY list_cosine_similarity(v.embedding, q.q_emb) DESC,
                        v.vec_id) AS rn
           FROM embeddings v JOIN probe p USING (label)
           JOIN q ON q.q_id = p.q_id
           WHERE v.vec_id <> p.q_id)
         SELECT q_id, c_id AS ivf_top1,
           ROUND(CAST(s AS DOUBLE), 4) AS ivf_top1_sim,
           TRUE AS pipeline_quality_ok
         FROM ranked WHERE rn = 1 ORDER BY q_id""",
    "sim_batch_topk" ->
      """SELECT q_id, rk, vec_id, label,
         ROUND(CAST(sim_raw AS DOUBLE), 4) AS sim FROM (
           SELECT q.vec_id AS q_id, v.vec_id, v.label,
             list_cosine_similarity(v.embedding, q.embedding) AS sim_raw,
             CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(v.embedding, q.embedding) DESC,
                        v.vec_id) AS BIGINT) AS rk
           FROM embeddings v JOIN embeddings q
             ON v.label = q.label AND q.vec_id < 5 AND v.vec_id <> q.vec_id) t
         WHERE rk <= 3 ORDER BY q_id, rk""",
    "sim_label_centroids" ->
      """SELECT label, d,
           CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS c,
           COUNT(*) AS n_vecs
         FROM (SELECT label, unnest(embedding) AS val,
                 generate_subscripts(embedding, 1) AS d FROM embeddings) t
         WHERE d <= 8 GROUP BY label, d ORDER BY label, d""",
    "subq_scalar_corr" ->
      """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
         FROM customer c
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
               (SELECT COUNT(*) FROM customer c2
                WHERE c2.c_nationkey = c.c_nationkey)
             > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c3
                WHERE c3.c_nationkey = c.c_nationkey)
         ORDER BY c_custkey""",
    "subq_exists" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "subq_in_notin" ->
      """SELECT p_partkey, p_name
         FROM part
         WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                             WHERE l_extendedprice > 104000)
           AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
                                 WHERE l_quantity >= 50)
         ORDER BY p_partkey""",
    "subq_having" ->
      """SELECT c_custkey, c_name, CAST(t.total_dec AS DOUBLE) AS total_spent,
             t.n_orders
         FROM customer c JOIN (
           SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
                  CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY o_custkey
           HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 3500000
         ) t ON c.c_custkey = t.o_custkey
         ORDER BY c_custkey""",
    "grouping_sets_mix" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
         CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
         ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "events_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                    WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
               JOIN v ON e.user_id = v.user_id
                 AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL 3 DAY
               WHERE e.event_type = 'click' GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
               JOIN c ON e.user_id = c.user_id
                 AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 3 DAY
               WHERE e.event_type = 'purchase' GROUP BY 1)
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_view_click_purchase""",
    "events_retention" ->
      """WITH first AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
                        FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
         SELECT strftime(d0, '%Y-%m-%d') AS cohort,
                CAST(d - d0 AS BIGINT) AS day_offset,
                CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
         FROM act JOIN first USING (user_id)
         WHERE d - d0 BETWEEN 0 AND 7
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "topk_aggregator" ->
      """SELECT o_orderpriority, CAST(rk AS BIGINT) AS rk,
                o_totalprice AS price, o_orderkey AS orderkey
         FROM (SELECT o_orderpriority, o_totalprice, o_orderkey,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders) t
         WHERE rk <= 3 ORDER BY o_orderpriority, rk""",
    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS rev_7d,
         CAST(COUNT(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_7d
         FROM orders WHERE o_custkey < 200
         ORDER BY o_custkey, o_orderkey""",
    "unpivot_metrics" ->
      """WITH base AS (SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, metric, value
         FROM (UNPIVOT base ON sum_qty, sum_price, sum_disc
               INTO NAME metric VALUE value)
         ORDER BY l_returnflag, metric""",
    "text_levenshtein" ->
      """WITH fp AS (SELECT doc_id, text, md5(substr(text, 1, 64)) AS f
                     FROM documents),
         okf AS (SELECT f FROM fp GROUP BY f HAVING COUNT(*) BETWEEN 2 AND 64)
         SELECT a.doc_id AS d1, b.doc_id AS d2,
           CAST(levenshtein(substr(a.text, 1, 200), substr(b.text, 1, 200))
                AS BIGINT) AS lev
         FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id
         JOIN okf k ON k.f = a.f
         ORDER BY d1, d2""",
    "split_assign" ->
      """WITH h AS (SELECT doc_id, lang, n_chars,
           (strpos('0123456789abcdef',
              substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
              substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
         FROM documents)
         SELECT CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
                     ELSE 'test' END AS split,
           lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM h GROUP BY 1, 2 ORDER BY 1, 2""",
    "text_tfidf" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                        FROM documents),
         tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                FROM words WHERE doc_id < 50 GROUP BY 1, 2),
         df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
                FROM words GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         scored AS (SELECT t.doc_id, t.word, t.tf, d.df,
             ROUND(t.tf * ln(CAST(n.n_total AS DOUBLE) / d.df), 6) AS tfidf
           FROM tf t JOIN df d USING (word) CROSS JOIN n),
         ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, word) AS rk FROM scored)
         SELECT doc_id, word, tf, df, tfidf, CAST(rk AS BIGINT) AS rk
         FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""",
    "dedup_clusters" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node)
         SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
         FROM walk GROUP BY node ORDER BY node""",
    "graph_triangles" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         pairs AS (SELECT x.d1, x.d2 FROM inter x
           JOIN sizes s1 ON x.d1 = s1.doc_id
           JOIN sizes s2 ON x.d2 = s2.doc_id
           WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS g FROM (
             SELECT d1 AS v FROM pairs UNION ALL SELECT d2 FROM pairs)
           GROUP BY v),
         oriented AS (SELECT
             CASE WHEN (g1, d1) < (g2, d2) THEN d1 ELSE d2 END AS src,
             CASE WHEN (g1, d1) < (g2, d2) THEN d2 ELSE d1 END AS dst,
             CASE WHEN (g1, d1) < (g2, d2) THEN g2 ELSE g1 END AS gd
           FROM (SELECT p.d1, p.d2, x1.g AS g1, x2.g AS g2
             FROM pairs p JOIN deg x1 ON p.d1 = x1.v
                          JOIN deg x2 ON p.d2 = x2.v)),
         wedge AS (SELECT o1.dst AS wa, o2.dst AS wb
           FROM oriented o1 JOIN oriented o2
             ON o1.src = o2.src AND (o1.gd, o1.dst) < (o2.gd, o2.dst)),
         tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
           FROM wedge w WHERE EXISTS (SELECT 1 FROM oriented o
             WHERE o.src = w.wa AND o.dst = w.wb)),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(g * (g - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
         ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM pairs)
         SELECT st.n_nodes, ec.n_edges, st.n_wedges, tri.n_triangles,
           CASE WHEN st.n_wedges > 0
                THEN ROUND(3.0 * tri.n_triangles / st.n_wedges, 6)
                ELSE 0.0 END AS transitivity
         FROM st, ec, tri""",
    "orders_cohort_revenue" ->
      """WITH o AS (SELECT o_custkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS m0
           FROM o GROUP BY 1)
         SELECT strftime(f.m0, '%Y-%m') AS cohort,
           CAST(datediff('month', f.m0,
             date_trunc('month', o.o_orderdate)) AS BIGINT) AS m_offset,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS DOUBLE) / 100 AS revenue
         FROM o JOIN f ON o.o_custkey = f.o_custkey
         GROUP BY 1, 2 ORDER BY cohort, m_offset""",
    "orders_rfm" ->
      """WITH cust AS (SELECT o_custkey,
             date_diff('day', CAST(MAX(o_orderdate) AS DATE),
               (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
               AS recency,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
           FROM orders GROUP BY 1),
         c2 AS (SELECT *, monetary_c // 100000 AS m_band FROM cust),
         n AS (SELECT COUNT(*) AS n FROM c2),
         rc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT recency AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         rt AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM rc, n),
         fc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT frequency AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         ft AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM fc, n),
         mc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM
           (SELECT m_band AS v, COUNT(*) AS cnt FROM c2 GROUP BY 1)),
         mt AS (SELECT
             MIN(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS t25,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS t50,
             MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS t75
           FROM mc, n),
         scored AS (SELECT c2.monetary_c,
             5 - (1 + CAST(c2.recency > rt.t25 AS BIGINT)
                    + CAST(c2.recency > rt.t50 AS BIGINT)
                    + CAST(c2.recency > rt.t75 AS BIGINT)) AS r_score,
             1 + CAST(c2.frequency > ft.t25 AS BIGINT)
               + CAST(c2.frequency > ft.t50 AS BIGINT)
               + CAST(c2.frequency > ft.t75 AS BIGINT) AS f_score,
             1 + CAST(c2.m_band > mt.t25 AS BIGINT)
               + CAST(c2.m_band > mt.t50 AS BIGINT)
               + CAST(c2.m_band > mt.t75 AS BIGINT) AS m_score
           FROM c2, rt, ft, mt)
         SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(monetary_c) AS DOUBLE) / (COUNT(*) * 100), 2)
             AS avg_monetary
         FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "agg_weighted_median" ->
      """WITH hist AS (SELECT l_returnflag AS flag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT flag, price_c, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY price_c) AS cum,
             SUM(w) OVER (PARTITION BY flag) AS tot
           FROM hist)
         SELECT flag,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 3) // 4
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_p25,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 1) // 2
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_median,
           ROUND(CAST(MIN(CASE WHEN cum >= (3 * tot + 3) // 4
             THEN price_c END) AS DOUBLE) / 100.0, 2) AS w_p75,
           CAST(MAX(tot) AS DOUBLE) / 100.0 AS total_qty
         FROM c GROUP BY flag ORDER BY flag""",
    "text_hapax" ->
      """WITH tf AS (SELECT lang, token, COUNT(*) AS cnt FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS vocab_size,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hapax,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS hapax_ratio,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6)
             AS type_token_ratio
         FROM tf GROUP BY lang ORDER BY lang""",
    "graph_link_predict" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         cand AS (SELECT x.label, x.v AS a, y.v AS b,
             COUNT(*) AS common
           FROM und x JOIN und y
             ON x.label = y.label AND x.u = y.u AND x.v < y.v
           GROUP BY 1, 2, 3),
         nonadj AS (SELECT c.* FROM cand c WHERE NOT EXISTS
           (SELECT 1 FROM und e WHERE e.label = c.label
              AND e.u = c.a AND e.v = c.b)),
         deg AS (SELECT label, u, COUNT(*) AS deg FROM und GROUP BY 1, 2),
         scored AS (SELECT n.label, n.common,
             ROUND(CAST(n.common AS DOUBLE)
               / (da.deg + db.deg - n.common), 6) AS jaccard
           FROM nonadj n
           JOIN deg da ON n.label = da.label AND n.a = da.u
           JOIN deg db ON n.label = db.label AND n.b = db.u)
         SELECT label, COUNT(*) AS n_candidates,
           CAST(MAX(common) AS BIGINT) AS max_common,
           ROUND(CAST(SUM(CAST(jaccard AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_jaccard
         FROM scored GROUP BY label ORDER BY label""",
    "events_cusum" ->
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, h, n,
             COUNT(*) OVER (PARTITION BY event_type) AS t_hours,
             SUM(n) OVER (PARTITION BY event_type) AS s_tot,
             SUM(n) OVER (PARTITION BY event_type ORDER BY h) AS cum_n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS idx
           FROM hourly),
         sc AS (SELECT *,
             t_hours * cum_n - idx * s_tot AS cusum_sc FROM c),
         mx AS (SELECT *,
             MAX(abs(cusum_sc)) OVER (PARTITION BY event_type) AS maxabs
           FROM sc)
         SELECT event_type, CAST(MAX(t_hours) AS BIGINT) AS n_hours,
           CAST(MAX(s_tot) AS BIGINT) AS total_events,
           strftime(MIN(h), '%Y-%m-%d %H:%M:%S') AS changepoint_hour,
           ROUND(CAST(MAX(maxabs) AS DOUBLE) / MAX(t_hours), 4)
             AS max_abs_cusum
         FROM mx WHERE abs(cusum_sc) = maxabs
         GROUP BY event_type ORDER BY event_type""",
    "events_paths" ->
      """WITH s AS (SELECT event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e3
           FROM events),
         counts AS (SELECT event_type || '>' || e2 || '>' || e3 AS path,
             COUNT(*) AS n
           FROM s WHERE e3 IS NOT NULL GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts),
         rk AS (SELECT path, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, path) AS rk
           FROM counts)
         SELECT path, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / (SELECT tot FROM tot), 6) AS share
         FROM rk WHERE rk <= 15 ORDER BY n DESC, path""",
    "events_power_pareto" ->
      """WITH per_user AS (SELECT user_id, COUNT(*) AS v
           FROM events GROUP BY 1),
         hist AS (SELECT v, COUNT(*) AS n_users, v * COUNT(*) AS ev
           FROM per_user GROUP BY 1),
         cum AS (SELECT *,
             SUM(n_users) OVER (ORDER BY v DESC) AS cum_u,
             SUM(ev) OVER (ORDER BY v DESC) AS cum_e
           FROM hist),
         tt AS (SELECT COUNT(*) AS u_tot, CAST(SUM(v) AS BIGINT) AS e_tot
           FROM per_user),
         p AS (SELECT unnest([CAST(1 AS BIGINT), 5, 10, 25]) AS pct),
         j AS (SELECT cum.*, tt.e_tot, p.pct,
             (p.pct * tt.u_tot + 99) // 100 AS k
           FROM cum, tt, p)
         SELECT pct, CAST(k AS BIGINT) AS n_top_users,
           CAST(cum_e - ev + (k - (cum_u - n_users)) * v AS BIGINT)
             AS n_events,
           ROUND(CAST(cum_e - ev + (k - (cum_u - n_users)) * v AS DOUBLE)
             / e_tot, 6) AS share
         FROM j WHERE cum_u - n_users < k AND cum_u >= k
         ORDER BY pct""",
    "dedup_source_matrix" ->
      """WITH docs AS (SELECT md5(substr(text, 1, 64)) AS fp, doc_id,
             source
           FROM documents),
         keepers AS (SELECT fp, MIN(doc_id) AS keeper_id
           FROM docs GROUP BY 1)
         SELECT kd.source AS keeper_source, d.source AS dup_source,
           COUNT(*) AS n_dup_copies,
           CAST(COUNT(DISTINCT d.fp) AS BIGINT) AS n_texts
         FROM docs d
         JOIN keepers k ON d.fp = k.fp AND d.doc_id <> k.keeper_id
         JOIN docs kd ON kd.doc_id = k.keeper_id
         GROUP BY 1, 2 ORDER BY keeper_source, dup_source""",
    "dedup_bitext_mine" ->
      """WITH vn AS (SELECT e.vec_id, d.lang,
             list_transform(e.embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
               AS qe
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         vq AS (SELECT vec_id, lang, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT)
               AS nsq
           FROM vn),
         dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':'
                 || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1
               THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
               THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
               ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         lb AS (SELECT b.band, b.bucket, b.vec_id, vq.lang
           FROM bands b JOIN vq ON vq.vec_id = b.vec_id),
         okb AS (SELECT band, bucket FROM lb GROUP BY 1, 2
           HAVING COUNT(*) BETWEEN 2 AND 64),
         posting AS (SELECT lb.* FROM lb JOIN okb
           USING (band, bucket)),
         cand AS (SELECT DISTINCT a.lang AS lang_a, b.lang AS lang_b,
             a.vec_id AS v1, b.vec_id AS v2
           FROM posting a JOIN posting b USING (band, bucket)
           WHERE a.lang < b.lang),
         scored AS (SELECT lang_a, lang_b, v1, v2,
             CAST(CAST(list_dot_product(x.qe, y.qe) AS BIGINT)
                 AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE))
                 * sqrt(CAST(y.nsq AS DOUBLE))) AS cos
           FROM cand JOIN vq x ON x.vec_id = cand.v1
           JOIN vq y ON y.vec_id = cand.v2),
         surveyed AS (SELECT lang_a, lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs
           FROM scored GROUP BY 1, 2),
         mined AS (SELECT lang_a, lang_b,
             CAST(COUNT(*) AS BIGINT) AS n_mined_pairs,
             ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 6) AS mean_cos,
             ROUND(MAX(cos), 6) AS max_cos
           FROM scored WHERE cos >= 0.35 GROUP BY 1, 2),
         topp AS (SELECT lang_a, lang_b, v1 AS top_a, v2 AS top_b
           FROM (SELECT *, ROW_NUMBER() OVER (
               PARTITION BY lang_a, lang_b
               ORDER BY cos DESC, v1, v2) AS rk
             FROM scored WHERE cos >= 0.35) z WHERE rk = 1),
         langs AS (SELECT DISTINCT lang FROM documents),
         spine AS (SELECT a.lang AS lang_a, b.lang AS lang_b
           FROM langs a, langs b WHERE a.lang < b.lang)
         SELECT s.lang_a, s.lang_b,
           COALESCE(n_candidate_pairs, 0) AS n_candidate_pairs,
           COALESCE(n_mined_pairs, 0) AS n_mined_pairs,
           mean_cos, max_cos, top_a, top_b
         FROM spine s
         LEFT JOIN surveyed USING (lang_a, lang_b)
         LEFT JOIN mined USING (lang_a, lang_b)
         LEFT JOIN topp USING (lang_a, lang_b)
         ORDER BY s.lang_a, s.lang_b""",
    "text_coverage_curve" ->
      """WITH vocab AS (SELECT token, COUNT(*) AS cnt FROM
           (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1),
         ranked AS (SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
           FROM vocab),
         tt AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
             COUNT(*) AS vocab_size FROM vocab)
         SELECT k, COUNT(*) AS n_types,
           ROUND(CAST(SUM(cnt) AS DOUBLE) / MAX(tot), 6) AS mass_share,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(vocab_size), 6)
             AS vocab_share
         FROM ranked, tt,
           (SELECT unnest([CAST(10 AS BIGINT), 100, 1000]) AS k) ks
         WHERE rk <= k
         GROUP BY k ORDER BY k""",
    "events_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         isl AS (SELECT user_id,
             date_diff('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
           FROM days),
         runs AS (SELECT user_id, grp, COUNT(*) AS len
           FROM isl GROUP BY 1, 2),
         mx AS (SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
           FROM runs GROUP BY 1)
         SELECT max_streak, COUNT(*) AS n_users
         FROM mx GROUP BY 1 ORDER BY max_streak""",
    "events_interarrival" ->
      """WITH g AS (SELECT event_type,
             date_diff('second', LAG(ts, 1) OVER (PARTITION BY user_id,
               event_type ORDER BY ts, event_id), ts) AS gap_s
           FROM events),
         hist AS (SELECT event_type, gap_s, COUNT(*) AS cnt
           FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
         c AS (SELECT event_type, gap_s, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_s)
               AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot,
             SUM(gap_s * cnt) OVER (PARTITION BY event_type) AS wsum
           FROM hist)
         SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_gaps,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_gap_s,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END)
             AS BIGINT) AS p50_gap_s,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN gap_s END)
             AS BIGINT) AS p90_gap_s
         FROM c GROUP BY event_type ORDER BY event_type""",
    "text_lm_heldout" ->
      """WITH sp AS (SELECT lang, text,
             CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         train_tok AS (SELECT unnest(string_split(text, ' ')) AS word
           FROM sp WHERE split = 'train'),
         lm AS (SELECT word, COUNT(*) AS cw FROM train_tok
           WHERE word <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_train,
             COUNT(*) AS v_train FROM lm),
         test_tok AS (SELECT lang, w AS word FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM sp WHERE split = 'test')
           WHERE w <> ''),
         scored AS (SELECT t.lang, COALESCE(lm.cw, 0) AS cw,
             CAST(-ln(CAST(COALESCE(lm.cw, 0) + 1 AS DOUBLE)
               / (nv.n_train + nv.v_train)) AS DECIMAL(28,12)) AS nll
           FROM test_tok t LEFT JOIN lm ON t.word = lm.word, nv)
         SELECT lang, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN cw = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(CAST(SUM(CASE WHEN cw = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
         FROM scored GROUP BY lang ORDER BY lang""",
    "orders_pareto_abc" ->
      """WITH rev AS (SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev4
           FROM lineitem GROUP BY 1),
         c AS (SELECT l_partkey, rev4,
             SUM(rev4) OVER (ORDER BY rev4 DESC, l_partkey) AS cum,
             SUM(rev4) OVER () AS t
           FROM rev)
         SELECT CASE WHEN cum * 10 <= t * 7 THEN 'A'
                     WHEN cum * 10 <= t * 9 THEN 'B'
                     ELSE 'C' END AS cls,
           COUNT(*) AS n_parts,
           ROUND(CAST(SUM(rev4) AS DOUBLE) / 10000, 2) AS revenue,
           ROUND(CAST(SUM(rev4) AS DOUBLE) / CAST(MAX(t) AS DOUBLE), 6)
             AS rev_share
         FROM c GROUP BY 1 ORDER BY cls""",
    "graph_kcore" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         u0 AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         c0 AS (SELECT CAST(0 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u0 GROUP BY label),
         k1 AS (SELECT label, u FROM u0 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u1 AS (SELECT e.* FROM u0 e
           JOIN k1 a ON e.label = a.label AND e.u = a.u
           JOIN k1 b ON e.label = b.label AND e.v = b.u),
         c1 AS (SELECT CAST(1 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u1 GROUP BY label),
         k2 AS (SELECT label, u FROM u1 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u2 AS (SELECT e.* FROM u1 e
           JOIN k2 a ON e.label = a.label AND e.u = a.u
           JOIN k2 b ON e.label = b.label AND e.v = b.u),
         c2 AS (SELECT CAST(2 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u2 GROUP BY label),
         k3 AS (SELECT label, u FROM u2 GROUP BY label, u
           HAVING COUNT(*) >= 3),
         u3 AS (SELECT e.* FROM u2 e
           JOIN k3 a ON e.label = a.label AND e.u = a.u
           JOIN k3 b ON e.label = b.label AND e.v = b.u),
         c3 AS (SELECT CAST(3 AS BIGINT) AS round, label,
             CAST(COUNT(DISTINCT u) AS BIGINT) AS n_vertices,
             CAST(COUNT(*) / 2 AS BIGINT) AS n_edges
           FROM u3 GROUP BY label)
         SELECT * FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1
           UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3)
         ORDER BY round, label""",
    "events_forecast_compare" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         f AS (SELECT event_type, n,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY d) AS p1,
             LAG(n, 7) OVER (PARTITION BY event_type ORDER BY d) AS p7
           FROM daily),
         s AS (SELECT event_type, n, p1, p7 FROM f
           WHERE p1 IS NOT NULL AND p7 IS NOT NULL)
         SELECT event_type, COUNT(*) AS n_days,
           ROUND(CAST(SUM(abs(n - p1)) AS DOUBLE) / COUNT(*), 4)
             AS mae_naive,
           ROUND(CAST(SUM(abs(n - p7)) AS DOUBLE) / COUNT(*), 4)
             AS mae_seasonal,
           CASE WHEN SUM(abs(n - p7)) < SUM(abs(n - p1)) THEN 'seasonal'
                WHEN SUM(abs(n - p1)) < SUM(abs(n - p7)) THEN 'naive'
                ELSE 'tie' END AS winner
         FROM s GROUP BY event_type ORDER BY event_type""",
    "text_burstiness" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         st AS (SELECT token, CAST(SUM(c) AS BIGINT) AS total,
             COUNT(*) AS df, CAST(SUM(c * c) AS BIGINT) AS sq
           FROM tf GROUP BY 1),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         rnk AS (SELECT *, ROW_NUMBER()
             OVER (ORDER BY total DESC, token) AS rk
           FROM st)
         SELECT token, total, df,
           ROUND(CAST(total AS DOUBLE) / n_docs, 6) AS mean_c,
           ROUND((CAST(sq AS DOUBLE) / n_docs
               - (CAST(total AS DOUBLE) / n_docs)
                 * (CAST(total AS DOUBLE) / n_docs))
             / (CAST(total AS DOUBLE) / n_docs), 4) AS vmr
         FROM rnk, nd WHERE rk <= 20
         ORDER BY total DESC, token""",
    "events_uplift_did" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS tsu, value
           FROM events),
         mid AS (SELECT (MIN(tsu) + MAX(tsu)) // 2 AS mid FROM ev),
         t AS (SELECT CASE WHEN user_id % 2 = 1 THEN 'treat'
                  ELSE 'control' END AS grp,
             CAST(tsu > mid AS BIGINT) AS post, value
           FROM ev, mid)
         SELECT grp,
           CAST(SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pre,
           CAST(SUM(post) AS BIGINT) AS n_post,
           ROUND(CAST(SUM(CASE WHEN post = 0
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END), 6) AS mean_pre,
           ROUND(CAST(SUM(CASE WHEN post = 1
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
             / SUM(post), 6) AS mean_post,
           ROUND(CAST(SUM(CASE WHEN post = 1
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
               / SUM(post)
             - CAST(SUM(CASE WHEN post = 0
               THEN CAST(value AS DECIMAL(28,4)) ELSE 0 END) AS DOUBLE)
               / SUM(CASE WHEN post = 0 THEN 1 ELSE 0 END), 6) AS diff
         FROM t GROUP BY grp ORDER BY grp""",
    "events_transition_entropy" ->
      """WITH s AS (SELECT event_type AS from_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         tr AS (SELECT from_type, to_type, COUNT(*) AS n FROM s
           WHERE to_type IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM tr)
         SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total,
           COUNT(*) AS n_successors,
           ROUND(ln(CAST(SUM(n) AS DOUBLE))
             - CAST(SUM(CAST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))
                 AS DECIMAL(28,12))) AS DOUBLE) / SUM(n), 6) AS entropy,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(t), 6) AS share
         FROM tr, tot GROUP BY from_type ORDER BY from_type""",
    "text_langid_trigram" ->
      """WITH tri AS (SELECT doc_id, lang,
             unnest([substr(text, i, 3)
               for i in range(1, greatest(len(text) - 2, 0) + 1)]) AS g
           FROM documents),
         prof AS (SELECT lang AS profile_lang, g FROM (
             SELECT lang, g, ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY COUNT(*) DESC, g) AS rk
             FROM tri GROUP BY lang, g) WHERE rk <= 20),
         dt AS (SELECT DISTINCT doc_id, lang, g FROM tri),
         ov AS (SELECT d.doc_id, d.lang, p.profile_lang,
             COUNT(*) AS ov
           FROM dt d JOIN prof p ON d.g = p.g GROUP BY 1, 2, 3),
         pred AS (SELECT * FROM (SELECT *, ROW_NUMBER()
             OVER (PARTITION BY doc_id ORDER BY ov DESC, profile_lang)
               AS rk FROM ov) WHERE rk = 1),
         tt AS (SELECT lang, COUNT(*) AS lang_total FROM pred GROUP BY 1)
         SELECT p.lang AS true_lang, p.profile_lang AS pred_lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.lang_total), 6)
             AS share
         FROM pred p JOIN tt t ON p.lang = t.lang
         GROUP BY 1, 2 ORDER BY true_lang, pred_lang""",
    "events_funnel_latency" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
           WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
           JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.vt
             AND e.ts <= v.vt + INTERVAL 3 DAY
           GROUP BY 1),
         p AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
           JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.ct
             AND e.ts <= c.ct + INTERVAL 3 DAY
           GROUP BY 1),
         hops AS (
           SELECT '1_view_click' AS hop,
             date_diff('second', v.vt, c.ct) AS gap_s
           FROM c JOIN v ON c.user_id = v.user_id
           UNION ALL
           SELECT '2_click_purchase',
             date_diff('second', c.ct, p.pt)
           FROM p JOIN c ON p.user_id = c.user_id),
         hist AS (SELECT hop, gap_s, COUNT(*) AS cnt
           FROM hops GROUP BY 1, 2),
         cd AS (SELECT hop, gap_s, cnt,
             SUM(cnt) OVER (PARTITION BY hop ORDER BY gap_s) AS cum,
             SUM(cnt) OVER (PARTITION BY hop) AS tot,
             SUM(gap_s * cnt) OVER (PARTITION BY hop) AS wsum
           FROM hist)
         SELECT hop, CAST(MAX(tot) AS BIGINT) AS n_conversions,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_gap_s,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN gap_s END)
             AS BIGINT) AS p50_gap_s,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN gap_s END)
             AS BIGINT) AS p90_gap_s
         FROM cd GROUP BY hop ORDER BY hop""",
    "events_gini" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS v FROM events
           GROUP BY 1),
         hist AS (SELECT v, COUNT(*) AS c FROM pu GROUP BY 1),
         r AS (SELECT v, c,
             COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS r0
           FROM hist)
         SELECT CAST(SUM(c) AS BIGINT) AS n_users,
           CAST(SUM(v * c) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(v * (2 * c * r0 + c * (c + 1))) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(v * c) AS DOUBLE))
             - CAST(SUM(c) + 1 AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS gini
         FROM r""",
    "docs_spearman" ->
      """WITH s AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         sc AS (SELECT doc_id, n_tok,
             CAST(n_uniq AS DOUBLE) / n_tok AS score
           FROM s WHERE n_tok > 0),
         r AS (SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS r1,
             ROW_NUMBER() OVER (ORDER BY score, doc_id) AS r2
           FROM sc)
         SELECT COUNT(*) AS n_docs,
           CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
           ROUND(1.0 - 6.0 * CAST(SUM((r1 - r2) * (r1 - r2)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE)
               * (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
                 - 1.0)), 6) AS spearman
         FROM r""",
    "events_bot_detection" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_err,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM pu),
         f AS (SELECT CAST(n > days * 3 AS BIGINT) AS high_rate,
             CAST(n_err * 3 >= n AS BIGINT) AS error_heavy,
             CAST(n >= 80 AS BIGINT) AS high_volume, n
           FROM pu)
         SELECT high_rate, error_heavy, high_volume,
           COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n) AS DOUBLE) / MAX(t), 6) AS event_share
         FROM f, tot GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "text_dedup_lm_effect" ->
      """WITH sp AS (SELECT doc_id, lang, text,
             md5(substr(text, 1, 64)) AS fp,
             CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         train AS (SELECT * FROM sp WHERE split = 'train'),
         keep AS (SELECT MIN(doc_id) AS doc_id FROM train GROUP BY fp),
         ttok AS (SELECT doc_id, w AS word FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM train) WHERE w <> ''),
         dtok AS (SELECT t.* FROM ttok t
           JOIN keep k ON t.doc_id = k.doc_id),
         lmF AS (SELECT word, COUNT(*) AS cwf FROM ttok GROUP BY 1),
         lmD AS (SELECT word, COUNT(*) AS cwd FROM dtok GROUP BY 1),
         nv AS (SELECT
             (SELECT CAST(SUM(cwf) AS BIGINT) FROM lmF) AS nf,
             (SELECT COUNT(*) FROM lmF) AS vf,
             (SELECT CAST(SUM(cwd) AS BIGINT) FROM lmD) AS nd,
             (SELECT COUNT(*) FROM lmD) AS vd),
         testtok AS (SELECT lang, w AS word FROM
           (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM sp WHERE split = 'test') WHERE w <> ''),
         sc AS (SELECT t.lang,
             CAST(-ln(CAST(COALESCE(f.cwf, 0) + 1 AS DOUBLE)
               / (nv.nf + nv.vf)) AS DECIMAL(28,12)) AS nllf,
             CAST(-ln(CAST(COALESCE(d.cwd, 0) + 1 AS DOUBLE)
               / (nv.nd + nv.vd)) AS DECIMAL(28,12)) AS nlld
           FROM testtok t
           LEFT JOIN lmF f ON t.word = f.word
           LEFT JOIN lmD d ON t.word = d.word, nv)
         SELECT lang, COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(nllf) AS DOUBLE) / COUNT(*), 6)
             AS mean_nll_full,
           ROUND(CAST(SUM(nlld) AS DOUBLE) / COUNT(*), 6)
             AS mean_nll_dedup,
           ROUND(ROUND(CAST(SUM(nlld) AS DOUBLE) / COUNT(*), 6)
             - ROUND(CAST(SUM(nllf) AS DOUBLE) / COUNT(*), 6), 6)
             AS delta_nll
         FROM sc GROUP BY lang ORDER BY lang""",
    "orders_shipping_aging" ->
      """WITH j AS (SELECT o_orderpriority AS priority,
             date_diff('day', CAST(o_orderdate AS DATE),
               CAST(l_shipdate AS DATE)) AS age_d
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         hist AS (SELECT priority, age_d, COUNT(*) AS cnt
           FROM j GROUP BY 1, 2),
         cd AS (SELECT *,
             SUM(cnt) OVER (PARTITION BY priority ORDER BY age_d) AS cum,
             SUM(cnt) OVER (PARTITION BY priority) AS tot,
             SUM(age_d * cnt) OVER (PARTITION BY priority) AS wsum
           FROM hist)
         SELECT priority, CAST(MAX(tot) AS BIGINT) AS n_lines,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / MAX(tot), 2) AS mean_age_d,
           CAST(MIN(CASE WHEN cum >= (tot + 1) // 2 THEN age_d END)
             AS BIGINT) AS p50_age_d,
           CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN age_d END)
             AS BIGINT) AS p90_age_d
         FROM cd GROUP BY priority ORDER BY priority""",
    "text_bigram_llr" ->
      """WITH words AS (SELECT string_split(text, ' ') AS t
           FROM documents),
         bi AS (SELECT t[i] AS w1, t[i + 1] AS w2
           FROM words, unnest(range(1, greatest(len(t), 1))) u(i)),
         bc AS (SELECT w1, w2, COUNT(*) AS a FROM bi GROUP BY 1, 2),
         fr AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS r1
           FROM bi GROUP BY 1),
         sc AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c1
           FROM bi GROUP BY 1),
         nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM bi),
         j AS (SELECT bc.w1, bc.w2, bc.a, fr.r1, sc.c1, nb.nn,
             fr.r1 - bc.a AS k12, sc.c1 - bc.a AS k21,
             nb.nn - fr.r1 - sc.c1 + bc.a AS k22
           FROM bc JOIN fr ON bc.w1 = fr.w1
                   JOIN sc ON bc.w2 = sc.w2, nb
           WHERE bc.a >= 5)
         SELECT w1, w2, CAST(a AS BIGINT) AS n_pair,
           ROUND(2.0 * (
             (CASE WHEN a > 0 THEN CAST(a AS DOUBLE)
                * ln((CAST(a AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(r1 AS DOUBLE) * CAST(c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)
                * ln((CAST(k12 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)
                * ln((CAST(k21 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(nn - r1 AS DOUBLE) * CAST(c1 AS DOUBLE)))
                ELSE 0.0 END)
           + (CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)
                * ln((CAST(k22 AS DOUBLE) * CAST(nn AS DOUBLE))
                  / (CAST(nn - r1 AS DOUBLE) * CAST(nn - c1 AS DOUBLE)))
                ELSE 0.0 END)), 4) AS llr
         FROM j ORDER BY llr DESC, w1, w2 LIMIT 25""",
    "dedup_asymmetry" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         v AS (SELECT x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id),
         b AS (SELECT CAST(i * 2 >= n1 + n2 - i AS BIGINT) AS jac_high,
             CAST(i * 5 >= LEAST(n1, n2) * 4 AS BIGINT) AS cont_high,
             CAST(CAST(LEAST(n1, n2) AS DOUBLE)
               / GREATEST(n1, n2) AS DECIMAL(18,9)) AS size_ratio
           FROM v)
         SELECT jac_high, cont_high, COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(size_ratio) AS DOUBLE) / COUNT(*), 4)
             AS avg_size_ratio
         FROM b GROUP BY 1, 2 ORDER BY jac_high, cont_high""",
    "events_stickiness" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         daily AS (SELECT date_trunc('week', d) AS week,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(dau) AS BIGINT) AS sum_dau FROM
           (SELECT d, COUNT(*) AS dau FROM ud GROUP BY 1)
           GROUP BY 1),
         weekly AS (SELECT week, COUNT(*) AS wau FROM
           (SELECT DISTINCT date_trunc('week', d) AS week, user_id
            FROM ud) GROUP BY 1)
         SELECT strftime(daily.week, '%Y-%m-%d') AS week,
           n_days, wau,
           ROUND(CAST(sum_dau AS DOUBLE) / n_days, 2) AS avg_dau,
           ROUND(CAST(sum_dau AS DOUBLE) / (n_days * wau), 6)
             AS stickiness
         FROM daily JOIN weekly ON daily.week = weekly.week
         ORDER BY week""",
    "sim_contrastive_pairs" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         pos AS (SELECT label,
             CAST(COUNT(*) AS BIGINT) AS n_pos,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 4) AS avg_pos
           FROM (SELECT label, sim, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 1 GROUP BY label),
         nn AS (SELECT COUNT(*) AS n FROM embeddings),
         neg AS (SELECT a.label,
             CAST(COUNT(*) AS BIGINT) AS n_neg,
             ROUND(CAST(SUM(CAST(CAST(
               list_cosine_similarity(a.embedding, b.embedding)
               AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
               AS avg_neg
           FROM embeddings a CROSS JOIN nn
           JOIN embeddings b ON b.vec_id = (a.vec_id * 7 + 13) % nn.n
           WHERE a.label <> b.label
           GROUP BY a.label)
         SELECT p.label, p.n_pos, p.avg_pos, g.n_neg, g.avg_neg,
           ROUND(p.avg_pos - g.avg_neg, 4) AS gap
         FROM pos p JOIN neg g ON p.label = g.label
         ORDER BY p.label""",
    "sim_mips_augment" ->
      """WITH xq AS (SELECT vec_id, j,
             CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
           FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS j,
                   unnest(embedding) AS x
                 FROM embeddings)),
         q AS (SELECT vec_id AS qid FROM embeddings
           ORDER BY vec_id LIMIT 3),
         qc AS (SELECT q.qid, x.j, x.xq AS qx
           FROM xq x JOIN q ON x.vec_id = q.qid),
         dots AS (SELECT c.qid, x.vec_id, SUM(c.qx * x.xq) AS dot
           FROM xq x JOIN qc c ON x.j = c.j
           WHERE x.vec_id <> c.qid GROUP BY 1, 2),
         norms AS (SELECT vec_id, SUM(xq * xq) AS nsq
           FROM xq GROUP BY 1),
         m AS (SELECT MAX(nsq) AS m2 FROM norms),
         ra AS (SELECT qid, vec_id, dot, ROW_NUMBER() OVER
             (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rk
           FROM dots),
         rb AS (SELECT d.qid, d.vec_id, ROW_NUMBER() OVER
             (PARTITION BY d.qid ORDER BY
               CAST(d.dot AS DOUBLE) /
                 (sqrt(CAST(dn.nsq AS DOUBLE)
                    + sqrt(CAST(m.m2 - dn.nsq AS DOUBLE))
                      * sqrt(CAST(m.m2 - dn.nsq AS DOUBLE)))
                  * sqrt(CAST(n2.nsq AS DOUBLE))) DESC, d.vec_id) AS rk
           FROM dots d
           JOIN norms n2 ON d.qid = n2.vec_id
           JOIN norms dn ON d.vec_id = dn.vec_id, m),
         agree AS (SELECT a.qid, CAST(COUNT(*) AS BIGINT) AS n_agree
           FROM ra a JOIN rb b
             ON a.qid = b.qid AND a.vec_id = b.vec_id AND b.rk <= 10
           WHERE a.rk <= 10 GROUP BY 1),
         t1 AS (SELECT qid, vec_id AS top1_vec,
             ROUND(CAST(dot AS DOUBLE) / 1e12, 6) AS top1_ip
           FROM ra WHERE rk = 1)
         SELECT g.qid, g.n_agree, t1.top1_vec, t1.top1_ip
         FROM agree g JOIN t1 ON g.qid = t1.qid ORDER BY g.qid""",
    "text_stopword_discovery" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         st AS (SELECT token, CAST(SUM(c) AS BIGINT) AS total,
             COUNT(*) AS df, CAST(SUM(c * c) AS BIGINT) AS sq
           FROM tf GROUP BY 1),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT token, df,
           ROUND(CAST(df AS DOUBLE) / n_docs, 4) AS df_share,
           ROUND(CAST(total AS DOUBLE) / n_docs, 6) AS mean_c,
           ROUND((CAST(sq AS DOUBLE) / n_docs
               - (CAST(total AS DOUBLE) / n_docs)
                 * (CAST(total AS DOUBLE) / n_docs))
             / (CAST(total AS DOUBLE) / n_docs), 4) AS vmr
         FROM st, nd WHERE df * 2 >= n_docs
         ORDER BY df DESC, token""",
    "events_reach_curve" ->
      """WITH fd AS (SELECT user_id, event_type, MIN(CAST(ts AS DATE))
             AS d
           FROM events GROUP BY 1, 2),
         daily AS (SELECT event_type, d, COUNT(*) AS n_new
           FROM fd GROUP BY 1, 2),
         tot AS (SELECT event_type, COUNT(*) AS t FROM fd GROUP BY 1)
         SELECT daily.event_type, strftime(d, '%Y-%m-%d') AS day,
           CAST(n_new AS BIGINT) AS n_new,
           CAST(SUM(n_new) OVER (PARTITION BY daily.event_type
             ORDER BY d) AS BIGINT) AS cum_users,
           ROUND(CAST(SUM(n_new) OVER (PARTITION BY daily.event_type
             ORDER BY d) AS DOUBLE) / tot.t, 6) AS reach_share
         FROM daily JOIN tot ON daily.event_type = tot.event_type
         ORDER BY daily.event_type, day""",
    "graph_assortativity" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
           UNION SELECT label, v2, v1 FROM knn),
         deg AS (SELECT label, u, COUNT(*) AS deg FROM und GROUP BY 1, 2),
         s AS (SELECT e.label, COUNT(*) AS n,
             CAST(SUM(a.deg) AS BIGINT) AS sx,
             CAST(SUM(b.deg) AS BIGINT) AS sy,
             CAST(SUM(a.deg * b.deg) AS BIGINT) AS sxy,
             CAST(SUM(a.deg * a.deg) AS BIGINT) AS sxx,
             CAST(SUM(b.deg * b.deg) AS BIGINT) AS syy
           FROM und e
           JOIN deg a ON e.label = a.label AND e.u = a.u
           JOIN deg b ON e.label = b.label AND e.v = b.u
           GROUP BY 1)
         SELECT label, n AS n_edges,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy
                  - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
         FROM s ORDER BY label""",
    "orders_repeat_latency" ->
      """WITH ranked AS (SELECT o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rk
           FROM orders),
         pc AS (SELECT o_custkey, COUNT(*) AS n2,
             date_diff('day', CAST(MIN(o_orderdate) AS DATE),
               CAST(MAX(o_orderdate) AS DATE)) AS gap_d
           FROM ranked WHERE rk <= 2 GROUP BY 1),
         tt AS (SELECT COUNT(*) AS n_customers,
             CAST(SUM(CASE WHEN n2 = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat
           FROM pc),
         hist AS (SELECT gap_d, COUNT(*) AS cnt FROM pc
           WHERE n2 = 2 GROUP BY 1),
         cd AS (SELECT gap_d, cnt,
             SUM(cnt) OVER (ORDER BY gap_d) AS cum FROM hist)
         SELECT MAX(tt.n_customers) AS n_customers,
           MAX(tt.n_repeat) AS n_repeat,
           ROUND(CAST(MAX(tt.n_repeat) AS DOUBLE)
             / MAX(tt.n_customers), 6) AS repeat_rate,
           ROUND(CAST(SUM(gap_d * cnt) AS DOUBLE) / MAX(tt.n_repeat), 2)
             AS mean_days,
           CAST(MIN(CASE WHEN cum >= (tt.n_repeat + 1) // 2
             THEN gap_d END) AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cum * 10 >= tt.n_repeat * 9
             THEN gap_d END) AS BIGINT) AS p90_days
         FROM cd, tt""",
    "sim_hnsw_levels" ->
      """WITH lv AS (SELECT CASE WHEN b = 0 THEN 8
             WHEN b % 2 = 1 THEN 0 WHEN b % 4 = 2 THEN 1
             WHEN b % 8 = 4 THEN 2 WHEN b % 16 = 8 THEN 3
             WHEN b % 32 = 16 THEN 4 WHEN b % 64 = 32 THEN 5
             WHEN b % 128 = 64 THEN 6 ELSE 7 END AS level
           FROM (SELECT (strpos('0123456789abcdef',
                    substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 2, 1))
                    - 1) AS b
                 FROM embeddings)),
         hist AS (SELECT CAST(level AS BIGINT) AS level,
             CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lv GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_nodes) AS BIGINT) AS t FROM hist)
         SELECT level, n_nodes,
           ROUND(CAST(n_nodes AS DOUBLE) / (SELECT t FROM tot), 4)
             AS share,
           ROUND(CASE WHEN level = 8 THEN 0.00390625
             ELSE 1.0 / pow(2.0, level + 1) END, 4) AS expected_share,
           CAST(SUM(n_nodes) OVER (ORDER BY level DESC) AS BIGINT)
             AS layer_size
         FROM hist ORDER BY level""",
    "dedup_shingle_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh3 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz3 AS (SELECT doc_id, COUNT(*) AS n FROM sh3 GROUP BY 1),
         ok3 AS (SELECT s FROM sh3 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p3 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh3 a JOIN sh3 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok3 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz3 s1 ON x.d1 = s1.doc_id
           JOIN sz3 s2 ON x.d2 = s2.doc_id),
         sh5 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 5
                  THEN [array_to_string(w[i:i+4], ' ')
                        for i in range(1, len(w)-3)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz5 AS (SELECT doc_id, COUNT(*) AS n FROM sh5 GROUP BY 1),
         ok5 AS (SELECT s FROM sh5 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p5 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh5 a JOIN sh5 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok5 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz5 s1 ON x.d1 = s1.doc_id
           JOIN sz5 s2 ON x.d2 = s2.doc_id),
         sh7 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sz7 AS (SELECT doc_id, COUNT(*) AS n FROM sh7 GROUP BY 1),
         ok7 AS (SELECT s FROM sh7 GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 64),
         p7 AS (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2,
             CAST(CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i)
               AS DECIMAL(18,9)) AS jac
           FROM (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                 FROM sh7 a JOIN sh7 b
                   ON a.s = b.s AND a.doc_id < b.doc_id
                 JOIN ok7 f ON f.s = a.s
                 GROUP BY 1, 2) x
           JOIN sz7 s1 ON x.d1 = s1.doc_id
           JOIN sz7 s2 ON x.d2 = s2.doc_id),
         u AS (SELECT CAST(3 AS BIGINT) AS k, d1, d2, jac FROM p3
           UNION ALL SELECT 5, d1, d2, jac FROM p5
           UNION ALL SELECT 7, d1, d2, jac FROM p7),
         e AS (SELECT k, d1 AS doc, jac FROM u
           UNION ALL SELECT k, d2, jac FROM u)
         SELECT k, CAST(COUNT(*) / 2 AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_docs_flagged,
           ROUND(CAST(SUM(jac) AS DOUBLE) / COUNT(*), 4) AS avg_jaccard
         FROM e GROUP BY k ORDER BY k""",
    "events_type_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         sizes AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
         pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
         SELECT type_a, type_b, CAST(n_both AS BIGINT) AS n_both,
           ROUND(CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both), 6)
             AS jaccard
         FROM pairs
         JOIN sizes sa ON type_a = sa.event_type
         JOIN sizes sb ON type_b = sb.event_type
         ORDER BY type_a, type_b""",
    "sim_jl_projection" ->
      """WITH xq AS (SELECT vec_id, j,
             CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS xq
           FROM (SELECT vec_id,
                   generate_subscripts(embedding, 1) - 1 AS j,
                   unnest(embedding) AS x
                 FROM embeddings)),
         dims AS (SELECT DISTINCT j FROM xq),
         rmat AS (SELECT r.r, d.j,
             CASE WHEN (strpos('0123456789abcdef', substr(
                 md5('jl:' || CAST(r.r AS VARCHAR) || ':'
                   || CAST(d.j AS VARCHAR)), 1, 1)) - 1) % 2 = 0
               THEN 1 ELSE -1 END AS s
           FROM (SELECT unnest(range(0, 16)) AS r) r, dims d),
         proj AS (SELECT x.vec_id, m.r, SUM(m.s * x.xq) AS p
           FROM xq x JOIN rmat m ON x.j = m.j GROUP BY 1, 2),
         nn AS (SELECT COUNT(*) AS n FROM embeddings),
         pairs AS (SELECT e.vec_id AS v1,
             (e.vec_id * 7 + 13) % nn.n AS v2
           FROM embeddings e CROSS JOIN nn
           WHERE e.vec_id <> (e.vec_id * 7 + 13) % nn.n),
         od AS (SELECT p.v1,
             SUM((a.xq - b.xq) * (a.xq - b.xq)) AS od2
           FROM pairs p
           JOIN xq a ON a.vec_id = p.v1
           JOIN xq b ON b.vec_id = p.v2 AND b.j = a.j
           GROUP BY 1),
         pd AS (SELECT p.v1,
             SUM((a.p - b.p) * (a.p - b.p)) AS pd2
           FROM pairs p
           JOIN proj a ON a.vec_id = p.v1
           JOIN proj b ON b.vec_id = p.v2 AND b.r = a.r
           GROUP BY 1),
         ratios AS (SELECT CAST(pd.pd2 AS DOUBLE)
             / (CAST(od.od2 AS DOUBLE) * 16) AS ratio
           FROM od JOIN pd ON od.v1 = pd.v1)
         SELECT COUNT(*) AS n_pairs,
           ROUND(CAST(SUM(CAST(ratio AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 4) AS mean_ratio,
           ROUND(MIN(ratio), 4) AS min_ratio,
           ROUND(MAX(ratio), 4) AS max_ratio,
           ROUND(CAST(SUM(CASE WHEN abs(ratio - 1.0) <= 0.2 THEN 1
             ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS share_within_20pct
         FROM ratios""",
    "events_heatmap" ->
      """WITH cells AS (SELECT isodow(ts) AS isodow,
             CAST(hour(ts) AS BIGINT) AS hr, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells)
         SELECT CAST(isodow AS BIGINT) AS isodow, hr,
           CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE) / (SELECT t FROM tot), 6) AS share
         FROM cells ORDER BY isodow, hr""",
    "text_extractive_pick" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         nd AS (SELECT COUNT(*) AS n FROM documents),
         df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok GROUP BY 1),
         sc AS (SELECT t.doc_id, (t.i - 1) // 15 AS pidx,
             CAST(ln(CAST(nd.n AS DOUBLE) / df.df) AS DECIMAL(28,12))
               AS idf
           FROM tok t JOIN df ON t.w = df.w, nd WHERE t.doc_id < 20),
         ch AS (SELECT doc_id, pidx, COUNT(*) AS n_words,
             CAST(SUM(idf) AS DOUBLE) / COUNT(*) AS raw
           FROM sc GROUP BY 1, 2),
         rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY raw DESC, pidx) AS rk FROM ch)
         SELECT doc_id, CAST(pidx AS BIGINT) AS chunk_idx,
           CAST(n_words AS BIGINT) AS n_words, ROUND(raw, 6) AS score
         FROM rk WHERE rk = 1 ORDER BY doc_id""",
    "docs_gate_overlap" ->
      """WITH s AS (SELECT doc_id, text, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         t AS (SELECT doc_id, md5(text) AS fp_exact,
             CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ')
                        for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ')
                           for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM bg)),
         f AS (SELECT t.doc_id, t.fp_exact, t.n_tok,
             (t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS q_fail,
             (COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10
                 > COALESCE(tr.n_tri, 0) * 3) AS rep_fail,
             (cont.doc_id IS NOT NULL) AS contam
           FROM t LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id)
             LEFT JOIN cont ON t.doc_id = cont.doc_id),
         k AS (SELECT fp_exact, MIN(doc_id) AS keeper_id FROM f
           GROUP BY 1)
         SELECT CAST(f.q_fail AS BIGINT) AS g_qual,
           CAST(f.rep_fail AS BIGINT) AS g_rep,
           CAST(f.doc_id <> k.keeper_id AS BIGINT) AS g_dup,
           CAST(f.contam AS BIGINT) AS g_contam,
           COUNT(*) AS n_docs, CAST(SUM(f.n_tok) AS BIGINT) AS n_tokens
         FROM f JOIN k USING (fp_exact)
         GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""",
    "events_new_returning" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         fd AS (SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY 1)
         SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN d <> d0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning,
           ROUND(CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS new_share
         FROM ev JOIN fd USING (user_id)
         GROUP BY d ORDER BY day""",
    "join_asof_tolerance" ->
      """WITH w AS (SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
           FROM events),
         p AS (SELECT
             date_diff('second', prev_view_ts, ts) AS gap_back,
             date_diff('second', ts, next_view_ts) AS gap_fwd
           FROM w WHERE event_type = 'purchase'),
         o AS (SELECT
             CASE WHEN gap_back <= 1800 AND (gap_fwd IS NULL
                    OR gap_fwd > 1800 OR gap_back <= gap_fwd)
                  THEN 'before'
                  WHEN gap_fwd <= 1800 THEN 'after'
                  ELSE 'none' END AS outcome,
             CASE WHEN gap_back <= 1800 AND (gap_fwd IS NULL
                    OR gap_fwd > 1800 OR gap_back <= gap_fwd)
                  THEN gap_back
                  WHEN gap_fwd <= 1800 THEN gap_fwd END AS gap_s
           FROM p)
         SELECT outcome, COUNT(*) AS n_purchases,
           CASE WHEN SUM(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END)
                  > 0
             THEN ROUND(CAST(SUM(COALESCE(gap_s, 0)) AS DOUBLE)
               / SUM(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END), 2)
           END AS mean_gap_s
         FROM o GROUP BY 1 ORDER BY outcome""",
    "stream_sessionize_stateful" ->
      """WITH sess AS (SELECT user_id, sid, COUNT(*) AS n FROM (
           SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, event_id,
                 LAG(ts) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
           GROUP BY user_id, sid)
         SELECT user_id, COUNT(*) AS n_sessions,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(MAX(n) AS BIGINT) AS max_session_events
         FROM sess GROUP BY user_id ORDER BY user_id""",
    "window_ntile" ->
      """WITH rev AS (SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
               AS revenue
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY 1)
         SELECT n_name, ROUND(revenue, 2) AS revenue,
           CAST(NTILE(4) OVER (ORDER BY revenue DESC, n_name) AS BIGINT)
             AS quartile
         FROM rev ORDER BY quartile, revenue DESC, n_name""",
    "agg_bitwise" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(BIT_AND(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS all_bits,
         CAST(BIT_OR(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS any_bits,
         CAST(BIT_XOR(CAST(l_linenumber AS BIGINT)) AS BIGINT)
           AS parity_bits,
         CAST(SUM(bit_count(CAST(l_linenumber AS BIGINT))) AS BIGINT)
           AS total_popcount
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "dedup_threshold_impact" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         v AS (SELECT x.d2, x.i, s1.n AS n1, s2.n AS n2
               FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                            JOIN sizes s2 ON x.d2 = s2.doc_id),
         ts AS (SELECT unnest([CAST(3 AS BIGINT), 5, 7]) AS t10),
         dropped AS (SELECT DISTINCT ts.t10, v.d2 AS doc_id
           FROM v CROSS JOIN ts
           WHERE v.i * 10 >= ts.t10 * (v.n1 + v.n2 - v.i)),
         toks AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         tot AS (SELECT COUNT(*) AS nd, CAST(SUM(n_tok) AS BIGINT) AS nt
           FROM toks)
         SELECT ROUND(CAST(t10 AS DOUBLE) / 10, 1) AS threshold,
           COUNT(*) AS n_dropped_docs,
           CAST(SUM(n_tok) AS BIGINT) AS dropped_tokens,
           ROUND(CAST(SUM(n_tok) AS DOUBLE)
             / (SELECT nt FROM tot), 6) AS token_share_dropped
         FROM dropped JOIN toks USING (doc_id)
         GROUP BY t10 ORDER BY threshold""",
    "orders_qoq_growth" ->
      """WITH q AS (SELECT c_mktsegment,
             date_trunc('quarter', o_orderdate) AS qtr,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
         g AS (SELECT c_mktsegment, qtr, rev_c,
             LAG(rev_c, 1) OVER (PARTITION BY c_mktsegment
               ORDER BY qtr) AS prev_c
           FROM q)
         SELECT c_mktsegment, strftime(qtr, '%Y-%m-%d') AS quarter,
           ROUND(CAST(rev_c AS DOUBLE) / 100, 2) AS revenue,
           CASE WHEN prev_c IS NOT NULL THEN
             ROUND((CAST(rev_c AS DOUBLE) - CAST(prev_c AS DOUBLE))
               / CAST(prev_c AS DOUBLE), 6) END AS qoq_growth
         FROM g ORDER BY c_mktsegment, quarter""",
    "sim_cluster_validity" ->
      """WITH dims AS (SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM embeddings),
         cent AS (SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT label AS cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY label, d)
           GROUP BY cid),
         sc AS (SELECT e.vec_id, e.label,
             MAX(CASE WHEN c.cid = e.label THEN
               list_cosine_similarity(e.embedding, c.cemb) END) AS own,
             MAX(CASE WHEN c.cid <> e.label THEN
               list_cosine_similarity(e.embedding, c.cemb) END)
               AS best_other
           FROM embeddings e CROSS JOIN cent c GROUP BY 1, 2)
         SELECT label, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(CAST(own AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 4) AS avg_own,
           ROUND(CAST(SUM(CAST(CAST(best_other AS DOUBLE)
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4) AS avg_other,
           ROUND(ROUND(CAST(SUM(CAST(CAST(own AS DOUBLE)
               AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
             - ROUND(CAST(SUM(CAST(CAST(best_other AS DOUBLE)
               AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4), 4)
             AS margin,
           ROUND(CAST(SUM(CASE WHEN best_other > own THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 4) AS share_confused
         FROM sc GROUP BY label ORDER BY label""",
    "events_session_value" ->
      """WITH s AS (SELECT user_id, ts, event_id, value,
             CASE WHEN lag_ts IS NULL
                       OR epoch_us(ts) - epoch_us(lag_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
           FROM (SELECT user_id, ts, event_id, value,
                   LAG(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS lag_ts
                 FROM events) a),
         sess AS (SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid,
             value
           FROM s),
         sv AS (SELECT user_id, sid,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_c
           FROM sess GROUP BY 1, 2),
         tt AS (SELECT COUNT(*) AS ns, CAST(SUM(value_c) AS BIGINT)
             AS vc FROM sv),
         hist AS (SELECT value_c // 100 AS value_d, COUNT(*) AS cnt
           FROM sv GROUP BY 1),
         cd AS (SELECT value_d, cnt,
             SUM(cnt) OVER (ORDER BY value_d) AS cum FROM hist)
         SELECT MAX(tt.ns) AS n_sessions,
           ROUND(CAST(MAX(tt.vc) AS DOUBLE) / (MAX(tt.ns) * 100), 2)
             AS mean_value,
           CAST(MIN(CASE WHEN cum >= (tt.ns + 1) // 2 THEN value_d END)
             AS BIGINT) AS p50_value_d,
           CAST(MIN(CASE WHEN cum * 10 >= tt.ns * 9 THEN value_d END)
             AS BIGINT) AS p90_value_d
         FROM cd, tt""",
    "events_value_dist" ->
      """WITH hist AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v_c, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         cd AS (SELECT event_type, v_c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY v_c) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS tot,
             SUM(v_c * cnt) OVER (PARTITION BY event_type) AS wsum
           FROM hist)
         SELECT event_type, CAST(MAX(tot) AS BIGINT) AS n_events,
           ROUND(CAST(MAX(wsum) AS DOUBLE) / (MAX(tot) * 100), 4)
             AS mean_value,
           ROUND(CAST(MIN(CASE WHEN cum >= (tot + 1) // 2
             THEN v_c END) AS DOUBLE) / 100, 2) AS p50_value,
           ROUND(CAST(MIN(CASE WHEN cum * 10 >= tot * 9
             THEN v_c END) AS DOUBLE) / 100, 2) AS p90_value,
           ROUND(CAST(MIN(CASE WHEN cum * 100 >= tot * 99
             THEN v_c END) AS DOUBLE) / 100, 2) AS p99_value
         FROM cd GROUP BY event_type ORDER BY event_type""",
    "dq_freshness" ->
      """WITH u AS (SELECT 'events' AS table_name, MAX(ts) AS mx
             FROM events
           UNION ALL SELECT 'orders', MAX(o_orderdate) FROM orders),
         nw AS (SELECT MAX(mx) AS newest FROM u)
         SELECT table_name,
           strftime(mx, '%Y-%m-%d %H:%M:%S') AS watermark,
           CAST((epoch_us(newest) // 1000000
             - epoch_us(mx) // 1000000) // 3600 AS BIGINT) AS lag_hours
         FROM u, nw ORDER BY table_name""",
    "events_conversion_by_activity" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS n,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
           FROM events GROUP BY 1)
         SELECT CASE WHEN n < 8 THEN 'a_lt8' WHEN n < 16 THEN 'b_8_15'
             WHEN n < 32 THEN 'c_16_31' WHEN n < 64 THEN 'd_32_63'
             ELSE 'e_64plus' END AS band,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
             AS conversion_rate
         FROM pu GROUP BY 1 ORDER BY band""",
    "orders_basket_profile" ->
      """WITH po AS (SELECT o_orderkey, COUNT(*) AS n_lines,
             MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS price_c
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1)
         SELECT CAST(n_lines AS BIGINT) AS n_lines,
           price_c // 5000000 AS value_band,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(price_c) AS DOUBLE) / (COUNT(*) * 100), 2)
             AS avg_value
         FROM po GROUP BY 1, 2 ORDER BY n_lines, value_band""",
    "events_attribution_touch" ->
      """WITH t AS (SELECT event_type,
             COALESCE(first_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'none') AS ft,
             COALESCE(last_value(CASE WHEN event_type <> 'purchase'
                 THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'none') AS lt
           FROM events),
         p AS (SELECT ft, lt FROM t WHERE event_type = 'purchase'),
         f AS (SELECT ft AS channel, COUNT(*) AS fc FROM p GROUP BY 1),
         l AS (SELECT lt AS channel, COUNT(*) AS lc FROM p GROUP BY 1)
         SELECT COALESCE(f.channel, l.channel) AS channel,
           CAST(COALESCE(f.fc, 0) AS BIGINT) AS first_touch_credits,
           CAST(COALESCE(l.lc, 0) AS BIGINT) AS last_touch_credits
         FROM f FULL OUTER JOIN l ON f.channel = l.channel
         ORDER BY channel""",
    "events_wow_growth" ->
      """WITH weekly AS (SELECT event_type,
             date_trunc('week', ts) AS wk, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, wk, n,
             LAG(n, 1) OVER (PARTITION BY event_type ORDER BY wk)
               AS prev
           FROM weekly)
         SELECT event_type, strftime(wk, '%Y-%m-%d') AS week,
           CAST(n AS BIGINT) AS n,
           CASE WHEN prev IS NOT NULL THEN
             ROUND(CAST(n - prev AS DOUBLE) / prev, 6) END AS wow_growth
         FROM g ORDER BY event_type, week""",
    "text_ttr_curve" ->
      """WITH d AS (SELECT
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         b AS (SELECT CASE WHEN n_tok < 32 THEN 'a_lt32'
               WHEN n_tok < 64 THEN 'b_32_63'
               WHEN n_tok < 128 THEN 'c_64_127'
               WHEN n_tok < 256 THEN 'd_128_255'
               ELSE 'e_256plus' END AS band,
             n_tok,
             CAST(CAST(n_uniq AS DOUBLE) / n_tok AS DECIMAL(18,9))
               AS ttr
           FROM d WHERE n_tok > 0)
         SELECT band, COUNT(*) AS n_docs,
           ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 2) AS mean_len,
           ROUND(CAST(SUM(ttr) AS DOUBLE) / COUNT(*), 6) AS mean_ttr
         FROM b GROUP BY 1 ORDER BY band""",
    "dedup_hot_shingles" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh3 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sh5 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 5
                  THEN [array_to_string(w[i:i+4], ' ')
                        for i in range(1, len(w)-3)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         sh7 AS (SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS s FROM words),
         df0 AS (SELECT COUNT(*) AS df
           FROM (SELECT md5(substr(text, 1, 64)) AS s FROM documents) f0
           GROUP BY s HAVING COUNT(*) > 1),
         df3 AS (SELECT COUNT(*) AS df FROM sh3 GROUP BY s HAVING COUNT(*) > 1),
         df5 AS (SELECT COUNT(*) AS df FROM sh5 GROUP BY s HAVING COUNT(*) > 1),
         df7 AS (SELECT COUNT(*) AS df FROM sh7 GROUP BY s HAVING COUNT(*) > 1),
         u AS (
           SELECT CAST(0 AS BIGINT) AS k, df FROM df0
           UNION ALL SELECT 3, df FROM df3
           UNION ALL SELECT 5, df FROM df5
           UNION ALL SELECT 7, df FROM df7)
         SELECT k, COUNT(*) AS n_shared_shingles,
           COALESCE(MAX(df), 0) AS max_df,
           CAST(COALESCE(SUM(CAST(df > 64 AS BIGINT)), 0) AS BIGINT)
             AS n_hot_shingles,
           CAST(COALESCE(SUM(CASE WHEN df > 64 THEN df ELSE 0 END), 0)
             AS BIGINT) AS postings_dropped,
           CAST(COALESCE(SUM(CASE WHEN df > 64
             THEN (df * (df - 1)) // 2 ELSE 0 END), 0) AS BIGINT)
             AS pairs_avoided
         FROM u GROUP BY k ORDER BY k""",
    "dedup_cc_agreement" ->
      """WITH RECURSIVE directed AS (SELECT a.label, a.vec_id AS v1,
             b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         edges AS (SELECT v1 AS a, v2 AS b FROM knn
           UNION SELECT v2, v1 FROM knn),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cc AS (SELECT node, MIN(lbl) AS lbl FROM walk GROUP BY node),
         szs AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz
           FROM cc GROUP BY lbl)
         SELECT sz AS cluster_size,
           COUNT(*) AS n_clusters_prop,
           COUNT(*) AS n_clusters_star,
           CAST(0 AS BIGINT) AS n_label_mismatches
         FROM szs GROUP BY sz ORDER BY cluster_size""",
    "sample_reservoir" ->
      """WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('rsv:' || CAST(doc_id AS VARCHAR)) AS pr
           FROM documents),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY pr, doc_id) AS rk FROM d)
         SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_tok
         FROM r WHERE rk <= 20 ORDER BY source, rk""",
    // stream_reservoir: maintained streaming state must equal the
    // one-shot batch sample — identical oracle to sample_reservoir
    "stream_reservoir" ->
      """WITH d AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             md5('rsv:' || CAST(doc_id AS VARCHAR)) AS pr
           FROM documents),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY pr, doc_id) AS rk FROM d)
         SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_tok
         FROM r WHERE rk <= 20 ORDER BY source, rk""",
    "text_lm_interp" ->
      """WITH s AS (SELECT doc_id, text, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         tbg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cbi FROM
             (SELECT w[i] AS w1, w[i + 1] AS w2
              FROM (SELECT w, unnest(generate_series(1,
                  CAST(len(w) - 1 AS INT))) AS i
                FROM s WHERE split = 'train' AND len(w) >= 2) z)
           GROUP BY 1, 2),
         tu AS (SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS cu FROM
             (SELECT unnest(w) AS tok FROM s WHERE split = 'train') q
           WHERE tok <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cu) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train FROM tu),
         teb AS (SELECT w[i] AS w1, w[i + 1] AS w2
           FROM (SELECT w, unnest(generate_series(1,
               CAST(len(w) - 1 AS INT))) AS i
             FROM s WHERE split = 'test' AND len(w) >= 2) z2),
         lam AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT)
           AS lambda_pct),
         terms AS (SELECT l.lambda_pct,
             CAST(-ln(CAST(l.lambda_pct AS DOUBLE) / 100 *
                 (CASE WHEN COALESCE(u1.cu, 0) > 0
                       THEN CAST(COALESCE(b.cbi, 0) AS DOUBLE) / u1.cu
                       ELSE 0 END)
               + (1 - CAST(l.lambda_pct AS DOUBLE) / 100) *
                 (CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE)
                   / (nv.n_train + nv.v_train)))
               AS DECIMAL(28,12)) AS nll
           FROM teb t
           LEFT JOIN tbg b ON t.w1 = b.w1 AND t.w2 = b.w2
           LEFT JOIN tu u1 ON t.w1 = u1.w
           LEFT JOIN tu u2 ON t.w2 = u2.w
           CROSS JOIN nv CROSS JOIN lam l)
         SELECT lambda_pct, COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll
         FROM terms GROUP BY 1 ORDER BY 1""",
    "docs_gate_kappa" ->
      """WITH s AS (SELECT doc_id, source, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         t AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ')
                        for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ')
                        for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         f AS (SELECT t.source,
             CAST((t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS BIGINT) AS gq,
             CAST((COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10
                 > COALESCE(tr.n_tri, 0) * 3) AS BIGINT) AS gr
           FROM t LEFT JOIN mb USING (doc_id)
             LEFT JOIN tr USING (doc_id)),
         cells AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN gq = 0 AND gr = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(SUM(CASE WHEN gq = 0 AND gr = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(SUM(CASE WHEN gq = 1 AND gr = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(SUM(CASE WHEN gq = 1 AND gr = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS d
           FROM f GROUP BY 1),
         x AS (SELECT *,
             CAST(a + b AS DECIMAL(38,0)) * CAST(a + c AS DECIMAL(38,0))
               + CAST(c + d AS DECIMAL(38,0))
                 * CAST(b + d AS DECIMAL(38,0)) AS pe_num
           FROM cells)
         SELECT source, n_docs, a AS n_pass_both, b AS n_rep_only,
           c AS n_qual_only, d AS n_flag_both,
           CASE WHEN CAST(n_docs AS DECIMAL(38,0))
                  * CAST(n_docs AS DECIMAL(38,0)) <> pe_num
                THEN ROUND(CAST(CAST(n_docs AS DECIMAL(38,0))
                    * CAST(a + d AS DECIMAL(38,0)) - pe_num AS DOUBLE)
                  / CAST(CAST(n_docs AS DECIMAL(38,0))
                    * CAST(n_docs AS DECIMAL(38,0)) - pe_num AS DOUBLE),
                  6)
           END AS kappa
         FROM x ORDER BY source""",
    "docs_ccnet_buckets" ->
      """WITH s AS (SELECT doc_id, lang, text,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         tu AS (SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS cw FROM
             (SELECT unnest(string_split(text, ' ')) AS tok FROM s
              WHERE split = 'train') q
           WHERE tok <> '' GROUP BY 1),
         nv AS (SELECT CAST(SUM(cw) AS BIGINT) AS n_train,
             CAST(COUNT(*) AS BIGINT) AS v_train FROM tu),
         terms AS (SELECT t.doc_id, t.lang,
             CAST(-ln(CAST(COALESCE(tu.cw, 0) + 1 AS DOUBLE)
               / (nv.n_train + nv.v_train)) AS DECIMAL(28,12)) AS nll
           FROM (SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS w FROM s) t
           LEFT JOIN tu ON t.w = tu.w CROSS JOIN nv
           WHERE t.w <> ''),
         pd AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tok,
             SUM(nll) AS nll_sum
           FROM terms GROUP BY 1, 2),
         pdm AS (SELECT *, CAST(nll_sum AS DOUBLE) / n_tok AS mean_nll
           FROM pd),
         rk AS (SELECT doc_id, CAST(ROW_NUMBER() OVER
             (ORDER BY mean_nll, doc_id) AS BIGINT) AS rk FROM pdm),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pdm)
         SELECT lang,
           CASE WHEN rk.rk * 3 <= tot.n THEN 'a_head'
                WHEN rk.rk * 3 <= tot.n * 2 THEN 'b_middle'
                ELSE 'c_tail' END AS bucket,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(nll_sum) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS mean_nll
         FROM pdm JOIN rk USING (doc_id), tot
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "text_contamination_sweep" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         tt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok
           FROM s WHERE split = 'train'),
         tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS nt FROM tt),
         b7 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 7
                  THEN [array_to_string(w[i:i+6], ' ')
                        for i in range(1, len(w)-5)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c7 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 7
                     THEN [array_to_string(w[i:i+6], ' ')
                           for i in range(1, len(w)-5)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b7)),
         r7 AS (SELECT CAST(7 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c7 JOIN tt USING (doc_id)),
         b13 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c13 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ')
                           for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b13)),
         r13 AS (SELECT CAST(13 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c13 JOIN tt USING (doc_id)),
         b20 AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 20
                  THEN [array_to_string(w[i:i+19], ' ')
                        for i in range(1, len(w)-18)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         c20 AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 20
                     THEN [array_to_string(w[i:i+19], ' ')
                           for i in range(1, len(w)-18)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM b20)),
         r20 AS (SELECT CAST(20 AS BIGINT) AS n_gram,
             CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
             CAST(COALESCE(SUM(tt.n_tok), 0) AS BIGINT) AS contam_tokens
           FROM c20 JOIN tt USING (doc_id))
         SELECT n_gram, n_contam_docs, contam_tokens,
           ROUND(CAST(contam_tokens AS DOUBLE)
             / (SELECT CAST(nt AS DOUBLE) FROM tot), 6) AS token_share
         FROM (SELECT * FROM r7 UNION ALL SELECT * FROM r13
               UNION ALL SELECT * FROM r20) u
         ORDER BY n_gram""",
    "dedup_soft_weights" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cc AS (SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
           FROM walk GROUP BY node),
         sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csz
           FROM cc GROUP BY 1),
         d AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         wd AS (SELECT d.source, d.n_tok,
             COALESCE(sz.csz, 1) AS szw,
             CAST(CAST(d.n_tok AS DOUBLE) / COALESCE(sz.csz, 1)
               AS DECIMAL(28,12)) AS eff
           FROM d LEFT JOIN cc USING (doc_id)
             LEFT JOIN sz USING (cluster_id))
         SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN szw > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clustered,
           CAST(SUM(n_tok) AS BIGINT) AS raw_tokens,
           ROUND(CAST(SUM(eff) AS DOUBLE), 4) AS effective_tokens,
           ROUND(1 - CAST(SUM(eff) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS discount
         FROM wd GROUP BY 1 ORDER BY source""",
    "sim_quant_sweep" ->
      """WITH xq AS (SELECT vec_id,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x
                 FROM embeddings) t),
         mx AS (SELECT vec_id, MAX(abs(xq)) AS ma FROM xq GROUP BY 1),
         bt AS (SELECT CAST(unnest([4, 6, 8]) AS BIGINT) AS bits),
         e AS (SELECT bits, abs(xq.xq) AS axq, mx.ma,
             (CAST(1 AS BIGINT) << CAST(bits - 1 AS INT)) - 1 AS levels
           FROM xq JOIN mx USING (vec_id) CROSS JOIN bt
           WHERE mx.ma > 0),
         e2 AS (SELECT bits, axq,
             axq - (((((axq * levels) // ma) * ma) // levels)) AS err
           FROM e)
         SELECT bits, CAST(COUNT(*) AS BIGINT) AS n_lanes,
           CAST(MAX(err) AS BIGINT) AS max_err_micro,
           ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 4)
             AS mean_err_micro
         FROM e2 GROUP BY 1 ORDER BY bits""",
    "dedup_semdedup" ->
      """WITH q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
           FROM embeddings),
         n AS (SELECT vec_id, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nsq
           FROM q),
         seeds AS (SELECT vec_id AS sid, qe AS se, nsq AS sn
           FROM n ORDER BY vec_id LIMIT 8),
         sims AS (SELECT e.vec_id, s.sid,
             CAST(list_dot_product(e.qe, s.se) AS DOUBLE)
               / (sqrt(CAST(e.nsq AS DOUBLE)) * sqrt(CAST(s.sn AS DOUBLE)))
               AS sim
           FROM n e CROSS JOIN seeds s),
         asg AS (SELECT vec_id, sid AS cid FROM (
             SELECT vec_id, sid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, sid) AS rn FROM sims) WHERE rn = 1),
         members AS (SELECT n.vec_id, a.cid, n.qe, n.nsq
           FROM n JOIN asg a USING (vec_id)),
         pairs AS (SELECT x.cid, x.vec_id AS v1, y.vec_id AS v2,
             CAST(list_dot_product(x.qe, y.qe) AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE)) * sqrt(CAST(y.nsq AS DOUBLE)))
               AS c
           FROM members x JOIN members y
             ON x.cid = y.cid AND x.vec_id < y.vec_id),
         fl AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs,
             CAST(COUNT(DISTINCT v2) AS BIGINT) AS n_pruned,
             ROUND(MAX(c), 6) AS max_cos
           FROM pairs WHERE c >= 0.35 GROUP BY 1),
         mem AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members
           FROM asg GROUP BY 1)
         SELECT mem.cid, n_members,
           COALESCE(n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(n_pruned, 0) AS n_pruned,
           COALESCE(max_cos, 0.0) AS max_cos,
           ROUND(1 - CAST(COALESCE(n_pruned, 0) AS DOUBLE)
             / CAST(n_members AS DOUBLE), 6) AS keep_rate
         FROM mem LEFT JOIN fl USING (cid) ORDER BY cid""",
    "graph_modularity" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2 AS (SELECT SUM(w) AS tw FROM sym),
         internal AS (SELECT ca.community,
             SUM(s.w) AS in_w
           FROM sym s JOIN comm ca ON s.node = ca.node
             JOIN comm cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc AS (SELECT c.community,
             CAST(COUNT(*) AS BIGINT) AS n_nodes, SUM(d.dw) AS deg_w
           FROM (SELECT node, SUM(w) AS dw FROM sym GROUP BY 1) d
             JOIN comm c USING (node)
           GROUP BY 1)
         SELECT degc.community, n_nodes,
           CAST(COALESCE(in_w, 0) AS BIGINT) AS in_w,
           CAST(deg_w AS BIGINT) AS deg_w,
           ROUND(CAST(COALESCE(in_w, 0) AS DOUBLE) / CAST(tw AS DOUBLE)
             - (CAST(deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               * (CAST(deg_w AS DOUBLE) / CAST(tw AS DOUBLE)), 6)
             AS contribution
         FROM degc LEFT JOIN internal USING (community) CROSS JOIN m2
         ORDER BY community""",
    // graph_louvain: the modularity oracle's edge/labelProp chain, then
    // one synchronous Louvain gain round replayed with the identical
    // double expression shape (exact DECIMAL operands on both sides)
    "graph_louvain" ->
      """WITH edges AS MATERIALIZED (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS MATERIALIZED (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS MATERIALIZED (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS MATERIALIZED (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS MATERIALIZED (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2x AS MATERIALIZED (SELECT SUM(w) AS tw FROM sym),
         degn AS MATERIALIZED (SELECT node, SUM(w) AS ki FROM sym GROUP BY 1),
         degc AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS degw
           FROM degn d JOIN comm c USING (node) GROUP BY 1),
         kic AS MATERIALIZED (SELECT s.node, cb.community AS cand, SUM(s.w) AS kc
           FROM sym s JOIN comm cb ON s.nbr = cb.node
           WHERE s.nbr <> s.node GROUP BY 1, 2),
         base AS MATERIALIZED (SELECT c.node, c.community AS cur, d.ki,
             COALESCE(ka.kc, 0) AS kia, dca.degw AS dega
           FROM comm c JOIN degn d USING (node)
           LEFT JOIN kic ka ON ka.node = c.node
             AND ka.cand = c.community
           JOIN degc dca ON dca.community = c.community),
         gains AS MATERIALIZED (SELECT b.node, b.cur, k.cand,
             2.0 * (CAST(k.kc AS DOUBLE) - CAST(b.kia AS DOUBLE))
               / CAST(tw AS DOUBLE)
             - 2.0 * CAST(b.ki AS DOUBLE) * (CAST(b.ki AS DOUBLE)
                 + CAST(dcb.degw AS DOUBLE) - CAST(b.dega AS DOUBLE))
               / (CAST(tw AS DOUBLE) * CAST(tw AS DOUBLE)) AS gain
           FROM base b JOIN kic k ON k.node = b.node AND k.cand <> b.cur
           JOIN degc dcb ON dcb.community = k.cand
           CROSS JOIN m2x),
         best AS MATERIALIZED (SELECT node, cand, gain FROM (
             SELECT node, cand, gain, ROW_NUMBER() OVER (
               PARTITION BY node ORDER BY gain DESC, cand) AS rn
             FROM gains) g WHERE rn = 1),
         comm2 AS MATERIALIZED (SELECT c.node,
             CASE WHEN bm.gain > 0 THEN bm.cand
                  ELSE c.community END AS community,
             c.community AS cur
           FROM comm c LEFT JOIN best bm ON bm.node = c.node),
         internal1 AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
           FROM sym s JOIN comm ca ON s.node = ca.node
           JOIN comm cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc1 AS MATERIALIZED (SELECT c.community, CAST(COUNT(*) AS BIGINT)
             AS n_nodes, SUM(d.ki) AS deg_w
           FROM degn d JOIN comm c USING (node) GROUP BY 1),
         conts1 AS MATERIALIZED (SELECT dc.community,
             CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE)
                 / CAST(tw AS DOUBLE)
               - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
                 * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               AS DECIMAL(28,12)) AS contrib
           FROM degc1 dc LEFT JOIN internal1 i USING (community)
           CROSS JOIN m2x),
         internal2 AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
           FROM sym s JOIN comm2 ca ON s.node = ca.node
           JOIN comm2 cb ON s.nbr = cb.node
           WHERE ca.community = cb.community GROUP BY 1),
         degc2 AS MATERIALIZED (SELECT c.community, CAST(COUNT(*) AS BIGINT)
             AS n_nodes, SUM(d.ki) AS deg_w
           FROM degn d JOIN comm2 c USING (node) GROUP BY 1),
         conts2 AS MATERIALIZED (SELECT dc.community, dc.n_nodes,
             COALESCE(i.in_w, 0) AS in_w, dc.deg_w,
             CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE)
                 / CAST(tw AS DOUBLE)
               - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
                 * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               AS DECIMAL(28,12)) AS contrib
           FROM degc2 dc LEFT JOIN internal2 i USING (community)
           CROSS JOIN m2x),
         movers AS (SELECT community, CAST(COUNT(*) AS BIGINT)
             AS n_moved_in
           FROM comm2 WHERE community <> cur GROUP BY 1),
         gsum AS (SELECT COALESCE(SUM(CAST(gain AS DECIMAL(28,12))),
             0) AS gain_sum
           FROM best WHERE gain > 0)
         SELECT c2.community, c2.n_nodes,
           COALESCE(mv.n_moved_in, 0) AS n_moved_in,
           CAST(c2.in_w AS BIGINT) AS in_w,
           CAST(c2.deg_w AS BIGINT) AS deg_w,
           ROUND(CAST(c2.contrib AS DOUBLE), 6) AS contribution,
           ROUND((SELECT CAST(SUM(contrib) AS DOUBLE) FROM conts1), 6)
             AS q_before,
           ROUND((SELECT CAST(SUM(contrib) AS DOUBLE) FROM conts2), 6)
             AS q_after,
           ROUND((SELECT CAST(gain_sum AS DOUBLE) FROM gsum), 6)
             AS gain_sum
         FROM conts2 c2 LEFT JOIN movers mv USING (community)
         ORDER BY community""",
    "events_survival_km" ->
      """WITH w AS (SELECT MIN(ts) + INTERVAL 7 DAY AS wend FROM events),
         users AS (SELECT user_id,
             CAST(MIN(ts) AS DATE) AS f0,
             CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS DATE) AS p0,
             CAST(MAX(wend) AS DATE) AS wd
           FROM events, w WHERE ts < wend GROUP BY 1),
         obs AS (SELECT user_id,
             CAST(CASE WHEN p0 IS NOT NULL THEN date_diff('day', f0, p0)
                  ELSE date_diff('day', f0, wd) END AS BIGINT) AS t,
             (p0 IS NOT NULL) AS ev
           FROM users),
         hist AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM obs GROUP BY 1),
         risk AS (SELECT t, n_obs, d,
             SUM(n_obs) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_at_risk
           FROM hist),
         km AS (SELECT t, n_obs, d, n_at_risk,
             1.0 - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS factor
           FROM risk WHERE d > 0)
         SELECT t AS t_day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
           d AS n_deaths, n_obs - d AS n_censored_here,
           ROUND(factor, 6) AS factor,
           CASE WHEN MAX(CASE WHEN factor = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) = 1 THEN 0.0
             ELSE ROUND(exp(SUM(ln(factor)) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
           END AS survival
         FROM km ORDER BY t_day""",
    "stream_decontaminate" ->
      """WITH s AS (SELECT doc_id, source, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ')
                        for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         tr AS (SELECT doc_id, w,
             CAST(substr(source, 4, 8) AS INT) AS sn,
             CAST(len(w) AS BIGINT) AS n_tok
           FROM s WHERE split = 'train'),
         contam AS (SELECT DISTINCT doc_id FROM (
             SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 13
                    THEN [array_to_string(w[i:i+12], ' ')
                          for i in range(1, len(w)-11)]
                    ELSE []::VARCHAR[] END)) AS g
             FROM tr) tz
           WHERE g IN (SELECT g FROM bg)),
         flagged AS (SELECT tr.doc_id, tr.sn, tr.n_tok,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
           FROM tr LEFT JOIN contam c USING (doc_id)),
         inc AS (SELECT CASE WHEN sn < 10 THEN 1 ELSE 2 END AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(hit) AS BIGINT) AS n_contam_docs,
             CAST(SUM(hit * n_tok) AS BIGINT) AS contam_tokens,
             CAST(SUM((1 - hit) * n_tok) AS BIGINT) AS clean_tokens
           FROM flagged GROUP BY 1),
         fold AS (SELECT CAST(0 AS BIGINT) AS increment,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(n_contam_docs) AS BIGINT) AS n_contam_docs,
             CAST(SUM(contam_tokens) AS BIGINT) AS contam_tokens,
             CAST(SUM(clean_tokens) AS BIGINT) AS clean_tokens
           FROM inc)
         SELECT CAST(increment AS BIGINT) AS increment, n_docs,
           n_contam_docs, contam_tokens, clean_tokens,
           ROUND(CAST(contam_tokens AS DOUBLE)
             / CAST(contam_tokens + clean_tokens AS DOUBLE), 6)
             AS contam_share
         FROM (SELECT * FROM inc UNION ALL SELECT * FROM fold) u
         ORDER BY increment""",
    "text_readability" ->
      """WITH wd AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
           FROM documents),
         syl AS (SELECT doc_id, source,
             GREATEST(1, len(regexp_extract_all(w, '[aeiouy]+'))) AS s
           FROM wd WHERE length(w) > 0),
         pd AS (SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(s) AS BIGINT) AS ns,
             CAST(SUM(CASE WHEN s >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS nc
           FROM syl GROUP BY 1, 2),
         sc AS (SELECT source, nw, ns, nc,
             CAST(nw AS DOUBLE) / CAST((nw + 14) // 15 AS DOUBLE) AS wps,
             CAST(ns AS DOUBLE) / CAST(nw AS DOUBLE) AS spw
           FROM pd)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS n_words,
           CAST(SUM(ns) AS BIGINT) AS n_syllables,
           ROUND(CAST(SUM(nc) AS DOUBLE) / CAST(SUM(nw) AS DOUBLE), 6)
             AS pct_complex,
           ROUND(CAST(SUM(CAST(0.39 * wps + 11.8 * spw - 15.59
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4) AS mean_fk_grade,
           ROUND(CAST(SUM(CAST(206.835 - 1.015 * wps - 84.6 * spw
             AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 4)
             AS mean_flesch_ease
         FROM sc GROUP BY 1 ORDER BY source""",
    "text_kneser_ney" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         ttok AS (SELECT doc_id, unnest(w) AS word,
             generate_subscripts(w, 1) AS pos FROM s WHERE split = 'train'),
         tbi AS (SELECT a.word AS w1, b.word AS w2
           FROM ttok a JOIN ttok b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM tbi GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1pf FROM c12 GROUP BY 1),
         cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1pb
           FROM c12 GROUP BY 1),
         types AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM c12),
         etok AS (SELECT doc_id, unnest(w) AS word,
             generate_subscripts(w, 1) AS pos FROM s WHERE split = 'test'),
         ebi AS (SELECT a.word AS w1, b.word AS w2
           FROM etok a JOIN etok b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         ev AS (SELECT e.w1, e.w2, c12.c12, ctx.c1, ctx.n1pf,
             CAST(COALESCE(cont.n1pb, 0) AS DOUBLE) / CAST(tt AS DOUBLE)
               AS pcont
           FROM ebi e LEFT JOIN c12 ON e.w1 = c12.w1 AND e.w2 = c12.w2
             LEFT JOIN ctx ON e.w1 = ctx.w1
             LEFT JOIN cont ON e.w2 = cont.w2
             CROSS JOIN types),
         scored AS (SELECT
             CASE WHEN COALESCE(c12, 0) > 0 THEN 'known_pair'
                  WHEN c1 IS NOT NULL THEN 'known_context'
                  ELSE 'unknown_context' END AS bucket,
             CASE WHEN c1 IS NOT NULL THEN
                 GREATEST(CAST(COALESCE(c12, 0) AS DOUBLE) - 0.75, 0.0)
                   / CAST(c1 AS DOUBLE)
                 + ((0.75 * CAST(n1pf AS DOUBLE)) / CAST(c1 AS DOUBLE))
                   * pcont
               ELSE pcont END AS p
           FROM ev)
         SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6)
             AS mean_kn_prob,
           ROUND(MAX(p), 6) AS max_kn_prob
         FROM scored GROUP BY 1 ORDER BY bucket""",
    "events_segment_migration" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         w1 AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n1
           FROM events, t0 WHERE ts < t0 + INTERVAL 7 DAY GROUP BY 1),
         w2 AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n2
           FROM events, t0
           WHERE ts >= t0 + INTERVAL 7 DAY AND ts < t0 + INTERVAL 14 DAY
           GROUP BY 1),
         aligned AS (SELECT
             CASE WHEN n1 IS NULL THEN 'absent'
                  WHEN n1 >= 18 THEN 'high'
                  WHEN n1 >= 14 THEN 'mid' ELSE 'low' END AS seg_w1,
             CASE WHEN n2 IS NULL THEN 'absent'
                  WHEN n2 >= 18 THEN 'high'
                  WHEN n2 >= 14 THEN 'mid' ELSE 'low' END AS seg_w2
           FROM w1 FULL OUTER JOIN w2 USING (user_id)),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM aligned)
         SELECT seg_w1, seg_w2, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(COUNT(*) AS DOUBLE)
             / (SELECT CAST(n_total AS DOUBLE) FROM tot), 6) AS share
         FROM aligned GROUP BY 1, 2 ORDER BY seg_w1, seg_w2""",
    "mm_scene_cuts" ->
      """WITH v AS (SELECT doc_id, text FROM documents
           WHERE doc_id % 3 = 2 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 64 AS f,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM v) u),
         fr AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS inten
           FROM b GROUP BY 1, 2),
         d AS (SELECT doc_id, f, inten,
             abs(inten - lag(inten) OVER (PARTITION BY doc_id ORDER BY f))
               AS delta
           FROM fr),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN delta >= 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cuts,
             CAST(MAX(COALESCE(delta, 0)) AS BIGINT) AS max_delta
           FROM d GROUP BY 1)
         SELECT doc_id, n_frames, n_cuts, n_cuts + 1 AS n_scenes,
           ROUND(CAST(n_frames AS DOUBLE) / CAST(n_cuts + 1 AS DOUBLE), 4)
             AS mean_scene_len,
           max_delta
         FROM pd ORDER BY doc_id""",
    "stream_anomaly" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CASE WHEN ts < t0 + INTERVAL 15 DAY THEN 1 ELSE 2 END AS inc,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM events, t0 GROUP BY 1, 2, 3),
         st1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS ssq
           FROM daily WHERE inc = 1 GROUP BY 1),
         r1 AS (SELECT CAST(1 AS BIGINT) AS increment, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(0 AS BIGINT) AS n_flagged
           FROM daily WHERE inc = 1 GROUP BY 2),
         sc2 AS (SELECT d.event_type, d.x, st1.n, st1.s, st1.ssq
           FROM daily d LEFT JOIN st1 USING (event_type) WHERE d.inc = 2),
         r2 AS (SELECT CAST(2 AS BIGINT) AS increment, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN n IS NOT NULL AND
                 (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
                   > 4 * (CAST(n AS HUGEINT) * ssq
                     - CAST(s AS HUGEINT) * s)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
           FROM sc2 GROUP BY 2)
         SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
         ORDER BY increment, event_type""",
    "text_compression_ratio" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
         base AS (SELECT doc_id, source,
             CAST(GREATEST(len(w) - 3, 0) AS BIGINT) AS total
           FROM d),
         uq AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS uniq FROM (
             SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 4
                    THEN [array_to_string(w[i:i+3], ' ')
                          for i in range(1, len(w)-2)]
                    ELSE []::VARCHAR[] END)) AS g
             FROM d) t GROUP BY 1),
         j AS (SELECT base.source, base.total,
             COALESCE(uq.uniq, 0) AS uniq
           FROM base LEFT JOIN uq USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN total = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_short,
           CAST(SUM(total) AS BIGINT) AS total_grams,
           CAST(SUM(uniq) AS BIGINT) AS uniq_grams,
           ROUND(CAST(SUM(CASE WHEN total > 0 THEN
               CAST(CAST(uniq AS DOUBLE) / CAST(total AS DOUBLE)
                 AS DECIMAL(18,9)) END) AS DOUBLE)
             / SUM(CASE WHEN total > 0 THEN 1 ELSE 0 END), 6) AS mean_ratio,
           CAST(SUM(CASE WHEN total > 0 AND uniq * 10 < total * 3
             THEN 1 ELSE 0 END) AS BIGINT) AS n_compressible
         FROM j GROUP BY 1 ORDER BY source""",
    "sim_recall_curve" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
             embedding AS q_emb
           FROM embeddings WHERE vec_id < 5),
         brute AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rb
           FROM embeddings, q WHERE vec_id <> q_id),
         blocked AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rl
           FROM embeddings e JOIN q ON e.label = q.q_label
           WHERE vec_id <> q_id),
         ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
         hits AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM brute b JOIN blocked bl
             ON b.q_id = bl.q_id AND b.vec_id = bl.vec_id
           CROSS JOIN ks
           WHERE b.rb <= k AND bl.rl <= k GROUP BY 1)
         SELECT ks.k, COALESCE(n_hits, 0) AS n_hits,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE)
             / CAST(ks.k * 5 AS DOUBLE), 6) AS recall
         FROM ks LEFT JOIN hits ON ks.k = hits.k
         ORDER BY ks.k""",
    "mix_temperature" ->
      """WITH pl AS (SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS nt FROM pl),
         sh AS (SELECT lang, n_tokens,
             CAST(n_tokens AS DOUBLE) / CAST(nt AS DOUBLE) AS share
           FROM pl, tot),
         al AS (SELECT unnest([0.3, 0.5, 0.7, 1.0]) AS alpha),
         p AS (SELECT alpha, lang, n_tokens, share,
             pow(share, alpha) AS pa FROM sh CROSS JOIN al),
         z AS (SELECT alpha,
             CAST(SUM(CAST(pa AS DECIMAL(28,12))) AS DOUBLE) AS z
           FROM p GROUP BY 1)
         SELECT p.alpha, lang, n_tokens, ROUND(share, 6) AS share,
           ROUND(pa / z, 6) AS temp_weight,
           ROUND(pa / z / share, 4) AS boost
         FROM p JOIN z USING (alpha) ORDER BY alpha, lang""",
    "docs_uncertainty_sample" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
           FROM tf JOIN lab USING (doc_id) GROUP BY j),
         s AS (SELECT tf.doc_id,
             CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
           FROM tf LEFT JOIN g USING (j) GROUP BY 1)
         SELECT d.doc_id, d.lang, d.source,
           abs(m2000) AS abs_m2000,
           ROUND(CAST(m2000 AS DOUBLE) / 2000.0, 6) AS margin
         FROM s JOIN documents d USING (doc_id)
         ORDER BY abs_m2000, d.doc_id LIMIT 20""",
    "basket_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_orders
                FROM li GROUP BY 1),
         no AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM li),
         p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS n_co
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         st AS (SELECT p1, p2, n_co, c1.item_orders AS c1,
                  c2.item_orders AS c2, n_orders
                FROM p JOIN ic c1 ON p.p1 = c1.l_partkey
                       JOIN ic c2 ON p.p2 = c2.l_partkey, no),
         dr AS (SELECT p1 AS ante, p2 AS cons, n_co, c1 AS c_ante,
                  c2 AS c_cons, n_orders FROM st
                UNION ALL
                SELECT p2, p1, n_co, c2, c1, n_orders FROM st)
         SELECT ante, cons, n_co AS support,
           ROUND(CAST(n_co AS DOUBLE) / CAST(c_ante AS DOUBLE), 6)
             AS confidence,
           ROUND(CAST(n_co AS DOUBLE) * n_orders / (c_ante * c_cons), 6)
             AS lift,
           ROUND(CAST(n_co AS DOUBLE) / CAST(n_orders AS DOUBLE)
             - (CAST(c_ante AS DOUBLE) / CAST(n_orders AS DOUBLE))
               * (CAST(c_cons AS DOUBLE) / CAST(n_orders AS DOUBLE)), 6)
             AS leverage
         FROM dr ORDER BY confidence DESC, ante, cons LIMIT 20""",
    "events_funnel_sweep" -> {
      val blocks = Seq(("06h", "6 HOUR"), ("1d", "1 DAY"), ("3d", "3 DAY"))
        .map { case (lbl, iv) =>
          s"""SELECT '$lbl' AS win,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM c_$lbl) AS n_click,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM p_$lbl) AS n_purchase"""
        }.mkString("\n           UNION ALL ")
      val ctes = Seq(("06h", "6 HOUR"), ("1d", "1 DAY"), ("3d", "3 DAY"))
        .map { case (lbl, iv) =>
          s""",
         c_$lbl AS (SELECT e.user_id, MIN(e.ts) AS ct FROM events e
               JOIN v ON e.user_id = v.user_id
                 AND e.ts > v.vt AND e.ts <= v.vt + INTERVAL $iv
               WHERE e.event_type = 'click' GROUP BY 1),
         p_$lbl AS (SELECT e.user_id, MIN(e.ts) AS pt FROM events e
               JOIN c_$lbl c ON e.user_id = c.user_id
                 AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL $iv
               WHERE e.event_type = 'purchase' GROUP BY 1)"""
        }.mkString
      s"""WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
                    WHERE event_type = 'view' GROUP BY 1)$ctes
         SELECT win, n_view, n_click, n_purchase,
           ROUND(CASE WHEN n_view > 0 THEN CAST(n_click AS DOUBLE)
             / CAST(n_view AS DOUBLE) END, 6) AS click_rate,
           ROUND(CASE WHEN n_click > 0 THEN CAST(n_purchase AS DOUBLE)
             / CAST(n_click AS DOUBLE) END, 6) AS purchase_rate
         FROM ($blocks) u ORDER BY win"""
    },
    "sim_ivf_balance" ->
      """WITH dims AS (SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
           FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*) AS c
           FROM dims GROUP BY 1, 2),
         pv AS (SELECT vec_id, dims.label,
             SUM(CAST((CAST(v AS DOUBLE) - c) * (CAST(v AS DOUBLE) - c)
               AS DECIMAL(28,12))) AS d2
           FROM dims JOIN cent ON dims.label = cent.label
             AND dims.d = cent.d
           GROUP BY 1, 2),
         cells AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(d2) AS DOUBLE) / COUNT(*) AS dist
           FROM pv GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(n_vecs * n_vecs) AS BIGINT) AS ss
           FROM cells)
         SELECT label, n_vecs,
           ROUND(CAST(n_vecs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS share,
           ROUND(dist, 6) AS mean_sq_dist,
           ROUND(CAST(nc AS DOUBLE) * CAST(ss AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS imbalance
         FROM cells, tot ORDER BY label""",
    "docs_probe_cv" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         dims AS (SELECT tf.doc_id, label, tf.doc_id % 2 AS fold, j, x
           FROM tf JOIN lab USING (doc_id)),
         g2f AS (SELECT fold, j,
             CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2f
           FROM dims GROUP BY 1, 2),
         g2a AS (SELECT j, CAST(SUM(g2f) AS BIGINT) AS g2a
           FROM g2f GROUP BY 1),
         m AS (SELECT fold, doc_id, label,
             CAST(SUM(x * (g2a - g2f.g2f)) AS BIGINT) AS margin
           FROM dims JOIN g2f USING (fold, j) JOIN g2a USING (j)
           GROUP BY 1, 2, 3),
         bv AS (SELECT fold, margin,
             CAST(SUM(label) AS BIGINT) AS np_v,
             CAST(SUM(1 - label) AS BIGINT) AS nn_v
           FROM m GROUP BY 1, 2),
         w AS (SELECT fold, np_v, nn_v,
             COALESCE(SUM(nn_v) OVER (PARTITION BY fold ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS nn_lt
           FROM bv),
         agg AS (SELECT fold, CAST(SUM(np_v) AS BIGINT) AS n_pos,
             CAST(SUM(nn_v) AS BIGINT) AS n_neg,
             CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS BIGINT) AS u2
           FROM w GROUP BY 1),
         ts AS (SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_fold
           FROM m GROUP BY 1),
         ta AS (SELECT CAST(SUM(n_fold) AS BIGINT) AS n_all FROM ts)
         SELECT agg.fold, CAST(n_all - n_fold AS BIGINT) AS n_train,
           n_pos, n_neg, u2,
           ROUND(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
         FROM agg JOIN ts USING (fold), ta ORDER BY fold""",
    "graph_ppr" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         ew AS (SELECT src, dst, CAST(w AS DOUBLE) /
                  CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS ratio
                FROM edges),
         nodes AS (SELECT DISTINCT src AS node FROM edges
                   UNION SELECT DISTINCT dst FROM edges),
         pr0 AS (SELECT node,
             CASE WHEN node = 0 THEN 1.0 ELSE 0.0 END AS pr FROM nodes),
         c1 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr0 ON ew.src = pr0.node GROUP BY dst),
         pr1 AS (SELECT node,
             CASE WHEN node = 0 THEN 0.15 ELSE 0.0 END
               + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes LEFT JOIN c1 ON c1.dst = nodes.node),
         c2 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr1 ON ew.src = pr1.node GROUP BY dst),
         pr2 AS (SELECT node,
             CASE WHEN node = 0 THEN 0.15 ELSE 0.0 END
               + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes LEFT JOIN c2 ON c2.dst = nodes.node)
         SELECT node, n_name, ROUND(pr, 8) AS ppr
         FROM pr2 JOIN nation ON node = n_nationkey
         ORDER BY ppr DESC, node""",
    "docs_gate_ablation" ->
      """WITH scored AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
               t -> t IN ('the','a','of','and','to','in','is','for','on','with'))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
           FROM documents),
         keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                   FROM cand c JOIN sh a ON c.d1 = a.doc_id
                               JOIN sh b ON c.d2 = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         losers AS (SELECT DISTINCT v.d2 AS doc_id
                    FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                          FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                                       JOIN sizes s2 ON x.d2 = s2.doc_id) v
                    WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         flags AS (SELECT q.doc_id, n_tok,
             (n_tok >= 10 AND CAST(n_stop AS DOUBLE) / n_tok <= 0.5
               AND CAST(n_uniq AS DOUBLE) / n_tok >= 0.3) AS q_ok,
             q.doc_id IN (SELECT doc_id FROM keepers) AS e_keep,
             q.doc_id IN (SELECT doc_id FROM losers) AS n_drop
           FROM scored q)
         SELECT * FROM (
           SELECT '0_none' AS config, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens FROM flags
           UNION ALL
           SELECT '1_quality', CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN q_ok THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '2_exact', CAST(SUM(CASE WHEN e_keep THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN e_keep THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '3_neardup', CAST(SUM(CASE WHEN NOT n_drop THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN NOT n_drop THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
           UNION ALL
           SELECT '4_all', CAST(SUM(CASE WHEN q_ok AND e_keep AND NOT n_drop THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN q_ok AND e_keep AND NOT n_drop THEN n_tok ELSE 0 END) AS BIGINT) FROM flags
         ) u ORDER BY config""",
    "events_markov_eval" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         tr AS (SELECT user_id, ts, event_id, event_type FROM events, t0
                WHERE ts < t0 + INTERVAL 15 DAY),
         te AS (SELECT user_id, ts, event_id, event_type FROM events, t0
                WHERE ts >= t0 + INTERVAL 15 DAY),
         trp AS (SELECT from_type, to_type FROM (
             SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
             FROM tr) z WHERE to_type IS NOT NULL),
         model AS (SELECT from_type, to_type AS predicted FROM (
             SELECT from_type, to_type,
               ROW_NUMBER() OVER (PARTITION BY from_type
                 ORDER BY COUNT(*) DESC, to_type) AS rn
             FROM trp GROUP BY 1, 2) z WHERE rn = 1),
         tep AS (SELECT from_type, to_type FROM (
             SELECT event_type AS from_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
             FROM te) z WHERE to_type IS NOT NULL)
         SELECT tep.from_type, predicted,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
             AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
             AS DOUBLE) / COUNT(*), 6) AS accuracy
         FROM tep LEFT JOIN model USING (from_type)
         GROUP BY 1, 2 ORDER BY from_type""",
    "mm_pack_budget" ->
      """WITH t AS (SELECT
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS source,
             doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT)
               + CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 49 WHEN 1 THEN 25 ELSE 16 END
                 * ((CAST(length(text) AS BIGINT) + 63) // 64) AS n_tok
           FROM documents),
         c AS (SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t),
         pw AS (SELECT source, (cum - n_tok) // 1024 AS win,
             CAST(COUNT(*) AS BIGINT) AS docs_in_win,
             SUM(n_tok) AS tok_start
           FROM c GROUP BY 1, 2)
         SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
         FROM pw GROUP BY 1 ORDER BY 1""",
    "text_span_corruption" ->
      """WITH t AS (SELECT doc_id, source,
             generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents),
         s AS (SELECT doc_id, source, pos,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(pos AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(pos AS VARCHAR)), 2, 1)) - 1)
               < 38 THEN 1 ELSE 0 END AS strt
           FROM t),
         m AS (SELECT doc_id, source, pos, strt,
             MAX(strt) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mk
           FROM s),
         sp AS (SELECT doc_id, source, mk,
             CASE WHEN mk = 1 AND COALESCE(lag(mk) OVER (
                 PARTITION BY doc_id ORDER BY pos), 0) = 0
               THEN 1 ELSE 0 END AS span_start
           FROM m)
         SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(mk) AS BIGINT) AS n_masked,
           ROUND(CAST(SUM(mk) AS DOUBLE) / COUNT(*), 6) AS mask_share,
           CAST(SUM(span_start) AS BIGINT) AS n_spans,
           ROUND(CAST(SUM(mk) AS DOUBLE) / SUM(span_start), 4)
             AS mean_span_len
         FROM sp GROUP BY 1 ORDER BY source""",
    "events_ab_srm" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events
           UNION ALL
           SELECT DISTINCT '0_all' AS event_type, user_id FROM events),
         g AS (SELECT event_type,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b
           FROM u GROUP BY 1)
         SELECT event_type, n_a, n_b,
           ROUND(CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE), 6) AS chi2,
           CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
             / CAST(n_a + n_b AS DOUBLE) > 3.841459 AS srm_flag
         FROM g ORDER BY event_type""",
    "stream_kmeans" ->
      """WITH e1 AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 0),
         e2 AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % 2 = 1),
         seeds AS (SELECT vec_id AS cid, embedding AS cemb
           FROM e1 ORDER BY vec_id LIMIT 8),
         a1 AS (SELECT vec_id, embedding, cid, sim FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM e1 e CROSS JOIN seeds s) z WHERE rn = 1),
         r1 AS (SELECT CAST(1 AS BIGINT) AS increment, cid,
             CAST(COUNT(*) AS BIGINT) AS n_assigned,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos
           FROM a1 GROUP BY 2),
         dims AS (SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent1 AS (SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d) z
           GROUP BY cid),
         a2 AS (SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM e2 e CROSS JOIN cent1 c) z WHERE rn = 1),
         r2 AS (SELECT CAST(2 AS BIGINT) AS increment, cid,
             CAST(COUNT(*) AS BIGINT) AS n_assigned,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos
           FROM a2 GROUP BY 2)
         SELECT * FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2) u
         ORDER BY increment, cid""",
    "sim_seed_sweep" ->
      """WITH f8 AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         h8 AS (SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings
           ORDER BY md5('seed:' || CAST(vec_id AS VARCHAR)), vec_id
           LIMIT 8),
         a1 AS (SELECT vec_id, sim FROM (
             SELECT e.vec_id,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN f8 s) z WHERE rn = 1),
         a2 AS (SELECT vec_id, sim FROM (
             SELECT e.vec_id,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN h8 s) z WHERE rn = 1)
         SELECT * FROM (
           SELECT '0_first8' AS seeding,
             CAST(COUNT(*) AS BIGINT) AS n_vecs,
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6) AS avg_cos,
             ROUND(MIN(CAST(sim AS DOUBLE)), 6) AS min_cos
           FROM a1
           UNION ALL
           SELECT '1_hash8',
             CAST(COUNT(*) AS BIGINT),
             ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*), 6),
             ROUND(MIN(CAST(sim AS DOUBLE)), 6)
           FROM a2) u ORDER BY seeding""",
    "sim_dim_sweep" -> {
      // t_64 first: the truth CTE must precede the cases that join it
      val cases = Seq(64, 16, 32).map { d =>
        s""",
         t_$d AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(e.embedding[1:$d],
                   q.q_emb[1:$d]) DESC, e.vec_id) AS rn
             FROM embeddings e CROSS JOIN q
             WHERE e.vec_id <> q.q_id) z WHERE rn <= 10),
         r_$d AS (SELECT CAST($d AS BIGINT) AS dim,
             CAST(COUNT(*) AS BIGINT) AS n_hits,
             ROUND(CAST(COUNT(*) AS DOUBLE) / 50, 6) AS recall
           FROM t_$d a JOIN t_64 b
             ON a.q_id = b.q_id AND a.vec_id = b.vec_id)"""
      }.mkString
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < 5)$cases
         SELECT * FROM (SELECT * FROM r_16 UNION ALL
           SELECT * FROM r_32 UNION ALL SELECT * FROM r_64) u
         ORDER BY dim"""
    },
    "events_retention_fit" ->
      """WITH first AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS d0
           FROM events GROUP BY 1),
         act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         offs AS (SELECT CAST(d - d0 AS BIGINT) AS t
           FROM act JOIN first USING (user_id)
           WHERE d - d0 BETWEEN 0 AND 7),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM offs
           WHERE t = 0),
         curve AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(COUNT(*) AS DOUBLE) / CAST(n0 AS DOUBLE) AS r,
             CAST(t AS DOUBLE) AS x,
             ln(CAST(COUNT(*) AS DOUBLE) / CAST(n0 AS DOUBLE)) AS y
           FROM offs, tot WHERE t >= 1 GROUP BY t, n0),
         fit0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
           FROM curve),
         fit AS (SELECT
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b, sx, sy, n
           FROM fit0),
         fit2 AS (SELECT b, (sy - b * sx) / n AS a FROM fit)
         SELECT t, n_active, ROUND(r, 6) AS retention,
           ROUND(exp(a + b * x), 6) AS fitted,
           ROUND(b, 6) AS slope,
           ROUND(-ln(2.0) / b, 4) AS half_life_days
         FROM curve, fit2 ORDER BY t""",
    "events_dispersion" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ssq
           FROM daily GROUP BY 1),
         z AS (SELECT event_type, n_days, s,
             CAST(s AS DOUBLE) / n_days AS mean,
             CAST(n_days * ssq - s * s AS DOUBLE)
               / CAST(n_days * (n_days - 1) AS DOUBLE) AS variance
           FROM g)
         SELECT event_type, n_days, s AS n_events,
           ROUND(mean, 4) AS mean_daily,
           ROUND(variance, 4) AS var_daily,
           ROUND(variance / mean, 4) AS vmr,
           variance / mean > 1.5 AS overdispersed
         FROM z ORDER BY event_type""",
    "docs_rank_fusion" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tf AS (SELECT doc_id,
             ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
               % 64 AS j,
             CAST(COUNT(*) AS BIGINT) AS x
           FROM tok GROUP BY 1, 2),
         lab AS (SELECT vec_id AS doc_id, label FROM embeddings
           WHERE label IN (0, 1)),
         g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
           FROM tf JOIN lab USING (doc_id) GROUP BY j),
         s AS (SELECT tf.doc_id,
             CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
           FROM tf LEFT JOIN g USING (j) GROUP BY 1),
         r1 AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY m2000 DESC, doc_id) AS BIGINT) AS r_margin FROM s),
         q AS (SELECT doc_id,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ratio
           FROM documents),
         r2 AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY ratio DESC, doc_id) AS BIGINT) AS r_quality FROM q)
         SELECT r1.doc_id, r_margin, r_quality,
           ROUND(1.0 / (60.0 + r_margin) + 1.0 / (60.0 + r_quality), 6)
             AS rrf_score
         FROM r1 JOIN r2 USING (doc_id)
         ORDER BY 1.0 / (60.0 + r_margin) + 1.0 / (60.0 + r_quality)
           DESC, r1.doc_id
         LIMIT 20""",
    "text_entropy_rate" ->
      """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS t
           FROM documents),
         uni AS (SELECT lang, unnest(t) AS w FROM d),
         uc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS n
           FROM uni GROUP BY 1, 2),
         ut AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM uc GROUP BY 1),
         h1 AS (SELECT uc.lang,
             CAST(SUM(CAST(-(CAST(n AS DOUBLE) / nt)
               * ln(CAST(n AS DOUBLE) / nt) AS DECIMAL(28,12)))
               AS DOUBLE) AS h1,
             MAX(nt) AS n_tokens
           FROM uc JOIN ut ON uc.lang = ut.lang GROUP BY 1),
         tokp AS (SELECT doc_id, lang, unnest(t) AS w,
             generate_subscripts(t, 1) AS pos FROM d),
         bi AS (SELECT a.lang, a.w AS w1, b.w AS w2
           FROM tokp a JOIN tokp b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         bc AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
           FROM bi GROUP BY 1, 2, 3),
         bt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt FROM bc GROUP BY 1),
         h2 AS (SELECT bc.lang,
             CAST(SUM(CAST(-(CAST(n AS DOUBLE) / nt)
               * ln(CAST(n AS DOUBLE) / nt) AS DECIMAL(28,12)))
               AS DOUBLE) AS h2
           FROM bc JOIN bt ON bc.lang = bt.lang GROUP BY 1)
         SELECT h1.lang, n_tokens, ROUND(h1, 6) AS h_unigram,
           ROUND(h2 - h1, 6) AS h_rate,
           ROUND(exp(h2 - h1), 4) AS cond_perplexity
         FROM h1 JOIN h2 ON h1.lang = h2.lang ORDER BY h1.lang""",
    // sketch_hll_intersect: exact set sides are the truth; the HLL
    // inclusion-exclusion verdicts are asserted TRUE (the documented
    // weaker sketch-gate, as sketch_hll)
    // sketch_kmv: fully deterministic (md5-prefix hash, exact 48-bit →
    // double mapping), so unlike the HLL rows the oracle recomputes the
    // ESTIMATES themselves and the gate is a straight hash compare
    "sketch_kmv" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         h AS (SELECT DISTINCT event_type,
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM du),
         hv AS (SELECT event_type, hx,
             SUM((strpos('0123456789abcdef', substr(hx, g.i, 1)) - 1)
               * POWER(16.0, 12 - g.i)) / POWER(16.0, 12) AS v
           FROM h, generate_series(1, 12) AS g(i) GROUP BY 1, 2),
         sig AS (SELECT event_type, hx, v FROM (
             SELECT event_type, hx, v,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hx)
                 AS rk
             FROM hv) s WHERE rk <= 32),
         st AS (SELECT s.event_type, e.exact_n,
             CASE WHEN s.n_sig < 32 THEN CAST(s.n_sig AS DOUBLE)
                  ELSE 31.0 / s.v_max END AS est_n
           FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sig,
                   MAX(v) AS v_max FROM sig GROUP BY 1) s
           JOIN (SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_n
                 FROM du GROUP BY 1) e USING (event_type)),
         pr AS (SELECT a.event_type AS type_a, a.exact_n AS exact_a,
                  a.est_n AS est_a, b.event_type AS type_b,
                  b.exact_n AS exact_b, b.est_n AS est_b
                FROM st a JOIN st b ON a.event_type < b.event_type),
         pe AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  CAST(COUNT(*) AS BIGINT) AS exact_inter
                FROM du a JOIN du b ON a.user_id = b.user_id
                  AND a.event_type < b.event_type GROUP BY 1, 2),
         uall AS (SELECT DISTINCT type_a, type_b, hx, v FROM (
             SELECT p.type_a, p.type_b, s.hx, s.v
             FROM pr p JOIN sig s ON s.event_type = p.type_a
             UNION ALL
             SELECT p.type_a, p.type_b, s.hx, s.v
             FROM pr p JOIN sig s ON s.event_type = p.type_b) u),
         usig AS (SELECT type_a, type_b, hx, v FROM (
             SELECT type_a, type_b, hx, v,
               ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                 ORDER BY hx) AS rk
             FROM uall) z WHERE rk <= 32),
         kst AS (SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_k,
             MAX(v) AS v_k
           FROM usig GROUP BY 1, 2),
         ov AS (SELECT u.type_a, u.type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
           FROM usig u
           JOIN sig sa ON sa.event_type = u.type_a AND sa.hx = u.hx
           JOIN sig sb ON sb.event_type = u.type_b AND sb.hx = u.hx
           GROUP BY 1, 2)
         SELECT pr.type_a, pr.type_b, pr.exact_a, pr.exact_b,
           pr.exact_a + pr.exact_b - COALESCE(pe.exact_inter, 0)
             AS exact_union,
           COALESCE(pe.exact_inter, 0) AS exact_inter,
           ROUND(CAST(COALESCE(pe.exact_inter, 0) AS DOUBLE)
             / CAST(pr.exact_a + pr.exact_b - COALESCE(pe.exact_inter, 0)
                 AS DOUBLE), 6) AS exact_jaccard,
           ROUND(pr.est_a, 6) AS est_a, ROUND(pr.est_b, 6) AS est_b,
           ROUND(CASE WHEN kst.n_k < 32 THEN CAST(kst.n_k AS DOUBLE)
                 ELSE 31.0 / kst.v_k END, 6) AS est_union,
           ROUND((CAST(COALESCE(ov.n_both, 0) AS DOUBLE)
               / CAST(kst.n_k AS DOUBLE))
             * CASE WHEN kst.n_k < 32 THEN CAST(kst.n_k AS DOUBLE)
                 ELSE 31.0 / kst.v_k END, 6) AS est_inter,
           ROUND(CAST(COALESCE(ov.n_both, 0) AS DOUBLE)
             / CAST(kst.n_k AS DOUBLE), 6) AS est_jaccard
         FROM pr JOIN kst USING (type_a, type_b)
         LEFT JOIN ov USING (type_a, type_b)
         LEFT JOIN pe USING (type_a, type_b)
         ORDER BY type_a, type_b""",
    "sketch_hll_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'purchase')
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS exact_a,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS exact_b,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM (SELECT user_id FROM a UNION ALL SELECT user_id FROM b) u)
             AS exact_union,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM a JOIN b USING (user_id))
             AS exact_inter,
           TRUE AS inter_within_bound, TRUE AS union_within_bound""",
    // stream_hll_distinct: exact cumulative distincts are the truth;
    // the maintained-sketch verdict is asserted TRUE (the documented
    // weaker sketch-gate)
    // stream_kmv_distinct: the maintained bottom-k state after each
    // increment equals the from-scratch bottom-k over the cumulative
    // prefix (KMV merge law) — the oracle recomputes BOTH states and
    // the estimates hash-compare exactly
    "stream_kmv_distinct" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         h1 AS (SELECT DISTINCT
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY),
         hA AS (SELECT DISTINCT
             substr(md5('u:' || CAST(user_id AS VARCHAR)), 1, 12) AS hx
           FROM events),
         s1 AS (SELECT hx FROM h1 ORDER BY hx LIMIT 32),
         sA AS (SELECT hx FROM hA ORDER BY hx LIMIT 32),
         st1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_state,
           MAX(hx) AS hmax FROM s1),
         stA AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_state,
           MAX(hx) AS hmax FROM sA),
         ex1 AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_cum
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY),
         exA AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
             AS exact_cum
           FROM events),
         incr AS (
           SELECT CAST(1 AS BIGINT) AS increment, st1.n_state,
             st1.hmax, ex1.exact_cum FROM st1, ex1
           UNION ALL
           SELECT CAST(2 AS BIGINT), stA.n_state, stA.hmax,
             exA.exact_cum FROM stA, exA),
         vv AS (SELECT increment, n_state, exact_cum,
             SUM((strpos('0123456789abcdef', substr(hmax, g.i, 1)) - 1)
               * POWER(16.0, 12 - g.i)) / POWER(16.0, 12) AS v_k
           FROM incr, generate_series(1, 12) g(i) GROUP BY 1, 2, 3)
         SELECT increment, n_state, exact_cum,
           ROUND(CASE WHEN n_state < 32 THEN CAST(n_state AS DOUBLE)
             ELSE 31.0 / v_k END, 6) AS est_distinct
         FROM vv ORDER BY increment""",
    "stream_hll_distinct" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events)
         SELECT CAST(2 AS BIGINT) AS n_increments,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY)
             AS exact_inc1,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
             AS exact_total,
           TRUE AS est_within_bound""",
    "graph_conductance" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym),
         comm AS (SELECT n.node, COALESCE(l2.lbl, n.node) AS community
           FROM nodes n LEFT JOIN l2 ON n.node = l2.node),
         m2 AS (SELECT SUM(w) AS tw FROM sym),
         fl AS (SELECT s.node, s.nbr, s.w, ca.community, cb.community AS c2
           FROM sym s JOIN comm ca ON s.node = ca.node
             JOIN comm cb ON s.nbr = cb.node),
         cut AS (SELECT community, SUM(w) AS cut_w FROM fl
           WHERE community <> c2 GROUP BY 1),
         vol AS (SELECT community, SUM(w) AS vol_w FROM fl GROUP BY 1),
         np AS (SELECT community, CAST(COUNT(*) AS BIGINT) AS n_nodes
           FROM comm GROUP BY 1)
         SELECT np.community, n_nodes,
           CAST(COALESCE(cut_w, 0) AS BIGINT) AS cut_w,
           CAST(COALESCE(vol_w, 0) AS BIGINT) AS vol_w,
           ROUND(CASE WHEN LEAST(COALESCE(vol_w, 0),
               tw - COALESCE(vol_w, 0)) > 0
             THEN CAST(COALESCE(cut_w, 0) AS DOUBLE)
               / CAST(LEAST(COALESCE(vol_w, 0), tw - COALESCE(vol_w, 0))
                 AS DOUBLE) END, 6) AS conductance
         FROM np LEFT JOIN vol USING (community)
           LEFT JOIN cut USING (community), m2
         ORDER BY np.community""",
    "events_ab_cuped" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         x AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
           FROM events, t0 WHERE event_type = 'purchase'
             AND ts < t0 + INTERVAL 7 DAY GROUP BY 1),
         y AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS y
           FROM events, t0 WHERE event_type = 'purchase'
             AND ts >= t0 + INTERVAL 7 DAY
             AND ts < t0 + INTERVAL 14 DAY GROUP BY 1),
         u AS (SELECT DISTINCT user_id FROM events),
         users AS (SELECT u.user_id, COALESCE(x, 0) AS x,
             COALESCE(y, 0) AS y,
             CASE WHEN u.user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
           FROM u LEFT JOIN x USING (user_id) LEFT JOIN y USING (user_id)),
         fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
           FROM users),
         th AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
             CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
           FROM fit),
         adj AS (SELECT arm, y,
             CAST(y AS DOUBLE) - theta * (CAST(x AS DOUBLE) - mx) AS ya,
             theta
           FROM users, th),
         g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(CAST(ya AS DECIMAL(28,12))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(ya * ya AS DECIMAL(28,12))) AS DOUBLE) AS saa,
             MAX(theta) AS theta
           FROM adj GROUP BY 1),
         z AS (SELECT *,
             CAST(n * syy - sy * sy AS DOUBLE)
               / CAST(n * (n - 1) AS DOUBLE) AS var_y,
             (CAST(n AS DOUBLE) * saa - sa * sa)
               / CAST(n * (n - 1) AS DOUBLE) AS var_ya
           FROM g)
         SELECT arm, n AS n_users,
           ROUND(CAST(sy AS DOUBLE) / n, 6) AS mean_y,
           ROUND(sa / n, 6) AS mean_y_adj,
           ROUND(var_y, 6) AS var_y,
           ROUND(var_ya, 6) AS var_y_adj,
           ROUND(1 - var_ya / var_y, 6) AS var_reduction,
           ROUND(theta, 6) AS theta
         FROM z ORDER BY arm""",
    "sim_binary_recall" ->
      """WITH lanes AS (SELECT vec_id, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS j
           FROM embeddings),
         packed AS (SELECT vec_id,
             CAST(bit_or(CASE WHEN j <= 32 AND x > 0
               THEN 1::BIGINT << (CAST(j AS INT) - 1) ELSE 0 END)
               AS BIGINT) AS b_lo,
             CAST(bit_or(CASE WHEN j > 32 AND x > 0
               THEN 1::BIGINT << (CAST(j AS INT) - 33) ELSE 0 END)
               AS BIGINT) AS b_hi
           FROM lanes GROUP BY 1),
         q AS (SELECT e.vec_id AS q_id, e.embedding AS q_emb,
             p.b_lo AS q_lo, p.b_hi AS q_hi
           FROM embeddings e JOIN packed p USING (vec_id)
           WHERE e.vec_id < 5),
         bt AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, p.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY bit_count(xor(p.b_lo, q.q_lo))
                   + bit_count(xor(p.b_hi, q.q_hi)), p.vec_id) AS rn
             FROM packed p CROSS JOIN q WHERE p.vec_id <> q.q_id) z
           WHERE rn <= 10),
         tt AS (SELECT q_id, vec_id FROM (
             SELECT q.q_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(e.embedding, q.q_emb)
                   DESC, e.vec_id) AS rn
             FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id) z
           WHERE rn <= 10),
         hits AS (SELECT bt.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM bt JOIN tt ON bt.q_id = tt.q_id AND bt.vec_id = tt.vec_id
           GROUP BY 1)
         SELECT q.q_id, COALESCE(n_hits, 0) AS n_hits,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10, 6)
             AS recall_at_10
         FROM q LEFT JOIN hits ON q.q_id = hits.q_id ORDER BY q.q_id""",
    "events_user_similarity" ->
      """WITH c AS (SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         v AS (SELECT user_id, event_type AS dom FROM (
             SELECT user_id, event_type, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
             FROM c) z WHERE rn = 1),
         s AS (SELECT user_id, CAST(SUM(n * n) AS BIGINT) AS nsq
           FROM c GROUP BY 1),
         w AS (SELECT c.user_id, dom, event_type, n, nsq
           FROM c JOIN v USING (user_id) JOIN s USING (user_id)),
         p AS (SELECT a.dom, a.user_id AS u1, b.user_id AS u2,
             a.nsq AS s1, b.nsq AS s2,
             CAST(SUM(a.n * b.n) AS BIGINT) AS dot
           FROM w a JOIN w b ON a.dom = b.dom
             AND a.event_type = b.event_type AND a.user_id < b.user_id
           GROUP BY 1, 2, 3, 4, 5)
         SELECT u1, u2, dom AS shared_block,
           ROUND(CAST(dot AS DOUBLE)
             / (sqrt(CAST(s1 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE))), 6)
             AS cos
         FROM p
         ORDER BY CAST(dot AS DOUBLE)
           / (sqrt(CAST(s1 AS DOUBLE)) * sqrt(CAST(s2 AS DOUBLE))) DESC,
           u1, u2
         LIMIT 20""",
    "events_attribution_markov" -> {
      val rounds = (1 to 8).map { i =>
        s""",
         v$i AS (SELECT pr.config, pr.t AS state,
             CAST(SUM(CAST(v${i - 1}.m * pr.p AS DECIMAL(28,12)))
               AS DOUBLE) AS m
           FROM v${i - 1} JOIN pr ON v${i - 1}.config = pr.config
             AND v${i - 1}.state = pr.f
           GROUP BY 1, 2)"""
      }.mkString
      s"""WITH fc AS (SELECT user_id, ts, event_id FROM (
             SELECT user_id, ts, event_id, ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM events WHERE event_type = 'purchase') z WHERE rn = 1),
         j AS (SELECT e.user_id, e.ts, e.event_id,
             CASE WHEN e.event_type = 'purchase' THEN 'conv'
                  ELSE e.event_type END AS state
           FROM events e LEFT JOIN fc ON e.user_id = fc.user_id
           WHERE fc.user_id IS NULL
             OR (e.ts, e.event_id) <= (fc.ts, fc.event_id)),
         st AS (SELECT user_id, state,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             LEAD(state) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS nxt
           FROM j),
         tr AS (SELECT 'start' AS f, state AS t FROM st WHERE rn = 1
           UNION ALL SELECT state, nxt FROM st
             WHERE nxt IS NOT NULL AND state <> 'conv'
           UNION ALL SELECT state, 'end' FROM st
             WHERE nxt IS NULL AND state <> 'conv'),
         tc AS (SELECT f, t, CAST(COUNT(*) AS BIGINT) AS n
           FROM tr GROUP BY 1, 2),
         cfg AS (SELECT unnest(
             ['full', 'view', 'click', 'signup', 'error']) AS config),
         ct AS (SELECT config, f,
             CASE WHEN t = config THEN 'end' ELSE t END AS t2,
             CAST(SUM(n) AS BIGINT) AS n
           FROM tc CROSS JOIN cfg WHERE f <> config GROUP BY 1, 2, 3),
         pr AS (SELECT config, f, t2 AS t,
             CAST(n AS DOUBLE) / CAST(SUM(n) OVER (
               PARTITION BY config, f) AS DOUBLE) AS p
           FROM ct
           UNION ALL SELECT config, 'conv', 'conv', 1.0 FROM cfg
           UNION ALL SELECT config, 'end', 'end', 1.0 FROM cfg),
         v0 AS (SELECT config, 'start' AS state, 1.0 AS m FROM cfg)$rounds,
         pc AS (SELECT config, m AS p_conv FROM v8 WHERE state = 'conv'),
         fl AS (SELECT p_conv AS p_full FROM pc WHERE config = 'full')
         SELECT config AS channel, ROUND(p_full, 6) AS p_full,
           ROUND(p_conv, 6) AS p_removed,
           ROUND((p_full - p_conv) / p_full, 6) AS removal_effect
         FROM pc, fl WHERE config <> 'full' ORDER BY channel"""
    },
    "text_heaps_law" ->
      """WITH d AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             string_split(text, ' ') AS t
           FROM documents),
         rg AS (SELECT MIN(doc_id) AS dmin, MAX(doc_id) AS dmax FROM d),
         ks AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) AS k),
         cuts AS (SELECT k,
             CAST(dmin + ((dmax - dmin) * k) // 10 AS BIGINT) AS cut
           FROM ks, rg),
         fd AS (SELECT w, MIN(doc_id) AS fd FROM (
             SELECT doc_id, unnest(list_distinct(t)) AS w FROM d) z
           GROUP BY 1),
         va AS (SELECT k, cut, CAST(COUNT(*) AS BIGINT) AS vocab_size
           FROM fd JOIN cuts ON fd.fd <= cuts.cut GROUP BY 1, 2),
         ta AS (SELECT k, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           FROM d JOIN cuts ON d.doc_id <= cuts.cut GROUP BY 1),
         pts AS (SELECT va.k, cut, n_tokens, vocab_size,
             ln(CAST(n_tokens AS DOUBLE)) AS x,
             ln(CAST(vocab_size AS DOUBLE)) AS y
           FROM va JOIN ta USING (k)),
         fit0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
           FROM pts),
         fit AS (SELECT
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta0,
             sx, sy, n
           FROM fit0)
         SELECT k, cut, n_tokens, vocab_size,
           ROUND(beta0, 4) AS beta,
           ROUND(exp((sy - beta0 * sx) / n), 4) AS k_coef
         FROM pts, fit ORDER BY k""",
    "dedup_perm_sweep" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(18) t(i) GROUP BY doc_id, i),
         b9 AS (SELECT CAST(9 AS BIGINT) AS n_perms, doc_id, i // 3 AS band,
                  md5(string_agg(h, ',' ORDER BY i)) AS bucket
                FROM mh WHERE i < 9 GROUP BY doc_id, i // 3),
         b18 AS (SELECT CAST(18 AS BIGINT) AS n_perms, doc_id, i // 3 AS band,
                  md5(string_agg(h, ',' ORDER BY i)) AS bucket
                FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.n_perms, x.doc_id AS d1, y.doc_id AS d2
                  FROM (SELECT * FROM b9 UNION ALL SELECT * FROM b18) x
                  JOIN (SELECT * FROM b9 UNION ALL SELECT * FROM b18) y
                    ON x.n_perms = y.n_perms AND x.band = y.band
                       AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
                  HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle
                     AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs FROM truth)
         SELECT c.n_perms, c.n_perms // 3 AS n_bands,
           CAST(COUNT(*) AS BIGINT) AS n_cand_pairs,
           CAST(MAX(nt.n_true_pairs) AS BIGINT) AS n_true_pairs,
           CAST(SUM(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hits,
           ROUND(CAST(SUM(CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / MAX(nt.n_true_pairs), 6) AS recall
         FROM cand c LEFT JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2,
           nt
         GROUP BY c.n_perms ORDER BY c.n_perms""",
    "stream_mix_rebalance" -> {
      val inc = Seq((1, "CAST(substr(source, 4, 8) AS INT) < 10"),
        (2, "TRUE")).map { case (i, cond) =>
        s""",
         pl_$i AS (SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents WHERE $cond GROUP BY 1),
         sc_$i AS (SELECT lang, n_tokens,
             CASE WHEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM pl_$i),
         z_$i AS (SELECT CAST(SUM(s) AS BIGINT) AS z FROM sc_$i),
         r_$i AS (SELECT CAST($i AS BIGINT) AS increment, lang, n_tokens,
             ROUND(CAST(s AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
             CAST(ROUND(CAST(s * 50000 AS DOUBLE) / CAST(z AS DOUBLE), 0)
               AS BIGINT) AS target_tokens
           FROM sc_$i, z_$i)"""
      }.mkString
      s"""WITH dummy AS (SELECT 1)$inc
         SELECT * FROM (SELECT * FROM r_1 UNION ALL SELECT * FROM r_2) u
         ORDER BY increment, lang"""
    },
    "mm_audio_neardup" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 256 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         sig AS (SELECT doc_id, w // 4 AS band,
             md5(string_agg(CAST(energy // 16384 AS VARCHAR), ','
               ORDER BY w)) AS bucket
           FROM wins GROUP BY 1, 2),
         sh AS (SELECT doc_id,
             CAST(band AS VARCHAR) || ':' || bucket AS shingle FROM sig),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b2.doc_id AS d2,
             COUNT(*) AS i
           FROM sh a JOIN sh b2
             ON a.shingle = b2.shingle AND a.doc_id < b2.doc_id
           JOIN okdf kf ON kf.shingle = a.shingle
           GROUP BY 1, 2)
         SELECT d1, d2, CAST(i AS BIGINT) AS n_bands_agree,
           CAST(s1.n AS BIGINT) AS n_bands_1,
           CAST(s2.n AS BIGINT) AS n_bands_2,
           ROUND(CAST(i AS DOUBLE) / GREATEST(s1.n, s2.n), 3)
             AS band_frac
         FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                    JOIN sizes s2 ON d2 = s2.doc_id
         WHERE i * 100 >= GREATEST(s1.n, s2.n) * 50
         ORDER BY d1, d2""",
    "text_rake_keywords" ->
      """WITH toks AS (SELECT doc_id, pos - 1 AS p, tok AS w
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents) z),
         fl AS (SELECT doc_id, p, w,
             (w IN ('the','a','of','and','to','in','is','for','on','with')
               OR w = '') AS is_stop
           FROM toks),
         g AS (SELECT doc_id, p, w, is_stop,
             SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER
               (PARTITION BY doc_id ORDER BY p) AS grp
           FROM fl),
         ph AS (SELECT doc_id, grp,
             string_agg(w, ' ' ORDER BY p) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS len
           FROM g WHERE NOT is_stop GROUP BY 1, 2
           HAVING COUNT(*) <= 8),
         ws AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(len) AS BIGINT) AS deg
           FROM (SELECT len, unnest(string_split(phrase, ' ')) AS w
                 FROM ph) e
           GROUP BY 1),
         dp AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurs,
             MAX(len) AS len FROM ph GROUP BY 1),
         sc AS (SELECT d2.phrase, d2.n_occurs, d2.len,
             SUM(CAST(CAST(ws.deg AS DOUBLE) / ws.freq
               AS DECIMAL(18,9))) AS score_d
           FROM (SELECT phrase, n_occurs, len,
                   unnest(string_split(phrase, ' ')) AS w FROM dp) d2
           JOIN ws USING (w)
           GROUP BY 1, 2, 3)
         SELECT CAST(rk AS BIGINT) AS rk, phrase, len AS n_words,
           n_occurs, ROUND(CAST(score_d AS DOUBLE), 4) AS score
         FROM (SELECT *, ROW_NUMBER() OVER
             (ORDER BY score_d DESC, phrase) AS rk FROM sc) r
         WHERE rk <= 25 ORDER BY rk""",
    "events_markov_stationary" ->
      """WITH nx AS (SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         tr AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2),
         trs AS (SELECT from_type, to_type, n,
             SUM(n) OVER (PARTITION BY from_type) AS rs FROM tr),
         emp AS (SELECT event_type,
             CAST((COUNT(*) * 1000000)
               // (SELECT COUNT(*) FROM events) AS BIGINT) AS pi
           FROM events GROUP BY 1),
         p1 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM emp e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p2 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p1 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p3 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p2 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1),
         p4 AS (SELECT t.to_type AS event_type,
             CAST(SUM((e.pi * t.n) // t.rs) AS BIGINT) AS pi
           FROM p3 e JOIN trs t ON e.event_type = t.from_type GROUP BY 1)
         SELECT e.event_type, e.pi AS empirical_micro,
           p4.pi AS stationary_micro,
           abs(e.pi - p4.pi) AS drift_micro
         FROM emp e JOIN p4 ON e.event_type = p4.event_type
         ORDER BY e.event_type""",
    "sim_knn_diversify" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2, sim, rk FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         piv AS (SELECT label, v1, CAST(COUNT(*) AS BIGINT) AS deg,
             MAX(CASE WHEN rk = 1 THEN v2 END) AS n1,
             MAX(CASE WHEN rk = 2 THEN v2 END) AS n2,
             MAX(CASE WHEN rk = 3 THEN v2 END) AS n3,
             MAX(CASE WHEN rk = 1 THEN sim END) AS s1,
             MAX(CASE WHEN rk = 2 THEN sim END) AS s2,
             MAX(CASE WHEN rk = 3 THEN sim END) AS s3
           FROM knn GROUP BY 1, 2),
         sims AS (SELECT p.*,
             list_cosine_similarity(e1.embedding, e2.embedding) AS s12,
             list_cosine_similarity(e1.embedding, e3.embedding) AS s13,
             list_cosine_similarity(e2.embedding, e3.embedding) AS s23
           FROM piv p
           LEFT JOIN embeddings e1 ON p.n1 = e1.vec_id
           LEFT JOIN embeddings e2 ON p.n2 = e2.vec_id
           LEFT JOIN embeddings e3 ON p.n3 = e3.vec_id),
         fl AS (SELECT label, deg, s1, s2, s3,
             (n2 IS NOT NULL AND s2 > s12) AS keep2,
             (n3 IS NOT NULL AND s3 > s13
               AND (NOT (n2 IS NOT NULL AND s2 > s12) OR s3 > s23))
               AS keep3
           FROM sims)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(SUM(deg) AS BIGINT) AS n_edges_before,
           CAST(SUM(1 + CAST(keep2 AS BIGINT) + CAST(keep3 AS BIGINT))
             AS BIGINT) AS n_edges_after,
           CAST(SUM(deg) - SUM(1 + CAST(keep2 AS BIGINT)
             + CAST(keep3 AS BIGINT)) AS BIGINT) AS n_pruned,
           ROUND(CAST(SUM(CAST(s1 AS DECIMAL(18,9)))
               + SUM(CASE WHEN keep2 THEN CAST(s2 AS DECIMAL(18,9))
                     ELSE 0 END)
               + SUM(CASE WHEN keep3 THEN CAST(s3 AS DECIMAL(18,9))
                     ELSE 0 END) AS DOUBLE)
             / CAST(SUM(1 + CAST(keep2 AS BIGINT)
                 + CAST(keep3 AS BIGINT)) AS DOUBLE), 4) AS avg_kept_sim
         FROM fl GROUP BY label ORDER BY label""",
    "dedup_bloom_fpr" ->
      """WITH d AS (SELECT substr(text, 1, 32) AS fp,
             CAST(substr(source, 4, 8) AS INT) AS sn FROM documents),
         c AS (SELECT DISTINCT fp FROM d WHERE sn < 10),
         b AS (SELECT DISTINCT fp FROM d WHERE sn >= 10),
         tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_td
           FROM b JOIN c USING (fp)),
         np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probes FROM b)
         SELECT np.n_probes, tp.n_td AS n_bloom_pos,
           tp.n_td AS n_true_dup,
           CAST(0 AS BIGINT) AS n_false_pos,
           np.n_probes - tp.n_td AS n_true_neg,
           CAST(0.0 AS DOUBLE) AS fpr_observed,
           TRUE AS within_design_fpp
         FROM np, tp""",
    "sketch_quantiles" ->
      """WITH v AS (SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         n AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM v GROUP BY 1),
         p AS (SELECT CAST(unnest([25, 50, 75]) AS BIGINT) AS pct),
         k AS (SELECT o_orderpriority, pct, n_rows,
             (pct * n_rows + 99) // 100 AS k
           FROM n CROSS JOIN p),
         h AS (SELECT o_orderpriority, c, COUNT(*) AS cnt
           FROM v GROUP BY 1, 2),
         cdf AS (SELECT o_orderpriority, c,
             SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY c)
               AS cum
           FROM h)
         SELECT k.o_orderpriority, k.pct, k.n_rows,
           CAST(MIN(cdf.c) AS BIGINT) AS exact_quantile_c,
           TRUE AS sketch_within_bound
         FROM k JOIN cdf ON cdf.o_orderpriority = k.o_orderpriority
           AND cdf.cum >= k.k
         GROUP BY 1, 2, 3
         ORDER BY k.o_orderpriority, k.pct""",
    "dedup_dup_quality" ->
      """WITH docs AS (SELECT md5(substr(text, 1, 64)) AS fp, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents),
         s AS (SELECT fp,
             CAST(n_uniq AS DOUBLE) / n_tok AS score
           FROM docs WHERE n_tok > 0),
         copies AS (SELECT fp, COUNT(*) AS n_copies FROM s GROUP BY 1)
         SELECT CAST(n_copies > 1 AS BIGINT) AS dup_flag,
           1 + CAST(score >= 0.5 AS BIGINT)
             + CAST(score >= 0.75 AS BIGINT)
             + CAST(score >= 0.9 AS BIGINT) AS band,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*), 6) AS avg_score
         FROM s JOIN copies USING (fp)
         GROUP BY 1, 2 ORDER BY dup_flag, band""",
    "sim_kmeans_inertia" ->
      """WITH seeds AS (
           SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, embedding, cid, sim FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               list_cosine_similarity(e.embedding, s.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
         dims AS (
           SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent2 AS (
           SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d)
           GROUP BY cid),
         a2 AS (
           SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM embeddings e CROSS JOIN cent2 c) WHERE rn = 1),
         u AS (SELECT CAST(1 AS BIGINT) AS iter, sim FROM a1
           UNION ALL SELECT CAST(2 AS BIGINT), sim FROM a2)
         SELECT iter, COUNT(*) AS n_vecs,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos,
           ROUND(MIN(CAST(sim AS DOUBLE)), 6) AS min_cos
         FROM u GROUP BY iter ORDER BY iter""",
    "events_forecast_naive" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         f AS (SELECT *, LAG(n, 7) OVER (PARTITION BY event_type
             ORDER BY d) AS fc FROM daily),
         s AS (SELECT event_type, n, fc,
             CAST(CAST(abs(n - fc) AS DOUBLE) / n AS DECIMAL(28,8))
               AS ape,
             CAST(n - fc AS BIGINT) AS err
           FROM f WHERE fc IS NOT NULL)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
           ROUND(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 4) AS mape,
           CAST(SUM(err) AS BIGINT) AS total_bias,
           CAST(MAX(abs(err)) AS BIGINT) AS worst_abs_err
         FROM s GROUP BY 1 ORDER BY event_type""",
    "window_rolling_median" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           ROUND(median(n) OVER (PARTITION BY event_type ORDER BY d
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 1) AS med7
         FROM daily ORDER BY event_type, day""",
    "events_concurrency" ->
      """WITH lagd AS (SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS lag_ts
           FROM events),
         flags AS (SELECT user_id, ts,
             CASE WHEN lag_ts IS NULL
                       OR epoch_us(ts) - epoch_us(lag_ts) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session, event_id
           FROM lagd),
         sids AS (SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM flags),
         sess AS (SELECT user_id, sid, MIN(ts) AS s,
             MAX(ts) + INTERVAL 30 MINUTE AS e
           FROM sids GROUP BY 1, 2),
         deltas AS (SELECT s AS t, 1 AS d FROM sess
                    UNION ALL SELECT e, -1 FROM sess),
         run AS (SELECT t, d, date_trunc('hour', t) AS h,
             SUM(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS run
           FROM deltas)
         SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(MAX(run) AS BIGINT) AS max_concurrency,
           CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_starts,
           CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ends
         FROM run GROUP BY h ORDER BY hour_start""",
    "text_js_divergence" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
           FROM documents),
         stf AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cs
                 FROM tok GROUP BY 1, 2),
         ctf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cc
                 FROM tok GROUP BY 1),
         st AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS ns,
                  CAST(COUNT(*) AS BIGINT) AS n_types
                FROM stf GROUP BY 1),
         ct AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc FROM ctf),
         pt AS (SELECT s.source,
             CAST(((p * log2(p / m) + q * log2(q / m)) / 2)
               AS DECIMAL(28,10)) AS term_js,
             CAST(q / 2 AS DECIMAL(28,10)) AS q_present_half
           FROM (SELECT s.source,
                   CAST(s.cs AS DOUBLE) / t.ns AS p,
                   CAST(c.cc AS DOUBLE) / x.nc AS q,
                   (CAST(s.cs AS DOUBLE) / t.ns +
                    CAST(c.cc AS DOUBLE) / x.nc) / 2 AS m
                 FROM stf s JOIN ctf c ON s.tok = c.tok
                      JOIN st t ON s.source = t.source
                      CROSS JOIN ct x) s)
         SELECT g.source, t.ns AS n_tok, t.n_types,
           ROUND(CAST(g.jsp AS DOUBLE) +
             (0.5 - CAST(g.qp AS DOUBLE)), 4) AS jsd
         FROM (SELECT source, SUM(term_js) AS jsp,
                 SUM(q_present_half) AS qp
               FROM pt GROUP BY 1) g
         JOIN st t ON g.source = t.source
         ORDER BY g.source""",
    "events_ab_test" ->
      """WITH v AS (SELECT user_id, ts FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
         conv AS (SELECT DISTINCT v.user_id FROM v JOIN p
               ON v.user_id = p.user_id
              AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
               AS converted
           FROM (SELECT DISTINCT user_id FROM v) u
           LEFT JOIN conv c ON u.user_id = c.user_id),
         arms AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
               AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
           FROM pu GROUP BY 1),
         a AS (SELECT n_users AS n_a, n_conv AS c_a FROM arms
               WHERE arm = 'A'),
         b AS (SELECT n_users AS n_b, n_conv AS c_b FROM arms
               WHERE arm = 'B')
         SELECT n_a, c_a, n_b, c_b,
           ROUND(CAST(c_a AS DOUBLE) / n_a, 4) AS rate_a,
           ROUND(CAST(c_b AS DOUBLE) / n_b, 4) AS rate_b,
           CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
             ROUND((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a) /
               sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
                 (1.0 / n_a + 1.0 / n_b)), 4)
           END AS z
         FROM a, b""",
    "text_cdc_chunks" ->
      """WITH w AS (SELECT doc_id, w, pos,
             CASE WHEN substr(md5(w), 1, 1) = '0' THEN 1 ELSE 0 END AS b
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
                 FROM documents) u),
         c AS (SELECT *, SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS UNBOUNDED PRECEDING) AS cid FROM w),
         chunks AS (SELECT doc_id, cid,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             md5(string_agg(w, ' ' ORDER BY pos)) AS fp
           FROM c GROUP BY doc_id, cid),
         occ AS (SELECT fp, COUNT(*) AS n_occ FROM chunks GROUP BY fp)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(CASE WHEN n_occ > 1 THEN n_words ELSE 0 END)
             AS DOUBLE) / SUM(n_words), 4) AS dup_word_mass
         FROM chunks JOIN occ USING (fp)
         GROUP BY doc_id ORDER BY doc_id""",
    "text_ngram_novelty" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         firsts AS (SELECT shingle, MIN(doc_id) AS first_doc
                    FROM sh GROUP BY shingle),
         per_doc AS (SELECT s.doc_id, COUNT(*) AS n_sh,
             SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
           FROM sh s JOIN firsts f ON s.shingle = f.shingle
           GROUP BY s.doc_id),
         tot AS (SELECT COUNT(*) AS n_total FROM documents)
         SELECT CAST(FLOOR(doc_id * 10 / n_total) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(n_novel) AS DOUBLE) / CAST(SUM(n_sh) AS DOUBLE), 4)
             AS novelty_rate
         FROM per_doc, tot
         GROUP BY 1 ORDER BY decile""",
    "text_token_entropy" ->
      """WITH tf AS (SELECT doc_id, tok, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents) t
           GROUP BY doc_id, tok)
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(n_types AS BIGINT) AS n_types,
           ROUND(log2(CAST(n_tok AS DOUBLE)) -
             CAST(clogc AS DOUBLE) / CAST(n_tok AS DOUBLE), 3) AS entropy
         FROM (SELECT doc_id, SUM(c) AS n_tok, COUNT(*) AS n_types,
             SUM(CAST(c * log2(CAST(c AS DOUBLE)) AS DECIMAL(28,8))) AS clogc
           FROM tf GROUP BY doc_id) g
         ORDER BY doc_id""",
    "ts_decompose" -> tsDecomposeOracle,
    "events_anomaly_stl" ->
      s"""WITH dec AS (SELECT * FROM ($tsDecomposeOracle) q),
         med AS (SELECT event_type, median(residual) AS med
                 FROM dec GROUP BY 1),
         mad AS (SELECT d.event_type, m.med,
             median(abs(d.residual - m.med)) AS mad
           FROM dec d JOIN med m ON d.event_type = m.event_type
           GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.n, d.residual,
           ROUND(a.med, 4) AS resid_median,
           ROUND(a.mad * 2.0, 4) AS gate
         FROM dec d JOIN mad a ON d.event_type = a.event_type
         WHERE abs(d.residual - a.med) > a.mad * 2.0
         ORDER BY d.event_type, d.day""",
    "sim_pca_power" -> pcaPowerOracle,
    "sim_pca_project" ->
      s"""WITH cq AS (SELECT j,
             CAST(ROUND(component * 1e6) AS BIGINT) AS cq
           FROM ($pcaPowerOracle) pw),
         xq AS (SELECT vec_id, j - 1 AS j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS xq
           FROM (SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS j
                 FROM embeddings) t),
         proj AS (SELECT vec_id, CAST(SUM(xq.xq * cq.cq) AS BIGINT) AS p
           FROM xq JOIN cq USING (j) GROUP BY 1),
         b AS (SELECT MIN(p) AS lo, MAX(p) AS hi FROM proj)
         SELECT CAST(FLOOR((p - lo) * 8 / (hi - lo + 1)) AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND((CAST(SUM(p) AS DOUBLE) / COUNT(*)) / 1e12, 6)
             AS mean_proj
         FROM proj, b GROUP BY 1 ORDER BY bin""",
    "docs_pii_scrub" ->
      """WITH inj AS (SELECT lang, text ||
             CASE WHEN doc_id % 5 = 0
                  THEN ' contact user' || CAST(doc_id AS VARCHAR) ||
                       '@mail.test please' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' card 4111111111111111 on file' ELSE '' END AS t0
           FROM documents),
         sc AS (SELECT lang, t0, regexp_replace(regexp_replace(t0,
             '[a-z0-9._-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
             '[0-9]{13,19}', '<NUM>', 'g') AS t2
           FROM inj)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(t2, '<EMAIL>')) - 1) AS BIGINT)
             AS n_emails,
           CAST(SUM(len(string_split(t2, '<NUM>')) - 1) AS BIGINT)
             AS n_nums,
           CAST(SUM(length(t0) - length(t2)) AS BIGINT) AS chars_redacted
         FROM sc GROUP BY 1 ORDER BY lang""",
    "basket_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS item_orders
                FROM li GROUP BY 1),
         no AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
                FROM li),
         p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
                 CAST(COUNT(*) AS BIGINT) AS n_co
               FROM li a JOIN li b
                 ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 3)
         SELECT p1, p2, n_co, c1.item_orders AS c1, c2.item_orders AS c2,
           ROUND(CAST(n_co AS DOUBLE) * n_orders /
             (c1.item_orders * c2.item_orders), 6) AS lift
         FROM p JOIN ic c1 ON p.p1 = c1.l_partkey
                JOIN ic c2 ON p.p2 = c2.l_partkey, no
         ORDER BY n_co DESC, p1, p2""",
    "window_ewma" -> {
      val num = (0 to 7).map(k =>
        s"COALESCE(l$k * ${math.pow(2.0, -k)}, 0.0)").mkString(" + ")
      val den = (0 to 7).map(k =>
        s"CASE WHEN l$k IS NOT NULL THEN ${math.pow(2.0, -k)} ELSE 0.0 END")
        .mkString(" + ")
      val lags = (0 to 7).map(k => s"lag(n, $k) OVER w AS l$k")
        .mkString(", ")
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type, d, n, $lags
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY d))
         SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
           ROUND(($num) / ($den), 4) AS ewma
         FROM l ORDER BY event_type, day"""
    },
    "join_asof_nearest" ->
      """WITH w AS (
           SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_view_ts,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_view_ts
           FROM events),
         g AS (SELECT *,
             epoch_us(ts) - epoch_us(prev_view_ts) AS gap_back,
             epoch_us(next_view_ts) - epoch_us(ts) AS gap_fwd
           FROM w WHERE event_type = 'purchase'),
         d AS (SELECT *,
             CASE WHEN gap_back IS NOT NULL AND
                       (gap_fwd IS NULL OR gap_back <= gap_fwd)
                  THEN 'before'
                  WHEN gap_fwd IS NOT NULL THEN 'after'
                  ELSE 'none' END AS direction
           FROM g)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(CASE WHEN direction = 'before' THEN prev_view_ts
                         WHEN direction = 'after' THEN next_view_ts END,
                    '%Y-%m-%d %H:%M:%S') AS nearest_view_ts,
           direction,
           CASE WHEN direction = 'before' THEN gap_back
                WHEN direction = 'after' THEN gap_fwd END AS gap_us
         FROM d ORDER BY event_id""",
    "dedup_cluster_census" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cl AS (SELECT node, MIN(lbl) AS cluster_id FROM walk GROUP BY node),
         csizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
           FROM cl GROUP BY 1),
         hist AS (SELECT csize, CAST(COUNT(*) AS BIGINT) AS n_clusters
           FROM csizes GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
         cls AS (SELECT CAST(COALESCE(SUM(csize), 0) AS BIGINT)
           AS n_clustered FROM csizes),
         uni AS (SELECT csize, n_clusters FROM hist
           UNION ALL SELECT CAST(1 AS BIGINT), n_total - n_clustered
           FROM tot, cls)
         SELECT csize AS cluster_size, n_clusters,
           CAST(csize * n_clusters AS BIGINT) AS n_docs,
           CAST((csize - 1) * n_clusters AS BIGINT) AS n_dup_docs,
           ROUND(CAST(csize * n_clusters AS DOUBLE) / n_total, 6)
             AS doc_share
         FROM uni, tot ORDER BY cluster_size""",
    "stream_join_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts
         FROM events p JOIN events v ON v.user_id = p.user_id
           AND p.event_type = 'purchase' AND v.event_type = 'view'
           AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
         ORDER BY purchase_id, view_ts""",
    "stream_session_windows" ->
      """SELECT user_id,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, value, event_id,
               CASE WHEN lag_ts IS NULL
                         OR epoch_us(ts) - epoch_us(lag_ts) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
             FROM (
               SELECT user_id, ts, value, event_id,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
               FROM events) a) b) c
         GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "merge_upsert" ->
      """WITH target AS (
           SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
           FROM customer WHERE c_custkey % 3 <> 0),
         source AS (
           SELECT o_custkey AS key,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS delta
           FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
         SELECT COALESCE(t.key, s.key) AS key,
           CASE WHEN t.bal IS NOT NULL AND s.delta IS NOT NULL THEN 'update'
                WHEN t.bal IS NULL THEN 'insert' ELSE 'keep' END AS action,
           CAST(COALESCE(t.bal, 0) + COALESCE(s.delta, 0) AS DOUBLE) AS new_bal
         FROM target t FULL OUTER JOIN source s ON t.key = s.key
         ORDER BY key""",
    "scd2_history" ->
      """WITH runs AS (
           SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
           FROM (
             SELECT user_id, event_type, ts, event_id,
               CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                      ORDER BY ts, event_id) IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
             FROM events) a),
         agg AS (
           SELECT user_id, run_id, event_type, MIN(ts) AS vf,
                  COUNT(*) AS n_events
           FROM runs GROUP BY 1, 2, 3)
         SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id),
                             '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           n_events
         FROM agg ORDER BY user_id, run_id""",
    "gap_fill_hourly" ->
      """WITH spine AS (
           SELECT s.h AS hour_start, t.event_type
           FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-02 23:00:00',
                                INTERVAL 1 HOUR) s(h)
           CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
         observed AS (
           SELECT date_trunc('hour', ts) AS hour_start, event_type,
                  COUNT(*) AS n,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                        / COUNT(*), 6) AS avg_raw
           FROM events
           WHERE value > 100 AND ts < TIMESTAMP '2024-01-03 00:00:00'
           GROUP BY 1, 2)
         SELECT sp.event_type,
           strftime(sp.hour_start, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(o.n, 0) AS n,
           COALESCE(last_value(o.avg_raw IGNORE NULLS) OVER (
             PARTITION BY sp.event_type ORDER BY sp.hour_start
             ROWS UNBOUNDED PRECEDING), -1.0) AS filled_avg
         FROM spine sp LEFT JOIN observed o
           ON sp.hour_start = o.hour_start AND sp.event_type = o.event_type
         ORDER BY sp.event_type, hour_start""",
    "agg_collect" ->
      """WITH base AS (
           SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                    AS statuses
           FROM orders GROUP BY 1),
         mx AS (SELECT o_orderpriority, o_orderkey AS top_key FROM (
           SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey DESC) AS r
           FROM orders) WHERE r = 1),
         mn AS (SELECT o_orderpriority, o_orderkey AS bot_key FROM (
           SELECT o_orderpriority, o_orderkey, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey) AS r
           FROM orders) WHERE r = 1)
         SELECT base.o_orderpriority, n, statuses, top_key, bot_key
         FROM base JOIN mx USING (o_orderpriority) JOIN mn USING (o_orderpriority)
         ORDER BY base.o_orderpriority""",
    "lateral_topn" ->
      """SELECT n_name, t.c_custkey, CAST(t.c_acctbal AS DOUBLE) AS acctbal
         FROM nation,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer
                  WHERE c_nationkey = n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
         ORDER BY n_name, acctbal DESC, c_custkey""",
    "text_chunks" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS l
                    FROM documents WHERE doc_id < 40),
         c AS (SELECT doc_id, l,
                 unnest(generate_series(0, CAST(greatest(0,
                   ceil((len(l) - 40) / 20.0)) AS BIGINT))) AS chunk_idx
               FROM s)
         SELECT doc_id, chunk_idx,
           md5(array_to_string(l[(chunk_idx*20+1):(chunk_idx*20+40)], ' '))
             AS chunk_md5,
           CAST(len(l[(chunk_idx*20+1):(chunk_idx*20+40)]) AS BIGINT)
             AS n_words
         FROM c ORDER BY doc_id, chunk_idx""",
    "sample_stratified" ->
      """WITH h AS (SELECT lang, source, n_chars,
           (strpos('0123456789abcdef',
              substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
              substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) AS b
         FROM documents)
         SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM h WHERE b < CASE WHEN lang = 'en' THEN 64 ELSE 128 END
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "feature_zscore" ->
      """WITH stats AS (
           SELECT event_type, COUNT(*) AS n,
                  SUM(CAST(value AS DECIMAL(28,4))) AS s,
                  SUM(CAST(CAST(value AS DECIMAL(18,4))
                       * CAST(value AS DECIMAL(18,4)) AS DECIMAL(38,8))) AS ss
           FROM events GROUP BY 1)
         SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - CAST(s AS DOUBLE) / n)
             / sqrt(CAST(ss AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
             AS z
         FROM events e JOIN stats USING (event_type)
         WHERE e.event_id < 300
         ORDER BY e.event_id""",
    "dq_profile" ->
      """WITH
         c1 AS (SELECT 'o_custkey' AS "column", COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_null,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_num,
           CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           FROM orders),
         c2 AS (SELECT 'o_totalprice', COUNT(*),
           COUNT(*) - COUNT(o_totalprice),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           MIN(o_totalprice), MAX(o_totalprice), NULL, NULL FROM orders),
         c3 AS (SELECT 'o_orderdate', COUNT(*),
           COUNT(*) - COUNT(o_orderdate),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT), NULL, NULL,
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') FROM orders),
         c4 AS (SELECT 'o_orderpriority', COUNT(*),
           COUNT(*) - COUNT(o_orderpriority),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), NULL, NULL,
           MIN(o_orderpriority), MAX(o_orderpriority) FROM orders),
         c5 AS (SELECT 'o_orderstatus', COUNT(*),
           COUNT(*) - COUNT(o_orderstatus),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), NULL, NULL,
           MIN(o_orderstatus), MAX(o_orderstatus) FROM orders)
         SELECT * FROM c1 UNION ALL SELECT * FROM c2
         UNION ALL SELECT * FROM c3
         UNION ALL SELECT * FROM c4
         UNION ALL SELECT * FROM c5
         ORDER BY "column"""",
    "mm_audio_energy" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 256 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         z AS (SELECT doc_id, energy,
             MAX(energy) OVER (PARTITION BY doc_id) AS peak FROM wins)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(MAX(energy) AS BIGINT) AS peak_energy,
           CAST(SUM(CASE WHEN energy * 10 >= peak * 9 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_near_peak,
           ROUND(CAST(SUM(CASE WHEN energy * 10 >= peak * 9
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS near_peak_ratio
         FROM z GROUP BY doc_id ORDER BY doc_id""",
    "mm_resize" ->
      """WITH d AS (SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
           text, CAST(length(text) AS BIGINT) AS orig_len,
           CAST(ceil(length(text) / 64.0) AS BIGINT) AS nf
           FROM documents WHERE doc_id < 200),
         k AS (SELECT *, greatest(1, CAST(ceil(nf / 8.0) AS BIGINT))
                 AS stride FROM d),
         fr AS (SELECT doc_id, modality, orig_len, stride, text,
                  unnest(generate_series(0, nf - 1)) AS f FROM k),
         kept AS (SELECT doc_id, modality, orig_len,
             string_agg(substr(text, CAST(f * 64 + 1 AS BIGINT), 64),
                        '' ORDER BY f) AS resized
           FROM fr WHERE f % stride = 0 GROUP BY 1, 2, 3)
         SELECT doc_id, modality, orig_len,
           CAST(length(resized) AS BIGINT) AS resized_len,
           md5(resized) AS resized_md5
         FROM kept ORDER BY doc_id""",
    "window_firstlast" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders WHERE o_custkey < 300
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "join_nullsafe" ->
      """WITH ev AS (SELECT CASE WHEN CAST(json_extract_string(props, '$.k')
             AS INTEGER) < 10 THEN NULL
             ELSE CAST(json_extract_string(props, '$.k') AS INTEGER) % 5
           END AS k10 FROM events),
         dim AS (SELECT DISTINCT k10 AS dk,
             COALESCE('b' || CAST(k10 AS VARCHAR), 'b_null') AS bucket_label
           FROM ev)
         SELECT bucket_label, COUNT(*) AS n
         FROM ev JOIN dim ON ev.k10 IS NOT DISTINCT FROM dim.dk
         GROUP BY 1 ORDER BY 1""",
    "dedup_keep_best" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2)
         SELECT x.d1, x.d2 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                           JOIN sizes s2 ON x.d2 = s2.doc_id
         WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node),
         cl AS (SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
                FROM walk GROUP BY node),
         j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars,
                 ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                   ORDER BY d.n_chars DESC, cl.doc_id) AS r
               FROM cl JOIN documents d USING (doc_id))
         SELECT j.cluster_id, j.doc_id AS keep_doc_id,
           CAST(j.n_chars AS BIGINT) AS keep_n_chars, m.n_members
         FROM j JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
                      FROM j GROUP BY 1) m USING (cluster_id)
         WHERE j.r = 1 ORDER BY j.cluster_id""",
    "set_ops_all" ->
      """WITH f AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
         o AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
         ea AS (SELECT 'except_all' AS op, o_orderpriority FROM
           (SELECT o_orderpriority FROM f EXCEPT ALL
            SELECT o_orderpriority FROM o)),
         ia AS (SELECT 'intersect_all' AS op, o_orderpriority FROM
           (SELECT o_orderpriority FROM f INTERSECT ALL
            SELECT o_orderpriority FROM o))
         SELECT op, o_orderpriority, COUNT(*) AS n
         FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "page_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
         FROM orders ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 20 OFFSET 40""",
    "regr_price_qty" ->
      """WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
           SUM(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_quantity AS DECIMAL(19,4))) AS sxx,
           SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS syy,
           SUM(CAST(l_quantity AS DECIMAL(19,4))
                * CAST(l_extendedprice AS DECIMAL(19,4))) AS sxy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM m ORDER BY l_returnflag""",
    "stream_static_join" ->
      """SELECT 'T_' || upper(event_type) AS type_label, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
         FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "user_journey" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type
                    FROM events),
         f AS (SELECT user_id, event_type AS first_type FROM (
           SELECT user_id, event_type, ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY tsu, event_id) AS r FROM e)
           WHERE r = 1),
         l AS (SELECT user_id, event_type AS last_type FROM (
           SELECT user_id, event_type, ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY tsu DESC, event_id DESC) AS r FROM e)
           WHERE r = 1),
         s AS (SELECT user_id, COUNT(*) AS n_events,
                 (MAX(tsu) - MIN(tsu)) // 1000000 AS span_seconds
               FROM e GROUP BY 1)
         SELECT s.user_id, s.n_events, f.first_type, l.last_type,
                s.span_seconds
         FROM s JOIN f USING (user_id) JOIN l USING (user_id)
         ORDER BY s.user_id""",
    "array_hof" ->
      """SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum')
             AS BIGINT) AS total_chars,
           CAST(len(list_filter(w, x -> length(x) > 5)) AS BIGINT) AS n_long,
           len(list_filter(w, x -> length(x) > 9)) > 0 AS has_very_long,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_filter(w, x -> length(x) > 6)))[1:3], ','), '') AS top_long
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE doc_id < 50)
         ORDER BY doc_id""",
    "agg_bool_listagg" ->
      """SELECT o_orderpriority,
           bool_and(o_orderstatus = 'F') AS all_f,
           bool_or(o_orderstatus = 'P') AS any_p,
           CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_open,
           string_agg(DISTINCT o_orderstatus, ','
             ORDER BY o_orderstatus) AS statuses
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_items
         FROM customer, orders, lineitem, nation
         WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
           AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty
           FROM lineitem GROUP BY 1
           HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) > 250)
         SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice, sum_qty
         FROM big JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
         ORDER BY sum_qty DESC, o_orderkey LIMIT 100""",
    "agg_mode_median" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
                    FROM orders GROUP BY 1, 2),
         m AS (SELECT o_orderpriority, o_orderstatus AS mode_status,
                 CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)
                   AS n_orders,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY n DESC, o_orderstatus DESC) AS rn
               FROM c),
         md AS (SELECT o_orderpriority,
                  ROUND(MEDIAN(o_totalprice), 4) AS median_price
                FROM orders GROUP BY 1)
         SELECT m.o_orderpriority, m.mode_status, m.n_orders, md.median_price
         FROM m JOIN md USING (o_orderpriority)
         WHERE rn = 1 ORDER BY m.o_orderpriority""",
    "dq_checks" ->
      """SELECT 'orders_pk_unique' AS check,
           CAST(SUM(n - 1) AS BIGINT) AS n_violations,
           COUNT(*) AS n_checked
         FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
         UNION ALL
         SELECT 'lineitem_fk_orders',
           COUNT(*) FILTER (o.o_orderkey IS NULL), COUNT(*)
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         UNION ALL
         SELECT 'customer_fk_nation',
           COUNT(*) FILTER (n.n_nationkey IS NULL), COUNT(*)
         FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         UNION ALL
         SELECT 'orders_status_domain',
           COUNT(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')), COUNT(*)
         FROM orders
         UNION ALL
         SELECT 'lineitem_qty_range',
           COUNT(*) FILTER (l_quantity IS NULL
             OR l_quantity < 1 OR l_quantity > 50), COUNT(*)
         FROM lineitem
         ORDER BY 1""",
    "graph_pagerank" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         ew AS (SELECT src, dst, CAST(w AS DOUBLE) /
                  CAST(SUM(w) OVER (PARTITION BY src) AS DOUBLE) AS ratio
                FROM edges),
         nodes AS (SELECT DISTINCT src AS node FROM edges
                   UNION SELECT DISTINCT dst FROM edges),
         params AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nodes),
         pr0 AS (SELECT node, 1.0 / nn AS pr FROM nodes CROSS JOIN params),
         c1 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr0 ON ew.src = pr0.node GROUP BY dst),
         pr1 AS (SELECT node, 0.15 / nn + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes CROSS JOIN params
                 LEFT JOIN c1 ON c1.dst = nodes.node),
         c2 AS (SELECT dst, CAST(SUM(CAST(pr * ratio AS DECIMAL(28,12)))
                  AS DOUBLE) AS contrib
                FROM ew JOIN pr1 ON ew.src = pr1.node GROUP BY dst),
         pr2 AS (SELECT node, 0.15 / nn + 0.85 * COALESCE(contrib, 0.0) AS pr
                 FROM nodes CROSS JOIN params
                 LEFT JOIN c2 ON c2.dst = nodes.node)
         SELECT n_name, ROUND(pr, 8) AS pagerank
         FROM pr2 JOIN nation ON node = n_nationkey
         ORDER BY pagerank DESC, n_name""",
    "sim_kmeans_iter" ->
      """WITH seeds AS (
           SELECT vec_id AS seed_id, embedding AS seed_emb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         sims AS (
           SELECT e.vec_id, s.seed_id,
             list_cosine_similarity(e.embedding, s.seed_emb) AS sim
           FROM embeddings e CROSS JOIN seeds s),
         best AS (
           SELECT vec_id, seed_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, seed_id) AS rn
           FROM sims)
         SELECT seed_id, COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos
         FROM best WHERE rn = 1
         GROUP BY seed_id ORDER BY seed_id""",
    "text_pmi" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
                        FROM documents),
         tok AS (SELECT doc_id, unnest(w) AS word,
                   generate_subscripts(w, 1) AS pos FROM words),
         bi AS (SELECT a.word AS w1, b.word AS w2
                FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
                FROM bi GROUP BY 1, 2),
         uc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cu
                FROM tok GROUP BY 1),
         tots AS (SELECT CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) AS n_uni,
                         CAST((SELECT COUNT(*) FROM bi) AS DOUBLE) AS n_bi)
         SELECT w1, w2, n_pair,
           ROUND((CAST(n_pair AS DOUBLE) / n_bi) /
             ((CAST(u1.cu AS DOUBLE) / n_uni)
              * (CAST(u2.cu AS DOUBLE) / n_uni)), 4) AS lift,
           ROUND(ln((CAST(n_pair AS DOUBLE) / n_bi) /
             ((CAST(u1.cu AS DOUBLE) / n_uni)
              * (CAST(u2.cu AS DOUBLE) / n_uni))), 6) AS pmi
         FROM bc JOIN uc u1 ON bc.w1 = u1.word
                 JOIN uc u2 ON bc.w2 = u2.word
                 CROSS JOIN tots
         WHERE n_pair >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 25""",
    "text_normalize" ->
      """WITH raw AS (SELECT doc_id,
           'Cafe' || chr(769) || ' nai' || chr(776) || 've '
             || substr(text, 1, 40) AS raw
           FROM documents WHERE doc_id < 10),
         n AS (SELECT doc_id, length(raw) AS len_raw,
                 nfc_normalize(raw) AS nfc FROM raw)
         SELECT doc_id, len_raw, length(nfc) AS len_nfc,
           md5(nfc) AS nfc_md5,
           substr(lower(strip_accents(nfc)), 1, 24) AS folded
         FROM n ORDER BY doc_id""",
    "mm_phash_hamming" ->
      """WITH fr AS (SELECT doc_id, unnest(list_distinct(
             [substr(text, i*64 + 1, 64)
              for i in range(0, (length(text) + 63) // 64)])) AS frame
           FROM documents),
         h AS (SELECT doc_id, substr(md5(frame), 1, 16) AS hx FROM fr),
         bits AS (
           SELECT doc_id, j,
             SUM(CASE WHEN ((strpos('0123456789abcdef',
                               substr(hx, CAST(j // 4 AS INT) + 1, 1)) - 1)
                   // (CASE CAST(j % 4 AS INT) WHEN 0 THEN 8 WHEN 1 THEN 4
                       WHEN 2 THEN 2 ELSE 1 END)) % 2 = 1
                 THEN 1 ELSE -1 END) AS s
           FROM h CROSS JOIN range(64) t(j) GROUP BY doc_id, j),
         sig AS (SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS sig
           FROM bits GROUP BY doc_id),
         cand AS (SELECT x.doc_id AS d1, y.doc_id AS d2,
             x.sig AS s1, y.sig AS s2
           FROM sig x JOIN sig y ON x.doc_id < y.doc_id)
         SELECT d1, d2,
           CAST(len(list_filter(range(1, 65),
             i -> substr(s1, CAST(i AS INT), 1)
               <> substr(s2, CAST(i AS INT), 1))) AS BIGINT) AS hamming
         FROM cand
         WHERE len(list_filter(range(1, 65),
             i -> substr(s1, CAST(i AS INT), 1)
               <> substr(s2, CAST(i AS INT), 1))) <= 7
         ORDER BY d1, d2""",
    "q14_promo_revenue" ->
      """SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(1-l_discount AS DECIMAL(4,2))
             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS promo_rev,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_rev,
         ROUND(100.0 * promo_rev / total_rev, 6) AS promo_pct
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",
    "window_mom_change" ->
      """WITH m AS (
           SELECT l_returnflag, strftime(l_shipdate, '%Y-%m') AS month,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
           FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag, month, rev,
           LAG(rev) OVER (PARTITION BY l_returnflag ORDER BY month) AS prev_rev,
           ROUND(100.0 * (rev - LAG(rev) OVER (PARTITION BY l_returnflag
             ORDER BY month)) / LAG(rev) OVER (PARTITION BY l_returnflag
             ORDER BY month), 6) AS mom_pct
         FROM m ORDER BY l_returnflag, month""",
    "events_transitions" ->
      """WITH nx AS (
           SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         c AS (SELECT from_type, to_type, COUNT(*) AS n
               FROM nx WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           ROUND(CAST(n AS DOUBLE) /
             CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
         FROM c ORDER BY from_type, to_type""",
    "sim_quantize_int8" ->
      """WITH v AS (
           SELECT label, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS maxabs
           FROM embeddings),
         s AS (SELECT label, embedding,
             127.0 / CAST(maxabs AS DOUBLE) AS scale
           FROM v WHERE maxabs > 0),
         q AS (SELECT label, embedding, scale,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INT)) AS q
           FROM s),
         e AS (SELECT label, scale, q,
             list_max([abs(CAST(embedding[i] AS DOUBLE)
                 - CAST(q[i] AS DOUBLE) / scale)
               for i in range(1, len(embedding) + 1)]) AS err
           FROM q)
         SELECT label, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(list_sum(q) AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(SUM(len(list_filter(q, x -> abs(x) = 127))) AS BIGINT) AS n_sat,
           ROUND(MAX(err), 6) AS max_err
         FROM e GROUP BY label ORDER BY label""",
    "q2_min_acctbal_supplier" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         esupp AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE')
         SELECT p_partkey, s_name, s_acctbal
         FROM part
         JOIN ps ON p_partkey = l_partkey
         JOIN esupp ON l_suppkey = s_suppkey
         WHERE p_type = 'STANDARD' AND p_size <= 10
           AND s_acctbal = (SELECT MIN(s2.s_acctbal) FROM ps ps2
                            JOIN esupp s2 ON ps2.l_suppkey = s2.s_suppkey
                            WHERE ps2.l_partkey = p_partkey)
         ORDER BY s_acctbal, p_partkey, s_name LIMIT 100""",
    // approx gates: the oracle cannot reproduce engine-specific sketch
    // estimates, so both sides emit the EXACT values plus within-bound
    // booleans (oracle: literal TRUE). Estimate drift flips the Spark
    // boolean -> hash mismatch -> red row. See Relational.approxStats.
    "approx_stats" ->
      """SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS parts_within_bound,
           ROUND(quantile_cont(l_quantity, 0.5), 2) AS exact_median,
           TRUE AS median_within_bound
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "sketch_hll" ->
      """WITH per AS (SELECT o_orderpriority, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS exact_distinct
           FROM orders GROUP BY 1),
         tot AS (SELECT 'ALL' AS o_orderpriority, COUNT(*) AS n_rows,
             COUNT(DISTINCT o_custkey) AS exact_distinct
           FROM orders)
         SELECT o_orderpriority, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           TRUE AS est_within_bound
         FROM (SELECT * FROM per UNION ALL SELECT * FROM tot)
         ORDER BY o_orderpriority""",
    "q7_volume_shipping" ->
      """WITH agg AS (
           SELECT supp_nation, cust_nation, yr,
             SUM(volume) AS rev_dec, COUNT(*) AS n
           FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS yr,
                   CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(1-l_discount AS DECIMAL(4,2)) AS volume
                 FROM lineitem
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation n1 ON s_nationkey = n1.n_nationkey
                 JOIN nation n2 ON c_nationkey = n2.n_nationkey
                 WHERE n1.n_name <> n2.n_name)
           GROUP BY 1, 2, 3),
         ranked AS (
           SELECT *, SUM(n) OVER (PARTITION BY
               least(supp_nation, cust_nation),
               greatest(supp_nation, cust_nation)) AS pair_total
           FROM agg),
         top AS (
           SELECT *, DENSE_RANK() OVER (ORDER BY pair_total DESC,
               least(supp_nation, cust_nation),
               greatest(supp_nation, cust_nation)) AS rk
           FROM ranked)
         SELECT supp_nation, cust_nation, yr,
           CAST(rev_dec AS DOUBLE) AS revenue, n
         FROM top WHERE rk = 1 ORDER BY 1, 2, 3""",
    "q8_market_share" ->
      """SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS nation_rev,
           CAST(SUM(volume) AS DOUBLE) AS total_rev,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
               ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
         FROM (SELECT n1.n_name AS supp_nation,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1-l_discount AS DECIMAL(4,2)) AS volume
               FROM lineitem
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
               JOIN nation n1 ON s_nationkey = n1.n_nationkey
               JOIN nation n2 ON c_nationkey = n2.n_nationkey
               JOIN region ON n2.n_regionkey = r_regionkey
               WHERE r_name = 'ASIA')
         GROUP BY yr ORDER BY yr""",
    "q9_product_profit" ->
      """SELECT nation, yr, CAST(SUM(profit) AS DOUBLE) AS sum_profit
         FROM (SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS yr,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1-l_discount AS DECIMAL(4,2))
                 - CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(0.1 AS DECIMAL(3,1)) AS profit
               FROM lineitem
               JOIN part ON l_partkey = p_partkey
               JOIN supplier ON l_suppkey = s_suppkey
               JOIN nation ON s_nationkey = n_nationkey
               WHERE p_type = 'PROMO')
         GROUP BY 1, 2 ORDER BY nation, yr""",
    "q13_order_distribution" ->
      """SELECT n_orders, COUNT(*) AS n_customers
         FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
               FROM customer LEFT JOIN orders
                 ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
               GROUP BY c_custkey)
         GROUP BY n_orders ORDER BY n_customers DESC, n_orders DESC""",
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey AS suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1-l_discount AS DECIMAL(4,2))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
         FROM supplier JOIN rev ON s_suppkey = suppkey
         WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
         ORDER BY s_suppkey""",
    "q17_small_qty_revenue" ->
      """WITH b3 AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'),
         pq AS (SELECT l_partkey AS pk,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
             COUNT(*) AS cnt
           FROM lineitem JOIN b3 ON l_partkey = p_partkey
           GROUP BY l_partkey)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
         FROM lineitem JOIN b3 ON l_partkey = p_partkey
         JOIN pq ON l_partkey = pk
         WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty""",
    "q19_disjunctive_revenue" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 40)""",
    "q21_waiting_supplier" ->
      """WITH ol AS (SELECT l_orderkey AS okey, l_suppkey AS skey,
             MAX(l_shipdate) AS ship
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F' GROUP BY 1, 2)
         SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         FROM ol a JOIN supplier ON a.skey = s_suppkey
         WHERE EXISTS (SELECT 1 FROM ol b
                 WHERE b.okey = a.okey AND b.skey <> a.skey)
           AND NOT EXISTS (SELECT 1 FROM ol c
                 WHERE c.okey = a.okey AND c.skey <> a.skey
                   AND c.ship >= a.ship)
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q11_important_parts" ->
      """WITH esupp AS (SELECT s_suppkey FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         v AS (SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1-l_discount AS DECIMAL(4,2))) AS val_dec
           FROM lineitem
           WHERE l_suppkey IN (SELECT s_suppkey FROM esupp)
           GROUP BY l_partkey)
         SELECT partkey, CAST(val_dec AS DOUBLE) AS value
         FROM v
         WHERE CAST(val_dec AS DECIMAL(28,4)) * 1000 >
           (SELECT SUM(val_dec) FROM v)
         ORDER BY value DESC, partkey""",
    "q12_priority_lateness" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_shipdate > o_orderdate + INTERVAL 90 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1500)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q20_dominant_supplier" ->
      """WITH pq AS (SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             AND l_partkey IN
               (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
           GROUP BY 1, 2),
         t AS (SELECT *, SUM(q) OVER (PARTITION BY l_partkey) AS tot FROM pq)
         SELECT s_name, s_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND s_suppkey IN (SELECT l_suppkey FROM t WHERE q * 2 > tot)
         ORDER BY s_name""",
    "q22_idle_balances" ->
      """WITH lapsed AS (
           SELECT c_custkey, c_name, c_acctbal FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')),
         pos AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
             COUNT(*) AS n
           FROM customer WHERE c_acctbal > 0)
         SELECT substring(c_name, 18, 1) AS code,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM lapsed, pos
         WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
         GROUP BY 1 ORDER BY 1""",
    "sim_recall_eval" ->
      """WITH q AS (SELECT vec_id AS q_id, label AS q_label,
             embedding AS q_emb
           FROM embeddings WHERE vec_id < 5),
         brute AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rn
           FROM embeddings, q WHERE vec_id <> q_id),
         blocked AS (SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                 vec_id) AS rn
           FROM embeddings e JOIN q ON e.label = q.q_label
           WHERE vec_id <> q_id),
         hits AS (SELECT b.q_id, COUNT(*) AS n_hits
           FROM brute b JOIN blocked bl
             ON b.q_id = bl.q_id AND b.vec_id = bl.vec_id AND bl.rn <= 10
           WHERE b.rn <= 10 GROUP BY b.q_id)
         SELECT q.q_id, CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / 10, 6)
             AS recall_at_10
         FROM q LEFT JOIN hits ON q.q_id = hits.q_id
         ORDER BY q.q_id""",
    "split_contamination" ->
      """WITH s AS (SELECT doc_id, md5(substring(text, 1, 64)) AS fp,
           CASE WHEN (strpos('0123456789abcdef',
                  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                < 204 THEN 'train'
                WHEN (strpos('0123456789abcdef',
                  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef',
                  substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                < 230 THEN 'val'
                ELSE 'test' END AS split
           FROM documents)
         SELECT a.split AS split_a, b.split AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_leaked_pairs,
           CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_leaked_texts
         FROM s a JOIN s b ON a.fp = b.fp AND a.doc_id < b.doc_id
           AND a.split <> b.split
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "text_vocab_coverage" ->
      """WITH cnt AS (SELECT lang, w, COUNT(*) AS c
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
                 FROM documents)
           GROUP BY 1, 2),
         rk AS (SELECT lang, c, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY c DESC, w) AS rn FROM cnt)
         SELECT lang,
           CAST(SUM(CASE WHEN rn <= 20 THEN c ELSE 0 END) AS BIGINT)
             AS top20_occurrences,
           CAST(SUM(c) AS BIGINT) AS total_occurrences,
           ROUND(CAST(SUM(CASE WHEN rn <= 20 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE), 6) AS coverage
         FROM rk GROUP BY lang ORDER BY lang""",
    "events_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, SUM(cnt) AS s, SUM(cnt*cnt) AS ss,
             COUNT(*) AS n
           FROM daily GROUP BY 1)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
           CAST(d.cnt AS BIGINT) AS cnt,
           ROUND((CAST(d.cnt AS DOUBLE) - CAST(st.s AS DOUBLE)/st.n)
             / sqrt(CAST(st.ss AS DOUBLE)/st.n
                 - (CAST(st.s AS DOUBLE)/st.n)*(CAST(st.s AS DOUBLE)/st.n)),
             4) AS z
         FROM daily d JOIN st ON d.event_type = st.event_type
         WHERE st.n > 1 AND (st.n * st.ss - st.s * st.s) > 0
           AND (d.cnt * st.n - st.s) * (d.cnt * st.n - st.s)
             >= 4 * (st.n * st.ss - st.s * st.s)
         ORDER BY d.event_type, day"""
    ,
    "sim_kmeans_lloyd2" ->
      """WITH seeds AS (
           SELECT vec_id AS cid, embedding AS cemb
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a1 AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT e.vec_id, e.embedding, s.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.cemb) DESC,
                          s.cid) AS rn
             FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
         dims AS (
           SELECT cid, generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM a1),
         cent2 AS (
           SELECT cid, list(CAST(c AS FLOAT) ORDER BY d) AS cemb
           FROM (SELECT cid, d,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                     AS DOUBLE) / COUNT(*) AS c
                 FROM dims GROUP BY cid, d)
           GROUP BY cid),
         a2 AS (
           SELECT vec_id, cid, sim FROM (
             SELECT e.vec_id, c.cid,
               list_cosine_similarity(e.embedding, c.cemb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.cemb) DESC,
                          c.cid) AS rn
             FROM embeddings e CROSS JOIN cent2 c) WHERE rn = 1)
         SELECT cid, COUNT(*) AS n_assigned,
           ROUND(CAST(SUM(CAST(CAST(sim AS DOUBLE) AS DECIMAL(18,9)))
             AS DOUBLE) / COUNT(*), 6) AS avg_cos
         FROM a2 GROUP BY cid ORDER BY cid""",
    "mix_weights" ->
      """WITH per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY lang),
         pers AS (SELECT lang, n_docs, n_tokens,
             CASE WHEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM per),
         tot AS (SELECT SUM(s) AS z FROM pers)
         SELECT lang, n_docs, n_tokens,
           ROUND(CAST(s AS DOUBLE) / CAST(z AS DOUBLE), 6) AS weight,
           CAST(ROUND(CAST(s * 50000 AS DOUBLE) / CAST(z AS DOUBLE), 0)
             AS BIGINT) AS target_tokens,
           ROUND(CAST(CAST(ROUND(CAST(s * 50000 AS DOUBLE)
               / CAST(z AS DOUBLE), 0) AS BIGINT) AS DOUBLE)
             / CAST(n_tokens AS DOUBLE), 4) AS epochs
         FROM pers, tot ORDER BY lang""",
    "text_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
         tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM tok),
         lm AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cw
           FROM tok GROUP BY 1)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
           ROUND(CAST(SUM(CAST(ln(CAST(cw AS DOUBLE) / n_total)
               AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_logprob
         FROM tok JOIN lm USING (word), tot
         GROUP BY doc_id
         ORDER BY mean_logprob, doc_id LIMIT 20""",
    "skew_profile" ->
      """WITH tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM orders),
         top AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY 1 ORDER BY n DESC, o_custkey LIMIT 10)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, o_custkey)
             AS BIGINT) AS rk,
           o_custkey, n,
           ROUND(n / n_total, 6) AS share,
           ROUND(SUM(n) OVER (ORDER BY n DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / n_total, 6) AS cum_share
         FROM top, tot ORDER BY rk""",
    "text_repetition" ->
      """WITH base AS (SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         d AS (SELECT base.source, base.n_tok,
             COALESCE(mb.max_bg, 0) AS max_bg,
             COALESCE(tr.n_tri, 0) AS n_tri,
             COALESCE(tr.dup_tri, 0) AS dup_tri
           FROM base LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN max_bg * 10 > n_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flag_top2,
           CAST(SUM(CASE WHEN dup_tri * 10 > n_tri * 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_flag_dup3,
           ROUND(CAST(SUM(max_bg * 2) AS DOUBLE)
             / CAST(SUM(n_tok) AS DOUBLE), 6) AS top2_frac_micro,
           CASE WHEN SUM(n_tri) > 0 THEN ROUND(CAST(SUM(dup_tri) AS DOUBLE)
             / CAST(SUM(n_tri) AS DOUBLE), 6) END AS dup3_frac_micro
         FROM d GROUP BY source ORDER BY source""",
    "pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         c AS (SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t),
         pw AS (SELECT source, (cum - n_tok) // 256 AS win,
             CAST(COUNT(*) AS BIGINT) AS docs_in_win,
             SUM(n_tok) AS tok_start
           FROM c GROUP BY 1, 2)
         SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
         FROM pw GROUP BY 1 ORDER BY 1""",
    "text_source_overlap" ->
      """WITH s AS (SELECT doc_id, source, md5(substr(text, 1, 64)) AS fp
           FROM documents),
         okf AS (SELECT fp FROM s GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 64)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_shared_fps
         FROM s a JOIN s b ON a.fp = b.fp AND a.source < b.source
         JOIN okf k ON k.fp = a.fp
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // text_boilerplate_lines: the same string_split + (i-1)//p line
    // boundary as paragraph_dedup; per-(source, line-text) df census,
    // drop-all removable mass for lines in >= 2 same-source docs
    "text_boilerplate_lines" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, source, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         ln AS MATERIALIZED (SELECT doc_id, source, (i - 1) // 10 AS lidx,
             string_agg(w, ' ' ORDER BY i) AS ltxt,
             CAST(COUNT(*) AS BIGINT) AS tok
           FROM tok GROUP BY 1, 2, 3),
         census AS (SELECT source, ltxt,
             CAST(COUNT(*) AS BIGINT) AS n_occ,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_line,
             MAX(tok) AS tok
           FROM ln GROUP BY 1, 2),
         boiler AS MATERIALIZED (SELECT * FROM census
           WHERE n_docs_line >= 2),
         totals AS (SELECT source,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(tok) AS BIGINT) AS total_tokens
           FROM ln GROUP BY 1),
         agg AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_boiler_lines,
             CAST(SUM(n_occ) AS BIGINT) AS boiler_occurrences,
             CAST(SUM(n_occ * tok) AS BIGINT) AS removable_tokens
           FROM boiler GROUP BY 1),
         aff AS (SELECT l.source,
             CAST(COUNT(DISTINCT l.doc_id) AS BIGINT) AS docs_affected
           FROM ln l JOIN boiler b
             ON l.source = b.source AND l.ltxt = b.ltxt
           GROUP BY 1)
         SELECT t.source, t.n_docs, t.n_lines, t.total_tokens,
           COALESCE(a.n_boiler_lines, 0) AS n_boiler_lines,
           COALESCE(a.boiler_occurrences, 0) AS boiler_occurrences,
           COALESCE(f.docs_affected, 0) AS docs_affected,
           COALESCE(a.removable_tokens, 0) AS removable_tokens,
           ROUND(CAST(COALESCE(a.removable_tokens, 0) AS DOUBLE)
             / CAST(t.total_tokens AS DOUBLE), 6) AS removable_share
         FROM totals t LEFT JOIN agg a USING (source)
         LEFT JOIN aff f USING (source)
         ORDER BY source""",
    // text_paragraph_dedup: non-overlapping 15-word chunks from the same
    // string_split relation; first-occurrence keep is a row_number over
    // the raw paragraph TEXT (the Spark side ranks xxhash64 fingerprints
    // — grouping text here doubles as the standing collision check)
    "text_paragraph_dedup" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           FROM documents),
         tok AS (SELECT doc_id, source, unnest(ws) AS w,
             generate_subscripts(ws, 1) AS i FROM d),
         para AS (SELECT doc_id, source, (i - 1) // 15 AS pidx,
             string_agg(w, ' ' ORDER BY i) AS ptxt,
             CAST(COUNT(*) AS BIGINT) AS ptok
           FROM tok GROUP BY 1, 2, 3),
         ranked AS (SELECT *, ROW_NUMBER() OVER
             (PARTITION BY ptxt ORDER BY doc_id, pidx) AS rn FROM para)
         SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_paras,
           CAST(SUM(ptok) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN rn = 1 THEN ptok ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           ROUND(1.0 - CAST(SUM(CASE WHEN rn = 1 THEN ptok ELSE 0 END)
               AS DOUBLE) / CAST(SUM(ptok) AS DOUBLE), 6) AS removed_frac
         FROM ranked GROUP BY source ORDER BY source""",
    "text_decontaminate" ->
      """WITH s AS (SELECT doc_id, source,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split,
             string_split(text, ' ') AS w
           FROM documents),
         tg AS (SELECT doc_id, source, unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'train'),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         contam AS (SELECT DISTINCT doc_id, source FROM tg
           WHERE g IN (SELECT g FROM bg))
         SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(COALESCE(MAX(c.n), 0) AS BIGINT) AS n_contaminated
         FROM (SELECT doc_id, source FROM s WHERE split = 'train') t
         LEFT JOIN (SELECT source, COUNT(*) AS n FROM contam GROUP BY 1) c
           ON t.source = c.source
         GROUP BY t.source ORDER BY t.source""",
    "docs_curation_pipeline" ->
      """WITH s AS (SELECT doc_id, source, text, string_split(text, ' ') AS w,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
               < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         t AS (SELECT doc_id, source, md5(text) AS fp_exact,
             CAST(len(w) AS BIGINT) AS n_tok,
             CAST(len(list_filter(w, x -> x IN
               ('the','a','of','and','to','in','is','for','on','with')))
               AS BIGINT) AS n_stop,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq
           FROM s WHERE split = 'train'),
         w2 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 2
                  THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         mb AS (SELECT doc_id, MAX(c) AS max_bg FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w2 GROUP BY 1, 2)
           GROUP BY doc_id),
         w3 AS (SELECT doc_id, unnest(
             CASE WHEN len(w) >= 3
                  THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                  ELSE []::VARCHAR[] END) AS g
           FROM s WHERE split = 'train'),
         tr AS (SELECT doc_id, SUM(c) AS n_tri,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tri FROM
             (SELECT doc_id, g, COUNT(*) AS c FROM w3 GROUP BY 1, 2)
           GROUP BY doc_id),
         bg AS (SELECT DISTINCT unnest(list_distinct(
             CASE WHEN len(w) >= 13
                  THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                  ELSE []::VARCHAR[] END)) AS g
           FROM s WHERE split = 'test'),
         cont AS (SELECT DISTINCT doc_id FROM
             (SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 13
                     THEN [array_to_string(w[i:i+12], ' ') for i in range(1, len(w)-11)]
                     ELSE []::VARCHAR[] END)) AS g
              FROM s WHERE split = 'train')
           WHERE g IN (SELECT g FROM bg)),
         f AS (SELECT t.doc_id, t.source, t.fp_exact, t.n_tok,
             (t.n_tok < 10 OR t.n_stop * 2 > t.n_tok
               OR t.n_uniq * 10 < t.n_tok * 3) AS q_fail,
             (COALESCE(mb.max_bg, 0) * 10 > t.n_tok
               OR COALESCE(tr.dup_tri, 0) * 10 > COALESCE(tr.n_tri, 0) * 3)
               AS rep_fail,
             (cont.doc_id IS NOT NULL) AS contam
           FROM t LEFT JOIN mb USING (doc_id) LEFT JOIN tr USING (doc_id)
             LEFT JOIN cont ON t.doc_id = cont.doc_id),
         k AS (SELECT fp_exact, MIN(doc_id) AS keeper_id FROM f
           WHERE NOT q_fail AND NOT rep_fail GROUP BY 1),
         st AS (SELECT f.source, f.n_tok,
             CASE WHEN f.q_fail THEN 'drop_quality'
                  WHEN f.rep_fail THEN 'drop_repetition'
                  WHEN f.doc_id <> k.keeper_id THEN 'drop_duplicate'
                  WHEN f.contam THEN 'drop_contaminated'
                  ELSE 'kept' END AS stage
           FROM f LEFT JOIN k USING (fp_exact))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN stage = 'drop_quality' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_quality,
           CAST(SUM(CASE WHEN stage = 'drop_repetition' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_repetition,
           CAST(SUM(CASE WHEN stage = 'drop_duplicate' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_duplicate,
           CAST(SUM(CASE WHEN stage = 'drop_contaminated' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_drop_contaminated,
           CAST(SUM(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN stage = 'kept' THEN n_tok ELSE 0 END)
             AS BIGINT) AS kept_tokens,
           (CAST(SUM(CASE WHEN stage = 'kept' THEN n_tok ELSE 0 END)
             AS BIGINT) + 255) // 256 AS n_windows
         FROM st GROUP BY source ORDER BY source""",
    "mix_apply" ->
      """WITH d AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         pl AS (SELECT lang, SUM(n_tok) AS n_tokens FROM d GROUP BY 1),
         pls AS (SELECT lang, n_tokens,
             CASE WHEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    * CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                    > n_tokens
                  THEN CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) - 1
                  ELSE CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
             END AS s
           FROM pl),
         zt AS (SELECT SUM(s) AS z FROM pls),
         r AS (SELECT lang, n_tokens,
             (50000 * s) // z AS target_tokens,
             ((50000 * s) // z) // n_tokens AS n_full,
             ((50000 * s) // z) % n_tokens AS rem
           FROM pls, zt),
         c AS (SELECT d.lang, d.n_tok, r.n_tokens, r.target_tokens,
             r.n_full + CASE WHEN
               CAST(CAST(('0x' || substr(md5('mix:' ||
                 CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS HUGEINT)
                 * CAST(r.n_tokens AS HUGEINT)
               < CAST(r.rem AS HUGEINT) * 4294967296
               THEN 1 ELSE 0 END AS copies
           FROM d JOIN r USING (lang))
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
           CAST(MAX(target_tokens) AS BIGINT) AS target_tokens,
           CAST(SUM(copies) AS BIGINT) AS n_sampled_rows,
           CAST(SUM(copies * n_tok) AS BIGINT) AS sampled_tokens
         FROM c GROUP BY lang ORDER BY lang""",
    "dedup_semantic_clusters" ->
      """WITH RECURSIVE pairs AS (
         WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                 FROM documents),
         tf AS (SELECT doc_id,
                  ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1)) % 64 AS bucket,
                  COUNT(*) AS c
                FROM tok GROUP BY 1, 2),
         norms AS (SELECT doc_id, SUM(c * c) AS nsq FROM tf GROUP BY 1),
         dot AS (SELECT c.d1, c.d2, SUM(a.c * b.c) AS dot
                 FROM cand c JOIN tf a ON c.d1 = a.doc_id
                             JOIN tf b ON c.d2 = b.doc_id AND a.bucket = b.bucket
                 GROUP BY 1, 2)
         SELECT d1, d2
         FROM dot JOIN norms n1 ON d1 = n1.doc_id JOIN norms n2 ON d2 = n2.doc_id
         WHERE CAST(dot AS DOUBLE)
             / (sqrt(CAST(n1.nsq AS DOUBLE)) * sqrt(CAST(n2.nsq AS DOUBLE))) >= 0.9),
         edges AS (SELECT d1 AS a, d2 AS b FROM pairs
                   UNION SELECT d2, d1 FROM pairs),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.node)
         SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
         FROM walk GROUP BY node ORDER BY node""",
    "text_substring_dup" ->
      """WITH base AS (SELECT doc_id, source FROM documents),
         win AS (SELECT doc_id, md5(g) AS fp FROM
           (SELECT doc_id, unnest(
              CASE WHEN len(w) >= 20
                   THEN [array_to_string(w[i:i+19], ' ') for i in range(1, len(w)-18)]
                   ELSE []::VARCHAR[] END) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
         spread AS (SELECT fp, COUNT(*) AS nd FROM
             (SELECT DISTINCT doc_id, fp FROM win) GROUP BY fp),
         pd AS (SELECT doc_id, COUNT(*) AS n_win,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_shared
           FROM win JOIN spread USING (fp) GROUP BY doc_id),
         d AS (SELECT base.source,
             COALESCE(pd.n_win, 0) AS n_win,
             COALESCE(pd.n_shared, 0) AS n_shared
           FROM base LEFT JOIN pd USING (doc_id))
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_shared > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_shared,
           CAST(SUM(n_win) AS BIGINT) AS window_mass,
           CAST(SUM(n_shared) AS BIGINT) AS shared_mass,
           CASE WHEN SUM(n_win) > 0 THEN ROUND(CAST(SUM(n_shared) AS DOUBLE)
             / CAST(SUM(n_win) AS DOUBLE), 6) END AS shared_frac
         FROM d GROUP BY source ORDER BY source""",
    "text_bigram_logprob" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         bg AS (SELECT doc_id,
             string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2
           FROM (SELECT doc_id, unnest(
               CASE WHEN len(w) >= 2
                    THEN [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))]
                    ELSE []::VARCHAR[] END) AS g
             FROM words)),
         cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
         tok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
         cu AS (SELECT word, COUNT(*) AS cu FROM tok GROUP BY 1),
         vocab AS (SELECT COUNT(DISTINCT word) AS v FROM tok)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(ln(CAST(cb.cb + 1 AS DOUBLE)
               / CAST(cu.cu + v AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE)
             / COUNT(*), 6) AS mean_logprob
         FROM bg JOIN cb USING (w1, w2) JOIN cu ON bg.w1 = cu.word, vocab
         GROUP BY doc_id ORDER BY mean_logprob, doc_id LIMIT 20""",
    "docs_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, lang, substr(md5(word), 1, 2) AS b
           FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                 FROM documents)),
         raw AS (SELECT b, COUNT(*) AS rb FROM tok GROUP BY 1),
         tgt AS (SELECT b, COUNT(*) AS tb FROM tok WHERE lang = 'en' GROUP BY 1),
         tots AS (SELECT (SELECT SUM(rb) FROM raw) AS r_total,
                         (SELECT COALESCE(SUM(tb), 0) FROM tgt) AS t_total),
         w AS (SELECT raw.b,
             CAST(ln(CAST(COALESCE(tb, 0) + 1 AS DOUBLE)
                     / CAST(t_total + 256 AS DOUBLE))
                - ln(CAST(rb + 1 AS DOUBLE)
                     / CAST(r_total + 256 AS DOUBLE))
               AS DECIMAL(28,12)) AS wv
           FROM raw LEFT JOIN tgt USING (b), tots),
         per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
             ROUND(CAST(SUM(wv) AS DOUBLE) / COUNT(*), 6) AS dsir_score
           FROM tok JOIN w USING (b) GROUP BY 1)
         SELECT d.doc_id, d.lang, n_tok, dsir_score
         FROM per JOIN documents d USING (doc_id)
         ORDER BY dsir_score DESC, doc_id LIMIT 20""",
    "dedup_prefix" ->
      """SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS keeper
         FROM (SELECT doc_id,
             md5(array_to_string(list_slice(string_split(text, ' '), 1, 16),
               ' ')) AS fp
           FROM documents) t
         GROUP BY fp HAVING COUNT(*) > 1 ORDER BY fp""",
    "docs_length_histogram" ->
      """WITH h AS (SELECT lang,
             CAST(length(bin(n_chars)) - 1 AS INTEGER) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM documents GROUP BY 1, 2)
         SELECT lang, bucket, (CAST(1 AS BIGINT) << bucket) AS bucket_lo,
           n_docs, total_chars,
           ROUND(CAST(n_docs AS DOUBLE) /
             CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
         FROM h ORDER BY lang, bucket""",
    "text_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS word
           FROM documents),
         top AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY 1
           ORDER BY freq DESC, word LIMIT 100),
         r AS (SELECT freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rk FROM top),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ln(CAST(freq AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ln(CAST(rk AS DOUBLE)) * ln(CAST(freq AS DOUBLE))
               AS DECIMAL(38,18))) AS DOUBLE) AS sxy
           FROM r)
         SELECT CAST(n AS BIGINT) AS n_words,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
             6) AS intercept
         FROM s""",
    "docs_quality_quantile" ->
      """WITH base AS (SELECT source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
           FROM documents),
         med AS (SELECT source, quantile_cont(n_tok, 0.5) AS median_tok
           FROM base GROUP BY 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(ANY_VALUE(median_tok), 1) AS median_tok,
           CAST(SUM(CASE WHEN n_tok >= median_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN n_tok < median_tok THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dropped
         FROM base JOIN med USING (source)
         GROUP BY source ORDER BY source""",
    // dedup_bloom_prefilter: the Bloom stage is a pure prefilter whose
    // candidates are exactly verified, so the final relation is the plain
    // bloom-free exact join below — and that IS the no-false-negative
    // gate: Spark counts n_dup through the Bloom candidates, this oracle
    // counts it without any Bloom, so a filter that drops a true
    // duplicate hash-mismatches
    "dedup_bloom_prefilter" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 32) AS fp, source,
             CAST(substr(source, 4, 8) AS INT) AS sn FROM documents),
         c AS (SELECT DISTINCT fp FROM d WHERE sn < 10),
         b AS (SELECT source, fp FROM d WHERE sn >= 10)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup,
           CAST(COUNT(*) - SUM(CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new
         FROM b LEFT JOIN c ON b.fp = c.fp
         GROUP BY source ORDER BY source""",
    "docs_quota_sample" ->
      """SELECT source, rk, doc_id, n_chars FROM (
           SELECT source, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS rk
           FROM documents) t
         WHERE rk <= 10 ORDER BY source, rk""",
    // graph_label_prop: two synchronous LPA rounds mirrored CTE-for-CTE;
    // the argmax tie-break (max weight, then smallest label) is the
    // ROW_NUMBER ordering, and label mass is an exact DECIMAL sum so the
    // ordering can't be perturbed by float accumulation
    "graph_label_prop" ->
      """WITH edges AS (
           SELECT s_nationkey AS src, c_nationkey AS dst,
             SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
           FROM lineitem, orders, customer, supplier
           WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             AND l_suppkey = s_suppkey
           GROUP BY 1, 2),
         sym AS (SELECT node, nbr, SUM(w) AS w FROM (
             SELECT src AS node, dst AS nbr, w FROM edges
             UNION ALL SELECT dst, src, w FROM edges) t
           GROUP BY 1, 2),
         tot AS (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
         nbrs AS (SELECT node, nbr, w FROM sym, tot
           WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
             >= CAST(tw AS HUGEINT)),
         l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
         a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
         l1 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
         a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
                FROM nbrs n JOIN l1 l ON n.nbr = l.node GROUP BY 1, 2),
         l2 AS (SELECT node, lbl FROM (
             SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
               ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
         nodes AS (SELECT DISTINCT node FROM sym)
         SELECT n.node, COALESCE(l2.lbl, n.node) AS community, n_name
         FROM nodes n LEFT JOIN l2 ON n.node = l2.node
         JOIN nation ON n.node = n_nationkey
         ORDER BY n.node""",
    // dedup_recall_eval: truth = the ngram-jaccard oracle's pair set,
    // candidates = the minhash oracle's pre-verification cand CTE
    "dedup_recall_eval" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT d1, d2
           FROM (SELECT x.d1, x.d2, x.i, s1.n AS n1, s2.n AS n2
                 FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                              JOIN sizes s2 ON x.d2 = s2.doc_id) v
           WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bucket = y.bucket
                       AND x.doc_id < y.doc_id),
         counts AS (SELECT
             (SELECT COUNT(*) FROM truth) AS n_true,
             (SELECT COUNT(*) FROM cand) AS n_candidates,
             (SELECT COUNT(*) FROM truth t
              WHERE EXISTS (SELECT 1 FROM cand c
                WHERE c.d1 = t.d1 AND c.d2 = t.d2)) AS n_caught)
         SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_caught AS BIGINT) AS n_caught,
           CASE WHEN n_true > 0 THEN
             ROUND(CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
           END AS recall
         FROM counts""",
    "feature_robust_outliers" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
         med AS (SELECT event_type, quantile_cont(v, 0.5) AS med
                 FROM ev GROUP BY 1),
         stats AS (SELECT e.event_type, ANY_VALUE(m.med) AS med,
             quantile_cont(abs(e.v - m.med), 0.5) AS mad
           FROM ev e JOIN med m USING (event_type) GROUP BY 1)
         SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(ANY_VALUE(s.med), 4) AS median_v,
           ROUND(ANY_VALUE(s.mad), 4) AS mad,
           CAST(SUM(CASE WHEN abs(e.v - s.med) > 3 * 1.4826 * s.mad
             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         FROM ev e JOIN stats s USING (event_type)
         GROUP BY 1 ORDER BY 1""",
    // dedup_incremental_minhash: the minhash oracle's machinery with the
    // candidate join restricted to batch x corpus (source-id halves) and
    // a per-batch-doc best-match argmax (jaccard DESC, corpus doc ASC)
    "dedup_incremental_minhash" ->
      incrementalMinhashOracleSql(Seq("sx.sn >= 10 AND sy.sn < 10")),
    // sketch_freq_topk: the exact top-10 token census is the truth side;
    // within_bounds pins the Misra-Gries lb <= true <= ub contract,
    // which holds under any merge order, so the oracle asserts TRUE
    "sketch_freq_topk" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS within_bounds
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY n DESC, token LIMIT 10""",
    // docs_semantic_quality: anchor means mirror sim_label_centroids'
    // decimal-sum-then-one-double-division convention; dot products and
    // norms accumulate as DECIMAL(38,15) in both engines so no float sum
    // depends on evaluation order; dim index bases differ (0 vs 1) but
    // each engine joins its own dims to its own anchor consistently
    "docs_semantic_quality" ->
      """WITH dims AS (SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS d, unnest(embedding) AS v
           FROM embeddings),
         anchor AS (SELECT d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*) AS c
           FROM dims WHERE label = 0 GROUP BY d),
         sc AS (SELECT vec_id,
             CAST(SUM(CAST(CAST(v AS DOUBLE) * c AS DECIMAL(38,15)))
               AS DOUBLE) AS dot,
             CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
               AS DECIMAL(38,15))) AS DOUBLE) AS na2
           FROM dims JOIN anchor USING (d) GROUP BY vec_id),
         cn AS (SELECT CAST(SUM(CAST(c * c AS DECIMAL(38,15))) AS DOUBLE)
             AS nc2 FROM anchor)
         SELECT vec_id AS doc_id, lang, source,
           ROUND(dot / (sqrt(na2) * sqrt(nc2)), 4) AS score
         FROM sc, cn JOIN documents ON vec_id = doc_id
         ORDER BY dot / (sqrt(na2) * sqrt(nc2)) DESC, doc_id LIMIT 20""",
    // text_substring_removal: same 20-gram relation as the census oracle
    // but with POSITIONS (generate_subscripts - 1 matches posexplode's
    // 0-base); interval union via gaps-and-islands, all integer
    "text_substring_removal" ->
      """WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS w
           FROM documents),
         base AS (SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok
           FROM words),
         lst AS (SELECT doc_id,
             CASE WHEN len(w) >= 20
                  THEN [array_to_string(w[i:i+19], ' ') for i in range(1, len(w)-18)]
                  ELSE []::VARCHAR[] END AS gs
           FROM words),
         win AS (SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos,
             unnest(gs) AS g FROM lst),
         shared AS (SELECT g FROM
             (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM win GROUP BY g) t
           WHERE nd > 1),
         ss AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM win
           WHERE g IN (SELECT g FROM shared)),
         isl AS (SELECT doc_id, pos,
             CASE WHEN MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
               OR pos > MAX(pos + 20) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
           FROM ss),
         isl2 AS (SELECT doc_id, pos, SUM(new_island) OVER
             (PARTITION BY doc_id ORDER BY pos) AS island FROM isl),
         iv AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos + 20) AS e
           FROM isl2 GROUP BY 1, 2),
         cov AS (SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS covered
           FROM iv GROUP BY 1)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(COALESCE(covered, 0)) AS BIGINT) AS removed_tokens,
           CAST(SUM(n_tok) - SUM(COALESCE(covered, 0)) AS BIGINT)
             AS kept_tokens,
           CASE WHEN SUM(n_tok) > 0 THEN
             ROUND(CAST(SUM(COALESCE(covered, 0)) AS DOUBLE)
               / CAST(SUM(n_tok) AS DOUBLE), 6) END AS removed_frac
         FROM base LEFT JOIN cov USING (doc_id)
         GROUP BY source ORDER BY source""",
    "text_winnowing" ->
      """WITH g AS (SELECT doc_id, source, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, source, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, source, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fp AS (SELECT DISTINCT doc_id, source, n_grams, wkey
           FROM sel WHERE p <= n_grams - 3),
         fph AS (SELECT doc_id, source, n_grams,
             substr(wkey, 1, 32) AS hash FROM fp),
         perdoc AS (SELECT doc_id, source,
             MAX(n_grams - 3) AS n_windows,
             CAST(COUNT(*) AS BIGINT) AS n_fp
           FROM fph GROUP BY 1, 2),
         hd AS (SELECT source, hash,
             COUNT(DISTINCT doc_id) AS df FROM fph GROUP BY 1, 2),
         sharing AS (SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_hash_distinct,
             CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hash_shared
           FROM hd GROUP BY 1)
         SELECT p.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_windows) AS BIGINT) AS n_windows,
           CAST(SUM(n_fp) AS BIGINT) AS n_fp,
           ROUND(CAST(SUM(n_fp) AS DOUBLE) / SUM(n_windows), 6)
             AS density,
           MAX(s.n_hash_distinct) AS n_hash_distinct,
           MAX(s.n_hash_shared) AS n_hash_shared
         FROM perdoc p JOIN sharing s USING (source)
         GROUP BY p.source ORDER BY p.source""",
    "events_rolling_actives" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
           FROM events),
         days AS (SELECT DISTINCT d FROM ud),
         ex AS (SELECT user_id, off,
             d + CAST(off AS INTEGER) AS gd
           FROM ud CROSS JOIN range(28) t(off)),
         agg AS (SELECT gd,
             CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END)
               AS BIGINT) AS dau,
             CAST(COUNT(DISTINCT CASE WHEN off <= 6 THEN user_id END)
               AS BIGINT) AS wau7,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau28
           FROM ex JOIN days ON ex.gd = days.d GROUP BY 1)
         SELECT strftime(gd, '%Y-%m-%d') AS day, dau, wau7, mau28,
           ROUND(CAST(dau AS DOUBLE) / wau7, 6) AS dau_wau
         FROM agg ORDER BY day""",
    "graph_bfs_knn" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, v1, v2 FROM (
             SELECT label, v1, v2 FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         nodes AS (SELECT label, vec_id AS node FROM embeddings),
         d0 AS (SELECT label, MIN(node) AS node FROM nodes GROUP BY 1),
         f1 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN d0 ON s.label = d0.label AND s.v1 = d0.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)),
         f2 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN f1 ON s.label = f1.label AND s.v1 = f1.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = s.label AND y.node = s.v2)),
         f3 AS (SELECT DISTINCT s.label, s.v2 AS node
           FROM sym s JOIN f2 ON s.label = f2.label AND s.v1 = f2.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = s.label AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = s.label AND y.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f2 z
               WHERE z.label = s.label AND z.node = s.v2)),
         allv AS (SELECT label, node, 0 AS dist FROM d0
           UNION ALL SELECT label, node, 1 FROM f1
           UNION ALL SELECT label, node, 2 FROM f2
           UNION ALL SELECT label, node, 3 FROM f3
           UNION ALL SELECT n.label, n.node, -1 FROM nodes n
             WHERE NOT EXISTS (SELECT 1 FROM d0 a
                 WHERE a.label = n.label AND a.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f1 b
                 WHERE b.label = n.label AND b.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f2 c
                 WHERE c.label = n.label AND c.node = n.node)
               AND NOT EXISTS (SELECT 1 FROM f3 e
                 WHERE e.label = n.label AND e.node = n.node))
         SELECT label, dist, CAST(COUNT(*) AS BIGINT) AS n_nodes
         FROM allv GROUP BY 1, 2 ORDER BY 1, 2""",
    "sim_dbscan" ->
      """WITH RECURSIVE nbr AS (
           SELECT a.label, a.vec_id AS v1, b.vec_id AS v2
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.20),
         deg AS (SELECT label, v1, COUNT(*) AS deg FROM nbr GROUP BY 1, 2),
         cores AS (SELECT label, v1 AS node FROM deg WHERE deg >= 3),
         ce AS (SELECT n.v1 AS a, n.v2 AS b FROM nbr n
           WHERE EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v1)
             AND EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v2)),
         walk(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM ce) t
           UNION
           SELECT e.b, w.lbl FROM walk w JOIN ce e ON e.a = w.node),
         cc AS (SELECT node, MIN(lbl) AS cluster_id
           FROM walk GROUP BY node),
         corecl AS (SELECT c.label, c.node,
             COALESCE(cc.cluster_id, c.node) AS cluster_id
           FROM cores c LEFT JOIN cc ON c.node = cc.node),
         borders AS (SELECT n.label, n.v1 AS node,
             MIN(k.cluster_id) AS cluster_id
           FROM nbr n JOIN corecl k ON n.v2 = k.node
           WHERE NOT EXISTS (SELECT 1 FROM cores c WHERE c.node = n.v1)
           GROUP BY 1, 2),
         members AS (SELECT label, node, cluster_id, 'core' AS role
             FROM corecl
           UNION ALL
           SELECT label, node, cluster_id, 'border' FROM borders),
         sizes AS (SELECT label, cluster_id, COUNT(*) AS csize
           FROM members GROUP BY 1, 2),
         agg AS (SELECT label,
             CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_core,
             CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_border
           FROM members GROUP BY 1),
         cl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_clusters,
             CAST(MAX(csize) AS BIGINT) AS max_cluster
           FROM sizes GROUP BY 1),
         alln AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_all
           FROM embeddings GROUP BY 1)
         SELECT label, n_core, n_border,
           n_all - n_core - n_border AS n_noise, n_clusters, max_cluster
         FROM agg JOIN cl USING (label) JOIN alln USING (label)
         ORDER BY label""",
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         pre AS (SELECT event_type, d,
             SUM(n) OVER (PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS sl,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS nl,
             SUM(n) OVER (PARTITION BY event_type) AS s,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
           FROM daily),
         scored AS (SELECT *,
             CAST(sl * sl AS DOUBLE) / nl
               + CAST((s - sl) * (s - sl) AS DOUBLE) / (nd - nl)
               - CAST(s * s AS DOUBLE) / nd AS gain
           FROM pre WHERE nl < nd),
         best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY gain DESC, d) AS rk FROM scored)
         SELECT event_type, strftime(d, '%Y-%m-%d') AS split_day,
           CAST(nd AS BIGINT) AS n_days, CAST(nl AS BIGINT) AS n_left,
           ROUND(CAST(sl AS DOUBLE) / nl, 6) AS mean_left,
           ROUND(CAST(s - sl AS DOUBLE) / (nd - nl), 6) AS mean_right,
           ROUND(gain, 6) AS gain
         FROM best WHERE rk = 1 ORDER BY event_type""",
    "stream_quantiles" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         v1 AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cent
           FROM events, t0 WHERE value IS NOT NULL
             AND ts < t0 + INTERVAL 15 DAY),
         v2 AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS cent
           FROM events WHERE value IS NOT NULL),
         h1 AS (SELECT cent, COUNT(*) AS cnt FROM v1 GROUP BY 1),
         c1 AS (SELECT cent, SUM(cnt) OVER (ORDER BY cent
             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS tot FROM h1),
         q1 AS (SELECT 1 AS increment,
             CAST(MAX(tot) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cum >= (tot + 3) // 4 THEN cent END) AS c25,
             MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cent END) AS c50,
             MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN cent END) AS c75,
             MIN(CASE WHEN cum >= (19 * tot + 19) // 20 THEN cent END)
               AS c95
           FROM c1),
         h2 AS (SELECT cent, COUNT(*) AS cnt FROM v2 GROUP BY 1),
         c2 AS (SELECT cent, SUM(cnt) OVER (ORDER BY cent
             ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS tot FROM h2),
         q2 AS (SELECT 2 AS increment,
             CAST(MAX(tot) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cum >= (tot + 3) // 4 THEN cent END) AS c25,
             MIN(CASE WHEN cum >= (tot + 1) // 2 THEN cent END) AS c50,
             MIN(CASE WHEN cum >= (3 * tot + 3) // 4 THEN cent END) AS c75,
             MIN(CASE WHEN cum >= (19 * tot + 19) // 20 THEN cent END)
               AS c95
           FROM c2)
         SELECT increment, n_rows,
           ROUND(CAST(c25 AS DOUBLE) / 100, 2) AS p25,
           ROUND(CAST(c50 AS DOUBLE) / 100, 2) AS p50,
           ROUND(CAST(c75 AS DOUBLE) / 100, 2) AS p75,
           ROUND(CAST(c95 AS DOUBLE) / 100, 2) AS p95
         FROM (SELECT * FROM q1 UNION ALL SELECT * FROM q2) u
         ORDER BY increment""",
    "docs_loo_influence" ->
      """WITH sp AS (SELECT doc_id, source, text,
             CASE WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 204 THEN 'train'
               WHEN (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 1, 1))
                    - 1) * 16
                 + (strpos('0123456789abcdef',
                    substr(md5('doc:' || CAST(doc_id AS VARCHAR)), 2, 1))
                    - 1) < 230 THEN 'val'
               ELSE 'test' END AS split
           FROM documents),
         trw AS (SELECT source, word FROM (
             SELECT source, unnest(string_split(text, ' ')) AS word
             FROM sp WHERE split = 'train') t WHERE word <> ''),
         csw AS (SELECT word, source, CAST(COUNT(*) AS BIGINT) AS cs
           FROM trw GROUP BY 1, 2),
         cw AS (SELECT word, CAST(SUM(cs) AS BIGINT) AS c
           FROM csw GROUP BY 1),
         nv AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all,
             CAST(COUNT(*) AS BIGINT) AS v_all FROM cw),
         ps AS (SELECT s.source, CAST(SUM(s.cs) AS BIGINT) AS n_s,
             CAST(SUM(CASE WHEN s.cs = c.c THEN 1 ELSE 0 END) AS BIGINT)
               AS v_excl
           FROM csw s JOIN cw c USING (word) GROUP BY 1),
         ho AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS m FROM (
             SELECT unnest(string_split(text, ' ')) AS word
             FROM sp WHERE split = 'test') t
           WHERE word <> '' GROUP BY 1),
         mt AS (SELECT CAST(SUM(m) AS BIGINT) AS m_tot FROM ho),
         grid AS (SELECT p.source, h.m,
             COALESCE(c.c, 0) - COALESCE(s.cs, 0) AS c_loo,
             nv.n_all - p.n_s AS n_loo, nv.v_all - p.v_excl AS v_loo
           FROM ho h CROSS JOIN ps p
           LEFT JOIN cw c ON h.word = c.word
           LEFT JOIN csw s ON h.word = s.word AND p.source = s.source,
           nv),
         lo AS (SELECT source,
             SUM(m * CAST(-ln(CAST(c_loo + 1 AS DOUBLE)
               / CAST(n_loo + v_loo AS DOUBLE)) AS DECIMAL(28,12)))
               AS nll_sum
           FROM grid GROUP BY 1),
         base AS (SELECT
             SUM(m * CAST(-ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
               / CAST(nv.n_all + nv.v_all AS DOUBLE)) AS DECIMAL(28,12)))
               AS base_sum
           FROM ho h LEFT JOIN cw c ON h.word = c.word, nv)
         SELECT l.source, p.n_s AS n_tokens_removed,
           p.v_excl AS v_exclusive,
           ROUND(CAST(l.nll_sum AS DOUBLE) / m_tot, 6) AS mean_nll_loo,
           ROUND(CAST(l.nll_sum - base_sum AS DOUBLE) / m_tot, 6)
             AS delta_nll
         FROM lo l JOIN ps p USING (source), mt, base
         ORDER BY l.source""",
    "sim_triplet_mining" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) - 1)
               % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(32) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                      ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END) AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id, j // 8),
         lab AS (SELECT vec_id, label FROM embeddings),
         cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS n
           FROM bands x JOIN bands y
             ON x.band = y.band AND x.bucket = y.bucket
               AND x.vec_id <> y.vec_id
           JOIN lab lx ON x.vec_id = lx.vec_id
           JOIN lab ly ON y.vec_id = ly.vec_id
           WHERE lx.label <> ly.label),
         knn1 AS (SELECT label, v1 AS a, v2 AS p, sim FROM (
             SELECT a1.label, a1.vec_id AS v1, b1.vec_id AS v2,
               list_cosine_similarity(a1.embedding, b1.embedding) AS sim,
               ROW_NUMBER() OVER (PARTITION BY a1.vec_id
                 ORDER BY list_cosine_similarity(a1.embedding, b1.embedding)
                   DESC, b1.vec_id) AS rk
             FROM embeddings a1 JOIN embeddings b1
               ON a1.label = b1.label AND a1.vec_id <> b1.vec_id) z
           WHERE rk = 1),
         cls AS (SELECT k.label,
             CAST(k.sim AS DOUBLE) AS sim_ap,
             CAST(list_cosine_similarity(ea.embedding, en.embedding)
               AS DOUBLE) AS sim_an
           FROM cand c JOIN knn1 k ON c.a = k.a
           JOIN embeddings ea ON c.a = ea.vec_id
           JOIN embeddings en ON c.n = en.vec_id),
         cls2 AS (SELECT label, sim_ap, sim_an,
             CASE WHEN sim_an >= sim_ap THEN 'hard'
                  WHEN sim_an >= sim_ap - CAST(0.05 AS DOUBLE)
                    THEN 'semihard'
                  ELSE 'easy' END AS klass FROM cls),
         agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(SUM(CASE WHEN klass = 'hard' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hard,
             CAST(SUM(CASE WHEN klass = 'semihard' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_semihard,
             ROUND(CAST(SUM(CASE WHEN klass = 'semihard'
                 THEN CAST(sim_ap - sim_an AS DECIMAL(18,9)) END)
               AS DOUBLE)
               / SUM(CASE WHEN klass = 'semihard' THEN 1 ELSE 0 END), 4)
               AS avg_semihard_gap
           FROM cls2 GROUP BY 1),
         anch AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_anchors
           FROM knn1 GROUP BY 1)
         SELECT a.label, a.n_anchors,
           COALESCE(g.n_candidates, 0) AS n_candidates,
           COALESCE(g.n_hard, 0) AS n_hard,
           COALESCE(g.n_semihard, 0) AS n_semihard,
           g.avg_semihard_gap
         FROM anch a LEFT JOIN agg g USING (label) ORDER BY a.label""",
    "stream_decay_topk" ->
      """WITH RECURSIVE pw(k, g) AS (
           SELECT 0, CAST(1.0 AS DOUBLE)
           UNION ALL
           SELECT k + 1, g * CAST(0.9 AS DOUBLE) FROM pw WHERE k < 60),
         t0 AS (SELECT MIN(ts) AS t0 FROM events),
         h1 AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY GROUP BY 1, 2),
         h2 AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
         r1 AS (SELECT MAX(d) AS r FROM h1),
         r2 AS (SELECT MAX(d) AS r FROM h2),
         m1 AS (SELECT event_type,
             SUM(CAST(cnt * g AS DECIMAL(28,12))) AS mass
           FROM h1, r1, pw WHERE pw.k = datediff('day', h1.d, r1.r)
           GROUP BY 1),
         m2 AS (SELECT event_type,
             SUM(CAST(cnt * g AS DECIMAL(28,12))) AS mass
           FROM h2, r2, pw WHERE pw.k = datediff('day', h2.d, r2.r)
           GROUP BY 1),
         t1 AS (SELECT 1 AS increment, CAST(rk AS INT) AS rk, event_type,
             ROUND(CAST(mass AS DOUBLE), 6) AS mass FROM (
             SELECT event_type, mass, ROW_NUMBER() OVER (
               ORDER BY mass DESC, event_type) AS rk FROM m1) z
           WHERE rk <= 5),
         t2 AS (SELECT 2 AS increment, CAST(rk AS INT) AS rk, event_type,
             ROUND(CAST(mass AS DOUBLE), 6) AS mass FROM (
             SELECT event_type, mass, ROW_NUMBER() OVER (
               ORDER BY mass DESC, event_type) AS rk FROM m2) z
           WHERE rk <= 5)
         SELECT * FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2) u
         ORDER BY increment, rk""",
    "text_textrank" ->
      """WITH ws0 AS (SELECT lang,
             [lower(w) for w in string_split(text, ' ')
              if regexp_matches(lower(w), '^[a-z]+$')] AS ws
           FROM documents),
         pos AS (SELECT lang, ws, unnest(range(1, len(ws))) AS i
           FROM ws0),
         bi0 AS (SELECT lang, ws[i] AS w1, ws[i + 1] AS w2 FROM pos
           WHERE ws[i] <> ws[i + 1]),
         bic AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
           FROM bi0 GROUP BY 1, 2, 3),
         edges AS (SELECT lang, src, dst, CAST(SUM(c) AS BIGINT) AS w
           FROM (SELECT lang, w1 AS src, w2 AS dst, c FROM bic
             UNION ALL SELECT lang, w2, w1, c FROM bic) u
           GROUP BY 1, 2, 3),
         outw AS (SELECT lang, src, CAST(SUM(w) AS BIGINT) AS ow
           FROM edges GROUP BY 1, 2),
         ew AS (SELECT e.lang, e.src, e.dst,
             CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS ratio
           FROM edges e JOIN outw o ON e.lang = o.lang AND e.src = o.src),
         nodes AS (SELECT DISTINCT lang, src AS node FROM edges),
         nn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
           FROM nodes GROUP BY 1),
         pr0 AS (SELECT n.lang, n.node,
             CAST(1 AS DOUBLE) / CAST(nl AS DOUBLE) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang),
         c1 AS (SELECT e.lang, e.dst,
             CAST(SUM(CAST(p.pr * e.ratio AS DECIMAL(28,12))) AS DOUBLE)
               AS cv
           FROM ew e JOIN pr0 p ON e.lang = p.lang AND e.src = p.node
           GROUP BY 1, 2),
         pr1 AS (SELECT n.lang, n.node,
             CAST(0.15 AS DOUBLE) / CAST(nn.nl AS DOUBLE)
               + CAST(0.85 AS DOUBLE)
                 * COALESCE(c1.cv, CAST(0 AS DOUBLE)) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang
           LEFT JOIN c1 ON n.lang = c1.lang AND n.node = c1.dst),
         c2 AS (SELECT e.lang, e.dst,
             CAST(SUM(CAST(p.pr * e.ratio AS DECIMAL(28,12))) AS DOUBLE)
               AS cv
           FROM ew e JOIN pr1 p ON e.lang = p.lang AND e.src = p.node
           GROUP BY 1, 2),
         pr2 AS (SELECT n.lang, n.node,
             CAST(0.15 AS DOUBLE) / CAST(nn.nl AS DOUBLE)
               + CAST(0.85 AS DOUBLE)
                 * COALESCE(c2.cv, CAST(0 AS DOUBLE)) AS pr
           FROM nodes n JOIN nn ON n.lang = nn.lang
           LEFT JOIN c2 ON n.lang = c2.lang AND n.node = c2.dst)
         SELECT lang, CAST(rk AS INT) AS rk, node AS word,
           ROUND(pr, 8) AS score
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY pr DESC, node) AS rk FROM pr2) z
         WHERE rk <= 10 ORDER BY lang, rk""",
    "sim_facility_select" ->
      """WITH xq AS (SELECT label, vec_id, j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS q
           FROM (SELECT label, vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS j FROM embeddings) t),
         nsq AS (SELECT label, vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
           FROM xq GROUP BY 1, 2),
         dots AS (SELECT a.label, a.vec_id AS v, b.vec_id AS c,
             CAST(SUM(a.q * b.q) AS BIGINT) AS dot
           FROM xq a JOIN xq b ON a.label = b.label AND a.j = b.j
           GROUP BY 1, 2, 3),
         pairs AS (SELECT d.label, d.v, d.c,
             na.n2 + nb.n2 - 2 * d.dot AS d2
           FROM dots d
           JOIN nsq na ON d.label = na.label AND d.v = na.vec_id
           JOIN nsq nb ON d.label = nb.label AND d.c = nb.vec_id),
         s1 AS (SELECT label, c, CAST(SUM(d2) AS BIGINT) AS obj
           FROM pairs GROUP BY 1, 2),
         p1 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s1) z WHERE rk = 1),
         b1 AS (SELECT pr.label, pr.v, pr.d2 AS bd FROM pairs pr
           JOIN p1 ON pr.label = p1.label AND pr.c = p1.pc),
         s2 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b1 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p2 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s2) z WHERE rk = 1),
         b2 AS (SELECT b.label, b.v, LEAST(b.bd, pr.d2) AS bd
           FROM b1 b JOIN p2 ON b.label = p2.label
           JOIN pairs pr ON pr.label = b.label AND pr.v = b.v
             AND pr.c = p2.pc),
         s3 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b2 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p3 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s3) z WHERE rk = 1),
         b3 AS (SELECT b.label, b.v, LEAST(b.bd, pr.d2) AS bd
           FROM b2 b JOIN p3 ON b.label = p3.label
           JOIN pairs pr ON pr.label = b.label AND pr.v = b.v
             AND pr.c = p3.pc),
         s4 AS (SELECT pr.label, pr.c,
             CAST(SUM(LEAST(b.bd, pr.d2)) AS BIGINT) AS obj
           FROM pairs pr JOIN b3 b
             ON pr.label = b.label AND pr.v = b.v
           GROUP BY 1, 2),
         p4 AS (SELECT label, c AS pc, obj FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY obj, c) AS rk
           FROM s4) z WHERE rk = 1),
         picks AS (SELECT label, 1 AS step, pc AS vec_id, obj FROM p1
           UNION ALL SELECT label, 2, pc, obj FROM p2
           UNION ALL SELECT label, 3, pc, obj FROM p3
           UNION ALL SELECT label, 4, pc, obj FROM p4)
         SELECT label, step, vec_id, obj AS objective,
           LAG(obj) OVER (PARTITION BY label ORDER BY step) - obj
             AS reduction
         FROM picks ORDER BY label, step""",
    "events_seasonal_strength" ->
      s"""WITH dec AS (SELECT * FROM ($tsDecomposeOracle) q),
         comp AS (SELECT event_type,
             CAST(residual AS DECIMAL(18,6)) AS r,
             CAST(seasonal + residual AS DECIMAL(18,6)) AS sr,
             CAST(n - seasonal AS DECIMAL(18,6)) AS tr
           FROM dec),
         v AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(r * r) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(r) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(r) AS DOUBLE) / COUNT(*)) AS var_r,
             CAST(SUM(sr * sr) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(sr) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(sr) AS DOUBLE) / COUNT(*)) AS var_sr,
             CAST(SUM(tr * tr) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(tr) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(tr) AS DOUBLE) / COUNT(*)) AS var_tr
           FROM comp GROUP BY 1)
         SELECT event_type, n_days, ROUND(var_r, 6) AS var_resid,
           ROUND(CASE WHEN var_sr > 0 THEN
             GREATEST(CAST(0 AS DOUBLE), 1 - var_r / var_sr) END, 6)
             AS f_seasonal,
           ROUND(CASE WHEN var_tr > 0 THEN
             GREATEST(CAST(0 AS DOUBLE), 1 - var_r / var_tr) END, 6)
             AS f_trend
         FROM v ORDER BY event_type""",
    "dq_reconciliation" ->
      """WITH detail AS (SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS s_c
           FROM lineitem GROUP BY 1),
         o AS (SELECT o_orderkey, o_orderstatus,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS t_c
           FROM orders),
         j AS (SELECT o.o_orderstatus, o.t_c, d.s_c,
             ABS(o.t_c - COALESCE(d.s_c, 0)) AS diff
           FROM o LEFT JOIN detail d ON o.o_orderkey = d.l_orderkey)
         SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN s_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_no_lines,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 100 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 10 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_10pct,
           CAST(SUM(CASE WHEN s_c IS NOT NULL AND diff * 2 <= t_c
             THEN 1 ELSE 0 END) AS BIGINT) AS n_within_50pct,
           ROUND(CAST(SUM(CASE WHEN s_c IS NOT NULL THEN
               CAST(CAST(diff AS DOUBLE) / CAST(t_c AS DOUBLE)
                 AS DECIMAL(18,9)) END) AS DOUBLE)
             / SUM(CASE WHEN s_c IS NOT NULL THEN 1 ELSE 0 END), 6)
             AS mean_rel_diff
         FROM j GROUP BY 1 ORDER BY 1""",
    "orders_drawdown" ->
      """WITH daily AS (SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev_c
           FROM orders GROUP BY 1, 2),
         s AS (SELECT *,
             MAX(rev_c) OVER (PARTITION BY o_orderpriority ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS peak,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_days
           FROM daily),
         s2 AS (SELECT *, peak - rev_c AS dd FROM s),
         b AS (SELECT *, ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority ORDER BY dd DESC, d) AS rk
           FROM s2)
         SELECT o_orderpriority, CAST(n_days AS BIGINT) AS n_days,
           strftime(d, '%Y-%m-%d') AS trough_day,
           ROUND(CAST(peak AS DOUBLE) / 100, 2) AS peak_rev,
           ROUND(CAST(rev_c AS DOUBLE) / 100, 2) AS trough_rev,
           ROUND(CAST(dd AS DOUBLE) / 100, 2) AS max_drawdown,
           ROUND(CAST(dd AS DOUBLE) / CAST(peak AS DOUBLE), 6)
             AS drawdown_frac
         FROM b WHERE rk = 1 ORDER BY 1""",
    "stream_cc_incremental" ->
      """WITH RECURSIVE directed AS (SELECT a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         e1 AS (SELECT v1, v2 FROM knn WHERE v1 % 2 = 0),
         sym1 AS (SELECT v1 AS a, v2 AS b FROM e1
           UNION SELECT v2, v1 FROM e1),
         w1(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM sym1) t
           UNION
           SELECT e.b, w.lbl FROM w1 w JOIN sym1 e ON e.a = w.node),
         l1 AS (SELECT node, MIN(lbl) AS cid FROM w1 GROUP BY 1),
         c1 AS (SELECT cid, COUNT(*) AS csize FROM l1 GROUP BY 1),
         a1 AS (SELECT 1 AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(csize) AS BIGINT) AS n_nodes,
             CAST(MAX(csize) AS BIGINT) AS max_size,
             CAST(SUM(CASE WHEN csize = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs
           FROM c1),
         sym2 AS (SELECT v1 AS a, v2 AS b FROM knn
           UNION SELECT v2, v1 FROM knn),
         w2(node, lbl) AS (
           SELECT a, a FROM (SELECT DISTINCT a FROM sym2) t
           UNION
           SELECT e.b, w.lbl FROM w2 w JOIN sym2 e ON e.a = w.node),
         l2 AS (SELECT node, MIN(lbl) AS cid FROM w2 GROUP BY 1),
         c2 AS (SELECT cid, COUNT(*) AS csize FROM l2 GROUP BY 1),
         a2 AS (SELECT 2 AS increment,
             CAST(COUNT(*) AS BIGINT) AS n_components,
             CAST(SUM(csize) AS BIGINT) AS n_nodes,
             CAST(MAX(csize) AS BIGINT) AS max_size,
             CAST(SUM(CASE WHEN csize = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pairs
           FROM c2)
         SELECT * FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2) u
         ORDER BY increment""",
    "graph_weak_ties" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, a, b FROM (
             SELECT label, v1 AS a, v2 AS b FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         und AS (SELECT label, a AS u, b AS v FROM sym WHERE a < b),
         wed AS (SELECT e.label, e.u, e.v, s.b AS w
           FROM und e JOIN sym s ON e.label = s.label AND s.a = e.u
           WHERE s.b <> e.v),
         closed AS (SELECT w1.label, w1.u, w1.v,
             CAST(COUNT(*) AS BIGINT) AS support
           FROM wed w1
           WHERE EXISTS (SELECT 1 FROM sym s2 WHERE s2.label = w1.label
             AND s2.a = w1.v AND s2.b = w1.w)
           GROUP BY 1, 2, 3),
         cen AS (SELECT e.label, COALESCE(c.support, 0) AS s
           FROM und e LEFT JOIN closed c
             ON e.label = c.label AND e.u = c.u AND e.v = c.v)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_weak,
           ROUND(CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS weak_share,
           ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 4) AS mean_support
         FROM cen GROUP BY 1 ORDER BY 1""",
    "events_ab_sequential" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         e1 AS (SELECT event_type, user_id, ts FROM events, t0
           WHERE ts < t0 + INTERVAL 15 DAY),
         v1 AS (SELECT user_id, ts FROM e1 WHERE event_type = 'view'),
         p1 AS (SELECT user_id, ts FROM e1
           WHERE event_type = 'purchase'),
         conv1 AS (SELECT DISTINCT v.user_id FROM v1 v JOIN p1 p
           ON v.user_id = p.user_id AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu1 AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS cv
           FROM (SELECT DISTINCT user_id FROM v1) u
           LEFT JOIN conv1 c ON u.user_id = c.user_id),
         arms1 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cv) AS BIGINT) AS c
           FROM pu1 GROUP BY 1),
         l1 AS (SELECT 1 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM arms1 WHERE is_a) a,
                (SELECT n, c FROM arms1 WHERE NOT is_a) b),
         v2 AS (SELECT user_id, ts FROM events
           WHERE event_type = 'view'),
         p2 AS (SELECT user_id, ts FROM events
           WHERE event_type = 'purchase'),
         conv2 AS (SELECT DISTINCT v.user_id FROM v2 v JOIN p2 p
           ON v.user_id = p.user_id AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 30 MINUTE),
         pu2 AS (SELECT u.user_id,
             CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END AS cv
           FROM (SELECT DISTINCT user_id FROM v2) u
           LEFT JOIN conv2 c ON u.user_id = c.user_id),
         arms2 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cv) AS BIGINT) AS c
           FROM pu2 GROUP BY 1),
         l2 AS (SELECT 2 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM arms2 WHERE is_a) a,
                (SELECT n, c FROM arms2 WHERE NOT is_a) b),
         looks AS (SELECT *, CASE WHEN look = 1
             THEN CAST(2.797 AS DOUBLE) ELSE CAST(1.977 AS DOUBLE) END
             AS boundary,
             CASE WHEN pp > 0 AND pp < 1 THEN
               (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
               / sqrt(pp * (1 - pp)
                 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
             END AS z
           FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2) u)
         SELECT look, n_a, c_a, n_b, c_b, ROUND(z, 4) AS z, boundary,
           COALESCE(ABS(z) > boundary, false) AS crossed
         FROM looks ORDER BY look""",
    "mm_patch_grid" ->
      """WITH b AS (SELECT doc_id,
             ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1]
               AS modality,
             unnest(range(1, 17)) AS i, md5(text) AS h
           FROM documents),
         vals AS (SELECT modality, CAST((i - 1) // 4 AS INT) AS band,
             CAST((strpos('0123456789abcdef',
                 substr(h, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
               + (strpos('0123456789abcdef',
                 substr(h, CAST(2 * i AS INT), 1)) - 1) AS BIGINT)
               AS byte_val
           FROM b)
         SELECT modality, band, CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(byte_val) AS BIGINT) AS sum_bytes,
           ROUND(CAST(SUM(byte_val) AS DOUBLE) / (COUNT(*) * 255), 6)
             AS mean_intensity,
           CAST(MIN(byte_val) AS BIGINT) AS min_byte,
           CAST(MAX(byte_val) AS BIGINT) AS max_byte
         FROM vals GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_holt_forecast" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         rnd AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM daily),
         st(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rnd WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM st s JOIN rnd r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         fin AS (SELECT s.event_type, s.l, s.t FROM st s
           JOIN (SELECT event_type, MAX(rn) AS m FROM st GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1)
         SELECT f.event_type, n_days, ROUND(l, 6) AS level,
           ROUND(t, 6) AS trend, ROUND(l + t, 6) AS f1,
           ROUND(l + CAST(2 AS DOUBLE) * t, 6) AS f2,
           ROUND(l + CAST(3 AS DOUBLE) * t, 6) AS f3
         FROM fin f JOIN nd USING (event_type) ORDER BY event_type""",
    "sim_metric_agreement" ->
      """WITH xq AS (SELECT label, vec_id, j,
             CAST(ROUND(CAST(x AS DOUBLE) * 1e6) AS BIGINT) AS q
           FROM (SELECT label, vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS j FROM embeddings) t),
         nsq AS (SELECT label, vec_id, CAST(SUM(q * q) AS BIGINT) AS n2
           FROM xq GROUP BY 1, 2),
         seeds AS (SELECT label, MIN(vec_id) AS qid
           FROM embeddings GROUP BY 1),
         dots AS (SELECT a.label, a.vec_id AS cid,
             CAST(SUM(a.q * b.q) AS BIGINT) AS dot
           FROM xq a JOIN seeds s ON a.label = s.label
           JOIN xq b ON b.label = a.label AND b.vec_id = s.qid
             AND b.j = a.j
           WHERE a.vec_id <> s.qid GROUP BY 1, 2),
         cosr AS (SELECT e.label, e.vec_id AS cid,
             list_cosine_similarity(e.embedding, q.embedding) AS cos
           FROM embeddings e JOIN seeds s ON e.label = s.label
           JOIN embeddings q ON q.vec_id = s.qid
           WHERE e.vec_id <> s.qid),
         m AS (SELECT c.label, c.cid, c.cos, d.dot,
             na.n2 + nq.n2 - 2 * d.dot AS d2
           FROM cosr c JOIN dots d
             ON c.label = d.label AND c.cid = d.cid
           JOIN nsq na ON na.label = c.label AND na.vec_id = c.cid
           JOIN seeds s ON s.label = c.label
           JOIN nsq nq ON nq.label = c.label AND nq.vec_id = s.qid),
         r AS (SELECT label, cid,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY cos DESC, cid) AS rc,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY dot DESC, cid) AS rd,
             ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY d2, cid) AS rl
           FROM m),
         p AS (SELECT x.label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (x.rc - y.rc) * (x.rd - y.rd) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_cd,
             CAST(SUM(CASE WHEN (x.rc - y.rc) * (x.rl - y.rl) > 0
               THEN 1 ELSE 0 END) AS BIGINT) AS c_cl
           FROM r x JOIN r y ON x.label = y.label AND x.cid < y.cid
           GROUP BY 1),
         cnt AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_cands
           FROM r GROUP BY 1)
         SELECT c.label, s.qid, n_cands, n_pairs,
           ROUND(CAST(2 * c_cd - n_pairs AS DOUBLE)
             / CAST(n_pairs AS DOUBLE), 6) AS tau_cos_dot,
           ROUND(CAST(2 * c_cl - n_pairs AS DOUBLE)
             / CAST(n_pairs AS DOUBLE), 6) AS tau_cos_l2
         FROM cnt c JOIN seeds s USING (label) JOIN p USING (label)
         ORDER BY c.label""",
    "text_prefix_compression" ->
      """WITH vocab AS (SELECT DISTINCT lang, w FROM (
             SELECT lang, unnest([lower(x)
               for x in string_split(text, ' ')
               if regexp_matches(lower(x), '^[a-z]+$')]) AS w
             FROM documents) t),
         lagd AS (SELECT lang, w,
             LAG(w) OVER (PARTITION BY lang ORDER BY w) AS p
           FROM vocab),
         lcps AS (SELECT lang, w, CASE WHEN p IS NULL THEN 0
             ELSE len([k for k in
               range(1, least(length(w), length(p)) + 1)
               if substr(w, 1, CAST(k AS INT))
                 = substr(p, 1, CAST(k AS INT))]) END AS lcp
           FROM lagd)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(w)) AS BIGINT) AS total_chars,
           CAST(SUM(lcp) AS BIGINT) AS saved_chars,
           CAST(SUM(length(w)) - SUM(lcp) AS BIGINT) AS residual_chars,
           ROUND(CAST(SUM(lcp) AS DOUBLE)
             / CAST(SUM(length(w)) AS DOUBLE), 6) AS savings_ratio
         FROM lcps GROUP BY 1 ORDER BY 1""",
    "dedup_winnowing_pairs" ->
      """WITH g AS (SELECT doc_id, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fp AS (SELECT DISTINCT doc_id, wkey
           FROM sel WHERE p <= n_grams - 3),
         fpd AS (SELECT DISTINCT doc_id, substr(wkey, 1, 32) AS hash
           FROM fp),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
           FROM fpd GROUP BY 1),
         okdf AS (SELECT hash FROM fpd GROUP BY hash
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS n_shared
           FROM fpd a JOIN fpd b
             ON a.hash = b.hash AND a.doc_id < b.doc_id
           JOIN okdf k ON k.hash = a.hash
           GROUP BY 1, 2)
         SELECT d1, d2, n_shared, s1.n AS n1, s2.n AS n2,
           ROUND(CAST(n_shared AS DOUBLE)
             / CAST(s1.n + s2.n - n_shared AS DOUBLE), 6) AS est_jaccard
         FROM inter JOIN sizes s1 ON d1 = s1.doc_id
                    JOIN sizes s2 ON d2 = s2.doc_id
         WHERE n_shared >= 3
         ORDER BY n_shared DESC, d1, d2 LIMIT 10""",
    "join_pit_dimension" ->
      """WITH runs0 AS (SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev
           FROM events WHERE event_type <> 'purchase'),
         runs1 AS (SELECT *, CASE WHEN prev IS DISTINCT FROM event_type
             THEN 1 ELSE 0 END AS chg FROM runs0),
         runs2 AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS run_id
           FROM runs1),
         dim AS (SELECT user_id AS du, run_id,
             event_type AS state_type, MIN(ts) AS vf
           FROM runs2 GROUP BY 1, 2, 3),
         facts AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'purchase'),
         j AS (SELECT f.event_id, f.user_id, f.ts, d.state_type,
             d.run_id, d.vf,
             ROW_NUMBER() OVER (PARTITION BY f.event_id
               ORDER BY d.vf DESC, d.run_id DESC) AS rk
           FROM facts f LEFT JOIN dim d
             ON f.user_id = d.du AND d.vf <= f.ts)
         SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           COALESCE(state_type, 'none') AS state_type,
           CAST(COALESCE(run_id, -1) AS BIGINT) AS state_run_id,
           COALESCE(strftime(vf, '%Y-%m-%d %H:%M:%S'), '')
             AS state_since
         FROM j WHERE rk = 1 ORDER BY event_id""",
    "stream_holt" ->
      """WITH RECURSIVE d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0
           FROM events),
         dailyA AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events, d0 WHERE CAST(ts AS DATE) < d0 + 15
           GROUP BY 1, 2),
         rndA AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM dailyA),
         stA(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rndA WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM stA s JOIN rndA r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         finA AS (SELECT s.event_type, s.l, s.t FROM stA s
           JOIN (SELECT event_type, MAX(rn) AS m FROM stA GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         ndA AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dailyA GROUP BY 1),
         dailyB AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         rndB AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM dailyB),
         stB(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rndB WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM stB s JOIN rndB r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         finB AS (SELECT s.event_type, s.l, s.t FROM stB s
           JOIN (SELECT event_type, MAX(rn) AS m FROM stB GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         ndB AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM dailyB GROUP BY 1),
         u AS (SELECT 1 AS increment, f.event_type, n_days,
             ROUND(l, 6) AS level, ROUND(t, 6) AS trend,
             ROUND(l + t, 6) AS f1
           FROM finA f JOIN ndA USING (event_type)
           UNION ALL
           SELECT 2, f.event_type, n_days, ROUND(l, 6), ROUND(t, 6),
             ROUND(l + t, 6)
           FROM finB f JOIN ndB USING (event_type))
         SELECT * FROM u ORDER BY increment, event_type""",
    "events_forecast_backtest" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         mk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY d DESC) AS rdesc FROM daily),
         train AS (SELECT * FROM mk WHERE rdesc > 5),
         test AS (SELECT event_type, 6 - rdesc AS h,
             CAST(n AS DOUBLE) AS y FROM mk WHERE rdesc <= 5),
         rnd AS (SELECT event_type, CAST(n AS DOUBLE) AS y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
           FROM train),
         st(event_type, rn, l, t) AS (
           SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
           FROM rnd WHERE rn = 1
           UNION ALL
           SELECT s.event_type, s.rn + 1,
             CAST(0.5 AS DOUBLE) * r.y
               + CAST(0.5 AS DOUBLE) * (s.l + s.t),
             CAST(0.3 AS DOUBLE)
                 * ((CAST(0.5 AS DOUBLE) * r.y
                   + CAST(0.5 AS DOUBLE) * (s.l + s.t)) - s.l)
               + CAST(0.7 AS DOUBLE) * s.t
           FROM st s JOIN rnd r
             ON r.event_type = s.event_type AND r.rn = s.rn + 1),
         fin AS (SELECT s.event_type, s.l, s.t FROM st s
           JOIN (SELECT event_type, MAX(rn) AS m FROM st GROUP BY 1) z
             ON s.event_type = z.event_type AND s.rn = z.m),
         lasty AS (SELECT event_type, CAST(n AS DOUBLE) AS last_y
           FROM mk WHERE rdesc = 6),
         nt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_train
           FROM train GROUP BY 1),
         sc AS (SELECT t.event_type,
             CAST(ABS(t.y - l2.last_y) AS DECIMAL(18,6)) AS e_naive,
             CAST(ABS(t.y - (f.l + CAST(t.h AS DOUBLE) * f.t))
               AS DECIMAL(18,6)) AS e_holt
           FROM test t JOIN fin f USING (event_type)
           JOIN lasty l2 USING (event_type)),
         agg AS (SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             ROUND(CAST(SUM(e_naive) AS DOUBLE) / COUNT(*), 6)
               AS naive_mae,
             ROUND(CAST(SUM(e_holt) AS DOUBLE) / COUNT(*), 6)
               AS holt_mae
           FROM sc GROUP BY 1)
         SELECT a.event_type, n_train, n_test, naive_mae, holt_mae,
           CASE WHEN holt_mae < naive_mae THEN 'holt'
                WHEN holt_mae > naive_mae THEN 'naive'
                ELSE 'tie' END AS winner
         FROM agg a JOIN nt USING (event_type)
         ORDER BY a.event_type""",
    "sketch_countmin" ->
      """WITH ev AS (SELECT user_id FROM events),
         hs AS (SELECT user_id, j,
             md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))
               AS h
           FROM ev CROSS JOIN range(3) t(j)),
         hb AS (SELECT user_id, j,
             CAST(((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 64
               AS INT) AS bucket
           FROM hs),
         b AS (SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM hb GROUP BY 1, 2),
         exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact
           FROM ev GROUP BY 1),
         tracked AS (SELECT user_id, exact, CAST(rk AS INT) AS rk FROM (
             SELECT *, ROW_NUMBER() OVER (ORDER BY exact DESC, user_id)
               AS rk FROM exact) z WHERE rk <= 10),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev),
         pr AS (SELECT t.user_id, t.exact, t.rk,
             MIN(b.cnt) AS est
           FROM tracked t
           JOIN hb ON hb.user_id = t.user_id
           JOIN b ON b.j = hb.j AND b.bucket = hb.bucket
           GROUP BY 1, 2, 3)
         SELECT rk, user_id, exact, CAST(est AS BIGINT) AS est,
           CAST(est - exact AS BIGINT) AS overestimate,
           est >= exact AS never_under,
           est - exact <= (2 * n_total + 63) // 64 AS within_bound
         FROM pr, n ORDER BY rk""",
    "sim_prf_expansion" ->
      """WITH q AS (SELECT label, MIN(vec_id) AS qid
           FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         s1 AS (SELECT qe.label, qe.qid, c.vec_id AS cid,
             c.label AS clabel,
             list_cosine_similarity(c.embedding, qe.q_emb) AS sim
           FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid),
         r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
             ORDER BY sim DESC, cid) AS rk FROM s1),
         bef AS (SELECT label,
             CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
               AS BIGINT) AS nb
           FROM r1 WHERE rk <= 10 GROUP BY 1),
         top5 AS (SELECT label, qid, cid FROM r1 WHERE rk <= 5),
         fd AS (SELECT t.label, t.qid,
             generate_subscripts(e.embedding, 1) AS d,
             unnest(e.embedding) AS v
           FROM top5 t JOIN embeddings e ON t.cid = e.vec_id),
         cent AS (SELECT label, qid, d,
             CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*) AS c
           FROM fd GROUP BY 1, 2, 3),
         xq AS (SELECT label, qid,
             list(CAST(c AS FLOAT) ORDER BY d) AS x_emb
           FROM cent GROUP BY 1, 2),
         s2 AS (SELECT x.label, x.qid, c.vec_id AS cid,
             c.label AS clabel,
             list_cosine_similarity(c.embedding, x.x_emb) AS sim
           FROM xq x CROSS JOIN embeddings c WHERE c.vec_id <> x.qid),
         r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
             ORDER BY sim DESC, cid) AS rk FROM s2),
         aft AS (SELECT label,
             CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
               AS BIGINT) AS na
           FROM r2 WHERE rk <= 10 GROUP BY 1)
         SELECT q.label, q.qid,
           ROUND(CAST(nb AS DOUBLE) / 10, 6) AS recall10_before,
           ROUND(CAST(na AS DOUBLE) / 10, 6) AS recall10_after,
           na - nb AS gain
         FROM q JOIN bef USING (label) JOIN aft USING (label)
         ORDER BY q.label""",
    "dedup_winnowing_eval" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         sh AS (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ')
                             for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         okdf AS (SELECT shingle FROM sh GROUP BY shingle
           HAVING COUNT(*) BETWEEN 2 AND 64),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
                   FROM sh a JOIN sh b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   JOIN okdf k ON k.shingle = a.shingle
                   GROUP BY 1, 2),
         truth AS (SELECT x.d1, x.d2 FROM inter x
           JOIN sizes s1 ON x.d1 = s1.doc_id
           JOIN sizes s2 ON x.d2 = s2.doc_id
           WHERE CAST(i AS DOUBLE) / (s1.n + s2.n - i) >= 0.5),
         g AS (SELECT doc_id, n_grams,
             unnest(l) AS h, generate_subscripts(l, 1) AS p
           FROM (SELECT doc_id, length(text) - 7 AS n_grams,
               CASE WHEN length(text) >= 8
                 THEN [md5(substr(text, i, 8))
                       for i in range(1, length(text) - 6)]
                 ELSE []::VARCHAR[] END AS l
             FROM documents) t),
         sel AS (SELECT doc_id, n_grams, p,
             MIN(h || lpad(CAST(1000000 - p AS VARCHAR), 7, '0'))
               OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
           FROM g),
         fpw AS (SELECT DISTINCT doc_id, wkey
           FROM sel WHERE p <= n_grams - 3),
         fpd AS (SELECT DISTINCT doc_id, substr(wkey, 1, 32) AS hash
           FROM fpw),
         wok AS (SELECT hash FROM fpd GROUP BY hash
           HAVING COUNT(*) BETWEEN 2 AND 64),
         cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS inter
           FROM fpd a JOIN fpd b
             ON a.hash = b.hash AND a.doc_id < b.doc_id
           JOIN wok k ON k.hash = a.hash
           GROUP BY 1, 2),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
         fl AS (SELECT c.inter,
             CASE WHEN t.d1 IS NOT NULL THEN 1 ELSE 0 END AS tp,
             th.threshold
           FROM cand c
           LEFT JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2
           CROSS JOIN (SELECT unnest([3, 5, 10]) AS threshold) th
           WHERE c.inter >= th.threshold)
         SELECT threshold, CAST(COUNT(*) AS BIGINT) AS n_pred, n_truth,
           CAST(SUM(tp) AS BIGINT) AS n_tp,
           ROUND(CAST(SUM(tp) AS DOUBLE) / COUNT(*), 6) AS prec,
           ROUND(CAST(SUM(tp) AS DOUBLE) / n_truth, 6) AS recall
         FROM fl, nt GROUP BY threshold, n_truth
         ORDER BY threshold""",
    "events_bursts" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         fl AS (SELECT *,
             COUNT(*) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS k,
             COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS s
           FROM daily),
         fb AS (SELECT *, n * k > 2 * s AND k > 0 AS burst FROM fl),
         runs AS (SELECT *, d - CAST(ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY d) AS INT) AS grp
           FROM fb WHERE burst),
         rc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_bursts,
             CAST(MAX(run_len) AS BIGINT) AS longest_run FROM (
             SELECT event_type, grp, COUNT(*) AS run_len
             FROM runs GROUP BY 1, 2) z GROUP BY 1),
         peak AS (SELECT event_type,
             strftime(d, '%Y-%m-%d') AS peak_day, n AS peak_n FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY n DESC, d) AS rk FROM runs) z WHERE rk = 1),
         bd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN burst THEN 1 ELSE 0 END) AS BIGINT)
               AS n_burst_days
           FROM fb GROUP BY 1)
         SELECT bd.event_type, n_days, n_burst_days,
           COALESCE(n_bursts, 0) AS n_bursts,
           COALESCE(longest_run, 0) AS longest_run,
           COALESCE(peak_day, '') AS peak_day,
           COALESCE(peak_n, 0) AS peak_n
         FROM bd LEFT JOIN rc USING (event_type)
         LEFT JOIN peak USING (event_type)
         ORDER BY bd.event_type""",
    "events_poisson_bootstrap" ->
      """WITH ev AS (SELECT event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         wx AS (SELECT event_id, cents, rep,
             CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
               + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0
               + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0
               + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0
               + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0
               + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0
               + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0
               + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
               / 4294967296.0 AS DOUBLE) AS u
           FROM (SELECT event_id, cents, rep,
               md5(CAST(rep AS VARCHAR) || ':'
                 || CAST(event_id AS VARCHAR)) AS h
             FROM ev CROSS JOIN range(20) t(rep)) z),
         ww AS (SELECT rep, cents,
             CASE WHEN u < 0.36787944117144233 THEN 0
                  WHEN u < 0.7357588823428847 THEN 1
                  WHEN u < 0.9196986029286058 THEN 2
                  WHEN u < 0.9810118431238462 THEN 3
                  WHEN u < 0.9963401531726563 THEN 4
                  ELSE 5 END AS w
           FROM wx),
         rm AS (SELECT rep,
             CAST(CAST(SUM(w * cents) AS DOUBLE)
               / CAST(SUM(w) AS DOUBLE) AS DECIMAL(18,9)) AS m
           FROM ww GROUP BY 1),
         pt AS (SELECT CAST(SUM(cents) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS sample_mean_c FROM ev),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
             CAST(SUM(m) AS DOUBLE) / COUNT(*) AS boot_mean_c,
             (CAST(SUM(m * m) AS DOUBLE)
               - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
                 / COUNT(*)) / (COUNT(*) - 1) AS var_c,
             CAST(MIN(m) AS DOUBLE) AS lo_c,
             CAST(MAX(m) AS DOUBLE) AS hi_c
           FROM rm)
         SELECT n_reps, ROUND(sample_mean_c / 100.0, 4) AS sample_mean,
           ROUND(boot_mean_c / 100.0, 4) AS boot_mean,
           ROUND(sqrt(var_c) / 100.0, 4) AS boot_se,
           ROUND(lo_c / 100.0, 4) AS ci_lo,
           ROUND(hi_c / 100.0, 4) AS ci_hi
         FROM ag, pt""",
    "stream_ab_monitor" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         a1 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS c
           FROM events, t0 WHERE ts < t0 + INTERVAL 15 DAY GROUP BY 1),
         l1 AS (SELECT 1 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM a1 WHERE is_a) a,
                (SELECT n, c FROM a1 WHERE NOT is_a) b),
         a2 AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS c
           FROM events GROUP BY 1),
         l2 AS (SELECT 2 AS look, a.n AS n_a, a.c AS c_a,
             b.n AS n_b, b.c AS c_b,
             CAST(a.c + b.c AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS pp
           FROM (SELECT n, c FROM a2 WHERE is_a) a,
                (SELECT n, c FROM a2 WHERE NOT is_a) b),
         looks AS (SELECT *, CASE WHEN look = 1
             THEN CAST(2.797 AS DOUBLE) ELSE CAST(1.977 AS DOUBLE) END
             AS boundary,
             CASE WHEN pp > 0 AND pp < 1 THEN
               (CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
               / sqrt(pp * (1 - pp)
                 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
             END AS z
           FROM (SELECT * FROM l1 UNION ALL SELECT * FROM l2) u)
         SELECT look, n_a, c_a, n_b, c_b, ROUND(z, 4) AS z, boundary,
           COALESCE(ABS(z) > boundary, false) AS crossed
         FROM looks ORDER BY look""",
    "dq_referential" ->
      """WITH lk AS (SELECT CAST(l_orderkey AS VARCHAR) || ':'
             || CAST(l_linenumber AS VARCHAR) AS lk FROM lineitem),
         checks AS (
           SELECT 'pk_orders' AS check_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked,
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
               HAVING COUNT(*) > 1) z) AS n_violations
           UNION ALL
           SELECT 'pk_customer',
             (SELECT COUNT(*) FROM customer),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'pk_part',
             (SELECT COUNT(*) FROM part),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM part GROUP BY p_partkey
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'pk_lineitem_composite',
             (SELECT COUNT(*) FROM lk),
             (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM (
               SELECT COUNT(*) AS c FROM lk GROUP BY lk
               HAVING COUNT(*) > 1) z)
           UNION ALL
           SELECT 'fk_lineitem_orders',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           UNION ALL
           SELECT 'fk_lineitem_part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
           UNION ALL
           SELECT 'fk_lineitem_supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
           UNION ALL
           SELECT 'fk_orders_customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
           UNION ALL
           SELECT 'fk_customer_nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS (
               SELECT 1 FROM nation n
               WHERE n.n_nationkey = c.c_nationkey)))
         SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS ok
         FROM checks ORDER BY check_name""",
    "sim_residual_quant" ->
      """WITH dv AS (SELECT label, vec_id,
             generate_subscripts(embedding, 1) AS d,
             unnest(embedding) AS val
           FROM embeddings),
         cent AS (SELECT label, d,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
               AS DOUBLE) / COUNT(*) AS c
           FROM dv GROUP BY 1, 2),
         resid AS (SELECT dv.label, dv.vec_id, dv.d,
             CAST(ROUND((CAST(val AS DOUBLE) - c) * 1e6) AS BIGINT)
               AS rq
           FROM dv JOIN cent
             ON dv.label = cent.label AND dv.d = cent.d),
         cb AS (SELECT vec_id AS cw FROM embeddings
           ORDER BY vec_id LIMIT 8),
         cbr AS (SELECT r.vec_id AS cw, r.d, r.rq AS cq
           FROM resid r JOIN cb ON r.vec_id = cb.cw),
         d2s AS (SELECT r.label, r.vec_id, c.cw,
             CAST(SUM((r.rq - c.cq) * (r.rq - c.cq)) AS BIGINT) AS d2
           FROM resid r JOIN cbr c ON r.d = c.d GROUP BY 1, 2, 3),
         asg AS (SELECT label, vec_id, d2 FROM (SELECT *,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cw) AS rk FROM d2s) z WHERE rk = 1),
         s1 AS (SELECT label, vec_id,
             CAST(SUM(rq * rq) AS BIGINT) AS e1
           FROM resid GROUP BY 1, 2),
         agg AS (SELECT s1.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             ROUND((CAST(SUM(e1) AS DOUBLE) / COUNT(*)) / 1e12, 6)
               AS mse_stage1,
             ROUND((CAST(SUM(d2) AS DOUBLE) / COUNT(*)) / 1e12, 6)
               AS mse_stage2
           FROM s1 JOIN asg USING (vec_id) GROUP BY s1.label)
         SELECT label, n_vecs, mse_stage1, mse_stage2,
           ROUND(CASE WHEN mse_stage1 > 0
             THEN 1 - mse_stage2 / mse_stage1 END, 6) AS reduction
         FROM agg ORDER BY label""",
    "sample_balanced" ->
      """WITH k AS (SELECT MIN(n) AS k FROM (
             SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1) z),
         r AS (SELECT lang, doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5('balance:' || CAST(doc_id AS VARCHAR)),
                 doc_id) AS BIGINT) AS rk
           FROM documents)
         SELECT lang, rk, doc_id FROM r, k WHERE rk <= k
         ORDER BY lang, rk""",
    "dq_psi_drift" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         base AS (SELECT CASE WHEN ts < t0 + INTERVAL 15 DAY
               THEN 1 ELSE 2 END AS half,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0 WHERE value IS NOT NULL),
         hist AS (SELECT c, COUNT(*) AS n FROM base WHERE half = 1
           GROUP BY 1),
         cdf AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT COUNT(*) AS n1 FROM base WHERE half = 1),
         bounds AS (SELECT k, MIN(c) AS b
           FROM cdf, tot, range(1, 10) t(k)
           WHERE cum >= CAST(ceil(k * n1 / 10.0) AS BIGINT)
           GROUP BY 1),
         hc AS (SELECT half, c, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM base GROUP BY 1, 2),
         asg AS (SELECT half, cnt,
             1 + SUM(CASE WHEN c > b THEN 1 ELSE 0 END) AS bucket
           FROM hc CROSS JOIN bounds GROUP BY half, c, cnt),
         counts AS (SELECT half, bucket, CAST(SUM(cnt) AS BIGINT) AS n
           FROM asg GROUP BY 1, 2),
         ht AS (SELECT half, CAST(COUNT(*) AS BIGINT) AS ht FROM base
           GROUP BY 1),
         sh AS (SELECT c2.half, bucket, n, CAST(n AS DOUBLE) / ht AS p
           FROM counts c2 JOIN ht ON c2.half = ht.half),
         pr1 AS (SELECT bucket, n AS n_ref, p AS p_ref FROM sh
           WHERE half = 1),
         pr2 AS (SELECT bucket, n AS n_cur, p AS p_cur FROM sh
           WHERE half = 2),
         spine AS (SELECT CAST(k AS INT) AS bucket FROM range(1, 11) t(k)),
         pb AS (SELECT s.bucket, n_ref, n_cur, p_ref, p_cur,
             CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               CAST((p_cur - p_ref) * ln(p_cur / p_ref)
                 AS DECIMAL(28,12)) END AS contrib
           FROM spine s LEFT JOIN pr1 ON s.bucket = pr1.bucket
           LEFT JOIN pr2 ON s.bucket = pr2.bucket),
         psis AS (SELECT SUM(contrib) AS psi_sum FROM pb)
         SELECT bucket, COALESCE(n_ref, 0) AS n_ref,
           COALESCE(n_cur, 0) AS n_cur,
           ROUND(COALESCE(p_ref, 0), 6) AS p_ref,
           ROUND(COALESCE(p_cur, 0), 6) AS p_cur,
           ROUND(CAST(contrib AS DOUBLE), 6) AS contrib,
           ROUND(CAST(psi_sum AS DOUBLE), 6) AS psi_total
         FROM pb, psis ORDER BY bucket""",
    "window_vwap" ->
      """WITH daily AS (SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS pv,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
               AS BIGINT) AS qv
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT *,
             SUM(pv) OVER (PARTITION BY l_returnflag ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS cum_pv,
             SUM(qv) OVER (PARTITION BY l_returnflag ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS cum_qv
           FROM daily)
         SELECT l_returnflag, strftime(d, '%Y-%m-%d') AS day,
           ROUND(CAST(cum_pv AS DOUBLE) / 100, 2) AS cum_revenue,
           ROUND(CAST(cum_qv AS DOUBLE) / 100, 2) AS cum_qty,
           ROUND(CAST(cum_pv AS DOUBLE) / CAST(cum_qv AS DOUBLE), 6)
             AS vwap
         FROM c ORDER BY l_returnflag, day""",
    "dq_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice
               * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders WHERE o_totalprice > 0),
         hist AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d
           GROUP BY 1),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM d),
         pd AS (SELECT s.digit, COALESCE(n, 0) AS n, n_tot,
             log10(1 + 1.0 / s.digit) AS p_exp
           FROM (SELECT CAST(k AS INT) AS digit FROM range(1, 10) t(k)) s
           LEFT JOIN hist ON s.digit = hist.digit CROSS JOIN tot),
         pc AS (SELECT *,
             CAST((n - n_tot * p_exp) * (n - n_tot * p_exp)
               / (n_tot * p_exp) AS DECIMAL(28,12)) AS contrib
           FROM pd),
         c2 AS (SELECT SUM(contrib) AS chi2_sum FROM pc)
         SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / n_tot, 6) AS p_obs,
           ROUND(p_exp, 6) AS p_exp,
           ROUND(CAST(contrib AS DOUBLE), 6) AS chi2_contrib,
           ROUND(CAST(chi2_sum AS DOUBLE), 6) AS chi2_total
         FROM pc, c2 ORDER BY digit""",
    "sketch_ams_f2" ->
      """WITH pk AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         exact AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2
           FROM pk),
         sg AS (SELECT pk.user_id, pk.cnt, CAST(j AS INT) AS j,
             CASE WHEN (strpos('0123456789abcdef',
                 substr(md5('ams' || CAST(j AS VARCHAR) || ':'
                   || CAST(user_id AS VARCHAR)), 4, 1)) - 1) % 2 = 0
               THEN 1 ELSE -1 END AS s
           FROM pk CROSS JOIN range(9) t(j)),
         z AS (SELECT j, CAST(SUM(s * cnt) AS BIGINT) AS z,
             CAST(SUM(s * cnt) * SUM(s * cnt) AS BIGINT) AS est
           FROM sg GROUP BY 1),
         med AS (SELECT CAST(MEDIAN(est) AS BIGINT) AS median_est FROM z)
         SELECT j, z, est, median_est, exact_f2,
           ROUND(CAST(ABS(median_est - exact_f2) AS DOUBLE) / exact_f2, 6)
             AS rel_err
         FROM z, med, exact ORDER BY j""",
    "events_autocorr" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h FROM events),
         counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM ev
           GROUP BY 1),
         span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
         spine AS (SELECT CAST(k AS BIGINT) AS t0
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         idx AS (SELECT CAST(date_diff('hour', span.h0, counts.h)
               AS BIGINT) AS t0, y
           FROM counts, span),
         series AS (SELECT s.t0 + 1 AS t, COALESCE(y, 0) AS y
           FROM spine s LEFT JOIN idx ON s.t0 = idx.t0),
         ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s FROM series),
         dev AS (SELECT t, CAST(y * n - s AS DECIMAL(38,0)) AS d, n
           FROM series, ns),
         den AS (SELECT SUM(d * d) AS den, MAX(n) AS n FROM dev),
         nums AS (SELECT lag, SUM(a.d * b.d) AS num
           FROM (SELECT CAST(k AS INT) AS lag FROM range(1, 25) t(k)) l
           JOIN dev a ON TRUE
           JOIN dev b ON b.t = a.t - lag
           GROUP BY 1),
         terms AS (SELECT lag,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS r,
             CAST((CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * n * (n + 2) / (n - lag) AS DECIMAL(28,12)) AS lb_term
           FROM nums, den)
         SELECT lag, ROUND(r, 6) AS acf,
           ROUND(CAST(SUM(lb_term) OVER (ORDER BY lag
             ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS lb_q
         FROM terms ORDER BY lag""",
    "text_yule_k" ->
      """WITH tf AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS token
             FROM documents)
           WHERE token <> '' GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS vocab,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * cnt) AS BIGINT) AS s2,
           ROUND(10000.0 * CAST(SUM(cnt * cnt) - SUM(cnt) AS DOUBLE)
             / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)), 6)
             AS yule_k,
           ROUND(CAST(SUM(cnt * cnt) - SUM(cnt) AS DOUBLE)
             / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) - 1 AS DOUBLE)),
             6) AS simpson_d
         FROM tf GROUP BY lang ORDER BY lang""",
    "events_powerlaw_fit" ->
      """WITH pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         hist AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_users FROM pu
           GROUP BY 1),
         ax AS (SELECT CAST(v AS BIGINT) AS xmin
           FROM (VALUES (2), (5), (10)) t(v)),
         tail AS (SELECT xmin, x, n_users,
             CAST(ln(CAST(x AS DOUBLE) / xmin) AS DECIMAL(25,12))
               * CAST(n_users AS DECIMAL(12,0)) AS lnterm
           FROM hist CROSS JOIN ax WHERE x >= xmin),
         fit AS (SELECT xmin, CAST(SUM(n_users) AS BIGINT) AS n_tail,
             SUM(lnterm) AS sum_ln,
             1.0 + CAST(SUM(n_users) AS DOUBLE)
               / CAST(SUM(lnterm) AS DOUBLE) AS alpha
           FROM tail GROUP BY 1),
         sv AS (SELECT t.xmin, t.x,
             SUM(t.n_users) OVER (PARTITION BY t.xmin ORDER BY t.x DESC
               ROWS UNBOUNDED PRECEDING) AS ge,
             f.n_tail, f.alpha
           FROM tail t JOIN fit f ON t.xmin = f.xmin),
         ks AS (SELECT xmin, MAX(ABS(CAST(ge AS DOUBLE) / n_tail
             - pow(CAST(x AS DOUBLE) / xmin, 1.0 - alpha))) AS ks
           FROM sv GROUP BY 1)
         SELECT f.xmin, n_tail, ROUND(CAST(sum_ln AS DOUBLE), 6) AS sum_ln,
           ROUND(alpha, 6) AS alpha, ROUND(ks, 6) AS ks
         FROM fit f JOIN ks USING (xmin) ORDER BY xmin""",
    "sim_cluster_nmi" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
                 1, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(8) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         bands AS (SELECT vec_id,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id),
         cells AS (SELECT e.label, b.bucket, CAST(COUNT(*) AS BIGINT) AS n
           FROM embeddings e JOIN bands b ON e.vec_id = b.vec_id
           GROUP BY 1, 2),
         ma AS (SELECT label, CAST(SUM(n) AS BIGINT) AS na FROM cells
           GROUP BY 1),
         mb AS (SELECT bucket, CAST(SUM(n) AS BIGINT) AS nb FROM cells
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM cells),
         ha AS (SELECT SUM(CAST(CAST(na AS DOUBLE) / nt
             * ln(CAST(nt AS DOUBLE) / na) AS DECIMAL(28,12)))
             AS h_label FROM ma, tot),
         hb AS (SELECT SUM(CAST(CAST(nb AS DOUBLE) / nt
             * ln(CAST(nt AS DOUBLE) / nb) AS DECIMAL(28,12)))
             AS h_bucket FROM mb, tot),
         mi AS (SELECT c.label, c.bucket, c.n,
             CAST(CAST(n AS DOUBLE) / nt
               * ln(CAST(nt AS DOUBLE) * n / (CAST(na AS DOUBLE) * nb))
               AS DECIMAL(28,12)) AS contrib
           FROM cells c JOIN ma USING (label) JOIN mb USING (bucket),
             tot),
         it AS (SELECT SUM(contrib) AS i_total FROM mi)
         SELECT label, bucket, n,
           ROUND(CAST(contrib AS DOUBLE), 6) AS mi_contrib,
           ROUND(CAST(i_total AS DOUBLE), 6) AS i_total,
           ROUND(CAST(i_total AS DOUBLE)
             / sqrt(CAST(h_label AS DOUBLE) * CAST(h_bucket AS DOUBLE)),
             6) AS nmi
         FROM mi, it, ha, hb ORDER BY label, bucket""",
    "dq_candidate_keys" ->
      """WITH c1 AS (SELECT 'o_orderkey' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(MAX(cnt) AS BIGINT) AS mx
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)),
         c2 AS (SELECT 'o_custkey', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_custkey)),
         c3 AS (SELECT 'o_orderdate', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderdate)),
         c4 AS (SELECT 'o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_totalprice)),
         c5 AS (SELECT 'o_custkey,o_orderdate', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_custkey, o_orderdate)),
         c6 AS (SELECT 'o_custkey,o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_custkey, o_totalprice)),
         c7 AS (SELECT 'o_orderdate,o_totalprice', COUNT(*), MAX(cnt)
           FROM (SELECT COUNT(*) AS cnt FROM orders
             GROUP BY o_orderdate, o_totalprice)),
         u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
           UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4
           UNION ALL SELECT * FROM c5 UNION ALL SELECT * FROM c6
           UNION ALL SELECT * FROM c7),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
         SELECT candidate, n_rows, n AS n_distinct,
           n_rows - n AS dup_rows, mx AS max_group,
           ROUND(CAST(n AS DOUBLE) / n_rows, 6) AS uniqueness,
           n = n_rows AS is_key
         FROM u, t ORDER BY candidate""",
    "sample_neyman_alloc" ->
      """WITH mom AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
           FROM documents GROUP BY 1),
         m2 AS (SELECT lang, nh,
             CASE WHEN nh > 1 THEN
               sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)
                 / (CAST(nh AS DOUBLE) * CAST(nh - 1 AS DOUBLE)))
             ELSE 0.0 END AS sh
           FROM mom),
         m3 AS (SELECT *, CAST(CAST(nh AS DOUBLE) * sh AS DECIMAL(28,12))
             AS w FROM m2),
         tot AS (SELECT CAST(SUM(nh) AS BIGINT) AS n_pop, SUM(w) AS wt
           FROM m3),
         alloc AS (SELECT lang, nh, sh,
             100 * CAST(nh AS DOUBLE) / n_pop AS n_prop,
             100 * CAST(w AS DOUBLE) / CAST(wt AS DOUBLE) AS n_ney,
             n_pop
           FROM m3, tot),
         vt AS (SELECT *,
             CAST(CAST(nh AS DOUBLE) * nh * sh * sh
               / (n_prop * CAST(n_pop AS DOUBLE) * n_pop)
               AS DECIMAL(28,12)) AS vp,
             CAST(CASE WHEN n_ney > 0 THEN
                 CAST(nh AS DOUBLE) * nh * sh * sh
                   / (n_ney * CAST(n_pop AS DOUBLE) * n_pop)
               ELSE 0.0 END AS DECIMAL(28,12)) AS vn
           FROM alloc),
         vs AS (SELECT SUM(vp) AS var_prop, SUM(vn) AS var_ney FROM vt)
         SELECT lang, nh, ROUND(sh, 6) AS s_h,
           ROUND(n_prop, 6) AS n_prop, ROUND(n_ney, 6) AS n_neyman,
           ROUND(CAST(var_prop AS DOUBLE), 6) AS var_prop,
           ROUND(CAST(var_ney AS DOUBLE), 6) AS var_neyman,
           ROUND(CAST(var_ney AS DOUBLE) / CAST(var_prop AS DOUBLE), 6)
             AS efficiency
         FROM vt, vs ORDER BY lang""",
    "text_msttr" ->
      """WITH tok AS (SELECT doc_id, lang,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS token,
             len(string_split(text, ' ')) AS n_tok
           FROM documents),
         seg AS (SELECT doc_id, lang, w, pos // w AS seg, token
           FROM tok, (VALUES (10), (25), (50)) ws(w)
           WHERE token <> '' AND (pos // w + 1) * w <= n_tok),
         st AS (SELECT doc_id, lang, w, seg,
             CAST(COUNT(DISTINCT token) AS BIGINT) AS types
           FROM seg GROUP BY 1, 2, 3, 4)
         SELECT lang, w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(CAST(SUM(types) AS DOUBLE) / (w * COUNT(*)), 6) AS msttr
         FROM st GROUP BY 1, 2 ORDER BY lang, w""",
    "events_seq_patterns" ->
      """WITH s AS (SELECT user_id, event_type, MIN(ts) AS t_min,
             MAX(ts) AS t_max
           FROM events GROUP BY 1, 2),
         nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events),
         pat AS (SELECT a.event_type AS a, b.event_type AS b,
             CAST(COUNT(*) AS BIGINT) AS n_users_pattern
           FROM s a JOIN s b
             ON a.user_id = b.user_id AND a.t_min < b.t_max
           GROUP BY 1, 2),
         ha AS (SELECT event_type AS a,
             CAST(COUNT(*) AS BIGINT) AS n_users_a
           FROM s GROUP BY 1)
         SELECT pat.a, pat.b, n_users_pattern,
           ROUND(CAST(n_users_pattern AS DOUBLE) / n_users, 6) AS support,
           ROUND(CAST(n_users_pattern AS DOUBLE) / n_users_a, 6)
             AS confidence
         FROM pat JOIN ha ON pat.a = ha.a, nu
         ORDER BY pat.a, pat.b""",
    "sim_multiprobe_lsh" ->
      """WITH dims AS (SELECT vec_id, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
         plane AS (SELECT j, d,
             CASE WHEN (strpos('0123456789abcdef',
               substr(md5(CAST(j AS VARCHAR) || ':' || CAST(d AS VARCHAR)),
                 1, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END AS s
           FROM range(8) a(j), range(1, 65) b(d)),
         proj AS (SELECT vec_id, j,
             SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
               AS p
           FROM dims JOIN plane USING (d) GROUP BY 1, 2),
         vb AS (SELECT vec_id,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM proj GROUP BY vec_id),
         q AS (SELECT label, MIN(vec_id) AS qid FROM embeddings
           GROUP BY 1),
         qproj AS (SELECT q.label, pr.j, pr.p FROM q
           JOIN proj pr ON pr.vec_id = q.qid),
         qsig AS (SELECT label,
             string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
               ORDER BY j) AS bucket
           FROM qproj GROUP BY label),
         flips AS (SELECT qp.label,
             CAST(ROW_NUMBER() OVER (PARTITION BY qp.label
               ORDER BY ABS(qp.p), qp.j) AS INT) AS pr,
             substr(s.bucket, 1, qp.j)
               || (CASE WHEN substr(s.bucket, qp.j + 1, 1) = '1'
                   THEN '0' ELSE '1' END)
               || substr(s.bucket, qp.j + 2, 8) AS bucket
           FROM qproj qp JOIN qsig s USING (label)),
         probes AS (SELECT label, 0 AS pr, bucket FROM qsig
           UNION ALL SELECT label, pr, bucket FROM flips),
         cand AS (SELECT DISTINCT p2.label, np.n_probes, v.vec_id
           FROM probes p2 JOIN vb v USING (bucket)
           CROSS JOIN (VALUES (1), (5), (9)) np(n_probes)
           WHERE p2.pr < np.n_probes),
         cand2 AS (SELECT c.label, c.n_probes, c.vec_id
           FROM cand c JOIN q USING (label) WHERE c.vec_id <> q.qid),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb FROM q
           JOIN embeddings e ON e.vec_id = q.qid),
         brute AS (SELECT label, cid AS vec_id FROM (
             SELECT qe.label, c.vec_id AS cid,
               ROW_NUMBER() OVER (PARTITION BY qe.label
                 ORDER BY list_cosine_similarity(c.embedding, qe.q_emb)
                   DESC, c.vec_id) AS rk
             FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid) z
           WHERE rk <= 10),
         hits AS (SELECT c.label, c.n_probes,
             CAST(COUNT(*) AS BIGINT) AS n_hits
           FROM cand2 c JOIN brute b
             ON c.label = b.label AND c.vec_id = b.vec_id
           GROUP BY 1, 2),
         nc AS (SELECT label, n_probes,
             CAST(COUNT(*) AS BIGINT) AS n_candidates
           FROM cand2 GROUP BY 1, 2),
         spine AS (SELECT q.label, np.n_probes FROM q
           CROSS JOIN (VALUES (1), (5), (9)) np(n_probes))
         SELECT sp.label, sp.n_probes,
           COALESCE(n_candidates, 0) AS n_candidates,
           ROUND(CAST(COALESCE(n_hits, 0) AS DOUBLE) / 10.0, 6) AS recall
         FROM spine sp
         LEFT JOIN nc ON sp.label = nc.label AND sp.n_probes = nc.n_probes
         LEFT JOIN hits
           ON sp.label = hits.label AND sp.n_probes = hits.n_probes
         ORDER BY sp.label, sp.n_probes""",
    "stream_psi_monitor" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events),
         base AS (SELECT CASE WHEN ts < t0 + INTERVAL 15 DAY
               THEN 1 ELSE 2 END AS half,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0 WHERE value IS NOT NULL),
         hist AS (SELECT c, COUNT(*) AS n FROM base WHERE half = 1
           GROUP BY 1),
         cdf AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM base
           WHERE half = 1),
         n2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM base
           WHERE half = 2),
         bounds AS (SELECT k, MIN(c) AS b
           FROM cdf, tot, range(1, 10) t(k)
           WHERE cum >= CAST(ceil(k * n1 / 10.0) AS BIGINT)
           GROUP BY 1),
         hc AS (SELECT half, c, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM base GROUP BY 1, 2),
         asg AS (SELECT half, cnt,
             1 + SUM(CASE WHEN c > b THEN 1 ELSE 0 END) AS bucket
           FROM hc CROSS JOIN bounds GROUP BY half, c, cnt),
         counts AS (SELECT half, bucket, CAST(SUM(cnt) AS BIGINT) AS n
           FROM asg GROUP BY 1, 2),
         ht AS (SELECT half, CAST(COUNT(*) AS BIGINT) AS ht FROM base
           GROUP BY 1),
         sh AS (SELECT c2.half, bucket, n, CAST(n AS DOUBLE) / ht AS p
           FROM counts c2 JOIN ht ON c2.half = ht.half),
         pr1 AS (SELECT bucket, n AS n_ref, p AS p_ref FROM sh
           WHERE half = 1),
         pr2 AS (SELECT bucket, n AS n_cur, p AS p_cur FROM sh
           WHERE half = 2),
         spine AS (SELECT CAST(k AS INT) AS bucket FROM range(1, 11) t(k)),
         pb AS (SELECT s.bucket,
             CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               CAST((p_cur - p_ref) * ln(p_cur / p_ref)
                 AS DECIMAL(28,12)) END AS contrib
           FROM spine s LEFT JOIN pr1 ON s.bucket = pr1.bucket
           LEFT JOIN pr2 ON s.bucket = pr2.bucket),
         psis AS (SELECT SUM(contrib) AS psi_sum FROM pb)
         SELECT CAST(1 AS INT) AS look, n1 AS n_ref, n1 AS n_cur,
           0.0 AS psi_total FROM tot
         UNION ALL
         SELECT CAST(2 AS INT), n1, n2,
           ROUND(CAST(psi_sum AS DOUBLE), 6)
         FROM tot, n2t, psis
         ORDER BY look""",
    "mm_audio_fingerprint" ->
      """WITH audio AS (SELECT doc_id, text FROM documents
             WHERE doc_id % 3 = 1 AND length(text) > 0),
         b AS (SELECT doc_id, (pos - 1) // 32 AS w,
             CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
               AS BIGINT) AS v
           FROM (SELECT doc_id, text,
                   unnest([p for p in range(1, length(text) + 1)]) AS pos
                 FROM audio) u),
         wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT) AS energy
                  FROM b GROUP BY 1, 2),
         lags AS (SELECT doc_id, w, energy,
             LAG(energy) OVER (PARTITION BY doc_id ORDER BY w) AS pe,
             LEAD(energy) OVER (PARTITION BY doc_id ORDER BY w) AS ne
           FROM wins),
         pk AS (SELECT doc_id, w, energy // 4096 AS q,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY w) AS rk
           FROM lags WHERE energy > COALESCE(pe, -1)
             AND energy >= COALESCE(ne, -1)),
         sig AS (SELECT DISTINCT a.doc_id,
             md5(CAST(a.q AS VARCHAR) || ':' || CAST(bb.q AS VARCHAR)
               || ':' || CAST(bb.w - a.w AS VARCHAR)) AS h
           FROM pk a JOIN pk bb ON a.doc_id = bb.doc_id
             AND bb.rk > a.rk AND bb.rk <= a.rk + 3),
         sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sig
           GROUP BY 1),
         keep AS (SELECT h FROM sig GROUP BY h
           HAVING COUNT(*) BETWEEN 2 AND 64),
         pr AS (SELECT s1.doc_id AS d1, s2.doc_id AS d2,
             CAST(COUNT(*) AS BIGINT) AS inter
           FROM sig s1 JOIN sig s2
             ON s1.h = s2.h AND s1.doc_id < s2.doc_id
           JOIN keep k ON k.h = s1.h
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT d1, d2, inter AS n_shared, z1.n AS n1, z2.n AS n2,
           ROUND(CAST(inter AS DOUBLE) / least(z1.n, z2.n), 6) AS score
         FROM pr JOIN sizes z1 ON d1 = z1.doc_id
         JOIN sizes z2 ON d2 = z2.doc_id
         ORDER BY n_shared DESC, d1, d2""",
    "graph_closeness" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, v1, v2 FROM (
             SELECT label, v1, v2 FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         nodes AS (SELECT label, vec_id AS node FROM embeddings),
         seeds AS (SELECT label, node AS seed FROM (
             SELECT label, node, ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY node) AS srk FROM nodes) z WHERE srk <= 3),
         d0 AS (SELECT label, seed, seed AS node FROM seeds),
         f1 AS (SELECT DISTINCT d0.label, d0.seed, s.v2 AS node
           FROM sym s JOIN d0 ON s.label = d0.label AND s.v1 = d0.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = d0.label AND x.seed = d0.seed
               AND x.node = s.v2)),
         f2 AS (SELECT DISTINCT f1.label, f1.seed, s.v2 AS node
           FROM sym s JOIN f1 ON s.label = f1.label AND s.v1 = f1.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = f1.label AND x.seed = f1.seed
               AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = f1.label AND y.seed = f1.seed
                 AND y.node = s.v2)),
         f3 AS (SELECT DISTINCT f2.label, f2.seed, s.v2 AS node
           FROM sym s JOIN f2 ON s.label = f2.label AND s.v1 = f2.node
           WHERE NOT EXISTS (SELECT 1 FROM d0 x
             WHERE x.label = f2.label AND x.seed = f2.seed
               AND x.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f1 y
               WHERE y.label = f2.label AND y.seed = f2.seed
                 AND y.node = s.v2)
             AND NOT EXISTS (SELECT 1 FROM f2 z
               WHERE z.label = f2.label AND z.seed = f2.seed
                 AND z.node = s.v2)),
         reach AS (SELECT label, seed, node, 1 AS dist FROM f1
           UNION ALL SELECT label, seed, node, 2 FROM f2
           UNION ALL SELECT label, seed, node, 3 FROM f3),
         bs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS nv FROM nodes
           GROUP BY 1),
         agg AS (SELECT r.label, r.seed,
             CAST(COUNT(*) AS BIGINT) AS n_reached,
             CAST(SUM(dist) AS BIGINT) AS sum_dist,
             SUM(CAST(CAST(1.0 AS DOUBLE) / dist AS DECIMAL(18,9)))
               AS harm
           FROM reach r GROUP BY 1, 2)
         SELECT a.label, a.seed, n_reached,
           nv - 1 - n_reached AS n_unreached, sum_dist,
           ROUND(CAST(n_reached AS DOUBLE) / sum_dist, 6) AS closeness,
           ROUND(CAST(harm AS DOUBLE), 6) AS harmonic
         FROM agg a JOIN bs ON a.label = bs.label
         ORDER BY a.label, a.seed""",
    "orders_theil_decomp" ->
      """WITH cust AS (SELECT n_name,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           GROUP BY n_name, o_custkey
           HAVING SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) > 0),
         pop AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(x) AS BIGINT) AS x_all FROM cust),
         grp AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(x) AS BIGINT) AS x_g FROM cust GROUP BY 1),
         terms AS (SELECT c.n_name, g.n_g, g.x_g, p.n_all, p.x_all,
             CAST(x AS DOUBLE) / (CAST(x_g AS DOUBLE) / n_g) AS rg,
             CAST(x AS DOUBLE) / (CAST(x_all AS DOUBLE) / n_all) AS ra
           FROM cust c JOIN grp g ON c.n_name = g.n_name, pop p),
         q AS (SELECT n_name, n_g, x_g, n_all, x_all,
             CAST(rg * ln(rg) AS DECIMAL(28,12)) AS tw,
             CAST(ra * ln(ra) AS DECIMAL(28,12)) AS tt
           FROM terms),
         tot AS (SELECT CAST(SUM(tt) AS DOUBLE) / MAX(n_all)
             AS theil_total FROM q),
         g2 AS (SELECT n_name, MAX(n_g) AS n_cust, MAX(x_g) AS x_g,
             MAX(n_all) AS n_all, MAX(x_all) AS x_all,
             CAST(SUM(tw) AS DOUBLE) / MAX(n_g) AS theil_within
           FROM q GROUP BY 1)
         SELECT n_name, n_cust,
           ROUND(CAST(x_g AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(x_g AS DOUBLE) / x_all, 6) AS share,
           ROUND(theil_within, 6) AS theil_within,
           ROUND(CAST(x_g AS DOUBLE) / x_all * theil_within, 6)
             AS contrib_within,
           ROUND(CAST(x_g AS DOUBLE) / x_all
             * ln((CAST(x_g AS DOUBLE) / n_cust)
               / (CAST(x_all AS DOUBLE) / n_all)), 6) AS contrib_between,
           ROUND(theil_total, 6) AS theil_total
         FROM g2, tot ORDER BY n_name""",
    "agg_trimmed_mean" ->
      """WITH cents AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT)
             AS c FROM orders),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cents
           GROUP BY 1),
         ch AS (SELECT c, cnt, SUM(cnt) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc FROM cents),
         axis AS (SELECT p, n, sc, n * p // 100 AS k
           FROM (VALUES (1), (5), (10)) t(p), tot),
         lo AS (SELECT p, MIN(c) AS lo FROM ch, axis
           WHERE cum >= k + 1 GROUP BY 1),
         hi AS (SELECT p, MIN(c) AS hi FROM ch, axis
           WHERE cum >= n - k GROUP BY 1),
         inr AS (SELECT p,
             CAST(SUM(take * c) AS BIGINT) AS ts,
             CAST(SUM(take) AS BIGINT) AS tn
           FROM (SELECT a.p, ch.c,
               GREATEST(0, LEAST(cum, n - k) - GREATEST(cum - cnt, k))
                 AS take
             FROM ch, axis a) z GROUP BY 1)
         SELECT a.p, a.k, tn AS n_kept,
           ROUND(CAST(sc AS DOUBLE) / n / 100.0, 4) AS raw_mean,
           ROUND(CAST(ts AS DOUBLE) / tn / 100.0, 4) AS trimmed_mean,
           ROUND(CAST(ts + a.k * (lo.lo + hi.hi) AS DOUBLE) / n / 100.0,
             4) AS winsor_mean,
           ROUND(CAST(lo.lo AS DOUBLE) / 100.0, 2) AS lo_clamp,
           ROUND(CAST(hi.hi AS DOUBLE) / 100.0, 2) AS hi_clamp
         FROM axis a JOIN inr ON a.p = inr.p
         JOIN lo ON a.p = lo.p JOIN hi ON a.p = hi.p
         ORDER BY a.p""",
    "window_interpolate" ->
      """WITH ev AS (SELECT ts, CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'
             AND value IS NOT NULL),
         obs AS (SELECT date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS sc
           FROM ev GROUP BY 1),
         obs2 AS (SELECT h, n,
             CAST(CAST(sc AS DOUBLE) / n AS DECIMAL(18,9)) AS v
           FROM obs),
         span AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1 FROM ev),
         spine AS (SELECT h0 + to_hours(CAST(k AS BIGINT)) AS h,
             CAST(k + 1 AS BIGINT) AS t
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         series AS (SELECT s.h, s.t, o.n, o.v
           FROM spine s LEFT JOIN obs2 o ON s.h = o.h),
         f AS (SELECT h, t, n, v,
             LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS pt,
             FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
               OVER (ORDER BY t
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
           FROM series)
         SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           COALESCE(n, 0) AS n_obs,
           v IS NOT NULL AS observed,
           ROUND(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             ELSE CAST(pv AS DOUBLE)
               + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                 * (t - pt) / (nt - pt) END, 6) AS value
         FROM f ORDER BY hour_start""",
    "events_did_pretrends" ->
      """WITH t0 AS (SELECT MIN(ts) AS t0 FROM events
           WHERE value IS NOT NULL),
         pre AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'treat'
               ELSE 'control' END AS arm,
             date_diff('day', CAST(t0 AS DATE), CAST(ts AS DATE)) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS c
           FROM events, t0
           WHERE value IS NOT NULL AND ts < t0 + INTERVAL 15 DAY),
         daily AS (SELECT arm, day, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS sc FROM pre GROUP BY 1, 2),
         d2 AS (SELECT arm, day,
             CAST(CAST(sc AS DOUBLE) / n AS DECIMAL(18,9)) AS y
           FROM daily),
         fit AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(day * day) AS BIGINT) AS sxx,
             SUM(y) AS sy, SUM(y * day) AS sxy
           FROM d2 GROUP BY 1),
         f2 AS (SELECT arm, n_days, sx, sy,
             (n_days * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / CAST(n_days * sxx - sx * sx AS DOUBLE) AS slope
           FROM fit),
         f3 AS (SELECT arm, n_days, slope,
             (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n_days
               AS intercept
           FROM f2),
         gap AS (SELECT MAX(CASE WHEN arm = 'treat' THEN slope END)
             - MAX(CASE WHEN arm = 'control' THEN slope END)
             AS slope_gap FROM f3)
         SELECT arm, n_days, ROUND(slope / 100.0, 6) AS slope,
           ROUND(intercept / 100.0, 4) AS intercept,
           ROUND(slope_gap / 100.0, 6) AS slope_gap
         FROM f3, gap ORDER BY arm""",
    "sim_hnsw_search" -> {
      // layered descent: per-layer edge CTEs plus six unrolled hops
      // (two per layer, 2 -> 1 -> 0) share one generated shape
      def layerSql(l: Int): String =
        s"""n$l AS (SELECT label, vec_id, embedding FROM lv
             WHERE level >= $l),
           d$l AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM n$l a JOIN n$l b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           k$l AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM d$l) z
             WHERE rk <= 3),
           e$l AS MATERIALIZED (SELECT DISTINCT label, v1, v2 FROM (
               SELECT label, v1, v2 FROM k$l
               UNION ALL SELECT label, v2, v1 FROM k$l) u),
           """
      def stepSql(t: Int, l: Int): String =
        s"""nb$t AS MATERIALIZED (SELECT s.label, s.qid,
               y.v2 AS cand,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim
             FROM s${t - 1} s
             JOIN e$l y ON y.label = s.label AND y.v1 = s.cur
             JOIN embeddings e ON e.vec_id = y.v2
             JOIN qe ON qe.label = s.label
             WHERE y.v2 <> s.qid),
           s$t AS MATERIALIZED (SELECT label, qid, cand AS cur, sim
             FROM (SELECT c.label, c.qid, c.cand, c.sim,
                 ROW_NUMBER() OVER (PARTITION BY c.label
                   ORDER BY c.sim DESC, c.cand) AS rk
               FROM (SELECT label, qid, cand, sim FROM nb$t
                     UNION ALL SELECT label, qid, cur, sim
                       FROM s${t - 1}) c) z WHERE rk = 1),
           x$t AS (SELECT label, cand, $t AS fstep FROM nb$t),
           """
      val layers = Seq(2, 2, 1, 1, 0, 0)
      val stepsSql = layers.zipWithIndex
        .map { case (l, i) => stepSql(i + 1, l) }.mkString
      val xUnion = (0 to 6).map(t => s"SELECT * FROM x$t")
        .mkString(" UNION ALL ")
      val traceSel = (0 +: layers.indices.map(_ + 1)).zip(2 +: layers)
        .map { case (t, l) =>
          s"SELECT label, $t AS step, $l AS layer, cur AS node, sim FROM s$t" }
        .mkString("\n           UNION ALL ")
      s"""WITH lv AS (SELECT vec_id, label, embedding,
             CASE WHEN b = 0 THEN 8
               WHEN b % 2 = 1 THEN 0 WHEN b % 4 = 2 THEN 1
               WHEN b % 8 = 4 THEN 2 WHEN b % 16 = 8 THEN 3
               WHEN b % 32 = 16 THEN 4 WHEN b % 64 = 32 THEN 5
               WHEN b % 128 = 64 THEN 6 ELSE 7 END AS level
           FROM (SELECT vec_id, label, embedding,
               (strpos('0123456789abcdef',
                  substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 1, 1))
                  - 1) * 16
               + (strpos('0123456789abcdef',
                  substr(md5('hnsw:' || CAST(vec_id AS VARCHAR)), 2, 1))
                  - 1) AS b
               FROM embeddings) zb),
         ${Seq(2, 1, 0).map(layerSql).mkString}q AS (
           SELECT label, MIN(vec_id) AS qid FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         entry AS (SELECT label, vec_id AS cur FROM (
             SELECT lv.label, lv.vec_id, ROW_NUMBER()
               OVER (PARTITION BY lv.label
                 ORDER BY lv.level DESC, lv.vec_id) AS rk
             FROM lv JOIN q ON q.label = lv.label
             WHERE lv.vec_id <> q.qid) z WHERE rk = 1),
         s0 AS (SELECT qe.label, qe.qid, entry.cur,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM qe JOIN entry ON entry.label = qe.label
           JOIN embeddings e ON e.vec_id = entry.cur),
         x0 AS (SELECT label, cur AS cand, 0 AS fstep FROM s0),
         ${stepsSql}fs AS (SELECT label, cand, MIN(fstep) AS fs
           FROM ($xUnion) xs GROUP BY 1, 2),
         brute AS (SELECT label, cid AS cand FROM (
             SELECT qe.label, c.vec_id AS cid, ROW_NUMBER()
               OVER (PARTITION BY qe.label ORDER BY
                 list_cosine_similarity(c.embedding, qe.q_emb) DESC,
                 c.vec_id) AS rk
             FROM qe JOIN embeddings c ON c.label = qe.label
             WHERE c.vec_id <> qe.qid) z WHERE rk <= 10),
         spine AS (SELECT label, step FROM q
           CROSS JOIN range(7) t(step)),
         census AS (SELECT sp.label, CAST(sp.step AS BIGINT) AS step,
             CAST(SUM(CASE WHEN fs.fs <= sp.step THEN 1 ELSE 0 END)
               AS BIGINT) AS n_explored,
             CAST(SUM(CASE WHEN fs.fs <= sp.step
                 AND b.cand IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits
           FROM spine sp LEFT JOIN fs ON fs.label = sp.label
           LEFT JOIN brute b
             ON b.label = fs.label AND b.cand = fs.cand
           GROUP BY 1, 2),
         trace AS ($traceSel)
         SELECT t.label, CAST(t.step AS BIGINT) AS step,
           CAST(t.layer AS BIGINT) AS layer, t.node,
           ROUND(CAST(t.sim AS DOUBLE), 4) AS sim,
           c.n_explored,
           ROUND(CAST(c.n_hits AS DOUBLE) / 10, 4) AS recall_at_10
         FROM trace t JOIN census c
           ON c.label = t.label AND c.step = t.step
         ORDER BY t.label, t.step"""
    },
    "sim_greedy_search" -> {
      // six unrolled greedy steps share one shape — generated, not
      // hand-copied, so the hop bodies cannot drift apart
      def stepSql(i: Int): String =
        s"""c$i AS (SELECT s.label, s.qid, s.cur AS cand FROM s${i - 1} s
           UNION ALL SELECT s.label, s.qid, y.v2 FROM s${i - 1} s
             JOIN sym y ON y.label = s.label AND y.v1 = s.cur
             WHERE y.v2 <> s.qid),
         s$i AS (SELECT label, qid, cand AS cur, sim FROM (
             SELECT c.label, c.qid, c.cand,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim,
               ROW_NUMBER() OVER (PARTITION BY c.label ORDER BY
                 list_cosine_similarity(e.embedding, qe.q_emb) DESC,
                 c.cand) AS rk
             FROM c$i c JOIN embeddings e ON e.vec_id = c.cand
             JOIN qe ON qe.label = c.label) z WHERE rk = 1),
         """
      val traceSel = (0 to 6).map(h =>
        s"SELECT label, $h AS hop, cur, sim FROM s$h")
        .mkString("\n           UNION ALL ")
      s"""WITH directed AS (SELECT a.label, a.vec_id AS v1,
             b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         sym AS (SELECT DISTINCT label, v1, v2 FROM (
             SELECT label, v1, v2 FROM knn
             UNION ALL SELECT label, v2, v1 FROM knn) u),
         q AS (SELECT label, MIN(vec_id) AS qid, MAX(vec_id) AS entry
           FROM embeddings GROUP BY 1),
         qe AS (SELECT q.label, q.qid, q.entry, e.embedding AS q_emb
           FROM q JOIN embeddings e ON e.vec_id = q.qid),
         s0 AS (SELECT q.label, q.qid, q.entry AS cur,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM q JOIN embeddings e ON e.vec_id = q.entry
           JOIN qe ON qe.label = q.label),
         ${(1 to 6).map(stepSql).mkString}brute AS (
           SELECT label, cid AS nn_id, bsim FROM (
             SELECT qe.label, c.vec_id AS cid,
               list_cosine_similarity(c.embedding, qe.q_emb) AS bsim,
               ROW_NUMBER() OVER (PARTITION BY qe.label ORDER BY
                 list_cosine_similarity(c.embedding, qe.q_emb) DESC,
                 c.vec_id) AS rk
             FROM qe CROSS JOIN embeddings c WHERE c.vec_id <> qe.qid) z
           WHERE rk = 1),
         trace AS ($traceSel)
         SELECT t.label, t.hop, t.cur AS node,
           ROUND(CAST(t.sim AS DOUBLE), 4) AS sim,
           b.nn_id, ROUND(CAST(b.bsim AS DOUBLE), 4) AS nn_sim,
           t.cur = b.nn_id AS reached
         FROM trace t JOIN brute b ON t.label = b.label
         ORDER BY t.label, t.hop"""
    },
    "orders_demand_classes" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qm
           FROM lineitem GROUP BY 1, 2),
         span AS (SELECT CAST(date_diff('month',
             date_trunc('month', MIN(l_shipdate)),
             date_trunc('month', MAX(l_shipdate))) + 1 AS BIGINT)
             AS n_months FROM lineitem),
         parts AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(qm) AS BIGINT) AS s,
             CAST(SUM(qm * qm) AS BIGINT) AS qq
           FROM monthly GROUP BY 1),
         cls AS (SELECT p.*, n_months,
             n_months * 100 >= m * 132 AS adi_hi,
             (m * qq - s * s) * 100 >= s * s * 49 AS cv2_hi,
             CAST(CAST(n_months AS DOUBLE) / m AS DECIMAL(18,9)) AS adi,
             CAST(CAST(m * qq - s * s AS DOUBLE)
               / CAST(s * s AS DOUBLE) AS DECIMAL(18,9)) AS cv2
           FROM parts p, span),
         lab AS (SELECT *,
             CASE WHEN NOT adi_hi AND NOT cv2_hi THEN 'smooth'
                  WHEN adi_hi AND NOT cv2_hi THEN 'intermittent'
                  WHEN NOT adi_hi AND cv2_hi THEN 'erratic'
                  ELSE 'lumpy' END AS quadrant
           FROM cls),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM parts)
         SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.n_parts), 6)
             AS share,
           ROUND(CAST(SUM(adi) AS DOUBLE) / COUNT(*), 6) AS avg_adi,
           ROUND(CAST(SUM(cv2) AS DOUBLE) / COUNT(*), 6) AS avg_cv2
         FROM lab, tot GROUP BY quadrant ORDER BY quadrant""",
    "dq_pchart" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_null
           FROM events GROUP BY 1),
         pooled AS (SELECT CAST(SUM(n_null) AS BIGINT) AS tx,
             CAST(SUM(n) AS BIGINT) AS tn FROM daily)
         SELECT strftime(day, '%Y-%m-%d') AS day, n, n_null,
           ROUND(CAST(n_null AS DOUBLE) / n, 6) AS rate,
           ROUND(CAST(tx AS DOUBLE) / tn, 6) AS center,
           ROUND(GREATEST(0.0, CAST(tx AS DOUBLE) / tn
             - 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
               * (1.0 - CAST(tx AS DOUBLE) / tn) / n)), 6) AS lcl,
           ROUND(LEAST(1.0, CAST(tx AS DOUBLE) / tn
             + 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
               * (1.0 - CAST(tx AS DOUBLE) / tn) / n)), 6) AS ucl,
           (CAST(n_null AS DOUBLE) / n > CAST(tx AS DOUBLE) / tn
              + 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
                * (1.0 - CAST(tx AS DOUBLE) / tn) / n)
            OR CAST(n_null AS DOUBLE) / n < CAST(tx AS DOUBLE) / tn
              - 3.0 * sqrt(CAST(tx AS DOUBLE) / tn
                * (1.0 - CAST(tx AS DOUBLE) / tn) / n))
             AS out_of_control
         FROM daily, pooled ORDER BY day""",
    "docs_skyline_pareto" ->
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS c FROM
           (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents)
           WHERE token <> '' GROUP BY 1, 2),
         pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS types,
             CAST(SUM(c) AS BIGINT) AS n_tokens FROM tf GROUP BY 1),
         pq AS (SELECT *, CAST(CAST(types AS DOUBLE) / n_tokens
             AS DECIMAL(18,9)) AS ttr FROM pd),
         sk AS (SELECT *, MAX(ttr) OVER (
             ORDER BY n_tokens DESC, ttr DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_prev FROM pq),
         fr AS (SELECT * FROM sk
           WHERE best_prev IS NULL OR ttr > best_prev)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id)
             AS INT) AS rank,
           doc_id, n_tokens, types,
           ROUND(CAST(ttr AS DOUBLE), 6) AS ttr
         FROM fr ORDER BY rank""",
    // orders_bass_diffusion: exact DECIMAL(38,0) power sums, one
    // identical double Cramer expression per coefficient on both sides
    "orders_bass_diffusion" ->
      """WITH firsts AS (SELECT o_custkey,
           MIN(CAST(o_orderdate AS DATE)) AS fd
           FROM orders GROUP BY 1),
         rng AS (SELECT MIN(fd) AS d0, MAX(fd) AS d1 FROM firsts),
         wk AS (SELECT CAST(FLOOR(date_diff('day', d0, fd) / 7)
               AS BIGINT) AS week,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM firsts, rng GROUP BY 1),
         spine AS (SELECT unnest(generate_series(0,
             CAST(FLOOR(date_diff('day', d0, d1) / 7) AS BIGINT)))
             AS week FROM rng),
         cum AS (SELECT s2.week, COALESCE(SUM(w2.n), 0) AS x
           FROM spine s2 LEFT JOIN wk w2 ON w2.week < s2.week
           GROUP BY 1),
         series AS (SELECT s.week, COALESCE(wk.n, 0) AS n, c.x,
             CAST(c.x AS HUGEINT) AS hx,
             CAST(COALESCE(wk.n, 0) AS HUGEINT) AS hn
           FROM spine s LEFT JOIN wk USING (week)
           JOIN cum c ON c.week = s.week),
         sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(n) AS BIGINT) AS n_adopters,
             SUM(CAST(x AS DECIMAL(38,0))) AS sx,
             SUM(CAST(hx * hx AS DECIMAL(38,0))) AS sx2,
             SUM(CAST(hx * hx * hx AS DECIMAL(38,0))) AS sx3,
             SUM(CAST(hx * hx * hx * hx AS DECIMAL(38,0))) AS sx4,
             SUM(CAST(n AS DECIMAL(38,0))) AS sy,
             SUM(CAST(hx * hn AS DECIMAL(38,0))) AS sxy,
             SUM(CAST(hx * hx * hn AS DECIMAL(38,0))) AS sx2y
           FROM series),
         dsum AS (SELECT nw, n_adopters,
             CAST(nw AS DOUBLE) AS dn, CAST(sx AS DOUBLE) AS dsx,
             CAST(sx2 AS DOUBLE) AS dsx2, CAST(sx3 AS DOUBLE) AS dsx3,
             CAST(sx4 AS DOUBLE) AS dsx4, CAST(sy AS DOUBLE) AS dsy,
             CAST(sxy AS DOUBLE) AS dsxy,
             CAST(sx2y AS DOUBLE) AS dsx2y
           FROM sums),
         dets AS (SELECT *,
             dn * (dsx2 * dsx4 - dsx3 * dsx3)
               - dsx * (dsx * dsx4 - dsx3 * dsx2)
               + dsx2 * (dsx * dsx3 - dsx2 * dsx2) AS det,
             dsy * (dsx2 * dsx4 - dsx3 * dsx3)
               - dsx * (dsxy * dsx4 - dsx3 * dsx2y)
               + dsx2 * (dsxy * dsx3 - dsx2 * dsx2y) AS det_a,
             dn * (dsxy * dsx4 - dsx3 * dsx2y)
               - dsy * (dsx * dsx4 - dsx3 * dsx2)
               + dsx2 * (dsx * dsx2y - dsxy * dsx2) AS det_b,
             dn * (dsx2 * dsx2y - dsxy * dsx3)
               - dsx * (dsx * dsx2y - dsxy * dsx2)
               + dsy * (dsx * dsx3 - dsx2 * dsx2) AS det_c
           FROM dsum),
         coefs AS (SELECT *,
             CASE WHEN det <> 0 THEN det_a / det END AS a,
             CASE WHEN det <> 0 THEN det_b / det END AS b,
             CASE WHEN det <> 0 THEN det_c / det END AS c
           FROM dets),
         quad AS (SELECT *, b * b - 4.0 * a * c AS disc FROM coefs),
         mrow AS (SELECT *,
             CASE WHEN disc IS NOT NULL AND disc >= 0 AND c <> 0
               THEN (-b - sqrt(disc)) / (2.0 * c) END AS m_hat
           FROM quad),
         prow AS (SELECT *,
             CASE WHEN m_hat IS NOT NULL AND m_hat <> 0
               THEN a / m_hat END AS p
           FROM mrow),
         qrow AS (SELECT *, CASE WHEN p IS NOT NULL THEN b + p END AS q
           FROM prow)
         SELECT nw AS n_weeks, n_adopters,
           ROUND(a, 6) AS coef_a, ROUND(b, 6) AS coef_b,
           ROUND(c, 9) AS coef_c, ROUND(m_hat, 2) AS m_hat,
           ROUND(p, 6) AS p_innovation, ROUND(q, 6) AS q_imitation,
           ROUND(CASE WHEN p IS NOT NULL AND p > 0 AND q > 0
             THEN ln(q / p) / (p + q) END, 2) AS peak_week
         FROM qrow""",
    "orders_croston" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS z
           FROM lineitem GROUP BY 1, 2),
         mi AS (SELECT *, CAST(year(mo) * 12 + month(mo) AS BIGINT)
             AS midx FROM monthly),
         top AS (SELECT l_partkey, COUNT(*) AS m FROM monthly
           GROUP BY 1 ORDER BY m DESC, l_partkey LIMIT 5),
         sq AS (SELECT mi.l_partkey, z, midx,
             CAST(ROW_NUMBER() OVER (PARTITION BY mi.l_partkey
               ORDER BY midx) AS BIGINT) AS t,
             midx - LAG(midx) OVER (PARTITION BY mi.l_partkey
               ORDER BY midx) AS gap
           FROM mi JOIN top USING (l_partkey)),
         zmx AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM sq GROUP BY 1),
         zses AS (SELECT s.l_partkey,
             CAST(SUM(CAST((CASE WHEN t = 1 THEN pow(0.8, n - 1)
               ELSE 0.2 * pow(0.8, n - t) END) * z AS DECIMAL(28,12)))
               AS DOUBLE) AS z_ses,
             MAX(n) AS m
           FROM sq s JOIN zmx USING (l_partkey) GROUP BY 1),
         gp AS (SELECT l_partkey, t - 1 AS t, gap FROM sq
           WHERE gap IS NOT NULL),
         gmx AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
           FROM gp GROUP BY 1),
         pses AS (SELECT g.l_partkey,
             CAST(SUM(CAST((CASE WHEN t = 1 THEN pow(0.8, n - 1)
               ELSE 0.2 * pow(0.8, n - t) END) * gap
               AS DECIMAL(28,12))) AS DOUBLE) AS p_ses
           FROM gp g JOIN gmx USING (l_partkey) GROUP BY 1)
         SELECT z.l_partkey, m, ROUND(z_ses / 100.0, 6) AS z_ses,
           ROUND(p_ses, 6) AS p_ses,
           ROUND(z_ses / p_ses / 100.0, 6) AS croston,
           ROUND(z_ses / p_ses / 100.0 * 0.9, 6) AS sba
         FROM zses z JOIN pses USING (l_partkey) ORDER BY z.l_partkey""",
    "dq_fd_discovery" -> {
      // 12 directed column pairs share one census shape — generated from
      // one template so the pair bodies cannot drift apart
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate")
      def fd(a: String, b: String): String =
        s"""SELECT '$a' AS determinant, '$b' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(SUM(sz - best) AS BIGINT) AS g3_rows,
             ROUND(CAST(SUM(sz - best) AS DOUBLE)
               / (SELECT COUNT(*) FROM orders), 6) AS g3_rate,
             SUM(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS holds
           FROM (SELECT det, COUNT(*) AS n_dep, SUM(cnt) AS sz,
               MAX(cnt) AS best
             FROM (SELECT CAST($a AS VARCHAR) AS det,
                 CAST($b AS VARCHAR) AS dep, COUNT(*) AS cnt
               FROM o GROUP BY 1, 2) ab
             GROUP BY det) g"""
      val pairs = (for { a <- cols; b <- cols if a != b } yield fd(a, b))
        .mkString("\n         UNION ALL ")
      s"""WITH o AS (SELECT o_custkey, o_orderstatus, o_orderpriority,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
           FROM orders)
         $pairs
         ORDER BY determinant, dependent"""
    },
    "text_burrows_delta" ->
      """WITH tok AS (SELECT source, token FROM
           (SELECT source, unnest(string_split(text, ' ')) AS token
            FROM documents) WHERE token <> ''),
         st AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tok GROUP BY 1, 2),
         totals AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot
           FROM st GROUP BY 1),
         topw AS (SELECT token FROM (SELECT token, SUM(cnt) AS tc
             FROM st GROUP BY 1) z
           ORDER BY tc DESC, token LIMIT 30),
         f AS (SELECT t.source, w.token,
             CAST(CAST(COALESCE(cnt, 0) AS DOUBLE) * 1000.0
               / CAST(tot AS DOUBLE) AS DECIMAL(18,9)) AS fr
           FROM totals t CROSS JOIN topw w
           LEFT JOIN st ON st.source = t.source AND st.token = w.token),
         mo AS (SELECT token, SUM(fr) AS sf, SUM(fr * fr) AS sff,
             CAST(COUNT(*) AS BIGINT) AS ns
           FROM f GROUP BY 1),
         m2 AS (SELECT token, CAST(sf AS DOUBLE) / ns AS mu,
             sqrt(CAST(ns * sff - sf * sf AS DOUBLE)
               / (CAST(ns AS DOUBLE) * CAST(ns - 1 AS DOUBLE))) AS sd
           FROM mo),
         z AS (SELECT f.source, f.token,
             (CAST(fr AS DOUBLE) - mu) / sd AS z
           FROM f JOIN m2 ON f.token = m2.token)
         SELECT a.source AS s1, b.source AS s2,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           ROUND(CAST(SUM(CAST(ABS(a.z - b.z) AS DECIMAL(28,12)))
             AS DOUBLE) / COUNT(*), 6) AS delta
         FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
         GROUP BY 1, 2 ORDER BY s1, s2""",
    "events_att_matching" ->
      """WITH users AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS sc,
             user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         u2 AS (SELECT *, CAST(CAST(sc AS DOUBLE) / x AS DECIMAL(18,9))
             AS y FROM users),
         hist AS (SELECT x, COUNT(*) AS n FROM u2 GROUP BY 1),
         ch AS (SELECT x, SUM(n) OVER (ORDER BY x
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM u2),
         bounds AS (SELECT k, MIN(x) AS b
           FROM ch, tot, range(1, 10) t(k)
           WHERE cum >= CAST(ceil(k * nu / 10.0) AS BIGINT)
           GROUP BY 1),
         bk AS (SELECT treat, y,
             CAST(1 + SUM(CASE WHEN x > b THEN 1 ELSE 0 END) AS BIGINT)
               AS bucket
           FROM u2 CROSS JOIN bounds GROUP BY user_id, treat, y, x),
         strata AS (SELECT bucket,
             CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
               AS n_c,
             SUM(CASE WHEN treat THEN y END) AS sy_t,
             SUM(CASE WHEN treat THEN NULL ELSE y END) AS sy_c
           FROM bk GROUP BY 1),
         s2 AS (SELECT *,
             CASE WHEN n_t > 0 AND n_c > 0 THEN
               CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c
             END AS diff,
             LEAST(n_t, n_c) AS w
           FROM strata),
         s3 AS (SELECT *, CAST(diff * w AS DECIMAL(28,12)) AS wd
           FROM s2),
         att AS (SELECT CAST(SUM(wd) AS DOUBLE) / SUM(w) AS att FROM s3)
         SELECT bucket, n_t, n_c, ROUND(diff / 100.0, 6) AS diff,
           w AS weight, ROUND(att / 100.0, 6) AS att
         FROM s3, att ORDER BY bucket""",
    "agg_gh_means" ->
      """WITH c AS (SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders WHERE o_totalprice > 0)
         SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*) / 100.0, 4) AS mean,
           ROUND(exp(CAST(SUM(CAST(ln(CAST(c AS DOUBLE))
             AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)) / 100.0, 4)
             AS gmean,
           ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(CAST(CAST(1.0 AS DOUBLE) / c AS DECIMAL(28,12)))
               AS DOUBLE) / 100.0, 4) AS hmean
         FROM c GROUP BY 1 ORDER BY o_orderpriority""",
    "graph_hits" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         a1r AS (SELECT label, v2 AS node,
             CAST(COUNT(*) AS DOUBLE) AS a FROM knn GROUP BY 1, 2),
         a1t AS (SELECT label, SUM(CAST(a AS DECIMAL(28,12))) AS tot
           FROM a1r GROUP BY 1),
         a1 AS (SELECT r.label, node,
             CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) AS a
           FROM a1r r JOIN a1t USING (label)),
         h1r AS (SELECT k.label, k.v1 AS node,
             CAST(SUM(CAST(a AS DECIMAL(28,12))) AS DOUBLE) AS h
           FROM knn k JOIN a1 ON a1.label = k.label AND a1.node = k.v2
           GROUP BY 1, 2),
         h1t AS (SELECT label, SUM(CAST(h AS DECIMAL(28,12))) AS tot
           FROM h1r GROUP BY 1),
         h1 AS (SELECT r.label, node,
             CAST(h AS DOUBLE) / CAST(tot AS DOUBLE) AS h
           FROM h1r r JOIN h1t USING (label)),
         a2r AS (SELECT k.label, k.v2 AS node,
             CAST(SUM(CAST(h AS DECIMAL(28,12))) AS DOUBLE) AS a
           FROM knn k JOIN h1 ON h1.label = k.label AND h1.node = k.v1
           GROUP BY 1, 2),
         a2t AS (SELECT label, SUM(CAST(a AS DECIMAL(28,12))) AS tot
           FROM a2r GROUP BY 1),
         a2 AS (SELECT r.label, node,
             CAST(a AS DOUBLE) / CAST(tot AS DOUBLE) AS a
           FROM a2r r JOIN a2t USING (label)),
         ranked AS (SELECT a2.label, a2.node, a2.a, h1.h,
             CAST(ROW_NUMBER() OVER (PARTITION BY a2.label
               ORDER BY a2.a DESC, a2.node) AS INT) AS rk
           FROM a2 LEFT JOIN h1
             ON h1.label = a2.label AND h1.node = a2.node)
         SELECT label, rk, node, ROUND(a, 6) AS authority,
           ROUND(COALESCE(h, 0.0), 6) AS hub
         FROM ranked WHERE rk <= 3 ORDER BY label, rk""",
    "dq_rowhash_rollup" -> {
      // 48-bit value of the first 12 md5 hex nibbles, one term per
      // nibble — generated so the positional weights cannot drift
      val hexVal = (0 until 12).map { i =>
        s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * " +
          (1L << (4 * (11 - i)))
      }.mkString(" + ")
      s"""WITH rows0 AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             md5(CAST(o_orderkey AS VARCHAR) || '|'
               || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus
               || '|' || CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 AS VARCHAR)
               || '|' || strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
               || '|' || o_orderpriority) AS h
           FROM orders),
         hashed AS (SELECT day, CAST($hexVal AS BIGINT) AS rh
           FROM rows0),
         perday AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(rh) AS BIGINT) AS hash_xor
           FROM hashed GROUP BY 1),
         allr AS (SELECT 'ALL' AS day, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(bit_xor(rh) AS BIGINT) AS hash_xor FROM hashed)
         SELECT * FROM perday UNION ALL SELECT * FROM allr
         ORDER BY day"""
    },
    "orders_price_index" ->
      """WITH li AS (SELECT l_partkey, year(l_shipdate) AS yr,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS e,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS q
           FROM lineitem),
         span AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM li),
         pp AS (SELECT l_partkey,
             CASE WHEN yr = y0 THEN 0 ELSE 1 END AS period,
             CAST(SUM(e) AS BIGINT) AS ee, CAST(SUM(q) AS BIGINT) AS qq
           FROM li, span WHERE yr = y0 OR yr = y1
           GROUP BY 1, 2),
         p2 AS (SELECT *, CAST(ee AS DOUBLE) / qq AS p FROM pp),
         bp AS (SELECT b.l_partkey, b.p AS p0, b.qq AS q0,
             c.p AS p1, c.qq AS q1
           FROM p2 b JOIN p2 c ON b.l_partkey = c.l_partkey
           WHERE b.period = 0 AND c.period = 1),
         sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             SUM(CAST(p1 * q0 AS DECIMAL(28,12))) AS l_num,
             SUM(CAST(p0 * q0 AS DECIMAL(28,12))) AS l_den,
             SUM(CAST(p1 * q1 AS DECIMAL(28,12))) AS p_num,
             SUM(CAST(p0 * q1 AS DECIMAL(28,12))) AS p_den
           FROM bp),
         idx AS (SELECT n_parts,
             CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE) AS laspeyres,
             CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS paasche
           FROM sums)
         SELECT y0 AS base_year, y1 AS current_year, n_parts,
           ROUND(laspeyres, 6) AS laspeyres,
           ROUND(paasche, 6) AS paasche,
           ROUND(sqrt(laspeyres * paasche), 6) AS fisher
         FROM idx, span""",
    "events_periodogram" ->
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h FROM events),
         counts AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS y FROM ev
           GROUP BY 1),
         span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM ev),
         spine AS (SELECT CAST(k AS BIGINT) AS t0
           FROM range(0, 1000000) r(k), span
           WHERE k <= date_diff('hour', h0, h1)),
         idx AS (SELECT CAST(date_diff('hour', span.h0, counts.h)
               AS BIGINT) AS t0, y
           FROM counts, span),
         series AS (SELECT s.t0 + 1 AS t, COALESCE(y, 0) AS y
           FROM spine s LEFT JOIN idx ON s.t0 = idx.t0),
         ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s FROM series),
         dev AS (SELECT t, CAST(y * n - s AS DECIMAL(38,0)) AS d
           FROM series, ns),
         den AS (SELECT SUM(d * d) AS den FROM dev),
         terms AS (SELECT period,
             SUM(CAST(CAST(d AS DOUBLE)
               * cos(2 * pi() * ((t - 1) % period) / period)
               AS DECIMAL(28,12))) AS cs,
             SUM(CAST(CAST(d AS DOUBLE)
               * sin(2 * pi() * ((t - 1) % period) / period)
               AS DECIMAL(28,12))) AS ss
           FROM dev, (VALUES (6), (12), (24), (168)) p(period)
           GROUP BY 1)
         SELECT period,
           ROUND((CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
             + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)) * 2.0
             / (CAST(n AS DOUBLE) * CAST(den AS DOUBLE)), 6)
             AS power_frac
         FROM terms, den, ns ORDER BY period""",
    "orders_hhi" ->
      """WITH cust AS (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         j AS (SELECT n_name, x FROM cust
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
           ROUND(CAST(SUM(x) AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE)
             / (CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)), 6)
             AS hhi,
           ROUND(CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)
             / CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE), 4)
             AS effective_n
         FROM j GROUP BY 1 ORDER BY n_name""",
    // sample_monetary_unit: the oracle's cumsum is the textbook
    // single-partition window (fine in DuckDB); the Spark side runs the
    // bucketed two-pass exactCumsum — hash equality proves the kernel
    "sample_monetary_unit" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders),
         cum AS (SELECT o_orderkey, o_orderpriority, c,
             SUM(CAST(c AS DECIMAL(38,0))) OVER (ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM o),
         tot AS (SELECT SUM(CAST(c AS DECIMAL(38,0))) AS t FROM o),
         iv AS (SELECT t, CAST(FLOOR(CAST(t AS DOUBLE) / 50) AS BIGINT)
             AS iv FROM tot),
         sp AS (SELECT iv, CAST(FLOOR(iv / 2) AS BIGINT) AS s FROM iv),
         pts AS (SELECT CAST(s + j * iv AS DECIMAL(38,0)) AS p
           FROM sp, generate_series(0, 49) g(j)),
         hits AS (SELECT m.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_points_hit,
             CAST(COUNT(DISTINCT m.o_orderkey) AS BIGINT)
               AS n_selected_orders
           FROM cum m JOIN pts ON pts.p > m.cum - m.c
             AND pts.p <= m.cum
           GROUP BY 1),
         book AS (SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(c AS DECIMAL(38,0))) AS book_cents
           FROM o GROUP BY 1)
         SELECT b.o_orderpriority, b.n_orders,
           CAST(b.book_cents AS BIGINT) AS book_cents,
           ROUND(CAST(b.book_cents AS DOUBLE) / CAST(t AS DOUBLE), 6)
             AS book_share,
           COALESCE(h.n_points_hit, 0) AS n_points_hit,
           COALESCE(h.n_selected_orders, 0) AS n_selected_orders,
           ROUND(CAST(COALESCE(h.n_points_hit, 0) AS DOUBLE) / 50.0, 6)
             AS point_share
         FROM book b LEFT JOIN hits h USING (o_orderpriority)
         CROSS JOIN tot
         ORDER BY b.o_orderpriority""",
    "sample_systematic" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
         pop AS (SELECT 'population' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM d),
         sysr AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY
             md5('sys:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM d),
         syss AS (SELECT 'systematic' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM sysr
           WHERE rk % 10 = 1),
         convr AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY doc_id)
             AS rk FROM d),
         nt AS (SELECT COUNT(*) AS nt FROM d),
         conv AS (SELECT 'convenience' AS method,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s FROM convr, nt
           WHERE rk <= (nt + 9) // 10),
         u AS (SELECT * FROM pop UNION ALL SELECT * FROM syss
           UNION ALL SELECT * FROM conv),
         pm AS (SELECT CAST(s AS DOUBLE) / n AS pm FROM pop)
         SELECT method, n, ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_chars,
           ROUND(ABS(CAST(s AS DOUBLE) / n - pm), 4) AS abs_error
         FROM u, pm ORDER BY method""",
    "window_bollinger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         w AS (SELECT day, c,
             CAST(COUNT(*) OVER win AS BIGINT) AS k,
             SUM(CAST(c AS DECIMAL(38,0))) OVER win AS sx,
             SUM(CAST(c AS DECIMAL(38,0)) * c) OVER win AS sxx
           FROM daily WINDOW win AS (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
         f AS (SELECT * FROM w WHERE k = 7),
         g AS (SELECT day, c, CAST(sx AS DOUBLE) / k AS m,
             sqrt(CAST(sxx * k - sx * sx AS DOUBLE)
               / (CAST(k AS DOUBLE) * CAST(k - 1 AS DOUBLE))) AS sd
           FROM f)
         SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(m / 100.0, 4) AS mean7, ROUND(sd / 100.0, 4) AS sd7,
           ROUND((m + sd * 2.0) / 100.0, 4) AS upper,
           ROUND((m - sd * 2.0) / 100.0, 4) AS lower,
           (c > m + sd * 2.0 OR c < m - sd * 2.0) AS breakout
         FROM g ORDER BY day""",
    "orders_safety_stock" ->
      """WITH monthly AS (SELECT l_partkey,
             date_trunc('month', l_shipdate) AS mo,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qm
           FROM lineitem GROUP BY 1, 2),
         span AS (SELECT CAST(date_diff('month',
             date_trunc('month', MIN(l_shipdate)),
             date_trunc('month', MAX(l_shipdate))) + 1 AS BIGINT)
             AS n_months FROM lineitem),
         parts AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(qm) AS BIGINT) AS s,
             CAST(SUM(qm * qm) AS BIGINT) AS qq
           FROM monthly GROUP BY 1),
         pq AS (SELECT l_partkey,
             CASE WHEN NOT (n_months * 100 >= m * 132)
                   AND NOT ((m * qq - s * s) * 100 >= s * s * 49)
                 THEN 'smooth'
               WHEN n_months * 100 >= m * 132
                   AND NOT ((m * qq - s * s) * 100 >= s * s * 49)
                 THEN 'intermittent'
               WHEN NOT (n_months * 100 >= m * 132)
                 THEN 'erratic'
               ELSE 'lumpy' END AS quadrant
           FROM parts, span),
         wq AS (SELECT quadrant, qm, monthly.l_partkey
           FROM monthly JOIN pq USING (l_partkey)),
         hist AS (SELECT quadrant, qm, CAST(COUNT(*) AS BIGINT) AS n
           FROM wq GROUP BY 1, 2),
         ch AS (SELECT quadrant, qm, SUM(n) OVER (PARTITION BY quadrant
             ORDER BY qm ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT quadrant,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(*) AS BIGINT) AS n_months,
             CAST(SUM(qm) AS BIGINT) AS sq
           FROM wq GROUP BY 1),
         q50 AS (SELECT ch.quadrant, MIN(qm) AS q50
           FROM ch JOIN tot USING (quadrant)
           WHERE cum * 100 >= n_months * 50 GROUP BY 1),
         q95 AS (SELECT ch.quadrant, MIN(qm) AS q95
           FROM ch JOIN tot USING (quadrant)
           WHERE cum * 100 >= n_months * 95 GROUP BY 1)
         SELECT t.quadrant, n_parts, n_months,
           ROUND(CAST(sq AS DOUBLE) / n_months / 100.0, 4) AS mean_qty,
           ROUND(CAST(q50 AS DOUBLE) / 100.0, 2) AS q50_qty,
           ROUND(CAST(q95 AS DOUBLE) / 100.0, 2) AS q95_qty,
           ROUND(CAST(q95 AS DOUBLE) / 100.0
             - CAST(sq AS DOUBLE) / n_months / 100.0, 4) AS safety_stock
         FROM tot t JOIN q50 USING (quadrant) JOIN q95 USING (quadrant)
         ORDER BY t.quadrant""",
    "docs_token_infogain" ->
      """WITH dt AS (SELECT DISTINCT doc_id, lang, token FROM
           (SELECT doc_id, lang, unnest(string_split(text, ' '))
              AS token FROM documents) WHERE token <> ''),
         lt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
           FROM documents GROUP BY 1),
         ndt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
         head AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
             AS df FROM dt GROUP BY 1 ORDER BY df DESC, token LIMIT 50),
         pres AS (SELECT dt.token, lang, CAST(COUNT(*) AS BIGINT) AS np
           FROM dt JOIN head ON dt.token = head.token GROUP BY 1, 2),
         cells AS (SELECT h.token, l.lang, COALESCE(np, 0) AS np,
             nl - COALESCE(np, 0) AS na
           FROM head h CROSS JOIN lt l
           LEFT JOIN pres p ON p.token = h.token AND p.lang = l.lang),
         hl AS (SELECT CAST(SUM(CASE WHEN nl > 0 THEN
               CAST(CAST(nl AS DOUBLE) / nd * ln(CAST(nd AS DOUBLE) / nl)
                 AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_lang
           FROM lt, ndt),
         pt AS (SELECT c.token, h.df, ndt.nd,
             CAST(SUM(CASE WHEN np > 0 THEN
               CAST(CAST(np AS DOUBLE) / df * ln(CAST(df AS DOUBLE) / np)
                 AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_pres,
             CAST(SUM(CASE WHEN na > 0 THEN
               CAST(CAST(na AS DOUBLE) / (nd - df)
                 * ln(CAST(nd - df AS DOUBLE) / na) AS DECIMAL(28,12))
             ELSE CAST(0 AS DECIMAL(28,12)) END) AS DOUBLE) AS h_abs
           FROM cells c JOIN head h ON c.token = h.token, ndt
           GROUP BY 1, 2, 3),
         ig AS (SELECT token, df,
             h_lang - (CAST(df AS DOUBLE) / nd * h_pres
               + CAST(nd - df AS DOUBLE) / nd * h_abs) AS ig
           FROM pt, hl),
         rk AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY ig DESC, token)
             AS INT) AS rk, token, df, ig FROM ig)
         SELECT rk, token, df, ROUND(ig, 6) AS info_gain
         FROM rk WHERE rk <= 10 ORDER BY rk""",
    "text_langid_eval" ->
      """WITH conf AS (SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT)
             AS n FROM (
           SELECT lang,
             CASE WHEN contains(t, ' der ') OR contains(t, ' und ')
                    OR contains(t, ' die ') THEN 'de'
                  WHEN contains(t, ' le ') OR contains(t, ' la ')
                    OR contains(t, ' et ') THEN 'fr'
                  WHEN contains(t, ' el ') OR contains(t, ' los ')
                    OR contains(t, ' que ') THEN 'es'
                  WHEN regexp_matches(t, '[\x{4e00}-\x{9fff}]')
                    THEN 'zh'
                  WHEN contains(t, ' the ') OR contains(t, ' and ')
                    OR contains(t, ' of ') THEN 'en'
                  ELSE 'unknown' END AS pred_lang
           FROM (SELECT lang, ' ' || text || ' ' AS t FROM documents) a)
           b GROUP BY 1, 2),
         bt AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM conf
           GROUP BY 1),
         bpd AS (SELECT pred_lang AS lang, CAST(SUM(n) AS BIGINT)
             AS n_pred FROM conf GROUP BY 1),
         tp AS (SELECT lang, n AS tp FROM conf
           WHERE lang = pred_lang),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM conf),
         acc AS (SELECT CAST(SUM(n) AS BIGINT) AS n_correct FROM conf
           WHERE lang = pred_lang),
         pc AS (SELECT bt.lang, COALESCE(tp, 0) AS tp,
             COALESCE(n_pred, 0) - COALESCE(tp, 0) AS fp,
             n_true - COALESCE(tp, 0) AS fn
           FROM bt LEFT JOIN tp ON bt.lang = tp.lang
           LEFT JOIN bpd ON bt.lang = bpd.lang),
         m1 AS (SELECT *,
             CASE WHEN tp + fp > 0
               THEN CAST(tp AS DOUBLE) / (tp + fp) ELSE 0.0 END
               AS precision,
             CASE WHEN tp + fn > 0
               THEN CAST(tp AS DOUBLE) / (tp + fn) ELSE 0.0 END
               AS recall
           FROM pc),
         m2 AS (SELECT *,
             CASE WHEN precision + recall > 0
               THEN 2.0 * precision * recall / (precision + recall)
               ELSE 0.0 END AS f1
           FROM m1),
         mac AS (SELECT CAST(SUM(CAST(f1 AS DECIMAL(18,9))) AS DOUBLE)
             / COUNT(*) AS macro_f1 FROM m2)
         SELECT m2.lang, tp, fp, fn,
           ROUND(precision, 6) AS precision, ROUND(recall, 6) AS recall,
           ROUND(f1, 6) AS f1,
           ROUND(CAST(n_correct AS DOUBLE) / n_all, 6) AS accuracy,
           ROUND(macro_f1, 6) AS macro_f1
         FROM m2, mac, acc, tot ORDER BY m2.lang""",
    "events_mann_whitney" ->
      """WITH ev AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
             user_id % 2 = 0 AS treat
           FROM events WHERE value IS NOT NULL),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
               AS nt
           FROM ev GROUP BY 1),
         ch AS (SELECT *, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         mr AS (SELECT *, cum * 2 - n + 1 AS mr2 FROM ch),
         sums AS (SELECT CAST(SUM(nt * mr2) AS BIGINT) AS r2_t,
             CAST(SUM(nt) AS BIGINT) AS n1,
             CAST(SUM(n - nt) AS BIGINT) AS n2,
             CAST(SUM(n * n * n - n) AS DECIMAL(38,0)) AS tie
           FROM mr),
         st AS (SELECT *, n1 + n2 AS nn,
             CAST(r2_t AS DOUBLE) / 2.0
               - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u
           FROM sums),
         v AS (SELECT *,
             CAST(n1 * n2 AS DOUBLE) / 12.0
               * (CAST(nn + 1 AS DOUBLE) - CAST(tie AS DOUBLE)
                 / (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))
               AS var
           FROM st)
         SELECT n1, n2, ROUND(u, 2) AS u,
           ROUND((u - CAST(n1 * n2 AS DOUBLE) / 2.0) / sqrt(var), 6)
             AS z,
           ROUND(CAST(tie AS DOUBLE), 2) AS tie_term
         FROM v""",
    "agg_skew_kurtosis" ->
      """WITH c AS (SELECT o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
           FROM orders),
         mu AS (SELECT o_orderpriority,
             CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mu
           FROM c GROUP BY 1),
         d AS (SELECT c.o_orderpriority,
             (CAST(c AS DOUBLE) - mu) / 100.0 AS d
           FROM c JOIN mu ON c.o_orderpriority = mu.o_orderpriority),
         s AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(d * d AS DECIMAL(38,6))) AS s2,
             SUM(CAST(d * d * d AS DECIMAL(38,6))) AS s3,
             SUM(CAST(d * d * d * d AS DECIMAL(38,6))) AS s4
           FROM d GROUP BY 1),
         m AS (SELECT o_orderpriority, n,
             CAST(s2 AS DOUBLE) / n AS m2, CAST(s3 AS DOUBLE) / n AS m3,
             CAST(s4 AS DOUBLE) / n AS m4
           FROM s)
         SELECT o_orderpriority, n,
           ROUND(sqrt(m2), 4) AS stddev,
           ROUND(m3 / pow(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
         FROM m ORDER BY o_orderpriority""",
    "dedup_trigram_cosine" ->
      """WITH tg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id,
               unnest([substr(text, i, 3)
                 for i in range(1, length(text) - 1)]) AS g
             FROM documents WHERE length(text) >= 3) z
           GROUP BY 1, 2),
         norms AS (SELECT doc_id, CAST(SUM(cnt * cnt) AS BIGINT) AS nsq
           FROM tg GROUP BY 1),
         keep AS (SELECT g FROM tg GROUP BY g
           HAVING COUNT(*) BETWEEN 2 AND 64),
         cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
           FROM tg a JOIN tg b ON a.g = b.g AND a.doc_id < b.doc_id
           JOIN keep k ON k.g = a.g),
         dot AS (SELECT c.d1, c.d2,
             CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
           FROM cand c
           JOIN tg a ON a.doc_id = c.d1
           JOIN tg b ON b.doc_id = c.d2 AND b.g = a.g
           GROUP BY 1, 2),
         cs AS (SELECT d1, d2, dot,
             ROUND(CAST(dot AS DOUBLE)
               / (sqrt(CAST(x.nsq AS DOUBLE))
                 * sqrt(CAST(y.nsq AS DOUBLE))), 6) AS cosine
           FROM dot JOIN norms x ON d1 = x.doc_id
           JOIN norms y ON d2 = y.doc_id)
         SELECT d1, d2, dot, cosine FROM cs WHERE cosine * 100 >= 90
         ORDER BY cosine DESC, d1, d2""",
    "window_rsi" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         chg AS (SELECT day, c,
             LAG(c) OVER (ORDER BY day) AS prev FROM daily),
         gl AS (SELECT day, c,
             GREATEST(c - prev, 0) AS gain,
             GREATEST(prev - c, 0) AS loss
           FROM chg WHERE prev IS NOT NULL),
         w AS (SELECT day, c,
             CAST(COUNT(*) OVER win AS BIGINT) AS k,
             CAST(SUM(gain) OVER win AS BIGINT) AS sg,
             CAST(SUM(loss) OVER win AS BIGINT) AS sl
           FROM gl WINDOW win AS (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT strftime(day, '%Y-%m-%d') AS day,
           ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(sg AS DOUBLE) / 14 / 100.0, 4) AS avg_gain,
           ROUND(CAST(sl AS DOUBLE) / 14 / 100.0, 4) AS avg_loss,
           ROUND(CASE WHEN sg + sl > 0 THEN
             100.0 * CAST(sg AS DOUBLE) / CAST(sg + sl AS DOUBLE) END,
             4) AS rsi
         FROM w WHERE k = 14 ORDER BY day""",
    "sketch_linear_counting" ->
      """WITH ev AS (SELECT event_type, user_id FROM events),
         slots AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
             AS occupied
           FROM (SELECT DISTINCT event_type,
               CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
                   * 268435456
                 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
                   * 16777216
                 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
                   * 1048576
                 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
                   * 65536
                 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)
                   * 4096
                 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
                   * 256
                 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1)
                   * 16
                 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
                 % 4096 AS BIGINT) AS slot
             FROM (SELECT event_type, md5('lc:'
                 || CAST(user_id AS VARCHAR)) AS h FROM ev) a) b
           GROUP BY 1),
         exact AS (SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
           FROM ev GROUP BY 1),
         j AS (SELECT e.event_type, exact_distinct, occupied,
             CASE WHEN occupied < 4096 THEN
               -4096.0 * ln(CAST(4096 - occupied AS DOUBLE) / 4096)
             END AS est
           FROM exact e JOIN slots s ON e.event_type = s.event_type)
         SELECT event_type, exact_distinct, occupied,
           ROUND(est, 2) AS estimate,
           ROUND(ABS(est - CAST(exact_distinct AS DOUBLE))
             / exact_distinct, 6) AS rel_err,
           ABS(est - CAST(exact_distinct AS DOUBLE))
             <= CAST(exact_distinct AS DOUBLE) * 0.05 AS within_5pct
         FROM j ORDER BY event_type""",
    "orders_lorenz_curve" ->
      """WITH cust AS (SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x
           FROM orders GROUP BY 1),
         hist AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(x * COUNT(*) AS BIGINT) AS ev
           FROM cust GROUP BY 1),
         ch AS (SELECT x, n, ev,
             SUM(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_u,
             SUM(ev) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum_e
           FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS u_tot,
             CAST(SUM(x) AS BIGINT) AS e_tot FROM cust),
         ks AS (SELECT CAST(k AS INT) AS k FROM range(1, 11) t(k)),
         cut AS (SELECT ch.*, k, (k * u_tot) // 10 AS cut, e_tot
           FROM ch, tot, ks
           WHERE cum_u - n < (k * u_tot) // 10
             AND cum_u >= (k * u_tot) // 10),
         pts AS (SELECT k, cut AS n_customers,
             cum_e - ev + (cut - (cum_u - n)) * x AS rev_cents, e_tot
           FROM cut)
         SELECT k, n_customers,
           ROUND(CAST(rev_cents AS DOUBLE) / 100.0, 2) AS cum_revenue,
           ROUND(CAST(rev_cents AS DOUBLE) / e_tot, 6) AS cum_share,
           ROUND(CAST(k AS DOUBLE) / 10.0
             - CAST(rev_cents AS DOUBLE) / e_tot, 6) AS equality_gap
         FROM pts ORDER BY k""",
    "events_ab_power" ->
      """WITH arms AS (SELECT user_id % 2 = 0 AS is_a,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS n_conv
           FROM events GROUP BY 1),
         a AS (SELECT n_events AS n_a, n_conv AS c_a FROM arms
           WHERE is_a),
         b AS (SELECT n_events AS n_b, n_conv AS c_b FROM arms
           WHERE NOT is_a),
         j AS (SELECT *,
             CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
               AS p_pool,
             2.0 * n_a * n_b / CAST(n_a + n_b AS DOUBLE) AS n_harm
           FROM a, b),
         m AS (SELECT *,
             2.801585 * sqrt(2.0 * p_pool * (1.0 - p_pool) / n_harm)
               AS mde
           FROM j)
         SELECT n_a, n_b, c_a, c_b, ROUND(p_pool, 6) AS p_pool,
           ROUND(n_harm, 2) AS n_harmonic, ROUND(mde, 6) AS mde_abs,
           ROUND(mde / p_pool, 6) AS mde_rel
         FROM m""",
    "graph_reciprocity" ->
      """WITH directed AS (SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
             list_cosine_similarity(a.embedding, b.embedding) AS sim
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         knn AS (SELECT label, v1, v2 FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
               ORDER BY sim DESC, v2) AS rk FROM directed) r
           WHERE rk <= 3),
         mut AS (SELECT k1.label, CAST(COUNT(*) AS BIGINT) AS n_mutual
           FROM knn k1 WHERE EXISTS (SELECT 1 FROM knn k2
             WHERE k2.label = k1.label AND k2.v1 = k1.v2
               AND k2.v2 = k1.v1)
           GROUP BY 1),
         tot AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_directed
           FROM knn GROUP BY 1)
         SELECT t.label, n_directed, COALESCE(n_mutual, 0) AS n_mutual,
           ROUND(CAST(COALESCE(n_mutual, 0) AS DOUBLE) / n_directed, 6)
             AS reciprocity
         FROM tot t LEFT JOIN mut ON t.label = mut.label
         ORDER BY t.label""",
    "orders_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         hist AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n FROM daily
           GROUP BY 1),
         ch AS (SELECT c, SUM(n) OVER (ORDER BY c
             ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
         tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
         med AS (SELECT MIN(c) AS median FROM ch, tot
           WHERE cum * 2 >= nd),
         signs AS (SELECT day, c > median AS above,
             LAG(c > median) OVER (ORDER BY day) AS prev
           FROM daily, med WHERE c <> median),
         runs AS (SELECT
             CAST(SUM(CASE WHEN prev IS NULL OR prev <> above
               THEN 1 ELSE 0 END) AS BIGINT) AS r,
             CAST(SUM(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN above THEN 0 ELSE 1 END) AS BIGINT)
               AS n2
           FROM signs),
         st AS (SELECT *, n1 + n2 AS n,
             2.0 * n1 * n2 / (n1 + n2) + 1.0 AS mu,
             2.0 * n1 * n2 * CAST(n1 * n2 * 2 - (n1 + n2) AS DOUBLE)
               / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                 * (n1 + n2 - 1)) AS var
           FROM runs)
         SELECT n1, n2, r AS runs, ROUND(mu, 4) AS expected_runs,
           ROUND((r - mu) / sqrt(var), 6) AS z
         FROM st""",
    "sim_intrinsic_dim" ->
      """WITH directed AS (SELECT a.label, a.vec_id,
             list_cosine_similarity(a.embedding, b.embedding) AS sim,
             b.vec_id AS v2
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id),
         r AS (SELECT label, vec_id, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY sim DESC, v2) AS rk
           FROM directed),
         two AS (SELECT label, vec_id,
             MAX(CASE WHEN rk = 1 THEN 1.0 - sim END) AS d1,
             MAX(CASE WHEN rk = 2 THEN 1.0 - sim END) AS d2
           FROM r WHERE rk <= 2 GROUP BY 1, 2),
         t AS (SELECT label,
             d1 > 0 AND d2 IS NOT NULL AS usable,
             CASE WHEN d1 > 0 AND d2 IS NOT NULL
               THEN CAST(ln(d2 / d1) AS DECIMAL(28,12))
             END AS lnmu
           FROM two)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
             AS n_used,
           ROUND(CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(SUM(lnmu) AS DOUBLE), 4) AS id_hat
         FROM t GROUP BY 1 ORDER BY label""",
    "orders_seasonal_index" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM orders GROUP BY 1),
         pm AS (SELECT month(day) AS m, CAST(COUNT(*) AS BIGINT)
             AS n_days, CAST(SUM(c) AS BIGINT) AS rev
           FROM daily GROUP BY 1),
         ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd_all,
             CAST(SUM(c) AS BIGINT) AS rev_all FROM daily)
         SELECT m AS month, n_days,
           ROUND(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(rev AS DOUBLE) / n_days / 100.0, 4) AS mean_daily,
           ROUND((CAST(rev AS DOUBLE) / n_days)
             / (CAST(rev_all AS DOUBLE) / nd_all), 6) AS seasonal_index
         FROM pm, ov ORDER BY month""",
    "sim_norm_census" ->
      """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val
           FROM embeddings),
         norms AS (SELECT label, vec_id,
             sqrt(CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))
               * CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
               AS norm
           FROM dims GROUP BY 1, 2),
         agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(norm AS DECIMAL(28,12))) AS sn,
             SUM(CAST(norm * norm AS DECIMAL(28,12))) AS snn,
             MIN(norm) AS mn, MAX(norm) AS mx
           FROM norms GROUP BY 1)
         SELECT label, n, ROUND(CAST(sn AS DOUBLE) / n, 6) AS mean_norm,
           ROUND(mn, 6) AS min_norm, ROUND(mx, 6) AS max_norm,
           ROUND(sqrt(GREATEST(CAST(n * snn - sn * sn AS DOUBLE), 0.0)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
             / (CAST(sn AS DOUBLE) / n), 6) AS cv
         FROM agg ORDER BY label""",
    "text_char_entropy" ->
      """WITH chars AS (SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS n
           FROM (SELECT lang, unnest(string_split_regex(text, '')) AS ch
             FROM documents) z
           WHERE ch <> '' GROUP BY 1, 2),
         tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS nt,
             CAST(COUNT(*) AS BIGINT) AS vocab FROM chars GROUP BY 1),
         t AS (SELECT c.lang, nt, vocab,
             CAST(CAST(n AS DOUBLE) / nt
               * (ln(CAST(nt AS DOUBLE) / n) / ln(2.0))
               AS DECIMAL(28,12)) AS term
           FROM chars c JOIN tot ON c.lang = tot.lang)
         SELECT lang, MAX(nt) AS n_chars, MAX(vocab) AS vocab,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS entropy_bits,
           ROUND(1.0 - CAST(SUM(term) AS DOUBLE)
             / (ln(CAST(MAX(vocab) AS DOUBLE)) / ln(2.0)), 6)
             AS redundancy
         FROM t GROUP BY 1 ORDER BY lang"""
    )
    // the star-contraction variant computes the identical relation, so it
    // shares dedup_clusters' recursive-CTE oracle verbatim; the streaming
    // prep pipeline computes the batch pipeline's exact relation through a
    // twice-run foreachBatch job, so it shares that oracle too
    m + ("dedup_clusters_star" -> m("dedup_clusters")) +
      // purity wraps the cluster assignment as a subquery, so the
      // component semantics can never drift from the gated row
      ("dedup_cluster_purity" -> s"""WITH cl AS (${m("dedup_clusters")}),
         cs AS (SELECT cluster_id, source, CAST(COUNT(*) AS BIGINT) AS n
           FROM cl JOIN documents USING (doc_id) GROUP BY 1, 2),
         top AS (SELECT cluster_id, source AS top_source, n AS top_n
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
               ORDER BY n DESC, source) AS rk FROM cs) z WHERE rk = 1),
         sizes AS (SELECT cluster_id, CAST(SUM(n) AS BIGINT) AS csize
           FROM cs GROUP BY 1),
         per AS (SELECT s.cluster_id, csize, top_source, top_n
           FROM sizes s JOIN top ON s.cluster_id = top.cluster_id),
         tot AS (SELECT CAST(SUM(csize) AS BIGINT) AS docs,
             CAST(SUM(top_n) AS BIGINT) AS pure_docs FROM per)
         SELECT cluster_id, csize, top_source, top_n,
           ROUND(CAST(top_n AS DOUBLE) / csize, 6) AS purity,
           ROUND(CAST(pure_docs AS DOUBLE) / docs, 6) AS weighted_purity
         FROM per, tot ORDER BY cluster_id""") +
      ("stream_docs_prep" -> m("docs_prep_pipeline")) +
      // the streaming index-maintenance loop emits, per its scaladoc, the
      // one-increment batch relation — so it shares that exact oracle
      ("stream_sig_index" -> m("dedup_incremental_minhash")) +
      // the frozen quantizer makes the unrolled-increment replay
      // arrival-order independent: one assignment pass over base +
      // both increments IS the two-batch append, which is the property
      // the streaming query pins (replay-skip proves idempotence)
      ("stream_ivf_append" ->
        """WITH base AS (SELECT vec_id, label, embedding
               FROM embeddings WHERE vec_id % 4 <> 3),
           bd AS (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM base),
           cent AS (SELECT label AS cell, d,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM bd GROUP BY 1, 2),
           cn AS (SELECT cell, sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE)) AS cnorm
             FROM cent GROUP BY 1),
           ad AS (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           per AS (SELECT vec_id, cell,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE) AS dot,
               sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE)) AS vnorm
             FROM ad JOIN cent USING (d) GROUP BY 1, 2),
           scored AS (SELECT vec_id, cell, dot / (vnorm * cnorm) AS s
             FROM per JOIN cn USING (cell)),
           asn AS (SELECT vec_id, cell, CAST(s AS DECIMAL(18,9)) AS sim,
               CASE WHEN vec_id % 4 <> 3 THEN 0
                 WHEN vec_id % 8 = 3 THEN 1 ELSE 2 END AS inc
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY s DESC, cell) AS rn FROM scored) z
             WHERE rn = 1)
           SELECT cell,
             CAST(SUM(CASE WHEN inc = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_seed,
             CAST(SUM(CASE WHEN inc = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inc1,
             CAST(SUM(CASE WHEN inc = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inc2,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             ROUND(CAST(SUM(CASE WHEN inc = 1 THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN inc = 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*), 6) AS appended_share,
             ROUND(CAST(SUM(CASE WHEN inc > 0 THEN sim END) AS DOUBLE)
               / SUM(CASE WHEN inc > 0 THEN 1 END), 6)
               AS mean_sim_appended
           FROM asn GROUP BY cell ORDER BY cell""") +
      // the maintained Misra-Gries sketch must bracket the exact corpus
      // top-k (mergeable-summaries invariant), so the streaming row
      // shares the batch sketch's exact-truth-side oracle verbatim
      ("stream_freq_topk" -> m("sketch_freq_topk")) +
      // greedy k-center unrolls to k-1 chained farthest-point CTE blocks
      ("sim_kcenter_coreset" -> kcenterOracleSql(8)) +
      // two Louvain levels from ONE generated move/Q block per level —
      // the level bodies cannot drift apart
      ("graph_louvain_full" -> louvainFullOracleSql) +
      // one exact integer-Lloyd pass per PQ subspace: the assignment
      // block is generated once and instantiated for both codebooks
      ("sim_pq_train" -> pqTrainOracleSql()) +
      // the BPE trainer's bounded loop unrolls to chained CTE blocks
      ("text_bpe_merges" -> bpeMergeOracleSql(6)) +
      ("stream_bpe_encode" -> streamBpeEncodeOracleSql(6)) +
      ("stream_unigram_encode" -> streamUnigramEncodeOracleSql()) +
      ("text_bpe_encode" -> bpeEncodeOracleSql(6)) +
      // tokenizer -> packer: per-doc BPE lengths (vocabulary join, OOV
      // tokens count 1) feed the same fixed-256 packing census as
      // pack_sequences
      ("text_bpe_pack" -> bpePackOracleSql(6)) +
      // one logistic gradient step at w=0: doubled gradient and margin
      // are pure BIGINT sums (see Curation.qualityProbe), one final
      // double division — the TF bucket expression is the same
      // relational md5 rendering dedup_embedding_cosine uses
      ("docs_quality_probe" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           s AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf LEFT JOIN g USING (j) GROUP BY 1)
           SELECT d.doc_id, d.lang, d.source,
             ROUND(CAST(m2000 AS DOUBLE) / 2000.0, 6) AS margin
           FROM s JOIN documents d USING (doc_id)
           ORDER BY margin DESC, doc_id LIMIT 20""") +
      // two hard-sigmoid gradient steps, integral under common
      // denominators (see Curation.qualityProbe2's ladder): step-1
      // doubled gradient g2, labeled margins ×2000, clamped sigmoid
      // ×16000, residual gradient g2p ×16000, folded weights ×16e6 —
      // ONE final double division
      ("docs_quality_probe2" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf LEFT JOIN w USING (j) GROUP BY 1)
           SELECT d.doc_id, d.lang, d.source,
             ROUND(CAST(m16 AS DOUBLE) / 16000000.0, 6) AS margin
           FROM sc JOIN documents d USING (doc_id)
           ORDER BY margin DESC, doc_id LIMIT 20""") +
      // tie-aware Mann-Whitney AUC of both probe steps over the labeled
      // seed: margins stay in their integer numerators (rank-based, the
      // denominator cancels), doubled pair-count u2 counts concordant
      // pairs twice / tied pairs once, ONE final double division
      ("docs_probe_auc" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS MATERIALIZED (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf JOIN lab USING (doc_id) LEFT JOIN w USING (j)
             GROUP BY 1),
           lm AS (SELECT lab.label, 'step1' AS step, m.m2000 AS margin
               FROM m JOIN lab USING (doc_id)
             UNION ALL
             SELECT lab.label, 'step2', sc.m16
               FROM sc JOIN lab USING (doc_id)),
           bv AS (SELECT step, margin,
               CAST(SUM(label) AS BIGINT) AS np_v,
               CAST(SUM(1 - label) AS BIGINT) AS nn_v
             FROM lm GROUP BY 1, 2),
           cum AS (SELECT *, COALESCE(SUM(nn_v) OVER (PARTITION BY step
               ORDER BY margin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nn_lt
             FROM bv)
           SELECT step, CAST(SUM(np_v) AS BIGINT) AS n_pos,
             CAST(SUM(nn_v) AS BIGINT) AS n_neg,
             CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS BIGINT) AS u2,
             ROUND(CAST(SUM(np_v * (2 * nn_lt + nn_v)) AS DOUBLE)
               / (2.0 * SUM(np_v) * SUM(nn_v)), 6) AS auc
           FROM cum GROUP BY step ORDER BY step""") +
      // F1-argmax operating point over the step-2 margin cuts: cumulative
      // precision/recall from the per-margin-value aggregate, ties to
      // the stricter (higher-margin) cut
      ("docs_probe_threshold" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS MATERIALIZED (SELECT j,
               CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           gp AS (SELECT tf.j,
               CAST(SUM((16000 * lab.label - sg.sgm) * tf.x) AS BIGINT) AS g2p
             FROM tf JOIN lab USING (doc_id) JOIN sg USING (doc_id)
             GROUP BY 1),
           w AS (SELECT COALESCE(g.j, gp.j) AS j,
               8000 * COALESCE(g.g2, 0) + COALESCE(gp.g2p, 0) AS wj
             FROM g FULL JOIN gp ON g.j = gp.j),
           sc AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(w.wj, 0) * tf.x) AS BIGINT) AS m16
             FROM tf JOIN lab USING (doc_id) LEFT JOIN w USING (j)
             GROUP BY 1),
           bv AS (SELECT sc.m16 AS margin,
               CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(lab.label) AS BIGINT) AS np_v
             FROM sc JOIN lab USING (doc_id) GROUP BY 1),
           tot AS (SELECT CAST(SUM(np_v) AS BIGINT) AS n_pos_total FROM bv),
           cum AS (SELECT margin,
               SUM(n_v) OVER (ORDER BY margin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_pred,
               SUM(np_v) OVER (ORDER BY margin DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp
             FROM bv)
           SELECT margin, CAST(n_pred AS BIGINT) AS n_pred,
             CAST(tp AS BIGINT) AS tp,
             ROUND(CAST(tp AS DOUBLE) / n_pred, 6) AS precision,
             ROUND(CAST(tp AS DOUBLE) / n_pos_total, 6) AS recall,
             ROUND(2.0 * tp / (n_pred + n_pos_total), 6) AS f1
           FROM cum, tot
           ORDER BY f1 DESC, margin DESC LIMIT 1""") +
      // reliability diagram of the step-1 hard-sigmoid predictions: 8
      // equal probability bins, observed positive rate vs mean predicted
      ("docs_probe_calibration" ->
        """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents),
           tf AS MATERIALIZED (SELECT doc_id,
               ((strpos('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(word), 2, 1)) - 1))
                 % 64 AS j,
               CAST(COUNT(*) AS BIGINT) AS x
             FROM tok GROUP BY 1, 2),
           lab AS (SELECT vec_id AS doc_id, label FROM embeddings
             WHERE label IN (0, 1)),
           g AS (SELECT j, CAST(SUM((2 * label - 1) * x) AS BIGINT) AS g2
             FROM tf JOIN lab USING (doc_id) GROUP BY j),
           m AS (SELECT tf.doc_id,
               CAST(SUM(COALESCE(g.g2, 0) * tf.x) AS BIGINT) AS m2000
             FROM tf JOIN lab USING (doc_id) LEFT JOIN g USING (j)
             GROUP BY 1),
           sg AS (SELECT doc_id,
               LEAST(GREATEST(8000 + 2 * m2000, 0), 16000) AS sgm FROM m),
           bins AS (SELECT
               LEAST(CAST(FLOOR(sgm / 2000.0) AS BIGINT), 7) AS bin,
               lab.label, sgm
             FROM sg JOIN lab USING (doc_id))
           SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(label) AS BIGINT) AS n_pos,
             ROUND(CAST(SUM(sgm) AS DOUBLE) / (COUNT(*) * 16000.0), 6)
               AS mean_pred,
             ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS frac_pos
           FROM bins GROUP BY bin ORDER BY bin""") +
      // LSH banding sweep: one 9-hash signature re-banded at 9x1 / 3x3 /
      // 1x9, candidates per setting scored against the exact
      // Jaccard>=0.5 posting-list truth set
      ("dedup_lsh_tune" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
           sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(w) >= 5
                    THEN [array_to_string(w[i:i+4], ' ')
                          for i in range(1, len(w)-3)]
                    ELSE []::VARCHAR[] END)) AS shingle
             FROM words),
           mh AS MATERIALIZED (SELECT doc_id, i,
               MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
             FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
           settings AS (SELECT CAST(unnest([1, 3, 9]) AS BIGINT)
             AS rows_per_band),
           bands AS (SELECT s.rows_per_band, doc_id,
               i // s.rows_per_band AS band,
               md5(string_agg(h, ',' ORDER BY i)) AS bucket
             FROM mh CROSS JOIN settings s
             GROUP BY s.rows_per_band, doc_id, i // s.rows_per_band),
           cand AS (SELECT DISTINCT x.rows_per_band,
               x.doc_id AS d1, y.doc_id AS d2
             FROM bands x JOIN bands y
               ON x.rows_per_band = y.rows_per_band AND x.band = y.band
                  AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
           okdf AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 64),
           inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
             FROM sh a JOIN sh b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             JOIN okdf k ON k.shingle = a.shingle
             GROUP BY 1, 2),
           truth AS (SELECT d1, d2 FROM (SELECT x.d1, x.d2, x.i,
               s1.n AS n1, s2.n AS n2
             FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                          JOIN sizes s2 ON x.d2 = s2.doc_id) v
             WHERE CAST(i AS DOUBLE) / (n1 + n2 - i) >= 0.5),
           tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs
             FROM truth),
           hits AS (SELECT c.rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM cand c JOIN truth t ON c.d1 = t.d1 AND c.d2 = t.d2
             GROUP BY 1),
           nc AS (SELECT rows_per_band,
               CAST(COUNT(*) AS BIGINT) AS n_cand_pairs
             FROM cand GROUP BY 1)
           SELECT 9 // nc.rows_per_band AS n_bands, nc.rows_per_band,
             nc.n_cand_pairs, tc.n_true_pairs,
             CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
             ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
               / tc.n_true_pairs, 6) AS recall
           FROM nc LEFT JOIN hits h USING (rows_per_band), tc
           ORDER BY rows_per_band""") +
      // IVF serving-tuning curve: each query's cell ranking (exact-
      // decimal centroid cosine) computed once, probe widths {1,2,4}
      // joined on cell_rank <= nprobe, top-10 per (nprobe, query) scored
      // against the brute-force ground truth
      ("sim_nprobe_sweep" ->
        """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS d FROM embeddings),
           cent AS (SELECT label, d,
               CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM dims GROUP BY 1, 2),
           qd AS (SELECT vec_id AS q_id, d, val AS qv FROM dims
             WHERE vec_id < 5),
           score AS (SELECT qd.q_id, cent.label,
               CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))
                   * CAST(c AS DECIMAL(18,9))) AS DOUBLE)
               / (sqrt(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))
                     * CAST(CAST(qv AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE))
                  * sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                     * CAST(c AS DECIMAL(18,9))) AS DOUBLE))) AS s
             FROM cent JOIN qd USING (d) GROUP BY 1, 2),
           rk AS (SELECT q_id, label,
               CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                 ORDER BY s DESC, label) AS BIGINT) AS cell_rk
             FROM score QUALIFY cell_rk <= 4),
           np AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe),
           qe AS (SELECT vec_id AS q_id, embedding AS q_emb
             FROM embeddings WHERE vec_id < 5),
           cand AS (SELECT np.nprobe, rk.q_id, v.vec_id,
               v.embedding, qe.q_emb
             FROM rk JOIN np ON rk.cell_rk <= np.nprobe
             JOIN embeddings v ON v.label = rk.label
             JOIN qe ON qe.q_id = rk.q_id
             WHERE v.vec_id <> rk.q_id),
           swtop AS (SELECT nprobe, q_id, vec_id FROM (SELECT nprobe,
               q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY nprobe, q_id
                 ORDER BY list_cosine_similarity(embedding, q_emb) DESC,
                   vec_id) AS rn
             FROM cand) WHERE rn <= 10),
           brute AS (SELECT q_id, vec_id FROM (SELECT qe.q_id, v.vec_id,
               ROW_NUMBER() OVER (PARTITION BY qe.q_id
                 ORDER BY list_cosine_similarity(v.embedding, qe.q_emb)
                   DESC, v.vec_id) AS rn
             FROM embeddings v, qe WHERE v.vec_id <> qe.q_id)
             WHERE rn <= 10),
           hits AS (SELECT nprobe, COUNT(*) AS n_hits
             FROM swtop JOIN brute USING (q_id, vec_id) GROUP BY 1),
           nc AS (SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_cand
             FROM cand GROUP BY 1)
           SELECT nc.nprobe, nc.n_cand,
             CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
             ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / 50.0, 6)
               AS recall
           FROM nc LEFT JOIN hits USING (nprobe) ORDER BY nprobe""") +
      // per-type chi-square decomposition of second-half drift against
      // the first half's distribution as the null
      ("events_drift" ->
        """WITH h AS (SELECT event_type,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 0 ELSE 1 END) AS BIGINT) AS n_first,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
               THEN 1 ELSE 0 END) AS BIGINT) AS n_second
           FROM events GROUP BY 1),
           t AS (SELECT CAST(SUM(n_first) AS BIGINT) AS t1,
             CAST(SUM(n_second) AS BIGINT) AS t2 FROM h)
           SELECT event_type, n_first, n_second,
             ROUND(CAST(n_first AS DOUBLE) / t1, 6) AS share_first,
             ROUND(CAST(n_second AS DOUBLE) / t2, 6) AS share_second,
             ROUND(POWER(n_second - CAST(t2 AS DOUBLE) * n_first / t1, 2)
               / (CAST(t2 AS DOUBLE) * n_first / t1), 6) AS chi2_term
           FROM h, t ORDER BY event_type""") +
      // curriculum phases: exact global quality rank (score DESC,
      // doc_id) cut into 4 equal integer-arithmetic phases; DECIMAL-
      // summed per-phase mean score (the oracle may use a plain global
      // window — the Spark plan decomposes the same rank distributedly)
      ("docs_curriculum" ->
        """WITH scored AS (SELECT * FROM (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents) WHERE n_tok > 0),
           sc2 AS (SELECT *,
             CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS score
           FROM scored),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc2),
           rk AS (SELECT lang, n_tok, score,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
               AS BIGINT) AS r
           FROM sc2),
           ph AS (SELECT lang, n_tok, score,
             1 + ((r - 1) * 4 // nn.n) AS phase FROM rk, nn)
           SELECT phase, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS tokens,
             ROUND(CAST(SUM(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
               / COUNT(*), 6) AS mean_score
           FROM ph GROUP BY 1, 2 ORDER BY phase, lang""") +
      // budget-constrained greedy selection: quality-ranked prefix whose
      // running token sum fits half the corpus's token mass; ties
      // (score DESC, doc_id); floor(total/2) == truncation on positives
      ("docs_budget_select" ->
        """WITH scored AS (SELECT * FROM (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_uniq
           FROM documents) WHERE n_tok > 0),
           sc2 AS (SELECT *,
             CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) AS score
           FROM scored),
           b AS (SELECT CAST(FLOOR(SUM(n_tok) / 2) AS BIGINT) AS budget
             FROM scored),
           ranked AS (SELECT lang, n_tok,
             SUM(n_tok) OVER (ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM sc2),
           lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens
             FROM scored GROUP BY lang),
           kept AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
             FROM ranked, b WHERE cum <= b.budget GROUP BY lang)
           SELECT k.lang, k.n_docs_kept, k.tokens_kept,
             ROUND(CAST(k.tokens_kept AS DOUBLE)
               / CAST(lt.lang_tokens AS DOUBLE), 6) AS lang_share_kept
           FROM kept k JOIN lt USING (lang) ORDER BY lang""") +
      // watermark late-data policy (see StreamingAnalytics.streamLateData
      // for the 3-file arrival schedule): deep-late rows (ts < Jan 2,
      // arriving after the watermark passed) are ABSENT, within-watermark
      // late rows (Jan 7 morning) are PRESENT, and windows past the final
      // watermark (max event time - 1 hour) are withheld
      ("stream_late_data" ->
        """WITH e AS (SELECT ts FROM events
             WHERE ts < TIMESTAMP '2024-01-08 00:00:00'),
           kept AS (SELECT ts FROM e
             WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'),
           wmf AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM e),
           win AS (SELECT date_trunc('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS n
             FROM kept GROUP BY 1)
           SELECT strftime(win.h, '%Y-%m-%d %H:%M:%S') AS hour_start, n
           FROM win, wmf WHERE win.h + INTERVAL 1 HOUR <= wmf.w
           ORDER BY hour_start""") +
      // the growing-corpus loop, two real increments: increment 1 dedups
      // against the corpus, increment 2 against corpus + increment 1's
      // appended signatures — the same candidate/verify/argmax program
      // per step with the index side widened
      ("stream_sig_index_multi" -> incrementalMinhashOracleSql(Seq(
        "sx.sn >= 10 AND sx.sn < 15 AND sy.sn < 10",
        "sx.sn >= 15 AND sy.sn < 15"))) +
      // stream-stream LEFT OUTER interval join: the flush sentinel
      // advances both watermarks past every real purchase, so eviction
      // emits every unmatched row and the streamed result equals the
      // batch outer join; null view side rendered '-' (null-free rows)
      ("stream_join_outer" ->
        """SELECT p.event_id AS purchase_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           COALESCE(strftime(v.ts, '%Y-%m-%d %H:%M:%S'), '-') AS view_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON v.user_id = p.user_id
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
           ORDER BY purchase_id, view_ts""") +
      // FULL OUTER completion: view-side unmatched rows emit on
      // eviction too; both null sides rendered -1 / '-'
      ("stream_join_full_outer" ->
        """SELECT CAST(COALESCE(p.event_id, -1) AS BIGINT) AS purchase_id,
           COALESCE(p.user_id, v.user_id) AS user_id,
           CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_id,
           COALESCE(strftime(p.ts, '%Y-%m-%d %H:%M:%S'), '-')
             AS purchase_ts,
           COALESCE(strftime(v.ts, '%Y-%m-%d %H:%M:%S'), '-') AS view_ts
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON v.user_id = p.user_id
             AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
           ORDER BY purchase_id, view_id""") +
      // update-mode changelog folded to final state == the batch answer
      ("stream_update_counts" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
             AS hour_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
           GROUP BY 1, 2 ORDER BY hour_start, event_type""") +
      // CDC upsert: count folds by addition, latest-event folds by
      // argmax on (ts, event_id) — both associative, so the merged
      // state equals the one-pass batch answer however arrivals split
      ("stream_cdc_upsert" ->
        """SELECT user_id, n_events,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
             event_type AS last_type, value AS last_value
           FROM (
             SELECT user_id, ts, event_type, value,
               COUNT(*) OVER (PARTITION BY user_id) AS n_events,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn
             FROM events) t
           WHERE rn = 1 ORDER BY user_id""") +
      // watermark-horizon dedup: the streamed census equals the exact
      // batch census because every injected retry replay is dropped
      // in-state (overcount if the drop failed, undercount if eviction
      // ran early)
      ("stream_dedup_watermark" ->
        """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
           FROM events GROUP BY 1 ORDER BY event_type""") +
      ("events_ks_test" ->
        """WITH ev AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
               user_id % 2 = 0 AS treat
             FROM events WHERE value IS NOT NULL),
           hist AS (SELECT c,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                 AS nb
             FROM ev GROUP BY 1),
           cum AS (SELECT c,
               SUM(na) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                 AS cuma,
               SUM(nb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                 AS cumb
             FROM hist),
           tot AS (SELECT CAST(SUM(na) AS BIGINT) AS n1,
               CAST(SUM(nb) AS BIGINT) AS n2 FROM hist),
           d AS (SELECT n1, n2,
               MAX(ABS(CAST(cuma AS DECIMAL(38,0)) * n2
                 - CAST(cumb AS DECIMAL(38,0)) * n1)) AS dnum
             FROM cum, tot GROUP BY 1, 2),
           s AS (SELECT n1, n2, CAST(dnum AS DOUBLE)
                 / CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)
                 AS d_stat
             FROM d),
           l AS (SELECT *,
               sqrt(CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE)) * d_stat AS lambda
             FROM s)
           SELECT n1, n2, ROUND(d_stat, 6) AS d_stat,
             ROUND(lambda, 6) AS lambda,
             ROUND(LEAST(1.0, GREATEST(0.0,
               2.0 * (exp(-2.0 * lambda * lambda)
                 - exp(-8.0 * lambda * lambda)
                 + exp(-18.0 * lambda * lambda)))), 6) AS p_approx
           FROM l""") +
      ("events_chisq" ->
        """WITH cells AS (SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS o_t,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)
                 AS BIGINT) AS o_c
             FROM events GROUP BY 1),
           tot AS (SELECT CAST(SUM(o_t) AS BIGINT) AS m_t,
               CAST(SUM(o_c) AS BIGINT) AS m_c,
               CAST(COUNT(*) AS BIGINT) AS r FROM cells),
           ct AS (SELECT event_type, o_t, o_c, r, m_t + m_c AS n,
               CAST(CAST(o_t + o_c AS DECIMAL(38,0)) * m_t AS DOUBLE)
                 / CAST(m_t + m_c AS DOUBLE) AS e_t,
               CAST(CAST(o_t + o_c AS DECIMAL(38,0)) * m_c AS DOUBLE)
                 / CAST(m_t + m_c AS DOUBLE) AS e_c
             FROM cells, tot),
           cb AS (SELECT *,
               CAST((o_t - e_t) * (o_t - e_t) / e_t
                 + (o_c - e_c) * (o_c - e_c) / e_c
                 AS DECIMAL(28,12)) AS contrib
             FROM ct),
           st AS (SELECT SUM(contrib) AS chi2_sum FROM cb)
           SELECT event_type, o_t, o_c, ROUND(e_t, 4) AS e_t,
             ROUND(CAST(contrib AS DOUBLE), 6) AS contrib,
             ROUND(CAST(chi2_sum AS DOUBLE), 6) AS chi2,
             CAST(r - 1 AS BIGINT) AS df,
             ROUND(sqrt(CAST(chi2_sum AS DOUBLE) / CAST(n AS DOUBLE)),
               6) AS cramers_v
           FROM cb, st ORDER BY event_type""") +
      ("events_fdr_bh" ->
        """WITH t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_t
             FROM events GROUP BY 1),
           z AS (SELECT *, CAST(2.0 * n_t - n AS DOUBLE)
                 / sqrt(CAST(n AS DOUBLE)) AS z FROM t),
           a AS (SELECT *, ABS(z) / sqrt(2.0) AS az FROM z),
           e AS (SELECT *, 1.0 / (1.0 + 0.3275911 * az) AS tt FROM a),
           p AS (SELECT *, CAST(tt * (0.254829592
                 + tt * (-0.284496736 + tt * (1.421413741
                 + tt * (-1.453152027 + tt * 1.061405429))))
                 * exp(-az * az) AS DECIMAL(28,12)) AS p FROM e),
           m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
           r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p, event_type)
                 AS rk FROM p, m),
           q AS (SELECT *, CAST(p AS DOUBLE) * m / rk AS q FROM r),
           adj AS (SELECT *, LEAST(1.0, MIN(q) OVER (ORDER BY rk DESC
                 ROWS UNBOUNDED PRECEDING)) AS p_adj FROM q)
           SELECT event_type, n, n_t, ROUND(z, 6) AS z,
             ROUND(CAST(p AS DOUBLE), 6) AS p_raw,
             CAST(rk AS BIGINT) AS rk, ROUND(p_adj, 6) AS p_adj,
             p_adj < 0.05 AS rejected
           FROM adj ORDER BY rk""") +
      ("text_good_turing" ->
        """WITH tok AS (SELECT lang,
               unnest(string_split(text, ' ')) AS token FROM documents),
           cnt AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           cofc AS (SELECT lang, cnt AS r, CAST(COUNT(*) AS BIGINT)
                 AS n_r FROM cnt GROUP BY 1, 2),
           tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_tokens
             FROM cnt GROUP BY 1),
           led AS (SELECT lang, r, n_r,
               LEAD(n_r) OVER (PARTITION BY lang ORDER BY r) AS n_next,
               LEAD(r) OVER (PARTITION BY lang ORDER BY r) AS next_r
             FROM cofc),
           f AS (SELECT led.lang, r, n_r, n_tokens,
               CASE WHEN next_r = r + 1 THEN
                 CAST(r + 1 AS DOUBLE) * n_next / n_r END AS r_star,
               MAX(CASE WHEN r = 1 THEN n_r END)
                 OVER (PARTITION BY led.lang) AS p0_num
             FROM led JOIN tot ON led.lang = tot.lang
             WHERE r <= 5)
           SELECT lang, r, n_r, ROUND(r_star, 6) AS r_star,
             ROUND(r_star / CAST(n_tokens AS DOUBLE), 9) AS p_gt,
             ROUND(CAST(p0_num AS DOUBLE) / CAST(n_tokens AS DOUBLE),
               9) AS p0_unseen
           FROM f ORDER BY lang, r""") +
      ("orders_newsvendor" ->
        """WITH monthly AS (SELECT l_partkey,
               date_trunc('month', l_shipdate) AS mo,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS qm
             FROM lineitem GROUP BY 1, 2),
           top AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m
             FROM monthly GROUP BY 1
             ORDER BY m DESC, l_partkey LIMIT 5),
           d AS (SELECT monthly.l_partkey, qm, m,
               COUNT(*) OVER (PARTITION BY monthly.l_partkey
                 ORDER BY qm, mo ROWS UNBOUNDED PRECEDING) AS cum
             FROM monthly JOIN top USING (l_partkey)),
           qs AS (SELECT l_partkey, MIN(qm) AS q_star, MAX(m) AS m
             FROM d WHERE cum * 10 >= m * 9 GROUP BY 1),
           c AS (SELECT d.l_partkey, d.qm, qs.q_star, qs.m
             FROM d JOIN qs ON d.l_partkey = qs.l_partkey)
           SELECT l_partkey, MAX(m) AS n_months,
             ROUND(CAST(MAX(q_star) AS DOUBLE) / 100.0, 2) AS q_star,
             ROUND(CAST(SUM(qm) AS DOUBLE) / MAX(m) / 100.0, 4)
               AS mean_demand,
             ROUND(CAST(SUM(CASE WHEN qm < q_star
                 THEN 1 * (q_star - qm)
                 ELSE 9 * (qm - q_star) END) AS DOUBLE)
               / MAX(m) / 100.0, 4) AS exp_cost
           FROM c GROUP BY 1 ORDER BY l_partkey""") +
      ("dq_gap_islands" ->
        """WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
               WHERE o_orderstatus = 'F'),
           g AS (SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp
             FROM keys),
           isl AS (SELECT grp, MIN(k) AS lo, MAX(k) AS hi,
               CAST(COUNT(*) AS BIGINT) AS len FROM g GROUP BY 1),
           gp AS (SELECT hi + 1 AS gap_start,
               LEAD(lo) OVER (ORDER BY lo) - hi - 1 AS gap_len
             FROM isl),
           census AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(len) AS BIGINT) AS n_keys,
               CAST(MAX(len) AS BIGINT) AS longest_island,
               MAX(hi) - MIN(lo) + 1 AS span FROM isl),
           top AS (SELECT gap_start, gap_len, ROW_NUMBER()
                 OVER (ORDER BY gap_len DESC, gap_start) AS rk
             FROM gp WHERE gap_len IS NOT NULL AND gap_len > 0)
           SELECT CAST(rk AS BIGINT) AS rk, gap_start, gap_len,
             n_islands, n_keys, longest_island,
             span - n_keys AS n_missing
           FROM top, census WHERE rk <= 5 ORDER BY rk""") +
      ("mm_vad_segments" ->
        """WITH audio AS (SELECT doc_id, text FROM documents
               WHERE doc_id % 3 = 1 AND length(text) > 0),
           b AS (SELECT doc_id, (pos - 1) // 32 AS w,
               CAST(ascii(substr(text, CAST(pos AS INT), 1)) - 128
                 AS BIGINT) AS v
             FROM (SELECT doc_id, text,
                     unnest([p for p in range(1, length(text) + 1)])
                       AS pos
                   FROM audio) u),
           wins AS (SELECT doc_id, w, CAST(SUM(v * v) AS BIGINT)
                 AS energy FROM b GROUP BY 1, 2),
           tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_windows, MAX(energy) AS peak
             FROM wins GROUP BY 1),
           act AS (SELECT wins.doc_id, w FROM wins
             JOIN tot ON wins.doc_id = tot.doc_id
             WHERE energy * 10 >= peak * 9),
           seg0 AS (SELECT doc_id, w,
               LAG(w) OVER (PARTITION BY doc_id ORDER BY w) AS prev
             FROM act),
           seg1 AS (SELECT doc_id, w, CASE WHEN prev IS NULL
                 OR w - prev > 2 THEN 1 ELSE 0 END AS new_seg
             FROM seg0),
           seg2 AS (SELECT doc_id, w, SUM(new_seg)
                 OVER (PARTITION BY doc_id ORDER BY w
                   ROWS UNBOUNDED PRECEDING) AS seg_id
             FROM seg1),
           segs AS (SELECT doc_id, seg_id, MIN(w) AS s, MAX(w) AS e,
               CAST(COUNT(*) AS BIGINT) AS n_active
             FROM seg2 GROUP BY 1, 2),
           per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_segments,
               CAST(SUM(n_active) AS BIGINT) AS n_active_windows,
               MAX(e - s + 1) AS longest_segment,
               MIN(s) AS first_onset
             FROM segs GROUP BY 1)
           SELECT per.doc_id, n_segments, n_active_windows,
             longest_segment, first_onset, n_windows,
             ROUND(CAST(n_active_windows AS DOUBLE)
               / CAST(n_windows AS DOUBLE), 4) AS active_ratio
           FROM per JOIN tot ON per.doc_id = tot.doc_id
           ORDER BY per.doc_id""") +
      ("sim_maxsim_multivec" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 3),
           inter AS (SELECT e.label, q.q_id,
               MAX(CAST(list_cosine_similarity(e.embedding, q.q_emb)
                 AS DECIMAL(18,9))) AS tok_max
             FROM embeddings e, q WHERE e.vec_id <> q.q_id
             GROUP BY 1, 2),
           sc AS (SELECT label, CAST(COUNT(*) AS BIGINT)
                 AS n_tokens_matched,
               SUM(tok_max) AS score, MIN(tok_max) AS weakest
             FROM inter GROUP BY 1),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, label) AS rk FROM sc)
           SELECT CAST(rk AS BIGINT) AS rk, label, n_tokens_matched,
             ROUND(CAST(score AS DOUBLE), 6) AS maxsim_score,
             ROUND(CAST(weakest AS DOUBLE), 6) AS weakest_token
           FROM r ORDER BY rk""") +
      ("events_shapley_attribution" ->
        """WITH users AS (SELECT user_id,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                   AND value IS NOT NULL
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev
             FROM events GROUP BY 1),
           touch AS (SELECT e.user_id,
               array_to_string(list_sort(list(DISTINCT e.event_type)),
                 ',') AS c_key
             FROM events e JOIN users u ON e.user_id = u.user_id
             WHERE e.event_type <> 'purchase'
               AND (u.fp IS NULL OR e.ts < u.fp)
             GROUP BY 1),
           coal AS (SELECT COALESCE(t.c_key, '') AS c_key,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(rev) AS BIGINT) AS rev
             FROM users u LEFT JOIN touch t ON u.user_id = t.user_id
             GROUP BY 1),
           chs AS (SELECT channel,
               CAST(ROW_NUMBER() OVER (ORDER BY channel) - 1 AS INT)
                 AS i
             FROM (SELECT DISTINCT event_type AS channel FROM events
                   WHERE event_type <> 'purchase') d),
           nch AS (SELECT CAST(COUNT(*) AS INT) AS n FROM chs),
           fct AS (SELECT * FROM (VALUES (0, 1), (1, 1), (2, 2),
               (3, 6), (4, 24)) AS t(s, f)),
           masks AS (SELECT CAST(range AS INT) AS mask
             FROM range(16) CROSS JOIN nch WHERE range < (1 << n)),
           enum0 AS (SELECT m.mask,
               COALESCE(string_agg(c.channel, ','
                   ORDER BY c.channel), '') AS c_key,
               CAST(COUNT(c.channel) AS INT) AS sz
             FROM masks m
             LEFT JOIN chs c ON ((m.mask >> c.i) & 1) = 1
             GROUP BY m.mask),
           v AS (SELECT mask, sz,
               COALESCE(CAST(CAST(rev AS DOUBLE) / n_users
                   AS DECIMAL(28,12)),
                 CAST(0 AS DECIMAL(28,12))) AS v
             FROM enum0 LEFT JOIN coal USING (c_key)),
           terms AS (SELECT c.channel,
               CAST((f0.f * f1.f) * (v1.v - v0.v) AS DECIMAL(28,12))
                 AS term
             FROM chs c
             CROSS JOIN nch
             JOIN v v0 ON ((v0.mask >> c.i) & 1) = 0
             JOIN v v1 ON v1.mask = v0.mask + (1 << c.i)
             JOIN fct f0 ON f0.s = v0.sz
             JOIN fct f1 ON f1.s = nch.n - 1 - v0.sz),
           phi AS (SELECT channel, SUM(term) AS phin FROM terms
             GROUP BY 1),
           tot AS (SELECT SUM(phin) AS phi_sum FROM phi),
           nf AS (SELECT CAST(f AS DOUBLE) AS nfact FROM fct
             JOIN nch ON fct.s = nch.n)
           SELECT channel,
             ROUND(CAST(phin AS DOUBLE) / nfact / 100.0, 4)
               AS phi_revenue,
             ROUND(CAST(phin AS DOUBLE) / CAST(phi_sum AS DOUBLE), 6)
               AS share
           FROM phi CROSS JOIN tot CROSS JOIN nf
           ORDER BY channel""") +
      ("events_granger" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
             FROM events WHERE value IS NOT NULL GROUP BY 1),
           lagged AS (SELECT y,
               LAG(y) OVER (ORDER BY d) AS yl,
               LAG(x) OVER (ORDER BY d) AS xl
             FROM daily),
           f AS (SELECT * FROM lagged WHERE yl IS NOT NULL),
           s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(yl) AS BIGINT) AS syl,
               CAST(SUM(xl) AS BIGINT) AS sxl,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
               SUM(CAST(y AS DECIMAL(38,0)) * yl) AS syyl,
               SUM(CAST(y AS DECIMAL(38,0)) * xl) AS syxl,
               SUM(CAST(yl AS DECIMAL(38,0)) * yl) AS syll,
               SUM(CAST(xl AS DECIMAL(38,0)) * xl) AS sxll,
               SUM(CAST(yl AS DECIMAL(38,0)) * xl) AS sylxl
             FROM f),
           c AS (SELECT n,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy
                 / CAST(n AS DOUBLE) AS cyy,
               CAST(syyl AS DOUBLE) - CAST(sy AS DOUBLE) * syl
                 / CAST(n AS DOUBLE) AS c01,
               CAST(syxl AS DOUBLE) - CAST(sy AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c02,
               CAST(syll AS DOUBLE) - CAST(syl AS DOUBLE) * syl
                 / CAST(n AS DOUBLE) AS c11,
               CAST(sxll AS DOUBLE) - CAST(sxl AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c22,
               CAST(sylxl AS DOUBLE) - CAST(syl AS DOUBLE) * sxl
                 / CAST(n AS DOUBLE) AS c12
             FROM s),
           bb AS (SELECT *,
               c11 * c22 - c12 * c12 AS det FROM c),
           b AS (SELECT *,
               CASE WHEN det > 0
                 THEN (c01 * c22 - c02 * c12) / det END AS b1,
               CASE WHEN det > 0
                 THEN (c02 * c11 - c01 * c12) / det END AS b2
             FROM bb),
           r AS (SELECT *,
               cyy - b1 * c01 - b2 * c02 AS rss_u,
               CASE WHEN c11 > 0
                 THEN cyy - c01 * c01 / c11 END AS rss_r
             FROM b)
           SELECT n AS n_days, ROUND(b1, 6) AS beta_self,
             ROUND(b2, 6) AS beta_cross,
             ROUND(rss_r / 1e8, 4) AS rss_restricted,
             ROUND(rss_u / 1e8, 4) AS rss_unrestricted,
             ROUND((rss_r - rss_u) * (n - 3) / rss_u, 6) AS f_stat
           FROM r""") +
      ("events_qini_curve" ->
        """WITH sp AS (SELECT epoch(MIN(ts))
               + (epoch(MAX(ts)) - epoch(MIN(ts))) / 2 AS mid
             FROM events),
           u AS (SELECT user_id,
               CAST(SUM(CASE WHEN epoch(ts) < mid THEN 1 ELSE 0 END)
                 AS BIGINT) AS score,
               CAST(SUM(CASE WHEN epoch(ts) >= mid
                   AND event_type = 'purchase' AND value IS NOT NULL
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS rev,
               user_id % 2 = 0 AS treat
             FROM events, sp GROUP BY user_id),
           nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM u),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, user_id) AS rk
             FROM u, nn),
           bkt AS (SELECT *,
               CAST((rk * 5 + n_all - 1) // n_all AS BIGINT) AS bucket
             FROM r),
           g AS (SELECT bucket,
               CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_t,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_c,
               CAST(SUM(CASE WHEN treat THEN rev ELSE 0 END)
                 AS BIGINT) AS r_t,
               CAST(SUM(CASE WHEN treat THEN 0 ELSE rev END)
                 AS BIGINT) AS r_c
             FROM bkt GROUP BY 1),
           cm AS (SELECT bucket,
               SUM(n_t) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cn_t,
               SUM(n_c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cn_c,
               SUM(r_t) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cr_t,
               SUM(r_c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                 AS cr_c
             FROM g),
           qn AS (SELECT *, (CAST(cr_t AS DOUBLE)
                 - CAST(cr_c AS DOUBLE) * cn_t / cn_c) / 100.0 AS qini
             FROM cm),
           ql AS (SELECT *, LAST_VALUE(qini) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING) AS qini_last
             FROM qn)
           SELECT bucket, CAST(cn_t AS BIGINT) AS cn_t,
             CAST(cn_c AS BIGINT) AS cn_c,
             ROUND(CAST(cr_t AS DOUBLE) / 100.0, 2) AS rev_treat,
             ROUND(CAST(cr_c AS DOUBLE) / 100.0, 2) AS rev_ctrl,
             ROUND(qini, 4) AS qini,
             ROUND(qini_last * bucket / 5, 4) AS qini_random
           FROM ql ORDER BY bucket""") +
      ("graph_squares" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
             UNION SELECT label, v2, v1 FROM knn),
           pairs AS (SELECT x.label, x.v AS a, y.v AS b,
               CAST(COUNT(*) AS BIGINT) AS m
             FROM und x JOIN und y
               ON x.label = y.label AND x.u = y.u AND x.v < y.v
             GROUP BY 1, 2, 3)
           SELECT label, CAST(COUNT(*) AS BIGINT) AS n_diag_pairs,
             CAST(SUM((m * (m - 1)) // 2) // 2 AS BIGINT) AS n_squares
           FROM pairs GROUP BY label ORDER BY label""") +
      ("text_bm25_topk" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                 AS n_terms_hit, SUM(term_score) AS score
             FROM sc GROUP BY 1),
           r AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY score DESC, doc_id) AS rk FROM agg)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id, n_terms_hit,
             ROUND(CAST(score AS DOUBLE), 6) AS bm25
           FROM r WHERE rk <= 10 ORDER BY rk""") +
      ("dq_k_anonymity" ->
        """WITH classes AS (SELECT lang, source,
               n_chars - (n_chars % 100) AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS sz
             FROM documents GROUP BY 1, 2, 3),
           hist AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_classes
             FROM classes GROUP BY 1),
           tot AS (SELECT CAST(SUM(n_classes) AS BIGINT) AS all_classes,
               CAST(SUM(sz * n_classes) AS BIGINT) AS all_rows,
               CAST(MIN(sz) AS BIGINT) AS min_class_size FROM hist),
           ks AS (SELECT unnest([2, 5, 10]) AS k),
           per AS (SELECT k,
               CAST(SUM(CASE WHEN sz < k THEN n_classes ELSE 0 END)
                 AS BIGINT) AS classes_below_k,
               CAST(SUM(CASE WHEN sz < k THEN sz * n_classes
                 ELSE 0 END) AS BIGINT) AS rows_at_risk
             FROM ks, hist GROUP BY 1)
           SELECT CAST(k AS BIGINT) AS k, all_classes AS n_classes,
             classes_below_k, rows_at_risk,
             ROUND(CAST(rows_at_risk AS DOUBLE)
               / CAST(all_rows AS DOUBLE), 6) AS risk_share,
             min_class_size
           FROM per, tot ORDER BY k""") +
      ("dedup_bbit_minhash" ->
        """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents),
           sh AS (SELECT doc_id, unnest(list_distinct(
                    CASE WHEN len(w) >= 5
                         THEN [array_to_string(w[i:i+4], ' ')
                               for i in range(1, len(w)-3)]
                         ELSE []::VARCHAR[] END)) AS shingle
                  FROM words),
           mh AS (SELECT doc_id, i,
               MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
             FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
           bands AS (SELECT doc_id, i // 3 AS band,
                       md5(string_agg(h, ',' ORDER BY i)) AS bucket
                     FROM mh GROUP BY doc_id, i // 3),
           cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                    FROM bands x JOIN bands y
                      ON x.band = y.band AND x.bucket = y.bucket
                         AND x.doc_id < y.doc_id),
           slots AS (SELECT c.d1, c.d2,
               CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END)
                 AS BIGINT) AS slots_eq,
               CAST(SUM(CASE WHEN
                   (strpos('0123456789abcdef', substr(a.h, 32, 1)) - 1)
                     % 2 =
                   (strpos('0123456789abcdef', substr(b.h, 32, 1)) - 1)
                     % 2 THEN 1 ELSE 0 END) AS BIGINT) AS bits_eq
             FROM cand c JOIN mh a ON c.d1 = a.doc_id
                         JOIN mh b ON c.d2 = b.doc_id AND a.i = b.i
             GROUP BY 1, 2),
           sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh
             GROUP BY doc_id),
           inter AS (SELECT c.d1, c.d2, COUNT(*) AS i
                     FROM cand c JOIN sh a ON c.d1 = a.doc_id
                                 JOIN sh b ON c.d2 = b.doc_id
                                   AND a.shingle = b.shingle
                     GROUP BY 1, 2),
           v AS (SELECT x.d1, x.d2,
               CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) AS exact
             FROM inter x JOIN sizes s1 ON x.d1 = s1.doc_id
                          JOIN sizes s2 ON x.d2 = s2.doc_id)
           SELECT v.d1, v.d2, sl.slots_eq, sl.bits_eq,
             ROUND(CAST(sl.slots_eq AS DOUBLE) / 9, 3) AS est_full,
             ROUND(2.0 * CAST(sl.bits_eq AS DOUBLE) / 9 - 1.0, 3)
               AS est_b1,
             ROUND(v.exact, 3) AS exact_jaccard,
             ROUND(abs(CAST(sl.slots_eq AS DOUBLE) / 9 - v.exact), 3)
               AS err_full,
             ROUND(abs(2.0 * CAST(sl.bits_eq AS DOUBLE) / 9 - 1.0
               - v.exact), 3) AS err_b1
           FROM v JOIN slots sl ON v.d1 = sl.d1 AND v.d2 = sl.d2
           ORDER BY v.d1, v.d2""") +
      ("events_absorption_time" -> absorptionOracle(12)) +
      ("sim_hubness" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           ind AS (SELECT label, v2, CAST(COUNT(*) AS BIGINT) AS d
             FROM knn GROUP BY 1, 2),
           verts AS (SELECT e.label, e.vec_id,
               CAST(COALESCE(d, 0) AS BIGINT) AS d
             FROM embeddings e LEFT JOIN ind
               ON e.label = ind.label AND e.vec_id = ind.v2),
           top AS (SELECT label, vec_id AS top_hub, d AS top_k_occ
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY d DESC, vec_id) AS rk FROM verts) z
             WHERE rk = 1),
           agg AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(d) AS BIGINT) AS sd,
               CAST(SUM(d * d) AS BIGINT) AS sdd,
               CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_antihubs
             FROM verts GROUP BY 1)
           SELECT a.label, n_vectors, n_antihubs, top_hub,
             CAST(top_k_occ AS BIGINT) AS top_k_occ,
             ROUND(CAST(sd AS DOUBLE) / n_vectors, 6) AS mean_k_occ,
             ROUND(sqrt(CAST(n_vectors * sdd - sd * sd AS DOUBLE))
               / CAST(n_vectors AS DOUBLE), 6) AS std_k_occ
           FROM agg a JOIN top t ON a.label = t.label
           ORDER BY a.label""") +
      ("sim_filtered_topk" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 5),
           scored AS (SELECT q.q_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.q_emb) AS sim
             FROM embeddings e, q WHERE e.vec_id <> q.q_id),
           pre AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
                 AS rk
               FROM scored WHERE vec_id % 2 = 0) z WHERE rk <= 10),
           post AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id)
                 AS rk
               FROM scored) z WHERE rk <= 20 AND vec_id % 2 = 0),
           hit AS (SELECT pre.q_id, CAST(COUNT(*) AS BIGINT)
                 AS n_truth,
               CAST(SUM(CASE WHEN post.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS n_hit
             FROM pre LEFT JOIN post ON pre.q_id = post.q_id
               AND pre.vec_id = post.vec_id
             GROUP BY 1),
           pk AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_post_kept
             FROM post GROUP BY 1)
           SELECT hit.q_id, n_truth, n_post_kept, n_hit,
             ROUND(CAST(n_hit AS DOUBLE) / n_truth, 4) AS recall_post
           FROM hit JOIN pk USING (q_id) ORDER BY hit.q_id""") +
      ("docs_rho_select" ->
        """WITH toks AS (SELECT doc_id, source,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tk AS (SELECT * FROM toks WHERE token <> ''),
           tgt AS (SELECT MIN(source) AS tgt FROM tk),
           gen AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_gen
             FROM tk GROUP BY 1),
           tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_tgt
             FROM tk, tgt WHERE source = tgt GROUP BY 1),
           vt AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
               CAST(SUM(c_gen) AS BIGINT) AS n_gen FROM gen),
           tt AS (SELECT CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM tc),
           ratio AS (SELECT token,
               ln(CAST(COALESCE(c_tgt, 0) + 1 AS DOUBLE)
                   / CAST(n_tgt + v AS DOUBLE))
                 - ln(CAST(c_gen + 1 AS DOUBLE)
                   / CAST(n_gen + v AS DOUBLE)) AS lr
             FROM gen LEFT JOIN tc USING (token), vt, tt),
           pd AS (SELECT doc_id, source, token,
               CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2, 3),
           s AS (SELECT doc_id, source,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               SUM(CAST(tf * lr AS DECIMAL(28,12))) AS s
             FROM pd JOIN ratio USING (token) GROUP BY 1, 2),
           r AS (SELECT *, CAST(s AS DOUBLE) / n_tokens AS rho FROM s),
           rr AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY rho DESC, doc_id) AS rk FROM r)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id, source, n_tokens,
             ROUND(rho, 6) AS rho, source = tgt AS from_target
           FROM rr, tgt WHERE rk <= 10 ORDER BY rk""") +
      ("sim_semantic_drift" ->
        """WITH seeds AS (SELECT vec_id AS seed_id, embedding AS s_emb
               FROM embeddings ORDER BY vec_id LIMIT 8),
           asg AS (SELECT e.label, e.vec_id, seed_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, s.s_emb)
                   DESC, seed_id) AS rk
             FROM embeddings e, seeds s),
           a AS (SELECT label, seed_id AS bucket FROM asg WHERE rk = 1),
           bl AS (SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS c
             FROM a GROUP BY 1, 2),
           lt AS (SELECT label, CAST(SUM(c) AS BIGINT) AS n_label
             FROM bl GROUP BY 1),
           gb AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS g
             FROM bl GROUP BY 1),
           gt AS (SELECT CAST(SUM(g) AS BIGINT) AS n_all FROM gb),
           grid AS (SELECT lt.label, gb.bucket, lt.n_label, gb.g,
               gt.n_all, CAST(COALESCE(bl.c, 0) AS BIGINT) AS c
             FROM lt CROSS JOIN gb CROSS JOIN gt
             LEFT JOIN bl ON bl.label = lt.label
               AND bl.bucket = gb.bucket),
           t AS (SELECT label, n_label, c, bucket,
               CAST((CASE WHEN p > 0 THEN p * ln(p / m) / 2.0
                   ELSE 0.0 END)
                 + (CASE WHEN q > 0 THEN q * ln(q / m) / 2.0
                   ELSE 0.0 END) AS DECIMAL(28,12)) AS term
             FROM (SELECT *, CAST(c AS DOUBLE) / n_label AS p,
                     CAST(g AS DOUBLE) / n_all AS q,
                     (CAST(c AS DOUBLE) / n_label
                       + CAST(g AS DOUBLE) / n_all) / 2.0 AS m
                   FROM grid) z),
           top AS (SELECT label, bucket AS top_bucket, c AS top_c
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY c DESC, bucket DESC) AS rk FROM t) y
             WHERE rk = 1)
           SELECT t.label, CAST(MAX(n_label) AS BIGINT) AS n_vectors,
             ROUND(CAST(SUM(term) AS DOUBLE), 6) AS js_to_global,
             MAX(top_bucket) AS top_bucket,
             ROUND(CAST(MAX(top_c) AS DOUBLE) / MAX(n_label), 4)
               AS top_bucket_share
           FROM t JOIN top ON t.label = top.label
           GROUP BY t.label ORDER BY t.label""") +
      ("json_variant_agg" ->
        """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CAST(json_extract_string(props, '$.k')
               AS BIGINT)) AS BIGINT) AS n_k_present,
             CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT)
               AS n_missing_path,
             MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS min_k,
             MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS max_k,
             CAST(SUM(CAST(json_extract_string(props, '$.k')
               AS BIGINT)) AS BIGINT) AS sum_k
           FROM events GROUP BY 1 ORDER BY event_type""") +
      ("orders_theil_sen" ->
        """WITH daily0 AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d0 AS (SELECT MIN(day) AS day0 FROM daily0),
           daily AS (SELECT CAST(datediff('day', day0, day) AS BIGINT)
                 AS t, c
             FROM daily0, d0),
           pairs AS (SELECT a.t AS t1, b.t AS t2,
               CAST(b.c - a.c AS DOUBLE) / (b.t - a.t) AS slope
             FROM daily a JOIN daily b ON a.t < b.t),
           np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs
             FROM pairs),
           ms AS (SELECT n_pairs, MIN(slope) AS sen_slope FROM (
               SELECT *, ROW_NUMBER() OVER (ORDER BY slope, t1, t2)
                 AS rk FROM pairs, np) z
             WHERE rk * 2 = n_pairs OR rk * 2 = n_pairs + 1
             GROUP BY n_pairs),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days
             FROM daily),
           mi AS (SELECT n_days, n_pairs, sen_slope,
               MIN(b) AS sen_intercept FROM (
               SELECT *, ROW_NUMBER() OVER (ORDER BY b, t) AS rk
               FROM (SELECT daily.t,
                       CAST(c AS DOUBLE) - sen_slope * t AS b,
                       n_days, n_pairs, sen_slope
                     FROM daily, ms, nd) y) z
             WHERE rk * 2 = n_days OR rk * 2 = n_days + 1
             GROUP BY 1, 2, 3),
           ols AS (SELECT (CAST(stc AS DOUBLE)
                 - CAST(st AS DOUBLE) * sc / n)
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)
               AS ols_slope
             FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS st,
                 CAST(SUM(c) AS BIGINT) AS sc,
                 SUM(CAST(t AS DECIMAL(38,0)) * c) AS stc,
                 SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt
               FROM daily) s)
           SELECT n_days, n_pairs,
             ROUND(sen_slope / 100.0, 4) AS sen_slope,
             ROUND(sen_intercept / 100.0, 2) AS sen_intercept,
             ROUND(ols_slope / 100.0, 4) AS ols_slope
           FROM mi, ols""") +
      ("sample_horvitz_thompson" ->
        """WITH d AS (SELECT lang, doc_id, n_chars FROM documents),
           tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS mass FROM d),
           wp AS (SELECT lang, doc_id, n_chars,
               LEAST(1.0, 100.0 * n_chars / CAST(mass AS DOUBLE))
                 AS pi,
               CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
                   * 268435456
                 + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
                   * 16777216
                 + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
                   * 1048576
                 + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
                   * 65536
                 + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1)
                   * 4096
                 + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
                   * 256
                 + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1)
                   * 16
                 + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
                 AS DOUBLE) / 4294967296.0 AS u
             FROM (SELECT *, md5('ht:' || CAST(doc_id AS VARCHAR))
                 AS h FROM d) z, tot),
           sam AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
               SUM(CAST(CAST(n_chars AS DOUBLE) / pi
                 AS DECIMAL(28,12))) AS ht_est
             FROM wp WHERE u < pi GROUP BY 1),
           pl AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT)
                 AS true_mass,
               CAST(COUNT(*) AS BIGINT) AS n_docs_lang
             FROM d GROUP BY 1),
           ex AS (SELECT lang, SUM(CAST(pi AS DECIMAL(28,12)))
                 AS exp_n
             FROM wp GROUP BY 1)
           SELECT sam.lang, n_docs_lang, n_sampled,
             ROUND(CAST(exp_n AS DOUBLE), 2) AS expected_n,
             true_mass,
             ROUND(CAST(ht_est AS DOUBLE), 2) AS ht_estimate,
             ROUND(abs(CAST(ht_est AS DOUBLE)
               - CAST(true_mass AS DOUBLE))
               / CAST(true_mass AS DOUBLE), 4) AS rel_err
           FROM sam JOIN pl ON sam.lang = pl.lang
           JOIN ex ON sam.lang = ex.lang
           ORDER BY sam.lang""") +
      ("events_growth_accounting" ->
        """WITH uw AS (SELECT user_id, date_trunc('week', ts) AS wk,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                 AS rev
             FROM events
             WHERE event_type = 'purchase' AND value IS NOT NULL
             GROUP BY 1, 2),
           f AS (SELECT *,
               LAG(wk) OVER (PARTITION BY user_id ORDER BY wk)
                 AS prev_wk,
               LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk)
                 AS nxt_wk
             FROM uw),
           fl AS (SELECT wk, rev,
               prev_wk IS NULL AS is_new,
               prev_wk = wk - INTERVAL 7 DAY AS is_retained,
               prev_wk IS NOT NULL
                 AND prev_wk < wk - INTERVAL 7 DAY AS is_resurrected,
               nxt_wk IS NULL OR nxt_wk > wk + INTERVAL 7 DAY
                 AS churns_next
             FROM f),
           bw AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(rev) AS BIGINT) AS rev,
               CAST(SUM(CASE WHEN is_new THEN rev ELSE 0 END)
                 AS BIGINT) AS new_rev,
               CAST(SUM(CASE WHEN is_retained THEN rev ELSE 0 END)
                 AS BIGINT) AS retained_rev,
               CAST(SUM(CASE WHEN is_resurrected THEN rev ELSE 0 END)
                 AS BIGINT) AS resurrected_rev,
               CAST(SUM(CASE WHEN churns_next THEN rev ELSE 0 END)
                 AS BIGINT) AS churning_rev
             FROM fl GROUP BY 1),
           wc AS (SELECT bw.*, COALESCE(pr.churning_rev, 0)
                 AS churned_rev
             FROM bw LEFT JOIN bw pr
               ON pr.wk = bw.wk - INTERVAL 7 DAY)
           SELECT strftime(wk, '%Y-%m-%d') AS week, n_users,
             ROUND(CAST(rev AS DOUBLE) / 100.0, 2) AS revenue,
             ROUND(CAST(new_rev AS DOUBLE) / 100.0, 2) AS new_rev,
             ROUND(CAST(retained_rev AS DOUBLE) / 100.0, 2)
               AS retained_rev,
             ROUND(CAST(resurrected_rev AS DOUBLE) / 100.0, 2)
               AS resurrected_rev,
             ROUND(CAST(churned_rev AS DOUBLE) / 100.0, 2)
               AS churned_prior_rev
           FROM wc ORDER BY week""") +
      ("feature_target_encoding" ->
        """WITH rows_ AS (SELECT o_orderpriority AS cat,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
             FROM orders),
           g AS (SELECT cat, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(y) AS BIGINT) AS sy
             FROM rows_ GROUP BY 1),
           enc AS (SELECT rows_.cat, y, n_g, sy,
               CASE WHEN n_g > 1 THEN CAST(sy - y AS DOUBLE)
                 / CAST(n_g - 1 AS DOUBLE) END AS loo
             FROM rows_ JOIN g ON rows_.cat = g.cat)
           SELECT cat, CAST(MAX(n_g) AS BIGINT) AS n,
             ROUND(CAST(MAX(sy) AS DOUBLE) / MAX(n_g) / 100.0, 4)
               AS naive_mean,
             ROUND(CAST(SUM(CAST(loo AS DECIMAL(28,12))) AS DOUBLE)
               / MAX(n_g) / 100.0, 4) AS loo_mean,
             ROUND(MIN(loo) / 100.0, 2) AS loo_min,
             ROUND(MAX(loo) / 100.0, 2) AS loo_max,
             SUM(CAST((loo - CAST(sy AS DOUBLE) / n_g)
               * (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n_g)
               AS DECIMAL(28,12))) < 0 AS loo_anticorrelated
           FROM enc GROUP BY cat ORDER BY cat""") +
      ("orders_tier_migration" ->
        """WITH sp AS (SELECT epoch(MIN(o_orderdate))
               + (epoch(MAX(o_orderdate)) - epoch(MIN(o_orderdate)))
                 / 2 AS mid
             FROM orders),
           h1b AS (SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS m
             FROM orders, sp WHERE epoch(o_orderdate) < mid
             GROUP BY 1),
           n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM h1b),
           t1 AS (SELECT o_custkey,
               CAST((rk * 3 + n_cust - 1) // n_cust AS BIGINT)
                 AS tier_from
             FROM (SELECT *, ROW_NUMBER()
                   OVER (ORDER BY m, o_custkey) AS rk
                 FROM h1b, n1) z),
           h2b AS (SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS m
             FROM orders, sp WHERE epoch(o_orderdate) >= mid
             GROUP BY 1),
           n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM h2b),
           t2 AS (SELECT o_custkey,
               CAST((rk * 3 + n_cust - 1) // n_cust AS BIGINT)
                 AS tier_to
             FROM (SELECT *, ROW_NUMBER()
                   OVER (ORDER BY m, o_custkey) AS rk
                 FROM h2b, n2) z),
           j AS (SELECT CAST(COALESCE(tier_from, 0) AS BIGINT)
                 AS tier_from,
               CAST(COALESCE(tier_to, 0) AS BIGINT) AS tier_to
             FROM t1 FULL OUTER JOIN t2 USING (o_custkey)),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM j)
           SELECT tier_from, tier_to,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             ROUND(CAST(COUNT(*) AS DOUBLE) / n_all, 6) AS share
           FROM j, tot GROUP BY 1, 2, n_all
           ORDER BY tier_from, tier_to""") +
      ("text_source_ce_matrix" ->
        """WITH tok AS (SELECT source,
               unnest(string_split(text, ' ')) AS token FROM documents),
           cnt AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           tt AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
             FROM cnt GROUP BY 1),
           vb AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
             FROM cnt),
           sb AS (SELECT source AS src_b, n_src AS n_b FROM tt),
           ex AS (SELECT a.source AS src_a, sb.src_b, a.c, tt.n_src,
               sb.n_b, vb.v, b.c AS c_b
             FROM cnt a JOIN tt ON a.source = tt.source
             CROSS JOIN sb CROSS JOIN vb
             LEFT JOIN cnt b ON b.source = sb.src_b
               AND b.token = a.token),
           t AS (SELECT src_a, src_b,
               CAST(-p * ln(CAST(COALESCE(c_b, 0) + 1 AS DOUBLE)
                 / CAST(n_b + v AS DOUBLE)) AS DECIMAL(28,12))
                 AS ce_term,
               CAST(-p * ln(p) AS DECIMAL(28,12)) AS h_term
             FROM (SELECT *, CAST(c AS DOUBLE) / n_src AS p FROM ex) z)
           SELECT src_a, src_b,
             ROUND(CAST(SUM(ce_term) AS DOUBLE), 6) AS cross_entropy,
             ROUND(CAST(SUM(ce_term) AS DOUBLE)
               - CAST(SUM(h_term) AS DOUBLE), 6) AS kl_a_b
           FROM t GROUP BY 1, 2 ORDER BY src_a, src_b""") +
      ("orders_anova_weekday" ->
        """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d2 AS (SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS wd, c
             FROM daily),
           g AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(c) AS BIGINT) AS sy,
               SUM(CAST(c AS DECIMAL(38,0)) * c) AS syy
             FROM d2 GROUP BY 1),
           g2 AS (SELECT *,
               CAST(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_g
                 AS DECIMAL(38,6)) AS ssw_g,
               CAST(CAST(sy AS DOUBLE) * sy / n_g AS DECIMAL(38,6))
                 AS ssb_term
             FROM g),
           tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS ty,
               SUM(ssw_g) AS ssw, SUM(ssb_term) AS ssb_raw FROM g2),
           st AS (SELECT *, CAST(ssb_raw AS DOUBLE)
                 - CAST(ty AS DOUBLE) * ty / CAST(n AS DOUBLE) AS ssb
             FROM tot),
           st2 AS (SELECT *,
               (ssb / CAST(k - 1 AS DOUBLE))
                 / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
                 AS f_stat,
               ssb / (ssb + CAST(ssw AS DOUBLE)) AS eta_sq
             FROM st)
           SELECT wd AS weekday, n_g AS n_days,
             ROUND(CAST(sy AS DOUBLE) / n_g / 100.0, 2)
               AS mean_revenue,
             k, n AS n_total_days, ROUND(f_stat, 6) AS f_stat,
             ROUND(eta_sq, 6) AS eta_sq
           FROM g2, st2 ORDER BY weekday""") +
      ("sim_ood_mahalanobis" ->
        """WITH d AS (SELECT label, vec_id,
               generate_subscripts(embedding, 1) AS dim,
               CAST(CAST(unnest(embedding) AS DOUBLE)
                 AS DECIMAL(18,9)) AS x
             FROM embeddings),
           mom AS (SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx,
               SUM(CAST(x * x AS DECIMAL(28,12))) AS sxx
             FROM d GROUP BY 1, 2),
           m2 AS (SELECT label, dim, CAST(sx AS DOUBLE) / n AS mu,
               CASE WHEN n > 1 THEN (CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
                 / CAST(n - 1 AS DOUBLE) END AS var
             FROM mom),
           d2 AS (SELECT d.label, vec_id,
               SUM(CAST(CASE WHEN var > 0 THEN (CAST(x AS DOUBLE) - mu)
                 * (CAST(x AS DOUBLE) - mu) / var
                 ELSE 0.0 END AS DECIMAL(28,12)))
                 AS d2,
               CAST(COUNT(*) AS BIGINT) AS ndim
             FROM d JOIN m2 ON d.label = m2.label AND d.dim = m2.dim
             GROUP BY 1, 2),
           worst AS (SELECT label, vec_id AS worst_vec FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                 ORDER BY d2 DESC, vec_id DESC) AS rk FROM d2) z
             WHERE rk = 1)
           SELECT d2.label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(MAX(ndim) AS BIGINT) AS n_dims,
             CAST(SUM(CASE WHEN CAST(d2 AS DOUBLE) > 2.0 * ndim
               THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
             ROUND(CAST(SUM(d2) AS DOUBLE) / COUNT(*), 4) AS mean_d2,
             ROUND(CAST(MAX(d2) AS DOUBLE), 4) AS max_d2,
             MAX(worst_vec) AS worst_vec
           FROM d2 JOIN worst ON d2.label = worst.label
           GROUP BY d2.label ORDER BY d2.label""") +
      ("graph_local_cc" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           und AS (SELECT DISTINCT label, v1 AS u, v2 AS v FROM knn
             UNION SELECT label, v2, v1 FROM knn),
           deg AS (SELECT label, u, CAST(COUNT(*) AS BIGINT) AS deg
             FROM und GROUP BY 1, 2),
           wedge AS (SELECT x.label, x.u AS c, x.v AS a, y.v AS b
             FROM und x JOIN und y
               ON x.label = y.label AND x.u = y.u AND x.v < y.v),
           closedw AS (SELECT w.label, w.c,
               CAST(COUNT(*) AS BIGINT) AS closed
             FROM wedge w WHERE EXISTS (SELECT 1 FROM und e
               WHERE e.label = w.label AND e.u = w.a AND e.v = w.b)
             GROUP BY 1, 2),
           perv AS (SELECT deg.label, deg.u, deg.deg,
               CAST(COALESCE(closed, 0) AS BIGINT) AS closed,
               (deg * (deg - 1)) // 2 AS wedges
             FROM deg LEFT JOIN closedw
               ON deg.label = closedw.label AND deg.u = closedw.c),
           cc AS (SELECT label,
               CASE WHEN wedges > 0
                 THEN CAST(CAST(closed AS DOUBLE) / wedges
                   AS DECIMAL(18,9))
                 ELSE CAST(0.0 AS DECIMAL(18,9)) END AS cc
             FROM perv)
           SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vertices,
             ROUND(CAST(SUM(cc) AS DOUBLE) / COUNT(*), 6)
               AS mean_local_cc,
             CAST(SUM(CASE WHEN cc >= 1.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fully_clustered,
             CAST(SUM(CASE WHEN cc = 0.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero_cc
           FROM cc GROUP BY label ORDER BY label""") +
      ("sim_matryoshka_recall" ->
        """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
               FROM embeddings ORDER BY vec_id LIMIT 5),
           sc AS (SELECT q.q_id, e.vec_id,
               list_cosine_similarity(e.embedding, q.q_emb) AS s64,
               list_cosine_similarity(e.embedding[1:32],
                 q.q_emb[1:32]) AS s32,
               list_cosine_similarity(e.embedding[1:16],
                 q.q_emb[1:16]) AS s16
             FROM embeddings e, q WHERE e.vec_id <> q.q_id),
           t64 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s64 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           t32 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s32 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           t16 AS (SELECT q_id, vec_id FROM (SELECT *, ROW_NUMBER()
                 OVER (PARTITION BY q_id ORDER BY s16 DESC, vec_id)
                 AS rk FROM sc) z WHERE rk <= 10),
           r AS (SELECT t64.q_id,
               CAST(SUM(CASE WHEN h32.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS hits_32,
               CAST(SUM(CASE WHEN h16.vec_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS hits_16
             FROM t64
             LEFT JOIN t32 h32 ON t64.q_id = h32.q_id
               AND t64.vec_id = h32.vec_id
             LEFT JOIN t16 h16 ON t64.q_id = h16.q_id
               AND t64.vec_id = h16.vec_id
             GROUP BY 1)
           SELECT q_id, CAST(10 AS BIGINT) AS k, hits_32, hits_16,
             ROUND(CAST(hits_32 AS DOUBLE) / 10, 4) AS recall_d32,
             ROUND(CAST(hits_16 AS DOUBLE) / 10, 4) AS recall_d16
           FROM r ORDER BY q_id""") +
      ("text_bpe_oov" ->
        """WITH tv AS (SELECT DISTINCT lower(t) AS w
             FROM (SELECT unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE doc_id % 2 = 0) z
             WHERE regexp_matches(lower(t), '^[a-z]+$')),
           ho AS (SELECT lang, lower(t) AS w,
               CAST(COUNT(*) AS BIGINT) AS occ
             FROM (SELECT lang, unnest(string_split(text, ' ')) AS t
                   FROM documents WHERE doc_id % 2 <> 0) z
             WHERE regexp_matches(lower(t), '^[a-z]+$')
             GROUP BY 1, 2)
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN tv.w IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS oov_types,
             ROUND(CAST(SUM(CASE WHEN tv.w IS NULL THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*), 6) AS oov_type_rate,
             CAST(SUM(occ) AS BIGINT) AS n_occ,
             CAST(SUM(CASE WHEN tv.w IS NULL THEN occ ELSE 0 END)
               AS BIGINT) AS oov_occ,
             ROUND(CAST(SUM(CASE WHEN tv.w IS NULL THEN occ
                 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(occ) AS DOUBLE), 6) AS oov_occ_rate,
             CAST(SUM(CASE WHEN tv.w IS NULL
               THEN occ * length(ho.w) ELSE 0 END) AS BIGINT)
               AS oov_chars
           FROM ho LEFT JOIN tv ON ho.w = tv.w
           GROUP BY lang ORDER BY lang""") +
      ("text_hybrid_retrieval" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           lex AS (SELECT doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1),
           lexr AS (SELECT doc_id, r_lex FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
               FROM lex) zl WHERE r_lex <= 100),
           anchor AS (SELECT e.vec_id AS a_id, e.embedding AS a_emb
             FROM lexr JOIN embeddings e ON lexr.doc_id = e.vec_id
             WHERE r_lex = 1),
           semr AS (SELECT doc_id, r_sem FROM (
               SELECT vec_id AS doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, vec_id) AS r_sem
               FROM (SELECT e.vec_id,
                       list_cosine_similarity(e.embedding, a.a_emb)
                         AS sim
                     FROM embeddings e, anchor a
                     WHERE e.vec_id <> a.a_id) z) zs
             WHERE r_sem <= 100),
           fused AS (SELECT COALESCE(lexr.doc_id, semr.doc_id)
                 AS doc_id,
               r_lex, r_sem,
               COALESCE(1.0 / (60.0 + r_lex), 0.0)
                 + COALESCE(1.0 / (60.0 + r_sem), 0.0) AS rrf
             FROM lexr FULL OUTER JOIN semr
               ON lexr.doc_id = semr.doc_id),
           top AS (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY rrf DESC, doc_id) AS rk FROM fused)
           SELECT CAST(rk AS BIGINT) AS rk, doc_id,
             CAST(r_lex AS BIGINT) AS r_lex,
             CAST(r_sem AS BIGINT) AS r_sem,
             ROUND(rrf, 6) AS rrf_score
           FROM top WHERE rk <= 10 ORDER BY rk""") +
      ("text_retrieval_ndcg" ->
        """WITH tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           q AS (SELECT token, df FROM (SELECT *, ROW_NUMBER()
                 OVER (ORDER BY df DESC, token) AS rk FROM df) z
             WHERE rk BETWEEN 20 AND 22),
           sc AS (SELECT tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5)
                   / (CAST(df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN q USING (token) JOIN lens USING (doc_id), nd),
           lex AS (SELECT doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1),
           lexr AS (SELECT doc_id, r_lex FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
               FROM lex) zl WHERE r_lex <= 100),
           anchor AS (SELECT e.vec_id AS a_id, e.embedding AS a_emb
             FROM lexr JOIN embeddings e ON lexr.doc_id = e.vec_id
             WHERE r_lex = 1),
           sims AS (SELECT e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, a.a_emb) AS sim
             FROM embeddings e, anchor a WHERE e.vec_id <> a.a_id),
           lexev AS (SELECT doc_id, CAST(r_lex - 1 AS BIGINT) AS r
             FROM lexr WHERE r_lex >= 2),
           dims AS (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           plane AS (SELECT j, d,
               CASE WHEN (strpos('0123456789abcdef',
                 substr(md5(CAST(j AS VARCHAR) || ':'
                   || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1
                 THEN 1 ELSE -1 END AS s
             FROM range(32) a(j), range(1, 65) b(d)),
           proj AS (SELECT vec_id, j,
               SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
                 AS p
             FROM dims JOIN plane USING (d) GROUP BY 1, 2),
           bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
               string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
                 ORDER BY j) AS bucket
             FROM proj GROUP BY vec_id, j // 8),
           abands AS (SELECT band, bucket FROM bands
             JOIN anchor ON vec_id = a_id),
           cand AS (SELECT DISTINCT b.vec_id AS doc_id
             FROM bands b JOIN abands USING (band, bucket)),
           semev AS (SELECT doc_id, r FROM (
               SELECT s.doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, s.doc_id) AS r
               FROM cand c JOIN sims s ON c.doc_id = s.doc_id) z
             WHERE r <= 100),
           fused AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + l.r), 0.0)
                 + COALESCE(1.0 / (60.0 + s.r), 0.0) AS rrf
             FROM lexev l FULL OUTER JOIN semev s
               ON l.doc_id = s.doc_id),
           hybev AS (SELECT doc_id, CAST(r0 AS BIGINT) AS pos FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY rrf DESC, doc_id) AS r0 FROM fused) z
             WHERE r0 <= 10),
           lists AS (
             SELECT 'a_lexical' AS arm, doc_id, r AS pos
               FROM lexev WHERE r <= 10
             UNION ALL SELECT 'b_semantic_lsh', doc_id, r
               FROM semev WHERE r <= 10
             UNION ALL SELECT 'c_hybrid_rrf', doc_id, pos FROM hybev),
           cdocs AS (SELECT s.doc_id AS cd, s.sim AS cs
             FROM (SELECT DISTINCT doc_id FROM lists) ld
             JOIN sims s USING (doc_id)),
           gains0 AS (SELECT cd,
               CAST(SUM(CASE WHEN sim > cs THEN 1 ELSE 0 END)
                 AS BIGINT) + 1 AS lo,
               CAST(COUNT(*) AS BIGINT) AS hi
             FROM sims JOIN cdocs ON sim >= cs GROUP BY cd),
           gains AS (SELECT cd AS doc_id,
               CASE WHEN lo > 10 THEN 0.0
                 ELSE CAST((LEAST(hi, 10) - lo + 1)
                     * (22 - lo - LEAST(hi, 10)) AS DOUBLE)
                   / CAST(2 * (hi - lo + 1) AS DOUBLE) END AS gain
             FROM gains0),
           truth AS (SELECT doc_id, CAST(1 AS BIGINT) AS rel FROM (
               SELECT doc_id, ROW_NUMBER()
                 OVER (ORDER BY sim DESC, doc_id) AS rn FROM sims) z
             WHERE rn <= 10),
           idcg AS (SELECT SUM(CAST(CAST(11 - r AS DOUBLE)
               / log2(CAST(r + 1 AS DOUBLE)) AS DECIMAL(28,12)))
               AS idcg
             FROM range(1, 11) t(r)),
           per AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_listed,
               CAST(SUM(COALESCE(rel, 0)) AS BIGINT) AS n_relevant,
               MIN(CASE WHEN rel = 1 THEN pos END) AS first_rel,
               SUM(CAST(COALESCE(gain, 0.0)
                 / log2(CAST(pos + 1 AS DOUBLE)) AS DECIMAL(28,12)))
                 AS dcg
             FROM lists LEFT JOIN gains USING (doc_id)
             LEFT JOIN truth USING (doc_id) GROUP BY 1)
           SELECT arm, n_listed, n_relevant,
             ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS mrr,
             ROUND(CAST(dcg AS DOUBLE), 6) AS dcg10,
             ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6)
               AS ndcg10
           FROM per, idcg ORDER BY arm""") +
      ("text_retrieval_ndcg_multi" ->
        s"""WITH ${retrievalPerQuerySql(20)}
           SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_queries,
             CAST(SUM(n_listed) AS BIGINT) AS n_listed_total,
             CAST(SUM(n_relevant) AS BIGINT) AS n_relevant_total,
             ROUND(CAST(SUM(ndcg) AS DOUBLE) / COUNT(*), 6)
               AS ndcg10_mean,
             ROUND(CAST(MIN(ndcg) AS DOUBLE), 6) AS ndcg10_min,
             ROUND(CAST(MAX(ndcg) AS DOUBLE), 6) AS ndcg10_max,
             ROUND(CAST(SUM(mrr) AS DOUBLE) / COUNT(*), 6)
               AS mrr_mean
           FROM fin GROUP BY arm ORDER BY arm""") +
      ("text_retrieval_panel_ci" -> retrievalPanelCiOracleSql()) +
      ("text_unigram_tokenizer" -> unigramOracleSql()) +
      ("text_tokenizer_fertility" -> fertilityOracleSql()) +
      ("text_wordpiece_greedy" -> wordpieceOracleSql()) +
      ("sim_beam_search" -> beamSearchOracleSql()) +
      ("sim_mmr_rerank" -> mmrOracleSql()) +
      ("events_event_study" ->
        """WITH sp AS (SELECT epoch(MIN(ts))
               + (epoch(MAX(ts)) - epoch(MIN(ts))) / 2 AS mid
             FROM events WHERE value IS NOT NULL),
           wk AS (SELECT CAST(floor((epoch(ts) - mid) / 604800.0)
                 AS BIGINT) AS w,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS t,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS c
             FROM events, sp WHERE value IS NOT NULL
               AND floor((epoch(ts) - mid) / 604800.0) BETWEEN -4 AND 3
             GROUP BY 1),
           g AS (SELECT *, t - c AS gap FROM wk),
           base AS (SELECT gap AS base_gap FROM g WHERE w = -1)
           SELECT w AS rel_week,
             ROUND(CAST(t AS DOUBLE) / 100.0, 2) AS rev_treat,
             ROUND(CAST(c AS DOUBLE) / 100.0, 2) AS rev_control,
             ROUND(CAST(gap AS DOUBLE) / 100.0, 2) AS gap,
             ROUND(CAST(gap - base_gap AS DOUBLE) / 100.0, 2)
               AS coef_vs_wm1,
             w < 0 AS is_pre
           FROM g LEFT JOIN base ON TRUE ORDER BY rel_week""") +
      ("orders_eoq" ->
        """WITH sp AS (SELECT (epoch(MAX(l_shipdate))
               - epoch(MIN(l_shipdate))) / CAST(86400.0 * 365.0 AS DOUBLE) AS years
             FROM lineitem),
           b AS (SELECT p_brand AS brand,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1),
           e AS (SELECT brand,
               CAST(q AS DOUBLE) / 100.0 / years AS d_rate,
               CAST(rev AS DOUBLE) / CAST(q AS DOUBLE) AS unit_price
             FROM b, sp),
           e2 AS (SELECT *,
               sqrt(CAST(200.0 AS DOUBLE) * d_rate
                 / (CAST(0.2 AS DOUBLE) * unit_price)) AS eoq
             FROM e)
           SELECT brand, ROUND(d_rate, 2) AS annual_demand,
             ROUND(unit_price, 4) AS unit_price,
             ROUND(eoq, 2) AS eoq_units,
             ROUND(d_rate / eoq, 2) AS orders_per_year,
             ROUND(eoq * unit_price / 2.0, 2) AS cycle_stock_value
           FROM e2 ORDER BY brand""") +
      ("graph_betweenness" ->
        """WITH directed AS (SELECT a.label, a.vec_id AS v1,
               b.vec_id AS v2,
               list_cosine_similarity(a.embedding, b.embedding) AS sim
             FROM embeddings a JOIN embeddings b
               ON a.label = b.label AND a.vec_id <> b.vec_id),
           knn AS (SELECT label, v1, v2 FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                 ORDER BY sim DESC, v2) AS rk FROM directed) r
             WHERE rk <= 3),
           sym AS MATERIALIZED (SELECT DISTINCT label, v1, v2 FROM (
               SELECT label, v1, v2 FROM knn
               UNION ALL SELECT label, v2, v1 FROM knn) u),
           nodes AS (SELECT label, vec_id AS node FROM embeddings),
           seeds AS (SELECT label, node AS seed FROM (
               SELECT label, node, ROW_NUMBER() OVER (
                 PARTITION BY label ORDER BY node) AS srk
               FROM nodes) z WHERE srk <= 3),
           l0 AS MATERIALIZED (SELECT label, seed, seed AS node,
               CAST(1 AS BIGINT) AS sig FROM seeds),
           l1 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l0 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
               WHERE x.label = d.label AND x.seed = d.seed
                 AND x.node = s.v2)
             GROUP BY 1, 2, 3),
           l2 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l1 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
                 WHERE x.label = d.label AND x.seed = d.seed
                   AND x.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l1 y
                 WHERE y.label = d.label AND y.seed = d.seed
                   AND y.node = s.v2)
             GROUP BY 1, 2, 3),
           l3 AS MATERIALIZED (SELECT d.label, d.seed, s.v2 AS node,
               CAST(SUM(d.sig) AS BIGINT) AS sig
             FROM sym s JOIN l2 d
               ON s.label = d.label AND s.v1 = d.node
             WHERE NOT EXISTS (SELECT 1 FROM l0 x
                 WHERE x.label = d.label AND x.seed = d.seed
                   AND x.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l1 y
                 WHERE y.label = d.label AND y.seed = d.seed
                   AND y.node = s.v2)
               AND NOT EXISTS (SELECT 1 FROM l2 z
                 WHERE z.label = d.label AND z.seed = d.seed
                   AND z.node = s.v2)
             GROUP BY 1, 2, 3),
           d2d AS MATERIALIZED (SELECT v.label, v.seed, v.node, v.sig,
               COALESCE(SUM(CAST(CAST(v.sig AS DOUBLE) / w.sig
                 * (1.0 + CAST(w.delta AS DOUBLE))
                 AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)))
                 AS delta
             FROM l2 v
             LEFT JOIN sym s ON s.label = v.label AND s.v1 = v.node
             LEFT JOIN (SELECT label, seed, node, sig,
                 CAST(0 AS DECIMAL(28,12)) AS delta FROM l3) w
               ON w.label = v.label AND w.seed = v.seed
                 AND w.node = s.v2
             GROUP BY 1, 2, 3, 4),
           d1d AS MATERIALIZED (SELECT v.label, v.seed, v.node, v.sig,
               COALESCE(SUM(CAST(CAST(v.sig AS DOUBLE) / w.sig
                 * (1.0 + CAST(w.delta AS DOUBLE))
                 AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)))
                 AS delta
             FROM l1 v
             LEFT JOIN sym s ON s.label = v.label AND s.v1 = v.node
             LEFT JOIN d2d w
               ON w.label = v.label AND w.seed = v.seed
                 AND w.node = s.v2
             GROUP BY 1, 2, 3, 4),
           bc AS (SELECT label, node, SUM(delta) AS bc,
               CAST(COUNT(*) AS BIGINT) AS n_seed_paths
             FROM (SELECT label, seed, node, delta FROM d1d
               UNION ALL SELECT label, seed, node, delta FROM d2d) u
             GROUP BY 1, 2)
           SELECT label, CAST(rk AS BIGINT) AS rk, node,
             ROUND(CAST(bc AS DOUBLE), 6) AS betweenness, n_seed_paths
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY label
               ORDER BY bc DESC, node) AS rk FROM bc) z
           WHERE rk <= 3 ORDER BY label, rk""") +
      ("events_ucb_allocation" ->
        """WITH first AS (SELECT user_id, event_type AS arm FROM (
               SELECT user_id, event_type, ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events) z WHERE rn = 1),
           conv AS (SELECT DISTINCT user_id FROM events
             WHERE event_type = 'purchase'),
           arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1
                 ELSE 0 END) AS BIGINT) AS n_conv
             FROM first LEFT JOIN conv USING (user_id) GROUP BY 1),
           tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_all
             FROM arms),
           sc AS (SELECT arm, n_users, n_conv,
               CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                 AS rate,
               CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)
                 + sqrt(2.0 * ln(CAST(n_all AS DOUBLE))
                   / CAST(n_users AS DOUBLE)) AS ucb1
             FROM arms, tot),
           mx AS (SELECT arm AS best_arm FROM sc
             ORDER BY ucb1 DESC, arm LIMIT 1)
           SELECT arm, n_users, n_conv,
             ROUND(rate, 6) AS conv_rate, ROUND(ucb1, 6) AS ucb1,
             arm = best_arm AS chosen
           FROM sc, mx ORDER BY arm""") +
      ("orders_its_segmented" ->
        """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS c
             FROM orders GROUP BY 1),
           d0 AS (SELECT MIN(day) AS day0,
               CAST(datediff('day', MIN(day), MAX(day)) // 2
                 AS BIGINT) AS tmid
             FROM daily),
           seg AS (SELECT CASE WHEN t < tmid THEN 'pre' ELSE 'post'
                 END AS seg, MAX(tmid) AS tmid,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(c) AS BIGINT) AS sc,
               SUM(CAST(t AS DECIMAL(38,0)) * c) AS stc,
               SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt
             FROM (SELECT CAST(datediff('day', day0, day) AS BIGINT)
                 AS t, c, tmid FROM daily, d0) z
             GROUP BY 1),
           fit AS (SELECT *,
               (CAST(stc AS DOUBLE) - CAST(st AS DOUBLE)
                 * CAST(sc AS DOUBLE) / n)
               / (CAST(stt AS DOUBLE) - CAST(st AS DOUBLE)
                 * CAST(st AS DOUBLE) / n) AS slope
             FROM seg),
           fit2 AS (SELECT *,
               (CAST(sc AS DOUBLE) - slope * CAST(st AS DOUBLE)) / n
                 AS icept
             FROM fit),
           fit3 AS (SELECT *,
               icept + slope * CAST(tmid AS DOUBLE) AS at_mid
             FROM fit2),
           p AS (SELECT
               MAX(CASE WHEN seg = 'pre' THEN n END) AS n_pre,
               MAX(CASE WHEN seg = 'post' THEN n END) AS n_post,
               MAX(CASE WHEN seg = 'pre' THEN slope END) AS b_pre,
               MAX(CASE WHEN seg = 'post' THEN slope END) AS b_post,
               MAX(CASE WHEN seg = 'pre' THEN at_mid END) AS y_pre,
               MAX(CASE WHEN seg = 'post' THEN at_mid END) AS y_post
             FROM fit3)
           SELECT n_pre, n_post,
             ROUND(b_pre / 100.0, 4) AS pre_slope,
             ROUND(b_post / 100.0, 4) AS post_slope,
             ROUND((b_post - b_pre) / 100.0, 4) AS slope_change,
             ROUND((y_post - y_pre) / 100.0, 2) AS level_jump,
             ROUND((y_post - y_pre) / y_pre, 6) AS jump_rel
           FROM p""") +
      ("dq_profile_drift" ->
        """WITH sp AS (SELECT epoch(MIN(o_orderdate))
               + (epoch(MAX(o_orderdate)) - epoch(MIN(o_orderdate)))
                 / 2 AS mid
             FROM orders),
           hv AS (SELECT o_totalprice, o_orderpriority, o_orderstatus,
               CASE WHEN epoch(o_orderdate) < mid THEN 1 ELSE 2 END
                 AS h
             FROM orders, sp),
           num AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
             FROM (SELECT h, CAST(ROUND(o_totalprice * 100) AS BIGINT)
                 AS y FROM hv) z GROUP BY 1),
           nm AS (SELECT h, n, CAST(sy AS DOUBLE) / n AS mean,
               CASE WHEN n > 1 THEN
                 (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                   * CAST(sy AS DOUBLE) / n) / CAST(n - 1 AS DOUBLE)
               END AS v
             FROM num),
           nrow AS (SELECT
               MAX(CASE WHEN h = 1 THEN n END) AS n1,
               MAX(CASE WHEN h = 2 THEN n END) AS n2,
               MAX(CASE WHEN h = 1 THEN mean END) AS m1,
               MAX(CASE WHEN h = 2 THEN mean END) AS m2,
               MAX(CASE WHEN h = 1 THEN v END) AS v1,
               MAX(CASE WHEN h = 2 THEN v END) AS v2
             FROM nm),
           nout AS (SELECT 'o_totalprice' AS column_name,
               'numeric_mean_z' AS kind, n1 AS n_first,
               n2 AS n_second,
               ROUND(m1 / 100.0, 4) AS stat_first,
               ROUND(m2 / 100.0, 4) AS stat_second,
               CASE WHEN v1 / n1 + v2 / n2 > 0.0 THEN
                 ROUND(abs(m2 - m1) / sqrt(v1 / n1 + v2 / n2), 6)
               END AS drift_stat,
               CASE WHEN v1 / n1 + v2 / n2 > 0.0 THEN
                 abs(m2 - m1) / sqrt(v1 / n1 + v2 / n2) > 3.0
               END AS drifted
             FROM nrow),
           cp AS (SELECT h, o_orderpriority AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt FROM hv GROUP BY 1, 2),
           cpt AS (SELECT h, CAST(SUM(cnt) AS BIGINT) AS nt FROM cp
             GROUP BY 1),
           cps AS (SELECT v, cp.h,
               CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS p, nt
             FROM cp JOIN cpt ON cp.h = cpt.h),
           cpv AS (SELECT v,
               SUM(CASE WHEN h = 1 THEN p ELSE 0.0 END) AS p1,
               SUM(CASE WHEN h = 2 THEN p ELSE 0.0 END) AS p2,
               MAX(CASE WHEN h = 1 THEN nt END) AS n1,
               MAX(CASE WHEN h = 2 THEN nt END) AS n2
             FROM cps GROUP BY 1),
           cpr AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(p1) AS top1, MAX(p2) AS top2,
               CAST(SUM(CAST(abs(p1 - p2) AS DECIMAL(28,12)))
                 AS DOUBLE) / 2.0 AS tvd
             FROM cpv),
           cout AS (SELECT 'o_orderpriority' AS column_name,
               'categorical_tvd' AS kind, n1 AS n_first,
               n2 AS n_second, ROUND(top1, 6) AS stat_first,
               ROUND(top2, 6) AS stat_second,
               ROUND(tvd, 6) AS drift_stat, tvd > 0.1 AS drifted
             FROM cpr),
           sp2 AS (SELECT h, o_orderstatus AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt FROM hv GROUP BY 1, 2),
           spt AS (SELECT h, CAST(SUM(cnt) AS BIGINT) AS nt FROM sp2
             GROUP BY 1),
           sps AS (SELECT v, sp2.h,
               CAST(cnt AS DOUBLE) / CAST(nt AS DOUBLE) AS p, nt
             FROM sp2 JOIN spt ON sp2.h = spt.h),
           spv AS (SELECT v,
               SUM(CASE WHEN h = 1 THEN p ELSE 0.0 END) AS p1,
               SUM(CASE WHEN h = 2 THEN p ELSE 0.0 END) AS p2,
               MAX(CASE WHEN h = 1 THEN nt END) AS n1,
               MAX(CASE WHEN h = 2 THEN nt END) AS n2
             FROM sps GROUP BY 1),
           spr AS (SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               MAX(p1) AS top1, MAX(p2) AS top2,
               CAST(SUM(CAST(abs(p1 - p2) AS DECIMAL(28,12)))
                 AS DOUBLE) / 2.0 AS tvd
             FROM spv),
           sout AS (SELECT 'o_orderstatus' AS column_name,
               'categorical_tvd' AS kind, n1 AS n_first,
               n2 AS n_second, ROUND(top1, 6) AS stat_first,
               ROUND(top2, 6) AS stat_second,
               ROUND(tvd, 6) AS drift_stat, tvd > 0.1 AS drifted
             FROM spr)
           SELECT * FROM nout UNION ALL SELECT * FROM cout
           UNION ALL SELECT * FROM sout
           ORDER BY column_name""") +
      ("sim_centroid_margin" ->
        """WITH dims AS (SELECT vec_id, label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           cent AS (SELECT label AS cell, d,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE) / COUNT(*) AS c
             FROM dims GROUP BY 1, 2),
           cn AS (SELECT cell, sqrt(CAST(SUM(CAST(c AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE)) AS cnorm
             FROM cent GROUP BY 1),
           per AS (SELECT vec_id, label, cell,
               CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(c AS DECIMAL(18,9))) AS DOUBLE) AS dot,
               sqrt(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9))
                 * CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))
                 AS DOUBLE)) AS vnorm
             FROM dims JOIN cent USING (d) GROUP BY 1, 2, 3),
           sc AS (SELECT vec_id, label, cell,
               dot / (vnorm * cnorm) AS s
             FROM per JOIN cn USING (cell)),
           t2 AS (SELECT vec_id, label,
               MAX(CASE WHEN rn = 1 THEN cell END) AS pred,
               MAX(CASE WHEN rn = 1 THEN s END) AS s1,
               MAX(CASE WHEN rn = 2 THEN s END) AS s2
             FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY s DESC, cell) AS rn FROM sc) z
             WHERE rn <= 2 GROUP BY 1, 2),
           m AS (SELECT label AS true_label, pred AS assigned_label,
               CAST(s1 - s2 AS DECIMAL(18,9)) AS margin FROM t2)
           SELECT true_label, assigned_label,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             ROUND(CAST(SUM(margin) AS DOUBLE) / COUNT(*), 6)
               AS mean_margin,
             ROUND(CAST(MIN(margin) AS DOUBLE), 6) AS min_margin
           FROM m GROUP BY 1, 2
           ORDER BY true_label, assigned_label""") +
      ("orders_price_elasticity" ->
        """WITH bm AS (SELECT p_brand AS brand,
               date_trunc('month', l_shipdate) AS mo,
               CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
                 AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS rev
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY 1, 2 HAVING SUM(CAST(ROUND(l_quantity * 100)
               AS BIGINT)) > 0),
           lx AS (SELECT brand,
               ln(CAST(q AS DOUBLE) / 100.0) AS lq,
               ln(CAST(rev AS DOUBLE) / CAST(q AS DOUBLE)) AS lp
             FROM bm),
           g AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_months,
               SUM(CAST(lp AS DECIMAL(28,12))) AS sx,
               SUM(CAST(lq AS DECIMAL(28,12))) AS sy,
               SUM(CAST(lp * lq AS DECIMAL(28,12))) AS sxy,
               SUM(CAST(lp * lp AS DECIMAL(28,12))) AS sxx,
               SUM(CAST(lq * lq AS DECIMAL(28,12))) AS syy
             FROM lx GROUP BY 1),
           c AS (SELECT brand, n_months, sx, sy,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n_months AS cxy,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / n_months AS cxx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / n_months AS cyy
             FROM g)
           SELECT brand, n_months,
             ROUND(CASE WHEN cxx > 0 THEN cxy / cxx END, 6)
               AS elasticity,
             ROUND(CASE WHEN cxx > 0 AND cyy > 0
               THEN cxy * cxy / (cxx * cyy) END, 6) AS r2,
             ROUND(CAST(sx AS DOUBLE) / n_months, 6) AS mean_ln_price,
             ROUND(CAST(sy AS DOUBLE) / n_months, 6) AS mean_ln_qty
           FROM c ORDER BY brand""") +
      ("feature_woe_iv" ->
        """WITH cat AS (SELECT o_orderpriority AS category,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                 END) AS BIGINT) AS pos,
               CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0
                 END) AS BIGINT) AS neg
             FROM orders GROUP BY 1),
           tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS pt,
               CAST(SUM(neg) AS BIGINT) AS nt FROM cat),
           w AS (SELECT category, pos, neg,
               CAST(pos AS DOUBLE) / pt AS ps,
               CAST(neg AS DOUBLE) / nt AS ns,
               CASE WHEN pos > 0 AND neg > 0
                 THEN ln((CAST(pos AS DOUBLE) / pt)
                   / (CAST(neg AS DOUBLE) / nt)) END AS woe
             FROM cat, tot),
           t AS (SELECT *, COALESCE(CAST((ps - ns) * woe
               AS DECIMAL(28,12)), CAST(0 AS DECIMAL(28,12)))
               AS iv_term FROM w),
           iv AS (SELECT SUM(iv_term) AS iv FROM t)
           SELECT category, pos, neg,
             ROUND(ps, 6) AS pos_share, ROUND(ns, 6) AS neg_share,
             ROUND(woe, 6) AS woe,
             ROUND(CAST(iv AS DOUBLE), 6) AS iv_total
           FROM t, iv ORDER BY category""") +
      ("dq_l_diversity" ->
        """WITH cells AS (SELECT lang,
               n_chars - (n_chars % 100) AS len_bucket, source,
               CAST(COUNT(*) AS BIGINT) AS c
             FROM documents GROUP BY 1, 2, 3),
           classes AS (SELECT lang, len_bucket,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS l,
               CAST(SUM(c) AS BIGINT) AS sz,
               SUM(CAST(-CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                 AS DECIMAL(28,12))) AS hnum
             FROM cells GROUP BY 1, 2),
           ce AS (SELECT *, ln(CAST(sz AS DOUBLE))
                 + CAST(hnum AS DOUBLE) / CAST(sz AS DOUBLE)
                 AS entropy FROM classes),
           tot AS (SELECT CAST(SUM(sz) AS BIGINT) AS n_rows_all
             FROM classes)
           SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
             CAST(SUM(sz) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(sz) AS DOUBLE) / n_rows_all, 6)
               AS rows_share,
             ROUND(CAST(SUM(CAST(entropy AS DECIMAL(28,12)))
               AS DOUBLE) / COUNT(*), 6) AS mean_entropy
           FROM ce, tot GROUP BY l, n_rows_all ORDER BY l""") +
      ("text_kn_bigram" ->
        """WITH d AS (SELECT doc_id, lang, string_split(text, ' ')
               AS tk FROM documents),
           trt AS (SELECT doc_id, generate_subscripts(tk, 1) AS i,
               unnest(tk) AS word FROM d WHERE doc_id % 2 = 0),
           trb AS (SELECT a.word AS w1, b.word AS w2 FROM trt a
             JOIN trt b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
           hot AS (SELECT doc_id, lang, generate_subscripts(tk, 1)
                 AS i, unnest(tk) AS word
             FROM d WHERE doc_id % 2 <> 0),
           ho AS (SELECT a.lang, a.word AS w1, b.word AS w2,
               CAST(COUNT(*) AS BIGINT) AS f
             FROM hot a JOIN hot b
               ON a.doc_id = b.doc_id AND b.i = a.i + 1
             GROUP BY 1, 2, 3),
           pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
             FROM trb GROUP BY 1, 2),
           ctx AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cw1,
               CAST(COUNT(*) AS BIGINT) AS n1w1 FROM pc GROUP BY 1),
           cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1w2
             FROM pc GROUP BY 1),
           n1a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1all FROM pc),
           j AS (SELECT ho.lang, ho.f, pc.c, ctx.cw1, ctx.n1w1,
               cont.n1w2, n1a.n1all
             FROM ho LEFT JOIN pc USING (w1, w2)
             LEFT JOIN ctx USING (w1)
             LEFT JOIN cont USING (w2), n1a),
           fl AS (SELECT lang, f,
               cw1 IS NULL AS oov_ctx,
               cw1 IS NOT NULL AND n1w2 IS NULL AS oov_cont,
               CASE WHEN cw1 IS NOT NULL AND n1w2 IS NOT NULL THEN
                 CAST(-ln(GREATEST(CAST(COALESCE(c, 0) AS DOUBLE)
                     - 0.75, 0.0) / CAST(cw1 AS DOUBLE)
                   + 0.75 * CAST(n1w1 AS DOUBLE) / CAST(cw1 AS DOUBLE)
                     * (CAST(n1w2 AS DOUBLE) / CAST(n1all AS DOUBLE)))
                   AS DECIMAL(28,12)) END AS nll
             FROM j)
           SELECT lang,
             CAST(SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END)
               AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN oov_ctx THEN f ELSE 0 END) AS BIGINT)
               AS n_oov_ctx,
             CAST(SUM(CASE WHEN oov_cont THEN f ELSE 0 END) AS BIGINT)
               AS n_oov_cont,
             ROUND(CAST(SUM(CAST(nll * f AS DECIMAL(38,12)))
                 AS DOUBLE)
               / SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END), 6)
               AS mean_nll,
             ROUND(exp(CAST(SUM(CAST(nll * f AS DECIMAL(38,12)))
                 AS DOUBLE)
               / SUM(CASE WHEN nll IS NOT NULL THEN f ELSE 0 END)), 4)
               AS perplexity
           FROM fl GROUP BY lang ORDER BY lang""") +
      ("window_rolling_corr" ->
        """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN user_id % 2 <> 0
                   THEN CAST(ROUND(value * 100) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
             FROM events WHERE value IS NOT NULL GROUP BY 1),
           fr AS (SELECT d, x, y,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) OVER w AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) OVER w AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) OVER w AS syy
             FROM daily
             WINDOW w AS (ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
           c AS (SELECT *,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy
             FROM fr)
           SELECT strftime(d, '%Y-%m-%d') AS day, n AS n_window,
             ROUND(CAST(x AS DOUBLE) / 100.0, 2) AS rev_even,
             ROUND(CAST(y AS DOUBLE) / 100.0, 2) AS rev_odd,
             ROUND(CASE WHEN cxx > 0 AND cyy > 0
               THEN cxy / sqrt(cxx * cyy) END, 6) AS rolling_corr
           FROM c ORDER BY day""") +
      ("orders_fe_regression" ->
        """WITH li AS (SELECT l_partkey,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
             FROM lineitem),
           g AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
             FROM li GROUP BY 1),
           t AS (SELECT n, sx, sy, sxy, sxx,
               CAST(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n
                 AS DECIMAL(28,12)) AS cxy,
               CAST(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n
                 AS DECIMAL(28,12)) AS cxx,
               CAST(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
                 AS DECIMAL(28,12)) AS cyy
             FROM g),
           a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(SUM(sx) AS BIGINT) AS tsx,
               CAST(SUM(sy) AS BIGINT) AS tsy,
               SUM(cxy) AS wxy, SUM(cxx) AS wxx, SUM(cyy) AS wyy,
               SUM(sxy) AS sxy_all, SUM(sxx) AS sxx_all FROM t)
           SELECT n_parts, n_rows,
             ROUND((CAST(sxy_all AS DOUBLE) - CAST(tsx AS DOUBLE) * tsy
                 / CAST(n_rows AS DOUBLE))
               / (CAST(sxx_all AS DOUBLE) - CAST(tsx AS DOUBLE) * tsx
                 / CAST(n_rows AS DOUBLE)), 6) AS slope_pooled,
             ROUND(CAST(wxy AS DOUBLE) / CAST(wxx AS DOUBLE), 6)
               AS slope_fe,
             ROUND(CAST(wxy AS DOUBLE) * CAST(wxy AS DOUBLE)
               / (CAST(wxx AS DOUBLE) * CAST(wyy AS DOUBLE)), 6)
               AS r2_within
           FROM a""")
  }

  /** DuckDB replay of [[graft.operators.EventAnalytics.absorptionTime]]
    * with the SAME fixed Jacobi iteration count unrolled as CTEs h1..hN
    * — generated so the Spark loop and the oracle can never disagree
    * on the iteration count silently. */
  private def absorptionOracle(iters: Int): String = {
    val hCtes = (1 to iters).map { i =>
      val prev = s"h${i - 1}"
      s"""h$i AS (SELECT st.cur,
            1.0 + COALESCE(SUM(CAST(qn.p * hp.h AS DECIMAL(28,12))), 0)
              AS h
          FROM states st
          LEFT JOIN qn ON qn.cur = st.cur
          LEFT JOIN $prev hp ON hp.cur = qn.nxt
          GROUP BY st.cur)"""
    }.mkString(",\n")
    s"""WITH seq AS (SELECT user_id, event_type, ts, event_id,
            LEAD(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS nxt
          FROM events),
        trans AS (SELECT event_type AS cur, nxt,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM seq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
          GROUP BY 1, 2),
        tot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS n_out FROM trans
          GROUP BY 1),
        p AS (SELECT trans.cur, nxt,
            CAST(c AS DOUBLE) / CAST(n_out AS DOUBLE) AS p
          FROM trans JOIN tot ON trans.cur = tot.cur),
        qn AS (SELECT * FROM p WHERE nxt <> 'purchase'),
        states AS (SELECT cur FROM tot),
        h0 AS (SELECT cur, 0.0 AS h FROM states),
        $hCtes,
        pabs AS (SELECT cur, p AS p_purchase FROM p
          WHERE nxt = 'purchase')
        SELECT st.cur AS state, tot.n_out,
          ROUND(COALESCE(pabs.p_purchase, 0.0), 6) AS p_purchase_1step,
          ROUND(hf.h, 6) AS expected_steps_12
        FROM states st JOIN tot ON st.cur = tot.cur
        JOIN h$iters hf ON hf.cur = st.cur
        LEFT JOIN pabs ON pabs.cur = st.cur
        ORDER BY state"""
  }

  /** DuckDB replay of the incremental MinHash dedup, parameterized by
    * increment: each `steps` entry is a predicate over `sx.sn` (the
    * incoming batch's source number) and `sy.sn` (the index side as it
    * stands when that increment arrives). One entry renders the classic
    * single-increment query; several entries render the GROWING-corpus
    * loop (`stream_sig_index_multi`): increment k dedups against corpus
    * plus every earlier increment, exactly what the streaming job's
    * per-batch index append produces. Shared relations (shingles, bands,
    * sizes) are MATERIALIZED once; per-step blocks only differ in the
    * candidate predicate. */
  /** Generated oracle for `sim_mmr_rerank`: the greedy selection
    * unrolls to k rounds of (remaining → redundancy-vs-selected →
    * argmax) CTEs — mechanical, so built here like
    * [[unigramOracleSql]]. Interpolated double literals (λ, 1−λ)
    * print Scala's exact double representation, which is the same
    * value the Spark side's `lit(1.0 - lambda)` computes. */
  private[graft] def mmrOracleSql(queryId: Long = 0L, nCand: Int = 20,
      k: Int = 10, lambda: Double = 0.7): String = {
    // bare numeric literals parse as DECIMAL in DuckDB and drag the
    // whole score into decimal arithmetic — force DOUBLE so the score
    // is the same IEEE expression Spark evaluates
    val lam = s"CAST($lambda AS DOUBLE)"
    val oml = s"CAST(${1.0 - lambda} AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings
           WHERE vec_id = $queryId),
         cand AS MATERIALIZED (SELECT vec_id, embedding, rel FROM (
             SELECT e.vec_id, e.embedding,
               list_cosine_similarity(e.embedding, q.q_emb) AS rel,
               ROW_NUMBER() OVER (ORDER BY
                 list_cosine_similarity(e.embedding, q.q_emb) DESC,
                 e.vec_id) AS rn
             FROM embeddings e, q WHERE e.vec_id <> $queryId) z
           WHERE rn <= $nCand),
         pairs AS MATERIALIZED (SELECT a.vec_id AS a, b.vec_id AS b,
             list_cosine_similarity(a.embedding, b.embedding) AS psim
           FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         pick_1 AS MATERIALIZED (SELECT 1 AS mmr_rank, vec_id, rel,
             CAST(NULL AS DOUBLE) AS msim,
             $lam * rel - $oml * 0.0 AS score
           FROM cand ORDER BY $lam * rel - $oml * 0.0 DESC, vec_id
           LIMIT 1),
         sel_1 AS (SELECT vec_id FROM pick_1),
"""
    for (t <- 2 to k) {
      sb ++= s"""rem_$t AS (SELECT c.vec_id, c.rel FROM cand c
           WHERE c.vec_id NOT IN (SELECT vec_id FROM sel_${t - 1})),
         red_$t AS (SELECT r.vec_id, r.rel, MAX(p.psim) AS msim
           FROM rem_$t r LEFT JOIN (SELECT p0.a, p0.psim FROM pairs p0
             JOIN sel_${t - 1} s ON p0.b = s.vec_id) p
             ON p.a = r.vec_id
           GROUP BY 1, 2),
         pick_$t AS MATERIALIZED (SELECT $t AS mmr_rank, vec_id, rel,
             msim, $lam * rel - $oml * COALESCE(msim, 0.0) AS score
           FROM red_$t ORDER BY score DESC, vec_id LIMIT 1),
         sel_$t AS (SELECT vec_id FROM sel_${t - 1}
           UNION ALL SELECT vec_id FROM pick_$t),
"""
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= "\n" + (1 to k).map(t =>
      s"""SELECT CAST(mmr_rank AS BIGINT) AS mmr_rank, vec_id,
          ROUND(CAST(rel AS DOUBLE), 6) AS relevance,
          ROUND(CAST(msim AS DOUBLE), 6) AS max_sim_selected,
          ROUND(score, 6) AS mmr_score FROM pick_$t""")
      .mkString(" UNION ALL ")
    sb ++= " ORDER BY mmr_rank"
    sb.toString
  }

  /** Generated oracle for `text_unigram_tokenizer`: the hard-EM
    * Viterbi DP unrolls to `maxLen` levels per round and the
    * backpointer walk to `maxLen` steps — mechanical CTE chains, so
    * the SQL is BUILT here (the [[incrementalMinhashOracleSql]]
    * discipline) instead of hand-maintained. Every level CTE is
    * MATERIALIZED: DuckDB inlines re-referenced CTEs, and dp level i
    * references levels i−4..i−1 — un-materialized, the chain
    * re-evaluates combinatorially (the same reason the Spark side
    * localCheckpoints each level). */
  /** One trainer EM round's CTE chain (shared by both generated
    * unigram oracles): Viterbi DP levels, backpointer walk, usage
    * census, stats row. */
  private def unigramDpChainSql(r: Int, vsName: String, maxLen: Int,
      maxPiece: Int): String = {
    val sb = new StringBuilder
    sb ++= s"dp${r}_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM words),\n"
    for (i <- 1 to maxLen) {
      val lo = math.max(0, i - maxPiece)
      val prevUnion = (lo until i)
        .map(j => s"SELECT * FROM dp${r}_$j").mkString(" UNION ALL ")
      sb ++= s"""dp${r}_$i AS MATERIALIZED (SELECT w, $i AS pos,
          CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
          SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
            ROW_NUMBER() OVER (PARTITION BY vs.w
              ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
          FROM $vsName vs JOIN ($prevUnion) d
            ON vs.w = d.w AND vs.j = d.pos
          WHERE vs.i = $i) z WHERE rn = 1),\n"""
    }
    sb ++= s"dpall$r AS MATERIALIZED (" + (0 to maxLen)
      .map(i => s"SELECT * FROM dp${r}_$i").mkString(" UNION ALL ") +
      "),\n"
    sb ++= s"""fin$r AS MATERIALIZED (SELECT d.w, words.f, words.len,
        d.dp FROM dpall$r d
        JOIN words ON d.w = words.w AND d.pos = words.len),\n"""
    sb ++= s"wk${r}_0 AS MATERIALIZED (SELECT w, f, len AS pos " +
      s"FROM fin$r),\n"
    for (t <- 1 to maxLen) {
      val prev = if (t == 1) s"wk${r}_0"
        else s"(SELECT w, f, bp AS pos FROM wk${r}_${t - 1})"
      sb ++= s"""wk${r}_$t AS MATERIALIZED (SELECT k.w, k.f, d.bp,
          d.pos FROM $prev k
          JOIN dpall$r d ON k.w = d.w AND k.pos = d.pos
          WHERE k.pos > 0),\n"""
    }
    sb ++= s"pieces$r AS MATERIALIZED (" + (1 to maxLen)
      .map(t => s"SELECT w, f, bp AS j, pos AS i FROM wk${r}_$t")
      .mkString(" UNION ALL ") + "),\n"
    sb ++= s"""usage$r AS MATERIALIZED (SELECT
        substr(w, j + 1, i - j) AS piece,
        CAST(SUM(f) AS BIGINT) AS u FROM pieces$r GROUP BY 1),\n"""
    sb ++= s"""stats$r AS (SELECT CAST(COUNT(*) AS BIGINT)
        AS n_word_types, CAST(SUM(f) AS BIGINT) AS n_tokens,
        SUM(CAST(dp * f AS DECIMAL(38,12))) AS nll_sum
        FROM fin$r),\n"""
    sb ++= s"pc$r AS (SELECT CAST(SUM(f) AS BIGINT) AS n_pieces " +
      s"FROM pieces$r),\n"
    sb ++= s"""top$r AS (SELECT piece AS top_piece,
        u AS top_piece_count FROM (SELECT *, ROW_NUMBER()
          OVER (ORDER BY u DESC, piece) AS rk
        FROM usage$r WHERE length(piece) > 1) z WHERE rk = 1),\n"""
    sb.toString
  }

  /** The trainer PREFIX both generated unigram oracles share: train
    * words + span lattice + seed vocabulary/costs, EM round 1, and
    * the re-estimated round-1 vocabulary costs (`cost1`) — the frozen
    * artifact `stream_unigram_encode` applies. Emitted WITHOUT the
    * leading WITH so each generator appends its own tail. */
  private def unigramTrainPrefixSql(maxLen: Int, maxPiece: Int,
      v0: Int, vKeep: Int): String =
    s"""words AS MATERIALIZED (SELECT w,
           CAST(COUNT(*) AS BIGINT) AS f, length(w) AS len FROM (
           SELECT lower(t) AS w FROM (
             SELECT unnest(string_split(text, ' ')) AS t
             FROM documents WHERE doc_id % 2 = 0) z
           WHERE regexp_matches(lower(t), '^[a-z]+$$')
             AND length(t) <= $maxLen) zz
         GROUP BY 1),
       spans AS MATERIALIZED (SELECT w, f, st - 1 AS j,
           st + pl - 1 AS i, substr(w, CAST(st AS INT),
             CAST(pl AS INT)) AS piece
         FROM words, range(1, ${maxLen + 1}) s(st),
           range(1, ${maxPiece + 1}) p(pl)
         WHERE st + pl - 1 <= len),
       c0 AS MATERIALIZED (SELECT piece, CAST(SUM(f) AS BIGINT) AS c
         FROM spans GROUP BY 1),
       vocab0 AS MATERIALIZED (SELECT piece, MAX(c) AS c FROM (
           SELECT piece, c FROM (SELECT *, ROW_NUMBER()
               OVER (ORDER BY c DESC, piece) AS rk FROM c0) z
             WHERE rk <= $v0
           UNION ALL SELECT piece, c FROM c0
             WHERE length(piece) = 1) m GROUP BY 1),
       t0 AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM vocab0),
       cost0 AS MATERIALIZED (SELECT piece,
           CAST(-ln(CAST(c AS DOUBLE) / t) AS DECIMAL(28,12)) AS cost
         FROM vocab0, t0),
       vs1 AS MATERIALIZED (SELECT s.w, s.f, s.j, s.i, cost
         FROM spans s JOIN cost0 USING (piece)),
       ${unigramDpChainSql(1, "vs1", maxLen, maxPiece)}
       vocab1 AS MATERIALIZED (SELECT piece, MAX(u) AS u FROM (
           SELECT piece, u FROM (SELECT *, ROW_NUMBER()
               OVER (ORDER BY u DESC, piece) AS rk FROM usage1) z
             WHERE rk <= $vKeep
           UNION ALL SELECT v.piece, COALESCE(u1.u, 0)
             FROM vocab0 v LEFT JOIN usage1 u1 USING (piece)
             WHERE length(v.piece) = 1) m GROUP BY 1),
       t1 AS (SELECT CAST(SUM(u + 1) AS BIGINT) AS t FROM vocab1),
       cost1 AS MATERIALIZED (SELECT piece,
           CAST(-ln(CAST(u + 1 AS DOUBLE) / t) AS DECIMAL(28,12))
             AS cost
         FROM vocab1, t1),"""

  /** Generated oracle for `text_unigram_tokenizer`: trainer prefix +
    * EM round 2 + the two stats rows. */
  private[graft] def unigramOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String =
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       vs2 AS MATERIALIZED (SELECT s.w, s.f, s.j, s.i, cost
         FROM spans s JOIN cost1 USING (piece)),
       ${unigramDpChainSql(2, "vs2", maxLen, maxPiece)}
       v0sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size
         FROM cost0),
       v1sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size
         FROM cost1),
       row1 AS (SELECT CAST(1 AS BIGINT) AS em_round, vocab_size,
           n_word_types, n_tokens, n_pieces,
           ROUND(CAST(n_pieces AS DOUBLE) / n_tokens, 6)
             AS pieces_per_token,
           ROUND(CAST(nll_sum AS DOUBLE) / n_tokens, 6)
             AS nll_per_token,
           top_piece, top_piece_count
         FROM v0sz, stats1, pc1, top1),
       row2 AS (SELECT CAST(2 AS BIGINT) AS em_round, vocab_size,
           n_word_types, n_tokens, n_pieces,
           ROUND(CAST(n_pieces AS DOUBLE) / n_tokens, 6)
             AS pieces_per_token,
           ROUND(CAST(nll_sum AS DOUBLE) / n_tokens, 6)
             AS nll_per_token,
           top_piece, top_piece_count
         FROM v1sz, stats2, pc2, top2)
       SELECT * FROM row1 UNION ALL SELECT * FROM row2
       ORDER BY em_round"""

  /** Generated oracle for `stream_unigram_encode`: the SAME trainer
    * prefix (so the frozen `cost1` can never drift from the trainer's),
    * then each staged increment's word types Viterbi-encoded against
    * cost1 — DP levels, backpointer walk to a per-word piece count,
    * per-(increment, lang) census with OOV accounting — plus the fold
    * row (increment 0 = sums re-divided). */
  private[graft] def streamUnigramEncodeOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String = {
    def incChain(k: Int, pred: String): String = {
      val sb = new StringBuilder
      sb ++= s"""lw$k AS MATERIALIZED (SELECT lang, w,
          CAST(COUNT(*) AS BIGINT) AS occ FROM (
          SELECT lang, lower(t) AS w FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS t
            FROM documents WHERE $pred) z
          WHERE regexp_matches(lower(t), '^[a-z]+$$')
            AND length(t) <= $maxLen) zz
        GROUP BY 1, 2),\n"""
      sb ++= s"""ty$k AS MATERIALIZED (SELECT w, length(w) AS len
        FROM (SELECT DISTINCT w FROM lw$k) d),\n"""
      sb ++= s"""sp$k AS MATERIALIZED (SELECT w, st - 1 AS j,
          st + pl - 1 AS i,
          substr(w, CAST(st AS INT), CAST(pl AS INT)) AS piece
        FROM ty$k, range(1, ${maxLen + 1}) s(st),
          range(1, ${maxPiece + 1}) p(pl)
        WHERE st + pl - 1 <= len),\n"""
      sb ++= s"""vsi$k AS MATERIALIZED (SELECT s.w, s.j, s.i, cost
        FROM sp$k s JOIN cost1 USING (piece)),\n"""
      sb ++= s"idp${k}_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
        s"CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM ty$k),\n"
      for (i <- 1 to maxLen) {
        val lo = math.max(0, i - maxPiece)
        val prevUnion = (lo until i)
          .map(j => s"SELECT * FROM idp${k}_$j").mkString(" UNION ALL ")
        sb ++= s"""idp${k}_$i AS MATERIALIZED (SELECT w, $i AS pos,
            CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
            SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
              ROW_NUMBER() OVER (PARTITION BY vs.w
                ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
            FROM vsi$k vs JOIN ($prevUnion) d
              ON vs.w = d.w AND vs.j = d.pos
            WHERE vs.i = $i) z WHERE rn = 1),\n"""
      }
      sb ++= s"idpall$k AS MATERIALIZED (" + (0 to maxLen)
        .map(i => s"SELECT * FROM idp${k}_$i").mkString(" UNION ALL ") +
        "),\n"
      sb ++= s"""ifin$k AS MATERIALIZED (SELECT d.w, t.len, d.dp
        FROM idpall$k d
        JOIN ty$k t ON d.w = t.w AND d.pos = t.len),\n"""
      sb ++= s"iwk${k}_0 AS MATERIALIZED (SELECT w, len AS pos " +
        s"FROM ifin$k),\n"
      for (t <- 1 to maxLen) {
        val prev = if (t == 1) s"iwk${k}_0"
          else s"(SELECT w, bp AS pos FROM iwk${k}_${t - 1})"
        sb ++= s"""iwk${k}_$t AS MATERIALIZED (SELECT k.w, d.bp
          FROM $prev k
          JOIN idpall$k d ON k.w = d.w AND k.pos = d.pos
          WHERE k.pos > 0),\n"""
      }
      sb ++= s"inp$k AS MATERIALIZED (SELECT w, " +
        "CAST(COUNT(*) AS BIGINT) AS n_pieces FROM (" +
        (1 to maxLen).map(t => s"SELECT w FROM iwk${k}_$t")
          .mkString(" UNION ALL ") + ") u GROUP BY 1),\n"
      sb ++= s"""iseg$k AS MATERIALIZED (SELECT f.w, f.dp, n.n_pieces
        FROM ifin$k f JOIN inp$k n ON f.w = n.w),\n"""
      sb ++= s"""cen$k AS (SELECT CAST($k AS BIGINT) AS increment,
          lang, CAST(SUM(occ) AS BIGINT) AS total_words,
          CAST(SUM(CASE WHEN s.w IS NULL THEN occ ELSE 0 END)
            AS BIGINT) AS oov_words,
          CAST(SUM(CASE WHEN s.w IS NULL THEN 0
            ELSE occ * n_pieces END) AS BIGINT) AS total_pieces,
          SUM(CASE WHEN s.w IS NULL THEN NULL
            ELSE CAST(dp * occ AS DECIMAL(38,12)) END) AS nll_sum
        FROM lw$k l LEFT JOIN iseg$k s ON l.w = s.w GROUP BY 2),\n"""
      sb.toString
    }
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       ${incChain(1, "doc_id % 4 = 1")}
       ${incChain(2, "doc_id % 4 = 3")}
       per AS (SELECT * FROM cen1 UNION ALL SELECT * FROM cen2),
       fold AS (SELECT CAST(0 AS BIGINT) AS increment, lang,
           CAST(SUM(total_words) AS BIGINT) AS total_words,
           CAST(SUM(oov_words) AS BIGINT) AS oov_words,
           CAST(SUM(total_pieces) AS BIGINT) AS total_pieces,
           SUM(nll_sum) AS nll_sum
         FROM per GROUP BY 2),
       allr AS (SELECT * FROM per UNION ALL SELECT * FROM fold)
       SELECT increment, lang, total_words, oov_words, total_pieces,
         CASE WHEN total_words > oov_words THEN
           ROUND(CAST(total_pieces AS DOUBLE)
             / CAST(total_words - oov_words AS DOUBLE), 6)
         END AS pieces_per_word,
         CASE WHEN total_words > oov_words THEN
           ROUND(CAST(nll_sum AS DOUBLE)
             / CAST(total_words - oov_words AS DOUBLE), 6)
         END AS nll_per_word
       FROM allr ORDER BY increment, lang"""
  }

  /** Generated oracle for `sim_beam_search`: the greedy-search oracle's
    * label-blocked k-NN/entry/truth CTEs, then per beam width an
    * unrolled frontier chain (candidates = beam ∪ neighbors minus the
    * query, scored, top-b per label) and the explored-set recall fold —
    * generated so the hop bodies cannot drift from the Spark loop. */
  private[graft] def beamSearchOracleSql(kEdges: Int = 3, hops: Int = 4,
      beams: Seq[Int] = Seq(1, 2, 4), kTruth: Int = 10): String = {
    val sb = new StringBuilder
    sb ++= s"""WITH directed AS (SELECT a.label, a.vec_id AS v1,
           b.vec_id AS v2,
           list_cosine_similarity(a.embedding, b.embedding) AS sim
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id <> b.vec_id),
       knn AS (SELECT label, v1, v2 FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
             ORDER BY sim DESC, v2) AS rk FROM directed) r
         WHERE rk <= $kEdges),
       sym AS MATERIALIZED (SELECT DISTINCT label, v1 AS node,
           v2 AS nxt FROM (
           SELECT label, v1, v2 FROM knn
           UNION ALL SELECT label, v2, v1 FROM knn) u),
       q AS (SELECT label, MIN(vec_id) AS qid, MAX(vec_id) AS entry
         FROM embeddings GROUP BY 1),
       qe AS MATERIALIZED (SELECT q.label, q.qid, q.entry,
           e.embedding AS q_emb
         FROM q JOIN embeddings e ON e.vec_id = q.qid),
       truth AS MATERIALIZED (SELECT label, cid, bsim, rk FROM (
           SELECT qe.label, e.vec_id AS cid,
             list_cosine_similarity(e.embedding, qe.q_emb) AS bsim,
             ROW_NUMBER() OVER (PARTITION BY qe.label ORDER BY
               list_cosine_similarity(e.embedding, qe.q_emb) DESC,
               e.vec_id) AS rk
           FROM embeddings e JOIN qe ON qe.label = e.label
           WHERE e.vec_id <> qe.qid) z WHERE rk <= $kTruth),
       tn AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_truth
         FROM truth GROUP BY 1),
       nn AS (SELECT label, bsim AS nn_sim FROM truth WHERE rk = 1),
       s0 AS MATERIALIZED (SELECT qe.label, qe.entry AS node,
           list_cosine_similarity(e.embedding, qe.q_emb) AS sim
         FROM qe JOIN embeddings e ON e.vec_id = qe.entry),
"""
    for (b <- beams) {
      sb ++= s"sb${b}_0 AS (SELECT label, node, sim FROM s0),\n"
      for (h <- 1 to hops) {
        sb ++= s"""cb${b}_$h AS (SELECT DISTINCT c.label, c.node FROM (
            SELECT label, node FROM sb${b}_${h - 1}
            UNION ALL
            SELECT s.label, y.nxt AS node FROM sb${b}_${h - 1} s
              JOIN sym y ON y.label = s.label AND y.node = s.node) c
          JOIN qe ON qe.label = c.label WHERE c.node <> qe.qid),
         scb${b}_$h AS MATERIALIZED (SELECT c.label, c.node,
             list_cosine_similarity(e.embedding, qe.q_emb) AS sim
           FROM cb${b}_$h c JOIN embeddings e ON e.vec_id = c.node
           JOIN qe ON qe.label = c.label),
         sb${b}_$h AS MATERIALIZED (SELECT label, node, sim FROM (
             SELECT label, node, sim, ROW_NUMBER() OVER (
               PARTITION BY label ORDER BY sim DESC, node) AS rk
             FROM scb${b}_$h) z WHERE rk <= $b),
"""
      }
      val exUnion = (s"SELECT label, node FROM sb${b}_0" +:
        (1 to hops).map(h => s"SELECT label, node FROM scb${b}_$h"))
        .mkString(" UNION ALL ")
      sb ++= s"""exb$b AS MATERIALIZED (SELECT DISTINCT label, node
           FROM ($exUnion) u),
         nxb$b AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_explored
           FROM exb$b GROUP BY 1),
         htb$b AS (SELECT e.label, CAST(COUNT(*) AS BIGINT) AS n_hit,
             CAST(MAX(CASE WHEN t.rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS got_nn
           FROM exb$b e JOIN truth t ON t.label = e.label
             AND t.cid = e.node GROUP BY 1),
         bsb$b AS (SELECT label, MAX(sim) AS best_sim
           FROM sb${b}_$hops GROUP BY 1),
         finb$b AS (SELECT CAST($b AS BIGINT) AS beam, n.label,
             n.n_explored, tn.n_truth,
             COALESCE(h.n_hit, 0) AS n_hit,
             ROUND(CAST(COALESCE(h.n_hit, 0) AS DOUBLE)
               / CAST(tn.n_truth AS DOUBLE), 4) AS recall,
             ROUND(CAST(b2.best_sim AS DOUBLE), 4) AS best_sim,
             ROUND(CAST(nn.nn_sim AS DOUBLE), 4) AS nn_sim,
             COALESCE(h.got_nn, 0) = 1 AS reached_nn
           FROM nxb$b n JOIN bsb$b b2 USING (label)
           LEFT JOIN htb$b h USING (label)
           JOIN tn USING (label) JOIN nn USING (label)),
"""
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb ++= "\n" + beams.map(b => s"SELECT * FROM finb$b")
      .mkString(" UNION ALL ")
    sb ++= " ORDER BY beam, label"
    sb.toString
  }

  /** Corpus-wide eval chain shared by the tokenizer-eval oracles
    * (`text_tokenizer_fertility`, `text_wordpiece_greedy`): the
    * (lang, word, occ) eval grain, its distinct types + span lattice
    * joined to the frozen `cost1`, and the unrolled Viterbi DP +
    * backpointer walk down to per-word piece counts (`enp`) and final
    * costs (`efin`). Ends with a trailing comma. */
  private def evalViterbiChainSql(maxLen: Int, maxPiece: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""ew AS MATERIALIZED (SELECT lang, w,
        CAST(COUNT(*) AS BIGINT) AS occ FROM (
        SELECT lang, lower(t) AS w FROM (
          SELECT lang, unnest(string_split(text, ' ')) AS t
          FROM documents) z
        WHERE regexp_matches(lower(t), '^[a-z]+$$')
          AND length(t) <= $maxLen) zz
      GROUP BY 1, 2),\n"""
    sb ++= "ety AS MATERIALIZED (SELECT w, length(w) AS len " +
      "FROM (SELECT DISTINCT w FROM ew) d),\n"
    sb ++= s"""esp AS MATERIALIZED (SELECT w, st - 1 AS j,
        st + pl - 1 AS i,
        substr(w, CAST(st AS INT), CAST(pl AS INT)) AS piece
      FROM ety, range(1, ${maxLen + 1}) s(st),
        range(1, ${maxPiece + 1}) p(pl)
      WHERE st + pl - 1 <= len),\n"""
    sb ++= "evsi AS MATERIALIZED (SELECT s.w, s.j, s.i, cost " +
      "FROM esp s JOIN cost1 USING (piece)),\n"
    sb ++= "edp_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS DECIMAL(28,12)) AS dp, -1 AS bp FROM ety),\n"
    for (i <- 1 to maxLen) {
      val lo = math.max(0, i - maxPiece)
      val prevUnion = (lo until i)
        .map(j => s"SELECT * FROM edp_$j").mkString(" UNION ALL ")
      sb ++= s"""edp_$i AS MATERIALIZED (SELECT w, $i AS pos,
          CAST(dpn AS DECIMAL(28,12)) AS dp, bp FROM (
          SELECT vs.w, d.dp + vs.cost AS dpn, vs.j AS bp,
            ROW_NUMBER() OVER (PARTITION BY vs.w
              ORDER BY d.dp + vs.cost ASC, vs.j ASC) AS rn
          FROM evsi vs JOIN ($prevUnion) d
            ON vs.w = d.w AND vs.j = d.pos
          WHERE vs.i = $i) z WHERE rn = 1),\n"""
    }
    sb ++= "edpall AS MATERIALIZED (" + (0 to maxLen)
      .map(i => s"SELECT * FROM edp_$i").mkString(" UNION ALL ") +
      "),\n"
    sb ++= """efin AS MATERIALIZED (SELECT d.w, t.len, d.dp
      FROM edpall d
      JOIN ety t ON d.w = t.w AND d.pos = t.len),
"""
    sb ++= "ewk_0 AS MATERIALIZED (SELECT w, len AS pos FROM efin),\n"
    for (t <- 1 to maxLen) {
      val prev = if (t == 1) "ewk_0"
        else s"(SELECT w, bp AS pos FROM ewk_${t - 1})"
      sb ++= s"""ewk_$t AS MATERIALIZED (SELECT k.w, d.bp
        FROM $prev k
        JOIN edpall d ON k.w = d.w AND k.pos = d.pos
        WHERE k.pos > 0),\n"""
    }
    sb ++= "enp AS MATERIALIZED (SELECT w, " +
      "CAST(COUNT(*) AS BIGINT) AS n_pieces FROM (" +
      (1 to maxLen).map(t => s"SELECT w FROM ewk_$t")
        .mkString(" UNION ALL ") + ") u GROUP BY 1),\n"
    sb.toString
  }

  /** Generated oracle for `text_tokenizer_fertility`: the BPE
    * trainer's CTE chain ([[bpeMergeCtes]], its word-census CTE named
    * `bwords` via the builder's parameter — no post-hoc string surgery
    * — to coexist with the unigram trainer prefix's `words`) + the
    * unigram frozen-cost prefix ([[unigramTrainPrefixSql]]) + ONE eval
    * Viterbi chain over the corpus-wide eval types + the two per-arm
    * censuses. */
  private[graft] def fertilityOracleSql(rounds: Int = 6,
      maxLen: Int = 10, maxPiece: Int = 4, v0: Int = 300,
      vKeep: Int = 200): String = {
    val bpeCtes = bpeMergeCtes(rounds, wordsCte = "bwords")
    val sb = new StringBuilder
    sb ++= evalViterbiChainSql(maxLen, maxPiece)
    sb ++= s"""bnp AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_pieces
      FROM syms_$rounds GROUP BY w),\n"""
    def cen(arm: String, npCte: String): String =
      s"""(SELECT '$arm' AS arm, lang,
          CAST(SUM(occ) AS BIGINT) AS total_words,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0 ELSE occ END)
            AS BIGINT) AS covered_words,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0
            ELSE occ * n.n_pieces END) AS BIGINT) AS total_pieces,
          CAST(SUM(CASE WHEN n.w IS NULL THEN 0
            ELSE occ * length(l.w) END) AS BIGINT) AS total_chars
        FROM ew l LEFT JOIN $npCte n ON l.w = n.w GROUP BY 2)"""
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       $bpeCtes,
       ${sb.toString}
       cens AS (SELECT * FROM ${cen("bpe", "bnp")}
         UNION ALL SELECT * FROM ${cen("unigram", "enp")})
       SELECT arm, lang, total_words, covered_words, total_pieces,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(total_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS pieces_per_word,
         CASE WHEN total_pieces > 0 THEN
           ROUND(CAST(total_chars AS DOUBLE)
             / CAST(total_pieces AS DOUBLE), 6) END AS chars_per_piece
       FROM cens ORDER BY arm, lang"""
  }

  /** Generated oracle for `text_wordpiece_greedy`: the unigram
    * frozen-cost prefix + the shared eval Viterbi chain
    * ([[evalViterbiChainSql]]) + an unrolled greedy longest-match walk
    * (per step: argmax span end per active word, piece cost joined
    * back) + the per-language two-arm census. */
  private[graft] def wordpieceOracleSql(maxLen: Int = 10,
      maxPiece: Int = 4, v0: Int = 300, vKeep: Int = 200): String = {
    val sb = new StringBuilder
    sb ++= evalViterbiChainSql(maxLen, maxPiece)
    sb ++= "g_0 AS MATERIALIZED (SELECT w, 0 AS pos, " +
      "CAST(0 AS BIGINT) AS np, CAST(0 AS DECIMAL(28,12)) AS cost " +
      "FROM ety),\n"
    for (i <- 1 to maxLen) {
      sb ++= s"""ga_$i AS (SELECT z.w, z.pos, z.np, z.cost, z.ni,
          v2.cost AS pc FROM (
          SELECT s.w, s.pos, s.np, s.cost, MAX(v.i) AS ni
          FROM g_${i - 1} s JOIN evsi v ON v.w = s.w AND v.j = s.pos
          GROUP BY 1, 2, 3, 4) z
        JOIN evsi v2 ON v2.w = z.w AND v2.j = z.pos AND v2.i = z.ni),
       g_$i AS MATERIALIZED (SELECT w, ni AS pos,
          CAST(np + 1 AS BIGINT) AS np,
          CAST(cost + pc AS DECIMAL(28,12)) AS cost FROM ga_$i),
"""
    }
    val finUnion = (1 to maxLen).map(i =>
      s"""SELECT g.w, g.np, g.cost FROM g_$i g
          JOIN ety t ON g.w = t.w AND g.pos = t.len""")
      .mkString(" UNION ALL ")
    sb ++= s"gfin AS MATERIALIZED ($finUnion),\n"
    sb ++= """cens AS (SELECT lang,
        CAST(SUM(occ) AS BIGINT) AS total_words,
        CAST(SUM(CASE WHEN g.w IS NULL THEN 0 ELSE occ END)
          AS BIGINT) AS covered_words,
        CAST(SUM(CASE WHEN g.w IS NULL THEN 0 ELSE occ * g.np END)
          AS BIGINT) AS greedy_pieces,
        CAST(SUM(CASE WHEN n.w IS NULL THEN 0
          ELSE occ * n.n_pieces END) AS BIGINT) AS viterbi_pieces,
        CAST(SUM(CASE WHEN g.w IS NOT NULL AND g.cost > f.dp
          THEN occ ELSE 0 END) AS BIGINT) AS suboptimal_words,
        SUM(CASE WHEN g.w IS NOT NULL
          THEN CAST((g.cost - f.dp) * occ AS DECIMAL(38,12)) END)
          AS excess_sum
      FROM ew l LEFT JOIN gfin g ON l.w = g.w
      LEFT JOIN enp n ON l.w = n.w
      LEFT JOIN efin f ON l.w = f.w
      GROUP BY 1)
"""
    s"""WITH ${unigramTrainPrefixSql(maxLen, maxPiece, v0, vKeep)}
       ${sb.toString}
       SELECT lang, total_words, covered_words, greedy_pieces,
         viterbi_pieces, suboptimal_words,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(greedy_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS greedy_ppw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(viterbi_pieces AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS viterbi_ppw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(excess_sum AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END AS excess_nll_pw,
         CASE WHEN covered_words > 0 THEN
           ROUND(CAST(suboptimal_words AS DOUBLE)
             / CAST(covered_words AS DOUBLE), 6) END
           AS suboptimal_share
       FROM cens ORDER BY lang"""
  }

  private[graft] def incrementalMinhashOracleSql(steps: Seq[String]): String = {
    val base =
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS MATERIALIZED (SELECT doc_id, unnest(list_distinct(
                  CASE WHEN len(w) >= 5
                       THEN [array_to_string(w[i:i+4], ' ') for i in range(1, len(w)-3)]
                       ELSE []::VARCHAR[] END)) AS shingle
                FROM words),
         src AS MATERIALIZED (SELECT doc_id, CAST(substr(source, 4, 8) AS INT) AS sn
                 FROM documents),
         mh AS (SELECT doc_id, i, MIN(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
                FROM sh CROSS JOIN range(9) t(i) GROUP BY doc_id, i),
         bands AS MATERIALIZED (SELECT doc_id, i // 3 AS band,
                     md5(string_agg(h, ',' ORDER BY i)) AS bucket
                   FROM mh GROUP BY doc_id, i // 3),
         sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)"""
    val blocks = steps.zipWithIndex.map { case (pred, ix) =>
      val k = ix + 1
      s""",
         cand_$k AS (SELECT DISTINCT x.doc_id AS bd, y.doc_id AS cd
                  FROM bands x JOIN src sx ON x.doc_id = sx.doc_id
                       JOIN bands y ON x.band = y.band AND x.bucket = y.bucket
                       JOIN src sy ON y.doc_id = sy.doc_id
                  WHERE $pred),
         inter_$k AS (SELECT c.bd, c.cd, COUNT(*) AS i
                   FROM cand_$k c JOIN sh a ON c.bd = a.doc_id
                               JOIN sh b ON c.cd = b.doc_id AND a.shingle = b.shingle
                   GROUP BY 1, 2),
         j_$k AS (SELECT x.bd, x.cd,
                 CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) AS jac
               FROM inter_$k x JOIN sizes s1 ON x.bd = s1.doc_id
                            JOIN sizes s2 ON x.cd = s2.doc_id
               WHERE CAST(x.i AS DOUBLE) / (s1.n + s2.n - x.i) >= 0.5),
         sel_$k AS (SELECT bd AS doc_id, cd AS match_doc, ROUND(jac, 3) AS jaccard
           FROM (SELECT bd, cd, jac, ROW_NUMBER() OVER (PARTITION BY bd
                   ORDER BY jac DESC, cd) AS rn FROM j_$k) t_$k
           WHERE rn = 1)"""
    }.mkString
    val union = steps.indices.map(ix => s"SELECT * FROM sel_${ix + 1}")
      .mkString("\n UNION ALL\n")
    s"$base$blocks\n SELECT * FROM (\n$union\n ) u ORDER BY doc_id"
  }

  /** DuckDB replay of [[graft.operators.Similarity.kcenterCoreset]]:
    * greedy farthest-point traversal unrolled into k−1 chained CTE
    * blocks — p_i picks the point with the max running-min squared
    * distance (ties to the smallest vec_id), d_i folds the new center
    * into the running min via the exact-BIGINT n1 + n2 − 2·dot
    * expansion over micro-unit coordinates. Generated so k stays one
    * knob. */
  /** One synchronous Louvain gain-move round as a CTE block (prefix
    * `p`, over `symCte`/`commCte`, reading the shared `m2x` total):
    * the DuckDB replay of [[graft.operators.Graph]]'s louvainMove —
    * generated once, instantiated per level, so the two levels of
    * `graph_louvain_full` cannot drift apart. */
  private def louvainMoveSql(p: String, symCte: String,
      commCte: String): String =
    s"""${p}degn AS MATERIALIZED (SELECT node, SUM(w) AS ki
         FROM $symCte GROUP BY 1),
       ${p}degc AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS degw
         FROM ${p}degn d JOIN $commCte c USING (node) GROUP BY 1),
       ${p}kic AS MATERIALIZED (SELECT s.node, cb.community AS cand,
           SUM(s.w) AS kc
         FROM $symCte s JOIN $commCte cb ON s.nbr = cb.node
         WHERE s.nbr <> s.node GROUP BY 1, 2),
       ${p}base AS MATERIALIZED (SELECT c.node, c.community AS cur,
           d.ki, COALESCE(ka.kc, 0) AS kia, dca.degw AS dega
         FROM $commCte c JOIN ${p}degn d USING (node)
         LEFT JOIN ${p}kic ka ON ka.node = c.node
           AND ka.cand = c.community
         JOIN ${p}degc dca ON dca.community = c.community),
       ${p}gains AS MATERIALIZED (SELECT b.node, b.cur, k.cand,
           2.0 * (CAST(k.kc AS DOUBLE) - CAST(b.kia AS DOUBLE))
             / CAST(tw AS DOUBLE)
           - 2.0 * CAST(b.ki AS DOUBLE) * (CAST(b.ki AS DOUBLE)
               + CAST(dcb.degw AS DOUBLE) - CAST(b.dega AS DOUBLE))
             / (CAST(tw AS DOUBLE) * CAST(tw AS DOUBLE)) AS gain
         FROM ${p}base b JOIN ${p}kic k ON k.node = b.node
           AND k.cand <> b.cur
         JOIN ${p}degc dcb ON dcb.community = k.cand
         CROSS JOIN m2x),
       ${p}best AS MATERIALIZED (SELECT node, cand, gain FROM (
           SELECT node, cand, gain, ROW_NUMBER() OVER (
             PARTITION BY node ORDER BY gain DESC, cand) AS rn
           FROM ${p}gains) g WHERE rn = 1),
       ${p}comm2 AS MATERIALIZED (SELECT c.node,
           CASE WHEN bm.gain > 0 THEN bm.cand
                ELSE c.community END AS community,
           c.community AS cur
         FROM $commCte c LEFT JOIN ${p}best bm ON bm.node = c.node)"""

  /** Modularity Q of partition `commCte` over `symCte` as a 1-row CTE
    * `${p}q` (DECIMAL(28,12)-quantized per-community contributions,
    * summed) — the replay of louvainQCensus folded to its Q sum. */
  private def louvainQSql(p: String, symCte: String, commCte: String,
      degnCte: String): String =
    s"""${p}internal AS MATERIALIZED (SELECT ca.community, SUM(s.w) AS in_w
         FROM $symCte s JOIN $commCte ca ON s.node = ca.node
         JOIN $commCte cb ON s.nbr = cb.node
         WHERE ca.community = cb.community GROUP BY 1),
       ${p}degcq AS MATERIALIZED (SELECT c.community, SUM(d.ki) AS deg_w
         FROM $degnCte d JOIN $commCte c USING (node) GROUP BY 1),
       ${p}conts AS MATERIALIZED (SELECT dc.community,
           CAST(CAST(COALESCE(i.in_w, 0) AS DOUBLE) / CAST(tw AS DOUBLE)
             - (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
               * (CAST(dc.deg_w AS DOUBLE) / CAST(tw AS DOUBLE))
             AS DECIMAL(28,12)) AS contrib
         FROM ${p}degcq dc LEFT JOIN ${p}internal i USING (community)
         CROSS JOIN m2x),
       ${p}q AS MATERIALIZED (SELECT SUM(contrib) AS q FROM ${p}conts)"""

  /** Generated oracle for `graph_louvain_full`: the graph_louvain
    * prelude (edges/sym/labelProp/comm), then per level ONE
    * instantiation of [[louvainMoveSql]] + two [[louvainQSql]] blocks
    * + a decimal-compare acceptance CTE; level 2 runs on the coarse
    * super-graph built from level 1's ACCEPTED partition. */
  private[graft] def louvainFullOracleSql: String = {
    def acceptSql(p: String, movedCte: String): String =
      s"""${p}acc AS MATERIALIZED (SELECT c.node,
           CASE WHEN (SELECT q FROM ${p}mq) >= (SELECT q FROM ${p}sq)
             THEN c.community ELSE c.cur END AS community,
           c.cur
         FROM $movedCte c)"""
    def rowSql(lvl: Int, p: String, symCte: String,
        commCte: String): String =
      s"""SELECT CAST($lvl AS BIGINT) AS level,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM $commCte) AS n_nodes,
           (SELECT CAST(COUNT(DISTINCT community) AS BIGINT)
             FROM $commCte) AS n_communities_start,
           (SELECT CAST(COALESCE(SUM(CASE WHEN community <> cur
               THEN 1 ELSE 0 END), 0) AS BIGINT) FROM ${p}acc)
             AS n_moved,
           (SELECT CAST(COUNT(DISTINCT community) AS BIGINT)
             FROM ${p}acc) AS n_communities_end,
           (SELECT CAST(COALESCE(SUM(w), 0) AS BIGINT) FROM $symCte
             WHERE node = nbr) AS self_loop_w,
           ROUND((SELECT CAST(q AS DOUBLE) FROM ${p}sq), 6) AS q_start,
           ROUND((SELECT CAST(q AS DOUBLE) FROM ${p}mq), 6) AS q_move,
           ROUND(CAST(GREATEST((SELECT q FROM ${p}sq),
             (SELECT q FROM ${p}mq)) AS DOUBLE), 6) AS q_end"""
    s"""WITH edges AS MATERIALIZED (
         SELECT s_nationkey AS src, c_nationkey AS dst,
           SUM(CAST(ROUND(l_extendedprice * 100) AS DECIMAL(38,0))) AS w
         FROM lineitem, orders, customer, supplier
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey
         GROUP BY 1, 2),
       sym AS MATERIALIZED (SELECT node, nbr, SUM(w) AS w FROM (
           SELECT src AS node, dst AS nbr, w FROM edges
           UNION ALL SELECT dst, src, w FROM edges) t
         GROUP BY 1, 2),
       tot AS MATERIALIZED (SELECT SUM(w) AS tw, COUNT(*) AS ne FROM sym),
       nbrs AS MATERIALIZED (SELECT node, nbr, w FROM sym, tot
         WHERE CAST(w AS HUGEINT) * CAST(ne AS HUGEINT)
           >= CAST(tw AS HUGEINT)),
       l0 AS (SELECT DISTINCT node, node AS lbl FROM nbrs),
       a1 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
              FROM nbrs n JOIN l0 l ON n.nbr = l.node GROUP BY 1, 2),
       lp1 AS (SELECT node, lbl FROM (
           SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
             ORDER BY sw DESC, lbl) AS rn FROM a1) WHERE rn = 1),
       a2 AS (SELECT n.node, l.lbl, SUM(n.w) AS sw
              FROM nbrs n JOIN lp1 l ON n.nbr = l.node GROUP BY 1, 2),
       lp2 AS (SELECT node, lbl FROM (
           SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
             ORDER BY sw DESC, lbl) AS rn FROM a2) WHERE rn = 1),
       nodes AS (SELECT DISTINCT node FROM sym),
       comm AS MATERIALIZED (SELECT n.node,
           COALESCE(l2.lbl, n.node) AS community
         FROM nodes n LEFT JOIN lp2 l2 ON n.node = l2.node),
       m2x AS MATERIALIZED (SELECT SUM(w) AS tw FROM sym),
       ${louvainMoveSql("l1", "sym", "comm")},
       ${louvainQSql("l1s", "sym", "comm", "l1degn")},
       ${louvainQSql("l1m", "sym", "l1comm2", "l1degn")},
       ${acceptSql("l1", "l1comm2")},
       sym2 AS MATERIALIZED (SELECT ca.community AS node,
           cb.community AS nbr, SUM(s.w) AS w
         FROM sym s JOIN l1acc ca ON s.node = ca.node
         JOIN l1acc cb ON s.nbr = cb.node GROUP BY 1, 2),
       comm20 AS MATERIALIZED (SELECT DISTINCT node,
           node AS community FROM sym2),
       ${louvainMoveSql("l2", "sym2", "comm20")},
       ${louvainQSql("l2s", "sym2", "comm20", "l2degn")},
       ${louvainQSql("l2m", "sym2", "l2comm2", "l2degn")},
       ${acceptSql("l2", "l2comm2")}
       SELECT * FROM (
       ${rowSql(1, "l1", "sym", "comm")}
       UNION ALL
       ${rowSql(2, "l2", "sym2", "comm20")}) r ORDER BY level"""
  }

  /** Generated oracle for `sim_pq_train`: the exact integer-Lloyd PQ
    * pass of [[graft.operators.Similarity.pqTrainDistortion]] — ONE
    * assignment CTE block instantiated for the seed and the trained
    * codebook, the round-half-up integer mean via the same positive
    * shift, and the per-subspace distortion census. */
  private[graft] def pqTrainOracleSql(m: Int = 16, sub: Int = 4,
      k: Int = 64, off: Long = 16000000L): String = {
    def assignSql(p: String, cb: String): String =
      s"""${p}pair AS (SELECT l.vec_id, l.m, c.cid,
           SUM((l.v - c.w) * (l.v - c.w)) AS dist
         FROM lanes l JOIN $cb c ON l.m = c.m AND l.d = c.d
         GROUP BY 1, 2, 3),
       ${p}asg AS MATERIALIZED (SELECT vec_id, m, cid, dist FROM (
           SELECT vec_id, m, cid, dist, ROW_NUMBER() OVER (
             PARTITION BY vec_id, m ORDER BY dist, cid) AS rn
           FROM ${p}pair) z WHERE rn = 1),
       ${p}dm AS MATERIALIZED (SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(dist AS DECIMAL(38,0))) AS sd
         FROM ${p}asg GROUP BY 1)"""
    s"""WITH qe AS MATERIALIZED (SELECT vec_id, list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
         FROM embeddings),
       lanes AS MATERIALIZED (SELECT vec_id,
           CAST((i - 1) // $sub AS INT) AS m,
           CAST((i - 1) % $sub AS INT) AS d, v
         FROM (SELECT vec_id, unnest(qe) AS v,
             generate_subscripts(qe, 1) AS i FROM qe) z),
       sd AS MATERIALIZED (SELECT vec_id,
           CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INT) - 1 AS cid
         FROM (SELECT vec_id FROM embeddings ORDER BY vec_id
               LIMIT $k) s),
       cb0 AS MATERIALIZED (SELECT l.m, s.cid, l.d, l.v AS w
         FROM lanes l JOIN sd s USING (vec_id)),
       ${assignSql("a0", "cb0")},
       cb1 AS MATERIALIZED (SELECT a.m, a.cid, l.d,
           CAST((2 * (SUM(l.v) + COUNT(*) * $off) + COUNT(*))
             // (2 * COUNT(*)) AS BIGINT) - $off AS w
         FROM a0asg a JOIN lanes l
           ON a.vec_id = l.vec_id AND a.m = l.m
         GROUP BY 1, 2, l.d),
       ${assignSql("a1", "cb1")},
       live AS (SELECT m, CAST(COUNT(DISTINCT cid) AS BIGINT)
           AS n_live_codewords FROM cb1 GROUP BY 1)
       SELECT CAST(d0.m AS BIGINT) AS subspace, d0.n AS n_vectors,
         CAST($k AS BIGINT) AS k_seed, live.n_live_codewords,
         CAST(CAST(d0.sd AS HUGEINT) // d0.n AS BIGINT)
           AS mean_dist_seed,
         CAST(CAST(d1.sd AS HUGEINT) // d0.n AS BIGINT)
           AS mean_dist_trained,
         ROUND(1.0 - CAST(d1.sd AS DOUBLE) / CAST(d0.sd AS DOUBLE), 6)
           AS distortion_drop
       FROM a0dm d0 JOIN a1dm d1 ON d0.m = d1.m
       JOIN live ON live.m = d0.m
       ORDER BY subspace"""
  }

  /** The retrieval panel's per-(arm, query) evaluation as a CTE
    * chain ending in `fin(arm, q_id, n_listed, n_relevant, mrr,
    * ndcg)` — generated once, shared by the `text_retrieval_ndcg_multi`
    * rollup and the `text_retrieval_panel_ci` bootstrap tail. */
  private[graft] def retrievalPerQuerySql(nQ: Int): String =
    s"""tok AS (SELECT doc_id,
               unnest(string_split(text, ' ')) AS token FROM documents),
           tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok WHERE token <> '' GROUP BY 1, 2),
           lens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
             FROM tf GROUP BY 1),
           nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len FROM lens),
           df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
             FROM tf GROUP BY 1),
           qp AS (SELECT vec_id AS q_id FROM embeddings
             ORDER BY vec_id LIMIT $nQ),
           qe AS (SELECT q_id, embedding AS q_emb FROM qp
             JOIN embeddings e ON e.vec_id = qp.q_id),
           qt AS (SELECT q_id, token, df FROM (
               SELECT qp.q_id, tf.token, df.df, ROW_NUMBER()
                 OVER (PARTITION BY qp.q_id
                   ORDER BY df.df ASC, tf.token) AS rk
               FROM qp JOIN tf ON tf.doc_id = qp.q_id
               JOIN df ON df.token = tf.token) z WHERE rk <= 8),
           sc AS (SELECT qt.q_id, tf.doc_id,
               CAST(ln(1.0 + (CAST(n AS DOUBLE) - qt.df + 0.5)
                   / (CAST(qt.df AS DOUBLE) + 0.5))
                 * tf * 2.2
                 / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                   + 0.75 * CAST(len AS DOUBLE) * n
                     / CAST(total_len AS DOUBLE)))
                 AS DECIMAL(28,12)) AS term_score
             FROM tf JOIN qt USING (token) JOIN lens USING (doc_id),
               nd),
           lex AS (SELECT q_id, doc_id, SUM(term_score) AS bm25
             FROM sc GROUP BY 1, 2),
           lexev AS (SELECT q_id, doc_id, CAST(r AS BIGINT) AS r
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY bm25 DESC, doc_id) AS r
               FROM lex WHERE doc_id <> q_id) zl WHERE r <= 100),
           sims AS (SELECT qe.q_id, e.vec_id AS doc_id,
               list_cosine_similarity(e.embedding, qe.q_emb) AS sim
             FROM embeddings e, qe WHERE e.vec_id <> qe.q_id),
           dims AS (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) AS d FROM embeddings),
           plane AS (SELECT j, d,
               CASE WHEN (strpos('0123456789abcdef',
                 substr(md5(CAST(j AS VARCHAR) || ':'
                   || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1
                 THEN 1 ELSE -1 END AS s
             FROM range(32) a(j), range(1, 65) b(d)),
           proj AS (SELECT vec_id, j,
               SUM(CASE WHEN s = 1
                 THEN CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15))
                 ELSE -CAST(CAST(val AS DOUBLE) AS DECIMAL(38,15)) END)
                 AS p
             FROM dims JOIN plane USING (d) GROUP BY 1, 2),
           bands AS (SELECT vec_id, CAST(j // 8 AS INT) AS band,
               string_agg(CASE WHEN p > 0 THEN '1' ELSE '0' END, ''
                 ORDER BY j) AS bucket
             FROM proj GROUP BY vec_id, j // 8),
           abands AS (SELECT q_id, band, bucket FROM bands
             JOIN qp ON vec_id = q_id),
           cand AS (SELECT DISTINCT a.q_id, b.vec_id AS doc_id
             FROM bands b JOIN abands a USING (band, bucket)),
           semev AS (SELECT q_id, doc_id, CAST(r AS BIGINT) AS r
             FROM (SELECT s.q_id, s.doc_id, ROW_NUMBER()
                 OVER (PARTITION BY s.q_id
                   ORDER BY sim DESC, s.doc_id) AS r
               FROM cand c JOIN sims s
                 ON c.q_id = s.q_id AND c.doc_id = s.doc_id) z
             WHERE r <= 100),
           fused AS (SELECT COALESCE(l.q_id, s.q_id) AS q_id,
               COALESCE(l.doc_id, s.doc_id) AS doc_id,
               COALESCE(1.0 / (60.0 + l.r), 0.0)
                 + COALESCE(1.0 / (60.0 + s.r), 0.0) AS rrf
             FROM lexev l FULL OUTER JOIN semev s
               ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
           hybev AS (SELECT q_id, doc_id, CAST(r0 AS BIGINT) AS pos
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY rrf DESC, doc_id) AS r0 FROM fused) z
             WHERE r0 <= 10),
           lists AS (
             SELECT 'a_lexical' AS arm, q_id, doc_id, r AS pos
               FROM lexev WHERE r <= 10
             UNION ALL SELECT 'b_semantic_lsh', q_id, doc_id, r
               FROM semev WHERE r <= 10
             UNION ALL SELECT 'c_hybrid_rrf', q_id, doc_id, pos
               FROM hybev),
           cdocs AS (SELECT s.q_id AS cq, s.doc_id AS cd, s.sim AS cs
             FROM (SELECT DISTINCT q_id, doc_id FROM lists) ld
             JOIN sims s USING (q_id, doc_id)),
           gains0 AS (SELECT cq, cd,
               CAST(SUM(CASE WHEN sim > cs THEN 1 ELSE 0 END)
                 AS BIGINT) + 1 AS lo,
               CAST(COUNT(*) AS BIGINT) AS hi
             FROM sims JOIN cdocs ON sims.q_id = cq AND sim >= cs
             GROUP BY 1, 2),
           gains AS (SELECT cq AS q_id, cd AS doc_id,
               CASE WHEN lo > 10 THEN 0.0
                 ELSE CAST((LEAST(hi, 10) - lo + 1)
                     * (22 - lo - LEAST(hi, 10)) AS DOUBLE)
                   / CAST(2 * (hi - lo + 1) AS DOUBLE) END AS gain
             FROM gains0),
           truth AS (SELECT q_id, doc_id, CAST(1 AS BIGINT) AS rel
             FROM (SELECT q_id, doc_id, ROW_NUMBER()
                 OVER (PARTITION BY q_id
                   ORDER BY sim DESC, doc_id) AS rn FROM sims) z
             WHERE rn <= 10),
           idcg AS (SELECT SUM(CAST(CAST(11 - r AS DOUBLE)
               / log2(CAST(r + 1 AS DOUBLE)) AS DECIMAL(28,12)))
               AS idcg
             FROM range(1, 11) t(r)),
           per AS (SELECT arm, q_id,
               CAST(COUNT(*) AS BIGINT) AS n_listed,
               CAST(SUM(COALESCE(rel, 0)) AS BIGINT) AS n_relevant,
               MIN(CASE WHEN rel = 1 THEN pos END) AS first_rel,
               SUM(CAST(COALESCE(gain, 0.0)
                 / log2(CAST(pos + 1 AS DOUBLE)) AS DECIMAL(28,12)))
                 AS dcg
             FROM lists LEFT JOIN gains USING (q_id, doc_id)
             LEFT JOIN truth USING (q_id, doc_id) GROUP BY 1, 2),
           perq AS (SELECT arm, q_id, n_listed, n_relevant,
               CAST(COALESCE(CAST(1.0 AS DOUBLE) / first_rel, 0.0)
                 AS DECIMAL(28,12)) AS mrr,
               CAST(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)
                 AS DECIMAL(28,12)) AS ndcg
             FROM per, idcg),
           spine AS (SELECT arm, q_id FROM (VALUES ('a_lexical'),
               ('b_semantic_lsh'), ('c_hybrid_rrf')) a(arm)
             CROSS JOIN qp),
           fin AS (SELECT s.arm, s.q_id,
               COALESCE(n_listed, 0) AS n_listed,
               COALESCE(n_relevant, 0) AS n_relevant,
               COALESCE(mrr, CAST(0 AS DECIMAL(28,12))) AS mrr,
               COALESCE(ndcg, CAST(0 AS DECIMAL(28,12))) AS ndcg
             FROM spine s LEFT JOIN perq p
               ON s.arm = p.arm AND s.q_id = p.q_id)"""

  /** Generated oracle for `text_retrieval_panel_ci`: the shared
    * per-query chain + the paired Poisson(1) md5-coin replicate tail
    * (the events_poisson_bootstrap weight convention, keyed on
    * (replicate, q_id) so every arm sees the same resampled panel). */
  private[graft] def retrievalPanelCiOracleSql(nQ: Int = 20,
      reps: Int = 200): String = {
    val loRk = math.ceil(0.025 * reps).toLong
    val hiRk = math.ceil(0.975 * reps).toLong
    s"""WITH ${retrievalPerQuerySql(nQ)},
       wx AS (SELECT arm, q_id, ndcg, rep,
           CAST(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456.0
             + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216.0
             + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576.0
             + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536.0
             + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096.0
             + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256.0
             + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16.0
             + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1))
             / 4294967296.0 AS DOUBLE) AS u
         FROM (SELECT arm, q_id, ndcg, rep,
             md5(CAST(rep AS VARCHAR) || ':'
               || CAST(q_id AS VARCHAR)) AS h
           FROM fin CROSS JOIN range($reps) t(rep)) z),
       ww AS (SELECT arm, rep, ndcg,
           CASE WHEN u < 0.36787944117144233 THEN 0
                WHEN u < 0.7357588823428847 THEN 1
                WHEN u < 0.9196986029286058 THEN 2
                WHEN u < 0.9810118431238462 THEN 3
                WHEN u < 0.9963401531726563 THEN 4
                ELSE 5 END AS w
         FROM wx),
       rm AS MATERIALIZED (SELECT arm, rep,
           CAST(CASE WHEN SUM(w) > 0
             THEN CAST(SUM(ndcg * w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
             ELSE 0.0 END AS DECIMAL(18,9)) AS m
         FROM ww GROUP BY 1, 2),
       wins AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_top FROM (
           SELECT arm, rep, ROW_NUMBER() OVER (PARTITION BY rep
             ORDER BY m DESC, arm) AS rk FROM rm) z
         WHERE rk = 1 GROUP BY 1),
       rr AS (SELECT arm, rep, m, ROW_NUMBER() OVER (
           PARTITION BY arm ORDER BY m, rep) AS rn FROM rm),
       ci AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_reps,
           CAST(SUM(m) AS DOUBLE) / COUNT(*) AS boot_mean_r,
           (CAST(SUM(m * m) AS DOUBLE)
             - CAST(SUM(m) AS DOUBLE) * CAST(SUM(m) AS DOUBLE)
               / COUNT(*)) / (COUNT(*) - 1) AS var_r,
           CAST(MIN(CASE WHEN rn >= $loRk THEN m END) AS DOUBLE)
             AS lo_r,
           CAST(MIN(CASE WHEN rn >= $hiRk THEN m END) AS DOUBLE)
             AS hi_r
         FROM rr GROUP BY 1),
       pt AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(ndcg) AS DOUBLE) / COUNT(*) AS point_r
         FROM fin GROUP BY 1)
       SELECT pt.arm, pt.n_queries, ci.n_reps,
         ROUND(pt.point_r, 6) AS ndcg10_mean,
         ROUND(ci.boot_mean_r, 6) AS boot_mean,
         ROUND(sqrt(ci.var_r), 6) AS boot_se,
         ROUND(ci.lo_r, 6) AS ci_lo,
         ROUND(ci.hi_r, 6) AS ci_hi,
         ROUND(CAST(COALESCE(wins.n_top, 0) AS DOUBLE)
           / CAST(ci.n_reps AS DOUBLE), 6) AS top_share
       FROM pt JOIN ci ON pt.arm = ci.arm
       LEFT JOIN wins ON wins.arm = pt.arm
       ORDER BY pt.arm"""
  }

  private[graft] def kcenterOracleSql(k: Int): String = {
    val steps = (2 to k).map { i =>
      s""",
         p$i AS (SELECT vec_id, qe, nsq, mind FROM d${i - 1}
           ORDER BY mind DESC, vec_id LIMIT 1),
         d$i AS (SELECT d.vec_id, d.qe, d.nsq,
             LEAST(d.mind, d.nsq + p.nsq
               - 2 * CAST(list_dot_product(d.qe, p.qe) AS BIGINT)) AS mind
           FROM d${i - 1} d, p$i p)"""
    }.mkString
    val pickRows = (2 to k).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS pick_order, vec_id,
             CAST(mind AS BIGINT) AS dist_micro2 FROM p$i"""
    }.mkString("\n           UNION ALL ")
    s"""WITH q AS (SELECT vec_id, list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
           FROM embeddings),
         n AS (SELECT vec_id, qe,
             CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nsq
           FROM q),
         c1 AS (SELECT vec_id, qe, nsq FROM n ORDER BY vec_id LIMIT 1),
         d1 AS (SELECT d.vec_id, d.qe, d.nsq,
             d.nsq + c.nsq - 2 * CAST(list_dot_product(d.qe, c.qe) AS BIGINT)
               AS mind
           FROM n d, c1 c)$steps,
         cov AS (SELECT CAST(0 AS BIGINT) AS pick_order, vec_id,
             CAST(mind AS BIGINT) AS dist_micro2
           FROM d$k ORDER BY mind DESC, vec_id LIMIT 1)
         SELECT * FROM (
           SELECT CAST(1 AS BIGINT) AS pick_order, vec_id,
             CAST(0 AS BIGINT) AS dist_micro2 FROM c1
           UNION ALL $pickRows
           UNION ALL SELECT * FROM cov) u
         ORDER BY pick_order"""
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeMergeLearn]]:
    * SQL cannot loop, but the trainer's round count is bounded, so the
    * iterative program unrolls into `rounds` chained CTE blocks — each
    * block is the SAME relational round the Spark side runs (lead-window
    * pair census -> 1-row winner with count-then-lexicographic tie-break
    * -> gaps-and-islands greedy non-overlapping apply). Generated, not
    * hand-written, so round count stays a single knob.
    *
    * Composed from [[bpeMergeCtes]] (the CTE block, exposed so
    * composite oracles can embed the trainer WITHOUT substring or
    * regex surgery on the assembled query) + the per-round readout
    * select. */
  private[graft] def bpeMergeOracleSql(rounds: Int,
      docWhere: String = ""): String = {
    val rows = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS INT) AS merge_round, b.a AS lhs, b.b AS rhs,
          b.cnt AS pair_count,
          (SELECT CAST(COUNT(DISTINCT sym) AS BIGINT) FROM syms_$r)
            AS vocab_size,
          (SELECT CAST(SUM(freq) AS BIGINT) FROM syms_$r) AS total_symbols
          FROM best_$r b"""
    }.mkString("\n UNION ALL\n")
    s"WITH ${bpeMergeCtes(rounds, docWhere)}" +
      s"\n SELECT * FROM (\n$rows\n ) mr ORDER BY merge_round"
  }

  /** The BPE trainer's CTE chain alone (no `WITH`, no final select).
    * `wordsCte` renames the word-census CTE so the block can coexist
    * with another trainer prefix that also declares `words` (the
    * fertility oracle embeds both this and the unigram prefix). */
  private[graft] def bpeMergeCtes(rounds: Int, docWhere: String = "",
      wordsCte: String = "words"): String = {
    val base =
      s"""toks AS (SELECT unnest(string_split(text, ' ')) AS tok
           FROM documents $docWhere),""" +
      s"""
         $wordsCte AS MATERIALIZED (SELECT lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS freq
           FROM toks WHERE regexp_matches(lower(tok), '^[a-z]+$$')
           GROUP BY 1),
         sy0 AS (SELECT w, freq,
             unnest(generate_series(1, CAST(len(w) AS INT))) AS pos
           FROM $wordsCte),
         syms_0 AS MATERIALIZED (
           SELECT w, freq, pos, substr(w, pos, 1) AS sym FROM sy0
           UNION ALL
           SELECT w, freq, len(w) + 1 AS pos, '</w>' AS sym FROM $wordsCte)"""
    val blocks = (1 to rounds).map { r =>
      val p = r - 1
      s""",
         m_$r AS MATERIALIZED (
           SELECT w, freq, pos, sym,
                  LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
                  LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos,
                  ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS rn
           FROM syms_$p),
         best_$r AS MATERIALIZED (
           SELECT a, b, a || b AS ab, cnt FROM (
             SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS cnt
             FROM m_$r WHERE nxt IS NOT NULL GROUP BY 1, 2) pc_$r
           ORDER BY cnt DESC, a, b LIMIT 1),
         ap_$r AS MATERIALIZED (
           SELECT w, pos, npos FROM (
             SELECT w, pos, npos,
                    ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos) AS k
             FROM (SELECT m.w, m.pos, m.npos,
                          m.rn - ROW_NUMBER() OVER
                            (PARTITION BY m.w ORDER BY m.pos) AS grp
                   FROM m_$r m, best_$r b
                   WHERE m.sym = b.a AND m.nxt = b.b) mt_$r) rk_$r
           WHERE k % 2 = 1),
         syms_$r AS MATERIALIZED (
           SELECT s.w, s.freq, s.pos,
                  CASE WHEN a1.pos IS NOT NULL THEN (SELECT ab FROM best_$r)
                       ELSE s.sym END AS sym
           FROM syms_$p s
           LEFT JOIN ap_$r a1 ON s.w = a1.w AND s.pos = a1.pos
           LEFT JOIN ap_$r a2 ON s.w = a2.w AND s.pos = a2.npos
           WHERE a2.w IS NULL)"""
    }.mkString
    s"$base$blocks"
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpeEncode]]: the
    * same unrolled trainer CTEs, then the final vocabulary's per-word
    * subword counts joined back onto one corpus token pass. */
  private[graft] def bpeEncodeOracleSql(rounds: Int): String = {
    s"""WITH ${bpeMergeCtes(rounds)},
       wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
         FROM syms_$rounds GROUP BY w),
       dw AS (SELECT lang, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS occ
         FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
               FROM documents) dt
         WHERE regexp_matches(lower(tok), '^[a-z]+$$') GROUP BY 1, 2)
       SELECT lang, CAST(SUM(occ) AS BIGINT) AS total_words,
         CAST(SUM(occ * (len(w) + 1)) AS BIGINT) AS total_chars,
         CAST(SUM(occ * n_sub) AS BIGINT) AS total_bpe_tokens,
         ROUND(CAST(SUM(occ * (len(w) + 1)) AS DOUBLE)
           / SUM(occ * n_sub), 6) AS chars_per_token
       FROM dw JOIN wt USING (w) GROUP BY lang ORDER BY lang"""
  }

  /** DuckDB replay of [[graft.operators.TextAnalysis.bpePackSequences]]:
    * the unrolled trainer CTEs, per-document BPE lengths (vocabulary
    * LEFT join; out-of-vocabulary tokens count 1), then the identical
    * fixed-256 packing census `pack_sequences` runs on whitespace
    * lengths. */
  private[graft] def bpePackOracleSql(rounds: Int): String = {
    s"""WITH ${bpeMergeCtes(rounds)},
       wt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
         FROM syms_$rounds GROUP BY w),
       dt AS (SELECT source, doc_id, lower(tok) AS w
         FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents) dx),
       dl AS (SELECT source, doc_id,
           CAST(SUM(COALESCE(wt.n_sub, 1)) AS BIGINT) AS n_tok
         FROM dt LEFT JOIN wt USING (w) GROUP BY 1, 2),
       cm AS (SELECT source, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         FROM dl),
       pw AS (SELECT source, (cum - n_tok) // 256 AS win,
           CAST(COUNT(*) AS BIGINT) AS docs_in_win,
           SUM(n_tok) AS tok_start
         FROM cm GROUP BY 1, 2)
       SELECT docs_in_win, CAST(COUNT(*) AS BIGINT) AS n_windows,
         CAST(SUM(tok_start) AS BIGINT) AS sum_tokens
       FROM pw GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB replay of
    * [[graft.operators.StreamingAnalytics.streamBpeEncode]]: the trainer
    * CTEs restricted to the corpus half (sources 0-9), then for EACH
    * staged increment the frozen merges re-applied round by round to
    * that increment's own vocabulary (the same window/island/merge
    * blocks, with `best_r` read from the trainer chain instead of
    * recomputed), per-(increment, lang) censuses, and the increment-0
    * fold of their integer sums. */
  private[graft] def streamBpeEncodeOracleSql(rounds: Int): String = {
    val ctes = "WITH " + bpeMergeCtes(rounds,
      "WHERE CAST(substr(source, 4, 8) AS INT) < 10")
    val incRanges = Seq(1 -> "BETWEEN 10 AND 14", 2 -> ">= 15")
    val incBlocks = incRanges.map { case (i, rng) =>
      val apply = (1 to rounds).map { r =>
        val p = r - 1
        s""",
           im_${i}_$r AS MATERIALIZED (
             SELECT w, freq, pos, sym,
                    LEAD(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt,
                    LEAD(pos) OVER (PARTITION BY w ORDER BY pos) AS npos,
                    ROW_NUMBER() OVER (PARTITION BY w ORDER BY pos) AS rn
             FROM is_${i}_$p),
           iap_${i}_$r AS MATERIALIZED (
             SELECT w, pos, npos FROM (
               SELECT w, pos, npos,
                      ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY pos)
                        AS k
               FROM (SELECT m.w, m.pos, m.npos,
                            m.rn - ROW_NUMBER() OVER
                              (PARTITION BY m.w ORDER BY m.pos) AS grp
                     FROM im_${i}_$r m, best_$r b
                     WHERE m.sym = b.a AND m.nxt = b.b) imt_${i}_$r)
                 irk_${i}_$r
             WHERE k % 2 = 1),
           is_${i}_$r AS MATERIALIZED (
             SELECT s.w, s.freq, s.pos,
                    CASE WHEN a1.pos IS NOT NULL
                         THEN (SELECT ab FROM best_$r)
                         ELSE s.sym END AS sym
             FROM is_${i}_$p s
             LEFT JOIN iap_${i}_$r a1 ON s.w = a1.w AND s.pos = a1.pos
             LEFT JOIN iap_${i}_$r a2 ON s.w = a2.w AND s.pos = a2.npos
             WHERE a2.w IS NULL)"""
      }.mkString
      s""",
         iw_$i AS MATERIALIZED (
           SELECT lang, lower(tok) AS w, CAST(COUNT(*) AS BIGINT) AS occ
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
                 FROM documents
                 WHERE CAST(substr(source, 4, 8) AS INT) $rng) it_$i
           WHERE regexp_matches(lower(tok), '^[a-z]+$$') GROUP BY 1, 2),
         ivw_$i AS (SELECT w, CAST(SUM(occ) AS BIGINT) AS freq
           FROM iw_$i GROUP BY 1),
         is_${i}_0 AS MATERIALIZED (
           SELECT w, freq, pos, substr(w, pos, 1) AS sym FROM (
             SELECT w, freq,
                 unnest(generate_series(1, CAST(len(w) AS INT))) AS pos
             FROM ivw_$i) iz_$i
           UNION ALL
           SELECT w, freq, len(w) + 1 AS pos, '</w>' AS sym FROM ivw_$i)
         $apply,
         iwt_$i AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_sub
           FROM is_${i}_$rounds GROUP BY w),
         ic_$i AS (SELECT CAST($i AS BIGINT) AS increment, lang,
             CAST(SUM(occ) AS BIGINT) AS total_words,
             CAST(SUM(occ * (len(w) + 1)) AS BIGINT) AS total_chars,
             CAST(SUM(occ * n_sub) AS BIGINT) AS total_bpe_tokens
           FROM iw_$i JOIN iwt_$i USING (w) GROUP BY 1, 2)"""
    }.mkString
    s"""$ctes$incBlocks,
       iu AS (SELECT * FROM ic_1 UNION ALL SELECT * FROM ic_2),
       ifold AS (SELECT CAST(0 AS BIGINT) AS increment, lang,
           CAST(SUM(total_words) AS BIGINT) AS total_words,
           CAST(SUM(total_chars) AS BIGINT) AS total_chars,
           CAST(SUM(total_bpe_tokens) AS BIGINT) AS total_bpe_tokens
         FROM iu GROUP BY 2)
       SELECT increment, lang, total_words, total_chars, total_bpe_tokens,
         ROUND(CAST(total_chars AS DOUBLE) / total_bpe_tokens, 6)
           AS chars_per_token
       FROM (SELECT * FROM iu UNION ALL SELECT * FROM ifold) iz
       ORDER BY increment, lang"""
  }
}
