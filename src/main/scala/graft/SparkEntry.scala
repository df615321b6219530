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
    "graph_louvain_conv" -> ((s, d) => Graph.louvainConverge(s, d)),
    "text_minkprob_contamination" ->
      ((s, d) => TextAnalysis.minkProbContamination(s, d)),
    "stream_hnsw_append" ->
      ((s, d) => StreamingAnalytics.streamHnswAppend(s, d)),
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
  def oracleSql: Map[String, String] = {
    import graft.oracles._
    DerivedOracles(
      RefOracles.sql ++ RelationalOracles.sql ++ EventsOracles.sql ++
        TextOracles.sql ++ SimilarityOracles.sql ++ DedupOracles.sql ++
        StreamOracles.sql ++ GraphOracles.sql ++ MultimodalOracles.sql ++
        CurationOracles.sql ++ MiscOracles.sql)
  }
}
