package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the 100 TB posture is a property of the PLANS,
  * not the row counts — filters must reach the parquet scan, projections
  * must prune the read schema, small dimensions must broadcast, and no
  * query may degenerate into a cartesian product. These assertions pin
  * those properties so a refactor that silently breaks one fails CI.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("predicate pushdown: q1's shipdate filter reaches the parquet scan") {
    val p = plan(graft.operators.Relational.q1PricingSummary(spark, sf0001))
    assert(p.contains("PushedFilters"), p.linesIterator.take(5).mkString("\n"))
    assert(p.contains("LessThanOrEqual(l_shipdate"),
      "window predicate should be pushed to the scan")
  }

  test("column pruning: q1 reads only the 7 needed lineitem columns") {
    val p = plan(graft.operators.Relational.q1PricingSummary(spark, sf0001))
    assert(!p.contains("l_comment") && !p.contains("l_shipmode"),
      "unused wide columns must not appear in the read schema")
    assert(p.contains("l_returnflag"))
  }

  test("broadcast joins: flagship anti-join and q5's dimension joins broadcast") {
    val anti = plan(graft.operators.EventAnalytics.refPipeline(spark, sf0001))
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"),
      "the dedup anti-join should broadcast its single-column build side")
    val q5 = plan(graft.operators.Relational.q5LocalSupplier(spark, sf0001))
    assert(q5.contains("BroadcastHashJoin"),
      "region/nation/supplier dims should broadcast, not shuffle")
  }

  test("whole-stage codegen covers the aggregation hot path") {
    // AQE finalizes codegen at execution, so audit the executed plan
    val df = graft.operators.Relational.q1PricingSummary(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes = whole-stage-codegen'd stages in compact notation
    assert(p.contains("*(1)") && p.contains("*(2)"),
      "scan->partial-agg and final-agg stages should both be codegen'd")
    assert(p.contains("partial_sum"),
      "aggregation should be map-side partial before the shuffle")
  }

  test("no query plan degenerates into a CartesianProduct") {
    // the 1-row query-vector joins legitimately use BroadcastNestedLoopJoin;
    // an unbroadcast CartesianProduct anywhere is always a scale bug
    SparkEntry.queries
      .filterNot { case (name, _) => name.startsWith("stream_") }
      .foreach { case (name, fn) =>
        val p = plan(fn(spark, sf0001))
        assert(!p.contains("CartesianProduct"),
          s"$name plans a CartesianProduct")
      }
  }

  test("sessionize shares one shuffle across both window functions") {
    val p = plan(graft.operators.EventAnalytics.sessionize(spark, sf0001))
    // one exchange feeds both Windows AND the aggregation; the only other
    // is the final presentation orderBy ("(n) Exchange" = one per node)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"lag + running-sum + groupBy should reuse the user_id partitioning, got $exchanges exchanges")
  }

  test("as-of join plans as one windowed pass, no join operator") {
    val p = plan(graft.operators.EventAnalytics.asofAttribution(spark, sf0001))
    assert(!p.contains("Join"), "as-of should be a running-max window, not a join")
    assert(p.contains("Window"))
  }

  test("asofNearest: both direction frames share one exchange and sort") {
    val p = plan(graft.operators.EventAnalytics.asofNearest(spark, sf0001))
    assert(!p.contains("Join"),
      "nearest as-of should be two window frames, not a join")
    // exactly: the user_id hash partition feeding both WindowExecs + the
    // final presentation orderBy — a third exchange means the frames
    // stopped sharing their sort
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"backward+forward frames should reuse one partitioning, got $exchanges")
  }

  test("ewmaDaily: daily rollup + one window partitioning, frames share " +
    "the sort") {
    val p = plan(graft.operators.Relational.ewmaDaily(spark, sf0001))
    // agg exchange on (event_type, day), window exchange on event_type,
    // final orderBy — row_number and both frame sums add none
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(exchanges <= 3,
      s"EWMA should cost rollup+window+order exchanges only, got $exchanges")
  }

  test("basketPairs: the pair generator is an equi-join on the order key") {
    val p = plan(graft.operators.Relational.basketPairs(spark, sf0001))
    assert(!p.contains("CartesianProduct"), "pair generator went cartesian")
    // exactly one BNLJ: the 1-row n_orders scalar broadcast (formatted
    // plans print each node twice — tree line + detail block)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2,
      "pair space must come from the per-order equi-join, not a cross")
    assert(p.contains("l_orderkey"),
      "the self-join must keep its order-key equi condition")
  }

  test("range join broadcasts the band relation") {
    val p = plan(graft.operators.EventAnalytics.rangeJoinBands(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "non-equi join against a tiny dimension must broadcast")
  }

  test("partition pruning: date-partitioned sink reads only matching partitions") {
    import org.apache.spark.sql.functions.{col, to_date}
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    val ev = Tables(spark, sf0001, "events")
      .withColumn("event_date", to_date(col("ts")))
    assert(graft.etl.Sink.writePartitioned(ev, out, "event_date"))
    val read = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-15")
    val p = plan(read)
    assert(p.contains("PartitionFilters") && p.contains("event_date"),
      "the date predicate must prune partitions, not filter rows")
    assert(read.count() > 0)
  }

  test("K2 probe read: projection and predicate both pushed on parquet") {
    import org.apache.spark.sql.functions.col
    val ev = Tables(spark, sf0001, "lineitem")
      .filter(col("l_shipdate") >= "1996-01-01")
      .select("l_orderkey")
    val p = plan(ev)
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(!p.contains("l_comment"))
  }

  test("lateral top-n decorrelates to WindowGroupLimit, not a per-row loop") {
    val p = plan(graft.operators.Subqueries.lateralTopn(spark, sf0001))
    assert(p.contains("WindowGroupLimit"),
      "the LIMIT-per-group must become a rank filter with map-side partial limit")
    assert(!p.contains("CartesianProduct"))
  }

  test("gap fill: generated spine broadcasts; value filter reaches the scan") {
    val p = plan(graft.operators.Temporal.gapFill(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "the hour x type spine join must broadcast, never shuffle the facts")
    assert(p.contains("GreaterThan(value,100.0)"),
      "the thinning predicate must be pushed to the parquet scan")
  }

  test("chunking generator streams through GenerateExec without an array column") {
    val p = plan(graft.operators.TextAnalysis.textChunks(spark, sf0001))
    assert(p.contains("Generate"), "ChunkWords must plan as a Generate node")
    assert(p.contains("LessThan(doc_id,40)"),
      "the doc filter must still reach the scan below the generator")
  }

  test("typed top-k aggregator keeps partial aggregation (only buffers shuffle)") {
    val df = graft.operators.Relational.topkAggregated(spark, sf0001)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    // two ObjectHashAggregate phases around one exchange = map-side partials
    assert("ObjectHashAggregate|SortAggregate".r
      .findAllIn(executed).size >= 2,
      "Aggregator must run as partial + final, not a single post-shuffle agg")
  }

  test("q10: selective filters reach the scans, dims broadcast") {
    val p = plan(graft.operators.Relational.q10ReturnedItems(spark, sf0001))
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must be pushed to the lineitem scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order-quarter filter must be pushed to the orders scan")
    assert(p.contains("BroadcastHashJoin"),
      "customer x nation should broadcast into the fact join")
  }

  test("q14: part dimension broadcasts; ship-month filter pushed") {
    val p = plan(graft.operators.Relational.q14PromoRevenue(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"), "part dim must broadcast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "shipdate window must reach the lineitem scan")
    assert(!p.contains("p_name") && !p.contains("p_brand"),
      "unused part columns must be pruned from the read schema")
  }

  test("kmeans assignment: one broadcast seed row, no per-seed row expand") {
    val p = plan(graft.operators.Similarity.kmeansAssignIter(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the seed array must broadcast as a single row")
    assert(!p.contains("Window"),
      "argmax must be the HOF array_max, not a window sort")
    assert(!p.contains("SortMergeJoin"),
      "nothing in the assignment path may shuffle-join the corpus")
  }

  test("bigram PMI: bigrams derive map-side (no window), totals broadcast") {
    val p = plan(graft.operators.TextAnalysis.bigramPmi(spark, sf0001))
    assert(!p.contains("Window"),
      "adjacency must come from the HOF transform, not lead() over a window")
    assert(p.contains("BroadcastExchange"),
      "the one-row corpus totals must broadcast into the scoring join")
  }

  test("phash hamming: candidate generation is an equi-join on band bits") {
    val p = plan(graft.operators.Multimodal.phashHamming(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "banded blocking must plan as an equi-join, never a pair scan")
  }

  test("pagerank: exactly one fact pass — the checkpointed edge aggregate " +
    "feeds every downstream relation") {
    val df = graft.operators.Graph.pagerankNations(spark, sf0001)
    val p = plan(df)
    // the fact-scale edge build runs ONCE, eagerly, inside localCheckpoint;
    // the returned plan must contain ZERO fact-table scans (exchange reuse
    // does not span actions, so nodes.count() would otherwise re-execute
    // the lineitem⋈orders⋈dims build — the r6 double-fact-pass finding)
    assert(!p.contains("lineitem") && !p.contains("orders"),
      "final plan must derive everything from the ≤625-row checkpointed edges")
    assert(p.contains("ExistingRDD"),
      "edge aggregate should appear as a checkpointed in-memory relation")
    assert(!p.contains("InMemoryTableScan"),
      "no cache: a pinned fact-scale relation outlives the query (r5 class)")
  }

  test("freq sketch: the heavy-hitter aggregate partial-combines map-side") {
    val p = plan(graft.operators.Quality.sketchFreqTopk(spark, sf0001))
    assert(p.contains("partial_graft_freq_agg"),
      "per-partition sketches must build before any exchange — the whole " +
        "point is shipping a bounded map instead of the token stream")
    assert(p.contains("ObjectHashAggregate"),
      "a TypedImperativeAggregate plans as ObjectHashAggregate")
  }

  test("label propagation: one fact pass, broadcast-only iteration joins") {
    val p = plan(graft.operators.Graph.labelPropNations(spark, sf0001))
    // same discipline as pagerank: the fact-scale edge build lives inside
    // the shared localCheckpoint, so the returned plan derives everything
    // from the ≤625-row checkpointed relation
    assert(!p.contains("lineitem") && !p.contains("orders"),
      "LPA must reuse the checkpointed trade edges, not rebuild them")
    assert(p.contains("ExistingRDD"))
    assert(!p.contains("SortMergeJoin"),
      "nation-bounded relations must broadcast in every round")
    assert(!p.contains("InMemoryTableScan"), "no pinned caches")
  }

  test("q19: each side's disjunction projection is pushed to its parquet scan") {
    val p = plan(graft.operators.TpchReports.q19DisjunctiveRevenue(spark, sf0001))
    // Catalyst extracts per-side OR-of-ANDs: quantity bounds reach the
    // lineitem scan, brand/size blocks reach the part scan
    assert(p.contains("GreaterThanOrEqual(l_quantity"),
      "quantity disjunction should push to the lineitem scan")
    assert(p.contains("EqualTo(p_brand"),
      "brand/size disjunction should push to the part scan")
    assert(p.contains("BroadcastHashJoin"), "part side should broadcast")
  }

  test("q2/q21: groupwise-extreme via window — derived relation shuffles ONCE") {
    // the aggregate-join form evaluates the derived relation twice and
    // sort-merges the copies; the window form must not
    val q2 = plan(graft.operators.TpchReports.q2MinAcctbalSupplier(spark, sf0001))
    assert(!q2.contains("SortMergeJoin"),
      "q2 must compute the per-part min as a window, not a self-join")
    val q21 = plan(graft.operators.TpchReports.q21WaitingSupplier(spark, sf0001))
    assert(!q21.contains("SortMergeJoin"),
      "q21 must compute per-order stats as windows, not a self-join")
    assert(q21.contains("Window"))
  }

  test("q7/q8 trade spine: all four dimensions broadcast, facts sort-merge") {
    val p = plan(graft.operators.TpchReports.q7VolumeShipping(spark, sf0001))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p).length
    assert(nBroadcast >= 4,
      s"supplier/customer/nation x2 should broadcast (got $nBroadcast)")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q17: the per-part pre-aggregate is pruned by a Brand#3 semi-join") {
    val p = plan(graft.operators.TpchReports.q17SmallQtyRevenue(spark, sf0001))
    assert(p.contains("LeftSemi"),
      "lineitem must be semi-joined to the Brand#3 keys BEFORE the per-part " +
        "aggregate — a full-fact pre-aggregate discards ~96% of its groups")
    assert(p.contains("EqualTo(p_brand,Brand#3)"),
      "the brand filter must be pushed to the part scan")
    assert(!p.contains("SortMergeJoin"),
      "both the semi-join and the pruned pq probe must broadcast; nothing " +
        "in this query should shuffle-join the fact table")
  }

  test("lloyd-2: broadcast centroid arrays, HOF argmax, corpus never shuffle-joins") {
    val p = plan(graft.operators.Similarity.kmeansLloydTwo(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "each iteration's centroid array must broadcast as a single row")
    assert(!p.contains("SortMergeJoin"),
      "no step of the loop may shuffle-join the corpus")
    assert(!p.contains("Window"),
      "argmax must be the HOF array_max, not a window sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("LSH candidate generation: one grouped shuffle, no self-join, no cache") {
    val p = plan(graft.operators.DedupOps.minhashLshPairs(spark, sf0001))
    assert(p.contains("Generate"),
      "pair expansion must be an explode over the grouped bucket array")
    assert(!p.contains("InMemoryTableScan"),
      "candidate generation must not pin a cached relation (r5 finding)")
    // documents feeds the query 3x (candidates + both verify sides); the
    // old self-join form read it 4x and shuffled the band relation twice.
    // formatted explain prints each scan twice (tree + details section),
    // so 3 physical scans = 6 matches; the self-join form printed 8.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 6, s"expected <=3 documents scans (6 printed), got $scans")
  }

  test("mixture weights: dimension-bounded agg, 1-row total broadcasts") {
    val p = plan(graft.operators.TextAnalysis.mixtureWeights(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the grand-total row must broadcast into the weighting projection")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("recall eval: both rankings broadcast the query set; no cartesian") {
    val p = plan(graft.operators.Similarity.recallAt10(spark, sf0001))
    assert(!p.contains("CartesianProduct"),
      "the brute side must be a broadcast nested-loop on the tiny query " +
        "set, never a shuffled cartesian")
    assert(p.contains("LeftSemi"), "hits must be a semi-join of the top-k sets")
  }

  test("repetition filter: gram counts partial-aggregate map-side, no self-join") {
    val df = graft.operators.TextAnalysis.repetitionFilter(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "the (doc, gram) counts must combine before their shuffle")
    assert(!plan(df).contains("CartesianProduct"),
      "doc-level relations join on doc_id only")
    // the two per-doc relations join back to the base on doc_id — three
    // scans of documents, counted as optimized-plan leaves (print-format
    // independent, unlike grepping the formatted explain)
    val scans = df.queryExecution.optimizedPlan.collectLeaves().size
    assert(scans <= 3, s"expected <=3 documents scans, got $scans leaves")
  }

  test("pack_sequences: the running sum is a PARTITIONED window, never global") {
    val p = plan(graft.operators.TextAnalysis.packSequences(spark, sf0001))
    // a global (empty-partition) running sum would print
    // "Window [...]" with SinglePartition distribution — assert the
    // exchange feeding the window hashes on source
    assert(p.contains("hashpartitioning(source"),
      "cumulative token sum must partition by the shard key:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(!p.contains("SinglePartition"),
      "no stage of the packing census may collapse to one partition")
  }

  test("docs_budget_select: no corpus-sized single-partition window " +
    "(global prefix sum decomposes into bucketed scans)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = graft.operators.Curation.budgetSelect(spark, sf0001)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    // every empty-partition (single-task) window must sit strictly above
    // an aggregate — i.e. over the B bucket totals, never the corpus
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        "a global window over un-aggregated (corpus-sized) data would " +
          "funnel every document through one task:\n" + w)
    }
    // and the corpus-sized running sum must be the bucket-partitioned one
    assert(wins.exists(w => w.partitionSpec.exists(
      _.references.exists(_.name == "bucket"))),
      "the per-document prefix sum must partition by the sampled bucket")
  }

  test("docs_curriculum: the exact global rank decomposes like " +
    "docs_budget_select (bucketed row_number, no corpus-sized NTILE)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = graft.operators.Curation.curriculum(spark, sf0001)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
        "a global window over un-aggregated (corpus-sized) data would " +
          "funnel every document through one task:\n" + w)
    }
    assert(wins.exists(w => w.partitionSpec.exists(
      _.references.exists(_.name == "bucket"))),
      "the per-document row_number must partition by the sampled bucket")
  }

  test("decontamination: the benchmark gram set broadcasts into a semi-join") {
    val p = plan(graft.operators.TextAnalysis.decontaminate(spark, sf0001))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "the eval-set grams are tiny against the corpus — the train-side " +
        "probe must be a broadcast semi-join, never a shuffled one")
  }

  test("substring census: posting aggregation partial-combines, no cartesian") {
    val df = graft.operators.TextAnalysis.substringDupCensus(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "window posting counts must combine map-side")
    assert(!plan(df).contains("CartesianProduct"))
    // the r7 rewrite's core claim: the corpus' 20-gram windows are
    // exploded exactly ONCE (doc-spread comes from a window function over
    // the posting agg, per-doc window totals from token counts — an
    // agg + self-join formulation re-derived the whole explode subtree)
    // count in the string form: AQE's AdaptiveSparkPlanExec hides its
    // final children from collect(), but toString prints the whole tree.
    // After execution it prints BOTH "== Final Plan ==" and
    // "== Initial Plan ==" sections — count in the final section only
    val finalSection = p.split("== Initial Plan ==").head
    val gens = "Generate explode".r.findAllIn(finalSection).size
    assert(gens == 1,
      s"expected exactly 1 Generate (explode), got $gens in:\n$finalSection")
  }

  test("bloom prefilter: probe is a scalar-subquery filter, verify joins broadcast") {
    val df = graft.operators.DedupOps.bloomPrefilterDedup(spark, sf0001)
    val p = plan(df)
    assert(p.contains("might_contain"),
      "the batch probe must evaluate the bloom filter, not join the corpus")
    assert(p.contains("Subquery") || p.contains("subquery"),
      "the built filter must reach the probe as a broadcast scalar subquery")
    assert(p.contains("BroadcastHashJoin"),
      "candidate verification must broadcast the tiny candidate/verified sets")
    assert(!p.contains("SortMergeJoin"),
      "nothing in the prefilter path may shuffle-sort corpus-scale data")
    assert(!p.contains("CartesianProduct"))
  }

  test("quota sample: rank limit group-prunes map-side before the shuffle") {
    val p = plan(graft.operators.Curation.quotaSample(spark, sf0001))
    assert(p.contains("WindowGroupLimit"),
      "row_number <= k must plan as WindowGroupLimit, not a full window sort:\n" +
        p.linesIterator.take(30).mkString("\n"))
    assert(p.contains("Partial"),
      "the group limit must run in Partial mode before the source exchange " +
        "so each input partition ships at most k rows per source")
    assert(!p.contains("CartesianProduct"))
  }

  test("substring removal: islands run on the semi-join-marked minority only") {
    val p = plan(graft.operators.TextAnalysis.substringRemoval(spark, sf0001))
    assert(p.contains("LeftSemi"),
      "shared-window starts must be kept by a semi-join against the " +
        "cross-doc fingerprint set, not a wide join")
    assert(p.contains("hashpartitioning(doc_id"),
      "the interval-union window partitions by doc_id")
    assert(!p.contains("CartesianProduct"))
  }

  test("source overlap: grouped-posting pair expansion, no self-join — " +
    "documents scanned once, fp shuffled once") {
    val p = plan(graft.operators.TextAnalysis.sourceOverlap(spark, sf0001))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "pairs must come from the in-task posting-list expansion, not a " +
        "fingerprint self-join (r7 VERDICT: the join form paid an extra " +
        "corpus-sized exchange)")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      "one corpus scan feeds the posting aggregation")
    assert("hashpartitioning\\(fp".r.findAllIn(p).size == 1,
      "exactly one exchange carries the fingerprint posting build")
  }

  test("containment: same single-posting-shuffle shape as jaccard — " +
    "no self-join of the shingle relation") {
    val p = plan(graft.operators.DedupOps.containmentPairs(spark, sf0001))
    // documents is scanned once for the pair expansion and twice under
    // the two sizes-join occurrences (3 total, same as jaccard; exchange
    // reuse collapses the sizes pair at runtime) — the posting SELF-join
    // form would add a fourth corpus-sized scan to the pair build itself
    assert("documents\\.parquet".r.findAllIn(p).size <= 3,
      "pair expansion must group the posting list, not self-join it")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("pq-adc: codebook and query sides broadcast; no cartesian; " +
    "BNLJ only for the 1-row codebook/query attachments") {
    val p = plan(graft.operators.Similarity.pqAdcRecall(spark, sf0001))
    assert(!p.contains("CartesianProduct"), "pq must never plan a cartesian")
    assert(!p.contains("SortMergeJoin"),
      "every join side here is broadcast-bounded (codebook, queries, top-k)")
    // the 1-row codebook and 3-row query relations attach via
    // BroadcastNestedLoopJoin (no equi-key exists): one per training
    // pass, the seed build, encode, and the query attachments — 7
    // nodes in the current plan (formatted mode prints each node twice:
    // tree + details), every one a bounded broadcast; anything beyond
    // means a join lost its equi-key
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 14, s"$bnlj BNLJ prints — a corpus-sized join lost its equi-key")
  }

  test("histogram-CDF quantile family: every single-partition window " +
    "sits above an aggregate (value-domain histogram), never the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val family = Seq[(String, DataFrame)](
      ("orders_rfm", graft.operators.Relational.ordersRfm(spark, sf0001)),
      ("events_power_pareto",
        graft.operators.EventAnalytics.powerPareto(spark, sf0001)),
      ("text_coverage_curve",
        graft.operators.TextAnalysis.coverageCurve(spark, sf0001)),
      ("events_cusum",
        graft.operators.EventAnalytics.cusumChangepoint(spark, sf0001)),
      ("events_interarrival",
        graft.operators.EventAnalytics.interarrival(spark, sf0001)),
      ("events_funnel_latency",
        graft.operators.EventAnalytics.funnelLatency(spark, sf0001)),
      ("orders_shipping_aging",
        graft.operators.Relational.shippingAging(spark, sf0001)),
      ("orders_repeat_latency",
        graft.operators.Relational.repeatLatency(spark, sf0001)),
      ("events_reach_curve",
        graft.operators.EventAnalytics.reachCurve(spark, sf0001)),
      ("events_gini",
        graft.operators.EventAnalytics.activityGini(spark, sf0001)),
      ("sim_hnsw_levels",
        graft.operators.Similarity.hnswLevels(spark, sf0001)),
      ("orders_pareto_abc",
        graft.operators.Relational.paretoAbc(spark, sf0001)),
      ("docs_spearman",
        graft.operators.Curation.spearmanLengthQuality(spark, sf0001)))
    family.foreach { case (name, df) =>
      val wins = df.queryExecution.optimizedPlan
        .collect { case w: LWindow => w }
      assert(wins.nonEmpty, name)
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          s"$name: a global window over un-aggregated (corpus-sized) " +
            s"data would funnel every row through one task:\n$w")
      }
    }
    // the weighted median's cumulative windows must partition by flag
    val wm = graft.operators.Relational.weightedMedianPrice(spark, sf0001)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wm.nonEmpty && wm.forall(_.partitionSpec.nonEmpty),
      "weighted-median CDF windows must be per-flag, never global")
  }

  test("sim_kmeans_inertia: both assignment passes are 1-row centroid " +
    "broadcasts (2 BNLJ), nothing corpus-sized shuffles twice") {
    val p = plan(graft.operators.Similarity.kmeansInertia(spark, sf0001))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    // the iter-1 assignment subtree is deliberately RECOMPUTED in both
    // consumers (census union + centroid re-derivation) rather than
    // materialized — at 100 TB re-running a narrow broadcast-map is
    // cheaper than persisting a corpus-sized relation. That duplication
    // makes 3 assignment passes; each plans its centroid-array join as
    // 2 BNLJ nodes in the formatted tree. Budget: 6, all 1-row builds.
    assert(bnlj <= 6, s"centroid-broadcast budget exceeded: $bnlj > 6")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("plan-shape regression guards: the top-8 bench queries keep their " +
    "exchange budget, zero sort-merge joins, zero cartesians") {
    // Ceilings are the measured formatted-plan counts (sf-independent —
    // the plan SHAPE does not change with data size) plus ~10% headroom.
    // A refactor that adds a shuffle to a non-iterative query trips its
    // tight bound directly; one added PER ITERATION of a fixpoint query
    // multiplies by the round count and blows the bound by far. Every
    // query below currently plans zero SortMergeJoins — an SMJ appearing
    // means a broadcast hint or size estimate was lost (how the r7
    // pagerank checkpoint initially regressed before its hints).
    // BroadcastNestedLoopJoin is allowed only where a 1-row scalar
    // relation joins (text_bigram_logprob's global-total join).
    val budgets = Seq( // (query, maxExchanges incl. broadcasts, maxBNLJ)
      ("dedup_clusters_star", 50, 0),
      ("docs_curation_pipeline", 46, 0),
      ("dedup_clusters", 620, 0),
      ("text_substring_dup", 16, 0),
      ("dedup_semantic_clusters", 495, 0),
      ("text_bigram_logprob", 18, 2),
      ("graph_pagerank", 34, 0),
      ("dedup_keep_best", 625, 0),
      // label-prop's BNLJs are the 1-row mean-weight scalar broadcast,
      // re-derived per unrolled round over the nation-bounded (≤625-row)
      // checkpointed relation — bounded by the round count, not the data
      ("graph_label_prop", 50, 6),
      ("dedup_incremental_minhash", 16, 0),
      ("dedup_bloom_prefilter", 24, 0),
      // round-9: the probe's BNLJs are the 1-row broadcast weight vector
      // crossing into the corpus pass; the BPE trainer's are its
      // per-round 1-row winner/stats scalars (2 per unrolled round) —
      // both bounded by construction, not by data
      ("docs_quality_probe", 9, 2),
      ("text_bpe_merges", 42, 12),
      ("text_bpe_encode", 11, 0))
    budgets.foreach { case (name, maxEx, maxBnlj) =>
      val p = plan(SparkEntry.queries(name)(spark, sf0001))
      val ex = "Exchange".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(ex <= maxEx, s"$name: $ex exchanges > budget $maxEx — an " +
        "edit added a shuffle (or broadcast) this query didn't have")
      assert(smj == 0, s"$name: $smj SortMergeJoin(s) — a broadcast side " +
        "lost its hint or size estimate")
      assert(bnlj <= maxBnlj, s"$name: $bnlj BroadcastNestedLoopJoin(s) " +
        s"> $maxBnlj — a join lost its equi-key")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian")
    }
  }
}
