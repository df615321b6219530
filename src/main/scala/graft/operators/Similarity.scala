package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExprColumns

/** Similarity search over the `embeddings` table (north-star §7.5):
  * brute-force exact top-k as the correctness baseline, then the two scale
  * paths — label-blocked pair search (IVF-style partition blocking) and
  * random-hyperplane LSH candidate generation.
  *
  * Precision contract: all final similarities use
  * [[graft.expressions.CosineSimilarityF32]] (strict f32 accumulation,
  * bit-identical to DuckDB's list_cosine_similarity), and every
  * intermediate that could be order-dependent (hyperplane projections,
  * centroid sums) is accumulated in exact DECIMAL — so shuffle order and
  * AQE re-plans can never flip a sign, a threshold, or a top-k boundary.
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  /** Exact brute-force top-k neighbors of one query vector.
    * Plan shape: broadcast the 1-row query, one codegen'd map over the
    * corpus, TakeOrderedAndProject — O(N·d), no shuffle of the corpus.
    * This is also the verification baseline for the ANN variants. */
  def bruteForceTopK(spark: SparkSession, dir: String,
                     queryId: Long = 0L, k: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    e.filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .withColumn("sim_raw",
        ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"),
        round(col("sim_raw").cast("double"), 4).as("sim"))
  }

  /** All similar pairs above a threshold, blocked by label (the corpus's
    * labels are cluster assignments, so blocking keeps recall while
    * cutting the pair space ~10x). At 100 TB the same shape holds with
    * IVF cluster ids in place of labels: an equi-join on the block key,
    * never an unblocked cross join.
    *
    * Block-size INVARIANT (this query is all-pairs WITHIN a block, so
    * the envelope is Σ m_b(m_b-1)/2 over block sizes m_b): the block
    * count must grow with the corpus so that max m_b stays bounded —
    * with k blocks of roughly n/k members, cost is n²/2k, i.e. linear
    * in n only if k ∝ n (exactly how IVF picks nlist ≈ √n-to-n/1k).
    * A fixed 8-label blocking like this one is the harness-scale
    * stand-in; at scale the label column IS the trained IVF assignment
    * (`sim_ivf_topk`'s centroids), which satisfies the invariant by
    * construction. The LSH/IVF/PQ ladder is the scale path when even
    * blocked all-pairs is too much. */
  def labelBlockedPairs(spark: SparkSession, dir: String,
                        threshold: Double = 0.30): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("label"), col("vec_id").as("v1"),
      col("embedding").as("emb1"))
    val b = e.select(col("label"), col("vec_id").as("v2"),
      col("embedding").as("emb2"))
    a.join(b, Seq("label"))
      .filter(col("v1") < col("v2"))
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "emb1", "emb2"))
      .filter(col("sim_raw") >= threshold)
      .select(col("v1"), col("v2"), col("label"),
        round(col("sim_raw").cast("double"), 4).as("sim"))
      .orderBy(col("v1"), col("v2"))
  }

  /** (vec_id[, label], 1-based dim, value) relation. */
  private def dims(e: DataFrame, withLabel: Boolean): DataFrame = {
    val base = if (withLabel) e.select(col("vec_id"), col("label"),
      posexplode(col("embedding"))) else e.select(col("vec_id"),
      posexplode(col("embedding")))
    base.withColumn("d", col("pos") + 1).drop("pos")
      .withColumnRenamed("col", "val")
  }

  /** Semantic quality gate (the FineWeb-Edu / classifier-filter shape,
    * with a nearest-centroid scorer standing in for the model): anchor =
    * the exact per-dim mean of the label-0 embeddings, every document is
    * scored by cosine(embedding, anchor), and the top-k review queue
    * (doc_id, lang, source, score) comes back — the query a curation
    * team runs to calibrate a "keep the most reference-like fraction"
    * gate before committing it to the pipeline.
    *
    * Determinism across engines: the anchor means follow
    * [[labelCentroids]]'s convention (order-independent DECIMAL sums,
    * ONE double division after), and both dot products and squared
    * norms accumulate as DECIMAL(38,15) so no float sum depends on
    * partition order; the final cosine divides identical doubles.
    * Plan: the 64-row anchor broadcasts into the dims relation, one
    * doc-keyed hash-agg scores everything, TakeOrderedAndProject keeps
    * k — at 100 TB this is one map + one partial-combined agg over the
    * corpus, the same cost as any per-doc feature. (A learned linear
    * probe scores identically in shape: weights broadcast, map,
    * aggregate.) */
  def semanticQuality(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val dv = dims(emb(spark, dir), withLabel = true)
    val anchor = dv.filter(col("label") === 0)
      .groupBy(col("d"))
      .agg((sum(col("val").cast("double").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
    val scored = dv.join(broadcast(anchor), "d")
      .groupBy(col("vec_id"))
      .agg(
        sum((col("val").cast("double") * col("c")).cast("decimal(38,15)"))
          .cast("double").as("dot"),
        sum((col("val").cast("double") * col("val").cast("double"))
          .cast("decimal(38,15)")).cast("double").as("na2"))
    val anchorNorm = anchor
      .agg(sum((col("c") * col("c")).cast("decimal(38,15)"))
        .cast("double").as("nc2"))
    scored.crossJoin(anchorNorm) // 1-row scalar
      .select(col("vec_id").as("doc_id"),
        (col("dot") / (sqrt(col("na2")) * sqrt(col("nc2")))).as("score"))
      .join(Tables(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source")), "doc_id")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("source"),
        round(col("score"), 4).as("score"))
  }

  /** Random-hyperplane (SimHash-for-vectors) LSH: 32 signed projections
    * against deterministic md5-derived ±1 planes, banded 4x8; candidates
    * share an 8-bit band bucket and are exact-verified with f32 cosine;
    * the global top-20 is returned.
    *
    * Scale shape: signature build is ONE narrow per-row map (the custom
    * [[graft.expressions.HyperplaneLshBuckets]] expression — no explode,
    * no join, no shuffle); the only shuffles are the (band, bucket)
    * candidate equi-join and the final top-k. The pair space never
    * materializes. Projection determinism: fixed d-order double
    * accumulation per row, partitioning-independent (see the expression's
    * scaladoc for the oracle-equivalence argument). */
  def annLshTopPairs(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = emb(spark, dir)
    // candidates are emitted WITHIN each (band, bucket) group — one
    // shuffle on the bucket key instead of the two a self-join pays, and
    // the in-task bucket array is collision-group-sized (8 bytes per
    // member); same candidate set (see DedupOps.lshCandidatePairs for the
    // m(m-1)/2 argument)
    val cand = e.select(col("vec_id"),
        posexplode(ExprColumns.hyperplaneLsh(spark, "embedding")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("vec_id"))).as("vs"))
      .filter(size(col("vs")) > 1)
      .select(explode(expr(
        """flatten(transform(vs, (x, i) ->
             transform(slice(vs, i + 2, size(vs)),
               y -> struct(x AS v1, y AS v2))))""")).as("p"))
      .select(col("p.v1"), col("p.v2"))
      .distinct()
    val ea = e.select(col("vec_id").as("v1"), col("embedding").as("emb1"))
    val eb = e.select(col("vec_id").as("v2"), col("embedding").as("emb2"))
    cand.join(ea, "v1").join(eb, "v2")
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "emb1", "emb2"))
      .orderBy(col("sim_raw").desc, col("v1"), col("v2"))
      .limit(k)
      .select(col("v1"), col("v2"),
        round(col("sim_raw").cast("double"), 4).as("sim"))
  }

  /** IVF-style ANN: coarse quantization by label centroid (exact-decimal
    * means), probe the 2 nearest centroids, exact f32 top-10 inside the
    * probed partitions. The 100 TB shape: centroids are a tiny broadcast
    * relation; the probe prunes ~80% of the corpus before any exact math. */
  def ivfTopK(spark: SparkSession, dir: String,
              queryId: Long = 0L, nProbe: Int = 2, k: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val q = dv.filter(col("vec_id") === queryId)
      .select(col("d"), col("val").as("qv"))
    val score = cent.join(broadcast(q), "d")
      .groupBy(col("label"))
      .agg((sum(d9(col("qv")) * d9(col("c"))).cast("double") /
        (sqrt(sum(d9(col("qv")) * d9(col("qv"))).cast("double")) *
         sqrt(sum(d9(col("c")) * d9(col("c"))).cast("double")))).as("s"))
    val probe = score.orderBy(col("s").desc, col("label"))
      .limit(nProbe).select(col("label"))
    val qemb = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    e.join(broadcast(probe), "label")
      .filter(col("vec_id") =!= queryId)
      .join(broadcast(qemb))
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"),
        round(col("sim_raw").cast("double"), 4).as("sim"))
  }

  /** The IVF serving-tuning curve — recall vs cost as a function of
    * `nprobe`, the number every deployment actually turns: for each probe
    * width in {1, 2, 4}, every query's top-10 from the probed cells is
    * scored against the exact brute-force ground truth, and the row
    * reports the candidate count (the cost the setting buys) next to the
    * recall it delivers. The capacity-planning companion to
    * [[recallAt10]]'s single-setting eval: the three rows ARE the knee
    * curve an ANN rollout reads before fixing nprobe.
    *
    * One job, no per-setting re-execution: cell ranking per query is
    * computed ONCE (centroid cosine, [[ivfTopK]]'s exact-decimal means),
    * each candidate carries its cell's rank, and the 3-row probe-width
    * dimension joins on `cell_rank <= nprobe` — so widening the sweep
    * grid re-ranks the SAME candidate relation instead of re-probing the
    * corpus; that relation is then consumed exactly once (rank window +
    * broadcast truth-flag join + one agg yields candidate counts AND
    * hits together). Ground truth is the corpus x broadcast-queries
    * pass [[recallAt10]] uses — at 100 TB that side runs on a query
    * SAMPLE, exactly how tuning dashboards are built — folded to
    * (queries x k) rows and broadcast. Centroids, query vectors, and
    * the probed-cell relation all broadcast (cells x queries rows). */
  def nprobeSweep(spark: SparkSession, dir: String,
                  nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val qd = dv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("d"), col("val").as("qv"))
    // per-(query, cell) centroid cosine -> each query's cell ranking
    val score = cent.join(broadcast(qd), "d")
      .groupBy(col("q_id"), col("label"))
      .agg((sum(d9(col("qv")) * d9(col("c"))).cast("double") /
        (sqrt(sum(d9(col("qv")) * d9(col("qv"))).cast("double")) *
         sqrt(sum(d9(col("c")) * d9(col("c"))).cast("double")))).as("s"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("s").desc, col("label"))
    val probed = score
      .withColumn("cell_rk", row_number().over(wCell).cast("long"))
      .filter(col("cell_rk") <= 4)
      .select(col("q_id"), col("label"), col("cell_rk"))
    val qe = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val np = spark.range(1)
      .select(explode(array(lit(1L), lit(2L), lit(4L))).as("nprobe"))
    // candidates scanned once, widened per probe setting by the rank join
    val cand = e.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(qe), Seq("q_id"))
      .join(broadcast(np), col("cell_rk") <= col("nprobe"))
    val wBrute = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    val brute = e.join(broadcast(qe))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .withColumn("rn", row_number().over(wBrute))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    // candidate count + hit count in ONE consumption of the candidate
    // relation: the (queries x k)-row ground truth broadcasts as a hit
    // flag, and the agg counts ALL candidate rows while summing hits
    // only where the rank filter passes — a separate count branch would
    // re-run the corpus candidate join
    val wTop = Window.partitionBy(col("nprobe"), col("q_id"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    cand
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .withColumn("rn", row_number().over(wTop))
      .join(broadcast(brute), Seq("q_id", "vec_id"), "left_outer")
      .groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("rn") <= k, coalesce(col("hit"), lit(0L)))
          .otherwise(lit(0L))).as("n_hits"))
      .select(col("nprobe"), col("n_cand"), col("n_hits"),
        round(col("n_hits").cast("double") /
          (nQueries * k).toDouble, 6).as("recall"))
      .orderBy(col("nprobe"))
  }

  /** Batch ANN lookup — the realistic serving shape: MANY query vectors
    * resolved in one job. Each query (vec_id < nQueries) retrieves its
    * top-k same-label neighbors: an equi-join on the block key (label
    * here; IVF cluster id at scale) followed by a per-query ranking
    * window. One shuffle for the join, one for the window — cost grows
    * with candidates, never with |queries| x |corpus|. */
  def batchLabelTopK(spark: SparkSession, dir: String,
                     nQueries: Int = 5, k: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label"),
        col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    e.join(broadcast(q), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("vec_id"),
        col("label"), round(col("sim_raw").cast("double"), 4).as("sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** ANN quality evaluation — recall@10 of the label-blocked (IVF-style)
    * search against the exact brute-force ground truth, per query vector.
    * THE metric that decides whether a blocking strategy is shippable:
    * both rankings are computed in one job (brute = corpus x broadcast
    * queries + per-query rank window; blocked = the candidate equi-join
    * [[batchLabelTopK]] uses), hits = a semi-join of the two top-k sets on
    * (query, neighbor), and queries whose blocked set misses everything
    * still report 0/10 via the left join back to the query list.
    *
    * Scale: cost is |queries| x |corpus| only on the brute side — at
    * 100 TB the ground truth is computed for a SAMPLE of queries (this
    * plan, smaller q set) while the blocked side stays cheap, which is
    * exactly how production recall dashboards are built. */
  def recallAt10(spark: SparkSession, dir: String,
                 nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    def topk(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      cand.filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim_raw",
          ExprColumns.cosineF32(spark, "embedding", "q_emb"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("vec_id"))
    }
    val brute = topk(e.join(broadcast(q)))
    val blocked = topk(e.join(broadcast(q), col("label") === col("q_label")))
    val hits = brute.join(blocked, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    q.select(col("q_id"))
      .join(hits, Seq("q_id"), "left_outer")
      .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k, 6)
          .as("recall_at_10"))
      .orderBy(col("q_id"))
  }

  /** Per-label centroid profile (first 8 dims) — the embedding-column
    * aggregation primitive (posexplode -> exact-decimal mean -> double). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val dv = dims(emb(spark, dir), withLabel = true)
    dv.filter(col("d") <= 8)
      .groupBy(col("label"), col("d"))
      .agg((sum(col("val").cast("double").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"),
        count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("d"))
  }

  /** Symmetric int8 quantization of the embedding corpus (the 4x vector
    * compression step before an ANN index build): per vector,
    * scale = 127/max|v|, q_i = round(v_i * scale), plus the per-label
    * census a pipeline monitors — vector count, exact quantized mass,
    * saturated-lane count, and the worst absolute reconstruction error.
    *
    * Entirely map-side per vector (HOFs over the array; no explode),
    * then one tiny per-label aggregate. Every reported number is either
    * exact integer math or a deterministic double (identical expression
    * shape in the oracle), so the gate hash-compares bit-for-bit. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .withColumn("maxabs", expr("array_max(transform(embedding, x -> abs(x)))"))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs").cast("double"))
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INT))"))
      .withColumn("err", expr(
        """array_max(zip_with(embedding, q,
             (x, v) -> abs(CAST(x AS DOUBLE) - CAST(v AS DOUBLE) / scale)))"""))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(expr("aggregate(q, 0L, (a, x) -> a + CAST(x AS LONG))")).as("sum_q"),
        sum(expr("size(filter(q, v -> abs(v) = 127))").cast("long")).as("n_sat"),
        round(max(col("err")), 6).as("max_err"))
      .orderBy(col("label"))

  /** One Lloyd iteration of k-means: the k=8 lowest-vec_id vectors seed
    * the centroids, every corpus vector is assigned to its most-similar
    * seed (cosine, f32-exact — ties to the smallest seed id), and the
    * output is the per-seed assignment census (size + mean similarity,
    * decimal-exact mean).
    *
    * Plan shape — the 100 TB k-means step: the seed set collapses to ONE
    * broadcast row carrying an array of (seed_id, vector); assignment is
    * a narrow map (a `transform` HOF computes all k similarities per row
    * and `array_max` takes the argmax — no k-way row expand, no window
    * sort, nothing shuffles except the final k-row aggregate, which
    * partial-aggregates map-side). A full Lloyd loop repeats this step
    * with re-derived centroids; each step stays one broadcast + one
    * narrow map + one tiny agg. */
  def kmeansAssignIter(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val seedArr = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("seed_id"), col("embedding").as("seed_emb"))
      .agg(array_sort(collect_list(struct(col("seed_id"), col("seed_emb"))))
        .as("seeds"))
    e.join(broadcast(seedArr))
      .withColumn("best", expr(
        """array_max(transform(seeds, s ->
             struct(graft_cosine_f32(embedding, s.seed_emb) AS sim,
                    -s.seed_id AS nsid)))"""))
      .select(col("vec_id"), (-col("best.nsid")).as("seed_id"),
        col("best.sim").as("sim"))
      .groupBy(col("seed_id"))
      .agg(count(lit(1)).as("n_assigned"),
        round(sum(col("sim").cast("double").cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 6).as("avg_cos"))
      .orderBy(col("seed_id"))
  }

  /** TWO chained Lloyd iterations with centroid RE-DERIVATION — the full
    * loop shape [[kmeansAssignIter]]'s scaladoc promises: assign (seeds =
    * the k lowest-vec_id vectors) -> recompute each cluster's centroid as
    * the per-dimension mean of its members -> re-assign against the new
    * centroids -> report the final census.
    *
    * Every step keeps the one-iteration plan shape: centroids collapse to
    * ONE broadcast row carrying an array of (cid, vector); assignment is
    * a narrow map (transform HOF + array_max argmax, ties to the smallest
    * cid). The re-derivation is the only extra shuffle per iteration —
    * posexplode to (cid, dim) then an exact-DECIMAL mean, dimension-
    * bounded output (k x d rows at ANY corpus size). Determinism across
    * engines: means accumulate in DECIMAL(18,9) and are cast to FLOAT
    * lanes on both sides, so the second assignment compares bit-identical
    * f32 cosines. At 100 TB the loop repeats this step N times; per-round
    * lineage stays flat because each round's centroid relation is a new
    * k-row aggregate, not a growing plan. */
  /** (cid, cemb) centroid rows -> ONE broadcast row carrying the sorted
    * centroid array — the Lloyd-loop kernel shared by [[kmeansLloydTwo]]
    * and [[kmeansInertia]]. */
  private[operators] def kmCentArr(cent: DataFrame): DataFrame =
    cent.agg(array_sort(collect_list(struct(col("cid"), col("cemb"))))
      .as("cents"))

  /** Narrow-map assignment of every vector to its most-cosine-similar
    * centroid (ties to the smallest cid): transform HOF + array_max
    * argmax, no row expand, no window sort. */
  private[operators] def kmAssign(e: DataFrame, centArr: DataFrame): DataFrame =
    e.join(broadcast(centArr))
      .withColumn("best", expr(
        """array_max(transform(cents, s ->
             struct(graft_cosine_f32(embedding, s.cemb) AS sim,
                    -s.cid AS ncid)))"""))
      .select(col("vec_id"), col("embedding"),
        (-col("best.ncid")).as("cid"), col("best.sim").as("sim"))

  /** Centroid re-derivation from an assignment: per-dimension
    * exact-DECIMAL means, cast to f32 lanes — k x d output at ANY
    * corpus size. */
  private[operators] def kmRederive(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")))
      .withColumn("d", col("pos") + 1)
      .groupBy(col("cid"), col("d"))
      .agg((sum(col("col").cast("double").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(col("cid"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(d, c))), x -> CAST(x.c AS FLOAT))")
        .as("cemb"))

  def kmeansLloydTwo(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val seeds = kmCentArr(e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    // iteration 1: assign, then re-derive centroids (exact-decimal means,
    // f32 lanes; k x d output regardless of corpus size)
    val cent2 = kmCentArr(kmRederive(kmAssign(e, seeds)))
    // iteration 2: assign against the re-derived centroids
    kmAssign(e, cent2)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        round(sum(col("sim").cast("double").cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 6).as("avg_cos"))
      .orderBy(col("cid"))
  }

  /** Lloyd-loop CONVERGENCE measurement — the "did the step help"
    * number a clustering job logs each round, closing the train→measure
    * loop the way [[graft.operators.Curation]]'s probe-AUC row does for
    * the quality classifier: the assignment-quality census (vector
    * count, mean and worst assigned cosine) after iteration 1 (seed
    * centroids) and after iteration 2 (re-derived centroids),
    * side-by-side. avg_cos must rise and min_cos must not fall for the
    * step to have helped; in k-means terms 1−avg_cos is the (cosine)
    * inertia per vector.
    *
    * Plan shape: exactly two [[kmAssign]] narrow maps (each one
    * broadcast join + map, nothing corpus-sized shuffles) sharing one
    * [[kmRederive]] dimension-bounded aggregate; the two assignment
    * relations union BEFORE the 2-row census agg, so both rounds flow
    * through a single partial-aggregated pass. */
  def kmeansInertia(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val seeds = kmCentArr(e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val a1 = kmAssign(e, seeds)
    val a2 = kmAssign(e, kmCentArr(kmRederive(a1)))
    a1.select(lit(1L).as("iter"), col("sim"))
      .union(a2.select(lit(2L).as("iter"), col("sim")))
      .groupBy(col("iter"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("sim").cast("double").cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 6).as("avg_cos"),
        round(min(col("sim").cast("double")), 6).as("min_cos"))
      .orderBy(col("iter"))
  }

  /** BINARY-quantization recall — the 1-bit-per-dimension rung below
    * [[quantSweep]]'s int4 (sign bits pack 64 dims into ONE int64;
    * 32x smaller than f32, and candidate scoring becomes a single
    * XOR+popcount): recall@10 of Hamming-distance ranking over the
    * packed sign bits against the exact f32-cosine ground truth, per
    * query — the memory-floor operating point every binary-embedding
    * deployment reads first.
    *
    * Determinism: the sign test is a float-zero comparison (exact in
    * both engines), packing is a bitwise-OR fold, Hamming is
    * bit_count(xor) — all integers; ranks tie-break on vec_id. Scale
    * shape: one narrow packing map (corpus → 8 bytes/vector), the
    * 5-query broadcast, per-query ≤10 rank windows. */
  def binaryRecall(spark: SparkSession, dir: String,
                   nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    // two 32-bit halves: a 1L << 63 pack would overflow the oracle
    // engine's checked shift, and 32-bit lanes mirror exactly
    def half(lo: Int): String =
      s"""aggregate(zip_with(slice(embedding, $lo, 32), sequence(0, 31),
           (x, j) -> IF(x > CAST(0.0 AS FLOAT), shiftleft(1L, j), 0L)),
         0L, (acc, b) -> acc | b)"""
    val packed = e.select(col("vec_id"), col("embedding"),
      expr(half(1)).as("b_lo"), expr(half(33)).as("b_hi"))
    val q = packed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("b_lo").as("q_lo"), col("b_hi").as("q_hi"))
    val wH = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming"), col("vec_id"))
    val binTop = packed.join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        expr("CAST(bit_count(b_lo ^ q_lo) + bit_count(b_hi ^ q_hi) AS BIGINT)"))
      .withColumn("rn", row_number().over(wH))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("vec_id"))
    val truth = e.join(broadcast(q.select(col("q_id"), col("q_emb"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim_raw", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .withColumn("rn", row_number().over(wC))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"))
    val hits = binTop.join(truth, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    q.select(col("q_id")).join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / k, 6)
          .as("recall_at_10"))
      .orderBy(col("q_id"))
  }

  /** Embedding DIMENSION-truncation sweep (the Matryoshka / MRL serving
    * knob): recall@10 of brute-force cosine over the first d ∈
    * {16, 32, 64} coordinates against the full-dimension ground truth
    * — what a deployment reads before storing truncated vectors to cut
    * index memory 4x. Each operating point is an honest re-rank over
    * the sliced coordinates (truncation changes every score; nothing
    * shareable but the ground truth, which is computed ONCE as the
    * d = 64 case).
    *
    * Determinism: ranks tie-break on vec_id after the f32 cosine over
    * sliced arrays, identical window in both engines. Scale shape: the
    * 5-query set broadcasts; per d, one narrow scoring map + a
    * per-query ≤10 rank window (WindowGroupLimit-pruned); the k axis
    * costs |dims| passes over queries × corpus, never corpus². */
  def dimSweep(spark: SparkSession, dir: String,
               nQueries: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def topk(d: Int): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      e.join(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim_raw", expr(
          s"graft_cosine_f32(slice(embedding, 1, $d), slice(q_emb, 1, $d))"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("q_id"), col("vec_id"))
    }
    val truth = topk(64)
    Seq(16, 32, 64).map { d =>
      topk(d).join(truth, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d.toLong).as("dim"), col("n_hits"),
          round(col("n_hits").cast("double") / (nQueries * k), 6)
            .as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("dim"))
  }

  /** k-means SEEDING sweep — the initialization knob every Lloyd run
    * inherits silently: the house first-k-vec_ids seeding (cheap,
    * deterministic, but biased toward early rows) against a
    * deterministic pseudo-random pick (the 8 vec_ids with the
    * smallest md5("seed:" || vec_id) — the hash-coin discipline of
    * `text_span_corruption` applied to seed selection), each scored
    * by one assignment pass (members, mean and worst assigned
    * cosine). The row that says whether the convenient seeding is
    * costing assignment quality on this corpus.
    *
    * Scale shape: both seed sets are 8-row TakeOrdered reductions;
    * each scoring pass is the [[kmeansAssignIter]] broadcast-argmax
    * narrow map + an 8-key agg — the kernel ×2, nothing new. */
  def seedSweep(spark: SparkSession, dir: String): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val first8 = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val hash8 = e
      .withColumn("h", md5(concat(lit("seed:"), col("vec_id").cast("string"))))
      .orderBy(col("h"), col("vec_id")).limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    Seq(("0_first8", first8), ("1_hash8", hash8)).map { case (name, seeds) =>
      kmAssign(e, kmCentArr(seeds))
        .agg(count(lit(1)).as("n_vecs"),
          round(sum(col("sim").cast("double").cast("decimal(18,9)"))
            .cast("double") / count(lit(1)), 6).as("avg_cos"),
          round(min(col("sim").cast("double")), 6).as("min_cos"))
        .select(lit(name).as("seeding"), col("n_vecs"), col("avg_cos"),
          col("min_cos"))
    }.reduce(_.unionByName(_)).orderBy(col("seeding"))
  }

  /** Product-quantization ANN with asymmetric-distance (ADC) scoring —
    * the memory-bound 100 TB serving path the IVF/int8 variants stop
    * short of: the 64-dim corpus compresses to M=16 codes per vector
    * (one byte each at 64 codewords — 16x smaller than f32), and
    * queries rank the corpus against RECONSTRUCTED vectors without ever
    * touching the original embeddings.
    *
    * Codebooks: the 64 lowest-vec_id vectors seed 64 codewords per
    * 4-dim subspace, then TWO Lloyd refinements per subspace (assign
    * every corpus sub-vector to its L2-nearest codeword, recompute
    * codewords as exact-DECIMAL member means) — the standard PQ
    * training loop; untrained seed codebooks measured 2-3x worse on the
    * quality gate. Encode = the L2-nearest trained codeword (exact
    * double math, ties to the smallest code position). ADC scores
    * cosine(query, reconstruction) with the same f32 expression every
    * exact path uses.
    *
    * The gate is NEIGHBOR QUALITY, not set identity: on a
    * near-orthogonal corpus (max pairwise cosine ~0.37 here) top-10
    * membership under quantization is intrinsically unstable (measured
    * recall@10 wobbles 0.3-0.8 across SFs at fixed parameters), but the
    * exact cosine MASS of the returned set is stable — so the boolean
    * asserts sum(exact cos of PQ's top-10) >= 0.8 * sum(exact cos of
    * the true top-10), cross-multiplied in exact DECIMAL (measured
    * ratio 0.88-0.97 at sf0.001/0.01/0.1). That is also the metric a
    * curation pipeline cares about: the neighbors PQ serves are nearly
    * as close, whether or not they are the identical ids.
    *
    * Plan shape: each codebook collapses to ONE broadcast row (16 x 64
    * sub-vectors, ~16 KB); each training pass is one corpus-wide
    * shuffle (sub-vector assign + dim-explode to a (m, cid, d)-bounded
    * mean — 16 x 64 x 4 = 4096 output rows at ANY corpus size; at
    * 100 TB this pass runs on a corpus SAMPLE, exactly how production
    * PQ indexes are trained, and the shape transfers unchanged); encode
    * + reconstruct is a narrow per-row map whose argmin kernel is the
    * custom [[graft.expressions.PqAssign]] expression — no explode, no
    * shuffle; the remaining shuffles are the two per-query ranking
    * windows, and the exact side exists only because this query REPORTS
    * the gate — a pure serving path ranks reconstructions alone. Output
    * is oracle-hash-gated on the exact side (top-1 neighbor + its f32
    * cosine, bit-identical cross-engine) plus the within-bound quality
    * boolean for the PQ side. */
  private val PqM = 16; private val PqSub = 4; private val PqK = 64

  /** PQ codebook training, refactored out of [[pqAdcRecall]] so the
    * composed serving pipeline ([[ivfPqTopK]]) trains the identical
    * index. One Lloyd pass: assign every row's sub-vectors to their
    * L2-nearest codewords ([[graft.expressions.PqAssign]] — tight
    * primitive loops; the HOF rendering it replaces interpreted
    * M x K x SUB boxed lambda steps per row and dominated the query's
    * runtime, and PqSpec pins the two bit-equal), then re-derive every
    * codeword as the exact-decimal mean of its assigned members; empty
    * codewords drop out and positions re-index deterministically
    * (sorted by original cid). Seeds = the K lowest-vec_id vectors;
    * TWO refinement passes, as measured in [[pqAdcRecall]]'s scaladoc. */
  private def pqCodebook(spark: SparkSession, e: DataFrame): DataFrame = {
    ExprColumns.register(spark)
    def refine(cbDf: DataFrame): DataFrame =
      e.join(broadcast(cbDf))
        .select(col("embedding"),
          posexplode(ExprColumns.pqAssign(spark, "embedding", "cb")))
        .withColumnRenamed("pos", "m").withColumnRenamed("col", "cid")
        .select(col("m"), col("cid"),
          posexplode(expr(s"slice(embedding, m * $PqSub + 1, $PqSub)")))
        .withColumnRenamed("pos", "d").withColumnRenamed("col", "v")
        .groupBy(col("m"), col("cid"), col("d"))
        .agg((sum(col("v").cast("double").cast("decimal(18,9)")).cast("double") /
          count(lit(1))).as("c"))
        .groupBy(col("m"), col("cid"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(d, c))), x -> CAST(x.c AS FLOAT))")
          .as("cw"))
        .groupBy(col("m"))
        .agg(array_sort(collect_list(struct(col("cid"), col("cw")))).as("cws"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(m, cws))), x -> transform(x.cws, y -> y.cw))")
          .as("cb"))
    // seed codebook, ONE broadcast row: cb[m][cid] = sub-vector m of
    // seed cid (cid = rank among the K lowest vec_ids)
    val cb0 = e.orderBy(col("vec_id")).limit(PqK)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("seeds"))
      .select(expr(
        s"""transform(sequence(0, ${PqM - 1}), m ->
              transform(seeds, s -> slice(s.embedding, m * $PqSub + 1, $PqSub)))""")
        .as("cb"))
    refine(refine(cb0))
  }

  /** Encode + reconstruct, map-side: concatenate each row's chosen
    * codewords back to a 64-dim f32 vector; only (c_id, recon) ever
    * leaves the map. */
  private def pqRecon(e: DataFrame, cb: DataFrame): DataFrame =
    e.join(broadcast(cb))
      .select(col("vec_id").as("c_id"), expr(
        """flatten(transform(graft_pq_assign(embedding, cb), (c, m) ->
             element_at(element_at(cb, m + 1), c + 1)))""").as("recon"))

  def pqAdcRecall(spark: SparkSession, dir: String,
                  nQueries: Int = 3, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val cb = pqCodebook(spark, e)
    val recon = pqRecon(e, cb)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // exact similarities of every (query, candidate) pair — ground truth
    val exScored = e.select(col("vec_id").as("c_id"), col("embedding"))
      .join(broadcast(q)).filter(col("c_id") =!= col("q_id"))
      .withColumn("ex_sim", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .select(col("q_id"), col("c_id"), col("ex_sim"))
    def topk(scored: DataFrame, simCol: Column): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim_raw").desc, col("c_id"))
      scored.withColumn("sim_raw", simCol)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
    }
    val pqTop = topk(recon.join(broadcast(q)).filter(col("c_id") =!= col("q_id")),
      ExprColumns.cosineF32(spark, "recon", "q_emb"))
      .select(col("q_id"), col("c_id"))
    val exTop = topk(exScored, col("ex_sim"))
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    // every relation below is (nQueries x k)-bounded, but post-window
    // aggregates carry no size stats, so the joins need explicit
    // broadcast hints to avoid sort-merge plans
    val pqMass = exScored.join(broadcast(pqTop), Seq("q_id", "c_id"))
      .groupBy(col("q_id")).agg(sum(d9(col("ex_sim"))).as("pq_mass"))
    val exMass = exTop.groupBy(col("q_id"))
      .agg(sum(d9(col("ex_sim"))).as("ex_mass"))
    exTop.filter(col("rn") === 1)
      .select(col("q_id"), col("c_id").as("exact_top1"),
        round(col("ex_sim").cast("double"), 4).as("exact_top1_sim"))
      .join(broadcast(exMass), Seq("q_id"))
      .join(broadcast(pqMass), Seq("q_id"), "left_outer")
      // quality gate, cross-multiplied in exact decimal: 10*pq >= 8*ex
      .select(col("q_id"), col("exact_top1"), col("exact_top1_sim"),
        (coalesce(col("pq_mass"), lit(0).cast("decimal(18,9)")) * 10 >=
          col("ex_mass") * 8).as("pq_quality_ok"))
      .orderBy(col("q_id"))
  }

  /** The composed ANN SERVING query — the three index rungs that exist
    * here as separate rows ([[ivfTopK]] coarse probe, [[pqAdcRecall]]'s
    * PQ/ADC ranking, exact refinement) chained the way a production
    * vector store executes a lookup:
    *
    *   1. IVF coarse probe: score the query against the per-cell
    *      centroids (exact-decimal means), keep the nProbe best cells —
    *      prunes ~(1 − nProbe/nlist) of the corpus before any per-vector
    *      math;
    *   2. ADC shortlist: within the probed cells, rank candidates by
    *      cosine(query, PQ reconstruction) — the memory-resident scan
    *      (16x compressed codes) — and keep a `shortlist`-sized pool;
    *   3. exact re-rank: fetch full vectors ONLY for the shortlist and
    *      rank the final top-k by exact f32 cosine.
    *
    * Returns (finalTopK, ivfExactTopK): the pipeline's re-ranked top-k
    * and the exact top-k within the same probed cells (the quality
    * reference that isolates what the PQ shortlist loses). Both carry
    * (q_id, rk, c_id, ex_sim) with exact f32 similarities.
    *
    * Scale shape: centroids, probe table (nQueries x nProbe rows), and
    * query vectors broadcast; the candidate relation is the corpus
    * pruned by the probe equi-join on the cell key; the ADC scan
    * touches only codes (recon is a map-side rebuild, no shuffle); the
    * exact fetch is shortlist-sized. Per-query rank windows partition
    * by q_id — no global window anywhere. At 100 TB with trained nlist
    * (≥ √n cells, see [[labelBlockedPairs]]'s invariant) this is the
    * FAISS IVF-PQ + refine layout expressed relationally. */
  private[graft] def ivfPqPipeline(spark: SparkSession, dir: String,
      nQueries: Int, nProbe: Int, shortlist: Int, k: Int)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val qd = dv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("d"), col("val").as("qv"))
    val cellScore = cent.join(broadcast(qd), "d")
      .groupBy(col("q_id"), col("label"))
      .agg((sum(d9(col("qv")) * d9(col("c"))).cast("double") /
        (sqrt(sum(d9(col("qv")) * d9(col("qv"))).cast("double")) *
         sqrt(sum(d9(col("c")) * d9(col("c"))).cast("double")))).as("s"))
    val probes = cellScore
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("label"))))
      .filter(col("rn") <= nProbe)
      .select(col("q_id"), col("label"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val cand = e.join(broadcast(probes), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"), col("embedding"))
    def rank(scored: DataFrame, simCol: String, limit: Int): DataFrame =
      scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col(simCol).desc, col("c_id"))))
        .filter(col("rk") <= limit)
    val cb = pqCodebook(spark, e)
    val short = rank(cand.select(col("q_id"), col("c_id"))
      .join(pqRecon(e, cb), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("adc_sim", ExprColumns.cosineF32(spark, "recon", "q_emb")),
      "adc_sim", shortlist)
      .select(col("q_id"), col("c_id"))
    val finalTopK = rank(short
      .join(e.select(col("vec_id").as("c_id"), col("embedding")), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("ex_sim", ExprColumns.cosineF32(spark, "embedding", "q_emb")),
      "ex_sim", k)
      .select(col("q_id"), col("rk"), col("c_id"), col("ex_sim"))
    val ivfExact = rank(cand
      .join(broadcast(q), Seq("q_id"))
      .withColumn("ex_sim", ExprColumns.cosineF32(spark, "embedding", "q_emb")),
      "ex_sim", k)
      .select(col("q_id"), col("rk"), col("c_id"), col("ex_sim"))
    (finalTopK, ivfExact)
  }

  /** End-to-end IVF → PQ/ADC → exact-refine serving query (see
    * [[ivfPqPipeline]]). The oracle-gated output follows
    * [[pqAdcRecall]]'s contract: the DETERMINISTIC exact side (each
    * query's exact top-1 within its probed cells — DuckDB replays the
    * whole coarse probe + exact ranking) plus the quality boolean the
    * Spark side must prove: the exact-cosine MASS of the pipeline's
    * final top-k is ≥ 0.8x the mass of the exact top-k over the same
    * probed cells (cross-multiplied in exact DECIMAL; set identity
    * would be flaky on this near-orthogonal corpus — see
    * [[pqAdcRecall]]'s scaladoc — but re-ranking recovers ADC's
    * ordering noise, so the measured ratio sits near 1). */
  def ivfPqTopK(spark: SparkSession, dir: String, nQueries: Int = 3,
                nProbe: Int = 2, shortlist: Int = 50, k: Int = 10): DataFrame = {
    val (finalTopK, ivfExact) =
      ivfPqPipeline(spark, dir, nQueries, nProbe, shortlist, k)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val pqMass = finalTopK.groupBy(col("q_id"))
      .agg(sum(d9(col("ex_sim"))).as("pq_mass"))
    val exMass = ivfExact.groupBy(col("q_id"))
      .agg(sum(d9(col("ex_sim"))).as("ex_mass"))
    ivfExact.filter(col("rk") === 1)
      .select(col("q_id"), col("c_id").as("ivf_top1"),
        round(col("ex_sim").cast("double"), 4).as("ivf_top1_sim"))
      .join(broadcast(exMass), Seq("q_id"))
      .join(broadcast(pqMass), Seq("q_id"), "left_outer")
      .select(col("q_id"), col("ivf_top1"), col("ivf_top1_sim"),
        (coalesce(col("pq_mass"), lit(0).cast("decimal(18,9)")) * 10 >=
          col("ex_mass") * 8).as("pipeline_quality_ok"))
      .orderBy(col("q_id"))
  }

  /** One power-iteration step toward the corpus's top principal
    * direction: w = Xᵀ(X·v₀) with the all-ones seed v₀ — the PCA/
    * spectral-analysis primitive (dominant eigenvector of the Gram
    * matrix up to normalization), and the building block for PCA
    * whitening or spectral dedup over an embedding corpus.
    *
    * Exactness contract: every coordinate is quantized ONCE to integer
    * micro-units (round(x·10⁶) as BIGINT — deterministic in both
    * engines), after which the entire iteration is EXACT long
    * arithmetic: row dots s_i = Σ_j xq_ij (≤64·3·10⁵), products
    * xq_ij·s_i ≤ ~10¹³, dimension sums over the corpus ≤ ~10¹⁶ — far
    * under 2⁶³, no float accumulation anywhere. Only the final
    * normalization divides in double, per dimension, once; the squared
    * norm is summed as exact DECIMAL of deterministic per-term doubles.
    *
    * Plan: one posexplode, one hash-agg on vec_id (the row dots), one
    * co-partitioned join back on vec_id (reuses the agg's hash
    * partitioning), one 64-key dimension agg (partial map-side, final
    * trivially small). At 100 TB every stage is linear in the corpus
    * with dimension-bounded output; nothing driver-side. */
  /** k-NN GRAPH construction census (k=3, within label blocks): every
    * vector's top-k cosine neighbors as DIRECTED edges, with the
    * per-label readout a graph-ANN build (HNSW/NSG init) or
    * graph-based dedup reads first — node/edge counts, RECIPROCITY
    * (how many edges run both ways; low reciprocity predicts poor
    * graph-search recall), and mean edge similarity. Blocking bounds
    * the pair space exactly as [[labelBlockedPairs]]; ranking is a
    * per-source-vector rank≤k window (WindowGroupLimit pushes the
    * limit map-side); the reciprocity probe is a self-semi-join of the
    * k·|V|-sized EDGE relation, never the pair space. Edge
    * similarities quantize to DECIMAL(18,9) before the mean (the f32
    * kernel is bit-identical cross-engine, so the quantized values
    * agree exactly). */
  /** Directed top-k cosine edge set within label blocks: (label, v1,
    * v2, sim) — the shared kernel of [[knnGraph]] and
    * [[Graph.linkPredict]], so the census and the predictor can never
    * disagree on what the graph IS. Blocking bounds the pair space;
    * the rank≤k window is per-source (WindowGroupLimit pushes the
    * limit map-side). */
  private[graft] def knnEdges(spark: SparkSession, dir: String,
      k: Int): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("label"), col("vec_id").as("v1"),
      col("embedding").as("emb1"))
    val b = e.select(col("label"), col("vec_id").as("v2"),
      col("embedding").as("emb2"))
    val w = Window.partitionBy(col("v1"))
      .orderBy(col("sim").desc, col("v2"))
    a.join(b, Seq("label")).filter(col("v1") =!= col("v2"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "emb1", "emb2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("label"), col("v1"), col("v2"), col("sim"))
  }

  /** Neighbor DIVERSIFICATION over the k-NN graph — the relative-
    * neighborhood pruning rule every HNSW/NSG builder applies after
    * raw k-NN (Malkov & Yashunin's `SELECT-NEIGHBORS-HEURISTIC`):
    * walking a vertex's neighbors best-first, keep candidate e only if
    * it is closer to the vertex than to every already-KEPT neighbor
    * (sim(v,e) > sim(e,m) for all kept m) — redundant near-duplicates
    * of a kept neighbor are pruned so the surviving edges spread
    * DIRECTIONALLY, which is what makes greedy graph search converge.
    * Reported per label: vertices, edges before/after, pruned count,
    * and the mean kept similarity.
    *
    * k = 3 lets the greedy unroll DECLARATIVELY: one rank pivot per
    * vertex (n1 always kept; n2 kept iff s(v,n2) > s(n1,n2); n3 kept
    * iff s(v,n3) > s(n1,n3) and, when n2 was kept, > s(n2,n3)) — no
    * iteration, no UDF. Strict float comparisons are safe because the
    * f32 cosine kernel is bit-identical cross-engine (the established
    * [[knnGraph]] convention); kept sims quantize to DECIMAL(18,9)
    * before the mean.
    *
    * Scale shape: the rank pivot is one group agg over the
    * degree-bounded k-NN edge relation; the three neighbor-pair sims
    * come from three vec_id equi-joins of the |V|-row pivot against
    * the embeddings table (never a pair space); the census is
    * |labels|-row. */
  def knnDiversify(spark: SparkSession, dir: String): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val knn = knnEdges(spark, dir, 3)
      .withColumn("rk", row_number().over(Window.partitionBy(col("v1"))
        .orderBy(col("sim").desc, col("v2"))))
    val piv = knn.groupBy(col("label"), col("v1"))
      .agg(count(lit(1)).as("deg"),
        max(when(col("rk") === 1, col("v2"))).as("n1"),
        max(when(col("rk") === 2, col("v2"))).as("n2"),
        max(when(col("rk") === 3, col("v2"))).as("n3"),
        max(when(col("rk") === 1, col("sim"))).as("s1"),
        max(when(col("rk") === 2, col("sim"))).as("s2"),
        max(when(col("rk") === 3, col("sim"))).as("s3"))
    def embOf(n: String): DataFrame = e.select(
      col("vec_id").as(n), col("embedding").as(s"e_$n"))
    val sims = piv
      .join(embOf("n1"), Seq("n1"), "left")
      .join(embOf("n2"), Seq("n2"), "left")
      .join(embOf("n3"), Seq("n3"), "left")
      .withColumn("s12", expr("graft_cosine_f32(e_n1, e_n2)"))
      .withColumn("s13", expr("graft_cosine_f32(e_n1, e_n3)"))
      .withColumn("s23", expr("graft_cosine_f32(e_n2, e_n3)"))
    val flagged = sims
      .withColumn("keep2",
        col("n2").isNotNull && col("s2") > col("s12"))
      .withColumn("keep3",
        col("n3").isNotNull && col("s3") > col("s13") &&
          (!col("keep2") || col("s3") > col("s23")))
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    flagged.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vertices"),
        sum(col("deg")).as("n_edges_before"),
        sum(lit(1L) + col("keep2").cast("long") +
          col("keep3").cast("long")).as("n_edges_after"),
        round((sum(d9(col("s1"))) +
          sum(when(col("keep2"), d9(col("s2"))).otherwise(lit(0))
            .cast("decimal(18,9)")) +
          sum(when(col("keep3"), d9(col("s3"))).otherwise(lit(0))
            .cast("decimal(18,9)"))).cast("double") /
          sum(lit(1L) + col("keep2").cast("long") +
            col("keep3").cast("long")).cast("double"), 4)
          .as("avg_kept_sim"))
      .select(col("label"), col("n_vertices"), col("n_edges_before"),
        col("n_edges_after"),
        (col("n_edges_before") - col("n_edges_after")).as("n_pruned"),
        col("avg_kept_sim"))
      .orderBy(col("label"))
  }

  /** Scalar-quantization BIT-WIDTH sweep — what int4/int6/int8 storage
    * actually costs in precision, measured on this corpus (the
    * [[quantizeInt8]] rung's tuning row, and the memory-vs-recall knob
    * every vector store exposes): per bit width b, each micro-unit
    * coordinate magnitude quantizes to (2^(b−1)−1) symmetric levels
    * against its vector's max-abs scale and dequantizes back; the
    * census reports lanes, max and mean absolute reconstruction error
    * in micro-units. ENTIRELY integer: quantize/dequantize are
    * integral divisions of NON-NEGATIVE operands (magnitudes — Spark
    * `div` truncates toward zero while DuckDB `//` floors, so signs
    * are kept out of the division; symmetric quantization loses
    * nothing by quantizing |x|), so both engines agree bit-for-bit.
    *
    * Scale shape: one coordinate explode (the [[microCoords]] relation
    * every exact-arithmetic row shares), a vector-grain max-abs agg
    * joined back co-keyed, a broadcast 3-row bit axis, a 3-row
    * census. */
  def quantSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val xq = microCoords(spark, dir)
    val mx = xq.groupBy(col("vec_id")).agg(max(abs(col("xq"))).as("ma"))
    val bits = Seq(4L, 6L, 8L).toDF("bits")
    xq.join(mx, "vec_id")
      .filter(col("ma") > 0)
      .crossJoin(broadcast(bits)) // 3-row bit-width axis
      .withColumn("levels",
        expr("shiftleft(1L, CAST(bits - 1 AS INT)) - 1"))
      .withColumn("axq", abs(col("xq")))
      .withColumn("q", expr("(axq * levels) div ma"))
      .withColumn("deq", expr("(q * ma) div levels"))
      .withColumn("err", col("axq") - col("deq"))
      .groupBy(col("bits"))
      .agg(count(lit(1)).as("n_lanes"),
        max(col("err")).as("max_err_micro"),
        round(sum(col("err")).cast("double") / count(lit(1)), 4)
          .as("mean_err_micro"))
      .orderBy(col("bits"))
  }

  /** IVF index-HEALTH census — the two numbers that decide whether an
    * inverted-file layout needs retraining: per-cell occupancy (share
    * of the corpus in each coarse cell) and per-cell quantization
    * distortion (mean squared distance of members to their own
    * centroid), plus the global IMBALANCE factor n_cells·Σs²/(Σs)² —
    * 1.0 for perfectly even lists, and exactly the factor by which
    * skewed lists inflate expected probe cost. Cells are [[ivfTopK]]'s
    * label partition with the same exact-decimal centroids, so the
    * health census can never disagree with the serving path about the
    * index it describes.
    *
    * Determinism: centroids are exact-decimal means; each squared
    * deviation quantizes to DECIMAL(28,12) before the per-vector and
    * per-cell sums. Scale shape: one dimension explode, two
    * co-partitioned aggs (cell×dim, then vector), a cell-grain census
    * + a broadcast 1-row total — linear, output |cells|-bounded. */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val pv = dv.join(cent, Seq("label", "d"))
      .withColumn("t",
        ((col("val").cast("double") - col("c")) *
          (col("val").cast("double") - col("c"))).cast("decimal(28,12)"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("t")).as("d2"))
    val cells = pv.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (sum(col("d2")).cast("double") / count(lit(1))).as("dist"))
    val tot = cells.agg(sum(col("n_vecs")).as("n"),
      count(lit(1)).as("nc"),
      sum(col("n_vecs") * col("n_vecs")).as("ss"))
    cells.crossJoin(broadcast(tot)) // 1-row corpus totals
      .select(col("label"), col("n_vecs"),
        round(col("n_vecs").cast("double") / col("n").cast("double"), 6)
          .as("share"),
        round(col("dist"), 6).as("mean_sq_dist"),
        round(col("nc").cast("double") * col("ss").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6)
          .as("imbalance"))
      .orderBy(col("label"))
  }

  /** Recall-at-k CURVE for the label-blocked ANN — [[recallAt10]]'s
    * single operating point swept over k ∈ {1, 5, 10} in ONE pass (the
    * nprobe-sweep discipline applied to the serving-time k knob): both
    * rankings are computed once to depth max(k), the intersection
    * carries BOTH ranks, and a broadcast 3-row k axis reads each
    * operating point off the same relation — never a re-rank per k.
    * Output per k: total hits across queries and macro recall
    * (hits / (k · queries)) — the curve that decides how deep the
    * blocked index must rank before it matches brute force.
    *
    * Determinism: ranks tie-break on vec_id after the f32 cosine;
    * identical window in both engines. Scale shape: the query set
    * broadcasts (bounded), rank windows are per-query ≤ max(k) via
    * WindowGroupLimit pruning, the k axis is 3 broadcast rows — no
    * pair relation beyond queries × corpus. */
  def recallCurve(spark: SparkSession, dir: String,
                  nQueries: Int = 5, ks: Seq[Long] = Seq(1L, 5L, 10L)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
    def ranked(cand: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim_raw").desc, col("vec_id"))
      cand.filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim_raw",
          ExprColumns.cosineF32(spark, "embedding", "q_emb"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= ks.max)
        .select(col("q_id"), col("vec_id"), col("rn"))
    }
    val brute = ranked(e.join(broadcast(q)))
      .withColumnRenamed("rn", "rb")
    val blocked = ranked(e.join(broadcast(q),
        col("label") === col("q_label")))
      .withColumnRenamed("rn", "rl")
    val hits = brute.join(blocked, Seq("q_id", "vec_id"))
      .crossJoin(broadcast(ks.toDF("k"))) // 3-row k axis
      .filter(col("rb") <= col("k") && col("rl") <= col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_hits"))
    ks.toDF("k").join(hits, Seq("k"), "left")
      .select(col("k"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") /
          (col("k") * nQueries).cast("double"), 6).as("recall"))
      .orderBy(col("k"))
  }

  /** SemDeDup — semantic deduplication by clustering THEN within-cluster
    * pairwise cosine (Abbas et al. 2023's recipe, the scale answer to
    * "all-pairs cosine is quadratic"): every vector is assigned to its
    * most-similar seed centroid (k lowest-vec_id seeds, the
    * [[kmeansAssignIter]] seeding), and only pairs sharing a cluster are
    * scored; a member is PRUNED when it is the greater vec_id of any
    * within-cluster pair at or above the operating cosine. Census per
    * cluster: members, flagged pairs, pruned members, keep rate. The
    * threshold 0.35 is data-derived (this corpus's embeddings are
    * near-orthogonal — max pair cosine 0.51 — so the paper's 0.9+ would
    * be vacuously empty; the knob, not the kernel, changes per corpus).
    *
    * Determinism: coordinates quantize to micro-units (round(x·10⁶)
    * BIGINT); dots and squared norms are exact integers ≤ d·10¹²
    * (double-exact below 2⁵³), so cosine = dot/(√n1·√n2) is the same
    * IEEE double in both engines and the threshold cannot flip
    * cross-engine. Assignment ties break to the smallest seed id.
    *
    * Scale shape: assignment is one broadcast seed array + a narrow
    * argmax map (no row expand); the pair stage is a self-equi-join ON
    * cid, so its cost is Σ_c |c|² — at 100 TB k grows with the corpus
    * (SemDeDup runs ~10⁵ clusters) to hold |c| bounded, keeping the
    * join sub-quadratic; nothing here depends on k beyond the broadcast
    * seed array staying executor-memory-sized. */
  def semDedup(spark: SparkSession, dir: String, k: Int = 8,
               threshold: Double = 0.35): DataFrame = {
    val q = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("qe"))
      .withColumn("nsq", expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)"))
    val seeds = q.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("sid"), col("qe").as("se"), col("nsq").as("sn"))
      .agg(array_sort(collect_list(struct(col("sid"), col("se"), col("sn"))))
        .as("seeds"))
    val assigned = q.join(broadcast(seeds))
      .withColumn("best", expr(
        """array_max(transform(seeds, s ->
             struct(CAST(aggregate(zip_with(qe, s.se, (x, y) -> x * y),
                      0L, (acc, x) -> acc + x) AS DOUBLE)
                    / (sqrt(CAST(nsq AS DOUBLE)) * sqrt(CAST(s.sn AS DOUBLE)))
                      AS sim,
                    -s.sid AS nsid)))"""))
      .select(col("vec_id"), col("qe"), col("nsq"),
        (-col("best.nsid")).as("cid"))
    val a = assigned.select(col("cid"), col("vec_id").as("v1"),
      col("qe").as("q1"), col("nsq").as("n1"))
    val b = assigned.select(col("cid"), col("vec_id").as("v2"),
      col("qe").as("q2"), col("nsq").as("n2"))
    val flagged = a.join(b, Seq("cid")).filter(col("v1") < col("v2"))
      .withColumn("dot", expr(
        "aggregate(zip_with(q1, q2, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("n1").cast("double")) * sqrt(col("n2").cast("double"))))
      .filter(col("cos") >= threshold)
    val pairCensus = flagged.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_dup_pairs"),
        countDistinct(col("v2")).as("n_pruned"),
        round(max(col("cos")), 6).as("max_cos"))
    assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
      .join(pairCensus, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_pruned"), lit(0L)).as("n_pruned"),
        coalesce(col("max_cos"), lit(0.0)).as("max_cos"),
        round(lit(1.0) - coalesce(col("n_pruned"), lit(0L)).cast("double") /
          col("n_members").cast("double"), 6).as("keep_rate"))
      .orderBy(col("cid"))
  }

  /** Greedy k-CENTER coreset — farthest-point traversal (Gonzalez's
    * 2-approximation), the selection rule behind diversity-first data
    * pruning and coreset distillation: start from the lowest vec_id,
    * then k−1 times pick the vector FARTHEST from the chosen set
    * (max-min squared L2, ties to the smallest vec_id). Output: each
    * pick with its distance-to-set at selection time (a non-increasing
    * sequence — each pick covers its own farthest gap) plus a
    * pick_order-0 row reporting the post-selection coverage radius and
    * its witness vector — the "how well does the coreset cover"
    * number.
    *
    * Determinism: squared distances expand to n1 + n2 − 2·dot over
    * micro-unit integers — exact BIGINTs end to end, no float
    * comparison anywhere. Scale shape: each of the k rounds is one
    * broadcast of the new center into a narrow map (running-min
    * update) + one global argmax (here an orderBy/limit(1) over the
    * corpus; on a cluster the same argmax is a max_by partial-agg
    * reduction — no sort, no row expand). Total cost k linear passes;
    * k is the coreset budget, a constant knob, and the running-min
    * column makes each pass O(d) per row regardless of how many
    * centers were already chosen. */
  def kcenterCoreset(spark: SparkSession, dir: String,
                     k: Int = 8): DataFrame = {
    val n = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("qe"))
      .withColumn("nsq", expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)"))
    val c1 = n.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("qe").as("ce"),
        col("nsq").as("cn"))
    def distToCenter = col("nsq") + col("cn") - lit(2L) *
      expr("aggregate(zip_with(qe, ce, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")
    // lazy checkpoints per round (r15 verdict item 1): cur and p are
    // each referenced twice (argmax probe + next round's running-min
    // fold), so without a cut each greedy round would re-derive every
    // earlier round's pass twice over — the lazy RDD pins each round
    // to exactly ONE corpus pass with no per-round blocking job
    // (window-free lineage: maps, broadcasts, TakeOrdered limits)
    var cur = n.crossJoin(broadcast(c1)) // 1-row newest center
      .select(col("vec_id"), col("qe"), col("nsq"),
        distToCenter.as("mind"))
      .localCheckpoint(false)
    var picks = c1.select(lit(1L).as("pick_order"),
      col("cid").as("vec_id"), lit(0L).as("dist_micro2"))
    for (i <- 2 to k) {
      val p = cur.orderBy(col("mind").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("qe").as("ce"),
          col("nsq").as("cn"), col("mind").as("pd"))
        .localCheckpoint(false)
      picks = picks.unionByName(p.select(lit(i.toLong).as("pick_order"),
        col("cid").as("vec_id"), col("pd").as("dist_micro2")))
      cur = cur.crossJoin(broadcast(p.drop("pd"))) // 1-row newest center
        .select(col("vec_id"), col("qe"), col("nsq"),
          least(col("mind"), distToCenter).as("mind"))
        .localCheckpoint(false)
    }
    val coverage = cur.orderBy(col("mind").desc, col("vec_id")).limit(1)
      .select(lit(0L).as("pick_order"), col("vec_id"),
        col("mind").as("dist_micro2"))
    picks.unionByName(coverage).orderBy(col("pick_order"))
  }

  def knnGraph(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val knn = knnEdges(spark, dir, k)
    val recip = knn.as("x").join(knn.as("y"),
      col("x.v1") === col("y.v2") && col("x.v2") === col("y.v1"),
      "left_semi")
    val base = knn.groupBy(col("label"))
      .agg(countDistinct(col("v1")).as("n_nodes"),
        count(lit(1)).as("n_edges"),
        round(sum(col("sim").cast("double").cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 4).as("avg_sim"))
    val rec = recip.groupBy(col("label"))
      .agg(count(lit(1)).as("n_reciprocal"))
    base.join(rec, Seq("label"), "left")
      .select(col("label"), col("n_nodes"), col("n_edges"),
        coalesce(col("n_reciprocal"), lit(0L)).as("n_reciprocal"),
        col("avg_sim"))
      .orderBy(col("label"))
  }

  /** Contrastive training-pair MINING census — the data-side step of
    * contrastive-embedding training: positives = each anchor's top-1
    * same-label cosine neighbor ([[knnEdges]], k=1 — the same kernel
    * every graph row reads), negatives = a deterministic hash pairing
    * ((7·id+13) mod N) kept only when it crosses labels. The per-label
    * census reports both pair counts and the mean positive/negative
    * similarity GAP — the separability signal that predicts whether a
    * contrastive loss has anything to learn from these pairs.
    *
    * Scale: positives ride the blocked k-NN bound; the negative side is
    * ONE equi-join on the computed partner id (no pair space at all);
    * similarities quantize to DECIMAL(18,9) before the means. */
  def contrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val pos = knnEdges(spark, dir, 1)
      .select(col("label"),
        col("sim").cast("double").cast("decimal(18,9)").as("psim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pos"),
        round(sum(col("psim")).cast("double") / count(lit(1)), 4)
          .as("avg_pos"))
    val n = e.agg(count(lit(1)).as("n"))
    val neg = e.select(col("vec_id").as("v1"), col("label").as("l1"),
        col("embedding").as("emb1"))
      .crossJoin(broadcast(n)) // 1-row corpus size
      .withColumn("v2", expr("(v1 * 7 + 13) % n"))
      .join(e.select(col("vec_id").as("v2"), col("label").as("l2"),
        col("embedding").as("emb2")), "v2")
      .filter(col("l1") =!= col("l2"))
      .select(col("l1").as("label"),
        ExprColumns.cosineF32(spark, "emb1", "emb2")
          .cast("double").cast("decimal(18,9)").as("nsim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_neg"),
        round(sum(col("nsim")).cast("double") / count(lit(1)), 4)
          .as("avg_neg"))
    pos.join(neg, "label")
      .select(col("label"), col("n_pos"), col("avg_pos"),
        col("n_neg"), col("avg_neg"),
        round(col("avg_pos") - col("avg_neg"), 4).as("gap"))
      .orderBy(col("label"))
  }

  /** MIPS-to-cosine reduction, VERIFIED — the augmented-vector trick
    * (append √(M²−‖x‖²) to every document vector, 0 to the query; the
    * augmented corpus has constant norm M, so cosine order equals
    * inner-product order) that lets a cosine-only ANN index serve
    * maximum-inner-product queries. The row runs BOTH rankings — exact
    * integer-dot MIPS and the augmented-cosine ordering — for the 3
    * lowest-id queries and reports their top-10 agreement (10 = the
    * reduction holds on this corpus).
    *
    * The cosine side BUILDS the augmented document coordinate
    * √(M²−‖x‖²) and recombines ‖x'‖ numerically from it (‖x‖² + aug²
    * in doubles) — NOT the algebraic shortcut ‖x'‖ ≡ M, which would
    * make the check order-identical to MIPS by construction (the
    * round-10 advisor's tautology finding). A wrong M, a negative
    * radicand, or a dropped coordinate now perturbs the augmented
    * ranking and drops n_agree.
    *
    * Exactness: dots are micro-unit LONG arithmetic ([[microCoords]] —
    * no float accumulation); the augmented-norm roundtrip is IEEE
    * double (sqrt/mul/add are correctly rounded, engine-identical).
    * Plan: one dimension join against the 3-query broadcast, a
    * co-keyed doc-norm join, two rank≤10 windows over the same dot
    * relation, a semi-join agreement count. */
  def mipsAugment(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val xq = microCoords(spark, dir)
    val e = emb(spark, dir)
    val q = e.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id").as("qid"))
    val qc = xq.join(broadcast(q), col("vec_id") === col("qid"))
      .select(col("qid"), col("j"), col("xq").as("qx"))
    val dots = xq.join(broadcast(qc), "j")
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qx") * col("xq")).as("dot"))
    val norms = xq.groupBy(col("vec_id")).agg(sum(col("xq") * col("xq"))
      .as("nsq"))
    val m2 = norms.agg(max(col("nsq")).as("m2"))
    val wA = Window.partitionBy(col("qid"))
      .orderBy(col("dot").desc, col("vec_id"))
    val ra = dots.withColumn("rk", row_number().over(wA))
      .filter(col("rk") <= k)
    val rb = dots
      .join(broadcast(norms.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("nsq", "qsq")), "qid")
      .join(norms, "vec_id") // doc-side norm², co-keyed on vec_id
      .crossJoin(broadcast(m2)) // 1-row max-norm scalar
      // MATERIALIZE the augmented coordinate √(M²−‖x‖²) and recombine
      // the augmented norm numerically (nsq + aug²) instead of
      // substituting the algebraic constant M — so a broken reduction
      // (wrong M, negative radicand, dropped coordinate) actually
      // perturbs this ranking rather than cancelling out. Exact
      // arithmetic would make the division per-query constant BY THE
      // REDUCTION'S THEOREM; the float roundtrip is what's checked.
      .withColumn("aug", sqrt((col("m2") - col("nsq")).cast("double")))
      .withColumn("naug2",
        col("nsq").cast("double") + col("aug") * col("aug"))
      .withColumn("cosb", col("dot").cast("double") /
        (sqrt(col("naug2")) * sqrt(col("qsq").cast("double"))))
      .withColumn("rk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cosb").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"))
    val agree = ra.join(rb, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_agree"))
    val top1 = ra.filter(col("rk") === 1)
      .select(col("qid"), col("vec_id").as("top1_vec"),
        round(col("dot").cast("double") / 1e12, 6).as("top1_ip"))
    agree.join(top1, "qid")
      .select(col("qid"), col("n_agree"), col("top1_vec"), col("top1_ip"))
      .orderBy(col("qid"))
  }

  /** Cluster VALIDITY census (Davies–Bouldin-lite) — is the label
    * structure actually separable in embedding space? Per label:
    * cohesion (mean cosine of members to their OWN centroid),
    * confusion (mean cosine to the best OTHER centroid), the margin
    * between them, and the share of members that sit closer to a
    * foreign centroid — the number that predicts both clustering
    * quality and the label-blocked dedup/ANN rows' blocking validity.
    *
    * Centroids are the [[kmRederive]] exact-decimal means (f32 lanes,
    * engine-identical); the |labels|-row centroid array broadcasts and
    * every vector scores all centroids in one narrow map (transform
    * HOF — no row expand). One corpus pass, |labels|-row census. */
  def clusterValidity(spark: SparkSession, dir: String): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val cents = kmCentArr(kmRederive(
      e.select(col("vec_id"), col("embedding"), col("label").as("cid"))))
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    e.join(broadcast(cents)) // 1-row centroid array
      .withColumn("own", expr(
        """array_max(transform(filter(cents, s -> s.cid = label),
             s -> graft_cosine_f32(embedding, s.cemb)))"""))
      .withColumn("best_other", expr(
        """array_max(transform(filter(cents, s -> s.cid != label),
             s -> graft_cosine_f32(embedding, s.cemb)))"""))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(d9(col("own"))).cast("double") / count(lit(1)), 4)
          .as("avg_own"),
        round(sum(d9(col("best_other"))).cast("double") / count(lit(1)), 4)
          .as("avg_other"),
        round(sum(when(col("best_other") > col("own"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)), 4).as("share_confused"))
      .select(col("label"), col("n_vecs"), col("avg_own"),
        col("avg_other"),
        round(col("avg_own") - col("avg_other"), 4).as("margin"),
        col("share_confused"))
      .orderBy(col("label"))
  }

  /** Johnson–Lindenstrauss random-projection DISTORTION census — the
    * measured answer to "can this corpus live in 16 dims": vectors
    * project through a deterministic ±1 matrix (md5-parity entries —
    * both engines derive the same sign for every (row, dim)), and for
    * a deterministic pairing of the corpus the squared-distance ratio
    * ‖Rx−Ry‖² / (k·‖x−y‖²) is summarized (mean, min/max, share within
    * ±20%). For ±1 rows E[‖Rv‖²] = k‖v‖², so ratios near 1 mean the
    * projection preserves geometry and a 4× cheaper ANN index is safe.
    *
    * Exactness: coordinates are micro-unit LONGS ([[microCoords]]);
    * the projection, both squared distances, and every sum are exact
    * integer arithmetic — the ratio is the single double op per pair.
    * Plan: one broadcast of the k×d sign matrix, two dimension-keyed
    * aggs, pair joins on the computed partner id only. */
  def jlProjection(spark: SparkSession, dir: String, kDim: Int = 16): DataFrame = {
    val xq = microCoords(spark, dir)
    val e = emb(spark, dir)
    val dimsJ = xq.select(col("j")).distinct()
    val rmat = spark.range(kDim).select(col("id").as("r"))
      .crossJoin(dimsJ)
      .withColumn("s", when(
        conv(substring(md5(concat(lit("jl:"), col("r"), lit(":"),
          col("j"))), 1, 1), 16, 10).cast("int") % 2 === 0, 1L)
        .otherwise(-1L))
    val proj = xq.join(broadcast(rmat), "j")
      .groupBy(col("vec_id"), col("r"))
      .agg(sum(col("s") * col("xq")).as("p"))
    val n = e.agg(count(lit(1)).as("n"))
    val pairs = e.select(col("vec_id").as("v1"))
      .crossJoin(broadcast(n)) // 1-row corpus size
      .withColumn("v2", expr("(v1 * 7 + 13) % n"))
      .filter(col("v1") =!= col("v2"))
      .select(col("v1"), col("v2"))
    val od = pairs
      .join(xq.select(col("vec_id").as("v1"), col("j"),
        col("xq").as("x1")), "v1")
      .join(xq.select(col("vec_id").as("v2"), col("j"),
        col("xq").as("x2")), Seq("v2", "j"))
      .groupBy(col("v1"))
      .agg(sum((col("x1") - col("x2")) * (col("x1") - col("x2")))
        .as("od2"))
    val pd = pairs
      .join(proj.select(col("vec_id").as("v1"), col("r"),
        col("p").as("p1")), "v1")
      .join(proj.select(col("vec_id").as("v2"), col("r"),
        col("p").as("p2")), Seq("v2", "r"))
      .groupBy(col("v1"))
      .agg(sum((col("p1") - col("p2")) * (col("p1") - col("p2")))
        .as("pd2"))
    od.join(pd, "v1")
      .select((col("pd2").cast("double") /
        (col("od2").cast("double") * kDim)).as("ratio"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("ratio").cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 4).as("mean_ratio"),
        round(min(col("ratio")), 4).as("min_ratio"),
        round(max(col("ratio")), 4).as("max_ratio"),
        round(sum(when(abs(col("ratio") - 1.0) <= 0.2, 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 4)
          .as("share_within_20pct"))
  }

  /** HNSW LEVEL-ASSIGNMENT census — the skip-list geometry an HNSW
    * build fixes before inserting a single vector: each vector's max
    * layer is geometric(1/2), drawn here as the TRAILING-ZERO count of
    * a deterministic hash byte (the md5-nibble convention the split
    * rows use; ntz is the classic integer-exact skip-list draw — no
    * float ln, no cross-engine RNG). Emits per level: node count,
    * observed share, the expected 2^-(l+1) share, and the cumulative
    * navigation-layer size (nodes at level ≥ l — what each search
    * layer actually holds).
    *
    * One narrow map + a ≤9-row census; the level histogram's window
    * runs over those 9 rows. */
  /** Deterministic HNSW level draw for a vector id — geometric(1/2)
    * via the TRAILING-ZERO count of the first md5 byte of
    * "hnsw:<id>" (b = 0 → all 8 bits zero → top level 8). The single
    * home [[hnswLevels]] (the geometry census) and [[hnswSearch]]
    * (the layered descent) share, so the search can never run on a
    * different skip-list than the census reports. */
  private[operators] def hnswLevelOf(id: Column): Column = {
    val h = md5(concat(lit("hnsw:"), id.cast("string")))
    val b = (conv(substring(h, 1, 2), 16, 10).cast("int"))
    when(b === 0, 8)
      .otherwise(
        when(b % 2 === 1, 0).otherwise(
          when(b % 4 === 2, 1).otherwise(
            when(b % 8 === 4, 2).otherwise(
              when(b % 16 === 8, 3).otherwise(
                when(b % 32 === 16, 4).otherwise(
                  when(b % 64 === 32, 5).otherwise(
                    when(b % 128 === 64, 6).otherwise(7))))))))
  }

  def hnswLevels(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val lvl = hnswLevelOf(col("vec_id"))
    val hist = e.select(lvl.cast("long").as("level"))
      .groupBy(col("level")).agg(count(lit(1)).as("n_nodes"))
    val tot = hist.agg(sum(col("n_nodes")).as("t"))
    val wGe = Window.orderBy(col("level").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("layer_size", sum(col("n_nodes")).over(wGe))
      .crossJoin(broadcast(tot)) // 1-row total
      .select(col("level"), col("n_nodes"),
        round(col("n_nodes").cast("double") / col("t").cast("double"), 4)
          .as("share"),
        round(when(col("level") === 8, lit(0.00390625))
          .otherwise(lit(1.0) /
            pow(lit(2.0), (col("level") + 1).cast("double"))), 4)
          .as("expected_share"),
        col("layer_size"))
      .orderBy(col("level"))
  }

  /** Micro-unit-quantized coordinates: (vec_id, j, xq) with
    * xq = round(x·10⁶) as BIGINT — the shared exact-integer domain of
    * the PCA pair below. */
  private def microCoords(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("j"),
        round(col("col").cast("double") * 1e6, 0).cast("long").as("xq"))

  def pcaPowerIteration(spark: SparkSession, dir: String): DataFrame = {
    val xq = microCoords(spark, dir)
    val rowDots = xq.groupBy(col("vec_id")).agg(sum(col("xq")).as("s"))
    val w = xq.join(rowDots, "vec_id")
      .groupBy(col("j"))
      .agg(sum(col("xq") * col("s")).as("w"))
    val norm = w.agg(
      sum((col("w").cast("double") * col("w").cast("double"))
        .cast("decimal(38,6)")).as("nsq"))
    w.crossJoin(broadcast(norm)) // 1-row scalar
      .select(col("j"), col("w"),
        round(col("w").cast("double") / sqrt(col("nsq").cast("double")), 6)
          .as("component"))
      .orderBy(col("j"))
  }

  /** Projection of the whole corpus onto [[pcaPowerIteration]]'s learned
    * direction, histogrammed — the "use the component" step (PCA
    * whitening previews, spectral outlier scans, 1-D index sketches all
    * start here). The unit component re-quantizes to integer micro-units
    * (exact: it is already rounded to 6 decimals), so every projection
    * p_i = Σ_j xq_ij·cq_j is EXACT long arithmetic (≤ ~2·10¹³), the
    * global [min, max] is an exact 1-row scalar, and the 8 equal-width
    * bin ids are integer divisions — no float comparison anywhere until
    * the final per-bin mean, divided once and rounded.
    *
    * Plan: the dimension-sized component broadcasts into the coordinate
    * explode (map-side join), one vec-keyed agg for projections, a
    * broadcast min/max scalar, an 8-key rollup. Linear in the corpus,
    * constant-width output. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val cq = pcaPowerIteration(spark, dir)
      .select(col("j"),
        round(col("component") * 1e6, 0).cast("long").as("cq"))
    val proj = microCoords(spark, dir)
      .join(broadcast(cq), "j")
      .groupBy(col("vec_id"))
      .agg(sum(col("xq") * col("cq")).as("p"))
    val bounds = proj.agg(min(col("p")).as("lo"), max(col("p")).as("hi"))
    proj.crossJoin(broadcast(bounds))
      .withColumn("bin",
        floor((col("p") - col("lo")) * 8 / (col("hi") - col("lo") + 1))
          .cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_vecs"),
        round((sum(col("p")).cast("double") / count(lit(1))) / 1e12, 6)
          .as("mean_proj"))
      .orderBy(col("bin"))
  }

  /** DBSCAN census over the embedding space — the density-based
    * clustering rung beside [[kmeansLloydTwo]]'s centroid one (DBSCAN
    * finds arbitrary-shape clusters and, unlike k-means, produces an
    * explicit NOISE verdict — the outlier census a curation pipeline
    * reads before trusting cluster-level statistics): a vector is CORE
    * if ≥ minPts neighbors sit at cosine ≥ eps within its label block,
    * clusters are connected components of the core-core neighbor
    * graph (isolated cores form singleton clusters), non-core vectors
    * with a core neighbor are BORDER (assigned the minimum core
    * neighbor's cluster — the deterministic tie-break for DBSCAN's
    * order-dependent border ambiguity), and the rest is noise.
    * Reported per label: cores, borders, noise, clusters, and the
    * largest cluster's member count.
    *
    * Pair space is label-blocked exactly as [[labelBlockedPairs]] (the
    * established bound); components reuse
    * [[DedupOps.propagateLabels]]' fused-hop machinery (candidate-
    * graph-sized, never corpus-sized); the census is |labels|-row. The
    * f32 cosine kernel is bit-identical cross-engine, so the eps
    * comparison agrees exactly. */
  def dbscan(spark: SparkSession, dir: String,
             eps: Double = 0.20, minPts: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("label"), col("vec_id").as("v1"),
      col("embedding").as("emb1"))
    val b = e.select(col("label"), col("vec_id").as("v2"),
      col("embedding").as("emb2"))
    val nbr = a.join(b, Seq("label")).filter(col("v1") =!= col("v2"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "emb1", "emb2"))
      .filter(col("sim") >= eps)
      .select(col("label"), col("v1"), col("v2"))
      .localCheckpoint()
    val deg = nbr.groupBy(col("label"), col("v1"))
      .agg(count(lit(1)).as("deg"))
    val cores = deg.filter(col("deg") >= minPts)
      .select(col("label"), col("v1").as("node")).localCheckpoint()
    val coreSet = cores.select(col("node")).distinct()
    // core-core edges: both endpoints core (vec_id is globally unique,
    // so the component machinery can run label-agnostic)
    val coreEdges = nbr
      .join(coreSet.select(col("node").as("v1")), Seq("v1"), "left_semi")
      .join(coreSet.select(col("node").as("v2")), Seq("v2"), "left_semi")
      .filter(col("v1") < col("v2"))
      .select(col("v1").as("d1"), col("v2").as("d2"))
    val cc = DedupOps.propagateLabels(coreEdges, 4)
      .select(col("doc_id").as("node"), col("cluster_id"))
    val coreClusters = cores
      .join(cc, Seq("node"), "left")
      .select(col("label"), col("node"),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
      .localCheckpoint()
    // border: non-core with >= 1 core neighbor, assigned min core
    // neighbor's cluster
    val borders = nbr
      .join(coreSet.select(col("node").as("v1")), Seq("v1"), "left_anti")
      .join(coreClusters.select(col("node").as("v2"),
        col("cluster_id")), Seq("v2"))
      .groupBy(col("label"), col("v1").as("node"))
      .agg(min(col("cluster_id")).as("cluster_id"))
    val members = coreClusters.select(col("label"), col("node"),
        col("cluster_id"), lit("core").as("role"))
      .unionByName(borders.select(col("label"), col("node"),
        col("cluster_id"), lit("border").as("role")))
    val sizes = members.groupBy(col("label"), col("cluster_id"))
      .agg(count(lit(1)).as("csize"))
    val nodes = e.select(col("label"), col("vec_id").as("node"))
    members.groupBy(col("label"))
      .agg(sum((col("role") === "core").cast("long")).as("n_core"),
        sum((col("role") === "border").cast("long")).as("n_border"))
      .join(sizes.groupBy(col("label"))
        .agg(count(lit(1)).as("n_clusters"),
          max(col("csize")).as("max_cluster")), Seq("label"))
      .join(nodes.groupBy(col("label")).agg(count(lit(1)).as("n_all")),
        Seq("label"))
      .select(col("label"), col("n_core"), col("n_border"),
        (col("n_all") - col("n_core") - col("n_border")).as("n_noise"),
        col("n_clusters"), col("max_cluster"))
      .orderBy(col("label"))
  }

  /** TRIPLET mining census — the batch-construction pass of metric-
    * learning / embedding fine-tuning (FaceNet's semi-hard rule):
    * anchor a's positive p is its nearest same-label neighbor
    * ([[knnEdges]] at k = 1), negatives n are DIFFERENT-label vectors,
    * and a negative is HARD when sim(a,n) ≥ sim(a,p), SEMI-HARD when
    * sim(a,p) − margin ≤ sim(a,n) < sim(a,p) (the band that trains
    * best), easy otherwise. Reported per anchor label: anchors,
    * candidate negatives, hard/semi-hard counts, and the mean
    * semi-hard gap sim(a,p) − sim(a,n).
    *
    * The negative pair space is NOT enumerated: candidates come from
    * shared hyperplane-LSH band buckets (the [[annLshTopPairs]]
    * kernel — exactly how a production miner sources hard negatives
    * from the ANN index, because easy negatives found elsewhere are
    * training-useless anyway). Pair emission happens inside bucket
    * groups (collision-bounded), pairs carry labels so the
    * different-label filter is map-side, and the two exact-cosine
    * joins run on the candidate relation, never the corpus square.
    * Float sims compare after a cast to double in BOTH engines. */
  def tripletMining(spark: SparkSession, dir: String,
                    margin: Double = 0.05): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val pos = knnEdges(spark, dir, 1)
      .select(col("label"), col("v1").as("a"), col("v2").as("p"),
        col("sim").cast("double").as("sim_ap"))
    // ordered different-label pairs out of shared LSH band buckets
    val cand = e.select(col("vec_id"), col("label"),
        posexplode(ExprColumns.hyperplaneLsh(spark, "embedding")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("label"))))
        .as("vs"))
      .filter(size(col("vs")) > 1)
      .select(explode(expr(
        """flatten(transform(vs, x ->
             transform(filter(vs, y -> y.label != x.label),
               y -> struct(x.vec_id AS a, y.vec_id AS n))))""")).as("p"))
      .select(col("p.a"), col("p.n"))
      .distinct()
    val ea = e.select(col("vec_id").as("a"), col("embedding").as("emb1"))
    val en = e.select(col("vec_id").as("n"), col("embedding").as("emb2"))
    val scored = cand.join(ea, "a").join(en, "n")
      .withColumn("sim_an",
        ExprColumns.cosineF32(spark, "emb1", "emb2").cast("double"))
      .select(col("a"), col("n"), col("sim_an"))
      .join(pos, Seq("a"))
      .withColumn("klass",
        when(col("sim_an") >= col("sim_ap"), "hard")
          .when(col("sim_an") >= col("sim_ap") - margin, "semihard")
          .otherwise("easy"))
    val anchors = pos.groupBy(col("label"))
      .agg(count(lit(1)).as("n_anchors"))
    val agg = scored.groupBy(col("label"))
      .agg(count(lit(1)).as("n_candidates"),
        sum((col("klass") === "hard").cast("long")).as("n_hard"),
        sum((col("klass") === "semihard").cast("long")).as("n_semihard"),
        round(sum(when(col("klass") === "semihard",
            (col("sim_ap") - col("sim_an")).cast("decimal(18,9)")))
          .cast("double") /
          sum((col("klass") === "semihard").cast("long")), 4)
          .as("avg_semihard_gap"))
    anchors.join(agg, Seq("label"), "left")
      .select(col("label"), col("n_anchors"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_hard"), lit(0L)).as("n_hard"),
        coalesce(col("n_semihard"), lit(0L)).as("n_semihard"),
        col("avg_semihard_gap"))
      .orderBy(col("label"))
  }

  /** Greedy FACILITY-LOCATION selection (k-medoids greedy) — the
    * submodular data-subset rule beside [[kcenterCoreset]]'s
    * worst-case one: each step picks the candidate minimizing
    * Σ_v min(best_v, d²(v,c)) — total representation cost, so picks
    * chase DENSE regions first, where k-center chases outliers; the
    * two coresets bracket a selection budget from both sides. Emits
    * per label the k-step pick trajectory: vector chosen, objective
    * after the pick (exact BIGINT), and the marginal reduction — whose
    * diminishing sequence IS the submodularity certificate (and the
    * "stop adding data" signal a budgeted pipeline reads).
    *
    * Exactness: micro-unit LONG distances end to end ([[pcaPower]]'s
    * convention), argmin ties to the smaller vec_id. Scale shape: the
    * pair space is label-blocked (the established bound) and built
    * ONCE; each of the k steps is one pass over it (join with the
    * |V|-row running-min state, one hash agg, a per-label argmin) —
    * k × the blocked-pair kernel, with state LAZILY localCheckpointed
    * per step so lineage stays flat without per-step blocking jobs. */
  def facilitySelect(spark: SparkSession, dir: String,
                     k: Int = 4): DataFrame = {
    val xq = emb(spark, dir)
      .select(col("label"), col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
        .as("qe"))
      .withColumn("nsq", expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)"))
    val a = xq.select(col("label"), col("vec_id").as("v"),
      col("qe").as("qv"), col("nsq").as("nv"))
    val b = xq.select(col("label"), col("vec_id").as("c"),
      col("qe").as("qc"), col("nsq").as("nc"))
    val pairs = a.join(b, Seq("label"))
      .select(col("label"), col("v"), col("c"),
        (col("nv") + col("nc") - lit(2L) * expr(
          "aggregate(zip_with(qv, qc, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
          .as("d2"))
      // lazy: built once, read by every greedy step — no blocking job
      .localCheckpoint(false)
    var best: DataFrame = null
    val picks = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (i <- 1 to k) {
      val scored =
        if (i == 1) pairs.groupBy(col("label"), col("c"))
          .agg(sum(col("d2")).as("obj"))
        else pairs.join(best.toDF("label", "v", "bd"), Seq("label", "v"))
          .groupBy(col("label"), col("c"))
          .agg(sum(least(col("bd"), col("d2"))).as("obj"))
      val pick = scored
        .withColumn("rk", row_number().over(Window.partitionBy(col("label"))
          .orderBy(col("obj"), col("c"))))
        .filter(col("rk") === 1)
        .select(col("label"), col("c"), col("obj"))
        .toDF("pl", "pc", "pobj").localCheckpoint(false)
      picks += pick.select(col("pl").as("label"), lit(i).as("step"),
        col("pc").as("vec_id"), col("pobj").as("objective"))
      val newd = pairs
        .join(pick, col("label") === col("pl") && col("c") === col("pc"))
        .select(col("label"), col("v"), col("d2").as("nd"))
      best = (
        if (i == 1) newd.select(col("label"), col("v"),
          col("nd").as("bd"))
        else best.toDF("bl", "bv", "bd")
          .join(newd, col("bl") === col("label") && col("bv") === col("v"))
          .select(col("label"), col("v"),
            least(col("bd"), col("nd")).as("bd"))
        ).localCheckpoint(false)
    }
    val wl = Window.partitionBy(col("label")).orderBy(col("step"))
    picks.reduce(_ unionByName _)
      .withColumn("reduction",
        lag(col("objective"), 1).over(wl) - col("objective"))
      .orderBy(col("label"), col("step"))
  }

  /** Distance-METRIC agreement — Kendall's τ between the rankings
    * three metrics induce over the same candidates (cosine vs raw
    * dot, cosine vs squared L2): the decision row for "which metric
    * does my ANN index actually need". τ ≈ 1 for cosine-vs-L2 on
    * normalized vectors; a LOW cosine-vs-dot τ is the norm-variance
    * warning that MIPS augmentation ([[mipsAugment]]) exists to fix.
    * Per label: the seed query (min vec_id), candidate count, and
    * both τ values over all candidate pairs.
    *
    * Exactness: dot and squared-L2 rank by micro-unit BIGINTs, cosine
    * by the bit-identical f32 kernel; row_number makes ranks total, so
    * τ = (2C − P)/P needs only integer pair counts. Pair space is the
    * RANKED candidate list squared WITHIN a label block (the
    * established block bound, one self-equi-join on label). */
  def metricAgreement(spark: SparkSession, dir: String): DataFrame = {
    ExprColumns.register(spark)
    val base = emb(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))")
          .as("qe"))
      .withColumn("nsq", expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)"))
    val cand = base.select(col("label"), col("vec_id").as("cid"),
      col("embedding").as("c_emb"), col("qe").as("c_qe"),
      col("nsq").as("c_nsq"))
    val seeds = base.groupBy(col("label")).agg(min(col("vec_id")).as("qid"))
    val qside = base.join(seeds.toDF("label", "qid"), Seq("label"))
      .filter(col("vec_id") === col("qid"))
      .select(col("label"), col("qid"), col("embedding"), col("qe"),
        col("nsq"))
      .toDF("label", "qid", "q_emb", "q_qe", "q_nsq")
    val ranked = cand.join(qside, Seq("label"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos", ExprColumns.cosineF32(spark, "c_emb", "q_emb"))
      .withColumn("dot", expr(
        "aggregate(zip_with(c_qe, q_qe, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
      .withColumn("d2",
        col("c_nsq") + col("q_nsq") - lit(2L) * col("dot"))
      .withColumn("rc", row_number().over(Window.partitionBy(col("label"))
        .orderBy(col("cos").desc, col("cid"))))
      .withColumn("rd", row_number().over(Window.partitionBy(col("label"))
        .orderBy(col("dot").desc, col("cid"))))
      .withColumn("rl", row_number().over(Window.partitionBy(col("label"))
        .orderBy(col("d2"), col("cid"))))
      .select(col("label"), col("qid"), col("cid"), col("rc"), col("rd"),
        col("rl"))
      .localCheckpoint()
    val p1 = ranked.select(col("label"), col("cid"), col("rc"),
      col("rd"), col("rl")).toDF("label", "a", "rc1", "rd1", "rl1")
    val p2 = ranked.select(col("label"), col("cid"), col("rc"),
      col("rd"), col("rl")).toDF("label", "b", "rc2", "rd2", "rl2")
    val pairs = p1.join(p2, Seq("label")).filter(col("a") < col("b"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(((col("rc1") - col("rc2")) * (col("rd1") - col("rd2")) > 0)
          .cast("long")).as("c_cd"),
        sum(((col("rc1") - col("rc2")) * (col("rl1") - col("rl2")) > 0)
          .cast("long")).as("c_cl"))
    val counts = ranked.groupBy(col("label"))
      .agg(max(col("qid")).as("qid"), count(lit(1)).as("n_cands"))
    counts.join(pairs, Seq("label"))
      .select(col("label"), col("qid"), col("n_cands"), col("n_pairs"),
        round((lit(2L) * col("c_cd") - col("n_pairs")).cast("double") /
          col("n_pairs").cast("double"), 6).as("tau_cos_dot"),
        round((lit(2L) * col("c_cl") - col("n_pairs")).cast("double") /
          col("n_pairs").cast("double"), 6).as("tau_cos_l2"))
      .orderBy(col("label"))
  }

  /** Pseudo-relevance-feedback QUERY EXPANSION (Rocchio's step one) —
    * the retrieval move that needs no labels at serving time: search
    * the seed query GLOBALLY, average its top-5 neighbors into an
    * expanded query, re-search, and measure whether label recall@10
    * improved. The before/after pair is the go/no-go number for
    * turning PRF on in a retrieval pipeline — expansion helps when
    * near neighbors are on-topic (label-pure) and actively hurts
    * under topic drift, and this row shows WHICH regime each label
    * block is in.
    *
    * Determinism: the centroid is a per-dimension DECIMAL(18,9) mean
    * cast to FLOAT (the [[kmeansLloydTwo]] centroid convention), so
    * both engines feed the bit-identical f32 cosine kernel the same
    * expanded vector; rankings tie-break on vec_id. Scale shape:
    * queries are |labels|-bounded, so both search passes are
    * (|labels| × corpus) narrow maps with rank≤k windows — the
    * [[bruteForceTopK]] plan fanned over a bounded query axis; the
    * centroid agg touches 5·|labels| rows. */
  def prfExpansion(spark: SparkSession, dir: String,
                   feedbackK: Int = 5, k: Int = 10): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val corpus = e.select(col("vec_id").as("cid"),
      col("label").as("clabel"), col("embedding").as("c_emb"))
    val queries = e.groupBy(col("label")).agg(min(col("vec_id")).as("qid"))
      .join(e.select(col("vec_id").as("qid"),
        col("embedding").as("q_emb")), Seq("qid"))
    def search(qs: DataFrame, emb1: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col("label"))
        .orderBy(col("sim").desc, col("cid"))
      // |labels|-bounded query axis broadcasts; the corpus streams
      corpus.crossJoin(broadcast(qs))
        .filter(col("cid") =!= col("qid"))
        .withColumn("sim", ExprColumns.cosineF32(spark, "c_emb", emb1))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n)
    }
    val top5 = search(queries, "q_emb", feedbackK)
      .select(col("label"), col("qid"), col("cid"))
    val before = search(queries, "q_emb", k)
      .groupBy(col("label"))
      .agg(sum((col("clabel") === col("label")).cast("long"))
        .as("n_same_before"))
    // expanded query: exact-decimal per-dim mean of the 5 feedback
    // vectors, cast to float for the f32 kernel
    val fbDims = top5
      .join(corpus.select(col("cid"), col("c_emb")), Seq("cid"))
      .select(col("label"), col("qid"),
        posexplode(col("c_emb")).as(Seq("d", "v")))
    val expanded = fbDims
      .groupBy(col("label"), col("qid"), col("d"))
      .agg((sum(col("v").cast("double").cast("decimal(18,9)"))
        .cast("double") / count(lit(1))).as("c"))
      .groupBy(col("label"), col("qid"))
      .agg(expr(
        """transform(array_sort(collect_list(struct(d, c))),
             x -> CAST(x.c AS FLOAT))""").as("x_emb"))
    val after = search(expanded, "x_emb", k)
      .groupBy(col("label"))
      .agg(sum((col("clabel") === col("label")).cast("long"))
        .as("n_same_after"))
    queries.select(col("label"), col("qid"))
      .join(before, Seq("label")).join(after, Seq("label"))
      .select(col("label"), col("qid"),
        round(col("n_same_before").cast("double") / k, 6)
          .as("recall10_before"),
        round(col("n_same_after").cast("double") / k, 6)
          .as("recall10_after"),
        (col("n_same_after") - col("n_same_before")).as("gain"))
      .orderBy(col("label"))
  }

  /** RESIDUAL quantization ladder — the two-stage coarse+residual
    * codebook scheme (RQ, the additive cousin of [[pqAdc]]'s
    * subspace split): stage 1 quantizes each vector to its label
    * centroid (exact-decimal means); stage 2 quantizes the RESIDUAL
    * against an 8-word residual codebook (the 8 lowest vec_ids'
    * residuals — the documented cold-start convention) by nearest
    * squared-L2. Reported per label: vectors, mean squared distortion
    * after stage 1 and after stage 2, and the reduction ratio — the
    * "was the second stage worth its bytes" number an index designer
    * reads against the PQ row.
    *
    * Exactness: residuals quantize to micro-unit LONGs before BOTH
    * the assignment argmin and the distortion sums (integer algebra
    * end to end, one /1e12 display division). Scale shape: centroids
    * and the 8-word codebook are broadcast-bounded; assignment is a
    * narrow map over vectors × 8 codewords; no pair space. */
  def residualQuant(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val resid = dv.join(broadcast(cent), Seq("label", "d"))
      .select(col("label"), col("vec_id"), col("d"),
        round((col("val").cast("double") - col("c")) * 1e6).cast("long")
          .as("rq"))
      .localCheckpoint()
    val cbIds = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("cw"))
    val codebook = resid.join(broadcast(cbIds),
        col("vec_id") === col("cw"))
      .select(col("cw"), col("d"), col("rq").as("cq"))
    val assigned = resid
      .join(broadcast(codebook), Seq("d"))
      .groupBy(col("label"), col("vec_id"), col("cw"))
      .agg(sum((col("rq") - col("cq")) * (col("rq") - col("cq")))
        .as("d2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cw"))))
      .filter(col("rk") === 1)
    val stage1 = resid.groupBy(col("label"), col("vec_id"))
      .agg(sum(col("rq") * col("rq")).as("e1"))
    stage1.join(assigned.select(col("vec_id"), col("d2").as("e2")),
        Seq("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round((sum(col("e1")).cast("double") / count(lit(1))) / 1e12, 6)
          .as("mse_stage1"),
        round((sum(col("e2")).cast("double") / count(lit(1))) / 1e12, 6)
          .as("mse_stage2"))
      .withColumn("reduction",
        round(when(col("mse_stage1") > 0,
          lit(1.0) - col("mse_stage2") / col("mse_stage1")), 6))
      .orderBy(col("label"))
  }
  /** Normalized mutual information between the ground-truth label
    * blocking and the band-0 hyperplane-LSH bucketing — the
    * clustering-agreement metric that closes the LSH story the way
    * [[clusterValidity]] closes k-means: how much of the label
    * structure does an 8-bit signature actually capture? Reported as
    * the full contingency census (one row per occupied label×bucket
    * cell with its MI contribution) plus the NMI = I/√(H_label·H_bucket)
    * replicated on every row — the one number a blocking-quality gate
    * thresholds on.
    *
    * Determinism: all probabilities are exact-integer cell/margin
    * counts over one corpus pass; each MI/entropy term is a single
    * double expression over those integers, quantized to
    * DECIMAL(28,12) before its sum so the reductions are
    * order-independent (the [[graft.operators.Quality]] convention).
    *
    * Scale shape: signatures are map-side expressions; the contingency
    * is one (label, bucket) hash-agg, margins are re-aggs of it, and
    * all joins after the first agg are broadcasts of
    * cluster-count-bounded relations. */
  def clusterNmi(spark: SparkSession, dir: String): DataFrame = {
    val cells = emb(spark, dir)
      .select(col("label"),
        element_at(ExprColumns.hyperplaneLsh(spark, "embedding"), 1)
          .as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // cluster-grain contingency, read by 4 branches
    val ma = cells.groupBy(col("label")).agg(sum(col("n")).as("na"))
    val mb = cells.groupBy(col("bucket")).agg(sum(col("n")).as("nb"))
    val tot = cells.agg(sum(col("n")).as("nt"))
    val ha = ma.crossJoin(broadcast(tot))
      .select((col("na").cast("double") / col("nt") *
        log(col("nt").cast("double") / col("na"))).cast("decimal(28,12)")
        .as("t"))
      .agg(sum(col("t")).as("h_label"))
    val hb = mb.crossJoin(broadcast(tot))
      .select((col("nb").cast("double") / col("nt") *
        log(col("nt").cast("double") / col("nb"))).cast("decimal(28,12)")
        .as("t"))
      .agg(sum(col("t")).as("h_bucket"))
    val mi = cells
      .join(broadcast(ma), Seq("label"))
      .join(broadcast(mb), Seq("bucket"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib",
        (col("n").cast("double") / col("nt") *
          log(col("nt").cast("double") * col("n") /
            (col("na").cast("double") * col("nb"))))
          .cast("decimal(28,12)"))
    val itot = mi.agg(sum(col("contrib")).as("i_total"))
    mi.crossJoin(broadcast(itot)) // 1-row MI scalar
      .crossJoin(broadcast(ha)) // 1-row entropy scalar
      .crossJoin(broadcast(hb)) // 1-row entropy scalar
      .select(col("label"), col("bucket"), col("n"),
        round(col("contrib").cast("double"), 6).as("mi_contrib"),
        round(col("i_total").cast("double"), 6).as("i_total"),
        round(col("i_total").cast("double") /
          sqrt(col("h_label").cast("double") *
            col("h_bucket").cast("double")), 6).as("nmi"))
      .orderBy(col("label"), col("bucket"))
  }
  /** Query-directed MULTI-PROBE LSH — the recall-vs-work tuning curve a
    * single-bucket LSH lookup ([[annLshTopPairs]]) leaves on the table:
    * for each per-label query, probe the exact band-0 bucket plus
    * perturbed buckets obtained by flipping one signature bit in
    * ascending |projection-margin| order (the least-confident bit
    * first — the classic multi-probe ordering), and report, per probe
    * budget P ∈ {1, 5, 9}, the candidate-set size and its recall
    * against the exact brute-force top-10.
    *
    * The corpus side uses the map-side [[ExprColumns.hyperplaneLsh]]
    * expression; the QUERY side recomputes the same 8 projections
    * relationally from the md5 plane matrix (bit-identical by
    * construction — the two formulations cross-check each other), so
    * the margin ordering falls out of the projection relation for
    * free.
    *
    * Scale shape: probing is a |queries|·9-row broadcast joined against
    * the bucket-keyed corpus relation — the corpus is never crossed
    * with anything; the brute side is the |queries|-bounded eval gate,
    * not the serving path ([[bruteTopK]] convention). */
  def multiprobeLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val vb = e.select(col("vec_id"),
      element_at(ExprColumns.hyperplaneLsh(spark, "embedding"), 1)
        .as("bucket"))
    val q = e.groupBy(col("label")).agg(min(col("vec_id")).as("qid"))
    val qe = q.join(e.select(col("vec_id").as("qid"),
      col("embedding").as("q_emb")), Seq("qid"))
    val qd = qe.select(col("label"),
        posexplode(col("q_emb")).as(Seq("d0", "v")))
      .select(col("label"), (col("d0") + 1).as("d"),
        col("v").cast("double").cast("decimal(38,15)").as("v"))
    val plane = spark.range(0, 8).select(col("id").cast("int").as("j"))
      .crossJoin(spark.range(1, 65).select(col("id").cast("int").as("d")))
      .select(col("j"), col("d"),
        when((conv(substring(md5(concat(col("j").cast("string"), lit(":"),
          col("d").cast("string"))), 1, 1), 16, 10).cast("int") % 2) === 1,
          1).otherwise(-1).as("s"))
    val qproj = qd.join(broadcast(plane), Seq("d"))
      .groupBy(col("label"), col("j"))
      .agg(sum(when(col("s") === 1, col("v")).otherwise(-col("v")))
        .as("p"))
    val qsig = qproj.groupBy(col("label"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("j"), when(col("p") > 0, "1").otherwise("0").as("bit")))),
        x => x("bit")), "").as("bucket"))
    val flips = qproj
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("label")).orderBy(abs(col("p")), col("j"))))
      .join(qsig, Seq("label"))
      .select(col("label"), col("pr"),
        concat(substring(col("bucket"), lit(1), col("j")),
          when(substring(col("bucket"), col("j") + 1, lit(1)) === "1", "0")
            .otherwise("1"),
          substring(col("bucket"), col("j") + 2, lit(8))).as("bucket"))
    val probes = qsig.select(col("label"), lit(0).as("pr"), col("bucket"))
      .unionByName(flips)
    val ps = spark.range(0, 3)
      .select(element_at(typedLit(Seq(1, 5, 9)), col("id").cast("int") + 1)
        .as("n_probes"))
    val cand = vb.join(broadcast(probes), Seq("bucket"))
      .crossJoin(broadcast(ps)) // 3-row budget axis
      .filter(col("pr") < col("n_probes"))
      .select(col("label"), col("n_probes"), col("vec_id")).distinct()
      .join(broadcast(q), Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
    val brute = qe.crossJoin(e.select(col("vec_id").as("cid"),
        col("label").as("clabel"), col("embedding").as("c_emb")))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "c_emb", "q_emb"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("sim").desc, col("cid"))))
      .filter(col("rk") <= 10)
      .select(col("label"), col("cid").as("vec_id"))
    val hits = cand.join(brute, Seq("label", "vec_id"))
      .groupBy(col("label"), col("n_probes"))
      .agg(count(lit(1)).as("n_hits"))
    // label × budget spine: an empty candidate set is a 0-row, not an
    // absent row — a tuning curve with holes misreads as coverage
    q.select(col("label")).crossJoin(broadcast(ps))
      .join(cand.groupBy(col("label"), col("n_probes"))
        .agg(count(lit(1)).as("n_candidates")),
        Seq("label", "n_probes"), "left")
      .join(hits, Seq("label", "n_probes"), "left")
      .select(col("label"), col("n_probes"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / 10.0, 6)
          .as("recall"))
      .orderBy(col("label"), col("n_probes"))
  }
  /** GREEDY graph search simulation over the k-NN graph — the
    * navigability measurement the structural probes ([[Graph.bfsKnn]]
    * reachability, [[Graph.closenessCentrality]] spread) build toward:
    * start each per-label query at the block's HIGHEST vec_id (a
    * deterministic cold entry), walk six best-neighbor steps (move
    * to the neighbor most similar to the query, staying put when no
    * neighbor improves), and report the full per-hop CONVERGENCE
    * TRACE against the true brute-force nearest neighbor — HNSW's
    * base-layer search, unrolled relationally. The trace is monotone
    * by construction (the current node always competes), which the
    * spec pins; where the trace plateaus below nn_sim, the graph is
    * measurably non-navigable from that entry (the honest readout on
    * near-random embeddings).
    *
    * Each step is one equi-join of the |queries|-bounded cursor
    * relation against the degree-bounded edge relation plus a top-1
    * window — no corpus-sized work after the shared k-NN edge kernel;
    * the brute side is the |queries|-bounded eval gate. */
  def greedySearch(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val edges = knnEdges(spark, dir, 3)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = edges
      .union(edges.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "v1", "v2").distinct()
    val q = e.groupBy(col("label")).agg(min(col("vec_id")).as("qid"),
      max(col("vec_id")).as("entry"))
    val qe = q.join(e.select(col("vec_id").as("qid"),
      col("embedding").as("q_emb")), Seq("qid"))
    def simTo(cur: DataFrame, node: String): DataFrame =
      cur.join(e.select(col("vec_id").as(node),
          col("embedding").as("n_emb")), Seq(node))
        .withColumn("sim", ExprColumns.cosineF32(spark, "n_emb", "q_emb"))
        .drop("n_emb")
    val s0 = simTo(qe.select(col("label"), col("qid"), col("q_emb"),
      col("entry").as("cur")), "cur")
      .withColumnRenamed("sim", "cur_sim")
    def step(cur: DataFrame): DataFrame = {
      val cand = cur
        .join(sym.toDF("label", "cur", "nxt"), Seq("label", "cur"), "left")
        .filter(col("nxt").isNull || col("nxt") =!= col("qid"))
      val scored = simTo(cand.filter(col("nxt").isNotNull), "nxt")
        .select(col("label"), col("qid"), col("q_emb"),
          col("nxt").as("cand"), col("sim"))
        .unionByName(cur.select(col("label"), col("qid"), col("q_emb"),
          col("cur").as("cand"), col("cur_sim").as("sim")))
      scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("label"))
            .orderBy(col("sim").desc, col("cand"))))
        .filter(col("rk") === 1)
        .select(col("label"), col("qid"), col("q_emb"),
          col("cand").as("cur"), col("sim").as("cur_sim"))
    }
    // checkpoint each cursor: the trace union would otherwise replay
    // step k's whole join chain once per later hop (measured 27 s at
    // sf0.1; ~6 s with the |labels|-row cuts)
    val steps = (1 to 6).scanLeft(s0.localCheckpoint())(
      (cur, _) => step(cur).localCheckpoint())
    val trace = steps.zipWithIndex.map { case (st, h) =>
      st.select(col("label"), lit(h).as("hop"), col("cur"),
        col("cur_sim"))
    }.reduce(_.unionByName(_))
    val brute = qe
      .crossJoin(e.select(col("vec_id").as("cid"),
        col("embedding").as("c_emb")))
      .filter(col("cid") =!= col("qid"))
      .withColumn("bsim", ExprColumns.cosineF32(spark, "c_emb", "q_emb"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("bsim").desc, col("cid"))))
      .filter(col("rk") === 1)
      .select(col("label"), col("cid").as("nn_id"), col("bsim"))
    trace.join(broadcast(brute), Seq("label"))
      .select(col("label"), col("hop"), col("cur").as("node"),
        round(col("cur_sim").cast("double"), 4).as("sim"),
        col("nn_id"),
        round(col("bsim").cast("double"), 4).as("nn_sim"),
        (col("cur") === col("nn_id")).as("reached"))
      .orderBy(col("label"), col("hop"))
  }

  /** LAYERED HNSW search — the coarse-to-fine descent that composes
    * the pieces the family built separately ([[hnswLevels]] the
    * skip-list geometry, [[knnEdges]]-style layer graphs,
    * [[greedySearch]] the base-layer walk) into the industry-default
    * ANN serving path: per label block, layer l's graph is the k-NN
    * graph over the nodes whose [[hnswLevelOf]] draw is ≥ l (so upper
    * layers are sparse express lanes), the search enters at the
    * label's HIGHEST-level node and takes two greedy hops per layer
    * through layers 2 → 1 → 0, carrying the best node down. The
    * readout is the recall@10-vs-hops curve: after each step, the
    * cumulative EXPLORED set (every candidate the walk scored — the
    * true cost meter of an HNSW query) is intersected with the
    * brute-force within-label top-10 ([[recallEval]]'s truth
    * discipline). One row per (label, step 0..6): layer, current
    * node, its similarity, cumulative candidates scored, cumulative
    * recall@10.
    *
    * The walk is monotone by construction (the current node always
    * competes), and a node whose level excludes it from a layer's
    * graph simply has no neighbors there — the cursor stays put, the
    * honest behavior when a label's skip-list is shallow.
    *
    * Plan: three label-blocked k-NN edge kernels (levels ≥2 / ≥1 /
    * ≥0 — a 1 + 1/4 + 1/16 ≈ 1.3x multiple of the one the flat
    * greedy row pays, each checkpointed at degree-bounded grain);
    * each hop is one |labels|-row cursor equi-join against a bounded
    * edge relation plus a per-label top-1 window; the explored census
    * and recall fold run on the ≤ |labels|·(1+6·2k)-row candidate
    * union — nothing corpus-scale after the edge kernels. */
  def hnswSearch(spark: SparkSession, dir: String, kEdges: Int = 3,
      k: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val nodes = e.withColumn("level",
      hnswLevelOf(col("vec_id")).cast("long"))
    def layerEdges(l: Int): DataFrame = {
      val nl = nodes.filter(col("level") >= l)
      val a = nl.select(col("label"), col("vec_id").as("v1"),
        col("embedding").as("e1"))
      val bb = nl.select(col("label"), col("vec_id").as("v2"),
        col("embedding").as("e2"))
      val knn = a.join(bb, Seq("label")).filter(col("v1") =!= col("v2"))
        .withColumn("sim", ExprColumns.cosineF32(spark, "e1", "e2"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("v1"))
            .orderBy(col("sim").desc, col("v2"))))
        .filter(col("rk") <= kEdges)
        .select(col("label"), col("v1"), col("v2"))
      knn.union(knn.select(col("label"), col("v2"), col("v1"))
          .toDF("label", "v1", "v2")).distinct()
        .localCheckpoint() // degree-bounded per-layer edge relation
    }
    val layerEdge: Map[Int, DataFrame] =
      Seq(2, 1, 0).map(l => l -> layerEdges(l)).toMap
    val q = e.groupBy(col("label")).agg(min(col("vec_id")).as("qid"))
    val qe = q.join(e.select(col("vec_id").as("qid"),
      col("embedding").as("q_emb")), Seq("qid"))
    val entry = nodes
      .join(q.select(col("label"), col("qid")), Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("level").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select(col("label"), col("vec_id").as("cur"))
    def simTo(cur: DataFrame, node: String): DataFrame =
      cur.join(e.select(col("vec_id").as(node),
          col("embedding").as("n_emb")), Seq(node))
        .withColumn("sim", ExprColumns.cosineF32(spark, "n_emb", "q_emb"))
        .drop("n_emb")
    val s0 = simTo(qe.join(entry, Seq("label")), "cur")
      .select(col("label"), col("qid"), col("q_emb"), col("cur"),
        col("sim").as("cur_sim"))
      .localCheckpoint()
    val layersOfStep = Seq(2, 2, 1, 1, 0, 0)
    var cur = s0
    var trace = Vector((0, 2, s0))
    var explored = Vector(s0.select(col("label"),
      col("cur").as("cand"), lit(0L).as("fstep")))
    for ((l, i) <- layersOfStep.zipWithIndex) {
      val stepIdx = i + 1
      val nbrs = cur
        .join(layerEdge(l).toDF("label", "cur", "nxt"),
          Seq("label", "cur"))
        .filter(col("nxt") =!= col("qid"))
      val nbrScored = simTo(nbrs, "nxt")
        .select(col("label"), col("qid"), col("q_emb"),
          col("nxt").as("cand"), col("sim"))
        .localCheckpoint() // |labels|*2k rows: reused by best + census
      val scored = nbrScored.unionByName(
        cur.select(col("label"), col("qid"), col("q_emb"),
          col("cur").as("cand"), col("cur_sim").as("sim")))
      val next = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("label"))
            .orderBy(col("sim").desc, col("cand"))))
        .filter(col("rk") === 1)
        .select(col("label"), col("qid"), col("q_emb"),
          col("cand").as("cur"), col("sim").as("cur_sim"))
        .localCheckpoint() // |labels|-row cursor cut per hop
      explored = explored :+ nbrScored.select(col("label"), col("cand"),
        lit(stepIdx.toLong).as("fstep"))
      trace = trace :+ ((stepIdx, l, next))
      cur = next
    }
    val firstSeen = explored.reduce(_ unionByName _)
      .groupBy(col("label"), col("cand")).agg(min(col("fstep")).as("fs"))
    val brute = qe.join(e.select(col("label"), col("vec_id").as("cid"),
        col("embedding").as("c_emb")), Seq("label"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("bsim", ExprColumns.cosineF32(spark, "c_emb", "q_emb"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("bsim").desc, col("cid"))))
      .filter(col("rk") <= k) // within-label truth -> group limit
      .select(col("label"), col("cid").as("cand"), lit(1L).as("hit"))
    val steps = spark.range(0, 7).select(col("id").as("step"))
    val spine = q.select(col("label")).crossJoin(broadcast(steps))
    val fsHit = firstSeen.join(brute, Seq("label", "cand"), "left")
    val census = spine.join(fsHit, Seq("label"), "left")
      .groupBy(col("label"), col("step"))
      .agg(sum(when(col("fs") <= col("step"), 1L).otherwise(0L))
          .as("n_explored"),
        sum(when(col("fs") <= col("step"),
          coalesce(col("hit"), lit(0L))).otherwise(0L)).as("n_hits"))
    val traceDf = trace.map { case (s, l, st) =>
      st.select(col("label"), lit(s.toLong).as("step"),
        lit(l.toLong).as("layer"), col("cur").as("node"),
        col("cur_sim").as("sim"))
    }.reduce(_ unionByName _)
    traceDf.join(census, Seq("label", "step"))
      .select(col("label"), col("step"), col("layer"), col("node"),
        round(col("sim").cast("double"), 4).as("sim"),
        col("n_explored"),
        round(col("n_hits").cast("double") / k, 4).as("recall_at_10"))
      .orderBy(col("label"), col("step"))
  }
  /** TWO-NN intrinsic-dimension estimate (Facco et al.) per label
    * block — the data-geometry diagnostic that predicts whether the
    * ANN rungs ([[ivfTopK]], [[annLshTopPairs]], [[greedySearch]])
    * can work at all: with d₁ ≤ d₂ the cosine distances (1 − sim) to
    * each vector's two nearest neighbors, μ = d₂/d₁ and the MLE
    * d̂ = n_used / Σ ln μ. High intrinsic dimension (≈ the ambient 64
    * on this synthetic corpus) is exactly the regime where greedy
    * search plateaus and LSH recall needs many probes — this row
    * explains those measurements rather than just reporting them.
    *
    * Exact-d₁-zero pairs (true duplicates) are excluded and counted;
    * each ln μ quantizes to DECIMAL(28,12) before the sum.
    *
    * Scale shape: the within-label top-2 relation is the [[knnEdges]]
    * kernel at k = 2; everything after is label-grain. */
  def intrinsicDim(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val top2 = e.crossJoin(e.select(col("label").as("l2"),
        col("vec_id").as("v2"), col("embedding").as("e2")))
      .filter(col("label") === col("l2") && col("vec_id") =!= col("v2"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "embedding", "e2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("sim").desc, col("v2"))))
      .filter(col("rk") <= 2)
      .groupBy(col("label"), col("vec_id"))
      .agg(max(when(col("rk") === 1, lit(1.0) - col("sim"))).as("d1"),
        max(when(col("rk") === 2, lit(1.0) - col("sim"))).as("d2"))
    // `usable` must cover exactly the rows that contribute a lnmu term:
    // a 2-vector block yields d2 = null (only one neighbor exists), and
    // counting it in n_used while its null lnmu drops out of sln would
    // put mismatched populations in the n_used/sln MLE ratio.
    val terms = top2
      .withColumn("usable", col("d1") > 0 && col("d2").isNotNull)
      .withColumn("lnmu",
        when(col("usable"),
          log(col("d2") / col("d1")).cast("decimal(28,12)")))
    terms.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("usable").cast("long")).as("n_used"),
        sum(col("lnmu")).as("sln"))
      .select(col("label"), col("n_vectors"), col("n_used"),
        round(col("n_used").cast("double") /
          col("sln").cast("double"), 4).as("id_hat"))
      .orderBy(col("label"))
  }
  /** Embedding L2-norm census per label — the normalization audit
    * every cosine-based rung implicitly assumes away: per block, the
    * exact-decimal mean norm, the min/max, and the coefficient of
    * variation. A block with wide norm spread makes dot-product and
    * cosine rankings disagree — exactly when [[mipsAugment]]'s
    * reduction is needed instead of plain cosine; near-constant norms
    * mean cosine ≈ scaled dot and the cheaper kernel is safe.
    *
    * Norm² is an exact sum of DECIMAL(18,9)-quantized squared
    * components (the [[ivfTopK]] centroid convention); each norm is
    * one sqrt; means and CV quantize per the house rule.
    *
    * Plan: one positional explode into a (vec, dim) hash-agg, then a
    * |labels|-row census. */
  def normCensus(spark: SparkSession, dir: String): DataFrame =
    dims(emb(spark, dir), withLabel = true)
      .groupBy(col("label"), col("vec_id"))
      .agg(sqrt(sum(col("val").cast("double").cast("decimal(18,9)") *
        col("val").cast("double").cast("decimal(18,9)"))
        .cast("double")).as("norm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("norm").cast("decimal(28,12)")).as("sn"),
        sum((col("norm") * col("norm")).cast("decimal(28,12)"))
          .as("snn"),
        min(col("norm")).as("mn"), max(col("norm")).as("mx"))
      .select(col("label"), col("n"),
        round(col("sn").cast("double") / col("n"), 6).as("mean_norm"),
        round(col("mn"), 6).as("min_norm"),
        round(col("mx"), 6).as("max_norm"),
        // quantized sums can push a near-zero variance a hair negative
        round(sqrt(greatest((col("n") * col("snn") -
          col("sn") * col("sn")).cast("double"), lit(0.0)) /
          (col("n").cast("double") * (col("n") - 1).cast("double"))) /
          (col("sn").cast("double") / col("n")), 6).as("cv"))
      .orderBy(col("label"))

  /** Multi-vector LATE-INTERACTION retrieval (the ColBERT MaxSim
    * scoring shape) — the rung above single-vector [[bruteForceTopK]]
    * when each item is a SET of vectors: the three lowest-vec_id
    * embeddings form the multi-vector query's "tokens"; each label
    * block is a candidate multi-vector document; the score is
    * MaxSim(Q, D) = Σ_{q∈Q} max_{v∈D} cos(q, v) with the query's own
    * vectors excluded from their home block. Per label the census also
    * reports the weakest token match (min over q of the max) — the
    * operand a MaxSim pruner bounds first at serving time.
    *
    * Determinism: each per-(label, token) max quantizes to
    * DECIMAL(18,9) before the 3-term sum; final ranking ties on label.
    *
    * Plan: |Q| is a 3-row broadcast, so the interaction is ONE
    * codegen'd map over the corpus (no corpus shuffle), a
    * (label × 3)-grain max re-agg, and a label-grain sum — linear at
    * 100 TB, the same shape FAISS-style MaxSim sharding uses. */
  def maxsimMultivec(spark: SparkSession, dir: String,
      nq: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val q = e.orderBy(col("vec_id")).limit(nq)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val inter = e.join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .groupBy(col("label"), col("q_id"))
      .agg(max(col("sim").cast("double").cast("decimal(18,9)"))
        .as("tok_max"))
    inter.groupBy(col("label"))
      .agg(count(lit(1)).as("n_tokens_matched"),
        sum(col("tok_max")).as("score"),
        min(col("tok_max")).as("weakest"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("label"))))
      .select(col("rk").cast("long").as("rk"),
        col("label"), col("n_tokens_matched"),
        round(col("score").cast("double"), 6).as("maxsim_score"),
        round(col("weakest").cast("double"), 6).as("weakest_token"))
      .orderBy(col("rk"))
  }

  /** HUBNESS census of the k-NN graph — the high-dimensional
    * pathology diagnostic ([[intrinsicDim]]'s practical consequence):
    * in high intrinsic dimension a few "hub" vectors appear in
    * MANY other vectors' k-NN lists while "anti-hubs" appear in none,
    * which silently skews every k-NN-based rung (graph search quality,
    * link prediction, kNN classification). Per label: the k-occurrence
    * (in-degree) mean is k by construction — the signal is the spread:
    * max k-occurrence, the in-degree standard deviation over ALL
    * vertices (including zero-in-degree anti-hubs), the anti-hub
    * count, and the top hub's id.
    *
    * Exactness: in-degrees are exact integers; the std is one sqrt of
    * an exact-integer variance expression.
    *
    * Plan: the k-NN edge kernel, an in-degree hash agg, a left join
    * from the vertex relation (anti-hubs have no in-edges), a
    * label-grain reduce with an argmax window. */
  def hubness(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val inDeg = knnEdges(spark, dir, k)
      .groupBy(col("label"), col("v2")).agg(count(lit(1)).as("d"))
    val verts = e.select(col("label"), col("vec_id"))
      .join(inDeg.withColumnRenamed("v2", "vec_id"),
        Seq("label", "vec_id"), "left")
      .select(col("label"), col("vec_id"),
        coalesce(col("d"), lit(0L)).as("d"))
    val top = verts
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("d").desc, col("vec_id"))))
      .filter(col("rk") === 1)
      .select(col("label"), col("vec_id").as("top_hub"),
        col("d").as("top_k_occ"))
    verts.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("d")).as("sd"),
        sum(col("d") * col("d")).as("sdd"),
        sum((col("d") === 0).cast("long")).as("n_antihubs"))
      .join(top, Seq("label"))
      .select(col("label"), col("n_vectors"), col("n_antihubs"),
        col("top_hub"), col("top_k_occ"),
        round(col("sd").cast("double") / col("n_vectors"), 6)
          .as("mean_k_occ"),
        round(sqrt((col("n_vectors") * col("sdd") -
          col("sd") * col("sd")).cast("double")) /
          col("n_vectors").cast("double"), 6).as("std_k_occ"))
      .orderBy(col("label"))
  }

  /** FILTERED ANN: the pre-filter vs post-filter tradeoff measured —
    * the question every vector store with metadata predicates answers
    * badly ("WHERE source = X AND vector near q"): pre-filtering
    * scans only the predicate-matching subset (exact but loses any
    * shared index), post-filtering takes an UNFILTERED top-K′ and
    * filters afterwards (index-friendly but recall drops when the
    * predicate is selective). For five broadcast queries against the
    * even-vec_id predicate: recall@10 of post-filter at K′ = 20 vs
    * the pre-filter ground truth, with the kept-candidate count that
    * explains each miss.
    *
    * Determinism: rankings tie-break on vec_id; recall counts are
    * exact integers.
    *
    * Plan: ONE corpus map per side (queries broadcast), two rank
    * windows; the post-filter side never touches the predicate until
    * after the cut — exactly the access pattern being measured. */
  def filteredTopK(spark: SparkSession, dir: String, k: Int = 10,
      kPrime: Int = 20, nQueries: Int = 5): DataFrame = {
    val e = emb(spark, dir)
    val q = e.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = e.join(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "embedding",
        "q_emb"))
      .select(col("q_id"), col("vec_id"), col("sim"))
    val pre = scored.filter(col("vec_id") % 2 === 0)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= k)
    val post = scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rk") <= kPrime && col("vec_id") % 2 === 0)
    pre.select(col("q_id"), col("vec_id"))
      .join(post.select(col("q_id"), col("vec_id"),
        lit(1L).as("hit")), Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .join(post.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_post_kept")), Seq("q_id"))
      .select(col("q_id"), col("n_truth"), col("n_post_kept"),
        col("n_hit"),
        round(col("n_hit").cast("double") /
          col("n_truth").cast("double"), 4).as("recall_post"))
      .orderBy(col("q_id"))
  }

  /** SEMANTIC-DRIFT monitor between label groups — the embedding-space
    * distribution check a production pipeline runs on every new data
    * slice (are this source's vectors occupying the same regions as
    * the corpus?): every vector is assigned to its nearest of the k=8
    * seed centroids (the [[kmeansAssignIter]] broadcast-argmax kernel),
    * and each label's bucket distribution is compared to the GLOBAL
    * bucket distribution by Jensen–Shannon divergence (natural log;
    * per-bucket terms quantized to DECIMAL(28,12) before the sum).
    * A label with high JS sits in different semantic regions than the
    * corpus — the drift alarm.
    *
    * Plan: one broadcast-argmax map over the corpus (no k-way
    * expand), a (label, bucket) hash agg, then all divergence algebra
    * on the ≤|labels|·k relation. */
  def semanticDrift(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame = {
    ExprColumns.register(spark)
    val e = emb(spark, dir)
    val seedArr = e.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("seed_id"),
        col("embedding").as("seed_emb"))
      .agg(array_sort(collect_list(struct(col("seed_id"),
        col("seed_emb")))).as("seeds"))
    val assigned = e.join(broadcast(seedArr))
      .withColumn("best", expr(
        """array_max(transform(seeds, s ->
             struct(graft_cosine_f32(embedding, s.seed_emb) AS sim,
                    -s.seed_id AS nsid)))"""))
      .select(col("label"), (-col("best.nsid")).as("bucket"))
    val byLabel = assigned.groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val labelTot = byLabel.groupBy(col("label"))
      .agg(sum(col("c")).as("n_label"))
    val globalB = byLabel.groupBy(col("bucket"))
      .agg(sum(col("c")).as("g"))
    val globalTot = globalB.agg(sum(col("g")).as("n_all"))
    // dense (label x bucket) grid so zero-mass buckets enter the JS sum
    val grid = labelTot.crossJoin(
      globalB.crossJoin(broadcast(globalTot)))
      .join(byLabel, Seq("label", "bucket"), "left")
      .withColumn("p", coalesce(col("c"), lit(0L)).cast("double") /
        col("n_label").cast("double"))
      .withColumn("q", col("g").cast("double") /
        col("n_all").cast("double"))
      .withColumn("m", (col("p") + col("q")) / 2.0)
      .withColumn("term", (
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2.0)
          .otherwise(lit(0.0)) +
          when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2.0)
            .otherwise(lit(0.0))).cast("decimal(28,12)"))
    grid.groupBy(col("label"))
      .agg(max(col("n_label")).as("n_vectors"),
        sum(col("term")).as("js"),
        max(struct(coalesce(col("c"), lit(0L)).as("c"),
          col("bucket"))).as("top"))
      .select(col("label"), col("n_vectors"),
        round(col("js").cast("double"), 6).as("js_to_global"),
        col("top.bucket").as("top_bucket"),
        round(col("top.c").cast("double") /
          col("n_vectors").cast("double"), 4).as("top_bucket_share"))
      .orderBy(col("label"))
  }

  /** Diagonal-Mahalanobis OUT-OF-DISTRIBUTION census per label block —
    * the embedding-QC gate a pipeline runs before trusting a batch of
    * vectors: each vector's distance to its OWN label centroid,
    * normalized per dimension by the label's variance (the diagonal
    * Mahalanobis d² = Σ_j (x_j − μ_j)²/σ²_j — the full covariance is
    * a d×d solve nothing at 100 TB wants), flagged when d² exceeds
    * 2× the dimension count (E[d²] = d for in-distribution Gaussians).
    * Reported per label: the flag count, mean/max d², and the most
    * anomalous vector's id.
    *
    * Determinism: μ and σ² come from exact DECIMAL(18,9)-quantized
    * component sums; each per-dimension term quantizes to
    * DECIMAL(28,12) before the per-vector sum; argmax ties on vec_id.
    * Degenerate cells are guarded, not poisoned: a singleton label
    * (n = 1 → σ² is 0/0) leaves var NULL and a zero-variance
    * dimension (constant/padded component — a realistic input)
    * contributes 0 to d², because NaN/Infinity would throw at the
    * DECIMAL cast under ANSI mode.
    *
    * Plan: one positional explode to (vec, dim) grain (the kernel
    * every vector statistic here pays), a (label, dim) moment agg
    * (bounded: |labels|·d rows), a join back by (label, dim), a
    * per-vector reduce, a label census. */
  def oodMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    val d = dims(emb(spark, dir), withLabel = true)
      .select(col("label"), col("vec_id"), col("d").as("dim"),
        col("val").cast("double").cast("decimal(18,9)").as("x"))
    val mom = d.groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).as("sxx"))
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .withColumn("var",
        when(col("n") > 1,
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n")) / (col("n") - 1).cast("double")))
    val d2 = d.join(mom.select(col("label"), col("dim"), col("mu"),
        col("var")), Seq("label", "dim"))
      .withColumn("term",
        when(col("var") > 0,
          ((col("x").cast("double") - col("mu")) *
            (col("x").cast("double") - col("mu"))) / col("var"))
          .otherwise(lit(0.0))
          .cast("decimal(28,12)"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("term")).as("d2"), count(lit(1)).as("ndim"))
    d2.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        max(col("ndim")).as("n_dims"),
        sum((col("d2").cast("double") >
          lit(2.0) * col("ndim")).cast("long")).as("n_flagged"),
        round(sum(col("d2")).cast("double") / count(lit(1)), 4)
          .as("mean_d2"),
        round(max(col("d2")).cast("double"), 4).as("max_d2"),
        max(struct(col("d2").as("d2"), col("vec_id"))).as("worst"))
      .select(col("label"), col("n_vectors"), col("n_dims"),
        col("n_flagged"), col("mean_d2"), col("max_d2"),
        col("worst.vec_id").as("worst_vec"))
      .orderBy(col("label"))
  }

  /** MAXIMAL MARGINAL RELEVANCE re-rank of the exact top-20 — the
    * diversity-aware serving step between retrieval and the user
    * (Carbonell & Goldstein's MMR: a result list of 10 near-duplicates
    * of the best hit is less useful than 10 distinct aspects): from
    * the anchor query's exact-cosine top-`nCand`, greedily select
    * `k` results maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s),
    * λ = 0.7 — relevance traded against redundancy with what's
    * already shown. Each emitted row carries the relevance, the
    * redundancy term, and the MMR score that won the round.
    *
    * Determinism: cosines are the f32-exact expression; every greedy
    * argmax ties on vec_id; the empty-selection redundancy is 0 by
    * the same coalesce in both engines.
    *
    * Plan: ONE corpus pass (anchor-broadcast cosine map) cut to the
    * rank-limited top-`nCand` and localCheckpoint'd with its
    * `nCand`²-candidate pair-similarity relation; all `k` greedy
    * rounds then run on those bounded relations — round cost is
    * independent of corpus size. */
  def mmrRerank(spark: SparkSession, dir: String, queryId: Long = 0L,
      nCand: Int = 20, k: Int = 10,
      lambda: Double = 0.7): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    val cand = e.join(broadcast(q)) // 1-row anchor
      .filter(col("vec_id") =!= queryId)
      .withColumn("rel", ExprColumns.cosineF32(spark, "embedding", "q_emb"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rel").desc, col("vec_id"))))
      .filter(col("rn") <= nCand) // rank-limited -> group limit
      .select(col("vec_id"), col("embedding"), col("rel"))
      .localCheckpoint() // <=nCand rows: the greedy loop's world
    val pairs = cand.select(col("vec_id").as("a"),
        col("embedding").as("ea"))
      .join(cand.select(col("vec_id").as("b"), col("embedding").as("eb")),
        col("a") =!= col("b"))
      .withColumn("psim", ExprColumns.cosineF32(spark, "ea", "eb"))
      .select(col("a"), col("b"), col("psim"))
      .localCheckpoint() // <=nCand^2 rows
    val c0 = cand.select(col("vec_id"), col("rel"))
    var selected: DataFrame = null
    var out: DataFrame = null
    for (t <- 1 to k) {
      val remaining =
        if (selected == null) c0
        else c0.join(selected.select(col("vec_id")), Seq("vec_id"),
          "left_anti")
      val withRed =
        if (selected == null)
          remaining.withColumn("msim", lit(null).cast("double"))
        else remaining
          .join(pairs.join(selected.select(col("vec_id").as("b")),
            Seq("b")).groupBy(col("a"))
            .agg(max(col("psim")).as("msim")),
            col("vec_id") === col("a"), "left")
          .select(col("vec_id"), col("rel"), col("msim"))
      val pick = withRed
        .withColumn("score", lit(lambda) * col("rel") -
          lit(1.0 - lambda) * coalesce(col("msim"), lit(0.0)))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(1)
        .select(lit(t.toLong).as("mmr_rank"), col("vec_id"),
          col("rel"), col("msim"), col("score"))
        .localCheckpoint() // 1 row; cuts the greedy lineage chain
      selected = if (selected == null) pick.select(col("vec_id"))
        else selected.unionByName(pick.select(col("vec_id")))
      out = if (out == null) pick else out.unionByName(pick)
    }
    out.select(col("mmr_rank"), col("vec_id"),
        round(col("rel").cast("double"), 6).as("relevance"),
        round(col("msim").cast("double"), 6).as("max_sim_selected"),
        round(col("score"), 6).as("mmr_score"))
      .orderBy(col("mmr_rank"))
  }

  /** Centroid assignment MARGIN census — the confusion-risk readout a
    * router/classifier built on label centroids needs before trusting
    * nearest-centroid assignment: per vector, the cosine gap between
    * its best and second-best label centroid (small margin = the
    * vector sits on a decision boundary), censused as the (true
    * label, assigned label) confusion matrix with mean/min margins.
    * Off-diagonal rows with small margins are the label noise a
    * curation pass inspects first.
    *
    * Determinism: centroids are exact-DECIMAL(18,9) means; per-vector
    * margins quantize to DECIMAL(18,9) before the census sums; the
    * top-2 ranking ties on centroid label.
    *
    * Plan: one (label, dim) centroid agg (bounded), one dims explode
    * joined to the broadcast centroid relation, a per-vector
    * PARTITIONED rank window cut at 2, a ≤|labels|²-row census. */
  def centroidMargin(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val dv = dims(e, withLabel = true)
    val d9: Column => Column = c => c.cast("double").cast("decimal(18,9)")
    val cent = dv.groupBy(col("label").as("cell"), col("d"))
      .agg((sum(d9(col("val"))).cast("double") / count(lit(1))).as("c"))
    val cn = cent.groupBy(col("cell"))
      .agg(sqrt(sum(d9(col("c")) * d9(col("c"))).cast("double"))
        .as("cnorm"))
    val per = dv
      .join(broadcast(cent), Seq("d"))
      .groupBy(col("vec_id"), col("label"), col("cell"))
      .agg(sum(d9(col("val")) * d9(col("c"))).cast("double").as("dot"),
        sqrt(sum(d9(col("val")) * d9(col("val"))).cast("double"))
          .as("vnorm"))
      .join(broadcast(cn), Seq("cell"))
      .withColumn("s", col("dot") / (col("vnorm") * col("cnorm")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("s").desc, col("cell"))
    val top2 = per
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("rn") === 1, col("cell"))).as("pred"),
        max(when(col("rn") === 1, col("s"))).as("s1"),
        max(when(col("rn") === 2, col("s"))).as("s2"))
      .withColumn("margin",
        (col("s1") - col("s2")).cast("decimal(18,9)"))
    top2.groupBy(col("label").as("true_label"),
        col("pred").as("assigned_label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("margin")).cast("double") / count(lit(1)), 6)
          .as("mean_margin"),
        round(min(col("margin")).cast("double"), 6).as("min_margin"))
      .orderBy(col("true_label"), col("assigned_label"))
  }

  /** MATRYOSHKA truncation recall — the evaluation behind
    * MRL-style adaptive retrieval (can the FIRST d/2 or d/4
    * dimensions stand in for the full vector?): for five broadcast
    * queries, recall@10 of cosine ranking over the PREFIX-truncated
    * embeddings (32 and 16 of 64 dims) against the full-width exact
    * ground truth. High prefix recall licenses the memory/latency
    * saving; on embeddings NOT trained matryoshka-style (this
    * corpus), the measured drop IS the finding.
    *
    * Determinism: truncation is `slice`; cosine is the same f32-exact
    * expression on the sliced arrays; rankings tie on vec_id.
    *
    * Plan: one corpus map per width (queries broadcast, `slice` is
    * narrow), three rank windows, an exact set intersection at
    * (query, k)-bounded size. */
  def matryoshkaRecall(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5): DataFrame = {
    val e = emb(spark, dir)
    val q = e.orderBy(col("vec_id")).limit(nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def topAt(width: Option[Int]): DataFrame = {
      val (ec, qc) = width match {
        case Some(w) => (expr(s"slice(embedding, 1, $w)"),
          expr(s"slice(q_emb, 1, $w)"))
        case None => (col("embedding"), col("q_emb"))
      }
      e.join(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("ve", ec).withColumn("qe", qc)
        .withColumn("sim", ExprColumns.cosineF32(spark, "ve", "qe"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id"))
            .orderBy(col("sim").desc, col("vec_id"))))
        .filter(col("rk") <= k)
        .select(col("q_id"), col("vec_id"))
    }
    val truth = topAt(None)
    def recallOf(w: Int): DataFrame =
      truth.join(topAt(Some(w))
          .withColumn("hit", lit(1L)), Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as(s"hits_$w"))
    recallOf(32).join(recallOf(16), Seq("q_id"))
      .select(col("q_id"), lit(k.toLong).as("k"),
        col("hits_32"), col("hits_16"),
        round(col("hits_32").cast("double") / k, 4).as("recall_d32"),
        round(col("hits_16").cast("double") / k, 4).as("recall_d16"))
      .orderBy(col("q_id"))
  }

  /** BEAM search over the k-NN graph — the ef/beam-width knob that
    * turns [[greedySearch]]'s 1-cursor walk into the recall-for-work
    * dial every graph-ANN deployment tunes (HNSW's `efSearch`): for
    * beam widths 1/2/4, the frontier keeps the best `b` nodes seen so
    * far, each hop scores frontier ∪ their graph neighbors against
    * the label's query, and after `hops` rounds the CUMULATIVE
    * explored set (every candidate ever scored — the true cost meter)
    * is intersected with the within-label brute-force top-10 truth
    * ([[recallEval]]'s discipline). One row per (beam, label):
    * explored count, top-10 recall, the beam's best similarity beside
    * the true NN's, and whether the NN itself was found — the curve
    * that shows WHY serving defaults land at beam ≈ 2-4: beam 1 is
    * greedy's local-optimum risk, beam 4 approaches exhaustive recall
    * at a fraction of the scan.
    *
    * Scale shape: the one corpus-scale relation is the label-blocked
    * k-NN edge kernel the whole graph family shares; after it, every
    * hop is a |labels|·b-row frontier equi-joined against the
    * degree-bounded edge list plus a per-label top-b PARTITIONED rank
    * (WindowGroupLimit map-side), each hop checkpointed so hop h+1
    * never replays hop h's join chain. The recall fold runs on the
    * ≤ |labels|·(1 + Σ_h b(k+1))-row explored union. */
  def beamSearch(spark: SparkSession, dir: String, kEdges: Int = 3,
      hops: Int = 4, beams: Seq[Int] = Seq(1, 2, 4),
      kTruth: Int = 10): DataFrame = {
    val e = emb(spark, dir)
    val edges = knnEdges(spark, dir, kEdges)
      .select(col("label"), col("v1"), col("v2")).localCheckpoint()
    val sym = edges
      .union(edges.select(col("label"), col("v2"), col("v1")))
      .toDF("label", "node", "nxt").distinct().localCheckpoint()
    val q = e.groupBy(col("label")).agg(min(col("vec_id")).as("qid"),
      max(col("vec_id")).as("entry"))
    val qe = q.join(e.select(col("vec_id").as("qid"),
      col("embedding").as("q_emb")), Seq("qid")).localCheckpoint()
    def scoreNodes(cand: DataFrame): DataFrame = cand
      .join(e.select(col("vec_id").as("node"),
        col("embedding").as("n_emb")), Seq("node"))
      .join(qe.select(col("label"), col("q_emb")), Seq("label"))
      .withColumn("sim", ExprColumns.cosineF32(spark, "n_emb", "q_emb"))
      .select(col("label"), col("node"), col("sim"))
    val truth = e
      .select(col("label"), col("vec_id").as("cid"),
        col("embedding").as("c_emb"))
      .join(qe.select(col("label"), col("qid"), col("q_emb")),
        Seq("label"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("bsim", ExprColumns.cosineF32(spark, "c_emb", "q_emb"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("bsim").desc, col("cid"))))
      .filter(col("rk") <= kTruth)
      .select(col("label"), col("cid"), col("bsim"), col("rk"))
      .localCheckpoint()
    val truthN = truth.groupBy(col("label"))
      .agg(count(lit(1)).as("n_truth"))
    val nn = truth.filter(col("rk") === 1)
      .select(col("label"), col("bsim").as("nn_sim"))
    val s0 = scoreNodes(qe.select(col("label"), col("entry").as("node")))
      .localCheckpoint()
    val perBeam = beams.map { b =>
      var s = s0
      var explored = s0
      for (_ <- 1 to hops) {
        val cand = s.select(col("label"), col("node"))
          .unionByName(s.select(col("label"), col("node"))
            .join(sym, Seq("label", "node"))
            .select(col("label"), col("nxt").as("node")))
          .join(qe.select(col("label"), col("qid")), Seq("label"))
          .filter(col("node") =!= col("qid"))
          .select(col("label"), col("node")).distinct()
        val scored = scoreNodes(cand).localCheckpoint()
        explored = explored.unionByName(scored)
        s = scored
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("label"))
              .orderBy(col("sim").desc, col("node"))))
          .filter(col("rk") <= b)
          .select(col("label"), col("node"), col("sim"))
          .localCheckpoint()
      }
      val ex = explored.select(col("label"), col("node")).distinct()
        .localCheckpoint()
      val nEx = ex.groupBy(col("label"))
        .agg(count(lit(1)).as("n_explored"))
      val hits = ex
        .join(truth.select(col("label"), col("cid").as("node"),
          col("rk")), Seq("label", "node"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_hit"),
          max(when(col("rk") === 1, 1L).otherwise(0L)).as("got_nn"))
      val best = s.groupBy(col("label")).agg(max(col("sim")).as("best_sim"))
      nEx
        .join(best, Seq("label"))
        .join(hits, Seq("label"), "left")
        .join(truthN, Seq("label"))
        .join(nn, Seq("label"))
        .select(lit(b.toLong).as("beam"), col("label"),
          col("n_explored"), col("n_truth"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") /
            col("n_truth").cast("double"), 4).as("recall"),
          round(col("best_sim").cast("double"), 4).as("best_sim"),
          round(col("nn_sim").cast("double"), 4).as("nn_sim"),
          (coalesce(col("got_nn"), lit(0L)) === 1).as("reached_nn"))
    }
    perBeam.reduce(_.unionByName(_)).orderBy(col("beam"), col("label"))
  }

  /** PQ codebook TRAINING distortion — the train→measure row for the
    * quantizer family (r15 verdict item 5), the way `docs_probe_auc`
    * closes the loop for the classifier: per SUBSPACE, one exact
    * Lloyd pass over the sub-vector space (seed codebook = the K
    * lowest-vec_id rows' sub-vectors → integer-L2 assignment →
    * exact-mean re-derivation quantized to the nearest micro-unit
    * integer → re-assignment) reporting the micro²-unit mean
    * distortion BEFORE and AFTER the pass and the relative drop.
    * Because the quantized mean is the OPTIMAL INTEGER codeword for
    * its cluster (the quadratic is symmetric, so the nearest integer
    * to the exact mean minimizes it) and re-assignment only ever
    * lowers a row's distance, the trained distortion is ≤ the seed
    * distortion EXACTLY, per subspace — the spec asserts the
    * monotonicity invariant, not a tolerance.
    *
    * Determinism: lanes quantize to micro-unit BIGINTs (|lane| < OFF
    * raises plan-side — the positive shift makes the round-half-up
    * mean a single integer division identical in both engines);
    * distances are exact integer sums; argmin ties to the smaller
    * codeword id; per-subspace distortion sums ride DECIMAL(38,0);
    * the floor-mean readout is an exact integral division.
    *
    * Scale shape: the assignment relation is corpus × M × K at
    * sub-vector grain — at 100 TB a PQ trainer runs on a corpus
    * SAMPLE (the production shape, per [[pqCodebook]]'s note) and
    * this plan transfers unchanged; every aggregate above it is
    * bounded by M × K × SUB. */
  def pqTrainDistortion(spark: SparkSession, dir: String, m: Int = 16,
      sub: Int = 4, k: Int = 64): DataFrame = {
    val OFF = 16000000L // |lane| bound in micro-units, raise-guarded
    // (vec_id, m, sv[sub]) sub-vector grain, built by a NARROW map
    // (quantize + guard + slice — no explode shuffle); the oracle
    // computes the identical integer values lane-relationally, which
    // is fine because the gate compares VALUES, not plans
    val subs = emb(spark, dir)
      .select(col("vec_id"), expr(
        s"""transform(embedding, x ->
              CASE WHEN abs(round(CAST(x AS DOUBLE) * 1e6)) >= ${OFF}D
                THEN CAST(raise_error(
                  'pqTrainDistortion: lane outside the micro-unit bound')
                  AS BIGINT)
                ELSE CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
              END)""").as("qe"))
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), i -> slice(qe, i * $sub + 1, $sub))")))
      .select(col("vec_id"), col("pos").cast("int").as("m"),
        col("col").as("sv"))
      .localCheckpoint(false) // sub-vector grain; seeds + both passes
    val seedIds = emb(spark, dir).select(col("vec_id"))
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).as("cid")) // rank over a LIMIT k
    val cb0 = subs.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("m"), col("cid"), col("sv").as("cw"))
      .localCheckpoint(false)
    def assign(cb: DataFrame): DataFrame = subs
      .join(broadcast(cb), Seq("m"))
      // exact integer L2 in one narrow expression — no lane explode
      .withColumn("dist", expr(
        "aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)), 0L, (acc, t) -> acc + t)"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist"), col("cid"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.cid").as("cid"),
        col("b.dist").as("dist"))
      .localCheckpoint(false)
    def distortion(asg: DataFrame): DataFrame = asg
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist").cast("decimal(38,0)")).as("sd"))
    val asg0 = assign(cb0)
    // exact mean per (m, cid, d), round-half-up to the nearest integer
    // via the positive shift (the nearest integer IS the optimal
    // integer codeword lane); empty codewords drop out. The lane
    // explode happens HERE, on the one pass that needs lane grain.
    val cb1 = asg0.join(subs, Seq("vec_id", "m"))
      .select(col("m"), col("cid"), posexplode(col("sv")))
      .select(col("m"), col("cid"), col("pos").as("d"),
        col("col").as("v"))
      .groupBy(col("m"), col("cid"), col("d"))
      .agg(((lit(2L) * (sum(col("v")) + count(lit(1)) * OFF) +
        count(lit(1))).cast("long")).as("num"),
        (lit(2L) * count(lit(1))).as("den"))
      .select(col("m"), col("cid"), col("d"),
        (expr("num div den") - OFF).as("w"))
      .groupBy(col("m"), col("cid"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(d, w))), x -> x.w)")
        .as("cw"))
      .localCheckpoint(false)
    val asg1 = assign(cb1)
    val live = cb1.groupBy(col("m"))
      .agg(countDistinct(col("cid")).as("n_live_codewords"))
    distortion(asg0)
      .select(col("m"), col("n").as("n_vectors"),
        col("sd").as("sd0"))
      .join(distortion(asg1).select(col("m"), col("sd").as("sd1")),
        Seq("m"))
      .join(live, Seq("m"))
      .select(col("m").cast("long").as("subspace"), col("n_vectors"),
        lit(k.toLong).as("k_seed"), col("n_live_codewords"),
        expr("CAST(sd0 div n_vectors AS BIGINT)").as("mean_dist_seed"),
        expr("CAST(sd1 div n_vectors AS BIGINT)").as("mean_dist_trained"),
        round(lit(1.0) - col("sd1").cast("double") /
          col("sd0").cast("double"), 6).as("distortion_drop"))
      .orderBy(col("subspace"))
  }
}
