package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{ExecutedPlanAudit, WindowAudit}

/** The standing plan gate for THE recurring scale-defect class: an
  * unpartitioned, un-limited window over an unbounded-grain relation
  * (single-task global sort). Rounds 9 (`docs_budget_select`) and 12
  * (four rows) both shipped this bug PAST the oracle gate — answers
  * are correct either way, so only a plan sweep catches it.
  *
  * Round-14 closure of the two audit blind spots the round-13 verdict
  * named: the sweep now covers EVERY registered query — streaming rows
  * included — on TWO channels per query:
  *
  *   - STATIC: [[WindowAudit]] over the returned DataFrame's optimized
  *     plan (what Verify/Bench will execute);
  *   - RUNTIME: [[ExecutedPlanAudit]], a QueryExecutionListener that
  *     sweeps every plan the query EXECUTES while it runs — eager
  *     localCheckpoints (whose pre-checkpoint lineage the static audit
  *     never sees: the checkpoint collapses to a LogicalRDD leaf),
  *     bounded collects, and the foreachBatch bodies + state folds of
  *     the `stream_*` rows. Suites run sequentially in the forked test
  *     JVM, so the drain-per-query attribution is race-free.
  *
  * Legitimately-bounded grains NEITHER analysis can see are
  * whitelisted BY NAME with the justification next to the entry.
  * Planted-violation tests keep both checker channels honest (the
  * ScaleTrend inject discipline).
  */
class GlobalWindowGateSpec extends SparkSpec {

  /** Bounded-for-reasons-the-analysis-cannot-see, per query. Adding an
    * entry here is a REVIEWED decision — name the grain and why it is
    * bounded at 100 TB. */
  private val whitelist = Map(
    "orders_runs_test" -> ("day-grain daily-revenue series: the lag " +
      "window runs over calendar days, but a localCheckpoint leaf " +
      "hides the to_date aggregate from the lineage analysis"))
  // r15 verdict item 3: stream_quantiles / stream_psi_monitor left
  // the whitelist — their readouts now RE-AGGREGATE the state parquet
  // on its histogram grain (groupBy(cent) / groupBy(c), value-level
  // no-ops) before windowing, so the bound is visible in the reading
  // plan itself.

  test("gate: no query — batch or streaming — plans or executes an " +
    "unpartitioned, un-limited window over an unbounded-grain " +
    "relation") {
    val audit = new ExecutedPlanAudit
    audit.register(spark)
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        audit.drain(spark) // discard anything an earlier action left
        val static = WindowAudit.unboundedGlobalWindows(
          fn(spark, sf0001).queryExecution.optimizedPlan)
        val exec = audit.drain(spark)
        val hits = static.map(w =>
          s"[returned plan] ${w.simpleString(120)}") ++
          exec.map { case (act, w) => s"[executed: $act] $w" }
        if (whitelist.contains(name)) {
          assert(hits.nonEmpty,
            s"$name is whitelisted but no longer trips either audit " +
              "channel — remove the stale whitelist entry")
        } else {
          assert(hits.isEmpty,
            s"$name has ${hits.size} single-task global window(s) " +
              "over unbounded data — re-plan with Ranks.exactRank, a " +
              "rank<=k filter (WindowGroupLimit), or a value-domain " +
              "histogram; whitelist only a documented bounded grain:\n" +
              hits.mkString("\n"))
        }
      }
    } finally audit.unregister(spark)
  }

  test("inject: a global ROW_NUMBER over the corpus is flagged") {
    val df = Tables(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(Window.orderBy(col("doc_id"))))
    assert(WindowAudit.unboundedGlobalWindows(
      df.queryExecution.optimizedPlan).nonEmpty,
      "the checker must fire on the planted corpus-grain global rank")
  }

  test("inject: the round-12 qini shape (global rank over a user-grain " +
    "aggregate) is flagged — an Aggregate below does NOT bound") {
    val df = Tables(spark, sf0001, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("score"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("user_id"))))
    assert(WindowAudit.unboundedGlobalWindows(
      df.queryExecution.optimizedPlan).nonEmpty,
      "grouping by an entity id scales with the data and bounds nothing")
  }

  test("inject: a global rank over a TOKEN-grain aggregate is " +
    "flagged — vocabulary grows with the corpus (Heaps' law), so a " +
    "non-id grouping is not automatically a bound") {
    val df = Tables(spark, sf0001, "documents")
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("tf").desc, col("token"))))
    assert(WindowAudit.unboundedGlobalWindows(
      df.queryExecution.optimizedPlan).nonEmpty,
      "the round-13 allowlist flip must reject vocabulary grains " +
        "that the old id-name denylist accepted")
  }

  test("inject: a corpus-grain global rank UPSTREAM of a " +
    "localCheckpoint is invisible to the static audit but caught by " +
    "the runtime channel") {
    val audit = new ExecutedPlanAudit
    audit.register(spark)
    try {
      audit.drain(spark)
      val planted = Tables(spark, sf0001, "documents")
        .withColumn("rk", row_number().over(
          Window.orderBy(col("doc_id"))))
        .localCheckpoint()
        .filter(col("rk") <= 5)
      val static = WindowAudit.unboundedGlobalWindows(
        planted.queryExecution.optimizedPlan)
      val exec = audit.drain(spark)
      assert(static.isEmpty,
        "precondition: the checkpoint must hide the planted window " +
          "from the static sweep (else this test is not testing the " +
          "blind spot)")
      assert(exec.nonEmpty,
        "the QueryExecutionListener channel must see the " +
          "pre-checkpoint lineage and flag the planted global rank")
      assert(exec.exists(_._1 == "checkpoint") ||
        exec.exists(_._1 == "localCheckpoint"),
        s"expected a checkpoint-action attribution, got: " +
          exec.map(_._1).mkString(","))
    } finally audit.unregister(spark)
  }

  test("accept: a rank<=k filter (WindowGroupLimit) bounds the window") {
    val df = Tables(spark, sf0001, "documents")
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk") <= 10)
    assert(WindowAudit.unboundedGlobalWindows(
      df.queryExecution.optimizedPlan).isEmpty,
      "a rank-limited window plans as map-side partial top-k")
  }

  test("accept: a value-domain histogram (non-id grouping) bounds the " +
    "window") {
    val df = Tables(spark, sf0001, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("event_type"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(WindowAudit.unboundedGlobalWindows(
      df.queryExecution.optimizedPlan).isEmpty,
      "the house histogram-CDF shape is the sanctioned global window")
  }

  test("re-planned round-12 rows: the four weak queries plus the two " +
    "round-13 finds all pass the gate") {
    Seq("text_hybrid_retrieval", "events_qini_curve",
      "orders_tier_migration", "dq_gap_islands",
      "sample_systematic", "docs_skyline_pareto").foreach { name =>
      val hits = WindowAudit.unboundedGlobalWindows(
        SparkEntry.queries(name)(spark, sf0001)
          .queryExecution.optimizedPlan)
      assert(hits.isEmpty, s"$name regressed to a single-task global " +
        s"window:\n${hits.map(_.simpleString(120)).mkString("\n")}")
    }
  }
}
