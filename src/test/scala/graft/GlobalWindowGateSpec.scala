package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.WindowAudit

/** The standing plan gate for THE recurring scale-defect class: an
  * unpartitioned, un-limited window over an unbounded-grain relation
  * (single-task global sort). Rounds 9 (`docs_budget_select`) and 12
  * (four rows) both shipped this bug PAST the oracle gate — answers
  * are correct either way, so only a plan sweep catches it. Every
  * registered query's optimized plan must satisfy [[WindowAudit]];
  * legitimately-bounded grains the static analysis cannot see are
  * whitelisted BY NAME with the justification next to the entry.
  * Planted-violation tests keep the checker itself honest (the
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

  test("gate: no query plans an unpartitioned, un-limited window " +
    "over an unbounded-grain relation") {
    SparkEntry.queries
      .filterNot { case (name, _) => name.startsWith("stream_") }
      .foreach { case (name, fn) =>
        val hits = WindowAudit.unboundedGlobalWindows(
          fn(spark, sf0001).queryExecution.optimizedPlan)
        if (whitelist.contains(name)) {
          assert(hits.nonEmpty,
            s"$name is whitelisted but no longer trips the analysis — " +
              "remove the stale whitelist entry")
        } else {
          assert(hits.isEmpty,
            s"$name plans ${hits.size} single-task global window(s) " +
              "over unbounded data — re-plan with Ranks.exactRank, a " +
              "rank<=k filter (WindowGroupLimit), or a value-domain " +
              "histogram; whitelist only a documented bounded grain:\n" +
              hits.map(_.simpleString(120)).mkString("\n"))
        }
      }
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
