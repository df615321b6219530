package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Property coverage for the shared bucketed two-pass global rank —
  * the helper eight-plus queries now stand on. The oracle inside each
  * test is the textbook single-partition ROW_NUMBER (fine at test
  * sizes; the whole point of the helper is to never plan it on real
  * data), so any boundary-handling bug (ties straddling approximate
  * boundaries, empty buckets, negative values, duplicate-free offsets)
  * shows as a rank mismatch. Plus recompute guards: the exactRank call
  * sites must keep their grain-bounded localCheckpoints — round 13
  * measured docs_skyline_pareto at ~9x cost when the token-explode
  * lineage re-ran once per rank pass. */
class RanksSpec extends SparkSpec {

  private def checkAgainstRowNumber(values: Seq[Long]): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "v")
    val got = Ranks.exactRank(spark, df, "v", "doc_id", "rk")
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df
      .withColumn("rk", row_number().over(
        Window.orderBy(col("v"), col("doc_id"))).cast("long"))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want, s"ranks diverge for ${values.take(20)}...")
  }

  test("exactRank equals single-partition ROW_NUMBER: distinct values") {
    checkAgainstRowNumber(Seq(5L, 3L, 9L, 1L, 7L, 2L, 8L, 4L, 6L, 0L))
  }

  test("exactRank equals ROW_NUMBER: heavy ties (one value dominates)") {
    checkAgainstRowNumber(Seq.fill(40)(7L) ++ Seq(1L, 2L, 99L))
  }

  test("exactRank equals ROW_NUMBER: negative and extreme values") {
    checkAgainstRowNumber(Seq(-5L, Long.MinValue / 4, 0L,
      Long.MaxValue / 4, -5L, 3L, 3L, -17L))
  }

  test("exactRank equals ROW_NUMBER: pseudo-random spread with ties") {
    val vs = (0 until 300).map(i => ((i * 2654435761L) % 37).abs)
    checkAgainstRowNumber(vs)
  }

  test("exactRank: single row and all-equal relations") {
    checkAgainstRowNumber(Seq(42L))
    checkAgainstRowNumber(Seq.fill(17)(42L))
  }

  test("exactRankOrdered: string order bucketed on a numeric prefix " +
    "(the sample_systematic shape) matches the full-string sort") {
    import spark.implicits._
    val df = (0L until 200L).toDF("doc_id")
      .withColumn("h", md5(concat(lit("t:"), col("doc_id").cast("string"))))
      .withColumn("hb",
        expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)"))
    val got = Ranks.exactRankOrdered(spark, df, "hb", Seq(col("h")),
      "doc_id", "rk")
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rk", row_number().over(
        Window.orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rk"))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  private def checkCumsumAgainstWindow(values: Seq[Long]): Unit = {
    import spark.implicits._
    val df = values.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("doc_id", "v")
    val got = Ranks.exactCumsum(spark, df, "v", "v", "doc_id", "cs")
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[java.math.BigDecimal](1).longValueExact()).toMap
    val want = df.withColumn("cs",
        sum(col("v")).over(Window.orderBy(col("v"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want, s"cumsums diverge for ${values.take(20)}...")
  }

  test("exactCumsum equals single-partition windowed SUM: distinct, " +
    "tied, negative, and degenerate inputs") {
    checkCumsumAgainstWindow(Seq(5L, 3L, 9L, 1L, 7L, 2L, 8L, 4L, 6L, 0L))
    checkCumsumAgainstWindow(Seq.fill(40)(7L) ++ Seq(1L, 2L, 99L))
    checkCumsumAgainstWindow(Seq(-5L, 0L, 3L, -17L, 3L, -5L))
    checkCumsumAgainstWindow(Seq(42L))
    checkCumsumAgainstWindow((0 until 300).map(i =>
      ((i * 2654435761L) % 37).abs))
  }

  test("exactCumsum plans no unpartitioned window over its input") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i % 13)).toDF("doc_id", "v")
    val plan = Ranks.exactCumsum(spark, df, "v", "v", "doc_id", "cs")
      .queryExecution.optimizedPlan
    assert(graft.plans.WindowAudit.unboundedGlobalWindows(plan).isEmpty)
  }

  test("exactRank plans NO unpartitioned window over its input (the " +
    "offset window sits above the bucket aggregate only)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = (0L until 100L).map(i => (i, i % 13)).toDF("doc_id", "v")
    val plan = Ranks.exactRank(spark, df, "v", "doc_id", "rk")
      .queryExecution.optimizedPlan
    plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      .foreach { w =>
        assert(w.child.collectFirst { case a: Aggregate => a }.isDefined,
          "the only global window is the <=B-row bucket-offset prefix")
      }
    assert(graft.plans.WindowAudit.unboundedGlobalWindows(plan).isEmpty)
  }

  test("recompute guards: the re-planned call sites keep their " +
    "grain-bounded checkpoints (ExistingRDD present in the plan)") {
    Seq(
      "docs_skyline_pareto" ->
        graft.operators.Curation.skylinePareto(spark, sf0001),
      "events_qini_curve" ->
        graft.operators.EventAnalytics.qiniCurve(spark, sf0001),
      "orders_tier_migration" ->
        graft.operators.Relational.tierMigration(spark, sf0001),
      "dq_gap_islands" ->
        graft.operators.Quality.gapIslands(spark, sf0001)
    ).foreach { case (name, df) =>
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("LogicalRDD") || p.contains("ExistingRDD"),
        s"$name lost its grain-bounded localCheckpoint — every " +
          "exactRank pass will re-run the upstream corpus lineage " +
          "(the round-13 9x skyline incident)")
    }
  }
}
