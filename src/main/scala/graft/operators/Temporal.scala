package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal/state maintenance operators: the reference's whole job is an
  * incremental upsert-flavored ingest (window re-scan + anti-join + append,
  * main.py:168-188); these queries generalize that pattern to the three
  * shapes a warehouse actually maintains — MERGE upserts, SCD2 history,
  * and gap-filled time series.
  *
  * Scale posture: every operator is a keyed shuffle (join or window) on
  * the natural partition key (customer / user / event_type), no
  * driver-side state, AQE-eligible.
  */
object Temporal {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** MERGE-style upsert resolved as one FULL OUTER join: target rows
    * matched by source get updated balances, unmatched source keys become
    * inserts, unmatched target rows are kept. This is the batch image of
    * `MERGE INTO target USING source ON key WHEN MATCHED ... WHEN NOT
    * MATCHED ...` — the reference's anti-join (J1, main.py:168-181) is
    * exactly the "WHEN NOT MATCHED INSERT" third of this plan. Money
    * accumulates in DECIMAL (exact, order-independent) and casts to
    * DOUBLE only at the output edge. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables(spark, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0) // carve out keys so real inserts exist
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val source = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("key"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .groupBy(col("key"))
      .agg(sum(col("price")).as("delta"))
    target.join(source, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("bal").isNotNull && col("delta").isNotNull, "update")
          .when(col("bal").isNull, "insert")
          .otherwise("keep").as("action"),
        (coalesce(col("bal"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("delta"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("new_bal"))
      .orderBy(col("key"))
  }

  /** SCD2 (slowly-changing-dimension type 2) history build: collapse each
    * user's event stream into runs of consecutive equal `event_type`, each
    * run becoming one versioned row with `[valid_from, valid_to)` and an
    * open 9999-12-31 end for the current version. Gaps-and-islands via
    * lag-compare + running sum of change flags; both pre-agg windows share
    * the user_id partitioning so ONE shuffle feeds them, and the post-agg
    * lead() window rides the (user_id, run_id, ...) hash partitioning's
    * superset key — Catalyst inserts the narrower re-shuffle only for the
    * final window, over run-level (not event-level) rows. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val runs = Tables(spark, dir, "events")
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      // null-safe comparison (matches the oracle's IS DISTINCT FROM): a
      // NULL event_type must open its own run, and the first row's NULL
      // prev_type must too — plain =!= would fold both into "no change"
      .withColumn("chg",
        when(!(col("prev_type") <=> col("event_type")), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("vf"), count(lit(1)).as("n_events"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runs
      .withColumn("vt", lead(col("vf"), 1).over(byRun))
      .select(col("user_id"), col("run_id"), col("event_type"),
        date_format(col("vf"), fmt).as("valid_from"),
        coalesce(date_format(col("vt"), fmt), lit("9999-12-31 00:00:00"))
          .as("valid_to"),
        col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  /** Gap-filled hourly time series with forward fill: a generated hour ×
    * event_type spine (no input scan — `sequence` + explode is pure
    * compute) left-joins the observed hourly aggregate; missing hours
    * count 0 and carry the last observed hourly average forward
    * (`last(ignoreNulls)` over an unbounded-preceding frame). The spine
    * side is tiny (hours × types), so the join broadcasts it; the fact
    * scan is pruned by the pushed time/value predicate. Leading hours
    * before a type's first observation report -1 (no history to carry). */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val hours = spark.range(1).select(explode(sequence(
      lit("2024-01-01 00:00:00").cast("timestamp"),
      lit("2024-01-02 23:00:00").cast("timestamp"),
      expr("INTERVAL 1 HOUR"))).as("hour_start"))
    val types = Tables(spark, dir, "events")
      .select(col("event_type")).distinct()
    val spine = hours.crossJoin(types)
    val observed = Tables(spark, dir, "events")
      .filter(col("value") > 100 &&
        col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).as("sv"))
      .withColumn("avg_raw", round(col("sv").cast("double") / col("n"), 6))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(observed, Seq("hour_start", "event_type"), "left")
      .withColumn("filled_avg",
        coalesce(last(col("avg_raw"), ignoreNulls = true).over(byType),
          lit(-1.0)))
      .select(col("event_type"),
        date_format(col("hour_start"), fmt).as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"), col("filled_avg"))
      .orderBy(col("event_type"), col("hour_start"))
  }

  /** POINT-IN-TIME dimension join — the feature-store / SCD2-consumer
    * correctness pattern [[scd2History]] builds toward: each purchase
    * fact enriches with the user-state version (runs of consecutive
    * equal NON-purchase event types — the behavioral dimension) that
    * was valid AT the purchase instant: the latest run with
    * valid_from ≤ ts, never a later one (the leakage every naive
    * latest-value join commits). Purchases before any state row
    * report 'none' — the cold-start case made explicit.
    *
    * The as-of resolution is a per-user rank over the fact×run join
    * keyed on user_id — both sides partition on the same key (ONE
    * shuffle lineage), per-user fanout is bounded by the user's run
    * count, never the corpus. Row-level output so the oracle pins
    * every enrichment, not just a census. */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dim = Tables(spark, dir, "events")
      .filter(col("event_type") =!= "purchase")
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(!(col("prev_type") <=> col("event_type")), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(min(col("ts")).as("vf"))
      .select(col("user_id").as("du"), col("run_id"),
        col("event_type").as("state_type"), col("vf"))
    val facts = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val wPick = Window.partitionBy(col("event_id"))
      .orderBy(col("vf").desc, col("run_id").desc)
    facts.join(dim, facts("user_id") === col("du") &&
        col("vf") <= col("ts"), "left")
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), fmt).as("purchase_ts"),
        coalesce(col("state_type"), lit("none")).as("state_type"),
        coalesce(col("run_id"), lit(-1L)).as("state_run_id"),
        coalesce(date_format(col("vf"), fmt), lit("")).as("state_since"))
      .orderBy(col("event_id"))
  }
  /** LINEAR-INTERPOLATION gap fill of the hourly purchase-value series
    * — the second fill policy beside [[gapFill]]'s last-observation-
    * carried-forward: missing hours take the straight line between the
    * nearest observed hours on each side, which is what a metrics
    * backfill or a feature-store imputation actually wants for slowly
    * varying signals (LOCF flat-lines them). Hours before the first or
    * after the last observation stay at the nearest edge value (the
    * standard clamp).
    *
    * The interpolation weight is (h − prev_h)/(next_h − prev_h) on
    * exact integer hour offsets; observed per-hour means are exact
    * cent sums divided once, quantized to DECIMAL(18,9) so both
    * engines interpolate over identical endpoints.
    *
    * Plan: one corpus-grain hash-agg to the hour series; the spine,
    * the two IGNORE-NULLS window scans (one forward, one backward),
    * and the blend all run on the hour-grain relation — the
    * [[EventAnalytics.autocorrelation]] epilogue shape. */
  def interpolateHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("ts"), round(col("value") * 100).cast("long").as("c"))
    val obs = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      .withColumn("v", (col("sc").cast("double") / col("n"))
        .cast("decimal(18,9)"))
    val span = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = span.select(explode(expr(
      "sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val series = spine.join(obs, Seq("h"), "left")
      .withColumn("t", row_number().over(Window.orderBy(col("h"))))
    val wB = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = series
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
      .withColumn("pt", last(when(col("v").isNotNull, col("t")),
        ignoreNulls = true).over(wB))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
      .withColumn("nt", first(when(col("v").isNotNull, col("t")),
        ignoreNulls = true).over(wF))
      .withColumn("fill",
        when(col("v").isNotNull, col("v").cast("double"))
          .when(col("pv").isNull, col("nv").cast("double"))
          .when(col("nv").isNull, col("pv").cast("double"))
          .otherwise(col("pv").cast("double") +
            (col("nv").cast("double") - col("pv").cast("double")) *
              (col("t") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double")))
    filled.select(
        date_format(col("h"), fmt).as("hour_start"),
        coalesce(col("n"), lit(0L)).as("n_obs"),
        col("v").isNotNull.as("observed"),
        round(col("fill"), 6).as("value"))
      .orderBy(col("hour_start"))
  }
}
