package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.etl.Dedup
import graft.functions.Normalize

/** Event-stream analytics over the `events` table, plus the reference's
  * own operator surface (F1/F2/F5/F6/J1/P1/A1 — SURVEY.md §2) re-expressed
  * over the same table (`event_id` plays `appsflyer_id`, `ts` plays
  * `install_time`; FIXTURES.md §B mapping).
  *
  * Timestamp outputs are formatted as 'yyyy-MM-dd HH:mm:ss' strings so the
  * DuckDB-oracle hash compare never depends on parquet timestamp physical
  * encodings.
  */
object EventAnalytics {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Flagship reference pipeline over events: window filter (F5) + key
    * filter (F6) + anti-join against already-seen ids (J1) + projection/
    * rename (P1). `existing` = events seen in an earlier overlapping
    * window, exactly the sliding-window idempotence pattern of main().
    *
    * Scale: the build side is one pruned int column under a pushed window
    * predicate -> broadcast anti-join; the probe side never leaves the
    * executors. */
  def refPipeline(spark: SparkSession, dir: String,
                  from: String = "2024-01-15 00:00:00",
                  to: String = "2024-01-15 02:00:00",
                  seenUpTo: String = "2024-01-15 01:00:00"): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val batch = ev.filter(Dedup.windowFilter(col("ts"), from, to))
    val existing = ev.filter(Dedup.windowFilter(col("ts"), from, seenUpTo))
      .select(col("event_id"))
    batch.join(existing, Seq("event_id"), "left_anti")
      .select(
        col("event_id").as("af_id"),
        date_format(col("ts"), fmt).as("install_time"),
        col("user_id").as("customer_user_id"),
        col("event_type").as("event_name"),
        col("value").cast("double").as("event_value"))
      .orderBy(col("af_id"))
  }

  /** F1 — lenient datetime parse, exercised over a string column derived
    * from `ts` (with sentinel 'null's injected on error events so both the
    * parse and the sentinel paths are covered). */
  def parseDatetime(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        when(col("event_type") === "error", lit("null"))
          .otherwise(col("ts").cast("string")).as("raw_ts"))
      .select(col("event_id"),
        date_format(Normalize.parseAfTimestamp(col("raw_ts")), fmt)
          .as("parsed_ts"))
      .orderBy(col("event_id"))

  /** F2 — sentinel-null normalization over a constructed string column. */
  def sentinelNulls(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(
        when(col("event_type") === "error", lit("null"))
          .when(col("event_type") === "view", lit(""))
          .when(col("event_type") === "click", lit("None"))
          .otherwise(col("event_type")).as("raw"))
      .select(Normalize.nullIfSentinels(col("raw")).as("norm"))
      .groupBy(col("norm")).agg(count(lit(1)).as("n"))
      .orderBy(col("norm"))

  /** F5 — inclusive time-window filter (predicate pushed to the scan). */
  def windowFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(Dedup.windowFilter(col("ts"),
        "2024-01-10 00:00:00", "2024-01-10 06:00:00"))
      .select(col("event_id"), date_format(col("ts"), fmt).as("ts_s"),
        col("event_type"))
      .orderBy(col("event_id"))

  /** F6 — non-null/non-empty key filter over a key column with injected
    * NULL/'' holes. */
  def keyFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        when(col("value") < 10, lit(""))
          .when(col("value") < 20, lit(null).cast("string"))
          .otherwise(col("user_id").cast("string")).as("key"))
      .filter(Dedup.validKey(col("key")))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("key"))

  /** A1 — observability count of the flagship window. */
  def windowCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(Dedup.windowFilter(col("ts"),
        "2024-01-15 00:00:00", "2024-01-15 02:00:00"))
      .agg(count(lit(1)).as("n"))

  /** Tumbling-window aggregation (the batch image of a Structured
    * Streaming `window()` agg): hourly event counts + value sums. Uses
    * `window(ts, '1 hour')` — epoch-aligned, so it equals
    * date_trunc('hour') in the oracle. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), fmt).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** Sliding-window aggregation: 2-hour window sliding by 1 hour —
    * each event lands in 2 windows (the batch image of the reference's
    * overlapping 2-hour pulls, F4). */
  def slidingTwoHour(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), fmt).as("win_start"),
        date_format(col("window.end"), fmt).as("win_end"), col("n"))
      .orderBy(col("win_start"))

  /** Sessionization via lag + cumulative sum of session-break flags
    * (30-minute inactivity gap), then per-user session stats. The standard
    * two-window formulation — both windows partition by user, so one
    * shuffle on user_id serves both. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Native session windows (`session_window`, gap-merged per user) —
    * the built-in operator form of [[sessionize]]'s lag/cumsum and
    * [[graft.streaming.Sessionize]]'s stateful variant. Exact-boundary
    * caveat: `session_window` starts a new session when the gap is
    * `>=` the 30-min duration, while sessionize/Sessionize split on
    * gap `>` 30 min — events exactly 30 minutes apart land in one
    * session there but two here. Each oracle renders its own rule
    * (`>` vs `>=`), so both stay hash-verified. Works unchanged under
    * Structured Streaming with a watermark. */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), fmt).as("session_start"),
        date_format(col("session_window.end"), fmt).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** As-of join (attribution): for each purchase, the user's most recent
    * view at-or-before it. Expressed as a running MAX over the per-user
    * event timeline — ONE shuffle on user_id, no join at all; the
    * two-table trade/quote form is the same plan after a union. MAX works
    * as "latest prior" because the frame is ordered by event time. */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "events")
      .withColumn("asof_view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), fmt).as("purchase_ts"),
        date_format(col("asof_view_ts"), fmt).as("asof_view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("asof_view_ts")))
          .as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Nearest-neighbor as-of join: for each purchase, the same user's
    * CLOSEST view in time — before or after, whichever is nearer, ties
    * to the earlier side. The bidirectional variant of
    * [[asofAttribution]] (sensor alignment / "which impression does this
    * conversion belong to" when attribution may precede or follow).
    * Same ONE-shuffle shape: both directions are window frames over the
    * identical (user_id; ts, event_id) sort, so Spark plans them as two
    * back-to-back WindowExecs sharing one exchange and one sort (frames
    * of differing direction split nodes, not stages) — no join, no
    * second exchange, verified by plan audit. Tie-break
    * chain: a view at the purchase's own timestamp lands before/after by
    * event_id order; equal gaps resolve to 'before'. */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val back = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = byUser.rowsBetween(1, Window.unboundedFollowing)
    val viewTs = when(col("event_type") === "view", col("ts"))
    Tables(spark, dir, "events")
      .withColumn("prev_view_ts", max(viewTs).over(back))
      .withColumn("next_view_ts", min(viewTs).over(fwd))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_back",
        unix_micros(col("ts")) - unix_micros(col("prev_view_ts")))
      .withColumn("gap_fwd",
        unix_micros(col("next_view_ts")) - unix_micros(col("ts")))
      .withColumn("direction",
        when(col("gap_back").isNotNull &&
          (col("gap_fwd").isNull || col("gap_back") <= col("gap_fwd")),
          lit("before"))
          .when(col("gap_fwd").isNotNull, lit("after"))
          .otherwise(lit("none")))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), fmt).as("purchase_ts"),
        date_format(
          when(col("direction") === "before", col("prev_view_ts"))
            .when(col("direction") === "after", col("next_view_ts")),
          fmt).as("nearest_view_ts"),
        col("direction"),
        when(col("direction") === "before", col("gap_back"))
          .when(col("direction") === "after", col("gap_fwd")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Additive time-series decomposition of the daily event-type series:
    * trend (centered 7-day moving average), day-of-week seasonal
    * (mean detrended value per weekday), residual — the STL-lite pass
    * behind capacity planning and anomaly baselines.
    *
    * Determinism: the trend is a ratio of exact integer frame sums; the
    * detrended value is one deterministic double per row, quantized to
    * DECIMAL(28,8) BEFORE the seasonal mean so partial-agg order can't
    * move the hash; seasonal and residual divide once at the end.
    * Plan: daily rollup (one exchange), one windowed pass per type, a
    * 35-row (type x weekday) seasonal aggregate broadcast back. Edge
    * days keep their truncated centered window (frame shrinks at series
    * boundaries — both engines agree on ROWS frames). */
  def tsDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val frame = byType.rowsBetween(-3, 3)
    val trended = daily
      .withColumn("trend",
        sum(col("n")).over(frame).cast("double") /
          count(lit(1)).over(frame))
      .withColumn("detr",
        (col("n").cast("double") - col("trend")).cast("decimal(28,8)"))
      .withColumn("dow", dayofweek(col("d")))
    val seasonal = trended.groupBy(col("event_type"), col("dow"))
      .agg((sum(col("detr")).cast("double") / count(lit(1)))
        .as("seasonal"))
    trended.join(broadcast(seasonal), Seq("event_type", "dow"))
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("detr").cast("double") - col("seasonal"), 4)
          .as("residual"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Two-proportion z-test over a deterministic A/B split (user_id
    * parity): did variant B's 30-minute view→purchase conversion differ
    * from A's? The experimentation primitive next to [[eventsDrift]]'s
    * chi-square — same discipline: every input to the test statistic is
    * an exact integer aggregate (per-arm exposed-user and converter
    * counts), the pooled-variance z formula evaluates ONCE per output
    * row in double, rounded. Conversion is TIME-BOUNDED (a purchase
    * within 30 minutes after a view — the [[asofAttribution]] window),
    * because lifetime any-purchase saturates to 100% on an active
    * population and the test degenerates. A degenerate pool (0% or
    * 100%) yields NULL z rather than an ANSI divide-by-zero throw.
    * Every join and agg keys on user_id — one partitioning end to end;
    * the per-user view×purchase interval join is bounded by per-user
    * event counts. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
    val converted = views.join(purchases, "user_id")
      .filter(col("pts") > col("ts") &&
        col("pts") <= col("ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id")).distinct()
      .withColumn("converted", lit(1L))
    val perUser = views.select(col("user_id")).distinct()
      .join(converted, Seq("user_id"), "left")
      .withColumn("arm",
        when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0L))).as("n_conv"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n_users").as("n_a"), col("n_conv").as("c_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n_users").as("n_b"), col("n_conv").as("c_b"))
    val pA = col("c_a").cast("double") / col("n_a")
    val pB = col("c_b").cast("double") / col("n_b")
    val pPool = (col("c_a") + col("c_b")).cast("double") /
      (col("n_a") + col("n_b"))
    a.crossJoin(broadcast(b)) // 1-row x 1-row scalar
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(pA, 4).as("rate_a"), round(pB, 4).as("rate_b"),
        when(col("c_a") + col("c_b") > 0 &&
          col("c_a") + col("c_b") < col("n_a") + col("n_b"),
          round((pB - pA) /
            sqrt(pPool * (lit(1.0) - pPool) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4))
          .as("z"))
  }

  /** Seasonal-naive forecast BACKTEST over the daily series: predict
    * each day with the same weekday a week earlier (the baseline every
    * real forecasting system must beat) and score it with MAPE and
    * bias — the "is our fancy model better than lag-7" harness row,
    * closing the time-series family the same way the probe-AUC row
    * closes the classifier family (train/predict is nothing without
    * evaluate). Per-row percentage errors are deterministic scalars
    * quantized to DECIMAL(28,8) before averaging; the first seven days
    * have no forecast and drop (both engines agree on lag semantics).
    * Plan: daily rollup, one lag window per type, a type-sized final
    * agg. */
  def forecastNaive(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("fc", lag(col("n"), 7).over(byType))
      .filter(col("fc").isNotNull)
      .withColumn("ape",
        (abs(col("n") - col("fc")).cast("double") / col("n"))
          .cast("decimal(28,8)"))
      .withColumn("err", (col("n") - col("fc")).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        round(sum(col("ape")).cast("double") / count(lit(1)), 4)
          .as("mape"),
        sum(col("err")).as("total_bias"),
        max(abs(col("err"))).as("worst_abs_err"))
      .orderBy(col("event_type"))
  }

  /** Hourly session-concurrency census: max simultaneous open sessions
    * per hour via the classic +1/−1 interval sweep over
    * [[sessionWindows]]'s intervals — the capacity-planning number
    * behind connection pools and autoscaling floors. A GLOBAL running
    * sum is inherently sequential, so it runs as the same two-pass
    * decomposition [[graft.operators.Curation.budgetSelect]] uses:
    * per-hour local running sums (hour-partitioned window, parallel)
    * plus exact offsets from an HOUR-LEVEL rollup whose own window
    * touches only |hours| rows — no corpus-sized single-partition
    * window anywhere. Tie order (t, d) applies session ENDS before
    * starts at the same instant, so back-to-back sessions never
    * double-count; within a tie group the per-hour MAX is
    * order-invariant (monotone within each sign). Hours with no
    * boundary events carry no row (concurrency unchanged). */
  def concurrency(spark: SparkSession, dir: String): DataFrame = {
    val sess = Tables(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"))
    val deltas = sess.select(explode(array(
      struct(col("s").as("t"), lit(1L).as("d")),
      struct(col("e").as("t"), lit(-1L).as("d")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.d").as("d"))
      .withColumn("h", date_trunc("hour", col("t")))
    val wLocal = Window.partitionBy(col("h"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = deltas.withColumn("run_local", sum(col("d")).over(wLocal))
    // hour-level offsets: |hours| rows, the small serial step
    val wOff = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = deltas.groupBy(col("h")).agg(sum(col("d")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(wOff), lit(0L)))
      .select(col("h"), col("off"))
    local.join(broadcast(offsets), "h")
      .groupBy(col("h"))
      .agg(max(col("off") + col("run_local")).as("max_concurrency"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_ends"))
      .select(date_format(col("h"), fmt).as("hour_start"),
        col("max_concurrency"), col("n_starts"), col("n_ends"))
      .orderBy(col("hour_start"))
  }

  /** Robust anomaly scan over [[tsDecompose]]'s residuals: a day is
    * anomalous when its residual sits more than k robust deviations
    * (MAD) from the per-type residual median — the standard
    * trend/seasonality-aware alerting rule (a raw-count threshold would
    * fire every weekend; the decomposition already removed what is
    * explainable). Composes the decomposition row end to end: decompose
    * -> per-type median -> per-type MAD -> gate. The medians run over
    * the DAY-level relation (series-length-sized, not event-sized) and
    * broadcast back; residuals are already on an exact 1e-4 grid, so
    * both engines compare identical doubles. */
  def anomalyStl(spark: SparkSession, dir: String, k: Double = 2.0)
      : DataFrame = {
    val dec = tsDecompose(spark, dir)
    val med = dec.groupBy(col("event_type"))
      .agg(median(col("residual")).as("med"))
    val mad = dec.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), col("med"))
      .agg(median(abs(col("residual") - col("med"))).as("mad"))
    dec.join(broadcast(mad), "event_type")
      .filter(abs(col("residual") - col("med")) > col("mad") * k)
      .select(col("event_type"), col("day"), col("n"), col("residual"),
        round(col("med"), 4).as("resid_median"),
        round(col("mad") * k, 4).as("gate"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Range join: orders against a small in-code price-band relation on
    * `lo <= price < hi`. The bands side is broadcast, so the non-equi
    * predicate evaluates as a BroadcastNestedLoopJoin — the only sane
    * 100 TB shape for an interval join against a small dimension. */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("budget", 0d, 50000d), ("mid", 50000d, 150000d),
      ("premium", 150000d, 300000d), ("luxury", 300000d, 1e9))
      .toDF("band", "lo", "hi")
    Tables(spark, dir, "orders")
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,4)")).cast("double")
          .as("total"))
      .orderBy(col("band"))
  }

  /** Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so one
    * hot key spreads over `salts` reducers, then combine. Result-identical
    * to the direct groupBy (the oracle IS the direct groupBy); the salt is
    * derived from event_id, never random. At 100 TB this is the manual
    * fallback when AQE skew handling can't see the skew (e.g. inside a
    * single hot aggregation key). */
  def saltedTypeStats(spark: SparkSession, dir: String, salts: Int = 16): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast("decimal(28,4)")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** Skew-safe dimension join: `event_type` has 5 values over millions of
    * rows, so a plain equi-join sends each type to ONE reducer. Salting
    * replicates the tiny dim `salts`x and derives a deterministic salt on
    * the fact side, spreading each hot key over `salts` tasks. Result-
    * identical to the plain join (the oracle IS the plain join); the
    * manual form of what AQE skew-join does for shuffle joins it can see. */
  def saltedDimJoin(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("error", 0.0), ("signup", 2.0)).toDF("event_type", "weight")
    val dimSalted = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    Tables(spark, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(salts.toLong)).cast("int"))
      .join(broadcast(dimSalted), Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)") *
          col("weight").cast("decimal(3,1)")).cast("double")
          .as("weighted_value"))
      .orderBy(col("event_type"))
  }

  /** Map-typed column surface: parse `props` into map<string,int>, then
    * map_keys/element_at/size — schema-on-read for semi-structured data
    * without ever exploding. */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_id"), col("event_type"),
        element_at(map_keys(col("m")), 1).as("first_key"),
        element_at(col("m"), "k").as("k_value"),
        size(col("m")).cast("long").as("n_keys"))
      .groupBy(col("event_type"), col("first_key"))
      .agg(count(lit(1)).as("n"),
        sum(col("k_value")).as("sum_k"),
        max(col("n_keys")).as("max_keys"))
      .orderBy(col("event_type"), col("first_key"))

  /** Null-handling battery: coalesce, nullif, nvl2-style branching over
    * a column with injected NULL/empty holes. */
  def nullFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        when(col("value") < 10, lit(null).cast("string"))
          .when(col("value") < 20, lit(""))
          .otherwise(col("event_type")).as("t"),
        col("value"))
      .select(col("event_id"),
        coalesce(col("t"), lit("missing")).as("t_or_default"),
        nullif(col("t"), lit("")).as("t_nullif_empty"),
        when(col("t").isNotNull, lit("present")).otherwise(lit("absent"))
          .as("nvl2_style"),
        (col("t").isNull).cast("long").as("is_null"))
      .orderBy(col("event_id"))

  /** Conversion funnel (view -> click -> purchase, each step within 3
    * days of the previous step's FIRST occurrence): the cornerstone
    * attribution-analytics query. Three per-user min-aggregates chained
    * by inequality joins — every join and aggregate keys on user_id, so
    * one hash partitioning serves the whole funnel and each step's
    * relation only shrinks (users who converted so far). No window
    * functions, no cross join; the step count is the only sequential
    * depth, exactly as a 1000-executor run wants it. */
  /** First-touch funnel stage times (vt, ct, pt per converting user) —
    * the shared kernel of [[funnelSteps]] and [[funnelLatency]]. Each
    * stage = one filtered agg joined forward within the 3-day window. */
  private def funnelStages(ev: DataFrame,
      step: String = "INTERVAL 3 DAYS"):
      (DataFrame, DataFrame, DataFrame) = {
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("vt"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("vt") && col("ts") <= col("vt") + expr(step))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("ct") && col("ts") <= col("ct") + expr(step))
      .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
    (v, c, p)
  }

  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val (v, c, p) = funnelStages(Tables(spark, dir, "events"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  /** Funnel WINDOW-sensitivity sweep — [[funnelSteps]]' fixed 3-day
    * hop window measured instead of inherited (the
    * [[DedupOps.shingleSweep]] discipline applied to the funnel's one
    * knob): the same first-touch funnel evaluated at hop windows of
    * 6 hours, 1 day, and 3 days, each row reporting the stage counts
    * and conversion rates. A conversion rate that keeps climbing with
    * the window means the window — not the product — is deciding the
    * metric; the plateau is the honest setting. Each window is an
    * independent pass (the stage minima genuinely change with the
    * window, so there is nothing shareable — the ×3 cost is the
    * honest price of the tuning row, exactly like the shingle
    * sweep's).
    *
    * All counts exact; rates are one guarded division each. */
  def funnelSweep(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    Seq(("06h", "INTERVAL 6 HOURS"), ("1d", "INTERVAL 1 DAY"),
        ("3d", "INTERVAL 3 DAYS")).map { case (lbl, step) =>
      val (v, c, p) = funnelStages(ev, step)
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(lit(lbl).as("win"), col("n_view"), col("n_click"),
          col("n_purchase"),
          round(when(col("n_view") > 0, col("n_click").cast("double") /
            col("n_view").cast("double")), 6).as("click_rate"),
          round(when(col("n_click") > 0, col("n_purchase").cast("double") /
            col("n_click").cast("double")), 6).as("purchase_rate"))
    }.reduce(_.unionByName(_)).orderBy(col("win"))
  }

  /** Funnel conversion LATENCY — the "how long does the funnel take"
    * census [[funnelSteps]]'s counts stop short of: for each hop
    * (view→click, click→purchase, first-touch semantics identical to
    * the counts row — the two can never disagree on who converted),
    * the gap-seconds distribution as n, decimal-exact mean, and exact
    * p50/p90 cut on the gap histogram with the quantile family's
    * integer arithmetic.
    *
    * Scale shape: the stage relations are user-grain aggregates; the
    * hop gaps collapse to a (hop, gap_seconds) histogram whose CDF
    * window is gap-DOMAIN-bounded (≤ the 3-day window in seconds, by
    * construction of the funnel). */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val (v, c, p) = funnelStages(Tables(spark, dir, "events"))
    val hop1 = c.join(v, "user_id")
      .select(lit("1_view_click").as("hop"),
        (unix_timestamp(col("ct")) - unix_timestamp(col("vt")))
          .as("gap_s"))
    val hop2 = p.join(c, "user_id")
      .select(lit("2_click_purchase").as("hop"),
        (unix_timestamp(col("pt")) - unix_timestamp(col("ct")))
          .as("gap_s"))
    val hist = hop1.union(hop2)
      .groupBy(col("hop"), col("gap_s")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("hop")).orderBy(col("gap_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("hop"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(wTot))
      .withColumn("wsum", sum(col("gap_s") * col("cnt")).over(wTot))
      .groupBy(col("hop"))
      .agg(max(col("tot")).as("n_conversions"),
        round(max(col("wsum")).cast("double") /
          max(col("tot")).cast("double"), 2).as("mean_gap_s"),
        min(when(col("cum") >= expr("(tot + 1) div 2"), col("gap_s")))
          .as("p50_gap_s"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("gap_s")))
          .as("p90_gap_s"))
      .orderBy(col("hop"))
  }

  /** First-touch vs LAST-touch attribution census — the two naive
    * models every marketing mix starts from, side by side: for each
    * purchase, the user's earliest and latest preceding non-purchase
    * event type (within the whole history — the as-of rows handle
    * windows) each earn one credit; the census shows how differently
    * the two models pay out per channel, which is the argument for the
    * multi-touch models. Both touches come from ONE per-user window
    * sort (first_value/last_value with a conditional column, shared
    * frame); purchases with no preceding touch are counted under
    * 'none'. Exact counts only.
    */
  def attributionTouch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val p = Tables(spark, dir, "events")
      .withColumn("first_touch",
        first(touch, ignoreNulls = true).over(byUser))
      .withColumn("last_touch",
        last(touch, ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("first_touch"), lit("none")).as("ft"),
        coalesce(col("last_touch"), lit("none")).as("lt"))
    val f = p.groupBy(col("ft").as("channel"))
      .agg(count(lit(1)).as("first_touch_credits"))
    val l = p.groupBy(col("lt").as("channel"))
      .agg(count(lit(1)).as("last_touch_credits"))
    f.join(l, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch_credits"), lit(0L))
          .as("first_touch_credits"),
        coalesce(col("last_touch_credits"), lit(0L))
          .as("last_touch_credits"))
      .orderBy(col("channel"))
  }

  /** Week-over-week volume growth per event type — the ops trend table
    * ([[graft.operators.Relational.qoqGrowth]]'s sibling at stream
    * grain): ISO-week rollup, LAG for the prior week, growth as one
    * double division, NULL on each type's first week. */
  def wowGrowth(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).as("wk"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("wk"))
    weekly.withColumn("prev", lag(col("n"), 1).over(w))
      .select(col("event_type"),
        date_format(col("wk"), "yyyy-MM-dd").as("week"), col("n"),
        when(col("prev").isNotNull,
          round((col("n") - col("prev")).cast("double") /
            col("prev").cast("double"), 6)).as("wow_growth"))
      .orderBy(col("event_type"), col("week"))
  }

  /** Conversion rate BY ACTIVITY BAND — does more engagement convert?
    * Users banded by total event count (fixed integer band edges
    * 8/16/32/64 — a CASE ladder, no float log2 boundary to disagree
    * on), each band reporting its user count, purchasers, and
    * conversion rate. The anti-causal reading (purchases inflate the
    * count) is the analyst's problem; the query's job is the exact
    * census. Two user-grain aggs, a ≤5-row output. */
  def conversionByActivity(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    perUser
      .select(
        when(col("n") < 8, "a_lt8").when(col("n") < 16, "b_8_15")
          .when(col("n") < 32, "c_16_31").when(col("n") < 64, "d_32_63")
          .otherwise("e_64plus").as("band"),
        col("converted"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("converted")).as("n_converted"))
      .select(col("band"), col("n_users"), col("n_converted"),
        round(col("n_converted").cast("double") /
          col("n_users").cast("double"), 6).as("conversion_rate"))
      .orderBy(col("band"))
  }

  /** SESSION-VALUE distribution — what a session is worth: gap-split
    * sessions ([[sessionize]]'s lag/cumsum kernel, 30-min gap) carry
    * their summed event value in exact integer cents; the census is
    * session count, decimal-exact mean, and p50/p90 cut at DOLLAR
    * granularity (the RFM banding trick: the dollar histogram is
    * value-DOMAIN-bounded where raw cents would be session-count-
    * sized, so the CDF window never scales with sessions).
    *
    * One per-user window pass, one session-grain agg, one dollar
    * histogram + tiny CDF, a 1-row census. */
  def sessionValue(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = Tables(spark, dir, "events")
      .withColumn("lag_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("lag_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("lag_ts")) >
            1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(sum(round(col("value") * 100).cast("long")).as("value_c"))
    val totals = sessions.agg(count(lit(1)).as("ns"),
      sum(col("value_c")).as("vc"))
    val hist = sessions
      .select(expr("value_c div 100").as("value_d"))
      .groupBy(col("value_d")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy(col("value_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .crossJoin(broadcast(totals)) // 1-row totals
      .agg(max(col("ns")).as("n_sessions"),
        round(max(col("vc")).cast("double") /
          (max(col("ns")) * 100L).cast("double"), 2).as("mean_value"),
        min(when(col("cum") >= expr("(ns + 1) div 2"), col("value_d")))
          .as("p50_value_d"),
        min(when(col("cum") * 10 >= col("ns") * 9, col("value_d")))
          .as("p90_value_d"))
  }

  /** Event-VALUE distribution per type — exact percentiles over the
    * bounded value domain (cents histogram: the `value` column lives
    * in [0, 100], so the per-type CDF window scans ≤10⁴ rows at any
    * corpus size — the cleanest instance of the histogram-quantile
    * family). Mean is decimal-exact. */
  def valueDist(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables(spark, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(wTot))
      .withColumn("wsum", sum(col("v_c") * col("cnt")).over(wTot))
      .groupBy(col("event_type"))
      .agg(max(col("tot")).as("n_events"),
        round(max(col("wsum")).cast("double") /
          (max(col("tot")) * 100L).cast("double"), 4).as("mean_value"),
        round(min(when(col("cum") >= expr("(tot + 1) div 2"),
          col("v_c"))).cast("double") / 100, 2).as("p50_value"),
        round(min(when(col("cum") * 10 >= col("tot") * 9,
          col("v_c"))).cast("double") / 100, 2).as("p90_value"),
        round(min(when(col("cum") * 100 >= col("tot") * 99,
          col("v_c"))).cast("double") / 100, 2).as("p99_value"))
      .orderBy(col("event_type"))
  }

  /** NEW vs RETURNING daily traffic split — the composition census
    * behind every growth dashboard's stacked area: per day, events from
    * users on their FIRST active day vs events from returners, plus
    * the new-traffic share. The user-grain first-day relation joins
    * back on user_id (co-partitioned with the fact scan's natural
    * key); day equality is date-exact in both engines. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"))
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    ev.join(firstDay, "user_id")
      .groupBy(col("d"))
      .agg(sum(when(col("d") === col("d0"), 1L).otherwise(0L))
        .as("n_new"),
        sum(when(col("d") =!= col("d0"), 1L).otherwise(0L))
          .as("n_returning"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_new"), col("n_returning"),
        round(col("n_new").cast("double") /
          (col("n_new") + col("n_returning")).cast("double"), 6)
          .as("new_share"))
      .orderBy(col("day"))
  }

  /** Tolerance-bounded nearest as-of census — [[asofNearest]] with the
    * pandas merge_asof `tolerance` semantics a feature-store join
    * needs: a purchase only matches its nearest view when the gap is
    * within 30 minutes; beyond that the row is deliberately UNMATCHED
    * (stale context must not leak into features). Census per outcome
    * (before / after / none): purchases and the decimal-exact mean
    * matched gap in seconds. Same shared-sort two-frame window plan as
    * the unbounded row. */
  def asofTolerance(spark: SparkSession, dir: String,
      tolSec: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val back = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = byUser.rowsBetween(1, Window.unboundedFollowing)
    val viewTs = when(col("event_type") === "view", col("ts"))
    Tables(spark, dir, "events")
      .withColumn("prev_view_ts", max(viewTs).over(back))
      .withColumn("next_view_ts", min(viewTs).over(fwd))
      .filter(col("event_type") === "purchase")
      .withColumn("gap_back",
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_view_ts")))
      .withColumn("gap_fwd",
        unix_timestamp(col("next_view_ts")) - unix_timestamp(col("ts")))
      .withColumn("gb", when(col("gap_back") <= tolSec, col("gap_back")))
      .withColumn("gf", when(col("gap_fwd") <= tolSec, col("gap_fwd")))
      .withColumn("outcome",
        when(col("gb").isNotNull &&
          (col("gf").isNull || col("gb") <= col("gf")), lit("before"))
          .when(col("gf").isNotNull, lit("after"))
          .otherwise(lit("none")))
      .withColumn("gap_s", when(col("outcome") === "before", col("gb"))
        .when(col("outcome") === "after", col("gf")))
      .groupBy(col("outcome"))
      .agg(count(lit(1)).as("n_purchases"),
        when(sum(when(col("gap_s").isNotNull, 1L).otherwise(0L)) > 0,
          round(sum(coalesce(col("gap_s"), lit(0L))).cast("double") /
            sum(when(col("gap_s").isNotNull, 1L).otherwise(0L)), 2))
          .as("mean_gap_s"))
      .orderBy(col("outcome"))
  }

  /** Day-of-week × hour load HEATMAP — the capacity-planning census
    * behind every on-call rota: event volume per (ISO weekday, hour)
    * cell with each cell's share of total traffic. ISO weekday
    * (1 = Monday) is computed as weekday(ts)+1 so both engines agree
    * on week numbering. One hash-agg to ≤168 cells. */
  def heatmap(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy((expr("weekday(ts)") + 1).cast("long").as("isodow"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("t"))
    cells.crossJoin(broadcast(tot)) // 1-row total
      .select(col("isodow"), col("hr"), col("n"),
        round(col("n").cast("double") / col("t").cast("double"), 6)
          .as("share"))
      .orderBy(col("isodow"), col("hr"))
  }

  /** Event-type CO-OCCURRENCE matrix — which features share users:
    * for every type pair, the count of users who used both and the
    * Jaccard overlap of their user sets. High overlap = bundled
    * behavior (funnel candidates); low = segmented audiences. The
    * per-user type set is |types|-bounded, so pairs expand IN-TASK
    * from one sorted collect per user (the grouped-posting idiom every
    * dedup row uses) — one shuffle on user, one |types|²-bounded
    * census, never a user-set self-join.
    *
    * Jaccard divides exact integers once; the |types|-row size
    * relation broadcasts twice. */
  def typeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ut.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("event_type"))).as("ts"))
      .filter(size(col("ts")) > 1)
      .select(explode(expr(
        """flatten(transform(ts, (x, i) ->
             transform(slice(ts, i + 2, size(ts)),
               y -> struct(x AS ta, y AS tb))))""")).as("p"))
      .groupBy(col("p.ta").as("type_a"), col("p.tb").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("na"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("na") + col("nb") - col("n_both")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Feature-ADOPTION curves — per event type, the cumulative count of
    * users who have used it at least once, by day: running
    * distinct-count made scale-safe by the FIRST-APPEARANCE
    * decomposition (a user contributes to exactly one (type, day) —
    * their first use — so cumulative adoption is a plain running SUM
    * over the calendar-bounded histogram, never a running COUNT
    * DISTINCT over the corpus). Emits per (type, day): new adopters,
    * cumulative adopters, and the share of the type's final adopter
    * population.
    *
    * One (user, type)-grain agg (the corpus pass), a (type,
    * day)-domain histogram, per-type cumulative windows, a
    * |types|-row totals broadcast. */
  def reachCurve(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(to_date(col("ts"))).as("d"))
    val daily = firstDay.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n_new"))
    val tot = firstDay.groupBy(col("event_type"))
      .agg(count(lit(1)).as("t"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .join(broadcast(tot), "event_type") // |types|-row totals
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_new"), col("cum_users"),
        round(col("cum_users").cast("double") / col("t").cast("double"), 6)
          .as("reach_share"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DAU/WAU stickiness — the product-engagement ratio every growth
    * dashboard leads with: per ISO week, the distinct weekly actives,
    * the mean daily actives across the week's observed days, and
    * stickiness = avg-DAU / WAU (1.0 = everyone active every day). The
    * final ratio is ONE double division of exact integers
    * (Σdau / (days·wau)), written identically in the oracle.
    *
    * Scale shape: events collapse to DISTINCT (user, day) once (the
    * only corpus-sized pass — both the daily and weekly rollups hang
    * off it), then calendar-bounded aggs. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val daily = ud.groupBy(col("d")).agg(count(lit(1)).as("dau"))
      .withColumn("week", date_trunc("week", col("d")))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val weekly = ud
      .select(date_trunc("week", col("d")).as("week"), col("user_id"))
      .distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("wau"))
    daily.join(weekly, "week")
      .select(date_format(col("week"), "yyyy-MM-dd").as("week"),
        col("n_days"), col("wau"),
        round(col("sum_dau").cast("double") / col("n_days"), 2)
          .as("avg_dau"),
        round(col("sum_dau").cast("double") /
          (col("n_days") * col("wau")).cast("double"), 6).as("stickiness"))
      .orderBy(col("week"))
  }

  /** Rule-based BOT detection census — the traffic-hygiene pass a
    * training-data pipeline runs before any behavioral signal is
    * trusted (bot sessions poison retention, funnel, and attribution
    * rows alike): three deterministic rules on per-user aggregates —
    * sustained rate (events > 3× active days), error-dominated
    * (errors ≥ a third of events), and absolute volume (≥ 80 events) —
    * reported as a census per rule-combination with the share of ALL
    * events each combination contributes (the contamination mass, the
    * number that decides whether filtering matters).
    *
    * Every rule is an integer cross-multiplication (no float
    * thresholds); the census is ≤8 cells; one corpus pass to the
    * user grain. */
  def botDetection(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_err"),
        countDistinct(to_date(col("ts"))).as("days"))
    val tot = perUser.agg(sum(col("n")).as("t"))
    perUser
      .select(
        (col("n") > col("days") * 3L).cast("long").as("high_rate"),
        (col("n_err") * 3L >= col("n")).cast("long").as("error_heavy"),
        (col("n") >= 80L).cast("long").as("high_volume"),
        col("n"))
      .groupBy(col("high_rate"), col("error_heavy"), col("high_volume"))
      .agg(count(lit(1)).as("n_users"), sum(col("n")).as("n_events"))
      .crossJoin(broadcast(tot)) // 1-row total scalar
      .select(col("high_rate"), col("error_heavy"), col("high_volume"),
        col("n_users"), col("n_events"),
        round(col("n_events").cast("double") / col("t").cast("double"), 6)
          .as("event_share"))
      .orderBy(col("high_rate"), col("error_heavy"), col("high_volume"))
  }

  /** Gini coefficient of user activity — the one-number concentration
    * summary next to [[powerPareto]]'s curve: 0 = everyone equally
    * active, →1 = all events from a handful of users. Computed on the
    * events-per-user COUNT HISTOGRAM with the grouped-rank identity
    * 2·Σ i·x_(i) = Σ_v v·(2·c_v·r0_v + c_v·(c_v+1)) — every term an
    * exact integer (r0 = users ranked below the tie group), so the
    * only float is the final G = 2S/(N·T) − (N+1)/N.
    *
    * Scale shape: identical envelope to [[powerPareto]] — two
    * hash-aggs to the count-domain histogram, one cumulative window
    * over it, a 1-row census. */
  def activityGini(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("r0", coalesce(sum(col("c")).over(w), lit(0L)))
      .agg(sum(col("c")).as("n_users"),
        sum(col("v") * col("c")).as("total_events"),
        sum(col("v") * (lit(2L) * col("c") * col("r0") +
          col("c") * (col("c") + 1L))).as("s2"))
      .select(col("n_users"), col("total_events"),
        round(col("s2").cast("double") /
          (col("n_users").cast("double") *
            col("total_events").cast("double")) -
          (col("n_users") + 1L).cast("double") /
            col("n_users").cast("double"), 6).as("gini"))
  }

  /** Cohort retention: users grouped by first-activity date, counted on
    * each of the following 7 days they return. Two aggregates (first day
    * per user, distinct active days per user) joined on user_id — the
    * day-offset matrix never exceeds |cohorts| x 8 rows regardless of
    * event volume. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val first = ev.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("d0"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(first, "user_id")
      .withColumn("day_offset", datediff(col("d"), col("d0")).cast("long"))
      .filter(col("day_offset").between(0, 7))
      .groupBy(date_format(col("d0"), "yyyy-MM-dd").as("cohort"),
        col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  /** JSON extraction from the `props` column + conditional agg. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"),
        count(when(col("k") >= 50, 1)).as("n_high"))
      .orderBy(col("event_type"))

  /** Typed per-group transformation via `groupByKey.mapGroups` — the
    * escape hatch for group logic SQL can't express (here: a journey
    * summary needing the group's rows in event order). The whole group
    * shuffles as rows and the function sorts it in memory, so this API
    * is for group-local logic with BOUNDED group size; the window-based
    * forms ([[sessionize]], [[asofAttribution]]) are the scale path when
    * the computation IS expressible relationally. Deterministic: sort key
    * includes event_id, output is a pure function of the sorted group. */
  def userJourney(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsu"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(r => (r._3, r._2))
        val first = rows.head
        val last = rows.last
        (uid, rows.length.toLong, first._4, last._4,
          (last._3 - first._3) / 1000000L)
      }
      .toDF("user_id", "n_events", "first_type", "last_type", "span_seconds")
      .orderBy(col("user_id"))
  }

  /** Per-group z-score normalization (feature scaling for model input):
    * group moments accumulate as exact DECIMAL sums (sum, sum-of-squares,
    * count — order-independent, so partition layout can't perturb them),
    * convert to double mean/std once per GROUP, then broadcast-join the
    * 5-row stats relation back onto the rows. Same double formula on both
    * engines => bit-identical z. At 100 TB the stats side stays
    * group-cardinality-sized and the row pass is map-only. */
  def featureZscore(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(28,4)")).as("s"),
      sum((col("value").cast("decimal(18,4)") *
        col("value").cast("decimal(18,4)")).cast("decimal(38,8)")).as("ss"))
    ev.filter(col("event_id") < 300)
      .join(broadcast(stats), "event_type")
      .withColumn("mean", col("s").cast("double") / col("n"))
      .withColumn("std",
        sqrt(col("ss").cast("double") / col("n") - col("mean") * col("mean")))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  /** Robust (median/MAD) outlier census per event type — the companion
    * [[featureZscore]] needs when the data is dirty: mean/std are
    * themselves dragged by the outliers they're meant to flag, while the
    * median and the median-absolute-deviation have a 50% breakdown
    * point. Flags |v - median| > 3 * 1.4826 * MAD (1.4826 scales MAD to
    * σ under normality — Hampel's rule). Three group-bounded passes
    * (median, MAD of residuals, flag count), each a broadcast of the
    * type-cardinality stats relation back onto the rows; the exact
    * `percentile` is a per-group sort at most — at 100 TB swap in
    * approx_percentile and keep the output shape (the
    * [[Curation.qualityQuantile]] convention). Both engines evaluate
    * the identical double predicate on identical inputs, so the counts
    * hash-match. */
  def robustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("value").cast("double").as("v"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val stats = ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        expr("percentile(abs(v - med), 0.5)").as("mad"))
    ev.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 4).as("median_v"),
        round(first(col("mad")), 4).as("mad"),
        sum(when(abs(col("v") - col("med")) > lit(3 * 1.4826) * col("mad"),
          1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Event-type transition matrix (first-order Markov): for every user's
    * time-ordered event sequence, count `from -> to` adjacencies and
    * normalize per source type. One shuffle on user_id for the lead
    * window, then a tiny (types x types) aggregate; the probability
    * divides two exact counts, so the matrix is hash-stable. The
    * behavioral-model / next-event-prediction feature builder. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double"), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Next-event PREDICTION eval — the train→measure loop closed over
    * [[eventTransitions]]' matrix: the transition model is fit on the
    * first 15 days only (per from-type argmax next type, ties to the
    * lexicographically smallest — a deterministic decision rule), then
    * scored on the second half's transitions. Per from-type: the
    * model's pick, test pairs, hits, accuracy — plus how the argmax
    * baseline compares to the type's marginal share, which is the
    * number that says whether the chain structure predicts anything a
    * frequency table wouldn't. Pairs never straddle the cut (each
    * half's lead window sees only its own events — documented, and
    * identical in the oracle).
    *
    * Scale shape: two lead windows (per-user, time-ordered — the
    * sessionization partition shape), one ≤|types|²-row model agg +
    * rank, one test-side join on the tiny broadcast model. */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val t0 = ev.agg(min(col("ts")).as("t0"))
    val based = ev.crossJoin(broadcast(t0)) // 1-row epoch scalar
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    def pairs(half: DataFrame): DataFrame = half
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .select(col("event_type").as("from_type"), col("to_type"))
    val cut = col("t0") + expr("INTERVAL 15 DAYS")
    val trainPairs = pairs(based.filter(col("ts") < cut))
    val testPairs = pairs(based.filter(col("ts") >= cut))
    val wRank = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type"))
    val model = trainPairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    testPairs.join(broadcast(model), Seq("from_type"), "left")
      .groupBy(col("from_type"), col("predicted"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("to_type") === col("predicted")).cast("long"))
          .as("n_correct"))
      .select(col("from_type"), col("predicted"), col("n_pairs"),
        col("n_correct"),
        round(col("n_correct").cast("double") /
          col("n_pairs").cast("double"), 6).as("accuracy"))
      .orderBy(col("from_type"))
  }

  /** Markov STATIONARY distribution of the event-type chain — the
    * steady state [[eventTransitions]]' matrix implies, laid beside the
    * empirical type distribution: if the chain has mixed (drift ≈ 0),
    * the observed traffic composition is self-consistent with the
    * transition structure; a large drift flags non-stationary behavior
    * (onboarding flows, seasonality) that a next-event model trained on
    * the matrix alone would miss. Four power-iteration rounds unrolled,
    * ALL integer: the distribution lives in 1e6 micro-units seeded from
    * the exact empirical counts, and each round computes
    * π'_j = Σ_i (π_i · c_ij) div rs_i — the per-term integer division
    * is engine-identical (DuckDB `//`), so no float ever accumulates
    * (the [[graft.operators.Similarity]] PCA micro-unit convention
    * applied to a chain).
    *
    * Scale shape: ONE user-keyed window pass builds the adjacency
    * counts (the shuffle [[eventTransitions]] already pays); the
    * matrix is |types|² rows and every iteration round is a join-agg
    * over that broadcast-sized relation — corpus size never enters the
    * loop. */
  def markovStationary(spark: SparkSession, dir: String,
                       rounds: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables(spark, dir, "events")
    val trans = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rs", sum(col("n")).over(
        Window.partitionBy(col("from_type"))))
      .localCheckpoint() // tiny |types|² relation, reused every round
    val emp = ev.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(
        ev.agg(count(lit(1)).as("tot")))) // 1-row total
      .select(col("event_type"),
        expr("(cnt * 1000000) div tot").as("pi"))
    var pi = emp
    (1 to rounds).foreach { _ =>
      pi = pi
        .join(trans, pi("event_type") === trans("from_type"))
        .select(col("to_type").as("event_type"),
          expr("(pi * n) div rs").as("term"))
        .groupBy(col("event_type")).agg(sum(col("term")).as("pi"))
        .localCheckpoint()
    }
    emp.withColumnRenamed("pi", "empirical_micro")
      .join(pi.withColumnRenamed("pi", "stationary_micro"), "event_type")
      .select(col("event_type"), col("empirical_micro"),
        col("stationary_micro"),
        abs(col("empirical_micro") - col("stationary_micro"))
          .as("drift_micro"))
      .orderBy(col("event_type"))
  }

  /** Daily-volume anomaly detection per event type: days whose count
    * sits >= 2 standard deviations from that type's mean daily count —
    * the monitoring query every ingestion pipeline runs.
    *
    * The anomaly PREDICATE is evaluated in exact arithmetic,
    * cross-multiplied to avoid any float boundary: |z| >= 2 is
    * (cnt*n - s)^2 >= 4*(n*ss - s^2) where (s, ss, n) are the per-type
    * sum / sum-of-squares / day count. The predicate terms are cast to
    * DECIMAL(38,0) BEFORE multiplying: s*s (and n*ss) overflow int64
    * once a type's total daily-count sum passes ~3e9 — feasible at the
    * 100 TB design target, where ANSI Spark would throw while the
    * oracle silently computes in HUGEINT. Degenerate groups are
    * excluded up front: with one observed day, or all daily counts
    * equal, the variance term is 0, the predicate collapses to 0 >= 0
    * (every day "anomalous") and z divides 0/0 — so the filter requires
    * n > 1 AND strictly positive variance, and the oracle SQL carries
    * the identical conditions. The reported z uses the identical double
    * formula on both engines, so the gate hash-compares exactly. Stats
    * relation is type-cardinality-sized and broadcasts; the daily
    * relation is one hash-agg of the fact table. */
  def dailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val st = daily.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("s"), sum(col("cnt") * col("cnt")).as("ss"),
        count(lit(1)).as("n"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val dev = dec(col("cnt")) * dec(col("n")) - dec(col("s"))
    val variance = dec(col("n")) * dec(col("ss")) - dec(col("s")) * dec(col("s"))
    daily.join(broadcast(st), "event_type")
      .filter(col("n") > 1 && variance > 0 && dev * dev >= lit(4) * variance)
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"),
        round((col("cnt").cast("double") - col("s").cast("double") / col("n")) /
          sqrt(col("ss").cast("double") / col("n") -
            (col("s").cast("double") / col("n")) *
              (col("s").cast("double") / col("n"))), 4).as("z"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Distribution-shift monitor between two time slices of the stream —
    * the data-quality gate a training pipeline runs between crawls ("did
    * the mix change under us?"): the event-type distribution of the
    * SECOND half of the month is tested against the FIRST half's as the
    * null hypothesis. Per type: raw counts in each half, each half's
    * share, and the Pearson chi-square contribution
    * (n₂ − e)² / e with e = t₂·n₁/t₁ — the per-cell decomposition, so a
    * drifted category is directly attributable rather than hidden in
    * one scalar. Counts are exact BIGINT; the double formula is applied
    * in the identical operation order in both engines.
    *
    * Scale shape: one hash-aggregation of the fact table (map-side
    * partials, type-cardinality result), the 1-row totals broadcast
    * back — no window, no second fact pass. At 100 TB the census stays
    * |event_type| rows regardless of volume. */
  def eventsDrift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16 00:00:00").cast("timestamp")
    val halves = Tables(spark, dir, "events")
      .select(col("event_type"),
        (col("ts") >= cut).cast("long").as("h"))
      .groupBy(col("event_type"))
      .agg(sum(lit(1L) - col("h")).as("n_first"), sum(col("h")).as("n_second"))
    val totals = halves.agg(sum(col("n_first")).as("t1"),
      sum(col("n_second")).as("t2"))
    val e = col("t2").cast("double") * col("n_first") / col("t1")
    halves.crossJoin(broadcast(totals)) // 1-row totals scalar
      .select(col("event_type"), col("n_first"), col("n_second"),
        round(col("n_first").cast("double") / col("t1"), 6).as("share_first"),
        round(col("n_second").cast("double") / col("t2"), 6).as("share_second"),
        round(pow(col("n_second") - e, lit(2.0)) / e, 6).as("chi2_term"))
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoint scan per event type — the level-shift detector a
    * volume monitor runs after [[dailyAnomaly]]'s point outliers: the
    * cumulative sum of deviations from the series mean peaks exactly
    * where the mean SHIFTS, so argmax|CUSUM| estimates the change
    * point. Emits per type: series length, total events, the estimated
    * changepoint hour and the peak |CUSUM| magnitude.
    *
    * Exactness: the mean is never materialized as a float — the
    * deviation sum is cross-multiplied into integers, cusum_t scaled
    * by T: T·Σn_i − t·S (all longs), so the argmax and every
    * comparison are EXACT; one double division (by T) scales the
    * reported peak back at the end. Ties on |CUSUM| break to the
    * earliest hour in both engines.
    *
    * Scale shape: events collapse to an (type, hour) histogram in one
    * map-side-partial hash-agg; every window after that is partitioned
    * by event_type over the TIME-bounded hourly relation (hours per
    * type, not events per type), the same envelope as ts_decompose. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val scanned = hourly
      .withColumn("t_hours", count(lit(1)).over(byType))
      .withColumn("s_tot", sum(col("n")).over(byType))
      .withColumn("cum_n", sum(col("n")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("idx", row_number().over(ordered).cast("long"))
      .withColumn("cusum_sc",
        col("t_hours") * col("cum_n") - col("idx") * col("s_tot"))
    scanned
      .withColumn("maxabs", max(abs(col("cusum_sc"))).over(byType))
      .filter(abs(col("cusum_sc")) === col("maxabs"))
      .groupBy(col("event_type"))
      .agg(max(col("t_hours")).as("n_hours"),
        max(col("s_tot")).as("total_events"),
        min(col("h")).as("cp_h"),
        max(col("maxabs")).as("maxabs"))
      .select(col("event_type"), col("n_hours"), col("total_events"),
        date_format(col("cp_h"), fmt).as("changepoint_hour"),
        round(col("maxabs").cast("double") /
          col("n_hours").cast("double"), 4).as("max_abs_cusum"))
      .orderBy(col("event_type"))
  }

  /** Top event-type TRIGRAM paths — the journey-mining readout next to
    * [[eventTransitions]]'s first-order matrix: the 15 most common
    * 3-step sequences across all users' time-ordered streams, with each
    * path's share of all trigrams. Second-order structure is where
    * funnels and habit loops become visible that a bigram matrix
    * averages away.
    *
    * Scale shape: two LEADs share ONE (user_id; ts, event_id) window
    * sort — per-user partitions, bounded by a user's event count; the
    * trigram relation then collapses by path string (map-side partials;
    * the path domain is |event_types|³-bounded, NOT corpus-sized), so
    * the global rank≤15 window runs over a vocabulary-sized relation
    * and Spark's WindowGroupLimit prunes it map-side. The 1-row total
    * broadcasts. */
  def topPaths(spark: SparkSession, dir: String, k: Int = 15): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = Tables(spark, dir, "events")
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("tot"))
    counts.crossJoin(broadcast(tot)) // 1-row scalar
      .withColumn("rk",
        row_number().over(Window.orderBy(col("n").desc, col("path"))))
      .filter(col("rk") <= k)
      .select(col("path"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
      .orderBy(col("n").desc, col("path"))
  }

  /** Activity concentration (power-user Pareto): what share of ALL
    * events do the top 1% / 5% / 10% / 25% most active users generate —
    * the skew census that sizes rate limits, sampling caps, and the
    * salting plan for every user-keyed shuffle downstream.
    *
    * Scale shape: ranking USERS would be a corpus-sized sort, so the
    * census runs on the activity HISTOGRAM instead — users collapse to
    * (events-per-user → user count) in two hash-aggs, and the
    * descending cumulative window runs over that count-DOMAIN-bounded
    * relation (max events per user, not user count). The top-k cut is
    * exact even when a count-value tie straddles it: ties are
    * interchangeable, so the straddling bucket contributes
    * (k − users_above) · v events — pure integer arithmetic, identical
    * in the oracle. The 4-row percent relation and the 1-row totals
    * broadcast. */
  def powerPareto(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
    val hist = perUser.groupBy(col("v")).agg(count(lit(1)).as("n_users"))
      .withColumn("ev", col("v") * col("n_users"))
    val w = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum_u", sum(col("n_users")).over(w))
      .withColumn("cum_e", sum(col("ev")).over(w))
    val totals = perUser.agg(count(lit(1)).as("u_tot"),
      sum(col("v")).as("e_tot"))
    import spark.implicits._
    val pcts = Seq(1L, 5L, 10L, 25L).toDF("pct")
    cum.crossJoin(broadcast(totals)) // 1-row totals
      .crossJoin(broadcast(pcts)) // 4-row percent axis
      .withColumn("k", expr("(pct * u_tot + 99) div 100"))
      .filter(col("cum_u") - col("n_users") < col("k") &&
        col("cum_u") >= col("k"))
      .select(col("pct"), col("k").as("n_top_users"),
        (col("cum_e") - col("ev") +
          (col("k") - (col("cum_u") - col("n_users"))) * col("v"))
          .as("n_events"),
        round((col("cum_e") - col("ev") +
          (col("k") - (col("cum_u") - col("n_users"))) * col("v"))
          .cast("double") / col("e_tot").cast("double"), 6).as("share"))
      .orderBy(col("pct"))
  }

  /** Difference-in-differences uplift readout — the causal-measurement
    * census [[abTest]]'s cross-sectional chi-square stops short of:
    * users hash-split into treat/control (deterministic parity), time
    * split at the exact corpus midpoint, and each arm's mean event
    * value reported pre vs post with its within-arm difference. The
    * treat-minus-control gap of the `diff` column IS the DiD estimate,
    * the first number an uplift analysis quotes (parallel-trends
    * caveats and all).
    *
    * Exactness: the midpoint is integer micros arithmetic ((min+max)
    * div 2 on a 1-row broadcast scalar); means are exact DECIMAL sums
    * divided once; the whole query is one corpus pass into a 2×2
    * census. */
  def upliftDid(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tsu"),
        col("value"))
    val mid = ev.agg(expr("(min(tsu) + max(tsu)) div 2").as("mid"))
    ev.crossJoin(broadcast(mid)) // 1-row midpoint scalar
      .select(
        when(pmod(col("user_id"), lit(2)) === 1, "treat")
          .otherwise("control").as("grp"),
        (col("tsu") > col("mid")).cast("long").as("post"),
        col("value"))
      .groupBy(col("grp"))
      .agg(
        sum(when(col("post") === 0L, 1L).otherwise(0L)).as("n_pre"),
        sum(col("post")).as("n_post"),
        (sum(when(col("post") === 0L, col("value").cast("decimal(28,4)"))
          .otherwise(lit(0).cast("decimal(28,4)"))).cast("double") /
          sum(when(col("post") === 0L, 1L).otherwise(0L))).as("mpre"),
        (sum(when(col("post") === 1L, col("value").cast("decimal(28,4)"))
          .otherwise(lit(0).cast("decimal(28,4)"))).cast("double") /
          sum(col("post"))).as("mpost"))
      .select(col("grp"), col("n_pre"), col("n_post"),
        round(col("mpre"), 6).as("mean_pre"),
        round(col("mpost"), 6).as("mean_post"),
        round(col("mpost") - col("mpre"), 6).as("diff"))
      .orderBy(col("grp"))
  }

  /** Entropy of the first-order event-type Markov chain — the
    * predictability census on top of [[eventTransitions]]'s matrix: per
    * source type, the Shannon entropy of its next-event distribution
    * (0 = deterministic follow-up, ln|types| = uniform), plus each
    * row's share of all transitions — together the weighted entropy
    * rate of user behavior, the information-theoretic ceiling for any
    * next-event predictor.
    *
    * Exactness: H = ln R − (Σ n·ln n)/R over exact integer counts;
    * each n·ln n term is a deterministic double quantized to
    * DECIMAL(28,12) before summing (the [[TextAnalysis.lmHeldout]]
    * convention). Same one-shuffle plan as the transition matrix. */
  def transitionEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Tables(spark, dir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = trans.agg(sum(col("n")).as("t"))
    trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_total"),
        count(lit(1)).as("n_successors"),
        sum((col("n").cast("double") * log(col("n").cast("double")))
          .cast("decimal(28,12)")).as("nlogn"))
      .crossJoin(broadcast(tot)) // 1-row total scalar
      .select(col("from_type"), col("row_total"), col("n_successors"),
        round(log(col("row_total").cast("double")) -
          col("nlogn").cast("double") / col("row_total").cast("double"), 6)
          .as("entropy"),
        round(col("row_total").cast("double") / col("t").cast("double"), 6)
          .as("share"))
      .orderBy(col("from_type"))
  }

  /** Forecast MODEL SELECTION — the comparison [[forecastNaive]] (one
    * model, its error) stops short of: last-value (lag-1) vs
    * seasonal-naive (lag-7) predictors scored side by side on the
    * daily series, per event type, over exactly the days where BOTH
    * have a prediction, with the winner named. The first question any
    * forecasting effort answers — "does seasonality beat persistence
    * here?" — as a query.
    *
    * Exactness: both MAEs are sums of integer |errors| divided once at
    * the end; the winner predicate compares the two integer sums
    * directly (no float boundary). Both LAGs share one (event_type;
    * day) window sort. Scale: the window runs over the DAY-bounded
    * daily relation, the same envelope as every series op here. */
  def forecastCompare(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
    daily
      .withColumn("p1", lag(col("n"), 1).over(w))
      .withColumn("p7", lag(col("n"), 7).over(w))
      .filter(col("p1").isNotNull && col("p7").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("n") - col("p1"))).as("ae1"),
        sum(abs(col("n") - col("p7"))).as("ae7"))
      .select(col("event_type"), col("n_days"),
        round(col("ae1").cast("double") / col("n_days"), 4)
          .as("mae_naive"),
        round(col("ae7").cast("double") / col("n_days"), 4)
          .as("mae_seasonal"),
        when(col("ae7") < col("ae1"), "seasonal")
          .when(col("ae1") < col("ae7"), "naive")
          .otherwise("tie").as("winner"))
      .orderBy(col("event_type"))
  }

  /** Inter-arrival gap percentiles per event type — the queueing /
    * load-model input a capacity plan reads: for every user's
    * consecutive SAME-TYPE events, the gap in whole seconds, summarized
    * per type as exact p50/p90 and a decimal-exact mean. Gaps are
    * per-user (re-engagement cadence), not global stream spacing.
    *
    * Scale shape: the LAG window partitions by (user, type) — bounded
    * by one user's activity, never the stream; gaps then collapse to a
    * (type, gap_seconds) histogram (gap DOMAIN-bounded: the corpus
    * time span in seconds) and the percentile cut is the same
    * histogram-CDF integer arithmetic as the quantile family
    * (ceil(p·N) via div — no float ties). */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables(spark, dir, "events")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev")))
          .as("gap_s"))
    val hist = gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("gap_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("tot", sum(col("cnt")).over(wTot))
      .withColumn("wsum", sum(col("gap_s") * col("cnt")).over(wTot))
      .groupBy(col("event_type"))
      .agg(max(col("tot")).as("n_gaps"),
        round(max(col("wsum")).cast("double") /
          max(col("tot")).cast("double"), 2).as("mean_gap_s"),
        min(when(col("cum") >= expr("(tot + 1) div 2"), col("gap_s")))
          .as("p50_gap_s"),
        min(when(col("cum") * 10 >= col("tot") * 9, col("gap_s")))
          .as("p90_gap_s"))
      .orderBy(col("event_type"))
  }

  /** Consecutive-day activity STREAKS (gaps-and-islands): each user's
    * longest run of consecutive active days, histogrammed — the
    * engagement-depth census behind habit metrics, and the canonical
    * islands idiom at day granularity (the second-granularity cousin
    * is [[sessionize]]'s gap split). Island key = day-number −
    * row_number: constant exactly while days are consecutive, pure
    * integer arithmetic in both engines.
    *
    * Scale shape: events collapse to DISTINCT (user, day) in one
    * hash-agg (the only corpus-sized pass); the row_number window is
    * per-user over active DAYS (calendar-bounded per user), then two
    * group-bounded aggs funnel to the streak-length histogram (output
    * ≤ the longest streak). */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    days
      .withColumn("grp",
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long") -
          row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("max_streak"))
      .groupBy(col("max_streak"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("max_streak"))
  }

  /** MARKOV removal-effect attribution — the marketing-science answer
    * to [[attributionTouch]]'s naive first/last-touch split: user
    * journeys (events up to and including the first purchase, or to
    * journey end without one) define a channel transition chain with
    * absorbing `conv` (purchase) and `end` (drop-off) states; a
    * channel's credit is its REMOVAL EFFECT — how much the chain's
    * conversion probability falls when every transition into that
    * channel is redirected to drop-off (Anderl et al.'s framework).
    * Conversion probability is the start-state mass absorbed in
    * `conv` after 8 unrolled chain steps (truncation documented;
    * mirrored exactly in the oracle), computed for the full chain and
    * once per removed channel, all FIVE configurations sharing one
    * transition census through a broadcast config axis.
    *
    * Determinism: transition probabilities are exact-count ratios;
    * each step's mass products quantize to DECIMAL(28,12) before the
    * per-state sums. Scale shape: the fact-scale work is ONE journey
    * pass (per-user lead window, the sessionization shape); everything
    * after lives on a ≤|channels|²·|configs| relation iterated 8
    * times — constant-size algebra at any corpus size. */
  def attributionMarkov(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    // journey truncation: keep each user's events up to and including
    // the FIRST purchase (order by ts, event_id)
    val firstConv = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("fc"))
    val journey = ev
      .join(firstConv, Seq("user_id"), "left")
      .filter(col("fc").isNull ||
        struct(col("ts"), col("event_id")) <= col("fc"))
      .withColumn("state",
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = journey
      .withColumn("rn", row_number().over(w))
      .withColumn("nxt", lead(col("state"), 1).over(w))
    val trans = steps.filter(col("rn") === 1)
      .select(lit("start").as("from"), col("state").as("to"))
      .unionByName(steps.filter(col("nxt").isNotNull)
        .filter(col("state") =!= "conv")
        .select(col("state").as("from"), col("nxt").as("to")))
      .unionByName(steps.filter(col("nxt").isNull &&
          col("state") =!= "conv")
        .select(col("state").as("from"), lit("end").as("to")))
      .groupBy(col("from"), col("to")).agg(count(lit(1)).as("n"))
    val channels = Seq("view", "click", "signup", "error")
    import ev.sparkSession.implicits._
    val configs = ("full" +: channels).toDF("config")
    // removal: transitions INTO the removed channel redirect to `end`;
    // transitions OUT of it are dropped (the state is unreachable)
    val confTrans = trans.crossJoin(broadcast(configs))
      .filter(col("from") =!= col("config"))
      .withColumn("to2",
        when(col("to") === col("config"), lit("end")).otherwise(col("to")))
      .groupBy(col("config"), col("from"), col("to2"))
      .agg(sum(col("n")).as("n"))
    val outTot = confTrans.groupBy(col("config"), col("from"))
      .agg(sum(col("n")).as("tot"))
    val probs = confTrans.join(outTot, Seq("config", "from"))
      .select(col("config"), col("from"), col("to2").as("to"),
        (col("n").cast("double") / col("tot").cast("double")).as("p"))
      // absorbing self-loops keep conv/end mass in place
      .unionByName(configs.select(col("config"), lit("conv").as("from"),
        lit("conv").as("to"), lit(1.0).as("p")))
      .unionByName(configs.select(col("config"), lit("end").as("from"),
        lit("end").as("to"), lit(1.0).as("p")))
      .localCheckpoint() // ≤ |states|²·|configs| rows, iterated 8 times
    var v = configs.select(col("config"), lit("start").as("state"),
      lit(1.0).as("m"))
    for (_ <- 1 to 8) {
      val vr = v.select(col("config").as("vc"), col("state").as("vs"),
        col("m"))
      v = vr.join(probs, vr("vc") === probs("config") &&
          vr("vs") === probs("from"))
        .groupBy(col("config"), col("to"))
        .agg(sum((col("m") * col("p")).cast("decimal(28,12)"))
          .cast("double").as("m"))
        .select(col("config"), col("to").as("state"), col("m"))
    }
    val pConv = v.filter(col("state") === "conv")
      .select(col("config"), col("m").as("p_conv"))
    val full = pConv.filter(col("config") === "full")
      .select(col("p_conv").as("p_full"))
    pConv.filter(col("config") =!= "full")
      .crossJoin(broadcast(full)) // 1-row full-chain scalar
      .select(col("config").as("channel"),
        round(col("p_full"), 6).as("p_full"),
        round(col("p_conv"), 6).as("p_removed"),
        round((col("p_full") - col("p_conv")) / col("p_full"), 6)
          .as("removal_effect"))
      .orderBy(col("channel"))
  }

  /** Retention-curve DECAY fit — the `events_retention` triangle
    * collapsed to the one number a growth team tracks: pooled
    * retention r(t) = active users at day-offset t over total cohort
    * mass (offsets 1..7; day 0 is 1 by construction and excluded from
    * the fit), log-linear OLS ln r = a + b·t, and the implied
    * HALF-LIFE −ln 2 / b. Per-offset rows carry the observed and
    * fitted rates so the fit's lack-of-fit is visible, with the slope
    * and half-life riding along.
    *
    * Determinism: counts exact; the fit is the [[TextAnalysis.heapsLaw]]
    * 7-point OLS discipline (per-term DECIMAL(28,12) quantization).
    * Scale: one distinct (user, day) pass, a cohort-grain agg, an
    * 8-row curve, a 7-row fit. */
  def retentionFit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val first = ev.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("d0"))
    val act = ev.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val offs = act.join(first, "user_id")
      .withColumn("t", datediff(col("d"), col("d0")).cast("long"))
      .filter(col("t").between(0, 7))
    val tot = offs.filter(col("t") === 0).agg(count(lit(1)).as("n0"))
    val curve = offs.filter(col("t") >= 1)
      .groupBy(col("t")).agg(count(lit(1)).as("n_active"))
      .crossJoin(broadcast(tot)) // 1-row cohort mass
      .withColumn("r", col("n_active").cast("double") /
        col("n0").cast("double"))
      .withColumn("x", col("t").cast("double"))
      .withColumn("y", log(col("r")))
    val fit = curve.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,12)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double")
        .as("sxy"),
      sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
        .as("sxx"))
      .select(
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))).as("b"),
        col("sx"), col("sy"), col("n"))
      .select(col("b"),
        ((col("sy") - col("b") * col("sx")) / col("n")).as("a"))
    curve.crossJoin(broadcast(fit)) // 1-row fit scalars
      .select(col("t"), col("n_active"), round(col("r"), 6).as("retention"),
        round(exp(col("a") + col("b") * col("x")), 6).as("fitted"),
        round(col("b"), 6).as("slope"),
        round(-log(lit(2.0)) / col("b"), 4).as("half_life_days"))
      .orderBy(col("t"))
  }

  /** CUPED variance reduction for the A/B readout — the adjustment
    * every mature experimentation platform applies before the t-test:
    * the week-2 purchase count (the metric) is debiased by each
    * user's week-1 purchase count (the pre-period covariate),
    * Y′ = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) fit on the pooled
    * sample; the payoff is the variance-reduction column — how much
    * tighter the same experiment reads after adjustment, for free.
    * Arms are [[abTest]]'s user-parity split.
    *
    * Determinism: θ is an exact-integer ratio ((nΣxy − ΣxΣy)/(nΣx² −
    * (Σx)²)); adjusted values are per-user double expressions over
    * exact ints and θ; variance sums quantize per-user to
    * DECIMAL(28,12). Scale: two user-grain count aggs, one pooled
    * 1-row fit, one arm-grain census. */
  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val t0 = ev.agg(min(col("ts")).as("t0"))
    val based = ev.crossJoin(broadcast(t0)) // 1-row epoch scalar
    def purchases(cond: Column): DataFrame = based.filter(cond)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val wk = (n: Int) => col("t0") + expr(s"INTERVAL $n DAYS")
    val x = purchases(col("ts") < wk(7)).withColumnRenamed("n", "x")
    val y = purchases(col("ts") >= wk(7) && col("ts") < wk(14))
      .withColumnRenamed("n", "y")
    val users = ev.select(col("user_id")).distinct()
      .join(x, Seq("user_id"), "left").join(y, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"),
        when(col("user_id") % 2 === 0, "A").otherwise("B").as("arm"))
    val fit = users.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        (col("sx").cast("double") / col("n").cast("double")).as("mx"))
    val adj = users.crossJoin(broadcast(fit)) // 1-row θ scalar
      .withColumn("ya", col("y").cast("double") -
        col("theta") * (col("x").cast("double") - col("mx")))
    adj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("ya").cast("decimal(28,12)")).cast("double").as("sa"),
        sum((col("ya") * col("ya")).cast("decimal(28,12)")).cast("double")
          .as("saa"),
        max(col("theta")).as("theta"))
      .withColumn("var_y",
        (col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double"))
      .withColumn("var_ya",
        (col("n").cast("double") * col("saa") - col("sa") * col("sa")) /
          (col("n") * (col("n") - 1)).cast("double"))
      .select(col("arm"), col("n").as("n_users"),
        round(col("sy").cast("double") / col("n"), 6).as("mean_y"),
        round(col("sa") / col("n"), 6).as("mean_y_adj"),
        round(col("var_y"), 6).as("var_y"),
        round(col("var_ya"), 6).as("var_y_adj"),
        round(lit(1.0) - col("var_ya") / col("var_y"), 6)
          .as("var_reduction"),
        round(col("theta"), 6).as("theta"))
      .orderBy(col("arm"))
  }

  /** Behavioral USER-SIMILARITY pairs — users as 5-dim event-type
    * count vectors, cosine-matched within dominant-type BLOCKS (each
    * user's argmax type, ties lexicographic — the blocking key that
    * keeps the pair space sub-quadratic at 100 TB, where a second key
    * like activity decile would be added; cross-block pairs are
    * deliberately out of scope, the standard blocking trade): the
    * top-20 most-similar user pairs with their shared block — the
    * lookalike primitive behind audience expansion.
    *
    * Determinism: dots and squared norms are exact integer sums;
    * cosine is one double expression; ranking ties break (u1, u2).
    * Scale shape: one user-grain count agg, a |types|-bounded argmax,
    * a blocked self-join, a TakeOrdered top-k. */
  def userSimilarity(spark: SparkSession, dir: String,
                     k: Int = 20): DataFrame = {
    val counts = Tables(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val vecs = counts.groupBy(col("user_id"))
      .agg(min_by(col("event_type"), struct(-col("n"), col("event_type")))
          .as("dom"),
        sum(col("n") * col("n")).as("nsq"))
    val withDom = counts.join(vecs, "user_id")
    val a = withDom.select(col("dom"), col("event_type"),
      col("user_id").as("u1"), col("n").as("n1"), col("nsq").as("s1"))
    val b = withDom.select(col("dom"), col("event_type"),
      col("user_id").as("u2"), col("n").as("n2"), col("nsq").as("s2"))
    a.join(b, Seq("dom", "event_type"))
      .filter(col("u1") < col("u2"))
      .groupBy(col("dom"), col("u1"), col("u2"), col("s1"), col("s2"))
      .agg(sum(col("n1") * col("n2")).as("dot"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("s1").cast("double")) * sqrt(col("s2").cast("double"))))
      .orderBy(col("cos").desc, col("u1"), col("u2"))
      .limit(k)
      .select(col("u1"), col("u2"), col("dom").as("shared_block"),
        round(col("cos"), 6).as("cos"))
  }

  /** DISPERSION census of the daily event-count series — the
    * variance-to-mean ratio (index of dispersion) per event type: 1
    * for a Poisson arrival process, materially above 1 for bursty
    * (overdispersed) traffic — the one-number answer to "can I model
    * this feed as Poisson", and the events-side sibling of
    * [[TextAnalysis.burstiness]]. Sample variance from exact integer
    * sufficient statistics (n, Σx, Σx²); the flag fires at VMR > 1.5.
    *
    * One day-grain agg, a |types|-row census; all arithmetic exact to
    * the final divisions. */
  def dispersion(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("ssq"))
      .withColumn("mean", col("s").cast("double") / col("n_days"))
      .withColumn("variance",
        (col("n_days") * col("ssq") - col("s") * col("s")).cast("double") /
          (col("n_days") * (col("n_days") - 1)).cast("double"))
      .select(col("event_type"), col("n_days"), col("s").as("n_events"),
        round(col("mean"), 4).as("mean_daily"),
        round(col("variance"), 4).as("var_daily"),
        round(col("variance") / col("mean"), 4).as("vmr"),
        (col("variance") / col("mean") > 1.5).as("overdispersed"))
      .orderBy(col("event_type"))

  /** Sample-ratio-mismatch GUARDRAIL for the A/B assignment — the
    * check every experimentation platform runs before reading a
    * metric: under the 50/50 user_id-parity split ([[abTest]]'s
    * assignment, shared so the guardrail audits the same experiment),
    * the per-arm user counts should be binomially even; the 1-df
    * chi-square statistic (nA−nB)²/(nA+nB) flags a broken bucketing
    * pipeline at the 5% critical value 3.841. Reported overall and per
    * event type (a type-conditional imbalance catches logging loss in
    * one arm that the overall count hides).
    *
    * All counts exact; the statistic is one double expression. One
    * distinct-users pass per grouping, |types|+1 output rows. */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    def armed(df: DataFrame): DataFrame = df
      .withColumn("arm",
        when(col("user_id") % 2 === 0, lit("A")).otherwise(lit("B")))
    val byType = armed(ev.select(col("event_type"), col("user_id"))
      .distinct())
    val overall = armed(ev.select(col("user_id")).distinct())
      .withColumn("event_type", lit("0_all"))
    byType.unionByName(overall.select(col("event_type"), col("user_id"),
        col("arm")))
      .groupBy(col("event_type"))
      .agg(sum((col("arm") === "A").cast("long")).as("n_a"),
        sum((col("arm") === "B").cast("long")).as("n_b"))
      .withColumn("chi2",
        round((col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"), 6))
      .withColumn("srm_flag", col("chi2") > 3.841459)
      .orderBy(col("event_type"))
  }

  /** Activity-SEGMENT migration matrix — week-1 vs week-2 engagement
    * tier per user (low < 14, mid 14–17, high ≥ 18 events; thresholds
    * bracket the corpus's weekly quartiles, and users missing from a
    * week are the explicit `absent` tier), cross-tabulated: the
    * retention-marketing transition matrix behind "who upgraded, who
    * churned". The diagonal is stability, the lower triangle is decay,
    * `absent` rows/columns are churn-in/churn-out — all exact integer
    * censuses.
    *
    * Scale shape: one corpus pass per week folds to user-grain counts
    * (two hash-aggs sharing the events scan), a user-keyed full outer
    * join aligns the weeks, and the matrix is a ≤16-key agg; share
    * divides by the broadcast 1-row user total. */
  def segmentMigration(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val t0 = ev.agg(min(col("ts")).as("t0"))
    val base = ev.crossJoin(broadcast(t0)) // 1-row epoch scalar
    def seg(n: Column): Column =
      when(n >= 18, "high").when(n >= 14, "mid").otherwise("low")
    val w1 = base.filter(col("ts") < col("t0") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n1"))
    val w2 = base.filter(col("ts") >= col("t0") + expr("INTERVAL 7 DAYS") &&
        col("ts") < col("t0") + expr("INTERVAL 14 DAYS"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n2"))
    val aligned = w1.join(w2, Seq("user_id"), "full_outer")
      .select(
        when(col("n1").isNull, "absent").otherwise(seg(col("n1")))
          .as("seg_w1"),
        when(col("n2").isNull, "absent").otherwise(seg(col("n2")))
          .as("seg_w2"))
    val total = aligned.agg(count(lit(1)).as("n_total"))
    aligned.groupBy(col("seg_w1"), col("seg_w2"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total)) // 1-row user total
      .select(col("seg_w1"), col("seg_w2"), col("n_users"),
        round(col("n_users").cast("double") /
          col("n_total").cast("double"), 6).as("share"))
      .orderBy(col("seg_w1"), col("seg_w2"))
  }

  /** Kaplan–Meier SURVIVAL curve for time-to-first-purchase — the
    * censoring-correct answer to "how fast do users convert", run the
    * way a mid-campaign analysis must: only the first 7 days of the
    * log are observable, users enter at their first event, die at
    * their first purchase, and users with no purchase inside the
    * window are RIGHT-CENSORED at the window end (staggered entry →
    * per-user censor times — the setting where the naive ECDF is
    * biased and KM's product-limit estimator is the fix). Per death
    * day t: at-risk count n(t) = users with observed time ≥ t (the
    * late-censoring convention: same-day censored users still count),
    * deaths d(t), hazard d/n, and Ŝ(t) = Π_{t'≤t}(1 − d/n).
    *
    * Determinism: times are whole-day integers; n and d are exact
    * counts via the histogram-CDF-over-the-bounded-day-DOMAIN pattern
    * (a suffix sum over ≤8 day rows, never a corpus-sized window); the
    * product is exp∘Σln over exact-ratio doubles (≤8 terms, rounded
    * once at 6 — a d = n final day short-circuits to exactly 0 rather
    * than ln(0)).
    *
    * Scale shape: one corpus pass folds to per-user (first event,
    * first purchase) in a single hash-agg; everything after lives on
    * the ≤window-length day axis. At 100 TB the user-grain agg is the
    * only shuffle and the curve is output-bounded by the window. */
  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val wend = ev.agg((min(col("ts")) + expr("INTERVAL 7 DAYS")).as("wend"))
    val users = ev.crossJoin(broadcast(wend)) // 1-row window scalar
      .filter(col("ts") < col("wend"))
      .groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("f0"),
        to_date(min(when(col("event_type") === "purchase", col("ts"))))
          .as("p0"),
        to_date(max(col("wend"))).as("wd"))
      .select(col("user_id"),
        when(col("p0").isNotNull, datediff(col("p0"), col("f0")))
          .otherwise(datediff(col("wd"), col("f0"))).cast("long").as("t"),
        col("p0").isNotNull.as("ev"))
    val hist = users.groupBy(col("t"))
      .agg(count(lit(1)).as("n_obs"), sum(col("ev").cast("long")).as("d"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val km = hist
      .withColumn("n_at_risk", sum(col("n_obs")).over(wDesc))
      .filter(col("d") > 0)
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km.withColumn("factor", lit(1.0) -
        col("d").cast("double") / col("n_at_risk").cast("double"))
      .withColumn("survival",
        when(max((col("factor") === 0.0).cast("int")).over(wAsc) === 1,
          lit(0.0))
          .otherwise(round(exp(sum(log(col("factor"))).over(wAsc)), 6)))
      .select(col("t").as("t_day"), col("n_at_risk"),
        col("d").as("n_deaths"),
        (col("n_obs") - col("d")).as("n_censored_here"),
        round(col("factor"), 6).as("factor"), col("survival"))
      .orderBy(col("t_day"))
  }

  /** ROLLING active-user time series — DAU and trailing 7- and 28-day
    * distinct actives per calendar day, the growth-curve companion to
    * [[stickiness]]' per-week ratio (this is the row a dashboard plots
    * daily; dips in wau7 lead churn by a week). Ratio column =
    * dau / wau7, the daily-grain stickiness.
    *
    * A sliding COUNT DISTINCT cannot use the first-appearance
    * decomposition ([[reachCurve]]) because users re-enter windows, so
    * the scale-safe plan is the bounded EXPANSION join: the corpus
    * collapses to DISTINCT (user, day) once, each row then explodes to
    * the ≤ 28 grid days it contributes to (a pure equi-shuffle on grid
    * day — no range join, no nested loop), and the per-grid-day
    * distinct runs hash-partitioned by day. Expansion factor = window
    * length (a constant), grid days are calendar-bounded, trailing
    * partial windows past the observed calendar are dropped by the
    * observed-day semi join. */
  def rollingActives(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val days = ud.select(col("d")).distinct()
    val ex = ud.select(col("user_id"), col("d"),
        explode(sequence(lit(0), lit(27))).as("off"))
      .select(col("user_id"), col("off"),
        date_add(col("d"), col("off")).as("gd"))
    ex.join(days.select(col("d").as("gd")), Seq("gd"), "left_semi")
      .groupBy(col("gd"))
      .agg(
        countDistinct(when(col("off") === 0, col("user_id"))).as("dau"),
        countDistinct(when(col("off") <= 6, col("user_id"))).as("wau7"),
        countDistinct(col("user_id")).as("mau28"))
      .select(date_format(col("gd"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau7"), col("mau28"),
        round(col("dau").cast("double") / col("wau7").cast("double"), 6)
          .as("dau_wau"))
      .orderBy(col("day"))
  }

  /** Single CHANGE-POINT detection on each event type's daily-count
    * series — binary segmentation's first split (the standard level-
    * shift screen that runs before [[cusum]]'s sequential alarm): the
    * split day t* maximizes the between-segment sum of squares
    * S_L²/n_L + S_R²/n_R − S²/n (equivalently minimizes two-segment
    * SSE), computed from exact integer prefix sums so the only doubles
    * are three IEEE divisions identical cross-engine; argmax ties
    * break on the earlier day. Emits per type: the chosen boundary
    * (last day of the left segment), segment means, and the gain —
    * gain ≈ 0 reads "no level shift", a large gain dates the shift.
    *
    * One corpus pass to the (type, day) histogram; everything after is
    * calendar-bounded (per-type prefix windows over ≤ |days| rows, a
    * 1-row-per-type argmax). The identical shape at 100 TB: the
    * histogram shuffle is the only data-sized stage. */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = daily
      .withColumn("sl", sum(col("n")).over(wCum))
      .withColumn("nl", count(lit(1)).over(wCum))
      .withColumn("s", sum(col("n")).over(wAll))
      .withColumn("nd", count(lit(1)).over(wAll))
      .filter(col("nl") < col("nd")) // a split needs a non-empty right
      .withColumn("gain",
        (col("sl") * col("sl")).cast("double") / col("nl") +
          ((col("s") - col("sl")) * (col("s") - col("sl"))).cast("double")
            / (col("nd") - col("nl")) -
          (col("s") * col("s")).cast("double") / col("nd"))
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("gain").desc, col("d"))
    scored.withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("split_day"),
        col("nd").as("n_days"), col("nl").as("n_left"),
        round(col("sl").cast("double") / col("nl"), 6).as("mean_left"),
        round((col("s") - col("sl")).cast("double") /
          (col("nd") - col("nl")), 6).as("mean_right"),
        round(col("gain"), 6).as("gain"))
      .orderBy(col("event_type"))
  }

  /** Seasonality / trend STRENGTH (Hyndman's F_S, F_T) over
    * [[tsDecompose]]'s published relation — the one-number-per-series
    * summary that decides whether the seasonal adjustment is worth
    * applying at all: F_S = max(0, 1 − Var(R)/Var(S+R)) and
    * F_T = max(0, 1 − Var(R)/Var(T+R)). Near 0 reads "no structure";
    * near 1 reads "the component explains the series". Composes on the
    * decomposition's OUTPUT (4-dp components — both engines consume
    * identically rounded values, the `events_anomaly_stl` precedent),
    * so this row can never disagree with `ts_decompose` about what the
    * components ARE.
    *
    * Variances are computed from exact DECIMAL(18,6) quantizations of
    * each component value (sum and sum-of-squares are exact decimal
    * aggregates; the two divisions happen once per output row in
    * double). Everything after the shared daily rollup is
    * calendar-bounded. */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val dec = tsDecompose(spark, dir)
    val q6: Column => Column = c => c.cast("decimal(18,6)")
    val comp = dec.select(col("event_type"),
      q6(col("residual")).as("r"),
      q6(col("seasonal") + col("residual")).as("sr"),
      q6(col("n") - col("seasonal")).as("tr"))
    def variance(x: String): Column =
      sum(col(x) * col(x)).cast("double") / count(lit(1)) -
        (sum(col(x)).cast("double") / count(lit(1))) *
        (sum(col(x)).cast("double") / count(lit(1)))
    comp.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        variance("r").as("var_r"),
        variance("sr").as("var_sr"),
        variance("tr").as("var_tr"))
      .select(col("event_type"), col("n_days"),
        round(col("var_r"), 6).as("var_resid"),
        // a constant component (zero variance) yields NULL strength
        // rather than a cross-engine 0-division discrepancy
        round(when(col("var_sr") > 0, greatest(lit(0.0),
          lit(1.0) - col("var_r") / col("var_sr"))), 6).as("f_seasonal"),
        round(when(col("var_tr") > 0, greatest(lit(0.0),
          lit(1.0) - col("var_r") / col("var_tr"))), 6).as("f_trend"))
      .orderBy(col("event_type"))
  }

  /** SEQUENTIAL A/B monitoring — [[abTest]]'s endpoint evaluated at
    * two LOOKS (interim at day 15, final) against O'Brien–Fleming
    * group-sequential boundaries (2.797 / 1.977 for two equally-spaced
    * looks at two-sided α = .05): the peeking-correct version of the
    * fixed-horizon test, the row that answers "can we stop early"
    * without inflating false positives. Each look recomputes the
    * exact integer conversion counts on its own data prefix (arms by
    * user parity, conversion = view→purchase within 30 minutes — the
    * [[abTest]] metric verbatim), so a look is a genuine re-test, not
    * an extrapolation.
    *
    * All test inputs are exact integers; z evaluates once per look in
    * double; a degenerate pool yields NULL z (never crosses). Two
    * bounded passes over the event prefix — the [[abTest]] plan ×2. */
  def abSequential(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val t0 = ev.agg(min(col("ts")).as("t0"))
    def look(idx: Int, cutoff: Option[Column], bound: Double): DataFrame = {
      val base0 = ev.crossJoin(broadcast(t0))
      val base = cutoff.map(c => base0.filter(col("ts") < c))
        .getOrElse(base0)
      val views = base.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
      val conv = views.join(purchases, "user_id")
        .filter(col("pts") > col("ts") &&
          col("pts") <= col("ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id")).distinct().withColumn("cv", lit(1L))
      val arms = views.select(col("user_id")).distinct()
        .join(conv, Seq("user_id"), "left")
        .groupBy((col("user_id") % 2 === 0).as("is_a"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("cv"), lit(0L))).as("c"))
      val a = arms.filter(col("is_a")).select(col("n").as("n_a"),
        col("c").as("c_a"))
      val b = arms.filter(!col("is_a")).select(col("n").as("n_b"),
        col("c").as("c_b"))
      a.crossJoin(broadcast(b)) // 1-row x 1-row
        .withColumn("p_pool",
          (col("c_a") + col("c_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double"))
        .withColumn("z", when(
          col("p_pool") > 0 && col("p_pool") < 1,
          (col("c_b").cast("double") / col("n_b") -
            col("c_a").cast("double") / col("n_a")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))))
        .select(lit(idx).as("look"), col("n_a"), col("c_a"),
          col("n_b"), col("c_b"), round(col("z"), 4).as("z"),
          lit(bound).as("boundary"),
          coalesce(abs(col("z")) > bound, lit(false)).as("crossed"))
    }
    look(1, Some(col("t0") + expr("INTERVAL 15 DAYS")), 2.797)
      .unionByName(look(2, None, 1.977))
      .orderBy(col("look"))
  }

  /** HOLT double-exponential smoothing (level + trend) per event
    * type — the trend-aware forecaster between [[forecastNaive]]'s
    * last-value and a full seasonal model: α = 0.5, β = 0.3, state
    * initialized (l₁ = y₁, t₁ = 0), folded LEFT-TO-RIGHT over the
    * observed day sequence, 1/2/3-step-ahead forecasts l + h·t. The
    * inherently sequential recursion runs as ONE `aggregate` HOF over
    * each type's collected day series — per-type state is two
    * doubles, the fold order is explicit, and the oracle replays the
    * identical operation sequence day-by-day in a recursive CTE, so
    * IEEE doubles agree bit-for-bit.
    *
    * Scale shape: the daily histogram is the only corpus pass; the
    * collected series is calendar-bounded per type (the documented
    * bound on every collect_list here), and the fold is O(|days|)
    * inside one task per type. */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("array_sort(collect_list(struct(d, CAST(n AS DOUBLE) AS y)))")
          .as("series"))
      .withColumn("state", expr(
        """aggregate(slice(series, 2, size(series) - 1),
             named_struct('l', series[0].y, 't', CAST(0.0 AS DOUBLE)),
             (acc, x) -> named_struct(
               'l', CAST(0.5 AS DOUBLE) * x.y
                 + CAST(0.5 AS DOUBLE) * (acc.l + acc.t),
               't', CAST(0.3 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * x.y
                     + CAST(0.5 AS DOUBLE) * (acc.l + acc.t)) - acc.l)
                 + CAST(0.7 AS DOUBLE) * acc.t))"""))
      .select(col("event_type"), col("n_days"),
        round(col("state.l"), 6).as("level"),
        round(col("state.t"), 6).as("trend"),
        round(col("state.l") + col("state.t"), 6).as("f1"),
        round(col("state.l") + lit(2.0) * col("state.t"), 6).as("f2"),
        round(col("state.l") + lit(3.0) * col("state.t"), 6).as("f3"))
      .orderBy(col("event_type"))
  }

  /** Forecast BACKTEST — the eval row the forecaster family
    * ([[forecastNaive]], [[holtForecast]]) needs before anyone ships
    * either: hold out each type's LAST 5 observed days, fit both
    * models on the rest (naive = last train value; Holt = the
    * [[holtForecast]] fold, α/β unchanged), score h = 1..5 forecasts
    * against the held-out actuals, and report per-type MAE for both
    * plus the winner. The one-split design is the honest minimum —
    * a rolling-origin CV is this row repeated.
    *
    * Determinism: the Holt fold is the same left fold; each absolute
    * error quantizes to DECIMAL(18,6) before the 5-term mean. Scale:
    * the daily histogram is the corpus pass; train/test splitting is
    * a per-type reverse row_number; the fold and scoring are
    * |types|-bounded. */
  def forecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val wDesc = Window.partitionBy(col("event_type"))
      .orderBy(col("d").desc)
    val marked = daily
      .withColumn("rdesc", row_number().over(wDesc))
    val train = marked.filter(col("rdesc") > 5)
    val test = marked.filter(col("rdesc") <= 5)
      .select(col("event_type"), (lit(6) - col("rdesc")).as("h"),
        col("n").cast("double").as("y"))
    val fitted = train.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_train"),
        expr("array_sort(collect_list(struct(d, CAST(n AS DOUBLE) AS y)))")
          .as("series"))
      .withColumn("state", expr(
        """aggregate(slice(series, 2, size(series) - 1),
             named_struct('l', series[0].y, 't', CAST(0.0 AS DOUBLE)),
             (acc, x) -> named_struct(
               'l', CAST(0.5 AS DOUBLE) * x.y
                 + CAST(0.5 AS DOUBLE) * (acc.l + acc.t),
               't', CAST(0.3 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * x.y
                     + CAST(0.5 AS DOUBLE) * (acc.l + acc.t)) - acc.l)
                 + CAST(0.7 AS DOUBLE) * acc.t))"""))
      .select(col("event_type"), col("n_train"),
        col("state.l").as("l"), col("state.t").as("t"),
        expr("series[size(series) - 1].y").as("last_y"))
    test.join(broadcast(fitted), Seq("event_type")) // |types|-row fit
      .withColumn("e_naive",
        abs(col("y") - col("last_y")).cast("decimal(18,6)"))
      .withColumn("e_holt",
        abs(col("y") - (col("l") + col("h").cast("double") * col("t")))
          .cast("decimal(18,6)"))
      .groupBy(col("event_type"))
      .agg(max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        round(sum(col("e_naive")).cast("double") / count(lit(1)), 6)
          .as("naive_mae"),
        round(sum(col("e_holt")).cast("double") / count(lit(1)), 6)
          .as("holt_mae"))
      .withColumn("winner",
        when(col("holt_mae") < col("naive_mae"), "holt")
          .when(col("holt_mae") > col("naive_mae"), "naive")
          .otherwise("tie"))
      .orderBy(col("event_type"))
  }

  /** BURST detection census — days where a type's count exceeds 2× its
    * trailing-7-day mean, grouped into burst RUNS (gaps-and-islands),
    * the volume-anomaly screen that catches what [[cusumChangepoint]]'s
    * slow-drift alarm and [[anomalyStl]]'s seasomal residual both
    * miss: short sharp spikes. The 2× comparison is an exact integer
    * cross-multiplication (n·k > 2·S over the trailing window's count
    * k and sum S — no float threshold), days with no history are
    * never bursts, and the census reports per type: burst days, runs,
    * the longest run, and the peak burst day.
    *
    * One corpus pass to the daily histogram; trailing sums, the
    * run-id islands, and the argmax are calendar-bounded windows. */
  def burstCensus(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val wTrail = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-7, -1)
    val flagged = daily
      .withColumn("k", count(lit(1)).over(wTrail))
      .withColumn("s", coalesce(sum(col("n")).over(wTrail), lit(0L)))
      .withColumn("burst", col("n") * col("k") > lit(2L) * col("s") &&
        col("k") > 0)
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("d"))
    val runs = flagged.filter(col("burst"))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("grp", expr("date_sub(d, rn)"))
    val runCensus = runs.groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_bursts"), max(col("run_len")).as("longest_run"))
    val peak = runs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("n").desc, col("d"))))
      .filter(col("rk") === 1)
      .select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("peak_day"),
        col("n").as("peak_n"))
    val burstDays = flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("burst").cast("long")).as("n_burst_days"))
    burstDays
      .join(runCensus, Seq("event_type"), "left")
      .join(peak, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"), col("n_burst_days"),
        coalesce(col("n_bursts"), lit(0L)).as("n_bursts"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        coalesce(col("peak_day"), lit("")).as("peak_day"),
        coalesce(col("peak_n"), lit(0L)).as("peak_n"))
      .orderBy(col("event_type"))
  }

  /** POISSON bootstrap of the mean purchase value — THE distributed
    * bootstrap (per-row independent Poisson(1) weights approximate
    * multinomial resampling, so no replicate ever needs a global
    * sample): 20 replicates, each row's weight drawn by inverse-CDF
    * lookup on a deterministic md5 coin, replicate means reduced to
    * the point estimate, bootstrap SE, and the min/max replicate band
    * (with 20 replicates the 2.5/97.5 ceil-ranks ARE the extremes —
    * documented rather than interpolated). This is how a 100 TB
    * pipeline attaches uncertainty to any aggregate: one pass, 20
    * weighted sums, no resample shuffle.
    *
    * Exactness: values in cents, weights small ints, so each
    * replicate's numerator/denominator are exact BIGINTs; the means
    * and SE quantize through DECIMAL(18,9) before the 20-term
    * reductions. */
  def poissonBootstrap(spark: SparkSession, dir: String,
                       reps: Int = 20): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    // Poisson(1) inverse CDF on u = md5(rep:event_id) / 2^32
    val u = conv(substring(md5(concat(col("rep").cast("string"), lit(":"),
      col("event_id").cast("string"))), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)
    val w = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238462, 3L)
      .when(u < 0.9963401531726563, 4L)
      .otherwise(5L)
    val repMeans = ev
      .select(col("event_id"), col("cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("w", w)
      .groupBy(col("rep"))
      .agg(sum(col("w") * col("cents")).as("num"),
        sum(col("w")).as("den"))
      .select(col("rep"),
        (col("num").cast("double") / col("den").cast("double"))
          .cast("decimal(18,9)").as("m"))
    val point = ev.agg((sum(col("cents")).cast("double") /
      count(lit(1)).cast("double")).as("sample_mean_c"))
    repMeans.agg(count(lit(1)).as("n_reps"),
        (sum(col("m")).cast("double") / count(lit(1))).as("boot_mean_c"),
        ((sum(col("m") * col("m")).cast("double") -
          sum(col("m")).cast("double") * sum(col("m")).cast("double") /
            count(lit(1))) / (count(lit(1)) - 1)).as("var_c"),
        min(col("m")).cast("double").as("lo_c"),
        max(col("m")).cast("double").as("hi_c"))
      .crossJoin(broadcast(point)) // 1-row sample scalar
      .select(col("n_reps"),
        round(col("sample_mean_c") / 100.0, 4).as("sample_mean"),
        round(col("boot_mean_c") / 100.0, 4).as("boot_mean"),
        round(sqrt(col("var_c")) / 100.0, 4).as("boot_se"),
        round(col("lo_c") / 100.0, 4).as("ci_lo"),
        round(col("hi_c") / 100.0, 4).as("ci_hi"))
  }

  /** Autocorrelation function of the hourly event-count series with the
    * Ljung–Box portmanteau statistic — the "is there structure left"
    * readout a forecasting pipeline ([[holtForecast]],
    * [[seasonalStrength]]) runs on its residual or raw series before
    * trusting a model: r_k for lags 1..24 over the GAP-FILLED hour spine
    * (missing hours are true zeros, not absent rows — skipping them
    * would misalign every lag), plus the cumulative Q(k) =
    * n(n+2)·Σ_{i≤k} r_i²/(n−i).
    *
    * Exactness: with S = Σy and n the spine length, r_k =
    * Σ(n·y_t−S)(n·y_{t−k}−S) / Σ(n·y_t−S)² — numerator and denominator
    * are exact DECIMAL(38,0) integer sums (the n² scale factor cancels),
    * so r_k is one double division; each Ljung–Box term is one double
    * expression over the same exact operands, quantized to
    * DECIMAL(28,12) before the cumulative sum so the running Q is
    * order-independent.
    *
    * Scale shape: the corpus collapses to the hour-grain series in one
    * hash-agg; the spine join, the 24-way lag expansion, and every
    * window run on the HOUR-grain relation (n rows, not event rows) —
    * at 100 TB the series for a year is still only ~9k rows, so
    * everything after the first agg is a single-partition epilogue by
    * design. */
  def autocorrelation(spark: SparkSession, dir: String,
      maxLag: Int = 24): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"))
    val counts = ev.groupBy(col("h")).agg(count(lit(1)).as("y"))
    val span = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = span
      .select(explode(expr(
        "sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val series = spine.join(broadcast(counts), Seq("h"), "left")
      .select(col("h"), coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("t", row_number().over(Window.orderBy(col("h"))))
      .localCheckpoint() // hour-grain series, consumed by 3 branches
    val nS = series.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val dev = series.crossJoin(broadcast(nS)) // 1-row scalars
      .select(col("t"),
        (col("y") * col("n") - col("s")).cast("decimal(38,0)").as("d"),
        col("n"))
    val den = dev.agg(sum(col("d") * col("d")).as("den"),
      max(col("n")).as("n"))
    val lags = spark.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val nums = dev.crossJoin(broadcast(lags)) // 24-row lag axis
      .select(col("lag"), (col("t") - col("lag")).as("tp"), col("d"))
      .join(dev.select(col("t").as("tp"), col("d").as("dp")), Seq("tp"))
      .groupBy(col("lag")).agg(sum(col("d") * col("dp")).as("num"))
    val terms = nums.crossJoin(broadcast(den)) // 1-row denominator
      .withColumn("r", col("num").cast("double") /
        col("den").cast("double"))
      .withColumn("lb_term",
        ((col("r") * col("r")) * col("n") * (col("n") + 2) /
          (col("n") - col("lag"))).cast("decimal(28,12)"))
    terms
      .withColumn("q", sum(col("lb_term")).over(
        Window.orderBy(col("lag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("lag"), round(col("r"), 6).as("acf"),
        round(col("q").cast("double"), 6).as("lb_q"))
      .orderBy(col("lag"))
  }
  /** Discrete power-law tail fit of the events-per-user activity
    * distribution — the Hill/Clauset readout that turns
    * [[powerPareto]]'s "top 1% hold 20%" concentration shares into a
    * fitted exponent: for each candidate cutoff xmin, the Hill MLE
    * alpha = 1 + n_tail / Σ ln(x/xmin) over users with activity ≥ xmin,
    * plus the KS distance between the empirical tail survival and the
    * fitted Pareto survival (x/xmin)^(1−alpha) — the goodness-of-fit
    * number that says WHICH xmin the power law actually starts at.
    *
    * Determinism: the fit runs on the activity HISTOGRAM (value → user
    * count), so Σ ln is Σ count·q(ln(x/xmin)) with each log quantized
    * to DECIMAL(28,12) before the exact weighted sum — engine-ulp log
    * differences cannot reorder the reduction; alpha and each survival
    * are then single double expressions, and the KS max runs over the
    * value-domain-bounded relation.
    *
    * Scale shape: two corpus-grain hash-aggs (user → count → histogram)
    * and everything downstream on the count-DOMAIN histogram crossed
    * with a 3-row xmin axis — the [[powerPareto]] shape with a fit on
    * top. */
  def powerlawFit(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("n_users"))
    val xmins = spark.range(0, 3)
      .select(element_at(typedLit(Seq(2L, 5L, 10L)), col("id").cast("int") + 1)
        .as("xmin"))
    val tail = hist.crossJoin(broadcast(xmins)) // 3-row cutoff axis
      .filter(col("x") >= col("xmin"))
      // 25+12+1 = 38: the product stays inside DecimalType's precision
      // cap, so Spark does NOT shave the scale to its 6-digit minimum
      // (a decimal(28,12) * bigint product would — 2e-6 drift measured)
      .withColumn("lnterm",
        log(col("x").cast("double") / col("xmin").cast("double"))
          .cast("decimal(25,12)") * col("n_users").cast("decimal(12,0)"))
    val fit = tail.groupBy(col("xmin"))
      .agg(sum(col("n_users")).as("n_tail"),
        sum(col("lnterm")).as("sum_ln"))
      .withColumn("alpha",
        lit(1.0) + col("n_tail").cast("double") /
          col("sum_ln").cast("double"))
    val surv = tail
      .withColumn("ge", sum(col("n_users")).over(
        Window.partitionBy(col("xmin")).orderBy(col("x").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(fit.select(col("xmin"), col("n_tail"), col("alpha"))),
        Seq("xmin"))
      .withColumn("d",
        abs(col("ge").cast("double") / col("n_tail").cast("double") -
          pow(col("x").cast("double") / col("xmin").cast("double"),
            lit(1.0) - col("alpha"))))
    val ks = surv.groupBy(col("xmin")).agg(max(col("d")).as("ks"))
    fit.join(broadcast(ks), Seq("xmin"))
      .select(col("xmin"), col("n_tail"),
        round(col("sum_ln").cast("double"), 6).as("sum_ln"),
        round(col("alpha"), 6).as("alpha"),
        round(col("ks"), 6).as("ks"))
      .orderBy(col("xmin"))
  }
  /** Sequential-pattern support census over NON-CONTIGUOUS ordered
    * event-type pairs — the "a, then later b, with anything in between"
    * mining [[pathsTopK]]'s contiguous transitions cannot see: for every
    * ordered type pair (a, b), how many users exhibit a-before-b, the
    * support over all users, and the confidence P(pattern | user has a).
    *
    * The kernel is deliberately NOT a per-user self-join: "some a
    * strictly before some b" holds iff min_ts(a) < max_ts(b) (for
    * a = b that reads "two occurrences at distinct times"), so the
    * corpus collapses
    * to per-(user, type) min/max timestamps in one hash-agg, and the
    * pair expansion runs on the type-DOMAIN-bounded summary (|types|²
    * rows per user, not events²). The same trick at 100 TB: one
    * corpus-grain agg, then joins on user over a ≤|types|-row-per-user
    * relation.
    *
    * Exactness: everything is integer counts and timestamp compares;
    * the two ratios are single double divisions. */
  def seqPatterns(spark: SparkSession, dir: String): DataFrame = {
    val summary = Tables(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("t_min"), max(col("ts")).as("t_max"),
        count(lit(1)).as("n"))
      .localCheckpoint() // (user, type)-grain summary, joined twice
    val nUsers = summary.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val a = summary.select(col("user_id"), col("event_type").as("a"),
      col("t_min"))
    val b = summary.select(col("user_id"), col("event_type").as("b"),
      col("t_max"))
    // min(a) < max(b) IS "some a strictly before some b" — uniformly,
    // including a = b, where it reads "two occurrences at distinct times"
    val pat = a.join(b, Seq("user_id"))
      .filter(col("t_min") < col("t_max"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_users_pattern"))
    val hasA = summary.groupBy(col("event_type").as("a"))
      .agg(count(lit(1)).as("n_users_a"))
    pat.join(broadcast(hasA), Seq("a"))
      .crossJoin(broadcast(nUsers)) // 1-row population scalar
      .select(col("a"), col("b"), col("n_users_pattern"),
        round(col("n_users_pattern").cast("double") /
          col("n_users").cast("double"), 6).as("support"),
        round(col("n_users_pattern").cast("double") /
          col("n_users_a").cast("double"), 6).as("confidence"))
      .orderBy(col("a"), col("b"))
  }
  /** PARALLEL-TRENDS pre-check for [[upliftDid]] — the validity probe
    * every difference-in-differences readout should publish next to
    * its estimate: over the PRE-period only (the first 15 days), each
    * arm's daily mean event value and the exact least-squares slope of
    * that daily series; the slope gap is the parallel-trends
    * violation measure (a DiD whose arms were already diverging is
    * confounded, full stop).
    *
    * Exactness: daily means are exact cent sums divided once and
    * quantized to DECIMAL(18,9); the regression runs on the ≤15-row
    * daily relation with exact integer day indices — slope and
    * intercept are single double expressions over quantized sums.
    *
    * Scale shape: one corpus pass to (arm, day) grain; everything
    * after is day-bounded with 1-row scalars broadcast. */
  def didPretrends(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("user_id"),
        round(col("value") * 100).cast("long").as("c"))
    val t0 = ev.agg(min(col("ts")).as("t0"))
    val pre = ev.crossJoin(broadcast(t0))
      .filter(col("ts") < col("t0") + expr("INTERVAL 15 DAYS"))
      .withColumn("day", datediff(to_date(col("ts")), to_date(col("t0"))))
      .withColumn("arm", when(col("user_id") % 2 === 0, "treat")
        .otherwise("control"))
    val daily = pre.groupBy(col("arm"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      .withColumn("y", (col("sc").cast("double") / col("n"))
        .cast("decimal(18,9)"))
    val fit = daily.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("day").cast("long")).as("sx"),
        sum(col("day").cast("long") * col("day")).as("sxx"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("day")).as("sxy"))
      .withColumn("slope",
        (col("n_days") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
        (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") -
          col("slope") * col("sx").cast("double")) / col("n_days"))
    val gap = fit.agg((max(when(col("arm") === "treat", col("slope"))) -
      max(when(col("arm") === "control", col("slope")))).as("slope_gap"))
    fit.crossJoin(broadcast(gap)) // 1-row gap scalar
      .select(col("arm"), col("n_days"),
        round(col("slope") / 100.0, 6).as("slope"),
        round(col("intercept") / 100.0, 4).as("intercept"),
        round(col("slope_gap") / 100.0, 6).as("slope_gap"))
      .orderBy(col("arm"))
  }
  /** Stratified (exact-matching) ATT estimate — the third leg of the
    * causal family beside [[abTest]] (cross-section) and [[upliftDid]]
    * (time): users stratify into activity deciles (the confounder),
    * and within each stratum the treat−control outcome gap is
    * weighted by min(n_t, n_c) — the matched-pairs weighting that
    * drops strata where one arm has no counterpart instead of
    * extrapolating. Outcome is the user's mean event value; treatment
    * is the deterministic user-parity split.
    *
    * Decile boundaries come from the activity HISTOGRAM's cumulative
    * counts ([[Relational.psiDrift]]'s exact-integer bound logic);
    * outcome sums are exact cents; each stratum's weighted gap
    * quantizes to DECIMAL(28,12) before the ATT sum.
    *
    * Plan: two user-grain aggs (activity, outcome), domain-bounded
    * boundary work, a 10-row stratum census with 1-row scalars
    * broadcast. */
  def attMatching(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        sum(round(col("value") * 100).cast("long")).as("sc"))
      .withColumn("y", (col("sc").cast("double") / col("x"))
        .cast("decimal(18,9)"))
      .withColumn("treat", col("user_id") % 2 === 0)
      .localCheckpoint() // user-grain relation, read by 3 branches
    val hist = users.groupBy(col("x")).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = users.agg(count(lit(1)).as("nu"))
    val bounds = hist.crossJoin(broadcast(tot))
      .select(col("x"), col("cum"),
        explode(sequence(lit(1), lit(9))).as("k"))
      .filter(col("cum") >= expr("CAST(ceil(k * nu / 10.0) AS BIGINT)"))
      .groupBy(col("k")).agg(min(col("x")).as("b"))
    val bucketed = users.crossJoin(broadcast(bounds)) // 9-row boundaries
      .groupBy(col("user_id"), col("treat"), col("y"))
      .agg(sum((col("x") > col("b")).cast("int")).as("nb"))
      .select(col("treat"), col("y"), (col("nb") + 1).as("bucket"))
    val strata = bucketed.groupBy(col("bucket"))
      .agg(sum(col("treat").cast("long")).as("n_t"),
        sum((!col("treat")).cast("long")).as("n_c"),
        sum(when(col("treat"), col("y"))).as("sy_t"),
        sum(when(!col("treat"), col("y"))).as("sy_c"))
      .withColumn("diff",
        when(col("n_t") > 0 && col("n_c") > 0,
          col("sy_t").cast("double") / col("n_t") -
            col("sy_c").cast("double") / col("n_c")))
      .withColumn("w", least(col("n_t"), col("n_c")))
      .withColumn("wd", (col("diff") * col("w")).cast("decimal(28,12)"))
    val att = strata.agg(
      (sum(col("wd")).cast("double") / sum(col("w"))).as("att"))
    strata.crossJoin(broadcast(att)) // 1-row estimate scalar
      .select(col("bucket"), col("n_t"), col("n_c"),
        round(col("diff") / 100.0, 6).as("diff"),
        col("w").as("weight"),
        round(col("att") / 100.0, 6).as("att"))
      .orderBy(col("bucket"))
  }
  /** Periodogram over the gap-filled hourly event-count series — the
    * frequency-domain sibling of [[autocorrelation]]: normalized
    * spectral power at the candidate periods a traffic series actually
    * exhibits (6 h, 12 h, 24 h, 168 h), P(p) = (Σd·cos)² + (Σd·sin)²
    * over Σd², where d is the exact n-scaled centered count (the
    * [[autocorrelation]] integer-centering trick — the n² factor
    * cancels in the ratio). The period with dominant power is the
    * seasonality a forecaster should model first;
    * [[seasonalStrength]] asks the same question in the time domain.
    *
    * Angles depend only on (t−1) mod p, so each trig factor is one
    * double expression over exact integers; every d·cos / d·sin term
    * quantizes to DECIMAL(28,12) before its sum.
    *
    * Scale shape: identical to [[autocorrelation]] — one corpus-grain
    * hash-agg to the hour series, then everything runs on the
    * hour-grain relation crossed with a 4-row period axis. */
  def periodogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"))
    val counts = ev.groupBy(col("h")).agg(count(lit(1)).as("y"))
    val span = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val spine = span.select(explode(expr(
      "sequence(h0, h1, INTERVAL 1 HOUR)")).as("h"))
    val series = spine.join(broadcast(counts), Seq("h"), "left")
      .select(coalesce(col("y"), lit(0L)).as("y"), col("h"))
      .withColumn("t", row_number().over(Window.orderBy(col("h"))))
      .localCheckpoint() // hour-grain series, read by 2 branches
    val nS = series.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val dev = series.crossJoin(broadcast(nS))
      .select(col("t"),
        (col("y") * col("n") - col("s")).cast("decimal(38,0)").as("d"))
    val den = dev.agg(sum(col("d") * col("d")).as("den"))
      .crossJoin(broadcast(nS.select(col("n"))))
    val periods = spark.range(0, 4)
      .select(element_at(typedLit(Seq(6, 12, 24, 168)),
        col("id").cast("int") + 1).as("period"))
    val terms = dev.crossJoin(broadcast(periods)) // 4-row period axis
      .withColumn("ang",
        lit(2.0 * math.Pi) * ((col("t") - 1) % col("period"))
          .cast("double") / col("period"))
      .groupBy(col("period"))
      .agg(sum((col("d").cast("double") * cos(col("ang")))
          .cast("decimal(28,12)")).as("cs"),
        sum((col("d").cast("double") * sin(col("ang")))
          .cast("decimal(28,12)")).as("ss"))
    terms.crossJoin(broadcast(den)) // 1-row denominator + n
      // 2(cs²+ss²)/(n·den): the fraction of series variance carried by
      // the period's cos/sin pair (Parseval normalization)
      .withColumn("power",
        (col("cs").cast("double") * col("cs").cast("double") +
          col("ss").cast("double") * col("ss").cast("double")) * 2.0 /
          (col("n").cast("double") * col("den").cast("double")))
      .select(col("period"), round(col("power"), 6).as("power_frac"))
      .orderBy(col("period"))
  }
  /** Mann–Whitney U rank-sum test between the two user-parity arms on
    * event values — the nonparametric sibling of [[abTest]]'s
    * proportion z and [[didPretrends]]' OLS: U from EXACT MIDRANKS
    * computed on the value-domain histogram (the
    * [[graft.operators.Curation]] exactRank discipline — no
    * corpus-wide sort), with the tie-corrected normal approximation
    * z = (U − n₁n₂/2) / √(n₁n₂/12·((N+1) − Στ³−τ / N(N−1))) — the
    * tie term matters here because cent values repeat heavily.
    *
    * Midranks are exact rationals (2·midrank is an integer:
    * 2·cum − n + 1 per value); every sum is integer or DECIMAL-exact;
    * z is one double expression at the end.
    *
    * Plan: one corpus pass to the (value, arm) histogram; ranks,
    * tie terms, and the test statistic all run on the value-DOMAIN
    * relation. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("user_id") % 2 === 0).as("treat"))
    val hist = ev.groupBy(col("c"))
      .agg(count(lit(1)).as("n"),
        sum(col("treat").cast("long")).as("nt"))
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // 2*midrank = 2*cum - n + 1 (integer): rank sums stay exact
      .withColumn("mr2", col("cum") * 2 - col("n") + 1)
    // Every product that is quadratic-or-cubic in a COUNT is cast to
    // DECIMAL(38,0) BEFORE multiplying (the bollingerBands convention):
    // per-value n^3 overflows LONG once one cent value repeats >2^21
    // times, and nt*mr2 / n1*n2 overflow once N passes ~3e9 — both
    // reachable at the 100 TB design point, and ANSI mode would fail
    // the job rather than wrap.
    val sums = hist.agg(
      sum(col("nt").cast("decimal(38,0)") * col("mr2")).as("r2_t"),
      sum(col("nt")).as("n1"),
      sum(col("n") - col("nt")).as("n2"),
      sum(col("n").cast("decimal(38,0)") * col("n") * col("n") -
        col("n")).as("tie"))
    sums
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("u",
        (col("r2_t").cast("double") / 2.0) -
          (col("n1").cast("decimal(38,0)") * (col("n1") + 1))
            .cast("double") / 2.0)
      .withColumn("var",
        (col("n1").cast("decimal(38,0)") * col("n2")).cast("double") / 12.0 *
          ((col("nn") + 1).cast("double") -
            col("tie").cast("double") /
              (col("nn").cast("double") * (col("nn") - 1)
                .cast("double"))))
      .select(col("n1"), col("n2"), round(col("u"), 2).as("u"),
        round((col("u") -
          (col("n1").cast("decimal(38,0)") * col("n2"))
            .cast("double") / 2.0) /
          sqrt(col("var")), 6).as("z"),
        round(col("tie").cast("double"), 2).as("tie_term"))
  }
  /** A/B power analysis — the DESIGN number that belongs next to
    * [[abTest]]'s readout and [[streamAbMonitor]]'s boundaries: with
    * the observed per-arm event counts and the pooled purchase rate (the
    * [[abTest]] metric — user-grain conversion is degenerate on this
    * corpus, every active user eventually purchases), the minimum
    * detectable effect at α = 0.05 two-sided and 80% power, MDE =
    * (z_{α/2} + z_{β})·√(2p̄(1−p̄)/n̄) with the standard 1.959964 +
    * 0.841621 constants and n̄ the harmonic mean of the arm sizes
    * (the unequal-n correction). An experiment whose expected lift is
    * below this row's mde_rel is not worth launching — the cheapest
    * statistics in the whole battery, and the most often skipped.
    *
    * Exactness: counts are exact; the MDE is one double expression. */
  def abPower(spark: SparkSession, dir: String): DataFrame = {
    val arms = Tables(spark, dir, "events")
      .groupBy((col("user_id") % 2 === 0).as("is_a"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long"))
          .as("n_conv"))
    val a = arms.filter(col("is_a")).select(col("n_events").as("n_a"),
      col("n_conv").as("c_a"))
    val b = arms.filter(!col("is_a")).select(col("n_events").as("n_b"),
      col("n_conv").as("c_b"))
    a.crossJoin(broadcast(b)) // 1-row x 1-row arms
      .withColumn("p_pool", (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double"))
      .withColumn("n_harm",
        lit(2.0) * col("n_a") * col("n_b") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("mde",
        lit(1.959964 + 0.841621) *
          sqrt(lit(2.0) * col("p_pool") * (lit(1.0) - col("p_pool")) /
            col("n_harm")))
      .select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        round(col("p_pool"), 6).as("p_pool"),
        round(col("n_harm"), 2).as("n_harmonic"),
        round(col("mde"), 6).as("mde_abs"),
        round(col("mde") / col("p_pool"), 6).as("mde_rel"))
  }
  /** Two-sample Kolmogorov–Smirnov test between the parity arms on
    * event values — the DISTRIBUTION-level sibling of [[mannWhitney]]
    * (which only sees location): D = max |F̂_A − F̂_B| computed EXACTLY
    * on the cent-value-domain histogram. The sup statistic is found as
    * an integer: |cumA·n_B − cumB·n_A| maximized over the (sorted)
    * value domain, divided by n_A·n_B only at the end, so no float
    * comparison ever picks the argmax. The asymptotic Kolmogorov
    * p-value uses the first three terms of 2Σ(−1)^{k−1}e^{−2k²λ²}
    * (explicit constants — both engines evaluate the same expression).
    *
    * Every COUNT product is cast DECIMAL(38,0) before multiplying
    * ([[mannWhitney]]'s overflow convention — cum·n is quadratic in
    * the corpus size).
    *
    * Plan: one corpus pass to the value-domain histogram, two running
    * sums on that bounded relation, a 1-row reduce. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("user_id") % 2 === 0).as("treat"))
    val hist = ev.groupBy(col("c"))
      .agg(sum(col("treat").cast("long")).as("na"),
        sum((!col("treat")).cast("long")).as("nb"))
      .withColumn("cuma", sum(col("na")).over(Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cumb", sum(col("nb")).over(Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = ev.groupBy(col("treat")).agg(count(lit(1)).as("n"))
    val n1c = tot.filter(col("treat")).select(col("n").as("n1"))
    val n2c = tot.filter(!col("treat")).select(col("n").as("n2"))
    val d = hist.crossJoin(broadcast(n1c)).crossJoin(broadcast(n2c))
      .select(abs(col("cuma").cast("decimal(38,0)") * col("n2") -
        col("cumb").cast("decimal(38,0)") * col("n1")).as("num"),
        col("n1"), col("n2"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("num")).as("dnum"))
    d.withColumn("d_stat", col("dnum").cast("double") /
        (col("n1").cast("decimal(38,0)") * col("n2")).cast("double"))
      .withColumn("lambda", sqrt(
        (col("n1").cast("decimal(38,0)") * col("n2")).cast("double") /
          (col("n1") + col("n2")).cast("double")) * col("d_stat"))
      .withColumn("p_approx",
        lit(2.0) * (exp(lit(-2.0) * col("lambda") * col("lambda")) -
          exp(lit(-8.0) * col("lambda") * col("lambda")) +
          exp(lit(-18.0) * col("lambda") * col("lambda"))))
      .select(col("n1"), col("n2"),
        round(col("d_stat"), 6).as("d_stat"),
        round(col("lambda"), 6).as("lambda"),
        round(least(lit(1.0), greatest(lit(0.0), col("p_approx"))), 6)
          .as("p_approx"))
  }
  /** Chi-square test of independence between event type and the
    * user-parity arm — the CATEGORICAL counterpart of [[abTest]]'s
    * single-metric z: the full event_type × arm contingency table with
    * exact integer observed counts, expected counts from the margins,
    * each cell's (O−E)²/E contribution quantized to DECIMAL(28,12)
    * before the global sum (order-independent), plus the global χ²,
    * degrees of freedom, and Cramér's V effect size on every row.
    *
    * Plan: one corpus pass to the |types|×2 table; margins and the
    * global reduce are 1-row broadcasts on the type-bounded relation. */
  def chisqIndependence(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(sum((col("user_id") % 2 === 0).cast("long")).as("o_t"),
        sum((col("user_id") % 2 =!= 0).cast("long")).as("o_c"))
    val tot = cells.agg(sum(col("o_t")).as("m_t"),
      sum(col("o_c")).as("m_c"), count(lit(1)).as("r"))
    val contrib = cells.crossJoin(broadcast(tot)) // 1-row margins
      .withColumn("n", col("m_t") + col("m_c"))
      .withColumn("row_tot", col("o_t") + col("o_c"))
      .withColumn("e_t",
        (col("row_tot").cast("decimal(38,0)") * col("m_t"))
          .cast("double") / col("n").cast("double"))
      .withColumn("e_c",
        (col("row_tot").cast("decimal(38,0)") * col("m_c"))
          .cast("double") / col("n").cast("double"))
      .withColumn("contrib",
        (((col("o_t") - col("e_t")) * (col("o_t") - col("e_t")) /
          col("e_t")) +
          ((col("o_c") - col("e_c")) * (col("o_c") - col("e_c")) /
            col("e_c"))).cast("decimal(28,12)"))
    val stat = contrib.agg(sum(col("contrib")).as("chi2_sum"),
      max(col("r")).as("r2"), max(col("n")).as("n2"))
    contrib.crossJoin(broadcast(stat)) // 1-row global stat
      .select(col("event_type"), col("o_t"), col("o_c"),
        round(col("e_t"), 4).as("e_t"),
        round(col("contrib").cast("double"), 6).as("contrib"),
        round(col("chi2_sum").cast("double"), 6).as("chi2"),
        (col("r2") - 1).as("df"),
        round(sqrt(col("chi2_sum").cast("double") /
          col("n2").cast("double")), 6).as("cramers_v"))
      .orderBy(col("event_type"))
  }
  /** Benjamini–Hochberg FDR correction across the per-event-type arm
    * balance tests — the MULTIPLE-TESTING control layer every
    * experimentation platform needs above [[abTest]]'s single
    * readout: for each event type, the exact binomial-approximation
    * z = (2·n_t − n)/√n for "does this type split evenly across the
    * parity arms", the two-sided p from the Abramowitz–Stegun 7.1.26
    * erf polynomial (explicit constants — the same double expression
    * in both engines), and the BH step-up adjusted p̂ᵢ =
    * min_{j≥i}(m·p₍ⱼ₎/j) via a running min over the descending-rank
    * window, with the α = 0.05 rejection flag.
    *
    * p quantizes to DECIMAL(28,12) BEFORE ranking so the rank order
    * (and hence the adjustment) is bit-stable cross-engine.
    *
    * Plan: one corpus pass to |types| rows; ranking and the running
    * min are windows on that bounded relation. */
  def fdrBh(spark: SparkSession, dir: String,
            alpha: Double = 0.05): DataFrame = {
    val t = Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("user_id") % 2 === 0).cast("long")).as("n_t"))
      .withColumn("z",
        (lit(2.0) * col("n_t") - col("n")).cast("double") /
          sqrt(col("n").cast("double")))
      .withColumn("az", abs(col("z")) / lit(math.sqrt(2.0)))
    // erf(x) ~ 1 - (a1 t + a2 t^2 + ... + a5 t^5) exp(-x^2),
    // t = 1/(1 + 0.3275911 x)  [Abramowitz–Stegun 7.1.26]
    val tt = lit(1.0) / (lit(1.0) + lit(0.3275911) * col("az"))
    val poly = tt * (lit(0.254829592) +
      tt * (lit(-0.284496736) +
        tt * (lit(1.421413741) +
          tt * (lit(-1.453152027) + tt * lit(1.061405429)))))
    val withP = t.withColumn("p",
      (poly * exp(-col("az") * col("az"))).cast("decimal(28,12)"))
    val m = withP.agg(count(lit(1)).as("m"))
    val ranked = withP.crossJoin(broadcast(m)) // 1-row test count
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p"), col("event_type"))))
      .withColumn("q", col("p").cast("double") *
        col("m").cast("double") / col("rk").cast("double"))
    ranked
      .withColumn("p_adj", least(lit(1.0), min(col("q")).over(
        Window.orderBy(col("rk").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .select(col("event_type"), col("n"), col("n_t"),
        round(col("z"), 6).as("z"),
        round(col("p").cast("double"), 6).as("p_raw"),
        col("rk").cast("long").as("rk"),
        round(col("p_adj"), 6).as("p_adj"),
        (col("p_adj") < alpha).as("rejected"))
      .orderBy(col("rk"))
  }
  /** EXACT Shapley-value channel attribution over pre-purchase
    * touchsets — the fair-division answer to "which channel earns the
    * revenue" that last-touch ([[Temporal]] asof attribution) and
    * first-touch heuristics both bias: each user's coalition is the
    * SET of non-purchase channels they touched before their first
    * purchase; the coalition value v(S) is the mean total purchase
    * revenue (cents) of users with exactly that touchset (0 for
    * unobserved coalitions — documented, not imputed); and each
    * channel's Shapley value φᵢ = Σ_{S∌i} |S|!(n−1−|S|)!/n! ·
    * (v(S∪i) − v(S)) is computed EXACTLY over all 2ⁿ coalitions with
    * the factorial weights as integer n!-ths — no sampling. The
    * channel set is DERIVED from the data (sorted distinct
    * non-purchase event types), never hardcoded: a coalition key
    * containing an unenumerated type would silently drop its cohort's
    * revenue from v(S) and break the efficiency property
    * Σφ = attributable revenue. Exact enumeration is 2ⁿ, so the
    * operator fails LOUDLY past 4 channels rather than go quietly
    * partial.
    *
    * Determinism: v(S) quantizes to DECIMAL(28,12); φ sums integer-
    * weighted decimal terms; the division by n! happens once at the
    * edge.
    *
    * Plan: a bounded channel-census pass (distinct event types — a
    * driver-side merge of ≤|types| values, the same bounded-collect
    * class as the streaming merge tables), two corpus passes
    * (first-purchase timestamps, pre-purchase touch aggregation —
    * both user-keyed shuffles), then EVERYTHING runs on the ≤2ⁿ-row
    * coalition relation and its n·2ⁿ-row channel cross — the
    * enumeration cost is independent of corpus size. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val chNames = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_type")).distinct()
      .orderBy(col("event_type"))
      .collect().map(_.getString(0)).toSeq
    require(chNames.nonEmpty && chNames.length <= 4,
      s"exact Shapley enumeration is 2^n coalitions — supports 1..4 " +
        s"channels, got ${chNames.length}: ${chNames.mkString(",")}")
    val nCh = chNames.length
    val fact = Array(1L, 1L, 2L, 6L, 24L)
    val users = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "purchase", col("ts")))
        .as("fp"),
        sum(when(col("event_type") === "purchase" &&
          col("value").isNotNull,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("rev"))
    val touches = ev.select(col("user_id"), col("event_type"), col("ts"))
      .join(users.select(col("user_id"), col("fp")), Seq("user_id"))
      .filter(col("event_type") =!= "purchase" &&
        (col("fp").isNull || col("ts") < col("fp")))
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_set(col("event_type"))), ",")
        .as("c_key"))
    val coal = users.join(touches, Seq("user_id"), "left")
      .select(coalesce(col("c_key"), lit("")).as("c_key"), col("rev"))
      .groupBy(col("c_key"))
      .agg(count(lit(1)).as("n_users"), sum(col("rev")).as("rev"))
    // all 2^n coalitions of the derived channels, by bitmask; bit i is
    // the i-th channel in sort order, so concat_ws reproduces the
    // array_sort'd c_key exactly
    val masks = spark.range(1L << nCh)
      .select(col("id").cast("int").as("mask"))
    def member(bit: Int, name: String): Column =
      when(col("mask").bitwiseAND(lit(bit)) === bit, lit(name))
    val enum0 = masks
      .withColumn("c_key", concat_ws(",", chNames.zipWithIndex.map {
        case (nm, i) => member(1 << i, nm) }: _*))
      .withColumn("sz", chNames.indices.map(i =>
        shiftright(col("mask"), i).bitwiseAND(lit(1))).reduce(_ + _))
    val v = enum0.join(coal, Seq("c_key"), "left")
      .select(col("mask"), col("sz"),
        coalesce((col("rev").cast("double") /
          col("n_users").cast("double")).cast("decimal(28,12)"),
          lit(0).cast("decimal(28,12)")).as("v"))
    val channels = chNames.zipWithIndex
      .map { case (nm, i) => (nm, 1 << i) }
      .foldLeft(Option.empty[DataFrame]) { case (acc, (nm, bit)) =>
        val row = spark.range(1)
          .select(lit(nm).as("channel"), lit(bit).as("bit"))
        Some(acc.fold(row)(_.unionByName(row)))
      }.get
    val terms = channels
      .crossJoin(broadcast(v.select(col("mask").as("m0"),
        col("sz").as("sz0"), col("v").as("v0")))) // 2^n-row enumeration
      .filter(col("m0").bitwiseAND(col("bit")) === 0)
      .join(broadcast(v.select(col("mask").as("m1"), col("v").as("v1"))),
        col("m1") === col("m0") + col("bit"))
      // |S|!(n-1-|S|)!/n! in n!-ths, from the exact factorial table
      .withColumn("wn", chNames.indices.map(s =>
        when(col("sz0") === s, lit(fact(s) * fact(nCh - 1 - s))))
        .reduce((a, b) => coalesce(a, b)))
      .withColumn("term",
        (col("wn") * (col("v1") - col("v0"))).cast("decimal(28,12)"))
    val phi = terms.groupBy(col("channel"))
      .agg(sum(col("term")).as("phin"))
    val tot = phi.agg(sum(col("phin")).as("phi_sum"))
    phi.crossJoin(broadcast(tot)) // 1-row efficiency total
      .select(col("channel"),
        round(col("phin").cast("double") / fact(nCh).toDouble / 100.0, 4)
          .as("phi_revenue"),
        round(col("phin").cast("double") /
          col("phi_sum").cast("double"), 6).as("share"))
      .orderBy(col("channel"))
  }
  /** DiD EVENT-STUDY coefficients around the calendar midpoint — the
    * dynamic treatment-effect path a modern difference-in-differences
    * reads instead of one pooled estimate ([[didPretrends]] checks the
    * pre-period assumption; the event study shows the WHOLE path):
    * per relative week w ∈ [−4, 3] around the midpoint, the
    * treat−control revenue gap normalized to the week −1 gap (the
    * standard omitted baseline), so pre-period coefficients ≈ 0 is
    * the parallel-trends read and the post path is the effect.
    *
    * Exactness: revenue is exact cents; the relative week is
    * floor((t − mid)/7d) evaluated as the SAME double floor in both
    * engines (integer DIV would truncate negatives toward zero);
    * coefficients are exact cent differences divided once.
    *
    * Plan: one corpus pass to (arm, week) grain (8×2 rows), the 1-row
    * baseline broadcast back. */
  def eventStudy(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
    val span = ev.agg((unix_timestamp(min(col("ts"))) +
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        / 2).as("mid"))
    val wk = ev.crossJoin(broadcast(span)) // 1-row midpoint
      .withColumn("w", floor((unix_timestamp(col("ts")) - col("mid")) /
        lit(604800.0)).cast("long"))
      .filter(col("w").between(-4, 3))
      .withColumn("arm", when(col("user_id") % 2 === 0, "treat")
        .otherwise("control"))
      .groupBy(col("w"))
      .agg(sum(when(col("arm") === "treat",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("t"),
        sum(when(col("arm") === "control",
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("c"))
      .withColumn("gap", col("t") - col("c"))
    val base = wk.filter(col("w") === -1)
      .select(col("gap").as("base_gap"))
    // LEFT join the ≤1-row baseline: if no events land in relative
    // week −1 the weekly path still emits, with NULL coef_vs_wm1 —
    // a monitoring readout must degrade, never silently empty
    wk.join(broadcast(base), lit(true), "left")
      .select(col("w").as("rel_week"),
        round(col("t").cast("double") / 100.0, 2).as("rev_treat"),
        round(col("c").cast("double") / 100.0, 2).as("rev_control"),
        round(col("gap").cast("double") / 100.0, 2).as("gap"),
        round((col("gap") - col("base_gap")).cast("double") / 100.0, 2)
          .as("coef_vs_wm1"),
        (col("w") < 0).as("is_pre"))
      .orderBy(col("rel_week"))
  }

  /** UCB1 arm table over first-touch acquisition channels — the
    * bandit-allocation readout an experimentation platform keeps next
    * to its A/B rows ([[abTest]] decides a finished experiment; UCB
    * decides WHERE THE NEXT USER GOES): arms are the user's FIRST
    * event type, reward is whether the user ever purchases, and each
    * arm's UCB1 index = conversion rate + √(2·ln N / n) — the
    * optimism bonus that forces under-explored arms to be tried. The
    * argmax arm is flagged; a small-n arm outranking a higher-rate
    * arm is the exploration story this table exists to show.
    *
    * Exactness: counts are exact; rate and bonus are one double
    * expression per of-≤|types| rows.
    *
    * Plan: one per-user first-event window (partitioned, rank 1 —
    * map-side group limit), one distinct purchase census, an
    * arm-grain agg with the 1-row total broadcast. */
  def ucbAllocation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val first = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("arm"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .withColumn("cv", lit(1L))
    val arms = first.join(conv, Seq("user_id"), "left")
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("cv"), lit(0L))).as("n_conv"))
    val tot = arms.agg(sum(col("n_users")).as("n_all"))
    val scored = arms.crossJoin(broadcast(tot)) // 1-row population
      .withColumn("rate",
        col("n_conv").cast("double") / col("n_users").cast("double"))
      .withColumn("ucb1", col("rate") +
        sqrt(lit(2.0) * log(col("n_all").cast("double")) /
          col("n_users").cast("double")))
    // deterministic argmax: UCB ties (equal n and conversions) break
    // to the alphabetically first arm — a bandit pulls ONE arm
    val best = scored
      .orderBy(col("ucb1").desc, col("arm")).limit(1)
      .select(col("arm").as("best_arm"))
    scored.crossJoin(broadcast(best)) // 1-row argmax
      .select(col("arm"), col("n_users"), col("n_conv"),
        round(col("rate"), 6).as("conv_rate"),
        round(col("ucb1"), 6).as("ucb1"),
        (col("arm") === col("best_arm")).as("chosen"))
      .orderBy(col("arm"))
  }

  /** ROLLING 7-day correlation between the two parity arms' daily
    * revenue — the co-movement monitor beside [[grangerLeadLag]]'s
    * single lead–lag F (a dashboard wants the correlation's PATH, not
    * one number: a regime where the arms decouple shows as a corr
    * dip): per day, Pearson r over the trailing `width`-day frame
    * from exact frame sums, NULL while either arm is constant in the
    * frame (never NaN).
    *
    * Exactness: revenues are exact cents; second-moment products cast
    * to DECIMAL(38,0) BEFORE multiplying (cent-scale daily sums
    * square past int64); the correlation is one double expression per
    * output row.
    *
    * Plan: one corpus pass to day grain, then ONE day-ordered window
    * partitioning feeds all six frame sums (day grain is
    * calendar-bounded — the sanctioned global-window input). */
  def rollingCorr(spark: SparkSession, dir: String,
      width: Int = 7): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("user_id") % 2 === 0,
        round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("user_id") % 2 =!= 0,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"))
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val w = Window.orderBy(col("d")).rowsBetween(-(width - 1), 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(d38(col("x")) * col("y")).over(w))
      .withColumn("sxx", sum(d38(col("x")) * col("x")).over(w))
      .withColumn("syy", sum(d38(col("y")) * col("y")).over(w))
      .withColumn("cxy", col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") /
          col("n").cast("double"))
      .withColumn("cxx", col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double"))
      .withColumn("cyy", col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") /
          col("n").cast("double"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n").as("n_window"),
        round(col("x").cast("double") / 100.0, 2).as("rev_even"),
        round(col("y").cast("double") / 100.0, 2).as("rev_odd"),
        round(when(col("cxx") > 0 && col("cyy") > 0,
          col("cxy") / sqrt(col("cxx") * col("cyy"))), 6)
          .as("rolling_corr"))
      .orderBy(col("day"))
  }

  /** Granger-style lead–lag test between the two parity arms' daily
    * revenue series — does arm A's yesterday improve the prediction of
    * arm B's today beyond B's own history? The restricted model
    * y_t = a + b·y_{t−1} and the unrestricted
    * y_t = a + b·y_{t−1} + c·x_{t−1} are both solved in CLOSED FORM
    * from centered second-moment sums (2×2 Cramer's rule — no
    * iterative fitting), and the readout is the F statistic
    * (RSS_r − RSS_u)(T − 3)/RSS_u with both regression slopes.
    *
    * All second moments accumulate as DECIMAL(38,0) products of cent
    * values (the [[mannWhitney]] overflow convention); the normal-
    * equation algebra runs on the 1-row sums in doubles.
    *
    * Plan: one corpus pass to day grain, a lag window on the
    * day-bounded relation, a 1-row moment reduce. */
  def grangerLeadLag(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("user_id") % 2 === 0,
        round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("user_id") % 2 =!= 0,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("y"))
    val lagged = daily
      .withColumn("yl", lag(col("y"), 1).over(Window.orderBy(col("d"))))
      .withColumn("xl", lag(col("x"), 1).over(Window.orderBy(col("d"))))
      .filter(col("yl").isNotNull)
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val s = lagged.agg(count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("yl")).as("syl"),
      sum(col("xl")).as("sxl"),
      sum(d38(col("y")) * col("y")).as("syy"),
      sum(d38(col("y")) * col("yl")).as("syyl"),
      sum(d38(col("y")) * col("xl")).as("syxl"),
      sum(d38(col("yl")) * col("yl")).as("syll"),
      sum(d38(col("xl")) * col("xl")).as("sxll"),
      sum(d38(col("yl")) * col("xl")).as("sylxl"))
    s.withColumn("nn", col("n").cast("double"))
      // centered moments (per-observation scale irrelevant to F)
      .withColumn("cyy", col("syy").cast("double") -
        col("sy").cast("double") * col("sy") / col("nn"))
      .withColumn("c01", col("syyl").cast("double") -
        col("sy").cast("double") * col("syl") / col("nn"))
      .withColumn("c02", col("syxl").cast("double") -
        col("sy").cast("double") * col("sxl") / col("nn"))
      .withColumn("c11", col("syll").cast("double") -
        col("syl").cast("double") * col("syl") / col("nn"))
      .withColumn("c22", col("sxll").cast("double") -
        col("sxl").cast("double") * col("sxl") / col("nn"))
      .withColumn("c12", col("sylxl").cast("double") -
        col("syl").cast("double") * col("sxl") / col("nn"))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      // a degenerate Gram determinant (constant/collinear lag series)
      // makes Cramer's rule 0/0 = NaN — leave the slopes NULL instead
      .withColumn("b1", when(col("det") > 0, (col("c01") * col("c22") -
        col("c02") * col("c12")) / col("det")))
      .withColumn("b2", when(col("det") > 0, (col("c02") * col("c11") -
        col("c01") * col("c12")) / col("det")))
      .withColumn("rss_u", col("cyy") - col("b1") * col("c01") -
        col("b2") * col("c02"))
      .withColumn("rss_r", when(col("c11") > 0, col("cyy") -
        col("c01") * col("c01") / col("c11")))
      .select(col("n").as("n_days"),
        round(col("b1"), 6).as("beta_self"),
        round(col("b2"), 6).as("beta_cross"),
        round(col("rss_r") / 1e8, 4).as("rss_restricted"),
        round(col("rss_u") / 1e8, 4).as("rss_unrestricted"),
        round((col("rss_r") - col("rss_u")) * (col("n") - 3) /
          col("rss_u"), 6).as("f_stat"))
  }
  /** Qini curve for a activity-scored revenue-uplift ranking — the
    * evaluation an uplift-modeling pipeline runs on top of
    * [[abTest]]/[[upliftDid]]: users are ranked by a deterministic
    * "model score" (first-half event count, ties by user_id), cut into
    * five exact ceil-rank quintiles, and per cumulative quintile the
    * incremental revenue Qini(k) = R_t(k) − R_c(k)·N_t(k)/N_c(k)
    * (treated second-half revenue minus the control revenue scaled to
    * the treated exposure) against the random-targeting diagonal.
    * A positive gap at low k means the score finds users whose
    * revenue responds.
    *
    * Exactness: revenues are exact cent BIGINTs; bucket cuts are
    * integer ceil-ranks; only the final scaled differences are
    * doubles.
    *
    * Plan: one corpus pass to user grain, then the user-grain rank by
    * (score desc, user_id) runs as a [[Ranks.exactRank]] bucketed
    * two-pass scan on the NEGATED score (B-way parallel — never the
    * user-sized single-partition ROW_NUMBER the naive formulation
    * plans, the round-12 scale defect), a join back on user, then
    * 5-row cumulative algebra. */
  def qiniCurve(spark: SparkSession, dir: String,
      buckets: Int = 5): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val span = ev.agg((unix_timestamp(min(col("ts"))) +
      (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
        / 2).as("mid"))
    val scored = ev.crossJoin(broadcast(span)) // 1-row midpoint
      .groupBy(col("user_id"))
      .agg(sum((unix_timestamp(col("ts")) < col("mid")).cast("long"))
        .as("score"),
        sum(when(unix_timestamp(col("ts")) >= col("mid") &&
          col("event_type") === "purchase" && col("value").isNotNull,
          round(col("value") * 100).cast("long")).otherwise(0L))
          .as("rev"))
      .withColumn("treat", col("user_id") % 2 === 0)
      // user-grain, 4 narrow columns — read by the exactRank passes
      // and the join back; the cut stops the corpus agg re-running
      .localCheckpoint()
    val n = scored.agg(count(lit(1)).as("n_all"))
    // rank by (score desc, user_id asc) == ascending (−score, user_id)
    val rk = Ranks.exactRank(spark,
      scored.select(col("user_id"), (-col("score")).as("neg_score")),
      "neg_score", "user_id", "rk")
    val ranked = scored.join(rk, Seq("user_id"))
      .crossJoin(broadcast(n)) // 1-row population
      // exact ceil-rank quintile: integer DIV, never float division
      .withColumn("bucket",
        expr(s"CAST((rk * $buckets + n_all - 1) DIV n_all AS BIGINT)"))
    val byB = ranked.groupBy(col("bucket"))
      .agg(sum(col("treat").cast("long")).as("n_t"),
        sum((!col("treat")).cast("long")).as("n_c"),
        sum(when(col("treat"), col("rev")).otherwise(0L)).as("r_t"),
        sum(when(!col("treat"), col("rev")).otherwise(0L)).as("r_c"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byB
      .withColumn("cn_t", sum(col("n_t")).over(w))
      .withColumn("cn_c", sum(col("n_c")).over(w))
      .withColumn("cr_t", sum(col("r_t")).over(w))
      .withColumn("cr_c", sum(col("r_c")).over(w))
      .withColumn("qini", (col("cr_t").cast("double") -
        col("cr_c").cast("double") * col("cn_t") / col("cn_c")) / 100.0)
      .withColumn("qini_last", last(col("qini")).over(
        Window.orderBy(col("bucket")).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bucket"), col("cn_t"), col("cn_c"),
        round(col("cr_t").cast("double") / 100.0, 2).as("rev_treat"),
        round(col("cr_c").cast("double") / 100.0, 2).as("rev_ctrl"),
        round(col("qini"), 4).as("qini"),
        round(col("qini_last") * col("bucket") / buckets, 4)
          .as("qini_random"))
      .orderBy(col("bucket"))
  }
  /** Expected steps to ABSORPTION (first purchase) per starting event
    * type — the hitting-time readout over the user-journey Markov
    * chain [[eventTransitions]] estimates: with purchase absorbing and
    * P the observed next-event transition probabilities, the expected
    * step count h solves h = 1 + Q·h; here h is computed by a FIXED
    * 12 Jacobi iterations unrolled into the plan (both engines run the
    * same finite recurrence — no convergence test, so the result is
    * deterministic and the oracle mirrors it term for term). A state's
    * h₁₂ underestimates the true h by at most P(not absorbed in 12
    * steps)·tail — reported as the design choice, not hidden.
    *
    * Each p·h product quantizes to DECIMAL(28,12) before the per-state
    * sum, so iteration sums are order-independent.
    *
    * Plan: one corpus pass to the (cur, next) transition census via a
    * per-user lead window; all 12 iterations run on the ≤5-state
    * relation — iteration cost is independent of corpus size. */
  def absorptionTime(spark: SparkSession, dir: String,
      iters: Int = 12): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
    val trans = ev
      .withColumn("nxt", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("nxt").isNotNull &&
        col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val tot = trans.groupBy(col("cur")).agg(sum(col("c")).as("n_out"))
    val p = trans.join(tot, Seq("cur"))
      .withColumn("p", col("c").cast("double") /
        col("n_out").cast("double"))
    val qn = p.filter(col("nxt") =!= "purchase")
      .select(col("cur"), col("nxt"), col("p"))
    val states = tot.select(col("cur"))
    var h = states.withColumn("h", lit(0.0))
    for (_ <- 1 to iters) {
      val contrib = qn
        .join(h.select(col("cur").as("nxt"), col("h")), Seq("nxt"))
        .withColumn("term", (col("p") * col("h")).cast("decimal(28,12)"))
        .groupBy(col("cur")).agg(sum(col("term")).as("s"))
      h = states.join(contrib, Seq("cur"), "left")
        .select(col("cur"),
          (lit(1.0) + coalesce(col("s").cast("double"), lit(0.0)))
            .as("h"))
    }
    val pAbs = p.filter(col("nxt") === "purchase")
      .select(col("cur"), col("p").as("p_purchase"))
    h.join(tot, Seq("cur")).join(pAbs, Seq("cur"), "left")
      .select(col("cur").as("state"), col("n_out"),
        round(coalesce(col("p_purchase"), lit(0.0)), 6)
          .as("p_purchase_1step"),
        round(col("h"), 6).as("expected_steps_12"))
      .orderBy(col("state"))
  }
  /** Semi-structured aggregation through Spark 4's VARIANT type — the
    * shredded-JSON path a 100 TB event pipeline uses instead of
    * per-row string parsing ([[jsonExtract]] is the string-path
    * sibling): `parse_json` materializes the open-schema VARIANT once,
    * `variant_get` extracts a typed field (codegen-friendly, no
    * re-parse per field), and `try_variant_get` probes an absent path
    * without throwing. Reported per event type: present/missing field
    * counts and the exact integer stats of the extracted field.
    *
    * All extracted values are integers; no float arithmetic.
    *
    * Plan: one corpus pass; VARIANT parse + two typed gets are narrow
    * map work; the agg is a |types|-row hash agg. */
  def variantAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      // bind the VARIANT once; CollapseProject keeps a multi-referenced
      // non-cheap alias in its own projection, so the JSON parses once
      // per row no matter how many fields are extracted below
      .select(col("event_type"), expr("parse_json(props)").as("vj"))
      .select(col("event_type"),
        expr("variant_get(vj, '$.k', 'long')").as("k"),
        expr("try_variant_get(vj, '$.missing', 'long')")
          .as("miss"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(col("k")).as("n_k_present"),
        count(col("miss")).as("n_missing_path"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))
  /** GROWTH ACCOUNTING of weekly purchase revenue — the
    * new/retained/resurrected/churned decomposition every growth team
    * reads instead of the bare [[wowGrowth]] total: a user's week-w
    * revenue is NEW if this is their first active week, RETAINED if
    * they were active in w−1, RESURRECTED if active before but not in
    * w−1; CHURNED is the (negative) CALENDAR-week-(w−7d) revenue of
    * users absent in w — attributed by a join on wk − 7 days, never a
    * lag over observed weeks (a globally-silent gap week must not
    * shift churn onto the wrong successor). The identity
    * rev_w − rev_{w−1} = new + resurrected − churned + (retained_w −
    * retained-users'-prior-revenue) makes the bare growth number
    * explainable — which component moved.
    *
    * Exactness: revenue is exact cents; week indexing is
    * `date_trunc`; all classification is integer set logic via lag
    * windows per user.
    *
    * Plan: one corpus pass to (user, week) grain, two lag windows at
    * that grain, a week-grain census. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(col("user_id"),
        date_trunc("week", col("ts")).as("wk"))
      .agg(sum(round(col("value") * 100).cast("long")).as("rev"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val flagged = uw
      .withColumn("prev_wk", lag(col("wk"), 1).over(w))
      .withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .withColumn("nxt_wk", lead(col("wk"), 1).over(w))
      .withColumn("is_new", col("prev_wk").isNull)
      .withColumn("is_retained",
        col("prev_wk") === col("wk") - expr("INTERVAL 7 DAYS"))
      .withColumn("is_resurrected",
        col("prev_wk").isNotNull &&
          col("prev_wk") < col("wk") - expr("INTERVAL 7 DAYS"))
      // this user's revenue CHURNS out of week wk+1 if they skip it
      .withColumn("churns_next",
        col("nxt_wk").isNull ||
          col("nxt_wk") > col("wk") + expr("INTERVAL 7 DAYS"))
    val byWeek = flagged.groupBy(col("wk"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("rev")).as("rev"),
        sum(when(col("is_new"), col("rev")).otherwise(0L)).as("new_rev"),
        sum(when(col("is_retained"), col("rev")).otherwise(0L))
          .as("retained_rev"),
        sum(when(col("is_resurrected"), col("rev")).otherwise(0L))
          .as("resurrected_rev"),
        sum(when(col("churns_next"), col("rev")).otherwise(0L))
          .as("churning_rev"))
    // churn joins on the CALENDAR week (wk − 7 days), not lag over
    // observed weeks — a globally-silent gap week must not shift the
    // churn mass onto the wrong successor. Mass churning into a week
    // with zero global purchases (or past the horizon) is dropped,
    // the honest right-censoring, and the week-grain self-join reuses
    // the byWeek exchange.
    val prior = byWeek.select(
      (col("wk") + expr("INTERVAL 7 DAYS")).as("wk"),
      col("churning_rev").as("churned_raw"))
    byWeek.join(prior, Seq("wk"), "left")
      .withColumn("churned_rev", coalesce(col("churned_raw"), lit(0L)))
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("n_users"),
        round(col("rev").cast("double") / 100.0, 2).as("revenue"),
        round(col("new_rev").cast("double") / 100.0, 2).as("new_rev"),
        round(col("retained_rev").cast("double") / 100.0, 2)
          .as("retained_rev"),
        round(col("resurrected_rev").cast("double") / 100.0, 2)
          .as("resurrected_rev"),
        round(col("churned_rev").cast("double") / 100.0, 2)
          .as("churned_prior_rev"))
      .orderBy(col("week"))
  }
}
