package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming queries surfaced to the t2 oracle gate: each runs a REAL
  * Structured Streaming query (file source -> stateful op -> memory sink,
  * Trigger.AvailableNow) to completion and returns the final result, which
  * must equal the batch/DuckDB answer — the "streaming matches batch"
  * contract. Stateful specifics (watermark eviction, session timeouts,
  * foreachBatch sinks) are covered in StreamingSpec, where arrival order
  * is controlled via MemoryStream.
  */
object StreamingAnalytics {

  /** Streaming tumbling-window aggregation; same expression tree and same
    * oracle as the batch `tumbling_hourly`. */
  def streamTumblingHourly(spark: SparkSession, dir: String): DataFrame = {
    val in = StreamingOps.eventsStream(spark, dir)
      .filter(col("ts") < lit("2024-01-08 00:00:00").cast("timestamp"))
    StreamingOps.runAvailableNow(
      StreamingOps.tumblingCounts(in, "ts", "1 hour", Seq("event_type")),
      mode = "complete")
      .orderBy(col("hour_start"), col("event_type"))
  }

  /** Streaming sliding-window aggregation (2-hour windows, 1-hour slide);
    * same expression tree and same oracle as the batch
    * `sliding_two_hour`. */
  def streamSlidingTwoHour(spark: SparkSession, dir: String): DataFrame = {
    val in = StreamingOps.eventsStream(spark, dir)
      .filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("win_end"),
        col("n"))
    StreamingOps.runAvailableNow(in, mode = "complete").orderBy(col("win_start"))
  }

  /** Streaming distinct over (user_id, event_type) — stateful
    * dropDuplicates through a real streaming plan; oracle = batch
    * SELECT DISTINCT. */
  def streamDistinctPairs(spark: SparkSession, dir: String): DataFrame = {
    val in = StreamingOps.eventsStream(spark, dir)
    StreamingOps.runAvailableNow(
      StreamingOps.streamingDistinct(in, Seq("user_id", "event_type")),
      mode = "append")
      .orderBy(col("user_id"), col("event_type"))
  }
}
