package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming form of the reference's incremental-ingest loop
  * (SURVEY.md §2 "Streaming" + §7.5): the reference re-runs a 2-hour
  * sliding window and anti-joins against the sink (main.py:107-112,
  * 168-181) — a hand-rolled at-least-once-then-dedup micro-batch. Its
  * idiomatic Spark image is
  * `readStream -> withWatermark -> dropDuplicatesWithinWatermark ->
  * writeStream.foreachBatch(append)`, which these ops compose.
  *
  * Scale notes: dedup state is a per-key store bounded by the watermark
  * delay (the reference instead re-reads the sink window every run);
  * every transform here is the same codegen'd expression tree the batch
  * path uses, so the two paths cannot drift.
  */
object StreamingOps {

  /** The `events` table as a file-streaming source (same nanos-timestamp
    * normalization as [[graft.Tables]]; file sources need an explicit
    * schema, taken from a zero-cost batch schema probe). */
  def eventsStream(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // events.parquet is a single FILE: FileStreamSource force-injects
    // basePath = path for non-glob paths, which then fails the "basePath
    // must be a directory" check. A glob path suppresses that injection,
    // letting the explicit directory basePath stand.
    val reader = spark.readStream.schema(schema).option("basePath", dir)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(s"$dir/events.*")
      .withColumn("ts", graft.Tables.normalizeTs(schema))
  }

  /** The `documents` table as a file-streaming source (same glob trick as
    * [[eventsStream]]: documents.parquet is a single file, and a glob
    * path suppresses FileStreamSource's basePath injection). */
  def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).option("basePath", dir)
      .parquet(s"$dir/documents.*")
  }

  /** F4+J1, idiomatic: bounded-state streaming key-dedup. An id is dropped
    * if already seen within the watermark horizon — exactly the reference's
    * "window re-scan + anti-join" idempotence guarantee, without re-reading
    * the sink. */
  def watermarkedDedup(stream: DataFrame, idCol: String, tsCol: String,
                       delay: String = "2 hours"): DataFrame =
    stream.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCol)

  /** Unbounded-state streaming distinct (harness-scale; production uses
    * [[watermarkedDedup]] so state stays bounded). */
  def streamingDistinct(stream: DataFrame, cols: Seq[String]): DataFrame =
    stream.select(cols.map(col): _*).dropDuplicates(cols)

  /** Tumbling-window streaming aggregation — identical expression tree to
    * the batch [[graft.operators.EventAnalytics.tumblingHourly]]. */
  def tumblingCounts(stream: DataFrame, tsCol: String, width: String,
                     dims: Seq[String]): DataFrame =
    stream
      .groupBy(window(col(tsCol), width) +: dims.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(Seq(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start")) ++ dims.map(col) ++ Seq(col("n"), col("sum_value")): _*)

  /** Stream-stream interval join (attribution while both sides are live):
    * each purchase joins the same user's views from the preceding
    * `joinWindow`. Both sides are watermarked so the view-side state
    * buffer is bounded — Spark drops buffered views once the purchase-side
    * watermark passes `view.ts + joinWindow`. The streaming image of
    * [[graft.operators.EventAnalytics.asofAttribution]]'s windowed batch
    * form. */
  def streamStreamAttribution(views: DataFrame, purchases: DataFrame,
                              watermarkDelay: String = "1 hour",
                              joinWindow: String = "30 minutes"): DataFrame = {
    val v = views.select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermarkDelay)
    p.join(v,
      col("p_user") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $joinWindow"),
      "inner")
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("view_ts"))
  }

  /** K1 as a streaming sink: per micro-batch parquet append, skipping
    * empty batches (the reference skips the INSERT when 0 new rows,
    * main.py:183,189-190). Batched, idempotent-per-batch via the
    * checkpoint — the JDBC/ClickHouse form swaps the writer line only. */
  def incrementalParquetSink(stream: DataFrame, path: String,
                             checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) batch.write.mode("append").parquet(path)
      }
      .start()

  /** Run a streaming relation to completion on currently-available input
    * (Trigger.AvailableNow) through an in-memory sink and return the final
    * result as a batch DataFrame. Harness/test utility: lets the t2 oracle
    * gate exercise real streaming execution; a production job would leave
    * the query running instead. */
  def runAvailableNow(stream: DataFrame, mode: String): DataFrame = {
    val spark = stream.sparkSession
    val name = "graft_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    // Stateful operators allocate one state-store provider PER shuffle
    // partition at query start (stream-stream joins allocate FOUR per
    // partition); results are partition-count-independent, so a
    // harness-scale run shrinks that fixed cost (32 -> 2 stores) rather
    // than paying cluster-sized parallelism for one file of input.
    // The conf is restored right after — it binds at query START, and a
    // restarted production query would pick its own setting from its
    // checkpoint anyway.
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val q =
      try {
        spark.conf.set(key, math.min(
          sys.env.getOrElse("GRAFT_STREAM_PARTITIONS", "2").toInt,
          prev.toInt).toString)
        stream.writeStream
          .format("memory").queryName(name)
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .start()
      } finally spark.conf.set(key, prev)
    q.awaitTermination()
    spark.table(name)
  }
}
