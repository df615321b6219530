package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's whole `main()` (main.py:132-192) as ONE DataFrame
  * program:
  *
  * {{{
  * read(csv) -> project+rename(P1/P2) -> normalize(F1/F2) ->
  *   windowFilter(F5) -> keyFilter(F6) -> leftAnti(existing)(J1) -> sink(K1)
  * }}}
  *
  * Error semantics preserved: a missing/empty source yields an empty run
  * (no exception — main.py:136-138); zero new rows skips the write
  * (main.py:189-190; handled inside Sink).
  */
object Pipeline {

  /** Compute the [from, to] strings for a sliding window ending "now" in
    * Asia/Ho_Chi_Minh wall-clock (F4, `get_vn_time_range`, main.py:107-112).
    * VN has no DST so the reference's fixed +7h equals the zone offset. */
  def vnTimeRange(spark: SparkSession, hours: Int = 2): (String, String) = {
    val row = spark.range(1).select(
      date_format(from_utc_timestamp(current_timestamp(), "Asia/Ho_Chi_Minh")
        - expr(s"INTERVAL $hours HOURS"), "yyyy-MM-dd HH:mm:ss"),
      date_format(from_utc_timestamp(current_timestamp(), "Asia/Ho_Chi_Minh"),
        "yyyy-MM-dd HH:mm:ss")
    ).head()
    (row.getString(0), row.getString(1))
  }

  /** Batch -> new-rows relation (everything before the sink). */
  def newRows(batch: DataFrame, existing: DataFrame,
              key: String, timeCol: String,
              from: String, to: String): DataFrame = {
    val windowed = batch.filter(Dedup.windowFilter(col(timeCol), from, to))
    val existingKeys = existing
      .filter(Dedup.windowFilter(col(timeCol), from, to))
      .select(key)
    Dedup.newRows(windowed, existingKeys, key)
  }

  /** Full run against CSV source + parquet sink (offline-harness form of
    * main()). Returns number of rows appended. */
  def run(spark: SparkSession, csvPath: String, sinkPath: String,
          existing: DataFrame, from: String, to: String): Long = {
    val batch = Ingest.ingestCsv(spark, csvPath)
    val fresh = newRows(batch, existing, graft.schema.AppsflyerSchema.keyCol,
      "install_time", from, to)
    // count once, reuse for the empty-skip decision and the return value
    val n = fresh.count()
    if (n > 0) fresh.write.mode("append").parquet(sinkPath)
    n
  }
}
