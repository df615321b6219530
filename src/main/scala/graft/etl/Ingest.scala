package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.AppsflyerSchema
import graft.functions.Normalize

/** Source scan + projection + normalization — the ingest half of the
  * reference pipeline (S1/S2/S3 + P1/P2 + F1/F2; main.py:114-166) as one
  * declarative DataFrame program.
  *
  * Offline/source mapping: the reference pulls one CSV over HTTPS
  * (main.py:114-130); here the same relation arrives as CSV files on disk
  * (or any DataFrame with the raw Title-Case headers — see [[normalize]]).
  * Spark's CSV reader natively handles the header row, RFC-4180 quoting and
  * the UTF-8 BOM that main.py:128 strips by hand.
  *
  * Scale notes (100 TB posture): the scan parallelizes per file-split; the
  * projection prunes the 48 unmapped `additional_fields` columns before
  * anything else touches them; normalization is pure codegen'd expressions
  * (single WholeStageCodegen stage, no shuffle, no driver materialization).
  */
object Ingest {

  /** Faithful S1: the DSv2 "appsflyer" source (HTTP GET or file: URL,
    * non-2xx/IO failure = empty relation; see
    * [[graft.sources.AppsflyerDataSource]]). */
  def readAppsflyer(spark: SparkSession, url: String,
                    token: Option[String] = None): DataFrame = {
    val r = spark.read.format("appsflyer").option("url", url)
    token.foreach(t => r.option("token", t))
    r.load()
  }

  /** Read a raw AppsFlyer-shaped CSV (header row, all-string cells). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      // every cell is a string; the sentinel-null + datetime semantics are
      // applied explicitly in normalize() so they stay visible in the plan
      .option("inferSchema", false)
      .csv(path)

  /** P1 projection+rename then F1/F2 normalization.
    *
    * Keeps exactly the 49 mapped columns (anything else in the input is
    * dropped, mirroring main.py:160-165), renames Title-Case -> snake_case,
    * orders them with `campaignid` after `media_source` (bug-fixed P2), and
    * applies `parseAfTimestamp` to the 7 datetime columns and
    * `nullIfSentinels` to the rest.
    *
    * Missing input columns (the API can omit fields) surface as NULL
    * columns, matching `row.get(af_col)` -> None in the reference.
    */
  def normalize(raw: DataFrame): DataFrame = {
    val present = raw.columns.toSet
    val cols = AppsflyerSchema.csvColumns.zip(AppsflyerSchema.sinkColumns)
      .map { case (csvName, sinkName) =>
        val src =
          if (present.contains(csvName)) col(csvName)
          else lit(null).cast("string")
        val normalized =
          if (AppsflyerSchema.datetimeCols.contains(sinkName))
            Normalize.parseAfTimestamp(src)
          else Normalize.nullIfSentinels(src)
        normalized.as(sinkName)
      }
    raw.select(cols: _*)
  }

  def ingestCsv(spark: SparkSession, path: String): DataFrame =
    normalize(readCsv(spark, path))
}
