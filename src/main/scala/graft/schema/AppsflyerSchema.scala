package graft.schema

import org.apache.spark.sql.types._

/** The reference's data model: a flat 49-column install-events table.
  *
  * Source of truth: `APPSFLYER_TO_CH` (reference main.py:19-69) maps the
  * AppsFlyer Raw Data Export v5 CSV headers (Title Case) to snake_case sink
  * column names; `DATETIME_CH_COLS` (main.py:81-85) marks the 7 timestamp
  * columns. Everything else is a nullable string (main.py:165).
  *
  * Column order: the reference re-orders `campaignid` to sit directly after
  * `media_source` (main.py:144-154) but its `reorder_cols` has a latent bug
  * that re-includes the 6 columns before `media_source` twice (55-element
  * list). We implement the clearly *intended* order — duplicate-free, with
  * `campaignid` after `media_source` — and document the deviation here and
  * in `AppsflyerSchemaSpec`.
  */
object AppsflyerSchema {

  /** (csvHeader, sinkColumn) pairs in the reference's declaration order
    * (main.py:19-69). */
  val mapping: Seq[(String, String)] = Seq(
    "Attributed Touch Type" -> "attributed_touch_type",
    "Attributed Touch Time" -> "attributed_touch_time",
    "Install Time" -> "install_time",
    "Event Time" -> "event_time",
    "Event Name" -> "event_name",
    "Partner" -> "partner",
    "Media Source" -> "media_source",
    "Campaign" -> "campaign",
    "Adset" -> "adset",
    "Ad" -> "ad",
    "Ad Type" -> "ad_type",
    "Contributor 1 Touch Type" -> "contributor_1_touch_type",
    "Contributor 1 Touch Time" -> "contributor_1_touch_time",
    "Contributor 1 Partner" -> "contributor_1_partner",
    "Contributor 1 Match Type" -> "contributor_1_match_type",
    "Contributor 1 Media Source" -> "contributor_1_media_source",
    "Contributor 1 Campaign" -> "contributor_1_campaign",
    "Contributor 1 Engagement Type" -> "contributor_1_engagement_type",
    "Contributor 2 Touch Type" -> "contributor_2_touch_type",
    "Contributor 2 Touch Time" -> "contributor_2_touch_time",
    "Contributor 2 Partner" -> "contributor_2_partner",
    "Contributor 2 Media Source" -> "contributor_2_media_source",
    "Contributor 2 Campaign" -> "contributor_2_campaign",
    "Contributor 2 Match Type" -> "contributor_2_match_type",
    "Contributor 2 Engagement Type" -> "contributor_2_engagement_type",
    "Contributor 3 Touch Type" -> "contributor_3_touch_type",
    "Contributor 3 Touch Time" -> "contributor_3_touch_time",
    "Contributor 3 Partner" -> "contributor_3_partner",
    "Contributor 3 Media Source" -> "contributor_3_media_source",
    "Contributor 3 Campaign" -> "contributor_3_campaign",
    "Contributor 3 Match Type" -> "contributor_3_match_type",
    "Contributor 3 Engagement Type" -> "contributor_3_engagement_type",
    "City" -> "city",
    "IP" -> "ip",
    "AppsFlyer ID" -> "appsflyer_id",
    "Customer User ID" -> "customer_user_id",
    "IDFA" -> "idfa",
    "IDFV" -> "idfv",
    "Device Category" -> "device_category",
    "Platform" -> "platform",
    "OS Version" -> "os_version",
    "Bundle ID" -> "bundle_id",
    "Is Retargeting" -> "is_retargeting",
    "Attribution Lookback" -> "attribution_lookback",
    "Match Type" -> "match_type",
    "Device Download Time" -> "device_download_time",
    "Device Model" -> "device_model",
    "Engagement Type" -> "engagement_type",
    "Campaign ID" -> "campaignid"
  )

  /** The 7 timestamp columns (reference `DATETIME_CH_COLS`, main.py:81-85). */
  val datetimeCols: Set[String] = Set(
    "attributed_touch_time", "install_time", "event_time",
    "contributor_1_touch_time", "contributor_2_touch_time",
    "contributor_3_touch_time", "device_download_time"
  )

  /** The dedup key (main.py:168-181). */
  val keyCol = "appsflyer_id"

  /** Sink column order with `campaignid` placed directly after
    * `media_source` — the intent of reference `reorder_cols`
    * (main.py:144-154), minus its duplicate-columns bug. */
  val sinkColumns: Seq[String] = {
    val base = mapping.map(_._2).filterNot(_ == "campaignid")
    val idx = base.indexOf("media_source")
    (base.take(idx + 1) :+ "campaignid") ++ base.drop(idx + 1)
  }

  /** CSV header order matching [[sinkColumns]]. */
  val csvColumns: Seq[String] = {
    val byCh = mapping.map(_.swap).toMap
    sinkColumns.map(byCh)
  }

  /** Sink schema: timestamps for the 7 datetime columns, nullable strings
    * for everything else (main.py:165, :81-85). */
  val sinkSchema: StructType = StructType(sinkColumns.map { c =>
    val t = if (datetimeCols.contains(c)) TimestampType else StringType
    StructField(c, t, nullable = true)
  })

  /** Raw CSV-side schema: everything is a string (csv.DictReader semantics,
    * main.py:126-129). Extra columns beyond these may arrive (the reference
    * requests 48 `additional_fields`, main.py:70-79) and are dropped by the
    * projection — schema is therefore NOT enforced at read time. */
  val csvSchema: StructType = StructType(csvColumns.map { c =>
    StructField(c, StringType, nullable = true)
  })
}
