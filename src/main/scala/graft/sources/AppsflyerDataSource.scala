package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.schema.AppsflyerSchema

/** DataSource V2 image of the reference's HTTP source scan (S1/S2/S3,
  * main.py:114-130): `spark.read.format("appsflyer")` yields the raw
  * install-events relation exactly as the API returns it — header-named
  * all-string columns, one input partition (the API returns a single CSV
  * body), any fetch failure = EMPTY relation rather than an error
  * (main.py:123-124 logs and returns []).
  *
  * Options:
  *  - `url`: where the CSV body lives. `file:` URLs serve offline tests
  *    and fixtures; `http(s):` performs the GET with the reference's
  *    headers. If absent, the AppsFlyer v5 export URL is built from
  *    `app_id`/`from`/`to`/`timezone` (main.py:115-121).
  *  - `token`: raw authorization header value (main.py:119).
  *
  * Projection is pushed into the source (`SupportsPushDownRequiredColumns`)
  * — the CSV is still fetched whole (the API offers no column subset), but
  * only requested columns are parsed into rows, mirroring how the
  * reference's mapping loop reads only mapped columns (main.py:160-165).
  * Normalization (F1/F2) stays downstream in [[graft.etl.Ingest.normalize]]
  * so the plan keeps it visible to Catalyst.
  */
class AppsflyerDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "appsflyer"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AppsflyerSchema.csvSchema

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AppsflyerTable(schema, properties.asScala.toMap)
}

private[sources] class AppsflyerTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"appsflyer(${props.getOrElse("url", props.getOrElse("app_id", "?"))})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AppsflyerScanBuilder(schema, props ++ options.asScala)
}

private[sources] class AppsflyerScanBuilder(fullSchema: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AppsflyerScan(required, opts)
}

private[sources] class AppsflyerScan(schema: StructType, opts: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  // one partition: the export API returns a single CSV body (main.py:125)
  override def planInputPartitions(): Array[InputPartition] =
    Array(AppsflyerInputPartition(opts))
  override def createReaderFactory(): PartitionReaderFactory =
    new AppsflyerReaderFactory(schema)
}

private[sources] case class AppsflyerInputPartition(opts: Map[String, String])
    extends InputPartition

private[sources] class AppsflyerReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AppsflyerPartitionReader(schema,
      partition.asInstanceOf[AppsflyerInputPartition].opts)
}

private[sources] class AppsflyerPartitionReader(schema: StructType,
                                                opts: Map[String, String])
    extends PartitionReader[InternalRow] with Logging {

  // fetch lazily on first next() so reader construction never performs IO
  private lazy val rows: Iterator[InternalRow] =
    AppsflyerFetch.fetchCsv(opts) match {
      case None => Iterator.empty // fetch failure => empty relation, not error
      case Some(body) => parse(body)
    }
  private var current: InternalRow = _

  private def parse(body: String): Iterator[InternalRow] = {
    val settings = new com.univocity.parsers.csv.CsvParserSettings
    settings.setHeaderExtractionEnabled(true)
    settings.setMaxColumns(512)
    settings.setMaxCharsPerColumn(1 << 20)
    val parser = new com.univocity.parsers.csv.CsvParser(settings)
    parser.beginParsing(new java.io.StringReader(body))
    // BOM strip on the first header (main.py:128); univocity already eats
    // a leading BOM from the stream, the replace is belt-and-braces
    val headers = parser.getRecordMetadata.headers()
      .map(h => Option(h).fold("")(_.replace("﻿", "")))
    val idx = schema.fields.map(f => headers.indexOf(f.name))
    Iterator.continually(parser.parseNext()).takeWhile(_ != null).map { rec =>
      val values = new Array[Any](idx.length)
      var i = 0
      while (i < idx.length) {
        // unmapped/missing column -> NULL, like row.get(af_col) -> None
        values(i) =
          if (idx(i) < 0 || idx(i) >= rec.length || rec(idx(i)) == null) null
          else UTF8String.fromString(rec(idx(i)))
        i += 1
      }
      InternalRow.fromSeq(values.toIndexedSeq)
    }
  }

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** The fetch half of S1: GET the CSV body. Failure semantics match the
  * reference exactly — any non-2xx or IO error logs and yields None
  * (main.py:122-124,  non-200 -> log + return []). */
private[graft] object AppsflyerFetch extends Logging {

  /** AppsFlyer Raw Data Export v5 URL (main.py:115-117). */
  def exportUrl(appId: String, from: String, to: String, timezone: String,
                additionalFields: String): String = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    s"https://hq1.appsflyer.com/api/raw-data/export/app/${enc(appId)}/installs_report/v5" +
      s"?from=${enc(from)}&to=${enc(to)}&timezone=${enc(timezone)}" +
      (if (additionalFields.nonEmpty) s"&additional_fields=${enc(additionalFields)}" else "")
  }

  /** One attempt's outcome: success, or failure tagged transient
    * (worth retrying: rate limit, server error, IO) vs permanent. */
  private sealed trait FetchResult
  private case class FetchOk(body: String) extends FetchResult
  private case class FetchFail(transient: Boolean, msg: String) extends FetchResult

  /** Transient-failure retry policy. The reference performs ONE blocking
    * GET and treats any failure as an empty run (main.py:122-124); a real
    * AppsFlyer puller hits rate limits (HTTP 429) and transient 5xx
    * first, so the fetch retries those — plus IO errors — up to
    * `max_retries` extra attempts with exponential backoff
    * (`retry_backoff_ms` * 2^attempt). Non-transient statuses (4xx auth /
    * parameter errors) fail immediately: retrying a bad token cannot
    * succeed. Backoff carries no random jitter on purpose: each scan has
    * exactly ONE input partition (the API returns a single CSV body,
    * main.py:125), so there is no executor herd to decorrelate, and
    * determinism keeps the policy unit-testable. After the final attempt
    * the reference's contract is unchanged: empty relation, never an
    * error. */
  def fetchCsv(opts: Map[String, String]): Option[String] = {
    val url = opts.getOrElse("url", exportUrl(
      opts.getOrElse("app_id", ""),
      opts.getOrElse("from", ""), opts.getOrElse("to", ""),
      opts.getOrElse("timezone", "Asia/Ho_Chi_Minh"),
      opts.getOrElse("additional_fields", "")))
    // malformed knob values fall back to defaults rather than throwing:
    // the source's contract is failure -> empty relation, never an error,
    // and a typo'd option must not be the one thing that can crash a scan
    // — but the ignored value IS logged, so misconfiguration stays
    // discoverable (r6 advice)
    def knob[T](key: String, default: T)(parse: String => T): T =
      opts.get(key).map { v =>
        scala.util.Try(parse(v)).getOrElse {
          logWarning(s"appsflyer source: ignoring malformed $key='$v', " +
            s"using default $default")
          default
        }
      }.getOrElse(default)
    val maxRetries = knob("max_retries", 2)(_.toInt)
    val backoffMs = knob("retry_backoff_ms", 1000L)(_.toLong)
    var attempt = 0
    while (true) {
      fetchOnce(url, opts) match {
        case FetchOk(body) => return Some(body)
        case FetchFail(transient, msg) =>
          if (transient && attempt < maxRetries) {
            val sleepMs = backoffMs << attempt
            logWarning(s"appsflyer source: $msg; retry ${attempt + 1}/$maxRetries in ${sleepMs}ms")
            Thread.sleep(sleepMs)
            attempt += 1
          } else {
            logWarning(s"appsflyer source: $msg -> empty relation")
            return None
          }
      }
    }
    None // unreachable
  }

  private def fetchOnce(url: String, opts: Map[String, String]): FetchResult =
    try {
      val u = java.net.URI.create(url).toURL
      u.getProtocol match {
        case "http" | "https" =>
          val conn = u.openConnection().asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("GET")
          conn.setRequestProperty("accept", "text/csv") // main.py:120
          opts.get("token").foreach(t => conn.setRequestProperty("authorization", t))
          conn.setConnectTimeout(opts.getOrElse("connect_timeout_ms", "30000").toInt)
          conn.setReadTimeout(opts.getOrElse("read_timeout_ms", "300000").toInt)
          val code = conn.getResponseCode
          if (code / 100 == 2)
            FetchOk(new String(conn.getInputStream.readAllBytes(), "UTF-8"))
          else
            FetchFail(transient = code == 429 || code / 100 == 5,
              s"HTTP $code from $url")
        case _ =>
          FetchOk(new String(u.openStream().readAllBytes(), "UTF-8"))
      }
    } catch {
      // NonFatal, not just IOException: a malformed `url` option throws
      // IllegalArgumentException from URI.create, and the reference's
      // contract is failure -> empty relation, never an error
      // (main.py:122-124). IO errors are transient (connection reset,
      // timeout); anything else (bad URL) retries cannot fix.
      case e: java.io.FileNotFoundException => // missing file: URL fixture
        FetchFail(transient = false, s"fetch failed (${e.getMessage})")
      case e: java.io.IOException =>
        FetchFail(transient = true, s"fetch failed (${e.getMessage})")
      case scala.util.control.NonFatal(e) =>
        FetchFail(transient = false, s"fetch failed (${e.getMessage})")
    }
}
