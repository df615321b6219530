package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.etl.{Dedup, Ingest}
import graft.schema.AppsflyerSchema

/** Golden-fixture ingestion through the DSv2 "appsflyer" source
  * (SURVEY.md §5.3/§5.4): BOM + Title-Case headers + quoted commas +
  * sentinel nulls + ragged datetimes + unmapped additional_fields
  * columns, then the full normalize -> dedup pipeline. */
class AppsflyerSourceSpec extends SparkSpec {

  private val fixtureUrl =
    getClass.getResource("/appsflyer_installs.csv").toString

  private def raw =
    spark.read.format("appsflyer").option("url", fixtureUrl).load()

  test("source yields the declared 49-column all-string schema, 1 partition") {
    assert(raw.schema == AppsflyerSchema.csvSchema)
    assert(raw.rdd.getNumPartitions == 1)
    assert(raw.count() == 7)
  }

  test("BOM is stripped: the first header column is readable by name") {
    // 'Attributed Touch Type' is the first header behind the BOM
    val v = raw.select(col("Attributed Touch Type")).limit(1).head().getString(0)
    assert(v == "click")
  }

  test("RFC-4180 quoting: comma inside quotes stays one value") {
    val c = raw.filter(col("AppsFlyer ID") === "id-1" &&
      col("Customer User ID") === "u1").select("Campaign").head().getString(0)
    assert(c == "Summer, Sale")
  }

  test("unmapped additional_fields are absent; missing mapped cols are NULL") {
    assert(!raw.columns.contains("gp_referrer") && !raw.columns.contains("att"))
    // 'City' is mapped but absent from the fixture header -> all NULL
    assert(raw.filter(col("City").isNotNull).count() == 0)
  }

  test("normalize applies F1 datetime semantics to source rows") {
    val n = Ingest.normalize(raw).cache()
    def installOf(id: String): Option[java.sql.Timestamp] = {
      val r = n.filter(col("appsflyer_id") === id && col("customer_user_id").isNotNull)
        .select("install_time").limit(1).head()
      Option(r.getTimestamp(0))
    }
    assert(installOf("id-2").get.toString == "2025-09-26 10:15:00.0") // fractional truncated
    assert(installOf("id-3").get.toString == "2025-09-26 03:04:05.0") // 1-digit hour padded
    // sentinels -> NULL (datetime col), malformed event_time -> NULL
    val r4 = n.filter(col("appsflyer_id") === "id-4")
      .select("install_time", "event_time", "media_source").head()
    assert(r4.isNullAt(0) && r4.isNullAt(1) && r4.isNullAt(2))
    val r5 = n.filter(col("appsflyer_id") === "id-5")
      .select("attributed_touch_time", "event_time").head()
    assert(r5.isNullAt(0) && r5.isNullAt(1))
  }

  test("full pipeline: key filter, anti-join dedup, within-batch dups kept") {
    val n = Ingest.normalize(raw)
    val windowed = n.filter(Dedup.windowFilter(col("install_time"),
      "2025-09-26 10:00:00", "2025-09-26 12:00:00"))
    // 'existing' sink already contains id-5 inside the window
    val existing = spark.createDataFrame(Seq(
      Tuple1("id-5")).map(t => t)).toDF("appsflyer_id")
    val fresh = Dedup.newRows(windowed, existing, "appsflyer_id")
    val ids = fresh.select("appsflyer_id").collect().map(_.getString(0)).sorted
    // id-3 (03:04) outside window; id-4 null install_time filtered by window;
    // '' key dropped (F6); id-5 deduped (J1); id-1 twice (within-batch kept)
    assert(ids.toSeq == Seq("id-1", "id-1", "id-2"))
  }

  test("idempotence: re-running against the sink appends nothing") {
    val sink = Files.createTempDirectory("af_sink").toString + "/t"
    val n = Ingest.normalize(raw)
    val windowed = n.filter(Dedup.windowFilter(col("install_time"),
      "2025-09-26 10:00:00", "2025-09-26 12:00:00"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      windowed.select("appsflyer_id").schema)
    val first = Dedup.newRows(windowed, empty, "appsflyer_id")
    first.write.mode("append").parquet(sink)
    val existing = spark.read.parquet(sink)
    // second overlapping run: every key already in the sink
    val second = Dedup.newRows(windowed, existing, "appsflyer_id")
    assert(second.count() == 0)
    assert(spark.read.parquet(sink).count() == first.count())
  }

  test("fetch failure yields an empty relation with intact schema, not an error") {
    val df = spark.read.format("appsflyer")
      .option("url", "file:///nonexistent/nope.csv").load()
    assert(df.schema == AppsflyerSchema.csvSchema)
    assert(df.count() == 0)
  }

  /** Local HTTP fixture: serves `statuses` in order (body on the last). */
  private def withServer(statuses: Seq[Int], body: String)
                        (f: (String, () => Int) => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      val n = hits.getAndIncrement()
      val code = statuses(math.min(n, statuses.size - 1))
      val bytes = (if (code / 100 == 2) body else "err").getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/csv", () => hits.get())
    finally server.stop(0)
  }

  private val tinyCsv = "AppsFlyer ID,Media Source\nid-9,organic\n"

  test("429 then 200: bounded retry recovers the batch") {
    withServer(Seq(429, 429, 200), tinyCsv) { (url, hits) =>
      val df = spark.read.format("appsflyer").option("url", url)
        .option("retry_backoff_ms", "1").load()
      assert(df.count() == 1)
      assert(hits() == 3, "two retries then success")
    }
  }

  test("5xx exhausts retries -> empty relation after max_retries+1 attempts") {
    withServer(Seq(503), tinyCsv) { (url, hits) =>
      val df = spark.read.format("appsflyer").option("url", url)
        .option("max_retries", "2").option("retry_backoff_ms", "1").load()
      assert(df.count() == 0)
      assert(hits() == 3, "initial attempt + 2 retries")
    }
  }

  test("4xx is permanent: no retry, immediate empty relation (main.py:123-124)") {
    withServer(Seq(404), tinyCsv) { (url, hits) =>
      val df = spark.read.format("appsflyer").option("url", url).load()
      assert(df.count() == 0)
      assert(hits() == 1, "a bad request cannot succeed on retry")
    }
  }

  test("malformed retry options fall back to defaults, never break the contract") {
    // a typo'd knob must not be the one thing that can error a scan —
    // defaults apply (max_retries=2) and the scan still succeeds/empties
    withServer(Seq(429, 200), tinyCsv) { (url, hits) =>
      val df = spark.read.format("appsflyer").option("url", url)
        .option("max_retries", "two").option("retry_backoff_ms", "fast").load()
      assert(df.count() == 1)
      assert(hits() == 2, "default retry budget still applies")
    }
  }

  test("export URL matches the reference's v5 shape") {
    val u = graft.sources.AppsflyerFetch.exportUrl(
      "com.app", "2025-09-26 08:15:00", "2025-09-26 10:15:00",
      "Asia/Ho_Chi_Minh", "blocked_reason_rule,store_reinstall")
    assert(u.startsWith(
      "https://hq1.appsflyer.com/api/raw-data/export/app/com.app/installs_report/v5?"))
    assert(u.contains("timezone=Asia%2FHo_Chi_Minh"))
    assert(u.contains("from=2025-09-26+08%3A15%3A00"))
    assert(u.contains("additional_fields=blocked_reason_rule%2Cstore_reinstall"))
  }
}
