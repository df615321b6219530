package graft

import org.apache.spark.sql.functions._

/** K1/K2 against a REAL JDBC database (embedded Derby, in-memory): the
  * faithful ClickHouse path of the reference (main.py:169-192) executed
  * end to end, not just code-read — batched append (main.py:184-187),
  * empty-batch skip (main.py:189-190), and the dedup probe's hand-pushed
  * single-column projection + window predicate through a subquery alias
  * (main.py:172-174). Derby, like ClickHouse, compares TIMESTAMP columns
  * against plain string literals, so the reference's quoting convention
  * round-trips unchanged.
  *
  * Identifiers are UPPERCASE on purpose: Spark's JDBC writer quotes
  * column/table names verbatim while the probe subquery references them
  * unquoted, and Derby (ANSI folding) resolves unquoted names to
  * uppercase — lowercase quoted names would be unreachable from SQL. */
class JdbcSinkSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val table = "INSTALLS"

  private def batch = {
    val s = spark
    import s.implicits._
    Seq(
      ("af1", "2024-01-15 10:00:00"),
      ("af2", "2024-01-15 11:30:00"),
      ("af3", "2024-01-16 09:00:00"),
      ("af4", "2024-01-14 23:59:59"))
      .toDF("APPSFLYER_ID", "TS_STR")
      .select(col("APPSFLYER_ID"),
        col("TS_STR").cast("timestamp").as("INSTALL_TIME"))
  }

  test("K1: writeJdbc appends batches; K2: probe reads 1 column within the window") {
    assert(graft.etl.Sink.writeJdbc(batch, url, table),
      "non-empty batch must report written=true")
    // second run of the same batch appends (the reference relies on the
    // anti-join, not the sink, for dedup — within-sink duplicates are kept)
    assert(graft.etl.Sink.writeJdbc(batch, url, table))
    val all = spark.read.jdbc(url, table, new java.util.Properties)
    assert(all.count() == 8)

    val probe = graft.etl.Sink.readExistingJdbc(spark, url, table,
      "APPSFLYER_ID", "INSTALL_TIME",
      "2024-01-15 00:00:00", "2024-01-15 23:59:59")
    // projection pushed: the relation's schema IS the single key column
    assert(probe.schema.fieldNames.toSeq == Seq("APPSFLYER_ID"))
    // predicate pushed: only the in-window keys come back (af4 is the day
    // before, af3 the day after; both appear twice from the double append)
    val keys = probe.collect().map(_.getString(0)).sorted.toSeq
    assert(keys == Seq("af1", "af1", "af2", "af2"))
  }

  test("K1: empty batch skips the write entirely (main.py:189-190)") {
    val empty = batch.filter(lit(false))
    assert(!graft.etl.Sink.writeJdbc(empty, url, "NEVER_CREATED"),
      "empty batch must report written=false")
    // the table must not even exist: the reference never opens the INSERT
    val ex = intercept[Exception] {
      spark.read.jdbc(url, "NEVER_CREATED", new java.util.Properties).count()
    }
    assert(ex.getMessage.toUpperCase.contains("NEVER_CREATED"))
  }

  test("end-to-end: window probe + anti-join + JDBC append is idempotent") {
    val tbl = "INSTALLS_E2E"
    val from = "2024-01-15 00:00:00"
    val to = "2024-01-15 23:59:59"
    def newRows() = {
      val inWindow = batch.filter(
        col("INSTALL_TIME").between(lit(from).cast("timestamp"),
          lit(to).cast("timestamp")))
      val existing =
        try graft.etl.Sink.readExistingJdbc(spark, url, tbl,
          "APPSFLYER_ID", "INSTALL_TIME", from, to)
        catch { // first run: table does not exist yet = empty sink
          case _: Exception => spark.emptyDataFrame
            .withColumn("APPSFLYER_ID", lit(""))
        }
      inWindow.join(existing, Seq("APPSFLYER_ID"), "left_anti")
    }
    // run 1 inserts the 2 in-window rows; run 2 must insert nothing
    assert(graft.etl.Sink.writeJdbc(newRows(), url, tbl))
    assert(!graft.etl.Sink.writeJdbc(newRows(), url, tbl),
      "second run over the same window must skip (anti-join idempotence)")
    assert(spark.read.jdbc(url, tbl, new java.util.Properties).count() == 2)
  }
}
