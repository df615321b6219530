package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine's relations survive a round
  * trip through every bundled columnar/row format with schema and values
  * intact (parquet is exercised everywhere else; this pins csv, json and
  * orc). Timestamps travel as formatted strings in csv/json — the same
  * convention the oracle gate uses — so no format's timezone quirks can
  * corrupt them. */
class FormatRoundTripSpec extends SparkSpec {

  private def sample = Tables(spark, sf0001, "events")
    .select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    .orderBy(col("event_id")).limit(200)

  private def assertSame(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      b.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(b.exceptAll(a).isEmpty && a.exceptAll(b).isEmpty)
  }

  test("json round trip") {
    val dir = Files.createTempDirectory("graft_json").toString + "/d"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assertSame(sample, back)
  }

  test("csv round trip (header, explicit schema)") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/d"
    sample.write.option("header", true).csv(dir)
    val back = spark.read.option("header", true).schema(sample.schema).csv(dir)
    assertSame(sample, back)
  }

  test("orc round trip") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/d"
    sample.write.orc(dir)
    assertSame(sample, spark.read.orc(dir))
  }
}
