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

  test("malformed csv rows land in _corrupt_record, not exceptions (PERMISSIVE)") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_corrupt").toString
    val f = new java.io.PrintWriter(s"$dir/bad.csv")
    f.println("event_id,value")
    f.println("1,10.5")
    f.println("not_a_number,oops,extra_field")
    f.println("3,7.25")
    f.close()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = spark.read
      .option("header", true)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(dir)
      .cache() // corrupt-record column requires the raw row to be retained
    assert(df.count() == 3, "no row may be dropped or throw in PERMISSIVE mode")
    val bad = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNotNull)
    assert(bad.count() == 1)
    assert(bad.head.getString(2).startsWith("not_a_number"))
    val good = df.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
    assert(good.count() == 2)
    df.unpersist()
  }

  test("FAILFAST mode surfaces the malformed row as an error") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_failfast").toString
    val f = new java.io.PrintWriter(s"$dir/bad.csv")
    f.println("event_id,value")
    f.println("1,10.5")
    f.println("zzz,1.0")
    f.close()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType)))
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.option("header", true).option("mode", "FAILFAST")
        .schema(schema).csv(dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }
}
