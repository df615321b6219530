package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.Sink

/** Format breadth beyond parquet: ORC round-trips with the same filter
  * pushdown the parquet scans get (it is the peer warehouse format);
  * JSON lines round-trip under an EXPLICIT schema (the interchange
  * form — schema inference would be an extra full pass at scale, so
  * the library's contract is schema-on-read, never inference). Both go
  * through Sink.writeFormat, which keeps the reference's empty-skip
  * contract for every format. */
class SourceFormatsSpec extends SparkSpec {

  test("ORC round-trip preserves rows and pushes filters into the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/li"
    val src = Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
    assert(Sink.writeFormat(src, dir, "orc"))
    val back = spark.read.orc(dir).filter(col("l_quantity") > 25)
    val p = back.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(l_quantity"),
      s"ORC scan must receive the pushed predicate:\n${p.take(800)}")
    assert(back.count() == src.filter(col("l_quantity") > 25).count())
    assert(back.count() > 0)
  }

  test("JSON lines round-trip under an explicit schema; empty-skip holds") {
    val dir = Files.createTempDirectory("graft_json").toString + "/docs"
    val src = Tables(spark, sf0001, "documents")
      .select("doc_id", "lang", "n_chars")
    assert(Sink.writeFormat(src, dir, "json"))
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.schema == src.schema, "schema-on-read must be authoritative")
    assert(back.orderBy("doc_id").collect().toSeq ==
      src.orderBy("doc_id").collect().toSeq)
    // the reference's empty-skip contract (main.py:189-190) holds for
    // every format: nothing is written, not even a directory
    assert(!Sink.writeFormat(src.limit(0), dir + "_empty", "json"))
    assert(!new java.io.File(dir + "_empty").exists)
  }
}
