package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Normalize

/** Table-driven tests of the reference's exact `parse_datetime`
  * (main.py:87-105) and sentinel-null (main.py:165) semantics. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def parseOne(s: String): Option[java.sql.Timestamp] = {
    val df = Seq(Option(s)).toDF("v")
      .select(Normalize.parseAfTimestamp(col("v")).as("p"))
    Option(df.head.getTimestamp(0))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("clean timestamp parses") {
    assert(parseOne("2025-09-26 10:15:00") === Some(ts("2025-09-26 10:15:00")))
  }
  test("fractional seconds truncated (main.py:93-95)") {
    assert(parseOne("2025-09-26 10:15:00.000") === Some(ts("2025-09-26 10:15:00")))
    assert(parseOne("2025-09-26 10:15:00.999999") === Some(ts("2025-09-26 10:15:00")))
    // reference drops EVERYTHING after the first dot
    assert(parseOne("2025-09-26 10:15:00.junk") === Some(ts("2025-09-26 10:15:00")))
  }
  test("single-digit hour zero-padded (main.py:96-100)") {
    assert(parseOne("2024-01-02 3:04:05") === Some(ts("2024-01-02 03:04:05")))
  }
  test("sentinels -> NULL, case-insensitive with trim (main.py:90-91)") {
    for (s <- Seq("", "   ", "null", "NULL", "None", "NONE", "n/a", "N/A", " null "))
      assert(parseOne(s) === None, s"for '$s'")
  }
  test("null in -> null out") {
    assert(parseOne(null) === None)
  }
  test("malformed -> NULL, never throws (main.py:101-105)") {
    for (s <- Seq("26/09/2025 10:15", "2025-09-26", "2025-09-26T10:15:00",
                  "garbage", "2025-9-26 10:15:00", "2025-09-26 10:15",
                  "2025-09-26  10:15:00", "10:15:00 2025-09-26"))
      assert(parseOne(s) === None, s"for '$s'")
  }
  test("parse never throws on arbitrary strings (property)") {
    // scalacheck Gen sampled directly (no scalatestplus bridge in deps);
    // one batched Spark job over 200 generated strings
    val strs = (0 until 200).flatMap { i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(i.toLong))
    }
    val df = strs.map(Option(_)).toDF("v")
      .select(Normalize.parseAfTimestamp(col("v")).as("p"))
    df.collect() // must not throw
    succeed
  }

  test("expression and composed forms agree on generated + crafted inputs (property)") {
    val crafted = Seq(
      "2025-09-26 10:15:00", "2025-09-26 10:15:00.5", "2024-01-02 3:04:05",
      "", "  ", "null", "N/a", "\tnone\r", "2025-13-01 00:00:00",
      "2025-02-30 10:00:00", "2025-09-26 24:00:00", "2025-09-26 23:59:60",
      "0001-01-01 00:00:00", "9999-12-31 23:59:59", ".", "a.b",
      "2025-09-26 10:15:00junk", " 2025-09-26 10:15:00 ")
    val generated = (0 until 300).flatMap { i =>
      Gen.asciiPrintableStr.apply(Gen.Parameters.default, Seed(1000L + i))
    }
    val df = (crafted ++ generated).map(Option(_)).toDF("v")
      .select(col("v"),
        Normalize.parseAfTimestamp(col("v")).as("fast"),
        Normalize.parseAfTimestampComposed(col("v")).as("slow"))
    val diff = df.filter(
      (col("fast").isNull && col("slow").isNotNull) ||
      (col("fast").isNotNull && col("slow").isNull) ||
      (col("fast") =!= col("slow"))).collect()
    assert(diff.isEmpty, diff.take(5).mkString("; "))
  }

  test("sentinel-null normalization is case-SENSITIVE, no trim (main.py:165)") {
    val in = Seq("", "null", "None", "NULL", "none", " null ", "x", null)
    val out = in.map { s =>
      val df = Seq(Option(s)).toDF("v")
        .select(Normalize.nullIfSentinels(col("v")).as("p"))
      Option(df.head.getString(0))
    }
    assert(out === Seq(None, None, None, Some("NULL"), Some("none"),
      Some(" null "), Some("x"), None))
  }
}
