package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType}

/** Test-corpus table loader (TESTDATA.md): one parquet file per table under
  * the scale-factor dir. Reads are plain parquet scans so Catalyst's
  * column pruning + predicate pushdown apply (asserted in PlanAuditSpec). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The driver has shipped events.ts as parquet TIMESTAMP(NANOS) in
      // some rounds and TIMESTAMP(MICROS, isAdjustedToUTC=false) in
      // others, so normalization is TYPE-DISPATCHED instead of assuming
      // one encoding. nanosAsLong makes the NANOS variant readable at
      // all (Spark's vectorized reader rejects it otherwise); the long
      // it produces is truncated ns -> us with `div` (integral division,
      // NOT `/`: long/long promotes to double and epoch-nanos ~1.7e18
      // exceed double's 53-bit mantissa). The MICROS/NTZ variant is cast
      // to the session-TZ TIMESTAMP the rest of the code and the
      // streaming watermarks expect — a wall-clock-preserving cast under
      // the UTC session TZ, which is exactly how DuckDB reads the same
      // file (naive us), so the oracle compare sees identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", normalizeTs(raw.schema))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** ts-normalization column for an events schema — shared with the
    * streaming reader so batch and stream agree on the encoding. */
  def normalizeTs(schema: StructType): Column =
    schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast("timestamp")
      case _                => col("ts")
    }
}
