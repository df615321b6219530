package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table loader (TESTDATA.md): one parquet file per table under
  * the scale-factor dir. Reads are plain parquet scans so Catalyst's
  * column pruning + predicate pushdown apply (asserted in PlanAuditSpec). */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw
      // nanos-since-epoch and truncate to microseconds — exactly what
      // DuckDB does when it narrows ns to its native us timestamps, so
      // the oracle compare sees identical values.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // `div` (integral division), NOT `/`: long/long promotes to double,
      // and epoch-nanos (~1.7e18) exceed double's 53-bit mantissa.
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
