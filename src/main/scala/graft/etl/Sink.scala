package graft.etl

import org.apache.spark.sql.DataFrame

/** K1/K2 — the sink half of the reference (main.py:169-192).
  *
  * The reference appends one VALUES batch over the ClickHouse native
  * protocol and skips the INSERT entirely for an empty batch
  * (main.py:183,189-190). The JDBC writer reproduces the batched append
  * (per-partition, `batchsize` rows per round-trip — already distributed
  * where the reference was single-connection); the parquet path is the
  * offline-harness stand-in used by Verify.
  *
  * == ClickHouse dialect assumptions (unverifiable offline) ==
  * The JDBC paths are EXECUTED in CI against embedded Derby
  * (JdbcSinkSpec); the reference's actual target is ClickHouse via the
  * native-TCP `clickhouse-driver` (main.py:169-187), which this sandbox
  * cannot reach. What a ClickHouse deployment must supply/verify:
  *
  *  - '''Driver + URL''': `com.clickhouse.jdbc.ClickHouseDriver` with
  *    `jdbc:clickhouse://host:8123/db` (HTTP) — Spark's JDBC writer
  *    speaks standard batched `PreparedStatement` INSERTs, which the
  *    ClickHouse JDBC driver converts to its columnar insert form; the
  *    `batchsize` knob maps to one ClickHouse insert block per batch.
  *  - '''Timestamps''': the pipeline emits `TimestampType` in the
  *    session's UTC zone; ClickHouse `DateTime` columns are zoneless
  *    wall-clock, matching the reference's naive strings — the server's
  *    `timezone` setting must be UTC (or the column declared
  *    `DateTime('UTC')`) or window filters shift by the zone offset.
  *  - '''Nullability''': Spark nullable columns require `Nullable(T)`
  *    ClickHouse columns; inserting NULL into a bare `T` column throws
  *    on ClickHouse where Derby accepted it (the 49-column AppsFlyer
  *    schema is all-nullable strings — the DDL must mirror that).
  *  - '''Dedup probe''' (`readExistingJdbc`): the pushdown subquery uses
  *    ANSI `SELECT ... WHERE ts >= '...' AND ts <= '...'` only —
  *    ClickHouse parses string literals into `DateTime` in the SERVER
  *    zone, same caveat as above; no backtick/quote dialect is emitted.
  *  - '''Types beyond strings/timestamps''': BIGINT→Int64,
  *    DOUBLE→Float64, DECIMAL(p,s)→Decimal(p,s) are 1:1; nothing in the
  *    pipeline emits arrays/maps through JDBC.
  */
object Sink {

  /** K1 (offline form): append as parquet; skip the write when empty,
    * matching main.py:189-190. `limit(1).isEmpty` costs one cheap job —
    * acceptable at any scale since it short-circuits at the first row. */
  def writeParquet(df: DataFrame, path: String): Boolean = {
    if (df.isEmpty) false
    else { df.write.mode("append").parquet(path); true }
  }

  /** K1 at warehouse scale: date-partitioned parquet append. Downstream
    * window-filtered reads (the reference's every query — F5) then prune
    * whole partitions before any IO: the layout IS the index. Asserted in
    * PlanAuditSpec ("partition pruning"). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Boolean = {
    if (df.isEmpty) false
    else {
      // cluster rows by the partition value first: otherwise every task
      // writes a file into every partition (tasks x partitions small
      // files — the classic warehouse-append mistake at scale)
      df.repartition(org.apache.spark.sql.functions.col(partitionCol))
        .write.mode("append").partitionBy(partitionCol).parquet(path)
      true
    }
  }

  /** K1 generalized over the warehouse format: same append + empty-skip
    * contract as [[writeParquet]] for any Spark batch format ("orc",
    * "json", "csv", "parquet", "avro" where the jar is present). Parquet
    * stays the default everywhere in this library (best pushdown +
    * statistics); ORC is its peer for both (SourceFormatsSpec audits the
    * ORC filter pushdown), JSON/CSV are interchange forms whose reads
    * must supply an explicit schema — runtime inference at warehouse
    * scale is both a full extra pass and a correctness hazard. */
  def writeFormat(df: DataFrame, path: String, format: String): Boolean = {
    if (df.isEmpty) false
    else { df.write.mode("append").format(format).save(path); true }
  }

  /** K1 (faithful form): batched JDBC append (ClickHouse or any JDBC URL).
    * Each executor partition writes its own batched connection — the
    * distributed generalization of the reference's single INSERT. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties,
                batchSize: Int = 100000): Boolean = {
    if (df.isEmpty) false
    else {
      df.write.mode("append")
        .option("batchsize", batchSize.toString)
        .jdbc(url, table, props)
      true
    }
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetFileBytes`. Incremental appends (the reference runs
    * every 2 hours — F4) accrete one small file per task per run; at
    * warehouse scale the resulting file count, not data size, dominates
    * scan planning and NameNode/listing cost. File count is derived from
    * the actual on-disk bytes, and rows are round-robin repartitioned for
    * even output sizes. Writes to a NEW directory (an in-place rewrite
    * that fails mid-job would destroy data); the caller swaps paths.
    * Returns the number of files written. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
              destPath: String, targetFileBytes: Long = 128L << 20): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(conf)
    val totalBytes = fs.getContentSummary(src).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(srcPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(destPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(destPath))
      .count(_.getPath.getName.endsWith(".parquet"))
  }

  /** K2 — read the dedup probe side with projection+predicate pushed down.
    * On JDBC this is a pushdown subquery (the reference hand-writes the
    * same SELECT at main.py:172-174); on parquet Catalyst pushes both
    * automatically — asserted by PlanAuditSpec. */
  def readExistingJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
                       table: String, keyCol: String, timeCol: String,
                       from: String, to: String,
                       props: java.util.Properties = new java.util.Properties): DataFrame = {
    val sub =
      s"(SELECT $keyCol FROM $table WHERE $timeCol >= '$from' AND $timeCol <= '$to') t"
    spark.read.jdbc(url, sub, props)
  }
}
