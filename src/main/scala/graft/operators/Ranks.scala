package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The house EXACT-GLOBAL-RANK decomposition, shared so rank-based
  * statistics never plan the textbook `ROW_NUMBER() OVER (ORDER BY x)`
  * — an unpartitioned WindowExec requires AllTuples, i.e. ONE task
  * holding the whole relation, regardless of upstream layout. The
  * bucketed two-pass scan computes the identical rank B-way parallel:
  *
  *   1. sample B−1 approximate value boundaries (`approx_percentile`)
  *      — boundary QUALITY only affects balance, never correctness;
  *   2. assign each row its bucket by boundary comparison (narrow,
  *      broadcast boundaries);
  *   3. rank locally inside each bucket (a PARTITIONED window);
  *   4. add the broadcast per-bucket prefix offsets.
  *
  * Ties order by `keyCol`, matching ROW_NUMBER's (value, key) total
  * order exactly, so the result is hash-identical to the single-task
  * formulation while the sort runs on B partitions.
  */
object Ranks {

  /** Exact global rank of `valueCol` (ascending, `keyCol` tiebreak).
    * Returns (`keyCol`, `out`) with `out` the 1-based BIGINT rank.
    * `df` must be keyed by `keyCol` (one row per key). Descending
    * ranks: pass the negated value. */
  def exactRank(spark: SparkSession, df: DataFrame, valueCol: String,
      keyCol: String, out: String): DataFrame =
    exactRankOrdered(spark, df, valueCol,
      Seq(col(valueCol)), keyCol, out)

  /** General form: bucket on the numeric `bucketCol`, order within
    * buckets by `order` (then `keyCol`). `bucketCol` must be a
    * MONOTONE COARSENING of the order — a ≤ b in the total order
    * implies bucketCol(a) ≤ bucketCol(b) — so a bucket is a
    * contiguous rank range and local rank + bucket offset is the
    * exact global rank. (Ties in `bucketCol` are safe: equal values
    * land in the same bucket.) Lets string-ordered ranks bucket on a
    * numeric prefix, and descending ranks bucket on the negated
    * value. */
  def exactRankOrdered(spark: SparkSession, df: DataFrame,
      bucketCol: String, order: Seq[Column], keyCol: String,
      out: String): DataFrame = {
    val nB = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pcts = (1 until nB).map(i =>
      (i.toDouble / nB).toString).mkString(", ")
    val bnds = df.agg(expr(
      s"approx_percentile(CAST($bucketCol AS DOUBLE), array($pcts))")
      .as("graft_rk_bnds"))
    val b = df.crossJoin(broadcast(bnds)) // 1-row boundary array
      .withColumn("graft_rk_bucket",
        size(filter(col("graft_rk_bnds"),
          (x: Column) => x < col(bucketCol).cast("double"))))
      .drop("graft_rk_bnds")
    val wL = Window.partitionBy(col("graft_rk_bucket"))
      .orderBy(order :+ col(keyCol): _*)
    val local = b.withColumn("graft_rk_lr",
      row_number().over(wL).cast("long"))
    val wO = Window.orderBy(col("graft_rk_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = b.groupBy(col("graft_rk_bucket"))
      .agg(count(lit(1)).as("graft_rk_bc"))
      .withColumn("graft_rk_off",
        coalesce(sum(col("graft_rk_bc")).over(wO), lit(0L)))
      .select(col("graft_rk_bucket"), col("graft_rk_off"))
    local.join(broadcast(offs), Seq("graft_rk_bucket"))
      .select(col(keyCol),
        (col("graft_rk_off") + col("graft_rk_lr")).as(out))
  }

  /** Exact global INCLUSIVE running total of `sumCol` in
    * (orderCol, keyCol) order — the cumulative-sum sibling of
    * [[exactRank]], same bucketed two-pass decomposition: local
    * windowed sums inside B boundary-assigned buckets (a PARTITIONED
    * window) plus broadcast per-bucket prefix totals (a B-row
    * relation). Returns (`keyCol`, `out`) with `out` a
    * DECIMAL(38,0) — pass an integer column (cents, counts) for
    * exactness; the sum is hash-identical to the single-task
    * `SUM() OVER (ORDER BY orderCol, keyCol)` formulation. */
  def exactCumsum(spark: SparkSession, df: DataFrame, orderCol: String,
      sumCol: String, keyCol: String, out: String): DataFrame = {
    val nB = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pcts = (1 until nB).map(i =>
      (i.toDouble / nB).toString).mkString(", ")
    val bnds = df.agg(expr(
      s"approx_percentile(CAST($orderCol AS DOUBLE), array($pcts))")
      .as("graft_rk_bnds"))
    val b = df.crossJoin(broadcast(bnds)) // 1-row boundary array
      .withColumn("graft_rk_bucket",
        size(filter(col("graft_rk_bnds"),
          (x: Column) => x < col(orderCol).cast("double"))))
      .drop("graft_rk_bnds")
    val wL = Window.partitionBy(col("graft_rk_bucket"))
      .orderBy(col(orderCol), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = b.withColumn("graft_cs_l",
      sum(col(sumCol).cast("decimal(38,0)")).over(wL))
    val wO = Window.orderBy(col("graft_rk_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = b.groupBy(col("graft_rk_bucket"))
      .agg(sum(col(sumCol).cast("decimal(38,0)")).as("graft_cs_bs"))
      .withColumn("graft_cs_off",
        coalesce(sum(col("graft_cs_bs")).over(wO),
          lit(0).cast("decimal(38,0)")))
      .select(col("graft_rk_bucket"), col("graft_cs_off"))
    local.join(broadcast(offs), Seq("graft_rk_bucket"))
      .select(col(keyCol),
        (col("graft_cs_off") + col("graft_cs_l"))
          .cast("decimal(38,0)").as(out))
  }
}
