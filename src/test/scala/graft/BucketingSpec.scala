package graft

import org.apache.spark.sql.functions.col

/** Bucketed co-located joins: pre-shuffling both fact tables into the
  * same bucket layout makes every subsequent join on the bucket key
  * shuffle-free — the 100 TB answer to "this join runs every hour on the
  * same keys". The spec proves the property from the physical plan: the
  * bucketed join contains NO Exchange, the plain-parquet join does. */
class BucketingSpec extends SparkSpec {

  test("join on the bucket key plans without any shuffle") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.nonEmpty)
    val orders = Tables(spark, sf0001, "orders")
    val lineitem = Tables(spark, sf0001, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    // bare join (no agg on top — an aggregation on another key would add
    // its own legitimate exchange above the join)
    val bucketed = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderstatus"))
    // disable broadcast so the join strategy itself is under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = bucketed.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"))
      assert(!p.contains("Exchange"),
        "bucketed join must read both sides without any shuffle")

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderstatus"))
      val pp = plain.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(pp.contains("Exchange"),
        "sanity: the unbucketed join does shuffle")

      // and the bucketed join computes the same answer
      assert(bucketed.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
