package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-3 plan audits: subquery decorrelation, runtime bloom filters,
  * and the `spark.sql.extensions` registration path. */
class ExtensionsAndPlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("correlated scalar subqueries decorrelate into aggregate + join") {
    val p = plan(graft.operators.Subqueries.scalarCorrelated(spark, sf0001))
    assert(p.contains("Join"), "decorrelation must produce a join")
    assert(p.contains("HashAggregate"), "the per-key aggregate must exist")
    assert(!p.contains("ScalarSubquery"),
      "no per-row scalar subquery may survive in the physical plan")
  }

  test("EXISTS plans a semi join; NOT IN plans an anti join") {
    val pe = plan(graft.operators.Subqueries.existsLateShip(spark, sf0001))
    assert(pe.contains("LeftSemi"), "EXISTS must become a left semi join")
    val pn = plan(graft.operators.Subqueries.inNotIn(spark, sf0001))
    assert(pn.contains("LeftSemi") && pn.contains("LeftAnti"),
      "IN -> semi and NOT IN -> anti must both appear")
  }

  test("grouping sets expand AFTER pre-aggregation, not over the fact table") {
    val df = graft.operators.Subqueries.groupingSetsMix(spark, sf0001)
    val p = plan(df)
    assert(p.contains("Expand"))
    // Expand's child must already be an aggregate (6-row base), so the
    // fact-table scan is NOT multiplied by the number of grouping sets
    val tree = df.queryExecution.optimizedPlan
    val expand = tree.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.head
    assert(expand.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined, "Expand must sit above the pre-aggregate")
  }

  test("time-range window frame plans a single Window over one sort") {
    val p = plan(graft.operators.Relational.windowRangeFrame(spark, sf0001))
    assert(p.contains("Window"))
    assert(p.linesIterator.count(_.trim.startsWith("Window")) <= 2,
      "both frame aggregates must share one Window operator")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables(spark, sf0001, "lineitem")
      val sel = Tables(spark, sf0001, "orders")
        .filter(col("o_totalprice") > 400000).select("o_orderkey")
      val j = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        "the selective build side should inject a bloom filter into the probe scan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("GraftExtensions registers SQL functions via spark.sql.extensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "a fresh session must be constructed for extensions")
      val viaExt = s2.sql(
        "SELECT graft_simhash64(array('alpha','beta','gamma')) AS h")
        .head.getString(0)
      graft.functions.ExprColumns.register(base)
      val viaReg = base.sql(
        "SELECT graft_simhash64(array('alpha','beta','gamma')) AS h")
        .head.getString(0)
      assert(viaExt == viaReg && viaExt.nonEmpty,
        "extension-injected and session-registered functions must agree")
      // AGGREGATE functions resolve through a different analyzer path
      // (UnresolvedFunction -> AggregateFunction.toAggregateExpression)
      // than scalars — prove both imperative aggregates work via the
      // extensions route too, not just createOrReplaceTempFunction
      val freq = s2.sql(
        """SELECT explode(graft_freq_agg(CAST(id % 3 AS STRING), 8))
           AS (item, v) FROM range(30)""")
        .selectExpr("item", "v.est").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(freq == Map("0" -> 10L, "1" -> 10L, "2" -> 10L),
        s"freq sketch via extensions returned $freq")
      s2.sql("SELECT graft_bloom_agg(xxhash64(id), 100L, 8192L) AS bf FROM range(50)")
        .createOrReplaceTempView("ext_bloom_bf")
      val misses = s2.sql(
        """SELECT count(*) FROM range(50) r WHERE NOT
           graft_bloom_might((SELECT bf FROM ext_bloom_bf), xxhash64(r.id))""")
        .head.getLong(0)
      assert(misses == 0L, "bloom agg via extensions lost members")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
