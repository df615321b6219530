package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Subquery battery — the SQL surface the reference lacks entirely (its
  * only "SQL" is two f-string-interpolated ClickHouse statements,
  * main.py:173,185). Each query here exercises one Catalyst subquery
  * rewrite on the way to a join-based physical plan:
  *
  *  - correlated scalar subqueries -> `RewriteCorrelatedScalarSubquery`
  *    (decorrelated into an aggregate + left outer join);
  *  - `EXISTS` -> left semi join; `IN` -> left semi, `NOT IN` -> null-aware
  *    left anti join (`RewritePredicateSubquery`);
  *  - `GROUPING SETS` -> `Expand`.
  *
  * Scale posture: every rewrite lands on the same shuffled-join machinery
  * the explicit-join queries use (broadcast under threshold, sort-merge
  * above, AQE re-plans at runtime), so none of these is a driver-side
  * loop; the correlated forms cost exactly one extra aggregate over the
  * correlation key. Numeric comparisons that gate rows are done in exact
  * DECIMAL on both engines so a last-ulp double difference can never flip
  * a filter (see the oracle-compat conventions in [[graft.SparkEntry]]).
  */
object Subqueries {

  private def view(spark: SparkSession, dir: String, name: String): Unit =
    Tables(spark, dir, name).createOrReplaceTempView(s"graft_$name")

  /** Correlated scalar subqueries: customers with an account balance above
    * their nation's customer average. The avg comparison is expressed as
    * `bal * count > sum` in DECIMAL so both engines compare exactly
    * (Spark's AVG(decimal) and DuckDB's AVG return different types). Two
    * correlated scalars over the same key decorrelate into ONE aggregate
    * thanks to `MergeScalarSubqueries`. */
  def scalarCorrelated(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "customer")
    spark.sql("""
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal
      FROM graft_customer c
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM graft_customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM graft_customer c3
             WHERE c3.c_nationkey = c.c_nationkey)
      ORDER BY c_custkey
    """)
  }

  /** Correlated EXISTS (TPC-H Q4 shape): priorities of orders having at
    * least one line item shipped >90 days after the order date. Rewritten
    * to a left semi join on l_orderkey; the correlated non-equi condition
    * rides along as the join's extra predicate. */
  def existsLateShip(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders"); view(spark, dir, "lineitem")
    spark.sql("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM graft_orders o
      WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM graft_lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
  }

  /** IN + NOT IN on the same probe: parts that appear on a premium line
    * item but never on a max-quantity one. IN -> left semi; NOT IN ->
    * null-aware left anti (l_partkey is non-null, so the null-aware path
    * degenerates to a plain anti join at runtime). */
  def inNotIn(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "part"); view(spark, dir, "lineitem")
    spark.sql("""
      SELECT p_partkey, p_name
      FROM graft_part
      WHERE p_partkey IN (SELECT l_partkey FROM graft_lineitem
                          WHERE l_extendedprice > 104000)
        AND p_partkey NOT IN (SELECT l_partkey FROM graft_lineitem
                              WHERE l_quantity >= 50)
      ORDER BY p_partkey
    """)
  }

  /** HAVING over a grouped subquery joined back to the dimension (TPC-H
    * Q18 shape): customers whose lifetime order value crosses a threshold.
    * The HAVING filter runs on the aggregate BEFORE the join, so only
    * qualifying groups shuffle to the customer side. */
  def havingBigSpenders(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "customer"); view(spark, dir, "orders")
    spark.sql("""
      SELECT c_custkey, c_name, CAST(t.total_dec AS DOUBLE) AS total_spent,
             t.n_orders
      FROM graft_customer c JOIN (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM graft_orders GROUP BY o_custkey
        HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 3500000
      ) t ON c.c_custkey = t.o_custkey
      ORDER BY c_custkey
    """)
  }

  /** Explicit non-hierarchical GROUPING SETS — ((rf,ls),(ls),()) is
    * neither a rollup nor a cube, so it exercises the raw Expand path.
    * The fact table is pre-aggregated to the full (rf,ls) key first
    * (6 rows at any scale factor) and the sets re-aggregate those exact
    * DECIMAL partials, so Expand multiplies 6 rows instead of the whole
    * fact table — re-aggregability of SUM/COUNT partials is the same
    * property map-side combine relies on at 100 TB. */
  def groupingSetsMix(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql("""
      WITH base AS (
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1-l_discount AS DECIMAL(4,2))) AS rev,
               COUNT(*) AS cnt
        FROM graft_lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(rev) AS DOUBLE) AS revenue, SUM(cnt) AS n,
             CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
      FROM base
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
      ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)
  }

  /** Boolean aggregates + ordered LISTAGG (SQL:2023 surface, added in
    * Spark 4): bool_and / bool_or / count_if and a deterministic
    * within-group-ordered distinct string aggregation. All partial-merge
    * cleanly (bool aggs are AND/OR monoids; listagg merges sorted runs),
    * so map-side combine applies as usual. */
  def aggBoolListagg(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "orders")
    spark.sql("""
      SELECT o_orderpriority,
        bool_and(o_orderstatus = 'F') AS all_f,
        bool_or(o_orderstatus = 'P') AS any_p,
        count_if(o_orderstatus = 'O') AS n_open,
        listagg(DISTINCT o_orderstatus, ',')
          WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
      FROM graft_orders GROUP BY 1 ORDER BY 1
    """)
  }

  /** LATERAL correlated subquery with ORDER BY + LIMIT: top-3 customers
    * by balance per nation. Catalyst decorrelates the limit-per-group
    * into a partitioned rank filter (`RewriteLateralSubquery`), i.e. the
    * same physical plan as an explicit window — but expressed in the SQL
    * form users port from Postgres/DuckDB. Tie-broken on c_custkey so the
    * result is deterministic. */
  def lateralTopn(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "nation")
    view(spark, dir, "customer")
    spark.sql("""
      SELECT n_name, t.c_custkey,
             CAST(t.c_acctbal AS DOUBLE) AS acctbal
      FROM graft_nation,
      LATERAL (SELECT c_custkey, c_acctbal FROM graft_customer
               WHERE c_nationkey = n_nationkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
      ORDER BY n_name, acctbal DESC, c_custkey
    """)
  }
}
