package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The remaining classic TPC-H report shapes (Q2/Q4/Q7/Q8/Q9/Q11/Q12/
  * Q13/Q15/Q16/Q17/Q19/Q20/Q21/Q22), adapted to the harness star schema:
  * it has no partsupp table, no l_commitdate/l_receiptdate/l_shipmode,
  * and no c_phone/s_comment, so each query keeps its OPERATOR shape (the
  * thing the inventory grades — groupwise-min correlated lookup,
  * disjunctive pushdown, double-anti EXISTS, HAVING-over-global-fraction,
  * nested-IN dominance, …) over the columns that exist; every adaptation
  * is noted on the method.
  *
  * Shared conventions (see [[Relational]]): money math accumulates in
  * exact DECIMAL and casts to DOUBLE only in the output projection, so
  * shuffle order can never wiggle a sum; dimension joins small enough to
  * broadcast are broadcast explicitly; filters sit directly on the scan
  * side of every join so Catalyst pushes them into the parquet reader.
  */
object TpchReports {

  private def vol: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount")).cast("decimal(4,2)")

  /** Q2 shape — groupwise-min correlated lookup: for each STANDARD part
    * of size <= 10, the EUROPE-region supplier(s) holding the minimum
    * account balance among region suppliers who shipped that part.
    * The part-supplier relation is derived from lineitem (no partsupp
    * table); min-cost becomes min-acctbal. The correlated scalar subquery
    * is expressed as a min WINDOW over the part partition — one shuffle
    * on l_partkey computes the group min AND keeps the rows, where the
    * decorrelated aggregate-join form would evaluate the part-supplier
    * subtree twice and sort-merge the copies (audited: the window plan
    * halves the exchanges of the naive form). */
  def q2MinAcctbalSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ps = Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val esupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    // region suppliers per part; esupp is ~1/5 of a tiny dim -> broadcast
    val partSupp = ps.join(broadcast(esupp),
      col("l_suppkey") === col("s_suppkey"))
    partSupp
      .withColumn("min_bal",
        min(col("s_acctbal")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("s_acctbal") === col("min_bal"))
      .join(broadcast(Tables(spark, dir, "part")
        .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("s_name"), col("s_acctbal"))
      // s_name tiebreaker: (s_acctbal, p_partkey) alone is not a total
      // order when two suppliers of one part tie at the min balance, and
      // a non-total ORDER BY under LIMIT is nondeterministic across
      // engines at the cut boundary.
      .orderBy(col("s_acctbal"), col("p_partkey"), col("s_name"))
      .limit(100)
  }

  /** Q4 shape — order-priority checking via EXISTS: orders placed in
    * 1996H1 having at least one line shipped more than 90 days after the
    * order date (lateness proxy — this schema has no
    * l_commitdate/l_receiptdate), counted by priority. The correlated
    * EXISTS is a LEFT SEMI join whose condition carries the correlated
    * predicate, so each order counts once no matter how many late lines
    * it has — no distinct, no row explosion. The date window is pushed to
    * the orders scan BEFORE the fact-fact semi-join, so only ~1/13 of
    * orders shuffle. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q11 shape — important parts by held value, HAVING-over-global-
    * fraction: per-part revenue from EUROPE-region suppliers, keeping
    * parts whose value exceeds 0.1% of the region total. No partsupp, so
    * "held value" is shipped revenue (vol) rather than
    * ps_supplycost·ps_availqty; nation scope widens to region because a
    * single nation has zero suppliers at the smallest SF. The global
    * total is ONE broadcast scalar row off the already-grouped (part-
    * cardinality) relation — the fraction compare is cross-multiplied in
    * exact decimal (val·1000 > total), no float boundary. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val esupp = Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val value = Tables(spark, dir, "lineitem")
      .join(broadcast(esupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(vol).as("val_dec"))
    val total = value.agg(sum(col("val_dec")).as("total_dec"))
    value.join(broadcast(total))
      .filter(col("val_dec").cast("decimal(28,4)") * lit(1000) > col("total_dec"))
      .select(col("partkey"), col("val_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("partkey"))
  }

  /** Q12 shape — conditional priority aggregation: late-shipped 1997
    * lines (>90 days after order date; no l_shipmode in this schema, so
    * the group key is l_returnflag and lateness replaces the
    * receipt-window filter), counting high- vs low-priority orders per
    * flag in one CASE-WHEN aggregate pass. Both filters sit on the scan
    * sides of the join (shipdate year on lineitem; nothing on orders —
    * its only role is the priority label). */
  def q12PriorityLateness(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** Q16 shape — supplier-count by part attributes with a NOT-IN
    * exclusion: distinct suppliers per (brand, type, size) for parts
    * outside Brand#1/PROMO in selected sizes, excluding low-balance
    * suppliers (the complaint-supplier proxy — no s_comment here). The
    * part-supplier relation derives from lineitem (no partsupp); the
    * NOT IN is a broadcast LEFT ANTI on the tiny excluded-supplier set;
    * COUNT DISTINCT re-uses the (partkey, suppkey) distinct's shuffle. */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    val excluded = Tables(spark, dir, "supplier")
      .filter(col("s_acctbal") < 1500).select(col("s_suppkey"))
    val parts = Tables(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50))
    Tables(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Q20 shape — nested-IN dominance: EUROPE-region suppliers who are
    * the DOMINANT shipper (more than half the 1997 volume) of some
    * "large"-named part. No ps_availqty, so the original's excess-stock
    * threshold (availqty > half of shipped) becomes share-of-shipped
    * dominance — the correlated-aggregate-in-IN shape is identical. One
    * shuffle on l_partkey computes the per-(part, supplier) sums AND the
    * per-part total (window over the grouped relation), exactly the
    * Q2/Q21 derived-relation-shuffles-once pattern; the dominant-supplier
    * key set is dimension-bounded and broadcasts into a semi-join. */
  def q20DominantSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val largeKeys = Tables(spark, dir, "part")
      .filter(col("p_name").like("large%")).select(col("p_partkey"))
    val pq = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(largeKeys), col("l_partkey") === col("p_partkey"),
        "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
    val dominant = pq
      .withColumn("tot", sum(col("q")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("q") * lit(2) > col("tot"))
      .select(col("l_suppkey")).distinct()
    Tables(spark, dir, "supplier")
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, dir, "region")
        .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(dominant), col("s_suppkey") === col("l_suppkey"),
        "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  /** lineitem enriched with supplier + customer nation names — the
    * Q7/Q8 join spine. All four dimension joins broadcast (nation is 25
    * rows, supplier 100·sf, customer 1500·sf — dims stay broadcastable
    * at any sf; the fact table alone scales). */
  private def tradeSpine(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .join(broadcast(Tables(spark, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
          col("n_regionkey").as("cust_regionkey"))),
        col("c_nationkey") === col("cn_key"))

  /** Q7 shape — volume shipping between the two BUSIEST trading nations:
    * revenue by (supplier nation, customer nation, ship year) for both
    * orderings of the top unordered nation pair by cross-nation line
    * count (ties broken by nation name, so the pick is deterministic on
    * every engine). Deriving the pair from the data instead of
    * hardcoding names keeps the query non-empty at every scale factor —
    * a literal pair that trades at sf1 may have zero lines at sf0.001.
    *
    * One pass over the fact table: the full per-(pair, year) aggregate
    * is computed first (bounded by |nation|² × years ≈ a few thousand
    * rows at ANY fact size), then the winning pair is selected with two
    * windows over that tiny relation — the single-partition rank window
    * is safe because its input cardinality is dimension-, not
    * fact-bounded. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agg = tradeSpine(spark, dir)
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(vol).as("rev_dec"), count(lit(1)).as("n"))
    val a = least(col("supp_nation"), col("cust_nation"))
    val b = greatest(col("supp_nation"), col("cust_nation"))
    agg
      .withColumn("pair_total", sum(col("n")).over(Window.partitionBy(a, b)))
      .withColumn("rk",
        dense_rank().over(Window.orderBy(col("pair_total").desc, a, b)))
      .filter(col("rk") === 1)
      .select(col("supp_nation"), col("cust_nation"), col("yr"),
        col("rev_dec").cast("double").as("revenue"), col("n"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
  }

  /** Q8 shape — market share: NATION_2 suppliers' fraction of all revenue
    * flowing to ASIA-region customers, per order year. The conditional
    * numerator and the total accumulate in the same decimal aggregate
    * pass; the ratio is a final double expression (identical formula in
    * the oracle, so the hash compare is exact). */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val asia = broadcast(Tables(spark, dir, "region")
      .filter(col("r_name") === "ASIA").select(col("r_regionkey")))
    val nationRev = sum(when(col("supp_nation") === "NATION_2", vol)
      .otherwise(lit(0).cast("decimal(16,4)")))
    tradeSpine(spark, dir)
      .join(asia, col("cust_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(nationRev.cast("double").as("nation_rev"),
        sum(vol).cast("double").as("total_rev"))
      .withColumn("mkt_share",
        round(col("nation_rev") / col("total_rev"), 6))
      .orderBy(col("yr"))
  }

  /** Q9 shape — product-type profit by supplier nation and year. With no
    * partsupp.ps_supplycost, cost is proxied as 10% of p_retailprice per
    * unit; profit = revenue - cost, exact decimal throughout. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val profit = vol -
      col("p_retailprice").cast("decimal(12,2)") *
        col("l_quantity").cast("decimal(12,2)") * expr("CAST(0.1 AS DECIMAL(3,1))")
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")
        .filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("l_shipdate")).cast("long").as("yr"))
      .agg(sum(profit).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("yr"))
  }

  /** Q13 shape — customer order-count distribution: LEFT OUTER join
    * customers to their non-urgent orders (the join predicate carries the
    * filter, so customers with only urgent orders count as zero), then a
    * two-level aggregation into a histogram of customers per order count. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables(spark, dir, "customer")
      .join(Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    perCust.groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_customers").desc, col("n_orders").desc)
  }

  /** Q15 shape — top supplier(s) by revenue in 1997Q1: the grouped
    * revenue view is compared against its own scalar max (the "create
    * view" of the original). The max is one broadcast row; revenue
    * equality compares DECIMAL to DECIMAL (exact), casting to double
    * only for output. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(sum(vol).as("total_rev_dec"))
    val mx = rev.agg(max(col("total_rev_dec")).as("mx"))
    rev.join(broadcast(mx), col("total_rev_dec") === col("mx"))
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev_dec").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17 shape — small-quantity revenue: lines of Brand#3 parts whose
    * quantity is below 20% of that part's average quantity. The
    * correlated AVG decorrelates to a per-part (sum, count) aggregate;
    * the threshold compare is cross-multiplied (qty·5·cnt < sum_qty) so
    * it stays in exact integer/decimal math — no division, no float
    * boundary wobble. Reported as the count + the classic avg-yearly
    * figure.
    *
    * Scale: only Brand#3 parts are ever probed, so the per-part
    * pre-aggregate is built over lineitem SEMI-JOINED to the broadcast
    * Brand#3 key set first — without that prune the aggregate shuffles
    * the full fact table to compute averages for ~96% of parts that the
    * probe then discards. The pruned `pq` is Brand#3-part-cardinality
    * sized (dimension scale), so it broadcasts and the probe side never
    * re-shuffles. Plan shape asserted in PlanAuditSpec. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val b3keys = Tables(spark, dir, "part")
      .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))
    val li = Tables(spark, dir, "lineitem")
      .join(broadcast(b3keys), col("l_partkey") === col("p_partkey"), "left_semi")
    val pq = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        count(lit(1)).as("cnt"))
    li.join(broadcast(pq), col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast("decimal(18,2)") * lit(5) * col("cnt") <
        col("sum_qty"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice").cast("decimal(14,2)"))
          .cast("double") / 7.0, 6).as("avg_yearly"))
  }

  /** Q19 shape — disjunctive predicate revenue: three OR'd (brand,
    * size-range, quantity-range) blocks across the part-lineitem join.
    * Catalyst extracts the common-prefix filters it can push (brand IN,
    * size/quantity bounds) below the join; the full disjunction applies
    * post-join. One scan each side, one broadcast join, one agg row. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    def block(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand &&
        col("p_size").between(szLo, szHi) && col("l_quantity").between(qLo, qHi)
    Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .filter(block("Brand#1", 1, 15, 1, 20) ||
        block("Brand#2", 10, 30, 10, 30) ||
        block("Brand#3", 20, 50, 20, 40))
      .agg(count(lit(1)).as("n_lines"), sum(vol).cast("double").as("revenue"))
  }

  /** Q21 shape — the supplier who kept the order waiting: per finished
    * ('F') order, suppliers whose latest ship date is the order's STRICT
    * maximum, on orders served by more than one supplier. The original's
    * EXISTS / NOT EXISTS pair becomes three window aggregates over ONE
    * okey partition (supplier count, max ship, count-at-max) — the
    * aggregate-join form would evaluate the per-(order, supplier)
    * relation twice and sort-merge the copies; the window form shuffles
    * it once (audited). The oracle keeps the correlated double-anti form
    * so the gate proves the two formulations equivalent. No
    * l_receiptdate/l_commitdate in this schema: "kept waiting" is
    * proxied by shipping last. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ol = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("okey"), col("l_suppkey").as("skey"))
      .agg(max(col("l_shipdate")).as("ship"))
    val w = Window.partitionBy(col("okey"))
    ol.withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("max_ship", max(col("ship")).over(w))
      .withColumn("n_at_max",
        sum(when(col("ship") === col("max_ship"), 1L).otherwise(0L)).over(w))
      .filter(col("n_supp") > 1 && col("ship") === col("max_ship") &&
        col("n_at_max") === 1)
      .join(broadcast(Tables(spark, dir, "supplier")),
        col("skey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q22 shape — lapsed high-balance customers: customers with no order
    * since 2000 (anti-join) whose balance exceeds the mean positive
    * balance (one broadcast scalar, compared cross-multiplied in exact
    * decimal: bal·n > sum), grouped by a customer-code digit. c_phone
    * does not exist here; the "country code" is the last digit of
    * c_name's fixed-width numeric suffix. */
  def q22IdleBalances(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val recent = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
    cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(pos))
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .groupBy(substring(col("c_name"), 18, 1).as("code"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy(col("code"))
  }
}
