package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Similarity, TextAnalysis, TpchReports}

/** Semantic invariants of the round-5 operators (the oracle gate checks
  * value parity; these check the properties that make the values right). */
class Round5OpsSpec extends SparkSpec {

  test("q2: every reported supplier holds the part's min acctbal among region shippers") {
    val rows = TpchReports.q2MinAcctbalSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // recompute the per-part min over the same relation
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val esupp = Tables(spark, sf0001, "supplier")
      .join(Tables(spark, sf0001, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sf0001, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val minByPart = li.join(esupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey")).agg(min(col("s_acctbal")).as("mn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(2) == minByPart(r.getLong(0)),
        s"part ${r.getLong(0)}: ${r.getDouble(2)} != min")
    }
  }

  test("q7: exactly one unordered nation pair appears — the busiest, recomputed") {
    val rows = TpchReports.q7VolumeShipping(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.exists { case (x, y) => x == y }, "self-pairs must be excluded")
    val unordered = pairs.map { case (x, y) => if (x < y) (x, y) else (y, x) }
    assert(unordered.size == 1, s"expected one trading pair, got $unordered")
    // recompute the busiest cross-nation pair independently
    val nat = Tables(spark, sf0001, "nation")
    val counts = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sf0001, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sf0001, "customer"), col("o_custkey") === col("c_custkey"))
      .join(nat.select(col("n_nationkey").as("k1"), col("n_name").as("sn")),
        col("s_nationkey") === col("k1"))
      .join(nat.select(col("n_nationkey").as("k2"), col("n_name").as("cn")),
        col("c_nationkey") === col("k2"))
      .filter(col("sn") =!= col("cn"))
      .groupBy(least(col("sn"), col("cn")).as("a"),
        greatest(col("sn"), col("cn")).as("b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val best = counts.sortBy { case ((a, b), n) => (-n, a, b) }.head
    assert(unordered.head == best._1, s"picked ${unordered.head}, busiest is $best")
    assert(rows.map(_.getLong(4)).sum == best._2,
      "reported line counts must sum to the pair's recomputed total")
  }

  test("q8: market share is nation_rev/total_rev and within [0,1]") {
    val rows = TpchReports.q8MarketShare(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (num, den, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(num <= den + 1e-9)
      assert(share >= 0 && share <= 1)
      assert(math.abs(share - num / den) < 1e-6)
    }
  }

  test("q13: histogram masses sum to the customer count (left join keeps zeros)") {
    val rows = TpchReports.q13OrderDistribution(spark, sf0001).collect()
    val nCust = Tables(spark, sf0001, "customer").count()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("q15: all reported suppliers share the same (maximal) revenue") {
    val rows = TpchReports.q15TopSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDouble(2)).distinct.length == 1)
  }

  test("q21: waiting supplier is the order's unique latest shipper (recomputed)") {
    val rows = TpchReports.q21WaitingSupplier(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // totals: numwait sums to the number of qualifying (order, supplier)
    // pairs, recomputed directly
    val ol = Tables(spark, sf0001, "lineitem")
      .join(Tables(spark, sf0001, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).cast("timestamp").cast("long").as("ship"))
      .collect().groupBy(_.getLong(0))
    val expect = ol.values.count { grp =>
      grp.length > 1 && {
        val mx = grp.map(_.getLong(2)).max
        grp.count(_.getLong(2) == mx) == 1
      }
    }
    // rows are the top-20 by supplier; at sf0.001 supplier count is 100
    // and every qualifying pair lands on some supplier, so compare the
    // full per-supplier recount instead of the truncated sum
    val perSupp = ol.values.flatMap { grp =>
      if (grp.length > 1) {
        val mx = grp.map(_.getLong(2)).max
        val at = grp.filter(_.getLong(2) == mx)
        if (at.length == 1) Some(at.head.getLong(1)) else None
      } else None
    }.groupBy(identity).view.mapValues(_.size).toMap
    assert(perSupp.values.sum == expect)
    rows.foreach { r =>
      val sk = r.getString(0).replace("Supplier#", "").toLong
      assert(perSupp(sk) == r.getLong(1), s"${r.getString(0)}")
    }
  }

  test("q22: reported customers exceed the mean positive balance and lapsed") {
    val rows = TpchReports.q22IdleBalances(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val cust = Tables(spark, sf0001, "customer").collect()
    val pos = cust.map(_.getDouble(3)).filter(_ > 0)
    val mean = pos.sum / pos.length
    // every reported group's average balance is above the mean floor
    rows.foreach { r =>
      assert(r.getDouble(2) / r.getLong(1) > mean,
        s"code ${r.getString(0)} avg below mean")
    }
  }

  test("recall@k: self-eval of the exact ranking is 1.0") {
    // blocked == brute when the block covers the whole corpus; here we
    // check the metric's invariants instead: recall in [0,1], hits <= k
    val rows = Similarity.recallAt10(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10)
      assert(math.abs(r.getDouble(2) - r.getLong(1) / 10.0) < 1e-9)
    }
  }

  test("vocab coverage: top-20 occurrences never exceed the total; coverage in (0,1]") {
    val rows = TextAnalysis.vocabCoverage(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1)
    }
  }

  test("split contamination: leaked pairs really straddle splits (recomputed)") {
    val s = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), md5(substring(col("text"), 1, 64)).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val bySplit = s.groupBy(_._2).filter(_._2.length > 1)
    val rows = TextAnalysis.splitContamination(spark, sf0001).collect()
    // every reported pair count is bounded by the total same-fp pair count
    val totalPairs = bySplit.values.map(g => g.length * (g.length - 1) / 2).sum
    assert(rows.map(_.getLong(2)).sum <= totalPairs)
  }

  test("events anomaly: reported days are >= 2 sigma from their type's mean") {
    val daily = Tables(spark, sf0001, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
    val rows = EventAnalytics.dailyAnomaly(spark, sf0001).collect()
    rows.foreach { r =>
      val grp = daily(r.getString(0)).map(_.getLong(2).toDouble)
      val mean = grp.sum / grp.length
      val sd = math.sqrt(grp.map(x => x * x).sum / grp.length - mean * mean)
      val z = (r.getLong(2) - mean) / sd
      assert(math.abs(z) >= 2 - 1e-9, s"${r.getString(0)} ${r.getString(1)}: z=$z")
      assert(math.abs(r.getDouble(3) - z) < 1e-3)
    }
  }

  test("simhash long form: bit 63-j of the long equals char j of the string form") {
    graft.functions.ExprColumns.register(spark)
    val rows = spark.sql(
      """SELECT graft_simhash64(toks) AS s, graft_simhash64_long(toks) AS l
         FROM VALUES (array('a','b','c')), (array('frame one', 'frame two')),
                     (array('x')), (array('p','q','r','s','t','u','v','w'))
           AS t(toks)""").collect()
    rows.foreach { r =>
      val s = r.getString(0); val l = r.getLong(1)
      (0 until 64).foreach { j =>
        val bit = (l >>> (63 - j)) & 1L
        assert(bit == (if (s.charAt(j) == '1') 1L else 0L),
          s"bit $j: string $s vs long $l")
      }
    }
  }

  test("phash multiprobe blocking is exact: matches the all-pairs hamming filter") {
    import graft.operators.Multimodal
    graft.functions.ExprColumns.register(spark)
    val blocked = Multimodal.phashHamming(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Multimodal.mediaRecords(spark, sf0001).toDF()
      .filter(col("byte_len") > 0)
      .select(col("doc_id"), expr(
        """graft_simhash64_long(array_distinct(transform(
             sequence(0, CAST((byte_len - 1) div 64 AS INT)),
             f -> substring(CAST(payload AS STRING), f * 64 + 1, 64))))""")
        .as("sig")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val allPairs = (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      h = java.lang.Long.bitCount(s1 ^ s2) if h <= 7
    } yield (d1, d2, h.toLong)).toSet
    assert(blocked == allPairs,
      s"blocked ${blocked.size} pairs vs all-pairs ${allPairs.size}")
  }
}
