package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupOps, EventAnalytics, StreamingAnalytics, Subqueries, TextAnalysis}

/** Semantics of the round-3 additions: subquery battery, training-data
  * split / tf-idf / clustering, and the streaming-matches-batch contracts
  * for the new stateful queries. (The oracle gate re-proves all of these
  * against DuckDB; these tests pin the properties that survive a testdata
  * regeneration.) */
class TrainingOpsSpec extends SparkSpec {

  test("dedup_clusters: labels are transitive-closure minima of the pair graph") {
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = DedupOps.dedupClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(n => n -> find(n)).toMap
    assert(clusters.keySet == expected.keySet)
    // same partition: min-label per component
    val expMin = expected.groupBy(_._2).flatMap { case (_, m) =>
      val lbl = m.keys.min; m.keys.map(_ -> lbl)
    }
    assert(clusters == expMin)
  }

  test("split_assign: deterministic, exhaustive, and only the three splits") {
    val a = TextAnalysis.splitAssign(spark, sf0001).collect()
    val b = TextAnalysis.splitAssign(spark, sf0001).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    val total = a.map(_.getLong(2)).sum
    assert(total == Tables(spark, sf0001, "documents").count())
  }

  test("text_tfidf: ranks are 1..k and tfidf is non-increasing within a doc") {
    val rows = TextAnalysis.tfidfTopTerms(spark, sf0001)
      .select("doc_id", "rk", "tfidf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).values.foreach { doc =>
      val byRank = doc.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.size).toSeq)
      assert(byRank.map(_._3).toSeq == byRank.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("subq_scalar_corr decorrelates to the explicit join form") {
    val viaSubquery = Subqueries.scalarCorrelated(spark, sf0001)
    val cust = Tables(spark, sf0001, "customer")
    val stats = cust.groupBy("c_nationkey")
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
    val viaJoin = cust.join(stats, "c_nationkey")
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("n") > col("s"))
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("double").as("acctbal"))
      .orderBy("c_custkey")
    assert(viaSubquery.collect().toSeq == viaJoin.collect().toSeq)
  }

  test("grouping_sets_mix: grand total equals the sum of the detail rows") {
    val rows = Subqueries.groupingSetsMix(spark, sf0001).collect()
    val detail = rows.filter(r => r.getLong(4) == 0 && r.getLong(5) == 0)
    val grand = rows.filter(r => r.getLong(4) == 1 && r.getLong(5) == 1)
    assert(grand.length == 1)
    assert(math.abs(detail.map(_.getDouble(2)).sum - grand.head.getDouble(2)) < 1e-6)
    assert(detail.map(_.getLong(3)).sum == grand.head.getLong(3))
  }

  test("stream_session_windows matches the batch session_window result") {
    val streaming = StreamingAnalytics.streamSessionWindows(spark, sf0001)
    val batch = EventAnalytics.sessionWindows(spark, sf0001)
    assert(streaming.collect().toSeq == batch.collect().toSeq)
  }

  test("stream_join_attribution matches the batch interval join") {
    val streaming = StreamingAnalytics.streamJoinAttribution(spark, sf0001)
    val fmt = "yyyy-MM-dd HH:mm:ss"
    val ev = Tables(spark, sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val batch = p.join(v, col("p_user") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        date_format(col("purchase_ts"), fmt).as("purchase_ts"),
        date_format(col("view_ts"), fmt).as("view_ts"))
      .orderBy("purchase_id", "view_ts")
    assert(streaming.collect().toSeq == batch.collect().toSeq)
  }
}
