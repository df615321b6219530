package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Temporal

/** Semantics of the temporal state-maintenance operators. */
class TemporalSpec extends SparkSpec {

  test("mergeUpsert: every action arises and balances reconcile") {
    val m = Temporal.mergeUpsert(spark, sf0001)
    val acts = m.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acts.keySet == Set("update", "insert", "keep"))
    // inserts are exactly the carved-out keys (custkey % 3 == 0) with F orders
    val inserted = m.filter(col("action") === "insert")
      .select("key").collect().map(_.getLong(0))
    assert(inserted.nonEmpty && inserted.forall(_ % 3 == 0))
    // kept rows carry the original balance unchanged
    val kept = m.filter(col("action") === "keep")
    val tgt = Tables(spark, sf0001, "customer")
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"))
    assert(kept.join(tgt, "key")
      .filter(col("new_bal") =!= col("bal")).count() == 0)
  }

  test("scd2History: versions chain without gaps or overlaps") {
    val h = Temporal.scd2History(spark, sf0001).collect()
    val byUser = h.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // exactly one open version per user, and it is the last run
      assert(sorted.dropRight(1).forall(_.getString(4) != "9999-12-31 00:00:00"))
      assert(sorted.last.getString(4) == "9999-12-31 00:00:00")
      // each valid_to equals the next version's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(4) == b.getString(3))
        case _ =>
      }
      // consecutive versions never share an event_type (runs are maximal)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getString(2) != b.getString(2))
        case _ =>
      }
    }
  }

  test("gapFill: spine is dense and fill carries the last observation") {
    val g = Temporal.gapFill(spark, sf0001).collect()
    val types = g.map(_.getString(0)).distinct
    // dense: every type has all 48 hours
    types.foreach { t =>
      assert(g.count(_.getString(0) == t) == 48)
    }
    g.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      var lastAvg = -1.0
      sorted.foreach { r =>
        val n = r.getLong(2); val filled = r.getDouble(3)
        if (n == 0L) assert(filled == lastAvg) // gap carries previous value
        else lastAvg = filled
      }
    }
  }
}
