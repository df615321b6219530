package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, Quality, Similarity}

/** Round-11 operators: driver-side first-principles recomputations for
  * the algorithm-agreement CC gate, the Bloom FPR census, and the
  * mergeable quantile-sketch rung. */
class Round11OpsSpec extends SparkSpec {

  test("dedup_cc_agreement equals a first-principles union-find census " +
    "and reports zero label mismatches") {
    // ground truth: collect the SAME k-NN edge relation and run a plain
    // union-find over it — no Spark machinery shared with either CC
    // implementation under test
    val edges = Similarity.knnEdges(spark, sf0001, 3)
      .select(col("v1"), col("v2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val sizes = parent.keys.toSeq.groupBy(find).values
      .map(_.length.toLong).toSeq
    val expected = sizes.groupBy(identity).map { case (sz, g) =>
      (sz, g.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = DedupOps.ccAgreement(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.map(g => (g._1, g._2)) === expected, "propagation census")
    assert(got.map(g => (g._1, g._3)) === expected, "star census")
    assert(got.forall(_._4 == 0L), "per-vertex label agreement")
  }

  test("dedup_bloom_fpr counts match the exact split and the observed " +
    "FPR sits far inside both the design and theoretical bounds") {
    val docs = Tables(spark, sf0001, "documents")
      .select(substring(col("text"), 1, 32).as("fp"),
        substring(col("source"), 4, 8).cast("int").as("sn"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val corpus = docs.filter(_._2 < 10).map(_._1).toSet
    val batch = docs.filter(_._2 >= 10).map(_._1).toSet
    val row = DedupOps.bloomFprCensus(spark, sf0001).collect().head
    assert(row.getAs[Long]("n_probes") === batch.size.toLong)
    assert(row.getAs[Long]("n_true_dup") === (batch & corpus).size.toLong)
    // no false negatives: every true dup must be bloom-positive
    assert(row.getAs[Long]("n_bloom_pos") >= row.getAs[Long]("n_true_dup"))
    assert(row.getAs[Boolean]("within_design_fpp"))
    // theoretical fpp for 4M bits / k=29 hashes (Spark's
    // round(m/n·ln2) at the 100k-item estimate) at this insert count:
    // expected false positives over the true-negative population are
    // far below one, so the observed count must be exactly zero
    val theory = math.pow(
      1.0 - math.exp(-29.0 * corpus.size / 4194304.0), 29.0)
    val trueNeg = batch.size - (batch & corpus).size
    assert(theory * trueNeg < 0.001)
    assert(row.getAs[Long]("n_false_pos") === 0L)
  }

  test("sketch_quantiles exact side equals a sorted-array ceil-rank " +
    "recomputation and every sketch verdict is within bound") {
    val vals = Tables(spark, sf0001, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vals.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      Seq(25L, 50L, 75L).map { pct =>
        val k = (pct * n + 99) / 100
        ((g, pct), (n, sorted((k - 1).toInt)))
      }
    }
    val got = Quality.sketchQuantiles(spark, sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val (n, q) = expected(key)
      assert(r.getAs[Long]("n_rows") === n, s"$key n_rows")
      assert(r.getAs[Long]("exact_quantile_c") === q, s"$key quantile")
      assert(r.getAs[Boolean]("sketch_within_bound"), s"$key sketch bound")
    }
  }
}
