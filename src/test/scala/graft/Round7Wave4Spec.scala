package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, EventAnalytics, Graph}

/** Round 7 wave 4: LPA communities, dedup blocking-recall evaluation,
  * robust (median/MAD) outlier census. Values are the oracle gate's job;
  * these pin cross-operator consistency and the structural invariants.
  */
class Round7Wave4Spec extends SparkSpec {

  test("label propagation: total node coverage, self-labeled communities exist") {
    val got = Graph.labelPropNations(spark, sf0001).collect()
    val nNations = Tables(spark, sf0001, "nation").count()
    assert(got.length == nNations,
      "every nation must land in exactly one community")
    assert(got.map(_.getInt(0)).distinct.length == got.length)
    // labels are node ids by construction
    val nodes = got.map(_.getInt(0)).toSet
    assert(got.forall(r => nodes.contains(r.getInt(1))))
    // the strong-edge gate must leave real structure: more than one
    // community, fewer than one-per-node (pure singletons would mean the
    // gate dropped every edge)
    val nComm = got.map(_.getInt(1)).distinct.length
    assert(nComm > 1 && nComm < got.length,
      s"expected non-trivial bloc structure, got $nComm communities")
  }

  test("label propagation is deterministic across runs") {
    val a = Graph.labelPropNations(spark, sf0001).collect().map(_.toSeq)
    val b = Graph.labelPropNations(spark, sf0001).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("recall eval agrees with the verified LSH pair set") {
    val r = DedupOps.dedupRecallEval(spark, sf0001).collect()(0)
    val (nTrue, nCand, nCaught) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nCaught <= nTrue && nCaught <= nCand)
    // caught = truth ∩ candidates; the verified LSH output applies the
    // SAME jaccard >= 0.5 filter to the SAME candidate set, so the two
    // must be the same set of pairs
    val verified = DedupOps.minhashLshPairs(spark, sf0001).count()
    assert(nCaught == verified,
      s"caught $nCaught != verified LSH pairs $verified")
    if (nTrue > 0) {
      val recall = r.getDouble(3)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - nCaught.toDouble / nTrue) < 1e-9)
    }
  }

  test("incremental minhash: best matches are a per-doc argmax over the " +
    "verified cross-half LSH pairs") {
    val got = DedupOps.minhashIncrementalDedup(spark, sf0001).collect()
    val sn = Tables(spark, sf0001, "documents")
      .select(col("doc_id"),
        substring(col("source"), 4, 8).cast("int").as("sn")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // output directionality: doc_id is always a batch doc, match_doc corpus
    got.foreach { r =>
      assert(sn(r.getLong(0)) >= 10 && sn(r.getLong(1)) < 10)
      assert(r.getDouble(2) >= 0.5)
    }
    assert(got.map(_.getLong(0)).distinct.length == got.length,
      "one best match per batch doc")
    // the full within-corpus LSH pair set restricted to cross-half pairs
    // must contain every reported match, and the reported batch docs must
    // be exactly the batch side of that restriction
    val all = DedupOps.minhashLshPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cross = all.filter { case (a, b) => (sn(a) >= 10) != (sn(b) >= 10) }
      .map { case (a, b) => if (sn(a) >= 10) (a, b) else (b, a) }
    assert(got.nonEmpty, "fixture lost its cross-half near-dups")
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet
      .subsetOf(cross.toSet))
    assert(got.map(_.getLong(0)).toSet == cross.map(_._1).toSet)
  }

  test("substring removal: islands match a naive interval union; census sandwich") {
    val k = 20
    val got = graft.operators.TextAnalysis.substringRemoval(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    got.values.foreach { case (_, total, removed, kept) =>
      assert(removed + kept == total && removed >= 0)
    }
    // sandwich vs the census: every shared window occurrence covers at
    // least 1 and at most k tokens of the union
    val census = graft.operators.TextAnalysis.substringDupCensus(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap // shared_mass
    got.foreach { case (src, (_, _, removed, _)) =>
      val mass = census(src) // = #distinct shared start positions
      // sorted starts strictly increase, so each extends the union by at
      // least 1 token and at most k — mass <= union <= k * mass
      assert(removed >= mass,
        s"$src union $removed below the one-token-per-start floor $mass")
      assert(removed <= k * mass,
        s"$src union $removed exceeds k x occurrences ${k * mass}")
    }
    // independent recompute: collect the shared window starts and union
    // the [pos, pos+k) intervals naively per doc
    import graft.functions.ExprColumns
    val win = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        posexplode(ExprColumns.gramHashes(spark, "text", k)).as(Seq("pos", "fp")))
    val shared = win.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("nd")).filter(col("nd") > 1)
      .select(col("fp"))
    val starts = win.join(shared, Seq("fp"), "left_semi")
      .select(col("source"), col("doc_id"), col("pos")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val naive = starts.groupBy(t => (t._1, t._2)).toSeq.map { case ((src, _), rs) =>
      val ps = rs.map(_._3).sorted
      var covered = 0L; var end = -1
      ps.foreach { p =>
        covered += (if (p >= end) k else (p + k) - end); end = p + k
      }
      src -> covered
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    got.foreach { case (src, (_, _, removed, _)) =>
      assert(naive.getOrElse(src, 0L) == removed,
        s"$src: naive union ${naive.getOrElse(src, 0L)} != operator $removed")
    }
    assert(got.values.map(_._3).sum > 0, "fixture lost its shared windows")
  }

  test("semantic quality: scores are valid cosines and anchor-label docs " +
    "score higher on average") {
    val all = graft.operators.Similarity
      .semanticQuality(spark, sf0001, k = 100000).collect()
    val nDocs = Tables(spark, sf0001, "documents").count()
    assert(all.length == nDocs, "with k >= corpus the queue ranks every doc")
    all.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    val labels = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (anchor, rest) = all.partition(r => labels(r.getLong(0)) == 0)
    assert(anchor.nonEmpty && rest.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(3)).sum / rs.length
    assert(mean(anchor) > mean(rest),
      "docs sharing the anchor label must look more anchor-like on average")
  }

  test("robust outliers: totals partition events; brute-force check of one group") {
    val got = EventAnalytics.robustOutliers(spark, sf0001).collect()
    val evTotal = Tables(spark, sf0001, "events").count()
    assert(got.map(_.getLong(1)).sum == evTotal)
    got.foreach { r =>
      assert(r.getDouble(3) >= 0.0, "MAD is nonnegative")
      assert(r.getLong(4) < r.getLong(1),
        "a >50% outlier rate contradicts the MAD breakdown point")
    }
    // brute-force one group with the same interpolated percentile
    val vs = Tables(spark, sf0001, "events")
      .filter(col("event_type") === "click")
      .select(col("value").cast("double")).collect().map(_.getDouble(0)).sorted
    def pct50(xs: Array[Double]): Double = {
      val pos = 0.5 * (xs.length - 1)
      val lo = pos.toInt
      if (lo == pos) xs(lo) else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    val med = pct50(vs)
    val mad = pct50(vs.map(v => math.abs(v - med)).sorted)
    val nOut = vs.count(v => math.abs(v - med) > 3 * 1.4826 * mad)
    val row = got.find(_.getString(0) == "click").get
    assert(math.abs(row.getDouble(2) - math.rint(med * 1e4) / 1e4) < 1e-9)
    assert(math.abs(row.getDouble(3) - math.rint(mad * 1e4) / 1e4) < 1e-9)
    assert(row.getLong(4) == nOut.toLong)
  }
}
