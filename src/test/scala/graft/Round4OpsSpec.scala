package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Multimodal, Quality, Relational, Similarity, TextAnalysis}

/** Semantic invariants of the round-4 operators (the oracle gate checks
  * value parity; these check the properties that make the values right). */
class Round4OpsSpec extends SparkSpec {

  test("normalize_text: NFC composes, strip_accents removes marks, casefold lowers") {
    graft.functions.ExprColumns.register(spark)
    val row = spark.sql(
      """SELECT graft_normalize_text('Café', 'nfc') AS nfc,
                graft_normalize_text('Café naïve', 'strip_accents') AS stripped,
                graft_normalize_text('HeLLo É', 'casefold') AS folded,
                graft_normalize_text(CAST(NULL AS STRING), 'nfc') AS n""").head
    assert(row.getString(0) == "Café")          // e + U+0301 -> é
    assert(row.getString(1) == "Cafe naive")         // marks dropped
    assert(row.getString(2) == "hello é")
    assert(row.isNullAt(3))
  }

  test("normalize_text: nfc is idempotent and length-shrinking on decomposed input") {
    graft.functions.ExprColumns.register(spark)
    val r = spark.sql(
      """SELECT graft_normalize_text(s, 'nfc') AS once,
                graft_normalize_text(graft_normalize_text(s, 'nfc'), 'nfc') AS twice,
                length(s) AS lr, length(graft_normalize_text(s, 'nfc')) AS ln
         FROM (SELECT 'abéc naïf' AS s)""").head
    assert(r.getString(0) == r.getString(1))
    assert(r.getInt(3) < r.getInt(2))
  }

  test("pagerank: probabilities positive, total mass in (0.15, 1] (dangling loss)") {
    val pr = Graph.pagerankNations(spark, sf0001).collect()
    assert(pr.length == 25)
    assert(pr.forall(_.getDouble(1) > 0))
    // mass below 1 is the documented dangling leak (nations without
    // suppliers emit nothing); the teleport term alone guarantees 0.15
    val mass = pr.map(_.getDouble(1)).sum
    assert(mass <= 1.0 + 1e-6, s"mass $mass")
    assert(mass > 0.15, s"mass $mass below the teleport floor")
    // every node receives at least the teleport share
    assert(pr.forall(_.getDouble(1) >= 0.15 / 25 - 1e-9))
  }

  test("kmeans assignment: partitions the corpus, seeds self-assign") {
    val e = Tables(spark, sf0001, "embeddings")
    val n = e.count()
    val out = Similarity.kmeansAssignIter(spark, sf0001).collect()
    assert(out.map(_.getLong(1)).sum == n)
    // every vector's similarity to its own embedding is maximal, so each
    // seed lands in its own cluster: all 8 seeds appear as seed_ids
    assert(out.map(_.getLong(0)).toSet.size == 8)
    assert(out.forall(r => r.getDouble(2) <= 1.0 + 1e-6))
  }

  test("q18: every reported order's quantity exceeds the HAVING bound") {
    val rows = Relational.q18LargeOrders(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(5) > 250.0))
  }

  test("dq_checks: clean synthetic corpus has zero violations, full coverage") {
    val rows = Quality.dqChecks(spark, sf0001).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) == 0L),
      rows.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(","))
    assert(rows.forall(_.getLong(2) > 0L))
  }

  test("bigram lift/pmi: pmi = ln(lift) and pair counts meet the floor") {
    val rows = TextAnalysis.bigramPmi(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 5)
      val lift = r.getDouble(3); val pmi = r.getDouble(4)
      assert(math.abs(math.log(lift) - pmi) < 2e-4,
        s"pmi $pmi vs ln(lift) ${math.log(lift)}")
    }
  }

  test("phash hamming: reported pairs ordered and within the distance bound") {
    val rows = Multimodal.phashHamming(spark, sf0001).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 8))
  }

  test("phash signature: identical frame sets collide; shared frames keep distance small") {
    graft.functions.ExprColumns.register(spark)
    // 16 shared frames + 1 differing frame: the signature majority vote
    // keeps most bits, so hamming is well under the 32 expected of
    // unrelated signatures (and identical sets are bit-identical)
    val base = (1 to 16).map(i => s"'frame_$i'").mkString(",")
    val r = spark.sql(
      s"""SELECT graft_simhash64(array($base)) AS s1,
                 graft_simhash64(array($base)) AS s1b,
                 graft_simhash64(array($base, 'frame_x')) AS s2""").head
    assert(r.getString(0) == r.getString(1))
    val ham = r.getString(0).zip(r.getString(2)).count { case (a, b) => a != b }
    assert(ham < 20, s"one differing frame moved $ham of 64 bits")
  }

  test("transitions: per-source probabilities sum to 1") {
    val rows = operators.EventAnalytics.eventTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val tot = rs.map(_.getDouble(3)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$from sums to $tot")
    }
  }

  test("q14: promo share within [0,100] and promo_rev <= total_rev") {
    val rows = Relational.q14PromoRevenue(spark, sf0001).collect()
    assert(rows.length == 12)
    rows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-9)
      val pct = r.getDouble(3)
      assert(pct >= 0 && pct <= 100)
    }
  }

  test("int8 quantization: saturated lanes exist, reconstruction error bounded by half-step") {
    val rows = Similarity.quantizeInt8(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every vector's max-abs lane quantizes to exactly +/-127, so each
    // label group saturates at least one lane
    assert(rows.forall(_.getLong(3) >= 1))
    // |x - q/scale| <= 0.5/scale = 0.5*maxabs/127; maxabs is bounded by
    // the corpus (embeddings are unit-ish), so err < 0.05 is a safe bound
    assert(rows.forall(_.getDouble(4) < 0.05),
      rows.map(_.getDouble(4)).max.toString)
  }

  test("star contraction equals plain propagation on the corpus graph") {
    val a = operators.DedupOps.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = operators.DedupOps.dedupClustersStar(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("star contraction: correct components on random graphs (vs union-find)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("d1", "d2")
      val got = operators.DedupOps.starComponents(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expect = nodes.map { v =>
        v -> nodes.filter(u => find(u) == find(v)).min
      }.toMap
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("mode/median: mode is the true per-group argmax of value counts") {
    val o = Tables(spark, sf0001, "orders")
    val expect = o.groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (p, rs) =>
        p -> rs.map(r => (r.getLong(2), r.getString(1))).max
      }
    val got = Relational.aggModeMedian(spark, sf0001).collect()
    got.foreach { r =>
      assert(r.getString(1) == expect(r.getString(0))._2,
        s"mode mismatch for ${r.getString(0)}")
    }
  }
}
