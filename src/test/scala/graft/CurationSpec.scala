package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, DedupOps}

/** Round 7 wave 2: curation selection/profiling passes. Value-level
  * correctness is the DuckDB oracle gate's job; these pin the structural
  * invariants the hash compare can't express (superset relations,
  * partition-of-counts, sign/monotonicity of scores).
  */
class CurationSpec extends SparkSpec {

  test("dsir: English documents score higher than non-English on average") {
    // k large enough to rank every doc at sf0.001 (500 docs)
    val all = Curation.dsirWeights(spark, sf0001, k = 100000).collect()
    assert(all.length == Tables(spark, sf0001, "documents").count())
    val (en, other) = all.partition(_.getString(1) == "en")
    assert(en.nonEmpty && other.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getDouble(3)).sum / rs.length
    assert(mean(en) > mean(other),
      "target-distribution docs must rank above the raw mixture on average")
    // enrichment: the head of the ranking holds more target-lang docs
    // than the tail (the corpus is near-uniform word soup, so demand
    // monotone enrichment rather than outright majority)
    val ranked = all.sortBy(r => (-r.getDouble(3), r.getLong(0)))
    val head = ranked.take(100).count(_.getString(1) == "en")
    val tail = ranked.takeRight(100).count(_.getString(1) == "en")
    assert(head > tail)
  }

  test("prefix census is a superset of the exact-dup relation") {
    val prefixGroups = Curation.dedupPrefix(spark, sf0001).collect()
    assert(prefixGroups.forall(_.getLong(1) >= 2))
    val exactDupGroups = DedupOps.dedupExact(spark, sf0001)
      .filter(col("n_copies") > 1).count()
    // identical texts share any prefix, so every exact group collides here;
    // distinct texts can also collide, so prefix mass is >= exact dup mass
    val prefixMass = prefixGroups.map(_.getLong(1)).sum
    // sf0.001 may hold zero exact dups — SUM over an empty set is NULL
    val exactMassRow = DedupOps.dedupExact(spark, sf0001)
      .filter(col("n_copies") > 1).agg(sum(col("n_copies")))
      .collect()(0)
    val exactMass = if (exactMassRow.isNullAt(0)) 0L else exactMassRow.getLong(0)
    assert(prefixGroups.length >= exactDupGroups)
    assert(prefixMass >= exactMass)
  }

  test("length histogram partitions the corpus; buckets bound their contents") {
    val h = Curation.lengthHistogram(spark, sf0001).collect()
    val docs = Tables(spark, sf0001, "documents")
    assert(h.map(_.getLong(3)).sum == docs.count())
    // per-lang shares sum to ~1
    h.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val s = rows.map(_.getDouble(5)).sum
      assert(math.abs(s - 1.0) < 1e-4)
    }
    // every doc's n_chars sits inside [bucket_lo, 2*bucket_lo)
    val viaBuckets = h.map(r => (r.getString(0), r.getInt(1))).toSet
    val recomputed = docs
      .select(col("lang"), (length(bin(col("n_chars"))) - 1).cast("int"))
      .distinct().collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(viaBuckets == recomputed)
    h.foreach { r =>
      assert(r.getLong(2) == (1L << r.getInt(1)))
      assert(r.getLong(4) >= r.getLong(2) * r.getLong(3),
        "total chars below bucket floor * count")
    }
  }

  test("zipf fit: negative slope, intercept near ln(top frequency)") {
    val r = Curation.zipfFit(spark, sf0001).collect()(0)
    val slope = r.getDouble(1)
    assert(slope < 0.0, "frequency must decay with rank")
    // intercept is the fit's ln(freq) at rank 1: same order of magnitude
    // as the observed top word's ln frequency
    val topFreq = Tables(spark, sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).count().agg(max(col("count")))
      .collect()(0).getLong(0)
    assert(math.abs(r.getDouble(2) - math.log(topFreq.toDouble)) < 2.0)
  }

  test("quality quantile gate: kept+dropped partition each source; kept >= half") {
    val rows = Curation.qualityQuantile(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, dropped) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(kept + dropped == n)
      // at least floor(n/2) values sit at or above an interpolated median
      assert(kept >= n / 2)
      assert(r.getDouble(2) > 0)
    }
  }
}
