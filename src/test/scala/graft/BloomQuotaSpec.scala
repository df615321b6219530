package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, DedupOps}

/** Round 7 wave 3: Bloom-prefiltered incremental dedup + per-source quota
  * sampling. The DuckDB oracle gate pins values; these pin the invariants
  * the gate can't see — prefilter transparency (the Bloom stage must not
  * change the exact answer), the no-false-negative Bloom property probed
  * directly, and quota/rank structure.
  */
class BloomQuotaSpec extends SparkSpec {

  test("bloom prefilter is transparent: output equals the plain exact join") {
    val got = DedupOps.bloomPrefilterDedup(spark, sf0001).collect()
    // recompute without any bloom: straight left join on the fingerprint
    val docs = Tables(spark, sf0001, "documents")
      .withColumn("sn", substring(col("source"), 4, 8).cast("int"))
      .withColumn("fp", substring(col("text"), 1, 32))
    val corpusFps = docs.filter(col("sn") < 10).select(col("fp")).distinct()
      .withColumn("hit", lit(1))
    val expected = docs.filter(col("sn") >= 10)
      .join(corpusFps, Seq("fp"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_dup"))
      .orderBy(col("source"))
      .collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getLong(1) == e.getLong(1), s"n_docs mismatch at ${g.getString(0)}")
      // the no-false-negative check: n_dup counted THROUGH the bloom
      // candidates must equal the bloom-free exact count
      assert(g.getLong(2) == e.getLong(2), s"n_dup mismatch at ${g.getString(0)}")
      assert(g.getLong(3) == g.getLong(1) - g.getLong(2), "n_new must balance")
    }
    // the halves must actually overlap at this sf or the test is vacuous
    assert(got.map(_.getLong(2)).sum > 0, "fixture lost its cross-half dups")
  }

  test("graft_bloom_agg has no false negatives and bounded false positives") {
    graft.functions.ExprColumns.register(spark)
    spark.range(1000).select(col("id"))
      .createOrReplaceTempView("bloom_prop_keys")
    spark.sql(
      """SELECT graft_bloom_agg(xxhash64(id), 10000L, 262144L) AS bf
         FROM bloom_prop_keys""").createOrReplaceTempView("bloom_prop_bf")
    // every inserted key must probe true (the Bloom contract)...
    val misses = spark.sql(
      """SELECT count(*) AS n FROM bloom_prop_keys
         WHERE NOT graft_bloom_might((SELECT bf FROM bloom_prop_bf),
           xxhash64(id))""").collect()(0).getLong(0)
    assert(misses == 0L, s"bloom false negatives: $misses")
    // ...and of 10k disjoint keys, nearly all must probe false (at 26
    // bits/item the fpp is ~1e-5; allow 1% slack, this guards against a
    // broken OR-merge that saturates the filter to all-ones)
    val fps = spark.sql(
      """SELECT count(*) AS n FROM range(10000, 20000) r
         WHERE graft_bloom_might((SELECT bf FROM bloom_prop_bf),
           xxhash64(r.id))""").collect()(0).getLong(0)
    assert(fps < 100L, s"bloom false-positive rate implausibly high: $fps/10000")
  }

  test("empty inputs: zero-item bloom rejects everything; empty freq sketch " +
    "is an empty map") {
    graft.functions.ExprColumns.register(spark)
    spark.range(10).filter(col("id") < 0).createOrReplaceTempView("bloom_empty_in")
    spark.sql(
      """SELECT graft_bloom_agg(xxhash64(id), 1000L, 65536L) AS bf
         FROM bloom_empty_in""").createOrReplaceTempView("bloom_empty_bf")
    // an aggregate over zero rows still yields one row; a zero-item
    // filter must probe false for every key (not throw, not all-true)
    val hits = spark.sql(
      """SELECT count(*) AS n FROM range(100) r
         WHERE graft_bloom_might((SELECT bf FROM bloom_empty_bf),
           xxhash64(r.id))""").collect()(0).getLong(0)
    assert(hits == 0L, s"empty bloom claimed $hits members")
    val m = spark.sql(
      """SELECT graft_freq_agg(CAST(id AS STRING), 64) AS m
         FROM bloom_empty_in""").collect()(0).getMap[String, Any](0)
    assert(m.isEmpty, "empty stream must yield an empty frequent-item map")
  }

  test("quota sample: exactly k per source, dense ranks, hash-minimal picks") {
    val k = 5
    val got = Curation.quotaSample(spark, sf0001, quota = k).collect()
    val bySource = got.groupBy(_.getString(0))
    val nSources = Tables(spark, sf0001, "documents")
      .select(col("source")).distinct().count()
    assert(bySource.size == nSources, "every source must meet its quota")
    bySource.foreach { case (src, rows) =>
      assert(rows.length == k, s"$src kept ${rows.length} != $k")
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to k).toSeq,
        s"$src ranks must be dense 1..$k")
    }
    // the kept docs are exactly the k smallest (priority, doc_id) per
    // source — recomputed independently of the window machinery
    val pri = Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"),
        md5(concat(lit("quota:"), col("doc_id").cast("string"))).as("p"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.sortBy(r => (r.getString(2), r.getLong(1)))
          .take(k).map(_.getLong(1)).toSet
      }
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getLong(2)).toSet == pri(src),
        s"$src picked docs differ from the k hash-minimal ones")
    }
  }

  test("quota sample under corpus growth: no reshuffle, only boundary displacement") {
    // priorities are pure functions of the doc key, so growth never
    // RESHUFFLES the sample — a doc sampled from the grown corpus that
    // already existed in the smaller corpus must have been sampled there
    // too (fewer competitors then). The converse does NOT hold: a new
    // arrival with a smaller hash can displace a rank-k pick — that
    // bounded boundary churn is inherent to fixed-quota bottom-k.
    val grownSample = Curation.quotaSample(spark, sf0001, quota = 5)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val oldCorpusIds = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") < 250).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val oldSample = Curation.quotaSampleOf(
      Tables(spark, sf0001, "documents").filter(col("doc_id") < 250),
      quota = 5)
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val survivors = grownSample.filter { case (_, id) => oldCorpusIds(id) }
    assert(survivors.nonEmpty, "growth test needs overlap to be meaningful")
    assert(survivors.subsetOf(oldSample),
      "a doc kept against MORE competitors must have been kept against fewer")
  }
}
