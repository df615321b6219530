package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExprColumns

/** Round-8 scale probes: measured skew on the posting shuffles.
  *
  * Every shingle/gram dedup here groups on a content fingerprint, and
  * natural-language token frequencies are Zipf-headed — so the round-7
  * verdict asked for a MEASUREMENT of how much of each posting shuffle
  * lands on the hottest partition at sf0.1, rather than an assumed
  * "hashing spreads it". The probe reproduces Spark's own shuffle
  * placement (`pmod(hash(key), n)` — HashPartitioning is Murmur3 over
  * the key, which is exactly the SQL `hash` function) and asserts the
  * max-partition share stays under 4x the mean.
  *
  * Result (recorded): at sf0.1 / 32 partitions the max/mean is ~1.1x
  * for 5-word shingles and ~1.1x for 20-gram window fingerprints — the
  * synthetic corpus's planted duplicates concentrate MASS on duplicate
  * fingerprints, but each hot key still holds far below a partition's
  * worth of rows, so no salting is needed. The guard stays in the suite
  * so a future corpus (or fingerprint change) that does develop a
  * stop-gram head fails here first; the documented mitigation is
  * dropping/salting the top-frequency keys, not a different join. */
class Round8ScaleSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"
  private val parts = 32

  /** (max partition rows) / (mean partition rows) for a posting relation
    * shuffled on `key` into `parts` partitions, plus the single hottest
    * KEY's share of all rows — the two numbers that decide salting. */
  private def skew(rel: DataFrame, key: String): (Double, Double) = {
    val byPart = rel
      .groupBy(pmod(hash(col(key)), lit(parts)).as("p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val maxOverMean = byPart.max.toDouble * byPart.length / byPart.sum
    val topKey = rel.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("m"), sum(col("n")).as("t")).collect()(0)
    (maxOverMean, topKey.getLong(0).toDouble / topKey.getLong(1))
  }

  test("shingle posting shuffle at sf0.1: hottest partition <= 4x mean") {
    val sh = Tables(spark, sf01, "documents")
      .select(col("doc_id"),
        explode(ExprColumns.shingles(spark, "text", 5)).as("sh_txt"))
      .select(xxhash64(col("sh_txt")).as("shingle"))
    val (maxOverMean, topShare) = skew(sh, "shingle")
    info(f"shingle posting: max/mean=$maxOverMean%.2f topKeyShare=$topShare%.4f")
    assert(maxOverMean <= 4.0,
      f"shingle posting shuffle skew $maxOverMean%.2f exceeds 4x mean — " +
        "salt or drop the stop-shingle head (DedupOps scaladoc)")
    // a single key holding >1/parts of all rows would cap that partition
    // at the key's own mass no matter how well the hash spreads the rest
    assert(topShare <= 1.0 / parts,
      f"hottest shingle holds $topShare%.4f of the relation — it alone " +
        "overfills a partition; needs per-key salting")
  }

  test("20-gram window posting shuffle at sf0.1: hottest partition <= 4x mean") {
    val win = Tables(spark, sf01, "documents")
      .select(posexplode(ExprColumns.gramHashes(spark, "text", 20)))
      .select(col("col").as("fp"))
    val (maxOverMean, topShare) = skew(win, "fp")
    info(f"20-gram posting: max/mean=$maxOverMean%.2f topKeyShare=$topShare%.4f")
    assert(maxOverMean <= 4.0,
      f"gram posting shuffle skew $maxOverMean%.2f exceeds 4x mean")
    assert(topShare <= 1.0 / parts)
  }

  test("paragraph fingerprint shuffle at sf0.1: hottest partition <= 4x mean") {
    ExprColumns.register(spark)
    val paras = Tables(spark, sf01, "documents")
      .select(expr("graft_chunk_words(text, 15, 15)"))
      .select(xxhash64(col("chunk_text")).as("fp"))
    val (maxOverMean, topShare) = skew(paras, "fp")
    info(f"paragraph posting: max/mean=$maxOverMean%.2f topKeyShare=$topShare%.4f")
    assert(maxOverMean <= 4.0,
      f"paragraph fingerprint shuffle skew $maxOverMean%.2f exceeds 4x mean")
    assert(topShare <= 1.0 / parts)
  }
}
