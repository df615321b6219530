package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprColumns

/** Direct edge-case coverage for the custom Catalyst expressions (their
  * happy paths are pinned by the DuckDB oracle and equivalence property
  * tests; these are the boundaries the oracle corpus never hits). */
class ExpressionEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashBandBuckets: empty shingle set -> NULL; stable across rows") {
    val df = Seq("one two", // < 5 words -> empty shingles -> null buckets
      "a b c d e f g", "a b c d e f g").toDF("text")
      .select(ExprColumns.minhashBuckets(spark,
        "graft_shingles(text, 5)").as("b"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(!rows(1).isNullAt(0) && rows(1).getSeq[String](0).length == 3)
    assert(rows(1).getSeq[String](0) == rows(2).getSeq[String](0),
      "identical docs must land in identical buckets")
  }

  test("MinHashBandBuckets equals the relational signature build") {
    val docs = Tables(spark, sf0001, "documents").limit(50)
      .select(col("doc_id"), col("text"))
    val fast = docs.select(col("doc_id"),
      posexplode(ExprColumns.minhashBuckets(spark, "graft_shingles(text, 5)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val sh = docs.select(col("doc_id"),
      explode(ExprColumns.shingles(spark, "text", 5)).as("shingle"))
    val hashes = (0 until 9).map { i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")
    }
    val slow = sh.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
      .select(col("doc_id"),
        expr("stack(3, 0, concat(h0, ',', h1, ',', h2), 1, " +
          "concat(h3, ',', h4, ',', h5), 2, concat(h6, ',', h7, ',', h8)) as (band, sig)"))
      .select(col("doc_id"), col("band"), md5(col("sig")).as("bucket"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("HyperplaneLshBuckets: 4 8-bit buckets, deterministic, type-checked") {
    val e = Tables(spark, sf0001, "embeddings").limit(10)
    val b = e.select(ExprColumns.hyperplaneLsh(spark, "embedding").as("b"))
      .collect().map(_.getSeq[String](0))
    assert(b.forall(arr => arr.length == 4 &&
      arr.forall(s => s.length == 8 && s.forall(c => c == '0' || c == '1'))))
    val again = e.select(ExprColumns.hyperplaneLsh(spark, "embedding").as("b"))
      .collect().map(_.getSeq[String](0))
    assert(b.zip(again).forall { case (x, y) => x == y })
    // wrong input type fails analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("not a vector").toDF("embedding")
        .select(ExprColumns.hyperplaneLsh(spark, "embedding")).collect()
    }
  }

  test("HashedTf64: counts sum to token count, empty array -> zero vector") {
    ExprColumns.register(spark)
    val df = Seq("a b a c", "").toDF("text")
      .select(expr("graft_hashed_tf64(split(text, ' '))").as("tf"))
    val rows = df.collect().map(_.getSeq[Long](0))
    assert(rows(0).length == 64 && rows(0).sum == 4) // 4 tokens, dups counted
    // splitting "" yields [""], one bucket gets the empty-string token
    assert(rows(1).sum == 1)
    val empty = Seq(Array.empty[String]).toDF("toks")
      .select(expr("graft_hashed_tf64(toks)").as("tf"))
      .head().getSeq[Long](0)
    assert(empty.length == 64 && empty.sum == 0)
  }

  test("ParseAfTimestamp rejects non-string input at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("v").select(expr("graft_parse_af_ts(v)")).collect()
    }
  }
}
