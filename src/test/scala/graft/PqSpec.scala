package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprColumns

/** [[graft.expressions.PqAssign]] — the PQ encode kernel. Its contract
  * is bit-equality with the relational HOF rendering (double diffs,
  * sequential double accumulation in dimension order, ties to the
  * smallest codeword position); sim_pq_adc's oracle row then only
  * depends on the exact side, but training/encode determinism depends
  * on this. */
class PqSpec extends SparkSpec {

  private val M = 16; private val SUB = 4

  test("pq_assign == the HOF rendering on the real corpus (seed codebook)") {
    ExprColumns.register(spark)
    val e = Tables(spark, sf0001, "embeddings")
    val cb = e.orderBy(col("vec_id")).limit(64)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("seeds"))
      .select(expr(
        s"""transform(sequence(0, ${M - 1}), m ->
              transform(seeds, s -> slice(s.embedding, m * $SUB + 1, $SUB)))""")
        .as("cb"))
    val both = e.join(broadcast(cb))
      .select(col("vec_id"),
        ExprColumns.pqAssign(spark, "embedding", "cb").as("fast"),
        expr(
          s"""transform(sequence(0, ${M - 1}), m ->
                array_min(transform(element_at(cb, m + 1), (cw, i) ->
                  struct(aggregate(zip_with(slice(embedding, m * $SUB + 1, $SUB), cw,
                      (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE)),
                    CAST(0 AS DOUBLE), (a, v) -> a + v * v) AS d,
                    i AS cid))).cid)""").as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    assert(both.count() > 0)
  }

  test("pq_assign ties break to the smallest codeword position") {
    ExprColumns.register(spark)
    // subspace 0: identical codewords; subspace 1: equidistant codewords
    // — position 0 must win both ties
    val df = spark.sql(
      """SELECT graft_pq_assign(
           CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
           CAST(array(array(array(5.0), array(5.0)),
                      array(array(1.0), array(3.0))) AS
             ARRAY<ARRAY<ARRAY<FLOAT>>>)) AS codes""")
    assert(df.collect().head.getSeq[Int](0) == Seq(0, 0))
  }

  test("pq_assign rejects mismatched embedding dims and ragged codebooks") {
    ExprColumns.register(spark)
    // 3-dim embedding vs a codebook covering 2 dims: must throw, not read
    // out-of-bounds unsafe bytes
    val short = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_assign(
             CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
             CAST(array(array(array(5.0)), array(array(1.0))) AS
               ARRAY<ARRAY<ARRAY<FLOAT>>>)) AS codes""").collect()
    }
    assert(short.getMessage.contains("dims") ||
      String.valueOf(short.getCause).contains("dims"))
    // ragged codebook: codeword 1 of subspace 0 is wider than codeword 0
    val ragged = intercept[Exception] {
      spark.sql(
        """SELECT graft_pq_assign(
             CAST(array(1.0) AS ARRAY<FLOAT>),
             CAST(array(array(array(5.0), array(5.0, 6.0))) AS
               ARRAY<ARRAY<ARRAY<FLOAT>>>)) AS codes""").collect()
    }
    assert(ragged.getMessage.contains("ragged") ||
      String.valueOf(ragged.getCause).contains("ragged"))
  }
}
