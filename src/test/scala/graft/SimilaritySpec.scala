package graft

import org.apache.spark.sql.functions._
import graft.functions.ExprColumns
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineF32: identity, orthogonality, known value") {
    val df = Seq(
      (Array(1f, 0f, 0f), Array(1f, 0f, 0f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(4f, 5f, 6f))
    ).toDF("a", "b")
      .select(ExprColumns.cosineF32(spark, "a", "b").as("sim"))
    val got = df.as[Float].collect()
    assert(got(0) === 1f)
    assert(got(1) === 0f)
    assert(math.abs(got(2) - 0.9746318) < 1e-6)
  }

  test("cosineF32 survives codegen (runs inside WholeStageCodegen plan)") {
    val df = Tables(spark, sf0001, "embeddings").limit(50)
      .select(ExprColumns.cosineF32(spark, "embedding", "embedding").as("s"))
    // self-similarity == 1 exactly in f32
    assert(df.as[Float].collect().forall(s => math.abs(s - 1f) < 1e-6))
  }

  test("brute-force top-k is sorted desc and self-excluded") {
    val rows = Similarity.bruteForceTopK(spark, sf0001)
      .select("vec_id", "sim").as[(Long, Double)].collect()
    assert(rows.length === 10)
    assert(rows.forall(_._1 != 0L))
    assert(rows.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("IVF top-1 sim never exceeds brute-force top-1 (pruned search)") {
    val brute = Similarity.bruteForceTopK(spark, sf0001)
      .select("sim").as[Double].head
    val ivf = Similarity.ivfTopK(spark, sf0001)
      .select("sim").as[Double].head
    assert(ivf <= brute)
  }

  test("IVF with nProbe=all labels equals brute force exactly") {
    val brute = Similarity.bruteForceTopK(spark, sf0001)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val full = Similarity.ivfTopK(spark, sf0001, nProbe = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(full === brute)
  }

  test("label-blocked pairs respect the threshold and ordering") {
    val rows = Similarity.labelBlockedPairs(spark, sf0001)
      .select("v1", "v2", "sim").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0.2999)) // rounded to 4dp, raw filter at 0.30
  }
}
