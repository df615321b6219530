package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity, TextAnalysis}

/** Round-11 wave-19 operators: scalar replays for the seasonal index,
  * the embedding-norm census, and character entropy. */
class Round11Wave19Spec extends SparkSpec {

  test("orders_seasonal_index matches a scalar ratio replay and the " +
    "indexes average to ~1 over days") {
    val daily = Tables(spark, sf0001, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .select(month(col("day")), col("c")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val overall = daily.map(_._2).map(BigInt(_)).sum.toDouble / daily.length
    val got = Relational.seasonalIndex(spark, sf0001).collect()
    val byM = daily.groupBy(_._1)
    assert(got.length === byM.size)
    got.foreach { r =>
      val m = r.getInt(0)
      val cs = byM(m).map(_._2)
      assert(r.getLong(1) === cs.length.toLong)
      val mm = cs.map(BigInt(_)).sum.toDouble / cs.length
      assert(math.abs(r.getDouble(3) - mm / 100.0) < 1e-2)
      assert(math.abs(r.getDouble(4) - mm / overall) < 1e-5, s"index $m")
    }
    // day-weighted mean of indexes is exactly 1 by construction
    val wmean = got.map(r => r.getDouble(4) * r.getLong(1)).sum /
      got.map(_.getLong(1)).sum
    assert(math.abs(wmean - 1.0) < 1e-4)
  }

  test("sim_norm_census matches a scalar quantized-norm replay") {
    val vecs = Tables(spark, sf0001, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def q9(x: Double) = BigDecimal(x)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = Similarity.normCensus(spark, sf0001).collect()
    vecs.groupBy(_._1).foreach { case (label, vs) =>
      val norms = vs.map { case (_, v) =>
        math.sqrt(v.map(x => q9(x.toDouble) * q9(x.toDouble)).sum
          .toDouble)
      }
      val n = norms.length
      val sn = norms.map(q12).sum
      val snn = norms.map(x => q12(x * x)).sum
      val r = got.find(_.getInt(0) == label).get
      assert(r.getLong(1) === n.toLong)
      assert(math.abs(r.getDouble(2) - sn.toDouble / n) < 1e-6)
      assert(math.abs(r.getDouble(3) - norms.min) < 1e-6)
      assert(math.abs(r.getDouble(4) - norms.max) < 1e-6)
      val varN = math.max((n * snn - sn * sn).toDouble, 0.0) /
        (n.toDouble * (n - 1))
      assert(math.abs(r.getDouble(5) -
        math.sqrt(varN) / (sn.toDouble / n)) < 1e-5, s"cv $label")
    }
  }

  test("text_char_entropy matches a scalar distribution replay and " +
    "entropy respects the uniform bound") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def q12(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val got = TextAnalysis.charEntropy(spark, sf0001).collect()
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val chars = ds.flatMap(_._2.toCharArray.map(_.toString))
      val counts = chars.groupBy(identity).view.mapValues(_.length.toLong)
      val nt = chars.length.toLong
      val h = counts.values.map { n =>
        q12(n.toDouble / nt * (math.log(nt.toDouble / n) / math.log(2.0)))
      }.sum.toDouble
      val r = got.find(_.getString(0) == lang).get
      assert(r.getLong(1) === nt, s"n_chars $lang")
      assert(r.getLong(2) === counts.size.toLong, s"vocab $lang")
      assert(math.abs(r.getDouble(3) - h) < 1e-5, s"entropy $lang")
      val bound = math.log(counts.size.toDouble) / math.log(2.0)
      assert(r.getDouble(3) <= bound + 1e-9)
      assert(math.abs(r.getDouble(4) - (1.0 - h / bound)) < 1e-5)
      assert(r.getDouble(4) >= -1e-9 && r.getDouble(4) <= 1.0)
    }
  }
}
