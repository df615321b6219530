package graft.operators

import org.apache.spark.sql.functions._

/** [[TextAnalysis.floorSqrt]] carries the exactness of both mixture
  * queries (integer alpha weights, order-independent z-sum), so its
  * one-step-adjustment proof gets a direct test: every perfect-square
  * neighborhood up to 10^15 plus seeded random longs must equal the
  * BigInt integer square root. */
class FloorSqrtSpec extends graft.SparkSpec {

  private def isqrt(n: Long): Long = {
    // Newton on BigInt — independent of any floating point
    if (n == 0) 0L
    else {
      var x = BigInt(n); var y = (x + 1) / 2
      while (y < x) { x = y; y = (x + n / x) / 2 }
      x.toLong
    }
  }

  test("floorSqrt equals BigInt isqrt on square boundaries and random longs") {
    val boundaries = (1 to 30).flatMap { e =>
      val k = math.round(math.pow(10, e / 2.0))
      Seq(k * k - 1, k * k, k * k + 1)
    }.filter(n => n >= 0 && n <= 1000000000000000L)
    val rnd = new scala.util.Random(7)
    val randoms = Seq.fill(500)(math.abs(rnd.nextLong()) % 1000000000000000L)
    val inputs = (Seq(0L, 1L, 2L, 3L, 4L) ++ boundaries ++ randoms).distinct
    val s = spark
    import s.implicits._
    val got = inputs.toDF("n")
      .select(col("n"), TextAnalysis.floorSqrt(col("n")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (n, sgot) =>
      val want = isqrt(n)
      assert(sgot == want, s"floorSqrt($n) = $sgot, want $want")
      assert(sgot * sgot <= n && (sgot + 1) * (sgot + 1) > n)
    }
  }
}
