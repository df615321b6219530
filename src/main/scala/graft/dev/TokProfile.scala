package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkSessions

/** Scratch profiling for the tokenizer DP family (dev tooling only):
  * times the trainer prefix and the in-row encoders separately so a
  * regression can be attributed to a phase, not a query. */
object TokProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Tables(spark, sfDir, "documents").count()
    def time[A](s: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tokprof] $s%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { it =>
      println(s"--- iter $it")
      val frozen = time("unigramFrozenCosts") {
        val f = graft.operators.TextAnalysis
          .unigramFrozenCosts(spark, sfDir).localCheckpoint()
        f.count(); f
      }
      val docs = graft.Tables(spark, sfDir, "documents")
      val lw = time("evalWords") {
        val lw = docs
          .select(col("lang"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("t"))
          .select(col("lang"), lower(col("t")).as("w"))
          .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 10)
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("occ"))
          .localCheckpoint()
        lw.count(); lw
      }
      val types = lw.select(col("w")).distinct()
        .withColumn("len", length(col("w"))).localCheckpoint()
      println(s"[tokprof] n_types = ${types.count()}")
      time("viterbi noop") {
        graft.operators.TextAnalysis.viterbiPieceCounts(types, frozen)
          .write.format("noop").mode("overwrite").save()
      }
      time("greedy noop") {
        graft.operators.TextAnalysis.greedyPieceCounts(types, frozen)
          .write.format("noop").mode("overwrite").save()
      }
      time("viterbi+join census") {
        lw.join(graft.operators.TextAnalysis
            .viterbiPieceCounts(types, frozen), Seq("w"), "left")
          .groupBy(col("lang"))
          .agg(sum(col("occ")).as("tw"),
            sum(coalesce(col("occ") * col("n_pieces"), lit(0L))).as("tp"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
