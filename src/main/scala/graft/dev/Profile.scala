package graft.dev
import org.apache.spark.sql.SparkSession

/** Dev-only micro-profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(spark.read.parquet(s"$dir/embeddings.parquet").count())
    time("minhash_1st")(graft.operators.DedupOps.minhashLshPairs(spark, dir).count())
    time("minhash_2nd")(graft.operators.DedupOps.minhashLshPairs(spark, dir).count())
    time("emb_cos_1st")(graft.operators.DedupOps.embeddingCosinePairs(spark, dir).count())
    time("ngram_1st")(graft.operators.DedupOps.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
