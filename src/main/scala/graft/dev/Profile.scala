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
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("warmup")(noop(spark.read.parquet(s"$dir/part.parquet")))
    time("string_funcs_1")(noop(graft.operators.Relational.stringFuncs(spark, dir)))
    time("string_funcs_2")(noop(graft.operators.Relational.stringFuncs(spark, dir)))
    time("string_funcs_3")(noop(graft.operators.Relational.stringFuncs(spark, dir)))
    time("emb_cos_1")(noop(graft.operators.DedupOps.embeddingCosinePairs(spark, dir)))
    time("emb_cos_2")(noop(graft.operators.DedupOps.embeddingCosinePairs(spark, dir)))
    spark.stop()
  }
}
