package graft.dev

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}

/** Scratch profiling harness (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("string_funcs", "stream_tumbling_hourly", "string_funcs",
               "stream_sliding_two_hour", "string_funcs", "stream_distinct_pairs", "string_funcs")
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
