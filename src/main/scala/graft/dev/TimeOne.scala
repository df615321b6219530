package graft.dev
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}

/** Dev: time selected queries on a given sf dir (args: sfDir name...). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, args(0))
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
