package graft.dev
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}

/** Dev: show selected queries' results on a given sf dir (args: sfDir name...). */
object ShowNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println("=== " + name)
      SparkEntry.queries(name)(spark, args(0)).show(50, false)
    }
    spark.stop()
  }
}
