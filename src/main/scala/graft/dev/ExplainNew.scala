package graft.dev
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"========== $n")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
