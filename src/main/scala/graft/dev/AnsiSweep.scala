package graft.dev
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}

/** Dev: execute every query under spark.sql.ansi.enabled=true and report
  * what throws — finds the 0/0 and overflow classes mechanically. */
object AnsiSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    var nOk = 0; var nFail = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        nOk += 1
      } catch { case e: Throwable =>
        nFail += 1
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .toSeq.last
        println(s"[ansi-fail] $name: ${root.getClass.getSimpleName}: " +
          String.valueOf(root.getMessage) // null for NPEs and some Spark
            .linesIterator.take(2).mkString(" | ").take(200))
      }
    }
    println(s"[ansi-sweep] ok=$nOk fail=$nFail")
    spark.stop()
  }
}
