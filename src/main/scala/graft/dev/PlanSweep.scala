package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import graft.{SparkEntry, SparkSessions}

/** Dev sweep: formatted plan of EVERY query, grepping for smells. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val smells = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_")) {
        try {
          val p = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.explainString(ExplainMode.fromString("formatted"))
          val hits = smells.filter(p.contains)
          val sortAggs = "SortAggregate".r.findAllIn(p).size
          if (hits.nonEmpty || sortAggs > 0)
            println(f"$name%-28s ${hits.mkString(",")} sortAgg=$sortAggs")
        } catch { case e: Throwable => println(s"$name EXPLAIN-FAIL ${e.getMessage.take(80)}") }
      }
    }
    spark.stop()
  }
}
