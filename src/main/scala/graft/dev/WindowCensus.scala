package graft.dev

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}
import graft.plans.WindowAudit

/** Dev census: every query's empty-partition logical windows that
  * [[WindowAudit]] cannot prove bounded — the worklist for the plan
  * gate's whitelist (each survivor is either a scale bug to re-plan or
  * a documented bounded grain to whitelist by name). */
object WindowCensus {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_")) {
        try {
          val hits = WindowAudit.unboundedGlobalWindows(
            fn(spark, "/root/testdata/sf0.001")
              .queryExecution.optimizedPlan)
          hits.foreach { w =>
            val order = w.orderSpec.map(_.sql).mkString(", ").take(70)
            val child = w.child.getClass.getSimpleName
            println(f"$name%-32s over=$child%-18s orderBy=$order")
          }
        } catch { case e: Throwable =>
          println(s"$name CENSUS-FAIL ${e.getMessage.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
