package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window}
import graft.{SparkEntry, SparkSessions}
import graft.plans.WindowAudit

/** Dev census for the bounded-grain ALLOWLIST: for every
  * empty-partition window in every non-streaming query's optimized
  * plan, print the grouping-attribute name sets of each Aggregate in
  * the window's input subtree plus the audit verdict — the raw
  * vocabulary the [[WindowAudit]] allowlist is built from (data, not
  * guesswork). */
object GrainCensus {
  private def aggGrains(p: LogicalPlan): Seq[String] = p.collect {
    case a: Aggregate =>
      a.groupingExpressions.flatMap(_.references.map(_.name))
        .distinct.sorted.mkString("(", ",", ")")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!name.startsWith("stream_")) {
        try {
          val plan = fn(spark, "/root/testdata/sf0.001")
            .queryExecution.optimizedPlan
          plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
            .foreach { w =>
              val ok = WindowAudit.bounded(w.child)
              val grains = aggGrains(w.child).mkString(" ")
              println(f"$name%-34s bounded=$ok%-5s aggs=$grains")
            }
        } catch { case e: Throwable =>
          println(s"$name CENSUS-FAIL ${e.getMessage.take(100)}")
        }
      }
    }
    spark.stop()
  }
}
