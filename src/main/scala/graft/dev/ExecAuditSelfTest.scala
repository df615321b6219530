package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSessions, Tables}
import graft.plans.{ExecutedPlanAudit, WindowAudit}

/** Self-test of the runtime audit's reason for existing: an
  * unpartitioned corpus-grain window UPSTREAM of a localCheckpoint is
  * invisible to the static sweep (the checkpoint collapses to a
  * LogicalRDD leaf) but MUST be caught by [[ExecutedPlanAudit]], which
  * observes the pre-checkpoint lineage through the action's
  * QueryExecution. Exits 1 unless the static audit misses it AND the
  * runtime audit fires. */
object ExecAuditSelfTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val audit = new ExecutedPlanAudit
    audit.register(spark)
    val planted = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("rk",
        row_number().over(Window.orderBy(col("doc_id"))))
      .localCheckpoint()
      .filter(col("rk") <= 5)
    val static =
      WindowAudit.unboundedGlobalWindows(
        planted.queryExecution.optimizedPlan)
    val exec = audit.drain(spark)
    println(s"static=${static.size} (must be 0: checkpoint hides it)")
    println(s"exec=${exec.size} (must be >0: listener sees lineage)")
    exec.foreach { case (act, w) => println(s"  [$act] $w") }
    audit.unregister(spark)
    spark.stop()
    if (static.nonEmpty || exec.isEmpty) sys.exit(1)
  }
}
