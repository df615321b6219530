package graft.dev

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, SparkSessions}
import graft.plans.{ExecutedPlanAudit, WindowAudit}

/** Dev census for the RUNTIME plan gate: runs every registered query
  * (streaming rows included — this is the whole point) at sf0.001
  * with [[ExecutedPlanAudit]] registered, plus the static
  * [[WindowAudit]] over the returned plan, and prints one line per
  * query naming any violation and the wall time. The worklist for
  * extending GlobalWindowGateSpec past its batch-only / post-
  * checkpoint blind spots. Args: optional comma-joined name filter. */
object ExecAudit {
  def main(args: Array[String]): Unit = {
    val only: Option[Set[String]] =
      args.headOption.map(_.split(",").toSet)
    val spark = SparkSessions.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val audit = new ExecutedPlanAudit
    audit.register(spark)
    var nBad = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, "/root/testdata/sf0.001")
          val static = WindowAudit.unboundedGlobalWindows(
            df.queryExecution.optimizedPlan)
          val exec = audit.drain(spark)
          val secs = (System.nanoTime() - t0) / 1e9
          val verdict =
            if (static.isEmpty && exec.isEmpty) "ok"
            else { nBad += 1; "VIOLATION" }
          println(f"$name%-34s $verdict%-9s ${secs}%6.2fs " +
            s"static=${static.size} exec=${exec.size}")
          exec.foreach { case (act, w) =>
            println(s"    [$act] ${w.linesIterator.next()}") }
          static.foreach(w =>
            println(s"    [returned] ${w.simpleString(120)}"))
        } catch { case e: Throwable =>
          audit.drain(spark)
          println(s"$name AUDIT-FAIL ${e.getMessage.take(120)}")
        }
      }
    println(s"violating queries: $nBad")
    audit.unregister(spark)
    spark.stop()
    if (nBad > 0) sys.exit(1)
  }
}
