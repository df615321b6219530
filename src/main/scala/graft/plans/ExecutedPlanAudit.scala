package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** RUNTIME sweep for the plan gate's two static blind spots
  * (round-13 advisor findings):
  *
  *   1. `localCheckpoint` boundaries collapse to `LogicalRDD` leaves
  *      in the OPTIMIZED plan, so any unpartitioned window UPSTREAM of
  *      a checkpoint is invisible to a static audit of the returned
  *      DataFrame — but the checkpoint itself executes through
  *      `Dataset.withAction`, whose `QueryExecution` carries the full
  *      PRE-checkpoint lineage.
  *   2. Streaming rows do their real work inside `foreachBatch`
  *      bodies and readout folds — batch actions on micro-batch
  *      DataFrames, each of which fires a SQL execution event the
  *      static gate never sees.
  *
  * Both surfaces share one choke point: every batch action goes
  * through the session's [[QueryExecutionListener]] bus. This audit
  * registers a listener that runs [[WindowAudit]] over every executed
  * plan, so EVERY materialization a query performs — checkpoints,
  * bounded collects, foreachBatch folds — is swept, not just the plan
  * it returns. The listener bus is asynchronous; [[drain]] waits for
  * it to empty before reading the verdicts, and the collected
  * violations carry the action name (`localCheckpoint`, `collect`,
  * `count`…) for attribution.
  */
final class ExecutedPlanAudit {
  /** (action name, offending window summaries) per flagged plan. */
  private val hits = new ConcurrentLinkedQueue[(String, String)]()

  private val listener: QueryExecutionListener =
    new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val bad = WindowAudit.unboundedGlobalWindows(qe.optimizedPlan)
        if (bad.nonEmpty) {
          hits.add(funcName ->
            bad.map(_.simpleString(120)).mkString("\n"))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }

  def register(spark: SparkSession): Unit =
    spark.listenerManager.register(listener)

  def unregister(spark: SparkSession): Unit =
    spark.listenerManager.unregister(listener)

  /** Wait for the asynchronous listener bus to deliver everything the
    * run produced, then return and clear the collected violations. */
  def drain(spark: SparkSession): Seq[(String, String)] = {
    org.apache.spark.graft.ListenerBusAccess
      .waitUntilEmpty(spark.sparkContext, 30000L)
    val out = hits.asScala.toVector
    hits.clear()
    out
  }
}
