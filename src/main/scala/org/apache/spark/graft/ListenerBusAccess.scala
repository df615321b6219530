package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Narrow accessor for the one `private[spark]` member the runtime
  * plan audit needs: the shared listener bus's drain barrier. The
  * [[org.apache.spark.sql.util.QueryExecutionListener]] bus is
  * asynchronous, so an audit that reads its collected verdicts right
  * after an action races the delivery thread — Spark's own listener
  * tests synchronize exactly this way. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
