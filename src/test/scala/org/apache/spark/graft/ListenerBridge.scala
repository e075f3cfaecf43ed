package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus draining, so
  * metric-asserting specs read totals only after every queued event
  * has been delivered (same shim pattern as sql.graft.ColumnBridge). */
object ListenerBridge {
  def flush(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
