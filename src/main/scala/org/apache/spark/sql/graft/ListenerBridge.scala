package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Public bridge over `private[spark]` listener-bus internals for the
  * bench harness: per-query metric attribution needs all listener
  * events drained before the counters are snapshotted. */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
