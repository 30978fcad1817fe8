package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-visible probe into SparkContext's `private[spark]` listener bus
  * (same pattern as org.apache.spark.sql.graft.Bridge): lets suites wait
  * until all queued listener events have been delivered before reading
  * metrics accumulated by a test listener. */
object TestBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty(30000L)
}
