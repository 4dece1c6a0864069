package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** private[spark] access shim (same pattern as sql.graftbridge): the
  * listener bus is asynchronous, so a metrics probe must drain it
  * before reading listener-accumulated counters.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}