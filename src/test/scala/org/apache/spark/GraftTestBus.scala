package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: lets specs
  * drain async listener events deterministically instead of sleeping. */
object GraftTestBus {
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
