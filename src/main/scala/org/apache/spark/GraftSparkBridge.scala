package org.apache.spark

/** Bridge into the package-private listener bus so the bench harness can
  * drain in-flight task/block events before snapshotting per-rep metrics —
  * the listener bus is async, and attributing a rep's spill to the NEXT
  * rep would defeat the instrumentation.
  */
object GraftSparkBridge {
  /** Block until the listener bus has delivered all queued events (or the
    * timeout passes). */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }
}
