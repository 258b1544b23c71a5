package org.apache.spark

/** Test-only bridge into `private[spark]` surface: deterministic listener
  * drain for zero-Spark-job assertions (a fixed sleep is a race under
  * load and dead latency otherwise). */
object GraftSparkTestHooks {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
