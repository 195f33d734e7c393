package org.apache.spark

/** Test-only bridge to `private[spark]` listener-bus draining, so specs
  * can deterministically count the jobs a code path launched (the async
  * listener bus otherwise races the assertion). */
object GraftTestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
