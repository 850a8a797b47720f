package org.apache.spark

/** Test-only accessor for the `private[spark]` listener bus: flush all
  * pending listener events so stage/job counters read by a spec are
  * complete before the assertion runs. */
object ListenerBusProbe {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
