package org.apache.spark

/** Test-only bridge into `private[spark]` surface: flushing the
  * listener bus so metric-collecting test listeners observe every
  * TaskEnd before assertions run (the supported alternative is an
  * arbitrary sleep — a flake, not a synchronization). Same pattern as
  * the two `org.apache.spark.sql` bridges in main, test-tree only. */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
