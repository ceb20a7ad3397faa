package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` listener-bus internals: the
  * zero-jobs-at-plan-construction audit needs to drain the asynchronous
  * listener bus before reading its job counter, or a job posted at the
  * tail of one query's construction could be attributed to the next. */
object ListenerBridge {
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
