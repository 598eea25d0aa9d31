package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Minimal bridge to the `private[spark]` listener bus: the bus delivers
  * events ASYNCHRONOUSLY, so an action can return before its final
  * TaskEnd events reach registered listeners — a bench that detaches its
  * metrics listener right after `count()` would nondeterministically lose
  * the straggler task it exists to measure. Draining before reading the
  * listener's state makes the collection complete.
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
