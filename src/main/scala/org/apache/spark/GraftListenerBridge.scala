package org.apache.spark

/** Bridge to the `private[spark]` listener bus.
  *
  * The bench marks a measurement window by resetting listener-fed
  * counters, but `SparkListener` events are delivered on an async bus —
  * a late warmup `SparkListenerStageCompleted` landing after the reset
  * would leak warmup task-seconds into the timed window (and a
  * still-draining bus at read time would drop tail stages from it).
  * Draining the bus at both window edges makes the task/GC accounting
  * exact.
  */
object GraftListenerBridge {
  /** Block until every queued listener event has been delivered; falls
    * back to a short sleep if the bus refuses (e.g. already stopped). */
  def drainListeners(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => Thread.sleep(300) }
}
