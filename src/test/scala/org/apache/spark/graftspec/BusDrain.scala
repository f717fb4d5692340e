package org.apache.spark.graftspec

import org.apache.spark.SparkContext

/** Test-only shim into Spark's package-private listener bus: the job/
  * task-count plan guards in ScaleSpec read listener-maintained counters,
  * and the only deterministic way to know every event was delivered is
  * `LiveListenerBus.waitUntilEmpty()` (a quiet-poll loop can end early
  * under delayed bus delivery and undercount — the flake class this
  * replaces). `private[spark]` members are public in bytecode, so a
  * one-liner in an org.apache.spark subpackage is the idiomatic bridge
  * Spark's own external test suites use.
  */
object BusDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
