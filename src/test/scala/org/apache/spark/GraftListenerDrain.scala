package org.apache.spark

/** Test-only shim: deterministic listener-bus drain for plan-capture specs.
  *
  * `QueryExecutionListener` events ride the shared `LiveListenerBus` (via
  * `ExecutionListenerBus`), whose accessor is `private[spark]` — so specs
  * that snapshot captured plans (PairPlanSpec's q90 reuse/no-BNLJ asserts)
  * would otherwise have to settle-poll, which can both miss a late plan
  * (vacuous pass) and flake on a loaded machine. `waitUntilEmpty` blocks
  * until every queued event has been delivered to every listener, making
  * the post-drain snapshot complete by construction.
  */
object GraftListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
