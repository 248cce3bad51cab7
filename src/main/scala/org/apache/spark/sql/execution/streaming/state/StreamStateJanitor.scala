package org.apache.spark.sql.execution.streaming.state

/** Package-access shim over [[StateStore.unloadAll]].
  *
  * A stopped streaming query's state-store providers stay in the
  * executor-side `loadedProviders` registry until the next MAINTENANCE
  * cycle notices the coordinator deactivated them
  * (`spark.sql.streaming.stateStore.maintenanceInterval`, default 60 s).
  * Each HDFS-backed provider pins its full state map on the heap, and
  * the maintenance pass walks and RPC-verifies every loaded provider —
  * so a session that drives many short-lived queries back to back (the
  * graft tape drives: 49 keys x 2 bench runs, each with up to 8
  * partitions x several stateful operators) accumulates hundreds of
  * dead providers between cycles: measured as heap pressure plus a
  * growing per-drive tax across the session.
  *
  * The drives run strictly sequentially and each checkpoints to a
  * fresh temp dir, so after `query.stop()` every loaded provider is
  * dead by construction — unloading them all eagerly is exactly what
  * the 60 s maintenance cycle would eventually do, just immediate.
  * Production deployments with long-lived queries never hit this path
  * (their providers stay active for the query lifetime).
  */
object StreamStateJanitor {
  def unloadAll(): Unit = StateStore.unloadAll()
}
