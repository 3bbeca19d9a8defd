package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Driver-side bootstrap for BATCH `transformWithState`.
  *
  * The state-v2 physical operator (`TransformWithStateExec`) loads its
  * RocksDB stores through the `StateStoreCoordinator` driver RPC
  * endpoint — which only STREAMING query startup normally registers.
  * A batch query that reaches the operator first therefore dies with
  * `RpcEndpointNotFoundException: Cannot find endpoint:
  * spark://StateStoreCoordinator@...` from every task.
  *
  * The coordinator ref hangs off the session's
  * `StreamingQueryManager.stateStoreCoordinator` (a lazy val that
  * creates the endpoint on first touch); both members are
  * `private[sql]`, hence this shim lives under `org.apache.spark.sql`.
  * Touching it is idempotent and costs one no-op RPC registration.
  */
object StateInit {
  def ensureStateStoreCoordinator(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.streamingQueryManager.stateStoreCoordinator
}
