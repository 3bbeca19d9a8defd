package graft

import org.apache.spark.sql.graft.StateInit

/** VERDICT r6 directive 8: the `private[sql]` StateStoreCoordinator
  * shim must fail LOUDLY on a Spark bump — not as a bare
  * `RpcEndpointNotFoundException` from every task. */
class StateInitSpec extends SparkSuite {

  test("a broken internals touch surfaces a versioned, actionable error") {
    val e = intercept[IllegalStateException] {
      StateInit.ensureStateStoreCoordinator(
        spark, _ => throw new NoSuchMethodError("stateStoreCoordinator"))
    }
    val msg = e.getMessage
    assert(msg.contains(org.apache.spark.SPARK_VERSION), msg) // names the running Spark
    assert(msg.contains("StateInit.scala"), msg)              // names the shim to re-pin
    assert(msg.contains("TxBuffer"), msg)                     // names the fallback
    assert(e.getCause.isInstanceOf[NoSuchMethodError])
  }

  test("the real touch succeeds (and is idempotent) on this Spark") {
    StateInit.ensureStateStoreCoordinator(spark)
    StateInit.ensureStateStoreCoordinator(spark)
  }
}
