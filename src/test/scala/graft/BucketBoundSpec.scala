package graft

import graft.sim.Similarity

/** r15: the LSH group scans buffer one bucket per group — bounded by
  * construction under the auto-width tier (E[bucket] ≤ 128), but a
  * degenerate corpus (mass-duplicate embeddings) collapses into one
  * bucket at ANY signature width. The scans must fail loudly naming
  * the audit row instead of OOMing an executor. */
class BucketBoundSpec extends SparkSuite {

  private def oneBucket(n: Int) =
    spark.range(n).selectExpr(
      "id AS vec_id",
      "transform(sequence(1, 8), x -> CAST(x AS FLOAT)) AS embedding",
      "CAST(0 AS BIGINT) AS bucket")

  test("bucketNnJvm and bucketPairsJvm refuse a bucket past the bound, naming the audit") {
    // The bound is a per-call parameter captured in the task closure
    // (r15 directive 5) — no global to race on, nothing to restore.
    for (run <- Seq(
        () => Similarity.bucketNnJvm(spark, oneBucket(50), maxBucketGroup = 10).count(),
        () => Similarity.bucketPairsJvm(spark, oneBucket(50), 0.5, maxBucketGroup = 10).count())) {
      val e = intercept[org.apache.spark.SparkException] { run() }
      val msg = String.valueOf(e.getCause match {
        case null => e.getMessage
        case c => c.getMessage
      })
      assert(msg.contains("sim_lsh_auto_audit"), msg.take(300))
    }
    // Below the bound the same shapes run fine.
    assert(Similarity.bucketNnJvm(spark, oneBucket(9), maxBucketGroup = 10).count() == 9)
  }
}
