package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew-join handling: a heavily skewed shuffle join must finish
  * with the hot partition SPLIT at runtime (OptimizeSkewedJoin), not
  * funneled through one task — the engine's runtime answer to data skew
  * at 100 TB (explicit salting covers aggregations, `ops/SkewOps`). */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits the skewed side of a sort-merge join at runtime") {
    val s = spark
    import s.implicits._

    // 400k rows, 95% on one key — a pathological hot key — against a
    // small-but-not-broadcastable dim side (broadcast disabled). The
    // payload must survive the join (and resist shuffle compression):
    // skew detection works on shuffle-partition BYTES, and a pruned
    // all-constant hot partition compresses below any threshold.
    val fact = spark.range(0, 400000)
      .select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        md5(col("id").cast("string")).as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("attr"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevFactor = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
    val prevBytes =
      spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB")
    val prevAdvisory =
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Local-scale thresholds so the hot partition qualifies as skewed.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try {
      // Global aggregate, NOT groupBy(k): an aggregation keyed on the
      // join key would require the join's hash distribution, and AQE
      // (rightly) refuses to split a skewed partition whose output
      // partitioning is still needed downstream. max(payload) keeps the
      // wide column in the shuffle (count of a non-null column folds to
      // count(1) and prunes it away).
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum("attr").as("s"), max(col("payload")).as("mp"))
      val row = joined.collect().head
      // Correctness first: every fact row finds its dim match.
      assert(row.getLong(0) == 400000L)

      // The final adaptive plan must mark the join's skewed side split.
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("expected an adaptive plan"))
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("skew="),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", prevFactor)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prevBytes)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prevAdvisory)
    }
  }

  test("static salted join == plain join, shuffling on (key, salt)") {
    val fact = spark.range(0, 50000)
      .select(
        when(col("id") % 10 =!= 0, lit(3L)).otherwise(col("id") % 100).as("k"),
        col("id").as("rowid"))
    val dim = spark.range(0, 100)
      .select(col("id").as("k"), (col("id") * 7).as("attr"))

    val salted = graft.ops.SkewOps.saltedJoin(fact, dim, Seq("k"), col("rowid"), 8)
    val plain = fact.join(dim, "k")

    // Row-identical result (the hot key k=3 meets its dim row in exactly
    // one salt group per fact row).
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")
    assert(salted.select("k", "rowid", "attr").collect().map(key).sorted.toSeq ==
      plain.select("k", "rowid", "attr").collect().map(key).sorted.toSeq)

    // The join really keys on the salt: _salt appears in the join keys of
    // the physical plan (before the drop).
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("_salt"), s"salt missing from join plan:\n$planStr")
  }

  test("adaptiveSkewJoin derives its mode from the measured dim side") {
    val fact = spark.range(0, 20000)
      .select((col("id") % 50).as("k"), col("id").as("rowid"))
    val dim = spark.range(0, 50)
      .select(col("id").as("k"), (col("id") * 7).as("attr"))

    // Under the default threshold the tiny dim reads as broadcastable.
    assert(graft.ops.SkewOps.skewJoinMode(dim) == "broadcast")
    val joined = graft.ops.SkewOps.adaptiveSkewJoin(fact, dim, Seq("k"))
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(joined.count() == 20000)

    // With broadcasting disabled the SAME dim must flip to the AQE-SMJ
    // route — no static replication, results identical.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fact2 = s2.range(0, 20000).select((col("id") % 50).as("k"), col("id").as("rowid"))
    val dim2 = s2.range(0, 50).select(col("id").as("k"), (col("id") * 7).as("attr"))
    assert(graft.ops.SkewOps.skewJoinMode(dim2) == "aqe-smj")
    val joined2 = graft.ops.SkewOps.adaptiveSkewJoin(fact2, dim2, Seq("k"))
    assert(!joined2.queryExecution.executedPlan.toString.contains("_salt"))
    assert(joined2.count() == 20000)
  }
}
