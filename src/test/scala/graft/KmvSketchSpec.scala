package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.hash60Spark

/** The KMV aggregate must be partition-invariant (associative merge +
  * serialize/deserialize through partial aggregation), exact below
  * saturation, and usefully close to truth above it. */
class KmvSketchSpec extends SparkSuite {

  private def hashed = spark.read.parquet(s"$sf001/lineitem.parquet")
    .withColumn("h", expr(hash60Spark("CAST(l_orderkey AS STRING)")))

  test("partition-invariant: 1 vs 16 partitions give bit-identical estimates") {
    def run(parts: Int): Map[String, Double] =
      hashed.repartition(parts)
        .groupBy("l_returnflag")
        .agg(expr("kmv_distinct(h, 256)").as("est"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val one = run(1)
    val many = run(16)
    assert(one.keySet == many.keySet && one.nonEmpty)
    one.foreach { case (g, est) =>
      assert(java.lang.Double.doubleToRawLongBits(est) ==
        java.lang.Double.doubleToRawLongBits(many(g)), s"group $g differs")
    }
  }

  test("below saturation the count is exact; above it the estimate is close") {
    // k larger than any group's distinct count -> exact branch.
    val exact = hashed
      .groupBy("l_returnflag")
      .agg(expr("kmv_distinct(h, 100000)").as("est"),
        countDistinct("l_orderkey").as("truth"))
      .collect()
    exact.foreach(r => assert(r.getDouble(1) == r.getLong(2).toDouble,
      s"${r.getString(0)}: est ${r.getDouble(1)} != exact ${r.getLong(2)}"))

    // Saturated k=256 -> estimator branch; KMV relative stderr is
    // ~1/sqrt(k-2) ~ 6.3%, so 25% is a generous determinism-safe bound.
    val est = hashed
      .groupBy("l_returnflag")
      .agg(expr("kmv_distinct(h, 256)").as("est"),
        countDistinct("l_orderkey").as("truth"))
      .collect()
    est.foreach { r =>
      val rel = math.abs(r.getDouble(1) - r.getLong(2)) / r.getLong(2).toDouble
      assert(rel < 0.25, s"${r.getString(0)}: est ${r.getDouble(1)} vs ${r.getLong(2)} (rel $rel)")
      assert(r.getDouble(1) != r.getLong(2).toDouble, "k=256 should be saturated here")
    }
  }

  test("histogram quantiles track exact percentiles within one bin era") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val approx = graft.queries.SketchQueries.queries
      .find(_.name == "sketch_quantile_bins").get
      .run(spark, sf001)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val exact = li.selectExpr(
      "percentile(l_extendedprice, 0.5) AS p50",
      "percentile(l_extendedprice, 0.9) AS p90",
      "percentile(l_extendedprice, 0.99) AS p99").collect().head
    // Unit-width bins: the approx quantile is the floor of a value within
    // one rank of the exact percentile — allow the bin width plus the
    // local inter-value gap.
    assert(math.abs(approx(0.5) - exact.getDouble(0)) < 100.0)
    assert(math.abs(approx(0.9) - exact.getDouble(1)) < 100.0)
    assert(math.abs(approx(0.99) - exact.getDouble(2)) < 100.0)
  }
}
