package graft

import org.apache.spark.sql.functions._

import graft.sketch.Sketches

/** MG guarantee + composed determinism: the candidate summary may vary
  * with partitioning, but true heavy hitters always survive it, so the
  * exact-verified operator result is partition-invariant. */
class MisraGriesSpec extends SparkSuite {

  test("summary is bounded and contains every true heavy hitter") {
    // Skewed synthetic column: value "hot" on 30% of rows, long uniform tail.
    val df = spark.range(10000).selectExpr(
      "CASE WHEN id % 10 < 3 THEN 'hot' ELSE CAST(id AS STRING) END AS v")
    val cand = df.repartition(16)
      .agg(expr("mg_candidates(v, 9)")).head().getSeq[String](0)
    assert(cand.size <= 9, s"summary exceeded k: $cand")
    assert(cand.contains("hot"), s"true heavy hitter evicted: $cand")
  }

  test("heavyHitters == plain GROUP BY/HAVING, under any partitioning") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val v = concat_ws("-", col("l_returnflag"), col("l_linestatus"))
    def run(parts: Int) =
      Sketches.heavyHitters(li.repartition(parts), v, den = 20)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = {
      val n = li.count()
      li.select(v.as("v")).groupBy("v").agg(count(lit(1)).as("c"))
        .filter(col("c") * 20 > n)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(exact.nonEmpty)
    assert(run(1) == exact)
    assert(run(16) == exact)
  }
}
