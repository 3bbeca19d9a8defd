package graft

import org.apache.spark.sql.functions._

/** The native codegen'd subspace-L2 expression must be bit-identical to
  * the interpreted HOF fold the PQ oracles mirror, propagate NULLs the
  * same way, return NULL on out-of-range windows, and actually codegen. */
class L2SqRangeSpec extends SparkSuite {

  private def hofD2(off: String): String =
    "aggregate(sequence(1, 8), CAST(0.0 AS DOUBLE), (acc, i) -> " +
      s"acc + (CAST(element_at(a, $off + i) AS DOUBLE) - CAST(element_at(b, $off + i) AS DOUBLE)) * " +
      s"(CAST(element_at(a, $off + i) AS DOUBLE) - CAST(element_at(b, $off + i) AS DOUBLE)))"

  test("l2_sq_range == HOF fold bit-for-bit on every subspace, NULL edges, codegen") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("b"))
    val joined = e.crossJoin(broadcast(probes))
      .select(col("vec_id"), col("embedding").as("a"), col("qid"), col("b"),
        explode(expr("sequence(0, 7)")).as("m"))

    val rows = joined.selectExpr(
      "vec_id", "qid", "m",
      "l2_sq_range(a, b, m * 8 + 1, 8) AS native",
      s"${hofD2("m * 8")} AS hof").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        s"native vs HOF differ at (${r.get(0)}, ${r.get(1)}, m=${r.get(2)})")
    }

    // NULL array → NULL; NULL offset → NULL.
    val n = spark.sql(
      "SELECT l2_sq_range(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)), 1, 1), " +
        "l2_sq_range(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)), CAST(NULL AS INT), 1)")
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))

    // Window falling off either array (or before it) → NULL, both paths.
    val oob = spark.sql(
      "SELECT l2_sq_range(a, b, 2, 2) AS tooLong, l2_sq_range(a, b, 0, 2) AS tooEarly " +
        "FROM VALUES (array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) t(a, b)")
      .collect().head
    assert(oob.isNullAt(0) && oob.isNullAt(1))

    // In-range sanity: (1-3)^2 = 4 over a width-1 window.
    val v = spark.sql(
      "SELECT l2_sq_range(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT)), 1, 1)").collect().head.getDouble(0)
    assert(v == 4.0)

    // Must sit inside a WholeStageCodegen span (the whole point).
    val line = e.selectExpr("l2_sq_range(embedding, embedding, 9, 8) AS c")
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Project")).getOrElse("")
    assert(line.trim.startsWith("*("),
      "l2_sq_range should run inside a WholeStageCodegen stage")
  }
}
