package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** The native codegen'd cosine expression must be bit-identical to the
  * interpreted HOF formulation (which the DuckDB oracles mirror) and to
  * the JVM loop, on the real embeddings — and must actually codegen. */
class CosineSimSpec extends SparkSuite {

  test("cosine_sim == HOF fold == cosineJvm, bit-for-bit, and codegens") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val joined = e.crossJoin(broadcast(probes)).filter(col("vec_id") =!= col("qid"))

    val rows = joined.selectExpr(
      "qid", "vec_id",
      "cosine_sim(q, embedding) AS native",
      s"${Similarity.cosineSpark("q", "embedding")} AS hof")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"native vs HOF differ for pair (${r.get(0)}, ${r.get(1)})")
    }

    // Also pin against the JVM loop used by the group-scan operators.
    val vecs = e.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val sql = spark.sql(
      "SELECT cosine_sim(a.embedding, b.embedding) FROM " +
        s"parquet.`$sf0001/embeddings.parquet` a JOIN parquet.`$sf0001/embeddings.parquet` b " +
        "ON a.vec_id = 1 AND b.vec_id = 2").collect().head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(sql) ==
      java.lang.Double.doubleToRawLongBits(Similarity.cosineJvm(vecs(1L), vecs(2L))))

    // NULL array → NULL, matching the HOF's null propagation.
    val n = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect().head
    assert(n.isNullAt(0))

    // Length mismatch → NULL, exactly like the HOF (zip_with pads the
    // shorter array with NULL, which nulls the whole fold).
    val mm = spark.sql(
      "SELECT cosine_sim(a, b) AS native, " +
        s"${Similarity.cosineSpark("a", "b")} AS hof " +
        "FROM VALUES (array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) t(a, b)")
      .collect().head
    assert(mm.isNullAt(0) && mm.isNullAt(1),
      "mismatched lengths must be NULL in both the native and HOF paths")

    // The expression must sit inside a WholeStageCodegen span (the whole
    // point: HOF folds cannot). Check on a plain scan+project, which has
    // no AQE wrapper hiding the final plan.
    // (`*(n)` marks a WholeStageCodegen stage in the compact plan string.)
    def projectLine(sql: String): String =
      e.selectExpr(s"$sql AS c").queryExecution.executedPlan.toString
        .linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine("cosine_sim(embedding, embedding)").trim.startsWith("*("),
      "cosine_sim should run inside a WholeStageCodegen stage")
    assert(!projectLine(Similarity.cosineSpark("embedding", "embedding")).trim.startsWith("*("),
      "control: the HOF fold is expected NOT to codegen — if it starts to, revisit the custom expression")
  }
}
