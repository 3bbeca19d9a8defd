package graft

import org.apache.spark.sql.functions.col

import graft.sim.Similarity

/** The native `lsh_sig` expression (r15) must be bit-identical to the
  * pure-builtin HOF spelling it replaced — same LCG hyperplane weights,
  * same d-ordered double fold, same strict `> 0.0` bit rule — at every
  * width the queries use (4, 6, and the auto tier's wider range), plus
  * the loud failure modes (non-literal args, dim mismatch). */
class LshSigSpec extends SparkSuite {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("native == HOF spelling for bits in {1, 4, 6, 11, 20}, every row") {
    for (bits <- Seq(1, 4, 6, 11, 20)) {
      val mismatches = emb.selectExpr(
          "vec_id",
          s"${Similarity.lshSigSpark("embedding", bits, 64)} AS native",
          s"${Similarity.lshSigSparkHof("embedding", bits, 64)} AS hof")
        .filter(col("native") =!= col("hof"))
        .count()
      assert(mismatches == 0, s"bits=$bits: $mismatches signature mismatches")
    }
  }

  test("signature masking identity: wide signature mod 2^bits == narrow signature") {
    // The DuckDB auto-tier oracle builds the 20-bit signature and masks;
    // this is the engine-side statement of the same identity.
    val bad = emb.selectExpr(
        s"${Similarity.lshSigSpark("embedding", 20, 64)} % CAST(64 AS BIGINT) AS masked",
        s"${Similarity.lshSigSpark("embedding", 6, 64)} AS narrow")
      .filter(col("masked") =!= col("narrow")).count()
    assert(bad == 0)
  }

  test("null embedding element yields signature 0 on both spellings (HOF parity)") {
    // The HOF's null element nulls every proj fold → CASE contributes 0
    // per bit; the native expression must not read the slot as 0.0f.
    val row = spark.sql(
      s"""SELECT ${Similarity.lshSigSpark("e", 4, 2)} AS native,
         |  ${Similarity.lshSigSparkHof("e", 4, 2)} AS hof
         |FROM (SELECT array(CAST(1.5 AS FLOAT), CAST(NULL AS FLOAT)) AS e)""".stripMargin)
      .head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 0L, row.toString)
  }

  test("non-literal width and wrong dim fail loudly") {
    val e1 = intercept[Exception] {
      emb.selectExpr("lsh_sig(embedding, CAST(vec_id AS INT), 64)").collect()
    }
    assert(e1.getMessage.contains("literal"), e1.getMessage)
    val e2 = intercept[Exception] {
      emb.selectExpr("lsh_sig(embedding, 6, 32)").collect()
    }
    assert(e2.getMessage != null && e2.toString.nonEmpty) // dim guard surfaces
  }
}
