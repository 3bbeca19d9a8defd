package graft

import org.apache.spark.sql.functions._

/** The typed Column façade (graft.functions) must bind to the SAME
  * registered expressions as the SQL spellings — every wrapper equals
  * its expr("...") dual on real data. */
class FunctionsApiSpec extends SparkSuite {

  private lazy val e = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("scalar wrappers == their SQL spellings") {
    val viaApi = e.limit(50).select(
      graft.functions.cosine_sim(col("embedding"), col("embedding")).as("c"),
      graft.functions.l2_sq_range(col("embedding"), col("embedding"), lit(1), 8).as("l2"),
      graft.functions.hilbert_xy(col("vec_id") % 16, col("vec_id") % 8, 4).as("h"),
      graft.functions.nfc_normalize(lit("éclair")).as("n"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val viaSql = e.limit(50).selectExpr(
      "cosine_sim(embedding, embedding) AS c",
      "l2_sq_range(embedding, embedding, 1, 8) AS l2",
      "hilbert_xy(vec_id % 16, vec_id % 8, 4) AS h",
      "nfc_normalize('éclair') AS n")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    assert(viaApi.toSeq == viaSql.toSeq)
    assert(viaApi.head._4 == "éclair") // composed é — the normalization is real
  }

  test("aggregate wrappers == their SQL spellings") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (s"g${i % 3}", i.toDouble, i.toLong, s"k$i"))
      .toDF("g", "score", "id", "key")
    val api = df.groupBy("g").agg(
        graft.functions.topk_by(col("score"), col("id"), 4).as("t"),
        graft.functions.topk_by_str(col("score"), col("key"), 4).as("ts"),
        graft.functions.kmv_distinct(
          expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)"), 64).as("kmv"),
        graft.functions.mg_candidates(col("g"), 2).as("mg"),
        graft.functions.cms_counters(col("g"), 2, 8).as("cms"))
      .orderBy("g").collect().map(_.toString).toSeq
    val sql = df.groupBy("g").agg(
        expr("topk_by(score, id, 4)").as("t"),
        expr("topk_by_str(score, key, 4)").as("ts"),
        expr("kmv_distinct(CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT), 64)").as("kmv"),
        expr("mg_candidates(g, 2)").as("mg"),
        expr("cms_counters(g, 2, 8)").as("cms"))
      .orderBy("g").collect().map(_.toString).toSeq
    assert(api == sql)
  }
}
