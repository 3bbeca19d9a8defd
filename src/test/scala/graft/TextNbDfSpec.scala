package graft

/** r15 directive 2 (closed with measurements AGAINST the change — see
  * the query's scaladoc and BASELINE.md r16): the df tier keeps the
  * double-tokenize spelling because both single-pass variants measured
  * slower at sf1 AND sf10. What remains load-bearing: the tier leaves
  * NO cached blocks behind (the briefly-shipped persisted variant
  * would have leaked one token-stream cache per bench entry without a
  * release), and it classifies every document. */
class TextNbDfSpec extends SparkSuite {

  test("text_nb_classify_df leaves no net cached blocks behind") {
    graft.plans.CacheRelease.releaseAll(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("text_nb_classify_df")(spark, sf0001)
    assert(out.count() > 0)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    assert(leaked().isEmpty,
      s"df-tier left cached blocks pinned: RDDs ${leaked()}")
  }

  test("df tier classifies every document (full coverage of the corpus)") {
    def rows(name: String): Set[(String, String, Long)] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val df = rows("text_nb_classify_df")
    assert(df.nonEmpty)
    val total = df.toSeq.map(_._3).sum
    val docs = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "documents")).count()
    assert(total == docs, s"df tier classified $total of $docs docs")
  }
}
