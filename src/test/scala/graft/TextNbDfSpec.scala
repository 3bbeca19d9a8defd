package graft

/** r15 directive 2: the df-floor NB tier persists its exploded token
  * stream so the train-split vocab pass and the apply-pass probe share
  * ONE corpus tokenization (the tier's dominant intermediate — doubled
  * at 100 TB when computed per consumer). The cache must release after
  * the caller's first materialization, CacheRelease-style: per-run
  * token caches accumulating across a 300-entry bench session is the
  * leak class r14 directive 5 closed for searchBulk. */
class TextNbDfSpec extends SparkSuite {

  test("text_nb_classify_df releases its persisted token stream after the " +
      "first materialization") {
    graft.plans.CacheRelease.releaseAll(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SparkEntry.queries("text_nb_classify_df")(spark, sf0001)
    assert(out.count() > 0)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    assert(leaked().isEmpty,
      s"df-tier token cache still pinned after 30s: RDDs ${leaked()}")
  }

  test("df tier matches the yardstick's per-language prediction counts on the " +
      "shared corpus head (the two tiers implement one model algebra)") {
    def rows(name: String): Set[(String, String, Long)] =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // Not bit-identical by design (different vocab bounding), but both
    // must produce full coverage: every (lang) appears, counts sum to
    // the doc count.
    val df = rows("text_nb_classify_df")
    assert(df.nonEmpty)
    val total = df.toSeq.map(_._3).sum
    val docs = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "documents")).count()
    assert(total == docs, s"df tier classified $total of $docs docs")
  }
}
