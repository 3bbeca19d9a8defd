package graft

/** The r16 variant-C episode, made mechanical: the df-tier NB keeps
  * the double-tokenize spelling by measurement, but the count-first
  * single-tokenize arm (one corpus scan reduced to persisted
  * per-(doc, token) counts — the remote-storage drop-in recorded in
  * BASELINE.md r16) now ships behind `spark.graft.nb.countFirst`.
  * This spec pins the two arms bit-identical on the gated output and
  * the pair cache released after the caller's first materialization
  * (CacheRelease — without it every conf-on run would leak one
  * pair-count cache per query). */
class TextNbCountFirstSpec extends SparkSuite {

  test("count-first arm is bit-identical to the default and releases its cache") {
    def rows(): Set[(String, String, Long)] =
      SparkEntry.queries("text_nb_classify_df")(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val base = rows()
    graft.plans.CacheRelease.releaseAll(spark)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    spark.conf.set("spark.graft.nb.countFirst", "true")
    try {
      assert(rows() == base,
        "count-first NB arm diverged from the double-tokenize arm")
      // The release listener fires on the collect's SQLExecutionEnd,
      // delivered on the async listener bus — poll briefly.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
      while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      assert(leaked().isEmpty,
        s"count-first arm left cached blocks pinned: RDDs ${leaked()}")
    } finally spark.conf.unset("spark.graft.nb.countFirst")
  }
}
