package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.{GraftSql, TableStats}

/** `ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS]` on graft path
  * tables (reference db/table_maintenance.sql:38-41): the computed
  * stats, the `_TABLE_STATS` manifest round-trip, and — the point of
  * having stats at all — the plan change they drive. A footer-heavy
  * layout (many tiny files) makes Spark's file-size estimate refuse a
  * broadcast that the ANALYZE'd row count proves trivially safe; the
  * same join flips to BroadcastHashJoin only after ANALYZE, and flips
  * back once a version move stales the stats. CboSpec pins the
  * catalog-native twin of this path (Spark's own ANALYZE feeding CBO
  * join reorder). */
class AnalyzeSpec extends SparkSuite {

  private def freshTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = graft.tables.TmpDirs.create("graft-analyze")
      .resolve(name).toString
    ParquetTable.swap(spark, df, dir)
    GraftSql.register(spark, name, dir, Seq())
    dir
  }

  test("ANALYZE computes exact table and column stats; manifest round-trips") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "aa", Some(1.5)), (2L, "bb", None), (3L, "aa", Some(2.5)),
      (4L, null.asInstanceOf[String], Some(0.5))).toDF("k", "s", "v")
    val dir = freshTable("an_basic", df)

    val tbl = GraftSql.sql(spark, "ANALYZE TABLE an_basic COMPUTE STATISTICS").head()
    assert(tbl.getAs[Long]("row_count") == 4L)
    assert(tbl.getAs[Long]("size_bytes") > 0L)

    val rows = GraftSql.sql(spark,
      "ANALYZE TABLE an_basic COMPUTE STATISTICS FOR COLUMNS k, s, v")
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows("k").getAs[Long]("ndv") == 4L)
    assert(rows("k").getAs[Long]("null_count") == 0L)
    assert(rows("k").getAs[String]("min_val") == "1")
    assert(rows("k").getAs[String]("max_val") == "4")
    assert(rows("s").getAs[Long]("ndv") == 2L)
    assert(rows("s").getAs[Long]("null_count") == 1L)
    assert(rows("s").getAs[String]("min_val") == "aa")
    assert(rows("s").getAs[String]("max_val") == "bb")
    assert(rows("v").getAs[Long]("ndv") == 3L)
    assert(rows("v").getAs[Long]("null_count") == 1L)

    val st = TableStats.read(dir).get
    assert(st.rowCount == 4L)
    assert(st.cols("s").avgLen == 2.0 && st.cols("s").maxLen == 2L)
    assert(st.cols("k").avgLen == -1.0, "non-string columns carry no avgLen")
    assert(TableStats.fresh(dir).isDefined, "stats measured the live version")
  }

  test("FOR ALL COLUMNS analyzes every atomic column; rejections are loud") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x", Seq(1, 2))).toDF("k", "s", "arr")
    freshTable("an_all", df)
    val cols = GraftSql.sql(spark,
      "ANALYZE TABLE an_all COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect().map(_.getAs[String]("col_name")).toSet
    assert(cols == Set("k", "s"), "array column must be skipped by ALL")

    val e1 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ANALYZE TABLE an_all COMPUTE STATISTICS FOR COLUMNS nope"))
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ANALYZE TABLE an_all COMPUTE STATISTICS FOR COLUMNS arr"))
    assert(e2.getMessage.contains("non-atomic"))
  }

  test("stats flip a footer-heavy dim join to broadcast; version move stales it") {
    val s = spark; import s.implicits._
    // Dim: 40 rows spread over 64 files — on-disk bytes are nearly all
    // parquet footer, far above the 16 KB threshold, while the logical
    // rows are a few hundred bytes. Spark's file-size estimate must
    // refuse to broadcast it; ANALYZE's row count proves it tiny.
    val dim = (0 until 40).map(i => (i.toLong, s"g${i % 7}")).toDF("k", "grp")
      .repartition(64)
    val dimDir = freshTable("an_dim", dim)
    val fact = (0 until 20000).map(i => (i.toLong % 40, i.toLong)).toDF("k", "x")
    fact.createOrReplaceTempView("an_fact")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16384")
      val q = "SELECT grp, count(*) AS n FROM an_fact f JOIN an_dim d ON f.k = d.k GROUP BY grp"

      // Assert on the STATIC physical plan (pre-AQE): AQE's runtime
      // SMJ->BHJ conversion can still rescue the join from observed
      // shuffle sizes, but only AFTER both sides paid their shuffle
      // writes — the stats-driven hint removes the exchange from the
      // plan altogether, which is the part that matters at 100 TB.
      val before = GraftSql.sql(spark, q)
      assert(!before.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "file-size estimate should refuse the broadcast (footer-heavy layout)")

      GraftSql.sql(spark, "ANALYZE TABLE an_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      assert(TableStats.broadcastWorthy(spark, dimDir,
        TableStats.readCurrent(spark, dimDir).schema))
      val after = GraftSql.sql(spark, q)
      val rows = after.collect()
      assert(after.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        s"ANALYZE'd row count should drive the broadcast:\n${after.queryExecution.sparkPlan}")
      // The hinted plan answers identically.
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
        before.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)

      // A version move (new swap) invalidates the verdict: stale stats
      // must never broadcast a table that has since changed.
      // The replacement stays footer-heavy too — a compact layout would
      // fall under the threshold on Spark's OWN file estimate and
      // broadcast for reasons that have nothing to do with stats.
      ParquetTable.swap(spark,
        (0 until 40).map(i => (i.toLong, s"h${i % 7}")).toDF("k", "grp")
          .repartition(64), dimDir)
      assert(TableStats.fresh(dimDir).isEmpty)
      val stale = GraftSql.sql(spark, q)
      assert(!stale.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "stale stats must not drive a broadcast")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approxNdv conf flips exact count_distinct to HLL (the 100 TB lever)") {
    val s = spark; import s.implicits._
    val df = (1L to 5000L).map(i => (i, s"s${i % 1000}")).toDF("k", "s")
    val dir = freshTable("an_approx", df)
    try {
      spark.conf.set("spark.graft.analyze.approxNdv", "true")
      GraftSql.sql(spark, "ANALYZE TABLE an_approx COMPUTE STATISTICS FOR COLUMNS k, s")
      val st = TableStats.read(dir).get
      // HLL at default precision: within a few percent, not exact.
      assert(math.abs(st.cols("k").ndv - 5000L) < 500,
        s"approx ndv(k)=${st.cols("k").ndv}")
      assert(math.abs(st.cols("s").ndv - 1000L) < 100,
        s"approx ndv(s)=${st.cols("s").ndv}")
      // Null/min/max stay exact regardless of the NDV estimator.
      assert(st.cols("k").nullCount == 0L)
      assert(st.cols("k").min == "1" && st.cols("k").max == "5000")
    } finally spark.conf.unset("spark.graft.analyze.approxNdv")
  }

  test("re-ANALYZE of a column subset merges at same version") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val dir = freshTable("an_merge", df)
    GraftSql.sql(spark, "ANALYZE TABLE an_merge COMPUTE STATISTICS FOR COLUMNS k")
    GraftSql.sql(spark, "ANALYZE TABLE an_merge COMPUTE STATISTICS FOR COLUMNS s")
    val st = TableStats.read(dir).get
    assert(st.cols.keySet == Set("k", "s"), "same-version subset analyses merge")
  }

  test("analyze.onPublish keeps stats fresh across OPTIMIZE and RESTORE without a manual re-ANALYZE") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val dir = freshTable("an_auto", df)
    GraftSql.sql(spark, "ANALYZE TABLE an_auto COMPUTE STATISTICS FOR COLUMNS k, s")
    assert(TableStats.fresh(dir).isDefined)
    try {
      spark.conf.set("spark.graft.analyze.onPublish", "true")
      GraftSql.sql(spark, "OPTIMIZE an_auto")
      val st = TableStats.fresh(dir)
      assert(st.isDefined, "OPTIMIZE re-analyzed under onPublish")
      assert(st.get.cols.keySet == Set("k", "s"), "the previously-analyzed column set")
      assert(st.get.rowCount == 3L)
      GraftSql.sql(spark, "RESTORE TABLE an_auto TO VERSION AS OF 1")
      assert(TableStats.fresh(dir).isDefined, "RESTORE re-analyzed under onPublish")
    } finally spark.conf.unset("spark.graft.analyze.onPublish")
    // With the conf off again, a version move stales the stats — the
    // default behavior is unchanged.
    GraftSql.sql(spark, "OPTIMIZE an_auto")
    assert(TableStats.fresh(dir).isEmpty, "no auto-refresh without the conf")
    assert(TableStats.read(dir).isDefined, "stale stats remain readable")
  }

  test("metadata-only COUNT(*): fresh stats answer with zero file IO, staleness re-scans") {
    val s = spark; import s.implicits._
    freshTable("an_cnt", (1L to 7L).map(i => (i, s"p$i")).toDF("k", "p"))
    GraftSql.sql(spark, "ANALYZE TABLE an_cnt COMPUTE STATISTICS")
    def planOf(q: String) =
      GraftSql.sql(spark, q).queryExecution.sparkPlan.toString
    val q = "SELECT count(*) AS n FROM an_cnt"
    // Fresh: the answer is a local relation — no parquet scan at all.
    assert(!planOf(q).toLowerCase.contains("parquet"), planOf(q).take(200))
    assert(GraftSql.sql(spark, q).head().getLong(0) == 7L)
    // Unaliased spelling keeps the passthrough's column name.
    assert(GraftSql.sql(spark, "SELECT count(*) FROM an_cnt").columns.toSeq ==
      Seq("count(1)"))
    // A commit stales the stamp: the same statement scans and sees the
    // new row (a stale metadata answer must never serve).
    GraftSql.sql(spark, "INSERT INTO an_cnt VALUES (8, 'p8')")
    assert(planOf(q).toLowerCase.contains("parquet"), "stale → real scan")
    assert(GraftSql.sql(spark, q).head().getLong(0) == 8L)
    GraftSql.sql(spark, "ANALYZE TABLE an_cnt COMPUTE STATISTICS")
    assert(!planOf(q).toLowerCase.contains("parquet"), "re-ANALYZE restores")
    assert(GraftSql.sql(spark, q).head().getLong(0) == 8L)
    // Conf off: always the real plan.
    spark.conf.set("spark.graft.metadataCount.enabled", "false")
    try assert(planOf(q).toLowerCase.contains("parquet"))
    finally spark.conf.set("spark.graft.metadataCount.enabled", "true")
  }
}
