package graft

import org.apache.spark.sql.functions._

import graft.streaming.{ChangeFeedTable, ParquetTable}
import graft.tables.GraftSql

/** The materialized-view SQL statement surface: CREATE MATERIALIZED VIEW
  * registers a queryable view whose hidden maintenance counters never
  * surface, REFRESH folds base commits (incrementally off the change
  * feed, or via the full-recompute fallback after statement DML), and
  * non-maintainable definitions are refused loudly. */
class MvSqlSpec extends SparkSuite {

  private def freshName(p: String) = s"${p}_${java.util.UUID.randomUUID.toString.take(8)}"

  test("create, query, refresh through the change feed; no-op when current") {
    val s = spark
    import s.implicits._
    val baseDir = graft.tables.TmpDirs.create("graft-mvsql")
      .resolve("base").toString
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("k", "g", "x"),
      baseDir, Seq("k"))
    val base = freshName("mv_base")
    val mv = freshName("mv_view")
    GraftSql.register(spark, base, baseDir, Seq("k"))

    GraftSql.sql(spark,
      s"CREATE MATERIALIZED VIEW $mv AS SELECT g, COUNT(*) AS n, SUM(x) AS sx FROM $base GROUP BY g").collect()
    val q = GraftSql.sql(spark, s"SELECT * FROM $mv ORDER BY g")
    assert(q.columns.toSeq == Seq("g", "n", "sx"), "hidden _nn_* must not mount")
    assert(q.collect().map(_.toString).toSeq ==
      Seq("[a,2,30]", "[b,1,5]"))

    // publish REPLACES the snapshot: k=1 updates, k=2/k=3 are deletes
    // (group b dies), k=4 inserts group c.
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 100L), (4L, "c", 1L)).toDF("k", "g", "x"), baseDir, Seq("k"))
    val r1 = GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $mv").collect().head
    assert(r1.getString(r1.fieldIndex("refreshed")) == "true")
    assert(GraftSql.sql(spark, s"SELECT * FROM $mv ORDER BY g")
      .collect().map(_.toString).toSeq == Seq("[a,1,100]", "[c,1,1]"))

    val r2 = GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $mv").collect().head
    assert(r2.getString(r2.fieldIndex("refreshed")) == "false", "current = no-op")
  }

  test("statement DML on the base is folded via the recompute fallback") {
    val s = spark
    import s.implicits._
    val baseDir = graft.tables.TmpDirs.create("graft-mvsql2")
      .resolve("base").toString
    ParquetTable.swap(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "x"), baseDir)
    val base = freshName("mv_dml_base")
    val mv = freshName("mv_dml_view")
    GraftSql.register(spark, base, baseDir, Seq("k"))
    GraftSql.sql(spark,
      s"CREATE MATERIALIZED VIEW $mv AS SELECT g, COUNT(*) AS n, SUM(x) AS sx FROM $base GROUP BY g").collect()

    GraftSql.sql(spark, s"UPDATE $base SET x = x + 1 WHERE g = 'a'").collect()
    GraftSql.sql(spark, s"DELETE FROM $base WHERE g = 'b'").collect()
    GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $mv").collect()
    assert(GraftSql.sql(spark, s"SELECT * FROM $mv").collect().map(_.toString).toSeq ==
      Seq("[a,1,11]"))
  }

  test("aggregate statements over the base route to a FRESH covering MV; stale or conf-off reads the base") {
    val s = spark
    import s.implicits._
    val baseDir = graft.tables.TmpDirs.create("graft-mvrw")
      .resolve("base").toString
    ParquetTable.swap(spark,
      Seq((1L, "a", "x", Option(10L)), (2L, "a", "y", Option(20L)),
        (3L, "b", "x", Option(5L)), (4L, "c", "x", Option.empty[Long]),
        (5L, "c", "y", Option.empty[Long]))
        .toDF("k", "g", "h", "v"), baseDir)
    val base = freshName("mv_rw_base")
    val mv = freshName("mv_rw_view")
    GraftSql.register(spark, base, baseDir, Seq("k"))
    val loc = GraftSql.sql(spark,
      s"CREATE MATERIALIZED VIEW $mv AS SELECT g, h, COUNT(*) AS n, SUM(v) AS sv " +
        s"FROM $base GROUP BY g, h").collect().head.getString(2)
    val q = s"SELECT g, COUNT(*) AS n, SUM(v) AS sv FROM $base GROUP BY g"
    // Structural, not string: the plan's Location rendering truncates
    // long paths (and the per-process TmpDirs root lengthened them), so
    // contains-on-toString both false-fails positives and false-passes
    // negatives. Collect the scans' actual root paths instead.
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
    def scans(df: org.apache.spark.sql.DataFrame, dir: String): Boolean =
      scanPaths(df).exists(_.contains(dir))
    // Fresh MV + subset GROUP BY → the plan scans the MV, not the base,
    // and re-aggregation is exact (including the all-NULL sum group c).
    val rw = GraftSql.sql(spark, q)
    assert(scans(rw, loc) && !scans(rw, baseDir),
      "rewritten plan must scan the MV only")
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rowsOf(rw) == Set(("a", 2L, 30L), ("b", 1L, 5L), ("c", 2L, -1L)))
    // Schema-invisible: dtypes equal the un-rewritten frame's.
    spark.conf.set("spark.graft.mvRewrite.enabled", "false")
    val direct = GraftSql.sql(spark, q)
    assert(!scans(direct, loc), "conf off → base scan")
    assert(direct.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      rw.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rowsOf(direct) == rowsOf(rw))
    spark.conf.set("spark.graft.mvRewrite.enabled", "true")
    // Staleness: a base commit without REFRESH must disable the rewrite
    // (never a stale answer); REFRESH re-enables it.
    GraftSql.sql(spark,
      s"INSERT INTO $base SELECT CAST(9 AS BIGINT) AS k, 'd' AS g, 'x' AS h, " +
        "CAST(7 AS BIGINT) AS v")
    val stale = GraftSql.sql(spark, q)
    assert(!scans(stale, loc), "stale MV must not serve")
    assert(rowsOf(stale)(("d", 1L, 7L)), "fresh base data visible")
    GraftSql.sql(spark, s"REFRESH MATERIALIZED VIEW $mv")
    val again = GraftSql.sql(spark, q)
    assert(scans(again, loc), "refreshed MV serves again")
    assert(rowsOf(again) == rowsOf(stale))
    // Not covered (SUM of an unmaintained column / WHERE) → base scan.
    assert(!scans(GraftSql.sql(spark,
      s"SELECT g, COUNT(*) AS n, SUM(k) AS sk FROM $base GROUP BY g"), loc))
    assert(!scans(GraftSql.sql(spark,
      s"SELECT g, COUNT(*) AS n FROM $base WHERE k > 1 GROUP BY g"), loc))
    // Aggregate-free GROUP BY (the dedup spelling) is NOT the rewrite's
    // shape: it must pass through and execute, not crash in agg().
    val dedup = GraftSql.sql(spark, s"SELECT g FROM $base GROUP BY g")
    assert(!scans(dedup, loc))
    assert(dedup.collect().map(_.getString(0)).toSet == Set("a", "b", "c", "d"))
  }

  test("non-maintainable definitions are refused") {
    val s = spark
    import s.implicits._
    val baseDir = graft.tables.TmpDirs.create("graft-mvsql3")
      .resolve("base").toString
    ParquetTable.swap(spark, Seq((1L, "a", 1.5)).toDF("k", "g", "x"), baseDir)
    val base = freshName("mv_bad_base")
    GraftSql.register(spark, base, baseDir, Seq("k"))

    val eMin = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE MATERIALIZED VIEW ${freshName("v")} AS SELECT g, COUNT(*) AS n, MIN(x) AS m FROM $base GROUP BY g")
    }
    assert(eMin.getMessage.contains("unsupported select item"))

    val eFloat = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE MATERIALIZED VIEW ${freshName("v")} AS SELECT g, COUNT(*) AS n, SUM(x) AS sx FROM $base GROUP BY g")
    }
    assert(eFloat.getMessage.contains("order-sensitive"))

    val eShape = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"CREATE MATERIALIZED VIEW ${freshName("v")} AS SELECT g, k, COUNT(*) AS n FROM $base GROUP BY g")
    }
    assert(eShape.getMessage.contains("must equal GROUP BY"))
  }
}
