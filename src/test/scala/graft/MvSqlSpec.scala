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
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mvsql")
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
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mvsql2")
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

  test("non-maintainable definitions are refused") {
    val s = spark
    import s.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mvsql3")
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
