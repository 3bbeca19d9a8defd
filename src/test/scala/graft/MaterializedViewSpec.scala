package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{ChangeFeedTable, ParquetTable}
import graft.tables.MaterializedView

/** Incremental materialized-view maintenance: the refreshed view must be
  * indistinguishable from a direct aggregate of the base's CURRENT
  * snapshot — through inserts, deletes, updates, group death, and
  * all-null sums — while reading only change files; and it must fall
  * back to a full recompute (not silently corrupt) when vacuum retired
  * the change files it needed. */
class MaterializedViewSpec extends SparkSuite {

  private def direct(base: DataFrame): DataFrame =
    base.groupBy("g").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("long")).as("sx"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("refresh folds inserts/deletes/updates exactly; no-op when current") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-mv")
    val baseDir = root.resolve("base").toString
    val mvDir = root.resolve("mv").toString

    // v1: groups a(2 rows), b(2 rows, one null x), c(1 row).
    val v1 = Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(20L)),
      (3L, "b", Some(5L)), (4L, "b", None),
      (5L, "c", Some(7L))).toDF("k", "g", "x")
    ChangeFeedTable.publish(spark, v1, baseDir, Seq("k"))
    MaterializedView.create(spark, mvDir, baseDir, Seq("g"), "n",
      Seq("sx" -> "x"))
    assert(sortedRows(MaterializedView.read(spark, mvDir)) ==
      sortedRows(direct(ParquetTable.read(spark, baseDir))))

    // v2: update k=1 (x 10→100), delete k=3, kill group c entirely,
    // insert k=6 into new group d, and null out k=4's sibling so b's
    // sum survives on one non-null value.
    val v2 = Seq(
      (1L, "a", Some(100L)), (2L, "a", Some(20L)),
      (4L, "b", None),
      (6L, "d", Some(1L))).toDF("k", "g", "x")
    ChangeFeedTable.publish(spark, v2, baseDir, Seq("k"))
    assert(MaterializedView.refresh(spark, mvDir), "refresh must commit")
    val got = MaterializedView.read(spark, mvDir)
    assert(sortedRows(got) == sortedRows(direct(ParquetTable.read(spark, baseDir))))
    // Group death and all-null sum semantics, explicitly.
    assert(got.filter(col("g") === "c").count() == 0, "emptied group must drop")
    val b = got.filter(col("g") === "b").collect().head
    assert(b.getLong(b.fieldIndex("n")) == 1 && b.isNullAt(b.fieldIndex("sx")),
      "SUM over only-null group must be NULL, not 0")

    val versionsBefore = ParquetTable.snapshots(mvDir).size
    assert(!MaterializedView.refresh(spark, mvDir), "already current = no-op")
    assert(ParquetTable.snapshots(mvDir).size == versionsBefore)
  }

  test("a NULL group key maintains as ONE group (null-safe merge, no row split)") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-mvnull")
    val baseDir = root.resolve("base").toString
    val mvDir = root.resolve("mv").toString
    // v1 holds a NULL-keyed group next to a real one.
    val v1 = Seq((1L, Option.empty[String], Some(10L)), (2L, Some("a"), Some(20L)),
      (3L, Option.empty[String], Some(5L))).toDF("k", "g", "x")
    ChangeFeedTable.publish(spark, v1, baseDir, Seq("k"))
    MaterializedView.create(spark, mvDir, baseDir, Seq("g"), "n", Seq("sx" -> "x"))
    // v2 grows the NULL group — the delta must MERGE with the existing
    // NULL row (GROUP BY treats NULL as one group; a null-rejecting
    // join would emit two NULL rows and diverge forever).
    val v2 = v1.union(Seq((4L, Option.empty[String], Some(2L))).toDF("k", "g", "x"))
    ChangeFeedTable.publish(spark, v2, baseDir, Seq("k"))
    assert(MaterializedView.refresh(spark, mvDir))
    val got = MaterializedView.read(spark, mvDir)
    assert(sortedRows(got) == sortedRows(direct(ParquetTable.read(spark, baseDir))))
    val nullRows = got.filter(col("g").isNull).collect()
    assert(nullRows.length == 1, s"one row for the NULL group, got ${nullRows.length}")
    assert(nullRows.head.getLong(nullRows.head.fieldIndex("n")) == 3L)
    assert(nullRows.head.getLong(nullRows.head.fieldIndex("sx")) == 17L)
  }

  test("vacuumed change files trigger the full-recompute fallback") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-mv2")
    val baseDir = root.resolve("base").toString
    val mvDir = root.resolve("mv").toString
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("k", "g", "x"), baseDir, Seq("k"))
    MaterializedView.create(spark, mvDir, baseDir, Seq("g"), "n", Seq("sx" -> "x"))
    // Two unrefreshed commits, then vacuum retires v1+v2 (and their
    // change dirs): the (refreshed, current] range now has a hole.
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 5L), (3L, "c", 3L)).toDF("k", "g", "x"), baseDir, Seq("k"))
    ChangeFeedTable.publish(spark,
      Seq((3L, "c", 4L)).toDF("k", "g", "x"), baseDir, Seq("k"))
    ParquetTable.vacuum(baseDir, keep = 1)
    assert(MaterializedView.refresh(spark, mvDir), "refresh must still commit")
    assert(sortedRows(MaterializedView.read(spark, mvDir)) ==
      sortedRows(direct(ParquetTable.read(spark, baseDir))))
  }

  test("SUM over a float column is refused") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-mv3")
    val baseDir = root.resolve("base").toString
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 1.5)).toDF("k", "g", "x"), baseDir, Seq("k"))
    val e = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, root.resolve("mv").toString, baseDir,
        Seq("g"), "n", Seq("sx" -> "x"))
    }
    assert(e.getMessage.contains("order-sensitive"))
  }
}
