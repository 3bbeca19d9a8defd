package graft

import java.nio.file.Files

import graft.tables.SchemaEvolution

/** Additive schema evolution on parquet append tables: ADD COLUMN
  * null-fills old files on read, drops and type changes fail fast at
  * write time (SURVEY gap; reference db/schema_evolution.sql). */
class SchemaEvolutionSpec extends SparkSuite {

  test("ADD COLUMN evolves, old files null-fill; drop/type-change rejected") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-evolve").resolve("t").toString

    SchemaEvolution.appendEvolved(spark, Seq((1L, "a")).toDF("id", "name"), dir)
    // ADD COLUMN score: compatible.
    SchemaEvolution.appendEvolved(
      spark, Seq((2L, "b", 0.5)).toDF("id", "name", "score"), dir)

    val evolved = SchemaEvolution.readEvolved(spark, dir)
    assert(evolved.columns.sorted.toSeq == Seq("id", "name", "score"))
    val byId = evolved.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(evolved.columns.indexOf("score")), "old rows null-fill added column")
    assert(byId(2L).getDouble(evolved.columns.indexOf("score")) == 0.5)

    // Dropping a column is rejected.
    val dropEx = intercept[IllegalArgumentException] {
      SchemaEvolution.appendEvolved(spark, Seq(3L).toDF("id"), dir)
    }
    assert(dropEx.getMessage.contains("dropped"))

    // Changing a column's type is rejected.
    val typeEx = intercept[IllegalArgumentException] {
      SchemaEvolution.appendEvolved(spark, Seq((4, "d")).toDF("id", "name"), dir)
    }
    assert(typeEx.getMessage.contains("change type"))

    assert(SchemaEvolution.readEvolved(spark, dir).count() == 2, "rejected writes left no rows")
  }

  test("RENAME COLUMN is metadata-only and spans file generations; DROP tombstones") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-rename").resolve("t").toString

    SchemaEvolution.appendEvolved(spark, Seq((1L, 10.0)).toDF("id", "amount"), dir)
    val filesBefore = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).count()

    SchemaEvolution.renameColumn(spark, dir, "amount", "total_amount")
    val filesAfter = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).count()
    assert(filesBefore == filesAfter, "rename rewrites zero files")

    // Writers use the NEW logical name; old+new generations read back under it.
    SchemaEvolution.appendEvolved(spark, Seq((2L, 20.0)).toDF("id", "total_amount"), dir)
    val read = SchemaEvolution.readEvolved(spark, dir)
    assert(read.columns.sorted.toSeq == Seq("id", "total_amount"))
    assert(read.selectExpr("sum(total_amount)").collect()(0).getDouble(0) == 30.0,
      "both generations surface under the logical name")

    // The OLD name is gone: writing it is a drop+add violation.
    intercept[IllegalArgumentException] {
      SchemaEvolution.appendEvolved(spark, Seq((3L, 30.0)).toDF("id", "amount"), dir)
    }
    // Renaming onto a live name is refused.
    intercept[IllegalArgumentException] {
      SchemaEvolution.renameColumn(spark, dir, "total_amount", "id")
    }

    // DROP COLUMN tombstones; re-ADDing the logical name mints a fresh
    // physical name (the tombstoned bytes stay in the immutable files).
    SchemaEvolution.dropColumn(spark, dir, "total_amount")
    assert(SchemaEvolution.readEvolved(spark, dir).columns.toSeq == Seq("id"))
    SchemaEvolution.appendEvolved(
      spark, Seq((4L, "fresh")).toDF("id", "total_amount"), dir)
    val revived = SchemaEvolution.readEvolved(spark, dir)
    assert(revived.columns.sorted.toSeq == Seq("id", "total_amount"))
    assert(revived.filter("id = 4").select("total_amount").collect()(0).getString(0) == "fresh")
    assert(revived.filter("id = 1").collect()(0).isNullAt(revived.columns.indexOf("total_amount")),
      "pre-drop rows null-fill the re-added column (old bytes stay tombstoned)")
  }

  test("widenColumn: INT->DOUBLE upcast spans generations; pre-widen writers still land") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-widen").resolve("t").toString

    SchemaEvolution.appendEvolved(spark, Seq((1L, 10), (2L, 20)).toDF("id", "qty"), dir)
    // Pre-widen: a double batch is rejected (strict enforcement).
    intercept[IllegalArgumentException] {
      SchemaEvolution.appendEvolved(spark, Seq((3L, 30.5)).toDF("id", "qty"), dir)
    }

    SchemaEvolution.widenColumn(spark, dir, "qty", DoubleType)
    // Post-widen: doubles land, and an OLD writer's int batch still lands.
    SchemaEvolution.appendEvolved(spark, Seq((3L, 30.5)).toDF("id", "qty"), dir)
    SchemaEvolution.appendEvolved(spark, Seq((4L, 40)).toDF("id", "qty"), dir)

    val read = SchemaEvolution.readEvolved(spark, dir)
    assert(read.schema("qty").dataType == DoubleType)
    val byId = read.collect().map(r => r.getLong(read.columns.indexOf("id")) ->
      r.getDouble(read.columns.indexOf("qty"))).toMap
    assert(byId == Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.5, 4L -> 40.0),
      s"old int files must upcast at scan: $byId")

    // Unrelated columns stay strictly enforced after the widen.
    intercept[IllegalArgumentException] {
      SchemaEvolution.appendEvolved(spark, Seq(("x", 1.0)).toDF("id", "qty"), dir)
    }
    // Narrowing is never a widen.
    intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumn(spark, dir, "qty", IntegerType)
    }
  }

  test("widenColumn: STRING->TIMESTAMP via projection cast, ISO-string physical form") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-widents").resolve("t").toString

    SchemaEvolution.appendEvolved(spark,
      Seq((1L, "2024-01-05 10:30:00")).toDF("id", "shipped_at"), dir)
    SchemaEvolution.widenColumn(spark, dir, "shipped_at", TimestampType)

    // New writers append typed timestamps; physically they land as strings.
    SchemaEvolution.appendEvolved(spark,
      Seq((2L, java.sql.Timestamp.valueOf("2024-02-06 11:45:00")))
        .toDF("id", "shipped_at"), dir)

    val read = SchemaEvolution.readEvolved(spark, dir)
    assert(read.schema("shipped_at").dataType == TimestampType)
    val months = read.selectExpr("id", "month(shipped_at) AS m").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(months == Map(1L -> 1, 2L -> 2), s"both generations read as timestamps: $months")

    // An old writer's string batch still lands post-widen.
    SchemaEvolution.appendEvolved(spark,
      Seq((3L, "2024-03-07 09:00:00")).toDF("id", "shipped_at"), dir)
    assert(SchemaEvolution.readEvolved(spark, dir)
      .selectExpr("month(shipped_at)").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }

  test("widen composes with rename and ADD COLUMN") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-widenmix").resolve("t").toString

    SchemaEvolution.appendEvolved(spark, Seq((1L, 5)).toDF("id", "amount"), dir)
    SchemaEvolution.renameColumn(spark, dir, "amount", "total")
    SchemaEvolution.widenColumn(spark, dir, "total", LongType)
    SchemaEvolution.appendEvolved(spark,
      Seq((2L, 7L, "eu")).toDF("id", "total", "region"), dir)

    val read = SchemaEvolution.readEvolved(spark, dir)
    assert(read.schema("total").dataType == LongType)
    assert(read.columns.sorted.toSeq == Seq("id", "region", "total"))
    val rows = read.selectExpr("id", "total", "region").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(rows == Set((1L, 5L, null), (2L, 7L, "eu")))
  }

  test("widenColumn: long->double is rejected (no reader promotion, lossy above 2^53)") {
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-widenrej").resolve("t").toString
    SchemaEvolution.appendEvolved(spark, Seq((1L, 5L)).toDF("id", "big"), dir)
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.widenColumn(spark, dir, "big", DoubleType)
    }
    assert(e.getMessage.contains("unsupported type change"))
    // The table stays readable with its original type after the rejection.
    assert(SchemaEvolution.readEvolved(spark, dir).schema("big").dataType == LongType)
  }
}
