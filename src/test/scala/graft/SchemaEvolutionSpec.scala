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
    val dir = Files.createTempDirectory("graft-evolve").resolve("t").toString

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
    val dir = Files.createTempDirectory("graft-rename").resolve("t").toString

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
}
