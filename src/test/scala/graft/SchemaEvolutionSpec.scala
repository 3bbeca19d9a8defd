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
}
