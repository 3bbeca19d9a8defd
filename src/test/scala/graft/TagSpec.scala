package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.{GraftSql, Tags}

/** Version tags: create/replace/drop/show, the quoted VERSION AS OF
  * spelling, VACUUM protection of tagged versions, and the loud failure
  * modes (duplicate tag, missing tag, missing version). */
class TagSpec extends SparkSuite {

  private def mk(): (String, String) = {
    val dir = graft.tables.TmpDirs.create("graft-tagspec").toString + "/t"
    val df = spark.sql("SELECT * FROM VALUES (1L, 10.0), (2L, 20.0), (3L, 30.0) AS t(k, v)")
    ParquetTable.swap(spark, df, dir)
    val nm = s"tag_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("k"))
    (nm, dir)
  }

  test("tag lifecycle: create, read-through, replace, show, drop") {
    val (nm, dir) = mk()
    GraftSql.sql(spark, s"ALTER TABLE $nm CREATE TAG rel1")
    GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 1")
    // Tag still reads the pristine version after the table moved on.
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm VERSION AS OF 'rel1'")
      .head.getLong(0) == 3L)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 2L)
    // Duplicate create is loud; OR REPLACE moves the binding.
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"ALTER TABLE $nm CREATE TAG rel1")
    }
    assert(e.getMessage.contains("already exists"))
    GraftSql.sql(spark, s"ALTER TABLE $nm CREATE OR REPLACE TAG rel1")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm VERSION AS OF 'rel1'")
      .head.getLong(0) == 2L, "OR REPLACE must rebind to the current version")
    // SHOW TAGS lists bindings; DROP removes them.
    GraftSql.sql(spark, s"ALTER TABLE $nm CREATE TAG audit AS OF VERSION 1")
    val shown = GraftSql.sql(spark, s"SHOW TAGS $nm").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(shown == Seq(("audit", 1L), ("rel1", 2L)))
    GraftSql.sql(spark, s"ALTER TABLE $nm DROP TAG audit")
    assert(GraftSql.sql(spark, s"SHOW TAGS $nm").count() == 1L)
    // Missing tag / missing version are loud.
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"SELECT * FROM $nm VERSION AS OF 'nosuch'")
    }
    assert(e2.getMessage.contains("no tag"))
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"ALTER TABLE $nm CREATE TAG ghost AS OF VERSION 99")
    }
    assert(e3.getMessage.contains("no version"))
  }

  test("VACUUM pins tagged versions and drops only untagged superseded ones") {
    val (nm, dir) = mk()
    GraftSql.sql(spark, s"ALTER TABLE $nm CREATE TAG keepme") // pins v1
    GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 1")       // v2 (untagged)
    GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 2")       // v3 (live)
    val dropped = GraftSql.sql(spark, s"VACUUM $nm").collect()
      .map(_.getString(0)).toSeq
    assert(dropped.size == 1, s"only the untagged superseded version drops, got $dropped")
    // The tagged version still reads.
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm VERSION AS OF 'keepme'")
      .head.getLong(0) == 3L)
    // Dropping the tag releases the pin.
    GraftSql.sql(spark, s"ALTER TABLE $nm DROP TAG keepme")
    val dropped2 = GraftSql.sql(spark, s"VACUUM $nm").collect().map(_.getString(0)).toSeq
    assert(dropped2.size == 1, "the released version now vacuums")
    assert(Tags.tagsOf(dir).isEmpty)
  }
}
