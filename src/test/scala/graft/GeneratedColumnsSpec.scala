package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** GENERATED ALWAYS AS columns: computed when omitted, validated when
  * provided, resolution-checked at CREATE, and value-mutating DML that
  * could leave them stale is rejected loudly. */
class GeneratedColumnsSpec extends SparkSuite {

  private var n = 0
  private def fresh(): String = { n += 1; s"gen_t$n" }

  test("omitted generated column is computed; provided values are validated") {
    val t = fresh()
    GraftSql.sql(spark,
      s"CREATE TABLE $t (a BIGINT, b BIGINT, c BIGINT GENERATED ALWAYS AS (a + b))")
    GraftSql.sql(spark, s"INSERT INTO $t SELECT CAST(1 AS BIGINT) AS a, CAST(2 AS BIGINT) AS b")
    GraftSql.sql(spark, s"INSERT INTO $t SELECT CAST(3 AS BIGINT) AS a, CAST(4 AS BIGINT) AS b, CAST(7 AS BIGINT) AS c") // correct value: accepted
    val rows = GraftSql.sql(spark, s"SELECT * FROM $t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 2L, 3L), (3L, 4L, 7L)))

    val e = intercept[Exception] {
      GraftSql.sql(spark, s"INSERT INTO $t SELECT CAST(5 AS BIGINT) AS a, CAST(5 AS BIGINT) AS b, CAST(11 AS BIGINT) AS c")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS"))
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $t").head.getLong(0) == 2L)
  }

  test("CREATE validates resolution and generated-on-generated; ADD COLUMNS rejects") {
    val bad = intercept[Exception] {
      GraftSql.sql(spark,
        s"CREATE TABLE ${fresh()} (a BIGINT, c BIGINT GENERATED ALWAYS AS (a + nope))")
    }
    assert(bad.getMessage.contains("does not resolve"))
    val chain = intercept[Exception] {
      GraftSql.sql(spark,
        s"CREATE TABLE ${fresh()} (a BIGINT, c BIGINT GENERATED ALWAYS AS (a + 1), d BIGINT GENERATED ALWAYS AS (c + 1))")
    }
    assert(chain.getMessage.contains("another generated column"))

    val t = fresh()
    GraftSql.sql(spark, s"CREATE TABLE $t (a BIGINT)")
    val add = intercept[Exception] {
      GraftSql.sql(spark,
        s"ALTER TABLE $t ADD COLUMNS (g BIGINT GENERATED ALWAYS AS (a * 2))")
    }
    assert(add.getMessage.contains("not supported"))
  }

  test("versioned-table write paths honor the property; UPDATE/MERGE are rejected") {
    val s = spark
    import s.implicits._
    val t = fresh()
    val dir = graft.tables.TmpDirs.create("graft-gen")
      .resolve(t).toString
    ParquetTable.swap(spark,
      Seq((1L, 10L, 11L), (2L, 20L, 22L)).toDF("a", "b", "c"), dir)
    GraftSql.register(spark, t, dir, Seq("a"))
    GraftSql.sql(spark,
      s"ALTER TABLE $t SET TBLPROPERTIES ('graft.generated.c' = 'a + b')")

    // INSERT OVERWRITE omitting c computes it.
    GraftSql.sql(spark, s"INSERT OVERWRITE $t SELECT a, b * 10 AS b FROM $t")
    val rows = GraftSql.sql(spark, s"SELECT * FROM $t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((1L, 100L, 101L), (2L, 200L, 202L)))

    // REPLACE WHERE with a wrong provided value is rejected pre-commit.
    val before = GraftSql.sql(spark, s"SELECT * FROM $t").collect().map(_.toString).sorted.toSeq
    intercept[Exception] {
      GraftSql.sql(spark,
        s"INSERT INTO $t REPLACE WHERE a = 1 SELECT 1 AS a, 5 AS b, 99 AS c")
    }
    assert(GraftSql.sql(spark, s"SELECT * FROM $t")
      .collect().map(_.toString).sorted.toSeq == before)

    val up = intercept[Exception] {
      GraftSql.sql(spark, s"UPDATE $t SET b = 0 WHERE a = 1")
    }
    assert(up.getMessage.contains("GENERATED"))
    // DELETE introduces no values — allowed.
    GraftSql.sql(spark, s"DELETE FROM $t WHERE a = 2")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $t").head.getLong(0) == 1L)
  }

  test("IDENTITY columns: engine-assigned, strictly above prior batches, never providable") {
    val t = fresh()
    GraftSql.sql(spark,
      s"CREATE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    // Non-BIGINT identity rejected at CREATE.
    val bad = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"CREATE TABLE ${t}_bad (id INT GENERATED ALWAYS AS IDENTITY, v STRING)"))
    assert(bad.getMessage.contains("must be BIGINT"))

    GraftSql.sql(spark, s"INSERT INTO $t SELECT 'a' AS v UNION ALL SELECT 'b' AS v")
    val wave1 = GraftSql.sql(spark, s"SELECT id FROM $t").collect().map(_.getLong(0))
    assert(wave1.distinct.length == 2, "unique ids within the batch")
    GraftSql.sql(spark, s"INSERT INTO $t SELECT 'c' AS v")
    val all = GraftSql.sql(spark, s"SELECT id, v FROM $t")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(all.map(_._1).distinct.length == 3, "unique across batches")
    val wave2Id = all.collect { case (i, "c") => i }.head
    assert(wave2Id > wave1.max, "new batch allocates above the high-water mark")
    // Dense allocation: each batch takes exactly [high-water+1-ish
    // start, start+n) with no partition-shaped holes, so three inserted
    // rows across two batches are exactly ids 0,1,2 (the low-water
    // invariant se_identity_insert's oracle pins as min_id = 0).
    assert(all.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L),
      s"dense ids expected, got ${all.map(_._1).sorted.toSeq}")

    val prov = intercept[Exception](GraftSql.sql(spark,
      s"INSERT INTO $t SELECT CAST(99 AS BIGINT) AS id, 'x' AS v"))
    assert(prov.getMessage.contains("IDENTITY"))
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $t").head.getLong(0) == 3L)

    // UPDATE/MERGE could SET the identity column to duplicate values —
    // rejected. (Today the versioned-table gate fires first for
    // CREATE TABLE-made tables; the requireNoGenerated identity arm is
    // the defense-in-depth for any future versioned identity table.)
    val upd = intercept[Exception](GraftSql.sql(spark,
      s"UPDATE $t SET id = 0 WHERE v = 'a'"))
    assert(upd.getMessage.contains("IDENTITY columns") ||
      upd.getMessage.contains("not a versioned table"))

    // A failing CREATE must not leave a registered shell: the corrected
    // retry under the SAME name succeeds.
    intercept[Exception](GraftSql.sql(spark,
      s"CREATE TABLE ${t}_retry (id INT GENERATED ALWAYS AS IDENTITY, v STRING)"))
    GraftSql.sql(spark,
      s"CREATE TABLE ${t}_retry (id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)")
    GraftSql.sql(spark, s"DROP TABLE ${t}_retry")
    ()
  }
}
