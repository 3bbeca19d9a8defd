package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** INSERT OVERWRITE and INSERT INTO ... REPLACE WHERE statements: atomic
  * whole-table / predicate-scoped overwrite commits over versioned
  * tables — one new version per statement, prior versions readable,
  * out-of-window batches rejected with the table untouched. */
class ReplaceWhereSpec extends SparkSuite {

  private var n = 0
  private def seed(): (String, String) = {
    val s = spark
    import s.implicits._
    n += 1
    val name = s"rpw_t$n"
    val dir = graft.tables.TmpDirs.create("graft-rpw")
      .resolve(name).toString
    ParquetTable.swap(spark,
      Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0),
        (4L, "C", 40.0), (5L, "B", 50.0), (6L, "C", 60.0))
        .toDF("id", "status", "price").repartition(3), dir)
    GraftSql.register(spark, name, dir, Seq("id"))
    (name, dir)
  }

  private def state(name: String): Set[(Long, String, Double)] =
    GraftSql.sql(spark, s"SELECT * FROM $name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("REPLACE WHERE swaps the window in one commit, leaves the rest untouched") {
    val (name, dir) = seed()
    val v0 = ParquetTable.snapshots(dir).size
    // Window = even ids; batch restates only id 2 and 6.
    GraftSql.sql(spark,
      s"""INSERT INTO $name REPLACE WHERE id % 2 = 0
         |SELECT id, 'R' AS status, price * 2 AS price FROM $name
         |WHERE id % 2 = 0 AND id <> 4""".stripMargin)
    assert(state(name) == Set(
      (1L, "A", 10.0), (3L, "A", 30.0), (5L, "B", 50.0), // untouched
      (2L, "R", 40.0), (6L, "R", 120.0)))                // restated; 4 vanished
    // ONE new version for the whole delete+insert.
    assert(ParquetTable.snapshots(dir).size == v0 + 1)
  }

  test("a batch outside its replace window is rejected; table unchanged") {
    val (name, dir) = seed()
    val before = state(name)
    val v0 = ParquetTable.snapshots(dir).size
    val e = intercept[Exception] {
      GraftSql.sql(spark,
        s"""INSERT INTO $name REPLACE WHERE id % 2 = 0
           |SELECT id, status, price FROM $name WHERE id IN (2, 3)""".stripMargin)
    }
    assert(e.getMessage.contains("replace window"))
    assert(state(name) == before)
    assert(ParquetTable.snapshots(dir).size == v0)
  }

  test("INSERT OVERWRITE replaces the live snapshot but preserves history") {
    val (name, dir) = seed()
    GraftSql.sql(spark,
      s"INSERT OVERWRITE $name SELECT id, 'O' AS status, price FROM $name WHERE id <= 2")
    assert(state(name) == Set((1L, "O", 10.0), (2L, "O", 20.0)))
    // The pre-overwrite snapshot is still a readable version.
    val v1 = GraftSql.sql(spark, s"SELECT count(*) AS n FROM $name VERSION AS OF 1")
      .head.getLong(0)
    assert(v1 == 6L)
    // Arity is enforced: a column-dropping SELECT is rejected.
    val e = intercept[Exception] {
      GraftSql.sql(spark, s"INSERT OVERWRITE $name SELECT id, status FROM $name")
    }
    assert(e.getMessage.contains("must exactly match"))
  }

  test("CHECK constraints gate both overwrite spellings") {
    val (name, _) = seed()
    GraftSql.sql(spark,
      s"ALTER TABLE $name ADD CONSTRAINT pos CHECK (price > 0)")
    val before = state(name)
    intercept[Exception] {
      GraftSql.sql(spark,
        s"INSERT OVERWRITE $name SELECT id, status, -price AS price FROM $name")
    }
    intercept[Exception] {
      GraftSql.sql(spark,
        s"""INSERT INTO $name REPLACE WHERE id % 2 = 0
           |SELECT id, status, -price AS price FROM $name WHERE id % 2 = 0""".stripMargin)
    }
    assert(state(name) == before)
  }
}
