package graft

import graft.tables.GraftSql

/** TABLESAMPLE as content-stable hash sampling: reproducibility across
  * runs, seed independence, composition inside larger statements, and
  * loud failures without a registered key. */
class TablesampleSpec extends SparkSuite {

  private lazy val table: String = {
    val dir = graft.tables.TmpDirs.create("graft-tss").toString + "/t"
    graft.streaming.ParquetTable.swap(spark,
      spark.read.parquet(s"$sf001/orders.parquet"), dir)
    val nm = s"tss_orders_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("o_orderkey"))
    nm
  }

  test("same seed → identical rows across runs; different seed → different rows") {
    val q = s"SELECT sum(o_orderkey) AS s, count(*) AS n FROM $table " +
      "TABLESAMPLE (10 PERCENT) REPEATABLE (7)"
    val a = GraftSql.sql(spark, q).head()
    val b = GraftSql.sql(spark, q).head()
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1),
      "the sample must be content-stable, not an RNG draw")
    val c = GraftSql.sql(spark, s"SELECT sum(o_orderkey) AS s, count(*) AS n FROM $table " +
      "TABLESAMPLE (10 PERCENT) REPEATABLE (8)").head()
    assert(c.getLong(0) != a.getLong(0), "a different seed must pick different rows")
    // ~10% of 15000 rows, within generous hash-uniformity slack.
    assert(a.getLong(1) > 1100 && a.getLong(1) < 1900, s"rate off: ${a.getLong(1)}")
  }

  test("composes inside joins and tails; unregistered/keyless fail loudly") {
    val n = GraftSql.sql(spark,
      s"""SELECT count(*) AS n FROM $table TABLESAMPLE (50 PERCENT) t
         |WHERE t.o_orderstatus = 'O'""".stripMargin).head().getLong(0)
    assert(n > 0)
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT * FROM nosuch_tbl TABLESAMPLE (10 PERCENT)")
    }
    assert(e1.getMessage.contains("not registered"))
    val keyless = s"tss_keyless_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, keyless,
      graft.tables.TmpDirs.create("graft-tsk").toString)
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"SELECT * FROM $keyless TABLESAMPLE (10 PERCENT)")
    }
    assert(e2.getMessage.contains("key columns"))
  }
}
