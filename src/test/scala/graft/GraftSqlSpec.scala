package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** The SQL-statement spellings for table utilities: DESCRIBE HISTORY /
  * DESCRIBE DETAIL as whole statements, table_changes as a table-valued
  * call rewritten into plain spark.sql — reference db/query_table.sql:4-9
  * and db/query_scd1_table.sql:157-158. */
class GraftSqlSpec extends SparkSuite {

  private def seedTable(): String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gsql")
      .resolve("t").toString
    ParquetTable.swap(spark,
      Seq((1L, "A"), (2L, "B")).toDF("id", "status"), dir)
    ParquetTable.swap(spark,
      Seq((1L, "A"), (2L, "X"), (3L, "C")).toDF("id", "status"), dir)
    ParquetTable.swap(spark,
      Seq((2L, "X"), (3L, "C"), (4L, "D")).toDF("id", "status"), dir)
    dir
  }

  test("DESCRIBE HISTORY: all versions newest-first, LIMIT respected, timestamps present") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_t", dir, Seq("id"))
    val h = GraftSql.sql(spark, "DESCRIBE HISTORY gsql_t").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L))
    assert(h.map(_.getBoolean(3)).toSeq == Seq(true, false, false))
    assert(h.map(_.getLong(4)).toSeq == Seq(3L, 3L, 2L), "row counts per version")
    assert(h.forall(!_.isNullAt(2)), "publish timestamps from _HISTORY")
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY gsql_t LIMIT 2").count() == 2)
  }

  test("DESCRIBE DETAIL: one live-snapshot row") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_d", dir, Seq("id"))
    val d = GraftSql.sql(spark, "DESCRIBE DETAIL gsql_d").collect()
    assert(d.length == 1)
    val r = d.head
    assert(r.getString(0) == "parquet" && r.getString(1) == "gsql_d")
    assert(r.getString(2) == dir)
    assert(r.getLong(3) == 3L && r.getLong(4) == 3L && r.getLong(5) == 3L)
  }

  test("table_changes composes inside arbitrary SQL and spans version gaps") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_c", dir, Seq("id"))
    // v1 -> v3 endpoint diff: id 1 deleted, ids 3,4 inserted, id 2 updated.
    val agg = GraftSql.sql(spark,
      """SELECT _change_type, count(*) AS n
        |FROM table_changes('gsql_c', 1, 3)
        |GROUP BY _change_type ORDER BY _change_type""".stripMargin).collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 1L), ("insert", 2L),
        ("update_postimage", 1L), ("update_preimage", 1L)))
    // Composes with WHERE + projection; _commit_version carries v2.
    val ins = GraftSql.sql(spark,
      "SELECT id, _commit_version FROM table_changes('gsql_c', 2, 3) WHERE _change_type = 'insert'")
      .collect()
    assert(ins.map(_.getLong(0)).toSeq == Seq(4L))
    assert(ins.head.getLong(1) == 3L)
  }

  test("OPTIMIZE / VACUUM / RESTORE statements run the table lifecycle") {
    val dir = seedTable() // versions 1, 2, 3
    GraftSql.register(spark, "gsql_m", dir, Seq("id"))

    val contentBefore = ParquetTable.read(spark, dir)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val opt = GraftSql.sql(spark, "OPTIMIZE gsql_m").collect().head
    assert(opt.getAs[Long]("new_version") == 4L)
    assert(ParquetTable.read(spark, dir)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq == contentBefore,
      "OPTIMIZE must preserve content")

    val dry = GraftSql.sql(spark, "VACUUM gsql_m DRY RUN").collect()
    assert(dry.map(_.getAs[Long]("version")).sorted.toSeq == Seq(1L, 2L, 3L),
      "dry run lists every superseded version, deletes nothing")
    assert(ParquetTable.snapshots(dir).size == 4)

    // RESTORE to the first version commits the rollback as version 5.
    val rst = GraftSql.sql(spark, "RESTORE TABLE gsql_m TO VERSION AS OF 1").collect().head
    assert(rst.getAs[Long]("new_version") == 5L && rst.getAs[Long]("n_rows") == 2L)
    assert(ParquetTable.read(spark, dir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // ZORDER spelling commits another version, content preserved.
    GraftSql.sql(spark, "OPTIMIZE gsql_m ZORDER BY (id)").collect()
    assert(ParquetTable.read(spark, dir).count() == 2)

    val gone = GraftSql.sql(spark, "VACUUM gsql_m").collect()
    assert(gone.nonEmpty && ParquetTable.snapshots(dir).size == 1,
      "VACUUM keeps only the live version")
    assert(ParquetTable.read(spark, dir).count() == 2, "live snapshot untouched")
  }

  test("SET/SHOW TBLPROPERTIES merge into the _PROPS manifest") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_p", dir, Seq("id"))
    GraftSql.sql(spark,
      "ALTER TABLE gsql_p SET TBLPROPERTIES ('graft.autoOptimize' = 'true', 'owner' = 'ingest')")
    GraftSql.sql(spark,
      "ALTER TABLE gsql_p SET TBLPROPERTIES ('owner' = 'curation')")
    val props = GraftSql.sql(spark, "SHOW TBLPROPERTIES gsql_p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props == Map("graft.autoOptimize" -> "true", "owner" -> "curation"),
      s"later SET must merge-overwrite: $props")
  }

  test("unregistered table and missing version fail loudly") {
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "DESCRIBE HISTORY never_registered")
    }
    val dir = seedTable()
    GraftSql.register(spark, "gsql_e", dir, Seq("id"))
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT * FROM table_changes('gsql_e', 1, 9)")
    }
  }
}
