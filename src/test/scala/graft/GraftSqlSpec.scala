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
    val dir = graft.tables.TmpDirs.create("graft-gsql")
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

  test("VERSION AS OF / TIMESTAMP AS OF rewrite inside plain SQL") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_tt", dir, Seq("id"))
    val v1 = GraftSql.sql(spark,
      "SELECT count(*) AS n, max(id) AS mx FROM gsql_tt VERSION AS OF 1").collect().head
    assert((v1.getLong(0), v1.getLong(1)) == (2L, 2L))
    // The AS-OF literal comes from the table's own publish history: one
    // ms before v3's publish must read v2.
    val p = ParquetTable.publishedVersions(dir)
      .map { case (v, ms) => graft.streaming.VersionNames.idOf(v) -> ms }.toMap
    assume(p(2L) < p(3L), "publishes in the same millisecond")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val ts = fmt.format(new java.util.Date(p(3L) - 1))
    val v2 = GraftSql.sql(spark,
      s"SELECT count(*) AS n, min(id) AS mn FROM gsql_tt TIMESTAMP AS OF '$ts'").collect().head
    assert((v2.getLong(0), v2.getLong(1)) == (3L, 1L), "one ms before v3 reads v2")
    // An UNREGISTERED identifier in the same shape passes through to
    // spark.sql untouched (and fails there, not in the shim).
    intercept[Exception] {
      GraftSql.sql(spark, "SELECT * FROM not_registered VERSION AS OF 1")
    }
  }

  test("CREATE TABLE ... SHALLOW/DEEP CLONE register and diverge") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_src", dir, Seq("id"))
    GraftSql.sql(spark, "CREATE TABLE gsql_sc SHALLOW CLONE gsql_src")
    GraftSql.sql(spark, "CREATE TABLE gsql_dc DEEP CLONE gsql_src")
    assert(GraftSql.sql(spark, "DESCRIBE DETAIL gsql_sc").collect().head.getLong(5) == 3L)
    assert(GraftSql.sql(spark, "DESCRIBE DETAIL gsql_dc").collect().head.getLong(5) == 3L)
    // Divergence: dropping a row in the shallow clone leaves the source.
    val scDir = java.nio.file.Paths.get(dir).toAbsolutePath.normalize
      .resolveSibling("gsql_sc").toString
    ParquetTable.swap(spark, ParquetTable.read(spark, scDir).filter(col("id") =!= 2L), scDir)
    assert(ParquetTable.read(spark, scDir).count() == 2L)
    assert(ParquetTable.read(spark, dir).count() == 3L)
  }

  test("RESTORE TO TIMESTAMP AS OF rolls back to the newest covered snapshot") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_rt", dir, Seq("id"))
    val p = ParquetTable.publishedVersions(dir)
      .map { case (v, ms) => graft.streaming.VersionNames.idOf(v) -> ms }.toMap
    assume(p(1L) < p(2L), "publishes in the same millisecond")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val ts = fmt.format(new java.util.Date(p(2L) - 1))
    val r = GraftSql.sql(spark,
      s"RESTORE TABLE gsql_rt TO TIMESTAMP AS OF '$ts'").collect().head
    assert(r.getLong(1) == 1L, s"restored_from v1, got $r")
    assert(ParquetTable.read(spark, dir).count() == 2L, "v1 content is live again")
    assert(ParquetTable.snapshots(dir).size == 4, "restore commits, never rewrites history")
  }

  test("schema DDL spellings: ADD COLUMNS, RENAME, DROP, ALTER COLUMN TYPE") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-gsql-ddl")
      .resolve("t").toString
    Seq((1, 10), (2, 20)).toDF("id", "qty").write.parquet(dir)
    GraftSql.register(spark, "gsql_ddl", dir)
    GraftSql.sql(spark, "ALTER TABLE gsql_ddl RENAME COLUMN qty TO quantity")
    GraftSql.sql(spark,
      "ALTER TABLE gsql_ddl ADD COLUMNS (note STRING COMMENT 'free text', score DOUBLE)")
    GraftSql.sql(spark, "ALTER TABLE gsql_ddl DROP COLUMN note")
    GraftSql.sql(spark, "ALTER TABLE gsql_ddl ALTER COLUMN quantity TYPE BIGINT")
    val out = graft.tables.SchemaEvolution.readEvolved(spark, dir)
    assert(out.columns.toSeq == Seq("id", "quantity", "score"),
      s"renamed + added - dropped: ${out.columns.toSeq}")
    assert(out.schema("quantity").dataType.simpleString == "bigint")
    assert(out.filter(col("score").isNotNull).count() == 0, "pre-DDL files null-fill")
    assert(out.agg(sum("quantity")).collect().head.getLong(0) == 30L)
    // DEFAULT clauses are rejected, not silently dropped...
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "ALTER TABLE gsql_ddl ADD COLUMNS (v STRING DEFAULT '1.0')")
    }
    // ...but the word inside a COMMENT string must not trip the check.
    GraftSql.sql(spark,
      "ALTER TABLE gsql_ddl ADD COLUMNS (memo STRING COMMENT 'defaults to empty')")
    assert(graft.tables.SchemaEvolution.readEvolved(spark, dir)
      .columns.contains("memo"))
  }

  test("column comments: ADD COLUMNS captures them; ALTER COLUMN COMMENT sets and survives RENAME") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-gsql-cc")
      .resolve("t").toString
    Seq((1, 10)).toDF("id", "qty").write.parquet(dir)
    GraftSql.register(spark, "gsql_cc", dir)
    GraftSql.sql(spark,
      "ALTER TABLE gsql_cc ADD COLUMNS (note STRING COMMENT 'free-form note')")
    GraftSql.sql(spark, "ALTER TABLE gsql_cc ALTER COLUMN qty COMMENT 'unit count'")
    def commentOf(c: String): String = {
      val f = graft.tables.SchemaEvolution.readEvolved(spark, dir).schema(c)
      if (f.metadata.contains("comment")) f.metadata.getString("comment") else ""
    }
    assert(commentOf("note") == "free-form note")
    assert(commentOf("qty") == "unit count")
    // The comment is keyed by PHYSICAL name: a rename keeps it.
    GraftSql.sql(spark, "ALTER TABLE gsql_cc RENAME COLUMN qty TO quantity")
    assert(commentOf("quantity") == "unit count")
  }

  test("CREATE TABLE (cols) + INSERT INTO SELECT: the type-change recipe") {
    val s = spark
    import s.implicits._
    Seq((1L, "2.5"), (2L, "7.25")).toDF("id", "amount_str")
      .createOrReplaceTempView("gsql_src_v")
    val created = GraftSql.sql(spark,
      "CREATE TABLE gsql_ct (id BIGINT COMMENT 'key', amount DECIMAL(20,4))")
      .collect().head
    // Empty declared table reads back typed with zero rows.
    val loc = created.getString(1)
    val empty = graft.tables.SchemaEvolution.readEvolved(spark, loc)
    assert(empty.count() == 0)
    assert(empty.schema("amount").dataType.simpleString == "decimal(20,4)")
    val r = GraftSql.sql(spark,
      "INSERT INTO gsql_ct SELECT id, CAST(amount_str AS DECIMAL(20,4)) AS amount FROM gsql_src_v")
      .collect().head
    assert(r.getLong(1) == 2L, s"n_inserted: $r")
    val back = graft.tables.SchemaEvolution.readEvolved(spark, loc)
    assert(back.schema("id").metadata.getString("comment") == "key")
    assert(back.selectExpr("CAST(sum(amount) AS STRING)").collect().head.getString(0)
      == "9.7500")
    // Type enforcement: inserting the WRONG type is rejected loudly.
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "INSERT INTO gsql_ct SELECT id, CAST(1.5 AS DOUBLE) AS amount FROM gsql_src_v")
    }
    // Arity enforcement: an extra SELECT column must not silently widen
    // the table through the additive-evolution path.
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "INSERT INTO gsql_ct SELECT id, CAST(amount_str AS DECIMAL(20,4)) AS amount, 1 AS junk FROM gsql_src_v")
    }
    // Re-running CREATE must fail loudly, not shadow the table.
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "CREATE TABLE gsql_ct (id BIGINT, amount DECIMAL(20,4))")
    }
  }

  test("DROP TABLE unregisters (files untouched); IF EXISTS is a no-op; plain SELECT and DESCRIBE work over mounts") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_drop", dir, Seq("id"))

    // The fallback mounts registered names for plain SQL — SELECT and
    // DESCRIBE (reference db/table_maintenance.sql DESCRIBE spellings)
    // both resolve without the caller creating views.
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_drop").head().getLong(0) == 3L)
    val desc = GraftSql.sql(spark, "DESCRIBE gsql_drop")
      .collect().map(_.getString(0)).toSet
    assert(Set("id", "status").subsetOf(desc))
    // Statement-scoped mount: the view is gone from the session after.
    assert(!spark.catalog.tableExists("gsql_drop"))

    val d = GraftSql.sql(spark, "DROP TABLE gsql_drop").head()
    assert(d.getString(1) == "true")
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "DESCRIBE DETAIL gsql_drop"))
    assert(e.getMessage.contains("not registered"))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      "DROP is registry-only; files stay (external-table semantics)")
    // IF EXISTS: missing name is a quiet no-op; bare DROP is loud.
    assert(GraftSql.sql(spark, "DROP TABLE IF EXISTS gsql_drop")
      .head().getString(1) == "false")
    val e2 = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "DROP TABLE gsql_drop"))
    assert(e2.getMessage.contains("not registered"))
    // A pre-existing user temp view with the registered name is restored
    // after a mount, not clobbered.
    val s = spark
    import s.implicits._
    GraftSql.register(spark, "gsql_drop", dir, Seq("id"))
    Seq((99L, "U")).toDF("id", "status").createOrReplaceTempView("gsql_drop")
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_drop").head().getLong(0) == 3L,
      "registered table wins inside GraftSql.sql")
    assert(spark.sql("SELECT count(*) FROM gsql_drop").head().getLong(0) == 1L,
      "the user view is restored afterwards")
    GraftSql.sql(spark, "DROP TABLE gsql_drop")
    spark.catalog.dropTempView("gsql_drop")
    ()
  }

  test("TBLPROPERTIES with tab/newline are rejected before corrupting the manifest") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_bad", dir, Seq("id"))
    intercept[IllegalArgumentException] {
      GraftSql.setProperties(spark, "gsql_bad", Seq("a\tb" -> "v"))
    }
    intercept[IllegalArgumentException] {
      GraftSql.setProperties(spark, "gsql_bad", Seq("k" -> "line1\nline2"))
    }
  }

  test("CREATE TABLE AS SELECT lands a registered, queryable, appendable table") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_src", dir, Seq("id"))
    val r = GraftSql.sql(spark,
      "CREATE TABLE gsql_ctas AS SELECT id, status FROM gsql_src WHERE id >= 3").head()
    assert(r.getAs[Long]("n_rows") == 2L)
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_ctas").head().getLong(0) == 2L)
    // Re-run guard: CTAS over an existing name must fail loudly, not
    // shadow the table with a fresh dir.
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "CREATE TABLE gsql_ctas AS SELECT * FROM gsql_src"))
    assert(e.getMessage.contains("already registered"))
    // The CTAS table is a first-class registry member: INSERT INTO works.
    GraftSql.sql(spark, "INSERT INTO gsql_ctas SELECT id, status FROM gsql_src WHERE id = 2")
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_ctas").head().getLong(0) == 3L)
    GraftSql.sql(spark, "DROP TABLE gsql_ctas")
    GraftSql.sql(spark, "DROP TABLE gsql_src")
    ()
  }

  test("REORG APPLY (PURGE) folds deletion vectors and dropped-column data into clean files") {
    val dir = seedTable() // v1..v3; v3 = (2,X),(3,C),(4,D)
    GraftSql.register(spark, "gsql_r", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE gsql_r DROP COLUMN status")
    assert(ParquetTable.deleteWhereDV(spark, dir, "id = 2") == 1L) // v4, hard-links + _dv
    val v4 = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    assert(java.nio.file.Files.isDirectory(v4.resolve("_dv")), "precondition: DV present")

    val rr = GraftSql.sql(spark, "REORG TABLE gsql_r APPLY (PURGE)").head()
    assert(rr.getAs[Long]("new_version") == 5L)
    assert(rr.getAs[String]("purged_dv") == "true")
    assert(rr.getAs[String]("purged_columns") == "status")
    val v5 = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    assert(!java.nio.file.Files.isDirectory(v5.resolve("_dv")),
      "vectors are folded in, not carried forward")
    // Physical purge: the rewritten files no longer carry the dropped
    // column's data, and the DV-deleted row is physically gone.
    val phys = spark.read.parquet(v5.toString)
    assert(phys.columns.toSeq == Seq("id"))
    assert(phys.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    // Logical view unchanged vs the pre-REORG merge-on-read state.
    assert(GraftSql.sql(spark, "SELECT CAST(id AS BIGINT) AS id FROM gsql_r ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    GraftSql.sql(spark, "DROP TABLE gsql_r")
    ()
  }

  test("SHOW PARTITIONS lists hive leaves; non-partitioned tables error") {
    val s = spark
    import s.implicits._
    val pdir = graft.tables.TmpDirs.create("graft-gsql-p")
      .resolve("p").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02"), (3L, "2024-01-02"))
      .toDF("v", "dt").write.partitionBy("dt").parquet(pdir)
    GraftSql.register(spark, "gsql_parts", pdir)
    assert(GraftSql.sql(spark, "SHOW PARTITIONS gsql_parts")
      .collect().map(_.getString(0)).toSeq ==
      Seq("dt=2024-01-01", "dt=2024-01-02"))
    val dir = seedTable()
    GraftSql.register(spark, "gsql_flat", dir, Seq("id"))
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "SHOW PARTITIONS gsql_flat"))
    assert(e.getMessage.contains("not partitioned"))
    GraftSql.sql(spark, "DROP TABLE gsql_parts")
    GraftSql.sql(spark, "DROP TABLE gsql_flat")
    ()
  }

  test("COMMENT ON TABLE persists under the comment property; doubled quotes unescape") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_cm", dir, Seq("id"))
    val r = GraftSql.sql(spark, "COMMENT ON TABLE gsql_cm IS 'it''s the orders table'").head()
    assert(r.getString(1) == "it's the orders table")
    val props = GraftSql.sql(spark, "SHOW TBLPROPERTIES gsql_cm").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(props("comment") == "it's the orders table")
    GraftSql.sql(spark, "DROP TABLE gsql_cm")
    ()
  }

  test("schema-qualified and backquoted identifiers resolve across the statement surface") {
    val dir = seedTable()
    GraftSql.register(spark, "db1.tq", dir, Seq("id"))
    // Statement-level spellings: every quoting of the parts keys the
    // same registration.
    assert(GraftSql.sql(spark, "DESCRIBE HISTORY `db1`.`tq`").count() == 3)
    assert(GraftSql.sql(spark,
      "ANALYZE TABLE db1.`tq` COMPUTE STATISTICS FOR COLUMNS id").count() == 1)
    // Time-travel phrase inside a query, bare-dotted spelling.
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM db1.tq VERSION AS OF 1")
      .head().getLong(0) == 2L)
    // Plain mount, backquoted spelling, composing with a WHERE.
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM `db1`.`tq` WHERE id >= 3")
      .head().getLong(0) == 2L)
    // A registered BARE name must never capture the tail of someone
    // else's qualified name: other_db.tq stays unresolved and errors in
    // spark.sql instead of silently reading the bare table's snapshot.
    GraftSql.register(spark, "tq", dir, Seq("id"))
    intercept[Exception](
      GraftSql.sql(spark, "SELECT * FROM other_db.tq VERSION AS OF 1").collect())
    assert(GraftSql.sql(spark, "OPTIMIZE db1.tq").head()
      .getAs[Long]("new_version") == 4L)
    GraftSql.sql(spark, "DROP TABLE `db1`.`tq`")
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "DESCRIBE DETAIL db1.tq"))
    assert(e.getMessage.contains("not registered"))
    GraftSql.sql(spark, "DROP TABLE tq")
    ()
  }

  test("table_files inventory: per-file rows/bytes of the live snapshot, composes in SQL") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_f", dir, Seq("id"))
    val inv = GraftSql.sql(spark, "SELECT * FROM table_files('gsql_f')").collect()
    assert(inv.map(_.getLong(2)).sum == 3L, "rows across files == live snapshot rows")
    assert(inv.forall(_.getLong(1) > 0L), "every file has a real byte size")
    assert(inv.forall(_.getString(0).endsWith(".parquet")))
    // Composes with ordinary SQL around the phrase, and with a second
    // statement-level table's data untouched by the metadata projection.
    val n = GraftSql.sql(spark,
      "SELECT CAST(sum(rows) AS BIGINT) AS n FROM table_files('gsql_f') WHERE size_bytes > 0")
      .head().getLong(0)
    assert(n == 3L)
    // A literal containing the phrase is data.
    assert(GraftSql.sql(spark,
      "SELECT 'see table_files(''x'')' AS s FROM gsql_f WHERE id = 2")
      .head().getString(0) == "see table_files('x')")
    // A ZERO-row part file still appears in the inventory (rows = 0):
    // plant an empty-but-valid parquet file into the live snapshot.
    val s2 = spark
    import s2.implicits._
    val emptyDir = graft.tables.TmpDirs.create("graft-empty").toString
    Seq.empty[(Long, String)].toDF("id", "status")
      .coalesce(1).write.mode("overwrite").parquet(emptyDir)
    val src = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(emptyDir)).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
    }
    val snap = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    java.nio.file.Files.copy(src, snap.resolve("part-99998-planted-empty.parquet"))
    val inv2 = GraftSql.sql(spark, "SELECT * FROM table_files('gsql_f')").collect()
    assert(inv2.exists(r => r.getString(0).contains("planted-empty") && r.getLong(2) == 0L),
      s"zero-row file must appear with rows=0: ${inv2.mkString(",")}")
    assert(inv2.map(_.getLong(2)).sum == 3L)
    GraftSql.sql(spark, "DROP TABLE gsql_f")
    ()
  }

  test("SHOW CREATE TABLE reconstructs runnable DDL across the metadata layers") {
    val s = spark
    import s.implicits._
    GraftSql.sql(spark,
      """CREATE TABLE sct_t (rid BIGINT GENERATED ALWAYS AS IDENTITY,
        |  a BIGINT COMMENT 'the key',
        |  cents BIGINT GENERATED ALWAYS AS (a * 100))""".stripMargin)
    GraftSql.sql(spark, "ALTER TABLE sct_t ADD CONSTRAINT a_pos CHECK (a > 0)")
    GraftSql.sql(spark, "ALTER TABLE sct_t ADD CONSTRAINT a_uniq UNIQUE (a)")
    GraftSql.sql(spark, "ALTER TABLE sct_t SET TBLPROPERTIES ('owner' = 'ops')")
    val stmt = GraftSql.sql(spark, "SHOW CREATE TABLE sct_t").head().getString(0)
    for (piece <- Seq(
        "rid BIGINT GENERATED ALWAYS AS IDENTITY",
        "a BIGINT COMMENT 'the key'",
        "cents BIGINT GENERATED ALWAYS AS (a * 100)",
        "ADD CONSTRAINT a_pos CHECK (a > 0)",
        "ADD CONSTRAINT a_uniq UNIQUE (a)",
        "'owner' = 'ops'"))
      assert(stmt.contains(piece), s"missing [$piece] in:\n$stmt")
    assert(!stmt.contains("graft."), "reserved properties must not leak into TBLPROPERTIES")
    // Round-trip: the emitted DDL re-runs under a new name.
    val head = stmt.linesIterator.takeWhile(!_.startsWith("ALTER")).mkString("\n")
      .replace("CREATE TABLE sct_t", "CREATE TABLE sct_t2")
      .replace("\nTBLPROPERTIES", ";\nTBLPROPERTIES").split(";").head
    GraftSql.sql(spark, head)
    Seq((5L)).toDF("a").createOrReplaceTempView("sct_src")
    GraftSql.sql(spark, "INSERT INTO sct_t2 SELECT a FROM sct_src")
    assert(GraftSql.sql(spark, "SELECT rid, a, cents FROM sct_t2").head().getLong(2) == 500L)
    GraftSql.sql(spark, "DROP TABLE sct_t"); GraftSql.sql(spark, "DROP TABLE sct_t2")
    ()
  }

  test("vector index lifecycle: CREATE/search/DROP, re-CREATE guard, unknown index errors") {
    val s = spark
    import s.implicits._
    Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.1f, 0.9f)), (4L, Array(0.7f, 0.7f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("vix_src")
    val made = GraftSql.sql(spark,
      "CREATE VECTOR INDEX vix_t ON vix_src (embedding) KEY vec_id CELLS 2")
    assert(made.head().getAs[Long]("n_vectors") == 5L)
    // Probe 0 (1,0) lands in cell 0 with vectors {2, 4}: nearest is 2.
    Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("vix_probe")
    val hits = GraftSql.sql(spark,
      "SELECT neighbor_id FROM vector_search('vix_t', 'vix_probe', 1)").collect()
    assert(hits.map(_.getLong(0)).toSeq == Seq(2L))
    val dup = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE VECTOR INDEX vix_t ON vix_src (embedding) KEY vec_id"))
    assert(dup.getMessage.contains("already exists"))
    GraftSql.sql(spark, "DROP VECTOR INDEX vix_t")
    val gone = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "SELECT * FROM vector_search('vix_t', 'vix_probe', 1)").collect())
    assert(gone.getMessage.contains("does not exist"))
  }

  test("auto-compaction: trickle INSERTs self-compact past the file threshold, content intact") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-ac").resolve("t").toString
    ParquetTable.swap(spark, Seq((1L, "A")).toDF("id", "status"), dir)
    GraftSql.register(spark, "gsql_ac", dir, Seq("id"))
    def insert(k: Long): Unit = {
      Seq((k, s"S$k")).toDF("id", "status").createOrReplaceTempView("ac_src")
      GraftSql.sql(spark, "INSERT INTO gsql_ac SELECT id, status FROM ac_src")
      ()
    }
    def nFiles() = GraftSql.sql(spark, "SELECT count(*) AS n FROM table_files('gsql_ac')")
      .head().getLong(0)
    try {
      // Hook off: appends accumulate files unboundedly.
      insert(2); insert(3)
      val before = nFiles()
      assert(before >= 3, s"each append adds a file: $before")
      // Hook on: the next append crosses the gate and self-compacts to
      // the bin-packing target (tiny bytes → 1 file), as a NEW version.
      spark.conf.set("spark.graft.autoCompact.minFiles", "3")
      val vBefore = GraftSql.sql(spark, "DESCRIBE HISTORY gsql_ac").head().getLong(0)
      insert(4)
      assert(nFiles() == 1L, "compacted to the 128MB-target file count")
      val vAfter = GraftSql.sql(spark, "DESCRIBE HISTORY gsql_ac").head().getLong(0)
      assert(vAfter == vBefore + 2, "append commit + compaction commit")
      // Content survives byte-for-byte: all four rows, one file.
      assert(ParquetTable.read(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
        .toSet == Set((1L, "A"), (2L, "S2"), (3L, "S3"), (4L, "S4")))
      // Converged: an already-healthy table never re-compacts (no-op gate).
      insert(5)
      assert(nFiles() <= 2L, "one fresh append file at most")
      val vFinal = GraftSql.sql(spark, "DESCRIBE HISTORY gsql_ac").head().getLong(0)
      assert(vFinal == vAfter + 1, "plain append, no compaction churn")
    } finally {
      spark.conf.unset("spark.graft.autoCompact.minFiles")
      GraftSql.sql(spark, "DROP TABLE gsql_ac")
      ()
    }
  }

  test("QUALIFY: inline-window and alias forms, post-filter ORDER BY/LIMIT, literals untouched") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_q", dir, Seq("id"))
    // Inline-window predicate (no alias): best row per status letter.
    val top = GraftSql.sql(spark,
      """SELECT status, id FROM gsql_q
        |QUALIFY row_number() OVER (PARTITION BY status ORDER BY id DESC) = 1
        |ORDER BY status""".stripMargin).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("C", 3L), ("D", 4L), ("X", 2L)))
    // The synthetic predicate column must not leak into the result.
    assert(top.head.schema.fieldNames.toSeq == Seq("status", "id"))
    // Alias form + LIMIT: the limit applies AFTER the qualify filter.
    val ranked = GraftSql.sql(spark,
      """SELECT id, row_number() OVER (ORDER BY id DESC, status) AS rn FROM gsql_q
        |QUALIFY rn <= 2 ORDER BY rn LIMIT 1""".stripMargin).collect()
    assert(ranked.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((4L, 1)))
    // Composes with the AS-OF phrase rewrite (recursion through sql()).
    assert(GraftSql.sql(spark,
      """SELECT id FROM gsql_q VERSION AS OF 1
        |QUALIFY row_number() OVER (ORDER BY id) = 1""".stripMargin)
      .head().getLong(0) == 1L)
    // QUALIFY inside a string literal is data, not a clause.
    assert(GraftSql.sql(spark,
      "SELECT 'use QUALIFY here' AS s FROM gsql_q WHERE id = 2")
      .head().getString(0) == "use QUALIFY here")
    // Inline-window predicate under SELECT DISTINCT would silently
    // change the dedup grain — rejected loudly, with the workaround.
    val dq = intercept[IllegalArgumentException](GraftSql.sql(spark,
      """SELECT DISTINCT status FROM gsql_q
        |QUALIFY row_number() OVER (ORDER BY status) = 1""".stripMargin))
    assert(dq.getMessage.contains("SELECT DISTINCT"))
    GraftSql.sql(spark, "DROP TABLE gsql_q")
    ()
  }

  test("DESCRIBE / DESCRIBE EXTENDED: manifest-table schema + detail section") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_desc", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE gsql_desc SET TBLPROPERTIES ('owner' = 'graft')")
    GraftSql.sql(spark, "ALTER TABLE gsql_desc ALTER COLUMN status COMMENT 'state code'")

    // Plain DESCRIBE: one (col_name, data_type, comment) row per column,
    // comments from the schema manifest, no detail section.
    val plain = GraftSql.sql(spark, "DESCRIBE gsql_desc").collect()
    assert(plain.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("id", "bigint"), ("status", "string")))
    assert(plain.find(_.getString(0) == "status").get.getString(2) == "state code")

    // EXTENDED (the reference's db/table_maintenance.sql:52 and
    // create_scd1_table.deltalake.sql:111 spelling; qualification keys
    // exactly as registered, backquotes normalize away): columns first,
    // then the detail section with the snapshot facts and properties.
    val ext = GraftSql.sql(spark, "DESCRIBE EXTENDED `gsql_desc`").collect()
    val kv = ext.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext.take(2).map(_.getString(0)).toSeq == Seq("id", "status"))
    assert(kv("Name") == "gsql_desc" && kv("Location") == dir)
    assert(kv("Provider") == "parquet" && kv("Type") == "EXTERNAL")
    assert(kv("Current Version") == "3" && kv("Num Snapshots") == "3")
    assert(kv("Num Rows") == "3" && kv("Key Columns") == "id")
    assert(kv("Table Properties").contains("owner=graft"))

    // DESC abbreviation + DESCRIBE TABLE spelling both resolve.
    assert(GraftSql.sql(spark, "DESC gsql_desc").count() == 2)
    assert(GraftSql.sql(spark, "DESCRIBE TABLE gsql_desc").count() == 2)

    // Unregistered names fall through to native DESCRIBE (temp views).
    val s = spark
    import s.implicits._
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("gsql_desc_tv")
    val tv = GraftSql.sql(spark, "DESCRIBE gsql_desc_tv")
      .collect().map(_.getString(0)).toSet
    assert(Set("a", "b").subsetOf(tv))
    spark.catalog.dropTempView("gsql_desc_tv")
    GraftSql.sql(spark, "DROP TABLE gsql_desc")
    ()
  }

  test("table_history TVF composes in plain SQL over the version log") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_th", dir, Seq("id"))
    // version of the largest snapshot, via ordinary SQL over the log
    val r = GraftSql.sql(spark,
      """SELECT CAST(max(version) AS BIGINT) AS v
        |FROM table_history('gsql_th') WHERE n_rows >= 3""".stripMargin).head()
    assert(r.getLong(0) == 3L)
    // joins against the base table work too (mounted in the same statement)
    assert(GraftSql.sql(spark,
      """SELECT CAST(count(*) AS BIGINT) AS n
        |FROM gsql_th CROSS JOIN (SELECT max(version) AS v FROM table_history('gsql_th')) h
        |WHERE h.v = 3""".stripMargin).head().getLong(0) == 3L)
    // a literal containing the phrase is data, not a TVF call
    assert(GraftSql.sql(spark,
      "SELECT 'table_history(''x'')' AS s_col FROM gsql_th WHERE id = 2")
      .head().getString(0) == "table_history('x')")
    GraftSql.sql(spark, "DROP TABLE gsql_th")
    ()
  }

  test("CACHE TABLE serves the pinned snapshot until a write moves the stamp") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_cache", dir, Seq("id"))
    val r = GraftSql.sql(spark, "CACHE TABLE gsql_cache").head()
    assert(r.getString(1) == "3", "eager cache reports the row count")
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_cache").head().getLong(0) == 3L)
    // A write moves the freshness stamp — the next mount must retire the
    // cache and serve the NEW snapshot, with no invalidation hook.
    val s = spark
    import s.implicits._
    Seq((9L, "Z")).toDF("id", "status").createOrReplaceTempView("gsql_cache_src")
    GraftSql.sql(spark, "INSERT INTO gsql_cache SELECT id, status FROM gsql_cache_src")
    assert(GraftSql.sql(spark,
      "SELECT CAST(count(*) AS BIGINT) AS n FROM gsql_cache").head().getLong(0) == 4L,
      "stale cache must not serve the pre-INSERT snapshot")
    // LAZY spelling defers the materialization; UNCACHE is loud on miss.
    assert(GraftSql.sql(spark, "CACHE LAZY TABLE gsql_cache").head().getString(1) == "lazy")
    assert(GraftSql.sql(spark, "UNCACHE TABLE gsql_cache").head().getString(1) == "true")
    val e = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "UNCACHE TABLE gsql_cache"))
    assert(e.getMessage.contains("not cached"))
    assert(GraftSql.sql(spark, "UNCACHE TABLE IF EXISTS gsql_cache")
      .head().getString(1) == "false")
    GraftSql.sql(spark, "DROP TABLE gsql_cache")
    ()
  }

  test("SHOW TABLES lists this session's registrations; LIKE filters; name-sorted") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_sh_a", dir, Seq("id"))
    GraftSql.register(spark, "gsql_sh_b", dir, Seq("id"))
    val all = GraftSql.sql(spark, "SHOW TABLES")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val mine = all.filter(_._1.startsWith("gsql_sh_"))
    assert(mine.map(_._1).toSeq == Seq("gsql_sh_a", "gsql_sh_b"), "sorted, both present")
    assert(mine.forall(_._2 == dir), "locations surface")
    assert(GraftSql.sql(spark, "SHOW TABLES LIKE 'gsql_sh_%'").count() == 2)
    assert(GraftSql.sql(spark, "SHOW TABLES LIKE 'gsql_sh__'").count() == 2,
      "underscore wildcard matches one char")
    assert(GraftSql.sql(spark, "SHOW TABLES LIKE 'gsql_sh_a'").count() == 1)
    assert(GraftSql.sql(spark, "SHOW TABLES LIKE 'no_such_%'").count() == 0)
    GraftSql.sql(spark, "DROP TABLE gsql_sh_a")
    GraftSql.sql(spark, "DROP TABLE gsql_sh_b")
    ()
  }

  test("TRUNCATE TABLE: empty snapshot, schema kept, history time-travels, appends resume") {
    val dir = seedTable() // versions 1,2,3; current = 3 rows
    GraftSql.register(spark, "gsql_tr", dir, Seq("id"))
    val r = GraftSql.sql(spark, "TRUNCATE TABLE gsql_tr").collect().head
    assert(r.getAs[Long]("n_deleted") == 3L)
    val cur = ParquetTable.read(spark, dir)
    assert(cur.count() == 0L, "live snapshot is empty")
    assert(cur.columns.toSeq == Seq("id", "status"),
      "schema survives in the footer-only file")
    // Prior snapshot untouched: time travel still reads 3 rows.
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM gsql_tr VERSION AS OF 3").collect()
      .head.getLong(0) == 3L)
    // The table remains writable: INSERT INTO lands version 5.
    GraftSql.sql(spark,
      "INSERT INTO gsql_tr SELECT CAST(9 AS BIGINT) AS id, 'Z' AS status")
    val after = ParquetTable.read(spark, dir).collect()
    assert(after.map(_.getLong(0)).toSeq == Seq(9L))
    GraftSql.sql(spark, "DROP TABLE gsql_tr")
    ()
  }

  test("ALTER TABLE RENAME TO: registry moves, files untouched, collisions rejected") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_rn", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE gsql_rn RENAME TO gsql_rn2")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_rn2")
      .collect().head.getLong(0) == 3L, "new name resolves")
    val oldGone = intercept[Exception](
      GraftSql.sql(spark, "SELECT * FROM gsql_rn").collect())
    assert(oldGone.getMessage.toLowerCase.contains("gsql_rn"))
    // Renaming onto a live registration is rejected before any change.
    GraftSql.register(spark, "gsql_rn3", dir, Seq("id"))
    val clash = intercept[IllegalArgumentException](
      GraftSql.sql(spark, "ALTER TABLE gsql_rn2 RENAME TO gsql_rn3"))
    assert(clash.getMessage.contains("already registered"))
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_rn2")
      .collect().head.getLong(0) == 3L, "failed rename leaves source intact")
    GraftSql.sql(spark, "DROP TABLE gsql_rn2")
    GraftSql.sql(spark, "DROP TABLE gsql_rn3")
    ()
  }

  test("column DEFAULTs: fill on omit, provided wins, DROP restores arity, SHOW CREATE round-trips") {
    val r = GraftSql.sql(spark,
      "CREATE TABLE gsql_def (id BIGINT, ch STRING, k BIGINT)")
    assert(r.columns.contains("location"))
    GraftSql.sql(spark, "ALTER TABLE gsql_def ALTER COLUMN ch SET DEFAULT 'web'")
    GraftSql.sql(spark, "ALTER TABLE gsql_def ALTER COLUMN k SET DEFAULT 2 + 5")
    // Omit both defaulted columns → they fill; INSERT OVERWRITE (the
    // alignToTable path) fills too.
    GraftSql.sql(spark, "INSERT INTO gsql_def SELECT CAST(1 AS BIGINT) AS id")
    GraftSql.sql(spark,
      "INSERT INTO gsql_def SELECT CAST(2 AS BIGINT) AS id, 'api' AS ch")
    val rows = GraftSql.sql(spark, "SELECT * FROM gsql_def").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(rows == Set((1L, "web", 7L), (2L, "api", 7L)),
      "omitted columns fill, provided channel wins")
    // INSERT OVERWRITE (the alignToTable path) fills too — on a
    // VERSIONED table (OVERWRITE needs snapshot history to preserve).
    val vdir = seedTable()
    GraftSql.register(spark, "gsql_defv", vdir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE gsql_defv ALTER COLUMN status SET DEFAULT 'D'")
    GraftSql.sql(spark,
      "INSERT OVERWRITE gsql_defv SELECT CAST(9 AS BIGINT) AS id")
    assert(GraftSql.sql(spark, "SELECT status FROM gsql_defv").collect()
      .map(_.getString(0)).toSeq == Seq("D"))
    GraftSql.sql(spark, "DROP TABLE gsql_defv")
    // SHOW CREATE round-trips the defaults as ALTER statements.
    val ddl = GraftSql.sql(spark, "SHOW CREATE TABLE gsql_def")
      .collect().head.getString(0)
    assert(ddl.contains("ALTER COLUMN ch SET DEFAULT 'web'") &&
      ddl.contains("ALTER COLUMN k SET DEFAULT 2 + 5"), ddl)
    assert(!ddl.contains("graft.default"), "reserved props never leak")
    // DROP DEFAULT restores the strict arity rule.
    GraftSql.sql(spark, "ALTER TABLE gsql_def ALTER COLUMN k DROP DEFAULT")
    val e = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "INSERT INTO gsql_def SELECT CAST(3 AS BIGINT) AS id"))
    assert(e.getMessage.contains("DEFAULT may be omitted"))
    // Rejections: non-constant expression, unknown column, generated col.
    val nc = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE gsql_def ALTER COLUMN k SET DEFAULT id + 1"))
    assert(nc.getMessage.contains("constant"))
    val uk = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE gsql_def ALTER COLUMN nope SET DEFAULT 1"))
    assert(uk.getMessage.contains("no column"))
    GraftSql.sql(spark, "ALTER TABLE gsql_def ALTER COLUMN ch DROP DEFAULT")
    val nd = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE gsql_def ALTER COLUMN ch DROP DEFAULT"))
    assert(nd.getMessage.contains("has no default"))
    GraftSql.sql(spark, "CREATE TABLE gsql_defg (id BIGINT, d BIGINT GENERATED ALWAYS AS (id * 2))")
    val g = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "ALTER TABLE gsql_defg ALTER COLUMN d SET DEFAULT 5"))
    assert(g.getMessage.contains("GENERATED"))
    GraftSql.sql(spark, "DROP TABLE gsql_def")
    GraftSql.sql(spark, "DROP TABLE gsql_defg")
    ()
  }

  test("CONVERT TO TABLE adopts a plain parquet dir in place, zero-copy") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-conv")
      .resolve("plain").toString
    (1L to 9L).map(i => (i, s"p$i")).toDF("id", "payload")
      .repartition(3).write.parquet(dir)
    val r = GraftSql.sql(spark,
      s"CONVERT TO TABLE gsql_conv FROM '$dir' KEY (id)").collect().head
    assert(r.getAs[Long]("n_files") == 3L)
    // Adopted content reads through the versioned path, original files
    // hard-linked (zero bytes copied), and the full statement surface
    // applies: DML commits v2, time travel reads v1.
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_conv")
      .head().getLong(0) == 9L)
    import scala.jdk.CollectionConverters._
    val v1 = java.nio.file.Paths.get(dir, f"v${1L}%020d")
    val linked = java.nio.file.Files.list(v1).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(linked.nonEmpty && linked.forall(p =>
      java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] > 1),
      "adoption must hard-link, not copy")
    GraftSql.sql(spark, "DELETE FROM gsql_conv WHERE id > 7")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_conv")
      .head().getLong(0) == 7L)
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_conv VERSION AS OF 1")
      .head().getLong(0) == 9L, "pre-adoption content time-travels")
    // Re-converting an adopted dir is refused loudly.
    GraftSql.sql(spark, "DROP TABLE gsql_conv")
    val re = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"CONVERT TO TABLE gsql_conv2 FROM '$dir'"))
    assert(re.getMessage.contains("already a versioned table"))
    ()
  }

  test("graft views: AS-OF bodies compose, nesting, OR REPLACE, cycles loud") {
    val dir = seedTable() // versions 1,2,3; current = 3 rows
    GraftSql.register(spark, "gsql_vw", dir, Seq("id"))
    // The body holds a time-travel phrase — impossible in a Spark temp
    // view; referenced through the view it must read the OLD snapshot.
    GraftSql.sql(spark,
      "CREATE VIEW gsql_v1 AS SELECT id, status FROM gsql_vw VERSION AS OF 1")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_v1")
      .head().getLong(0) == 2L, "v1 snapshot had 2 rows")
    // Nested: a view over the view, with ordinary SQL around it.
    GraftSql.sql(spark,
      "CREATE VIEW gsql_v2 AS SELECT count(*) AS n FROM gsql_v1 WHERE id >= 1")
    assert(GraftSql.sql(spark, "SELECT n + 10 AS m FROM gsql_v2")
      .head().getLong(0) == 12L)
    // The view tracks the LIVE table state for non-pinned bodies.
    GraftSql.sql(spark,
      "CREATE OR REPLACE VIEW gsql_v1 AS SELECT id, status FROM gsql_vw")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_v1")
      .head().getLong(0) == 3L, "replaced body reads the live snapshot")
    GraftSql.sql(spark, "INSERT INTO gsql_vw VALUES (77, 'N')")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_v1")
      .head().getLong(0) == 4L, "text re-execution sees new commits")
    // SHOW VIEWS lists both; DROP removes; broken bodies never register.
    assert(GraftSql.sql(spark, "SHOW VIEWS").collect()
      .map(_.getString(0)).toSet.intersect(Set("gsql_v1", "gsql_v2"))
      == Set("gsql_v1", "gsql_v2"))
    val bad = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE VIEW gsql_v3 AS SELECT nope FROM gsql_vw"))
    assert(bad.getMessage.contains("does not resolve"))
    assert(!GraftSql.sql(spark, "SHOW VIEWS").collect()
      .map(_.getString(0)).contains("gsql_v3"))
    // A cycle fails loudly at CREATE and rolls back to the prior body.
    val cyc = intercept[Exception](GraftSql.sql(spark,
      "CREATE OR REPLACE VIEW gsql_v1 AS SELECT * FROM gsql_v2"))
    assert(cyc.getMessage.contains("depth") || cyc.getMessage.contains("circular"),
      cyc.getMessage.take(200))
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_v1")
      .head().getLong(0) == 4L, "failed replace keeps the previous body")
    // Name collision with a registered table is rejected.
    val clash = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE VIEW gsql_vw AS SELECT 1 AS x"))
    assert(clash.getMessage.contains("registered table"))
    GraftSql.sql(spark, "DROP VIEW gsql_v2")
    GraftSql.sql(spark, "DROP VIEW gsql_v1")
    val gone = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "DROP VIEW gsql_v1"))
    assert(gone.getMessage.contains("does not exist"))
    GraftSql.sql(spark, "DROP VIEW IF EXISTS gsql_v1") // no-op
    GraftSql.sql(spark, "DROP TABLE gsql_vw")
    ()
  }

  test("INSERT column-list/VALUES spellings, CREATE TABLE LIKE, SHOW INDEXES") {
    val s = spark
    import s.implicits._
    val dir = seedTable() // (id BIGINT, status STRING), versioned
    GraftSql.register(spark, "gsql_iv", dir, Seq("id"))
    // Bare VALUES: positional against the full schema.
    GraftSql.sql(spark, "INSERT INTO gsql_iv VALUES (100, 'V'), (101, 'W')")
    // Column list reordered + VALUES.
    GraftSql.sql(spark,
      "INSERT INTO gsql_iv (status, id) VALUES ('X', CAST(102 AS BIGINT))")
    // Column list + SELECT.
    GraftSql.sql(spark,
      "INSERT INTO gsql_iv (id, status) SELECT CAST(103 AS BIGINT), 'Y'")
    val got = GraftSql.sql(spark,
      "SELECT id, status FROM gsql_iv WHERE id >= 100").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((100L, "V"), (101L, "W"), (102L, "X"), (103L, "Y")))
    // Column list lets DEFAULT columns be omitted.
    GraftSql.sql(spark, "ALTER TABLE gsql_iv ALTER COLUMN status SET DEFAULT 'D'")
    GraftSql.sql(spark, "INSERT INTO gsql_iv (id) VALUES (104)")
    assert(GraftSql.sql(spark, "SELECT status FROM gsql_iv WHERE id = 104")
      .collect().head.getString(0) == "D")
    // Arity violations are loud.
    val a1 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "INSERT INTO gsql_iv (id, status) VALUES (1)"))
    assert(a1.getMessage.contains("1 columns for 2 targets"))
    val a2 = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "INSERT INTO gsql_iv VALUES (1)"))
    assert(a2.getMessage.contains("use INSERT INTO"))
    // CREATE TABLE LIKE: empty, schema-identical, independently writable.
    GraftSql.sql(spark, "CREATE TABLE gsql_iv2 LIKE gsql_iv")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_iv2")
      .collect().head.getLong(0) == 0L)
    assert(GraftSql.sql(spark, "SELECT * FROM gsql_iv2").columns.toSeq ==
      Seq("id", "status"))
    GraftSql.sql(spark, "INSERT INTO gsql_iv2 VALUES (1, 'a')")
    assert(GraftSql.sql(spark, "SELECT count(*) AS n FROM gsql_iv")
      .collect().head.getLong(0) == 8L, "source untouched by the copy's insert")
    // SHOW INDEXES reports freshness across commits.
    GraftSql.sql(spark, "CREATE INDEX ix_id ON gsql_iv (id)")
    val fresh = GraftSql.sql(spark, "SHOW INDEXES ON gsql_iv").collect()
    assert(fresh.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("ix_id", "id", "true")))
    GraftSql.sql(spark, "INSERT INTO gsql_iv (id) VALUES (105)")
    assert(GraftSql.sql(spark, "SHOW INDEXES ON gsql_iv")
      .collect().head.getString(2) == "false", "commit staled the index")
    GraftSql.sql(spark, "DROP INDEX ix_id ON gsql_iv")
    GraftSql.sql(spark, "DROP TABLE gsql_iv")
    GraftSql.sql(spark, "DROP TABLE gsql_iv2")
    ()
  }

  test("CREATE/DROP INDEX and index_lookup compose in SQL") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-gsql-ix")
      .resolve("t").toString
    ParquetTable.swap(spark,
      (0L until 400L).map(i => (i, (i * 48271L) % 1009L, s"v$i"))
        .toDF("id", "track", "payload")
        .repartitionByRange(8, org.apache.spark.sql.functions.col("id")),
      dir)
    GraftSql.register(spark, "gsql_ix", dir, Seq("id"))
    val r = GraftSql.sql(spark,
      "CREATE INDEX ix_track ON gsql_ix (track)").collect().head
    assert(r.getAs[Long]("n_postings") == 400L)
    // The phrase composes inside ordinary SQL (join/aggregate around it).
    val got = GraftSql.sql(spark,
      "SELECT count(*) AS n, min(id) AS min_id " +
        "FROM index_lookup('gsql_ix', 'track', 0, 100)").collect().head
    val want = ParquetTable.read(spark, dir)
      .filter(col("track") <= 100L).agg(count(lit(1)), min("id")).collect().head
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
    // Non-integral column refused; unknown index DROP refused.
    val ni = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE INDEX ix_p ON gsql_ix (payload)"))
    assert(ni.getMessage.contains("integral"))
    val ui = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "DROP INDEX nope ON gsql_ix"))
    assert(ui.getMessage.contains("no index"))
    // One posting layout per column: a second index on the same column
    // (under another name) would share — and on DROP destroy — the
    // first one's postings; a name reused for a different column would
    // orphan its old layout. Both rejected; same-name same-column
    // re-CREATE is the sanctioned rebuild.
    val dup = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE INDEX ix_track2 ON gsql_ix (track)"))
    assert(dup.getMessage.contains("already indexed by"))
    val reuse = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "CREATE INDEX ix_track ON gsql_ix (id)"))
    assert(reuse.getMessage.contains("already indexes column"))
    assert(GraftSql.sql(spark, "CREATE INDEX ix_track ON gsql_ix (track)")
      .collect().head.getAs[Long]("n_postings") == 400L, "rebuild allowed")
    val d = GraftSql.sql(spark, "DROP INDEX ix_track ON gsql_ix").collect().head
    assert(d.getAs[String]("dropped") == "true")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_VIDX_track")), "index layout deleted")
    // Post-DROP the phrase still answers (full-scan fallback — correct).
    assert(GraftSql.sql(spark,
      "SELECT count(*) AS n FROM index_lookup('gsql_ix', 'track', 0, 100)")
      .collect().head.getLong(0) == want.getLong(0))
    GraftSql.sql(spark, "DROP TABLE gsql_ix")
    ()
  }

  test("EXPLAIN renders the shim-rewritten plan; DML is refused") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_ex", dir, Seq("id"))
    val plan = GraftSql.sql(spark,
      "EXPLAIN SELECT count(*) AS n FROM gsql_ex WHERE id > 1")
      .collect().head.getString(0)
    assert(plan.contains("Physical Plan"), plan.take(200))
    assert(plan.toLowerCase.contains("parquet"),
      "the registered mount resolves to the table's parquet scan")
    val fm = GraftSql.sql(spark,
      "EXPLAIN FORMATTED SELECT id FROM gsql_ex").collect().head.getString(0)
    assert(fm.contains("(1) ") || fm.contains("* "), fm.take(200))
    val dml = intercept[IllegalArgumentException](GraftSql.sql(spark,
      "EXPLAIN DELETE FROM gsql_ex"))
    assert(dml.getMessage.contains("query statements only"))
    GraftSql.sql(spark, "DROP TABLE gsql_ex")
    ()
  }

  test("SHOW COLUMNS lists the evolved logical schema") {
    val dir = seedTable()
    GraftSql.register(spark, "gsql_sc", dir, Seq("id"))
    assert(GraftSql.sql(spark, "SHOW COLUMNS IN gsql_sc")
      .collect().map(_.getString(0)).toSeq == Seq("id", "status"))
    // A logical rename surfaces (column mapping, no file rewrite).
    GraftSql.sql(spark, "ALTER TABLE gsql_sc RENAME COLUMN status TO state")
    assert(GraftSql.sql(spark, "SHOW COLUMNS FROM gsql_sc")
      .collect().map(_.getString(0)).toSeq == Seq("id", "state"))
    GraftSql.sql(spark, "DROP TABLE gsql_sc")
    ()
  }
}
