package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** Row-level DML statement spellings (DELETE FROM / UPDATE / MERGE INTO)
  * and write-time CHECK constraints (ALTER TABLE ADD/DROP CONSTRAINT)
  * through the GraftSql shim — the Delta DML surface over versioned
  * parquet tables. The file-granular copy-on-write machinery itself is
  * pinned by DeleteWhereSpec/MergeIntoSpec; this spec pins the SQL
  * wiring, clause semantics, and constraint enforcement. */
class SqlDmlSpec extends SparkSuite {

  private var n = 0
  private def seed(rows: Seq[(Long, String, Double)]): (String, String) = {
    val s = spark
    import s.implicits._
    n += 1
    val name = s"dml_t$n"
    val dir = graft.tables.TmpDirs.create("graft-dml")
      .resolve(name).toString
    ParquetTable.swap(spark,
      rows.toDF("id", "status", "price").repartition(3), dir)
    GraftSql.register(spark, name, dir, Seq("id"))
    (name, dir)
  }

  private val base = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0),
    (4L, "C", 40.0), (5L, "B", 50.0))

  private def state(name: String): Set[(Long, String, Double)] =
    GraftSql.sql(spark, s"SELECT * FROM $name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("DELETE FROM ... WHERE removes matches, keeps NULL-predicate rows, preserves history") {
    val s = spark
    import s.implicits._
    n += 1
    val name = s"dml_t$n"
    val dir = graft.tables.TmpDirs.create("graft-dml")
      .resolve(name).toString
    // A NULL status row: `status = 'B'` is NULL there — SQL keeps it.
    ParquetTable.swap(spark,
      Seq((1L, "A"), (2L, "B"), (3L, null)).toDF("id", "status"), dir)
    GraftSql.register(spark, name, dir, Seq("id"))
    val res = GraftSql.sql(spark, s"DELETE FROM $name WHERE status = 'B'").collect()
    assert(res.head.getLong(1) == 1L, "n_deleted")
    assert(GraftSql.sql(spark, s"SELECT id FROM $name").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // Pre-delete snapshot still readable (copy-on-write, not in-place).
    assert(GraftSql.sql(spark, s"SELECT count(*) AS c FROM $name VERSION AS OF 1")
      .head.getLong(0) == 3L)
  }

  test("DELETE FROM without WHERE empties the table but keeps it registered and versioned") {
    val (name, _) = seed(base)
    val res = GraftSql.sql(spark, s"DELETE FROM $name").collect()
    assert(res.head.getLong(1) == 5L)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS c FROM $name").head.getLong(0) == 0L)
  }

  test("UPDATE ... SET applies expressions to matches only; n_updated returned") {
    val (name, _) = seed(base)
    val res = GraftSql.sql(spark,
      s"UPDATE $name SET status = 'U', price = price + 1.5 WHERE id % 2 = 0").collect()
    assert(res.head.getLong(1) == 2L, "n_updated")
    assert(state(name) == Set(
      (1L, "A", 10.0), (2L, "U", 21.5), (3L, "A", 30.0),
      (4L, "U", 41.5), (5L, "B", 50.0)))
  }

  test("UPDATE without WHERE touches every row; assignments may reference other columns") {
    val (name, _) = seed(base.take(2))
    GraftSql.sql(spark, s"UPDATE $name SET price = price * 2, status = concat(status, '!')")
    assert(state(name) == Set((1L, "A!", 20.0), (2L, "B!", 40.0)))
  }

  test("ADD CONSTRAINT validates existing rows, gates INSERT/UPDATE, DROP lifts it") {
    val (name, _) = seed(base)
    // A check the current data violates is refused outright.
    intercept[IllegalStateException] {
      GraftSql.sql(spark, s"ALTER TABLE $name ADD CONSTRAINT pmax CHECK (price < 30.0)")
    }
    GraftSql.sql(spark, s"ALTER TABLE $name ADD CONSTRAINT pmax CHECK (price < 100.0)")
    // Surfaced in TBLPROPERTIES like Delta does.
    val props = GraftSql.sql(spark, s"SHOW TBLPROPERTIES $name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("graft.constraints.pmax") == "price < 100.0")
    // UPDATE whose post-image violates → rejected, table unchanged.
    val before = state(name)
    intercept[IllegalStateException] {
      GraftSql.sql(spark, s"UPDATE $name SET price = price + 90 WHERE id = 1")
    }
    assert(state(name) == before, "failed UPDATE must not publish")
    // INSERT violating → rejected, table unchanged.
    intercept[IllegalStateException] {
      GraftSql.sql(spark,
        s"INSERT INTO $name SELECT CAST(9 AS BIGINT) AS id, 'Z' AS status, CAST(500.0 AS DOUBLE) AS price")
    }
    assert(state(name) == before, "failed INSERT must not publish")
    // DROP CONSTRAINT lifts enforcement and removes the property row.
    GraftSql.sql(spark, s"ALTER TABLE $name DROP CONSTRAINT pmax")
    GraftSql.sql(spark, s"UPDATE $name SET price = price + 90 WHERE id = 1")
    assert(state(name).contains((1L, "A", 100.0)))
    val after = GraftSql.sql(spark, s"SHOW TBLPROPERTIES $name").collect()
      .map(_.getString(0)).toSet
    assert(!after.contains("graft.constraints.pmax"))
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, s"ALTER TABLE $name DROP CONSTRAINT nope")
    }
  }

  test("MERGE INTO upsert: UPDATE SET * + INSERT * + guarded DELETE, aliases and subquery source") {
    val (name, _) = seed(base)
    val s = spark
    import s.implicits._
    Seq(
      (2L, "M", 22.0, false),  // matched, guard false → replaced
      (4L, "D", 0.0, true),    // matched, guard true  → deleted
      (6L, "N", 60.0, false),  // unmatched, guard false → inserted
      (7L, "N", 70.0, true)    // unmatched, guard TRUE → still INSERTED (Delta: guard only applies to matched)
    ).toDF("id", "status", "price", "kill").createOrReplaceTempView("dml_src1")
    val res = GraftSql.sql(spark,
      s"""MERGE INTO $name AS t
         |USING (SELECT id, status, price, kill FROM dml_src1) AS s
         |ON t.id = s.id
         |WHEN MATCHED AND s.kill THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(res.head.getLong(1) == 3L, "n_upserted")   // ids 2, 6, 7
    assert(res.head.getLong(2) == 1L, "n_deleted")    // id 4
    assert(state(name) == Set(
      (1L, "A", 10.0), (2L, "M", 22.0), (3L, "A", 30.0), (5L, "B", 50.0),
      (6L, "N", 60.0), (7L, "N", 70.0)))
  }

  test("MERGE INTO without INSERT clause: unmatched source rows are no-ops") {
    val (name, _) = seed(base)
    val s = spark
    import s.implicits._
    Seq((3L, "M", 33.0), (9L, "X", 99.0))
      .toDF("id", "status", "price").createOrReplaceTempView("dml_src2")
    val res = GraftSql.sql(spark,
      s"""MERGE INTO $name USING dml_src2 s ON id = s.id
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin).collect()
    assert(res.head.getLong(1) == 1L, "only the matched row upserts")
    assert(state(name) == Set(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "M", 33.0),
      (4L, "C", 40.0), (5L, "B", 50.0)))
  }

  test("MERGE INTO pure-delete form: WHEN MATCHED THEN DELETE, source may carry keys only") {
    val (name, _) = seed(base)
    val s = spark
    import s.implicits._
    Seq(2L, 5L, 11L).toDF("id").createOrReplaceTempView("dml_src3")
    val res = GraftSql.sql(spark,
      s"MERGE INTO $name USING dml_src3 ON id = id WHEN MATCHED THEN DELETE").collect()
    assert(res.head.getLong(2) == 2L, "n_deleted (unmatched key 11 is a no-op)")
    assert(state(name).map(_._1) == Set(1L, 3L, 4L))
  }

  test("MERGE INTO rejects duplicate source keys under UPDATE SET *, and bad grammar loudly") {
    val (name, _) = seed(base)
    val s = spark
    import s.implicits._
    Seq((2L, "M", 1.0), (2L, "M2", 2.0), (8L, "X", 3.0))
      .toDF("id", "status", "price").createOrReplaceTempView("dml_src4")
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO $name USING dml_src4 s ON id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    // Column-list UPDATE form is rejected, not half-applied.
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"MERGE INTO $name USING dml_src4 s ON id = s.id WHEN MATCHED THEN UPDATE SET status = 'x'")
    }
    // Range ON conditions are rejected (equi-key merge only).
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"MERGE INTO $name USING dml_src4 s ON id >= s.id WHEN MATCHED THEN DELETE")
    }
    assert(state(name) == base.toSet, "no failed statement published anything")
  }

  test("MERGE INTO guard referencing the target alias is rejected (guards are source-side)") {
    val (name, _) = seed(base)
    val s = spark
    import s.implicits._
    Seq((2L, "M", 1.0)).toDF("id", "status", "price")
      .createOrReplaceTempView("dml_src5")
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        s"""MERGE INTO $name AS t USING dml_src5 AS s ON t.id = s.id
           |WHEN MATCHED AND t.price > 5 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
  }

  test("MERGE INTO validates CHECK constraints on the upsert rows before publishing") {
    val (name, _) = seed(base)
    GraftSql.sql(spark, s"ALTER TABLE $name ADD CONSTRAINT pcap CHECK (price <= 100.0)")
    val s = spark
    import s.implicits._
    Seq((2L, "M", 500.0)).toDF("id", "status", "price")
      .createOrReplaceTempView("dml_src6")
    intercept[IllegalStateException] {
      GraftSql.sql(spark,
        s"""MERGE INTO $name USING dml_src6 s ON id = s.id
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(state(name) == base.toSet)
  }

  test("DML statements accept qualified and backquoted identifiers") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-dml")
      .resolve("qual").toString
    ParquetTable.swap(spark, Seq((1L, 5.0), (2L, 6.0)).toDF("id", "v"), dir)
    GraftSql.register(spark, "lake.dmlq", dir, Seq("id"))
    GraftSql.sql(spark, "UPDATE `lake`.`dmlq` SET v = v + 1 WHERE id = 1")
    GraftSql.sql(spark, "DELETE FROM lake.dmlq WHERE id = 2")
    val rows = GraftSql.sql(spark, "SELECT * FROM lake.dmlq").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1L, 6.0)))
  }

  test("INSERT INTO a versioned table is an append COMMIT: new version, old files linked forward") {
    val (name, dir) = seed(base)
    val res = GraftSql.sql(spark,
      s"INSERT INTO $name SELECT CAST(9 AS BIGINT) AS id, 'Z' AS status, CAST(90.0 AS DOUBLE) AS price").collect()
    assert(res.head.getLong(1) == 1L, "n_inserted")
    assert(state(name) == base.toSet + ((9L, "Z", 90.0)))
    // A new version was committed; the pre-insert snapshot still reads.
    val h = GraftSql.sql(spark, s"DESCRIBE HISTORY $name").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    assert(GraftSql.sql(spark, s"SELECT count(*) AS c FROM $name VERSION AS OF 1")
      .head.getLong(0) == 5L)
    // Blind append: every v1 data file carried into v2 as a hard link
    // (same inode), only the new batch's files are new.
    import scala.jdk.CollectionConverters._
    def files(id: Long) = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, f"v$id%020d"))
      .iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val v1names = files(1L).map(_.getFileName.toString).toSet
    val carried = files(2L).filter(p => v1names(p.getFileName.toString))
    assert(carried.nonEmpty && carried.forall(p =>
      java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] > 1),
      "old files hard-linked, not copied")
  }

  test("MERGE NOT MATCHED BY SOURCE DELETE: full-sync mirror in one commit") {
    val s = spark
    import s.implicits._
    val (name, _) = seed(base)
    // Source: 2 updated, 6 new; 1/3/4/5 absent → must vanish.
    Seq((2L, "X", 99.0), (6L, "N", 60.0))
      .toDF("id", "status", "price").createOrReplaceTempView("nmbs_src1")
    val r = GraftSql.sql(spark,
      s"""MERGE INTO $name AS t USING nmbs_src1 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY TARGET THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect().head
    assert(r.getAs[Long]("n_upserted") == 2L && r.getAs[Long]("n_deleted") == 4L)
    assert(state(name) == Set((2L, "X", 99.0), (6L, "N", 60.0)),
      "post-merge target IS the source")
    // ONE commit: exactly one new version on top of the seed.
    assert(GraftSql.sql(spark, s"SELECT count(*) AS c FROM $name VERSION AS OF 1")
      .head.getLong(0) == 5L)
  }

  test("MERGE NMBS clause chain: first-match-wins order, guards see target row") {
    val s = spark
    import s.implicits._
    val (name, _) = seed(Seq(
      (1L, "A", 10.0),  // unmatched, %3≠0, price<25 → clause 2 deletes
      (3L, "A", 30.0),  // unmatched, %3=0 AND price>25 → BOTH guards... order pins UPDATE
      (5L, "B", 50.0),  // source row → replaced
      (7L, "C", 70.0))) // unmatched, matches neither guard → survives untouched
    Seq((5L, "M", 55.0)).toDF("id", "status", "price")
      .createOrReplaceTempView("nmbs_src2")
    GraftSql.sql(spark,
      s"""MERGE INTO $name AS t USING nmbs_src2 AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED BY SOURCE AND t.id % 3 = 0
         |  THEN UPDATE SET status = 'S', price = price + 0.5
         |WHEN NOT MATCHED BY SOURCE AND price < 25.0 THEN DELETE""".stripMargin)
    assert(state(name) == Set(
      (3L, "S", 30.5), (5L, "M", 55.0), (7L, "C", 70.0)))
  }

  test("MERGE with ONLY NMBS clauses: source contributes keys alone") {
    val s = spark
    import s.implicits._
    val (name, _) = seed(base)
    // Keys-only source (no status/price): legal because no clause reads it.
    Seq(1L, 2L).toDF("id").createOrReplaceTempView("nmbs_src3")
    val r = GraftSql.sql(spark,
      s"""MERGE INTO $name USING nmbs_src3 ON id = id
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'G'""".stripMargin)
      .collect().head
    assert(r.getAs[Long]("n_upserted") == 3L)
    assert(state(name) == Set(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "G", 30.0),
      (4L, "G", 40.0), (5L, "G", 50.0)))
  }

  test("MERGE NMBS rejections: source refs in guard/SET, key assignment") {
    val s = spark
    import s.implicits._
    val (name, _) = seed(base)
    Seq((1L, "Z", 1.0)).toDF("id", "status", "price")
      .createOrReplaceTempView("nmbs_src4")
    val g = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"""MERGE INTO $name AS t USING nmbs_src4 AS s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND s.price > 0 THEN DELETE""".stripMargin))
    assert(g.getMessage.contains("TARGET columns only"))
    val k = intercept[IllegalArgumentException](GraftSql.sql(spark,
      s"""MERGE INTO $name AS t USING nmbs_src4 AS s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET id = id + 100""".stripMargin))
    assert(k.getMessage.contains("merge key"))
    assert(state(name) == base.toSet, "failed statements changed nothing")
  }

  test("DML on a schema-diverged table (pending RENAME) is refused loudly") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-dml")
      .resolve("div").toString
    ParquetTable.swap(spark, Seq((1L, 5.0)).toDF("id", "amount"), dir)
    GraftSql.register(spark, "dml_div", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE dml_div RENAME COLUMN amount TO total")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "DELETE FROM dml_div WHERE total > 0")
    }
    assert(e.getMessage.contains("diverges"))
  }

  test("OPTIMIZE WHERE on a diverged table refuses; unscoped OPTIMIZE still works") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-dml")
      .resolve("divopt").toString
    ParquetTable.swap(spark,
      Seq((1L, 5.0), (2L, 7.0)).toDF("id", "amount").repartition(2), dir)
    GraftSql.register(spark, "dml_divopt", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE dml_divopt RENAME COLUMN amount TO total")
    // Scoped compaction reads through the LOGICAL schema — on a renamed
    // table its rewritten files would null-fill the physical column
    // (data loss). Must refuse, same guard as row-level DML.
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "OPTIMIZE dml_divopt WHERE id = 1")
    }
    assert(e.getMessage.contains("diverges"), e.getMessage)
    // The PHYSICAL-schema path stays available and loses nothing.
    GraftSql.sql(spark, "OPTIMIZE dml_divopt")
    val rows = GraftSql.sql(spark,
      "SELECT id, total FROM dml_divopt ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 5.0), (2L, 7.0)), rows.mkString(","))
  }
}
