package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.Constraints

/** Write-time CHECK constraints: violating batches never publish, NULL
  * passes (SQL three-valued CHECK), ADD CONSTRAINT validates existing
  * rows. */
class ConstraintsSpec extends SparkSuite {

  test("checkedSwap blocks violations, keeps the live snapshot; NULL passes") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-ck").resolve("t").toString

    Constraints.addCheck(spark, dir, "price_nonneg", "price >= 0.0")
    Constraints.addCheck(spark, dir, "status_known", "status IN ('A', 'B')")
    intercept[IllegalArgumentException] {
      Constraints.addCheck(spark, dir, "price_nonneg", "price >= 1.0")
    }

    val good = Seq((1L, 10.0, "A"), (2L, 0.0, "B")).toDF("id", "price", "status")
    Constraints.checkedSwap(spark, good, dir)
    assert(ParquetTable.read(spark, dir).count() == 2)

    // Violating batch: rejected, table still serves the previous version.
    val bad = Seq((3L, -5.0, "A"), (4L, 1.0, "C")).toDF("id", "price", "status")
    val ex = intercept[IllegalArgumentException] {
      Constraints.checkedSwap(spark, bad, dir)
    }
    assert(ex.getMessage.contains("price_nonneg") && ex.getMessage.contains("status_known"))
    assert(ParquetTable.read(spark, dir).count() == 2, "bad batch must not publish")
    assert(ParquetTable.snapshots(dir).size == 1)

    // NULL predicate result is not a violation (unknown passes).
    val withNulls = Seq((5L, Option.empty[Double], "A"), (6L, Some(2.0), "B"))
      .toDF("id", "price", "status")
    Constraints.checkedSwap(spark, withNulls, dir)
    assert(ParquetTable.read(spark, dir).count() == 2)

    // ADD CONSTRAINT validates the live snapshot.
    intercept[IllegalStateException] {
      Constraints.addCheck(spark, dir, "big_ids", "id >= 100")
    }
    assert(Constraints.checks(dir).map(_._1) == Seq("price_nonneg", "status_known"))

    // An EMPTY batch violates nothing and must publish (sum() over zero
    // rows is NULL — regression: NPE instead of a clean swap).
    val empty = Seq.empty[(Long, Double, String)].toDF("id", "price", "status")
    Constraints.checkedSwap(spark, empty, dir)
    assert(ParquetTable.read(spark, dir).count() == 0)
  }

  test("UNIQUE + SET NOT NULL statement surface: ADD-time, append, and overwrite enforcement") {
    val s = spark
    import s.implicits._
    import graft.tables.GraftSql
    val dir = graft.tables.TmpDirs.create("graft-uq").resolve("t").toString
    ParquetTable.swap(spark, Seq((1L, "A"), (2L, "B")).toDF("id", "status"), dir)
    GraftSql.register(spark, "uq_t", dir, Seq("id"))

    GraftSql.sql(spark, "ALTER TABLE uq_t ADD CONSTRAINT pk_id UNIQUE (id)")
    def ins(rows: Seq[(Long, String)]): Unit = {
      rows.toDF("id", "status").createOrReplaceTempView("uq_src")
      GraftSql.sql(spark, "INSERT INTO uq_t SELECT id, status FROM uq_src"); ()
    }
    // Batch-internal duplicate and batch∩existing clash both reject;
    // the table keeps its pre-INSERT state.
    assert(intercept[IllegalStateException](ins(Seq((3L, "C"), (3L, "D"))))
      .getMessage.contains("inside the batch"))
    assert(intercept[IllegalStateException](ins(Seq((2L, "X"))))
      .getMessage.contains("already exist"))
    assert(ParquetTable.read(spark, dir).count() == 2)
    ins(Seq((3L, "C"))) // disjoint key lands
    assert(ParquetTable.read(spark, dir).count() == 3)
    // OVERWRITE validates the batch as the full post-image.
    Seq((7L, "Z"), (7L, "Y")).toDF("id", "status").createOrReplaceTempView("uq_src")
    intercept[IllegalStateException](GraftSql.sql(spark,
      "INSERT OVERWRITE uq_t SELECT id, status FROM uq_src"))
    // ADD on already-duplicated data is rejected at birth.
    ins(Seq((4L, "C"))) // status C now twice
    assert(intercept[IllegalStateException](GraftSql.sql(spark,
      "ALTER TABLE uq_t ADD CONSTRAINT st_unique UNIQUE (status)"))
      .getMessage.contains("existing rows violate"))
    // SET NOT NULL is the CHECK spelling — a NULL status now rejects.
    GraftSql.sql(spark, "ALTER TABLE uq_t ALTER COLUMN status SET NOT NULL")
    Seq((9L, null.asInstanceOf[String])).toDF("id", "status")
      .createOrReplaceTempView("uq_src")
    assert(intercept[IllegalStateException](GraftSql.sql(spark,
      "INSERT INTO uq_t SELECT id, status FROM uq_src"))
      .getMessage.contains("nn_status"))
    // DROP CONSTRAINT reaches both kinds; enforcement ends with it.
    GraftSql.sql(spark, "ALTER TABLE uq_t DROP CONSTRAINT pk_id")
    GraftSql.sql(spark, "ALTER TABLE uq_t DROP CONSTRAINT nn_status")
    ins(Seq((2L, "dup ok now")))
    assert(ParquetTable.read(spark, dir).count() == 5)
    GraftSql.sql(spark, "DROP TABLE uq_t")
    ()
  }

  test("UNIQUE treats NULL keys as ANSI: never conflicting, in-batch and across inserts") {
    val s = spark
    import s.implicits._
    import graft.tables.GraftSql
    val dir = graft.tables.TmpDirs.create("graft-uqn").resolve("t").toString
    ParquetTable.swap(spark,
      Seq((Some(1L), "A")).toDF("id", "status"), dir)
    GraftSql.register(spark, "uqn_t", dir, Seq("id"))
    GraftSql.sql(spark, "ALTER TABLE uqn_t ADD CONSTRAINT pk_id UNIQUE (id)")
    def ins(rows: Seq[(Option[Long], String)]): Unit = {
      rows.toDF("id", "status").createOrReplaceTempView("uqn_src")
      GraftSql.sql(spark, "INSERT INTO uqn_t SELECT id, status FROM uqn_src"); ()
    }
    // Two NULL keys in ONE batch: allowed (ANSI — NULL equals nothing,
    // not even another NULL). Pre-r11 the in-batch pass rejected this
    // while the cross-batch pass allowed it; now both allow.
    ins(Seq((None, "n1"), (None, "n2")))
    // A NULL key arriving while NULL keys already exist: also allowed.
    ins(Seq((None, "n3")))
    assert(ParquetTable.read(spark, dir).count() == 4)
    // Non-NULL duplicates still reject in both passes.
    assert(intercept[IllegalStateException](ins(Seq((Some(2L), "x"), (Some(2L), "y"))))
      .getMessage.contains("inside the batch"))
    assert(intercept[IllegalStateException](ins(Seq((Some(1L), "x"))))
      .getMessage.contains("already exist"))
    GraftSql.sql(spark, "DROP TABLE uqn_t")
    ()
  }
}
