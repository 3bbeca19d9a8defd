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
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").resolve("t").toString

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
}
