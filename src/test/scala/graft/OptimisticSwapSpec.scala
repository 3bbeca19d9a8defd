package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable

/** Optimistic concurrency: a writer whose read snapshot was superseded
  * must fail validation, leave no garbage version, and succeed on
  * retry against the fresh version. */
class OptimisticSwapSpec extends SparkSuite {

  test("stale writer rejected, table unscathed, retry succeeds; racers serialize") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-occ").resolve("t").toString
    ParquetTable.swap(spark, (1 to 10).toDF("v"), dir)

    // Writer A reads v1; writer B commits first; A must be rejected.
    val vA = ParquetTable.currentVersion(dir)
    ParquetTable.swap(spark, (1 to 20).toDF("v"), dir) // B wins
    intercept[ParquetTable.ConcurrentWriteException] {
      ParquetTable.swapIfCurrent(spark, (1 to 30).toDF("v"), dir, vA)
    }
    assert(ParquetTable.read(spark, dir).count() == 20, "loser must not publish")
    assert(ParquetTable.snapshots(dir).size == 2, "loser must leave no version dir")

    // Retry after re-reading succeeds.
    ParquetTable.swapIfCurrent(spark, (1 to 30).toDF("v"), dir,
      ParquetTable.currentVersion(dir))
    assert(ParquetTable.read(spark, dir).count() == 30)

    // True race: N writers off one expectation — exactly one commits.
    val base = ParquetTable.currentVersion(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(
      Future.sequence((1 to 4).map { i =>
        Future {
          try { ParquetTable.swapIfCurrent(spark, (1 to 100 + i).toDF("v"), dir, base); 1 }
          catch { case _: ParquetTable.ConcurrentWriteException => 0 }
        }
      }), 5.minutes).toList
    assert(results.sum == 1, s"exactly one racer must win: $results")
    val n = ParquetTable.read(spark, dir).count()
    assert(n >= 101 && n <= 104, s"winner's data must be live, got $n rows")
  }
}
