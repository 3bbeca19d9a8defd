package graft

import java.nio.file.Files

import graft.streaming.ParquetTable

/** Snapshot time travel on the atomic parquet table (the engine's
  * storage-level answer to Delta's VERSION AS OF; SURVEY §2.3 Q15). */
class TimeTravelSpec extends SparkSuite {

  test("snapshots accumulate, read back by version, vacuum keeps the newest") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tt").toString

    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(1, 2, 3, 4).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(9).toDF("x"), dir)

    assert(ParquetTable.snapshots(dir).size == 3)
    assert(ParquetTable.read(spark, dir).count() == 1)
    assert(ParquetTable.readSnapshot(spark, dir, 0).count() == 1)
    assert(ParquetTable.readSnapshot(spark, dir, 1).count() == 4)
    assert(ParquetTable.readSnapshot(spark, dir, 2).count() == 3)

    ParquetTable.vacuum(dir, keep = 1)
    assert(ParquetTable.snapshots(dir).size == 1)
    assert(ParquetTable.read(spark, dir).count() == 1, "current survives vacuum")
  }
}
