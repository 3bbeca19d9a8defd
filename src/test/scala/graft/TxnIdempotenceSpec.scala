package graft

import graft.streaming.ParquetTable

/** Idempotent writer transactions (the Delta `txn`-action shape): a
  * replayed commit with an already-stamped (appId, version) must be a
  * no-op, stamps are per-app, and a foreachBatch-style replay sequence
  * lands each batch exactly once. */
class TxnIdempotenceSpec extends SparkSuite {

  test("replayed (appId, version) is a no-op; apps are independent") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-txn").resolve("t").toString

    assert(ParquetTable.swapWithTxn(spark, (1 to 10).toDF("v"), dir, "sink", 1L))
    assert(ParquetTable.lastTxnVersion(dir, "sink").contains(1L))

    // Replay of version 1 — even with DIFFERENT data — must not publish:
    // the stamp, not the content, decides (that's what makes a
    // checkpoint-replayed batch safe even if nondeterministic).
    assert(!ParquetTable.swapWithTxn(spark, (1 to 99).toDF("v"), dir, "sink", 1L))
    assert(ParquetTable.read(spark, dir).count() == 10)
    assert(ParquetTable.snapshots(dir).size == 1, "no-op must leave no version")

    assert(ParquetTable.swapWithTxn(spark, (1 to 20).toDF("v"), dir, "sink", 2L))
    assert(ParquetTable.read(spark, dir).count() == 20)
    assert(ParquetTable.lastTxnVersion(dir, "sink").contains(2L))

    // A different appId has its own sequence.
    assert(ParquetTable.lastTxnVersion(dir, "other").isEmpty)
    assert(ParquetTable.swapWithTxn(spark, (1 to 30).toDF("v"), dir, "other", 1L))
    assert(ParquetTable.lastTxnVersion(dir, "sink").contains(2L),
      "another app's commit must not advance this app's stamp")
  }

  test("foreachBatch-style replay sequence commits each batch once") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-txn2").resolve("t").toString
    // Simulated restart replays batch 1: ids 0, 1, 1, 2.
    val applied = Seq(0L, 1L, 1L, 2L).map { id =>
      ParquetTable.swapWithTxn(
        spark, Seq((id, s"batch-$id")).toDF("id", "payload"), dir, "stream", id)
    }
    assert(applied == Seq(true, true, false, true))
    assert(ParquetTable.snapshots(dir).size == 3)
    assert(ParquetTable.read(spark, dir).count() == 1, "each swap is a snapshot")
  }

  test("an UNPUBLISHED orphan's _TXN stamp never no-ops the replay (r13 review)") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-txn3").resolve("t").toString
    assert(ParquetTable.swapWithTxn(spark, (1 to 5).toDF("v"), dir, "sink", 1L))

    // Simulate a writer that crashed BETWEEN its version-dir move and its
    // publish: a complete-looking v2 with the batch-2 stamp, never
    // acknowledged by _CURRENT/_HISTORY. Trusting that stamp would make
    // the replayed batch a silent no-op against data no reader can see —
    // exactly-once broken the LOSSY way.
    val orphan = java.nio.file.Paths.get(dir, graft.streaming.VersionNames.format(2L))
    (1 to 7).toDF("v").write.parquet(orphan.toString)
    java.nio.file.Files.writeString(orphan.resolve("_TXN"), "sink\t2\n")

    assert(ParquetTable.lastTxnVersion(dir, "sink").contains(1L),
      "the orphan's stamp is unpublished and must be invisible")
    assert(ParquetTable.swapWithTxn(spark, (1 to 7).toDF("v"), dir, "sink", 2L),
      "the replayed batch must COMMIT, not no-op against the orphan")
    assert(ParquetTable.read(spark, dir).count() == 7)
    assert(ParquetTable.lastTxnVersion(dir, "sink").contains(2L))
  }
}
