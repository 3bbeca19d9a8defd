package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** The staged copy-on-write commit discipline: an orphaned staging dir
  * (a crashed writer's leftovers) is invisible to reads, snapshots,
  * vacuum and subsequent DML — the version slot is never poisoned. */
class CommitCowSpec extends SparkSuite {

  test("an orphaned .staging dir never poisons reads, versions, vacuum or retries") {
    val dir = graft.tables.TmpDirs.create("graft-cow").toString + "/t"
    val df = spark.sql("SELECT * FROM VALUES (1L, 10.0), (2L, 20.0), (3L, 30.0) AS t(k, v)")
    ParquetTable.swap(spark, df, dir)
    val nm = s"cow_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("k"))

    // Simulate a crashed writer: a staging dir with a committed part
    // file sitting in the table root.
    val orphan = java.nio.file.Paths.get(dir, ".staging-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    spark.sql("SELECT 99L AS k, 0.0 AS v").write.mode("overwrite")
      .parquet(orphan.toString)

    // Reads, snapshot listing and counts are unaffected.
    assert(ParquetTable.snapshots(dir).size == 1)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 3L)

    // Subsequent DML commits the NEXT clean version slot (the crash
    // scenario the unstaged writer failed: link collisions on retry).
    GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 1")
    assert(ParquetTable.snapshots(dir).size == 2)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 2L)
    assert(GraftSql.sql(spark, s"SELECT sum(k) AS sk FROM $nm").head.getLong(0) == 5L,
      "the orphan's rows must never leak into the table")

    // VACUUM ignores the staging dir and drops only superseded versions.
    val dropped = GraftSql.sql(spark, s"VACUUM $nm").collect().map(_.getString(0))
    assert(dropped.length == 1 && dropped.head.startsWith("v"))
    assert(java.nio.file.Files.exists(orphan), "vacuum must not touch foreign dirs")
  }

  test("a PUBLISHED occupant of the next version slot loses loudly, never deletes (ADVICE r12)") {
    // commitCow's occupied-slot reclaim is only safe against a crashed
    // writer's UNPUBLISHED orphan. Simulate the out-of-contract case —
    // a foreign process moved v2 in and appended its _HISTORY line but
    // has not flipped _CURRENT yet: the rewrite must abort with
    // ConcurrentWriteException and must NOT delete the published dir.
    val dir = graft.tables.TmpDirs.create("graft-cow2").toString + "/t"
    val df = spark.sql("SELECT * FROM VALUES (1L, 10.0), (2L, 20.0), (3L, 30.0) AS t(k, v)")
    ParquetTable.swap(spark, df, dir)
    val nm = s"cowp_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("k"))

    val next = graft.streaming.VersionNames.format(2L)
    spark.sql("SELECT 99L AS k, 0.0 AS v").write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(dir, next).toString)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "_HISTORY"),
      s"$next\t${System.currentTimeMillis()}\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)

    val e = intercept[ParquetTable.ConcurrentWriteException] {
      GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 1")
    }
    assert(e.getMessage.contains("NOT applied"), e.getMessage)
    // The foreign commit survives intact; the table's live read is unchanged.
    assert(spark.read.parquet(s"$dir/$next").count() == 1L,
      "the published occupant must never be deleted")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 3L)
    // No staging leak from the aborted rewrite.
    val leaks = graft.streaming.VersionNames.childNames(java.nio.file.Paths.get(dir))
      .filter(_.startsWith(".staging"))
    assert(leaks.isEmpty, s"aborted rewrite leaked staging dirs: $leaks")
  }
}
