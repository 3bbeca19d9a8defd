package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{MergeStream, ParquetTable}

object MergeStreamSpec {
  final case class Change(id: Long, value: String, _deleted: Boolean)
}

/** Streaming apply-changes through the generic MERGE INTO: bootstrap on
  * the first batch, per-batch upsert/delete/insert after, one table
  * version per non-empty batch. */
class MergeStreamSpec extends SparkSuite {

  import MergeStreamSpec.Change

  test("streamed change batches materialize the expected table state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = graft.tables.TmpDirs.create("graft-ms").resolve("t").toString
    val cp = graft.tables.TmpDirs.create("graft-ms-cp").toString

    val src = MemoryStream[Change]
    val q = MergeStream.start(spark, src.toDF(), dir, Seq("id"), cp)

    // Batch 1 bootstraps (a _deleted row in the bootstrap is dropped).
    src.addData((1L to 100L).map(i => Change(i, s"v$i", _deleted = false))
      :+ Change(999L, "ghost", _deleted = true): _*)
    q.processAllAvailable()
    assert(ParquetTable.read(spark, dir).count() == 100)
    assert(ParquetTable.snapshots(dir).size == 1)

    // Batch 2: update 1-10, delete 91-100, insert 101-110.
    src.addData(
      (1L to 10L).map(i => Change(i, s"u$i", _deleted = false)) ++
        (91L to 100L).map(i => Change(i, "x", _deleted = true)) ++
        (101L to 110L).map(i => Change(i, s"v$i", _deleted = false)): _*)
    q.processAllAvailable()
    q.stop()

    val got = ParquetTable.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected =
      ((11L to 90L) ++ (101L to 110L)).map(i => i -> s"v$i").toMap ++
        (1L to 10L).map(i => i -> s"u$i").toMap
    assert(got == expected)
    assert(ParquetTable.snapshots(dir).size == 2, "one version per non-empty batch")

    // Replaying a batch (the foreachBatch retry story) is
    // state-idempotent: an extra version publishes, content unchanged.
    val batch2 = ((1L to 10L).map(i => Change(i, s"u$i", _deleted = false)) ++
      (91L to 100L).map(i => Change(i, "x", _deleted = true)) ++
      (101L to 110L).map(i => Change(i, s"v$i", _deleted = false))).toDF()
    MergeStream.applyBatch(spark, batch2, dir, Seq("id"))
    val replayed = ParquetTable.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replayed == expected, "batch replay must not change table state")
  }

  test("snapshot-mirror mode: each trigger makes the table EQUAL the snapshot, one commit") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-mirror").toString
    val dir = s"$root/t"
    def snap(rows: Seq[(Long, String)]) = rows.toDF("id", "payload")
    def state() = ParquetTable.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Drive through a REAL stream: wave 1 bootstraps, wave 2 mirrors
    // (3 updated, 2 gone, 2 new) — the table must equal each snapshot
    // after its trigger.
    val in = s"$root/in"
    snap((1L to 5L).map(i => (i, s"a$i"))).coalesce(1).write.parquet(in)
    val q = spark.readStream.schema(snap(Seq((1L, "x"))).schema).parquet(in)
      .writeStream.option("checkpointLocation", s"$root/cp")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        MergeStream.mirrorBatch(spark, b, dir, Seq("id"))
      }.start()
    q.processAllAvailable()
    assert(state() == (1L to 5L).map(i => i -> s"a$i").toMap)
    val wave2 = (1L to 3L).map(i => (i, s"b$i")) ++ Seq((6L, "b6"), (7L, "b7"))
    snap(wave2).coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable(); q.stop()
    assert(state() == wave2.toMap, "gone keys 4,5 deleted, updates + inserts applied")
    // ONE commit per snapshot trigger: bootstrap + 1 mirror = 2 versions.
    assert(ParquetTable.publishedVersions(dir).size == 2)
    // Content-idempotent replay: re-mirroring the same snapshot deletes
    // nothing and restates the same rows.
    MergeStream.mirrorBatch(spark, snap(wave2), dir, Seq("id"))
    assert(state() == wave2.toMap)
  }
}
