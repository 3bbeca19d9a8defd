package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

import graft.streaming.ParquetTable

/** Copy-on-write DELETE WHERE: row semantics (incl. NULL-predicate rows
  * kept), file-level pruning (untouched files hard-linked forward, never
  * rewritten), time travel to the pre-delete snapshot, and the no-match
  * fast path. */
class DeleteWhereSpec extends SparkSuite {

  private def dataFiles(version: Path): Set[String] =
    Files.list(version).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet

  private def freshTable(): String = {
    val t = graft.tables.TmpDirs.create("graft-delspec").resolve("orders").toString
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
      .repartitionByRange(8, col("o_orderkey"))
    ParquetTable.swap(spark, orders, t)
    t
  }

  test("delete removes exactly the matching rows; pre-delete snapshot intact") {
    val t = freshTable()
    val before = ParquetTable.read(spark, t).count()
    val expect = ParquetTable.read(spark, t).filter("o_orderkey < 1000").count()
    assert(expect > 0)
    val deleted = ParquetTable.deleteWhere(spark, t, "o_orderkey < 1000")
    assert(deleted == expect)
    val cur = ParquetTable.read(spark, t)
    assert(cur.count() == before - deleted)
    assert(cur.filter("o_orderkey < 1000").count() == 0)
    assert(ParquetTable.readSnapshot(spark, t, 1).count() == before)
  }

  test("file-level COW: untouched files carried forward as hard links") {
    val t = freshTable()
    val v1 = Paths.get(ParquetTable.currentPath(t))
    val v1Files = dataFiles(v1)
    assert(v1Files.size == 8, s"expected 8 range-clustered files, got ${v1Files.size}")
    ParquetTable.deleteWhere(spark, t, "o_orderkey < 1000")
    val v2 = Paths.get(ParquetTable.currentPath(t))
    val carried = dataFiles(v2).intersect(v1Files)
    // The range layout confines keys < 1000 to the lowest file(s): most
    // of the 8 files must carry forward under their original names...
    assert(carried.size >= 6, s"only ${carried.size} of 8 files carried forward")
    assert(carried.size < 8, "at least one file must have been rewritten")
    // ...and as hard links to the v1 bytes, not copies.
    carried.foreach { f =>
      assert(Files.isSameFile(v1.resolve(f), v2.resolve(f)),
        s"$f was copied, not linked")
    }
  }

  test("rows with a NULL predicate are KEPT (SQL DELETE semantics)") {
    val t = graft.tables.TmpDirs.create("graft-delspec").resolve("nulls").toString
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("F")), (2L, None), (3L, Some("O")), (4L, None), (5L, Some("F")))
      .toDF("id", "flag")
    ParquetTable.swap(spark, df, t)
    val deleted = ParquetTable.deleteWhere(spark, t, "flag = 'F'")
    assert(deleted == 2)
    val left = ParquetTable.read(spark, t).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(2L, 3L, 4L), s"NULL-flag rows must survive: $left")
  }

  test("no-match delete is a no-op: returns 0, publishes no version") {
    val t = freshTable()
    val versionsBefore = ParquetTable.snapshots(t)
    assert(ParquetTable.deleteWhere(spark, t, "o_orderkey < 0") == 0L)
    assert(ParquetTable.snapshots(t) == versionsBefore)
  }

  test("update rewrites matching rows in place, links the rest, types preserved") {
    val t = freshTable()
    val before = ParquetTable.read(spark, t).count()
    val expect = ParquetTable.read(spark, t).filter("o_orderkey < 1000").count()
    val v1 = Paths.get(ParquetTable.currentPath(t))
    val updated = ParquetTable.updateWhere(spark, t, "o_orderkey < 1000",
      Map("o_orderstatus" -> "'X'"))
    assert(updated == expect && expect > 0)
    val cur = ParquetTable.read(spark, t)
    assert(cur.count() == before, "UPDATE must not change the row count")
    assert(cur.filter("o_orderkey < 1000 AND o_orderstatus <> 'X'").count() == 0)
    assert(cur.filter("o_orderkey >= 1000 AND o_orderstatus = 'X'").count() == 0)
    assert(cur.schema == ParquetTable.readSnapshot(spark, t, 1).schema)
    val v2 = Paths.get(ParquetTable.currentPath(t))
    val carried = dataFiles(v2).intersect(dataFiles(v1))
    assert(carried.size >= 6 && carried.size < 8)
    carried.foreach(f => assert(Files.isSameFile(v1.resolve(f), v2.resolve(f))))
  }

  test("change feed: update images carry old and new values, keyed to the predicate") {
    val t = freshTable()
    ParquetTable.updateWhere(spark, t, "o_orderkey < 1000",
      Map("o_orderstatus" -> "'X'"))
    val feed = ParquetTable.changeFeed(spark, t, 1, 0, Seq("o_orderkey"))
    val byType = feed.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.keySet == Set("update_preimage", "update_postimage"))
    assert(byType("update_preimage") == byType("update_postimage"))
    assert(feed.filter("_change_type = 'update_preimage' AND o_orderstatus = 'X'").count() == 0)
    assert(feed.filter("_change_type = 'update_postimage' AND o_orderstatus <> 'X'").count() == 0)
    assert(feed.filter("o_orderkey >= 1000").count() == 0,
      "unchanged keys must emit no change rows")
  }

  test("vacuum after delete drops the pre-delete snapshot, current unharmed") {
    val t = freshTable()
    val before = ParquetTable.read(spark, t).count()
    val deleted = ParquetTable.deleteWhere(spark, t, "o_orderkey < 1000")
    ParquetTable.vacuum(t)
    assert(ParquetTable.snapshots(t).size == 1)
    assert(ParquetTable.read(spark, t).count() == before - deleted)
  }
}
