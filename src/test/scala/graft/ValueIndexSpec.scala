package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.ValueIndex

/** Exact file-posting secondary index: point/range lookups on an
  * UNCLUSTERED column open only truly-matching files (zero false
  * positives), a stale stamp falls back to the full scan (correct,
  * never stale), and DV snapshots are refused. */
class ValueIndexSpec extends SparkSuite {

  /** Versioned table clustered by id; `track` is a permuted key —
    * high-cardinality and UNclustered, so stats skipping on the file
    * layout could never prune it, while each track value lives in
    * exactly one file (the secondary-index sweet spot). */
  private def seed(): String = {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-vidx-t")
      .resolve("t").toString
    val df = (0L until 4000L).map(i => (i, (i * 48271L) % 100003L, i % 7L))
      .toDF("id", "track", "grp")
      .repartitionByRange(16, col("id"))
      .sortWithinPartitions("id")
    ParquetTable.swap(spark, df, dir)
    dir
  }

  test("fresh index prunes to the posted files; results match the full scan") {
    val dir = seed()
    val n = ValueIndex.build(spark, dir, "track")
    assert(n == 4000L, "unique track values: one posting per row")
    assert(ValueIndex.fresh(dir, "track"))
    val total = ValueIndex.snapshotFileCount(dir)
    assert(total == 16)
    // A 5-value range: ≤5 candidate files out of 16.
    val lo = 48271L * 10 % 100003L // = track of id 10
    val cand = ValueIndex.candidateFileCount(spark, dir, "track", lo, lo + 4)
    assert(cand >= 1 && cand <= 5, s"candidates $cand")
    val viaIdx = ValueIndex.scanRange(spark, dir, "track", lo, lo + 4)
      .select("id", "track", "grp").collect().map(_.toString).toSet
    val full = ParquetTable.read(spark, dir)
      .filter(col("track") >= lo && col("track") <= lo + 4)
      .select("id", "track", "grp").collect().map(_.toString).toSet
    assert(viaIdx == full && viaIdx.nonEmpty)
    // Point lookup: exactly one file opened for a unique value.
    assert(ValueIndex.candidateFileCount(spark, dir, "track", lo, lo) == 1)
    assert(ValueIndex.scanKey(spark, dir, "track", lo)
      .collect().map(_.getLong(0)).toSeq == Seq(10L))
    // Empty range: zero files, empty typed result.
    val none = ValueIndex.scanRange(spark, dir, "track", 100004L, 100010L)
    assert(none.count() == 0L && none.columns.toSeq == Seq("id", "track", "grp"))
  }

  test("a table commit makes the index stale: lookups fall back to the full scan") {
    val s = spark
    import s.implicits._
    val dir = seed()
    ValueIndex.build(spark, dir, "track")
    // Append a row whose track value the stale index cannot know.
    ParquetTable.append(spark,
      Seq((9999L, 999999L, 0L)).toDF("id", "track", "grp"), dir)
    assert(!ValueIndex.fresh(dir, "track"), "stamp no longer names the live version")
    val rows = ValueIndex.scanRange(spark, dir, "track", 999999L, 999999L)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(9999L),
      "stale index must not hide the new row — full-scan fallback")
    // Rebuild restores the fast path and sees the new row.
    ValueIndex.build(spark, dir, "track")
    assert(ValueIndex.fresh(dir, "track"))
    assert(ValueIndex.candidateFileCount(spark, dir, "track", 999999L, 999999L) == 1)
    assert(ValueIndex.scanKey(spark, dir, "track", 999999L)
      .collect().map(_.getLong(0)).toSeq == Seq(9999L))
  }

  test("incremental refresh after append indexes only the delta; rewrites full-rebuild") {
    val s = spark
    import s.implicits._
    val dir = seed()
    ValueIndex.build(spark, dir, "track")
    ParquetTable.append(spark,
      (4000L until 4100L).map(i => (i, (i * 48271L) % 100003L, i % 7L))
        .toDF("id", "track", "grp"), dir)
    assert(!ValueIndex.fresh(dir, "track"))
    assert(ValueIndex.refreshIncremental(spark, dir, "track"),
      "append-only delta takes the fast path")
    assert(ValueIndex.fresh(dir, "track"))
    // Postings equal a from-scratch rebuild's (set equality), and the
    // new rows are findable through the pruned path.
    val incr = spark.read.parquet(
      java.nio.file.Paths.get(dir, "_VIDX_track").toString)
      .collect().map(_.toString).toSet
    val t4050 = (4050L * 48271L) % 100003L
    assert(ValueIndex.candidateFileCount(spark, dir, "track", t4050, t4050) >= 1)
    assert(ValueIndex.scanKey(spark, dir, "track", t4050)
      .collect().map(_.getLong(0)).toSeq == Seq(4050L))
    ValueIndex.build(spark, dir, "track")
    val full = spark.read.parquet(
      java.nio.file.Paths.get(dir, "_VIDX_track").toString)
      .collect().map(_.toString).toSet
    assert(incr == full, "incremental postings == rebuild postings")
    // Already fresh: a second call is a no-op fast path.
    assert(ValueIndex.refreshIncremental(spark, dir, "track"))
    // A copy-on-write DELETE rewrites files → full rebuild, and the
    // deleted row is gone from the postings.
    ParquetTable.deleteWhere(spark, dir, "id = 4050")
    assert(!ValueIndex.refreshIncremental(spark, dir, "track"),
      "non-append delta falls back to rebuild")
    assert(ValueIndex.fresh(dir, "track"))
    assert(ValueIndex.scanKey(spark, dir, "track", t4050).count() == 0L)
  }

  test("deletion-vector snapshots are refused at build and at indexed scan") {
    val dir = seed()
    ValueIndex.build(spark, dir, "track")
    ParquetTable.deleteWhereDV(spark, dir, "id = 10")
    val b = intercept[IllegalArgumentException](ValueIndex.build(spark, dir, "track"))
    assert(b.getMessage.contains("deletion vectors"))
    // The DV commit moved the version, so the index is stale — but the
    // refusal must guard the FALLBACK path too: a plain-read fallback
    // here would silently resurrect the deleted id=10.
    val e = intercept[IllegalArgumentException](
      ValueIndex.scanRange(spark, dir, "track", 0L, 100003L))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage.take(200))
  }
}
