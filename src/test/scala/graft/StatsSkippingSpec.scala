package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.tables.StatsSkipping

/** Zone-map file skipping: a range scan over the `_STATS`-manifested
  * table must read strictly fewer files than the table holds, return
  * exactly the plain filter's rows, and read nothing when the range
  * misses every file. */
class StatsSkippingSpec extends SparkSuite {

  test("range scan prunes files by manifest and preserves content") {
    val dir = graft.tables.TmpDirs.create("graft-skip").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    StatsSkipping.writeWithStats(spark, orders, "o_orderkey", dir, numFiles = 8)

    val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
    val (lo, hi) = (maxKey / 4, maxKey / 2)

    val pruned = StatsSkipping.scanRange(spark, dir, "o_orderkey", lo, hi)
    val expected = orders.filter(col("o_orderkey").between(lo, hi))
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")
    assert(pruned.collect().map(key).sorted.toSeq ==
      expected.collect().map(key).sorted.toSeq)

    // Manifest pruning really cut the file list (ranges are disjoint by
    // construction, so a quarter-to-half window cannot need all 8).
    val total = graft.streaming.Compaction.dataFiles(dir).size
    val read = pruned.inputFiles.length
    assert(read < total, s"read $read of $total files — no skipping")
    assert(read == StatsSkipping.liveFiles(dir, lo, hi).size)

    // A range beyond every max reads zero rows (and zero data files).
    val empty = StatsSkipping.scanRange(spark, dir, "o_orderkey", maxKey + 10, maxKey + 20)
    assert(empty.count() == 0)
    assert(StatsSkipping.liveFiles(dir, maxKey + 10, maxKey + 20).isEmpty)
  }

  test("incremental append extends the manifest; skipping spans both generations") {
    val dir = graft.tables.TmpDirs.create("graft-skipa").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val gen1 = orders.filter(col("o_orderkey") % 2 === 0)
    val gen2 = orders.filter(col("o_orderkey") % 2 === 1)
    StatsSkipping.writeWithStats(spark, gen1, "o_orderkey", dir, numFiles = 4)
    val filesBefore = graft.streaming.Compaction.dataFiles(dir).size
    StatsSkipping.appendWithStats(spark, gen2, dir, numFiles = 4)
    val total = graft.streaming.Compaction.dataFiles(dir).size
    assert(total > filesBefore, "append must land new files")

    val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
    val (lo, hi) = (maxKey / 4, maxKey / 2)
    val pruned = StatsSkipping.scanRange(spark, dir, "o_orderkey", lo, hi)
    val expected = orders.filter(col("o_orderkey").between(lo, hi))
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")
    assert(pruned.collect().map(key).sorted.toSeq ==
      expected.collect().map(key).sorted.toSeq,
      "scan must see both generations' rows")
    assert(pruned.inputFiles.length < total, "append must not break pruning")
  }

  test("multi-dim zone maps over a z-ordered layout prune in EVERY dimension") {
    val dir = graft.tables.TmpDirs.create("graft-skipz").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    StatsSkipping.writeWithStats(
      spark, orders, Seq("o_orderkey", "o_custkey"), dir, numFiles = 16)

    val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
    val maxCust = orders.agg(max("o_custkey")).head.getLong(0)
    val total = graft.streaming.Compaction.dataFiles(dir).size
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")

    // A box selective in BOTH dims, and each single-dim range alone,
    // must all prune files — the single-sort layout can only do the
    // first dimension; z-order gives all of them locality.
    val cases = Seq(
      Seq(("o_orderkey", maxKey / 4, maxKey / 2), ("o_custkey", maxCust / 4, maxCust / 2)),
      Seq(("o_orderkey", maxKey / 4, maxKey / 2)),
      Seq(("o_custkey", maxCust / 4, maxCust / 2)))
    cases.foreach { ranges =>
      val pruned = StatsSkipping.scanBox(spark, dir, ranges)
      val expected = orders.filter(
        ranges.map { case (c, lo, hi) => col(c).between(lo, hi) }.reduceLeft(_ && _))
      assert(pruned.collect().map(key).sorted.toSeq ==
        expected.collect().map(key).sorted.toSeq, s"content mismatch for $ranges")
      val read = pruned.inputFiles.length
      assert(read < total, s"$ranges read all $total files — no skipping")
    }
  }

  test("append replays the recorded curve — a hilbert table stays hilbert") {
    val dir = graft.tables.TmpDirs.create("graft-skiph").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val gen1 = orders.filter(col("o_orderkey") % 2 === 0)
    val gen2 = orders.filter(col("o_orderkey") % 2 === 1)
    StatsSkipping.writeWithStats(spark, gen1, Seq("o_orderkey", "o_custkey"), dir,
      numFiles = 4, curve = "hilbert")
    val header = Files.readAllLines(java.nio.file.Paths.get(dir, "_STATS")).get(0)
    assert(header.contains("#curve=hilbert"), s"curve not recorded: $header")
    val gen1Files = Files.readAllLines(java.nio.file.Paths.get(dir, "_STATS")).asScala
      .toSeq.tail.map(_.split('\t').head).toSet

    StatsSkipping.appendWithStats(spark, gen2, dir, numFiles = 4)
    val header2 = Files.readAllLines(java.nio.file.Paths.get(dir, "_STATS")).get(0)
    assert(header2.contains("#curve=hilbert"), s"append lost the curve: $header2")

    // The appended generation must be clustered with the SAME curve: its
    // per-file boxes must match a fresh hilbert clustering of gen2, not a
    // morton one (the curves produce different file→box assignments).
    val hdir = graft.tables.TmpDirs.create("graft-skiph2").resolve("t").toString
    StatsSkipping.writeWithStats(spark, gen2, Seq("o_orderkey", "o_custkey"), hdir,
      numFiles = 4, curve = "hilbert")
    // boxes of the appended files == boxes of a standalone hilbert write
    val freshBoxes =
      Files.readAllLines(java.nio.file.Paths.get(hdir, "_STATS")).asScala.toSeq.tail
        .map(_.split('\t').drop(2).mkString(",")).toSet
    val appended = Files.readAllLines(java.nio.file.Paths.get(dir, "_STATS")).asScala
      .toSeq.tail.filterNot(l => gen1Files.contains(l.split('\t').head))
    assert(appended.nonEmpty)
    assert(appended.map(_.split('\t').drop(2).mkString(",")).toSet == freshBoxes,
      "appended files were not clustered with the recorded hilbert curve")
  }
}
