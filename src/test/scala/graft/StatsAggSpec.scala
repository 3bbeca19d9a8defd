package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.tables.StatsSkipping

/** Metadata-only aggregate pushdown: `aggFromManifest` must equal the
  * row-level aggregates, keep working after an incremental append, and
  * — the point of the path — still answer after every data file is
  * DELETED, proving the query touches `_STATS` and nothing else. */
class StatsAggSpec extends SparkSuite {

  test("manifest aggregates equal row-level aggregates, with zero data IO") {
    val dir = graft.tables.TmpDirs.create("graft-magg").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    StatsSkipping.writeWithStats(
      spark, orders, Seq("o_orderkey", "o_custkey"), dir, numFiles = 8)

    val expected = orders.agg(
      count(lit(1)).as("n_rows"),
      min("o_orderkey").as("min_o_orderkey"), max("o_orderkey").as("max_o_orderkey"),
      min("o_custkey").as("min_o_custkey"), max("o_custkey").as("max_o_custkey")).head
    val got = StatsSkipping.aggFromManifest(spark, dir).head

    assert(got.getLong(got.fieldIndex("n_rows")) == expected.getLong(0))
    assert(got.getLong(got.fieldIndex("min_o_orderkey")) == expected.getLong(1))
    assert(got.getLong(got.fieldIndex("max_o_orderkey")) == expected.getLong(2))
    assert(got.getLong(got.fieldIndex("min_o_custkey")) == expected.getLong(3))
    assert(got.getLong(got.fieldIndex("max_o_custkey")) == expected.getLong(4))

    // Delete EVERY data file; the manifest answer must be unchanged —
    // the aggregate never opens a parquet file, footer included.
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(Files.delete)
    val afterDelete = StatsSkipping.aggFromManifest(spark, dir).head
    assert(afterDelete.toSeq == got.toSeq,
      "metadata-only aggregate changed after data-file deletion — it read data")
  }

  test("append extends the counts; empty table yields null min/max") {
    val dir = graft.tables.TmpDirs.create("graft-magg2").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val gen1 = orders.filter(col("o_orderkey") % 2 === 0)
    val gen2 = orders.filter(col("o_orderkey") % 2 === 1)
    StatsSkipping.writeWithStats(
      spark, gen1, Seq("o_orderkey", "o_custkey"), dir, numFiles = 4)
    val n1 = StatsSkipping.aggFromManifest(spark, dir).head.getLong(0)
    StatsSkipping.appendWithStats(spark, gen2, dir, numFiles = 4)
    val full = StatsSkipping.aggFromManifest(spark, dir).head
    assert(n1 == gen1.count())
    assert(full.getLong(0) == orders.count())
    assert(full.getLong(full.fieldIndex("max_o_orderkey")) ==
      orders.agg(max("o_orderkey")).head.getLong(0))

    // Degenerate manifest (header only): count 0, NULL extrema.
    val emptyDir = graft.tables.TmpDirs.create("graft-magg3").resolve("e").toString
    Files.createDirectories(Paths.get(emptyDir))
    Files.write(Paths.get(emptyDir, "_STATS"),
      Seq("#cols\to_orderkey\t#curve=z").asJava)
    val e = StatsSkipping.aggFromManifest(spark, emptyDir).head
    assert(e.getLong(0) == 0L)
    assert(e.isNullAt(e.fieldIndex("min_o_orderkey")))
    assert(e.isNullAt(e.fieldIndex("max_o_orderkey")))
  }
}
