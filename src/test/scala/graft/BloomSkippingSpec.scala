package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.BloomSkipping

/** Per-file bloom index: point lookups on a column the layout is NOT
  * clustered by must read fewer files with zero false negatives. */
class BloomSkippingSpec extends SparkSuite {

  test("bloom candidates prune files; every lookup stays exact") {
    val dir = graft.tables.TmpDirs.create("graft-bloom").resolve("t").toString
    // Cluster by orderkey so custkey is scattered across all files —
    // zone maps on custkey would prune NOTHING here.
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    orders.repartitionByRange(16, col("o_orderkey"))
      .write.mode("overwrite").parquet(dir)
    BloomSkipping.buildIndex(spark, dir, "o_custkey")

    val total = graft.streaming.Compaction.dataFiles(dir).size
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.mkString("|")

    // Sample of real keys + one absent key.
    val keys = orders.select("o_custkey").distinct().limit(20)
      .collect().map(_.getLong(0))
    var prunedSomething = false
    keys.foreach { k =>
      val got = BloomSkipping.scanKey(spark, dir, "o_custkey", k.toString)
      val expected = orders.filter(col("o_custkey") === k)
      assert(got.collect().map(key).sorted.toSeq ==
        expected.collect().map(key).sorted.toSeq, s"lookup $k wrong")
      val cand = BloomSkipping.candidateFiles(dir, k.toString).size
      assert(cand <= total)
      if (cand < total) prunedSomething = true
    }
    assert(prunedSomething, "bloom index never pruned a file across 20 keys")

    // Absent key: no false negative semantics — result is empty whether
    // or not the bloom spares a file read.
    val absent = orders.agg(max("o_custkey")).head.getLong(0) + 1000000
    assert(BloomSkipping.scanKey(spark, dir, "o_custkey", absent.toString).count() == 0)
  }
}
