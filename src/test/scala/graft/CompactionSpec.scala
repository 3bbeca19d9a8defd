package graft

import java.nio.file.Files

import graft.streaming.Compaction

/** Compaction must shrink the file count to the bin-packed target while
  * leaving the table content identical (SURVEY §2.3 Q16 maintenance;
  * reference: db/table_maintenance.sql:121-125 file-health target). */
class CompactionSpec extends SparkSuite {

  test("compaction bin-packs small files, content identical, idempotent") {
    val dir = Files.createTempDirectory("graft-compact").resolve("order_stream").toString
    val src = CdcPipeline.orderStreamCached(spark, sf0001)
    // Fragment like a long-running micro-batch stream would.
    src.repartition(48).write.parquet(dir)
    assert(Compaction.dataFiles(dir).size == 48)

    def fingerprint() =
      spark.read.parquet(dir)
        .selectExpr("xid", "csn", "orderId", "size(orders)", "size(orderDetails)", "size(lineItems)")
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val before = fingerprint()

    val stats = Compaction.compact(spark, dir, targetBytes = Compaction.DefaultTargetBytes)
    assert(stats.compacted && stats.filesBefore == 48)
    assert(Compaction.dataFiles(dir).size == stats.filesAfter)
    assert(stats.filesAfter < 48 && stats.filesAfter >= 1)
    assert(fingerprint() == before, "content must be byte-identical after compaction")

    // Already at target: second run is a no-op.
    val again = Compaction.compact(spark, dir, targetBytes = Compaction.DefaultTargetBytes)
    assert(!again.compacted && again.filesAfter == stats.filesAfter)
  }
}
