package graft

import java.nio.file.Files

import graft.streaming.Compaction

/** Compaction must shrink the file count to the bin-packed target while
  * leaving the table content identical (SURVEY §2.3 Q16 maintenance;
  * reference: db/table_maintenance.sql:121-125 file-health target). */
class CompactionSpec extends SparkSuite {

  test("compaction bin-packs small files, content identical, idempotent") {
    val dir = graft.tables.TmpDirs.create("graft-compact").resolve("order_stream").toString
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

  test("partitioned trees compact per leaf and refuse the flat rewrite") {
    val dir = graft.tables.TmpDirs.create("graft-compact-part").resolve("events").toString
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .withColumn("event_date", org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
    // Fragmented partitioned write: several files per daily partition.
    src.repartition(4).write.partitionBy("event_date").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val filesBefore = Compaction.dataFiles(dir).size
    assert(Compaction.partitionDirs(dir).size == 30)

    // The flat rewrite would silently drop the partition layout — refuse.
    intercept[IllegalArgumentException](Compaction.compact(spark, dir))

    val stats = Compaction.compactPartitions(spark, dir)
    assert(stats.size == 30 && stats.forall(_._2.compacted))
    assert(Compaction.dataFiles(dir).size < filesBefore)
    assert(Compaction.partitionDirs(dir).size == 30, "layout must survive compaction")
    assert(spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq == before)
  }

  test("partitioned STREAMING sink: log retired, stragglers dropped, then per-leaf compaction") {
    val base = graft.tables.TmpDirs.create("graft-compact-sink").toString
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "value")
    src.coalesce(2).write.parquet(s"$base/in")
    val stream = spark.readStream.schema(src.schema).parquet(s"$base/in")
    val q = graft.streaming.EventsStreaming.startPartitionedAppend(
      stream, s"$base/out", s"$base/cp")
    q.processAllAvailable(); q.stop()
    assert(Files.exists(java.nio.file.Paths.get(s"$base/out/_spark_metadata")))

    // Inject an uncommitted straggler (a crashed stream's orphan file):
    // its rows are invisible to the log-aware read and must NOT be
    // resurrected by compaction.
    val committed = spark.read.parquet(s"$base/out").count()
    val leaf = Compaction.partitionDirs(s"$base/out").head
    val donor = Compaction.dataFiles(leaf.toString).head
    Files.copy(donor, leaf.resolve("part-straggler.parquet"))
    assert(spark.read.parquet(s"$base/out").count() == committed, "log hides the straggler")

    val stats = Compaction.compactPartitions(spark, s"$base/out")
    assert(stats.size == 30)
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/out/_spark_metadata")),
      "sink log must be retired — the compacted tree is a plain parquet dir")
    assert(spark.read.parquet(s"$base/out").count() == committed,
      "straggler rows must be dropped with the log, not resurrected")
    assert(Compaction.partitionDirs(s"$base/out").size == 30)
  }

  test("an interrupted compaction rolls back losslessly on the next run") {
    val dir = graft.tables.TmpDirs.create("graft-compact-crash").resolve("t").toString
    val s = spark
    import s.implicits._
    val src = (1 to 1000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
    src.repartition(10).write.parquet(dir)
    def fingerprint() =
      spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val before = fingerprint()

    // Simulate a crash mid-swap: half the data staged out to the trash,
    // a partial output file written, marker still present.
    val runId = "deadbeef"
    val trash = Files.createDirectories(
      java.nio.file.Paths.get(dir, s".trash-$runId"))
    Compaction.dataFiles(dir).take(5).foreach { f =>
      Files.move(f, trash.resolve(f.getFileName))
    }
    Files.write(
      java.nio.file.Paths.get(dir, s"part-00000-compacted-$runId.parquet"),
      Array[Byte](1, 2, 3)) // torn partial output
    Files.writeString(
      java.nio.file.Paths.get(dir, "_COMPACTING"), s".trash-$runId\t$runId")

    // Next maintenance run: rollback first, then a clean compaction.
    val stats = Compaction.compact(spark, dir)
    assert(stats.compacted && stats.filesBefore == 10)
    assert(fingerprint() == before, "all rows must survive the crash + recovery")
    assert(!Files.exists(java.nio.file.Paths.get(dir, "_COMPACTING")))
  }
}
