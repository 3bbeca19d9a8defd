package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.tables.PartitionedTable

/** Partitioned layout: a partition-column filter must prune at planning
  * time (PartitionFilters on the scan, fewer files read), and dynamic
  * partition overwrite must leave untouched partitions' files alone
  * (SURVEY §2.3 Q14/Q16 — the 100 TB incremental layout primitive). */
class PartitionedTableSpec extends SparkSuite {

  // Shares the TIMESTAMP(NANOS) reader with the query module.
  private def events() =
    graft.queries.EventsQueries.events(spark, sf0001)
      .withColumn("event_date", to_date(col("ts")))

  test("partition filter prunes directories at planning time") {
    val dir = graft.tables.TmpDirs.create("graft-part").resolve("events").toString
    val df = events()
    PartitionedTable.write(df, dir, Seq("event_date"))

    val partDirs = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("event_date=")).toSeq
    assert(partDirs.size == 30, s"expected 30 daily partitions, got ${partDirs.size}")
    val totalFiles = graft.streaming.Compaction.dataFiles(dir).size

    val pruned = spark.read.parquet(dir)
      .filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-08")))
    val rows = pruned.collect()
    assert(rows.nonEmpty)
    assert(rows.length == df.filter(col("event_date") === "2024-01-08").count())

    // No exchange in filter+scan+collect, so the executed plan is the
    // plain physical plan: the scan must carry the partition filter and
    // its file-count metric must show the pruning (only 2024-01-08's
    // files opened).
    val scan = pruned.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PartitionFilters").contains("event_date"),
      s"scan metadata: ${scan.metadata}")
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < totalFiles,
      s"read $filesRead of $totalFiles files — no pruning happened")
  }

  test("dynamic partition overwrite touches only the partitions in the batch") {
    val dir = graft.tables.TmpDirs.create("graft-dynpart").resolve("events").toString
    val df = events()
    PartitionedTable.write(df, dir, Seq("event_date"))

    def filesOf(date: String): Set[String] = {
      val p = Paths.get(dir, s"event_date=$date")
      Files.list(p).iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
    }
    val beforeUntouched = filesOf("2024-01-03")
    val beforeTouched = filesOf("2024-01-08")

    // Backfill one day with doubled values.
    val patch = df.filter(col("event_date") === "2024-01-08")
      .withColumn("value", col("value") * 2)
    PartitionedTable.overwritePartitions(patch, dir, Seq("event_date"))

    assert(filesOf("2024-01-03") == beforeUntouched,
      "untouched partition files must be byte-identical (same names)")
    assert(filesOf("2024-01-08") != beforeTouched, "touched partition must be rewritten")

    val back = spark.read.parquet(dir)
    assert(back.count() == df.count(), "row count unchanged by the single-day backfill")
    val sumPatched = back.filter(col("event_date") === "2024-01-08")
      .agg(round(sum("value"), 2)).head().getDouble(0)
    val sumExpected = patch.agg(round(sum("value"), 2)).head().getDouble(0)
    assert(sumPatched == sumExpected)
  }
}
