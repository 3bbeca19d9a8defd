package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.ValueIndex

/** Streaming maintenance of the file-posting secondary index: a
  * foreachBatch sink appends each micro-batch to the versioned table
  * (ParquetTable.append — a hard-link commit) and runs
  * ValueIndex.refreshIncremental, which indexes ONLY the batch's new
  * files (the carried files keep their postings). After the stream
  * drains, the incrementally-maintained postings must equal a
  * from-scratch rebuild's, and a pruned point lookup must find a
  * streamed row through ≤ a handful of files. */
class StreamingValueIndexSpec extends SparkSuite {

  test("foreachBatch append + refreshIncremental == rebuild; lookups stay pruned") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-svix").toString
    val dir = s"$root/t"
    def rows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, (i * 48271L) % 100003L)).toDF("id", "track")
    ParquetTable.swap(spark, rows(0L, 1000L).repartition(4), dir)
    ValueIndex.build(spark, dir, "track")

    rows(1000L, 1400L).repartition(4).write.mode("overwrite").parquet(s"$root/in")
    val fastPaths = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val q = spark.readStream
      .schema(rows(0L, 1L).schema).parquet(s"$root/in")
      .writeStream
      .option("checkpointLocation", s"$root/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ParquetTable.append(spark, batch, dir)
        fastPaths.add(ValueIndex.refreshIncremental(spark, dir, "track"))
        ()
      }
      .start()
    q.processAllAvailable(); q.stop()

    assert(ValueIndex.fresh(dir, "track"), "index current after the stream drains")
    import scala.jdk.CollectionConverters._
    assert(fastPaths.asScala.nonEmpty && fastPaths.asScala.forall(identity),
      "every micro-batch must take the INCREMENTAL path, not a full rebuild")
    assert(ParquetTable.read(spark, dir).count() == 1400L, "no row lost/duplicated")
    val incr = spark.read.parquet(s"$dir/_VIDX_track")
      .collect().map(_.toString).toSet
    // A streamed row is findable through the pruned path before any
    // full rebuild happens.
    val t1200 = (1200L * 48271L) % 100003L
    val total = ValueIndex.snapshotFileCount(dir)
    val cand = ValueIndex.candidateFileCount(spark, dir, "track", t1200, t1200)
    assert(cand >= 1 && cand < total, s"pruned: $cand of $total files")
    assert(ValueIndex.scanKey(spark, dir, "track", t1200)
      .collect().map(_.getLong(0)).toSeq == Seq(1200L))
    // Postings equal a from-scratch rebuild's.
    ValueIndex.build(spark, dir, "track")
    val full = spark.read.parquet(s"$dir/_VIDX_track")
      .collect().map(_.toString).toSet
    assert(incr == full, "incremental maintenance == rebuild")
  }
}
