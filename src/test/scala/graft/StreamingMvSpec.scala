package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{ChangeFeedTable, ParquetTable, StreamingMv}
import graft.tables.MaterializedView

/** Streaming materialized-view maintenance: the CDF-driven maintainer
  * must track the base commit-by-commit, replays must be no-ops (the
  * MV stamp is the cursor, not the checkpoint), and a restart on the
  * same checkpoint must pick up commits that landed while it was down. */
class StreamingMvSpec extends SparkSuite {

  private def direct(base: DataFrame): DataFrame =
    base.groupBy("g").agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("x").cast("long")).as("sx"))

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("maintainer follows commits across runs; replay is a no-op") {
    val s = spark
    import s.implicits._
    val root = graft.tables.TmpDirs.create("graft-smv")
    val baseDir = root.resolve("base").toString
    val mvDir = root.resolve("mv").toString
    val ckpt = root.resolve("ckpt").toString

    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L)).toDF("k", "g", "x"),
      baseDir, Seq("k"))
    MaterializedView.create(spark, mvDir, baseDir, Seq("g"), "n", Seq("sx" -> "x"))

    // Two commits land, then the maintainer drains the feed.
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 100L), (3L, "b", 5L), (4L, "c", 7L)).toDF("k", "g", "x"),
      baseDir, Seq("k"))
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 100L), (4L, "c", 9L)).toDF("k", "g", "x"),
      baseDir, Seq("k"))
    StreamingMv.start(spark, baseDir, mvDir, ckpt).awaitTermination()
    assert(sortedRows(MaterializedView.read(spark, mvDir)) ==
      sortedRows(direct(ParquetTable.read(spark, baseDir))))

    // Re-running with NOTHING new: no refresh commit (stamp is current).
    val vBefore = ParquetTable.snapshots(mvDir).size
    StreamingMv.start(spark, baseDir, mvDir, ckpt).awaitTermination()
    assert(ParquetTable.snapshots(mvDir).size == vBefore)

    // A commit while the maintainer is down; the restarted maintainer
    // catches up from the same checkpoint.
    ChangeFeedTable.publish(spark,
      Seq((1L, "a", 100L), (4L, "c", 9L), (5L, "b", 11L)).toDF("k", "g", "x"),
      baseDir, Seq("k"))
    StreamingMv.start(spark, baseDir, mvDir, ckpt).awaitTermination()
    assert(sortedRows(MaterializedView.read(spark, mvDir)) ==
      sortedRows(direct(ParquetTable.read(spark, baseDir))))

    // A FRESH checkpoint replays the whole feed — still a no-op beyond
    // the stamp (exactly-once rides the MV version, not the checkpoint).
    val v2 = ParquetTable.snapshots(mvDir).size
    val got = sortedRows(MaterializedView.read(spark, mvDir))
    StreamingMv.start(spark, baseDir, mvDir,
      root.resolve("ckpt2").toString).awaitTermination()
    assert(ParquetTable.snapshots(mvDir).size == v2)
    assert(sortedRows(MaterializedView.read(spark, mvDir)) == got)
  }
}
