package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{ChangeFeedTable, ParquetTable}

/** Streaming change data feed over the versioned table (Delta
  * `readChangeFeed` streaming semantics): change files committed by
  * `publish` are streamed exactly once, new commits surface while the
  * query runs, a restarted query resumes from its checkpoint without
  * re-emitting, and the streamed rows equal the batch differ's. */
class ChangeFeedStreamSpec extends SparkSuite {

  private def freshDirs(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft-cdfstream")
    (base.resolve("table").toString, base.resolve("cp").toString)
  }

  test("commits stream as they publish; restart resumes exactly once") {
    val s = spark
    import s.implicits._
    val (dir, cp) = freshDirs()
    val out = java.nio.file.Paths.get(dir).resolveSibling("sink").toString
    def sunk() = s.read.parquet(out).collect()

    // v1 bootstrap: 3 inserts. Parquet sink — the memory sink cannot
    // recover from a checkpoint, and restart is the point of this test.
    ChangeFeedTable.publish(s,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    val q1 = ChangeFeedTable.changeFeedStream(s, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try {
      q1.processAllAvailable()
      val afterV1 = sunk()
      assert(afterV1.length == 3)
      assert(afterV1.forall(_.getAs[String]("_change_type") == "insert"))

      // v2 while the query runs: update k=2, delete k=3, insert k=4 —
      // two update images + 1 delete + 1 insert = 4 change rows.
      ChangeFeedTable.publish(s,
        Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), dir, Seq("k"))
      q1.processAllAvailable()
      val afterV2 = sunk()
      assert(afterV2.length == 7, s"expected 3+4 rows, got ${afterV2.length}")
      val v2 = afterV2.filter(_.getAs[Long]("_commit_version") == 2L)
      assert(v2.map(_.getAs[String]("_change_type")).sorted.toSeq ==
        Seq("delete", "insert", "update_postimage", "update_preimage"))
    } finally q1.stop()

    // v3 with the query DOWN; a restarted query on the same checkpoint
    // emits ONLY v3's changes (file-source exactly-once): 9 total, not
    // 12 (a re-emit of v1+v2 would show as duplicates in the sink).
    ChangeFeedTable.publish(s,
      Seq((1L, "a"), (2L, "B"), (4L, "D")).toDF("k", "v"), dir, Seq("k"))
    val q2 = ChangeFeedTable.changeFeedStream(s, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try {
      q2.processAllAvailable()
      val resumed = sunk()
      assert(resumed.length == 9, s"resume must add only v3: ${resumed.length}")
      val v3 = resumed.filter(_.getAs[Long]("_commit_version") == 3L)
      assert(v3.map(_.getAs[String]("_change_type")).sorted.toSeq ==
        Seq("update_postimage", "update_preimage"))
    } finally q2.stop()
  }

  test("a missing change set (swap-vs-move crash window) backfills on next publish") {
    val s = spark
    import s.implicits._
    val (dir, _) = freshDirs()
    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "B")).toDF("k", "v"), dir, Seq("k"))
    // Simulate the crash: v2 committed but its change files lost.
    val v2name = graft.streaming.ParquetTable.snapshots(dir).head
    graft.streaming.VersionNames.deleteTree(
      java.nio.file.Paths.get(dir, "_cdf", s"v$v2name"))

    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    val byVersion = ChangeFeedTable.changeFeedBatch(s, dir)
      .groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // v2's update images reappear (backfilled), v3's insert is present.
    assert(byVersion == Map(1L -> 2L, 2L -> 2L, 3L -> 1L), s"got $byVersion")
  }

  test("streamed changes equal the batch differ's") {
    val s = spark
    import s.implicits._
    val (dir, cp) = freshDirs()
    ChangeFeedTable.publish(s,
      (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"), dir, Seq("k"))
    ChangeFeedTable.publish(s,
      ((3L to 52L).map(i => (i, if (i % 5 == 0) s"V$i" else s"v$i")))
        .toDF("k", "v"), dir, Seq("k"))

    val q = ChangeFeedTable.changeFeedStream(s, dir)
      .writeStream.format("memory").queryName("cdf_eq")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = s.sql(
      "SELECT k, v, _change_type FROM cdf_eq WHERE _commit_version = 2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = ParquetTable.changeFeed(s, dir, 1, 0, Seq("k"))
      .collect().map(r => (
        r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[String]("_change_type"))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
