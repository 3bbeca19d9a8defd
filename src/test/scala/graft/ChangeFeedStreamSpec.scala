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
    val base = graft.tables.TmpDirs.create("graft-cdfstream")
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

  test("vacuum retires consumed change dirs; running stream unaffected; fresh reader bootstraps from snapshot") {
    val s = spark
    import s.implicits._
    val (dir, cp) = freshDirs()
    val out = java.nio.file.Paths.get(dir).resolveSibling("sink").toString

    // v1 (bootstrap: k=1,2), v2 (update k=2, insert k=3), v3 (insert k=4).
    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    ChangeFeedTable.publish(s, Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")).toDF("k", "v"), dir, Seq("k"))

    // Reader A consumes the full history, then stays down during vacuum.
    val q1 = ChangeFeedTable.changeFeedStream(s, dir)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q1.processAllAvailable() finally q1.stop()
    assert(s.read.parquet(out).count() == 6L) // 2 boot + 3 (v2) + 1 (v3)

    // Retention: superseded snapshots v1, v2 AND their change dirs go.
    val dropped = ParquetTable.vacuum(dir)
    assert(dropped.size == 2)
    dropped.foreach { v =>
      assert(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "_cdf", s"v$v")), s"change dir v$v retired")
    }
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_cdf", "_TRUNCATED")))

    // v4 publishes after the vacuum; reader A restarts on its checkpoint
    // and sees ONLY v4 — the retirement of files it already consumed is
    // invisible to it.
    ChangeFeedTable.publish(s,
      Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")).toDF("k", "v"), dir, Seq("k"))
    val q2 = ChangeFeedTable.changeFeedStream(s, dir, resume = true)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", cp).start()
    try q2.processAllAvailable() finally q2.stop()
    val resumed = s.read.parquet(out).collect()
    assert(resumed.length == 8, s"6 + v4's 2 update images: ${resumed.length}")
    assert(resumed.count(_.getAs[Long]("_commit_version") == 4L) == 2)

    // A FRESH plain reader must refuse the truncated feed loudly...
    val e = intercept[IllegalArgumentException](
      ChangeFeedTable.changeFeedStream(s, dir))
    assert(e.getMessage.contains("changeFeedStreamFromSnapshot"))

    // ...and the snapshot-bootstrap start sees a CONSISTENT history:
    // current snapshot (v4 state) as inserts + only commits after v4.
    val (cp2, out2) = (java.nio.file.Paths.get(dir).resolveSibling("cp2").toString,
      java.nio.file.Paths.get(dir).resolveSibling("sink2").toString)
    val q3 = ChangeFeedTable.changeFeedStreamFromSnapshot(s, dir)
      .writeStream.format("parquet").option("path", out2)
      .option("checkpointLocation", cp2).start()
    try {
      q3.processAllAvailable()
      val boot = s.read.parquet(out2).collect()
      assert(boot.length == 4, s"v4 snapshot as inserts: ${boot.length}")
      assert(boot.forall(r => r.getAs[String]("_change_type") == "insert" &&
        r.getAs[Long]("_commit_version") == 4L))
      // v5 while running: only its diff arrives (no snapshot re-emit).
      ChangeFeedTable.publish(s,
        Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D"), (5L, "e")).toDF("k", "v"),
        dir, Seq("k"))
      q3.processAllAvailable()
      val withTail = s.read.parquet(out2).collect()
      assert(withTail.length == 5, s"4 boot + 1 v5 insert: ${withTail.length}")
      val v5 = withTail.filter(_.getAs[Long]("_commit_version") == 5L)
      assert(v5.map(r => (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSeq ==
        Seq((5L, "insert")))
      // Replaying boot + tail reconstructs exactly the live table state.
      val replayed = withTail.filter(_.getAs[String]("_change_type") != "update_preimage")
        .filter(_.getAs[String]("_change_type") != "delete")
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
      assert(replayed == ParquetTable.read(s, dir).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap)
    } finally q3.stop()
  }

  test("compactFeed bin-packs change dirs; batch view and a fresh consumer are unchanged") {
    val s = spark
    import s.implicits._
    val (dir, cp) = freshDirs()
    // Many-partition writes leave many small files per change dir.
    ChangeFeedTable.publish(s,
      (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v").repartition(8), dir, Seq("k"))
    ChangeFeedTable.publish(s,
      (1L to 44L).map(i => (i, if (i % 4 == 0) s"V$i" else s"v$i")).toDF("k", "v")
        .repartition(8), dir, Seq("k"))
    val before = ChangeFeedTable.changeFeedBatch(s, dir).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq

    val stats = ChangeFeedTable.compactFeed(s, dir)
    assert(stats.size == 2)
    assert(stats.forall { case (_, st) => st.filesAfter <= st.filesBefore })
    assert(stats.exists { case (_, st) => st.compacted && st.filesAfter == 1 },
      s"small change sets pack to one file: $stats")

    assert(ChangeFeedTable.changeFeedBatch(s, dir).collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq == before,
      "compaction must not change the feed's content")
    // A fresh stream over the compacted feed replays the same history.
    val q = ChangeFeedTable.changeFeedStream(s, dir)
      .writeStream.format("memory").queryName("cdf_compacted")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(s.sql("SELECT * FROM cdf_compacted").collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq == before)
  }
}
