package graft

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** The DML concurrency contract (r12): `commitCow` carries the writer's
  * OCC expectation — the snapshot it planned its rewrite against. If
  * the table moved past that snapshot before publish, the loser must be
  * LOUDLY rejected (ConcurrentWriteException) and leave the table
  * byte-clean: no version published, no staging dir left behind. The
  * old behavior (re-derive the next version id at commit time) was a
  * silent last-writer-wins that dropped the interleaved commit's file
  * set.
  */
class ConcurrentDmlSpec extends SparkSuite {

  private def stagingDirs(dir: String): Seq[String] =
    java.nio.file.Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).filter(_.contains(".staging-")).toSeq

  test("a stale-snapshot commit is loudly rejected and leaves zero garbage") {
    val dir = graft.tables.TmpDirs.create("graft-occ").toString + "/t"
    val df = spark.sql("SELECT * FROM VALUES (1L, 10.0), (2L, 20.0), (3L, 30.0) AS t(k, v)")
    ParquetTable.swap(spark, df, dir)
    val nm = s"occ_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("k"))

    // Writer A resolves the current snapshot (its OCC expectation)...
    val staleCur = java.nio.file.Paths.get(ParquetTable.currentPath(dir))

    // ...then writer B commits first (the interleaved winner).
    GraftSql.sql(spark, s"UPDATE $nm SET v = v + 1 WHERE k = 2")
    assert(ParquetTable.snapshots(dir).size == 2)

    // Writer A now tries to publish against the stale snapshot: loud
    // conflict, not silent last-writer-wins.
    val e = intercept[ParquetTable.ConcurrentWriteException] {
      ParquetTable.commitCow(dir, staleCur, Set.empty) { staging =>
        spark.sql("SELECT 99L AS k, 0.0 AS v").write.mode("append")
          .parquet(staging.toString)
      }
    }
    assert(e.getMessage.contains("moved"), e.getMessage)

    // The loser left nothing: no third version, no staging dir, and
    // B's commit (the winner) is intact.
    assert(ParquetTable.snapshots(dir).size == 2)
    assert(stagingDirs(dir).isEmpty, stagingDirs(dir).toString)
    val vSum = GraftSql.sql(spark,
      s"SELECT CAST(round(sum(v), 2) AS DOUBLE) AS sv FROM $nm").head.getDouble(0)
    assert(vSum == 61.0, s"winner's commit must survive, got $vSum")

    // And a RETRY against the LIVE snapshot succeeds — the documented
    // read-validate-commit loop.
    val liveCur = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    val id = ParquetTable.commitCow(dir, liveCur, Set.empty) { staging =>
      spark.sql("SELECT 99L AS k, 0.0 AS v").write.mode("append")
        .parquet(staging.toString)
    }
    assert(id == 3L)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 4L)
  }

  test("a crashed writer's orphaned VERSION slot (moved, never published) self-heals") {
    val dir = graft.tables.TmpDirs.create("graft-occ3").toString + "/t"
    ParquetTable.swap(spark,
      spark.sql("SELECT 1L AS k, CAST(1.0 AS DOUBLE) AS v"), dir)
    val cur = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    // Simulate a writer that crashed between its atomic move and its
    // publish: version slot n+1 exists on disk but _CURRENT still says n.
    val orphan = java.nio.file.Paths.get(dir,
      graft.streaming.VersionNames.format(
        graft.streaming.VersionNames.idOf(cur.getFileName.toString) + 1))
    java.nio.file.Files.createDirectories(orphan)
    spark.sql("SELECT 5L AS k, CAST(5.0 AS DOUBLE) AS v")
      .write.mode("overwrite").parquet(orphan.toString)
    // The next writer against the LIVE snapshot must reclaim the slot,
    // not brick the table on a permanently-occupied version id.
    val id = ParquetTable.commitCow(dir, cur, Set.empty) { staging =>
      spark.sql("SELECT 2L AS k, CAST(2.0 AS DOUBLE) AS v")
        .write.mode("append").parquet(staging.toString)
    }
    assert(id == 2L)
    val rows = ParquetTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1L, 1.0), (2L, 2.0)),
      s"the orphan's rows must not leak: $rows")
  }

  test("first row-level DML on an UNDIVERGED shallow clone commits locally") {
    val s = spark
    import s.implicits._
    val src = graft.tables.TmpDirs.create("graft-occ4").toString + "/src"
    ParquetTable.swap(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), src)
    val cloneDir = graft.tables.TmpDirs.create("graft-occ4c").toString + "/c"
    ParquetTable.shallowClone(src, cloneDir)
    val nm = s"occ4_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, cloneDir, Seq("k"))
    // The clone's pointer is a PATH into the source table — the OCC
    // check must resolve it, not compare raw pointer text (which made
    // every first clone DML a spurious conflict).
    GraftSql.sql(spark, s"DELETE FROM $nm WHERE k = 1")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 1L)
    assert(ParquetTable.read(spark, src).count() == 2,
      "the source table must be untouched by the clone's DML")
  }

  test("same-snapshot racers: exactly one wins, the loser is clean") {
    val dir = graft.tables.TmpDirs.create("graft-occ2").toString + "/t"
    ParquetTable.swap(spark,
      spark.sql("SELECT * FROM VALUES (1L, 1.0) AS t(k, v)"), dir)
    val cur = java.nio.file.Paths.get(ParquetTable.currentPath(dir))

    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def racer(tag: Long) = pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
      def call(): Either[Throwable, Long] = {
        start.await(10, TimeUnit.SECONDS)
        try Right(ParquetTable.commitCow(dir, cur, Set.empty) { staging =>
          spark.sql(s"SELECT $tag AS k, 0.0 AS v").write.mode("append")
            .parquet(staging.toString)
        })
        catch { case t: Throwable => Left(t) }
      }
    })
    val (fa, fb) = (racer(100L), racer(200L))
    start.countDown()
    val results = Seq(fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    pool.shutdown()

    val wins = results.collect { case Right(id) => id }
    val losses = results.collect { case Left(t) => t }
    assert(wins == Seq(2L), s"exactly one racer must win: $results")
    assert(losses.size == 1 &&
      losses.head.isInstanceOf[ParquetTable.ConcurrentWriteException], results.toString)
    assert(ParquetTable.snapshots(dir).size == 2)
    assert(stagingDirs(dir).isEmpty)
  }
}
