package graft

import java.nio.file.Files

import graft.streaming.ParquetTable

/** Snapshot time travel on the atomic parquet table (the engine's
  * storage-level answer to Delta's VERSION AS OF / TIMESTAMP AS OF;
  * SURVEY §2.3 Q15). */
class TimeTravelSpec extends SparkSuite {

  test("snapshots accumulate, read back by version, vacuum keeps the newest") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-tt").toString

    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(1, 2, 3, 4).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(9).toDF("x"), dir)

    assert(ParquetTable.snapshots(dir).size == 3)
    assert(ParquetTable.read(spark, dir).count() == 1)
    assert(ParquetTable.readSnapshot(spark, dir, 0).count() == 1)
    assert(ParquetTable.readSnapshot(spark, dir, 1).count() == 4)
    assert(ParquetTable.readSnapshot(spark, dir, 2).count() == 3)

    ParquetTable.vacuum(dir, keep = 1)
    assert(ParquetTable.snapshots(dir).size == 1)
    assert(ParquetTable.read(spark, dir).count() == 1, "current survives vacuum")
  }

  test("version ids stay monotonic across naming epochs (numeric, not lexical, order)") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-tt2").toString

    // Plant a snapshot written by an "older epoch" with an UNPADDED name:
    // lexically "v99" sorts after any zero-padded name, numerically it is
    // the oldest — snapshots() must use numeric order and swap() must
    // continue the counter past it.
    Seq(1).toDF("x").write.parquet(s"$dir/v99")
    Files.writeString(java.nio.file.Paths.get(dir, "_CURRENT"), "v99")

    ParquetTable.swap(spark, Seq(1, 2).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("x"), dir)

    assert(ParquetTable.snapshots(dir) ==
      Seq(f"v${101L}%020d", f"v${100L}%020d", "v99"))
    assert(ParquetTable.read(spark, dir).count() == 3, "newest padded version is current")
    assert(ParquetTable.readSnapshot(spark, dir, 2).count() == 1, "legacy dir is oldest")

    ParquetTable.vacuum(dir, keep = 1)
    assert(ParquetTable.read(spark, dir).count() == 3, "vacuum must not delete the numeric-newest")
  }

  test("RESTORE republishes an old snapshot as a new version; DEEP CLONE starts fresh history") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-tt4").toString

    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("x"), dir)
    ParquetTable.swap(spark, Seq(9).toDF("x"), dir)

    ParquetTable.restore(spark, dir, 1) // back to the 3-row snapshot
    assert(ParquetTable.read(spark, dir).count() == 3)
    assert(ParquetTable.snapshots(dir).size == 3, "restore commits, never rewrites history")
    assert(ParquetTable.readSnapshot(spark, dir, 1).count() == 1, "the rolled-back version survives")

    val cloneDir = graft.tables.TmpDirs.create("graft-tt4c").toString
    ParquetTable.deepClone(spark, dir, cloneDir)
    assert(ParquetTable.read(spark, cloneDir).count() == 3)
    assert(ParquetTable.snapshots(cloneDir).size == 1, "clone starts with fresh history")
  }

  test("SHALLOW CLONE copies zero data files and diverges copy-on-write") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-tt5").toString

    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("x"), dir)
    val cloneDir = graft.tables.TmpDirs.create("graft-tt5c").resolve("clone").toString
    ParquetTable.shallowClone(dir, cloneDir)

    def parquetFiles(d: String): Seq[java.nio.file.Path] = {
      val st = Files.walk(java.nio.file.Paths.get(d))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.filter(p =>
          Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet")).toSeq
      } finally st.close()
    }
    assert(parquetFiles(cloneDir).isEmpty, "shallow clone copies ZERO data files")
    assert(ParquetTable.read(spark, cloneDir).count() == 3, "clone reads the source snapshot")

    // Copy-on-write divergence: the clone's first swap is local.
    ParquetTable.swap(spark, Seq(9).toDF("x"), cloneDir)
    assert(ParquetTable.read(spark, cloneDir).count() == 1)
    assert(ParquetTable.read(spark, dir).count() == 3, "source is untouched by the clone's write")
    assert(parquetFiles(cloneDir).nonEmpty, "post-divergence versions are local")

    // Cloning onto an existing table is refused.
    intercept[IllegalArgumentException] { ParquetTable.shallowClone(dir, cloneDir) }
  }

  test("TIMESTAMP AS OF reads the newest snapshot published at or before ts") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-tt3").toString

    val t0 = System.currentTimeMillis()
    ParquetTable.swap(spark, Seq(1).toDF("x"), dir)
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    ParquetTable.swap(spark, Seq(1, 2).toDF("x"), dir)

    assert(ParquetTable.readAsOf(spark, dir, mid).count() == 1)
    assert(ParquetTable.readAsOf(spark, dir, System.currentTimeMillis()).count() == 2)
    intercept[IllegalArgumentException] {
      ParquetTable.readAsOf(spark, dir, t0 - 1000)
    }
  }

  test("vacuum DRY RUN previews without deleting; RETAIN drops by publish age") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-vac").resolve("t").toString
    (1 to 3).foreach(i => ParquetTable.swap(spark, (1 to i * 10).toDF("v"), dir))
    assert(ParquetTable.snapshots(dir).size == 3)

    // DRY RUN: names the two superseded versions, deletes nothing.
    val preview = ParquetTable.vacuumDryRun(dir, keep = 1)
    assert(preview.size == 2)
    assert(ParquetTable.snapshots(dir).size == 3, "dry run must not delete")

    // RETAIN with a huge window keeps everything; with zero retention it
    // drops exactly the superseded versions (never the live one).
    assert(ParquetTable.vacuumRetain(dir, retainMillis = 7L * 24 * 3600 * 1000).isEmpty)
    assert(ParquetTable.snapshots(dir).size == 3)
    val dropped = ParquetTable.vacuumRetain(
      dir, retainMillis = 0L, nowMillis = System.currentTimeMillis() + 1000)
    assert(dropped.sorted == preview.sorted)
    assert(ParquetTable.snapshots(dir).size == 1)
    assert(ParquetTable.read(spark, dir).count() == 30, "live version untouched")
  }

  test("snapshot isolation: a resolved reader never sees a concurrent swap") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-iso").resolve("t").toString
    ParquetTable.swap(spark, (1 to 100).toDF("v"), dir)

    // The reader resolves `_CURRENT` ONCE, at DataFrame creation — it is
    // pinned to that version directory from then on.
    val reader = ParquetTable.read(spark, dir)
    ParquetTable.swap(spark, (1 to 250).toDF("v"), dir)

    assert(reader.count() == 100,
      "in-flight reader must keep seeing its resolved snapshot")
    assert(ParquetTable.read(spark, dir).count() == 250,
      "new readers must see the new version")
    // The superseded version stays on disk (that's WHY isolation holds)
    // until vacuum — which is the documented reader-lifetime hazard,
    // exactly as in Delta.
    assert(ParquetTable.snapshots(dir).size == 2)
  }

  test("a moved-but-unpublished version dir is NOT addressable (no phantom commits)") {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-ph").resolve("t").toString
    ParquetTable.swap(spark, Seq(1, 2).toDF("v"), dir)
    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("v"), dir)
    val nm = s"ph_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    graft.tables.GraftSql.register(spark, nm, dir, Seq("v"))

    // Simulate a writer that crashed between its version-dir move and
    // its publish: a complete-looking v3 that was never acknowledged.
    val phantom = java.nio.file.Paths.get(dir,
      graft.streaming.VersionNames.format(3L))
    Seq(9, 9, 9, 9).toDF("v").write.parquet(phantom.toString)

    // VERSION AS OF must refuse the phantom id...
    val e = intercept[IllegalArgumentException] {
      graft.tables.GraftSql.sql(spark,
        s"SELECT count(*) AS n FROM $nm VERSION AS OF 3").collect()
    }
    assert(e.getMessage.contains("no published version"), e.getMessage)
    // ...while the acknowledged lineage stays addressable and the live
    // read is untouched.
    assert(graft.tables.GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $nm VERSION AS OF 1").head.getLong(0) == 2L)
    assert(graft.tables.GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 3L)
  }

  test("a shallow clone's local orphan never resolves as the source's version (ADVICE r12)") {
    val s = spark
    import s.implicits._
    val srcDir = graft.tables.TmpDirs.create("graft-cph").resolve("src").toString
    ParquetTable.swap(spark, Seq(1, 2).toDF("v"), srcDir)
    ParquetTable.swap(spark, Seq(1, 2, 3).toDF("v"), srcDir)
    val cloneDir = graft.tables.TmpDirs.create("graft-cph").resolve("clone").toString
    ParquetTable.shallowClone(srcDir, cloneDir)

    // The clone's pointer is a PATH into the source's v2. A local orphan
    // dir with the SAME version name (a writer that crashed between its
    // move and its publish) must not become addressable just because the
    // pointer's filename matches it — that is the phantom-commit read.
    val vname = java.nio.file.Paths.get(ParquetTable.currentPath(cloneDir))
      .getFileName.toString
    Seq(9, 9, 9, 9).toDF("v").write
      .parquet(java.nio.file.Paths.get(cloneDir, vname).toString)

    val nm = s"cph_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    graft.tables.GraftSql.register(spark, nm, cloneDir, Seq("v"))
    val e = intercept[IllegalArgumentException] {
      graft.tables.GraftSql.sql(spark,
        s"SELECT count(*) AS n FROM $nm VERSION AS OF 2").collect()
    }
    assert(e.getMessage.contains("no published version"), e.getMessage)
    // The clone still reads its source snapshot through the pointer.
    assert(graft.tables.GraftSql.sql(spark,
      s"SELECT count(*) AS n FROM $nm").head.getLong(0) == 3L)
  }
}
