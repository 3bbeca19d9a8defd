package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** COPY INTO: idempotent file ingestion — only never-loaded files land,
  * re-runs are no-ops, late-arriving files load alone, and the loaded
  * set survives because stamps ride the version dirs atomically. */
class CopyIntoSpec extends SparkSuite {

  private var n = 0
  private def mkTable(): (String, String) = {
    val s = spark
    import s.implicits._
    n += 1
    val name = s"cpy_t$n"
    val dir = graft.tables.TmpDirs.create("graft-cpy").resolve(name).toString
    ParquetTable.swap(spark,
      Seq((0L, "seed")).toDF("id", "tag").where(lit(false)), dir)
    GraftSql.register(spark, name, dir, Seq("id"))
    (name, dir)
  }

  private def srcBatch(dir: String, sub: String, ids: Seq[Long]): Unit = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"r$i")).toDF("id", "tag").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$sub")
    // flatten: move the part file up under a stable name
    val part = Files.list(Paths.get(dir, sub)).iterator()
    val found = scala.jdk.CollectionConverters.IteratorHasAsScala(part).asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(found, Paths.get(dir, s"$sub.parquet"))
    graft.streaming.VersionNames.deleteTree(Paths.get(dir, sub))
  }

  test("loads new files once; re-run is a no-op; late files load alone") {
    val (name, dir) = mkTable()
    val src = graft.tables.TmpDirs.create("graft-cpy-src").toString
    srcBatch(src, "a", Seq(1L, 2L))
    srcBatch(src, "b", Seq(3L))

    val r1 = GraftSql.sql(spark,
      s"COPY INTO $name FROM '$src' FILEFORMAT = PARQUET").head
    assert(r1.getAs[Any]("n_files_loaded").toString == "2")
    assert(r1.getAs[Any]("n_rows_loaded").toString == "3")
    val v1 = ParquetTable.snapshots(dir).size

    // Idempotent: nothing new → no rows, NO new version.
    val r2 = GraftSql.sql(spark,
      s"COPY INTO $name FROM '$src' FILEFORMAT = PARQUET").head
    assert(r2.getAs[Any]("n_files_loaded").toString == "0")
    assert(r2.getAs[Any]("n_files_skipped").toString == "2")
    assert(ParquetTable.snapshots(dir).size == v1)

    // A late-arriving file loads alone; earlier files stay skipped.
    srcBatch(src, "c", Seq(4L, 5L))
    val r3 = GraftSql.sql(spark,
      s"COPY INTO $name FROM '$src' FILEFORMAT = PARQUET").head
    assert(r3.getAs[Any]("n_files_loaded").toString == "1")
    assert(r3.getAs[Any]("n_rows_loaded").toString == "2")

    val got = GraftSql.sql(spark, s"SELECT id FROM $name")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L, 5L), s"got $got")
  }

  test("CHECK constraints gate the ingest; a rejected batch loads nothing") {
    val (name, dir) = mkTable()
    GraftSql.sql(spark, s"ALTER TABLE $name ADD CONSTRAINT pos CHECK (id > 0)")
    val src = graft.tables.TmpDirs.create("graft-cpy-src2").toString
    srcBatch(src, "bad", Seq(-1L, 7L))
    val v0 = ParquetTable.snapshots(dir).size
    intercept[Exception] {
      GraftSql.sql(spark, s"COPY INTO $name FROM '$src' FILEFORMAT = PARQUET")
    }
    assert(ParquetTable.snapshots(dir).size == v0)
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $name").head.getLong(0) == 0L)
    // After the fix, the corrected file loads (the failed attempt
    // stamped nothing, so nothing was falsely marked ingested).
    Files.delete(Paths.get(src, "bad.parquet"))
    srcBatch(src, "good", Seq(1L, 7L))
    val r = GraftSql.sql(spark,
      s"COPY INTO $name FROM '$src' FILEFORMAT = PARQUET").head
    assert(r.getAs[Any]("n_rows_loaded").toString == "2")
  }
}
