package graft

import graft.tables.{Checkpoints, GraftSql}

/** The lineage-cut helper must keep the fast local default and, under
  * spark.graft.checkpoint.reliableDir, route the same intermediates
  * through RELIABLE Dataset.checkpoint files with identical results —
  * the cluster spelling of the recursive-CTE/q34 lineage cuts. */
class CheckpointsSpec extends SparkSuite {

  private val rcte =
    """WITH RECURSIVE r(n) AS (
      |  SELECT 1 AS n
      |  UNION
      |  SELECT n + 1 FROM r WHERE n < 5
      |)
      |SELECT n FROM r""".stripMargin

  test("reliable arm writes checkpoint files and returns identical rows") {
    val s = spark
    val localRows = GraftSql.sql(s, rcte).collect().map(_.getInt(0)).sorted
    assert(localRows.toSeq == (1 to 5))

    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt")
    s.conf.set("spark.graft.checkpoint.reliableDir", dir.toString)
    try {
      val reliableRows = GraftSql.sql(s, rcte).collect().map(_.getInt(0)).sorted
      assert(reliableRows.sameElements(localRows))
      // The cut really went through the reliable path: files landed.
      val s2 = java.nio.file.Files.walk(dir)
      val nFiles =
        try s2.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s2.close()
      assert(nFiles > 0, s"no reliable checkpoint files under $dir")
    } finally {
      s.conf.unset("spark.graft.checkpoint.reliableDir")
      try graft.tables.ValueIndex.deleteTree(dir)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("default arm stays a local checkpoint (no checkpoint dir required)") {
    val s = spark
    import s.implicits._
    val cut = Checkpoints.cut(Seq(1, 2, 3).toDF("v"))
    assert(cut.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
  }
}
