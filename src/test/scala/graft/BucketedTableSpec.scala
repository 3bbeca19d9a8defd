package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.scd.{BatchFlattener, ScdPipeline}
import graft.streaming.BucketedTable

/** Bucketed snapshot table: incremental merges must (a) produce the same
  * table as the monolithic merge path, (b) rewrite only affected buckets,
  * (c) publish atomically via the manifest.
  */
class BucketedTableSpec extends SparkSuite {

  test("bucketed merge equals monolithic merge and rewrites only affected buckets") {
    val dir = graft.tables.TmpDirs.create("graft-bucketed").toString
    val N = 16
    val stream = CdcPipeline.orderStreamCached(spark, sf0001)
    val batch1 = BatchFlattener.flatten(stream.filter(col("xid").startsWith("tx-")))
    val batch2 = BatchFlattener.flatten(
      stream.filter(col("xid").startsWith("txu-") || col("xid").startsWith("txs-")))

    BucketedTable.bootstrap(spark, batch1, dir, "orderId", N)
    val manifestBefore = BucketedTable.manifest(dir)
    assert(manifestBefore.nonEmpty)
    assert(BucketedTable.read(spark, dir).count() == batch1.count())

    BucketedTable.merge(spark, batch2, dir, "orderId", N)
    val manifestAfter = BucketedTable.manifest(dir)

    // (b) only buckets containing batch2 keys advanced.
    val affected = batch2.select(BucketedTable.bucketOf("orderId", N).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    manifestBefore.keys.foreach { b =>
      if (affected.contains(b))
        assert(manifestAfter(b) != manifestBefore(b), s"bucket $b should have advanced")
      else
        assert(manifestAfter(b) == manifestBefore(b), s"bucket $b should be untouched")
    }

    // (a) content equality with the monolithic two-phase pipeline.
    val bucketed = BucketedTable.read(spark, dir)
    val expected = ScdPipeline.ordersCurrent(spark, sf0001)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr("orderId", "version", "orderStatus", "xid",
          "orderDetails.version AS dv", "size(lineItems) AS nli")
        .collect().map(_.toSeq.mkString("|")).sorted
    assert(key(bucketed).sameElements(key(expected)))

    // (c) re-merging the same source converges (idempotent upsert).
    BucketedTable.merge(spark, batch2, dir, "orderId", N)
    assert(key(BucketedTable.read(spark, dir)).sameElements(key(expected)))

    // (d) vacuum drops every superseded bucket version, keeps the data.
    def versionDirs(b: Int): Seq[String] = {
      val p = java.nio.file.Paths.get(s"$dir/bucket=$b")
      if (!Files.exists(p)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq
      }
    }
    val live = BucketedTable.manifest(dir)
    assert(affected.exists(b => versionDirs(b).size > 1),
      "affected buckets should hold superseded versions before vacuum")
    BucketedTable.vacuum(dir, N)
    live.keys.foreach { b =>
      assert(versionDirs(b) == Seq(live(b)), s"bucket $b should hold exactly its live version")
    }
    assert(key(BucketedTable.read(spark, dir)).sameElements(key(expected)),
      "table content survives vacuum")
  }
}
