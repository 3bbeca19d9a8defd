package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable

/** Generic MERGE INTO: upsert/delete/insert semantics per source row,
  * copy-on-write confined to the files containing matched keys. */
class MergeIntoSpec extends SparkSuite {

  private def key(r: org.apache.spark.sql.Row) = r.toSeq.mkString("|")

  test("mergeInto applies upserts, deletes, inserts; untouched files link forward") {
    val dir = graft.tables.TmpDirs.create("graft-mi").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .repartitionByRange(8, col("o_orderkey"))
    ParquetTable.swap(spark, orders, dir)
    val v1 = Paths.get(ParquetTable.currentPath(dir))

    val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
    // Source: low keys updated, a band deleted, brand-new keys inserted.
    val updates = orders.filter(col("o_orderkey") < 300)
      .withColumn("o_orderstatus", lit("M"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("_deleted", lit(false))
    val deletes = orders
      .filter(col("o_orderkey").between(300, 600))
      .withColumn("_deleted", lit(true))
    val inserts = orders.filter(col("o_orderkey") < 50)
      .withColumn("o_orderkey", col("o_orderkey") + maxKey + 1)
      .withColumn("o_orderstatus", lit("N"))
      .withColumn("_deleted", lit(false))
    val source = updates.unionByName(deletes).unionByName(inserts)

    val (nUp, nDel) = ParquetTable.mergeInto(spark, dir, source, Seq("o_orderkey"))
    assert(nUp == updates.count() + inserts.count())
    assert(nDel == deletes.count())

    // Expected final state computed independently.
    val expected = orders
      .filter(!col("o_orderkey").between(300, 600))
      .filter(col("o_orderkey") >= 300)
      .unionByName(updates.drop("_deleted"))
      .unionByName(inserts.drop("_deleted"))
    assert(ParquetTable.read(spark, dir).collect().map(key).sorted.toSeq ==
      expected.collect().map(key).sorted.toSeq)

    // Only the files holding keys < 601 were rewritten; the high-key
    // files of the range-clustered layout hard-link forward.
    val v2 = Paths.get(ParquetTable.currentPath(dir))
    import scala.jdk.CollectionConverters._
    val linked = Files.list(v2).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .count(p => Files.exists(v1.resolve(p.getFileName.toString)) &&
        Files.isSameFile(p, v1.resolve(p.getFileName.toString)))
    assert(linked > 0, "no untouched file was carried forward as a link")

    // Insert-only merge: no file rewritten at all.
    val more = orders.filter(col("o_orderkey") < 20)
      .withColumn("o_orderkey", col("o_orderkey") + 2 * (maxKey + 1))
    val (nUp2, nDel2) = ParquetTable.mergeInto(spark, dir, more, Seq("o_orderkey"))
    assert(nUp2 == more.count() && nDel2 == 0L)
    val v3 = Paths.get(ParquetTable.currentPath(dir))
    val rewritten = Files.list(v3).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .count(p => !(Files.exists(v2.resolve(p.getFileName.toString)) &&
        Files.isSameFile(p, v2.resolve(p.getFileName.toString))))
    assert(rewritten > 0, "inserts must land as new files")
    assert(ParquetTable.read(spark, dir).count() ==
      expected.count() + more.count())

    // Empty source: no new version.
    val before = ParquetTable.snapshots(dir).size
    val (z1, z2) = ParquetTable.mergeInto(
      spark, dir, orders.filter(lit(false)), Seq("o_orderkey"))
    assert(z1 == 0L && z2 == 0L && ParquetTable.snapshots(dir).size == before)
  }
}
