package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.Compaction
import graft.tables.ZOrder

/** Z-order clustering: the Morton interleave must match the JVM
  * reference bit-for-bit, and a z-ordered rewrite must leave every
  * output file with a narrow min-max span in EVERY clustered column —
  * the parquet data-skipping layout (SURVEY §2.3 Q16 maintenance;
  * reference: db/table_maintenance.sql OPTIMIZE guidance). */
class ZOrderSpec extends SparkSuite {

  test("zvalue column matches the JVM interleave reference") {
    val s = spark
    import s.implicits._
    val bits = 8
    val rows = Seq((0L, 0L), (255L, 255L), (3L, 1L), (128L, 64L), (200L, 17L), (1L, 254L))
    // Bounds 0..255 with bits=8 make the normalized rank the value itself.
    val df = rows.toDF("x", "y")
    val bs = Seq(ZOrder.ColBounds("x", 0, 255), ZOrder.ColBounds("y", 0, 255))
    val got = df.withColumn("z", ZOrder.zvalue(bs, bits))
      .select("x", "y", "z").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.zvalueJvm(Seq(x, y), bits), s"($x,$y)")
    }
    // Known value: x=3 (…11) occupies even bits, y=1 (…01) odd bits.
    assert(ZOrder.zvalueJvm(Seq(3L, 1L), bits) == 7L)
  }

  test("degenerate bounds (constant or null column) rank to zero, no division by zero") {
    val s = spark
    import s.implicits._
    val df = Seq((5L, Option.empty[Long]), (5L, None), (5L, None)).toDF("c", "n")
    val bs = ZOrder.bounds(df, Seq("c", "n"))
    assert(bs.forall(b => b.min == b.max))
    val zs = df.withColumn("z", ZOrder.zvalue(bs)).select("z").collect().map(_.getLong(0))
    assert(zs.forall(_ == 0L))
  }

  test("zorderPartitions clusters within each partition, layout survives") {
    val dir = graft.tables.TmpDirs.create("graft-zorder-part").resolve("orders").toString
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_custkey", "o_totalprice")
    orders.repartition(6).write.partitionBy("o_orderstatus").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val nParts = Compaction.partitionDirs(dir).size
    assert(nParts == 3)

    intercept[IllegalArgumentException]( // the flat entry must refuse the tree

      Compaction.zorder(spark, dir, Seq("o_custkey", "o_totalprice")))
    val perLeaf = Compaction.zorderPartitions(spark, dir, Seq("o_custkey", "o_totalprice"))
    assert(perLeaf.size == 3 && perLeaf.forall(_._2.compacted))
    assert(Compaction.partitionDirs(dir).size == 3, "layout must survive")
    assert(spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq == before)
  }

  test("zorder rewrite clusters both columns and preserves content") {
    val dir = graft.tables.TmpDirs.create("graft-zorder").resolve("orders").toString
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // Fragment in key order so custkey/totalprice start fully unclustered.
    orders.repartition(16).write.parquet(dir)

    def fingerprint() =
      spark.read.parquet(dir).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val before = fingerprint()
    val nFilesBefore = Compaction.dataFiles(dir).size

    // Small target so the rewrite produces several files to measure.
    val bytes = Compaction.dataFiles(dir).map(Files.size(_)).sum
    val stats = Compaction.zorder(spark, dir, Seq("o_custkey", "o_totalprice"),
      targetBytes = bytes / 8)
    assert(stats.compacted && stats.filesBefore == nFilesBefore)
    val files = Compaction.dataFiles(dir)
    assert(files.size == stats.filesAfter && files.size >= 4)
    assert(fingerprint() == before, "content must be identical after the z-order rewrite")

    // Clustering quality: mean per-file min-max span, normalized by the
    // global span, must shrink far below the ~1.0 of a random layout in
    // BOTH dimensions (this is exactly what parquet footer stats prune on).
    def meanSpan(colName: String): Double = {
      val g = spark.read.parquet(dir)
        .agg(min(col(colName).cast("double")), max(col(colName).cast("double"))).head()
      val global = g.getDouble(1) - g.getDouble(0)
      val spans = files.map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min(col(colName).cast("double")), max(col(colName).cast("double"))).head()
        (r.getDouble(1) - r.getDouble(0)) / global
      }
      spans.sum / spans.size
    }
    val spanCust = meanSpan("o_custkey")
    val spanPrice = meanSpan("o_totalprice")
    assert(spanCust < 0.75, s"o_custkey mean normalized file span $spanCust")
    assert(spanPrice < 0.75, s"o_totalprice mean normalized file span $spanPrice")
    // And it genuinely interleaves: neither column monopolizes the sort
    // (a plain sort on one column would leave the other near 1.0).
    assert(spanCust + spanPrice < 1.2, s"joint span $spanCust + $spanPrice")
  }
}
