package graft

import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable
import graft.tables.GraftSql

/** OPTIMIZE ... WHERE: only files with matching rows compact; cold
  * files carry forward by identity (same names — hard links); data is
  * byte-identical; history stays time-travelable; no-match is a
  * version-preserving no-op. */
class OptimizeWhereSpec extends SparkSuite {

  private def mk(): (String, String) = {
    val dir = graft.tables.TmpDirs.create("graft-ows").toString + "/t"
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    ParquetTable.swap(spark, orders.repartitionByRange(8, col("o_orderkey")), dir)
    val nm = s"ows_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, nm, dir, Seq("o_orderkey"))
    (nm, dir)
  }

  private def files(dir: String): Set[String] = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(ParquetTable.currentPath(dir))
    val ls = java.nio.file.Files.list(p)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
    finally ls.close()
  }

  test("scoped compaction rewrites only the matching window, preserves data and history") {
    val (nm, dir) = mk()
    val before = files(dir)
    val total = spark.read.parquet(ParquetTable.currentPath(dir)).count()
    val sumKeys = spark.read.parquet(ParquetTable.currentPath(dir))
      .agg(sum("o_orderkey")).head.getLong(0)

    val r = GraftSql.sql(spark, s"OPTIMIZE $nm WHERE o_orderkey < 2000").collect().head
    val compacted = r.getAs[Any]("n_files_compacted").toString.toLong
    assert(compacted > 0 && compacted < before.size,
      s"expected a strict subset compacted, got $compacted of ${before.size}")

    val after = files(dir)
    // Untouched files carry forward BY NAME (hard links, zero copy).
    val untouched = before.intersect(after)
    assert(untouched.size == (before.size - compacted).toInt,
      "every non-matching file must survive under its own name")
    // Data identical.
    val now = spark.read.parquet(ParquetTable.currentPath(dir))
    assert(now.count() == total)
    assert(now.agg(sum("o_orderkey")).head.getLong(0) == sumKeys)
    // Prior version still time-travelable.
    assert(ParquetTable.snapshots(dir).size >= 2)

    // No-match predicate: version unchanged, zero compacted.
    val v = ParquetTable.currentPath(dir)
    val r2 = GraftSql.sql(spark, s"OPTIMIZE $nm WHERE o_orderkey < -1").collect().head
    assert(r2.getAs[Any]("n_files_compacted").toString.toLong == 0)
    assert(ParquetTable.currentPath(dir) == v, "a no-op must not commit a version")

    // Scoped ZORDER variant also preserves data.
    val r3 = GraftSql.sql(spark,
      s"OPTIMIZE $nm WHERE o_orderkey >= 12000 ZORDER BY (o_totalprice)").collect().head
    assert(r3.getAs[Any]("n_files_compacted").toString.toLong > 0)
    val now3 = spark.read.parquet(ParquetTable.currentPath(dir))
    assert(now3.count() == total)
  }
}
