package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Operational knobs a 100 TB deployment leans on: bounded streaming
  * catch-up (a backfill must not swallow the whole backlog in one
  * micro-batch) and corrupt-input tolerance (one bad file must not
  * take down the scan when told to skip it). */
class OperationalSpec extends SparkSuite {

  test("maxFilesPerTrigger bounds catch-up micro-batches") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "value")
    val dir = graft.tables.TmpDirs.create("graft-ops").toString
    src.repartition(6).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(s"$dir/in")
    val q = stream.writeStream.format("memory").queryName("bounded")
      .option("checkpointLocation", s"$dir/cp")
      .outputMode("append").start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()

    assert(spark.table("bounded").count() == src.count(), "catch-up must be complete")
    assert(batches.length == 3, // 6 files / 2 per trigger
      s"expected 3 bounded micro-batches, got ${batches.length}")
    val rows = batches.map(_.numInputRows)
    assert(rows.max < src.count(), s"one batch swallowed the backlog: ${rows.toSeq}")
  }

  test("ignoreCorruptFiles skips a poisoned parquet file, keeps the rest") {
    val dir = graft.tables.TmpDirs.create("graft-corrupt").resolve("t").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
    orders.coalesce(4).write.mode("overwrite").parquet(dir)
    // A file with a parquet name but garbage bytes.
    Files.write(Paths.get(dir, "part-99999-poison.c000.snappy.parquet"),
      "this is not parquet at all".getBytes("UTF-8"))

    // Default: the scan fails loudly (corruption is not silently eaten).
    intercept[Exception] {
      spark.read.parquet(dir).count()
    }

    // Opt-in skip: full content of the healthy files survives.
    val prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() == orders.count())
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
  }
}
