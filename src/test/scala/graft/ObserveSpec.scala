package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** `Dataset.observe` — Spark's native in-flight metrics hook (the
  * data-quality / pipeline-observability counters a production ingest
  * exposes without a second pass over the data). Batch metrics surface
  * through QueryExecution.observedMetrics; streaming metrics ride every
  * StreamingQueryProgress. Complements the TxBuffer progress hook: that
  * one reports stateful-operator internals, observe() reports per-batch
  * dataflow counters declaratively. */
class ObserveSpec extends SparkSuite {

  test("batch observe: null/negative counters computed in-flight, zero extra passes") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "value")
    val observed = src.observe(
      "ingest_quality",
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
      sum(when(col("value") < 0, 1L).otherwise(0L)).as("n_negative"))
    // collect(), not count(): count() builds its OWN QueryExecution, so
    // the metrics would attach to that plan instead of this one.
    val total = observed.collect().length.toLong

    val m = observed.queryExecution.observedMetrics("ingest_quality")
    assert(m.getAs[Long]("n_rows") == total)
    val expectedNulls = src.filter(col("value").isNull).count()
    assert(m.getAs[Long]("n_null_value") == expectedNulls)
    assert(m.getAs[Long]("n_negative") == src.filter(col("value") < 0).count())
  }

  test("streaming observe: counters arrive on every progress, totals match the data") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select("event_id", "ts", "event_type", "value")
    val dir = graft.tables.TmpDirs.create("graft-observe").toString
    src.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(src.schema).parquet(s"$dir/in")
      .observe("batch_quality",
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"))
    val q = stream.writeStream.format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/cp")
      .start()
    q.processAllAvailable(); q.stop()

    val progresses = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("batch_quality")))
    assert(progresses.nonEmpty, "no progress carried the observed metrics")
    assert(progresses.map(_.getAs[Long]("n_rows")).sum == src.count(),
      "observed row counts across batches must total the input")
    assert(progresses.map(_.getAs[Long]("n_null_value")).sum ==
      src.filter(col("value").isNull).count())
  }
}
