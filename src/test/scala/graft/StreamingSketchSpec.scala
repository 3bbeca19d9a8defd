package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The custom TypedImperativeAggregates must run INSIDE Structured
  * Streaming state: a watermarked windowed kmv_distinct over a replayed
  * event stream has to finalize the same per-window sketch state as the
  * batch aggregation — sketch merges happen in the state store across
  * micro-batches, not just map-side. */
class StreamingSketchSpec extends SparkSuite {

  test("windowed kmv_distinct sketch state merges across micro-batches") {
    val src = graft.queries.EventsQueries.events(spark, sf0001)
      .select(col("ts"),
        expr(graft.text.TextAnalysis.hash60Spark("CAST(user_id AS STRING)")).as("h"))
    val dir = graft.tables.TmpDirs.create("graft-sks").toString
    src.repartition(4).write.mode("overwrite").parquet(s"$dir/in")

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "7 days").as("w"))
      .agg(expr("kmv_distinct(h, 64)").as("est"), count(lit(1)).as("n"))
      .select(col("w.start").as("win"), col("est"), col("n"))

    val stream = spark.readStream.schema(
        src.schema).parquet(s"$dir/in")
      .withWatermark("ts", "7 days")
    val q = agg(stream)
      .writeStream.format("memory").queryName("kmv_win").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val streamed = spark.table("kmv_win")
      .collect().map(r => (r.get(0).toString, r.get(1), r.getLong(2))).toSet
    val batch = agg(src)
      .collect().map(r => (r.get(0).toString, r.get(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty, "no windows finalized")
    // Finalized windows must carry the identical sketch verdicts; the
    // trailing (< watermark delay) windows may be withheld, never wrong.
    assert(streamed.subsetOf(batch),
      s"streaming sketch diverged from batch: ${streamed.diff(batch)}")
    assert(streamed.size >= batch.size / 2,
      s"too few windows finalized: ${streamed.size} of ${batch.size}")
  }
}
