package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sim.IvfIndex

/** Streaming maintenance of the persisted IVF index: a foreachBatch
  * sink appends each micro-batch of new vectors to the existing cell
  * partitions (IvfIndex.appendVectors — broadcast centroid assignment,
  * per-cell appends, centroids untouched). After the stream drains, a
  * search over the streamed index must be bit-identical to a
  * from-scratch rebuild over the full corpus — the streaming path IS
  * the batch path applied per trigger. */
class StreamingIvfSpec extends SparkSuite {

  test("foreachBatch appendVectors: streamed index == from-scratch rebuild") {
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    // Base holds all 16 seed vectors so both indexes share the exact
    // centroid set; the rest arrives as a stream in several files.
    val base = corpus.filter(col("vec_id") < 100)
    val delta = corpus.filter(col("vec_id") >= 100)

    val root = graft.tables.TmpDirs.create("graft-sivf").toString
    val streamDir = s"$root/streamed"
    IvfIndex.build(spark, base, numCells = 16, streamDir)

    delta.repartition(4).write.mode("overwrite").parquet(s"$root/in")
    val q = spark.readStream.schema(corpus.schema).parquet(s"$root/in")
      .writeStream
      .option("checkpointLocation", s"$root/cp")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IvfIndex.appendVectors(spark, streamDir, batch)
      }
      .start()
    q.processAllAvailable(); q.stop()

    val fullDir = s"$root/rebuilt"
    IvfIndex.build(spark, corpus, numCells = 16, fullDir)

    val probes = corpus.filter(col("vec_id") < 10)
    def res(dir: String) = IvfIndex.search(spark, dir, probes, 3)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(res(streamDir) == res(fullDir),
      "stream-maintained index must search identically to a rebuild")

    // No vector lost or duplicated across the micro-batch appends.
    val indexed = spark.read.parquet(s"$streamDir/cells").select("vec_id")
    assert(indexed.count() == corpus.count())
    assert(indexed.distinct().count() == corpus.count())
  }
}
