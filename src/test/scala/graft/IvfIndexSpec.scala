package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sim.IvfIndex

/** The persisted IVF index must return bit-identical results to the
  * assignment-time IVF search (the oracle-checked `sim_ivf_topk` path)
  * while reading ONLY the probed cell partitions from disk. */
class IvfIndexSpec extends SparkSuite {

  test("search over the persisted index == sim_ivf_topk, with cell partitions pruned") {
    val dir = Files.createTempDirectory("graft-ivf").resolve("index").toString
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
    IvfIndex.build(spark, corpus, numCells = 16, dir)

    val probes = corpus.filter(col("vec_id") < 5)
    val got = IvfIndex.search(spark, dir, probes, k = 3)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq

    // Reference: the oracle-gated query computes the same search without
    // the persisted index.
    val expected = SparkEntry.queries("sim_ivf_topk")(spark, sf0001)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(got == expected, "persisted-index search must equal the inline IVF search")

    // Pruning: the candidate scan must carry a partition filter on cell
    // and read fewer files than the whole cells tree holds.
    val cands = spark.read.parquet(s"$dir/cells").filter(col("cell").isin(0, 1))
    cands.collect()
    val scan = cands.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PartitionFilters").contains("cell"),
      s"scan metadata: ${scan.metadata}")
    val total = graft.streaming.Compaction.dataFiles(s"$dir/cells").size
    assert(scan.metrics("numFiles").value < total,
      s"read ${scan.metrics("numFiles").value} of $total files — no pruning")
  }
}
