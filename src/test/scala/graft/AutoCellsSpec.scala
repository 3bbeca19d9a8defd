package graft

import graft.sim.IvfIndex

/** VERDICT r6 directive 5: the IVF/semdedup cell count must scale with
  * the corpus, not sit at a constant 16. Pins the `autoCells` bound at
  * two scales — mean cell size stays ≤ TargetCellSize once N outgrows
  * the 16-cell floor — and that the oracle scales still land on the 16
  * seed centroids the DuckDB duals hard-code. */
class AutoCellsSpec extends SparkSuite {

  test("oracle scales keep the 16 cells the DuckDB duals pin") {
    assert(IvfIndex.autoCells(500) == 16)  // sf0.001 / sf0.01 embeddings
    assert(IvfIndex.autoCells(2000) == 16) // sf0.1 embeddings
  }

  test("beyond the floor, K grows so mean cell size stays bounded") {
    for (n <- Seq(20000L, 200000L, 2000000L)) { // sf1 smoke and up
      val k = IvfIndex.autoCells(n)
      assert(k > 16, s"N=$n should outgrow the 16-cell floor (got $k)")
      assert(n.toDouble / k <= IvfIndex.TargetCellSize,
        s"N=$n, K=$k: mean cell ${n.toDouble / k} exceeds target ${IvfIndex.TargetCellSize}")
      // ...without over-sharding: ceil semantics waste at most one cell.
      assert(k <= n / IvfIndex.TargetCellSize + 1)
    }
  }

  test("assignment uses every seed cell at the small scale") {
    val e = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))
    val k = IvfIndex.autoCells(e.count())
    val cells = graft.sim.Similarity.ivfAssign(spark, e, k)
      .select("cell").distinct().count()
    assert(k == 16 && cells == 16)
  }
}
