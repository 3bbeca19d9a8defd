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

  test("two-level assignment with coarseK == fineK degenerates to flat EXACTLY") {
    // Each fine seed owns itself when the coarse set IS the fine set, so
    // routing adds nothing: hier(K, K) must equal flat(K) bit-for-bit —
    // the identity that pins both levels' tie rules to ivfAssign's.
    val e = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))
    val flat = graft.sim.Similarity.ivfAssign(spark, e, 16)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hier = graft.sim.Similarity.ivfAssignHier(spark, e, 16, 16)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hier == flat)
  }

  test("two-level routing confines the fine choice to the coarse cell's children") {
    val e = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))
    val hier = graft.sim.Similarity.ivfAssignHier(spark, e, 16, 4)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = graft.sim.Similarity.ivfAssign(spark, e, 16)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Routing is an approximation — it may disagree with flat — but
    // every chosen cell is still one of the 16 fine seeds, and the two
    // assignments should agree on a large majority at this scale (the
    // measured routing cost; a total disagreement means broken tie
    // rules, not approximation).
    assert(hier.values.toSet.subsetOf((0L until 16L).toSet))
    val agree = hier.count { case (v, c) => flat(v) == c }
    assert(agree >= (hier.size * 0.5).toInt,
      s"only $agree/${hier.size} agree with flat assignment")
  }
}
