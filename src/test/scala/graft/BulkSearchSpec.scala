package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, Similarity}

/** VERDICT r13 directive 2: `searchMulti` collects the probe rows to
  * the driver — right for interactive probe sets, a driver bottleneck
  * for corpus-sized probe batches. `searchBulk` is the set-oriented
  * door: probe→cell assignment stays a distributed pass (only the
  * distinct probed CELL ids — bounded by the cell count — ever reach
  * the driver). Pins that bulk results are BIT-IDENTICAL to the
  * collected path on both dispatch arms (flat and hier-routed) and at
  * nprobe 1 and 2, with the whole corpus as the probe set — the
  * workload the bulk door exists for. */
class BulkSearchSpec extends SparkSuite {

  private def emb = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))

  private def rows(df: DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  private def buildIdx(numCells: Int): String = {
    val dir = graft.tables.TmpDirs.create("graft-bulk").resolve("index").toString
    IvfIndex.build(spark, emb, numCells, dir)
    dir
  }

  test("flat arm: bulk == collected path, corpus-sized probe set, nprobe 1 and 2") {
    val dir = buildIdx(numCells = 16)
    for (np <- Seq(1, 2)) {
      val bulk = rows(IvfIndex.searchBulk(spark, dir, emb, k = 3, nprobe = np))
      val collected = rows(IvfIndex.searchMulti(spark, dir, emb, k = 3, nprobe = np))
      assert(bulk == collected, s"flat nprobe=$np: bulk and collected paths disagree")
      assert(bulk.nonEmpty)
    }
  }

  test("hier arm: bulk == collected path above the dispatch threshold") {
    val k = Similarity.HierAssignThreshold + 16 // 80 cells → two-level routing
    val dir = buildIdx(numCells = k)
    for (np <- Seq(1, 2)) {
      val bulk = rows(IvfIndex.searchBulk(spark, dir, emb, k = 3, nprobe = np))
      val collected = rows(IvfIndex.searchMulti(spark, dir, emb, k = 3, nprobe = np))
      assert(bulk == collected, s"hier nprobe=$np: bulk and collected paths disagree")
      assert(bulk.nonEmpty)
    }
  }

  test("cogrouped hier assignment (the past-broadcast-bound arm) is bit-identical " +
      "to the broadcast routing plan") {
    val k = Similarity.HierAssignThreshold + 16
    val ck = Similarity.hierCoarseK(k).get
    val dir = buildIdx(numCells = k)
    def cells(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_id", "cc").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(1, 2)) {
      val viaBroadcast = cells(IvfIndex.hierAssign(spark, dir, emb, ck, np))
      val viaCogroup = cells(IvfIndex.hierAssign(spark, dir, emb, ck, np, forceCogrouped = true))
      assert(viaBroadcast == viaCogroup,
        s"nprobe=$np: the broadcast-free arm routes differently — the read side " +
          "of the fine-set broadcast bound would silently change results")
      assert(viaBroadcast.nonEmpty)
    }
  }

  test("past-broadcast-bound dispatch: searchMulti and searchBulk route cogrouped " +
      "and return the identical results") {
    val k = Similarity.HierAssignThreshold + 16
    val dir = buildIdx(numCells = k) // built below the bound (broadcast hier arm)
    val probes = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 7)
    val wantMulti = rows(IvfIndex.searchMulti(spark, dir, probes, k = 3, nprobe = 2))
    val wantBulk = rows(IvfIndex.searchBulk(spark, dir, emb, k = 3))
    // Lower the bound so every hier read path takes the past-bound arm
    // (the only way to execute that plumbing without a >2^18-cell
    // fixture — r14 review finding). DynamicVariable scope: every
    // dispatch read is driver-synchronous, so the withValue block
    // covers plan construction AND the collects inside rows().
    Similarity.maxBroadcastFineCentroidsOverride.withValue(Some(8)) {
      assert(rows(IvfIndex.searchMulti(spark, dir, probes, k = 3, nprobe = 2)) == wantMulti,
        "searchMulti's past-bound probe arm disagrees with the broadcast route")
      assert(rows(IvfIndex.searchBulk(spark, dir, emb, k = 3)) == wantBulk,
        "searchBulk's past-bound cogrouped arm disagrees with the broadcast route")
    }
  }

  test("bulk keeps every query's full top-k and never self-matches") {
    val dir = buildIdx(numCells = 16)
    val out = IvfIndex.searchBulk(spark, dir, emb, k = 3)
    assert(out.filter(col("query_id") === col("neighbor_id")).isEmpty)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.length == emb.count().toInt)
    assert(perQuery.forall(_.getLong(1) == 3L))
  }

  test("twin calls: materializing one searchBulk must not release the OTHER " +
      "identical call's pending cache (r15 ADVICE — unique plan tags)") {
    import graft.plans.CacheRelease
    val dir = buildIdx(numCells = 16)
    CacheRelease.releaseAll(spark)
    val base = CacheRelease.pendingCountForTest(spark)
    val a = IvfIndex.searchBulk(spark, dir, emb, k = 3)
    val b = IvfIndex.searchBulk(spark, dir, emb, k = 3) // identical args
    assert(CacheRelease.pendingCountForTest(spark) == base + 2)
    assert(a.count() > 0)
    // The listener bus is async — wait for A's release to land, then
    // assert B's is STILL pending (the r15 sameResult matching released
    // both on the first materialization).
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (CacheRelease.pendingCountForTest(spark) > base + 1 &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(CacheRelease.pendingCountForTest(spark) == base + 1,
      "first materialization released zero or both of the twin caches")
    assert(b.count() > 0) // B still works, then releases itself
    while (CacheRelease.pendingCountForTest(spark) > base &&
        System.nanoTime() < deadline) Thread.sleep(100)
    assert(CacheRelease.pendingCountForTest(spark) == base)
  }

  test("abandoned plans: callers that never materialize are bounded by the " +
      "pending cap, and releaseAll drains the rest (r15 directive 7)") {
    import graft.plans.CacheRelease
    val dir = buildIdx(numCells = 16)
    CacheRelease.releaseAll(spark)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    // MaxPending + 4 bulk plans, none ever materialized: the oldest 4
    // force-release at registration time (their caches unpersist), the
    // registry never exceeds the cap, and the leaked tail drains on the
    // explicit release handle.
    (1 to CacheRelease.MaxPending + 4).foreach { _ =>
      IvfIndex.searchBulk(spark, dir, emb, k = 3)
    }
    assert(CacheRelease.pendingCountForTest(spark) <= CacheRelease.MaxPending)
    CacheRelease.releaseAll(spark)
    assert(CacheRelease.pendingCountForTest(spark) == 0)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- rddsBefore
    while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    assert(leaked().isEmpty, s"abandoned bulk caches still pinned: ${leaked()}")
  }

  test("persist lifecycle: repeated bulk searches leave no net cached blocks " +
      "(r14 directive 5)") {
    val dir = buildIdx(numCells = 16)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // N bulk searches, each materialized once — the API's contract
    // point. The probe-assignment cache must be released after each
    // materialization (listener-driven, async on the SQL listener bus),
    // so the persistent-RDD set returns to the pre-run snapshot instead
    // of growing by one corpus-sized cache per call.
    (1 to 4).foreach { i =>
      assert(IvfIndex.searchBulk(spark, dir, emb, k = 3).count() > 0, s"run $i")
    }
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked().nonEmpty && System.nanoTime() < deadline) Thread.sleep(200)
    assert(leaked().isEmpty,
      s"bulk-search probe caches still pinned after 30s: RDDs ${leaked()}")
  }
}
