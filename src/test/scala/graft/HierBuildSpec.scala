package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, Kmeans, Similarity}

/** VERDICT r12 directives 1+2: index BUILD must never run the flat
  * O(N·K) cell assignment above the K threshold (with K ∝ N under
  * `autoCells` that is O(N²/125) — the last quadratic on a non-yardstick
  * path), and the two-level routing's fine-set broadcast must carry a
  * real alternative for the regime where it doesn't fit. Pins:
  *  - the dispatch function itself (`hierCoarseK`);
  *  - that a build above the threshold equals the EXPLICIT two-level
  *    assignment (i.e. the flat N×K scan did not decide any cell);
  *  - bit-equality of the broadcast-free cogrouped variant;
  *  - the trained-centroid (`Kmeans.assignAuto`) dispatch;
  *  - the zero-norm/NaN loud-failure guard (ADVICE r12). */
class HierBuildSpec extends SparkSuite {

  private def emb = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))

  private def cellsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hierCoarseK: flat at or below the threshold, ~sqrt(K) above") {
    assert(Similarity.hierCoarseK(16).isEmpty)
    assert(Similarity.hierCoarseK(Similarity.HierAssignThreshold).isEmpty)
    assert(Similarity.hierCoarseK(65).contains(9))   // ceil(sqrt(65))
    assert(Similarity.hierCoarseK(160).contains(13)) // sf1's autoCells
    assert(Similarity.hierCoarseK(1600).contains(40)) // sf10's autoCells
  }

  test("a build above the threshold assigns through the two-level routing") {
    val k = Similarity.HierAssignThreshold + 16 // 80 cells over 500 vectors
    val dir = graft.tables.TmpDirs.create("graft-hierbuild").toString
    IvfIndex.build(spark, emb, numCells = k, dir)
    val built = cellsOf(
      spark.read.parquet(s"$dir/cells").withColumn("cell", col("cell").cast("long")))
    val ck = Similarity.hierCoarseK(k).get
    val explicitHier = cellsOf(Similarity.ivfAssignHier(spark, emb, k, ck))
    assert(built == explicitHier,
      "build above the K threshold must route exactly like ivfAssignHier " +
        "(a flat N×K scan deciding any cell breaks this equality whenever " +
        "routing and flat disagree)")
    // The index stays searchable end-to-end on the routed cells.
    val probes = emb.filter(col("vec_id") < 3)
    val hits = IvfIndex.search(spark, dir, probes, k = 5)
    assert(hits.groupBy("query_id").count().collect().forall(_.getLong(1) == 5L))
  }

  test("cogrouped (broadcast-free) hier assignment is bit-identical to the broadcast one") {
    val a = cellsOf(Similarity.ivfAssignHier(spark, emb, 16, 4))
    val b = cellsOf(Similarity.ivfAssignHierCogrouped(spark, emb, 16, 4))
    assert(a == b)
    // And with cosines: full-row equality, not just the cell choice.
    val ra = Similarity.ivfAssignHier(spark, emb, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rb = Similarity.ivfAssignHierCogrouped(spark, emb, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ra == rb)
  }

  test("trained-centroid assignment dispatches two-level above the threshold") {
    val k = Similarity.HierAssignThreshold + 16
    val cs = Kmeans.seedCentroids(emb, k)
    val auto = cellsOf(Kmeans.assignAuto(spark, emb, cs))
    val explicitHier = cellsOf(
      Kmeans.assignHier(spark, emb, cs, Similarity.hierCoarseK(k).get))
    assert(auto == explicitHier)
    // Below the threshold the dispatch is the flat (exactly pinned) path.
    val csSmall = Kmeans.seedCentroids(emb, 16)
    assert(cellsOf(Kmeans.assignAuto(spark, emb, csSmall)) ==
      cellsOf(Kmeans.assign(spark, emb, csSmall)))
  }

  test("trained two-level with coarseK == K degenerates to flat exactly") {
    val cs = Kmeans.seedCentroids(emb, 16)
    assert(cellsOf(Kmeans.assignHier(spark, emb, cs, 16)) ==
      cellsOf(Kmeans.assign(spark, emb, cs)))
  }

  test("incremental append == from-scratch rebuild ABOVE the dispatch threshold (r13 review)") {
    val k = Similarity.HierAssignThreshold + 16
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val incDir = graft.tables.TmpDirs.create("graft-hierinc").toString
    val fullDir = graft.tables.TmpDirs.create("graft-hierfull").toString
    IvfIndex.build(spark, base, numCells = k, incDir)
    IvfIndex.appendVectors(spark, incDir, delta)
    IvfIndex.build(spark, emb, numCells = k, fullDir)
    def cells(d: String) = cellsOf(
      spark.read.parquet(s"$d/cells").withColumn("cell", col("cell").cast("long")))
    assert(cells(incDir) == cells(fullDir),
      "a flat delta argmax would place hier-disagreeing vectors in different cells")
  }

  test("probes route like the build: each indexed vector finds its OWN cell (r13 review)") {
    val k = Similarity.HierAssignThreshold + 16
    val dir = graft.tables.TmpDirs.create("graft-hierprobe").toString
    IvfIndex.build(spark, emb, numCells = k, dir)
    val stored = cellsOf(
      spark.read.parquet(s"$dir/cells").withColumn("cell", col("cell").cast("long")))
    // Self-consistency: a probe equal to an indexed vector must scan the
    // cell that vector was PLACED in — the property a flat probe argmax
    // over a hier-routed build silently loses on every routing
    // disagreement. Search can only return a same-cell neighbor, so
    // finding vec itself (hamming of floats == equality) proves the
    // probe walked the build's route; here we assert via the top-1 of a
    // probe set drawn from the corpus.
    val probes = emb.filter(col("vec_id") % 97 === 3) // a spread sample
    val hits = IvfIndex.searchMulti(spark, dir, probes, k = 1, nprobe = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Search excludes the probe itself, so only probes whose cell holds
    // at least one OTHER member can prove the route; singleton-cell
    // probes legitimately return nothing.
    val cellSizes = stored.values.groupBy(identity).map { case (c, v) => c -> v.size }
    val provable = probes.select("vec_id").collect().map(_.getLong(0))
      .filter(q => cellSizes(stored(q)) >= 2)
    assert(provable.nonEmpty, "sample must cover at least one multi-member cell")
    provable.foreach { q =>
      assert(hits.contains(q), s"probe $q scanned an empty cell — route mismatch")
      assert(stored(hits(q)) == stored(q),
        s"probe $q's top hit ${hits(q)} lives in cell ${stored(hits(q))} but " +
          s"$q was placed in ${stored(q)} — the probe walked a different route")
    }
  }

  test("exact-duplicate seeds degrade gracefully, never abort or mis-route (r13 review)") {
    val s = spark
    import s.implicits._
    val dim = 4
    // Seeds 0 and 1 are bit-identical: under the tie rule seed 1 owns
    // nothing and is unreachable — pre-r13 this aborted the assignment.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))) ++
      (4L until 40L).map(i => (i, Array.tabulate(dim)(d => (1.0f + i % 7 + d))))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.ivfAssignHier(s, df, 4, 2)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == vecs.size)
    // Coarse seed 1 owns nothing (its twin 0 wins every tie) -> the
    // routable coarse set collapses to {0}, which owns ALL fine seeds,
    // so the two-level result degenerates to the flat assignment.
    val flat = cellsOf(Similarity.ivfAssign(s, df, 4))
    assert(out == flat, "collapsed routing must equal flat assignment")
    assert(out(1L) == 0L, "the duplicate's tie goes to the lower id")
    val cog = Similarity.ivfAssignHierCogrouped(s, df, 4, 2)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cog == out, "cogrouped variant must mirror the broadcast one bit-for-bit")
    // Trained path: ALL-duplicate centroids must not abort assignment
    // (pre-r13 the ownership require crashed fit mid-training).
    val cs = (0L until 4L).map(i => i -> Array(1.0, 2.0, 3.0, 4.0)).toArray
    val asg = Kmeans.assignHier(s, df, cs, 2)
      .select("cell").collect().map(_.getLong(0))
    assert(asg.length == vecs.size && asg.forall(_ == 0L),
      "all-duplicate centroids still assign, to the lowest id")
  }

  test("a zero-norm embedding fails LOUDLY, naming the vector (ADVICE r12)") {
    val s = spark
    import s.implicits._
    val dim = 4
    val good = (0L until 8L).map(i =>
      (i, Array.tabulate(dim)(d => (1.0f + i + d))))
    val bad = Seq((99L, Array.fill(dim)(0.0f)))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.ivfAssignHier(spark, df, 4, 2).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("vec_id=99"), messages(e))
    val e2 = intercept[Exception] {
      Similarity.ivfAssignHierCogrouped(spark, df, 4, 2).collect()
    }
    assert(messages(e2).contains("vec_id=99"), messages(e2))
  }
}
