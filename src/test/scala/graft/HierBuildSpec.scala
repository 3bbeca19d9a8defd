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
    val dir = java.nio.file.Files.createTempDirectory("graft-hierbuild").toString
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
