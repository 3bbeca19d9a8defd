package graft

import org.apache.spark.sql.functions._

import graft.sim.{IvfIndex, Similarity}

/** r14 directive 6 — cross-coarse multiprobe mechanics: at nprobe >= 2
  * the hier probe routing must rank fine cells JOINTLY across the
  * probe's top-[[Similarity.HierProbeCoarse]] owning coarse cells,
  * while nprobe = 1 stays the pure build route (HierBuildSpec's
  * self-consistency contract). Verified against a spec-local REFERENCE
  * implementation derived straight from the persisted centroids —
  * independent of every production routing code path.
  *
  * Outcome note (the honest r15 measurement, sweep in the DuckDB dual
  * of sim_ivf_hier_recall_x2): on the driver corpus at forced K=80 the
  * r14 miss decomposes into one cross-recoverable probe (nprobe=2
  * lifts 0.80 → 0.8667 mean recall@3) and one PLACEMENT-side miss
  * (probe 2 is itself a seed centroid; its true neighbors' cells rank
  * >10 in any probe-side fine ordering — coarse=3/nprobe=3 still
  * measures 0.8667, and no probe-side knob short of nprobe≈15 of 80
  * reaches them). Cross-coarse is kept because boundary misses are the
  * classic IVF recall hole the within-coarse ranking can never close;
  * this spec pins that the implementation actually pools across the
  * boundary when the geometry calls for it.
  */
class HierCrossProbeSpec extends SparkSuite {

  private def emb = spark.read.parquet(graft.SparkSessions.tablePath(sf0001, "embeddings"))

  private val k = Similarity.HierAssignThreshold + 16 // 80 → hier routing
  private val ck = Similarity.hierCoarseK(k).get

  private lazy val dir: String = {
    val d = graft.tables.TmpDirs.create("graft-xprobe").resolve("index").toString
    IvfIndex.build(spark, emb, k, d)
    d
  }

  /** (routable coarse, fine ownership) derived from the persisted
    * centroids by the written rules alone. */
  private lazy val (coarseRef, childrenRef) = {
    val cents = spark.read.parquet(s"$dir/centroids")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val coarse = cents.take(ck)
    def best(embv: Array[Float], cands: Array[(Long, Array[Float])]): Long =
      cands.map { case (id, ce) => (id, Similarity.cosineJvm(embv, ce)) }
        .minBy { case (id, cos) => (-cos, id) }._1
    val children = cents.groupBy { case (_, e) => best(e, coarse) }
    (coarse.filter { case (id, _) => children.contains(id) }, children)
  }

  private def referenceCells(embv: Array[Float], coarseProbe: Int, nprobe: Int): Seq[Long] =
    coarseRef.map { case (id, ce) => (id, Similarity.cosineJvm(embv, ce)) }
      .sortBy { case (id, cos) => (-cos, id) }.take(coarseProbe)
      .flatMap { case (cc, _) => childrenRef(cc) }
      .map { case (f, fe) => (f, Similarity.cosineJvm(embv, fe)) }
      .sortBy { case (id, cos) => (-cos, id) }.take(nprobe)
      .map(_._1).toSeq

  private def assigned(nprobe: Int): Map[Long, Set[Long]] =
    IvfIndex.hierAssign(spark, dir, emb, ck, nprobe)
      .select("vec_id", "cc").collect()
      .groupBy(_.getLong(0)).map { case (v, rs) => v -> rs.map(_.getLong(1)).toSet }

  test("nprobe=2 routes every vector to the reference joint top-2 over its top-2 coarse") {
    val got = assigned(nprobe = 2)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (v, e) =>
      val want = referenceCells(e, Similarity.HierProbeCoarse, 2).toSet
      assert(got(v) == want, s"vec $v: got ${got(v)}, reference $want")
    }
    // The test has teeth only if some probe's two cells SPAN two coarse
    // owners — otherwise joint and within-coarse ranking coincide.
    val owner: Map[Long, Long] = childrenRef.toSeq
      .flatMap { case (c, fs) => fs.map { case (f, _) => f -> c } }.toMap
    val spanning = vecs.count { case (_, e) =>
      referenceCells(e, Similarity.HierProbeCoarse, 2).map(owner).distinct.size == 2
    }
    assert(spanning > 0, "fixture degenerate: no probe pools across a coarse boundary")
    info(s"$spanning/${vecs.length} probes pooled across a coarse boundary")
  }

  test("boundary probes (the r16 xb fixture): the REAL searchMulti doors measure " +
      "recall@2 nprobe=1 < nprobe=2, with nprobe=2 >= 0.95") {
    // Synthesize sim_ivf_hier_recall_xb's probes from the SPEC-LOCAL
    // reference routing (independent of production code): for each fine
    // centroid f1, f2 = the most-f1-like fine centroid owned by f1's
    // second coarse cell, probe = float(0.75·f1 + 0.25·f2), non-seed id.
    val fines: Array[(Long, Array[Float])] =
      childrenRef.values.flatten.toArray.sortBy(_._1)
    def rankedCoarse(e: Array[Float]): Seq[Long] =
      coarseRef.map { case (id, ce) => (id, Similarity.cosineJvm(e, ce)) }
        .sortBy { case (id, cos) => (-cos, id) }.map(_._1).toSeq
    val probes: Array[(Long, Array[Float])] = fines.map { case (f1, e1) =>
      val c2 = rankedCoarse(e1)(1)
      val (_, e2) = childrenRef(c2)
        .map { case (f, fe) => ((f, fe), Similarity.cosineJvm(e1, fe)) }
        .minBy { case ((f, _), cos) => (-cos, f) }._1
      val blend = e1.indices.map(i =>
        (0.75d * e1(i) + 0.25d * e2(i)).toFloat).toArray
      (1000000L + f1, blend)
    }
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val probesDf = spark.createDataFrame(
      java.util.Arrays.asList(probes.map { case (id, e) => SRow(id, e.toSeq) }: _*), schema)
    // Brute truth, spec-local: top-2 by (cos DESC, id ASC) over the corpus.
    val corpus = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val truth: Map[Long, Set[Long]] = probes.map { case (qid, qe) =>
      qid -> corpus.map { case (v, ve) => (v, Similarity.cosineJvm(qe, ve)) }
        .sortBy { case (v, cos) => (-cos, v) }.take(2).map(_._1).toSet
    }.toMap
    def meanRecall(nprobe: Int): Double = {
      val got = IvfIndex.searchMulti(spark, dir, probesDf, k = 2, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      probes.map { case (qid, _) =>
        truth(qid).intersect(got.getOrElse(qid, Set.empty)).size / 2.0
      }.sum / probes.length
    }
    val r1 = meanRecall(1)
    val r2 = meanRecall(2)
    info(f"boundary-probe recall@2: nprobe=1 $r1%.4f, nprobe=2 $r2%.4f (${probes.length} probes)")
    assert(r1 < r2, s"no cross-coarse gap: nprobe=1 $r1 vs nprobe=2 $r2")
    assert(r2 >= 0.95, s"nprobe=2 recall@2 $r2 below the 0.95 fixture target")
  }

  test("nprobe=1 stays the pure build route (single-coarse argmax)") {
    val got = assigned(nprobe = 1)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    vecs.foreach { case (v, e) =>
      val want = referenceCells(e, coarseProbe = 1, nprobe = 1).toSet
      assert(got(v) == want, s"vec $v: got ${got(v)}, build route $want")
    }
  }
}
