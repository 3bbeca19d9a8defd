package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.dedup.Dedup

/** The sampled triangle estimator (r13 directive 1): below the edge
  * target the dispatch keeps p = 1 and the estimate IS the exact count;
  * above it the deterministic hash sample yields a reproducible DOULION
  * estimate whose error is MEASURED here on a clique-heavy graph (the
  * near-dup graph shape the operator exists for).
  */
class TriangleSampleSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  /** Canonical (a < b) edge list of `k` disjoint cliques of size `m`,
    * plus a sparse chain between cliques (chain edges close no
    * triangles — the exact count is k * C(m,3)). */
  private def cliqueGraph(k: Int, m: Int) = {
    val rows = (0 until k).flatMap { c =>
      val base = c.toLong * m
      val clique = for {
        i <- 0 until m; j <- (i + 1) until m
      } yield Row(base + i, base + j)
      val chain = if (c + 1 < k) Seq(Row(base + m - 1, base + m)) else Seq.empty
      clique ++ chain
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def tri(m: Int): Long = m.toLong * (m - 1) * (m - 2) / 6

  test("p = 1 below the target: the sampled row IS the exact count") {
    val edges = cliqueGraph(k = 3, m = 10) // 3*45 + 2 chain = 137 edges
    val exact = Dedup.triangleCount(edges).head()
    val got = Dedup.triangleCountSampled(edges, targetEdges = 1000000L).head()
    assert(exact.getAs[Long]("n_triangles") == 3 * tri(10))
    assert(got.getAs[Double]("n_triangles_est") == (3 * tri(10)).toDouble)
    assert(got.getAs[Long]("n_triangles_sampled") == 3 * tri(10))
    assert(got.getAs[Long]("n_edges_sampled") == 137L)
    assert(got.getAs[Long]("n_edges_total") == 137L)
  }

  test("sampling tier: deterministic, bounded error on a clique-heavy graph") {
    // 8 cliques of 25 → 8·C(25,2) = 2400 clique edges + 7 chain = 2407
    // edges, 8 * C(25,3) = 18400 triangles. target 700 → thr =
    // 10^6·700/2407 = 290818, p ≈ 0.291, E[kept triangles] ≈ 453 —
    // enough survivors for a tight estimate.
    val edges = cliqueGraph(k = 8, m = 25)
    val exact = 8 * tri(25)
    val a = Dedup.triangleCountSampled(edges, targetEdges = 700L).head()
    val b = Dedup.triangleCountSampled(edges, targetEdges = 700L).head()
    assert(a == b, "hash sampling must be run-deterministic")
    assert(a.getAs[Long]("n_edges_total") == 2407L)
    val kept = a.getAs[Long]("n_edges_sampled")
    assert(kept > 0 && kept < 2407L, s"sample must bind: kept=$kept")
    val est = a.getAs[Double]("n_triangles_est")
    val relErr = math.abs(est - exact) / exact
    assert(relErr < 0.25,
      s"estimate $est vs exact $exact: rel err $relErr (p binds, survivors ~500)")
  }

  test("threshold rounding to zero refuses loudly") {
    val edges = cliqueGraph(k = 2, m = 5)
    val e = intercept[IllegalArgumentException] {
      // 21 edges, target 0 → thr = 0: nothing could survive.
      Dedup.triangleCountSampled(edges, targetEdges = 0L)
    }
    assert(e.getMessage.contains("threshold"))
  }
}
