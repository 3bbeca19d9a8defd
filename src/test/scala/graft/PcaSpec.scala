package graft

import org.apache.spark.sql.functions._

import graft.sim.Pca

/** The quantized-Gram + power-iteration component: Gram exactness vs a
  * local fold, symmetry, unit norm, the sign convention, and
  * determinism across runs (the property the hash gate needs). */
class PcaSpec extends SparkSuite {

  private val dim = 64
  private def emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("quantizedGram == local single-threaded fold, and is symmetric") {
    val sub = emb.filter(col("vec_id") < 20)
    val gram = Pca.quantizedGram(spark, sub, dim)
    val local = sub.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    for (i <- 1 to dim; j <- i to dim) {
      var s = 0L
      local.foreach { v =>
        s += math.floor(v(i - 1).toDouble * v(j - 1).toDouble * 1e9).toLong }
      assert(gram((i, j)) == s, s"gram($i,$j)")
      assert(gram((i, j)) == gram((j, i)), s"symmetry at ($i,$j)")
    }
  }

  test("top component: unit norm, positive leading loading, 64 rows, deterministic") {
    val n = emb.count()
    val g1 = Pca.quantizedGram(spark, emb, dim)
    val c1 = Pca.topComponent(g1, dim, n, 8)
    val c2 = Pca.topComponent(Pca.quantizedGram(spark, emb, dim), dim, n, 8)
    assert(c1 == c2, "iteration must be bit-deterministic across runs")
    assert(c1.size == dim && c1.map(_._1) == (1 to dim))
    // normalization divides by a 1e-9-grain QUANTIZED norm, so unit
    // length holds to the quantization error (~d·grain/‖y‖), not to ulps
    val norm2 = c1.map { case (_, v) => v * v }.sum
    assert(math.abs(norm2 - 1.0) < 1e-3, s"unit norm, got $norm2")
    val lead = c1.minBy { case (i, v) => (-math.abs(v), i) }
    assert(lead._2 >= 0, s"sign convention: leading loading positive, got $lead")
  }

  test("deflated second component: deterministic, unit-ish norm, near-orthogonal to PC1") {
    val n = emb.count()
    val g = Pca.quantizedGram(spark, emb, dim)
    val (pc1, pc2, lam) = Pca.topTwoComponents(g, dim, n, 24)
    val (pc1b, pc2b, lamb) = Pca.topTwoComponents(g, dim, n, 24)
    assert(pc1 == pc1b && pc2 == pc2b && lam == lamb, "bit-deterministic")
    assert(lam > 0.0, s"top eigenvalue of a Gram matrix is positive, got $lam")
    val n2 = pc2.map { case (_, v) => v * v }.sum
    assert(math.abs(n2 - 1.0) < 1e-3, s"unit norm pc2, got $n2")
    val dot = pc1.zip(pc2).map { case ((_, a), (_, b)) => a * b }.sum
    assert(math.abs(dot) < 0.05,
      s"deflation should leave pc2 near-orthogonal to pc1, dot=$dot")
    assert(pc1 == Pca.topComponent(g, dim, n, 24),
      "pc1 from the pair API must equal the single-component API")
  }

  test("power iteration approaches a fixed direction of the normalized Gram") {
    val n = emb.count()
    val g = Pca.quantizedGram(spark, emb, dim)
    val x = Pca.topComponent(g, dim, n, 8).map(_._2).toArray
    val gd = Array.tabulate(dim, dim)((i, j) => g((i + 1, j + 1)).toDouble / 1e9 / n)
    val y = Array.tabulate(dim)(i => (0 until dim).map(j => gd(i)(j) * x(j)).sum)
    val yn = math.sqrt(y.map(v => v * v).sum)
    val cos = math.abs(x.indices.map(i => x(i) * y(i) / yn).sum)
    assert(cos > 0.98, s"G x should align with x after 8 iterations, cos=$cos")
  }
}
