package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal components of an embedding column by power iteration
  * over a QUANTIZED Gram matrix — the PCA building block for embedding
  * whitening / matryoshka truncation / drift monitoring, shaped for
  * 100 TB:
  *
  *  - the corpus-sized work is ONE narrow pass: a mapPartitions kernel
  *    (JVM-kernel seam, as for media decode / minhash mixes) folds each
  *    partition into a d×d array of i64 partial sums of
  *    floor(v_i · v_j · 1e9) — per-task state is d² longs (32 KB at
  *    d=64), emitted as (i, j, partial) rows;
  *  - one d²-row aggregate merges the partials; the collect is bounded
  *    by d², never the corpus;
  *  - the power iteration runs on the d×d matrix driver-side in EXACT
  *    cross-engine-replicable arithmetic: every dot product is
  *    re-quantized through floor(x·1e9) i64 sums (order-free, exact),
  *    normalization uses IEEE sqrt/division (correctly rounded, so
  *    bit-identical in DuckDB), and the sign is fixed by the
  *    largest-|loading| component (lowest index on ties). The DuckDB
  *    oracle replays the identical iteration as generated SQL
  *    ([[powerIterationDuck]]), so the result is hash-exact. The second
  *    component comes from Hotelling deflation (G₂ = Gₙ − λ₁ x₁x₁ᵀ with
  *    the quantized Rayleigh λ₁) and the same iteration — also replayed
  *    exactly ([[deflatedIterationDuck]]).
  *
  * Quantization headroom (i64): Gram partials are Σ_rows |v_i v_j|·1e9 ≈
  * 1e9·N for unit-scale embeddings — safe to ~9e9 rows per PARTITION
  * (partials merge as the aggregate, full-corpus totals are summed by
  * the d²-row agg in Spark's 128-bit-safe sum). The iteration side
  * normalizes the Gram by N first, so its quantities are O(d)-bounded
  * regardless of corpus size. */
object Pca {

  final case class GramPartial(i: Int, j: Int, q: Long)

  /** (i, j) → Σ_rows floor(v_i·v_j·1e9) over the corpus, as a d²-entry
    * map. One narrow pass + one d²-row aggregate. */
  def quantizedGram(spark: SparkSession, emb: DataFrame, dim: Int): Map[(Int, Int), Long] = {
    import spark.implicits._
    val partials = emb.select(col("embedding"))
      .as[Array[Float]]
      .mapPartitions { it =>
        val acc = Array.ofDim[Long](dim * dim)
        it.foreach { v =>
          var i = 0
          while (i < dim) {
            val vi = v(i).toDouble
            var j = 0
            while (j < dim) {
              acc(i * dim + j) += math.floor(vi * v(j).toDouble * 1e9).toLong
              j += 1
            }
            i += 1
          }
        }
        (0 until dim * dim).iterator
          .map(k => GramPartial(k / dim + 1, k % dim + 1, acc(k)))
      }
      .toDF("i", "j", "q")
    partials.groupBy("i", "j").agg(sum("q").as("q"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
  }

  /** Gram normalized by n — the matrix every iteration runs on; value-
    * identical to the oracle's `gv` CTE ((q / 1e9) / n, left-assoc). */
  def normalizedGram(gram: Map[(Int, Int), Long], dim: Int, n: Long): Array[Array[Double]] =
    Array.tabulate(dim, dim)((i, j) => gram((i + 1, j + 1)).toDouble / 1e9 / n.toDouble)

  /** One quantized matrix-vector product: y_q(i) = Σ_j floor(G(i,j)·x_j·1e9). */
  private def matVecQ(gd: Array[Array[Double]], x: Array[Double]): Array[Long] =
    Array.tabulate(gd.length) { i =>
      var s = 0L
      var j = 0
      while (j < gd.length) { s += math.floor(gd(i)(j) * x(j) * 1e9).toLong; j += 1 }
      s
    }

  /** `iters` rounds of y = quantize(G x); x = y / ‖y‖ (quantized norm),
    * from x0 = 0.125. Returns the UNSIGNED final vector. Mirrors the
    * generated SQL operation for operation — change one only with the
    * other. */
  private def iterate(gd: Array[Array[Double]], iters: Int): Array[Double] = {
    var x = Array.fill(gd.length)(0.125)
    for (_ <- 1 to iters) {
      val yd = matVecQ(gd, x).map(_.toDouble / 1e9)
      var nq = 0L
      yd.foreach(v => nq += math.floor(v * v * 1e9).toLong)
      val nrm = math.sqrt(nq.toDouble / 1e9)
      x = yd.map(_ / nrm)
    }
    x
  }

  /** Sign convention: largest-|loading| component (lowest index on
    * ties) positive; 1-based (dim, loading). */
  private def signFixed(x: Array[Double]): Seq[(Int, Double)] = {
    val lead = x.indices.minBy(i => (-math.abs(x(i)), i))
    val sgn = if (x(lead) < 0) -1.0 else 1.0
    x.indices.map(i => (i + 1, x(i) * sgn))
  }

  /** Top component: normalized Gram + iteration + sign fix. */
  def topComponent(
      gram: Map[(Int, Int), Long], dim: Int, n: Long, iters: Int): Seq[(Int, Double)] =
    signFixed(iterate(normalizedGram(gram, dim, n), iters))

  /** Top-2 subspace by Hotelling deflation: λ₁ = quantized Rayleigh
    * x₁ᵀGx₁, G₂(i,j) = G(i,j) − λ₁·x₁ᵢ·x₁ⱼ (left-assoc, sign-invariant),
    * then the same iteration on G₂. Returns (pc1, pc2, λ₁). */
  def topTwoComponents(
      gram: Map[(Int, Int), Long], dim: Int, n: Long, iters: Int)
      : (Seq[(Int, Double)], Seq[(Int, Double)], Double) = {
    val gd = normalizedGram(gram, dim, n)
    val x1 = iterate(gd, iters)
    val yd = matVecQ(gd, x1).map(_.toDouble / 1e9)
    var lq = 0L
    x1.indices.foreach(i => lq += math.floor(x1(i) * yd(i) * 1e9).toLong)
    val lam = lq.toDouble / 1e9
    val g2 = Array.tabulate(dim, dim)((i, j) => gd(i)(j) - lam * x1(i) * x1(j))
    val x2 = iterate(g2, iters)
    (signFixed(x1), signFixed(x2), lam)
  }

  private val Q9 = "1000000000.0"

  /** The generic iteration chain over a normalized-Gram CTE
    * `gName(i, j, v)`, CTE names prefixed with `p`; ends in `${p}{iters}`
    * with columns (i, v). */
  private def iterationChain(iters: Int, gName: String, p: String): String = {
    val steps = (1 to iters).map { k =>
      val prev = s"$p${k - 1}"
      s"""${p}y$k AS MATERIALIZED (SELECT g.i,
         |    CAST(sum(CAST(floor(g.v * $prev.v * $Q9) AS BIGINT)) AS BIGINT) AS yq
         |  FROM $gName g JOIN $prev ON g.j = $prev.i GROUP BY g.i),
         |${p}n$k AS MATERIALIZED (SELECT sqrt(CAST(CAST(sum(CAST(floor((CAST(yq AS DOUBLE) / $Q9) * (CAST(yq AS DOUBLE) / $Q9) * $Q9) AS BIGINT)) AS BIGINT) AS DOUBLE) / $Q9) AS nrm FROM ${p}y$k),
         |$p$k AS MATERIALIZED (SELECT i, (CAST(yq AS DOUBLE) / $Q9) / ${p}n$k.nrm AS v FROM ${p}y$k CROSS JOIN ${p}n$k)""".stripMargin
    }
    s"""${p}0 AS MATERIALIZED (SELECT CAST(range AS INT) + 1 AS i, CAST(0.125 AS DOUBLE) AS v FROM range(64)),
       |${steps.mkString(",\n")}""".stripMargin
  }

  /** DuckDB SQL replaying [[topComponent]]'s iteration over CTEs
    * `g(i, j, q)` and `nn(n)`; defines `gv` (the normalized Gram) and
    * ends in `x{iters}` with columns (i, v). */
  def powerIterationDuck(iters: Int): String =
    s"""gv AS MATERIALIZED (SELECT g.i, g.j,
       |    CAST(g.q AS DOUBLE) / $Q9 / CAST(nn.n AS DOUBLE) AS v
       |  FROM g CROSS JOIN nn),
       |${iterationChain(iters, "gv", "x")}""".stripMargin

  /** DuckDB SQL replaying the deflated second iteration: expects the
    * [[powerIterationDuck]] chain (gv + x{iters}) already in scope;
    * defines the Rayleigh λ₁, the deflated `g2v`, and ends in
    * `z{iters}` with columns (i, v). */
  def deflatedIterationDuck(iters: Int): String =
    s"""xy AS MATERIALIZED (SELECT g.i,
       |    CAST(sum(CAST(floor(g.v * x$iters.v * $Q9) AS BIGINT)) AS BIGINT) AS yq
       |  FROM gv g JOIN x$iters ON g.j = x$iters.i GROUP BY g.i),
       |lam AS MATERIALIZED (SELECT CAST(sum(CAST(floor(x$iters.v * (CAST(xy.yq AS DOUBLE) / $Q9) * $Q9) AS BIGINT)) AS BIGINT) AS lq
       |  FROM x$iters JOIN xy ON xy.i = x$iters.i),
       |g2v AS MATERIALIZED (SELECT g.i, g.j,
       |    g.v - (CAST(lam.lq AS DOUBLE) / $Q9) * xa.v * xb.v AS v
       |  FROM gv g CROSS JOIN lam
       |  JOIN x$iters xa ON xa.i = g.i
       |  JOIN x$iters xb ON xb.i = g.j),
       |${iterationChain(iters, "g2v", "z")}""".stripMargin
}
