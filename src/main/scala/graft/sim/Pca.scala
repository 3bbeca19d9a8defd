package graft.sim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top principal component of an embedding column by power iteration
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
  *  - the 8-step power iteration runs on the d×d matrix driver-side in
  *    EXACT cross-engine-replicable arithmetic: every dot product is
  *    re-quantized through floor(x·1e9) i64 sums (order-free, exact),
  *    normalization uses IEEE sqrt/division (correctly rounded, so
  *    bit-identical in DuckDB), and the sign is fixed by the
  *    largest-|loading| component (lowest index on ties). The DuckDB
  *    oracle replays the identical iteration as generated SQL
  *    ([[powerIterationDuck]]), so the result is hash-exact.
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

  /** The exact-replicable power iteration: Gram normalized by n, then
    * `iters` rounds of y = quantize(G x); x = y / ‖y‖ (quantized norm),
    * sign fixed positive at the largest-|x| index. Returns 1-based
    * (dim, loading). Mirrors [[powerIterationDuck]] operation for
    * operation — change one only with the other. */
  def topComponent(
      gram: Map[(Int, Int), Long], dim: Int, n: Long, iters: Int): Seq[(Int, Double)] = {
    val gd = Array.tabulate(dim, dim)((i, j) =>
      gram((i + 1, j + 1)).toDouble / 1e9 / n.toDouble)
    var x = Array.fill(dim)(0.125)
    for (_ <- 1 to iters) {
      val yq = Array.tabulate(dim) { i =>
        var s = 0L
        var j = 0
        while (j < dim) { s += math.floor(gd(i)(j) * x(j) * 1e9).toLong; j += 1 }
        s
      }
      val yd = yq.map(_.toDouble / 1e9)
      var nq = 0L
      yd.foreach(v => nq += math.floor(v * v * 1e9).toLong)
      val nrm = math.sqrt(nq.toDouble / 1e9)
      x = yd.map(_ / nrm)
    }
    val lead = x.indices.minBy(i => (-math.abs(x(i)), i))
    val sgn = if (x(lead) < 0) -1.0 else 1.0
    x.indices.map(i => (i + 1, x(i) * sgn))
  }

  /** DuckDB SQL replaying the same iteration over a CTE `g(i, j, q)`
    * and a scalar CTE `nn(n)`; emits CTE text ending in `x{iters}` with
    * columns (i, v). */
  def powerIterationDuck(iters: Int): String = {
    val q9 = "1000000000.0"
    val steps = (1 to iters).map { k =>
      val prev = if (k == 1) "x0" else s"x${k - 1}"
      s"""y$k AS (SELECT g.i,
         |    CAST(sum(CAST(floor(CAST(g.q AS DOUBLE) / $q9 / CAST(nn.n AS DOUBLE) * $prev.v * $q9) AS BIGINT)) AS BIGINT) AS yq
         |  FROM g JOIN $prev ON g.j = $prev.i CROSS JOIN nn GROUP BY g.i),
         |n$k AS (SELECT sqrt(CAST(CAST(sum(CAST(floor((CAST(yq AS DOUBLE) / $q9) * (CAST(yq AS DOUBLE) / $q9) * $q9) AS BIGINT)) AS BIGINT) AS DOUBLE) / $q9) AS nrm FROM y$k),
         |x$k AS (SELECT i, (CAST(yq AS DOUBLE) / $q9) / n$k.nrm AS v FROM y$k CROSS JOIN n$k)""".stripMargin
    }
    s"""x0 AS (SELECT CAST(range AS INT) + 1 AS i, CAST(0.125 AS DOUBLE) AS v FROM range(64)),
       |${steps.mkString(",\n")}""".stripMargin
  }
}
