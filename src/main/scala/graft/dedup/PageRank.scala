package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PageRank over the near-duplicate graph — the second graph-analytics
  * operator next to ConnectedComponents: where CC answers "which docs
  * are the same content", PageRank scores how CENTRAL a document is in
  * its duplication neighborhood (template/boilerplate hubs rank high —
  * a curation signal for down-weighting mass-duplicated content).
  *
  * Per iteration — the canonical Spark graph step:
  *   contribs: edges ⋈ ranks ⋈ degrees, one shuffle keyed on dst;
  *   update:   rank' = (1-d)/N + d·Σ contribs (left join keeps
  *             isolated vertices at the base rank).
  * Lineage per round is one join + one aggregate (same family as
  * ConnectedComponents' rounds); N is the only driver scalar.
  *
  * Determinism contract: the per-vertex contribution sum is a strict
  * src-ordered left fold inside the aggregation group (sorted struct
  * list, like Kmeans.stepDeterministic), so any engine reproduces the
  * doubles bit-for-bit. Dangling mass is NOT redistributed (documented
  * simplification — isolated/dangling vertices keep the base rank;
  * both engines implement the identical recurrence).
  */
object PageRank {

  /** 3-column rank table (id, pr) after `iters` iterations over the
    * UNDIRECTED edge set `pairs` (a_id, b_id). `vertices` must carry
    * every id (isolated ones included) as column `id`. */
  def ranks(
      vertices: DataFrame,
      pairs: DataFrame,
      iters: Int,
      damping: Double = 0.85): DataFrame = {
    val n = vertices.count() // bounded: one scalar to the driver
    val base = lit((1.0 - damping) / n)
    val e = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = e.groupBy("src").agg(count(lit(1)).cast("long").as("d"))
    var pr = vertices.select(col("id"), (lit(1.0) / n).as("pr"))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), struct(col("src"), (col("pr") / col("d")).as("c")).as("sc"))
        .groupBy("dst")
        // Residual ordered fold (ExactSum survey, r12): contributions
        // per node = in-degree, bounded here by near-dup cluster size;
        // per-iteration quantization (qsum) would compound 1e-9 drift
        // across the 10-iteration oracle replay, so the src-ordered
        // exact fold stays. A web-scale hub graph would switch to qsum
        // with a quantized oracle.
        .agg(sort_array(collect_list(col("sc"))).as("cs"))
        .selectExpr("dst",
          "aggregate(cs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.c) AS contrib")
      pr = vertices
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (base + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("pr"))
        .localCheckpoint() // truncate lineage, one materialization per round
    }
    pr
  }
}
