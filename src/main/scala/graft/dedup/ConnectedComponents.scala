package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive near-duplicate clusters: connected components by iterative
  * min-label propagation.
  *
  * `Dedup.clusterReps` is the one-hop keep-policy (each doc points at its
  * smallest direct neighbor) — correct for the reference workload's
  * star-shaped duplicate groups, but a CHAIN a–b–c leaves two labels. This
  * operator converges the labels: every member of a component ends at the
  * component's global minimum id, in O(component diameter) rounds.
  *
  * Scale shape: each round is one keyed equi-join (edges × labels on src)
  * plus one min-aggregate — two shuffles on ids, both AQE-planned. Rounds
  * are bounded by graph diameter, and near-dup graphs are shallow (dup
  * groups are dense); `maxIter` caps pathological chains. Convergence is
  * detected by the exact integer sum of labels (strictly decreasing until
  * fixpoint — a scalar per round to the driver, nothing else).
  * `localCheckpoint` truncates lineage each round so the plan stays flat
  * no matter how many rounds run. For graphs with continent-sized
  * components, the two-phase large-star/small-star variant (Kiveris et
  * al. 2014) halves the round count; near-dup graphs don't need it.
  */
object ConnectedComponents {

  /** @param nodes  one `id` column (BIGINT), all vertices
    * @param pairs  undirected edges as `a_id`, `b_id`
    * @return (id, label) with label = min id of the component */
  def labels(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.selectExpr("a_id AS src", "b_id AS dst")
      .unionByName(pairs.selectExpr("b_id AS src", "a_id AS dst"))
      .localCheckpoint()
    var cur = nodes.selectExpr("id", "id AS label").localCheckpoint()
    var prevSum = cur.agg(sum("label")).head().getLong(0)
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val prop = edges.join(cur, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      cur = cur.unionByName(prop)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val s = cur.agg(sum("label")).head().getLong(0)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    cur
  }
}
