package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) over an
  * undirected near-dup edge list.
  *
  * Complements ConnectedComponents on the same graph: CC answers "is
  * there ANY path?" (one bridge edge merges two template families into
  * one cluster), LPA answers "where does the vote mass sit?" (the two
  * families keep their own labels and the bridge vertex joins the
  * denser side) — which is the right grain for choosing dedup
  * representatives when clusters are chained by borderline pairs.
  *
  * Round semantics, deterministic by construction so an external SQL
  * oracle can replay them exactly:
  *   - every vertex starts labeled with its own id;
  *   - each round a vertex collects one vote per incident edge (the
  *     neighbor's current label) plus ONE self-vote for its own current
  *     label (damping: a two-clique under pure synchronous update
  *     swaps labels forever; the self-vote breaks the symmetry);
  *   - its next label is the most-voted label, ties to the SMALLEST
  *     label (argmax over (count, -label) — total order, no RNG).
  * Fixed round count rather than convergence detection: synchronous
  * LPA can 2-cycle on bipartite-ish structure, so "run R rounds" is
  * the reproducible spelling.
  *
  * Scale shape: each round is one equi-join of the (2|E|)-row directed
  * edge list against the |V|-row label table, one (vertex, label)
  * count, and one per-vertex argmax — all key-partitioned hash
  * shuffles; nothing global, nothing driver-side. `localCheckpoint`
  * truncates lineage per round (same reasoning as ConnectedComponents:
  * an R-round loop otherwise stacks R joins into one exploding plan).
  */
object LabelPropagation {

  /** Bounded-round k-core peeling: repeatedly drop vertices of degree
    * < k (with their edges) for `rounds` rounds. The exact k-core is
    * this peel run to fixpoint; a FIXED round count is the
    * deterministic, externally-replayable spelling (each round peels at
    * least one vertex until stable, so `rounds` bounds the peel DEPTH
    * — long chains hanging off a core peel one link per round; near-dup
    * graphs are clique-heavy and converge in a handful). Per round: one
    * degree count + one semi-join edge restriction, both key-partitioned;
    * lineage truncated per round like the other iterative operators.
    * Returns the surviving (`id`, `degree`) rows. */
  def kcore(pairs: DataFrame, k: Int, rounds: Int = 4): DataFrame = {
    val ab = pairs.selectExpr("a_id AS src", "b_id AS dst")
    var edges = ab.union(ab.selectExpr("dst AS src", "src AS dst")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("src")
      edges = edges
        .join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint()
    }
    edges.groupBy("src").agg(count(lit(1)).as("degree"))
      .selectExpr("src AS id", "degree")
  }

  /** `vertices`: one `id` column. `pairs`: undirected edges as
    * (`a_id`, `b_id`). Returns (`id`, `label`) after `rounds` rounds. */
  def communities(vertices: DataFrame, pairs: DataFrame, rounds: Int = 3): DataFrame = {
    val ab = pairs.selectExpr("a_id AS src", "b_id AS dst")
    val edges = ab.union(ab.selectExpr("dst AS src", "src AS dst")).localCheckpoint()
    var labels = vertices.selectExpr("id", "id AS label").localCheckpoint()
    for (_ <- 1 to rounds) {
      val votes = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .selectExpr("src AS id", "label")
        .union(labels) // the self-vote; also carries isolated vertices through
      labels = votes
        .groupBy("id", "label").agg(count(lit(1)).as("cnt"))
        .groupBy("id")
        .agg(expr("max_by(label, struct(cnt, -label))").as("label"))
        .localCheckpoint()
    }
    labels
  }
}
