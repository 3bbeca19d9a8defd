package graft

import graft.dedup.{ConnectedComponents, LabelPropagation}

/** LPA vs CC on the canonical chained-cluster shape: two triangles
  * joined by ONE bridge edge. CC (any-path) collapses everything into
  * one cluster; LPA (vote mass) keeps each triangle under its own
  * label — the behavior difference dedup_lpa_communities exists for. */
class LabelPropagationSpec extends SparkSuite {

  test("bridged triangles: two LPA communities, one CC cluster, isolated vertex kept") {
    val s = spark
    import s.implicits._
    val vs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("id")
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L)).toDF("a_id", "b_id")

    val lpa = LabelPropagation.communities(vs, pairs, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      99L -> 99L))

    val cc = ConnectedComponents.labels(vs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.filterKeys(_ != 99L).values.toSet.size == 1,
      "CC merges the bridged triangles into one cluster")
    assert(cc(99L) == 99L)
  }

  test("2-core peel strips a pendant chain link-by-link, keeps the triangle") {
    val s = spark
    import s.implicits._
    // Triangle 1-2-3 with a two-link chain hanging off vertex 3.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 20L), (20L, 21L))
      .toDF("a_id", "b_id")
    val core = LabelPropagation.kcore(pairs, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"only the triangle survives, each at degree 2: $core")
    // One round peels only the chain TIP (21 has degree 1; 20 still has
    // 2 until the tip goes) — the bounded-depth property, explicitly.
    val one = LabelPropagation.kcore(pairs, k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(one == Set(1L, 2L, 3L, 20L), s"round 1 keeps the not-yet-exposed link: $one")
  }

  test("votes and ties are deterministic: a 4-cycle settles to the minimum label") {
    val s = spark
    import s.implicits._
    val vs = Seq(5L, 6L, 7L, 8L).toDF("id")
    // 5-6-7-8-5: bipartite, the synchronous-oscillation shape the
    // self-vote damping exists for — must converge, not 2-cycle.
    val pairs = Seq((5L, 6L), (6L, 7L), (7L, 8L), (5L, 8L)).toDF("a_id", "b_id")
    val r3 = LabelPropagation.communities(vs, pairs, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r4 = LabelPropagation.communities(vs, pairs, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3.values.toSet == Set(5L), s"expected all-5 labels, got $r3")
    assert(r4 == r3, "stable across an extra round (no oscillation)")
  }
}
