package graft

import org.apache.spark.sql.functions._

import graft.dedup.PageRank

/** PageRank invariants: exact agreement with a hand-rolled reference on
  * a small graph, partition invariance (ordered folds), isolated
  * vertices pinned at the base rank, hubs outranking leaves. */
class PageRankSpec extends SparkSuite {

  test("matches a driver-side replay; hub > leaf; isolated at base rank") {
    val s = spark
    import s.implicits._
    // Star (0 center; 1,2,3 leaves) + an edge pair (4,5) + isolated 6.
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L)).toDF("a_id", "b_id")
    val vertices = (0L to 6L).toDF("id")
    val iters = 3

    val got = PageRank.ranks(vertices.repartition(5), pairs.repartition(3), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // Driver replay of the identical recurrence (same fold order: src asc).
    val n = 7
    val edges = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 4L -> 5L)
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = (0L until n.toLong).map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      pr = (0L until n.toLong).map { v =>
        val contrib = edges.filter(_._2 == v).map(_._1).sorted
          .foldLeft(0.0)((acc, u) => acc + pr(u) / deg(u))
        v -> ((1.0 - 0.85) / n + 0.85 * contrib)
      }.toMap
    }
    assert(got.keySet == pr.keySet)
    pr.foreach { case (v, r) =>
      assert(got(v) == r, s"vertex $v: ${got(v)} != $r")
    }

    // Structure: the star center out-ranks its leaves; the isolated
    // vertex sits exactly at the base rank.
    assert(got(0L) > got(1L) && got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(6L) == (1.0 - 0.85) / n)

    // Partition invariance is bit-level (ordered folds): re-run with a
    // different layout.
    val again = PageRank.ranks(vertices.repartition(2), pairs.repartition(7), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }
}
