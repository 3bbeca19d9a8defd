package graft

import graft.dedup.{ConnectedComponents, Dedup}

/** CC must converge chains (where the one-hop policy provably can't),
  * label isolated nodes with themselves, and agree with a union-find
  * ground truth on the real LSH pair graph. */
class ConnectedComponentsSpec extends SparkSuite {

  test("chains converge to the component minimum; singletons self-label") {
    val s = spark
    import s.implicits._
    val nodes = (1L to 8L).toDF("id")
    // chain 1-2-3-4, pair 6-7, isolated 5 and 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("a_id", "b_id")
    val out = ConnectedComponents.labels(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L, 8L -> 8L))

    // The one-hop policy leaves the chain split (4 -> 3, not 1) — the
    // exact gap CC closes.
    val oneHop = Dedup.clusterReps(nodes.selectExpr("id AS doc_id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneHop(4L) == 3L && out(4L) == 1L)
  }

  test("agrees with union-find on the real LSH pair graph") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val pairs = graft.queries.DedupQueries.minhashPairsCached(spark, sf001, 0.8)
    val edge = pairs.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))

    // Naive union-find ground truth.
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edge.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = ids.map(i => i -> find(i)).toMap

    val cc = ConnectedComponents.labels(
        docs.selectExpr("doc_id AS id"), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == truth)
  }
}
