package graft

import org.apache.spark.sql.functions._

import graft.scd.ScdExpressions

/** Property tests for the merge algebra (SURVEY.md §5): invariants of
  * mergeArray / mergeStruct / dedupArray over randomized version sets
  * (seeded, reproducible), evaluated in one Spark pass over a generated
  * table (one row per case).
  */
class MergeAlgebraPropSpec extends SparkSuite {

  private val MaxKey = 4

  private def arrSql(a: List[(Int, Int)]): String =
    if (a.isEmpty) "CAST(array() AS array<struct<lineItemId:double,version:double>>)"
    else a.map { case (k, v) =>
      s"named_struct('lineItemId', CAST($k AS DOUBLE), 'version', CAST($v AS DOUBLE))"
    }.mkString("array(", ",", ")")

  test("mergeArray invariants over 100 random (source, target) array pairs") {
    val rnd = new scala.util.Random(42)
    def randArr(): List[(Int, Int)] =
      List.fill(rnd.nextInt(7))((rnd.nextInt(MaxKey + 1), 1 + rnd.nextInt(5)))
    val cases = List.fill(100)((randArr(), randArr()))
    val rows = cases.zipWithIndex.map { case ((src, tgt), i) =>
      s"SELECT $i AS id, ${arrSql(src)} AS s, ${arrSql(tgt)} AS t"
    }.mkString(" UNION ALL ")
    // The pipeline always dedups arrays (max version per key) before the
    // merge — BatchFlattener.flatten — so the invariants are stated over
    // deduped inputs.
    val merged = spark.sql(rows)
      .selectExpr("id",
        s"${ScdExpressions.dedupArray("s", "lineItemId")} AS s",
        s"${ScdExpressions.dedupArray("t", "lineItemId")} AS t")
      .selectExpr("id", "s", "t", s"${ScdExpressions.mergeArray("s", "t", "lineItemId")} AS m")
      .selectExpr(
        "id",
        // every merged element came from source or target
        """size(filter(m, e -> NOT exists(s, o -> o.lineItemId = e.lineItemId AND o.version = e.version)
          |                AND NOT exists(t, o -> o.lineItemId = e.lineItemId AND o.version = e.version))) AS alien""".stripMargin,
        // per key, merged max version == max(source max, target max)
        """size(filter(m, e -> e.version <
          |  greatest(
          |    coalesce(array_max(transform(filter(s, o -> o.lineItemId = e.lineItemId), o -> o.version)), CAST(0 AS DOUBLE)),
          |    coalesce(array_max(transform(filter(t, o -> o.lineItemId = e.lineItemId), o -> o.version)), CAST(0 AS DOUBLE))))) AS stale""".stripMargin,
        // every key present in source or target survives in merged
        """size(filter(array_union(transform(s, o -> o.lineItemId), transform(t, o -> o.lineItemId)),
          | k -> NOT exists(m, e -> e.lineItemId = k))) AS lost""".stripMargin)
      .collect()
    merged.foreach { r =>
      assert(r.getInt(1) == 0, s"case ${r.get(0)}: merged element from neither side")
      assert(r.getInt(2) == 0, s"case ${r.get(0)}: stale version survived")
      assert(r.getInt(3) == 0, s"case ${r.get(0)}: key lost in merge")
    }
  }

  test("dedupArray keeps exactly the max version per key") {
    val arrs = List(
      List((0, 1), (0, 3), (1, 2), (0, 2)),
      List((2, 5), (2, 5)), // exact duplicates both survive (reference NOT EXISTS form)
      Nil)
    val rows = arrs.zipWithIndex.map { case (a, i) =>
      s"SELECT $i AS id, ${arrSql(a)} AS arr"
    }.mkString(" UNION ALL ")
    val out = spark.sql(rows)
      .selectExpr("id", s"${ScdExpressions.dedupArray("arr", "lineItemId")} AS d")
      .selectExpr("id", "transform(d, e -> concat(e.lineItemId, ':', e.version)) AS kv")
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).sorted.toList).toMap
    assert(out(0) == List("0.0:3.0", "1.0:2.0"))
    assert(out(1) == List("2.0:5.0", "2.0:5.0"))
    assert(out(2) == Nil)
  }
}
