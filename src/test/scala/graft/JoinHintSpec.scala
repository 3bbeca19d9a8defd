package graft

import org.apache.spark.sql.functions._

/** Join strategy hints: the engine exposes Spark's full physical-join
  * control surface — per-join hints override the optimizer's size-based
  * choice (the knob for pinning plans at 100 TB when statistics lie). */
class JoinHintSpec extends SparkSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("merge / shuffle_hash / broadcast hints pin the physical join") {
    val fact = spark.range(0, 50000).select(col("id").as("k"), (col("id") * 2).as("x"))
    val dim = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 3).as("y"))

    // Without hints the tiny dim side broadcasts.
    val auto = planOf(fact.join(dim, "k"))
    assert(auto.contains("BroadcastHashJoin"), s"expected auto-broadcast:\n$auto")

    // MERGE hint forces sort-merge even for a broadcastable side.
    val merged = planOf(fact.join(dim.hint("merge"), "k"))
    assert(merged.contains("SortMergeJoin"), s"merge hint ignored:\n$merged")

    // SHUFFLE_HASH forces a shuffled hash join (no sort).
    val hashed = planOf(fact.join(dim.hint("shuffle_hash"), "k"))
    assert(hashed.contains("ShuffledHashJoin"), s"shuffle_hash hint ignored:\n$hashed")

    // BROADCAST forces a broadcast even when the side exceeds the
    // auto-broadcast threshold.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val noAuto = planOf(fact.join(dim, "k"))
      assert(!noAuto.contains("BroadcastHashJoin"), s"threshold off, still broadcast:\n$noAuto")
      val forced = planOf(fact.join(broadcast(dim), "k"))
      assert(forced.contains("BroadcastHashJoin"), s"broadcast hint ignored:\n$forced")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // All four produce identical rows.
    val expected = fact.join(dim, "k").count()
    Seq(fact.join(dim.hint("merge"), "k"), fact.join(dim.hint("shuffle_hash"), "k"),
      fact.join(broadcast(dim), "k")).foreach(df => assert(df.count() == expected))
  }
}
