package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The grams-side join strategy conf (spark.graft.dedup.gramsJoin) is
  * strategy-only: pair output must be bit-identical across arms, and
  * the default arm must actually plan the per-partition hash join (no
  * driver-built broadcast relation of the corpus grams — the sf1 OOM
  * class this conf exists to close). */
class DedupGramsJoinSpec extends SparkSuite {

  private def docsDf = {
    val s = spark
    import s.implicits._
    (1L to 400L).map { i =>
      // Overlapping shingle content so LSH candidates + verified pairs exist.
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog ${i % 3}"
      (i, if (i % 2 == 0) base else base + s" tail$i")
    }.toDF("doc_id", "text")
  }

  private def pairs(): Seq[(Long, Long, Double)] =
    Dedup.minhashPairs(Dedup.withMinhash(Dedup.withGramsJvm(docsDf).select("doc_id", "grams")), 0.8)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("shuffle_hash and auto arms return identical pairs") {
    spark.conf.set("spark.graft.dedup.gramsJoin", "shuffle_hash")
    val hashed = pairs()
    spark.conf.set("spark.graft.dedup.gramsJoin", "auto")
    val auto = pairs()
    spark.conf.unset("spark.graft.dedup.gramsJoin")
    val deflt = pairs()
    assert(hashed.nonEmpty, "fixture produced no verified pairs")
    assert(hashed == auto)
    assert(hashed == deflt)
  }

  test("the default arm plans the grams side as a shuffled hash join") {
    spark.conf.unset("spark.graft.dedup.gramsJoin")
    val plan = Dedup.minhashPairs(Dedup.withMinhash(Dedup.withGramsJvm(docsDf).select("doc_id", "grams")), 0.8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected ShuffledHashJoin for the grams side, got:\n$plan")
  }
}
