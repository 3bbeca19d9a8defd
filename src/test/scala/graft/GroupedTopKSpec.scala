package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** topk_by must equal the window formulation exactly (incl. score ties
  * resolved by id), stay partition-invariant, and keep bounded state
  * through partial aggregation. */
class GroupedTopKSpec extends SparkSuite {

  test("topk_by == row_number window dual, incl. ties, any partitioning") {
    val s = spark
    import s.implicits._
    // Deliberate score collisions: 40 scores over 1000 rows, 5 groups.
    val df = (0 until 1000).map { i =>
      (s"g${i % 5}", (i * 7 % 40).toDouble, i.toLong)
    }.toDF("g", "score", "id")

    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("id").desc)))
      .filter(col("rn") <= 10).drop("rn")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    def agg(parts: Int) = df.repartition(parts)
      .groupBy("g").agg(expr("topk_by(score, id, 10)").as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    assert(win.size == 50)
    assert(agg(1) == win)
    assert(agg(17) == win)
  }

  test("topk_by plan has no Sort operator (the window dual always sorts)") {
    val c = spark.read.parquet(s"$sf001/customer.parquet")
    val agg = c.groupBy("c_mktsegment").agg(expr("topk_by(c_acctbal, c_custkey, 5)"))
    assert(agg.count() > 0)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"heap top-k must not sort:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")

    val win = c.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").desc)))
      .filter(col("rn") <= 5)
    win.count()
    assert(win.queryExecution.executedPlan.toString.contains("Sort"))
  }

  test("per-group arrays come out sorted descending") {
    val rows = spark.read.parquet(s"$sf001/customer.parquet")
      .groupBy("c_mktsegment").agg(expr("topk_by(c_acctbal, c_custkey, 5)").as("top"))
      .select("top").collect()
    rows.foreach { r =>
      val arr = r.getSeq[org.apache.spark.sql.Row](0)
        .map(x => (x.getDouble(0), x.getLong(1)))
      assert(arr.size == 5)
      arr.sliding(2).foreach { case Seq(a, b) =>
        assert(a._1 > b._1 || (a._1 == b._1 && a._2 > b._2), s"not descending: $arr")
      }
    }
  }

  test("topk_by_str == window dual (score DESC, key ASC ties), any partitioning") {
    val s = spark
    import s.implicits._
    // Score collisions on purpose: many terms share a score, so the
    // string tie-break decides membership AND order at the k boundary.
    val df = (0 until 1000).map { i =>
      (s"g${i % 4}", (i % 25).toDouble, f"term_${i}%04d")
    }.toDF("g", "score", "k")

    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("score").desc, col("k").asc)))
      .filter(col("rn") <= 7)
      .select("g", "rn", "score", "k")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet

    def agg(parts: Int) = df.repartition(parts)
      .groupBy("g").agg(expr("topk_by_str(score, k, 7)").as("top"))
      .selectExpr("g", "posexplode(top) AS (p, t)")
      .selectExpr("g", "CAST(p + 1 AS INT) AS rn", "t.score", "t.id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet

    assert(win.size == 28)
    assert(agg(1) == win)
    assert(agg(17) == win)
  }

  test("topk_by_str packed-key payload preserves pure key tie-order") {
    val s = spark
    import s.implicits._
    // "a" is a prefix of "ab": with the U+0001 delimiter (below every
    // token character) the packed keys must still order a < ab even
    // though a's payload follows immediately — the property the
    // text_tfidf_terms spelling rides on.
    val df = Seq(
      ("g", 1.0, "a\u0001999"),
      ("g", 1.0, "ab\u00011"),
      ("g", 1.0, "b\u00015")
    ).toDF("g", "score", "k")
    val out = df.groupBy("g").agg(expr("topk_by_str(score, k, 2)").as("top"))
      .selectExpr("explode(top) AS t").selectExpr("t.id")
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a\u0001999", "ab\u00011"), out.toString)
  }

  test("duplicate (score, id) rows are set no-ops — the heap never shrinks below k") {
    val s = spark
    import s.implicits._
    // r12 review finding: a duplicate admit on a FULL buffer used to
    // evict the min without growing the set, under-filling the top-k.
    val df = Seq(
      ("g", 1.0, 7L), ("g", 5.0, 9L), ("g", 5.0, 9L), ("g", 5.0, 9L)
    ).toDF("g", "score", "id")
    val out = df.groupBy("g").agg(expr("topk_by(score, id, 2)").as("top"))
      .selectExpr("explode(top) AS t").selectExpr("t.score", "t.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(out == Seq((5.0, 9L), (1.0, 7L)), out.toString)

    val dfs = Seq(
      ("g", 1.0, "low"), ("g", 5.0, "hi"), ("g", 5.0, "hi"), ("g", 5.0, "hi")
    ).toDF("g", "score", "k")
    val outs = dfs.groupBy("g").agg(expr("topk_by_str(score, k, 2)").as("top"))
      .selectExpr("explode(top) AS t").selectExpr("t.score", "t.id")
      .collect().map(r => (r.getDouble(0), r.getString(1))).toSeq
    assert(outs == Seq((5.0, "hi"), (1.0, "low")), outs.toString)
  }

  test("topk_by_str plan has no Sort operator") {
    val s = spark
    import s.implicits._
    val df = (0 until 200).map(i => (s"s${i % 3}", i.toDouble, s"t$i"))
      .toDF("source", "w", "term")
    val agg = df.groupBy("source").agg(expr("topk_by_str(w, term, 5)"))
    assert(agg.count() > 0)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"heap top-k must not sort:\n$plan")
  }
}
