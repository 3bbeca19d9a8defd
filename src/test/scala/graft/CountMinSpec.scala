package graft

import org.apache.spark.sql.functions._

import graft.sketch.CountMin

/** Count-Min invariants: the counter matrix is partition-invariant
  * (elementwise-add merge), every point estimate dominates the true
  * count, and total mass per row equals the row count. */
class CountMinSpec extends SparkSuite {

  private val depth = 4
  private val width = 32

  private def keys = {
    val s = spark
    import s.implicits._
    // Zipf-ish: key j appears ~2000/(j+1) times.
    (0 until 40).flatMap(j => Seq.fill(2000 / (j + 1))(s"k$j")).toDF("k")
  }

  private def matrix(parts: Int): Seq[Long] = {
    val df = keys.repartition(parts)
    df.agg(expr(s"cms_counters(k, $depth, $width)")).head.getSeq[Long](0)
  }

  test("counter matrix is identical under any partitioning") {
    assert(matrix(2) == matrix(17))
  }

  test("estimates dominate exact counts; row mass equals n") {
    val m = matrix(8).toArray
    val exact = keys.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = CountMin.estimate(m, depth, width, k)
      assert(est >= c, s"$k: estimate $est < exact $c")
      assert(est <= n, s"$k: estimate $est above total mass")
    }
    (0 until depth).foreach { r =>
      assert(m.slice(r * width, (r + 1) * width).sum == n,
        s"row $r mass != $n")
    }
    // The sketch is not vacuous: the heaviest key's estimate is close to
    // its true count (within the n·e/width CM bound).
    val heavy = exact.maxBy(_._2)
    val slack = (n * math.E / width).toLong
    assert(CountMin.estimate(m, depth, width, heavy._1) <= heavy._2 + slack)
  }
}
