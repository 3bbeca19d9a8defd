package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sim.{Kmeans, Similarity}

/** Lloyd training invariants: the objective never degrades across
  * iterations, separable clusters are recovered exactly, and the fitted
  * centroids do not depend on the input partitioning. */
class KmeansSpec extends SparkSuite {

  private def corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("fit recovers well-separated synthetic clusters exactly") {
    // Three orthogonal direction bundles: cluster c's members point along
    // axis c with small off-axis noise — cosine separates them perfectly.
    val dim = 8
    val rows = (0L until 30L).map { i =>
      val c = (i % 3).toInt
      val v = Array.fill(dim)(0.05f * ((i % 7).toInt - 3))
      v(c) = 10f + (i % 5)
      Row(i, v.toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

    val cs = Kmeans.fit(spark, df, k = 3, iters = 3)
    val asg = Kmeans.assign(spark, df, cs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // All members of a true cluster land in the same fitted cell, and the
    // three true clusters land in three distinct cells.
    val byTrue = (0 until 3).map(c => (0L until 30L).filter(_ % 3 == c).map(asg))
    byTrue.foreach(cells => assert(cells.distinct.size == 1, s"split cluster: $cells"))
    assert(byTrue.map(_.head).distinct.size == 3, "clusters collapsed")
  }

  test("objective (mean assigned cosine) never degrades across iterations") {
    val seed = Kmeans.seedCentroids(corpus, 8)
    val costs = (0 to 3).map { iters =>
      val cs = if (iters == 0) seed else Kmeans.fit(spark, corpus, 8, iters)
      Kmeans.meanAssignedCosine(Kmeans.assign(spark, corpus, cs))
    }
    costs.sliding(2).foreach { case Seq(prev, next) =>
      assert(next >= prev - 1e-9, s"objective degraded: $costs")
    }
    assert(costs.last > costs.head, s"training never improved: $costs")
  }

  test("fitted centroids are partition-invariant (to rounding)") {
    def fitted(parts: Int) =
      Kmeans.fit(spark, corpus.repartition(parts), 4, 2).map { case (cell, emb) =>
        cell -> emb.map(Similarity.round6).toSeq
      }.toMap
    assert(fitted(3) == fitted(13))
  }

  test("stepDeterministic matches an independent JVM replay of one Lloyd step") {
    val k = 8
    val vecs = corpus.filter(col("vec_id") < 100)
    val got = Kmeans.stepDeterministic(spark, vecs, k, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)

    // Replay: same assignment (ivfAssign tie-break), same vec_id-ordered
    // left folds, on the driver.
    val all = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val cents = all.take(k)
    val byCell = all.groupBy { case (_, emb) =>
      cents.minBy { case (cid, c) =>
        (-Similarity.cosineJvm(emb, c), cid)
      }._1
    }
    val expected = byCell.toSeq.map { case (cell, members) =>
      val n = members.length
      val sums = new Array[Double](64)
      members.sortBy(_._1).foreach { case (_, emb) =>
        var d = 0
        while (d < 64) { sums(d) += emb(d).toDouble; d += 1 }
      }
      var norm2 = 0.0; var sum = 0.0
      sums.foreach { s => val m = s / n; norm2 += m * m; sum += m }
      (cell, n.toLong, Similarity.round6(norm2), Similarity.round6(sum))
    }.sortBy(_._1)
    assert(got.toSeq == expected)
  }

  test("fit and assignAuto refuse K past the broadcast bound, naming the sample path") {
    // r13 directive 4: the trained-centroid family's 2^18 broadcast bound
    // must be mechanical, not prose — no caller can silently cross it.
    val overK = Similarity.MaxBroadcastFineCentroids + 1
    val eFit = intercept[IllegalArgumentException] {
      Kmeans.fit(spark, corpus, k = overK, iters = 1)
    }
    assert(eFit.getMessage.contains("fine-centroid broadcast bound"))
    assert(eFit.getMessage.contains("sample"), "refusal must name the sample-training path")

    val bigCs = Array.tabulate(overK)(i => (i.toLong, Array(1.0)))
    val eAsg = intercept[IllegalArgumentException] {
      Kmeans.assignAuto(spark, corpus, bigCs)
    }
    assert(eAsg.getMessage.contains("fine-centroid broadcast bound"))
    assert(eAsg.getMessage.contains("sample"))

    // The bound itself stays permissive below the ceiling: the normal
    // gate-scale path is untouched.
    val cs = Kmeans.fit(spark, corpus, k = 4, iters = 1)
    assert(cs.length == 4)
  }
}
