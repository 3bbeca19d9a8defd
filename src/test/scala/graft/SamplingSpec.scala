package graft

import org.apache.spark.sql.functions._

import graft.sample.Sampling

/** Deterministic sampling must pick the SAME rows regardless of
  * partitioning (the property Spark's seeded df.sample lacks), hit the
  * requested rate, and stay a shuffle-free codegen'd filter. */
class SamplingSpec extends SparkSuite {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("kept set is partition-invariant and rate is honored") {
    def ids(parts: Int): Set[Long] =
      Sampling.bernoulli(docs.repartition(parts), "CAST(doc_id AS STRING)", 0.1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(1)
    val b = ids(13)
    assert(a == b && a.nonEmpty)
    // 500 docs at 10%: binomial(500, 0.1) is within [20, 90] at ~6 sigma.
    assert(a.size > 20 && a.size < 90, s"kept ${a.size} of 500")
  }

  test("stratified rates: non-target strata intact, target downsampled") {
    val kept = Sampling.stratified(docs, "CAST(doc_id AS STRING)", "lang",
        Map("en" -> 0.35), defaultFrac = 1.0)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      if (lang == "en") assert(kept(lang) < n && kept(lang) > n / 5)
      else assert(kept(lang) == n, s"$lang should keep all rows")
    }
  }

  test("rebalance: smallest stratum intact, others near its size") {
    val total = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minN = total.values.min
    val kept = Sampling.rebalance(docs, "CAST(doc_id AS STRING)", "lang")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet == total.keySet)
    val minLang = total.minBy(_._2)._1
    assert(kept(minLang) == minN, "rate-1.0 stratum must keep every row")
    // Hash sampling is binomial around the target: +-50% covers 6 sigma
    // at these sizes.
    kept.foreach { case (lang, n) =>
      assert(n > minN / 2 && n < minN * 3 / 2, s"$lang kept $n, target $minN")
    }
  }

  test("weight rebalance: smallest-budget stratum intact, others near its budget") {
    val totals = docs.groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_chars").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minW = totals.values.min
    val kept = Sampling.rebalanceByWeight(docs, "CAST(doc_id AS STRING)", "lang", "n_chars")
      .groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_chars").as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = totals.minBy(_._2)._1
    assert(kept(minLang) == minW, "rate-1.0 stratum must keep its whole budget")
    kept.foreach { case (lang, w) =>
      assert(w > minW / 2 && w < minW * 3 / 2, s"$lang kept $w chars, target $minW")
    }
  }

  test("weighted top-k: biased toward heavy rows, bounded-heap plan") {
    val sel = Sampling.weightedTopK(
      docs.select("doc_id", "lang", "n_chars"), "CAST(doc_id AS STRING)", "n_chars", 50)
    val rows = sel.collect()
    assert(rows.length == 50)
    val meanSel = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val meanAll = docs.agg(org.apache.spark.sql.functions.avg("n_chars"))
      .head.getDouble(0)
    // P(select) ∝ n_chars, so the selected mean must sit well above the
    // corpus mean (length-biased sampling pulls it toward E[w²]/E[w]).
    assert(meanSel > meanAll * 1.1, s"no weight bias: sel=$meanSel corpus=$meanAll")
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k must be heap-based, not a sort:\n$plan")
  }

  test("sampling plan: no shuffle, filter fused into the scan's codegen stage") {
    val plan = Sampling.bernoulli(docs, "CAST(doc_id AS STRING)", 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    // Compact toString marks WholeStageCodegen stages with a "*(n)" prefix.
    assert(plan.contains("*(1) Filter"), s"filter should codegen:\n$plan")
  }

  test("epochs: strata absent from the weights map follow defaultWeight (r12, ADVICE)") {
    import org.apache.spark.sql.functions.col
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(langs.size >= 2, langs.toSeq.toString)
    val listed = langs.head
    val unlisted = langs.tail.toSet
    val partial = Map(listed -> 2.0)
    // Documented default: unlisted strata DROP (defaultWeight = 0).
    val dropped = Sampling.epochs(docs, "CAST(doc_id AS STRING)", "lang", partial)
    assert(dropped.filter(col("lang").isin(unlisted.toSeq: _*)).count() == 0)
    assert(dropped.filter(col("lang") === listed).count() ==
      2 * docs.filter(col("lang") === listed).count())
    // defaultWeight = 1.0 keeps every unlisted row exactly once.
    val kept = Sampling.epochs(docs, "CAST(doc_id AS STRING)", "lang", partial,
      defaultWeight = 1.0)
    unlisted.foreach { l =>
      assert(kept.filter(col("lang") === l).count() ==
        docs.filter(col("lang") === l).count(), l)
    }
  }
}
