package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.SequencePack

/** The two-pass distributed prefix sum must equal the naive global-window
  * cumsum bit-for-bit at any partition count, while its physical plan
  * carries neither a Window operator nor the single-partition Exchange the
  * window formulation forces. */
class SequencePackSpec extends SparkSuite {

  private def tokenCounts = spark.read.parquet(s"$sf001/documents.parquet")
    .selectExpr("doc_id",
      "CAST(size(filter(split(trim(lower(text)), '\\\\s+'), t -> t != '')) AS BIGINT) AS n_tokens")

  test("start offsets == global window cumsum, any partition count") {
    val naive = tokenCounts
      .withColumn("start_off",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    for (parts <- Seq(1, 8, 32)) {
      val dist = SequencePack.withStartOffsets(tokenCounts, "doc_id", "n_tokens", parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(dist == naive, s"prefix sum diverged at numParts=$parts")
    }
  }

  test("offset plan: no Window, no single-partition exchange; naive has both") {
    val dist = SequencePack.withStartOffsets(tokenCounts, "doc_id", "n_tokens", 8)
    dist.count()
    val plan = dist.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"distributed path must not plan a Window:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"distributed path must not serialize onto one partition:\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range shuffle:\n$plan")

    val naive = tokenCounts.withColumn("start_off",
      coalesce(sum("n_tokens").over(
        Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    naive.count()
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("Window") && naivePlan.contains("SinglePartition"))
  }

  test("offsets survive a downstream coalesce(1) — boundary keys, not task ids") {
    // Regression: TaskContext.getPartitionId() under coalesce reports the
    // MERGED partition id for every parent, which zeroed all offsets and
    // produced partition-local ranks. Offsets are keyed by range-boundary
    // values now; a single-task write must see identical global offsets.
    val naive = tokenCounts
      .withColumn("start_off",
        coalesce(sum("n_tokens").over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = SequencePack.withStartOffsets(tokenCounts, "doc_id", "n_tokens", 8)
      .coalesce(1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == naive, "coalesce(1) corrupted the prefix sum")
  }

  test("distributed global rank == row_number window, multi-column order key") {
    val df = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "n_chars")
    val naive = df.withColumn("global_rank",
        row_number().over(Window.orderBy("n_chars", "doc_id")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dist = SequencePack.withGlobalRank(df, Seq("n_chars", "doc_id"), 8)
      .select("doc_id", "n_chars", "global_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dist == naive)
  }

  test("packBins: contiguous bins, budget respected at bin starts, totals conserved") {
    val budget = 256L
    val bins = SequencePack.packBins(tokenCounts, "doc_id", "n_tokens", budget, 8)
      .orderBy("bin").collect()
    val total = tokenCounts.agg(sum("n_tokens")).head.getLong(0)
    val nDocs = tokenCounts.count()
    assert(bins.map(_.getLong(1)).sum == nDocs)
    assert(bins.map(_.getLong(2)).sum == total)
    // Bin ids are exactly 0..ceil(total/budget)-1 with no gaps only when
    // every bin start is occupied by some doc; what IS guaranteed: ids are
    // strictly increasing and doc ranges tile without overlap.
    val ids = bins.map(_.getLong(0))
    assert(ids.toSeq == ids.sorted.toSeq && ids.distinct.length == ids.length)
    bins.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"doc ranges overlap across bins: $a vs $b")
      case _ =>
    }
  }

  test("keepCols pass through the two passes untouched") {
    val withExtra = tokenCounts.withColumn("n2", col("n_tokens") * 2)
    val dist = SequencePack
      .withStartOffsets(withExtra, Seq("doc_id"), "n_tokens", 8, keepCols = Seq("n2"))
      .collect()
    assert(dist.nonEmpty)
    dist.foreach(r => assert(r.getLong(2) == 2 * r.getLong(1)))
    // offsets unchanged vs the no-keepCols call
    val plain = SequencePack.withStartOffsets(tokenCounts, "doc_id", "n_tokens", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    dist.foreach(r => assert(r.getLong(3) == plain(r.getLong(0))))
  }

  test("evt_max_concurrency sweep plans no ms-ordered (unpartitioned) Window") {
    val df = graft.SparkEntry.queries("evt_max_concurrency")(spark, sf001)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // The only Window allowed is the user_id-partitioned sessionization
    // pass; the boundary sweep must run through the two-pass prefix sum.
    assert(!plan.contains("windowspecdefinition(ms"),
      s"global ms-ordered Window crept back into the sweep:\n$plan")
  }

  test("running min/max == global window running extremes, any partition count") {
    // Signed values with repeats so both extremes move AND stall; doc_id
    // keys the total order.
    val vals = tokenCounts.selectExpr("doc_id",
      "CAST(n_tokens % 37 - 18 AS BIGINT) AS v")
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    val naive = vals
      .withColumn("run_min", min("v").over(w))
      .withColumn("run_max", max("v").over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    for (parts <- Seq(1, 8, 32)) {
      val dist = SequencePack.withRunningMinMax(vals, Seq("doc_id"), "v", parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(dist == naive, s"running extremes diverged at numParts=$parts")
    }
  }

  test("running extremes plan: no Window, no single-partition exchange") {
    val vals = tokenCounts.selectExpr("doc_id", "CAST(n_tokens AS BIGINT) AS v")
    val plan = SequencePack.withRunningMinMax(vals, Seq("doc_id"), "v", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"running-extreme scan must not plan a Window:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"running-extreme scan must not serialize:\n$plan")
  }

  test("CUSUM closed form: S_t = P_t - min_k P_k equals the sequential recurrence") {
    // The identity evt_cusum_changepoint rides on, checked against a
    // plain fold over the same deviation stream.
    val ds = tokenCounts.orderBy("doc_id")
      .selectExpr("CAST(n_tokens % 21 - 10 AS BIGINT) AS d")
      .collect().map(_.getLong(0)).toSeq
    val seqS = ds.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val p = ds.scanLeft(0L)(_ + _).tail
    val closed = p.zipWithIndex.map { case (pt, i) =>
      pt - math.min(0L, p.take(i + 1).min) }
    assert(seqS == closed, "closed-form CUSUM != sequential recurrence")
  }
}
