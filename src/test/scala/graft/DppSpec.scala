package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Runtime dynamic partition pruning: the join-driven date filter must
  * appear as a `dynamicpruning` subquery in the fact scan's partition
  * filters (so whole directories are skipped at execution from the
  * dim's broadcast result), and the result must be identical with the
  * feature disabled. */
class DppSpec extends SparkSuite {

  private def dim = spark.range(31).selectExpr(
    "date_add(DATE '2024-01-01', CAST(id AS INT)) AS event_date",
    "CAST(id % 7 AS INT) AS dow_bucket")

  test("join against a filtered dim plants a dynamicpruning subquery on the fact scan") {
    val base = graft.tables.TmpDirs.create("graft-dpp").resolve("events").toString
    graft.tables.PartitionedTable.write(
      spark.read.parquet(s"$sf0001/events.parquet")
        .withColumn("event_date", to_date(col("ts"))),
      base, Seq("event_date"))

    def run() = spark.read.parquet(base)
      .join(dim.where(col("dow_bucket") === 2), "event_date")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))

    val plan = run().queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan carries no dynamicpruning subquery:\n$plan")

    val withDpp = run().collect().map(_.toSeq.mkString("|")).sorted.toSeq
    val conf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    spark.conf.set(conf, "false")
    try {
      val plain = run()
      assert(!plain.queryExecution.executedPlan.toString.contains("dynamicpruning"))
      assert(plain.collect().map(_.toSeq.mkString("|")).sorted.toSeq == withDpp,
        "DPP changed the result")
    } finally spark.conf.set(conf, "true")
  }
}
