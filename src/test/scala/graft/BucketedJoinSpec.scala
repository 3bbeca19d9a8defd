package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Native Spark bucketing: two tables bucketed into the same number of
  * buckets on their join keys must join WITHOUT any shuffle exchange —
  * the co-located large-large join layout (SURVEY §2.3 scale notes; at
  * 100 TB this is how repeated fact-fact joins avoid re-shuffling the
  * big side every query). Complements the self-built
  * `streaming/BucketedTable` (which co-locates the MERGE): this pins
  * that the stock `bucketBy` metadata path works end-to-end too. */
class BucketedJoinSpec extends SparkSuite {

  test("bucketed-table join runs with zero exchanges, same result as plain join") {
    val base = graft.tables.TmpDirs.create("graft-bucketjoin").toString
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_custkey", "c_name", "c_acctbal")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$base/orders_b").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$base/customer_b").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_name").agg(round(sum("o_totalprice"), 2).as("total"))
      val rows = joined.collect()
      assert(rows.nonEmpty)

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // Bucket co-location: the join itself needs NO exchange; the only
      // allowed exchange is the one under the final aggregation.
      val joinPart = plan.split("SortMergeJoin").last // everything below the join
      assert(!joinPart.contains("Exchange"),
        s"join inputs must read bucketed files with no shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan must report bucketed read:\n$plan")

      // Result parity with the plain (shuffled) join on the raw frames.
      val expected = orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_name").agg(round(sum("o_totalprice"), 2).as("total"))
        .collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(rows.map(_.toSeq.mkString("|")).sorted.toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
