package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.plans.GeneratedPartitionRule

/** GeneratedPartitionRule: a filter on the generation SOURCE column
  * (ts) must plant PartitionFilters on the derived partition column
  * (event_date = CAST(ts AS DATE)) — and must never change results. */
class GeneratedPartitionSpec extends SparkSuite {

  private def seed(): String = {
    val s = spark
    import s.implicits._
    val dir = graft.tables.TmpDirs.create("graft-genpart")
      .resolve("t").toString
    val rows = for {
      d <- 1 to 6
      h <- Seq(1, 12, 23)
    } yield (java.sql.Timestamp.valueOf(f"2024-03-0$d $h%02d:30:00"), s"u$h", 1.0 * d)
    rows.toDF("ts", "who", "v")
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    dir
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectFirst { case f: FileSourceScanExec => f }.get

  test("ts-only range filter derives event_date PartitionFilters and prunes directories") {
    val dir = seed()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    GeneratedPartitionRule.register(dir, "event_date", "ts")
    try {
      def q(sess: org.apache.spark.sql.SparkSession) = sess.read.parquet(dir)
        .filter(col("ts") >= java.sql.Timestamp.valueOf("2024-03-03 12:00:00") &&
          col("ts") < java.sql.Timestamp.valueOf("2024-03-05 12:00:00"))
        .groupBy("who").agg(count(lit(1)).as("n"), round(sum("v"), 2).as("sv"))

      val scan = scanOf(q(s2))
      val pf = scan.partitionFilters
        .filterNot(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
        .filter(_.references.exists(_.name == "event_date"))
      assert(pf.size == 2, s"derived lower+upper date bounds, got: ${scan.partitionFilters}")
      // Directory-level pruning is real: 6 day dirs exist, 3 qualify
      // (the widened [2024-03-03, 2024-03-05] date window).
      assert(scan.selectedPartitions.partitionCount == 3,
        s"expected 3 surviving date dirs, got ${scan.selectedPartitions.partitionCount}")

      // Results identical with the derivation off — the rule only adds
      // IMPLIED predicates. (Strict-bound widening matters here: rows at
      // 2024-03-03 23:30 and 2024-03-05 01:30 are inside ts range but at
      // the edge dates.)
      val withRule = q(s2).collect().map(_.toSeq).toSet
      GeneratedPartitionRule.unregister(dir)
      val bare = q(s2).collect().map(_.toSeq).toSet
      assert(withRule == bare, "derived filters must not change results")
      assert(scanOf(q(s2)).partitionFilters.isEmpty, "no derivation once unregistered")
    } finally GeneratedPartitionRule.unregister(dir)
  }

  test("no refire when the user already filters the partition column; equality derives one day") {
    val dir = seed()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    GeneratedPartitionRule.register(dir, "event_date", "ts")
    try {
      // User mentions event_date themself → rule must leave the plan alone.
      val manual = s2.read.parquet(dir)
        .filter(col("event_date") === java.sql.Date.valueOf("2024-03-02") &&
          col("ts") >= java.sql.Timestamp.valueOf("2024-03-02 10:00:00"))
      val mpf = scanOf(manual).partitionFilters
        .filterNot(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
        .filter(_.references.exists(_.name == "event_date"))
      assert(mpf.size == 1, s"user's own filter only, got: $mpf")

      // ts equality → event_date equality, one directory survives.
      val eq = s2.read.parquet(dir)
        .filter(col("ts") === java.sql.Timestamp.valueOf("2024-03-04 12:30:00"))
      assert(scanOf(eq).selectedPartitions.partitionCount == 1)
      assert(eq.count() == 1L)
    } finally GeneratedPartitionRule.unregister(dir)
  }
}
