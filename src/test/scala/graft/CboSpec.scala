package graft

import org.apache.spark.sql.catalyst.plans.logical.Join

/** Catalog statistics must reach the planner: ANALYZE TABLE pins exact
  * row counts into plan stats, and with CBO + join reordering enabled a
  * pessimal user-written join order (fact ⋈ fact first, selective dim
  * last) gets rebuilt around the selective dimension. This is §4 of the
  * survey made concrete: the engine leans on Catalyst's CBO rather than
  * hand-scheduling, so the spec proves the stats pipeline feeds it. */
class CboSpec extends SparkSuite {

  test("ANALYZE feeds rowCount stats; CBO reorders a pessimal join") {
    val s = spark
    def mk(name: String, file: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      s.sql(s"CREATE TABLE $name USING PARQUET LOCATION '$sf001/$file.parquet'")
    }
    try {
      mk("cbo_lineitem", "lineitem"); mk("cbo_orders", "orders"); mk("cbo_part", "part")
      Seq("cbo_lineitem", "cbo_orders", "cbo_part").foreach { t =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }

      // Pessimal order: the two facts joined first, the selective dim last.
      def q = s.sql(
        """SELECT count(*) FROM cbo_lineitem l
          |JOIN cbo_orders o ON l.l_orderkey = o.o_orderkey
          |JOIN cbo_part p ON l.l_partkey = p.p_partkey
          |WHERE p.p_size = 1""".stripMargin)
      def deepestJoinTables(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] = {
        val joins = plan.collect { case j: Join => j }
        val deepest = joins.last // bottom-most join in the collected order
        deepest.collectLeaves().flatMap(_.collect {
          case r: org.apache.spark.sql.catalyst.catalog.HiveTableRelation => r.tableMeta.identifier.table
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.catalogTable.map(_.identifier.table).getOrElse("")
        }).toSet
      }

      s.conf.set("spark.sql.cbo.enabled", "false")
      val naive = deepestJoinTables(q.queryExecution.optimizedPlan)
      assert(naive == Set("cbo_lineitem", "cbo_orders"),
        s"control: without CBO the written order stands, got $naive")

      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // ANALYZE's exact row count reaches plan stats (CBO reads it).
      val actual = s.table("cbo_lineitem").count()
      val statRows = s.table("cbo_lineitem").queryExecution.optimizedPlan
        .stats.rowCount
      assert(statRows.contains(BigInt(actual)),
        s"ANALYZE row count $statRows != $actual")
      val reordered = deepestJoinTables(q.queryExecution.optimizedPlan)
      assert(reordered.contains("cbo_part"),
        s"CBO should pull the selective part join down, got $reordered")
    } finally {
      s.conf.set("spark.sql.cbo.enabled", "false")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Seq("cbo_lineitem", "cbo_orders", "cbo_part")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
