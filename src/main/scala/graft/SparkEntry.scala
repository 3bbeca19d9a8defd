package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{EngineQuery, QueryModule}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every module's named queries into the flat maps the driver
  * harness consumes. Each query key corresponds to an operator row in
  * SURVEY.md §2 (or an LLM-pipeline extension) and, where the semantics are
  * SQL-expressible, carries an equivalent DuckDB oracle.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.queries.AnalyticsQueries,
    graft.queries.CdcQueries,
    graft.queries.ScdQueries,
    graft.queries.TextQueries,
    graft.queries.DedupQueries,
    graft.queries.SimQueries,
    graft.queries.EventsQueries,
    graft.queries.JoinQueries,
    graft.queries.SketchQueries,
    graft.queries.SampleQueries,
    graft.queries.StorageQueries,
    graft.queries.MultimodalQueries,
    graft.queries.SqlSurfaceQueries
  )

  private lazy val all: Seq[EngineQuery] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full CDC pipeline end-to-end: generate → parse → union → stateful
    * transaction buffering → assemble → flatten. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_order_stream_flat")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
