package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query with an optional DuckDB oracle.
  *
  * Every operator the engine claims (SURVEY.md §2 + the LLM-pipeline
  * extensions) registers one of these: `run` builds the Spark plan over the
  * parquet tables in `sfDir`; `oracle` is equivalent ANSI SQL that DuckDB can
  * execute over the same tables (None for non-SQL-expressible operators,
  * which the driver then checks rows-only).
  *
  * Column names of `run`'s result and the oracle's SELECT list must match
  * exactly: the driver compare sorts columns by name before hashing.
  */
final case class EngineQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[EngineQuery]
}
