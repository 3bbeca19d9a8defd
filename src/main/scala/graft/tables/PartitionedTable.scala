package graft.tables

import org.apache.spark.sql.DataFrame

/** Hive-style partitioned parquet layout — the 100 TB table layout
  * primitive the flat testdata files don't exercise on their own.
  *
  * WHY: at cluster scale a fact table is laid out as
  * `dir/part_col=value/...` so that (a) a filter on the partition column
  * prunes whole directories at PLANNING time (`PartitionFilters` on the
  * scan — zero IO for excluded partitions, where parquet footer stats
  * still cost a footer read per file), and (b) incremental jobs replace
  * only the partitions they touch (dynamic partition overwrite) instead
  * of rewriting the table. The reference gets both from Delta's
  * partitioned tables; this is the vanilla-parquet equivalent.
  */
object PartitionedTable {

  /** Full write: one `part=value` directory per distinct value. */
  def write(df: DataFrame, dir: String, partCols: Seq[String]): Unit =
    df.write.partitionBy(partCols: _*).mode("overwrite").parquet(dir)

  /** Dynamic partition overwrite: replaces ONLY the partitions present
    * in `df`, leaves every other partition's files untouched — the
    * incremental daily-backfill primitive. (Static overwrite — the
    * default — would drop the whole table first.) */
  def overwritePartitions(df: DataFrame, dir: String, partCols: Seq[String]): Unit =
    df.write
      .partitionBy(partCols: _*)
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(dir)
}
