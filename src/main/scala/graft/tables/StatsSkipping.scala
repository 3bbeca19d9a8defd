package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping for unpartitioned tables — the
  * lakehouse "zone map". Hive-style `part=` trees prune on exact
  * partition values (tables/PartitionedTable); this is the complementary
  * mechanism for a RANGE predicate on a non-partition column:
  *
  *  - `writeWithStats` clusters the data by the stat column
  *    (`repartitionByRange`, so per-file value ranges are tight and
  *    disjoint — the single-dimension analogue of the Z-order rewrite)
  *    and records one `_STATS` manifest line per data file:
  *    `relative-file \t min \t max \t rows`.
  *  - `scanRange(lo, hi)` consults the manifest FIRST and hands Spark
  *    only the files whose [min, max] intersects the predicate — skipped
  *    files cost zero IO, not even a footer read (parquet row-group
  *    pruning still applies inside the files that survive).
  *
  * The manifest collect is bounded by the file count (one tiny row per
  * 128 MB-class file), never by table rows. At 100 TB this is the
  * difference between "open every footer" (row-group stats) and "open
  * 1/N of the files" (file skip) for range-selective scans.
  */
object StatsSkipping {

  /** Range-cluster `df` by `statCol` (a long-typed column) into
    * `numFiles` files under `dir`, then collect per-file min/max/rows
    * into the `_STATS` manifest. */
  def writeWithStats(
      spark: SparkSession,
      df: DataFrame,
      statCol: String,
      dir: String,
      numFiles: Int): Unit = {
    df.repartitionByRange(numFiles, col(statCol))
      .write.mode("overwrite").parquet(dir)
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(statCol).as("mn"), max(statCol).as("mx"), count(lit(1)).as("rows"))
      .collect()
    val base = Paths.get(dir).toUri.toString
    val lines = stats.map { r =>
      val rel = r.getString(0).stripPrefix(base).stripPrefix("/")
      s"$rel\t${r.getLong(1)}\t${r.getLong(2)}\t${r.getLong(3)}"
    }.sorted.toSeq
    Files.write(Paths.get(dir, "_STATS"),
      lines.asJava, StandardCharsets.UTF_8)
    ()
  }

  private final case class FileStat(file: String, mn: Long, mx: Long, rows: Long)

  private def manifest(dir: String): Seq[FileStat] =
    Files.readAllLines(Paths.get(dir, "_STATS"), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty).map { l =>
        val Array(f, mn, mx, rows) = l.split('\t')
        FileStat(f, mn.toLong, mx.toLong, rows.toLong)
      }

  /** Files whose [min, max] intersects [lo, hi] — what a scan must read. */
  def liveFiles(dir: String, lo: Long, hi: Long): Seq[String] =
    manifest(dir).filter(s => s.mx >= lo && s.mn <= hi).map(_.file)

  /** Range scan that reads ONLY the manifest-qualified files. The
    * predicate is still applied (file grains are coarser than rows). */
  def scanRange(
      spark: SparkSession,
      dir: String,
      statCol: String,
      lo: Long,
      hi: Long): DataFrame = {
    val files = liveFiles(dir, lo, hi).map(f => s"$dir/$f")
    val pred = col(statCol).between(lo, hi)
    if (files.isEmpty)
      // Nothing qualifies: keep the schema (one footer read), no rows.
      spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }
}
