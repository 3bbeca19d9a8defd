package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the lakehouse "zone map". Hive
  * `part=` trees prune on exact partition values (tables/
  * PartitionedTable); this is the complementary mechanism for RANGE
  * predicates on non-partition columns:
  *
  *  - `writeWithStats` clusters the data by the stat column(s) — a
  *    range sort for one column, a Z-order (Morton) rewrite
  *    (tables/ZOrder) for several, so per-file spans stay tight in
  *    EVERY listed dimension — and records one `_STATS` manifest line
  *    per data file: `file \t rows \t min/max per column`.
  *  - `scanBox` consults the manifest FIRST and hands Spark ONLY the
  *    files whose per-column [min, max] intersects every range of the
  *    query box — skipped files cost zero IO, not even a footer read
  *    (parquet row-group pruning still applies inside survivors).
  *
  * The manifest collect is bounded by the file count (one tiny row per
  * 128 MB-class file), never by table rows. At 100 TB this is the
  * difference between "open every footer" (row-group stats) and "open
  * 1/N of the files" (file skip) for range-selective scans — in any of
  * the z-ordered dimensions, not just a sort prefix.
  */
object StatsSkipping {

  /** Cluster `df` by `statCols` (long-typed) into `numFiles` files under
    * `dir` — range sort for 1 column, a space-filling curve for 2+
    * (`curve`: "z" = Morton interleave, "hilbert" = Hilbert walk, 2-D
    * only) — then collect per-file min/max/rows into the `_STATS`
    * manifest. Pruning reads only the manifest, so the curve choice is
    * invisible to scanBox — it just changes how many files survive. */
  def writeWithStats(
      spark: SparkSession,
      df: DataFrame,
      statCols: Seq[String],
      dir: String,
      numFiles: Int,
      curve: String = "z"): Unit = {
    require(statCols.nonEmpty, "need at least one stat column")
    require(curve == "z" || curve == "hilbert", s"unknown curve: $curve")
    val clustered =
      if (statCols.size == 1) df.repartitionByRange(numFiles, col(statCols.head))
      else if (curve == "hilbert") HilbertOrder.cluster(df, statCols, numFiles)
      else ZOrder.cluster(df, statCols, numFiles)
    clustered.write.mode("overwrite").parquet(dir)
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), aggs: _*)
      .collect()
    val base = Paths.get(dir).toUri.toString
    // The layout curve rides in the header so appends replay it instead
    // of silently re-clustering a Hilbert table with Morton.
    val header = (("#cols" +: statCols) :+ s"#curve=$curve").mkString("\t")
    val lines = stats.map { r =>
      val rel = r.getString(0).stripPrefix(base).stripPrefix("/")
      val mm = statCols.indices.flatMap(i =>
        Seq(r.getLong(2 + 2 * i).toString, r.getLong(3 + 2 * i).toString))
      (Seq(rel, r.getLong(1).toString) ++ mm).mkString("\t")
    }.sorted.toSeq
    Files.write(Paths.get(dir, "_STATS"),
      (header +: lines).asJava, StandardCharsets.UTF_8)
    ()
  }

  /** Single-column convenience (the 1-dim zone map). */
  def writeWithStats(
      spark: SparkSession, df: DataFrame, statCol: String,
      dir: String, numFiles: Int): Unit =
    writeWithStats(spark, df, Seq(statCol), dir, numFiles)

  /** Incremental append: cluster ONLY the new batch by the manifested
    * columns, land it as extra files, and extend `_STATS` with their
    * stats — the steady-state ingest path (a full re-cluster stays a
    * maintenance op, like OPTIMIZE). New files may overlap old ranges;
    * skipping stays correct because pruning is per-file, it just gets
    * gradually less selective until the next full rewrite. */
  def appendWithStats(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      numFiles: Int): Unit = {
    val (cols, curve, existing) = manifest(dir)
    val clustered =
      if (cols.size == 1) df.repartitionByRange(numFiles, col(cols.head))
      else if (curve == "hilbert") HilbertOrder.cluster(df, cols, numFiles)
      else ZOrder.cluster(df, cols, numFiles)
    val before = dataFileNames(dir)
    clustered.write.mode("append").parquet(dir)
    val fresh = dataFileNames(dir) -- before
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = spark.read.parquet(fresh.toSeq.sorted.map(f => s"$dir/$f"): _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), aggs: _*)
      .collect()
    val base = Paths.get(dir).toUri.toString
    val freshLines = stats.map { r =>
      val rel = r.getString(0).stripPrefix(base).stripPrefix("/")
      val mm = cols.indices.flatMap(i =>
        Seq(r.getLong(2 + 2 * i).toString, r.getLong(3 + 2 * i).toString))
      (Seq(rel, r.getLong(1).toString) ++ mm).mkString("\t")
    }.toSeq
    val oldLines = existing.map { s =>
      val mm = cols.flatMap { c => val (mn, mx) = s.mm(c); Seq(mn.toString, mx.toString) }
      (Seq(s.file, s.rows.toString) ++ mm).mkString("\t")
    }
    val header = (("#cols" +: cols) :+ s"#curve=$curve").mkString("\t")
    Files.write(Paths.get(dir, "_STATS"),
      (header +: (oldLines ++ freshLines).sorted).asJava, StandardCharsets.UTF_8)
    ()
  }

  private def dataFileNames(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet

  private final case class FileStat(file: String, rows: Long, mm: Map[String, (Long, Long)])

  private def manifest(dir: String): (Seq[String], String, Seq[FileStat]) = {
    val lines = Files.readAllLines(Paths.get(dir, "_STATS"), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
    val headerToks = lines.head.split('\t').toSeq.tail
    val cols = headerToks.filterNot(_.startsWith("#curve="))
    val curve = headerToks.collectFirst {
      case t if t.startsWith("#curve=") => t.stripPrefix("#curve=")
    }.getOrElse("z") // pre-r5 manifests carried no curve token
    val stats = lines.tail.map { l =>
      val parts = l.split('\t')
      val mm = cols.zipWithIndex.map { case (c, i) =>
        c -> (parts(2 + 2 * i).toLong, parts(3 + 2 * i).toLong)
      }.toMap
      FileStat(parts(0), parts(1).toLong, mm)
    }
    (cols, curve, stats)
  }

  /** Files whose stats box intersects EVERY queried range. Ranges may
    * cover any subset of the manifested columns. */
  def liveFiles(dir: String, ranges: Seq[(String, Long, Long)]): Seq[String] = {
    val (cols, _, stats) = manifest(dir)
    val unknown = ranges.map(_._1).filterNot(cols.contains)
    require(unknown.isEmpty, s"no stats for columns: $unknown")
    stats.filter { s =>
      ranges.forall { case (c, lo, hi) =>
        val (mn, mx) = s.mm(c); mx >= lo && mn <= hi
      }
    }.map(_.file)
  }

  /** Single-column convenience. */
  def liveFiles(dir: String, lo: Long, hi: Long): Seq[String] = {
    val (cols, _, _) = manifest(dir)
    liveFiles(dir, Seq((cols.head, lo, hi)))
  }

  /** Box scan reading ONLY manifest-qualified files; the residual
    * predicate still applies (file grains are coarser than rows). */
  def scanBox(
      spark: SparkSession,
      dir: String,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    val files = liveFiles(dir, ranges).map(f => s"$dir/$f")
    val pred = ranges.map { case (c, lo, hi) => col(c).between(lo, hi) }
      .reduceLeft(_ && _)
    if (files.isEmpty)
      // Nothing qualifies: keep the schema (one footer read), no rows.
      spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*).filter(pred)
  }

  /** Single-column range scan. */
  def scanRange(
      spark: SparkSession, dir: String, statCol: String,
      lo: Long, hi: Long): DataFrame =
    scanBox(spark, dir, Seq((statCol, lo, hi)))

  /** METADATA-ONLY aggregate pushdown: `COUNT(*)` plus `MIN`/`MAX` of
    * every manifested column answered from `_STATS` alone — the
    * Delta/Iceberg "metadata-only query" path (Spark's equivalent is
    * the OptimizeMetadataOnlyQuery rule over partition listings). Total
    * rows = Σ per-file rows; global min/max = min of file mins / max of
    * file maxes. ZERO data-file IO — not even a footer — because the
    * manifest is written atomically with the layout and this format
    * carries no deletion vectors (StatsAggSpec proves it by deleting
    * the data files and re-answering). Cost at 100 TB: one manifest
    * read, bounded by FILE count, never rows — the difference between
    * a full scan and a millisecond for the commonest dashboard query.
    * Returns one row: `n_rows`, then `min_<c>`, `max_<c>` per
    * manifested column (NULL mins/maxes for an empty table). */
  def aggFromManifest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val (cols, _, stats) = manifest(dir)
    val mm: Seq[Any] = cols.flatMap { c =>
      if (stats.isEmpty) Seq(null, null)
      else Seq(stats.map(_.mm(c)._1).min, stats.map(_.mm(c)._2).max)
    }
    val schema = StructType(
      StructField("n_rows", LongType, nullable = false) +:
        cols.flatMap(c => Seq(
          StructField(s"min_$c", LongType), StructField(s"max_$c", LongType))))
    spark.createDataFrame(
      java.util.Collections.singletonList(
        Row.fromSeq(stats.map(_.rows).sum +: mm)),
      schema)
  }
}
