package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction for streaming append tables.
  *
  * The parquet append sink produces one file set per micro-batch forever,
  * so a long-running stream degrades every downstream scan (open/seek
  * cost per file, tiny row groups, starved IO readahead). The reference
  * handles this with Delta `OPTIMIZE` and a ~128 MB file-health target
  * (reference: db/table_maintenance.sql:28-31,121-125); this is the
  * plain-parquet equivalent: bin-pack the committed data into
  * ceil(bytes / targetBytes) files via a shuffle-free `coalesce` rewrite.
  *
  * Semantics and safety:
  *  - Reads through Spark, so a `_spark_metadata` sink log is honored —
  *    only COMMITTED data is carried over; uncommitted stragglers from a
  *    crashed stream are dropped with the log (which this job removes:
  *    after compaction the directory is a plain parquet dir).
  *  - The swap is NOT atomic (a plain filesystem cannot replace many
  *    files in one operation), but it is CRASH-RECOVERABLE: a
  *    `_COMPACTING` marker naming the trash dir and run id is written
  *    before anything moves, old files are moved (not deleted) to the
  *    trash, and the marker is removed only after the new files are all
  *    in place. `compact` rolls back any interrupted prior run first, so
  *    data is never lost and the table never stays partial past the next
  *    maintenance run. Readers racing the swap window can see a partial
  *    table — run it while nothing reads or writes the dir.
  *  - A downstream `readStream` sees the compacted files as new input;
  *    with the idempotent SCD1 merge that is converge-only, but best
  *    practice is to compact between stream lifecycles and reset
  *    downstream checkpoints.
  *
  * At 100 TB the same job runs per partition/bucket with `targetBytes`
  * tuned to the scan stripe size; `coalesce` keeps it a narrow, one-pass
  * rewrite (no shuffle).
  */
object Compaction {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  final case class CompactionStats(
      filesBefore: Int, filesAfter: Int, bytes: Long, compacted: Boolean)

  private def marker(dir: String) = Paths.get(dir, "_COMPACTING")

  /** Parquet data files under `dir` (any depth), excluding metadata.
    * Hidden/metadata segments are checked RELATIVE to `dir` — the walk
    * root itself may legitimately be a dot-dir (the rewrite side dir). */
  def dataFiles(dir: String): Seq[Path] = {
    val root = Paths.get(dir)
    val s = Files.walk(root)
    val all = try s.iterator().asScala.toSeq finally s.close()
    all
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val name = p.getFileName.toString
        name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith(".") &&
          !root.relativize(p).iterator().asScala.exists(seg =>
            seg.toString == "_spark_metadata" ||
              seg.toString.startsWith(".")) // hidden dirs: .trash-*, .compacting
      }
  }

  /** Roll back an interrupted compaction: delete that run's partially
    * moved output, restore every staged-out file, drop the marker. */
  def recover(dir: String): Boolean = {
    if (!Files.exists(marker(dir))) return false
    val Array(trashName, runId) = Files.readString(marker(dir)).trim.split("\t", 2)
    val trash = Paths.get(dir, trashName)
    // Remove this run's (possibly partial) output — names carry the run id.
    dataFiles(dir).filter(_.getFileName.toString.contains(s"-compacted-$runId"))
      .foreach(Files.deleteIfExists(_))
    if (Files.exists(trash)) {
      val s = Files.list(trash)
      val staged = try s.iterator().asScala.toSeq finally s.close()
      staged.foreach(f => Files.move(f, Paths.get(dir, f.getFileName.toString)))
      Files.deleteIfExists(trash)
    }
    Files.deleteIfExists(marker(dir))
    true
  }

  /** Leaf partition directories of a hive-style tree (`col=value`
    * segments), or empty when `dir` is a flat table. */
  def partitionDirs(dir: String): Seq[Path] = {
    def leaves(p: Path): Seq[Path] = {
      val s = Files.list(p)
      val kids = try s.iterator().asScala.toSeq finally s.close()
      val parts = kids.filter(k => Files.isDirectory(k) && k.getFileName.toString.contains("="))
      if (parts.isEmpty) Seq(p) else parts.flatMap(leaves)
    }
    if (!Files.isDirectory(Paths.get(dir))) Seq.empty
    else leaves(Paths.get(dir)).filter(_ != Paths.get(dir))
  }

  /** Compact every leaf partition of a hive-partitioned table
    * independently — each leaf is a flat parquet dir, so the rewrite
    * never sees (and can never flatten) the partition layout. This is
    * also the 100 TB shape: partitions compact in parallel maintenance
    * jobs, touched partitions only.
    *
    * A root `_spark_metadata` sink log (partitioned STREAMING append) is
    * retired first: uncommitted straggler files from a crashed stream
    * are dropped and the log removed, exactly like the flat path — the
    * per-leaf rewrites below are log-unaware, and leaving a log behind
    * would point readers at files the rewrite deletes. */
  def compactPartitions(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = DefaultTargetBytes): Seq[(String, CompactionStats)] = {
    retireSinkLog(spark, dir)
    partitionDirs(dir).map { p =>
      Paths.get(dir).relativize(p).toString -> compact(spark, p.toString, targetBytes)
    }
  }

  /** Z-order every leaf partition independently (see zorder/
    * compactPartitions): partition pruning handles the partition
    * columns, the z-value handles the clustered columns WITHIN each
    * partition — the standard two-level layout at 100 TB. */
  def zorderPartitions(
      spark: SparkSession,
      dir: String,
      cols: Seq[String],
      targetBytes: Long = DefaultTargetBytes): Seq[(String, CompactionStats)] = {
    retireSinkLog(spark, dir)
    partitionDirs(dir).map { p =>
      Paths.get(dir).relativize(p).toString -> zorder(spark, p.toString, cols, targetBytes)
    }
  }

  /** Drop files the sink log never committed, then remove the log —
    * after this the tree is a plain (partitioned) parquet dir. */
  private def retireSinkLog(spark: SparkSession, dir: String): Unit = {
    val metaLog = Paths.get(dir, "_spark_metadata")
    if (!Files.exists(metaLog)) return
    // Log-aware read: inputFiles is exactly the committed file set.
    val committed = spark.read.parquet(dir).inputFiles
      .map(u => Paths.get(java.net.URI.create(u)).toAbsolutePath.normalize).toSet
    dataFiles(dir)
      .filterNot(f => committed.contains(f.toAbsolutePath.normalize))
      .foreach(Files.deleteIfExists(_))
    VersionNames.deleteTree(metaLog)
  }

  /** Bin-pack `dir` toward `targetBytes` per file. No-op when the
    * directory already meets the target file count. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = DefaultTargetBytes): CompactionStats = {
    require(partitionDirs(dir).isEmpty,
      s"$dir is hive-partitioned — use compactPartitions (a flat rewrite would drop the partition layout)")
    recover(dir) // roll back a crashed prior run before anything else

    val files = dataFiles(dir)
    val totalBytes = files.map(Files.size(_)).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (files.size <= targetFiles)
      return CompactionStats(files.size, files.size, totalBytes, compacted = false)

    val newCount = rewrite(spark, dir, files, _.coalesce(targetFiles))
    CompactionStats(files.size, newCount, totalBytes, compacted = true)
  }

  /** Z-order rewrite: bin-pack like `compact` AND cluster the rows by the
    * Morton interleave of `cols` (`tables.ZOrder`), so every output file
    * carries a narrow min-max span in every listed column — the parquet
    * data-skipping layout Delta's `OPTIMIZE ZORDER BY` produces
    * (reference: db/table_maintenance.sql OPTIMIZE guidance). Unlike
    * `compact` this always rewrites (the point is the layout, not the
    * file count) and pays one range-partition shuffle. */
  def zorder(
      spark: SparkSession,
      dir: String,
      cols: Seq[String],
      targetBytes: Long = DefaultTargetBytes): CompactionStats = {
    require(partitionDirs(dir).isEmpty,
      s"$dir is hive-partitioned — z-order each partition dir (a flat rewrite would drop the layout)")
    recover(dir)

    val files = dataFiles(dir)
    if (files.isEmpty) // nothing committed yet — same no-op as compact
      return CompactionStats(0, 0, 0L, compacted = false)
    val totalBytes = files.map(Files.size(_)).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val newCount =
      rewrite(spark, dir, files, graft.tables.ZOrder.cluster(_, cols, targetFiles))
    CompactionStats(files.size, newCount, totalBytes, compacted = true)
  }

  /** Crash-recoverable swap (see the object doc): write the transformed
    * table to a side dir, stage the old files out through a `_COMPACTING`
    * marker + trash, move the new files in, drop the marker last. */
  private def rewrite(
      spark: SparkSession,
      dir: String,
      files: Seq[Path],
      transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Int = {
    // Read through Spark: honors _spark_metadata (committed files only).
    val df = spark.read.parquet(dir)
    // The side dir lives INSIDE the table as a dot-hidden child (ignored
    // by every Spark file index and by dataFiles): a sibling name like
    // "<leaf>.compacting" would sit inside the PARENT of a partition
    // leaf, parse as a bogus partition value after a crash, and poison
    // partition-type inference for the whole tree.
    val tmp = s"$dir/.compacting"
    transform(df).write.mode("overwrite").parquet(tmp)
    val newFiles = dataFiles(tmp)

    // Marker first, then stage out the old state, then bring in the new;
    // the marker is dropped last so every crash window rolls back.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val trashName = s".trash-$runId"
    val tmpMarker = Paths.get(dir, "_COMPACTING.tmp")
    Files.writeString(tmpMarker, s"$trashName\t$runId")
    Files.move(tmpMarker, marker(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val trash = Files.createDirectories(Paths.get(dir, trashName))
    files.foreach(f => Files.move(f, trash.resolve(f.getFileName)))
    val metaLog = Paths.get(dir, "_spark_metadata")
    if (Files.exists(metaLog)) Files.move(metaLog, trash.resolve("_spark_metadata"))
    newFiles.zipWithIndex.foreach { case (f, i) =>
      Files.move(f, Paths.get(dir, f"part-$i%05d-compacted-$runId.parquet"))
    }
    Files.deleteIfExists(marker(dir)) // point of no return: swap committed
    Seq(trash, Paths.get(tmp)).foreach(VersionNames.deleteTree)
    newFiles.size
  }
}
