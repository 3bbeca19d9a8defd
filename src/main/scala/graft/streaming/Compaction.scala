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
  *  - The swap staggers through a `.trash` subdir: old files are moved
  *    aside before the new ones land and deleted last, so a crash leaves
  *    either the old files recoverable or the new files fully in place —
  *    never a half-deleted table.
  *  - Run it as a maintenance job while no stream is WRITING the dir.
  *    A downstream `readStream` sees the compacted files as new input;
  *    with the idempotent SCD1 merge that is converge-only (re-applying
  *    already-applied versions is a no-op), but best practice is to
  *    compact between stream lifecycles and reset downstream
  *    checkpoints.
  *
  * At 100 TB the same job runs per partition/bucket with `targetBytes`
  * tuned to the scan stripe size; `coalesce` keeps it a narrow, one-pass
  * rewrite (no shuffle).
  */
object Compaction {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  final case class CompactionStats(
      filesBefore: Int, filesAfter: Int, bytes: Long, compacted: Boolean)

  /** Parquet data files under `dir` (any depth), excluding metadata. */
  def dataFiles(dir: String): Seq[Path] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(Files.isRegularFile(_))
      .filter { p =>
        val name = p.getFileName.toString
        name.endsWith(".parquet") && !name.startsWith("_") && !name.startsWith(".") &&
          !p.iterator().asScala.exists(seg => seg.toString == "_spark_metadata" ||
            seg.toString.startsWith(".trash"))
      }
      .toSeq

  /** Bin-pack `dir` toward `targetBytes` per file. No-op when the
    * directory already meets the target file count. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = DefaultTargetBytes): CompactionStats = {
    val files = dataFiles(dir)
    val totalBytes = files.map(Files.size(_)).sum
    val targetFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    if (files.size <= targetFiles)
      return CompactionStats(files.size, files.size, totalBytes, compacted = false)

    // Read through Spark: honors _spark_metadata (committed files only).
    val df = spark.read.parquet(dir)
    val tmp = s"$dir.compacting"
    df.coalesce(targetFiles).write.mode("overwrite").parquet(tmp)
    val newFiles = dataFiles(tmp)

    // Stage out the old state (data files + sink log), bring in the new.
    val trash = Files.createDirectories(Paths.get(dir, s".trash-${System.nanoTime()}"))
    files.foreach(f => Files.move(f, trash.resolve(f.getFileName)))
    val metaLog = Paths.get(dir, "_spark_metadata")
    if (Files.exists(metaLog)) Files.move(metaLog, trash.resolve("_spark_metadata"))
    newFiles.zipWithIndex.foreach { case (f, i) =>
      Files.move(f, Paths.get(dir, f"part-$i%05d-compacted.parquet"))
    }
    // Point of no return passed: new files are fully in place. Clean up.
    Seq(trash, Paths.get(tmp)).foreach { root =>
      Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
    CompactionStats(files.size, newFiles.size, totalBytes, compacted = true)
  }
}
