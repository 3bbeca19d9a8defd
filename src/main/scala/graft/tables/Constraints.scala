package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ParquetTable

/** Write-time CHECK constraints for snapshot tables — the lakehouse
  * `ALTER TABLE ADD CONSTRAINT ... CHECK` surface. Constraints persist in
  * a table-root `_CHECKS` manifest (`name \t sql-expression` lines) and
  * are enforced by [[checkedSwap]] BEFORE a new version publishes: a
  * violating batch never becomes readable, the previous snapshot stays
  * live. SQL CHECK semantics: a row violates only when the expression is
  * FALSE — NULL passes (unknown ≠ violation).
  *
  * Enforcement cost at scale: one aggregate pass over the batch with all
  * checks fused as `count_if(NOT coalesce(check, true))` columns — a
  * single job, no per-check scans, map-side combined.
  */
object Constraints {

  private def manifest(dir: String) = Paths.get(dir, "_CHECKS")

  /** Register a named CHECK; rejects duplicates. Validates the live
    * snapshot immediately if one exists, like ADD CONSTRAINT does. */
  def addCheck(spark: SparkSession, dir: String, name: String, expression: String): Unit = {
    require(!name.contains("\t") && !name.contains("\n"), s"bad check name: $name")
    require(checks(dir).forall(_._1 != name), s"duplicate check: $name")
    if (ParquetTable.exists(dir))
      validate(ParquetTable.read(spark, dir), Seq(name -> expression)) match {
        case Some(err) => throw new IllegalStateException(
          s"existing rows violate new check: $err")
        case None => ()
      }
    Files.createDirectories(Paths.get(dir))
    Files.writeString(manifest(dir), s"$name\t$expression\n",
      StandardCharsets.UTF_8, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }

  /** Remove a named CHECK (ALTER TABLE ... DROP CONSTRAINT). Unknown
    * names fail loudly — a typo must not silently leave the real
    * constraint in force while the user believes it gone. */
  def dropCheck(dir: String, name: String): Unit = {
    val existing = checks(dir)
    require(existing.exists(_._1 == name), s"no such check: $name")
    val remaining = existing.filterNot(_._1 == name)
    val tmp = Paths.get(dir, "_CHECKS.tmp")
    Files.writeString(tmp,
      remaining.map { case (n, e) => s"$n\t$e" }.mkString("", "\n", if (remaining.isEmpty) "" else "\n"),
      StandardCharsets.UTF_8)
    Files.move(tmp, manifest(dir),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def checks(dir: String): Seq[(String, String)] =
    if (!Files.exists(manifest(dir))) Seq.empty
    else Files.readAllLines(manifest(dir), StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map { l => val Array(n, e) = l.split("\t", 2); n -> e }

  /** One fused pass over `df`: per-check violation counts; Some(report)
    * if any check fails. */
  def validate(df: DataFrame, cs: Seq[(String, String)]): Option[String] = {
    if (cs.isEmpty) return None
    // coalesce(sum, 0): sum() is NULL over an empty batch, and an empty
    // batch violates nothing — it must publish, not NPE on getLong.
    val counters = cs.map { case (n, e) =>
      coalesce(sum(when(not(coalesce(expr(e), lit(true))), 1L).otherwise(0L)), lit(0L)).as(n)
    }
    val row = df.agg(counters.head, counters.tail: _*).head()
    val bad = cs.zipWithIndex.collect {
      case ((n, e), i) if row.getLong(i) > 0 => s"$n ($e): ${row.getLong(i)} rows"
    }
    if (bad.isEmpty) None else Some(bad.mkString("; "))
  }

  /** Validate against the table's registered checks, then swap — a
    * violating batch never publishes. */
  def checkedSwap(spark: SparkSession, df: DataFrame, dir: String): Unit =
    validate(df, checks(dir)) match {
      case Some(err) => throw new IllegalArgumentException(s"CHECK constraint violation: $err")
      case None      => ParquetTable.swap(spark, df, dir)
    }
}
