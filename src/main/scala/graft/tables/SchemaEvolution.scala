package graft.tables

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Additive schema evolution for parquet append tables (the reference
  * documents ADD/RENAME COLUMN plus enforcement on Delta,
  * db/schema_evolution.sql:9-31,115-128; this is the plain-parquet
  * equivalent).
  *
  * Contract:
  *  - ADD COLUMN is free: new files carry the extra column, old files
  *    null-fill it on a mergeSchema read.
  *  - Dropping a column or changing a column's type is REJECTED at write
  *    time (enforcement) — parquet files are immutable, so an
  *    incompatible writer would poison every future read instead of
  *    failing fast here.
  *  - RENAME is modeled as ADD(new) + stop writing old (parquet has no
  *    in-place rename without a table format's column-mapping metadata).
  *
  * Scale notes: schema validation reads footer metadata only (one file
  * listing, no data IO). mergeSchema-on-read unions footers across
  * files — at 100 TB pin the table schema in a catalog and use it as
  * the read schema instead of re-deriving per query; `readEvolved` is
  * the catalog-less fallback.
  */
object SchemaEvolution {

  /** Violations of additive evolution going from `current` to
    * `incoming`; empty = compatible. */
  def validateEvolution(current: StructType, incoming: StructType): Seq[String] =
    current.fields.toSeq.flatMap { f =>
      incoming.fields.find(_.name.equalsIgnoreCase(f.name)) match {
        case None =>
          Some(s"column ${f.name} would be dropped (additive evolution only)")
        case Some(g) if g.dataType != f.dataType =>
          Some(s"column ${f.name} would change type " +
            s"${f.dataType.simpleString} -> ${g.dataType.simpleString}")
        case _ => None
      }
    }

  /** Append `df` to the table dir, enforcing additive-only evolution
    * against the data already there. */
  def appendEvolved(spark: SparkSession, df: DataFrame, dir: String): Unit = {
    // Guard on actual parquet data, not bare directory existence — a
    // pre-created empty dir must behave like a first write.
    val hasData = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.exists(p) && {
        val s = java.nio.file.Files.walk(p)
        try s.iterator().asScala.exists { f =>
          java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet")
        } finally s.close()
      }
    }
    if (hasData) {
      val current = readEvolved(spark, dir).schema
      val violations = validateEvolution(current, df.schema)
      require(violations.isEmpty,
        s"schema evolution rejected for $dir:\n  ${violations.mkString("\n  ")}")
    }
    df.write.mode("append").parquet(dir)
  }

  /** Read with the union of all file schemas; files written before an
    * ADD COLUMN null-fill the added columns. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)
}
