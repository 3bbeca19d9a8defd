package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Schema evolution for parquet append tables (the reference documents
  * ADD/RENAME COLUMN plus enforcement on Delta,
  * db/schema_evolution.sql:9-31,115-128; this is the plain-parquet
  * equivalent).
  *
  * Contract:
  *  - ADD COLUMN is free: new files carry the extra column, old files
  *    null-fill it on a mergeSchema read.
  *  - RENAME COLUMN is a metadata-only operation via a `_SCHEMA`
  *    column-mapping manifest (logical name → physical name, the same
  *    mechanism as Delta's column mapping): no file is rewritten — old
  *    AND new files keep the original physical column name, writers
  *    translate logical→physical, readers project physical→logical.
  *  - DROP COLUMN is likewise metadata-only: the physical column is
  *    tombstoned in the manifest, excluded from reads, and its name is
  *    reserved (a later ADD of the same logical name maps to a fresh
  *    physical name — immutable parquet files mean the bytes stay).
  *  - Changing a column's type is REJECTED at write time (enforcement) —
  *    parquet files are immutable, so an incompatible writer would
  *    poison every future read instead of failing fast here.
  *
  * Scale notes: schema validation reads footer metadata only (one file
  * listing, no data IO), and the manifest is a single tiny file read
  * once per query — the rename/drop operations are O(1) regardless of
  * table size, exactly why column mapping exists at 100 TB (a physical
  * rewrite of every file is the alternative). mergeSchema-on-read
  * unions footers across files — at 100 TB pin the table schema in a
  * catalog and use it as the read schema instead of re-deriving per
  * query; `readEvolved` is the catalog-less fallback.
  */
object SchemaEvolution {

  /** Logical→physical column mapping (ordered) plus tombstoned physical
    * names of dropped columns. Physical names never change once written;
    * renames move only the logical side. */
  final case class ColumnMapping(cols: Seq[(String, String)], dropped: Seq[String]) {
    def physicalOf(logical: String): Option[String] =
      cols.find(_._1.equalsIgnoreCase(logical)).map(_._2)
    def logicalOf(physical: String): Option[String] =
      cols.find(_._2.equalsIgnoreCase(physical)).map(_._1)
    def isDropped(physical: String): Boolean =
      dropped.exists(_.equalsIgnoreCase(physical))
    /** Every physical name in use — live or tombstoned (reserved). */
    def physicalNames: Set[String] =
      cols.map(_._2.toLowerCase).toSet ++ dropped.map(_.toLowerCase)
  }

  private def schemaPath(dir: String) = Paths.get(dir, "_SCHEMA")

  /** The manifest, if one exists (tables never renamed/dropped have none
    * and behave identity-mapped). */
  def mappingOf(dir: String): Option[ColumnMapping] = {
    if (!Files.exists(schemaPath(dir))) return None
    val lines = Files.readAllLines(schemaPath(dir)).asScala.filter(_.nonEmpty)
    val cols = lines.collect { case l if l.startsWith("col\t") =>
      val Array(_, logical, physical) = l.split("\t", 3); logical -> physical
    }
    val dropped = lines.collect { case l if l.startsWith("drop\t") =>
      l.split("\t", 2)(1)
    }
    Some(ColumnMapping(cols.toSeq, dropped.toSeq))
  }

  private def writeMapping(dir: String, m: ColumnMapping): Unit = {
    val body = (m.cols.map { case (l, p) => s"col\t$l\t$p" } ++
      m.dropped.map(p => s"drop\t$p")).mkString("\n")
    val tmp = Paths.get(dir, "_SCHEMA.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, schemaPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The table's current mapping, materializing the identity mapping
    * from the physical footer schema when no manifest exists yet. */
  private def effectiveMapping(spark: SparkSession, dir: String): ColumnMapping =
    mappingOf(dir).getOrElse(
      ColumnMapping(physicalSchema(spark, dir).fieldNames.toSeq.map(n => n -> n), Seq.empty))

  /** Union of all file footer schemas — physical names, no mapping. */
  private def physicalSchema(spark: SparkSession, dir: String): StructType =
    spark.read.option("mergeSchema", "true").parquet(dir).schema

  /** RENAME COLUMN old→new: metadata-only manifest update, zero files
    * touched (reference: db/schema_evolution.sql rename + column
    * mapping). Old files and new appends both keep the original
    * physical name. */
  def renameColumn(spark: SparkSession, dir: String, oldName: String, newName: String): Unit = {
    val m = effectiveMapping(spark, dir)
    require(m.physicalOf(oldName).isDefined, s"RENAME COLUMN: no column $oldName in $dir")
    require(m.physicalOf(newName).isEmpty,
      s"RENAME COLUMN: $newName already exists in $dir")
    writeMapping(dir, m.copy(cols = m.cols.map {
      case (l, p) if l.equalsIgnoreCase(oldName) => newName -> p
      case other => other
    }))
  }

  /** DROP COLUMN: metadata-only tombstone — the physical column stays in
    * the immutable files but vanishes from reads, and its physical name
    * stays reserved so a later ADD of the same logical name maps to a
    * fresh physical name. */
  def dropColumn(spark: SparkSession, dir: String, name: String): Unit = {
    val m = effectiveMapping(spark, dir)
    val physical = m.physicalOf(name).getOrElse(
      sys.error(s"DROP COLUMN: no column $name in $dir"))
    writeMapping(dir, ColumnMapping(
      m.cols.filterNot(_._1.equalsIgnoreCase(name)),
      m.dropped :+ physical))
  }

  /** Violations of additive evolution going from `current` to
    * `incoming` (both in LOGICAL names); empty = compatible. */
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

  /** Append `df` (logical column names) to the table dir, enforcing
    * additive-only evolution against the current LOGICAL schema and
    * translating to physical names when a mapping manifest exists. */
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
    if (!hasData) { df.write.mode("append").parquet(dir); return }

    val current = readEvolved(spark, dir).schema
    val violations = validateEvolution(current, df.schema)
    require(violations.isEmpty,
      s"schema evolution rejected for $dir:\n  ${violations.mkString("\n  ")}")

    mappingOf(dir) match {
      case None => df.write.mode("append").parquet(dir)
      case Some(m0) =>
        // Translate logical→physical. A NEW column defaults to physical
        // = logical, unless that physical name is reserved (live under
        // another logical name, or tombstoned by a drop) — then a fresh
        // suffixed physical name is minted and registered.
        var m = m0
        val physCols: Seq[Column] = df.schema.fieldNames.toSeq.map { logical =>
          m.physicalOf(logical) match {
            case Some(p) => col(logical).as(p)
            case None =>
              val fresh =
                if (!m.physicalNames.contains(logical.toLowerCase)) logical
                else Iterator.from(1).map(i => s"${logical}_c$i")
                  .find(c => !m.physicalNames.contains(c.toLowerCase)).get
              m = m.copy(cols = m.cols :+ (logical -> fresh))
              col(logical).as(fresh)
          }
        }
        if (m ne m0) writeMapping(dir, m)
        df.select(physCols: _*).write.mode("append").parquet(dir)
    }
  }

  /** Read the LOGICAL view: union of all file schemas with the mapping
    * manifest applied — renamed columns surface under their logical
    * name across every file generation, dropped columns are excluded,
    * files written before an ADD COLUMN null-fill the added columns. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    mappingOf(dir) match {
      case None => raw
      case Some(m) =>
        val cols = raw.schema.fieldNames.toSeq.flatMap { physical =>
          if (m.isDropped(physical)) None
          else Some(m.logicalOf(physical).map(l => col(physical).as(l)).getOrElse(col(physical)))
        }
        raw.select(cols: _*)
    }
  }
}
