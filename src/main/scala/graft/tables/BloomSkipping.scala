package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis.hash60Spark

/** Per-file BLOOM index for POINT lookups — the equality complement to
  * the `_STATS` zone maps: min/max ranges prune nothing for a
  * high-cardinality column the layout is NOT clustered by (every file's
  * [min, max] spans the domain), but a per-file Bloom filter still
  * knocks out every file that cannot contain the key.
  *
  * Build: one aggregation pass collects each file's SET OF SET BITS —
  * `collect_set(position)` is bounded by the filter width m (4096
  * positions here), never by row count, so the manifest collect stays
  * tiny at any scale. The k=3 hash positions ride the engine-public
  * md5/hash60 recipe with an index tag (same family as the Count-Min
  * rows), so membership is reproducible anywhere. `_BLOOM` holds one
  * `file \t hex-bitset` line per data file.
  *
  * Lookup: a key hashes to its k positions; only files whose bitset has
  * ALL k bits set are read (no false negatives by construction; false
  * positives just read an extra file). This is the Databricks
  * bloom-filter-index / parquet bloom analogue, held at FILE rather
  * than row-group granularity so skipped files cost zero IO.
  */
object BloomSkipping {

  val Width = 4096
  val NumHashes = 3

  private def positionExprs(keyExpr: String): Seq[String] =
    (0 until NumHashes).map(i =>
      s"pmod(${hash60Spark(s"concat('$i:', CAST($keyExpr AS STRING))")}, $Width)")

  /** JVM dual of the position computation (bit-identical md5 recipe). */
  def positionsJvm(key: String): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumHashes).map { i =>
      md.reset()
      val hex = md.digest(s"$i:$key".getBytes("UTF-8"))
        .take(8).map(b => f"${b & 0xff}%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % Width).toInt
    }
  }

  /** Build (or rebuild) the `_BLOOM` manifest for `keyCol` over the data
    * files already in `dir`. */
  def buildIndex(spark: SparkSession, dir: String, keyCol: String): Unit = {
    val posCol = explode(array(positionExprs(keyCol).map(expr): _*)).as("pos")
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("file"), posCol)
      .groupBy("file")
      .agg(collect_set("pos").as("bits")) // bounded by Width, not rows
      .collect()
    val base = Paths.get(dir).toUri.toString
    val lines = perFile.map { r =>
      val rel = r.getString(0).stripPrefix(base).stripPrefix("/")
      val bits = new java.util.BitSet(Width)
      r.getSeq[Long](1).foreach(p => bits.set(p.toInt))
      val hex = bits.toByteArray.map(b => f"${b & 0xff}%02x").mkString
      s"$rel\t$hex"
    }.sorted.toSeq
    Files.write(Paths.get(dir, "_BLOOM"), lines.asJava, StandardCharsets.UTF_8)
    ()
  }

  /** Files that MAY contain `key` (all k bits set). No false negatives. */
  def candidateFiles(dir: String, key: String): Seq[String] = {
    val wanted = positionsJvm(key)
    Files.readAllLines(Paths.get(dir, "_BLOOM"), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)
      .flatMap { l =>
        val Array(f, hex) = l.split("\t", 2)
        val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
        val bits = java.util.BitSet.valueOf(bytes)
        if (wanted.forall(bits.get)) Some(f) else None
      }
  }

  /** Point lookup reading ONLY bloom-candidate files; the equality
    * predicate still applies (bloom grains are files, not rows). */
  def scanKey(spark: SparkSession, dir: String, keyCol: String, key: String): DataFrame = {
    val files = candidateFiles(dir, key).map(f => s"$dir/$f")
    if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(files: _*)
      // Column predicate, not SQL-text splicing — key content can't
      // alter the expression.
      .filter(col(keyCol).cast("string") === lit(key))
  }
}
