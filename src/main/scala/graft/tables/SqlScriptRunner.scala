package graft.tables

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** SQL script runner (reference: SeedJob.scala:38-63): reads `*.sql`
  * scripts sorted by name, splits statements on `;`, strips `--` comment
  * lines and blanks, runs each through `spark.sql`. Adds `${var}`
  * substitution so DDL can point at environment-specific locations
  * (the reference hardcodes warehouse paths; we parameterize).
  */
object SqlScriptRunner {

  def substitute(sql: String, vars: Map[String, String]): String =
    vars.foldLeft(sql) { case (s, (k, v)) => s.replace("${" + k + "}", v) }

  def statements(script: String): Seq[String] =
    script
      .linesIterator.filterNot(_.trim.startsWith("--")).mkString("\n")
      .split(";")
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq

  def runScript(spark: SparkSession, script: String, vars: Map[String, String] = Map.empty): Unit =
    statements(substitute(script, vars)).foreach(spark.sql(_))

  /** Run every `*.sql` in `dir`, sorted by file name. */
  def runDir(spark: SparkSession, dir: String, vars: Map[String, String] = Map.empty): Unit = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
    files.foreach(f => runScript(spark, Files.readString(f), vars))
  }

  /** Run a classpath resource script. */
  def runResource(spark: SparkSession, resource: String, vars: Map[String, String] = Map.empty): Unit = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"resource not found: $resource")
    val text = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    runScript(spark, text, vars)
  }
}
