package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The JVM gram derivation must be element-identical to the SQL/HOF
  * formulation that the DuckDB oracles mirror — on the real documents
  * table and on crafted short/degenerate docs. */
class GramParitySpec extends SparkSuite {

  private def gramsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    df.select(col("doc_id"), col("grams")).collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[String](1)).map(_.toSeq).orNull).toMap

  test("withGramsJvm == withGrams on the documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val sql = gramsOf(Dedup.withGrams(docs))
    val jvm = gramsOf(Dedup.withGramsJvm(docs))
    assert(sql.keySet == jvm.keySet)
    sql.foreach { case (id, g) =>
      assert(jvm(id) == g, s"doc $id grams diverge: jvm=${jvm(id).take(3)} sql=${g.take(3)}")
    }
  }

  test("withGramsJvm == withGrams on short and messy docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "one two three four five"),
      (2L, "one two three"),
      (3L, "one two"),
      (4L, "one"),
      (5L, "  Padded\tWITH   mixed\nWhitespace  "),
      (6L, "dup dup dup dup"),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(gramsOf(Dedup.withGramsJvm(docs)) == gramsOf(Dedup.withGrams(docs)))
  }

  test("explodedGramsJvm == explode(gramsNSpark(5)), real docs + degenerate docs") {
    val s = spark
    import s.implicits._
    def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    def sqlPath(docs: org.apache.spark.sql.DataFrame) =
      docs.withColumn("toks", expr(graft.text.TextAnalysis.toksSpark))
        .selectExpr("doc_id", "tag", s"${graft.text.TextAnalysis.gramsNSpark(5)} AS grams")
        .selectExpr("doc_id", "tag", "explode(grams) AS gram")
    def jvmPath(docs: org.apache.spark.sql.DataFrame) =
      graft.text.TextAnalysis.explodedGramsJvm(
        docs.select(col("doc_id"), col("tag"), col("text")), 5)

    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "source AS tag", "text")
    assert(pairsOf(jvmPath(real)) == pairsOf(sqlPath(real)))

    val edge = Seq(
      (1L, "t", "one two three four five six seven"),
      (2L, "t", "one two three"),
      (3L, "t", "one"),
      (4L, "t", "  Padded\tWITH   mixed\nWhitespace  "),
      (5L, "t", "dup dup dup dup dup dup dup"),
      (6L, "t", null.asInstanceOf[String])).toDF("doc_id", "tag", "text")
    assert(pairsOf(jvmPath(edge)) == pairsOf(sqlPath(edge)))
  }

  test("explodedGramsPosJvm == explode(gramsNPosSpark(2)), occurrences kept") {
    val s = spark
    import s.implicits._
    // Positional parity must compare MULTISETS (duplicates matter).
    def bagOf(df: org.apache.spark.sql.DataFrame): Map[(Long, String, String), Long] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    def sqlPath(docs: org.apache.spark.sql.DataFrame) =
      docs.withColumn("toks", expr(graft.text.TextAnalysis.toksSpark))
        .selectExpr("doc_id", "tag",
          s"explode(${graft.text.TextAnalysis.gramsNPosSpark(2)}) AS gram")
    def jvmPath(docs: org.apache.spark.sql.DataFrame) =
      graft.text.TextAnalysis.explodedGramsPosJvm(
        docs.select(col("doc_id"), col("tag"), col("text")), 2)

    val real = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "lang AS tag", "text")
    assert(bagOf(jvmPath(real)) == bagOf(sqlPath(real)))

    val edge = Seq(
      (1L, "t", "a b a b a"),
      (2L, "t", "one"),
      (3L, "t", "   "),
      (4L, "t", null.asInstanceOf[String])).toDF("doc_id", "tag", "text")
    assert(bagOf(jvmPath(edge)) == bagOf(sqlPath(edge)))
  }
}
