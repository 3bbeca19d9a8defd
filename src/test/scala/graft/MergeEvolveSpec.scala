package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.tables.GraftSql

/** MERGE WITH SCHEMA EVOLUTION: source-only columns widen the target
  * metadata-only; upsert rows carry them physically, old rows null-fill
  * at read; a plain MERGE with the same extra-column source still fails
  * loudly; post-evolution DML is refused by the divergence guard (the
  * documented CTAS-first contract). */
class MergeEvolveSpec extends SparkSuite {

  private def mkTable(tag: String): (String, String) = {
    val dir = graft.tables.TmpDirs.create(s"graft-mev-$tag").toString + "/t"
    val df = spark.sql(
      "SELECT * FROM VALUES (1L, 'a', CAST(10.0 AS DOUBLE)), (2L, 'b', CAST(20.0 AS DOUBLE)), (3L, 'c', CAST(30.0 AS DOUBLE)) AS t(k, s, v)")
    graft.streaming.ParquetTable.swap(spark, df, dir)
    val name = s"mev_${tag}_${java.util.UUID.randomUUID.toString.take(8)}".replace("-", "")
    GraftSql.register(spark, name, dir, Seq("k"))
    (name, dir)
  }

  test("source-only column widens the target; old rows read NULL") {
    val (name, _) = mkTable("widen")
    spark.sql("SELECT * FROM VALUES (2L, 'B', CAST(200.0 AS DOUBLE), 'web'), (9L, 'z', CAST(90.0 AS DOUBLE), 'app') AS t(k, s, v, ch)")
      .createOrReplaceTempView("mev_src1")
    val res = GraftSql.sql(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name AS t USING mev_src1 AS s
         |ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect().head
    assert(res.getAs[Any]("n_upserted").toString == "2")
    val rows = GraftSql.sql(spark, s"SELECT k, s, v, ch FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSeq
    assert(rows == Seq(
      (1L, "a", 10.0, null),        // untouched: new column null-fills
      (2L, "B", 200.0, "web"),      // matched: replaced with the evolved row
      (3L, "c", 30.0, null),
      (9L, "z", 90.0, "app")))      // inserted with the new column
  }

  test("plain MERGE (no evolution) still rejects a wider source's missing target coverage") {
    val (name, _) = mkTable("plain")
    // Source LACKS target column v — both spellings must fail loudly,
    // never silently null a column out.
    spark.sql("SELECT * FROM VALUES (2L, 'B', 'web') AS t(k, s, ch)")
      .createOrReplaceTempView("mev_src2")
    val e = intercept[Exception] {
      GraftSql.sql(spark,
        s"""MERGE WITH SCHEMA EVOLUTION INTO $name USING mev_src2 ON k = k
           |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    }
    assert(e.getMessage.contains("missing"))
  }

  test("post-evolution DML works and preserves the added column (explicit read schema)") {
    val (name, _) = mkTable("guard")
    spark.sql("SELECT * FROM VALUES (2L, 'B', CAST(200.0 AS DOUBLE), 'web') AS t(k, s, v, ch)")
      .createOrReplaceTempView("mev_src3")
    GraftSql.sql(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO $name USING mev_src3 ON k = k
         |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // The UPDATE's rewrite must read with the LOGICAL schema: the file
    // holding k=1 predates ch, the file holding k=2 carries it — a
    // footer-sampled schema would be file-order roulette and could drop
    // ch from the rewritten rows.
    GraftSql.sql(spark, s"UPDATE $name SET v = 0.0 WHERE k <= 2")
    val rows = GraftSql.sql(spark, s"SELECT k, v, ch FROM $name ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(rows == Seq((1L, 0.0, null), (2L, 0.0, "web"), (3L, 30.0, null)))
    // DELETE on the mixed table, same contract.
    GraftSql.sql(spark, s"DELETE FROM $name WHERE k = 1")
    assert(GraftSql.sql(spark, s"SELECT count(*) AS n FROM $name").head.getLong(0) == 2L)
    // RENAME divergence stays refused loudly.
    GraftSql.sql(spark, s"ALTER TABLE $name RENAME COLUMN v TO price")
    val e = intercept[Exception] {
      GraftSql.sql(spark, s"UPDATE $name SET price = 1.0 WHERE k = 2")
    }
    assert(e.getMessage.contains("diverges"))
  }
}
