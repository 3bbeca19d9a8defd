package graft

import java.nio.file.Files

/** r15 review: corpus-DERIVED query parameters (IVF cell count, LSH
  * signature width) memoize per embeddings-file STAMP
  * (tables/FileStamp), not per (session, dir) — a same-JVM rebuild of
  * the table must re-derive what the DuckDB oracle derives from its
  * live count(*). The corpora STRADDLE the 6→7-bit width boundary
  * (2⁶·128 = 8192) and the assertion is on the MEMOIZED `bits` column:
  * a reverted (session, dir) cache would return the stale 6 for the
  * rebuilt 9000-vector corpus while both corpora's live-recomputed
  * columns (n_vectors) still look plausible — the first version of
  * this spec asserted only those and was vacuous (r15 review). */
class StampInvalidationSpec extends SparkSuite {

  test("auto width re-derives across an in-place rebuild (6 -> 7 bits at the 8192 boundary)") {
    val dir = graft.tables.TmpDirs.create("graft-stamp").toString
    val path = graft.SparkSessions.tablePath(dir, "embeddings")
    def writeCorpus(n: Long): Unit =
      spark.range(n).selectExpr(
          "id AS vec_id",
          "transform(sequence(1, 64), x -> CAST(pmod(id * x, 17) - 8 AS FLOAT)) AS embedding")
        .coalesce(1).write.mode("overwrite").parquet(path)
    def audit() = {
      val r = SparkEntry.queries("sim_lsh_auto_audit")(spark, dir)
        .select("bits", "n_vectors").head()
      (r.getLong(0), r.getLong(1))
    }

    writeCorpus(500)
    assert(audit() == ((6L, 500L)))
    val firstEntry = graft.queries.SimQueries.bitsMemoSnapshotForTest(dir)
    assert(firstEntry.exists(_._2 == 6), s"memo after first build: $firstEntry")

    writeCorpus(9000) // same dir, same session, past the 6-bit boundary
    assert(audit() == ((7L, 9000L)),
      "rebuild kept a stale width derivation — the (session, dir) cache " +
        "class the r15 FileStamp fix removed")
    // r15 directive 6: the memo holds ONE entry per dir — the rebuild
    // REPLACED it (stamp advanced, value re-derived); the old stamp's
    // entry is gone rather than accumulating beside the new one.
    val secondEntry = graft.queries.SimQueries.bitsMemoSnapshotForTest(dir)
    assert(secondEntry.exists(_._2 == 7), s"memo after rebuild: $secondEntry")
    assert(secondEntry.map(_._1) != firstEntry.map(_._1),
      "rebuild did not advance the memo's stamp")
  }
}
