package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** r15 review: corpus-DERIVED query parameters (IVF cell count, LSH
  * signature width) memoize per embeddings-file STAMP, not per
  * (session, dir) — a same-JVM rebuild of the table must re-derive
  * what the DuckDB oracle derives from its live count(*). Pinned by
  * rebuilding a dir's embeddings in place and checking the gated
  * audit row tracks the new corpus. */
class StampInvalidationSpec extends SparkSuite {

  test("sim_lsh_auto_audit re-derives after the embeddings file is rebuilt in place") {
    val dir = Files.createTempDirectory("graft-stamp").toString
    def install(srcDir: String): Unit = {
      val src = Paths.get(graft.SparkSessions.tablePath(srcDir, "embeddings"))
      val dst = Paths.get(graft.SparkSessions.tablePath(dir, "embeddings"))
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
      // 1s-granularity filesystems could alias a same-second rewrite —
      // the stamp also carries the byte length, which differs here; be
      // explicit about the property under test anyway.
      dst.toFile.setLastModified(System.currentTimeMillis())
      ()
    }
    val audit = SparkEntry.queries("sim_lsh_auto_audit")

    install(sf0001) // 500 vectors
    val n1 = audit(spark, dir).select("n_vectors").head().getLong(0)
    assert(n1 == 500L, s"first derivation saw $n1 vectors")

    install("/root/testdata/sf0.1") // 2000 vectors, same dir, same session
    val n2 = audit(spark, dir).select("n_vectors").head().getLong(0)
    assert(n2 == 2000L,
      s"rebuild kept a stale derivation: audit saw $n2 vectors (want 2000) — " +
        "the (session, dir) cache class the r15 stamp fix removed")
  }
}
