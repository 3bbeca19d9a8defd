package graft

import java.io.IOException

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A filesystem whose stats always fail — the injection point for
  * FileStampSpec: `graftfail://` URIs route here via the
  * `fs.graftfail.impl` conf, and every exists/getFileStatus throws the
  * transient-IO class FileStamp must never turn into a stable key. */
class FailingStatFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfail"
  override def getUri: java.net.URI = java.net.URI.create("graftfail:///")
  // RawLocalFileSystem overrides exists() with a direct File.exists —
  // it never routes through getFileStatus — so BOTH stat doors throw.
  override def exists(f: Path): Boolean =
    throw new IOException(s"injected stat failure for $f")
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    throw new IOException(s"injected stat failure for $f")
  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    throw new IOException(s"injected stat failure for $f")
}

/** r15 directive 3: a transient IOException from the FS stat must NOT
  * produce the same stable stamp as a nonexistent dir — that aliased
  * every blip with the missing-dir state AND with every other blip, so
  * a parameter memoized during one blip could be served for the next
  * (a stale-parameter class the stamp exists to prevent). Errors now
  * stamp uniquely: nothing is ever memoized under an errored stat. */
class FileStampSpec extends SparkSuite {

  private def stamp(path: String): String = graft.tables.FileStamp(spark, path)

  test("missing dir stays a STABLE stamp (the legitimate shared key)") {
    val p = "/tmp/graft-filestamp-definitely-missing"
    assert(stamp(p).endsWith("@-1"))
    assert(stamp(p) == stamp(p))
  }

  test("an injected stat failure yields a UNIQUE stamp per call — no memo is " +
      "ever served from an error-keyed entry") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfail.impl", classOf[FailingStatFs].getName)
    val p = "graftfail:///corpus/embeddings"
    val e1 = stamp(p)
    val e2 = stamp(p)
    assert(e1.contains("@!err-"), s"error stamp shape: $e1")
    // The classifier memo consumers branch on: error stamps are
    // "state unknown" (bypass — no serve, no evict); good and
    // missing-dir stamps are cacheable.
    assert(graft.tables.FileStamp.isError(e1) && graft.tables.FileStamp.isError(e2))
    assert(!graft.tables.FileStamp.isError(
      stamp("/tmp/graft-filestamp-definitely-missing")))
    assert(e1 != e2, "two stat failures aliased to one cache key")
    assert(!e1.endsWith("@-1") && !e2.endsWith("@-1"),
      "an IO error aliased the missing-dir stamp — the r15 defect")
    // The contract every stamp-keyed memo inherits: an errored stat can
    // never HIT (each error is a fresh key), so a value computed during
    // a blip is never served to a later call.
    val memo = scala.collection.concurrent.TrieMap.empty[String, Int]
    var computes = 0
    def lookup(): Int = memo.getOrElseUpdate(stamp(p), { computes += 1; computes })
    lookup(); lookup()
    assert(computes == 2, "a memo was served from an error-keyed entry")
  }
}
