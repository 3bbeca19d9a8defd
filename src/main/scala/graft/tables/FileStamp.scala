package graft.tables

import org.apache.spark.sql.SparkSession

/** THE rebuild-detection stamp every parameter/plan memo keys on:
  * `<path>@<max data-file mtime>.<total data-file length>` through the
  * Hadoop filesystem API (storage-agnostic — a java.nio stat is
  * false/zero on hdfs:// or s3a:// URIs). Stamping the FILES rather
  * than the directory matters twice (r14 ADVICE): object stores report
  * constant/zero mtimes for directory markers, and on 1s-granularity
  * filesystems a same-second rewrite would alias — the length term
  * catches it when the payload size changed. One FS stat/list per
  * call; whatever the stamp guards stays memoized.
  *
  * One definition shared by the IVF index caches (IvfIndex.cacheKey)
  * and the corpus-derived query parameters (SimQueries autoK/autoBits)
  * so the two cache classes cannot drift apart (r15 review). */
object FileStamp {
  private val errSeq = new java.util.concurrent.atomic.AtomicLong()

  /** True for the unique per-call stamps an errored stat produces.
    * Memo consumers must treat these as "state unknown": neither serve
    * a cached value under one (it may be stale) nor evict/replace the
    * last GOOD entry because of one (a blip must not unpersist healthy
    * caches or drop a healthy index — r16 review). Anchored at the
    * stamp SUFFIX (after the last '@'): the prefix is the caller's
    * path, and a path that happens to contain "@!err-" must not make
    * every good stamp classify as errored. */
  def isError(stamp: String): Boolean =
    stamp.substring(stamp.lastIndexOf('@') + 1).startsWith("!err-")

  def apply(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp =
      try {
        if (!fs.exists(p)) "-1"
        else {
          val st = fs.getFileStatus(p)
          val files = if (st.isFile) Array(st) else fs.listStatus(p).filter(_.isFile)
          if (files.isEmpty) "-1"
          else s"${files.map(_.getModificationTime).max}.${files.map(_.getLen).sum}"
        }
      } catch {
        // A TRANSIENT stat failure must never be a STABLE cache key
        // (r15 review): mapping IOException to the same "-1" as a
        // missing dir let two blips in one session alias each other
        // (and the missing-dir state), so a memo computed during the
        // first blip was served for the second. Every error gets a
        // UNIQUE stamp — "memoize nothing on error": the next
        // successful stat re-keys correctly, and in the meantime each
        // errored call recomputes rather than trusting a possibly
        // blip-corrupted value.
        case _: java.io.IOException => s"!err-${errSeq.incrementAndGet()}"
      }
    s"$path@$stamp"
  }
}
