package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.streaming.IncrementalDedup

/** Incremental streaming dedup must admit exactly the docs the two-gate
  * semantics dictate (within-batch min-id keep policy, then banded
  * check against the admitted corpus), and the admitted corpus must
  * never contain a verified near-dup pair. The expected set is
  * simulated independently in plain Scala from the engine's verified
  * LSH pair relation. */
class IncrementalDedupSpec extends SparkSuite {

  private val threshold = 0.8

  /** The engine's effective pair relation: LSH band collision + exact
    * Jaccard >= threshold (both gates use exactly this criterion). */
  private def pairSet(): Set[(Long, Long)] = {
    val grams = Dedup.gramsCached(spark, s"$sf0001/documents.parquet")
    Dedup.minhashPairs(Dedup.withMinhash(grams), threshold)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def simulate(batches: Seq[Seq[Long]], pairs: Set[(Long, Long)]): Set[Long] = {
    def paired(a: Long, b: Long) = pairs.contains((math.min(a, b), math.max(a, b)))
    var corpus = Set.empty[Long]
    batches.foreach { b =>
      val inBatch = b.toSet
      val keep = b.filter { d =>
        val nbs = b.filter(o => o != d && paired(d, o) && inBatch(o))
        nbs.isEmpty || nbs.min > d // min-id keep policy (clusterReps)
      }
      val admitted = keep.filter(d => !corpus.exists(c => paired(d, c)))
      corpus ++= admitted
    }
    corpus
  }

  test("retrying a batch id is idempotent, including after a half-written crash") {
    val base = graft.tables.TmpDirs.create("graft-incdedup-retry").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")
    val b0 = docs.filter(col("doc_id") < 250)
    val b1 = docs.filter(col("doc_id") >= 250)

    val s0 = IncrementalDedup.admitBatch(spark, b0, 0L, s"$base/corpus", s"$base/index", threshold)
    val s1 = IncrementalDedup.admitBatch(spark, b1, 1L, s"$base/corpus", s"$base/index", threshold)
    def corpusIds() = spark.read.parquet(s"$base/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids = corpusIds()
    assert(ids.distinct == ids, "no duplicate rows")

    // Full at-least-once replay of batch 1: output replaced, not appended.
    val s1r = IncrementalDedup.admitBatch(spark, b1, 1L, s"$base/corpus", s"$base/index", threshold)
    assert(corpusIds() == ids && s1r.admitted == s1.admitted)

    // Crash-shaped replay: batch 1's gram half is missing, bands remain.
    {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(s"$base/index/grams/batch=1")
      val w = Files.walk(root)
      try w.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
    val s1c = IncrementalDedup.admitBatch(spark, b1, 1L, s"$base/corpus", s"$base/index", threshold)
    assert(corpusIds() == ids && s1c.admitted == s1.admitted)
    assert(s0.admitted > 0 && s1.admitted > 0)
  }

  test("compactIndex folds committed batch partitions; admissions unchanged") {
    import scala.jdk.CollectionConverters._
    def copyTree(src: String, dst: String): Unit = {
      val s = Files.walk(java.nio.file.Paths.get(src))
      try s.iterator().asScala.foreach { p =>
        val t = java.nio.file.Paths.get(dst).resolve(java.nio.file.Paths.get(src).relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t) else Files.copy(p, t)
      } finally s.close()
    }
    def partDirs(d: String): Seq[String] = {
      val p = java.nio.file.Paths.get(d)
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("batch=")).toSeq.sorted
      finally s.close()
    }

    val a = graft.tables.TmpDirs.create("graft-incdedup-fold").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id", "text")
    def slice(lo: Int, hi: Int) = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
    (0 to 2).foreach { i =>
      IncrementalDedup.admitBatch(
        spark, slice(i * 125, (i + 1) * 125), i.toLong, s"$a/corpus", s"$a/index", threshold)
    }
    assert(partDirs(s"$a/index/bands").size == 3)

    // Control: identical state, never compacted.
    val b = graft.tables.TmpDirs.create("graft-incdedup-ctrl").toString
    copyTree(a, b)

    val stats = IncrementalDedup.compactIndex(spark, s"$a/index")
    assert(stats("bands") == (3, 2) && stats("grams") == (3, 2),
      s"batches 0+1 fold into a base, the max id stays own partition: $stats")
    assert(partDirs(s"$a/index/bands").toSet == Set("batch=-1", "batch=2"))

    // The next batch admits identically against folded and control index.
    val last = slice(375, 500)
    val sA = IncrementalDedup.admitBatch(spark, last, 3L, s"$a/corpus", s"$a/index", threshold)
    val sB = IncrementalDedup.admitBatch(spark, last, 3L, s"$b/corpus", s"$b/index", threshold)
    def ids(d: String) = spark.read.parquet(s"$d/corpus")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sA.admitted == sB.admitted && ids(a) == ids(b),
      "folding the index must not change a single admission decision")
    assert(sA.admitted < sA.incoming, "the probe batch must actually reject something")

    // Folding again absorbs the old base AND the now-committed batch 2.
    IncrementalDedup.compactIndex(spark, s"$a/index")
    assert(partDirs(s"$a/index/bands").toSet == Set("batch=-2", "batch=3"))
    val sA2 = IncrementalDedup.admitBatch(spark, last, 3L, s"$a/corpus", s"$a/index", threshold)
    assert(sA2.admitted == sA.admitted, "refold keeps the retried batch idempotent")
  }

  test("streamed corpus matches the simulated two-gate admission, no near-dup pairs inside") {
    val base = graft.tables.TmpDirs.create("graft-incdedup").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val batches = ids.grouped((ids.length + 2) / 3).toSeq

    // Replay as a 3-file stream, one file per micro-batch, in id order.
    batches.zipWithIndex.foreach { case (b, i) =>
      docs.filter(col("doc_id").isin(b: _*)).coalesce(1)
        .write.parquet(s"$base/in/b$i")
      Thread.sleep(5) // distinct mtimes keep FileStreamSource order stable
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in/*")
    val q = IncrementalDedup.startIngest(
      stream, s"$base/corpus", s"$base/index", s"$base/cp", threshold)
    q.processAllAvailable(); q.stop()

    val got = spark.read.parquet(s"$base/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pairs = pairSet()
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val expected = simulate(batches.map(_.toSeq), pairs)
    assert(got == expected,
      s"admitted=${got.size} expected=${expected.size}; diff=${(got diff expected) ++ (expected diff got)}")
    assert(got.size < ids.length, "some docs must have been rejected")

    // Invariant: no verified near-dup pair survives inside the corpus.
    assert(!pairs.exists { case (a, b) => got(a) && got(b) },
      "corpus must be near-dup free under the engine's pair relation")

    // Cross-batch rejection actually happened (not all dedup was gate 1):
    // at least one pair spans a batch boundary in the fixture.
    val batchOf = batches.zipWithIndex.flatMap { case (b, i) => b.map(_ -> i) }.toMap
    assert(pairs.exists { case (a, b) => batchOf(a) != batchOf(b) },
      "fixture should exercise the cross-batch gate")
  }
}
