package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The anchor cap on banded LSH candidate generation
  * (`Dedup.bandCandidates`): a pair survives iff its smaller doc_id
  * ranks ≤ maxBucket within its band bucket. Three contracts:
  *
  *  1. a NON-BINDING cap is pair-for-pair identical to the uncapped
  *     join (so the production default changes nothing on sane data);
  *  2. a binding cap yields a subset, bounded per bucket by s·cap;
  *  3. CANDIDATE connectivity survives: every bucket member still
  *     pairs with the bucket's lowest doc_id. (Verified-pair clusters
  *     can still differ under a binding cap when verification rejects
  *     anchor pairs — this fixture's cluster is all-identical text, so
  *     here anchors always verify and the doc sets match.)
  */
class DedupCapSpec extends SparkSuite {

  // A corpus with one dense near-dup cluster (shared text, tiny
  // perturbations keep them in one band bucket with high probability)
  // plus distinct singletons.
  private lazy val mh = {
    val s = spark
    import s.implicits._
    val cluster = (0 until 12).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again " +
        "and keeps jumping until the end of the line"))
    val singles = (100 until 110).map(i =>
      (i.toLong, s"completely unrelated document number $i about topic-$i " +
        s"with its own vocabulary item-$i thing-$i stuff-$i"))
    Dedup.withMinhash(Dedup.withGramsJvm((cluster ++ singles).toDF("doc_id", "text")))
      .cache()
  }

  test("non-binding cap is identical to uncapped") {
    val capped = Dedup.bandCandidates(mh, maxBucket = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.bandCandidates(mh, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == uncapped)
    assert(capped.nonEmpty, "the dense cluster must produce candidates")
  }

  test("binding cap is a bounded subset that preserves bucket connectivity") {
    val uncapped = Dedup.bandCandidates(mh, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.bandCandidates(mh, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.size < uncapped.size, "cap=2 must bite on a 12-doc bucket")

    // Every doc that appears in ANY uncapped pair still appears in a
    // capped pair (anchors connect the whole bucket through rank 1).
    val docsUncapped = uncapped.flatMap(p => Set(p._1, p._2))
    val docsCapped = capped.flatMap(p => Set(p._1, p._2))
    assert(docsUncapped == docsCapped,
      "anchor capping must not orphan any bucket member")

    // Bound: smaller side of every capped pair ranks ≤ 2 in its bucket,
    // so with a single 12-doc bucket the volume is ≤ 2·12 per band.
    assert(capped.size <= 2 * 12 * 4)
  }

  test("verified pairs at a binding cap are a subset with same clusters") {
    val full = Dedup.minhashPairs(mh, 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashPairs(mh, 0.8, maxBucket = 2)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(full))
    assert(capped.flatMap(p => Set(p._1, p._2)) == full.flatMap(p => Set(p._1, p._2)))
  }
}
