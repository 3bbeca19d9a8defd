package graft

import scala.util.Random

import graft.dedup.Dedup
import graft.sim.Similarity

/** Property checks for the distributed pair operators against naive
  * single-loop references on seeded random data: the fingerprint-band
  * join must be pigeonhole-COMPLETE (no pair within maxHamming lost) and
  * the triangle block join must enumerate every qualifying pair exactly
  * once, for corpus sizes that straddle the block/band bucket shapes.
  */
class PairOpsPropSpec extends SparkSuite {

  test("banded simhashPairs == naive all-pairs scan (random fingerprints)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // Clustered fingerprints so small Hamming distances actually occur.
    val seeds = Array.fill(40)(rnd.nextLong() & 0xffffffffL)
    val fps = (0 until 400).map { i =>
      val base = seeds(rnd.nextInt(seeds.length))
      val flips = rnd.nextInt(9) // 0..8 bit flips: straddles maxHamming
      val fp = (0 until flips).foldLeft(base)((f, _) => f ^ (1L << rnd.nextInt(32)))
      (i.toLong, fp)
    }
    for (maxH <- Seq(0, 3, 6)) {
      val expected = (for {
        a <- fps.iterator
        b <- fps.iterator
        if a._1 < b._1
        h = java.lang.Long.bitCount(a._2 ^ b._2)
        if h <= maxH
      } yield (a._1, b._1, h)).toSet
      val got = Dedup.simhashPairs(s, fps.toDF("doc_id", "simhash"), maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expected, s"maxHamming=$maxH: banded join lost or invented pairs")
      assert(expected.nonEmpty || maxH == 0, s"maxHamming=$maxH: degenerate fixture")
    }
  }

  test("triangle block join == naive all-pairs cosine (random vectors, several block counts)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    val vecs = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val threshold = 0.2
    val expected = (for {
      a <- vecs.iterator
      b <- vecs.iterator
      if a._1 < b._1
      cos = Similarity.cosineJvm(a._2, b._2)
      if cos >= threshold
    } yield (a._1, b._1, Similarity.round6(cos))).toSet
    assert(expected.nonEmpty, "degenerate fixture")
    val df = vecs.toDF("vec_id", "embedding")
    // 1 block (single group), 7 (ids not divisible), 16 (more blocks than
    // some groups have members) — every layout must agree exactly.
    for (b <- Seq(1, 7, 16)) {
      val got = Similarity.bruteForcePairs(s, df, threshold, numBlocks = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected, s"numBlocks=$b: block join lost, invented or duplicated pairs")
    }
  }
}
