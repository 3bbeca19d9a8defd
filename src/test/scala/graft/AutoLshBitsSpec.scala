package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The auto LSH signature-width rule (r14 directive 1): bits = the
  * smallest b in [6, 20] with 2^b · 128 ≥ N — pure-integer, so the
  * DuckDB dual recomputes it bit-identically from its own count(*).
  * Pins the widths at the corpus scales every measurement cites, the
  * E[bucket] ≤ 128 invariant across the whole range, and the floor/cap
  * ends. */
class AutoLshBitsSpec extends AnyFunSuite {

  private def bits(n: Long) = SimQueries.autoLshBits(n)

  test("widths at the cited scales: gate/bench floor at 6, sf1 → 8, sf10 → 11") {
    assert(bits(500) == 6)    // sf0.001 / sf0.01 embeddings
    assert(bits(2000) == 6)   // sf0.1
    assert(bits(8192) == 6)   // the exact floor boundary: 2^6 * 128
    assert(bits(8193) == 7)
    assert(bits(20000) == 8)  // sf1
    assert(bits(200000) == 11) // sf10
  }

  test("E[bucket] = N / 2^bits stays <= 128 until the 20-bit cap") {
    var n = 1L
    while (n <= (128L << 20)) {
      val b = bits(n)
      assert(n <= (128L << b), s"N=$n bits=$b: expected bucket ${n >> b} > 128")
      assert(b >= 6 && b <= 20)
      n = n * 3 + 7
    }
    // Past the cap the rule REFUSES loudly (a silent saturate would face
    // a NULL-bucket oracle — r15 review), naming the knob to raise.
    val e = intercept[IllegalArgumentException] { bits((128L << 20) + 1) }
    assert(e.getMessage.contains("LshMaxBits"))
  }

  test("monotone in N — a bigger corpus never gets a narrower signature") {
    val ns = Seq(1L, 100L, 8192L, 8193L, 50000L, 1000000L, 100000000L)
    ns.zip(ns.tail).foreach { case (a, b) =>
      assert(bits(a) <= bits(b), s"bits($a) > bits($b)")
    }
  }
}
