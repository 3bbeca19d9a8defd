package graft

import scala.util.Random

import graft.join.TemporalJoins

/** Property check: the union-window as-of join must equal a naive
  * per-left-row scan ("latest right with rt <= lt, ties by max tiebreak")
  * on seeded random data with deliberately heavy timestamp collisions —
  * the regime where the window ordering details (side before left,
  * tiebreak ascending) actually bite. */
class TemporalJoinPropSpec extends SparkSuite {

  test("asOfJoinBackward == naive scan on colliding random timelines") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    // Few keys, coarse timestamps -> many exact ts collisions both within
    // the right side and across left/right.
    val lefts = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(40) * 10).toLong)
    } // (event_id, key, ms)
    val rights = (1000 until 1400).map { i =>
      (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(40) * 10).toLong)
    } // (rid, key, ms)

    val expected = lefts.map { case (id, k, t) =>
      val cand = rights.filter(r => r._2 == k && r._3 <= t)
      val best = if (cand.isEmpty) None
      else {
        val bestT = cand.map(_._3).max
        Some(cand.filter(_._3 == bestT).map(_._1).max) // max rid on ties
      }
      id -> best
    }.toMap

    val out = TemporalJoins.asOfJoinBackward(
        lefts.toDF("event_id", "user_id", "ms"),
        rights.toDF("rid", "user_id", "rms"),
        key = "user_id", leftTs = "ms", rightTs = "rms",
        payload = Seq("rid"), tieBreak = "rid")
      .select("event_id", "asof_rid")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

    assert(out.size == lefts.size)
    expected.foreach { case (id, want) =>
      assert(out(id) == want, s"left $id: got ${out(id)}, want $want")
    }
  }
}
