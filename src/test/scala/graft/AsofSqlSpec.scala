package graft

import graft.tables.GraftSql

/** The ASOF [LEFT] JOIN SQL spelling (GraftSql rewrite onto the
  * union-window TemporalJoins plan): backward/forward direction, the
  * inclusive bound, LEFT outer null-fill, flipped-side normalization,
  * clause-tail composition, and loud rejection of unsupported shapes.
  * Literal frames so every expectation is hand-checkable. */
class AsofSqlSpec extends SparkSuite {

  private def seed(): Unit = {
    spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 5L)
        |  t(pid, uid, ms)""".stripMargin.replace("t(", "AS t("))
      .createOrReplaceTempView("asof_l")
    spark.sql(
      """SELECT * FROM VALUES
        |  (7L, 100L, 10L), (8L, 100L, 20L), (9L, 300L, 1L)
        |  t(cid, uid, ms)""".stripMargin.replace("t(", "AS t("))
      .createOrReplaceTempView("asof_r")
  }

  test("backward inner: most recent right at-or-before, unmatched dropped") {
    seed()
    val rows = GraftSql.sql(spark,
      """SELECT l.pid AS pid, r.cid AS cid, l.ms - r.ms AS gap
        |FROM asof_l l ASOF JOIN asof_r r
        |  ON l.uid = r.uid AND l.ms >= r.ms
        |ORDER BY l.pid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // pid=1 at ms=10 matches cid=7 at ms=10 (inclusive); pid=2 at 25
    // matches cid=8 at 20; pid=3 (uid 200) has no match and is dropped.
    assert(rows == Seq((1L, 7L, 0L), (2L, 8L, 5L)))
  }

  test("LEFT outer keeps unmatched left rows null-filled") {
    seed()
    val rows = GraftSql.sql(spark,
      """SELECT l.pid AS pid, r.cid AS cid
        |FROM asof_l l ASOF LEFT JOIN asof_r r
        |  ON l.uid = r.uid AND l.ms >= r.ms
        |ORDER BY l.pid""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows(2).getLong(0) == 3L && rows(2).isNullAt(1))
  }

  test("forward variant (<=) picks the earliest right at-or-after; flipped sides normalize") {
    seed()
    val fwd = GraftSql.sql(spark,
      """SELECT l.pid AS pid, r.cid AS cid
        |FROM asof_l l ASOF JOIN asof_r r
        |  ON l.uid = r.uid AND l.ms <= r.ms
        |ORDER BY l.pid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // pid=1 at 10 -> earliest at-or-after is cid=7 (ms=10, inclusive);
    // pid=2 at 25 -> nothing at-or-after for uid 100 -> dropped.
    assert(fwd == Seq((1L, 7L)))

    // r.ms <= l.ms is the same backward join written from the right.
    val flipped = GraftSql.sql(spark,
      """SELECT l.pid AS pid, r.cid AS cid
        |FROM asof_l l ASOF JOIN asof_r r
        |  ON l.uid = r.uid AND r.ms <= l.ms
        |ORDER BY l.pid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flipped == Seq((1L, 7L), (2L, 8L)))
  }

  test("WHERE tail composes and alias refs rewrite inside it") {
    seed()
    val rows = GraftSql.sql(spark,
      """SELECT l.pid AS pid FROM asof_l l ASOF JOIN asof_r r
        |  ON l.uid = r.uid AND l.ms >= r.ms
        |WHERE r.cid = 8 ORDER BY l.pid""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(2L))
  }

  test("unsupported shapes fail loudly") {
    seed()
    // Two inequalities.
    val e1 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "SELECT l.pid FROM asof_l l ASOF JOIN asof_r r ON l.ms >= r.ms AND l.uid >= r.uid")
    }
    assert(e1.getMessage.contains("exactly one key equality"))
    // Unknown alias in a condition.
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "SELECT l.pid FROM asof_l l ASOF JOIN asof_r r ON x.uid = r.uid AND l.ms >= r.ms")
    }
    assert(e2.getMessage.contains("unknown aliases"))
    // Non-column condition.
    val e3 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "SELECT l.pid FROM asof_l l ASOF JOIN asof_r r ON l.uid = r.uid AND l.ms >= r.ms + 5")
    }
    assert(e3.getMessage.contains("unsupported ON condition"))
    // An asof alias REDEFINED by a subquery in the tail: the whole-
    // statement alias rewrite would mangle the inner refs into
    // nonexistent prefixed columns — must refuse with the explicit
    // message, not a confusing analyzer error (r12, ADVICE).
    val e4 = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        """SELECT l.pid FROM asof_l l ASOF JOIN asof_r r
          |  ON l.uid = r.uid AND l.ms >= r.ms
          |WHERE l.pid IN (SELECT l.pid FROM asof_l l WHERE l.ms > 0)""".stripMargin)
    }
    assert(e4.getMessage.contains("also defined"), e4.getMessage)
    // ...but the guard must not false-fire on FROM inside an ordinary
    // expression (r12 review: a \S+ source pattern swallowed
    // `extract(epoch FROM ...) AS l` and refused a valid statement).
    val ok = GraftSql.sql(spark,
      """SELECT l.pid, extract(YEAR FROM timestamp_seconds(l.ms)) AS l
        |FROM asof_l l ASOF JOIN asof_r r
        |  ON l.uid = r.uid AND l.ms >= r.ms""".stripMargin)
    assert(ok.count() > 0)
  }

  test("TIMESTAMP time columns work (converted to epoch millis internally)") {
    seed()
    spark.sql(
      """SELECT pid, uid, timestamp_millis(ms * 1000) AS ts FROM asof_l"""
    ).createOrReplaceTempView("asof_lt")
    spark.sql(
      """SELECT cid, uid, timestamp_millis(ms * 1000) AS ts FROM asof_r"""
    ).createOrReplaceTempView("asof_rt")
    val rows = GraftSql.sql(spark,
      """SELECT l.pid AS pid, r.cid AS cid
        |FROM asof_lt l ASOF JOIN asof_rt r
        |  ON l.uid = r.uid AND l.ts >= r.ts
        |ORDER BY l.pid""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 7L), (2L, 8L)))
    // Unsupported time type (string) is refused with a usable message.
    spark.sql("SELECT pid, uid, CAST(ms AS STRING) AS ts FROM asof_l")
      .createOrReplaceTempView("asof_ls")
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark,
        "SELECT l.pid FROM asof_ls l ASOF JOIN asof_rt r ON l.uid = r.uid AND l.ts >= r.ts")
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("'asof' as an ordinary identifier is not hijacked") {
    spark.sql("SELECT 42L AS asof").createOrReplaceTempView("asof_idtbl")
    val r = GraftSql.sql(spark, "SELECT asof FROM asof_idtbl ORDER BY asof")
    assert(r.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }
}
