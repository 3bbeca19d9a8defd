package graft

class SparkEntrySpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracle key exists in queries") {
    val qk = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keys.foreach(k => assert(qk.contains(k)))
  }
}
