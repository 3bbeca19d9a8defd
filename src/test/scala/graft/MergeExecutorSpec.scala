package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.scd.{BatchFlattener, MergeExecutor}

/** Clause-order semantics of the SCD1 merge (SURVEY.md §4.3; reference:
  * ScdType1MergeApp.scala:83-132) on hand-built micro-batches. Structs and
  * array elements carry a `tag` naming the row that produced them, so
  * version ties are observable: reference semantics say the TARGET wins
  * struct ties (:223, strict `>`) and array-element ties (:241, `>=` drops
  * the source element).
  */
class MergeExecutorSpec extends SparkSuite {

  /** Build an orders_current-shaped DataFrame from compact tuples:
    * (orderId, version, status, xid, detailVersion, lineItems(id, ver)).
    * Structs get `tag` = the row's xid; pass lineItems = null for a NULL
    * array (vs Nil for an empty one). */
  private def cur(rows: Seq[(Double, java.lang.Double, String, String, java.lang.Double, Seq[(Double, Double)])]): DataFrame = {
    val sql = rows.map { case (oid, v, st, xid, dv, lis) =>
      val liExpr =
        if (lis == null) "CAST(NULL AS array<struct<lineItemId:double,version:double,tag:string>>)"
        else if (lis.isEmpty) "CAST(array() AS array<struct<lineItemId:double,version:double,tag:string>>)"
        else lis.map { case (id, lv) =>
          s"named_struct('lineItemId', CAST($id AS DOUBLE), 'version', CAST($lv AS DOUBLE), 'tag', '$xid')"
        }.mkString("array(", ",", ")")
      val dvExpr = if (dv == null) "CAST(NULL AS struct<version:double,tag:string>)"
                   else s"named_struct('version', CAST($dv AS DOUBLE), 'tag', '$xid')"
      val vExpr = if (v == null) "CAST(NULL AS DOUBLE)" else s"CAST($v AS DOUBLE)"
      s"""SELECT '$xid' AS xid, 'c' AS csn, 'ts' AS dwhProcessedTs,
         |CAST($oid AS DOUBLE) AS orderId, 'R' AS orderRef, $vExpr AS version,
         |'d' AS orderDate, 'd' AS orderTs, '$st' AS orderStatus, 't' AS orderType,
         |CAST(1.0 AS DOUBLE) AS totalAmount, 'USD' AS currency, 'c1' AS customerId,
         |'a1' AS shippingAddressId, 'ct' AS createdTs,
         |CAST(NULL AS struct<orderId:double>) AS orderBefore,
         |$dvExpr AS orderDetails,
         |$liExpr AS lineItems""".stripMargin.replace("\n", " ")
    }.mkString(" UNION ALL ")
    spark.sql(sql)
  }

  private def byId(df: DataFrame) =
    df.selectExpr("orderId", "version", "orderStatus", "xid",
        "orderDetails.version AS dv",
        "CAST(size(lineItems) AS INT) AS nli")
      .collect().map(r => r.getDouble(0) -> r).toMap

  /** (lineItemId, version, tag) triples of the single output row. */
  private def liTags(df: DataFrame): Seq[(Double, Double, String)] =
    df.selectExpr("explode(lineItems) AS li")
      .selectExpr("li.lineItemId", "li.version", "li.tag")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getString(2))).sorted.toSeq

  test("clause 1: higher source version replaces parent and context") {
    val target = cur(Seq((1.0, 1.0, "OLD", "t1", 1.0, Seq((10.0, 1.0)))))
    val source = cur(Seq((1.0, 2.0, "NEW", "s1", null, Nil)))
    val r = byId(MergeExecutor.merge(target, source))
    assert(r(1.0).getString(2) == "NEW" && r(1.0).getDouble(1) == 2.0)
    assert(r(1.0).getString(3) == "s1", "context from source")
    assert(r(1.0).getDouble(4) == 1.0, "target detail preserved when source has none")
    assert(r(1.0).getInt(5) == 1, "target line items preserved")
  }

  test("catch-all clause: same version keeps parent fields, updates context and children") {
    val target = cur(Seq((1.0, 2.0, "KEEP", "t1", 1.0, Seq((10.0, 1.0)))))
    val source = cur(Seq((1.0, null, "IGNORED", "s1", 2.0, Seq((10.0, 2.0), (11.0, 1.0)))))
    val r = byId(MergeExecutor.merge(target, source))
    assert(r(1.0).getString(2) == "KEEP", "parent not replaced (source.version null)")
    assert(r(1.0).getString(3) == "s1", "context still updated")
    assert(r(1.0).getDouble(4) == 2.0, "higher-version detail struct wins")
    assert(r(1.0).getInt(5) == 2, "line items merged by key+version")
  }

  test("parent version tie: target fields win, context still updates (reference :223 strict >)") {
    val target = cur(Seq((1.0, 1.0, "ORIGINAL", "t1", null, null)))
    val source = cur(Seq((1.0, 1.0, "REDELIVERED", "s1", null, null)))
    val r = byId(MergeExecutor.merge(target, source))
    assert(r(1.0).getString(2) == "ORIGINAL", "equal source version must NOT replace parent fields")
    assert(r(1.0).getString(3) == "s1", "catch-all clause still refreshes tx context")
  }

  test("struct merge tie: target detail wins (reference :223 strict >)") {
    val target = cur(Seq((1.0, 1.0, "A", "t1", 1.0, null)))
    val source = cur(Seq((1.0, 1.0, "A", "s1", 1.0, null)))
    val tag = MergeExecutor.merge(target, source)
      .selectExpr("orderDetails.tag").collect().head.getString(0)
    assert(tag == "t1", "detail version tie must keep the target struct")
  }

  test("insert guard: child-only source rows do not insert orphans") {
    val target = cur(Seq((1.0, 1.0, "A", "t1", null, Nil)))
    val source = cur(Seq(
      (2.0, null, "ORPHAN", "s1", 2.0, Nil), // version null → blocked
      (3.0, 1.0, "NEWROW", "s2", null, Nil))) // version present → inserted
    val r = byId(MergeExecutor.merge(target, source))
    assert(!r.contains(2.0), "orphan blocked")
    assert(r.contains(3.0) && r(3.0).getString(2) == "NEWROW")
    assert(r.contains(1.0), "unreferenced target passes through")
    assert(r(1.0).getString(3) == "t1", "untouched target keeps its context")
  }

  test("array merge: target wins version ties, stale source elements dropped (reference :241-242)") {
    val target = cur(Seq((1.0, 1.0, "A", "t1", null, Seq((10.0, 2.0), (11.0, 1.0)))))
    val source = cur(Seq((1.0, 2.0, "B", "s1", null, Seq((10.0, 1.0), (11.0, 1.0), (12.0, 1.0)))))
    val li = liTags(MergeExecutor.merge(target, source))
    // 10: target v2 beats stale source v1; 11: tie → TARGET element kept;
    // 12: new from source.
    assert(li == Seq((10.0, 2.0, "t1"), (11.0, 1.0, "t1"), (12.0, 1.0, "s1")))
  }

  test("array merge: empty arrays are treated as missing (reference :238-239)") {
    // Source array empty, target NULL → result NULL (not []).
    val t1 = cur(Seq((1.0, 1.0, "A", "t1", null, null)))
    val s1 = cur(Seq((1.0, 1.0, "A", "s1", null, Nil)))
    val out1 = MergeExecutor.merge(t1, s1)
      .selectExpr("lineItems IS NULL AS isnull").collect().head.getBoolean(0)
    assert(out1, "empty source + NULL target must yield NULL, not []")
    // Target array empty → source taken wholesale.
    val t2 = cur(Seq((1.0, 1.0, "A", "t2", null, Nil)))
    val s2 = cur(Seq((1.0, 1.0, "A", "s2", null, Seq((12.0, 1.0)))))
    assert(liTags(MergeExecutor.merge(t2, s2)) == Seq((12.0, 1.0, "s2")))
  }

  test("merge is idempotent: re-applying the same source is a no-op") {
    val target = cur(Seq((1.0, 1.0, "A", "t1", 1.0, Seq((10.0, 1.0)))))
    val source = cur(Seq((1.0, 2.0, "B", "s1", 2.0, Seq((10.0, 2.0)))))
    val once = MergeExecutor.merge(target, source)
    val twice = MergeExecutor.merge(once, source)
    val a = once.orderBy("orderId").collect().map(_.toString).toSeq
    val b = twice.orderBy("orderId").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
