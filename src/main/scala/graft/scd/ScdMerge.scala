package graft.scd

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL expression builders for the SCD1 merge algebra
  * (reference: ScdType1MergeApp.scala:212-244 — dedupExpr,
  * mergeStructExpr, mergeArrayExpr; semantics documented in SURVEY.md §4.3).
  * All are higher-order-function SQL strings: codegen-friendly, no UDFs.
  */
object ScdExpressions {

  /** Keep the max-version element per `key` within one array. Elements that
    * tie on (key, version) all survive, matching the reference's NOT EXISTS
    * formulation (reference: ScdType1MergeApp.scala:212-213). */
  def dedupArray(arr: String, key: String): String =
    s"filter($arr, e -> NOT exists($arr, o -> o.$key = e.$key AND o.version > e.version))"

  /** Version-aware struct merge: strictly higher source version wins,
    * TARGET wins ties (strict `>`; a NULL source version falls through to
    * the ELSE, so it can never displace the target), null-guarded on
    * either side (reference: ScdType1MergeApp.scala:219-225). */
  def mergeStruct(src: String, tgt: String): String =
    s"""CASE WHEN $src IS NULL THEN $tgt
       |     WHEN $tgt IS NULL THEN $src
       |     WHEN $src.version > coalesce($tgt.version, CAST(0.0 AS DOUBLE)) THEN $src
       |     ELSE $tgt END""".stripMargin

  /** Version-aware array merge by element key: a source element survives
    * only when no target element of the same key has version >= it (target
    * wins ties); a target element survives unless the source has a
    * STRICTLY newer version of it — the deliberate `>=` vs `>` asymmetry.
    * NULL and empty arrays are both treated as "no data on that side"
    * (reference: ScdType1MergeApp.scala:236-244). */
  def mergeArray(src: String, tgt: String, key: String): String =
    s"""CASE WHEN $src IS NULL OR size($src) = 0 THEN $tgt
       |     WHEN $tgt IS NULL OR size($tgt) = 0 THEN $src
       |     ELSE concat(
       |       filter($src, e -> NOT exists($tgt, o -> o.$key = e.$key AND o.version >= e.version)),
       |       filter($tgt, e -> NOT exists($src, o -> o.$key = e.$key AND o.version > e.version)))
       |     END""".stripMargin
}

/** Transforms a micro-batch of `order_stream` rows (multiple rows per order
  * possible) into one row per orderId with the order flattened to top level
  * (reference: ScdType1MergeApp.scala:146-206).
  *
  * Scale notes: the two windows, the aggregation and both joins all key on
  * `orderId`, so one hash partitioning is reused across every stage — a
  * single shuffle of the batch, no broadcast needed (all sides are the same
  * micro-batch scale), and AQE coalesces the post-shuffle partitions.
  */
object BatchFlattener {

  import ScdExpressions._

  val orderFieldNames: Seq[String] = Seq(
    "orderRef", "version", "orderDate", "orderTs", "orderStatus", "orderType",
    "totalAmount", "currency", "customerId", "shippingAddressId", "createdTs")

  /** order_stream batch → one row per orderId:
    * (xid, csn, dwhProcessedTs, orderId, <flat order cols>, orderBefore,
    * orderDetails struct, lineItems array). */
  def flatten(orderStream: DataFrame): DataFrame =
    assemble(flatProjection(orderStream))

  /** Like `flatten`, but persists the shared per-row dedup projection for
    * the duration of `use` and unpersists it eagerly afterwards. The
    * three downstream derivations (best order row, best detail, merged
    * line items) each re-evaluate the quadratic dedup-HOF chain
    * otherwise — 3× the dominant narrow cost of the flatten. Callers
    * must fully materialize the result inside `use`. */
  def flattenCached[T](orderStream: DataFrame)(use: DataFrame => T): T = {
    val flat = flatProjection(orderStream)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try use(assemble(flat))
    finally flat.unpersist(blocking = false)
  }

  /** Per-row dedup: keep max-version element per key inside each array,
    * then surface the single order/detail element (ANSI-safe
    * try_element_at, reference: ScdType1MergeApp.scala:148-178). */
  private def flatProjection(orderStream: DataFrame): DataFrame =
    orderStream.selectExpr(
      "xid", "csn", "dwhProcessedTs", "orderId",
      s"try_element_at(${dedupArray("orders", "orderId")}, 1) AS o",
      s"try_element_at(${dedupArray("orderDetails", "orderId")}, 1) AS d",
      s"${dedupArray("lineItems", "lineItemId")} AS lineItems")

  private def assemble(flat: DataFrame): DataFrame = {
    // Best order row per orderId: highest order version first (reference:
    // :182-186 tiebreaks on dwhProcessedTs, which is constant within a
    // micro-batch here — csn is the deterministic refinement).
    val wOrd = Window.partitionBy("orderId")
      .orderBy(desc_nulls_last("o.version"), desc_nulls_last("csn"))
    val bestOrder = flat
      .withColumn("_rn", row_number().over(wOrd))
      .filter(col("_rn") === 1)
      .select(
        Seq(col("xid"), col("csn"), col("dwhProcessedTs"), col("orderId")) ++
          orderFieldNames.map(f => col(s"o.$f").as(f)) :+
          col("o.before").as("orderBefore"): _*)

    // Null details are filtered BEFORE the window (reference: :189-194) —
    // ranking them would silently drop a valid detail from another row
    // whenever the rank-1 row's detail is null.
    val wDet = Window.partitionBy("orderId")
      .orderBy(desc_nulls_last("d.version"), desc_nulls_last("csn"))
    val bestDetail = flat
      .select(col("orderId"), col("csn"), col("d"))
      .filter(col("d").isNotNull)
      .withColumn("_rn", row_number().over(wDet))
      .filter(col("_rn") === 1)
      .select(col("orderId"), col("d").as("orderDetails"))

    // Line items merge across rows: concatenate all non-empty arrays for
    // the order, then version-dedup by lineItemId (reference: :196-200).
    // Orders whose rows all have empty arrays get NULL lineItems from the
    // left join — not [] — matching the reference's pre-filter.
    val mergedLi = flat
      .filter(col("lineItems").isNotNull && size(col("lineItems")) > 0)
      .groupBy("orderId")
      .agg(flatten_(col("lineItems")).as("lineItems"))
      .selectExpr("orderId", s"${dedupArray("lineItems", "lineItemId")} AS lineItems")

    bestOrder
      .join(bestDetail, Seq("orderId"), "left")
      .join(mergedLi, Seq("orderId"), "left")
  }

  // flatten(collect_list(...)) — named to avoid clashing with this method.
  private def flatten_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.flatten(collect_list(c))
}

/** Clause-ordered versioned upsert without Delta: emulates the reference's
  * Delta MERGE (reference: ScdType1MergeApp.scala:83-132) as a full-outer
  * join + one SELECT of CASE expressions (SURVEY.md §4.3).
  *
  * Semantics reproduced exactly:
  *  - match on `target.orderId = source.orderId`;
  *  - clause 1 (first match wins): `source.version IS NOT NULL AND
  *    source.version > COALESCE(target.version, 0)` → take source order
  *    fields + tx context, merge children;
  *  - clause 2 (catch-all match): keep target order fields, update tx
  *    context, merge children;
  *  - `whenNotMatched` only if `source.version IS NOT NULL` (blocks
  *    child-only rows from inserting orphans);
  *  - unreferenced target rows pass through unchanged.
  *
  * Scale notes: both sides are pre-partitioned by orderId when the source
  * comes out of BatchFlattener; the join is a plain equi-join Catalyst can
  * execute as SMJ (large-large) or broadcast (small micro-batch vs large
  * target — AQE decides from runtime sizes). The output is the full new
  * table snapshot; callers persist it atomically (ParquetTable.swap).
  */
object MergeExecutor {

  import ScdExpressions._

  def merge(target: DataFrame, source: DataFrame): DataFrame = {
    val t = target.withColumn("_t_exists", lit(true)).alias("t")
    val s = source.withColumn("_s_exists", lit(true)).alias("s")

    val j = t.join(s, col("t.orderId") === col("s.orderId"), "full_outer")

    val matched = col("t._t_exists").isNotNull && col("s._s_exists").isNotNull
    val clause1 = matched &&
      col("s.version").isNotNull &&
      (col("s.version") > coalesce(col("t.version"), lit(0.0)))
    val insertable = col("t._t_exists").isNull && col("s.version").isNotNull

    def srcWins(f: String) =
      when(clause1 || insertable, col(s"s.$f")).otherwise(col(s"t.$f")).as(f)
    def ctx(f: String) =
      when(matched || insertable, col(s"s.$f")).otherwise(col(s"t.$f")).as(f)

    val detailsMerged = expr(mergeStruct("s.orderDetails", "t.orderDetails"))
    val liMerged = expr(mergeArray("s.lineItems", "t.lineItems", "lineItemId"))

    j.filter(col("t._t_exists").isNotNull || insertable)
      .select(
        Seq(
          ctx("xid"), ctx("csn"), ctx("dwhProcessedTs"),
          coalesce(col("t.orderId"), col("s.orderId")).as("orderId")) ++
          BatchFlattener.orderFieldNames.map(srcWins) ++ Seq(
          srcWins("orderBefore"),
          when(matched, detailsMerged)
            .when(insertable, col("s.orderDetails"))
            .otherwise(col("t.orderDetails")).as("orderDetails"),
          when(matched, liMerged)
            .when(insertable, col("s.lineItems"))
            .otherwise(col("t.lineItems")).as("lineItems")): _*)
  }
}
