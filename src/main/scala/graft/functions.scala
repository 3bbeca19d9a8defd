package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{call_function, lit}

/** Typed Column façade over the engine's injected SQL functions — the
  * `org.apache.spark.sql.functions`-style entry point for library
  * users, so DataFrame code composes the custom expressions without
  * hand-building `expr("...")` strings (and without string-escaping
  * hazards when the inputs are computed columns).
  *
  * Resolution rides the PUBLIC `call_function`, which binds through the
  * session's function registry at analysis time — every session built
  * via [[SparkSessions]] carries the [[graft.expressions.GraftExtensions]]
  * injections, so these work in any DataFrame, SQL view, or streaming
  * query. Literal-only parameters (k, depth, width, bits, len) are Ints
  * here because the underlying aggregates size their buffers at plan
  * time (the registry builders reject non-literals loudly).
  */
object functions {

  /** Codegen'd cosine similarity between two float-array columns
    * (graft.expressions.CosineSim — bit-identical to the HOF fold the
    * DuckDB oracles mirror). */
  def cosine_sim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Codegen'd subspace L2²: sum of squared differences over
    * `len` elements of `a`/`b` starting at 1-based `offset`. */
  def l2_sq_range(a: Column, b: Column, offset: Column, len: Int): Column =
    call_function("l2_sq_range", a, b, offset, lit(len))

  /** Hilbert space-filling-curve index of an (x, y) cell pair at
    * 2^bits resolution — the Z-order-style clustering key. */
  def hilbert_xy(x: Column, y: Column, bits: Int): Column =
    call_function("hilbert_xy", x, y, lit(bits))

  /** Codegen'd Unicode NFC normalization (UAX#15). */
  def nfc_normalize(s: Column): Column =
    call_function("nfc_normalize", s)

  /** Bounded-heap grouped top-k aggregate: keeps the k largest
    * (score, id) pairs per group — the scale-safe replacement for a
    * `row_number` window partitioned by a constant-cardinality key.
    * Returns array<struct<score double, id bigint>> best-first
    * (ties: larger id). */
  def topk_by(score: Column, id: Column, k: Int): Column =
    call_function("topk_by", score, id, lit(k))

  /** STRING-keyed sibling of [[topk_by]]: ties prefer the
    * lexicographically smallest key (UTF-8 byte order — the collation
    * `ORDER BY key ASC` uses in both engines). Returns
    * array<struct<score double, id string>> best-first. */
  def topk_by_str(score: Column, key: Column, k: Int): Column =
    call_function("topk_by_str", score, key, lit(k))

  /** KMV distinct-count sketch over a 60-bit hash column (exact below
    * k, mergeable bounded state above). */
  def kmv_distinct(hash60: Column, k: Int): Column =
    call_function("kmv_distinct", hash60, lit(k))

  /** Misra-Gries heavy-hitter candidate aggregate (≤ k counters). */
  def mg_candidates(value: Column, k: Int): Column =
    call_function("mg_candidates", value, lit(k))

  /** Count-Min sketch counter matrix (depth × width), mergeable. */
  def cms_counters(key: Column, depth: Int, width: Int): Column =
    call_function("cms_counters", key, lit(depth), lit(width))
}
