package graft.queries

/** Order-free EXACT aggregate sum of a double summand, as SQL text
  * valid in BOTH engines (Spark and the DuckDB oracle) — THE shared
  * replacement for the `sort_array(collect_list(struct(pos, v)))` +
  * ordered-fold pattern wherever the summand quantizes exactly.
  *
  * Why not the ordered fold: its per-group array grows with the group
  * (a pathological multi-hundred-MB document or hub key OOMs one task)
  * and it disables partial aggregation — every raw row crosses the
  * shuffle. Why not a plain double `sum`: float addition is not
  * associative, so Spark's partition-order-dependent partial sums and
  * DuckDB's sequential sum disagree in ulps. The fix: quantize each
  * addend to the 1e-9 grain with `floor` (floor of the same IEEE
  * double is identical in both engines — round/cast tie rules are
  * not), sum as BIGINT (associative AND commutative, so map-side
  * combine needs no ordering and any partitioning yields the same
  * bits), return to double. Per-group state: ONE i64.
  *
  * Overflow bound: |v| ≤ V ⇒ the i64 holds ~9.2e18 / (V·1e9) addends
  * per group (V=1 → 9.2e9 — far past any document/bin/subspace count
  * in this repo; callers with larger V must check).
  *
  * RESIDUAL ordered-fold sites (surveyed r12, each bounded or
  * genuinely ordered — the OOM-tail audit the helper closes):
  *  - EventsQueries `evt_time_decay`: acc·0.9 + v is genuinely
  *    order-dependent (non-associative by construction — the decay IS
  *    the ordering); array bounded by events-per-user.
  *  - TextQueries BPE chunk reassembly: concatenation needs position
  *    order; arrays bounded by doc chunk counts.
  *  - SimQueries `sim_mean_pool`: groups are exactly 10 vectors by
  *    construction (vec_id DIV 10).
  *  - IvfIndex.searchAdc / Kmeans.fit folds: groups bounded by the
  *    subspace count (8) / cell size (autoCells keeps it flat).
  *  - PageRank / DedupQueries token-order folds: deterministic-order
  *    contracts over degree-/doc-bounded groups, documented in place.
  */
object ExactSum {

  /** `qsum(v)` — order-free exact sum of `v` at the 1e-9 grain.
    * Returns DOUBLE. Same text runs in Spark SQL and DuckDB. */
  def qsum(v: String): String =
    s"CAST(sum(CAST(floor(($v) * 1000000000.0) AS BIGINT)) AS DOUBLE) / 1000000000.0"
}
