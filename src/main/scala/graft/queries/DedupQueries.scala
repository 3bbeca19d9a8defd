package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, max, sum, when}

import graft.SparkSessions.tablePath
import graft.dedup.Dedup
import graft.text.TextAnalysis._

/** Oracle-checked dedup operators on `documents` (see Dedup for the scale
  * rationale). The DuckDB oracles replicate each algorithm bit-for-bit:
  * same md5-based 60-bit hashes, same integer arithmetic, same single
  * double division for Jaccard (IEEE-identical), same rounding.
  */
object DedupQueries extends QueryModule {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(tablePath(dir, "documents"))

  private def grams(s: SparkSession, dir: String): DataFrame =
    Dedup.gramsCached(s, tablePath(dir, "documents"))

  private val mhCache =
    new graft.tables.SessionMemo[String, DataFrame]

  /** Signatures+bands persisted once per (session, dir): shared by the
    * bands projection and the candidate-pair query. */
  private def minhash(s: SparkSession, dir: String): DataFrame =
    mhCache.getOrElseUpdate(s, dir)({
      val df = Dedup.withMinhash(grams(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  private val mpCache =
    new graft.tables.SessionMemo[(String, Double), DataFrame]

  /** LSH-banded candidates verified by exact Jaccard, memoized per
    * (session, dir, threshold): THE near-dup pair source — three queries
    * (pairs, cluster reps, corpus curation) consume the same result. The
    * quadratic all-pairs gram join (`Dedup.jaccardPairs`) stays confined
    * to `dedup_jaccard_pairs`, which exists to measure LSH recall against
    * ground truth — everything downstream rides the scale path. */
  def minhashPairsCached(s: SparkSession, dir: String, threshold: Double): DataFrame =
    mpCache.getOrElseUpdate(s, (dir, threshold))({
      val df = Dedup.minhashPairs(minhash(s, dir), threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  /** The banding CTEs alone (`b`(doc_id, i, band_hash)), appended after
    * a `g`(doc_id, grams) CTE — shared by the candidate join and the
    * bucket-size audit. */
  def duckLshBands: String =
    s"""s AS (SELECT doc_id, grams, ${minhashSigDuck(Dedup.NumHashes)} AS sig FROM g),
       |s2 AS (SELECT doc_id, grams,
       |  [${bandHashDuck(1, 4)}, ${bandHashDuck(5, 4)}, ${bandHashDuck(9, 4)}, ${bandHashDuck(13, 4)}] AS bhs
       |  FROM s),
       |b AS (SELECT doc_id, grams, i, bhs[i] AS band_hash
       |  FROM s2 CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS i) idx)""".stripMargin

  /** The banded candidate-generation prefix (`cand`(a_id, b_id)),
    * shared by the Jaccard-verified pairs and the containment variant.
    * Mirrors `Dedup.bandCandidates`' anchor cap exactly: a pair
    * survives iff its smaller doc_id ranks ≤ maxBucket within its
    * bucket (the smaller side always holds the smaller rank, so the
    * one-sided predicate is the whole rule). At the default cap this is
    * equivalent to the uncapped join on any bucket ≤ 10k docs. */
  def duckLshCandidates(maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""$duckLshBands,
       |br AS (SELECT doc_id, i, band_hash,
       |  row_number() OVER (PARTITION BY i, band_hash ORDER BY doc_id) AS rk
       |  FROM b),
       |cand AS (SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id
       |  FROM br a JOIN br b2
       |    ON a.i = b2.i AND a.band_hash = b2.band_hash AND a.doc_id < b2.doc_id
       |  WHERE a.rk <= $maxBucket),""".stripMargin

  /** Full oracle dual of `Dedup.minhashPairs`: the capped candidate
    * prefix + exact-Jaccard verification at `threshold`, deriving
    * `lsh_pairs`(a_id, b_id, jaccard) — shared by every query that
    * consumes the LSH pair path (pairs, cluster reps, curation). */
  def duckLshPairs(threshold: Double, maxBucket: Int = Dedup.DefaultMaxBucket): String =
    s"""${duckLshCandidates(maxBucket)}
       |v AS (SELECT a_id, b_id,
       |    len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS inter,
       |    len(ga.grams) AS na, len(gb.grams) AS nb
       |  FROM cand JOIN g ga ON a_id = ga.doc_id JOIN g gb ON b_id = gb.doc_id),
       |lsh_pairs AS (SELECT a_id, b_id,
       |    round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
       |  FROM v WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $threshold)""".stripMargin

  private val shCache =
    new graft.tables.SessionMemo[String, DataFrame]

  /** SimHash fingerprints persisted once per (session, dir): the
    * fingerprint query and the self-joined pairs query share them (a
    * self-join would otherwise recompute the hashing twice). */
  private def simhashCached(s: SparkSession, dir: String): DataFrame =
    shCache.getOrElseUpdate(s, dir)({
      val df = Dedup.simhash(docs(s, dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  private val spCache =
    new graft.tables.SessionMemo[String, DataFrame]

  /** Strict (hamming ≤ 2) simhash pairs, persisted per (session, dir):
    * the triangle count walks the edge list THREE times (degrees,
    * orientation, closing-edge probe) — uncached, each walk would
    * re-execute the whole band-join DAG. */
  private def strictPairsCached(s: SparkSession, dir: String): DataFrame =
    spCache.getOrElseUpdate(s, dir)({
      val df = Dedup.simhashPairs(s, simhashCached(s, dir), 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    })

  /** Pre-build the memoized shared dedup state — grams, MinHash
    * signatures+bands, verified LSH pairs, SimHash fingerprints — so
    * Bench times it as an explicit `build_*` entry and the per-query
    * numbers measure only themselves. (The all-pairs Jaccard join is
    * deliberately NOT here: it is `dedup_jaccard_pairs`' own cost.) */
  def ensureSeeded(s: SparkSession, dir: String): Unit = {
    // Two independent chains (grams→minhash→pairs vs simhash→strict
    // pairs) overlapped per guide §2.6 — each chain's straggler tail
    // back-fills with the other's work. Chains share no memo, so the
    // fan-out cannot race-evaluate a thunk.
    SeedPar.all(Seq(
      () => minhashPairsCached(s, dir, 0.8).count(),
      () => { simhashCached(s, dir).count(); strictPairsCached(s, dir).count() }))
    ()
  }

  /** DuckDB CTE producing (doc_id, toks, grams). */
  val duckGrams =
    s"""WITH tk AS (SELECT doc_id, text, $toksDuck AS toks FROM documents),
       |g AS (SELECT doc_id, $grams3Duck AS grams FROM tk)""".stripMargin

  override def queries: Seq[EngineQuery] = Seq(

    EngineQuery(
      "dedup_exact",
      (s, dir) => Dedup.exactGroups(docs(s, dir)),
      Some("""SELECT md5(text) AS text_hash, CAST(min(doc_id) AS BIGINT) AS rep_id,
             |  CAST(count(*) AS BIGINT) AS n_docs
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // Ground-truth all-pairs Jaccard — the recall yardstick for the LSH
    // path (quadratic by design; the ONLY consumer of the all-pairs join).
    EngineQuery(
      "dedup_jaccard_pairs",
      (s, dir) => Dedup.jaccardPairs(grams(s, dir), 0.8),
      Some(s"""$duckGrams,
              |p AS (
              |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |    len(list_filter(a.grams, x -> list_contains(b.grams, x))) AS inter,
              |    len(a.grams) AS na, len(b.grams) AS nb
              |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
              |SELECT a_id, b_id,
              |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
              |FROM p WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8""".stripMargin)),

    // Prefix-filtered all-pairs similarity join (the ppjoin family) —
    // the LSH alternative for near-dup candidate generation, here over
    // the 3-gram sets at Jaccard >= 0.8. Grams sort by (global df, gram)
    // — rarest first — and only each doc's PREFIX (n - ceil(0.8n) + 1
    // grams, integer ceil = (4n+4) DIV 5) explodes into the candidate
    // equi-join: completeness is the pigeonhole bound (two sets with
    // J >= t MUST share a prefix token under a shared total order), and
    // the prefix grams are by construction the rarest, so the join is
    // confined where LSH banding confines by hash collision. Exact
    // verification runs only on candidates. Sums stay integer; the one
    // double ratio is a single division, rounded.
    EngineQuery(
      "dedup_prefix_pairs",
      (s, dir) => {
        import org.apache.spark.sql.functions._
        val tok = grams(s, dir).select(col("doc_id"), explode(col("grams")).as("t"))
        val dfq = tok.groupBy("t").agg(count(lit(1)).as("df"))
        val orderedPlan = tok.join(dfq, "t")
          .groupBy("doc_id")
          // Residual ordered fold (ExactSum survey, r12): ppjoin NEEDS
          // each doc's grams rarity-sorted (the prefix IS an order
          // property); array bounded by a doc's own gram count.
          .agg(sort_array(collect_list(struct(col("df"), col("t")))).as("ord"))
          .selectExpr("doc_id", "CAST(size(ord) AS BIGINT) AS n",
            "transform(ord, e -> e.t) AS gs")
          .selectExpr("doc_id", "n", "gs",
            "slice(gs, 1, CAST(n - (4 * n + 4) DIV 5 + 1 AS INT)) AS prefix")
        // Four consumers (both prefix self-join sides, both
        // verification joins) each re-ran the explode → df join →
        // sort-fold aggregation — the final plan carried the subtree
        // 4×, with no exchange reuse across the broadcast boundaries
        // (§1.2: don't compute what you already have; the q34 lesson).
        // Cutting it once is a measured 2× at 50k docs (sf1) but LOSES
        // at 5k docs (sf0.1: materializing the full gram arrays costs
        // more than 3 recomputes over the cached base), so the default
        // is SIZE-ADAPTIVE per §2 (never a constant tuned for one
        // scale): share from 20k docs up — recompute cost grows with
        // corpus density, the one-time cut linearly. The count is one
        // cheap job on the memoized grams cache.
        // spark.graft.prefix.shareOrdered=true|false forces an arm.
        val share = s.conf.getOption("spark.graft.prefix.shareOrdered") match {
          case Some(v) => v == "true"
          case None => grams(s, dir).count() >= 20000L
        }
        val ordered =
          if (share) graft.tables.Checkpoints.cut(orderedPlan) else orderedPlan
        // ppjoin's LENGTH filter rides the candidate join: J >= 0.8
        // forces min(na,nb)/max(na,nb) >= 0.8 (intersection is bounded
        // by the smaller set), so 5*least >= 4*greatest prunes pairs
        // that cannot verify — integer-exact, provably output-invariant.
        // On a size-skewed corpus this is the second confinement axis
        // next to prefix-gram collision (sf1 smoke: candidate volume is
        // the whole cost of this operator at high corpus density).
        val pre = ordered.selectExpr("doc_id", "n", "explode(prefix) AS pt")
        val cand = pre.alias("a")
          .join(pre.alias("b"),
            col("a.pt") === col("b.pt") && col("a.doc_id") < col("b.doc_id") &&
              expr("5 * least(a.n, b.n) >= 4 * greatest(a.n, b.n)"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct()
        cand
          .join(ordered.selectExpr("doc_id AS a_id", "gs AS ga", "n AS na"), "a_id")
          .join(ordered.selectExpr("doc_id AS b_id", "gs AS gb", "n AS nb"), "b_id")
          .selectExpr("a_id", "b_id",
            "CAST(size(array_intersect(ga, gb)) AS BIGINT) AS inter", "na", "nb")
          .filter("CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8")
          .agg(
            count(lit(1)).as("n_pairs"),
            sum("inter").as("sum_inter"),
            sum(expr("na + nb - inter")).as("sum_union"),
            round(sum("inter").cast("double") / sum(expr("na + nb - inter")), 6)
              .as("overlap_ratio"))
      },
      Some(s"""$duckGrams,
              |tok AS (SELECT doc_id, unnest(grams) AS t FROM g),
              |dfq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
              |ordered AS (SELECT doc_id, list(t ORDER BY df, t) AS gs,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM tok JOIN dfq USING (t) GROUP BY doc_id),
              |pre AS (SELECT doc_id, n,
              |    unnest(gs[1:CAST(n - (4 * n + 4) // 5 + 1 AS BIGINT)]) AS pt
              |  FROM ordered),
              |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM pre a JOIN pre b ON a.pt = b.pt AND a.doc_id < b.doc_id
              |    AND 5 * least(a.n, b.n) >= 4 * greatest(a.n, b.n)),
              |p AS (SELECT a_id, b_id,
              |    CAST(len(list_filter(oa.gs, x -> list_contains(ob.gs, x))) AS BIGINT) AS inter,
              |    oa.n AS na, ob.n AS nb
              |  FROM cand
              |  JOIN ordered oa ON oa.doc_id = a_id
              |  JOIN ordered ob ON ob.doc_id = b_id),
              |v AS (SELECT * FROM p
              |  WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8)
              |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              |  CAST(sum(inter) AS BIGINT) AS sum_inter,
              |  CAST(sum(na + nb - inter) AS BIGINT) AS sum_union,
              |  round(CAST(sum(inter) AS DOUBLE) / sum(na + nb - inter), 6) AS overlap_ratio
              |FROM v""".stripMargin)),

    // Per-doc MinHash signature + LSH band hashes (the partition-local
    // stage of the scale path, checked value-by-value).
    EngineQuery(
      "dedup_minhash_bands",
      (s, dir) =>
        minhash(s, dir).selectExpr(
          "doc_id",
          "element_at(sig, 1) AS sig1",
          "array_min(sig) AS sig_min",
          "band_hash_0", "band_hash_1", "band_hash_2", "band_hash_3"),
      Some(s"""$duckGrams,
              |s AS (SELECT doc_id, ${minhashSigDuck(Dedup.NumHashes)} AS sig FROM g)
              |SELECT doc_id, sig[1] AS sig1, list_min(sig) AS sig_min,
              |  ${bandHashDuck(1, 4)} AS band_hash_0,
              |  ${bandHashDuck(5, 4)} AS band_hash_1,
              |  ${bandHashDuck(9, 4)} AS band_hash_2,
              |  ${bandHashDuck(13, 4)} AS band_hash_3
              |FROM s""".stripMargin)),

    // LSH candidates verified by exact Jaccard — end-to-end MinHash dedup.
    EngineQuery(
      "dedup_minhash_pairs",
      (s, dir) => minhashPairsCached(s, dir, 0.8),
      Some(s"""$duckGrams,
              |${duckLshPairs(0.8)}
              |SELECT a_id, b_id, jaccard FROM lsh_pairs""".stripMargin)),

    // Cluster-representative assignment over the verified LSH pairs —
    // the candidate source here is minhashPairs (the 100 TB path), NOT
    // the quadratic all-pairs verifier; the oracle runs the identical
    // banded candidate generation, so an LSH recall miss can never show
    // up as a hash mismatch.
    EngineQuery(
      "dedup_cluster_reps",
      (s, dir) => Dedup.clusterReps(docs(s, dir), minhashPairsCached(s, dir, 0.8)),
      Some(s"""$duckGrams,
              |${duckLshPairs(0.8)},
              |nb AS (
              |  SELECT doc_id, min(nb) AS min_nb FROM (
              |    SELECT a_id AS doc_id, b_id AS nb FROM lsh_pairs
              |    UNION ALL SELECT b_id, a_id FROM lsh_pairs) GROUP BY doc_id)
              |SELECT d.doc_id, least(d.doc_id, coalesce(min_nb, d.doc_id)) AS rep_id
              |FROM documents d LEFT JOIN nb ON d.doc_id = nb.doc_id""".stripMargin)),

    // Transitive cluster representatives: connected components over the
    // LSH candidate pairs (iterative min-label propagation to fixpoint).
    // Differs from dedup_cluster_reps exactly on chains (a-b, b-c): the
    // one-hop policy leaves c pointing at b; CC converges c to a. The
    // DuckDB dual computes the same fixpoint as a recursive-CTE closure.
    EngineQuery(
      "dedup_cc_reps",
      (s, dir) =>
        graft.dedup.ConnectedComponents.labels(
            docs(s, dir).selectExpr("doc_id AS id"),
            minhashPairsCached(s, dir, 0.8))
          .selectExpr("id AS doc_id", "label AS rep_id"),
      Some(s"""${duckGrams.replaceFirst("^WITH ", "WITH RECURSIVE ")},
              |${duckLshPairs(0.8)},
              |e AS (
              |  SELECT a_id AS a, b_id AS b FROM lsh_pairs
              |  UNION SELECT b_id, a_id FROM lsh_pairs),
              |reach(a, b) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
              |SELECT a AS doc_id, min(b) AS rep_id FROM reach GROUP BY a""".stripMargin)),

    // Edit-distance verification over the LSH candidate pairs: the
    // third verify lens next to exact Jaccard and Hamming — candidates
    // are already confined by banding (24 pairs here), so the O(L²)
    // DP per pair runs on a bounded set, never all-pairs. Distances are
    // exact integers on the lowercased 120-char prefixes (identical
    // unit-cost Levenshtein in both engines).
    EngineQuery(
      "dedup_editdist_pairs",
      (s, dir) => {
        val d = docs(s, dir).selectExpr(
          "doc_id", "lower(substring(text, 1, 120)) AS px")
        minhashPairsCached(s, dir, 0.8)
          .select("a_id", "b_id")
          .join(d.withColumnRenamed("doc_id", "a_id").withColumnRenamed("px", "pa"), "a_id")
          .join(d.withColumnRenamed("doc_id", "b_id").withColumnRenamed("px", "pb"), "b_id")
          .selectExpr("a_id", "b_id",
            "CAST(levenshtein(pa, pb) AS BIGINT) AS editdist")
      },
      Some(s"""$duckGrams,
              |${duckLshPairs(0.8)},
              |p AS (SELECT doc_id, lower(substring(text, 1, 120)) AS px FROM documents)
              |SELECT l.a_id, l.b_id,
              |  CAST(levenshtein(pa.px, pb.px) AS BIGINT) AS editdist
              |FROM lsh_pairs l
              |JOIN p pa ON pa.doc_id = l.a_id
              |JOIN p pb ON pb.doc_id = l.b_id""".stripMargin)),

    // PageRank over the near-dup graph (3 iterations, damping 0.85):
    // duplication-hub centrality — the curation signal for
    // down-weighting mass-duplicated template content. Each iteration is
    // one dst-keyed join+aggregate with a src-ordered contribution fold
    // (bit-reproducible); the base constant is interpolated from the
    // SAME Scala double into both engines so (1-d)/N can't drift by a
    // parse ulp. CC answers "same content?", this ranks "how central".
    EngineQuery(
      "dedup_pagerank",
      (s, dir) =>
        graft.dedup.PageRank.ranks(
            docs(s, dir).selectExpr("doc_id AS id"),
            minhashPairsCached(s, dir, 0.8), iters = 3)
          .selectExpr("id AS doc_id", "round(pr, 8) AS pr"),
      Some {
        val d = 0.85
        val baseNum = (1.0 - d).toString // == Spark's lit((1.0-d)/n) numerator
        def iter(prev: String, cur: String) =
          s"""c$cur AS (SELECT e.dst, list($prev.pr / deg.d ORDER BY e.src) AS cs
             |  FROM e JOIN $prev ON $prev.doc_id = e.src JOIN deg ON deg.src = e.src
             |  GROUP BY e.dst),
             |$cur AS (SELECT d.doc_id,
             |    $baseNum / n.n + $d * coalesce(list_reduce(c$cur.cs, (x, y) -> x + y), 0.0) AS pr
             |  FROM documents d CROSS JOIN n LEFT JOIN c$cur ON c$cur.dst = d.doc_id)""".stripMargin
        s"""$duckGrams,
           |${duckLshPairs(0.8)},
           |e AS (SELECT a_id AS src, b_id AS dst FROM lsh_pairs
           |  UNION ALL SELECT b_id, a_id FROM lsh_pairs),
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |p0 AS (SELECT doc_id, 1.0 / n.n AS pr FROM documents CROSS JOIN n),
           |${iter("p0", "p1")},
           |${iter("p1", "p2")},
           |${iter("p2", "p3")}
           |SELECT doc_id, round(pr, 8) AS pr FROM p3""".stripMargin
      }),

    // Label-propagation communities over the SAME verified LSH pair
    // graph (3 synchronous rounds, self-vote damping, ties to the
    // smallest label — see LabelPropagation for the exact round
    // semantics the oracle replays). The third graph lens next to
    // dedup_cc_reps and dedup_pagerank: CC merges template families
    // that touch through one borderline bridge pair; LPA keeps each
    // family under its own majority label, which is the grain a dedup
    // keep-policy actually wants on chained clusters.
    EngineQuery(
      "dedup_lpa_communities",
      (s, dir) =>
        graft.dedup.LabelPropagation.communities(
            docs(s, dir).selectExpr("doc_id AS id"),
            minhashPairsCached(s, dir, 0.8), rounds = 3)
          .groupBy("label")
          .agg(count(lit(1)).as("n_members"))
          .selectExpr("label AS community", "n_members"),
      Some {
        def round(prev: String, cur: String) =
          s"""v$cur AS (SELECT e.src AS id, $prev.label FROM e JOIN $prev ON $prev.id = e.dst
             |  UNION ALL SELECT id, label FROM $prev),
             |c$cur AS (SELECT id, label, CAST(count(*) AS BIGINT) AS cnt FROM v$cur GROUP BY 1, 2),
             |$cur AS (SELECT id, label FROM (
             |    SELECT id, label, row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label ASC) AS rn
             |    FROM c$cur) WHERE rn = 1)""".stripMargin
        s"""$duckGrams,
           |${duckLshPairs(0.8)},
           |e AS (SELECT a_id AS src, b_id AS dst FROM lsh_pairs
           |  UNION ALL SELECT b_id, a_id FROM lsh_pairs),
           |l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
           |${round("l0", "l1")},
           |${round("l1", "l2")},
           |${round("l2", "l3")}
           |SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
           |FROM l3 GROUP BY 1""".stripMargin
      }),

    // Bounded-round 2-core peel over the verified pair graph: strips
    // the degree-1 fringe (isolated pairs, chain ends) so what remains
    // is the densely-duplicated core — the subgraph worth the expensive
    // per-cluster treatment. 4 peel rounds, identically replayed by the
    // oracle's chained CTEs (the exact core is the fixpoint; the fixed
    // round count is the deterministic spelling, and near-dup graphs
    // are clique-heavy so the peel converges fast).
    EngineQuery(
      "dedup_kcore",
      (s, dir) =>
        graft.dedup.LabelPropagation.kcore(
          minhashPairsCached(s, dir, 0.8), k = 2, rounds = 4),
      Some {
        def peel(prev: String, cur: String) =
          s"""k$cur AS (SELECT src FROM $prev GROUP BY src HAVING count(*) >= 2),
             |$cur AS (SELECT e.src, e.dst FROM $prev e
             |  JOIN k$cur a ON a.src = e.src JOIN k$cur b ON b.src = e.dst)""".stripMargin
        s"""$duckGrams,
           |${duckLshPairs(0.8)},
           |e0 AS (SELECT a_id AS src, b_id AS dst FROM lsh_pairs
           |  UNION ALL SELECT b_id, a_id FROM lsh_pairs),
           |${peel("e0", "e1")},
           |${peel("e1", "e2")},
           |${peel("e2", "e3")},
           |${peel("e3", "e4")}
           |SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
           |FROM e4 GROUP BY 1""".stripMargin
      }),

    EngineQuery(
      "dedup_simhash",
      (s, dir) => simhashCached(s, dir),
      Some(s"""WITH tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk)
              |SELECT doc_id, $simhash32Duck AS simhash FROM h""".stripMargin)),

    // SimHash near-dup candidates: fingerprint pairs within Hamming
    // distance 6 of each other — banded (7 disjoint bit ranges, exact by
    // pigeonhole), so the join shuffles band buckets, never all pairs.
    EngineQuery(
      "dedup_simhash_pairs",
      (s, dir) => Dedup.simhashPairs(s, simhashCached(s, dir), 6),
      Some(s"""WITH tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk),
              |f AS (SELECT doc_id, $simhash32Duck AS simhash FROM h)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
              |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
              |FROM f a JOIN f b ON a.doc_id < b.doc_id
              |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin)),

    // Triangle count over the STRICT simhash near-dup graph (hamming
    // ≤ 2): Dedup.triangleCount's degree-ordered orientation vs the
    // oracle's quadratic a<b<c triple join. Measures how clique-like
    // duplicate clusters are — dense triangles justify the one-hop
    // min-id rep collapse. Strict threshold deliberately: near-dup
    // graphs are clique-heavy, and |triangles| grows cubically in
    // clique size (the ham ≤ 6 graph at sf0.1 already holds 290M
    // triangles) — exact enumeration is for the verification tier;
    // on looser graphs, count per-cluster via the rep sizes instead.
    EngineQuery(
      "dedup_triangles",
      (s, dir) => graft.dedup.Dedup.triangleCount(strictPairsCached(s, dir)),
      Some(s"""WITH tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk),
              |f AS (SELECT doc_id, $simhash32Duck AS simhash FROM h),
              |e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM f a JOIN f b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
              |tr AS (SELECT count(*) AS n FROM e e1
              |  JOIN e e2 ON e2.a_id = e1.a_id AND e2.b_id > e1.b_id
              |  JOIN e e3 ON e3.a_id = e1.b_id AND e3.b_id = e2.b_id)
              |SELECT CAST(tr.n AS BIGINT) AS n_triangles,
              |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges
              |FROM tr""".stripMargin)),

    // The triangle count's SCALE TIER (r13 directive 1): DOULION-style
    // deterministic edge sampling (hash-kept edges, estimate =
    // sampled/p³) in front of the same degree-ordered enumeration. At
    // every oracle scale the 1M-edge target keeps p = 1, so this row IS
    // the exact count (matches dedup_triangles' numbers) and the oracle
    // replays the identical integer keep rule; above the target (the
    // sf10 strict graph, where exact enumeration's wedge volume dies on
    // disk) the wedge intermediates shrink by p² and the entry runs
    // clean where the exact yardstick is skip-stamped. Estimator error
    // is measured where both tiers run (TriangleSampleSpec; sf1 in
    // BASELINE.md).
    EngineQuery(
      "dedup_triangles_sampled",
      (s, dir) => graft.dedup.Dedup.triangleCountSampled(strictPairsCached(s, dir)),
      Some(s"""WITH tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk),
              |f AS (SELECT doc_id, $simhash32Duck AS simhash FROM h),
              |e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM f a JOIN f b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
              |tot AS (SELECT count(*) AS n_edges,
              |    (1000000::BIGINT * 1000000) // greatest(count(*), 1) AS thr
              |  FROM e),
              |se AS (SELECT a_id, b_id FROM e, tot
              |  WHERE ${hash60Duck("CAST(a_id AS VARCHAR) || ',' || CAST(b_id AS VARCHAR)")} % 1000000 < tot.thr),
              |tr AS (SELECT count(*) AS n FROM se e1
              |  JOIN se e2 ON e2.a_id = e1.a_id AND e2.b_id > e1.b_id
              |  JOIN se e3 ON e3.a_id = e1.b_id AND e3.b_id = e2.b_id),
              |pp AS (SELECT least(CAST(1.0 AS DOUBLE),
              |    CAST(thr AS DOUBLE) / 1000000.0) AS p, n_edges FROM tot)
              |SELECT round(CAST(tr.n AS DOUBLE) / (pp.p * pp.p * pp.p), 6) AS n_triangles_est,
              |  CAST(tr.n AS BIGINT) AS n_triangles_sampled,
              |  CAST((SELECT count(*) FROM se) AS BIGINT) AS n_edges_sampled,
              |  CAST(pp.n_edges AS BIGINT) AS n_edges_total
              |FROM tr, pp""".stripMargin)),

    // The estimator at a FORCED-BINDING p (r14 directive 3):
    // `dedup_triangles_sampled`'s 1M-edge target keeps p = 1 at every
    // oracle scale (the sf0.01 strict graph holds 366 edges), so the
    // p<1 arithmetic — hash keep rule, p³ inflation, the DuckDB dual of
    // both — was exercised only spec-side. targetEdges = 128 < 366
    // binds at the gate: the oracle replays the identical integer keep
    // rule (md5-hash % 1e6 < thr, thr = 1e6·128 DIV 366) over its own
    // edge set, so every surviving edge, every surviving triangle, and
    // the exact p³ division are hash-gated end-to-end. The row's
    // n_edges_sampled < n_edges_total IS the binding proof in the
    // gated output.
    EngineQuery(
      "dedup_triangles_est",
      (s, dir) => graft.dedup.Dedup.triangleCountSampled(
        strictPairsCached(s, dir), targetEdges = 128L),
      Some(s"""WITH tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk),
              |f AS (SELECT doc_id, $simhash32Duck AS simhash FROM h),
              |e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM f a JOIN f b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
              |tot AS (SELECT count(*) AS n_edges,
              |    (1000000::BIGINT * 128) // greatest(count(*), 1) AS thr
              |  FROM e),
              |se AS (SELECT a_id, b_id FROM e, tot
              |  WHERE ${hash60Duck("CAST(a_id AS VARCHAR) || ',' || CAST(b_id AS VARCHAR)")} % 1000000 < tot.thr),
              |tr AS (SELECT count(*) AS n FROM se e1
              |  JOIN se e2 ON e2.a_id = e1.a_id AND e2.b_id > e1.b_id
              |  JOIN se e3 ON e3.a_id = e1.b_id AND e3.b_id = e2.b_id),
              |pp AS (SELECT least(CAST(1.0 AS DOUBLE),
              |    CAST(thr AS DOUBLE) / 1000000.0) AS p, n_edges FROM tot)
              |SELECT round(CAST(tr.n AS DOUBLE) / (pp.p * pp.p * pp.p), 6) AS n_triangles_est,
              |  CAST(tr.n AS BIGINT) AS n_triangles_sampled,
              |  CAST((SELECT count(*) FROM se) AS BIGINT) AS n_edges_sampled,
              |  CAST(pp.n_edges AS BIGINT) AS n_edges_total
              |FROM tr, pp""".stripMargin)),

    // Asymmetric containment (inter / min(|A|,|B|)) over the SAME banded
    // candidates — flags sub-document duplication (boilerplate, quotes,
    // truncations) whose symmetric Jaccard stays low because the size
    // gap inflates the union. Both ratios emitted so the asymmetry is
    // visible in the gated result (this corpus's near-dup families are
    // same-size, so containment saturates at 1.0 while jaccard sits at
    // 0.90-0.99 — the pair SETS coincide here, the ratios don't).
    EngineQuery(
      "dedup_containment_pairs",
      (s, dir) => Dedup.containmentPairs(minhash(s, dir), 0.7),
      Some(s"""$duckGrams,
              |${duckLshCandidates()}
              |v AS (SELECT a_id, b_id,
              |    len(list_filter(ga.grams, x -> list_contains(gb.grams, x))) AS inter,
              |    len(ga.grams) AS na, len(gb.grams) AS nb
              |  FROM cand JOIN g ga ON a_id = ga.doc_id JOIN g gb ON b_id = gb.doc_id)
              |SELECT a_id, b_id,
              |  round(CAST(inter AS DOUBLE) / least(na, nb), 6) AS containment,
              |  round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
              |FROM v WHERE CAST(inter AS DOUBLE) / least(na, nb) >= 0.7""".stripMargin)),

    // WITH RECURSIVE on the SQL surface (Spark 4's recursive CTEs):
    // depth-bounded reachability over the ASCENDING-oriented strict
    // near-dup edges. Orientation makes the graph a DAG (Spark recursion
    // is UNION ALL-only — a cycle would never terminate) and the ≤3-hop
    // bound caps path multiplicity, so the recursion's working set stays
    // proportional to paths-within-3-hops; the outer DISTINCT collapses
    // multi-path revisits. Seeds = the 3 smallest edge sources. The
    // cached edge view keeps each recursion step a scan of the
    // in-memory edge list, never a re-run of the band join.
    EngineQuery(
      "dedup_recursive_reach",
      (s, dir) => {
        strictPairsCached(s, dir).createOrReplaceTempView("strict_edges_v")
        // DISTINCT in the recursive step bounds each level at
        // (seed × node × depth) rows instead of PATH multiplicity —
        // without it a clique-dense graph multiplies paths per hop and
        // trips the engine's recursion row limit (found empirically at
        // the sf1 smoke: 1M+ path rows from 3 seeds on the 10× graph).
        // The final count(DISTINCT v) is unchanged.
        s.sql("""WITH RECURSIVE reach(seed, v, depth) AS (
                |  SELECT a_id, a_id, 0 FROM (
                |    SELECT DISTINCT a_id FROM strict_edges_v ORDER BY a_id LIMIT 3)
                |  UNION ALL
                |  SELECT DISTINCT r.seed, e.b_id, r.depth + 1
                |  FROM reach r JOIN strict_edges_v e ON e.a_id = r.v
                |  WHERE r.depth < 3)
                |SELECT seed, CAST(count(DISTINCT v) - 1 AS BIGINT) AS n_reach_3hop
                |FROM reach GROUP BY seed""".stripMargin)
      },
      Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, $toksDuck AS toks FROM documents),
              |h AS (SELECT doc_id, $tokenHashesDuck AS th FROM tk),
              |f AS (SELECT doc_id, $simhash32Duck AS simhash FROM h),
              |e AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM f a JOIN f b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 2),
              |reach(seed, v, depth) AS (
              |  SELECT a_id, a_id, 0 FROM (
              |    SELECT DISTINCT a_id FROM e ORDER BY a_id LIMIT 3) s
              |  UNION ALL
              |  SELECT DISTINCT r.seed, e.b_id, r.depth + 1
              |  FROM reach r JOIN e ON e.a_id = r.v
              |  WHERE r.depth < 3)
              |SELECT seed, CAST(count(DISTINCT v) - 1 AS BIGINT) AS n_reach_3hop
              |FROM reach GROUP BY seed""".stripMargin)),

    // The candidate-volume audit behind the anchor cap: per-band-bucket
    // size distribution and the exact pair volumes a given cap admits.
    // This is the number to watch as corpora densify (the one
    // data-dependent cost of the LSH path) — pairs_capped_1 uses cap=1
    // (a cap c only binds on buckets of size ≥ c+2, and sf0.01's densest
    // bucket holds 3 docs) so the capped arithmetic is exercised where
    // it BITES, while the production default (10k) stays non-binding.
    EngineQuery(
      "dedup_bucket_audit",
      (s, dir) => {
        Dedup.bands(minhash(s, dir))
          .groupBy("band_idx", "band_hash")
          .agg(count(lit(1)).as("cnt"))
          .agg(
            count(lit(1)).as("n_buckets"),
            max("cnt").as("max_bucket"),
            sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_multi"),
            sum(expr("cnt * (cnt - 1) div 2")).as("pairs_uncapped"),
            sum(expr(
              "CASE WHEN cnt <= 2 THEN cnt * (cnt - 1) div 2 ELSE cnt - 1 END"))
              .as("pairs_capped_1"))
      },
      Some(s"""$duckGrams,
              |$duckLshBands,
              |bs AS (SELECT i, band_hash, count(*) AS cnt FROM b GROUP BY 1, 2)
              |SELECT CAST(count(*) AS BIGINT) AS n_buckets,
              |  CAST(max(cnt) AS BIGINT) AS max_bucket,
              |  CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
              |  CAST(sum((cnt * (cnt - 1)) // 2) AS BIGINT) AS pairs_uncapped,
              |  CAST(sum(CASE WHEN cnt <= 2 THEN (cnt * (cnt - 1)) // 2
              |           ELSE cnt - 1 END) AS BIGINT) AS pairs_capped_1
              |FROM bs""".stripMargin)),

    // The anchor cap where it BINDS: verified near-dup pairs at
    // maxBucket=1 — both engines must implement the identical rule
    // (pair survives iff its smaller doc_id ranks FIRST in its bucket),
    // hash-gated pair for pair. The default-cap path's equivalence to
    // the uncapped join is pinned by DedupCapSpec.
    EngineQuery(
      "dedup_capped_pairs",
      (s, dir) => Dedup.minhashPairs(minhash(s, dir), 0.8, maxBucket = 1),
      Some(s"""$duckGrams,
              |${duckLshPairs(0.8, 1)}
              |SELECT a_id, b_id, jaccard FROM lsh_pairs""".stripMargin))
  )
}
