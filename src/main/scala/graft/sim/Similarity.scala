package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact). Scale path: deterministic
  * random-hyperplane LSH — 16-bit (bucketing to ~2^16) or any width —
  * computed with integer-derived hyperplane weights so the DuckDB oracle
  * reproduces the projections bit-for-bit.
  *
  * Numeric determinism contract (shared with the oracles):
  *  - all dot products are strict left folds over the element index with
  *    every operand cast to DOUBLE first (IEEE-754 ⇒ the same partial-sum
  *    sequence in any engine);
  *  - hyperplane weight w(j,d) = ((1103515245*(j*D+d) + 12345) mod 2^31)
  *    - 2^30, a plain LCG step — integer-exact everywhere.
  *
  * Scale notes: brute-force is a broadcast nested loop — right for a small
  * probe set against a big corpus (probes broadcast, corpus scanned once,
  * no shuffle of the corpus). All-pairs NN at 100 TB goes through LSH
  * buckets (one shuffle on the bucket key) or IVF-style partition pruning;
  * the quadratic work is confined to each bucket.
  */
object Similarity {

  /** Strict-left-fold dot product of two array<float> columns as Spark SQL. */
  def dotSpark(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** Same fold in DuckDB (list_reduce folds left; 0.0+x == x keeps the
    * partial-sum sequence identical to the Spark init-fold). */
  def dotDuck(a: String, b: String): String =
    s"list_reduce([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  def cosineSpark(a: String, b: String): String =
    s"(${dotSpark(a, b)} / (sqrt(${dotSpark(a, a)}) * sqrt(${dotSpark(b, b)})))"

  def cosineDuck(a: String, b: String): String =
    s"(${dotDuck(a, b)} / (sqrt(${dotDuck(a, a)}) * sqrt(${dotDuck(b, b)})))"

  /** Deterministic LCG hyperplane weight, as SQL over (j, d). The LCG
    * multiplier is forced to BIGINT: both engines overflow 32-bit INT
    * multiplication otherwise (Spark ANSI errors, DuckDB errors too). */
  private def weight(j: String, d: String, dim: Int): String =
    s"CAST(((CAST(1103515245 AS BIGINT) * ($j * $dim + $d) + 12345) % 2147483648) - 1073741824 AS DOUBLE)"

  /** `bits`-bit random-hyperplane signature of an embedding column.
    * Emits the native codegen'd `lsh_sig` (expressions/LshSig — the
    * nested-HOF spelling evaluates bits×dim interpreted lambda steps
    * per row, which became the measured sf10 bottleneck once the
    * auto-width tier made pair work linear, r15); bit-identical to
    * [[lshSigSparkHof]] and the DuckDB dual (LshSigSpec). */
  def lshSigSpark(emb: String, bits: Int, dim: Int): String =
    s"lsh_sig($emb, $bits, $dim)"

  /** The pure-builtin HOF spelling of the same signature — kept as the
    * parity reference (proj_j = left fold over dims of emb[d]·w(j,d));
    * LshSigSpec pins lsh_sig == this, element for element. */
  def lshSigSparkHof(emb: String, bits: Int, dim: Int): String = {
    val proj =
      s"aggregate(sequence(0, ${dim - 1}), CAST(0.0 AS DOUBLE), (acc, d) -> acc + CAST(element_at($emb, d + 1) AS DOUBLE) * ${weight("j", "d", dim)})"
    s"aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (sig, j) -> sig + CASE WHEN $proj > 0.0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END)"
  }

  /** Same signature in DuckDB. */
  def lshSigDuck(emb: String, bits: Int, dim: Int): String = {
    val proj =
      s"list_reduce([CAST($emb[d + 1] AS DOUBLE) * ${weight("j", "d", dim)} for d in range(0, $dim)], (x, y) -> x + y)"
    s"CAST(list_sum([CASE WHEN $proj > 0.0 THEN (1::BIGINT << j) ELSE 0 END for j in range(0, $bits)]) AS BIGINT)"
  }

  final case class Vec(vec_id: Long, embedding: Array[Float])
  final case class NearDupPair(a_id: Long, b_id: Long, cosine: Double)

  /** JVM cosine with the exact same operation order as the SQL folds:
    * left fold of double products, then dot / (sqrt(na) * sqrt(nb)). */
  def cosineJvm(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Left-fold dot product alone (one third of cosineJvm's work). */
  def dotJvm(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot
  }

  /** sqrt of the self-dot left fold — cosineJvm's sqrt(na), computed once
    * per vector instead of once per pair. cosine = dot / (norm(a) *
    * norm(b)) is then bit-identical to cosineJvm: same folds, same
    * operand order in the final multiply/divide. */
  def normJvm(a: Array[Float]): Double = math.sqrt(dotJvm(a, a))

  /** Spark round(x, 6) reproduced on the JVM (BigDecimal HALF_UP). */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One replicated copy of a vector for the triangle block join: the
    * (pi, pj) block-pair it participates in and the side it plays. */
  final case class BlockTagged(
      pi: Int, pj: Int, left: Boolean, vec_id: Long, embedding: Array[Float])

  /** Exact all-pairs near-duplicates above a cosine threshold, as a
    * TRIANGLE BLOCK JOIN: vectors land in block g = vec_id % B, every
    * unordered block pair (i <= j) becomes one shuffle group holding
    * blocks i and j, and a tight JVM loop scans the cross product inside
    * the group (the interpreted HOF fold is ~100× slower per pair).
    *
    * Scale: no driver collect, no full-corpus broadcast — each vector is
    * replicated B+1 times through one shuffle and each group holds ~2n/B
    * vectors, so executor memory bounds B, not n. The comparison count is
    * inherently n²/2 (this is the EXACT operator); at 100 TB you cut n
    * first by confining pairs to LSH buckets (lshSigSpark) or IVF cells
    * (ivfAssign) and run this scan per bucket. */
  def bruteForcePairs(
      spark: SparkSession,
      corpus: DataFrame,
      threshold: Double,
      numBlocks: Int = 8): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Vec]
    implicit val tagEnc = Encoders.product[BlockTagged]
    implicit val pairEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.scalaInt
    corpus.select(col("vec_id"), col("embedding")).as[Vec]
      .flatMap { v =>
        val g = (v.vec_id % numBlocks).toInt
        (g until numBlocks).map(j => BlockTagged(g, j, left = true, v.vec_id, v.embedding)) ++
          (0 to g).map(i => BlockTagged(i, g, left = false, v.vec_id, v.embedding))
      }
      .groupByKey(t => t.pi * numBlocks + t.pj)
      .flatMapGroups { (_, it) =>
        val (ls, rs) = it.toArray.partition(_.left)
        val sameBlock = ls.nonEmpty && rs.nonEmpty && ls(0).pi == ls(0).pj
        val lNorms = ls.map(v => normJvm(v.embedding))
        val rNorms = rs.map(v => normJvm(v.embedding))
        ls.indices.iterator.flatMap { x =>
          val a = ls(x)
          rs.indices.iterator.flatMap { y =>
            val b = rs(y)
            // within a block both roles hold the same vectors: id-order
            // dedups; across blocks every pair appears exactly once.
            if (sameBlock && a.vec_id >= b.vec_id) Iterator.empty
            else {
              val cos = dotJvm(a.embedding, b.embedding) / (lNorms(x) * rNorms(y))
              if (cos >= threshold) {
                val (lo, hi) = if (a.vec_id < b.vec_id) (a.vec_id, b.vec_id)
                               else (b.vec_id, a.vec_id)
                Iterator.single(NearDupPair(lo, hi, round6(cos)))
              } else Iterator.empty
            }
          }
        }
      }
      .toDF()
  }

  final case class BucketVec(vec_id: Long, embedding: Array[Float], bucket: Long)
  final case class BucketNn(vec_id: Long, neighbor_id: Long, cosine: Double)

  /** Largest bucket group the JVM scans will buffer: 2²⁰ vectors ≈
    * 270 MB at dim 64 — past it, the group would both strain executor
    * memory AND mark quadratic pair work no signature widening can
    * fix. The auto-width tier keeps E[bucket] ≤ 128, but LSH cannot
    * separate what the GEOMETRY doesn't separate: a degenerate corpus
    * (mass-duplicate embeddings) collapses into one bucket at ANY
    * width. Fail loudly naming the audit row instead of OOMing an
    * executor (the `sim_lsh_auto_audit` max_bucket column is the
    * operational early warning). The bound is a PARAMETER of the two
    * group scans (default this constant), not a mutable global: the
    * check runs INSIDE flatMapGroups on executor task threads, so a
    * global (or a thread-local DynamicVariable) is exactly the shape a
    * parallel suite races on — a parameter is captured in the closure
    * at plan construction and serialized with the task (r15 directive
    * 5; BucketBoundSpec passes a small bound explicitly). */
  val MaxBucketGroup = 1 << 20

  private def requireBucketBounded(n: Int, bucket: Long, maxBucketGroup: Int): Unit =
    require(n <= maxBucketGroup,
      s"LSH bucket $bucket holds $n vectors (> $maxBucketGroup): the corpus " +
        "collapses buckets no signature width can split (mass-duplicate " +
        "embeddings? check sim_lsh_auto_audit's max_bucket). Deduplicate " +
        "exact-duplicate vectors first, or scan this bucket with the " +
        "triangle block join (bruteForcePairs), which bounds group memory " +
        "by block count instead of bucket size.")

  /** Bucketed ANN, JVM path: nearest neighbor within each vector's LSH
    * bucket. ONE shuffle on the bucket key (groupByKey) and a JVM scan
    * per bucket group — no driver collect, no corpus broadcast; executor
    * memory bounds the bucket size (by construction: LSH bucket
    * population falls geometrically with signature width), not the
    * corpus. Bit-identical to the SQL formulation (same fold-ordered
    * cosine, same (cos desc, id asc) argmax — the argmax is
    * order-insensitive, so shuffle nondeterminism cannot change it). */
  def bucketNnJvm(spark: SparkSession, withBuckets: DataFrame,
      maxBucketGroup: Int = MaxBucketGroup): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vEnc = Encoders.product[BucketVec]
    implicit val nnEnc = Encoders.product[BucketNn]
    implicit val keyEnc = Encoders.scalaLong
    withBuckets.select(col("vec_id"), col("embedding"), col("bucket")).as[BucketVec]
      .groupByKey(_.bucket)
      .flatMapGroups { (bucket, it) =>
        val vecs = it.toArray
        requireBucketBounded(vecs.length, bucket, maxBucketGroup)
        val norms = vecs.map(v => normJvm(v.embedding))
        vecs.indices.iterator.flatMap { j =>
          val a = vecs(j)
          var best: BucketNn = null
          var k = 0
          while (k < vecs.length) {
            val b = vecs(k)
            if (b.vec_id != a.vec_id) {
              val cos = dotJvm(a.embedding, b.embedding) / (norms(j) * norms(k))
              // argmax with (cos desc, neighbor_id asc) tiebreak
              if (best == null || cos > best.cosine ||
                  (cos == best.cosine && b.vec_id < best.neighbor_id))
                best = BucketNn(a.vec_id, b.vec_id, cos)
            }
            k += 1
          }
          Option(best).map(b => b.copy(cosine = round6(b.cosine))).iterator
        }
      }
      .toDF()
  }

  /** Bucket-confined near-duplicate pairs: all (a < b) pairs that share
    * an LSH bucket with cosine >= threshold. THE 100 TB near-dup recipe:
    * candidate generation is the bucket co-membership itself, so the
    * shuffle moves each vector once and the quadratic scan runs per
    * bucket (recall is tuned by signature width / multi-probe, not by
    * corpus size). Same group machinery as bucketNnJvm. */
  def bucketPairsJvm(spark: SparkSession, withBuckets: DataFrame, threshold: Double,
      maxBucketGroup: Int = MaxBucketGroup): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vEnc = Encoders.product[BucketVec]
    implicit val pairEnc = Encoders.product[NearDupPair]
    implicit val keyEnc = Encoders.scalaLong
    withBuckets.select(col("vec_id"), col("embedding"), col("bucket")).as[BucketVec]
      .groupByKey(_.bucket)
      .flatMapGroups { (bucket, it) =>
        val vecs = it.toArray.sortBy(_.vec_id)
        requireBucketBounded(vecs.length, bucket, maxBucketGroup)
        val norms = vecs.map(v => normJvm(v.embedding))
        vecs.indices.iterator.flatMap { x =>
          val a = vecs(x)
          ((x + 1) until vecs.length).iterator.flatMap { y =>
            val b = vecs(y)
            val cos = dotJvm(a.embedding, b.embedding) / (norms(x) * norms(y))
            if (cos >= threshold)
              Iterator.single(NearDupPair(a.vec_id, b.vec_id, round6(cos)))
            else Iterator.empty
          }
        }
      }
      .toDF()
  }

  final case class IvfAssign(vec_id: Long, cell: Long, cosine: Double)

  /** IVF-style cell assignment: each vector maps to its nearest centroid
    * (argmax cosine, centroid-id tiebreak). Centroids here are a
    * deterministic seed set (first K vectors) rather than k-means output —
    * the assignment/search machinery is identical and stays
    * oracle-reproducible. At scale: centroids broadcast (tiny), one
    * partition-local pass over the corpus, searches probe only their
    * cell's partition (partition-prune by `cell`). */
  def ivfAssign(spark: SparkSession, corpus: DataFrame, numCells: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Vec]
    implicit val asgEnc = Encoders.product[IvfAssign]
    val centroids = corpus.filter(col("vec_id") < numCells)
      .select(col("vec_id"), col("embedding")).as[Vec].collect().sortBy(_.vec_id)
    val bc = spark.sparkContext.broadcast(centroids)
    corpus.select(col("vec_id"), col("embedding")).as[Vec]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { v =>
          var bestCell = -1L
          var bestCos = Double.NegativeInfinity
          cs.foreach { c =>
            val cos = cosineJvm(v.embedding, c.embedding)
            if (cos > bestCos || (cos == bestCos && c.vec_id < bestCell)) {
              bestCell = c.vec_id; bestCos = cos
            }
          }
          IvfAssign(v.vec_id, bestCell, round6(bestCos))
        }
      }
      .toDF()
  }

  /** TWO-LEVEL (coarse-quantizer) IVF assignment — the standard answer
    * to flat assignment's build cost: with K cells scaled ∝ N (the
    * cell-size invariant), flat assign is O(N·K) = O(N²/cellSize) — at
    * 10¹⁰ vectors and 10⁸ cells that is 10¹⁸ scorings. Routing each
    * vector through coarseK ≈ √K coarse centroids first, then scoring
    * only the fine centroids OWNED by its coarse cell, cuts per-vector
    * work to ~2√K (FAISS's coarse-quantizer / IMI construction) while
    * keeping the result deterministic and oracle-mirrorable.
    *
    * Seeds follow the family convention: fine = vec_id < fineK, coarse
    * = vec_id < coarseK (coarseK ≤ fineK, so every coarse seed is also
    * a fine seed and — barring exact-duplicate seed vectors, asserted
    * at build — owns at least itself: no coarse cell can be empty).
    * Tie rules match [[ivfAssign]] exactly (cos DESC, id ASC) at both
    * levels. The routing is an approximation: a vector whose true
    * nearest fine centroid lives under a DIFFERENT coarse cell gets its
    * best fine centroid within its own coarse cell — the recall cost is
    * measured, not hidden (sim_ivf_hier_topk's oracle replays the same
    * two-level choice).
    *
    * MEMORY BOUND (written, per r12 review): the fine set is collected
    * to the driver and the `children` map is broadcast WHOLE to every
    * executor JVM — at fineK centroids of dim D floats that is
    * ~fineK·D·4 bytes per JVM (fineK = corpus/125 under `autoCells`, so
    * e.g. 10⁹ vectors × dim 128 → 8M centroids ≈ 4 GB: too big). This
    * variant is therefore bounded at [[MaxBroadcastFineCentroids]] fine
    * centroids (dim 128 → ~134 MB broadcast, comfortably inside a
    * normal executor); above the bound use [[ivfAssignHierCogrouped]],
    * which holds only the √K coarse set in any JVM and shards the fine
    * set by coarse cell through one shuffle. [[IvfIndex.assignForBuild]]
    * dispatches across all three variants automatically. */
  def ivfAssignHier(
      spark: SparkSession, corpus: DataFrame, fineK: Int, coarseK: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(coarseK >= 1 && coarseK <= fineK,
      s"ivfAssignHier needs 1 <= coarseK <= fineK, got $coarseK/$fineK")
    implicit val vecEnc = Encoders.product[Vec]
    implicit val asgEnc = Encoders.product[IvfAssign]
    val fine = corpus.filter(col("vec_id") < fineK)
      .select(col("vec_id"), col("embedding")).as[Vec].collect().sortBy(_.vec_id)
    // Driver-side fine→coarse ownership map: fineK×coarseK scorings.
    // A coarse seed owning NOTHING (not even itself) means a same-
    // direction duplicate with a LOWER id exists: cos(c, c) = 1 is
    // maximal and ties break id-ASC, so the duplicate claims c. Routing
    // considers ONLY owning coarse seeds (hierRouting's `routable`), so
    // `ch(cc)` is total by construction — for bit-identical duplicates
    // the empty seed could never win a route anyway (equal cosines,
    // lower id wins), and for merely-parallel seeds whose cosines
    // differ in the last ulp this removes the one path to an
    // executor-side children(-miss). Pre-r13 this was a hard require
    // that aborted the whole assignment on degenerate seed data.
    val (routable, children) = hierRouting(fine, coarseK)
    val bcCoarse = spark.sparkContext.broadcast(routable)
    val bcChildren = spark.sparkContext.broadcast(children)
    corpus.select(col("vec_id"), col("embedding")).as[Vec]
      .mapPartitions { it =>
        val cs = bcCoarse.value
        val ch = bcChildren.value
        it.map { v =>
          val (cc, _) = nearestSeed(v.embedding, cs, v.vec_id)
          val (cell, cos) = nearestSeed(v.embedding, ch(cc), v.vec_id)
          IvfAssign(v.vec_id, cell, round6(cos))
        }
      }
      .toDF()
  }

  /** Corpus vector tagged with its coarse-cell route — the shuffle key
    * of [[ivfAssignHierCogrouped]]. */
  final case class RoutedVec(cc: Long, vec_id: Long, embedding: Array[Float])

  /** A fine-cell candidate of a cross-coarse multiprobe before the
    * global top-nprobe re-rank: `cc` is the FINE cell id, `cos` its
    * centroid's score against the vector. */
  final case class RoutedCand(
      cc: Long, vec_id: Long, embedding: Array[Float], cos: Double)

  /** Shuffle-sharded two-level IVF assignment — [[ivfAssignHier]] with
    * the fine-set broadcast removed: only the √K coarse seeds are ever
    * held whole in a JVM. Both the corpus and the fine-seed set route to
    * their coarse cell with the broadcast coarse seeds (identical
    * `nearestSeed` tie rule), then ONE cogroup shuffle keyed by coarse
    * cell co-locates each coarse cell's corpus rows with its ~√K owned
    * fine centroids, and the fine argmax runs group-locally — per-task
    * memory is the buffered fine slice (√K vectors), never the corpus
    * or the full centroid set. Bit-identical to [[ivfAssignHier]] by
    * construction (same routing function at both levels; pinned in
    * AutoCellsSpec). Skew note: one coarse cell = one task's streamed
    * iterator; the corpus side is streamed, not buffered, so a hot
    * coarse cell costs time, not memory. */
  def ivfAssignHierCogrouped(
      spark: SparkSession, corpus: DataFrame, fineK: Int, coarseK: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(coarseK >= 1 && coarseK <= fineK,
      s"ivfAssignHierCogrouped needs 1 <= coarseK <= fineK, got $coarseK/$fineK")
    implicit val vecEnc = Encoders.product[Vec]
    implicit val routedEnc = Encoders.product[RoutedVec]
    implicit val asgEnc = Encoders.product[IvfAssign]
    implicit val keyEnc = Encoders.scalaLong
    val coarse = corpus.filter(col("vec_id") < coarseK)
      .select(col("vec_id"), col("embedding")).as[Vec].collect().sortBy(_.vec_id)
    val bcFull = spark.sparkContext.broadcast(coarse)
    def routeByCoarse(df: DataFrame, routing: org.apache.spark.broadcast.Broadcast[Array[Vec]]) =
      df.select(col("vec_id"), col("embedding")).as[Vec]
        .mapPartitions { it =>
          val cs = routing.value
          it.map(v => RoutedVec(nearestSeed(v.embedding, cs, v.vec_id)._1, v.vec_id, v.embedding))
        }
        .groupByKey(_.cc)
    // Mirror the broadcast variant exactly: OWNERSHIP routes the fine
    // seeds with the FULL coarse set; the CORPUS routes only to OWNING
    // coarse cells (`routable`), so every corpus group meets a non-empty
    // fine slice by construction. The owner-id pull is ≤ coarseK longs.
    val fine = corpus.filter(col("vec_id") < fineK)
    val ownerIds =
      fine.select(col("vec_id"), col("embedding")).as[Vec]
        .mapPartitions { it =>
          val cs = bcFull.value
          it.map(f => nearestSeed(f.embedding, cs, f.vec_id)._1)
        }(keyEnc)
        .distinct().collect().toSet
    require(ownerIds.nonEmpty, "ivfAssignHierCogrouped: no coarse seed owns anything")
    val bcRoutable = spark.sparkContext.broadcast(coarse.filter(c => ownerIds(c.vec_id)))
    routeByCoarse(corpus, bcRoutable)
      .cogroup(routeByCoarse(fine, bcFull)) { (cc, vecs, fines) =>
        val owned = fines.map(f => Vec(f.vec_id, f.embedding)).toArray.sortBy(_.vec_id)
        vecs.map { v =>
          require(owned.nonEmpty,
            s"ivfAssignHierCogrouped: coarse cell $cc owns no fine centroid " +
              s"but vec_id=${v.vec_id} routed to it")
          val (cell, cos) = nearestSeed(v.embedding, owned, v.vec_id)
          IvfAssign(v.vec_id, cell, round6(cos))
        }
      }
      .toDF()
  }

  /** Cell count above which a BUILD-time assignment must not run the
    * flat O(N·K) scan (with K ∝ N under `autoCells` that is O(N²/125)):
    * route two-level instead. 64 keeps every oracle/bench scale
    * (K = 16 at sf0.001–0.1) on the flat, seed-pinned path while sf1+
    * (K ≥ 160) gets the ~O(N·√K) build. */
  val HierAssignThreshold = 64

  /** Fine-centroid count above which even [[ivfAssignHier]]'s whole-set
    * broadcast is unreasonable (see its MEMORY BOUND note) and the
    * cogrouped shuffle variant takes over: 2¹⁸ ≈ 262k centroids ≈
    * 134 MB at dim 128 — the classic "biggest broadcast you'd defend". */
  val MaxBroadcastFineCentroids = 1 << 18

  /** Test-only override of the bound: the past-bound dispatch arms
    * (cogrouped assignment, searchMulti's distributed probe route) are
    * otherwise reachable only with a >2¹⁸-cell index — no reasonable
    * spec fixture — so their plumbing would ship unexecuted (r14 review
    * finding). A DynamicVariable, scoped per `withValue` block (r15
    * directive 5 — the r14 plain-var spelling raced across parallel
    * suites): this is safe here, unlike for the bucket bound, because
    * EVERY consult of [[maxBroadcastFine]] happens synchronously on the
    * calling thread during plan construction / dispatch (ivfAssignAuto,
    * hierAssign, probeAssignments, Kmeans.fit's require) — never inside
    * a task closure at execution time — so the value is always read on
    * the thread that set it. Production never sets it. */
  private[graft] val maxBroadcastFineCentroidsOverride =
    new scala.util.DynamicVariable[Option[Int]](None)

  /** The bound every dispatch site consults — all driver-synchronous
    * reads (see the override's scaladoc). */
  private[graft] def maxBroadcastFine: Int =
    maxBroadcastFineCentroidsOverride.value.getOrElse(MaxBroadcastFineCentroids)

  /** The coarse-quantizer size for a two-level assignment over `k` fine
    * cells — ⌈√k⌉ (balances the two scoring levels at ~2√k per vector)
    * — or None when `k` is small enough that flat assignment is both
    * cheaper and exactly seed-pinned. */
  def hierCoarseK(k: Int): Option[Int] =
    if (k <= HierAssignThreshold) None
    else Some(math.min(k, math.ceil(math.sqrt(k.toDouble)).toInt))

  /** Seed-centroid assignment with the scale dispatch — the ONE door
    * every auto-scaled-K caller (index builds AND the cell-confinement
    * queries) should assign through: flat O(N·K) up to
    * [[HierAssignThreshold]] (exactly seed-pinned — every oracle
    * scale), two-level ~O(N·√K) routing above it, and the
    * broadcast-free cogrouped variant once the fine set outgrows
    * [[MaxBroadcastFineCentroids]]. With K ∝ N under the cell-size
    * invariant, a flat call here is the O(N²/cellSize) cliff —
    * HierBuildSpec pins the dispatch. */
  def ivfAssignAuto(spark: SparkSession, corpus: DataFrame, numCells: Int): DataFrame =
    hierCoarseK(numCells) match {
      case None => ivfAssign(spark, corpus, numCells)
      case Some(ck) if numCells <= maxBroadcastFine =>
        ivfAssignHier(spark, corpus, numCells, ck)
      case Some(ck) => ivfAssignHierCogrouped(spark, corpus, numCells, ck)
    }

  /** Two-level routing plan over an EXPLICIT centroid set: the
    * (routable coarse set, ownership map) pair [[ivfAssignHier]] derives
    * from seeds, exposed so the OTHER index paths that must agree with a
    * hier-routed build — incremental append, probe assignment — route
    * through the exact same rule instead of a flat argmax that can
    * disagree with where the build actually placed a vector. Coarse =
    * the `coarseK` lowest centroid ids (the family convention); cost is
    * K×coarseK driver-side scorings, bounded by the centroid pull the
    * caller already holds. */
  private[sim] def hierRouting(
      cents: Array[Vec], coarseK: Int): (Array[Vec], Map[Long, Array[Vec]]) = {
    val sorted = cents.sortBy(_.vec_id)
    val coarse = sorted.take(coarseK)
    val children = sorted.groupBy(c => nearestSeed(c.embedding, coarse, c.vec_id)._1)
    require(children.nonEmpty, "hierRouting: no coarse centroid owns anything")
    (coarse.filter(c => children.contains(c.vec_id)), children)
  }

  /** How many coarse cells a hier-routed MULTI-probe (nprobe ≥ 2)
    * pools fine-cell candidates from (r14 directive 6): within-coarse
    * multiprobe ranks the nprobe fine cells inside ONE coarse cell, so
    * every miss whose true neighbors sit across the coarse boundary is
    * unrecoverable at any nprobe — the r14 recall measurement put ALL
    * the forced-K misses there (0.80 @ nprobe=1). Ranking (coarse,
    * fine) jointly over the top-2 coarse cells makes the candidate
    * pool ~2K/ck fine centroids and recovers cross-boundary neighbors;
    * cost is one extra coarse cell's children scored per probe.
    * nprobe = 1 deliberately stays the pure build route — its contract
    * is "scan exactly the cell the build would place you in" (append==
    * rebuild and probe-self-consistency audits ride it, HierBuildSpec). */
  val HierProbeCoarse = 2

  /** Top-n seeds by (cos DESC, id ASC) — [[nearestSeed]] generalized
    * for cross-coarse multiprobe; n = 1 delegates to nearestSeed's
    * allocation-free argmax loop (this runs once per CORPUS vector on
    * every nprobe=1 build/append route — the boxed sort below would be
    * pure overhead there; r15 review). NaN-scoring vectors fail
    * loudly either way. */
  private[sim] def nearestSeeds(
      emb: Array[Float], cands: Array[Vec], n: Int, vecId: Long): Array[Long] = {
    if (n == 1) return Array(nearestSeed(emb, cands, vecId)._1)
    val scored = cands.map(c => (c.vec_id, cosineJvm(emb, c.embedding)))
      .filter(!_._2.isNaN)
    require(scored.nonEmpty,
      s"nearestSeeds: vec_id=$vecId scored NaN against every centroid " +
        "(zero-norm or NaN embedding?) — no cell assignable")
    scored.sortBy { case (id, cos) => (-cos, id) }.take(n).map(_._1)
  }

  /** argmax-cosine seed (cos DESC, id ASC tie) — the shared tie rule of
    * both assignment levels; object-level so the executor closure ships
    * no driver state. A zero-norm (or NaN) input scores NaN against
    * every seed, so neither branch ever fires and bestId stays -1 —
    * left unguarded that surfaces as an opaque `children(-1)` on an
    * executor; fail loudly here instead, naming the offending vector. */
  private[sim] def nearestSeed(
      emb: Array[Float], cands: Array[Vec], vecId: Long): (Long, Double) = {
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    cands.foreach { c =>
      val cos = cosineJvm(emb, c.embedding)
      if (cos > bestCos || (cos == bestCos && c.vec_id < bestId)) {
        bestId = c.vec_id; bestCos = cos
      }
    }
    require(bestId >= 0,
      s"nearestSeed: vec_id=$vecId scored NaN against every centroid " +
        "(zero-norm or NaN embedding?) — no cell assignable")
    (bestId, bestCos)
  }

  /** Exact top-k neighbors for a probe set: broadcast nested loop +
    * per-probe window. Scoring uses the native codegen'd `cosine_sim`
    * (graft.expressions.CosineSim — bit-identical to the HOF fold the
    * oracle mirrors, ~100× cheaper per pair). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val joined = corpus.alias("c")
      .crossJoin(broadcast(probes.select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .filter(col("c.vec_id") =!= col("query_id"))
      .selectExpr(
        "query_id", "c.vec_id AS neighbor_id",
        "cosine_sim(q_emb, c.embedding) AS cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }
}
