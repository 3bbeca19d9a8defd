package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Similarity.{cosineJvm, IvfAssign, Vec}

/** Distributed k-means (Lloyd's algorithm) over the embedding corpus —
  * the centroid-TRAINING step the IVF index family (Similarity.ivfAssign,
  * IvfIndex) deliberately seeds with fixed vectors. Spherical variant:
  * points are assigned by maximum cosine (matching the assignment the IVF
  * search path uses), centroids are per-cell arithmetic means.
  *
  * Scale shape per iteration — the canonical Spark pattern:
  *   1. centroids (K×D doubles, tiny) broadcast to every executor;
  *   2. assignment is one partition-local pass over the corpus (no
  *      shuffle; same argmax + lowest-cell tie-break as ivfAssign);
  *   3. the mean update is posexplode → one shuffle keyed (cell, dim)
  *      with map-side partial sums → at most K×D aggregated rows, which
  *      is the ONLY driver collect (bounded by K×D, never by corpus
  *      size — same category as ivfAssign's seed-centroid collect).
  *
  * Determinism: `fit` sums each (cell, dim) with a commutative SQL sum —
  * the right answer at scale, reproducible to ~1e-12 but not bit-pinned
  * across partitionings. `stepDeterministic` is the oracle path: ONE
  * Lloyd step whose per-cell sums run as strict vec_id-ordered left
  * folds, bit-reproducible in any engine (same contract as
  * Similarity's dot-product folds), at the price of buffering each
  * cell's members in its aggregation group — use it for parity gates,
  * `fit` for production scale.
  */
object Kmeans {

  /** Assignment of every corpus vector to its argmax-cosine centroid.
    * `centroids` are (cell id, mean vector) pairs, broadcast. Ties break
    * to the lowest cell id, exactly like Similarity.ivfAssign. */
  def assign(
      spark: SparkSession,
      corpus: DataFrame,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Vec]
    implicit val asgEnc = Encoders.product[IvfAssign]
    val sorted = centroids.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(sorted)
    corpus.select(col("vec_id"), col("embedding")).as[Vec]
      .mapPartitions { it =>
        val cs = bc.value
        it.map { v =>
          val (bestCell, bestCos) = nearestCentroid(v.embedding, cs, v.vec_id)
          IvfAssign(v.vec_id, bestCell, Similarity.round6(bestCos))
        }
      }
      .toDF()
  }

  /** TWO-LEVEL assignment against TRAINED centroids — [[assign]]'s
    * answer to the same O(N·K) cliff [[Similarity.ivfAssignHier]]
    * closes for seed centroids: route each vector through the coarse
    * subset first (the `coarseK` lowest cell ids — the deterministic
    * analogue of the seed convention `vec_id < coarseK`), then score
    * only the fine centroids owned by its coarse cell (~2√K scorings
    * per vector). Same tie rule (cos DESC, id ASC) at both levels; the
    * routing approximation is the sanctioned, measured one. Broadcast
    * bound: the full centroid set ships to every JVM, same written
    * bound as ivfAssignHier ([[Similarity.MaxBroadcastFineCentroids]])
    * — beyond it, train on a sample (centroids that big can't be
    * driver-held by [[fit]] anyway). */
  def assignHier(
      spark: SparkSession,
      corpus: DataFrame,
      centroids: Array[(Long, Array[Double])],
      coarseK: Int): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(coarseK >= 1 && coarseK <= centroids.length,
      s"assignHier needs 1 <= coarseK <= K, got $coarseK/${centroids.length}")
    implicit val vecEnc = Encoders.product[Vec]
    implicit val asgEnc = Encoders.product[IvfAssign]
    val sorted = centroids.sortBy(_._1)
    val coarse = sorted.take(coarseK)
    // Driver-side fine→coarse ownership map: K×coarseK scorings. A
    // coarse centroid owning nothing is a same-direction duplicate of a
    // lower-id coarse centroid (cos(c,c)=1 maximal, ties id-ASC) and by
    // the same two facts UNREACHABLE from any vector — Lloyd iterations
    // can collapse centroids onto each other, so this is a legitimate
    // degenerate state to route around, not an abort (it would crash
    // fit() mid-training above the dispatch threshold).
    val children: Map[Long, Array[(Long, Array[Double])]] =
      sorted.groupBy(c => nearestCentroidD(c._2, coarse, c._1)._1)
    require(children.nonEmpty, "assignHier: no coarse centroid owns anything")
    // Routing considers only OWNING coarse centroids, mirroring
    // ivfAssignHier's `routable` rule — children(cc) total by
    // construction even when near-parallel centroids' cosines differ in
    // the last ulp.
    val routable = coarse.filter(c => children.contains(c._1))
    val bcCoarse = spark.sparkContext.broadcast(routable)
    val bcChildren = spark.sparkContext.broadcast(children)
    corpus.select(col("vec_id"), col("embedding")).as[Vec]
      .mapPartitions { it =>
        val cs = bcCoarse.value
        val ch = bcChildren.value
        it.map { v =>
          val (cc, _) = nearestCentroid(v.embedding, cs, v.vec_id)
          val (cell, cos) = nearestCentroid(v.embedding, ch(cc), v.vec_id)
          IvfAssign(v.vec_id, cell, Similarity.round6(cos))
        }
      }
      .toDF()
  }

  /** Assignment with the build-scale dispatch: flat up to
    * [[Similarity.HierAssignThreshold]] centroids (exactly pinned —
    * every oracle scale), two-level routing above it. [[fit]] and
    * `IvfIndex.buildTrained` assign through this door.
    *
    * The trained-centroid broadcast bound is MECHANICAL here (r13
    * directive): both arms ship the full centroid set to every JVM, so
    * past [[Similarity.MaxBroadcastFineCentroids]] the call refuses
    * loudly instead of silently crossing the written bound — the
    * sanctioned path at that scale is sample training (train K within
    * the bound on a deterministic corpus sample, e.g.
    * `corpus.filter(vec_id % m == 0)`), or the seed-set
    * family's `Similarity.ivfAssignHierCogrouped`, which never holds
    * the fine set whole in any JVM. */
  def assignAuto(
      spark: SparkSession,
      corpus: DataFrame,
      centroids: Array[(Long, Array[Double])]): DataFrame = {
    requireWithinBroadcastBound(centroids.length, "assignAuto")
    Similarity.hierCoarseK(centroids.length) match {
      case None     => assign(spark, corpus, centroids)
      case Some(ck) => assignHier(spark, corpus, centroids, ck)
    }
  }

  /** The one written bound of the trained-centroid family, enforced at
    * every door that would broadcast (or driver-hold) the full set. */
  private def requireWithinBroadcastBound(k: Int, caller: String): Unit =
    // Consult the override-aware accessor, not the raw constant: every
    // other dispatch site does, so a spec lowering the bound exercises
    // the past-bound arms against a BUILD that refuses consistently
    // (r14 review finding — the raw-constant guard here let tests build
    // an index the read paths would then treat as past-bound).
    require(k <= Similarity.maxBroadcastFine,
      s"Kmeans.$caller: K=$k exceeds the fine-centroid broadcast bound " +
        s"(${Similarity.maxBroadcastFine}) — the trained centroid " +
        "set cannot be driver-held/broadcast whole at this K. Train K " +
        "within the bound on a deterministic corpus sample (e.g. " +
        "corpus.filter(vec_id % m == 0)) and assign through assignAuto, " +
        "or use the seed-centroid ivfAssignHierCogrouped path.")

  /** argmax-cosine trained centroid for a float vector (cos DESC, id ASC
    * tie — the family rule), with the zero-norm/NaN guard: a vector that
    * scores NaN against every centroid fails loudly by vec_id instead of
    * emitting cell -1. */
  private def nearestCentroid(
      emb: Array[Float], cands: Array[(Long, Array[Double])], vecId: Long): (Long, Double) = {
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    cands.foreach { case (cell, cEmb) =>
      val cos = cosineDJvm(emb, cEmb)
      if (cos > bestCos || (cos == bestCos && cell < bestId)) {
        bestId = cell; bestCos = cos
      }
    }
    require(bestId >= 0,
      s"nearestCentroid: vec_id=$vecId scored NaN against every centroid " +
        "(zero-norm or NaN embedding?) — no cell assignable")
    (bestId, bestCos)
  }

  /** Double-vector twin of [[nearestCentroid]] for the driver-side
    * fine→coarse ownership scorings. */
  private def nearestCentroidD(
      emb: Array[Double], cands: Array[(Long, Array[Double])], id: Long): (Long, Double) = {
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    cands.foreach { case (cell, cEmb) =>
      val cos = cosineDDJvm(emb, cEmb)
      if (cos > bestCos || (cos == bestCos && cell < bestId)) {
        bestId = cell; bestCos = cos
      }
    }
    require(bestId >= 0,
      s"nearestCentroidD: centroid id=$id scored NaN against every coarse " +
        "centroid (zero-norm centroid?)")
    (bestId, bestCos)
  }

  /** cosine(double, double) with the family's left-fold order. */
  private def cosineDDJvm(a: Array[Double], c: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nc = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * c(i)
      na += a(i) * a(i)
      nc += c(i) * c(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nc))
  }

  /** cosine(float vector, double centroid) with the same left-fold order
    * as Similarity.cosineJvm. */
  private def cosineDJvm(a: Array[Float], c: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nc = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * c(i)
      na += a(i).toDouble * a(i).toDouble
      nc += c(i) * c(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nc))
  }

  /** Seed centroids: the first K corpus vectors (the IVF family's
    * deterministic seed set), widened to double. Collect bounded by K. */
  def seedCentroids(corpus: DataFrame, k: Int): Array[(Long, Array[Double])] = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Vec]
    corpus.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding")).as[Vec].collect()
      .sortBy(_.vec_id)
      .map(v => v.vec_id -> v.embedding.map(_.toDouble))
  }

  /** `iters` full Lloyd iterations from the seed set; returns the final
    * centroids. Mean update: posexplode to (cell, dim, value) → one
    * aggregation shuffle → collect of ≤ K×D rows. Cells that attract no
    * members keep their previous centroid (the standard empty-cluster
    * fallback). */
  def fit(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int,
      iters: Int): Array[(Long, Array[Double])] = {
    requireWithinBroadcastBound(k, "fit")
    var cs = seedCentroids(corpus, k)
    val exploded = corpus
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
    (1 to iters).foreach { _ =>
      val asg = assignAuto(spark, corpus, cs).select("vec_id", "cell")
      val sums = exploded.join(asg, "vec_id")
        .groupBy("cell", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Long]("cell"))
      cs = cs.map { case (cell, prev) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val mean = prev.clone()
            rows.foreach { r =>
              mean(r.getAs[Int]("dim")) =
                r.getAs[Double]("s") / r.getAs[Long]("n").toDouble
            }
            cell -> mean
          case None => cell -> prev
        }
      }
    }
    cs
  }

  /** Mean within-cluster cosine of an assignment — the (spherical)
    * k-means objective, for convergence checks. */
  def meanAssignedCosine(assigned: DataFrame): Double =
    assigned.agg(avg("cosine")).head.getDouble(0)

  /** ONE bit-deterministic Lloyd step from the seed set, for the oracle
    * gate: per-cell member count plus strict vec_id-ordered left-fold
    * sums, reported as the centroid's fold-ordered norm² and component
    * sum (rounded 6). Buffers each cell's members in its group — parity
    * tool, not the scale path (that's `fit`). */
  def stepDeterministic(spark: SparkSession, corpus: DataFrame, k: Int, dim: Int): DataFrame = {
    val assigned = Similarity.ivfAssign(spark, corpus, k).select("vec_id", "cell")
    corpus.select(col("vec_id"), col("embedding")).join(assigned, "vec_id")
      .withColumn("xd", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_members"),
        sort_array(collect_list(struct(col("vec_id"), col("xd")))).as("vs"))
      .withColumn("sums", expr(
        s"aggregate(vs, array_repeat(CAST(0.0 AS DOUBLE), $dim), " +
          "(acc, e) -> zip_with(acc, e.xd, (a, b) -> a + b))"))
      .selectExpr(
        "cell",
        "CAST(n_members AS BIGINT) AS n_members",
        "round(aggregate(transform(sums, s -> (s / CAST(n_members AS DOUBLE)) * (s / CAST(n_members AS DOUBLE))), CAST(0.0 AS DOUBLE), (a, v) -> a + v), 6) AS c_norm2",
        "round(aggregate(transform(sums, s -> s / CAST(n_members AS DOUBLE)), CAST(0.0 AS DOUBLE), (a, v) -> a + v), 6) AS c_sum")
  }
}
