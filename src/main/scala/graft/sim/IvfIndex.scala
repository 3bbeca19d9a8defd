package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: the ANN index AS a partitioned table.
  *
  * `build` materializes the two index components once:
  *   dir/centroids/  — (vec_id, embedding) of the K cell centroids
  *   dir/cells/      — the corpus with embeddings, hive-partitioned by
  *                     `cell=<id>` (tables/PartitionedTable layout)
  *
  * `search` then never touches the full corpus: probes find their
  * nearest centroid against the broadcast centroid set, and candidate
  * scanning reads ONLY the probed `cell=` directories — planning-time
  * partition pruning does the "inverted file" part of IVF, so a probe's
  * IO is corpus_size / numCells regardless of corpus size. Scoring runs
  * the codegen'd `cosine_sim`, and the cell tie-break (equal cosine →
  * lower cell id) matches `Similarity.ivfAssign` exactly, so a search
  * over the persisted index returns bit-identical results to the
  * assignment-time computation (`sim_ivf_topk`'s oracle-checked path).
  */
object IvfIndex {

  /** Per-cell membership the cell count aims at: a probe's scan cost is
    * one cell, so the cell SIZE (not count) is what must stay bounded as
    * the corpus grows. */
  val TargetCellSize = 125L

  /** Cell count scaled to the corpus: K = max(16, ⌈N / TargetCellSize⌉).
    * K was a constant 16 through round 6 — fine at the oracle scales
    * (this formula still yields 16 at N=500 and N=2000, where the DuckDB
    * duals pin the 16 seed centroids) but a scale hazard beyond: a fixed
    * K means cell size grows ∝ N and the "one cell per probe" scan
    * quietly degenerates toward brute force. AutoCellsSpec pins the
    * bound at two scales. */
  def autoCells(n: Long): Int =
    math.max(16L, (n + TargetCellSize - 1) / TargetCellSize).toInt

  /** Seed-centroid build assignment with the scale dispatch (r12
    * directive 1): flat O(N·K) up to [[Similarity.HierAssignThreshold]]
    * cells (exactly seed-pinned — every oracle scale), the two-level
    * ~O(N·√K) routing above it, and the broadcast-free cogrouped
    * variant once the fine set itself outgrows a defensible broadcast
    * ([[Similarity.MaxBroadcastFineCentroids]]). With K ∝ N under
    * [[autoCells]], the flat path alone would make index build
    * O(N²/125) — the dispatch is what keeps BUILD, not just search,
    * on the 100 TB curve. HierBuildSpec pins that a build above the
    * threshold equals the explicit two-level assignment (i.e. no flat
    * N×K scan ran). */
  private[sim] def assignForBuild(
      spark: SparkSession, corpus: DataFrame, numCells: Int): DataFrame =
    Similarity.ivfAssignAuto(spark, corpus, numCells)

  /** One-time index build: one assignment pass over the corpus
    * ([[assignForBuild]] — never the flat N×K scan above the K
    * threshold) + one partitioned write; rebuild when the corpus or K
    * changes. The REQUESTED cell count is persisted as `dir/meta` so
    * every read path (append, probe) dispatches flat-vs-hier on the
    * exact quantity the build dispatched on — dispatching search on the
    * STORED centroid count instead silently breaks the append==rebuild
    * and probe-walks-the-build-route contracts whenever the corpus
    * holds fewer than numCells seed ids (r13 review finding). */
  def build(spark: SparkSession, corpus: DataFrame, numCells: Int, dir: String): Unit = {
    corpus.filter(col("vec_id") < numCells)
      .select("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/centroids")
    writeMeta(spark, dir, numCells)
    val assigns = assignForBuild(spark, corpus, numCells)
      .select("vec_id", "cell")
    corpus.select("vec_id", "embedding").join(assigns, "vec_id")
      .select("cell", "vec_id", "embedding")
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/cells")
  }

  /** Index build with TRAINED centroids (Kmeans.fit from the seed set)
    * instead of the raw seeds: same two on-disk components, same search
    * path — cells now follow the data's actual cluster structure, so a
    * probe's single-cell scan captures more of its true neighbors
    * (recall measured in IvfIndexSpec). Centroids narrow to float for
    * the index layout (search scores via the float `cosine_sim`). */
  def buildTrained(
      spark: SparkSession,
      corpus: DataFrame,
      numCells: Int,
      trainIters: Int,
      dir: String): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cs = Kmeans.fit(spark, corpus, numCells, trainIters)
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val rows = cs.map { case (cell, emb) =>
      Row(cell, emb.map(_.toFloat).toSeq)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    writeMeta(spark, dir, numCells)
    // Assign the cells against the float-NARROWED centroids — the same
    // values the search path scores with `cosine_sim` — so build-time
    // and probe-time cell choice can never disagree on a borderline.
    val floatCs = cs.map { case (c, e) => c -> e.map(x => x.toFloat.toDouble) }
    val assigns = Kmeans.assignAuto(spark, corpus, floatCs).select("vec_id", "cell")
    corpus.select("vec_id", "embedding").join(assigns, "vec_id")
      .select("cell", "vec_id", "embedding")
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/cells")
  }

  /** The index's centroid set as the JVM array every dispatch-aware
    * path shares — a K×D driver pull, bounded by the cell count (the
    * same collect class as build's seed pull). */
  private def loadCentroids(spark: SparkSession, dir: String): Array[Similarity.Vec] = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Similarity.Vec]
    spark.read.parquet(s"$dir/centroids")
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]
      .collect().sortBy(_.vec_id)
  }

  /** Persist the build's dispatch quantity (the REQUESTED numCells) as a
    * one-row parquet next to the centroids, and drop any cached routing
    * plan for the dir (a rebuild may change centroids and route). */
  private def writeMeta(spark: SparkSession, dir: String, numCells: Int): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("num_cells", LongType, nullable = false)))
    spark.createDataFrame(
        java.util.Arrays.asList(Row(numCells.toLong)), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    // The rewrite changed dir/meta's data-file stamp, so future reads
    // miss the stamp-keyed cache automatically (cross-process safe);
    // dropping this JVM's now-dead entries just frees them early. Keys
    // are FileStamp's "$dir/meta@<stamp>" form — match on the dir
    // prefix including the separator.
    for (k <- metaCache.keys if k.startsWith(s"$dir/")) metaCache.remove(k)
    for (k <- routingCache.keys if k.startsWith(s"$dir/")) routingCache.remove(k)
    ()
  }

  /** Rebuild-safe cache key: dir + a stamp of the `dir/meta` DATA FILES
    * — max(mtime) and sum(length) over fs.listStatus — through the
    * HADOOP filesystem API (storage-agnostic — a java.nio stat is
    * false/zero on hdfs:// or s3a:// URIs, which would silently freeze
    * the first-read plan forever there). Stamping the files rather
    * than the directory matters twice (r14 ADVICE): object stores
    * (s3a) report constant/zero mtimes for directory markers, so a
    * directory stamp never fires there at all, and on 1s-granularity
    * filesystems a rebuild within the same second as a prior read
    * could reuse a stale plan — the length term catches a same-second
    * rewrite whose payload changed size. A rebuild by ANY process
    * rewrites `dir/meta`, changing the stamp, so this JVM's next call
    * misses the cache and reloads — the in-process writeMeta
    * invalidation covers only the builder's own JVM (r14 review
    * finding). One FS list per call; the parquet read and the K×√K
    * routing derivation stay memoized. Stamp spelling shared via
    * [[graft.tables.FileStamp]] (r15 review — SimQueries' parameter
    * caches use the identical recipe). */
  private def cacheKey(spark: SparkSession, dir: String): String =
    graft.tables.FileStamp(spark, s"$dir/meta")

  /** Both caches are bounded crudely: past 64 index dirs per JVM the
    * whole map clears (a routing plan can pin up to ~134 MB of
    * centroids at the 2¹⁸ bound — unbounded growth across the temp-dir-
    * per-index test/bench harnesses is a slow OOM). Rebuilds also
    * retire entries naturally via the mtime-stamped key. */
  private val MaxCachedDirs = 64

  private val metaCache =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  private val routingCache = scala.collection.concurrent.TrieMap
    .empty[String, (Array[Similarity.Vec], Map[Long, Array[Similarity.Vec]])]

  /** The quantity EVERY side dispatches flat-vs-hier on: the numCells
    * the build was asked for (`dir/meta`), falling back to the stored
    * centroid count for pre-meta indexes (where ids are dense, so the
    * two coincide). Memoized per (dir, meta mtime) — the read repeats
    * per search; the mtime in the key makes a rebuild (by any process)
    * a cache miss. The meta read goes through spark.read like every
    * other index component, so remote filesystems behave identically. */
  private def dispatchCells(spark: SparkSession, dir: String): Int = {
    val key = cacheKey(spark, dir)
    def load: Int = {
      val p = new org.apache.hadoop.fs.Path(dir, "meta")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(p.toString).head.getLong(0).toInt
      else loadCentroidCount(spark, dir)
    }
    // An errored stat stamp is unique per call — caching under it
    // would insert one permanent entry per blip (r16 review); compute
    // without caching instead (FileStamp.isError's contract).
    if (graft.tables.FileStamp.isError(key)) load
    else {
      if (metaCache.size > MaxCachedDirs) metaCache.clear()
      metaCache.getOrElseUpdate(key, load)
    }
  }

  /** The (routable coarse set, ownership map) plan of a hier-routed
    * index, memoized per (dir, meta mtime): deriving it costs a K×D
    * driver pull plus K×⌈√K⌉ scorings — per-call re-derivation repeats
    * that work on every search/append (r13 review finding), while the
    * mtime-stamped key retires the plan on rebuild even when another
    * process did the rebuilding. Append never changes centroids or
    * meta, so the plan stays valid across appends. */
  private def hierPlan(spark: SparkSession, dir: String,
      ck: Int): (Array[Similarity.Vec], Map[Long, Array[Similarity.Vec]]) = {
    val key = cacheKey(spark, dir)
    // Same error-stamp bypass as dispatchCells (r16 review).
    if (graft.tables.FileStamp.isError(key))
      Similarity.hierRouting(loadCentroids(spark, dir), ck)
    else {
      if (routingCache.size > MaxCachedDirs) routingCache.clear()
      routingCache.getOrElseUpdate(key,
        Similarity.hierRouting(loadCentroids(spark, dir), ck))
    }
  }

  /** Distributed two-level vector→cell assignment over the index's
    * STORED centroids — the one hier-routing door of every read path
    * (bulk search, incremental append, and the interactive probe path
    * past the broadcast bound). Emits (cc=chosen fine cell, vec_id,
    * embedding), `nprobe` rows per vector (its top-nprobe fine cells
    * WITHIN its coarse cell, cos DESC / id ASC — exactly the rule the
    * build placed vectors by).
    *
    * Below [[Similarity.MaxBroadcastFineCentroids]] the memoized
    * (routable, children) plan broadcasts (K×D — the hierPlan path).
    * ABOVE it that broadcast is the same memory class the build
    * refuses (r13 closed the WRITE side with ivfAssignHierCogrouped;
    * this closes the READ side): only the √K coarse set is ever held
    * whole in a JVM — fine centroids route to their coarse owner as a
    * distributed pass, ONE cogroup shuffle co-locates each coarse
    * cell's vectors with its ~√K owned fine centroids, and the
    * argmax/top-nprobe runs group-locally. Bit-identical to the
    * broadcast arm by construction (same routing rule at both levels;
    * BulkSearchSpec pins it via the forced-variant hook). */
  private[graft] def hierAssign(
      spark: SparkSession, dir: String, vectors: DataFrame, ck: Int,
      nprobe: Int, forceCogrouped: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Encoders
    implicit val vecEnc = Encoders.product[Similarity.Vec]
    implicit val routedEnc = Encoders.product[Similarity.RoutedVec]
    implicit val keyEnc = Encoders.scalaLong
    // CROSS-COARSE multiprobe (r14 directive 6): at nprobe >= 2 the
    // candidate fine cells pool from the top-[[Similarity.HierProbeCoarse]]
    // coarse cells and rank jointly by (cos DESC, fine id ASC) — the
    // within-coarse ranking could never recover a neighbor across the
    // coarse boundary, which is where the r14 forced-K recall misses
    // all lived. nprobe = 1 stays the pure build route (see
    // HierProbeCoarse's scaladoc for why that contract is load-bearing).
    val coarseProbe = if (nprobe >= 2) Similarity.HierProbeCoarse else 1
    if (!forceCogrouped && dispatchCells(spark, dir) <= Similarity.maxBroadcastFine) {
      val (routable, children) = hierPlan(spark, dir, ck)
      val bcCoarse = spark.sparkContext.broadcast(routable)
      val bcChildren = spark.sparkContext.broadcast(children)
      vectors.select(col("vec_id"), col("embedding")).as[Similarity.Vec]
        .mapPartitions { it =>
          val cs = bcCoarse.value
          val ch = bcChildren.value
          it.flatMap { v =>
            // children sets partition the fine centroids (one owner per
            // fine cell), so the pooled candidates are duplicate-free.
            Similarity.nearestSeeds(v.embedding, cs, coarseProbe, v.vec_id)
              .flatMap(cc => ch(cc))
              .map(c => (c.vec_id, Similarity.cosineJvm(v.embedding, c.embedding)))
              .sortBy { case (id, cos) => (-cos, id) }
              .take(nprobe)
              .map { case (cell, _) => Similarity.RoutedVec(cell, v.vec_id, v.embedding) }
          }
        }
        .toDF()
    } else {
      val centroids = spark.read.parquet(s"$dir/centroids")
        .select(col("vec_id"), col("embedding"))
      // Coarse = the ck LOWEST centroid ids (hierRouting's convention) —
      // a ⌈√K⌉-row driver pull, never the fine set.
      val coarse = centroids.orderBy(col("vec_id").asc).limit(ck)
        .as[Similarity.Vec].collect()
      val bcFull = spark.sparkContext.broadcast(coarse)
      def routeByCoarse(df: DataFrame,
          routing: org.apache.spark.broadcast.Broadcast[Array[Similarity.Vec]]) =
        df.select(col("vec_id"), col("embedding")).as[Similarity.Vec]
          .mapPartitions { it =>
            val cs = routing.value
            it.map(v => Similarity.RoutedVec(
              Similarity.nearestSeed(v.embedding, cs, v.vec_id)._1, v.vec_id, v.embedding))
          }
          .groupByKey(_.cc)
      // Ownership routes the FINE set with the FULL coarse set; vectors
      // route only to OWNING coarse cells — mirrors hierRouting exactly
      // (the owner-id pull is ≤ ck longs). Under cross-coarse multiprobe
      // each vector ships to its top-coarseProbe owner groups.
      val ownerIds = routeByCoarse(centroids, bcFull).keys.distinct().collect().toSet
      require(ownerIds.nonEmpty, "hierAssign: no coarse centroid owns anything")
      val bcRoutable = spark.sparkContext.broadcast(coarse.filter(c => ownerIds(c.vec_id)))
      implicit val candEnc = Encoders.product[Similarity.RoutedCand]
      val routedVecs = vectors.select(col("vec_id"), col("embedding")).as[Similarity.Vec]
        .mapPartitions { it =>
          val cs = bcRoutable.value
          it.flatMap { v =>
            Similarity.nearestSeeds(v.embedding, cs, coarseProbe, v.vec_id)
              .map(cc => Similarity.RoutedVec(cc, v.vec_id, v.embedding))
          }
        }
        .groupByKey(_.cc)
      // Per-group top-nprobe candidates; for coarseProbe = 1 this IS the
      // final answer (each vector lives in exactly one group).
      val grouped = routedVecs
        .cogroup(routeByCoarse(centroids, bcFull)) { (cc, vecs, fines) =>
          val owned = fines.map(f => Similarity.Vec(f.vec_id, f.embedding))
            .toArray.sortBy(_.vec_id)
          vecs.flatMap { v =>
            require(owned.nonEmpty,
              s"hierAssign: coarse cell $cc owns no fine centroid " +
                s"but vec_id=${v.vec_id} routed to it")
            owned
              .map(c => (c.vec_id, Similarity.cosineJvm(v.embedding, c.embedding)))
              .sortBy { case (id, cos) => (-cos, id) }
              .take(nprobe)
              .map { case (cell, cos) =>
                Similarity.RoutedCand(cell, v.vec_id, v.embedding, cos) }
          }
        }
      if (coarseProbe == 1)
        grouped.map(c => Similarity.RoutedVec(c.cc, c.vec_id, c.embedding)).toDF()
      else {
        // Global re-rank across the coarseProbe groups: the union of
        // per-group top-nprobe sets contains the global top-nprobe
        // (standard top-k merge), so this window sees ≤ coarseProbe ×
        // nprobe rows per vector — never the full pooled candidate set.
        // Same (cos DESC, fine id ASC) rule as the broadcast arm's
        // pooled sort, so the two arms stay bit-identical.
        val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cc").asc)
        grouped.toDF()
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= nprobe)
          .select("cc", "vec_id", "embedding")
      }
    }
  }

  /** Incremental index maintenance: assign a DELTA of new vectors to
    * the EXISTING centroids and append them to their cell partitions —
    * no rebuild, no touch of resident cells' files. The index stays
    * search-identical to a from-scratch build over base+delta as long
    * as the centroid set is unchanged (IvfIndexSpec pins bit-equality);
    * re-train + rebuild stays the maintenance op once drift accumulates
    * (the OPTIMIZE analogue). Cost: one broadcast-assign pass over the
    * delta + one partitioned append.
    *
    * Above the K threshold the delta routes through the SAME two-level
    * rule as the build (r13): a flat argmax here could place a delta
    * vector in a cell the hier-routed build would never have chosen,
    * silently breaking the append==rebuild contract exactly where the
    * dispatch changes the build. */
  def appendVectors(spark: SparkSession, dir: String, delta: DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    Similarity.hierCoarseK(dispatchCells(spark, dir)) match {
      case None =>
        val centroids = spark.read.parquet(s"$dir/centroids")
          .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
        val wCell = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cell").asc)
        delta.select("vec_id", "embedding")
          .crossJoin(broadcast(centroids))
          .selectExpr("vec_id", "embedding", "cell", "cosine_sim(embedding, c_emb) AS cos")
          .withColumn("rn", row_number().over(wCell))
          .filter(col("rn") === 1)
          .select("cell", "vec_id", "embedding")
          .write.partitionBy("cell").mode("append").parquet(s"$dir/cells")
      case Some(ck) =>
        hierAssign(spark, dir, delta, ck, nprobe = 1)
          .select(col("cc").as("cell"), col("vec_id"), col("embedding"))
          .write.partitionBy("cell").mode("append").parquet(s"$dir/cells")
    }
  }

  /** Cell count of a persisted index — parquet footer metadata, no data
    * scan. */
  private def loadCentroidCount(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/centroids").count().toInt

  /** Top-k neighbors per probe, reading only the probed cells'
    * partition directories. */
  def search(spark: SparkSession, dir: String, probes: DataFrame, k: Int): DataFrame =
    searchMulti(spark, dir, probes, k, nprobe = 1)

  /** Shared probe prologue of every search variant: assign each probe
    * its `nprobe` nearest cells and open the pruned candidate scan.
    * Probe→cell assignment is COLLECTED once (bounded by the probe
    * count) and re-used both as the pruning IN-list and, rebuilt as a
    * local frame, as the broadcast join side — computing the window
    * twice would double the assignment work. The cell filter sits
    * BEFORE any cast: the predicate must touch the inferred partition
    * column directly to prune; the long cast (for the join with the
    * centroid-derived cell) comes after.
    * @return (probeCells(query_id, q_emb, cell), cands = pruned cells scan) */
  private def probeAssignments(
      spark: SparkSession, dir: String, probes: DataFrame,
      nprobe: Int): (DataFrame, DataFrame) = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val probeCells = Similarity.hierCoarseK(dispatchCells(spark, dir)) match {
      case None =>
        val centroids = spark.read.parquet(s"$dir/centroids")
          .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
        val wCell = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cell").asc)
        val probeRows = probes
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
          .crossJoin(broadcast(centroids))
          .selectExpr("query_id", "q_emb", "cell", "cosine_sim(q_emb, c_emb) AS cos")
          .withColumn("rn", row_number().over(wCell))
          .filter(col("rn") <= nprobe)
          .select("query_id", "q_emb", "cell")
        val collected = probeRows.collect()
        spark.createDataFrame(
          java.util.Arrays.asList(collected: _*), probeRows.schema)
      case Some(ck) if dispatchCells(spark, dir) > Similarity.maxBroadcastFine =>
        // Past the fine-set broadcast bound the interactive driver loop
        // below can't hold the routing plan either — assign through the
        // cogrouped door and collect the (probe × nprobe)-bounded
        // result back for the IN-list, exactly the collected-path
        // contract at interactive probe counts.
        val probeRows = hierAssign(spark, dir, probes, ck, nprobe)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            col("cc").as("cell"))
        val collected = probeRows.collect()
        spark.createDataFrame(
          java.util.Arrays.asList(collected: _*), probeRows.schema)
      case Some(ck) =>
        // Above the K threshold the BUILD placed vectors by two-level
        // routing; probes must walk the SAME route (FAISS reuses its
        // coarse quantizer at query time for exactly this reason) — a
        // flat probe argmax would scan a cell the probe's true
        // neighbors were never placed in, an unmeasured recall hole on
        // top of the sanctioned within-coarse approximation. Per-probe
        // cost drops K -> ~2√K as a side effect. Multi-probe (nprobe ≥
        // 2) ranks fine cells JOINTLY across the top-HierProbeCoarse
        // coarse cells (r14 directive 6 — within-coarse ranking could
        // never recover a cross-boundary neighbor; nprobe = 1 stays
        // the pure build route, see HierProbeCoarse). The memoized
        // broadcast plan is the interactive fast path — zero Spark
        // jobs for the assignment itself; the arm above takes over
        // past the bound, applying the same rule via hierAssign.
        import org.apache.spark.sql.Encoders
        implicit val vecEnc = Encoders.product[Similarity.Vec]
        val (routable, children) = hierPlan(spark, dir, ck)
        val coarseProbe = if (nprobe >= 2) Similarity.HierProbeCoarse else 1
        val probeArr = probes.select(col("vec_id"), col("embedding"))
          .as[Similarity.Vec].collect()
        val rows: Seq[org.apache.spark.sql.Row] = probeArr.toSeq.flatMap { p =>
          Similarity.nearestSeeds(p.embedding, routable, coarseProbe, p.vec_id)
            .flatMap(cc => children(cc))
            .map(c => (c.vec_id, Similarity.cosineJvm(p.embedding, c.embedding)))
            .sortBy { case (id, cos) => (-cos, id) }
            .take(nprobe)
            .map { case (cell, _) =>
              org.apache.spark.sql.Row(p.vec_id, p.embedding.toSeq, cell)
            }
        }
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("query_id", LongType, nullable = false),
          StructField("q_emb", ArrayType(FloatType), nullable = false),
          StructField("cell", LongType, nullable = false)))
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }
    val cellIds = probeCells.select("cell").collect().map(_.getLong(0)).distinct.toSeq
    val cands = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(cellIds: _*))
      .withColumn("cell", col("cell").cast("long"))
    (probeCells, cands)
  }

  /** Multi-probe search — THE recall knob of IVF: each probe scans its
    * `nprobe` nearest cells instead of one. Since every corpus vector
    * lives in exactly one cell, the candidate sets of a probe's cells
    * are disjoint, so on the FLAT arm raising nprobe strictly grows the
    * candidate pool and recall@k is monotonically non-decreasing in
    * nprobe (pinned in IvfIndexSpec); IO grows linearly as
    * nprobe/numCells of the corpus. nprobe = numCells degenerates to
    * exact brute force. On the HIER arm, nprobe ≥ 2 ranks fine cells
    * across the top-[[Similarity.HierProbeCoarse]] coarse cells (r14
    * directive 6), so the nprobe=1 build-route cell is USUALLY but not
    * provably among the scanned set — strict nesting is traded for the
    * cross-boundary recall the within-coarse ranking can never reach
    * (measured: sim_ivf_hier_recall_x2). */
  def searchMulti(
      spark: SparkSession, dir: String, probes: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val (probeCells, cands) = probeAssignments(spark, dir, probes, nprobe)
    val wTopK = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cands.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id", "cosine_sim(q_emb, embedding) AS cos")
      .withColumn("rank", row_number().over(wTopK))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Set-oriented BULK search — [[searchMulti]]'s exact semantics with
    * the probe→cell assignment run as a distributed DataFrame pass:
    * nothing probe-sized ever lands on the driver. `searchMulti`
    * collects the probe rows once — right for interactive probe sets,
    * a driver memory/CPU bottleneck when the probe set is corpus-sized
    * (kNN-graph construction, batch labeling, dataset-vs-dataset
    * matching). Here the only driver pull is the DISTINCT probed
    * cell-id list for partition pruning, bounded by the CELL count
    * (≤ numCells longs), never the probe count; probes keep their
    * partitions through assignment (flat: broadcast-centroid crossjoin
    * + per-query window; hier: mapPartitions over the broadcast
    * routing plan — the same route the build placed vectors by), and
    * the candidate join shuffles on `cell` with no broadcast hint so
    * the planner (or AQE at runtime) picks the join strategy from the
    * actual probe volume. Both arms dispatch on the same `dir/meta`
    * quantity as build/append; BulkSearchSpec pins bulk ==
    * collected-path bit-equality on both arms and both nprobe values.
    */
  def searchBulk(
      spark: SparkSession, dir: String, probes: DataFrame, k: Int,
      nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val probeCells = Similarity.hierCoarseK(dispatchCells(spark, dir)) match {
      case None =>
        val centroids = spark.read.parquet(s"$dir/centroids")
          .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
        val scored = probes
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
          .crossJoin(broadcast(centroids))
          .selectExpr("query_id", "q_emb", "cell", "cosine_sim(q_emb, c_emb) AS cos")
        if (nprobe == 1) {
          // Argmax as an AGGREGATE, not a window: max(struct(cos, -cell))
          // is the same (cos DESC, cell ASC) tie rule, but partial
          // aggregation collapses the N×K scored rows to ~N on the map
          // side before the shuffle — the window spelling ships all N×K
          // rows to the query_id partitions first. BulkSearchSpec pins
          // bit-equality of the two spellings via the collected path.
          scored
            .groupBy("query_id", "q_emb")
            .agg(max(struct(col("cos"), (-col("cell")).as("nc"), col("cell"))).as("m"))
            .select(col("query_id"), col("q_emb"), col("m.cell").as("cell"))
        } else {
          val wCell = Window.partitionBy("query_id").orderBy(col("cos").desc, col("cell").asc)
          scored
            .withColumn("rn", row_number().over(wCell))
            .filter(col("rn") <= nprobe)
            .select("query_id", "q_emb", "cell")
        }
      case Some(ck) =>
        hierAssign(spark, dir, probes, ck, nprobe)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            col("cc").as("cell"))
    }
    // The assignment feeds two consumers — the cell-id pull below and
    // the candidate join in the returned plan. Un-persisted, the second
    // consumer RE-EXECUTES the whole probe-side lineage (the N×K scan
    // or the cogroup shuffle) when the caller materializes — the exact
    // doubled work the collected path avoids by collecting (r14 review
    // finding). MEMORY_AND_DISK: spill-safe at corpus-sized probe sets.
    val probeCellsP = probeCells
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // The one driver pull: probed cell ids for planning-time partition
    // pruning — ≤ numCells values regardless of probe volume.
    val cellIds = probeCellsP.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val cands = spark.read.parquet(s"$dir/cells")
      .filter(col("cell").isin(cellIds: _*))
      .withColumn("cell", col("cell").cast("long"))
    // Final ranking as the bounded-heap AGGREGATE, not a window: at a
    // corpus-sized probe set the scored row count is probes × cell
    // size, and the row_number spelling makes every task SORT its
    // whole partition on (query, cos) before Spark 4's
    // WindowGroupLimit trims it — O(n log n) on the bulk path's
    // largest intermediate. topk_by keeps k per query through the
    // hash-aggregate path (map-side partial: the shuffle carries ≤ k
    // rows per (query, map partition)), O(n log k), no Sort operator.
    // Bit-equality with the window rule (cos DESC, neighbor_id ASC):
    // topk_by totals ties by (score, id) with the LARGER id winning,
    // so ranking the NEGATED neighbor id flips that to smallest-
    // original-id-wins — and ids are distinct per query (cells
    // partition the corpus), so set semantics cannot collapse rows.
    // searchMulti keeps the window spelling; BulkSearchSpec pins the
    // two spellings bit-identical on both dispatch arms.
    val out = cands.join(probeCellsP, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .selectExpr("query_id", "vec_id AS neighbor_id", "cosine_sim(q_emb, embedding) AS cos")
      .groupBy("query_id")
      .agg(expr(s"topk_by(cos, -neighbor_id, $k)").as("tk"))
      .selectExpr("query_id", "posexplode(tk) AS (pos, e)")
      .selectExpr("query_id", "CAST(pos + 1 AS INT) AS rank",
        "-e.id AS neighbor_id", "round(e.score, 6) AS cosine")
    // PERSIST LIFECYCLE (r14 directive 5, hardened r15 directive 7 +
    // ADVICE): the cell-id pull above already materialized
    // probeCellsP's blocks, and the caller gets only a lazy plan —
    // CacheRelease unpersists after the FIRST completed caller
    // execution of the RETURNED (uniquely tagged) plan, so twin
    // searchBulk calls can't release each other's cache, an
    // abandoning caller is bounded by the pending cap + application-
    // end drain, and CacheRelease.releaseAll is the explicit handle.
    // A caller re-executing the returned plan after the release
    // recomputes the probe assignment — correct, just uncached.
    // Lifecycle (twin-call independence, abandoned-plan cap) pinned in
    // BulkSearchSpec.
    graft.plans.CacheRelease.afterFirstMaterialization(
      spark, out, () => { probeCellsP.unpersist(blocking = false); () })
  }

  /** IVF-PQ search — the standard billion-scale ANN composition: the
    * IVF stage prunes IO to the probed cells' partition dirs (reading
    * ONLY vec_id — column pruning skips the raw embeddings entirely),
    * and the PQ stage scores candidates by asymmetric distance (ADC):
    * per-probe subspace distance tables against the broadcast codebook,
    * candidate distance = M table lookups through the stored codes. No
    * raw-vector float math touches a database vector at query time —
    * the scan cost is codes (a few bytes/vector), not embeddings.
    *
    * @param codes    (vec_id, m, j) PQ code rows (e.g. PqCodec output)
    * @param codebook (j, c_emb) shared per-subspace codebook
    * @param subDim   dims per subspace (M·subDim = full dim)
    */
  def searchAdc(
      spark: SparkSession, dir: String, probes: DataFrame,
      codes: DataFrame, codebook: DataFrame, numSubspaces: Int, subDim: Int,
      k: Int, nprobe: Int): DataFrame = {
    val (probeCells, candsAll) = probeAssignments(spark, dir, probes, nprobe)
    // Candidates: vec_id ONLY from the probed partitions (column pruning
    // drops the embeddings from the scan — the PQ IO contract).
    val cands = candsAll.select("cell", "vec_id")

    // Probe distance tables: nprobe·M·K rows — broadcast-sized.
    val pdist = probeCells.select("query_id", "q_emb").distinct()
      .crossJoin(broadcast(codebook))
      .select(col("query_id"), col("q_emb"), col("j"), col("c_emb"),
        explode(expr(s"sequence(0, ${numSubspaces - 1})")).as("m"))
      .selectExpr("query_id", "m", "j",
        s"l2_sq_range(q_emb, c_emb, m * $subDim + 1, $subDim) AS pd2")

    // Each query's candidate set = the vectors of ITS probed cells.
    val qCands = cands
      .join(broadcast(probeCells.select("query_id", "cell").distinct()), Seq("cell"))
      .select("query_id", "vec_id")

    // ADC: M lookups per (query, candidate); the m-sorted fold keeps the
    // float sum order-deterministic. Residual ordered fold (ExactSum
    // survey, r12): the array is exactly numSubspaces entries — bounded
    // by construction, no OOM tail (the standalone sim_pq_adc query
    // uses the order-free qsum spelling).
    val wTop = Window.partitionBy("query_id").orderBy(col("adc").asc, col("vec_id").asc)
    qCands.join(codes, Seq("vec_id"))
      .join(broadcast(pdist), Seq("query_id", "m", "j"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sort_array(collect_list(struct(col("m"), col("pd2")))).as("cs"))
      // Completeness guard: a candidate missing code rows for some
      // subspace would sum a truncated ADC and silently rank too high —
      // drop it here so a malformed code table skews nothing (the m-join
      // can only lose rows, never duplicate them, so == is the check).
      .filter(size(col("cs")) === numSubspaces)
      .selectExpr("query_id", "vec_id",
        "aggregate(cs, CAST(0.0 AS DOUBLE), (a, e) -> a + e.pd2) AS adc")
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("adc"), 6).as("adc"))
  }
}
