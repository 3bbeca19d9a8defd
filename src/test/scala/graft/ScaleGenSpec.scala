package graft

import org.apache.spark.sql.functions._

/** Pins the two properties ScaleGen's replica jitter exists for (r13
  * directive 6: pair-output entries must scale ~linearly, so replica
  * copies must NOT be near-dups of each other while each replica keeps
  * the original's internal similarity structure):
  *
  *  - [[ScaleGen.perturbEmbedding]] is ORTHOGONAL within a replica —
  *    pairwise cosines and norms are exactly the original corpus — and
  *    decorrelating across replicas (a vector vs its own copy scores
  *    like an unrelated vector);
  *  - [[ScaleGen.perturbText]] is one consistent injective vocab map
  *    per replica — within-replica token overlap of near-dup docs is
  *    preserved, while a doc and its own copy in another replica share
  *    only the unsubstituted ~70% of the vocabulary.
  */
class ScaleGenSpec extends SparkSuite {

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / math.sqrt(na * nb)
  }

  /** Real driver embeddings replicated 3x through the actual offset
    * arithmetic + perturbation column ScaleGen.main applies. */
  private lazy val replicated: Map[Long, Array[(Long, Array[Float])]] = {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
    val vecOff = 1000000L
    val reps = spark.range(3).select(col("id").as("_rep"))
    val rows = emb.crossJoin(broadcast(reps))
      .withColumn("vec_id", col("vec_id") + col("_rep") * vecOff).drop("_rep")
      .withColumn("embedding", ScaleGen.perturbEmbedding(vecOff))
      .select("vec_id", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    rows.groupBy(_._1 / vecOff).map { case (rep, vs) =>
      rep -> vs.map { case (id, e) => (id % vecOff, e) }.sortBy(_._1)
    }
  }

  test("perturbEmbedding: replica 0 is verbatim") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val rep0 = replicated(0L)
    assert(rep0.map(_._1).sameElements(emb.map(_._1)))
    rep0.zip(emb).foreach { case ((_, a), (_, b)) => assert(a.sameElements(b)) }
  }

  test("perturbEmbedding is orthogonal: within-replica cosines and norms exact") {
    val orig = replicated(0L)
    for (rep <- Seq(1L, 2L)) {
      val copy = replicated(rep)
      // Norms preserved bit-for-bit (rotation + sign flip move values,
      // never compute with them beyond *1.0/-1.0).
      orig.zip(copy).foreach { case ((_, a), (_, b)) =>
        val na = a.map(x => x.toDouble * x).sum
        val nb = b.map(x => x.toDouble * x).sum
        assert(math.abs(na - nb) < 1e-9, s"rep $rep: norm changed ($na vs $nb)")
      }
      // All pairwise cosines identical to the original geometry.
      for (i <- orig.indices; j <- (i + 1) until orig.length) {
        val co = cosine(orig(i)._2, orig(j)._2)
        val cc = cosine(copy(i)._2, copy(j)._2)
        assert(math.abs(co - cc) < 1e-6,
          s"rep $rep pair ($i,$j): $co vs $cc — transform not orthogonal")
      }
    }
  }

  test("perturbEmbedding decorrelates across replicas: a copy is not a near-dup") {
    val orig = replicated(0L)
    // At dim 64 an UNRELATED pair scores |cos| ~ N(0, 1/64)-ish (σ ≈
    // 0.125) — "decorrelated" means a vector-vs-its-copy pair follows
    // that same noise distribution, not that every sample clears a hard
    // threshold. Assert the mean sits in the noise regime and no copy
    // remains anywhere near the ≥0.8 near-dup gates.
    def assertNoise(pairs: Seq[Double], what: String): Unit = {
      val mean = pairs.sum / pairs.size
      assert(mean < 0.15, s"$what: mean |cos| = $mean — copies still correlated")
      assert(pairs.max < 0.55, s"$what: max |cos| = ${pairs.max} — a copy is a near-dup")
    }
    for (rep <- Seq(1L, 2L)) {
      val copy = replicated(rep)
      assertNoise(
        orig.zip(copy).map { case ((_, a), (_, b)) => math.abs(cosine(a, b)) }.toSeq,
        s"replica 0 vs $rep")
      // Different non-zero replicas are ALSO mutually decorrelated.
      if (rep == 2L) assertNoise(
        replicated(1L).zip(copy).map { case ((_, a), (_, b)) => math.abs(cosine(a, b)) }.toSeq,
        "replica 1 vs 2")
    }
  }

  private def substituted(docOff: Long, reps: Int): Array[(Long, Array[String])] = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(20)
    val repsDf = spark.range(reps.toLong).select(col("id").as("_rep"))
    docs.crossJoin(broadcast(repsDf))
      .withColumn("doc_id", col("doc_id") + col("_rep") * docOff).drop("_rep")
      .withColumn("ws", expr(ScaleGen.perturbText(docOff, "split(text, ' ')")))
      .select("doc_id", "ws")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
  }

  test("perturbText: one consistent injective vocab map per replica, ~30% rate") {
    val docOff = 1000000L
    val out = substituted(docOff, 3).groupBy(_._1 / docOff)
    val orig = out(0L).sortBy(_._1)
    for (rep <- Seq(1L, 2L)) {
      val copy = out(rep).sortBy(_._1)
      // Replica 0 verbatim; replicas substitute by a per-WORD rule only:
      // collect the map word→word' across all docs — it must be a
      // function (consistent) and injective on this sample.
      val pairs = orig.zip(copy).flatMap { case ((_, ws0), (_, ws1)) =>
        assert(ws0.length == ws1.length)
        ws0.zip(ws1)
      }
      val byWord = pairs.groupBy(_._1).map { case (w, ps) =>
        val images = ps.map(_._2).distinct
        assert(images.length == 1, s"word '$w' maps to ${images.length} images in rep $rep")
        w -> images.head
      }
      val changed = byWord.count { case (w, w2) => w != w2 }
      val rate = changed.toDouble / byWord.size
      assert(rate > 0.15 && rate < 0.45, s"substitution rate $rate outside [0.15, 0.45]")
      // Injective: distinct words stay distinct under the map.
      assert(byWord.values.toSeq.distinct.size == byWord.size, s"rep $rep map not injective")
      // Different replicas substitute to DIFFERENT images (so replica 1
      // and 2 copies of a doc differ from each other too).
      if (rep == 2L) {
        val map1 = out(1L).sortBy(_._1).zip(orig).flatMap { case ((_, b), (_, a)) => a.zip(b) }
          .groupBy(_._1).map { case (w, ps) => w -> ps.head._2 }
        byWord.foreach { case (w, w2) =>
          if (w2 != w) assert(map1(w) != w2, s"reps 1 and 2 share image for '$w'")
        }
      }
    }
  }
}
